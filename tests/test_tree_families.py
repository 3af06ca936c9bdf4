"""Systematic tree-construction family matrices: structural properties
derived from the spec's own rule tables (CLOSES_P, HEADINGS,
FORMATTING, the implied-end-tag sets), parametrized across every
member — regression armor for mode interactions that single goldens
miss."""

from __future__ import annotations

import pytest

from zhtml_spark.tree import (
    CLOSES_P,
    FORMATTING,
    HEADINGS,
    N_ELEMENT,
    N_TEXT,
    parse_document,
)


def _descendants(tree, nid):
    out = []
    stack = [tree.first_child[nid]]
    while stack:
        c = stack.pop()
        if c == -1:
            continue
        out.append(c)
        stack.append(tree.next_sibling[c])
        stack.append(tree.first_child[c])
    return out


def _find_all(tree, name):
    return [i for i in range(len(tree)) if tree.name[i] == name]


def _body(tree):
    html = next(
        c for c in tree.children(0)
        if tree.ntype[c] == N_ELEMENT and tree.name[c] == "html"
    )
    return next(
        c for c in tree.children(html) if tree.name[c] == "body"
    )


@pytest.mark.parametrize("tag", sorted(CLOSES_P - {"p"}))
def test_closes_p_family(tag):
    """Every CLOSES_P start tag closes an open <p>: the element must
    NOT be a descendant of the p."""
    tree, _ = parse_document(f"<!DOCTYPE html><p>x<{tag}>y")
    p = _find_all(tree, "p")[0]
    others = _find_all(tree, tag)
    assert others, tag
    assert others[0] not in _descendants(tree, p), tag


@pytest.mark.parametrize(
    "tag", sorted(["span", "b", "code", "em", "abbr", "kbd", "mark", "q"])
)
def test_inline_tags_stay_in_p(tag):
    tree, _ = parse_document(f"<!DOCTYPE html><p>x<{tag}>y</{tag}></p>")
    p = _find_all(tree, "p")[0]
    el = _find_all(tree, tag)[0]
    assert el in _descendants(tree, p), tag


@pytest.mark.parametrize("h1", sorted(HEADINGS))
@pytest.mark.parametrize("h2", sorted(HEADINGS))
def test_heading_matrix_always_siblings(h1, h2):
    """Any open heading is closed by any new heading (spec: pop when
    current node is a heading)."""
    tree, _ = parse_document(f"<!DOCTYPE html><{h1}>a<{h2}>b")
    e1 = _find_all(tree, h1)[0]
    e2 = [i for i in _find_all(tree, h2) if i != e1][0] if h1 == h2 \
        else _find_all(tree, h2)[0]
    assert e2 not in _descendants(tree, e1)


@pytest.mark.parametrize("item,container", [
    ("li", "ul"), ("li", "ol"), ("dt", "dl"), ("dd", "dl"),
])
def test_list_item_sibling_closure(item, container):
    tree, _ = parse_document(
        f"<!DOCTYPE html><{container}><{item}>a<{item}>b</{container}>"
    )
    items = _find_all(tree, item)
    assert len(items) == 2
    assert items[1] not in _descendants(tree, items[0])
    cont = _find_all(tree, container)[0]
    assert all(i in _descendants(tree, cont) for i in items)


@pytest.mark.parametrize("tag", sorted(FORMATTING))
def test_formatting_reconstruction_family(tag):
    """Every FORMATTING element left open across a <p> boundary is
    reconstructed inside the next block."""
    tree, _ = parse_document(f"<!DOCTYPE html><p><{tag}>x<p>y")
    ps = _find_all(tree, "p")
    assert len(ps) == 2
    second_fmt = [
        i for i in _descendants(tree, ps[1]) if tree.name[i] == tag
    ]
    assert second_fmt, f"{tag} not reconstructed"
    texts = [
        tree.node_text(c)
        for c in _descendants(tree, second_fmt[0])
        if tree.ntype[c] == N_TEXT
    ]
    assert "".join(texts) == "y"


@pytest.mark.parametrize("section", ["tbody", "thead", "tfoot"])
def test_table_section_rows(section):
    tree, _ = parse_document(
        f"<!DOCTYPE html><table><{section}><tr><td>a<tr><td>b</table>"
    )
    sec = _find_all(tree, section)[0]
    trs = [c for c in tree.children(sec) if tree.name[c] == "tr"]
    assert len(trs) == 2


@pytest.mark.parametrize("stray", [
    "td", "th", "tr", "tbody", "thead", "tfoot", "caption", "colgroup",
    "col", "frame", "head",
])
def test_stray_table_structure_ignored_in_body(stray):
    """Spec InBody: these start tags are parse errors, IGNORED — text
    flows on as body content."""
    tree, _ = parse_document(f"<!DOCTYPE html><body>a<{stray}>b")
    if stray == "head":
        # the implicit skeleton head exists; the STRAY token must not
        # add a second one or swallow text
        assert len(_find_all(tree, "head")) == 1
    else:
        assert not _find_all(tree, stray), stray
    body = _body(tree)
    texts = [
        tree.node_text(c)
        for c in tree.children(body)
        if tree.ntype[c] == N_TEXT
    ]
    assert "".join(texts) == "ab"


@pytest.mark.parametrize("tag", sorted(CLOSES_P - {"p"}))
def test_closes_p_family_not_triggered_without_open_p(tag):
    """Sanity: with no open p, the element lands in body normally."""
    tree, _ = parse_document(f"<!DOCTYPE html><body><{tag}>y")
    assert _find_all(tree, tag), tag
