"""Tree-construction goldens.

Covers the two reference-implemented insertion modes 1:1 — Initial's
quirks classification (/root/reference/src/parser.zig:146-254) and
BeforeHtml (:256-280) — plus the extended mode chain the engine adds
(SURVEY §7.0).
"""

from __future__ import annotations

import pytest

from zhtml_spark.tree import (
    N_COMMENT,
    N_DOCTYPE,
    N_ELEMENT,
    N_TEXT,
    classify_quirks,
    parse_document,
)


def outline(tree, nid=0):
    """Nested-list DOM outline: [label, children...]"""
    t = tree.ntype[nid]
    if t == N_TEXT:
        return repr(tree.node_text(nid))
    if t == N_COMMENT:
        return f"<!--{tree.node_text(nid)}-->"
    if t == N_DOCTYPE:
        return f"<!DOCTYPE {tree.name[nid]}>"
    label = "#document" if t == 0 else tree.name[nid]
    kids = [outline(tree, c) for c in tree.children(nid)]
    return [label, *kids] if kids else [label]


# --------------------------------------------------------------- quirks
# Cases mirror the spec table the reference copies
# (src/parser.zig:175-245).
@pytest.mark.parametrize(
    ("name", "pub", "sys", "fq", "want"),
    [
        ("html", None, None, False, "no-quirks"),
        ("html", None, None, True, "quirks"),
        (None, None, None, False, "quirks"),
        ("HTML", None, None, False, "quirks"),  # name compared post-lower
        ("html", "HTML", None, False, "quirks"),
        ("html", "-//W3O//DTD W3 HTML Strict 3.0//EN//", None, False, "quirks"),
        ("html", "-/W3C/DTD HTML 4.0 Transitional/EN", None, False, "quirks"),
        ("html", None, "http://www.ibm.com/data/dtd/v11/ibmxhtml1-transitional.dtd", False, "quirks"),
        ("html", "-//IETF//DTD HTML 2.0//EN", None, False, "quirks"),
        ("html", "-//W3C//DTD HTML 3.2 Final//EN", None, False, "quirks"),
        ("html", "-//w3c//dtd html 4.0 transitional//en", None, False, "quirks"),
        ("html", "-//W3C//DTD HTML 4.01 Transitional//EN", None, False, "quirks"),
        ("html", "-//W3C//DTD HTML 4.01 Transitional//EN", "x", False, "limited-quirks"),
        ("html", "-//W3C//DTD HTML 4.01 Frameset//EN", None, False, "quirks"),
        ("html", "-//W3C//DTD HTML 4.01 Frameset//EN", "x", False, "limited-quirks"),
        ("html", "-//W3C//DTD XHTML 1.0 Transitional//EN", None, False, "limited-quirks"),
        ("html", "-//W3C//DTD XHTML 1.0 Frameset//EN", None, False, "limited-quirks"),
        ("html", "-//W3C//DTD XHTML 1.0 Strict//EN", None, False, "no-quirks"),
        ("html", None, "about:legacy-compat", False, "no-quirks"),
    ],
)
def test_classify_quirks(name, pub, sys, fq, want):
    # tokenizer lowercases doctype names before they reach classify;
    # a raw "HTML" therefore only occurs for non-html names → quirks
    assert classify_quirks(name, pub, sys, fq) == want


def test_doctype_sets_mode_and_node():
    tree, errors = parse_document("<!DOCTYPE html><html></html>")
    assert tree.quirks_mode == "no-quirks"
    assert tree.doctype == ("html", None, None)
    assert errors == []
    # document children: doctype then html
    kids = list(tree.children(0))
    assert tree.ntype[kids[0]] == N_DOCTYPE
    assert tree.name[kids[1]] == "html"


def test_no_doctype_is_quirks():
    tree, _ = parse_document("<p>x</p>")
    assert tree.quirks_mode == "quirks"


def test_initial_whitespace_and_comment_placement():
    tree, _ = parse_document("  \n <!--before--> <!DOCTYPE html><p>x")
    kinds = [(tree.ntype[c], tree.name[c]) for c in tree.children(0)]
    assert kinds[0][0] == N_COMMENT
    assert kinds[1][0] == N_DOCTYPE
    assert kinds[2] == (N_ELEMENT, "html")


def test_implicit_skeleton():
    tree, _ = parse_document("hello")
    assert outline(tree) == [
        "#document",
        ["html", ["head"], ["body", "'hello'"]],
    ]


def test_empty_input_builds_skeleton():
    tree, _ = parse_document("")
    assert outline(tree) == ["#document", ["html", ["head"], ["body"]]]


def test_p_auto_close():
    tree, _ = parse_document("<body><p>one<p>two")
    body = _body(tree)
    ps = [c for c in tree.children(body) if tree.name[c] == "p"]
    assert len(ps) == 2
    assert tree.node_text(tree.first_child[ps[0]]) == "one"
    assert tree.node_text(tree.first_child[ps[1]]) == "two"


def test_li_auto_close_and_ul_end():
    tree, _ = parse_document("<ul><li>A<li>B</ul><div>after</div>")
    body = _body(tree)
    names = [tree.name[c] for c in tree.children(body)]
    assert names == ["ul", "div"]
    ul = next(iter(tree.children(body)))
    lis = [c for c in tree.children(ul)]
    assert [tree.name[c] for c in lis] == ["li", "li"]


def test_heading_implicit_close():
    tree, _ = parse_document("<h1>a<h2>b</h2>")
    body = _body(tree)
    names = [tree.name[c] for c in tree.children(body)]
    assert names == ["h1", "h2"]


def test_table_autoclose_cells():
    tree, _ = parse_document(
        "<table><tr><td>c1<td>c2<tr><td>c3</table><p>after"
    )
    body = _body(tree)
    names = [tree.name[c] for c in tree.children(body)]
    assert names == ["table", "p"]
    table = next(iter(tree.children(body)))
    trs = [c for c in tree.children(table) if tree.name[c] == "tr"]
    assert len(trs) == 2
    tds_row1 = [tree.name[c] for c in tree.children(trs[0])]
    assert tds_row1 == ["td", "td"]


def test_rawtext_script_content_is_text():
    tree, _ = parse_document("<script>if (a<b) {}</script>")
    script = _find(tree, "script")
    assert tree.node_text(tree.first_child[script]) == "if (a<b) {}"


def test_rcdata_title_entity_decoded():
    tree, _ = parse_document("<title>x &amp; y</title>")
    title = _find(tree, "title")
    assert tree.node_text(tree.first_child[title]) == "x & y"


def test_pre_skips_first_newline():
    tree, _ = parse_document("<pre>\ntext</pre>")
    pre = _find(tree, "pre")
    assert tree.node_text(tree.first_child[pre]) == "text"


def test_end_br_becomes_element():
    tree, _ = parse_document("a</br>b")
    body = _body(tree)
    names = [
        tree.name[c] if tree.ntype[c] == N_ELEMENT else "#text"
        for c in tree.children(body)
    ]
    assert names == ["#text", "br", "#text"]


def test_any_other_end_tag_closes_through():
    tree, _ = parse_document("<div><span>x</div>y")
    body = _body(tree)
    names = [
        tree.name[c] if tree.ntype[c] == N_ELEMENT else "#text"
        for c in tree.children(body)
    ]
    assert names == ["div", "#text"]


def test_stray_end_tag_ignored():
    tree, _ = parse_document("<div>x</table>y</div>")
    div = _find(tree, "div")
    assert tree.node_text(tree.first_child[div]) == "xy"


def test_null_stripped_in_body_text():
    tree, _ = parse_document("<body>a\x00b")
    body = _body(tree)
    assert tree.node_text(tree.first_child[body]) == "ab"


def test_comment_after_body():
    tree, _ = parse_document("<body>x</body><!--tail-->")
    html = next(
        c for c in tree.children(0) if tree.ntype[c] == N_ELEMENT
    )
    kids = list(tree.children(html))
    assert tree.ntype[kids[-1]] == N_COMMENT


def test_flat_arrays_are_consistent():
    tree, _ = parse_document("<div><p>a</p><p>b</p></div>")
    # first_child/next_sibling/parent must agree everywhere
    for nid in range(len(tree)):
        c = tree.first_child[nid]
        prev = -1
        while c != -1:
            assert tree.parent[c] == nid
            prev = c
            c = tree.next_sibling[c]
        assert tree.last_child[nid] == prev


# ------------------------------------------------------------- helpers
def _body(tree) -> int:
    for c in tree.children(0):
        if tree.ntype[c] == N_ELEMENT and tree.name[c] == "html":
            for cc in tree.children(c):
                if tree.name[cc] == "body":
                    return cc
    raise AssertionError("no body")


def _find(tree, name) -> int:
    for nid in range(len(tree)):
        if tree.ntype[nid] == N_ELEMENT and tree.name[nid] == name:
            return nid
    raise AssertionError(f"no <{name}>")


def test_formatting_reconstruction_across_paragraphs():
    tree, _ = parse_document("<body><p><b>bold<p>still bold")
    body = _body(tree)
    ps = [c for c in tree.children(body) if tree.name[c] == "b" or tree.name[c] == "p"]
    assert [tree.name[c] for c in tree.children(body)] == ["p", "p"]
    for p in tree.children(body):
        kids = list(tree.children(p))
        assert tree.name[kids[0]] == "b"


def test_code_reconstruction_keeps_kind():
    tree, _ = parse_document("<body><p><code>x</p><p>y</p>")
    body = _body(tree)
    for p in tree.children(body):
        kids = list(tree.children(p))
        assert tree.name[kids[0]] == "code"


def test_a_start_tag_closes_open_a():
    tree, _ = parse_document("<body><a href=1>one<a href=2>two")
    body = _body(tree)
    anchors = [c for c in tree.children(body) if tree.name[c] == "a"]
    assert len(anchors) == 2  # not nested


def test_noahs_ark_caps_reconstruction():
    tree, _ = parse_document("<body><p>" + "<b>" * 5 + "</p><p>x")
    body = _body(tree)
    second_p = list(tree.children(body))[1]
    depth = 0
    nid = tree.first_child[second_p]
    while nid != -1 and tree.name[nid] == "b":
        depth += 1
        nid = tree.first_child[nid]
    assert depth == 3  # Noah's Ark: at most 3 identical entries


def test_marker_clears_formatting_at_cell_boundary():
    # <b> opened inside a td must not leak into the next cell
    tree, _ = parse_document(
        "<body><table><tr><td><b>x</td><td>y</td></tr></table>"
    )
    tds = [i for i in range(len(tree)) if tree.name[i] == "td"]
    assert len(tds) == 2
    second_kids = [tree.name[c] for c in tree.children(tds[1])]
    assert "b" not in second_kids


def test_foster_parenting_text_before_table():
    tree, _ = parse_document("<body><table>stray<tr><td>cell</td></tr></table>")
    body = _body(tree)
    kids = [(tree.ntype[c], tree.name[c]) for c in tree.children(body)]
    # text node first, then the table
    assert kids[0][0] == N_TEXT
    assert kids[1] == (N_ELEMENT, "table")
    assert tree.node_text(tree.first_child[body]) == "stray"


def test_adoption_agency_classic_misnesting():
    # html5lib golden: <p>1<b>2<i>3</b>4</i>5
    tree, _ = parse_document("<body><p>1<b>2<i>3</b>4</i>5")
    body = _body(tree)
    p = next(iter(tree.children(body)))
    kids = list(tree.children(p))
    labels = [
        tree.name[c] if tree.ntype[c] == N_ELEMENT else tree.node_text(c)
        for c in kids
    ]
    assert labels == ["1", "b", "i", "5"]
    b_kids = list(tree.children(kids[1]))
    assert tree.node_text(b_kids[0]) == "2"
    assert tree.name[b_kids[1]] == "i"
    assert tree.node_text(tree.first_child[b_kids[1]]) == "3"
    assert tree.node_text(tree.first_child[kids[2]]) == "4"


def test_adoption_agency_formatting_across_block():
    # html5lib golden: <b>1<p>2</b>3</p> -> b{1}, p{b{2}, "3"}
    tree, _ = parse_document("<body><b>1<p>2</b>3</p>")
    body = _body(tree)
    kids = list(tree.children(body))
    assert [tree.name[c] for c in kids] == ["b", "p"]
    p_kids = list(tree.children(kids[1]))
    assert tree.name[p_kids[0]] == "b"
    assert tree.node_text(tree.first_child[p_kids[0]]) == "2"
    assert tree.node_text(p_kids[1]) == "3"


def test_adoption_agency_extraction_unchanged_text():
    from zhtml_spark.extract import extract_html

    spans, _ = extract_html("<body><p>1<b>2<i>3</b>4</i>5")
    assert spans == [("text", "12345", None)]
