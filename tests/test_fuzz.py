"""Property tests: the tokenizer is total — any input produces a valid
token stream with known error ids, and text round-trips when markup-free.
The reference has no randomized tests (SURVEY §5.4); this guards the
100 TB case where arbitrary byte soup reaches the pipeline.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from zhtml_spark.errors import SPEC_ERROR_IDS
from zhtml_spark.tokenizer import INITIAL_STATES, tokenize

_VALID_KINDS = {"Character", "StartTag", "EndTag", "Comment", "DOCTYPE"}

# Surrogates can't appear in decoded input (Arrow/UTF-8 guarantees this
# on the Spark path), so exclude them from generation.
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=300
)
_markupish = st.text(
    alphabet='<>&;!-/=" \'abAB#x09[]?\x00\r\n\t',
    max_size=300,
)


@settings(max_examples=300, deadline=None)
@given(_markupish)
def test_tokenizer_total_on_markup_soup(s: str) -> None:
    for state in ("Data", "RCDATA", "RAWTEXT", "ScriptData", "PLAINTEXT",
                  "CDATASection"):
        tokens, errors = tokenize(s, initial_state=state, last_start_tag="a")
        assert all(t[0] in _VALID_KINDS for t in tokens)
        assert all(e in SPEC_ERROR_IDS for e in errors)


_taggish = st.text(
    alphabet='<>/= "\'abcdABCD-_:.&;\t\n 0123456789`!?',
    max_size=200,
)


@settings(max_examples=500, deadline=None)
@given(_taggish)
def test_fast_tag_path_equivalent_to_state_machine(s: str) -> None:
    """The regex fast path must be observationally identical to the
    pure state machine: same tokens, same error multiset — INCLUDING
    source-offset tuples (r4: with_token_positions extends every
    token with its start offset; both paths must compute the same
    value, not just the same token)."""
    fast = tokenize(s, enable_fast_tags=True)
    slow = tokenize(s, enable_fast_tags=False)
    assert fast[0] == slow[0]
    assert sorted(fast[1]) == sorted(slow[1])
    fast_p = tokenize(s, enable_fast_tags=True, with_token_positions=True)
    slow_p = tokenize(s, enable_fast_tags=False, with_token_positions=True)
    assert fast_p[0] == slow_p[0]
    # stripping the offsets recovers the unpositioned stream exactly
    assert [t[:-1] for t in fast_p[0]] == fast[0]
    # offsets are monotone non-decreasing and in range
    offs = [t[-1] for t in fast_p[0]]
    assert all(0 <= o <= len(s) + 1 for o in offs)
    assert offs == sorted(offs)


@settings(max_examples=200, deadline=None)
@given(_taggish)
def test_fast_tag_path_equivalent_tree_aware(s: str) -> None:
    fast = tokenize(s, tree_aware=True, enable_fast_tags=True)
    slow = tokenize(s, tree_aware=True, enable_fast_tags=False)
    assert fast[0] == slow[0]
    assert sorted(fast[1]) == sorted(slow[1])


@settings(max_examples=200, deadline=None)
@given(_text)
def test_plain_text_round_trips(s: str) -> None:
    # No markup trigger chars → Data state must emit the text verbatim
    # (modulo CR normalization).
    if any(c in s for c in "<&\x00"):
        return
    tokens, errors = tokenize(s)
    norm = s.replace("\r\n", "\n").replace("\r", "\n")
    got = "".join(t[1] for t in tokens if t[0] == "Character")
    assert got == norm
    assert errors == []


def test_initial_state_names_cover_reference_harness() -> None:
    # /root/reference/test/tokenizer-html5lib.zig:260-270
    for name in ("Data", "PLAINTEXT", "RCDATA", "RAWTEXT", "ScriptData",
                 "CDATA section state"):
        assert name in INITIAL_STATES


# ---- full-pipeline totality: arbitrary interleaved span lists
_span_strategy = st.lists(
    st.tuples(
        st.sampled_from(["html", "text", "image", "video", "audio", "junk"]),
        st.one_of(st.none(), st.text(max_size=80)),
        st.one_of(st.none(), st.text(alphabet="abc:/0123456789", max_size=20)),
        st.integers(min_value=-5, max_value=50),
    ),
    max_size=8,
)


@settings(max_examples=200, deadline=None)
@given(_span_strategy)
def test_extract_document_total_on_arbitrary_spans(spans) -> None:
    from zhtml_spark.udfs import extract_document_safe

    out, errors, n_bytes = extract_document_safe(spans)
    # offsets implied by position; output tuples well-formed
    for kind, text, ref in out:
        assert kind in {"text", "heading", "list", "code", "table", "media"}
        assert text is None or isinstance(text, str)
    assert n_bytes >= 0


_formatting_soup = st.text(
    alphabet="<>/biaupem code strng13 \n\t='\"&;#x",
    max_size=400,
)


@settings(max_examples=500, deadline=None)
@given(_formatting_soup)
def test_tree_total_on_formatting_soup(s: str) -> None:
    """Adoption agency + reconstruction must never crash or corrupt the
    flat arrays, whatever the misnesting."""
    from zhtml_spark.tree import parse_document

    tree, errors = parse_document(s)
    # structural invariants hold after arbitrary AAA reparenting
    for nid in range(len(tree)):
        c = tree.first_child[nid]
        prev = -1
        seen = 0
        while c != -1:
            assert tree.parent[c] == nid
            prev = c
            c = tree.next_sibling[c]
            seen += 1
            assert seen < len(tree) + 1  # no cycles
        assert tree.last_child[nid] == prev


# -------------------------- table + foreign-content soup (round 2)
# The round-2 review found an infinite loop only reachable via
# foreign-content end tags at integration points — this grammar is
# biased to generate exactly that token neighborhood (svg/math/table
# structure tags, integration points, breakout tags, stray end tags).
_TF_TAGS = [
    "svg", "math", "desc", "title", "foreignObject", "annotation-xml",
    "mi", "mtext", "circle", "table", "tr", "td", "th", "tbody",
    "caption", "colgroup", "col", "p", "b", "div", "br", "textarea",
    "iframe", "select", "template", "li", "ul", "form", "input",
]
_tf_token = st.one_of(
    st.sampled_from([f"<{t}>" for t in _TF_TAGS]),
    st.sampled_from([f"</{t}>" for t in _TF_TAGS]),
    st.sampled_from([f"<{t}/>" for t in _TF_TAGS]),
    st.sampled_from(
        ['<annotation-xml encoding="text/html">', "<font color=x>",
         "<svg viewBox='0 0 1 1'>", "<input type=hidden>"]
    ),
    st.text(alphabet="ax y\n\t&;#<>='\"", max_size=8),
)
_table_foreign_soup = st.lists(_tf_token, max_size=60).map("".join)


@settings(max_examples=500, deadline=None)
@given(_table_foreign_soup)
def test_tree_total_on_table_foreign_soup(s: str) -> None:
    """Table modes + foreign dispatcher must terminate and keep the
    flat arrays consistent on arbitrary structure soup (the round-2
    review's infinite-loop class lives exactly here)."""
    from zhtml_spark.extract import extract_spans
    from zhtml_spark.tree import parse_document

    tree, errors = parse_document(s)
    for nid in range(len(tree)):
        c = tree.first_child[nid]
        prev = -1
        seen = 0
        while c != -1:
            assert tree.parent[c] == nid
            prev = c
            c = tree.next_sibling[c]
            seen += 1
            assert seen < len(tree) + 1  # no cycles
        assert tree.last_child[nid] == prev
    # extraction total over the same tree
    spans = extract_spans(tree)
    for kind, text, ref in spans:
        assert kind in {"text", "heading", "list", "code", "table", "media"}


@settings(max_examples=200, deadline=None)
@given(_table_foreign_soup)
def test_fragment_total_on_structure_soup(s: str) -> None:
    from zhtml_spark.tree import parse_fragment

    for ctx in ("div", "tr", "table", "td"):
        tree, root, errors = parse_fragment(s, ctx)
        assert 0 <= root < len(tree)


# ------------------- frameset + noscript + head soup (round 3)
# The r3 additions live in BeforeHead/InHead/InHeadNoscript and the
# frameset trio; this grammar is biased at exactly those transitions
# (head tags, frameset nesting, noscript under both scripting flags,
# stray body-committing tokens around late framesets).
_FS_TAGS = [
    "html", "head", "body", "frameset", "frame", "noframes",
    "noscript", "title", "style", "link", "meta", "base", "template",
    "p", "div", "b", "br", "img", "table", "select", "input", "a",
]
_fs_token = st.one_of(
    st.sampled_from([f"<{t}>" for t in _FS_TAGS]),
    st.sampled_from([f"</{t}>" for t in _FS_TAGS]),
    st.sampled_from(
        ["<frameset cols='1,2'>", "<input type=hidden>",
         "<meta charset=x>", "<link rel=canonical href=/c>",
         "<a href='/x'>", "<a href='p.png'>"]
    ),
    st.text(alphabet="zx y\n\t<>&='\"", max_size=8),
)
_frameset_soup = st.lists(_fs_token, max_size=50).map("".join)


@settings(max_examples=400, deadline=None)
@given(_frameset_soup, st.booleans())
def test_tree_total_on_frameset_noscript_soup(s: str, scripting) -> None:
    """The 23-mode chain must terminate and keep flat-array
    invariants on head/frameset/noscript soup under BOTH scripting
    flags; extraction (incl. link/meta harvesting) stays total."""
    from zhtml_spark.extract import ExtractConfig, extract_spans
    from zhtml_spark.tree import parse_document

    tree, errors = parse_document(s, scripting=scripting)
    for nid in range(len(tree)):
        c = tree.first_child[nid]
        prev = -1
        seen = 0
        while c != -1:
            assert tree.parent[c] == nid
            prev = c
            c = tree.next_sibling[c]
            seen += 1
            assert seen < len(tree) + 1  # no cycles
        assert tree.last_child[nid] == prev
    spans = extract_spans(
        tree, ExtractConfig(emit_links=True, emit_head_meta=True)
    )
    for kind, text, ref in spans:
        assert kind in {
            "text", "heading", "list", "code", "table", "media",
            "link", "meta",
        }
