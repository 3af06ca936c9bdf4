"""Differential tree-construction conformance: replay the generated
corpus (expected outlines from the INDEPENDENT MiniParser in
jobs/gen_tree_conformance.py — never from the engine) through the real
tokenize→tree path and compare full DOM outlines."""

from __future__ import annotations

import json
import os

import pytest

from zhtml_spark.tree import (
    N_COMMENT,
    N_ELEMENT,
    N_TEXT,
    parse_document,
)

FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "fixtures", "tree_conformance_generated.json",
)

with open(FIXTURE, encoding="utf-8") as f:
    _DOC = json.load(f)
CASES = _DOC["cases"]


def engine_outline(tree, nid):
    """Engine-side serializer in the generator's outline format:
    element → [label, *children], text → "#"+data.  Comments/doctype
    are excluded (the generator never produces them)."""
    t = tree.ntype[nid]
    if t == N_TEXT:
        return "#" + tree.node_text(nid)
    label = tree.name[nid]
    if tree.ns[nid] is not None:
        label = f"{tree.ns[nid]}:{label}"
    kids = [
        engine_outline(tree, c)
        for c in tree.children(nid)
        if tree.ntype[c] in (N_ELEMENT, N_TEXT)
    ]
    return [label] + kids


def _find_html(tree):
    for c in tree.children(0):
        if tree.ntype[c] == N_ELEMENT and tree.name[c] == "html":
            return c
    raise AssertionError("no html element")


@pytest.mark.parametrize(
    "case", CASES, ids=[c["description"] for c in CASES]
)
def test_tree_conformance(case):
    tree, _errors = parse_document(
        case["input"], scripting=case.get("scripting", True)
    )
    got = engine_outline(tree, _find_html(tree))
    assert got == case["expected"], (
        f"{case['description']}\ninput: {case['input']!r}\n"
        f"got:      {got}\nexpected: {case['expected']}"
    )


def test_corpus_size():
    assert _DOC["count"] == len(CASES) >= 300
