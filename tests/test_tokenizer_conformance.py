"""Extended tokenizer conformance replay — the GENERATED spec-derived
corpus (tests/fixtures/tokenizer_conformance_generated.json; see
test_generated_corpus_scale for the size floor).

Why generated: the html5lib-tests submodule the reference wires
(/root/reference/test/tokenizer-html5lib.zig:63-77) is an EMPTY
directory in this sandbox and there is no network access or Zig
toolchain, so the literal test1-test4 files cannot be obtained.  This
corpus stands in for them at comparable or larger scale: every named
character reference in the spec's own table (2,231 entries — the bulk
of html5lib's entity coverage), the historical attribute suppression
rule per entry, a full numeric-reference sweep (C1 remap rows,
surrogates, noncharacters, range errors), EOF in every construct
family, comment/DOCTYPE/script-escape edge cases, and CR preprocessing.
Expected outputs are derived from the WHATWG rules and spec tables by
jobs/gen_tokenizer_conformance.py WITHOUT calling the engine, so a
tokenizer bug cannot self-certify.

Harness semantics identical to test_tokenizer.py (== the reference's
harness, test/tokenizer-html5lib.zig:79-173): Character tokens
coalesced, errors by spec-id, exact equality.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from zhtml_spark.errors import PREPROCESSING_ERROR_IDS, SPEC_ERROR_IDS
from zhtml_spark.tokenizer import tokenize

from test_tokenizer import coalesce, expected_errors, to_html5lib

FIXTURE = (
    Path(__file__).parent
    / "fixtures"
    / "tokenizer_conformance_generated.json"
)
CASES = json.loads(FIXTURE.read_text())["tests"]


def _run_case(case: dict) -> None:
    states = case.get("initialStates", ["Data"])
    for state in states:
        tokens, errors = tokenize(
            case["input"],
            initial_state=state,
            last_start_tag=case.get("lastStartTag"),
        )
        got = coalesce(to_html5lib(tokens))
        want = coalesce(case["output"])
        assert got == want, f"{case['description']} [{state}]"
        got_errors = sorted(
            e for e in errors if e not in PREPROCESSING_ERROR_IDS
        )
        assert got_errors == expected_errors(case), (
            f"{case['description']} [{state}] errors"
        )


# Entities dominate the corpus (4,000+ subcases); replay them in chunks
# so pytest collection stays fast while failures still name the case.
_CHUNK = 200


@pytest.mark.parametrize("chunk", range(0, len(CASES), _CHUNK))
def test_conformance_chunk(chunk: int) -> None:
    for case in CASES[chunk:chunk + _CHUNK]:
        _run_case(case)


def test_generated_fixture_error_codes_valid() -> None:
    for case in CASES:
        for e in case.get("errors", []):
            assert e["code"] in SPEC_ERROR_IDS, e


def test_generated_corpus_scale() -> None:
    """The stand-in corpus must stay well past html5lib scale (~1,700
    non-ignored cases in test1-test4): regression guard."""
    assert len(CASES) >= 7000
