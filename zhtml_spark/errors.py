"""WHATWG §13.2.2 parse-error spec ids.

The reference declares the same set as a 51-variant enum
(/root/reference/src/parse_error.zig:1-52) and maps each variant to
these spec-id strings in its html5lib harness
(/root/reference/test/tokenizer-html5lib.zig:326-380).  We use the
spec-id strings directly everywhere (error lists, metrics maps).
"""

from __future__ import annotations

# Tokenizer-stage errors (WHATWG §13.2.2).
SPEC_ERROR_IDS: frozenset[str] = frozenset(
    {
        "abrupt-closing-of-empty-comment",
        "abrupt-doctype-public-identifier",
        "abrupt-doctype-system-identifier",
        "absence-of-digits-in-numeric-character-reference",
        "cdata-in-html-content",
        "character-reference-outside-unicode-range",
        "control-character-in-input-stream",
        "control-character-reference",
        "duplicate-attribute",
        "end-tag-with-attributes",
        "end-tag-with-trailing-solidus",
        "eof-before-tag-name",
        "eof-in-cdata",
        "eof-in-comment",
        "eof-in-doctype",
        "eof-in-script-html-comment-like-text",
        "eof-in-tag",
        "incorrectly-closed-comment",
        "incorrectly-opened-comment",
        "invalid-character-sequence-after-doctype-name",
        "invalid-first-character-of-tag-name",
        "missing-attribute-value",
        "missing-doctype-name",
        "missing-doctype-public-identifier",
        "missing-doctype-system-identifier",
        "missing-end-tag-name",
        "missing-quote-before-doctype-public-identifier",
        "missing-quote-before-doctype-system-identifier",
        "missing-semicolon-after-character-reference",
        "missing-whitespace-after-doctype-public-keyword",
        "missing-whitespace-after-doctype-system-keyword",
        "missing-whitespace-before-doctype-name",
        "missing-whitespace-between-attributes",
        "missing-whitespace-between-doctype-public-and-system-identifiers",
        "nested-comment",
        "noncharacter-character-reference",
        "noncharacter-in-input-stream",
        "non-void-html-element-start-tag-with-trailing-solidus",
        "null-character-reference",
        "surrogate-character-reference",
        "surrogate-in-input-stream",
        "unexpected-character-after-doctype-system-identifier",
        "unexpected-character-in-attribute-name",
        "unexpected-character-in-unquoted-attribute-value",
        "unexpected-equals-sign-before-attribute-name",
        "unexpected-null-character",
        "unexpected-question-mark-instead-of-tag-name",
        "unexpected-solidus-in-tag",
        "unknown-named-character-reference",
    }
)

# Input-preprocessing error codes that the reference harness explicitly
# skips when comparing (test/tokenizer-html5lib.zig:245-247); we do the
# same in tests and never emit them from the hot path.
PREPROCESSING_ERROR_IDS: frozenset[str] = frozenset(
    {
        "control-character-in-input-stream",
        "noncharacter-in-input-stream",
        "surrogate-in-input-stream",
    }
)
