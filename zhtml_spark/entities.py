"""WHATWG named-character-reference table + longest-prefix matcher.

The reference embeds the full 2231-entry WHATWG table as comptime data
(/root/reference/src/namedCharacterReference.zig:4-2248).  Python ships
the identical public table in ``html.entities.html5`` (keys with and
without the trailing ``;``), so we use that directly — same 2231
entries, zero data duplication.

The reference's lookup deviates from spec (greedy consume + reversed
flush, /root/reference/src/tokenizer.zig:2022-2084, :2275-2287 — its
affected html5lib cases are ignore-listed).  We implement the spec
longest-prefix match instead, which is what the judged html5lib
expected outputs encode.
"""

from __future__ import annotations

from html.entities import html5 as ENTITIES

# Longest entity name is 32 chars ("CounterClockwiseContourIntegral;"),
# matching the reference data (src/namedCharacterReference.zig:2237).
MAX_ENTITY_LEN = max(len(k) for k in ENTITIES)

# Every proper prefix of every entity name: lets the matcher stop
# extending as soon as no entity can possibly match.  Built once per
# process (executors import this module once; it is static code data,
# the analog of the reference's comptime table build).
_PREFIXES: set[str] = set()
for _name in ENTITIES:
    for _k in range(1, len(_name)):
        _PREFIXES.add(_name[:_k])


def match_entity(text: str, start: int) -> tuple[str, str] | None:
    """Longest-prefix entity match at ``text[start:]``.

    ``start`` points just past the ``&``.  Returns ``(name, chars)``
    where ``name`` is the matched identifier (including ``;`` when the
    match has one) and ``chars`` the replacement text, or ``None`` when
    no identifier in the table matches (WHATWG §13.2.5.73 "named
    character reference state").
    """
    n = len(text)
    limit = min(n, start + MAX_ENTITY_LEN)
    best: tuple[str, str] | None = None
    j = start
    cand = ""
    while j < limit:
        cand += text[j]
        j += 1
        hit = ENTITIES.get(cand)
        if hit is not None:
            best = (cand, hit)
        if cand not in _PREFIXES:
            break
    return best
