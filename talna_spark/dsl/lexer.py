r"""Regex tokenizer for the filter DSL (reference src/query/lexer.rs:3-35,
operator O21), extended with the reference's declared Set syntax
``key:[a, b, c]`` (src/query/parser/mod.rs:14-100, planned per README).

Token kinds: NOT ``!``, AND, OR, LPAREN, RPAREN, STAR ``*`` (AllStar,
whole-expression special case handled by the parser), SET, WILDCARD, EQ.
Whitespace is skipped using the reference's EXACT class ``[ \r\t\n\f]``
(src/query/lexer.rs:4) — NOT Python's ``\s``: the reference lexes a
vertical tab or a Unicode space (U+00A0, ...) between tokens as an
ERROR, and so do we (r14 faithfulness audit; pinned in
tests/test_dsl.py). As of r15 the SAME exact class applies INSIDE the
Set bracket syntax ``key:[a, b]`` (previously Python's ``\s`` — a
Unicode superset — leaked in there, per ADVICE), so ``k:[a,<U+00A0>b]``
is a lex error just like the same byte between tokens. The
whole-string AllStar trim stays Unicode-aware in the parser, matching
Rust's ``str::trim``.

SET-EXTENSION PROVENANCE (r15 audit of the DORMANT nom parser,
src/query/parser/mod.rs — the syntax's only reference definition,
never reachable from the live API): the nom parser differs from the
live logos lexer on several axes, and this extension deliberately
follows the LIVE lexer's conventions uniformly rather than the
dormant module's:

- comma padding: nom ``space0`` = space/tab ONLY (mod.rs:37 —
  ``[a,\nb]`` would NOT parse there); we accept the live lexer's full
  ``[ \r\t\n\f]`` class, consistently with inter-token whitespace.
- bracket-edge padding: nom allows NONE (``tag("[")`` goes straight
  into the member list, mod.rs:34-42 — ``[ a]`` fails there); we allow
  the same class at both edges.
- empty members: nom's ``take_while`` matches zero chars, so
  ``[,a]`` parses as Set(["", "a"]) and ``[]`` as Set([""]) there —
  silently matching tag="" values; we require >= 1 chars per member
  and reject empty sets (a lex error beats a silent ""-Eq).
- charsets: nom values are Unicode ``char::is_alphanumeric`` + ``_-``
  WITHOUT dots (mod.rs:23), and nom keys admit digits (mod.rs:90);
  the live lexer's value class has dots and its key class has no
  digits — we use the live charsets so a Set member is exactly an Eq
  value.
- AST: nom desugars to one N-ARY Or node (mod.rs:66-80); we left-nest
  binary Ors — set-algebra identical.

Pinned executable in tests/test_dsl.py::test_set_extension_boundaries.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from talna_spark.errors import InvalidQueryError

KEY = r"[a-zA-Z_-]+"
VALUE = r"[a-zA-Z0-9_.\-]+"

# Order matters: SET before WILDCARD before EQ; keywords before nothing else
# can swallow them because KEY tokens always carry a ':'.
_TOKEN_RE = re.compile(
    rf"""
    (?P<WS>[\ \r\t\n\f]+)
  | (?P<SET>({KEY}):\[[\ \r\t\n\f]*{VALUE}([\ \r\t\n\f]*,[\ \r\t\n\f]*{VALUE})*[\ \r\t\n\f]*\])
  | (?P<WILDCARD>({KEY}):({VALUE})?\*)
  | (?P<EQ>({KEY}):({VALUE}))
  | (?P<AND>AND\b)
  | (?P<OR>OR\b)
  | (?P<NOT>!)
  | (?P<LPAREN>\()
  | (?P<RPAREN>\))
  | (?P<STAR>\*)
    """,
    re.VERBOSE,
)

_SET_SPLIT_RE = re.compile(rf"({KEY}):\[(.*)\]", re.DOTALL)


@dataclass(frozen=True)
class Token:
    kind: str  # AND OR NOT LPAREN RPAREN STAR SET WILDCARD EQ
    key: str | None = None
    value: str | None = None          # EQ value or WILDCARD prefix ("" allowed)
    values: tuple[str, ...] | None = None  # SET members


def tokenize(text: str) -> list[Token]:
    """Tokenize ``text``; raise :class:`InvalidQueryError` on any garbage.

    Mirrors the logos-derived lexer (reference src/query/lexer.rs:33-35):
    an unrecognized character is a lex error, surfaced as InvalidQuery.
    """
    tokens: list[Token] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise InvalidQueryError(
                f"invalid filter query: unexpected character at {pos}: {text[pos:]!r}"
            )
        pos = m.end()
        kind = m.lastgroup
        if kind == "WS":
            continue
        raw = m.group(0)
        if kind == "SET":
            sm = _SET_SPLIT_RE.fullmatch(raw)
            assert sm is not None
            key = sm.group(1)
            values = tuple(v.strip(" \r\t\n\f") for v in sm.group(2).split(","))
            tokens.append(Token("SET", key=key, values=values))
        elif kind == "WILDCARD":
            key, _, rest = raw.partition(":")
            tokens.append(Token("WILDCARD", key=key, value=rest[:-1]))  # strip '*'
        elif kind == "EQ":
            key, _, value = raw.partition(":")
            tokens.append(Token("EQ", key=key, value=value))
        else:
            tokens.append(Token(kind))
    return tokens
