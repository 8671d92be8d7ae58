

def test_winnow_fingerprints_guarantees(spark, tmp_path):
    """The two published winnowing guarantees (Schleimer et al. 2003)
    plus the rightmost tie rule and containment, on a crafted corpus:
    (a) every selected (pos, h) is the true hash at that position;
    (b) DENSITY — every window of w consecutive grams contains at
    least one selected position; (c) two docs sharing >= t = w + k - 1
    consecutive tokens share a fingerprint hash; (d) a window whose
    minimum appears twice selects the RIGHTMOST occurrence; and the
    DuckDB twin agrees exactly."""
    import hashlib
    import os

    import duckdb
    import pandas as pd

    from talna_spark.pipeline.text import (
        FINGERPRINT_K,
        WINNOW_W,
        winnow_fingerprints,
        winnow_fingerprints_sql,
    )

    k, w = FINGERPRINT_K, WINNOW_W
    t = w + k - 1
    shared = " ".join(f"common{i}" for i in range(t))  # exactly t tokens
    texts = {
        0: "alpha beta gamma delta " * 8 + shared,
        1: shared + " omega psi chi phi " * 8,
        2: "tiny doc",                      # < w grams -> no fingerprints
        3: ("rep " * (k + w * 2)).strip(),  # all grams identical: max ties
    }
    d = str(tmp_path / "wf")
    os.makedirs(d)
    pd.DataFrame(
        {"doc_id": list(texts), "text": [texts[i] for i in texts]}
    ).to_parquet(f"{d}/documents.parquet")

    got: dict = {}
    for r in winnow_fingerprints(spark, d).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["h"]))

    def hash64_py(s):  # the portable hash, test-side
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    for did, text in texts.items():
        words = text.lower().strip().split()
        hs = [
            hash64_py(" ".join(words[i : i + k]))
            for i in range(len(words) - k + 1)
        ]
        fps = got.get(did, set())
        if len(hs) < w:
            assert fps == set(), did
            continue
        # (a) containment
        for pos, h in fps:
            assert hs[pos] == h, (did, pos)
        # (b) density: every w-window covered
        sel = sorted(p for p, _ in fps)
        for i in range(len(hs) - w + 1):
            assert any(i <= p < i + w for p in sel), (did, i)
        # (d) rightmost tie rule, checked against the reference rule
        want = set()
        for i in range(len(hs) - w + 1):
            window = hs[i : i + w]
            mn = min(window)
            j = max(idx for idx, v in enumerate(window) if v == mn)
            want.add((i + j, mn))
        assert fps == want, did
    # doc 3 is all-identical grams: the rightmost rule picks the LAST
    # gram of each window, so positions step 1-by-1 from w-1 onward
    n3 = len(texts[3].split()) - k + 1
    assert {p for p, _ in got[3]} == set(range(w - 1, n3))

    # (c) the matching guarantee across docs 0 and 1
    h0 = {h for _, h in got[0]}
    h1 = {h for _, h in got[1]}
    assert h0 & h1, "docs sharing t consecutive tokens must share a hash"

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    orc: dict = {}
    for did, pos, h in con.execute(winnow_fingerprints_sql()).fetchall():
        orc.setdefault(did, set()).add((pos, h))
    assert orc == got


# ------------------------------------------- encoding repair + NFC (r13)
def test_fix_mojibake_repairs_and_stays_conservative(spark):
    """Single and double cp1252 mojibake unwind (rounds 1 / 2), clean
    ASCII and genuinely-accented text pass untouched (rounds 0), NULL
    stays NULL, and other columns ride through."""
    from talna_spark.pipeline.text import fix_mojibake

    cafe = "caf\u00e9"
    euro_moji = "price: \u00e2\u201a\u00ac5"  # euro sign through cp1252
    cafe1 = "caf\u00c3\u00a9"            # cafe decoded once as cp1252
    cafe2 = "caf\u00c3\u0192\u00c2\u00a9"  # decoded twice (0x83 -> U+0192)
    rows = [
        (1, cafe1, "a"),
        (2, cafe2, "b"),
        (3, "clean text", "c"),
        (4, cafe, "d"),     # real accented text -- must not change
        (5, None, "e"),
        (6, euro_moji, "f"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, tag string")
    got = {
        r["doc_id"]: (r["text_fixed"], r["text_fixed_rounds"], r["tag"])
        for r in fix_mojibake(d).collect()
    }
    assert got[1] == (cafe, 1, "a")
    assert got[2] == (cafe, 2, "b")
    assert got[3] == ("clean text", 0, "c")
    assert got[4] == (cafe, 0, "d")
    assert got[5] == (None, 0, "e")
    assert got[6] == ("price: \u20ac5", 1, "f")
    # input frame's schema is untouched (StructType.add mutates --
    # regression guard for the shared-schema bug)
    assert d.columns == ["doc_id", "text", "tag"]


def test_nfc_normalize_matches_duckdb_and_is_idempotent(spark):
    """CPython's unicodedata NFC and DuckDB's nfc_normalize are two
    INDEPENDENT implementations of the same Unicode algorithm -- they
    must agree byte-for-byte on composition, mark reordering, Hangul
    jamo, and on LEAVING NFKC-only compatibility forms."""
    import duckdb

    from talna_spark.pipeline.text import (
        NFC_DECORATIONS,
        nfc_normalize_text,
    )

    rows = [(i, f"doc {i} " + d) for i, d in enumerate(NFC_DECORATIONS)]
    rows.append((len(rows), None))
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text_nfc"] for r in nfc_normalize_text(d).collect()
    }
    con = duckdb.connect()
    for i, t in rows:
        if t is None:
            assert got[i] is None
            continue
        want = con.execute(
            "SELECT nfc_normalize(?)", [t]
        ).fetchone()[0]
        assert got[i] == want, (i, t)
    # idempotent: normalizing the normalized output changes nothing
    d2 = spark.createDataFrame(
        [(k, v) for k, v in got.items() if v is not None],
        "doc_id long, text string",
    )
    again = {
        r["doc_id"]: r["text_nfc"] for r in nfc_normalize_text(d2).collect()
    }
    assert again == {k: v for k, v in got.items() if v is not None}
    # the NFKC-only decoration is genuinely unchanged by NFC
    import unicodedata

    i_nfkc = 4  # NFC_DECORATIONS[4] is the compatibility-form entry
    assert got[i_nfkc] == rows[i_nfkc][1]
    assert unicodedata.normalize("NFKC", got[i_nfkc]) != got[i_nfkc]


def test_char_entropy_closed_forms_and_cross_engine(spark, tmp_path):
    """A two-symbol uniform string scores exactly 1 bit/char (1e9
    nano-bits total), a one-symbol string exactly 0, repeated junk
    scores below prose, empty text reports zeros — and DuckDB computes
    the identical integer nano-bit sums."""
    import duckdb

    from talna_spark.pipeline.text import char_entropy, char_entropy_sql

    rows = [
        (0, "ab" * 50),
        (1, "x" * 80),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "aaaaabaaaaabaaaaab"),
        (4, ""),
    ]
    d = str(tmp_path / "ent")
    spark.createDataFrame(rows, "doc_id long, text string").selectExpr(
        "doc_id", "text", "'en' AS lang", "'s' AS source", "1 AS n_chars"
    ).write.parquet(f"{d}/documents.parquet")
    got = {
        r["doc_id"]: (
            r["n_chars"], r["distinct_chars"], r["entropy_nanobits"]
        )
        for r in char_entropy(spark, d).collect()
    }
    assert got[0] == (100, 2, 10 ** 9)  # exactly 1 bit/char
    assert got[1] == (80, 1, 0)
    assert got[4] == (0, 0, 0)
    # prose beats looping junk on the same length scale
    assert got[2][2] / got[2][0] > got[3][2] / got[3][0]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{d}/documents.parquet/*.parquet'"
    )
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(char_entropy_sql()).fetchall()
    }
    assert got == want
