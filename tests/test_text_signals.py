

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
