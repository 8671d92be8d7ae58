"""Distributed unigram-LM (SentencePiece-style) trainer vs an
independent pure-Python reference implementation — exact piece-table and
encoding equality, partitioning-independence, and token-total
conservation through tokenize_pack(mode="unigram")."""

from __future__ import annotations

import math
import os
import shutil
import tempfile

import pandas as pd
import pytest

from talna_spark.pipeline.unigram import (
    UNK_LOGP,
    unigram_encode,
    unigram_train,
)


# --------------------------- reference implementation (test-side, pure py)
def _ref_word_counts(texts):
    counts = {}
    for t in texts:
        for w in t.lower().strip().split():
            if w:
                counts[w] = counts.get(w, 0) + 1
    return counts


def _ref_viterbi(w, logp, max_len, unk=UNK_LOGP):
    n = len(w)
    best = [0.0] + [float("-inf")] * n
    back = [0] * (n + 1)
    for j in range(1, n + 1):
        for i in range(max(0, j - max_len), j):
            p = logp.get(w[i:j])
            if p is None and j - i == 1:
                p = unk
            if p is not None and best[i] + p > best[j]:
                best[j] = best[i] + p
                back[j] = i
    out, j = [], n
    while j > 0:
        i = back[j]
        out.append(w[i:j])
        j = i
    out.reverse()
    return out


def _ref_m_step(counts):
    total = sum(counts.values())
    lt = math.log(total)
    return {
        p: (math.log(c) - lt if c > 0 else math.log(0.5) - lt)
        for p, c in counts.items()
    }


def _ref_train(
    texts, vocab_size, seed_size=1000, max_len=8, em_iters=2, shrink=0.75
):
    wc = _ref_word_counts(texts)
    # seeds: all chars + top multi-char substrings (cnt >= 2)
    sub = {}
    for w, n in wc.items():
        for i in range(len(w)):
            for j in range(i + 1, min(len(w), i + max_len) + 1):
                p = w[i:j]
                sub[p] = sub.get(p, 0) + n
    chars = {p: c for p, c in sub.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in sub.items() if len(p) >= 2 and c >= 2),
        key=lambda pc: (-pc[1], pc[0]),
    )
    counts = dict(chars)
    for p, c in multi[: max(seed_size - len(chars), 0)]:
        counts[p] = c
    logp = _ref_m_step(counts)

    def e_step(lp):
        out = {p: 0 for p in lp}
        for w, n in wc.items():
            for piece in _ref_viterbi(w, lp, max_len):
                if piece in out:
                    out[piece] += n
        return out

    while True:
        for _ in range(em_iters):
            counts = e_step(logp)
            logp = _ref_m_step(counts)
        if len(logp) <= vocab_size:
            break
        keep = max(vocab_size, int(len(logp) * shrink))
        if keep >= len(logp):
            break
        ch = {p: c for p, c in counts.items() if len(p) == 1}
        mu = sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )
        counts = dict(ch)
        for p, c in mu[: max(keep - len(ch), 0)]:
            counts[p] = c
        logp = _ref_m_step(counts)
    return sorted(logp.items())


@pytest.fixture(scope="module")
def corpus_dir():
    d = tempfile.mkdtemp(prefix="talna_unigram_")
    texts = [
        "low lower lowest low low",
        "new newer newest new news",
        "wide wider widest wide",
        "low new wide slow slower",
        "the lowest newest widest",
        "internationalization international nation nationally",
    ]
    pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}
    ).to_parquet(os.path.join(d, "documents.parquet"))
    yield d, texts
    shutil.rmtree(d, ignore_errors=True)


def test_unigram_train_matches_reference(spark, corpus_dir):
    d, texts = corpus_dir
    got = unigram_train(spark, d, vocab_size=40)
    want = _ref_train(texts, 40)
    assert [p for p, _ in got] == [p for p, _ in want]
    for (gp, gl), (_, wl) in zip(got, want):
        assert gl == wl, gp  # exact float equality: same formula, same ints
    # the model learned real multi-char pieces, not just the char floor
    assert any(len(p) > 2 for p, _ in got)


def test_unigram_train_partitioning_independent(spark, corpus_dir):
    d, texts = corpus_dir
    df = spark.read.parquet(f"{d}/documents.parquet")
    d2 = tempfile.mkdtemp(prefix="talna_unigram_rp_")
    try:
        df.repartition(7).write.parquet(f"{d2}/documents.parquet")
        assert unigram_train(spark, d2, vocab_size=40) == _ref_train(
            texts, 40
        )
    finally:
        shutil.rmtree(d2, ignore_errors=True)


def test_unigram_encode_matches_reference(spark, corpus_dir):
    d, texts = corpus_dir
    model = unigram_train(spark, d, vocab_size=40)
    logp = dict(model)
    max_len = max(len(p) for p in logp)
    got = {
        r["doc_id"]: r for r in unigram_encode(spark, d, model).collect()
    }
    for doc_id, t in enumerate(texts):
        ws = [w for w in t.lower().strip().split() if w]
        n_tok = sum(len(_ref_viterbi(w, logp, max_len)) for w in ws)
        n_chars = sum(len(w) for w in ws)
        assert got[doc_id]["n_words"] == len(ws)
        assert got[doc_id]["n_unigram_tokens"] == n_tok
        assert got[doc_id]["compression"] == pytest.approx(
            round(n_chars / n_tok, 6), abs=1e-9
        )


def test_unigram_encode_unseen_chars_total(spark, corpus_dir):
    # a document full of chars the model never saw still encodes (one
    # UNK single-char piece each), never crashes or drops rows
    d, _ = corpus_dir
    model = unigram_train(spark, d, vocab_size=40)
    d2 = tempfile.mkdtemp(prefix="talna_unigram_unk_")
    try:
        pd.DataFrame(
            {"doc_id": [0, 1], "text": ["zzz über", None]}
        ).to_parquet(os.path.join(d2, "documents.parquet"))
        got = {
            r["doc_id"]: r
            for r in unigram_encode(spark, d2, model).collect()
        }
        assert got[0]["n_words"] == 2
        assert got[0]["n_unigram_tokens"] >= 2  # segmented, not dropped
        assert got[1]["n_words"] == 0 and got[1]["n_unigram_tokens"] == 0
    finally:
        shutil.rmtree(d2, ignore_errors=True)


def test_unigram_beats_char_segmentation(spark, corpus_dir):
    # sanity: the learned model compresses better than chars-only —
    # mean tokens/word strictly below mean chars/word
    d, texts = corpus_dir
    model = unigram_train(spark, d, vocab_size=40)
    rows = unigram_encode(spark, d, model).collect()
    n_tok = sum(r["n_unigram_tokens"] for r in rows)
    n_chars = sum(
        len(w) for t in texts for w in t.lower().strip().split() if w
    )
    assert n_tok < n_chars


def test_tokenize_pack_unigram_conserves_tokens(spark, corpus_dir):
    from talna_spark.pipeline.packing import pack_stats, tokenize_pack

    d, texts = corpus_dir
    packed = tokenize_pack(spark, d, mode="unigram", budget=32, n_shards=4)
    rows = packed.collect()
    assert {r["doc_id"] for r in rows} == set(range(len(texts)))
    # token totals conserved through packing
    enc_total = sum(r["n_bpe_tokens"] for r in rows)
    stats = pack_stats(
        packed.withColumnRenamed("n_bpe_tokens", "n_tokens"), budget=32
    ).collect()
    assert sum(r["tokens"] for r in stats) == enc_total
    # every non-oversize pack respects the budget
    for r in stats:
        assert r["oversize"] or r["tokens"] <= 32


def test_unigram_train_validation(spark, corpus_dir):
    d, _ = corpus_dir
    with pytest.raises(ValueError, match="vocab_size"):
        unigram_train(spark, d, vocab_size=0)
    with pytest.raises(ValueError, match="shrink"):
        unigram_train(spark, d, shrink=1.5)


def test_unigram_train_terminates_when_chars_exceed_vocab(spark):
    """Regression: a corpus with more distinct single characters than
    vocab_size must terminate (vocabulary lands at the char floor), not
    re-run EM + a no-op prune forever. 30 distinct chars, vocab_size=5."""
    d = tempfile.mkdtemp(prefix="talna_unigram_chars_")
    try:
        # 30 distinct single-char words -> char floor of 30 > vocab 5
        chars = [chr(ord("a") + i) for i in range(26)] + list("0123")
        texts = [" ".join(chars), " ".join(reversed(chars))]
        pd.DataFrame(
            {"doc_id": range(len(texts)), "text": texts}
        ).to_parquet(os.path.join(d, "documents.parquet"))
        model = unigram_train(spark, d, vocab_size=5, em_iters=1)
        got = {p for p, _ in model}
        assert got == set(chars)  # char floor, nothing pruned
        assert unigram_train(spark, d, vocab_size=5, em_iters=1) == model
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_unigram_encode_ids_matches_reference_segmentation(spark, corpus_dir):
    from talna_spark.pipeline.unigram import (
        UNK_ID_BASE, unigram_encode, unigram_encode_ids, unigram_train,
    )

    d, texts = corpus_dir
    model = unigram_train(spark, d, vocab_size=40)
    logp = dict(model)
    pid = {p: i for i, (p, _l) in enumerate(sorted(model))}
    max_len = max(len(p) for p in logp)
    got = {
        r["doc_id"]: r
        for r in unigram_encode_ids(spark, d, model).collect()
    }
    enc = {
        r["doc_id"]: r for r in unigram_encode(spark, d, model).collect()
    }
    for doc_id, t in enumerate(texts):
        want = []
        for w in t.lower().strip().split():
            if w:
                for p in _ref_viterbi(w, logp, max_len):
                    want.append(
                        pid[p] if p in pid else UNK_ID_BASE + ord(p)
                    )
        assert list(got[doc_id]["ids"]) == want, doc_id
        # agrees with the count encoder by construction
        assert got[doc_id]["n_unigram_tokens"] == enc[doc_id]["n_unigram_tokens"]
    # every in-vocab id is invertible back to its piece
    inv = {i: p for p, i in pid.items()}
    for r in got.values():
        for i in r["ids"]:
            assert i in inv or i >= UNK_ID_BASE


def test_pack_token_ids_unigram_mode(spark, corpus_dir):
    from talna_spark.pipeline.packing import pack_token_ids
    from talna_spark.pipeline.unigram import unigram_encode_ids, unigram_train

    d, _texts = corpus_dir
    model = unigram_train(spark, d, vocab_size=40)
    packs = pack_token_ids(
        spark, d, model, budget=32, n_shards=4, mode="unigram"
    ).collect()
    enc = unigram_encode_ids(spark, d, model).collect()
    # token conservation through the tensor path
    assert sum(r["n_tokens"] for r in packs) == sum(
        r["n_unigram_tokens"] for r in enc
    )
    assert sum(len(r["ids"]) for r in packs) == sum(
        len(r["ids"]) for r in enc
    )
    for r in packs:
        assert r["oversize"] or r["n_tokens"] <= 32
        assert len(r["ids"]) == r["n_tokens"]


def test_tokenizer_persistence_round_trip(spark, corpus_dir, tmp_path):
    """Engine-neutral parquet persistence for BOTH tokenizer families:
    the loaded model reproduces training output exactly (unigram ids
    depend on the sorted order, so the round trip must preserve it),
    and corrupted tables fail loudly."""
    import pytest as _pytest

    from talna_spark.pipeline.bpe import bpe_train, load_merges, save_merges
    from talna_spark.pipeline.unigram import (
        load_unigram, save_unigram, unigram_encode_ids,
    )

    d, _texts = corpus_dir
    merges = bpe_train(spark, d, n_merges=12)
    mp = str(tmp_path / "merges")
    save_merges(spark, merges, mp)
    assert load_merges(spark, mp) == merges

    model = unigram_train(spark, d, vocab_size=40)
    up = str(tmp_path / "uni")
    save_unigram(spark, model, up)
    loaded = load_unigram(spark, up)
    assert loaded == model
    a = sorted(
        map(tuple, unigram_encode_ids(spark, d, model).collect())
    )
    b = sorted(
        map(tuple, unigram_encode_ids(spark, d, loaded).collect())
    )
    assert a == b

    # loud failures: rank gap / duplicate piece
    bad = str(tmp_path / "badm")
    spark.createDataFrame(
        [(0, "a", "b"), (2, "c", "d")], "rank long, a string, b string"
    ).write.parquet(bad)
    with _pytest.raises(ValueError, match="rank gaps"):
        load_merges(spark, bad)
    # duplicate ranks collapse in the rank dict, so set(by_rank) still
    # equals range(n): must be caught by the row-count check, not pass
    # silently with a collect-order-dependent winner
    baddup = str(tmp_path / "baddupm")
    spark.createDataFrame(
        [(0, "a", "b"), (1, "c", "d"), (1, "e", "f")],
        "rank long, a string, b string",
    ).write.parquet(baddup)
    with _pytest.raises(ValueError, match="duplicate ranks"):
        load_merges(spark, baddup)
    badu = str(tmp_path / "badu")
    spark.createDataFrame(
        [("x", -1.0), ("x", -2.0)], "piece string, logp double"
    ).write.parquet(badu)
    with _pytest.raises(ValueError, match="duplicate"):
        load_unigram(spark, badu)


def test_merge_pretokenizer_stamp(spark, corpus_dir, tmp_path):
    """ADVICE r12: byte-mode merges persisted under one pretokenizer
    must not silently load under another — the stamp round-trips, a
    stamped-vs-expected mismatch raises, and an UNstamped (pre-r13)
    artifact raises when a stamp is required."""
    import pytest as _pytest

    from talna_spark.pipeline.bpe import (
        PRETOKENIZER_VERSION, bpe_train, load_merges, save_merges,
    )

    d, _texts = corpus_dir
    merges = bpe_train(spark, d, n_merges=8)

    stamped = str(tmp_path / "stamped")
    save_merges(spark, merges, stamped, pretokenizer=PRETOKENIZER_VERSION)
    # stamp satisfied -> identical merges; stamp ignored when not asked
    assert (
        load_merges(spark, stamped, expect_pretokenizer=PRETOKENIZER_VERSION)
        == merges
    )
    assert load_merges(spark, stamped) == merges

    # trained under a DIFFERENT pretokenizer -> loud failure
    with _pytest.raises(ValueError, match="pretokenizer"):
        load_merges(
            spark, stamped, expect_pretokenizer="gpt2-approx/legacy"
        )

    # pre-r13 artifact (no pretok column) -> loud failure when required
    bare = str(tmp_path / "bare")
    save_merges(spark, merges, bare)
    with _pytest.raises(ValueError, match="no pretokenizer stamp"):
        load_merges(spark, bare, expect_pretokenizer=PRETOKENIZER_VERSION)


# ----------------------- soft (forward-backward) EM, r10
def _ref_posteriors(w, logp, max_len, unk=UNK_LOGP):
    arcs = []
    n = len(w)
    for j in range(1, n + 1):
        for i in range(max(0, j - max_len), j):
            p = logp.get(w[i:j])
            if p is None and j - i == 1:
                p = unk
            if p is not None:
                arcs.append((i, j, p))

    def lse(vals):
        m = max(vals)
        if m == float("-inf"):
            return m
        return m + math.log(sum(math.exp(v - m) for v in vals))

    alpha = [0.0] + [float("-inf")] * n
    for j in range(1, n + 1):
        alpha[j] = lse([alpha[i] + p for (i, jj, p) in arcs if jj == j])
    beta = [float("-inf")] * n + [0.0]
    for i in range(n - 1, -1, -1):
        beta[i] = lse([p + beta[j] for (ii, j, p) in arcs if ii == i])
    z = alpha[n]
    return [
        (w[i:j], math.exp(alpha[i] + p + beta[j] - z)) for (i, j, p) in arcs
    ]


def _ref_train_soft(
    texts, vocab_size, seed_size=1000, max_len=8, em_iters=2, shrink=0.75
):
    wc = _ref_word_counts(texts)
    sub = {}
    for w, n in wc.items():
        for i in range(len(w)):
            for j in range(i + 1, min(len(w), i + max_len) + 1):
                p = w[i:j]
                sub[p] = sub.get(p, 0) + n
    chars = {p: c for p, c in sub.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in sub.items() if len(p) >= 2 and c >= 2),
        key=lambda pc: (-pc[1], pc[0]),
    )
    counts = dict(chars)
    for p, c in multi[: max(seed_size - len(chars), 0)]:
        counts[p] = c
    logp = _ref_m_step(counts)

    def e_step(lp):
        out = {p: 0 for p in lp}
        for w, n in wc.items():
            for piece, post in _ref_posteriors(w, lp, max_len):
                m = int(math.floor(post * n * 1e6 + 0.5))
                if m and piece in out:
                    out[piece] += m
        return out

    while True:
        for _ in range(em_iters):
            counts = e_step(logp)
            logp = _ref_m_step(counts)
        if len(logp) <= vocab_size:
            break
        keep = max(vocab_size, int(len(logp) * shrink))
        if keep >= len(logp):
            break
        ch = {p: c for p, c in counts.items() if len(p) == 1}
        mu = sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )
        counts = dict(ch)
        for p, c in mu[: max(keep - len(ch), 0)]:
            counts[p] = c
        logp = _ref_m_step(counts)
    return sorted(logp.items())


def test_unigram_soft_em_matches_reference(spark, corpus_dir):
    d, texts = corpus_dir
    got = unigram_train(spark, d, vocab_size=40, em="soft")
    want = _ref_train_soft(texts, 40)
    assert [p for p, _ in got] == [p for p, _ in want]
    for (gp, gl), (_, wl) in zip(got, want):
        assert gl == wl, gp
    assert any(len(p) > 2 for p, _ in got)


def test_unigram_soft_em_partitioning_independent(spark, corpus_dir):
    # the micro-unit quantization BEFORE the aggregate is what makes a
    # float-valued E-step partitioning-safe — pin it
    d, texts = corpus_dir
    df = spark.read.parquet(f"{d}/documents.parquet")
    d2 = tempfile.mkdtemp(prefix="talna_unigram_soft_rp_")
    try:
        df.repartition(5).write.parquet(f"{d2}/documents.parquet")
        assert unigram_train(
            spark, d2, vocab_size=40, em="soft"
        ) == _ref_train_soft(texts, 40)
    finally:
        shutil.rmtree(d2, ignore_errors=True)


def test_unigram_em_mode_validation(spark, corpus_dir):
    d, _ = corpus_dir
    with pytest.raises(ValueError, match="em"):
        unigram_train(spark, d, em="viterbi")


def test_unigram_train_local_matches_distributed(
    spark, corpus_dir, monkeypatch
):
    # r17: in-process vs distributed trainer — identical model in both
    # EM modes (integer count accounting on both paths)
    import talna_spark.pipeline.bpe as bpe_mod
    from talna_spark.pipeline.unigram import unigram_train

    d, _texts = corpus_dir
    for em in ("hard", "soft"):
        local = unigram_train(spark, d, em=em)
        monkeypatch.setattr(bpe_mod, "DRIVER_TRAIN_MAX_WORDS", 0)
        dist = unigram_train(spark, d, em=em)
        monkeypatch.setattr(bpe_mod, "DRIVER_TRAIN_MAX_WORDS", 65_536)
        assert dist == local
        assert len(local) > 10
