"""Distributed WordPiece trainer/encoder vs an independent pure-Python
reference — exact vocabulary and segmentation equality, partitioning
independence, UNK fallback, persistence, and token-total conservation
through tokenize_pack(mode="wordpiece") (the test_unigram.py pattern)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pandas as pd
import pytest

from talna_spark.pipeline.wordpiece import (
    WP_CONT,
    load_wordpiece,
    save_wordpiece,
    wordpiece_encode,
    wordpiece_train,
)


# --------------------------- reference implementation (test-side, pure py)
def _ref_word_counts(texts):
    counts = {}
    for t in texts:
        for w in t.lower().strip().split():
            if w:
                counts[w] = counts.get(w, 0) + 1
    return counts


def _ref_merge_name(a, b):
    return a + (b[len(WP_CONT):] if b.startswith(WP_CONT) else b)


def _ref_train(texts, n_merges):
    wc = _ref_word_counts(texts)
    segs = {w: [w[0]] + [WP_CONT + c for c in w[1:]] for w in wc}
    alphabet = sorted({s for syms in segs.values() for s in syms})
    vocab = list(alphabet)
    seen = set(vocab)
    for _ in range(n_merges):
        pair_cnt, sym_cnt = {}, {}
        for w, n in wc.items():
            syms = segs[w]
            for s in syms:
                sym_cnt[s] = sym_cnt.get(s, 0) + n
            for x, y in zip(syms, syms[1:]):
                pair_cnt[(x, y)] = pair_cnt.get((x, y), 0) + n
        cands = [
            (c / (sym_cnt[a] * sym_cnt[b]), a, b)
            for (a, b), c in pair_cnt.items()
            if c >= 2
        ]
        if not cands:
            break
        _, a, b = min(cands, key=lambda t: (-t[0], t[1], t[2]))
        merged = _ref_merge_name(a, b)
        if merged not in seen:
            seen.add(merged)
            vocab.append(merged)
        for w in segs:
            syms, out, i = segs[w], [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[w] = out
    return vocab


def _ref_encode_word(w, vs, maxlen):
    """(n_pieces, is_unk) under greedy longest-match-first."""
    n, i, pieces = len(w), 0, 0
    while i < n:
        j = min(n, i + maxlen)
        while j > i:
            piece = w[i:j] if i == 0 else WP_CONT + w[i:j]
            if piece in vs:
                break
            j -= 1
        if j == i:
            return 1, 1
        pieces += 1
        i = j
    return pieces, 0


@pytest.fixture(scope="module")
def corpus_dir():
    d = tempfile.mkdtemp(prefix="talna_wp_")
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


def test_wordpiece_train_matches_reference(spark, corpus_dir):
    d, texts = corpus_dir
    got = wordpiece_train(spark, d, n_merges=20)
    want = _ref_train(texts, 20)
    assert got == want
    # real multi-char pieces were learned, in both prefix classes
    assert any(len(p) > 2 and not p.startswith(WP_CONT) for p in got)
    assert any(len(p) > 4 and p.startswith(WP_CONT) for p in got)


def test_wordpiece_train_partitioning_independent(spark, corpus_dir):
    d, texts = corpus_dir
    df = spark.read.parquet(f"{d}/documents.parquet")
    d2 = tempfile.mkdtemp(prefix="talna_wp_rp_")
    try:
        df.repartition(7).write.parquet(f"{d2}/documents.parquet")
        assert wordpiece_train(spark, d2, n_merges=20) == _ref_train(
            texts, 20
        )
    finally:
        shutil.rmtree(d2, ignore_errors=True)


def test_wordpiece_encode_matches_reference(spark, corpus_dir):
    d, texts = corpus_dir
    vocab = wordpiece_train(spark, d, n_merges=20)
    vs = frozenset(vocab)
    maxlen = max(len(p) for p in vs)
    got = {
        r["doc_id"]: (r["n_words"], r["n_wp_tokens"], r["n_unk_words"])
        for r in wordpiece_encode(spark, d, vocab).collect()
    }
    for i, t in enumerate(texts):
        ws = [w for w in t.lower().strip().split() if w]
        stats = [_ref_encode_word(w, vs, maxlen) for w in ws]
        want = (len(ws), sum(p for p, _ in stats), sum(u for _, u in stats))
        assert got[i] == want, (i, got[i], want)
    assert sum(v[2] for v in got.values()) == 0  # in-corpus: no UNKs


def test_wordpiece_unk_fallback_and_null_text(spark, tmp_path):
    """A word with any unmatchable position is ONE [UNK] token (the
    whole-word fallback), and NULL/empty docs encode as zero rows'
    worth of tokens, not crashes."""
    dtrain = str(tmp_path / "wp_train")
    os.makedirs(dtrain)
    pd.DataFrame(
        {"doc_id": [0], "text": ["abba abab baab abba"]}
    ).to_parquet(f"{dtrain}/documents.parquet")
    vocab = wordpiece_train(spark, dtrain, n_merges=8)
    denc = str(tmp_path / "wp_enc")
    os.makedirs(denc)
    pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["abba abab baab", None, "abba ZZ@@qq abba"],
        }
    ).to_parquet(f"{denc}/documents.parquet")
    got = {
        r["doc_id"]: (r["n_words"], r["n_wp_tokens"], r["n_unk_words"])
        for r in wordpiece_encode(spark, denc, vocab).collect()
    }
    assert got[1] == (0, 0, 0)
    # doc 2: 'zz@@qq' has chars outside the trained alphabet -> ONE UNK
    # word (whole-word fallback), the in-vocab neighbors encode normally
    assert got[2][0] == 3 and got[2][2] == 1
    vs = frozenset(vocab)
    maxlen = max(len(p) for p in vs)
    p, u = _ref_encode_word("zz@@qq", vs, maxlen)
    assert (p, u) == (1, 1)


def test_tokenize_pack_wordpiece_conserves_tokens(spark, corpus_dir):
    from talna_spark.pipeline.packing import PACK_BUDGET, tokenize_pack

    d, texts = corpus_dir
    out = tokenize_pack(spark, d, n_merges=20, mode="wordpiece").collect()
    assert len(out) == len(texts)
    vocab = wordpiece_train(spark, d, n_merges=20)
    enc = {
        r["doc_id"]: r["n_wp_tokens"]
        for r in wordpiece_encode(spark, d, vocab).collect()
    }
    packs: dict = {}
    for r in out:
        assert r["n_bpe_tokens"] == enc[r["doc_id"]]  # totals conserved
        if not r["oversize"]:
            packs[r["pack_id"]] = packs.get(r["pack_id"], 0) + r[
                "n_bpe_tokens"
            ]
    assert packs and all(v <= PACK_BUDGET for v in packs.values())
    # a pre-trained vocabulary short-circuits training
    out2 = tokenize_pack(spark, d, merges=vocab, mode="wordpiece").collect()
    assert sorted(map(tuple, out2)) == sorted(map(tuple, out))


def test_wordpiece_persistence_round_trip(spark, corpus_dir, tmp_path):
    d, _ = corpus_dir
    vocab = wordpiece_train(spark, d, n_merges=12)
    p = str(tmp_path / "wp_vocab")
    save_wordpiece(spark, vocab, p)
    assert load_wordpiece(spark, p) == vocab
    bad = str(tmp_path / "gap")
    spark.createDataFrame(
        [(0, "a"), (2, "b")], "id long, piece string"
    ).write.parquet(bad)
    with pytest.raises(ValueError, match="id gaps"):
        load_wordpiece(spark, bad)
    dup = str(tmp_path / "dup")
    spark.createDataFrame(
        [(0, "a"), (1, "b"), (1, "c")], "id long, piece string"
    ).write.parquet(dup)
    with pytest.raises(ValueError, match="duplicate ids"):
        load_wordpiece(spark, dup)
    dpp = str(tmp_path / "dpp")
    spark.createDataFrame(
        [(0, "a"), (1, "a")], "id long, piece string"
    ).write.parquet(dpp)
    with pytest.raises(ValueError, match="duplicate pieces"):
        load_wordpiece(spark, dpp)


def test_wordpiece_encode_ids_matches_reference_segmentation(spark, corpus_dir):
    """Ids are vocabulary-list positions under the same greedy walk the
    reference performs; counts agree with wordpiece_encode; a
    round-tripped model emits identical ids."""
    d, texts = corpus_dir
    vocab = wordpiece_train(spark, d, n_merges=20)
    from talna_spark.pipeline.wordpiece import wordpiece_encode_ids

    pid = {p: i for i, p in enumerate(vocab)}
    vs = frozenset(vocab)
    maxlen = max(len(p) for p in vs)

    def ref_ids(w):
        n, i, out = len(w), 0, []
        while i < n:
            j = min(n, i + maxlen)
            while j > i:
                piece = w[i:j] if i == 0 else WP_CONT + w[i:j]
                if piece in vs:
                    break
                j -= 1
            if j == i:
                return [len(vocab)]
            out.append(pid[piece])
            i = j
        return out

    got = {
        r["doc_id"]: (r["n_wp_tokens"], list(r["ids"]))
        for r in wordpiece_encode_ids(spark, d, vocab).collect()
    }
    counts = {
        r["doc_id"]: r["n_wp_tokens"]
        for r in wordpiece_encode(spark, d, vocab).collect()
    }
    for i, t in enumerate(texts):
        want: list = []
        for w in t.lower().strip().split():
            if w:
                want.extend(ref_ids(w))
        assert got[i] == (len(want), want), i
        assert counts[i] == len(want)


def test_pack_token_ids_wordpiece_mode(spark, corpus_dir):
    from talna_spark.pipeline.packing import pack_token_ids
    from talna_spark.pipeline.wordpiece import wordpiece_encode_ids

    d, _texts = corpus_dir
    vocab = wordpiece_train(spark, d, n_merges=20)
    packs = pack_token_ids(
        spark, d, vocab, budget=32, n_shards=4, mode="wordpiece"
    ).collect()
    enc = wordpiece_encode_ids(spark, d, vocab).collect()
    assert sum(r["n_tokens"] for r in packs) == sum(
        r["n_wp_tokens"] for r in enc
    )
    assert sum(len(r["ids"]) for r in packs) == sum(
        len(r["ids"]) for r in enc
    )
    for r in packs:
        assert r["oversize"] or r["n_tokens"] <= 32
        assert len(r["ids"]) == r["n_tokens"]


def test_wordpiece_train_local_matches_distributed(
    spark, corpus_dir, monkeypatch
):
    # r17: in-process vs distributed trainer — identical vocabulary
    # (same double score arithmetic, same (a, b) tie order)
    import talna_spark.pipeline.bpe as bpe_mod
    from talna_spark.pipeline.wordpiece import wordpiece_train

    d, _texts = corpus_dir
    local = wordpiece_train(spark, d, n_merges=12)
    monkeypatch.setattr(bpe_mod, "DRIVER_TRAIN_MAX_WORDS", 0)
    assert wordpiece_train(spark, d, n_merges=12) == local
    assert len(local) > 5
