"""Distributed BPE trainer vs an independent pure-Python reference
implementation (Sennrich-style word-internal BPE) — exact merge-sequence
and encoding equality, plus partitioning-independence."""

from __future__ import annotations

import os
import shutil
import tempfile

import pandas as pd
import pytest

from talna_spark.pipeline.bpe import EOW, bpe_encode, bpe_train


# --------------------------- reference implementation (test-side, pure py)
def _ref_word_counts(texts):
    counts = {}
    for t in texts:
        for w in t.lower().strip().split():
            if w:
                counts[w] = counts.get(w, 0) + 1
    return counts


def _ref_train(texts, n_merges):
    counts = _ref_word_counts(texts)
    vocab = {w: list(w) + [EOW] for w in counts}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + counts[w]
        pairs = {p: c for p, c in pairs.items() if c >= 2}
        if not pairs:
            break
        # max count, lexicographic tie-break on (a, b)
        best = min(pairs, key=lambda p: (-pairs[p], p))
        merges.append(best)
        a, b = best
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def _ref_encode_word(w, ranks):
    syms = list(w) + [EOW]
    while len(syms) > 1:
        best, bi = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best, bi = r, i
        if best is None:
            break
        syms[bi : bi + 2] = [syms[bi] + syms[bi + 1]]
    return syms


@pytest.fixture(scope="module")
def corpus_dir():
    d = tempfile.mkdtemp(prefix="talna_bpe_")
    texts = [
        "low lower lowest low low",
        "new newer newest new news",
        "wide wider widest wide",
        "low new wide slow slower",
        "the lowest newest widest",
    ]
    pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}
    ).to_parquet(os.path.join(d, "documents.parquet"))
    yield d, texts
    shutil.rmtree(d, ignore_errors=True)


def test_bpe_train_matches_reference(spark, corpus_dir):
    d, texts = corpus_dir
    got = bpe_train(spark, d, n_merges=20)
    want = _ref_train(texts, 20)
    assert got == want
    assert len(got) > 5  # the corpus supports a real merge sequence


def test_bpe_train_partitioning_independent(spark, corpus_dir):
    # same merges regardless of input file partitioning: the argmax
    # tie-break is on values, never on partition order
    d, texts = corpus_dir
    df = spark.read.parquet(f"{d}/documents.parquet")
    d2 = tempfile.mkdtemp(prefix="talna_bpe_rp_")
    try:
        df.repartition(7).write.parquet(f"{d2}/documents.parquet")
        assert bpe_train(spark, d2, n_merges=12) == _ref_train(texts, 12)
    finally:
        shutil.rmtree(d2, ignore_errors=True)


def test_bpe_encode_matches_reference(spark, corpus_dir):
    d, texts = corpus_dir
    merges = bpe_train(spark, d, n_merges=15)
    ranks = {m: i for i, m in enumerate(merges)}
    got = {r["doc_id"]: r for r in bpe_encode(spark, d, merges).collect()}
    for doc_id, t in enumerate(texts):
        ws = [w for w in t.lower().strip().split() if w]
        n_tok = sum(len(_ref_encode_word(w, ranks)) for w in ws)
        n_chars = sum(len(w) for w in ws)
        assert got[doc_id]["n_words"] == len(ws)
        assert got[doc_id]["n_bpe_tokens"] == n_tok
        assert got[doc_id]["compression"] == pytest.approx(
            round(n_chars / n_tok, 6), abs=1e-9
        )


def test_bpe_stops_when_no_repeated_pair(spark):
    # a corpus of all-distinct characters can't support >=2-count merges
    d = tempfile.mkdtemp(prefix="talna_bpe_stop_")
    try:
        pd.DataFrame({"doc_id": [0], "text": ["abc def"]}).to_parquet(
            os.path.join(d, "documents.parquet")
        )
        assert bpe_train(spark, d, n_merges=10) == []
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_bpe_encode_ids_matches_reference_symbols(spark, corpus_dir):
    """bpe_encode_ids emits, per doc, exactly the reference encoder's
    symbol stream mapped through the closed-form id scheme; lengths
    agree with bpe_encode's n_bpe_tokens."""
    from talna_spark.pipeline.bpe import MERGE_ID_BASE, bpe_encode_ids

    d, texts = corpus_dir
    merges = bpe_train(spark, d, n_merges=8)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    merged_id = {a + b: MERGE_ID_BASE + i for i, (a, b) in enumerate(merges)}

    def ref_sym_id(s):
        if s in merged_id:
            return merged_id[s]
        if s == EOW:
            return 1
        if s.endswith(EOW) and len(s) > len(EOW):
            return 3 + 2 * ord(s[: -len(EOW)])
        return 2 + 2 * ord(s)

    got = {
        r["doc_id"]: r for r in bpe_encode_ids(spark, d, merges).collect()
    }
    enc = {r["doc_id"]: r for r in bpe_encode(spark, d, merges).collect()}
    for did, text in enumerate(texts):
        expect = []
        for w in text.lower().strip().split():
            expect.extend(ref_sym_id(s) for s in _ref_encode_word(w, ranks))
        assert list(got[did]["ids"]) == expect, did
        assert got[did]["n_bpe_tokens"] == len(expect)
        assert enc[did]["n_bpe_tokens"] == len(expect)


def test_pack_token_ids_materializes_budgeted_tensors(spark, corpus_dir):
    """pack_token_ids: per-pack id arrays concatenate members in doc_id
    order, lengths match the assignment, budget respected."""
    from talna_spark.pipeline.bpe import bpe_encode_ids
    from talna_spark.pipeline.packing import pack_token_ids

    d, texts = corpus_dir
    merges = bpe_train(spark, d, n_merges=8)
    per_doc = {
        r["doc_id"]: list(r["ids"])
        for r in bpe_encode_ids(spark, d, merges).collect()
    }
    budget = 24
    packs = pack_token_ids(spark, d, merges, budget=budget).collect()
    seen_tokens = 0
    for p in packs:
        assert p["n_tokens"] == len(p["ids"])
        if not p["oversize"]:
            assert p["n_tokens"] <= budget
        seen_tokens += p["n_tokens"]
    assert seen_tokens == sum(len(v) for v in per_doc.values())
    # each pack's ids = concat of SOME doc id-sequences in doc_id order:
    # reconstruct by greedy matching against the known per-doc arrays
    for p in packs:
        ids = list(p["ids"])
        matched = 0
        pos = 0
        used = []
        while pos < len(ids):
            hit = None
            for did, seq in sorted(per_doc.items()):
                if did not in used and ids[pos : pos + len(seq)] == seq:
                    hit = did
                    break
            assert hit is not None, (p["pack_id"], pos)
            used.append(hit)
            pos += len(per_doc[hit])
            matched += 1
        assert matched == p["n_docs"]
        assert used == sorted(used)  # doc_id order within the pack


def test_bpe_null_text_is_empty_document(spark, tmp_path):
    """NULL text flows through both encoders as the empty document
    (review r6 — the Arrow batch carries None, which must not crash)."""
    import pandas as pd

    from talna_spark.pipeline.bpe import bpe_encode_ids

    d = str(tmp_path)
    pd.DataFrame(
        [{"doc_id": 0, "text": "low lower low"}, {"doc_id": 1, "text": None}]
    ).to_parquet(f"{d}/documents.parquet")
    merges = bpe_train(spark, d, n_merges=3)
    enc = {r["doc_id"]: r for r in bpe_encode(spark, d, merges).collect()}
    ids = {r["doc_id"]: r for r in bpe_encode_ids(spark, d, merges).collect()}
    assert enc[1]["n_bpe_tokens"] == 0 and enc[1]["n_words"] == 0
    assert list(ids[1]["ids"]) == [] and ids[1]["n_bpe_tokens"] == 0
    assert enc[0]["n_bpe_tokens"] == ids[0]["n_bpe_tokens"] > 0


# ------------------- byte-level (GPT-2) mode vs its own test-side reference
# The reference below is written independently of talna_spark.pipeline.bpe:
# its own regex copy, its own byte table construction, its own merge loop.
_REF_BYTE_RE = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?[^\W\d_]+| ?\d+| ?(?:[^\s\w]|_)+"
    r"|\s+(?!\S)|\s+"
)


def _ref_b2u():
    table, n = {}, 0
    printable = (
        set(range(33, 127)) | set(range(161, 173)) | set(range(174, 256))
    )
    for b in range(256):
        if b in printable:
            table[b] = chr(b)
        else:
            table[b] = chr(256 + n)
            n += 1
    return table


def _ref_pretokens(t):
    import re

    return re.findall(_REF_BYTE_RE, t)


def _ref_byte_train(texts, n_merges):
    b2u = _ref_b2u()
    counts = {}
    for t in texts:
        for w in _ref_pretokens(t):
            counts[w] = counts.get(w, 0) + 1
    vocab = {w: [b2u[b] for b in w.encode("utf-8")] for w in counts}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + counts[w]
        pairs = {p: c for p, c in pairs.items() if c >= 2}
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        merges.append(best)
        a, b = best
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def _ref_byte_encode_word(w, ranks):
    b2u = _ref_b2u()
    syms = [b2u[b] for b in w.encode("utf-8")]
    while len(syms) > 1:
        best, bi = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best, bi = r, i
        if best is None:
            break
        syms[bi : bi + 2] = [syms[bi] + syms[bi + 1]]
    return syms


@pytest.fixture(scope="module")
def byte_corpus_dir():
    d = tempfile.mkdtemp(prefix="talna_bpe_byte_")
    # multi-byte UTF-8 (é, ï, emoji), contractions, digits, punctuation,
    # leading-space words, trailing whitespace — the byte-mode surface
    texts = [
        "low lower lowest low low, it's low!",
        "café Café naïve 123 4567 new news",
        "the lowest newest — café au lait 🦆🦆 low",
        "new newer newest; it's the low low  ",
        "wide wider widest wide don't 123",
    ]
    pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}
    ).to_parquet(os.path.join(d, "documents.parquet"))
    yield d, texts
    shutil.rmtree(d, ignore_errors=True)


def test_byte_alphabet_matches_reference_table():
    from talna_spark.pipeline.bpe import bytes_to_unicode

    got = bytes_to_unicode()
    assert got == _ref_b2u()
    assert len(set(got.values())) == 256  # bijective


def test_pretokenize_keeps_leading_space_and_contractions():
    from talna_spark.pipeline.bpe import pretokenize

    got = pretokenize("it's low-lower!  café 123\n x")
    # `\s+(?!\S)` backtracks so the LAST space before a word stays
    # attached to that word — "\n " + "x" splits as "\n", " x"
    assert got == [
        "it", "'s", " low", "-", "lower", "!", " ", " café", " 123",
        "\n", " x",
    ]
    # round-trip: pretokens concatenate back to the input
    assert "".join(got) == "it's low-lower!  café 123\n x"


def test_pretokenize_exact_unicode_number_class():
    # r12: \p{L}/\p{N} are generated from unicodedata, so non-decimal
    # \p{N} forms (roman numerals Nl, superscripts/fractions No) split
    # off letter runs exactly as the published GPT-2 regex does — the
    # r8-r11 [^\W\d_]/\d approximation kept 'abcⅫ' as one pretoken
    from talna_spark.pipeline.bpe import pretokenize

    assert pretokenize("abcⅫ") == ["abc", "Ⅻ"]
    assert pretokenize("x2³ ½kg") == ["x", "2³", " ½", "kg"]
    # Mongolian digits are Nd but not ASCII \d — one number run
    assert pretokenize("a᠑᠒") == ["a", "᠑᠒"]
    # underscore is Pc: punctuation class, never a letter
    assert pretokenize("a_b") == ["a", "_", "b"]
    for s in ("abcⅫ", "x2³ ½kg", " ᠑1½ a"):
        assert "".join(pretokenize(s)) == s


def test_unicode_class_matches_unicodedata():
    # the generated class bodies ARE \p{L} / \p{N}: spot-check every
    # 97th codepoint plus the category boundary neighbors
    import re
    import sys
    import unicodedata

    from talna_spark.pipeline.bpe import _P_L, _P_N

    pl = re.compile(f"[{_P_L}]\\Z")
    pn = re.compile(f"[{_P_N}]\\Z")
    for cp in list(range(0, sys.maxunicode + 1, 97)) + [
        0x2160, 0x2188, 0x00B2, 0x00BD, 0x1811, 0x10FFFF
    ]:
        ch = chr(cp)
        cat = unicodedata.category(ch)[0]
        assert bool(pl.match(ch)) == (cat == "L"), hex(cp)
        assert bool(pn.match(ch)) == (cat == "N"), hex(cp)


def test_generated_classes_match_fallback_builder():
    """The checked-in _gpt2_classes constants must be byte-identical to
    what the in-process fallback builder produces on this interpreter —
    a stale generated file after a Unicode-table bump is caught here
    (and would be bypassed at import by the UNIDATA_VERSION check)."""
    import unicodedata

    from talna_spark.pipeline import _gpt2_classes as g
    from talna_spark.pipeline.bpe import _P_L, _P_N, _unicode_class

    assert g.UNIDATA_VERSION == unicodedata.unidata_version
    assert g.P_L == _unicode_class("L")
    assert g.P_N == _unicode_class("N")
    # and the module-level classes in effect ARE the constants
    assert _P_L == g.P_L and _P_N == g.P_N


def test_byte_bpe_train_matches_reference(spark, byte_corpus_dir):
    d, texts = byte_corpus_dir
    got = bpe_train(spark, d, n_merges=25, mode="byte")
    want = _ref_byte_train(texts, 25)
    assert got == want
    assert len(got) > 8


def test_byte_bpe_encode_matches_reference(spark, byte_corpus_dir):
    d, texts = byte_corpus_dir
    merges = bpe_train(spark, d, n_merges=18, mode="byte")
    ranks = {m: i for i, m in enumerate(merges)}
    got = {
        r["doc_id"]: r
        for r in bpe_encode(spark, d, merges, mode="byte").collect()
    }
    for doc_id, t in enumerate(texts):
        ws = _ref_pretokens(t)
        n_tok = sum(len(_ref_byte_encode_word(w, ranks)) for w in ws)
        n_chars = sum(len(w) for w in ws)
        assert got[doc_id]["n_words"] == len(ws)
        assert got[doc_id]["n_bpe_tokens"] == n_tok
        assert got[doc_id]["compression"] == pytest.approx(
            round(n_chars / n_tok, 6), abs=1e-9
        )


def test_byte_encode_ids_matches_reference_symbols(spark, byte_corpus_dir):
    from talna_spark.pipeline.bpe import MERGE_ID_BASE, bpe_encode_ids

    d, texts = byte_corpus_dir
    merges = bpe_train(spark, d, n_merges=12, mode="byte")
    ranks = {m: i for i, m in enumerate(merges)}
    merged_id = {a + b: MERGE_ID_BASE + i for i, (a, b) in enumerate(merges)}
    u2b = {c: b for b, c in _ref_b2u().items()}

    def ref_sym_id(s):
        if s in merged_id:
            return merged_id[s]
        assert len(s) == 1
        return 2 + u2b[s]

    got = {
        r["doc_id"]: r
        for r in bpe_encode_ids(spark, d, merges, mode="byte").collect()
    }
    for doc_id, t in enumerate(texts):
        want = []
        for w in _ref_pretokens(t):
            want.extend(
                ref_sym_id(s) for s in _ref_byte_encode_word(w, ranks)
            )
        assert list(got[doc_id]["ids"]) == want
        assert got[doc_id]["n_bpe_tokens"] == len(want)


def test_byte_mode_roundtrip_decodable(spark, byte_corpus_dir):
    # the id scheme is invertible: ids -> symbols -> bytes -> text
    from talna_spark.pipeline.bpe import MERGE_ID_BASE, bpe_encode_ids

    d, texts = byte_corpus_dir
    merges = bpe_train(spark, d, n_merges=10, mode="byte")
    sym_of_merge = {MERGE_ID_BASE + i: a + b for i, (a, b) in enumerate(merges)}
    u2b = {c: b for b, c in _ref_b2u().items()}
    got = {
        r["doc_id"]: list(r["ids"])
        for r in bpe_encode_ids(spark, d, merges, mode="byte").collect()
    }
    for doc_id, t in enumerate(texts):
        syms = [
            sym_of_merge[i] if i >= MERGE_ID_BASE else _ref_b2u()[i - 2]
            for i in got[doc_id]
        ]
        decoded = bytes(u2b[c] for s in syms for c in s).decode("utf-8")
        assert decoded == "".join(_ref_pretokens(t))


def test_bpe_unknown_mode_raises(spark, byte_corpus_dir):
    d, _ = byte_corpus_dir
    with pytest.raises(ValueError, match="mode"):
        bpe_train(spark, d, n_merges=1, mode="subword")


def test_tokenize_pack_byte_mode(spark, byte_corpus_dir):
    from talna_spark.pipeline.packing import tokenize_pack

    d, texts = byte_corpus_dir
    rows = tokenize_pack(
        spark, d, n_merges=10, budget=64, n_shards=2, mode="byte"
    ).collect()
    assert len(rows) == len(texts)
    merges = bpe_train(spark, d, n_merges=10, mode="byte")
    ranks = {m: i for i, m in enumerate(merges)}
    by_id = {r["doc_id"]: r for r in rows}
    packs = {}
    for doc_id, t in enumerate(texts):
        n_tok = sum(
            len(_ref_byte_encode_word(w, ranks)) for w in _ref_pretokens(t)
        )
        assert by_id[doc_id]["n_bpe_tokens"] == n_tok  # byte lengths packed
        if not by_id[doc_id]["oversize"]:
            p = by_id[doc_id]["pack_id"]
            packs[p] = packs.get(p, 0) + n_tok
    assert all(v <= 64 for v in packs.values())  # budget respected


def test_bpe_train_local_matches_distributed(spark, corpus_dir, monkeypatch):
    # r17: the in-process trainer (word table collected once) and the
    # per-round distributed loop must learn the SAME merge list — the
    # cap knob is the only thing that picks the path
    import talna_spark.pipeline.bpe as bpe_mod

    d, _texts = corpus_dir
    local = bpe_train(spark, d, n_merges=15)
    monkeypatch.setattr(bpe_mod, "DRIVER_TRAIN_MAX_WORDS", 0)
    assert bpe_train(spark, d, n_merges=15) == local
    assert len(local) > 5


# --------------------------- r18: batched distributed merges (VERDICT
# r17 item 4) — the certification must never change the merge list, so
# every adversarial shape that could fool it is pinned against both the
# pure-python reference and the in-process trainer.
def _assert_distributed_matches_local(spark, texts, n_merges, monkeypatch):
    import talna_spark.pipeline.bpe as bpe_mod

    d = tempfile.mkdtemp(prefix="talna_bpe_batch_")
    try:
        pd.DataFrame(
            {"doc_id": range(len(texts)), "text": texts}
        ).to_parquet(os.path.join(d, "documents.parquet"))
        want = _ref_train(texts, n_merges)
        assert bpe_train(spark, d, n_merges=n_merges) == want
        monkeypatch.setattr(bpe_mod, "DRIVER_TRAIN_MAX_WORDS", 0)
        assert bpe_train(spark, d, n_merges=n_merges) == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_batched_distributed_self_pair_runs(spark, monkeypatch):
    # long single-symbol runs: merging (a, a) creates (aa, aa) with a
    # count the batch certification cannot bound — a self-pair must
    # terminate its batch or the created pair is mis-ordered
    texts = [
        "aaaaaaaa aaaaaaa aaaa bbbbbbbb bbbb cc",
        "aaaaaaaa aaaa bbbbbbbb aabb cccc cc",
    ]
    _assert_distributed_matches_local(spark, texts, 12, monkeypatch)


def test_batched_distributed_created_pair_outranks(spark, monkeypatch):
    # 'abab' repetition: after (a, b) -> ab the created (ab, ab) beats
    # every remaining old pair, so a naive top-k batch would apply the
    # old runner-up out of order
    texts = [
        "abababab ababab xyxy",
        "abababab abab xy xyz",
        "ababab zq zq zq zq zq",
    ]
    _assert_distributed_matches_local(spark, texts, 10, monkeypatch)


def test_batched_distributed_merged_name_collision(spark, monkeypatch):
    # drive toward ('a','bc') and ('ab','c') both naming 'abc': counts
    # of pairs with the colliding name must not be double-batched
    texts = [
        "abc abc abc abc bcbc bcbc",
        "ab ab ab ab abc abc",
        "cab cab bca bca abcabc",
    ]
    _assert_distributed_matches_local(spark, texts, 14, monkeypatch)


def _sim_batched_merges(words, n_merges, K):
    """Pure-python mirror of the distributed loop's driver logic: full
    pair count -> top-K in (cnt DESC, (a, b) ASC) order ->
    _safe_merge_batch -> apply the accepted prefix. No Spark; the JVM
    side it skips (_apply_merge fold, checkpoint cadence) is unchanged
    by batching and covered by the Spark tests above."""
    from talna_spark.pipeline.bpe import _merge_word_syms, _safe_merge_batch

    words = [[list(s), n] for s, n in words]
    merges: list = []
    while len(merges) < n_merges:
        pc: dict = {}
        for syms, n in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pc[p] = pc.get(p, 0) + n
        pc = {p: c for p, c in pc.items() if c >= 2}
        if not pc:
            break
        rows = sorted(
            ((a, b, c) for (a, b), c in pc.items()),
            key=lambda r: (-r[2], r[0], r[1]),
        )[:K]
        for a, b in _safe_merge_batch(rows, n_merges - len(merges), K):
            merges.append((a, b))
            for w in words:
                w[0] = _merge_word_syms(w[0], a, b, a + b)
    return merges


def test_batched_tie_heavy_simulated():
    # every pair count equal: the lexicographic tie-break alone orders
    # the merge list, and ties are exactly where the certification must
    # refuse to batch (created pairs can tie the next candidate)
    texts = ["ab cd ef gh", "ab cd ef gh", "ij kl mn op", "ij kl mn op"]
    counts = _ref_word_counts(texts)
    words = [(list(w) + [EOW], n) for w, n in sorted(counts.items())]
    for K in (2, 8, 64):
        assert _sim_batched_merges(words, 8, K) == _ref_train(texts, 8)


def test_batched_randomized_simulated():
    # seeded fuzz: hundreds of random corpora over tiny alphabets hit
    # run/tie/merged-name-collision shapes the handwritten cases miss
    # (pure-python — the 4000-corpus version of this fuzz ran clean
    # during r18 development)
    import random

    rng = random.Random(18)
    for _ in range(300):
        alpha = rng.choice(["ab", "abc", "abcd"])
        vocab: dict = {}
        for _ in range(rng.randint(2, 12)):
            w = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 9)))
            vocab[w] = vocab.get(w, 0) + rng.randint(1, 10)
        eow = rng.random() < 0.5
        words = [
            (list(w) + ([EOW] if eow else []), n)
            for w, n in sorted(vocab.items())
        ]
        K = rng.choice([2, 4, 64])
        nm = rng.randint(1, 20)
        texts_equiv = [
            " ".join([w] * n) for w, n in sorted(vocab.items())
        ]
        want = (
            _ref_train(texts_equiv, nm)
            if eow
            else _sim_greedy_reference(words, nm)
        )
        assert _sim_batched_merges(words, nm, K) == want


def _sim_greedy_reference(words, n_merges):
    """Stepwise greedy (recount every merge) — the semantic ground
    truth the batched loop must reproduce exactly."""
    from talna_spark.pipeline.bpe import _merge_word_syms

    words = [[list(s), n] for s, n in words]
    merges: list = []
    for _ in range(n_merges):
        pc: dict = {}
        for syms, n in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pc[p] = pc.get(p, 0) + n
        pc = {p: c for p, c in pc.items() if c >= 2}
        if not pc:
            break
        best = min(pc, key=lambda p: (-pc[p], p))
        merges.append(best)
        a, b = best
        for w in words:
            w[0] = _merge_word_syms(w[0], a, b, a + b)
    return merges


def test_safe_merge_batch_unit():
    from talna_spark.pipeline.bpe import _safe_merge_batch

    # overlap stops the prefix (consecutive rule: no skipping)
    rows = [("a", "b", 100), ("b", "c", 90), ("d", "e", 80)]
    assert _safe_merge_batch(rows, 10, 64) == [("a", "b")]
    # disjoint with wide margins batches; boundary=1 (exhaustive collect)
    rows = [("a", "b", 100), ("c", "d", 50), ("e", "f", 10)]
    assert _safe_merge_batch(rows, 10, 64) == [
        ("a", "b"), ("c", "d"), ("e", "f"),
    ]
    # the 2x created-pair bound: cnt must EXCEED 2*max(boundary, overlap)
    # (boundary = cnt of row K when the collect was full): 51 > 2*25
    # passes, 25 > 2*25 does not
    rows = [("a", "b", 100), ("c", "d", 51), ("e", "f", 25)]
    assert _safe_merge_batch(rows, 10, 3) == [("a", "b"), ("c", "d")]
    rows = [("a", "b", 100), ("c", "d", 50), ("e", "f", 25)]
    assert _safe_merge_batch(rows, 10, 3) == [("a", "b")]
    # self-pair first: exact argmax, batch of one
    rows = [("a", "a", 100), ("c", "d", 10)]
    assert _safe_merge_batch(rows, 10, 64) == [("a", "a")]
    # self-pair later: accepted, then terminates
    rows = [("a", "b", 100), ("c", "c", 40), ("e", "f", 10)]
    assert _safe_merge_batch(rows, 10, 64) == [("a", "b"), ("c", "c")]
    # merged-name collision with a later pair's symbol
    rows = [("a", "b", 100), ("ab", "c", 40)]
    assert _safe_merge_batch(rows, 10, 64) == [("a", "b")]
    # n_left caps the batch
    rows = [("a", "b", 100), ("c", "d", 40)]
    assert _safe_merge_batch(rows, 1, 64) == [("a", "b")]
