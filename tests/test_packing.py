"""Sequence packing (pipeline.packing) + stratified sampling
(pipeline.sampling): assignment invariants, budget respect, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
BUDGET = 512


def test_pack_assign_invariants(spark):
    from talna_spark.pipeline.packing import pack_assign, pack_stats

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.count()
    packed = pack_assign(spark, SF, budget=BUDGET, n_shards=8)
    rows = packed.collect()

    # every document assigned exactly once
    assert len(rows) == n_docs
    assert len({r["doc_id"] for r in rows}) == n_docs

    # oversize flag marks exactly the docs that cannot fit alone
    for r in rows:
        assert r["oversize"] == (r["n_tokens"] > BUDGET), r

    stats = pack_stats(packed, budget=BUDGET).collect()
    by_pack = {s["pack_id"]: s for s in stats}
    for s in stats:
        if not s["oversize"]:
            assert s["tokens"] <= BUDGET, f"pack over budget: {s}"
        else:
            assert s["n_docs"] == 1, "oversized docs must pack alone"
    # packing actually combines documents (budget >> typical doc)
    assert any(s["n_docs"] >= 2 for s in stats)
    # oversize singleton packs carry their doc
    assert sum(s["n_docs"] for s in stats) == n_docs
    assert set(by_pack) == {r["pack_id"] for r in rows}


def test_pack_assign_deterministic(spark):
    from talna_spark.pipeline.packing import pack_assign

    a = sorted(map(tuple, pack_assign(spark, SF, budget=BUDGET, n_shards=8).collect()))
    b = sorted(map(tuple, pack_assign(spark, SF, budget=BUDGET, n_shards=8).collect()))
    assert a == b
    # shard count changes pack ids (documented); fixed params -> fixed ids
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        c = sorted(map(tuple, pack_assign(spark, SF, budget=BUDGET, n_shards=8).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == c, "assignment must not depend on physical partitioning"


def test_pack_assign_no_row_python_and_parallel_shape(spark):
    from talna_spark.pipeline.packing import pack_assign

    df = pack_assign(spark, SF, budget=BUDGET, n_shards=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan  # Arrow-batched FFD per shard
    assert "BatchEvalPython" not in plan


def test_stratified_sample(spark):
    from talna_spark.pipeline.sampling import stratified_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    keep_all = langs[0]
    drop_all = langs[1] if len(langs) > 1 else None
    pcts = {keep_all: 100}
    if drop_all is not None:
        pcts[drop_all] = 0
    out = stratified_sample(docs, "doc_id", "lang", pcts, default_pct=50)

    n_keep = docs.filter(F.col("lang") == keep_all).count()
    assert out.filter(F.col("lang") == keep_all).count() == n_keep
    if drop_all is not None:
        assert out.filter(F.col("lang") == drop_all).count() == 0
    # deterministic: same rows on a second evaluation
    a = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    assert a == b
    # default strata land near 50% (loose: md5 buckets are uniform)
    rest = docs.filter(~F.col("lang").isin(list(pcts)))
    n_rest = rest.count()
    if n_rest > 50:
        got = out.filter(~F.col("lang").isin(list(pcts))).count()
        assert 0.3 * n_rest < got < 0.7 * n_rest


def test_pack_texts_materialization(spark):
    from talna_spark.pipeline.packing import pack_assign, pack_texts

    packed = pack_texts(spark, SF, budget=BUDGET, n_shards=8)
    rows = packed.collect()
    assign = pack_assign(spark, SF, budget=BUDGET, n_shards=8).collect()
    n_packs = len({r["pack_id"] for r in assign})
    assert len(rows) == n_packs
    docs = {r["doc_id"]: r for r in
            spark.read.parquet(f"{SF}/documents.parquet").collect()}
    by_pack = {}
    for r in assign:
        by_pack.setdefault(r["pack_id"], []).append(r["doc_id"])
    for r in rows:
        members = sorted(by_pack[r["pack_id"]])
        assert r["n_docs"] == len(members)
        # texts concatenated in doc_id order with the separator
        assert r["text"] == "\n\n".join(docs[i]["text"] for i in members)


def test_token_heavy_hitters_matches_exact_topk(spark):
    # the sketch path must agree with the exact two-phase top-k whenever
    # the true top-k clear the N/slots floor (they do by construction on
    # this corpus with the default slots)
    from talna_spark.pipeline.text import token_freq, token_heavy_hitters

    exact = sorted(map(tuple, token_freq(spark, SF).collect()))
    rows = token_heavy_hitters(spark, SF).collect()
    sketch = sorted((r["token"], r["n"], r["rank"]) for r in rows)
    assert sketch == exact
    assert len(exact) > 10
    # the head of a Zipfian corpus clears the pigeonhole floor; the tail
    # of the top-50 does not at this corpus size — both flags must appear
    # and the guaranteed prefix must be contiguous by rank
    by_rank = sorted(rows, key=lambda r: r["rank"])
    flags = [r["guaranteed"] for r in by_rank]
    assert flags[0] is True and flags[-1] is False
    assert flags == sorted(flags, reverse=True)


def test_token_heavy_hitters_strict_mode(spark):
    import pytest
    from pyspark.errors.exceptions.base import SparkRuntimeException

    from talna_spark.pipeline.text import token_heavy_hitters

    # k small enough that every returned row is guaranteed -> no raise
    rows = token_heavy_hitters(spark, SF, k=3, strict=True).collect()
    assert len(rows) == 3 and all(r["guaranteed"] for r in rows)
    # default k reaches below the floor -> strict raises at action time
    with pytest.raises(SparkRuntimeException, match="pigeonhole floor"):
        token_heavy_hitters(spark, SF, strict=True).collect()


def test_token_heavy_hitters_minimal_guaranteed_slots(spark):
    # the Misra-Gries guarantee: any token with global count > N/(m+1)
    # survives some partition's sketch. Size m to the SMALLEST value that
    # covers exactly the top-1 token and check it is found with its exact
    # count — the data-driven tightest version of the pigeonhole bound
    from pyspark.sql import functions as F

    from talna_spark.pipeline.portable import tokens
    from talna_spark.pipeline.text import token_freq, token_heavy_hitters

    top1_exact = min(
        token_freq(spark, SF).collect(), key=lambda r: r["rank"]
    )
    n_total = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(F.explode(tokens(F.col("text"))).alias("t"))
        .count()
    )
    m = n_total // top1_exact["n"] + 1  # N/(m+1) < top1_n
    got = token_heavy_hitters(spark, SF, k=1, slots=m).collect()
    assert got and got[0]["token"] == top1_exact["token"]
    assert got[0]["n"] == top1_exact["n"]
    assert got[0]["guaranteed"] is True  # by construction of m


def test_tokenize_pack_end_to_end(spark):
    """BPE-train -> encode -> FFD-pack by BPE length: per-pack BPE-token
    totals respect the budget, every doc is assigned exactly once, the
    packing keys off BPE lengths (not whitespace words), and a supplied
    merge list skips training deterministically."""
    import pyspark.sql.functions as F

    from talna_spark.pipeline.bpe import bpe_train
    from talna_spark.pipeline.packing import tokenize_pack

    budget = 256
    merges = bpe_train(spark, SF, n_merges=12)
    out = tokenize_pack(spark, SF, budget=budget, merges=merges)
    pdf = out.toPandas()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(pdf) == n_docs and pdf["doc_id"].is_unique

    # packing is by BPE length: merges compress, so bpe < words somewhere
    assert (pdf["n_bpe_tokens"] != pdf["n_words"]).any()
    per_pack = pdf[~pdf["oversize"]].groupby("pack_id")["n_bpe_tokens"].sum()
    assert (per_pack <= budget).all()
    # oversized docs (BPE length > budget) are flagged singletons
    over = pdf[pdf["oversize"]]
    assert (over["n_bpe_tokens"] > budget).all()
    assert not over["pack_id"].duplicated().any()

    # same merges, repartitioned input -> identical assignment
    again = tokenize_pack(spark, SF, budget=budget, merges=merges).toPandas()
    a = pdf.sort_values("doc_id").reset_index(drop=True)
    b = again.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_chunk_documents_invariants(spark):
    """Overlapping token-window chunking: fixture docs pin the window
    schedule, overlap stitching, tail suppression, short-doc identity,
    and NULL handling; reconstruction proves total, non-redundant
    coverage."""
    import tempfile

    import pytest

    from talna_spark.pipeline.packing import chunk_documents

    toks = lambda n, tag: " ".join(f"{tag}{i}" for i in range(n))
    rows = [
        (0, "src0", toks(100, "a")),   # starts [0, 48]: 96 suppressed
        (1, "src0", toks(113, "b")),   # starts [0, 48, 96]: tail needed
        (2, "src0", toks(112, "c")),   # starts [0, 48]: 48 reaches 111
        (3, "src0", "short doc"),      # n <= max: single identity chunk
        (4, "src0", None),             # NULL: no chunks
        (5, "src0", toks(64, "e")),    # exactly max: one chunk
    ]
    d = tempfile.mkdtemp(prefix="talna_chunk_")
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    out = chunk_documents(spark, d, max_tokens=64, step=48)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], {})[r["chunk_idx"]] = r
    assert set(by_doc) == {0, 1, 2, 3, 5}
    assert sorted(by_doc[0]) == [0, 1] and by_doc[0][1]["n_tokens"] == 52
    assert sorted(by_doc[1]) == [0, 1, 2] and by_doc[1][2]["n_tokens"] == 17
    assert sorted(by_doc[2]) == [0, 1]
    assert sorted(by_doc[3]) == [0]
    assert by_doc[3][0]["chunk_text"] == "short doc"
    assert sorted(by_doc[5]) == [0] and by_doc[5][0]["n_tokens"] == 64

    for doc_id, chunks in by_doc.items():
        orig = [t for t in rows[doc_id][2].lower().strip().split()]
        # overlap stitching: chunk i>0 repeats the previous chunk's
        # last 16 tokens; dropping them reconstructs the original
        rebuilt = chunks[0]["chunk_text"].split()
        for i in sorted(chunks)[1:]:
            cur = chunks[i]["chunk_text"].split()
            assert cur[:16] == rebuilt[-16:] if len(rebuilt) >= 16 else True
            rebuilt.extend(cur[16:])
        assert rebuilt == orig, doc_id

    with pytest.raises(ValueError):
        chunk_documents(spark, d, max_tokens=64, step=65)
    with pytest.raises(ValueError):
        chunk_documents(spark, d, max_tokens=64, step=0)


def test_chunk_documents_matches_duckdb(spark):
    import duckdb

    from talna_spark.pipeline.packing import (
        chunk_documents,
        chunk_documents_sql,
    )

    got = sorted(map(tuple, chunk_documents(spark, SF).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = sorted(map(tuple, con.execute(chunk_documents_sql()).fetchall()))
    con.close()
    assert got and got == want


def test_chunk_token_ids_window_schedule(spark):
    """Pure id-space chunking pins the same window schedule, tail rule
    and overlap stitching as chunk_documents, with ids = 0..n-1 so every
    positional claim is checkable by value."""
    import pytest

    from talna_spark.pipeline.packing import chunk_token_ids

    rows = [(n, list(range(n))) for n in (100, 113, 112, 2, 64, 0)]
    # NULL-ids doc: same emit-nothing contract as empty ids
    df = spark.createDataFrame(
        rows + [(999, None)], "doc_id long, ids array<long>"
    )
    out = chunk_token_ids(df, max_tokens=64, step=48)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], {})[r["chunk_idx"]] = r
    assert sorted(by_doc[100]) == [0, 1] and by_doc[100][1]["n_tokens"] == 52
    assert sorted(by_doc[113]) == [0, 1, 2]
    assert sorted(by_doc[112]) == [0, 1]
    assert sorted(by_doc[2]) == [0] and by_doc[2][0]["ids"] == [0, 1]
    assert sorted(by_doc[64]) == [0]
    # tokenless docs (empty OR NULL ids) emit NOTHING — one contract for
    # both absent shapes, so pack_assign never sees n_tokens=0 rows
    # (VERDICT r12 #7)
    assert 0 not in by_doc and 999 not in by_doc
    assert out.filter("n_tokens = 0").count() == 0
    for n, chunks in by_doc.items():
        rebuilt = list(chunks[0]["ids"])
        for i in sorted(chunks)[1:]:
            cur = list(chunks[i]["ids"])
            assert cur[:16] == rebuilt[-16:]  # shared context
            rebuilt.extend(cur[16:])
        assert rebuilt == list(range(n)), n

    with pytest.raises(ValueError):
        chunk_token_ids(df, max_tokens=64, step=0)


def test_chunk_documents_tokenized_conserves_encoder_ids(spark):
    """chunk_documents_tokenized windows by the TRAINED tokenizer's token
    lengths: for byte-BPE and WordPiece, stitching each doc's chunks back
    together (dropping the shared overlap) reproduces the encoder's own
    id stream exactly, and every chunk fits max_tokens."""
    import pytest

    from talna_spark.pipeline.bpe import bpe_encode_ids, bpe_train
    from talna_spark.pipeline.packing import chunk_documents_tokenized
    from talna_spark.pipeline.wordpiece import (
        wordpiece_encode_ids,
        wordpiece_train,
    )

    def check(chunked, ids_df, max_tokens, step):
        want = {r["doc_id"]: list(r["ids"]) for r in ids_df.collect()}
        by_doc = {}
        for r in chunked.collect():
            assert r["n_tokens"] <= max_tokens
            by_doc.setdefault(r["doc_id"], {})[r["chunk_idx"]] = list(r["ids"])
        ov = max_tokens - step
        for doc_id, chunks in by_doc.items():
            rebuilt = chunks[0]
            for i in sorted(chunks)[1:]:
                assert chunks[i][:ov] == rebuilt[-ov:]
                rebuilt = rebuilt + chunks[i][ov:]
            assert rebuilt == want[doc_id], doc_id
        assert set(by_doc) == set(want)

    merges = bpe_train(spark, SF, n_merges=10, mode="byte")
    check(
        chunk_documents_tokenized(
            spark, SF, merges, tokenizer="byte", max_tokens=32, step=24
        ),
        bpe_encode_ids(spark, SF, merges, mode="byte"),
        32,
        24,
    )
    vocab = wordpiece_train(spark, SF, n_merges=10)
    check(
        chunk_documents_tokenized(
            spark, SF, vocab, tokenizer="wordpiece", max_tokens=32, step=24
        ),
        wordpiece_encode_ids(spark, SF, vocab),
        32,
        24,
    )
    with pytest.raises(ValueError):
        chunk_documents_tokenized(spark, SF, merges, tokenizer="nope")
