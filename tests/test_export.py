"""Corpus export sink: partitioned layout, file-size discipline,
manifest-from-written-files, and shard determinism."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from talna_spark.pipeline.export import export_corpus, read_manifest


@pytest.fixture(scope="module")
def curated(spark):
    from talna_spark.pipeline.sampling import split_assign

    sf = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return docs.join(split_assign(spark, sf), "doc_id").select(
        "doc_id", "text", "source", "split"
    )


def test_export_layout_and_manifest(spark, curated):
    d = tempfile.mkdtemp(prefix="talna_export_")
    try:
        out = os.path.join(d, "corpus")
        manifest = export_corpus(curated, out, partition_by=("split",))
        # layout: one dir per split, manifest on disk == returned dict
        assert {"split=test", "split=train", "split=val"} <= set(os.listdir(out))
        assert read_manifest(out) == manifest
        # counts in the manifest match the input exactly, per partition
        want = {
            r["split"]: r["n"]
            for r in curated.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        got = {k: v["rows"] for k, v in manifest["partitions"].items()}
        assert got == want
        assert manifest["total_rows"] == sum(want.values())
        # bytes/files inventories are real
        assert all(v["bytes"] > 0 and v["files"] >= 1 for v in manifest["partitions"].values())
        # the written corpus round-trips: partition pruning serves train
        back = spark.read.parquet(out).filter(F.col("split") == "train")
        assert back.count() == want["train"]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_export_file_size_cap_and_determinism(spark, curated):
    d = tempfile.mkdtemp(prefix="talna_export2_")
    try:
        out1, out2 = os.path.join(d, "a"), os.path.join(d, "b")
        m1 = export_corpus(curated, out1, max_records_per_file=100)
        # no file exceeds the cap
        for sub, _dn, fn in os.walk(out1):
            for f in fn:
                if f.endswith(".parquet"):
                    n = spark.read.parquet(os.path.join(sub, f)).count()
                    assert n <= 100
        # deterministic across input partitioning: same per-partition counts
        m2 = export_corpus(curated.repartition(13), out2, max_records_per_file=100)
        assert {k: v["rows"] for k, v in m1["partitions"].items()} == {
            k: v["rows"] for k, v in m2["partitions"].items()
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_export_missing_column_is_loud(spark, curated):
    with pytest.raises(ValueError, match="missing"):
        export_corpus(curated, "/tmp/nope", partition_by=("nosuch",))


def test_export_jsonl_and_read_back(spark, tmp_path):
    """jsonl export: gzip json-lines shards + manifest; a jsonl round
    trip through documents_from_jsonl restores the documents shape with
    stable hashed doc_ids."""
    from talna_spark.pipeline.export import export_corpus, read_manifest
    from talna_spark.sources.generic import documents_from_jsonl

    df = spark.createDataFrame(
        [
            (f"doc-{i}", f"text number {i} here", "en",
             "train" if i % 2 else "test")
            for i in range(20)
        ],
        "id string, text string, lang string, split string",
    )
    out = str(tmp_path / "jsonl_corpus")
    man = export_corpus(df, out, partition_by=("split",), id_col="id",
                        format="jsonl")
    assert man["format"] == "jsonl"
    assert man["total_rows"] == 20
    assert set(man["partitions"]) == {"train", "test"}
    assert all(p["bytes"] > 0 and p["files"] > 0 for p in man["partitions"].values())
    assert read_manifest(out)["total_rows"] == 20

    docs = documents_from_jsonl(spark, out, lang_field="lang")
    rows = docs.collect()
    assert len(rows) == 20
    assert {r["orig_id"] for r in rows} == {f"doc-{i}" for i in range(20)}
    assert all(r["n_chars"] == len(r["text"]) for r in rows)
    assert len({r["doc_id"] for r in rows}) == 20  # hashed ids distinct
    # re-read gives the SAME hashed ids (stability contract)
    again = {r["orig_id"]: r["doc_id"] for r in documents_from_jsonl(
        spark, out, lang_field="lang").collect()}
    assert all(again[r["orig_id"]] == r["doc_id"] for r in rows)

    with __import__("pytest").raises(ValueError, match="format"):
        export_corpus(df, out, id_col="id", format="xml")


def test_jsonl_reader_fails_loud_on_bad_fields_and_null_ids(spark, tmp_path):
    """A typo'd explicit field name or a line with no id must raise —
    silent 'und' labeling / NULL doc_ids corrupt downstream id-keyed
    streams."""
    import json as _json

    import pytest as _pytest

    from talna_spark.sources.generic import documents_from_jsonl

    d = str(tmp_path / "shards")
    import os
    os.makedirs(d)
    with open(f"{d}/a.json", "w") as f:
        f.write(_json.dumps({"id": "x1", "text": "hello", "lang": "en"}) + "\n")
        f.write(_json.dumps({"text": "no id here"}) + "\n")  # null id row

    with _pytest.raises(ValueError, match="langauge"):
        documents_from_jsonl(spark, d, lang_field="langauge")

    with _pytest.raises(Exception, match="null 'id'"):
        documents_from_jsonl(spark, d).collect()


def test_jsonl_export_preserves_all_null_columns(spark, tmp_path):
    """ignoreNullFields=false: an all-null column survives the jsonl
    round trip instead of vanishing from the written lines."""
    from talna_spark.pipeline.export import export_corpus

    df = spark.createDataFrame(
        [("a", "t1", None, "train"), ("b", "t2", None, "train")],
        "id string, text string, lang string, split string",
    )
    out = str(tmp_path / "nulls")
    export_corpus(df, out, partition_by=("split",), id_col="id", format="jsonl")
    back = spark.read.json(out)
    assert "lang" in back.columns
    assert back.filter("lang IS NULL").count() == 2
