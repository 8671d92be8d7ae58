"""WebDataset tar-shard source/sink: exact round trip, deterministic
shard bytes, loud corruption/duplicate failures, and composition with
the multimodal BMP codec over the payload column."""

from __future__ import annotations

import glob
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from talna_spark.sources.webdataset import read_webdataset, write_webdataset

SF = "/root/testdata/sf0.001"


def _sample_df(spark, n=40):
    from talna_spark.pipeline.multimodal import bmp_media_table

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < n)
    )
    media = bmp_media_table(spark, SF).filter(F.col("doc_id") < n).select(
        "doc_id", F.col("payload").alias("image")
    )
    return docs.join(media, "doc_id").select(
        F.format_string("%06d", F.col("doc_id")).alias("key"),
        "text",
        "image",
        F.format_string('{"doc_id": %d}', F.col("doc_id")).alias("meta"),
    )


def test_webdataset_round_trip_exact(spark, tmp_path):
    d = str(tmp_path / "wds")
    df = _sample_df(spark)
    manifest = write_webdataset(df, d, n_shards=3).collect()
    assert sum(r["n_samples"] for r in manifest) == 40
    assert sum(r["n_members"] for r in manifest) == 120  # txt+json+bmp each
    assert len(glob.glob(f"{d}/shard-*.tar")) == len(manifest) <= 3
    back = read_webdataset(spark, f"{d}/shard-*.tar")
    want = {
        r["key"]: (r["text"], bytes(r["image"]), r["meta"])
        for r in df.collect()
    }
    got = {
        r["key"]: (r["text"], bytes(r["image"]), r["meta"])
        for r in back.collect()
    }
    assert got == want
    exts = {r["image_ext"] for r in back.collect()}
    assert exts == {"bmp"}
    assert {r["n_members"] for r in back.collect()} == {3}


def test_webdataset_deterministic_shard_bytes(spark, tmp_path):
    df = _sample_df(spark, n=20)
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_webdataset(df, d1, n_shards=2).collect()
    write_webdataset(df.repartition(7), d2, n_shards=2).collect()
    f1 = sorted(glob.glob(f"{d1}/*.tar"))
    f2 = sorted(glob.glob(f"{d2}/*.tar"))
    assert f1 and [os.path.basename(p) for p in f1] == [
        os.path.basename(p) for p in f2
    ]
    for a, b in zip(f1, f2):
        assert open(a, "rb").read() == open(b, "rb").read()


def test_webdataset_null_members_omitted(spark, tmp_path):
    d = str(tmp_path / "nulls")
    df = spark.createDataFrame(
        [("k1", "hello", None), ("k2", None, '{"x": 1}')],
        "key string, text string, meta string",
    )
    write_webdataset(df, d, n_shards=1).collect()
    got = {
        r["key"]: (r["text"], r["image"], r["meta"], r["n_members"])
        for r in read_webdataset(spark, f"{d}/*.tar").collect()
    }
    assert got == {
        "k1": ("hello", None, None, 1),
        "k2": (None, None, '{"x": 1}', 1),
    }


def test_webdataset_corrupted_member_fails_loudly(spark, tmp_path):
    d = str(tmp_path / "corrupt")
    write_webdataset(_sample_df(spark, n=10), d, n_shards=1).collect()
    (tar,) = glob.glob(f"{d}/*.tar")
    raw = open(tar, "rb").read()
    # cut mid-archive: whether the cut lands inside member data (short
    # read), inside a header (framing error), or exactly on a member
    # boundary (missing end-of-archive marker), the reader must raise —
    # never silently shrink the corpus
    open(tar, "wb").write(raw[: len(raw) // 2])
    with pytest.raises(
        Exception,
        match="truncated|unexpected end|ReadError|end-of-archive",
    ):
        read_webdataset(spark, f"{d}/*.tar").collect()
    # boundary-exact cut: keep the first member's header+data only
    import io as _io
    import tarfile as _tarfile

    with _tarfile.open(fileobj=_io.BytesIO(raw)) as tf:
        mem = next(iter(tf))
        cut = mem.offset_data + 512 * ((mem.size + 511) // 512)
    open(tar, "wb").write(raw[:cut])
    with pytest.raises(Exception, match="end-of-archive"):
        read_webdataset(spark, f"{d}/*.tar").collect()


def test_webdataset_duplicate_keys_fail_loudly(spark, tmp_path):
    d = str(tmp_path / "dup")
    df = spark.createDataFrame(
        [("k", "a"), ("k", "b")], "key string, text string"
    )
    with pytest.raises(Exception, match="duplicate sample keys"):
        write_webdataset(df, d, n_shards=1).collect()


def test_webdataset_composes_with_bmp_codec(spark, tmp_path):
    """The payload column is a first-class multimodal citizen: shard ->
    read -> bmp_decode_payloads/bmp_resize_payloads produce exactly what
    the direct media table produces (same doc_ids, same stats)."""
    from talna_spark.pipeline.multimodal import (
        bmp_decode_payloads,
        bmp_media_table,
    )

    d = str(tmp_path / "mm")
    write_webdataset(_sample_df(spark, n=25), d, n_shards=2).collect()
    media = read_webdataset(spark, f"{d}/*.tar").select(
        F.col("key").cast("long").alias("doc_id"),
        F.concat(F.lit("image/"), F.col("image_ext")).alias("media_type"),
        F.col("image").alias("payload"),
    )
    got = sorted(map(tuple, bmp_decode_payloads(media).collect()))
    want = sorted(
        map(
            tuple,
            bmp_decode_payloads(
                bmp_media_table(spark, SF).filter(F.col("doc_id") < 25)
            ).collect(),
        )
    )
    assert got == want and len(got) == 25


def test_webdataset_reserved_image_ext_rejected(spark, tmp_path):
    df = spark.createDataFrame([("k", "t")], "key string, text string")
    for bad in ("txt", "json", ""):
        with pytest.raises(Exception, match="image_ext"):
            write_webdataset(df, str(tmp_path / "x"), image_ext=bad).collect()
