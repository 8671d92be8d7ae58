"""WAV codec seam tests (pipeline.multimodal): real RIFF parsing over the
mapInPandas plumbing — chunk-walk robustness and loud failure on garbage."""

from __future__ import annotations

import struct

import pytest

from talna_spark.pipeline.multimodal import wav_decode_payloads


def _wav(ch: int, sr: int, pcm: bytes, extra_chunk: bytes = b"") -> bytes:
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(extra_chunk) + len(pcm))
        + b"WAVE"
        + extra_chunk
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, ch, sr, sr * ch * 2, ch * 2, 16)
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )


def _media_df(spark, payloads):
    return spark.createDataFrame(
        [(i, "audio/wav", p) for i, p in enumerate(payloads)],
        "doc_id long, media_type string, payload binary",
    )


def test_wav_decode_round_trip(spark):
    # 2 channels, 3 frames: samples 100, -100, 200, -200, 300, -300
    pcm = struct.pack("<6h", 100, -100, 200, -200, 300, -300)
    df = wav_decode_payloads(_media_df(spark, [_wav(2, 16000, pcm)]))
    r = df.collect()[0]
    assert (r["n_channels"], r["sample_rate"], r["bits"]) == (2, 16000, 16)
    assert r["n_frames"] == 3
    assert r["duration_s"] == 0.000188  # 3/16000 rounded to 6 dp
    assert r["mean_amp"] == 0.0


def test_wav_decode_skips_unknown_chunks_word_aligned(spark):
    # an odd-sized LIST chunk before fmt: the walk must skip it including
    # the RIFF word-alignment pad byte
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    pcm = struct.pack("<2h", 1000, 3000)
    df = wav_decode_payloads(_media_df(spark, [_wav(1, 8000, pcm, junk)]))
    r = df.collect()[0]
    assert r["n_frames"] == 2
    assert r["mean_amp"] == 2000.0


def test_wav_decode_rejects_garbage(spark):
    df = wav_decode_payloads(_media_df(spark, [b"\x00\x01\x02 not a wav"]))
    with pytest.raises(Exception, match="RIFF"):
        df.collect()


def test_bmp_decode_round_trip(spark):
    # decoded fields must equal the DuckDB twin's independent arithmetic
    # (doc_id -> expected stats, no BMP parsing in SQL): the writer's
    # bottom-up padded layout and the parser's undoing of it cross-check
    import duckdb

    from talna_spark.pipeline.multimodal import bmp_decode, bmp_decode_sql

    sf = "/root/testdata/sf0.001"
    got = sorted(map(tuple, bmp_decode(spark, sf).collect()))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = sorted(map(tuple, con.sql(bmp_decode_sql()).fetchall()))
    con.close()
    assert len(got) == len(want) > 0
    assert got == want


def test_bmp_decode_handles_top_down_rows(spark):
    # negative height = top-down storage (valid BMP variant): the
    # order-sensitive checksum must come out identical either way
    import struct

    from pyspark.sql import functions as F

    from talna_spark.pipeline.multimodal import bmp_decode_payloads

    w, h = 3, 2
    row_raw, pad = 3 * w, (-(3 * w)) % 4
    logical = bytes((11 * i) % 256 for i in range(row_raw * h))

    def blob(top_down: bool) -> bytes:
        ys = range(h) if top_down else range(h - 1, -1, -1)
        px = b"".join(
            logical[y * row_raw : (y + 1) * row_raw] + b"\x00" * pad for y in ys
        )
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0,
            len(px), 2835, 2835, 0, 0,
        )
        return struct.pack("<2sIHHI", b"BM", 54 + len(px), 0, 0, 54) + info + px

    media = spark.createDataFrame(
        [(1, "image/bmp", blob(False)), (2, "image/bmp", blob(True))],
        "doc_id long, media_type string, payload binary",
    )
    rows = {r["doc_id"]: r for r in bmp_decode_payloads(media).collect()}
    assert rows[1]["checksum"] == rows[2]["checksum"]
    assert rows[1]["mean_px"] == rows[2]["mean_px"]
    assert rows[1]["width"] == rows[2]["width"] == w


def test_bmp_decode_rejects_garbage(spark):
    import pytest as _pytest

    from talna_spark.pipeline.multimodal import bmp_decode_payloads

    media = spark.createDataFrame(
        [(1, "image/bmp", b"NOTABMP_________" * 8)],
        "doc_id long, media_type string, payload binary",
    )
    with _pytest.raises(Exception, match="BMP"):
        bmp_decode_payloads(media).collect()


def test_png_decode_round_trip(spark):
    # decoded fields must equal the DuckDB twin's independent arithmetic
    # (doc_id -> expected stats, no PNG parsing in SQL): the writer's
    # filter application + deflate and the decoder's inflate + unfilter
    # cross-check byte-for-byte via the order-sensitive checksum
    import duckdb

    from talna_spark.pipeline.multimodal import png_decode, png_decode_sql

    sf = "/root/testdata/sf0.001"
    got = sorted(map(tuple, png_decode(spark, sf).collect()))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = sorted(map(tuple, con.sql(png_decode_sql()).fetchall()))
    con.close()
    assert len(got) == len(want) > 0
    assert got == want


def test_png_corpus_exercises_every_filter_type(spark):
    # the writer cycles filter (doc_id + y) % 5; the sf0.001 corpus must
    # hit all five so the round-trip test above actually covers them
    import zlib

    rows = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id").limit(20).collect()
    )
    seen = set()
    for r in rows:
        did = int(r["doc_id"])
        h = 2 + did % 5
        seen |= {(did + y) % 5 for y in range(h)}
    assert seen == {0, 1, 2, 3, 4}


def test_png_decode_rejects_bad_crc_and_garbage(spark):
    import struct
    import zlib

    import pandas as pd
    import pytest
    from pyspark.errors.exceptions.base import PythonException

    from talna_spark.pipeline.multimodal import png_decode_payloads

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"\x00\x01\x02\x03")
    good = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    # flip one IDAT payload byte WITHOUT fixing the CRC
    bad = bytearray(good)
    bad[8 + 12 + 13 + 8 + 2] ^= 0xFF
    for blob, msg in [(bytes(bad), "CRC"), (b"JFIF not a png", "not a PNG")]:
        media = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "media_type": ["image/png"], "payload": [blob]})
        )
        with pytest.raises(PythonException, match=msg):
            png_decode_payloads(media).collect()
