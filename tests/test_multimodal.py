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
