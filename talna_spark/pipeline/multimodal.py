"""Multimodal columns: opaque ``binary`` payloads with typed metadata,
processed by Arrow-batched ``mapInPandas`` — the plumbing a 100 TB
image/audio/video pipeline needs, with the codec boundary stubbed.

The Spark-side shape is real and tested:
- payloads travel as a BinaryType column next to a media_type string and a
  metadata struct;
- feature extraction is a mapInPandas pass (Arrow batches, bounded memory,
  no shuffle), the exact slot where a real decoder (PIL / ffmpeg / torch)
  would run on the executor;
- the decode step for non-text media raises NotImplementedError behind a
  clearly marked seam (`_decode_features`) — the container ships no
  image/audio libs (driver environment constraint), so text payloads are
  the deterministic stand-in: every documents row becomes a utf-8 blob.

Because the fake "decoder" derives features from md5(blob), the operator
still has a strict DuckDB oracle (md5 of the same utf-8 bytes).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EMBED_DIMS = 4

FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, fingerprint string, "
    + ", ".join(f"f{i} double" for i in range(EMBED_DIMS))
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> multimodal layout: (doc_id, media_type, payload binary,
    meta struct). The payload is the utf-8 encoding of the text."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.col("lang").alias("lang"),
            F.col("source").alias("source"),
            F.col("n_chars").alias("n_chars"),
        ).alias("meta"),
    )


def extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Batch shape: the function receives an iterator of Arrow-sized
    pandas DataFrames (spark.sql.execution.arrow.maxRecordsPerBatch rows
    each) and yields feature frames — constant memory per task regardless
    of table size.
    """
    media = media_table(spark, sf_dir)
    n_dims = EMBED_DIMS  # capture plain ints only (closure ships to workers)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def _decode_features(media_type: str, payload: bytes) -> list[float]:
            if media_type == "text/plain":
                # deterministic fake "embedding": md5-derived unit floats.
                # A real decoder (image resize / audio frame-sample) plugs
                # in here and returns real features.
                digest = hashlib.md5(payload).hexdigest()
                return [
                    int(digest[i * 8 : (i + 1) * 8], 16) / 4294967296.0
                    for i in range(n_dims)
                ]
            raise NotImplementedError(
                f"decoder for {media_type!r} not available in this environment "
                "(STUB: image/audio/video codecs intentionally not bundled)"
            )

        for pdf in batches:
            feats = [_decode_features(m, p) for m, p in zip(pdf["media_type"], pdf["payload"])]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "fingerprint": [
                        hashlib.md5(p).hexdigest() for p in pdf["payload"]
                    ],
                }
            )
            for i in range(n_dims):
                out[f"f{i}"] = [round(f[i], 6) for f in feats]
            yield out

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def extract_features_sql() -> str:
    """Oracle: identical features computed by DuckDB from the text bytes."""
    dims = ", ".join(
        f"ROUND(CAST('0x' || substr(md5(text), {i * 8 + 1}, 8) AS BIGINT) "
        f"/ 4294967296.0, 6) AS f{i}"
        for i in range(EMBED_DIMS)
    )
    return (
        "SELECT doc_id, 'text/plain' AS media_type, "
        "octet_length(encode(text)) AS n_bytes, md5(text) AS fingerprint, "
        f"{dims} FROM documents"
    )
