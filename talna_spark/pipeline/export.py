"""Curated-corpus export: the sink at the end of the curation pipeline.

A training run consumes the corpus as partitioned parquet plus a
manifest it can trust without listing/scanning the dataset itself
(loader sharding, epoch accounting, mixture audits all read the
manifest). Export is:

- **partitioned** by the caller's columns (typically ``split`` and/or
  ``source``) — partition pruning then serves "give me train" without
  touching val/test files;
- **size-disciplined**: ``max_records_per_file`` caps file row counts
  (training loaders want many same-ish-sized shards, not one giant
  file); the fan-out repartitions by partition columns + a
  deterministic id-hash shard so output shards are stable across
  retries and cluster sizes, never rand()/round-robin;
- **manifested**: `_MANIFEST.json` records per-partition row counts,
  file counts and bytes, computed from the WRITTEN files (parquet
  footers via one metadata-only count — not from the input plan), so
  the manifest cannot drift from the data even if a concurrent writer
  misbehaves.

At 100 TB: the write is one shuffle sized rows/max_records_per_file;
the manifest pass reads footers only. No driver-side data movement —
the only collect is the per-partition count aggregate (rows =
#partitions).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MANIFEST_NAME = "_MANIFEST.json"


def export_corpus(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = ("split",),
    id_col: str = "doc_id",
    max_records_per_file: int = 1_000_000,
    format: str = "parquet",
) -> dict:
    """Write ``df`` as a partitioned, manifested corpus. ``format``:
    'parquet' (zstd, the warehouse-native layout) or 'jsonl' (gzip
    json-lines — the LLM-corpus interchange format Dolma/RedPajama
    shards ship as). Returns the manifest dict (also written to
    ``path/_MANIFEST.json``).
    """
    if format not in ("parquet", "jsonl"):
        raise ValueError(f"unknown export format: {format!r}")
    parts = list(partition_by)
    missing = [c for c in parts + [id_col] if c not in df.columns]
    if missing:
        raise ValueError(f"export columns missing from frame: {missing}")
    n_shards = F.lit(int(max_records_per_file))
    # deterministic shard: stable across retries/partitioning (same rule
    # as pipeline.sampling — never rand()/spark_partition_id)
    shard = (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
        ).cast("long")
        % n_shards
    )
    writer = (
        df.repartition(*[F.col(c) for c in parts], shard)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", int(max_records_per_file))
        .partitionBy(*parts)
    )
    if format == "parquet":
        writer.option("compression", "zstd").parquet(path)
    else:
        # keep null fields so a jsonl export round-trips to the same
        # shape as the parquet sink (Spark's JSON writer drops them by
        # default, which would silently erase an all-null column)
        writer.option("compression", "gzip").option(
            "ignoreNullFields", "false"
        ).json(path)
    # manifest from the WRITTEN dataset: count per partition (parquet
    # footers are metadata-only; jsonl pays ONE decompress pass for the
    # count — the known schema is passed so no inference scan happens),
    # file/byte inventory from the FS walk
    written = (
        df.sparkSession.read.parquet(path)
        if format == "parquet"
        else df.sparkSession.read.schema(df.drop(*parts).schema).json(path)
    )
    counts = {
        tuple(str(r[c]) for c in parts): r["n"]
        for r in written.groupBy(*parts).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    partitions = {}
    ext = ".parquet" if format == "parquet" else (".json", ".json.gz")
    for key, n in sorted(counts.items()):
        sub = os.path.join(path, *[f"{c}={v}" for c, v in zip(parts, key)])
        files = [
            os.path.join(dp, f)
            for dp, _dn, fn in os.walk(sub)
            for f in fn
            if f.endswith(ext)
        ]
        partitions["/".join(key)] = {
            "rows": int(n),
            "files": len(files),
            "bytes": int(sum(os.path.getsize(f) for f in files)),
        }
    manifest = {
        "format": format,
        "partition_by": parts,
        "total_rows": int(sum(p["rows"] for p in partitions.values())),
        "partitions": partitions,
    }
    with open(os.path.join(path, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST_NAME)) as f:
        return json.load(f)
