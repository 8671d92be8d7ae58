"""Deterministic dataset splitting / sampling for training-data curation.

Split assignment must be (a) stable across runs, cluster sizes, and task
retries — a document's split NEVER depends on partitioning — and (b)
uniform. Both engines derive a bucket in [0, 100) from the md5 of the
document id (not the text: re-crawled/cleaned text must not migrate a doc
between train and eval), then threshold: bucket < 80 -> train, < 90 ->
val, else test. No rand(), no sampleBy: seeded rand() is
partition-dependent in Spark and irreproducible in SQL, while the hash
formulation is a pure per-row expression — map-only, zero shuffle,
codegen-friendly, and the DuckDB oracle computes the identical bytes.

The same bucket column is the idiomatic deterministic sampler:
``bucket < pct`` is a stable pct% sample (used by sample_sql below).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRAIN_PCT = 80
VAL_PCT = 10  # test = remainder


def _bucket(col: F.Column) -> F.Column:
    # first 8 md5 hex chars -> int -> mod 100: uniform, engine-portable
    # (same construction as the multimodal fake-embedding oracle)
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % 100


def split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bucket, split) for every document — the reproducible
    train/val/test partition of the corpus."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    b = _bucket(F.col("doc_id"))
    split = (
        F.when(b < TRAIN_PCT, F.lit("train"))
        .when(b < TRAIN_PCT + VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return d.select("doc_id", b.alias("bucket"), split.alias("split"))


def split_assign_sql() -> str:
    b = (
        "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) "
        "% 100"
    )
    return (
        f"SELECT doc_id, {b} AS bucket, "
        f"CASE WHEN {b} < {TRAIN_PCT} THEN 'train' "
        f"WHEN {b} < {TRAIN_PCT + VAL_PCT} THEN 'val' "
        f"ELSE 'test' END AS split FROM documents"
    )


def deterministic_sample(
    df: DataFrame, id_col: str, pct: int
) -> DataFrame:
    """Stable ``pct``% sample of any DataFrame by id hash — survives
    retries, repartitioning, and cluster-size changes (unlike
    ``df.sample``, whose seeded rand() is partition-dependent)."""
    if not 0 < int(pct) <= 100:
        raise ValueError("pct must be in (0, 100]")
    return df.filter(_bucket(F.col(id_col)) < int(pct))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    pcts: dict,
    default_pct: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-rebalancing step
    (e.g. downsample boilerplate-heavy sources, keep 100% of rare
    languages). ``pcts`` maps stratum value -> keep percentage; strata
    not listed keep ``default_pct``%. Same id-hash bucket as
    :func:`deterministic_sample`: a pure per-row expression, zero
    shuffle, stable across runs/retries — unlike ``sampleBy``, whose
    seeded rand() is partition-dependent."""
    for v in list(pcts.values()) + [default_pct]:
        if not 0 <= int(v) <= 100:
            raise ValueError("percentages must be in [0, 100]")
    thresh = F.lit(int(default_pct))
    for value, pct in sorted(pcts.items()):
        thresh = F.when(
            F.col(stratum_col) == F.lit(value), F.lit(int(pct))
        ).otherwise(thresh)
    return df.filter(_bucket(F.col(id_col)) < thresh)
