"""End-to-end corpus curation: the composed pass a training-data
pipeline actually runs — quality gate -> exact dedup -> benchmark
decontamination -> deterministic split — emitting one row per document
with its verdict and the reason it was dropped (auditable curation: a
dropped doc is explainable, not silently gone).

Verdict precedence (first failure wins, cheapest signals first):
``low_quality`` -> ``duplicate`` (non-canonical copy of a text) ->
``contaminated`` (shares a word shingle with the eval slice) -> kept,
with the kept docs carrying their train/val/test split.

Every stage is an already-verified operator (pipeline.text.quality,
pipeline.dedup.exact_survivors, pipeline.decontam, pipeline.sampling),
and the DuckDB twin composes the SAME generated SQL pieces, so the
composition cannot drift from its parts. Plan shape: one corpus scan
feeds map-only quality + split expressions; dedup adds one hash
aggregate; contamination adds the broadcast semi-join — nothing
shuffles document text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from talna_spark.pipeline.decontam import (
    EVAL_MOD,
    SHINGLE_K,
    contamination_scan,
    contamination_scan_sql,
)
from talna_spark.pipeline.dedup import exact_survivors, exact_survivors_sql
from talna_spark.pipeline.sampling import TRAIN_PCT, VAL_PCT, _bucket
from talna_spark.pipeline.text import quality, quality_sql

QUALITY_MIN = 0.5


def curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, verdict, split) for every document: verdict in
    {low_quality, duplicate, contaminated, kept}; split only for kept."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    q = quality(spark, sf_dir).select("doc_id", "quality")
    keep = exact_survivors(spark, sf_dir).select(
        F.col("keep_doc").alias("doc_id"), F.lit(True).alias("_canon")
    )
    contam = contamination_scan(spark, sf_dir).select(
        "doc_id", F.lit(True).alias("_hit")
    )
    b = _bucket(F.col("doc_id"))
    split = (
        F.when(b < TRAIN_PCT, F.lit("train"))
        .when(b < TRAIN_PCT + VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    # eval-slice docs are the benchmark itself — excluded from curation
    # no broadcast hints: the survivor set is corpus-sized (one row per
    # distinct text) and must shuffle-join on doc_id at scale; the
    # contamination set is usually tiny and AQE will broadcast it on its
    # own when it is
    out = (
        d.filter(F.col("doc_id") % EVAL_MOD != 0)
        .join(q, "doc_id")
        .join(keep, "doc_id", "left")
        .join(contam, "doc_id", "left")
    )
    verdict = (
        F.when(F.col("quality") < QUALITY_MIN, F.lit("low_quality"))
        .when(F.col("_canon").isNull(), F.lit("duplicate"))
        .when(F.col("_hit").isNotNull(), F.lit("contaminated"))
        .otherwise(F.lit("kept"))
    )
    return out.select(
        "doc_id",
        verdict.alias("verdict"),
        F.when(verdict == "kept", split).alias("split"),
    )


def curate_sql() -> str:
    """DuckDB twin composed from the SAME generated stage SQL."""
    b = (
        "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) "
        "% 100"
    )
    return (
        f"WITH q AS (SELECT doc_id, quality FROM ({quality_sql()})), "
        f"keep AS (SELECT keep_doc AS doc_id FROM ({exact_survivors_sql()})), "
        f"contam AS (SELECT doc_id FROM ({contamination_scan_sql(SHINGLE_K)})), "
        f"base AS (SELECT d.doc_id, q.quality, "
        f"(k.doc_id IS NOT NULL) AS canon, (c.doc_id IS NOT NULL) AS hit, "
        f"{b} AS bkt "
        f"FROM documents d JOIN q USING (doc_id) "
        f"LEFT JOIN keep k ON d.doc_id = k.doc_id "
        f"LEFT JOIN contam c ON d.doc_id = c.doc_id "
        f"WHERE d.doc_id % {EVAL_MOD} <> 0) "
        f"SELECT doc_id, "
        f"CASE WHEN quality < {QUALITY_MIN} THEN 'low_quality' "
        f"WHEN NOT canon THEN 'duplicate' "
        f"WHEN hit THEN 'contaminated' ELSE 'kept' END AS verdict, "
        f"CASE WHEN quality >= {QUALITY_MIN} AND canon AND NOT hit THEN "
        f"(CASE WHEN bkt < {TRAIN_PCT} THEN 'train' "
        f"WHEN bkt < {TRAIN_PCT + VAL_PCT} THEN 'val' ELSE 'test' END) "
        f"END AS split FROM base"
    )
