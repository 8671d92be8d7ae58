"""Mergeable frequency sketches — the bounded-memory summaries a
100 TB pipeline carries between stages where exact aggregation is
either too big to broadcast or must merge across shards/streams:

- COUNT-MIN (this module; Cormode & Muthukrishnan 2005): a d x w grid
  of counters; every key increments one counter per hash row, a point
  query reads the MINIMUM of its d cells. Estimates NEVER undercount
  (every cell the key touches holds its true count plus collisions), so
  the sketch is safe for heavy-hitter gates: anything the sketch says
  is rare truly is. Sketches of shards ADD cell-wise into the sketch of
  the union (tested) — the merge property that makes it buildable
  incrementally and usable as broadcast state for a stream.
- Bloom membership lives in pipeline.dedup (bloom_build — same
  discipline, bit_or instead of sum).
- Distinct-count (HLL++) is Spark's own approx_count_distinct, already
  wired as the reference surface's distinct_series_approx.

All hashing is the portable md5-based hash64 with a per-row prefix, so
the cell grid is deterministic and cross-engine: the DuckDB twin
computes identical cells (driver-checked as the x26 ``cms`` slice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from talna_spark.pipeline.portable import hash64

CMS_W = 1 << 12  # counters per hash row (the collision dial)
CMS_D = 4        # hash rows (the confidence dial)


def _cms_pos(col, i: int, w: int):
    """Row-i counter index of a key — one independent md5-based hash
    per row (prefix 'cm{i}|'), reduced mod w."""
    return hash64(F.concat(F.lit(f"cm{i}|"), col)) % F.lit(int(w))


def cms_build(
    d: DataFrame, col: str, w: int = CMS_W, depth: int = CMS_D
) -> DataFrame:
    """(r, c, cnt): the d x w count-min sketch of ``col``'s value
    frequencies — one explode + one sum hash-agg (map-side partials),
    at most d*w rows regardless of corpus size. NULL keys are not
    counted (a NULL is not a value). Mergeable: see :func:`cms_merge`.

    100 TB shape: the ONLY shuffle carries (r, c) id-rows capped at the
    sketch size; the corpus never aggregates by key, which is the point
    — per-key exact counts of a high-cardinality column would shuffle
    the full key set."""
    if int(w) < 1 or int(depth) < 1:
        raise ValueError("w and depth must be >= 1")
    cells = d.filter(F.col(col).isNotNull()).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("r"),
                        _cms_pos(F.col(col), i, w).alias("c"),
                    )
                    for i in range(int(depth))
                ]
            )
        ).alias("rc")
    )
    return (
        cells.groupBy(
            F.col("rc.r").alias("r"), F.col("rc.c").alias("c")
        ).agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise ADD of sketches built with the same (w, depth): the
    sketch of a union of shards (tested) — incremental builds and
    per-shard parallel builds compose."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("r", "c").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    keys: DataFrame,
    col: str,
    sketch: DataFrame,
    w: int = CMS_W,
    depth: int = CMS_D,
) -> DataFrame:
    """(col, est): the count-min point estimate for each key — min over
    the key's d cells (absent cells are exact zeros: the key was never
    counted). est >= the true count ALWAYS; equality when no collision
    (tested both ways). Plan: explode d probes per key, one join
    against the sketch-sized cell table, one min hash-agg — only
    (key, r, c) rows shuffle."""
    probes = keys.select(
        col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("r"),
                        _cms_pos(F.col(col), i, w).alias("c"),
                    )
                    for i in range(int(depth))
                ]
            )
        ).alias("rc"),
    ).select(col, F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
    return (
        probes.join(F.broadcast(sketch), ["r", "c"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def cms_sql_cells(values_sql: str, w: int = CMS_W, depth: int = CMS_D) -> str:
    """DuckDB twin of :func:`cms_build` over ``values_sql`` (one column
    named v): identical (r, c, cnt) cells."""
    from talna_spark.pipeline.portable import hash64_sql

    h = hash64_sql("'cm' || CAST(i AS VARCHAR) || '|' || v")
    return (
        f"SELECT i AS r, ({h}) % {int(w)} AS c, COUNT(*) AS cnt "
        f"FROM ({values_sql}) "
        f"CROSS JOIN unnest(generate_series(0, {int(depth) - 1})) t(i) "
        "WHERE v IS NOT NULL GROUP BY 1, 2"
    )


def cms_estimate_sql(
    keys_sql: str, values_sql: str, w: int = CMS_W, depth: int = CMS_D
) -> str:
    """DuckDB twin of build + estimate: per-key min over the d cells."""
    from talna_spark.pipeline.portable import hash64_sql

    h = hash64_sql("'cm' || CAST(i AS VARCHAR) || '|' || v")
    return (
        f"WITH cells AS ({cms_sql_cells(values_sql, w, depth)}), "
        f"probes AS (SELECT v, i AS r, ({h}) % {int(w)} AS c "
        f"FROM ({keys_sql}) "
        f"CROSS JOIN unnest(generate_series(0, {int(depth) - 1})) t(i)) "
        "SELECT p.v, MIN(COALESCE(cells.cnt, 0)) AS est FROM probes p "
        "LEFT JOIN cells ON p.r = cells.r AND p.c = cells.c GROUP BY p.v"
    )
