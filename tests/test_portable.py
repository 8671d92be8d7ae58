"""Cross-engine portability tests: every primitive in
talna_spark.pipeline.portable must produce IDENTICAL results in Spark and
DuckDB — these primitives underpin all extension-operator oracles."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from talna_spark.pipeline import portable as P

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "a b",                      # fewer words than shingle k
    "single",
    "  padded   with   spaces  ",
    "exact exact exact exact exact",
]


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def spark_vals(spark, col):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    return [r[0] for r in df.select(col).collect()]


def duck_vals(duck, expr):
    return [
        duck.execute(f"SELECT {expr.replace('text', '?::VARCHAR')}", [t]).fetchone()[0]
        if False
        else duck.execute(f"SELECT {expr}", ).fetchone()[0]
        for t in TEXTS
    ]


def duck_vals_param(duck, expr_template):
    out = []
    for t in TEXTS:
        duck.execute("CREATE OR REPLACE TEMP TABLE _t AS SELECT ?::VARCHAR AS text", [t])
        out.append(duck.execute(f"SELECT {expr_template} FROM _t").fetchone()[0])
    return out


def test_hash64(spark, duck):
    s = spark_vals(spark, P.hash64(F.col("text")))
    d = duck_vals_param(duck, P.hash64_sql("text"))
    assert s == d
    assert all(0 <= v < 2**60 for v in s)


def test_tokens(spark, duck):
    s = spark_vals(spark, P.tokens(F.col("text")))
    d = duck_vals_param(duck, P.tokens_sql("text"))
    assert s == d


@pytest.mark.parametrize("k", [2, 3, 5])
def test_shingles(spark, duck, k):
    s = spark_vals(spark, P.shingles(P.tokens(F.col("text")), k))
    d = duck_vals_param(duck, P.shingles_sql(P.tokens_sql("text"), k))
    assert s == d
    # short texts produce empty lists, not NULL/descending-sequence garbage
    assert s[2] == []


def test_cosine(spark, duck):
    vecs = [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0]), ([1.0, 0.0], [0.0, 1.0]),
            ([0.5] * 64, [0.25] * 64)]
    df = spark.createDataFrame(vecs, "a array<double>, b array<double>")
    s = [r[0] for r in df.select(F.round(P.cosine(F.col("a"), F.col("b")), 6)).collect()]
    d = [
        duck.execute(
            f"SELECT ROUND({P.cosine_sql('?::DOUBLE[]', '?::DOUBLE[]')}, 6)",
            [list(a), list(b)],
        ).fetchone()[0]
        for a, b in vecs
    ]
    assert s == d


def test_md5_identical(spark, duck):
    s = spark_vals(spark, F.md5("text"))
    d = duck_vals_param(duck, "md5(text)")
    assert s == d


@pytest.mark.parametrize("k", [1, 2, 3])
def test_grams_multiplicity_and_order(spark, duck, k):
    s = spark_vals(spark, P.grams(P.tokens(F.col("text")), k))
    d = duck_vals_param(duck, P.grams_sql(P.tokens_sql("text"), k))
    assert s == d
    # multiplicity preserved: 'exact' x5 yields 5 unigrams / 4 bigrams
    assert len(s[4]) == max(0, 5 - (k - 1))
    # short texts guard to empty lists
    if k >= 2:
        assert s[2] == []
