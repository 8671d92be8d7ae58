"""Property-based tests (SURVEY.md §5: "property-based round-trip of
series-key canonicalization" + parser/greedy invariants), via hypothesis.

Spark-involving properties batch all hypothesis examples into ONE job
(collect a list of cases, run a single createDataFrame) so the property
pass doesn't cost one Spark job per example.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from talna_spark.aggregate import _greedy_segment_ids
from talna_spark.dsl.ast import AllStar, And, Eq, Node, Not, Or, Wildcard
from talna_spark.dsl.parser import parse_filter_query

# DSL charsets (reference src/query/lexer.rs:3-26)
KEY_ALPHA = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ_-"
VAL_ALPHA = KEY_ALPHA + "0123456789."

keys = st.text(KEY_ALPHA, min_size=1, max_size=8)
vals = st.text(VAL_ALPHA, min_size=1, max_size=8)


# --------------------------------------------------- parser round-trip
def render(n: Node) -> str:
    """Fully-parenthesized DSL rendering — parsing it must reproduce the
    exact AST (precedence can't interfere under full parens)."""
    if isinstance(n, AllStar):
        return "*"
    if isinstance(n, Eq):
        return f"{n.key}:{n.value}"
    if isinstance(n, Wildcard):
        return f"{n.key}:{n.prefix}*"
    if isinstance(n, And):
        return f"({render(n.left)} AND {render(n.right)})"
    if isinstance(n, Or):
        return f"({render(n.left)} OR {render(n.right)})"
    if isinstance(n, Not):
        return f"!({render(n.child)})"
    raise AssertionError(n)


def ast_nodes() -> st.SearchStrategy[Node]:
    leaves = st.one_of(
        st.builds(Eq, keys, vals),
        st.builds(Wildcard, keys, st.one_of(st.just(""), vals)),
    )
    return st.recursive(
        leaves,
        lambda inner: st.one_of(
            st.builds(And, inner, inner),
            st.builds(Or, inner, inner),
            st.builds(Not, inner),
        ),
        max_leaves=8,
    )


@given(ast_nodes())
@settings(max_examples=200, deadline=None)
def test_parser_round_trips_rendered_ast(node):
    assert parse_filter_query(render(node)) == node


# ------------------------------------------- greedy segmentation invariants
@given(
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=200),
    st.integers(min_value=1, max_value=10**5),
)
@settings(max_examples=200, deadline=None)
def test_greedy_invariants(ts_values, width):
    ts = np.array(sorted(ts_values, reverse=True), dtype=np.int64)
    seg = _greedy_segment_ids(ts, width)
    # bucket ids are 0-based, contiguous, nondecreasing over the DESC scan
    assert seg[0] == 0
    assert set(np.diff(seg).tolist()) <= {0, 1}
    # within a bucket every point is within `width` of the bucket's anchor
    # (its newest = first element); across a boundary the gap exceeds width
    starts = np.flatnonzero(np.diff(seg, prepend=-1))
    for i, s in enumerate(starts):
        e = starts[i + 1] if i + 1 < len(starts) else len(ts)
        assert ts[s] - ts[e - 1] <= width  # anchor - oldest member
        if e < len(ts):
            assert ts[s] - ts[e] > width  # first excluded point


# ------------------------------------- series-key canonicalization (Spark)
def _py_series_key(metric: str, tags: dict[str, str]) -> str:
    joined = ";".join(f"{k}:{tags[k]}" for k in sorted(tags))
    return f"{metric}#{joined}"


def test_series_key_spark_matches_python(spark):
    import pyspark.sql.functions as F

    from talna_spark.ingest import series_key_col

    # one Spark job over many generated cases (hypothesis-free batch: the
    # per-example Spark round-trip would dominate runtime)
    rng = np.random.default_rng(7)
    cases = []
    for _ in range(300):
        nk = int(rng.integers(0, 5))
        tags = {
            "".join(rng.choice(list(KEY_ALPHA), size=int(rng.integers(1, 6)))): "".join(
                rng.choice(list(VAL_ALPHA), size=int(rng.integers(1, 6)))
            )
            for _ in range(nk)
        }
        cases.append(("app.metric", tags))
    df = spark.createDataFrame(
        [(m, t) for m, t in cases], "metric string, tags map<string,string>"
    )
    got = [
        r[0]
        for r in df.select(
            series_key_col(F.col("metric"), F.col("tags"))
        ).collect()
    ]
    expected = [_py_series_key(m, t) for m, t in cases]
    assert got == expected


@settings(max_examples=12, deadline=None)
@given(
    ts=st.lists(
        st.integers(min_value=0, max_value=2_000), min_size=1, max_size=120
    ),
    width=st.integers(min_value=1, max_value=60),
    slice_mult=st.integers(min_value=2, max_value=20),
)
def test_sliced_greedy_equals_single_task_on_random_data(
    spark, ts, width, slice_mult
):
    # the two-level greedy decomposition must be bit-identical to the
    # one-task scan for ANY timestamp multiset / width / slice width
    from pyspark.sql import functions as F

    from talna_spark.aggregate import greedy_buckets, greedy_buckets_sliced
    from tests.conftest import make_points

    rows = [
        ("m", t, float((i * 7919) % 1000) / 8.0, {"h": "a" if i % 3 else "b"})
        for i, t in enumerate(ts)
    ]
    pts = make_points(spark, rows).filter(F.col("metric") == "m")
    grp = F.col("tags").getItem("h")
    single = sorted(
        map(tuple, greedy_buckets(pts, grp, "sum", width).collect())
    )
    sliced = sorted(
        map(
            tuple,
            greedy_buckets_sliced(
                pts, grp, "sum", width, width * slice_mult
            ).collect(),
        )
    )
    assert sliced == single
