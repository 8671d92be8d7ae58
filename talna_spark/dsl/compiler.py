"""AST compilers (reference ``Node::evaluate``, src/query/filter.rs:92-139,
operator O20 — re-expressed declaratively).

The reference evaluates the AST against an inverted index into a concrete
``Vec<SeriesId>`` (postings intersection/union/complement, operators
O14-O19). On Spark the same semantics compile to a boolean ``Column``
predicate over the series tag map; Catalyst then handles the set algebra,
pushes the predicate into the (small) series-dimension scan, and the
matching series ids reach the fact scan via a broadcast semi-join — the
same asymptotic shape as a postings-list intersection without materializing
an index (SURVEY.md §1.4).

NULL semantics: a series lacking tag ``k`` must be EXCLUDED by ``k:v`` and
``k:prefix*``, but INCLUDED by ``!k:v`` — the reference complements against
id sets, so absent tags fall in the complement (src/query/filter.rs:126-137).
Three-valued SQL logic would instead drop NULLs on both sides, so every leaf
is coalesced to a two-valued boolean before NOT/AND/OR combine.

Deviation (documented, SURVEY.md O19): the reference complements against ALL
series in the database across metrics (src/smap.rs:39-52); we scope NOT to
the queried metric, which is observationally equivalent after grouping.

``compile_to_sql`` emits the identical predicate as ANSI SQL for the DuckDB
oracle, given a mapping from tag key -> SQL expression.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F

from talna_spark.dsl.ast import AllStar, And, Eq, Node, Not, Or, Wildcard
from talna_spark.errors import InvalidQueryError


def compile_to_column(node: Node, tags: Column) -> Column:
    """Compile a filter AST to a boolean Column over a map<string,string>."""
    if isinstance(node, AllStar):
        return F.lit(True)
    if isinstance(node, Eq):
        # null-safe equality: absent tag -> False, not NULL (O14)
        return tags.getItem(node.key).eqNullSafe(F.lit(node.value))
    if isinstance(node, Wildcard):
        if node.prefix == "":
            # key-exists (O15; reference test src/db.rs:1124-1132)
            return tags.getItem(node.key).isNotNull()
        return F.coalesce(
            tags.getItem(node.key).startswith(node.prefix), F.lit(False)
        )
    if isinstance(node, And):
        return compile_to_column(node.left, tags) & compile_to_column(node.right, tags)
    if isinstance(node, Or):
        return compile_to_column(node.left, tags) | compile_to_column(node.right, tags)
    if isinstance(node, Not):
        return ~compile_to_column(node.child, tags)
    raise InvalidQueryError(f"unknown AST node: {node!r}")


def _sql_escape(value: str) -> str:
    return value.replace("'", "''")


def compile_to_sql(
    node: Node, tag_expr: Mapping[str, str] | Callable[[str], str]
) -> str:
    """Compile a filter AST to an ANSI-SQL boolean expression.

    ``tag_expr`` maps a tag key to the SQL expression producing that tag's
    value (VARCHAR, NULL when absent). Used to generate the DuckDB oracle
    for the exact same AST the Spark path runs, so the two can never drift.
    """
    if callable(tag_expr):
        lookup = tag_expr
    else:
        lookup = lambda k: tag_expr[k] if k in tag_expr else "NULL"  # noqa: E731

    def go(n: Node) -> str:
        if isinstance(n, AllStar):
            return "TRUE"
        if isinstance(n, Eq):
            return f"COALESCE({lookup(n.key)} = '{_sql_escape(n.value)}', FALSE)"
        if isinstance(n, Wildcard):
            if n.prefix == "":
                return f"({lookup(n.key)} IS NOT NULL)"
            pfx = _sql_escape(n.prefix).replace("%", r"\%").replace("_", r"\_")
            return (
                f"COALESCE({lookup(n.key)} LIKE '{pfx}%' ESCAPE '\\', FALSE)"
            )
        if isinstance(n, And):
            return f"({go(n.left)} AND {go(n.right)})"
        if isinstance(n, Or):
            return f"({go(n.left)} OR {go(n.right)})"
        if isinstance(n, Not):
            return f"(NOT {go(n.child)})"
        raise InvalidQueryError(f"unknown AST node: {n!r}")

    return go(node)
