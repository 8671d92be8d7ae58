"""Filter DSL tests — AST shapes mirror the reference's parser tests
(src/query/filter.rs:295-365 and src/query/parser/mod.rs:102-226)."""

from __future__ import annotations

import pytest

from talna_spark.dsl import (
    AllStar,
    And,
    Eq,
    Not,
    Or,
    Wildcard,
    parse_filter_query,
)
from talna_spark.errors import InvalidQueryError

P = parse_filter_query


def test_allstar():
    assert P("*") == AllStar()
    assert P("  *  ") == AllStar()


def test_eq():
    assert P("env:prod") == Eq("env", "prod")
    assert P("service:db.postgres.14") == Eq("service", "db.postgres.14")
    assert P("host:h-1") == Eq("host", "h-1")


def test_and_or():
    assert P("env:prod AND service:db") == And(Eq("env", "prod"), Eq("service", "db"))
    assert P("db:postgres OR db:mariadb") == Or(
        Eq("db", "postgres"), Eq("db", "mariadb")
    )


def test_precedence_not_and_or():
    # NOT > AND > OR (reference src/query/filter.rs:189, 204)
    assert P("a:1 OR b:2 AND c:3") == Or(Eq("a", "1"), And(Eq("b", "2"), Eq("c", "3")))
    assert P("!a:1 AND b:2") == And(Not(Eq("a", "1")), Eq("b", "2"))
    assert P("a:1 AND b:2 OR c:3") == Or(And(Eq("a", "1"), Eq("b", "2")), Eq("c", "3"))


def test_left_associative_chain():
    assert P("a:1 AND b:2 AND c:3") == And(And(Eq("a", "1"), Eq("b", "2")), Eq("c", "3"))


def test_nesting():
    assert P("env:prod AND (service:db OR service:api)") == And(
        Eq("env", "prod"), Or(Eq("service", "db"), Eq("service", "api"))
    )


def test_not_nested():
    assert P("!(a:1 OR b:2)") == Not(Or(Eq("a", "1"), Eq("b", "2")))
    assert P("!!a:1") == Not(Not(Eq("a", "1")))


def test_wildcard():
    assert P("service:db.postgres.*") == Wildcard("service", "db.postgres.")
    assert P("service:db.*") == Wildcard("service", "db.")
    # empty prefix = key-exists (src/query/lexer.rs:21; test src/db.rs:1124-1132)
    assert P("service:*") == Wildcard("service", "")


def test_set_syntax():
    # host:[a, b, c] -> Or(Or(Eq,Eq),Eq) (reference src/query/parser/mod.rs:32-45)
    assert P("host:[h-1, h-2, h-3]") == Or(
        Or(Eq("host", "h-1"), Eq("host", "h-2")), Eq("host", "h-3")
    )
    assert P("host:[solo]") == Eq("host", "solo")


@pytest.mark.parametrize(
    "bad",
    [
        "",
        "   ",
        "env:",                # missing value
        "AND env:prod",        # dangling operator
        "env:prod AND",        # trailing operator
        "(env:prod",           # unbalanced (
        "env:prod)",           # unbalanced )
        "env:prod env:dev",    # adjacent operands
        "env:prod AND AND env:dev",
        "* AND env:prod",      # AllStar only valid standalone
        "env:*prod",           # wildcard only as suffix
        "env:[a,]",            # malformed set
        "env : prod",          # space inside leaf is a lex error
        "!",
    ],
)
def test_invalid(bad):
    with pytest.raises(InvalidQueryError):
        P(bad)


def test_compile_to_sql_shapes():
    from talna_spark.dsl import compile_to_sql

    sql = compile_to_sql(P("env:prod AND !svc:x"), {"env": "e", "svc": "s"})
    assert sql == "(COALESCE(e = 'prod', FALSE) AND (NOT COALESCE(s = 'x', FALSE)))"
    assert compile_to_sql(P("k:*"), {"k": "kk"}) == "(kk IS NOT NULL)"
    assert "LIKE 'db.%'" in compile_to_sql(P("k:db.*"), {"k": "kk"})
    # unknown tag key -> NULL expression -> never matches, but NOT of it does
    assert compile_to_sql(P("nosuch:tag"), {}) == "COALESCE(NULL = 'tag', FALSE)"
