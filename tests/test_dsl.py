"""Filter DSL tests — AST shapes mirror the reference's parser tests
(src/query/filter.rs:295-365 and src/query/parser/mod.rs:102-226)."""

from __future__ import annotations

import re

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


# ---- r14 faithfulness audit pins (SURVEY O21/O22 deviations) -------------


@pytest.mark.parametrize(
    "bad",
    [
        "env:prod\x0bAND k:v",   # vertical tab is NOT reference whitespace
        "env:prod\u00a0AND k:v", # nor is a Unicode space (lexer.rs:4)
        "env:prod\u2003AND k:v",
    ],
)
def test_whitespace_class_is_the_references(bad):
    # the reference skips exactly [ \r\t\n\f]; anything else between
    # tokens is a lex error there and must be one here too
    with pytest.raises(InvalidQueryError):
        P(bad)


def test_reference_whitespace_chars_all_skip():
    for ws in (" ", "\r", "\t", "\n", "\f"):
        node = P(f"env:prod{ws}AND{ws}k:v")
        assert isinstance(node, And)


def test_allstar_trim_is_unicode_like_rust():
    # Rust str::trim is Unicode-aware, so "\u00a0*\u00a0" IS AllStar in
    # the reference even though U+00A0 can't appear between tokens
    assert isinstance(P("\u00a0*\u00a0"), AllStar)
    assert isinstance(P("  *\t"), AllStar)


@pytest.mark.parametrize(
    "bad",
    [
        "a:b (c:d OR e:f)",  # leftover operand that bypasses adjacency
        "(a:b OR c:d) e:f",
    ],
)
def test_leftover_operands_error_not_silently_truncate(bad):
    # DOCUMENTED DEVIATION: the reference's only leftover guard is a
    # debug_assert (filter.rs:290) — release talna silently returns the
    # LAST subtree, dropping the rest of the query; we raise instead
    with pytest.raises(InvalidQueryError):
        P(bad)


def test_postfix_not_matches_reference_rpn_quirk():
    # "a:b !" assembles to Not(a) through the RPN in BOTH engines (the
    # reference pops the trailing Not into the queue, filter.rs:244-249)
    node = P("env:prod !")
    assert isinstance(node, Not)


def test_compile_to_sql_shapes():
    from talna_spark.dsl import compile_to_sql

    sql = compile_to_sql(P("env:prod AND !svc:x"), {"env": "e", "svc": "s"})
    assert sql == "(COALESCE(e = 'prod', FALSE) AND (NOT COALESCE(s = 'x', FALSE)))"
    assert compile_to_sql(P("k:*"), {"k": "kk"}) == "(kk IS NOT NULL)"
    assert "LIKE 'db.%'" in compile_to_sql(P("k:db.*"), {"k": "kk"})
    # unknown tag key -> NULL expression -> never matches, but NOT of it does
    assert compile_to_sql(P("nosuch:tag"), {}) == "COALESCE(NULL = 'tag', FALSE)"


# ---------------------------------------------------------------------
# Oracle front-end independence (r9, VERDICT r8 item 6): the oracle's
# recursive-descent filter compiler (talna_spark.oracle.oracle_filter_sql)
# must agree with the engine's lexer + shunting-yard + compile_to_sql on
# EVERY string — same matched rows when valid, same accept/reject verdict
# always — across a generated corpus of valid and mutated expressions.
def _gen_expr(rng, depth=0):
    keys = ["a", "b", "host", "env-x", "_k"]
    vals = ["x", "y", "z1", "1", "prod.eu", "a-b"]
    r = rng.random()
    if depth >= 3 or r < 0.45:
        k = rng.choice(keys)
        kind = rng.randrange(4)
        if kind == 0:
            return f"{k}:{rng.choice(vals)}"
        if kind == 1:
            return f"{k}:{rng.choice(['', *vals])}*"
        if kind == 2:
            members = rng.sample(vals, rng.randrange(1, 4))
            # r16 (VERDICT r15 item 4): comma/edge padding draws from the
            # FULL exact whitespace class [ \r\t\n\f] (was [",", ", ",
            # " , "]) so the differential corpus covers the r15 lexer fix
            ws = lambda: rng.choice(["", *" \r\t\n\f"])  # noqa: E731
            body = ws() + members[0] + ws()
            for m in members[1:]:
                body += "," + ws() + m + ws()
            return f"{k}:[{body}]"
        return f"!{_gen_expr(rng, depth + 1)}"
    if r < 0.65:
        return f"({_gen_expr(rng, depth + 1)})"
    # any reference whitespace char separates tokens (lexer.rs:4, r14)
    w1, w2 = rng.choice(" \r\t\n\f"), rng.choice(" \r\t\n\f")
    op = rng.choice([f"{w1}AND{w2}", f"{w1}OR{w2}"])
    return _gen_expr(rng, depth + 1) + op + _gen_expr(rng, depth + 1)


def _mutate(rng, s):
    # includes the NON-whitespace separators both sides must reject
    # identically: vertical tab and U+00A0 (r14 whitespace-class pin)
    ops = ["(", ")", "!", "*", " AND", " OR", ":", "[", "]", ",", " ", "@",
           "\x0b", "\u00a0"]
    i = rng.randrange(len(s) + 1)
    kind = rng.randrange(4)
    if kind == 3:
        # bracket-internal invalid whitespace (r16, VERDICT r15 item 4):
        # U+00A0 / vertical tab INSIDE key:[...] must reject on both
        # engines exactly like between tokens (the r15 lexer fix)
        j = s.find("[")
        close = s.find("]", j) if j != -1 else -1
        if close > j:
            p = rng.randrange(j + 1, close + 1)
            return s[:p] + rng.choice(["\x0b", "\u00a0"]) + s[p:]
        kind = 0  # no brackets: fall through to a plain insertion
    if kind == 0:
        return s[:i] + rng.choice(ops) + s[i:]
    if kind == 1 and s:
        j = rng.randrange(len(s))
        return s[:j] + s[j + 1 :]
    return s[:i] + rng.choice(ops) + s[i:] + rng.choice(ops)


def test_set_bracket_whitespace_is_the_exact_class():
    """ADVICE r14: the r14 whitespace pin covered inter-token skipping
    but the SET token pattern still used Python \\s (a Unicode
    superset) INSIDE key:[...], so 'k:[a,\\u00a0b]' lexed while the
    same byte between tokens was an error. Both engines now apply the
    reference's exact [ \\r\\t\\n\\f] class inside the brackets too."""
    from talna_spark.oracle import oracle_filter_sql

    lookup = lambda k: "NULL"  # noqa: E731
    # every char of the exact class is fine inside the brackets
    for ws in (" ", "\r", "\t", "\n", "\f"):
        node = P(f"_k:[x,{ws}y]")
        oracle_filter_sql(f"_k:[x,{ws}y]", lookup)
        from talna_spark.dsl import And, Eq, Not, Or  # noqa: F401

        assert isinstance(node, Or)
    # Unicode-superset members are a lex error on BOTH engines, exactly
    # like the same byte between tokens (vertical tab, NBSP, EM SPACE)
    for ws in ("\x0b", " ", " "):
        q = f"_k:[x,{ws}y]"
        with pytest.raises(InvalidQueryError):
            P(q)
        with pytest.raises(InvalidQueryError):
            oracle_filter_sql(q, lookup)


def test_set_bracket_invalid_ws_generated_family():
    """r16 (VERDICT r15 item 4): beyond the fixed fixtures above, inject
    U+00A0 / vertical tab at a RANDOM position inside the brackets of
    generated valid Set expressions — engine and oracle must both
    reject every one (the r15 exact-class lexer fix, pinned against a
    generated family like the dropped-operator precedent)."""
    import random

    from talna_spark.oracle import oracle_filter_sql

    lookup = lambda k: "NULL"  # noqa: E731
    rng = random.Random(20260816)
    n = 0
    while n < 80:
        s = _gen_expr(rng)
        j = s.find("[")
        close = s.find("]", j) if j != -1 else -1
        if close <= j:
            continue
        try:
            P(s)
        except InvalidQueryError:
            continue  # only mutate expressions that start out valid
        p = rng.randrange(j + 1, close + 1)
        bad = s[:p] + rng.choice(["\x0b", "\u00a0"]) + s[p:]
        n += 1
        with pytest.raises(InvalidQueryError):
            P(bad)
        with pytest.raises(InvalidQueryError):
            oracle_filter_sql(bad, lookup)


# ---- cross-metric NOT leak adjudication (r15, sharpens SURVEY O19) ------
# The reference's Not evaluates as smap.list_all() minus matches
# (filter.rs:126-137) and start_query (db.rs:183-206) NEVER re-scopes
# the ids to the queried metric — a NOT reaching the top of the filter
# un-intersected streams FOREIGN metrics' series, and any of them
# carrying the group-by tag survives the O25 drop and aggregates into
# the result. Zero end-to-end NOT tests upstream. This engine scopes
# NOT to the queried metric on BOTH selection backends.


def _reference_not_evaluate(smap_all, tag_index, metric, key, value):
    """Literal port of Node::Not evaluation (filter.rs:126-137):
    complement of the metric-scoped Eq postings against ALL series ids
    in the DB — note `smap_all`, not the metric's universe."""
    ids = set(smap_all)
    for sid in tag_index.get(f"{metric}#{key}:{value}", []):
        ids.discard(sid)
    return sorted(ids)


def test_reference_cross_metric_not_leak_adjudication(spark):
    from pyspark.sql import functions as F

    from talna_spark.database import Database
    from tests.conftest import make_points

    # model DB: cpu has series 1 (host=a, env=prod) and 2 (host=a);
    # mem has series 3 (host=a) — the foreign series with the group tag
    smap_all = [1, 2, 3]
    tag_index = {
        "cpu#env:prod": [1], "cpu#host:a": [1, 2], "mem#host:a": [3],
        "cpu": [1, 2], "mem": [3],
    }
    got = _reference_not_evaluate(smap_all, tag_index, "cpu", "env", "prod")
    # the reference returns series 3 — a MEM series — for a CPU query;
    # start_query streams it and group host=a mixes mem points into the
    # cpu aggregate
    assert got == [2, 3]

    # this engine: same shape end-to-end — NOT stays inside the metric
    rows = [
        ("cpu", 1_000, 10.0, {"host": "a", "env": "prod"}),
        ("cpu", 2_000, 20.0, {"host": "a"}),
        ("mem", 3_000, 999.0, {"host": "a"}),
    ]
    db = Database.from_points(spark, make_points(spark, rows))
    res = db.sum("cpu", "host").filter("!env:prod").collect()
    buckets = res["a"]
    assert sum(b.len for b in buckets) == 1  # only cpu series 2's point
    assert sum(b.value for b in buckets) == 20.0  # never 20 + 999
    # nested under AND both sides agree (the intersection re-scopes):
    res2 = db.sum("cpu", "host").filter("host:a AND !env:prod").collect()
    assert sum(b.value for b in res2["a"]) == 20.0


def test_set_extension_boundaries():
    """r15 audit of the dormant nom parser (src/query/parser/mod.rs —
    the Set syntax's only reference definition): our extension follows
    the LIVE lexer's conventions uniformly (full whitespace class,
    live charsets, no empty members) — see the lexer module docstring
    for the axis-by-axis provenance. Both front-ends must agree."""
    from talna_spark.oracle import oracle_filter_sql

    lookup = lambda k: "NULL"  # noqa: E731

    def both_accept(q):
        P(q)
        oracle_filter_sql(q, lookup)

    def both_reject(q):
        with pytest.raises(InvalidQueryError):
            P(q)
        with pytest.raises(InvalidQueryError):
            oracle_filter_sql(q, lookup)

    # bracket-edge padding: allowed here (the dormant parser allows
    # none); comma padding may use the full live whitespace class
    # (the dormant parser's space0 is space/tab only)
    for q in ("k:[ a ]", "k:[\ta,b\t]", "k:[a ,\rb]", "k:[a,\nb]",
              "k:[a,\fb]", "k:[a1  ,a2  ,           a3]"):
        both_accept(q)
    # empty members: the dormant parser's zero-width take_while parses
    # '[,a]' as Set(["", "a"]) and '[]' as Set([""]) — silent ""-Eq
    # matches; we reject all of them as lex errors
    for q in ("k:[]", "k:[,a]", "k:[a,]", "k:[a,,b]", "k:[ ]"):
        both_reject(q)
    # charsets are the LIVE lexer's: dots valid in members (the dormant
    # parser's identifier has no dots), digits invalid in keys (the
    # dormant parser's key charset admits them)
    both_accept("k:[a.b,c]")
    both_reject("k9:[a,b]")
    # desugar: left-nested binary Ors of Eq, outermost Or pairs the
    # accumulated chain with the LAST member
    from talna_spark.dsl import Eq, Or

    node = P("k:[a,b,c]")
    assert node == Or(Or(Eq("k", "a"), Eq("k", "b")), Eq("k", "c"))


def _drop_one_operator(rng, s):
    """Adjacency mutation (r15, VERDICT r14 item 6): remove one random
    infix AND/OR from a valid expression, leaving its operands adjacent
    (``a:1 b:2``). Release talna's only guard for this shape is
    ``debug_assert_eq!(1, buf.len())`` (filter.rs:290) — a release
    no-op, so it silently returns the LAST subtree; this engine's
    documented deviation is a strict InvalidQueryError, pinned here
    against the whole generated family, not just two fixtures.
    Returns None when the expression has no infix operator to drop."""
    ops = list(re.finditer(r"[ \r\t\n\f](?:AND|OR)[ \r\t\n\f]", s))
    if not ops:
        return None
    m = rng.choice(ops)
    return s[: m.start()] + " " + s[m.end() :]


def test_dropped_operator_always_errors():
    import random

    from talna_spark.oracle import oracle_filter_sql

    lookup = lambda k: k if k in ("a", "b", "host") else "NULL"  # noqa: E731
    rng = random.Random(20260816)
    n_mutated = 0
    while n_mutated < 120:
        s = _gen_expr(rng)
        try:
            P(s)
        except InvalidQueryError:
            continue  # only mutate expressions that start out valid
        mutated = _drop_one_operator(rng, s)
        if mutated is None:
            continue
        n_mutated += 1
        with pytest.raises(InvalidQueryError):
            P(mutated)
        # and the independent oracle front-end rejects identically
        with pytest.raises(InvalidQueryError):
            oracle_filter_sql(mutated, lookup)


def test_oracle_filter_compiler_differential():
    import random

    import duckdb

    from talna_spark.dsl.compiler import compile_to_sql
    from talna_spark.oracle import oracle_filter_sql

    # fixture: every combination of present/absent tags a, b, host
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        "(0, 'x',  'y',  'prod.eu'), (1, 'y',  NULL, 'z1'), "
        "(2, NULL, 'x',  NULL),      (3, '1',  '1',  'a-b'), "
        "(4, 'z1', 'prod.eu', 'x'),  (5, NULL, NULL, NULL), "
        "(6, 'prod.eu', 'z1', '1'),  (7, 'a-b', 'x', 'y')"
        ") v(id, a, b, host)"
    )
    lookup = lambda k: k if k in ("a", "b", "host") else "NULL"  # noqa: E731

    rng = random.Random(20260814)
    cases = [_gen_expr(rng) for _ in range(150)]
    cases += [_mutate(rng, _gen_expr(rng)) for _ in range(150)]
    cases += ["*", " * ", "", "  ", "a:1 b:2", "a:1 AND AND b:2",
              "(a:1", "a:1)", "()", "!*", "* AND a:1", "a:[x]",
              "A-ND:x", "a:AND", "OR:y", "!!a:1", "! !a:1"]
    n_valid = 0
    for s in cases:
        try:
            eng = compile_to_sql(P(s), lookup)
            eng_err = None
        except InvalidQueryError:
            eng_err = True
        try:
            orc = oracle_filter_sql(s, lookup)
            orc_err = None
        except InvalidQueryError:
            orc_err = True
        assert eng_err == orc_err, f"accept/reject drift on {s!r}"
        if eng_err:
            continue
        n_valid += 1
        a = {r[0] for r in con.execute(
            f"SELECT id FROM t WHERE {eng}").fetchall()}
        o = {r[0] for r in con.execute(
            f"SELECT id FROM t WHERE {orc}").fetchall()}
        assert a == o, f"matched-set drift on {s!r}: {a} vs {o}"
    assert n_valid >= 100  # the corpus actually exercises the valid path


def test_oracle_module_imports_no_engine_dsl():
    # structural: oracle.py must not import the engine's DSL front end
    import ast
    import inspect

    import talna_spark.oracle as oracle_mod

    tree = ast.parse(inspect.getsource(oracle_mod))
    for node in ast.walk(tree):
        mods = []
        if isinstance(node, ast.Import):
            mods = [a.name for a in node.names]
        elif isinstance(node, ast.ImportFrom) and node.module:
            mods = [node.module]
        for m in mods:
            assert not m.startswith("talna_spark.dsl"), m
            assert m != "talna_spark.aggregate", m
