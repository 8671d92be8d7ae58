"""Shunting-yard parser: token stream -> RPN -> AST
(reference src/query/filter.rs:154-293, operator O22).

Precedence NOT > AND > OR (reference src/query/filter.rs:189, 204);
NOT is a right-associative unary prefix; parentheses must balance;
any malformation raises :class:`InvalidQueryError`.

The whole-string ``"*"`` AllStar fast path mirrors the special case at
src/query/filter.rs:155-157 (operator O16): ``*`` is only valid as the
entire expression, never as an operand inside one.

DOCUMENTED DEVIATIONS (r14 faithfulness audit of filter.rs:154-293):

- Leftover operands ERROR here; the reference's only guard is
  ``debug_assert_eq!(1, buf.len())`` (filter.rs:290) — a no-op in
  release builds, so real talna silently returns the LAST parsed
  subtree for shapes like ``a:b c:d`` (missing operator) or
  ``a:b (c:d OR e:f)``, discarding the rest of the query (and panics
  on them in debug builds). A strict InvalidQueryError is the sane
  semantics; pinned in tests/test_dsl.py.
- OR chains associate LEFT here (classic shunting-yard,
  ``a OR b OR c`` -> Or(Or(a,b),c)); the reference's Or handler pops
  only And/Not — never a prior Or (filter.rs:198-211) — so OR chains
  right-associate there. AND chains are NOT a deviation: the
  reference's And handler DOES pop ``Item::And`` (filter.rs:183-196),
  so AND chains associate left on both sides. OR set algebra is
  associative, so the evaluated series sets are identical — AST shape
  only (r15 narrowing per ADVICE).
"""

from __future__ import annotations

from talna_spark.dsl.ast import AllStar, And, Eq, Node, Not, Or, Wildcard
from talna_spark.dsl.lexer import Token, tokenize
from talna_spark.errors import InvalidQueryError

_PRECEDENCE = {"NOT": 3, "AND": 2, "OR": 1}


def _leaf(tok: Token) -> Node:
    if tok.kind == "EQ":
        return Eq(tok.key, tok.value)
    if tok.kind == "WILDCARD":
        return Wildcard(tok.key, tok.value)
    if tok.kind == "SET":
        # Set syntax desugars to OR-of-Eq (reference src/query/parser/mod.rs:32-45)
        node: Node = Eq(tok.key, tok.values[0])
        for v in tok.values[1:]:
            node = Or(node, Eq(tok.key, v))
        return node
    raise AssertionError(tok)


def parse_filter_query(text: str) -> Node:
    """Parse the filter DSL into an AST; raise InvalidQueryError if malformed."""
    if text.strip() == "*":
        return AllStar()

    tokens = tokenize(text)
    if not tokens:
        raise InvalidQueryError("invalid filter query: empty expression")

    # --- shunting-yard: infix -> RPN ---------------------------------------
    output: list[Token] = []
    ops: list[Token] = []
    prev: Token | None = None
    for tok in tokens:
        if tok.kind in ("EQ", "WILDCARD", "SET"):
            if prev is not None and prev.kind in ("EQ", "WILDCARD", "SET", "RPAREN"):
                raise InvalidQueryError("invalid filter query: adjacent operands")
            output.append(tok)
        elif tok.kind == "STAR":
            raise InvalidQueryError(
                "invalid filter query: '*' is only valid as the whole expression"
            )
        elif tok.kind == "NOT":
            ops.append(tok)
        elif tok.kind in ("AND", "OR"):
            if prev is None or prev.kind in ("AND", "OR", "NOT", "LPAREN"):
                raise InvalidQueryError("invalid filter query: dangling operator")
            my_prec = _PRECEDENCE[tok.kind]
            while (
                ops
                and ops[-1].kind in _PRECEDENCE
                and _PRECEDENCE[ops[-1].kind] >= my_prec
            ):
                output.append(ops.pop())
            ops.append(tok)
        elif tok.kind == "LPAREN":
            ops.append(tok)
        elif tok.kind == "RPAREN":
            while ops and ops[-1].kind != "LPAREN":
                output.append(ops.pop())
            if not ops:
                raise InvalidQueryError("invalid filter query: unbalanced ')'")
            ops.pop()  # discard LPAREN
        prev = tok
    while ops:
        top = ops.pop()
        if top.kind == "LPAREN":
            raise InvalidQueryError("invalid filter query: unbalanced '('")
        output.append(top)

    # --- RPN -> AST ---------------------------------------------------------
    stack: list[Node] = []
    for tok in output:
        if tok.kind in ("EQ", "WILDCARD", "SET"):
            stack.append(_leaf(tok))
        elif tok.kind == "NOT":
            if not stack:
                raise InvalidQueryError("invalid filter query: '!' missing operand")
            stack.append(Not(stack.pop()))
        elif tok.kind in ("AND", "OR"):
            if len(stack) < 2:
                raise InvalidQueryError(
                    f"invalid filter query: '{tok.kind}' missing operand"
                )
            right, left = stack.pop(), stack.pop()
            stack.append(And(left, right) if tok.kind == "AND" else Or(left, right))
    if len(stack) != 1:
        raise InvalidQueryError("invalid filter query: malformed expression")
    return stack[0]
