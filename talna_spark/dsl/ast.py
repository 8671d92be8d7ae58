"""Filter AST nodes (reference ``Node`` enum, src/query/filter.rs:13-20).

Reference variants: AllStar, Eq, Wildcard, And, Or, Not. The dormant Set
syntax (src/query/parser/mod.rs:32-45) desugars to Or-of-Eq at parse time,
so it needs no node of its own.
"""

from __future__ import annotations

from dataclasses import dataclass


class Node:
    """Base class for filter AST nodes."""

    __slots__ = ()


@dataclass(frozen=True)
class AllStar(Node):
    """``*`` — all series of the metric (src/query/filter.rs:101,155-157)."""


@dataclass(frozen=True)
class Eq(Node):
    """``key:value`` tag equality (src/query/filter.rs:14)."""

    key: str
    value: str


@dataclass(frozen=True)
class Wildcard(Node):
    """``key:prefix*`` prefix match; empty prefix = key-exists
    (src/query/lexer.rs:21, proven by test src/db.rs:1124-1132)."""

    key: str
    prefix: str


@dataclass(frozen=True)
class And(Node):
    left: Node
    right: Node


@dataclass(frozen=True)
class Or(Node):
    left: Node
    right: Node


@dataclass(frozen=True)
class Not(Node):
    child: Node
