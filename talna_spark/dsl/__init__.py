"""Tag-filter DSL: lexer, shunting-yard parser, and compilers.

Grammar (normative, SURVEY.md §2.4; reference src/query/lexer.rs:3-26 and
src/query/filter.rs:154-293):

    expr     := term (("AND" | "OR") term)*        # precedence NOT > AND > OR
    term     := "!" term | "(" expr ")" | leaf
    leaf     := KEY ":" VALUE                      # Eq
              | KEY ":" PREFIX "*"                 # Wildcard (suffix only)
              | KEY ":" "[" VALUE ("," VALUE)* "]" # Set -> OR of Eq
              | "*"                                # AllStar
    KEY      := [a-zA-Z_-]+
    VALUE    := [a-zA-Z0-9_.\\-]+   (PREFIX may be empty -> key-exists)
"""

from talna_spark.dsl.ast import AllStar, And, Eq, Node, Not, Or, Wildcard
from talna_spark.dsl.compiler import compile_to_column, compile_to_sql
from talna_spark.dsl.parser import parse_filter_query

__all__ = [
    "Node",
    "AllStar",
    "Eq",
    "Wildcard",
    "And",
    "Or",
    "Not",
    "parse_filter_query",
    "compile_to_column",
    "compile_to_sql",
]
