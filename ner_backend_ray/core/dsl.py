"""Boolean group-query DSL over per-document entity sets.

Reference semantics: internal/core/query_parser.go:11-22 (grammar) and
internal/core/filters.go (the Matches tree). Grammar (note the reference's
nonterminal names are swapped; Expr's children are OR'd, their children AND'd,
query_parser.go:71-179):

    Expr      := Or ("OR" Or)*
    Or        := Cond ("AND" Cond)*
    Cond      := ["NOT"] (Filter | "(" Expr ")")
    Filter    := "COUNT" "(" ident ")" ("<"|">"|"=") int
               | ident ("CONTAINS"|"<"|">"|"=") string

COUNT bounds are exclusive:  "<" → (min=-1, max=v);  ">" → (min=v, max=+inf);
"=" → (min=v-1, max=v+1)   (query_parser.go:281-292, filters.go:48-57).

Two back-ends, mirroring the reference: an in-memory ``Filter.matches`` over a
``{label: [Entity]}`` map, and ``to_sql`` emitting an ANSI boolean predicate usable
against a mentions table (the analog of query_parser.go:294-346's gorm build).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

from .entity import Entity

LabelToEntities = dict[str, list[Entity]]


class QueryError(ValueError):
    pass


# ----------------------------- filter tree (filters.go) -----------------------------

class Filter:
    def matches(self, entities: LabelToEntities) -> bool:  # pragma: no cover
        raise NotImplementedError

    def to_sql(self, table: str = "object_entities", doc_col: str = "object") -> str:
        raise NotImplementedError


@dataclass
class AndFilter(Filter):
    filters: list[Filter]

    def matches(self, entities):
        return all(f.matches(entities) for f in self.filters)

    def to_sql(self, table="object_entities", doc_col="object"):
        return "(" + " AND ".join(f.to_sql(table, doc_col) for f in self.filters) + ")"


@dataclass
class OrFilter(Filter):
    filters: list[Filter]

    def matches(self, entities):
        return any(f.matches(entities) for f in self.filters)

    def to_sql(self, table="object_entities", doc_col="object"):
        return "(" + " OR ".join(f.to_sql(table, doc_col) for f in self.filters) + ")"


@dataclass
class NotFilter(Filter):
    filter: Filter

    def matches(self, entities):
        return not self.filter.matches(entities)

    def to_sql(self, table="object_entities", doc_col="object"):
        return "(NOT " + self.filter.to_sql(table, doc_col) + ")"


@dataclass
class CountFilter(Filter):
    label: str
    min: float
    max: float

    def matches(self, entities):
        count = len(entities.get(self.label, ()))
        return self.min < count < self.max

    def to_sql(self, table="object_entities", doc_col="object"):
        # correlated COUNT subquery, analog of query_parser.go:294-307
        sub = (f"(SELECT COUNT(*) FROM {table} o WHERE o.{doc_col} = t.{doc_col} "
               f"AND o.label = {_sql_str(self.label)})")
        parts = []
        if self.min > -1:
            parts.append(f"{sub} > {int(self.min)}")
        if not math.isinf(self.max):
            parts.append(f"{sub} < {int(self.max)}")
        return "(" + " AND ".join(parts) + ")" if parts else "TRUE"


def _sql_str(v: str) -> str:
    return "'" + v.replace("'", "''") + "'"


def _exists(table: str, doc_col: str, label: str, pred: str) -> str:
    return (f"(EXISTS (SELECT 1 FROM {table} o WHERE o.{doc_col} = t.{doc_col} "
            f"AND o.label = {_sql_str(label)} AND {pred}))")


@dataclass
class SubstringFilter(Filter):
    label: str
    substr: str

    def matches(self, entities):
        needle = self.substr.encode("utf-8")
        return any(needle in e.text for e in entities.get(self.label, ()))

    def to_sql(self, table="object_entities", doc_col="object"):
        pat = self.substr.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
        return _exists(table, doc_col, self.label,
                       f"o.text LIKE {_sql_str('%' + pat + '%')} ESCAPE '\\'")


@dataclass
class StringEqFilter(Filter):
    label: str
    value: str

    def matches(self, entities):
        v = self.value.encode("utf-8")
        return any(e.text == v for e in entities.get(self.label, ()))

    def to_sql(self, table="object_entities", doc_col="object"):
        return _exists(table, doc_col, self.label, f"o.text = {_sql_str(self.value)}")


@dataclass
class StringLtFilter(Filter):
    label: str
    value: str

    def matches(self, entities):
        v = self.value.encode("utf-8")
        return any(e.text < v for e in entities.get(self.label, ()))

    def to_sql(self, table="object_entities", doc_col="object"):
        return _exists(table, doc_col, self.label, f"o.text < {_sql_str(self.value)}")


@dataclass
class StringGtFilter(Filter):
    label: str
    value: str

    def matches(self, entities):
        v = self.value.encode("utf-8")
        return any(e.text > v for e in entities.get(self.label, ()))

    def to_sql(self, table="object_entities", doc_col="object"):
        return _exists(table, doc_col, self.label, f"o.text > {_sql_str(self.value)}")


# ----------------------------- parser (recursive descent) ---------------------------

_TOKEN_RE = re.compile(r"""
    \s*(?:
        (?P<string>"(?:\\.|[^"\\])*")
      | (?P<int>\d+)
      | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
      | (?P<sym>[()<>=])
    )""", re.VERBOSE)

_KEYWORDS = {"AND", "OR", "NOT", "COUNT", "CONTAINS"}


def _tokenize(query: str) -> list[tuple[str, str]]:
    tokens: list[tuple[str, str]] = []
    pos = 0
    while pos < len(query):
        m = _TOKEN_RE.match(query, pos)
        if m is None:
            rest = query[pos:].strip()
            if not rest:
                break
            raise QueryError(f"unexpected character at {pos}: {rest[:10]!r}")
        pos = m.end()
        for kind in ("string", "int", "ident", "sym"):
            val = m.group(kind)
            if val is not None:
                if kind == "ident" and val in _KEYWORDS:
                    tokens.append(("kw", val))
                else:
                    tokens.append((kind, val))
                break
    return tokens


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.tokens = tokens
        self.i = 0

    def peek(self):
        return self.tokens[self.i] if self.i < len(self.tokens) else (None, None)

    def next(self):
        tok = self.peek()
        self.i += 1
        return tok

    def expect(self, kind: str, value: str | None = None) -> str:
        k, v = self.next()
        if k != kind or (value is not None and v != value):
            raise QueryError(f"expected {value or kind}, got {v!r}")
        return v

    # Expr := Or ("OR" Or)*
    def parse_expr(self) -> Filter:
        parts = [self.parse_or()]
        while self.peek() == ("kw", "OR"):
            self.next()
            parts.append(self.parse_or())
        return parts[0] if len(parts) == 1 else OrFilter(parts)

    # Or := Cond ("AND" Cond)*
    def parse_or(self) -> Filter:
        parts = [self.parse_cond()]
        while self.peek() == ("kw", "AND"):
            self.next()
            parts.append(self.parse_cond())
        return parts[0] if len(parts) == 1 else AndFilter(parts)

    # Cond := ["NOT"] (Filter | "(" Expr ")")
    def parse_cond(self) -> Filter:
        negate = False
        if self.peek() == ("kw", "NOT"):
            self.next()
            negate = True
        if self.peek() == ("sym", "("):
            self.next()
            f = self.parse_expr()
            self.expect("sym", ")")
        else:
            f = self.parse_filter()
        return NotFilter(f) if negate else f

    def parse_filter(self) -> Filter:
        kind, val = self.next()
        if kind == "kw" and val == "COUNT":
            self.expect("sym", "(")
            label = self.expect("ident")
            self.expect("sym", ")")
            op = self.expect("sym")
            if op not in "<>=":
                raise QueryError(f"invalid COUNT operator {op!r}")
            k, v = self.next()
            if k != "int":
                raise QueryError(f"COUNT comparison needs an integer, got {v!r}")
            value = int(v)
            # query_parser.go:281-292 — exclusive bounds
            if op == "<":
                return CountFilter(label, -1, value)
            if op == ">":
                return CountFilter(label, value, math.inf)
            return CountFilter(label, value - 1, value + 1)
        if kind != "ident":
            raise QueryError(f"expected identifier, got {val!r}")
        label = val
        k, op = self.next()
        if (k, op) == ("kw", "CONTAINS"):
            str_op = "CONTAINS"
        elif k == "sym" and op in "<>=":
            str_op = op
        else:
            raise QueryError(f"invalid operator {op!r}")
        k, v = self.next()
        if k != "string":
            raise QueryError(f"string comparison needs a quoted string, got {v!r}")
        value = _unquote(v)
        if str_op == "CONTAINS":
            return SubstringFilter(label, value)
        if str_op == "<":
            return StringLtFilter(label, value)
        if str_op == ">":
            return StringGtFilter(label, value)
        return StringEqFilter(label, value)


def _unquote(s: str) -> str:
    body = s[1:-1]
    return re.sub(r"\\(.)", lambda m: {"n": "\n", "t": "\t", "r": "\r"}.get(m.group(1), m.group(1)), body)


def parse_query(query: str) -> Filter:
    """Parse a group query into a Filter tree (analog of ParseQuery,
    query_parser.go:31-43)."""
    tokens = _tokenize(query)
    if not tokens:
        raise QueryError("empty query")
    p = _Parser(tokens)
    f = p.parse_expr()
    if p.i != len(tokens):
        raise QueryError(f"trailing tokens starting at {p.peek()[1]!r}")
    return f
