"""DSL parse/eval round-trips incl. invalid queries (query_parser_test.go:9-123)."""

import math

import pytest

from ner_backend_ray.core.dsl import (AndFilter, CountFilter, NotFilter, OrFilter,
                                      QueryError, StringEqFilter, SubstringFilter,
                                      parse_query)
from ner_backend_ray.core.entity import Entity


def test_simple_filter():
    assert parse_query('label1 CONTAINS "value"') == SubstringFilter("label1", "value")


def test_and_expression():
    assert parse_query('label1 CONTAINS "value1" AND label2 = "value2"') == AndFilter([
        SubstringFilter("label1", "value1"), StringEqFilter("label2", "value2")])


def test_or_expression():
    assert parse_query('label1 CONTAINS "value1" OR label2 = "value2"') == OrFilter([
        SubstringFilter("label1", "value1"), StringEqFilter("label2", "value2")])


def test_not_expression():
    assert parse_query('NOT label1 CONTAINS "value"') == NotFilter(
        SubstringFilter("label1", "value"))


def test_complex_expression():
    got = parse_query('label1 CONTAINS "value1" AND (label2 = "value2" OR NOT COUNT(label3) > 4)')
    assert got == AndFilter([
        SubstringFilter("label1", "value1"),
        OrFilter([
            StringEqFilter("label2", "value2"),
            NotFilter(CountFilter("label3", 4, math.inf)),
        ]),
    ])


def test_count_filter_bounds():
    assert parse_query('COUNT(label1) < 10') == CountFilter("label1", -1, 10)
    assert parse_query('COUNT(x) = 3') == CountFilter("x", 2, 4)


def test_invalid_query():
    with pytest.raises(QueryError):
        parse_query('label1 CONTAINS')
    with pytest.raises(QueryError):
        parse_query('')
    with pytest.raises(QueryError):
        parse_query('COUNT(x) CONTAINS "y"')


def _ents(label, *texts):
    return [Entity(label=label, text=t.encode(), start=i, end=i + 1)
            for i, t in enumerate(texts)]


def test_matches_semantics():
    entities = {"phone": _ents("phone", "012-345-6789"),
                "email": _ents("email", "test@email.com")}
    assert parse_query('COUNT(phone) > 0 AND email CONTAINS "test"').matches(entities)
    assert not parse_query('COUNT(phone) > 1 AND email CONTAINS "test"').matches(entities)
    assert parse_query('COUNT(phone) = 1').matches(entities)
    assert not parse_query('COUNT(phone) < 1').matches(entities)
    assert parse_query('email > "a"').matches(entities)
    assert not parse_query('email < "a"').matches(entities)
    assert parse_query('NOT COUNT(missing) > 0').matches(entities)


def test_to_sql_runs_in_duckdb():
    import duckdb
    f = parse_query('COUNT(phone) > 0 AND email CONTAINS "test"')
    con = duckdb.connect()
    con.execute("""CREATE TABLE object_entities AS SELECT * FROM (VALUES
        ('doc1', 'phone', '012-345-6789'), ('doc1', 'email', 'test@email.com'),
        ('doc2', 'email', 'test@email.com')) t(object, label, text)""")
    sql = ("SELECT DISTINCT t.object FROM object_entities t WHERE "
           + f.to_sql("object_entities", "object") + " ORDER BY 1")
    assert [r[0] for r in con.execute(sql).fetchall()] == ["doc1"]
