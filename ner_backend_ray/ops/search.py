"""Ad-hoc group-query search over a mentions table (SURVEY.md §2.9 backend b).

The reference exposes post-hoc search over the persisted entity table by
compiling the group-query DSL to SQL with a correlated COUNT subquery
(internal/core/query_parser.go:294-346; handler internal/api/api.go:706-748).
Equivalents here:

- ``search_mentions`` — Ray-native: ``groupby(doc).map_groups`` evaluating the
  same ``Filter.matches`` tree the inference path uses (semi-join by
  construction, no data leaves the group).
- ``search_mentions_sql`` — DuckDB over the mentions Parquet using
  ``Filter.to_sql`` (the reference's gorm-built SQL, verbatim semantics).

Both backends must agree; tests/test_dsl.py cross-validates them on the fixture.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..core.dsl import Filter, parse_query
from ..core.entity import Entity


def _label_map(group: pa.Table) -> dict[str, list[Entity]]:
    out: dict[str, list[Entity]] = {}
    for label, text, start, end in zip(group["label"].to_pylist(),
                                       group["text"].to_pylist(),
                                       group["start"].to_pylist(),
                                       group["end"].to_pylist()):
        out.setdefault(label, []).append(Entity(
            label=label, text=text.encode("utf-8"), start=start, end=end,
            lcontext=b"", rcontext=b""))
    return out


def search_mentions(mentions: ray.data.Dataset, query: str | Filter,
                    doc_col: str = "url") -> ray.data.Dataset:
    """Docs whose entity set satisfies the query → (doc_col) rows."""
    filt = parse_query(query) if isinstance(query, str) else query

    def eval_group(group: pa.Table) -> pa.Table:
        doc = group[doc_col][0].as_py()
        if filt.matches(_label_map(group)):
            return pa.table({doc_col: pa.array([doc], pa.string())})
        return pa.table({doc_col: pa.array([], pa.string())})

    return mentions.groupby(doc_col).map_groups(eval_group, batch_format="pyarrow")


def search_mentions_sql(parquet_path: str, query: str | Filter,
                        doc_col: str = "url") -> list[str]:
    """DuckDB backend over mentions Parquet via the DSL's SQL compilation."""
    import duckdb
    filt = parse_query(query) if isinstance(query, str) else query
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW m AS SELECT * FROM parquet_scan('{parquet_path}/*.parquet')")
    sql = (f"SELECT DISTINCT t.{doc_col} FROM m t WHERE "
           + filt.to_sql("m", doc_col) + f" ORDER BY t.{doc_col}")
    return [r[0] for r in con.execute(sql).fetchall()]
