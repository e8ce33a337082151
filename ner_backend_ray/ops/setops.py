"""Distinct set operations over datasets: INTERSECT / EXCEPT.

Both reduce to one combiner-then-groupby pass over presence bits: each block
emits its DISTINCT rows tagged with a side flag, the groupby keeps one row
per distinct key with the OR (via max) of each side's flag, and a final
filter applies the set predicate. Only distinct (row, flag) pairs shuffle —
the dedup happens inside the block before anything moves, so a 100-TB side
with a small value domain ships its domain, not its rows.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Max


def _flagged_distinct(ds: ray.data.Dataset, cols: list[str],
                      flag: str) -> ray.data.Dataset:
    other = "in_b" if flag == "in_a" else "in_a"

    def partial(batch: pa.Table) -> pa.Table:
        d = batch.select(cols).group_by(cols).aggregate([])
        n = d.num_rows
        ones = pa.array([1] * n, pa.int8())
        zeros = pa.array([0] * n, pa.int8())
        return (d.append_column("in_a", ones if flag == "in_a" else zeros)
                 .append_column("in_b", ones if flag == "in_b" else zeros))

    return ds.map_batches(partial, batch_format="pyarrow")


def _presence(a: ray.data.Dataset, b: ray.data.Dataset,
              cols: list[str]) -> ray.data.Dataset:
    both = _flagged_distinct(a, cols, "in_a").union(
        _flagged_distinct(b, cols, "in_b"))
    return (both.groupby(cols)
            .aggregate(Max("in_a", alias_name="in_a"),
                       Max("in_b", alias_name="in_b")))


def distinct_intersect(a: ray.data.Dataset, b: ray.data.Dataset,
                       cols: list[str]) -> ray.data.Dataset:
    """SQL INTERSECT: distinct ``cols`` rows present in BOTH datasets."""
    pres = _presence(a, b, cols)
    return pres.map_batches(
        lambda t: t.filter(pc.and_(pc.equal(t["in_a"], 1),
                                   pc.equal(t["in_b"], 1))).select(cols),
        batch_format="pyarrow")


def distinct_except(a: ray.data.Dataset, b: ray.data.Dataset,
                    cols: list[str]) -> ray.data.Dataset:
    """SQL EXCEPT: distinct ``cols`` rows of ``a`` absent from ``b``."""
    pres = _presence(a, b, cols)
    return pres.map_batches(
        lambda t: t.filter(pc.and_(pc.equal(t["in_a"], 1),
                                   pc.equal(t["in_b"], 0))).select(cols),
        batch_format="pyarrow")
