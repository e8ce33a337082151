"""Distributed join strategies (SURVEY.md §2.4).

The reference has no dataflow joins (its joins are SQL-side); at Ray scale we need:

- **broadcast_join**: small side shipped once (ray.put / closure) and merged per
  batch — no shuffle. The default whenever one side fits in a worker heap.
- **bucket_hash_join**: both sides large — add ``bucket = hash(key) % B`` to both,
  groupby bucket, pairwise pandas merge inside each group. An explicit
  partitioned hash join; B and the within-bucket salt bound skew.
- ``Dataset.join`` (hash shuffle) exists in recent Ray; we keep these explicit
  implementations so the partitioning assumptions are visible and testable.
"""

from __future__ import annotations

import zlib

import pandas as pd
import pyarrow as pa

import ray
import ray.data


def broadcast_join(left: ray.data.Dataset, right_table: pa.Table, key: str,
                   how: str = "inner") -> ray.data.Dataset:
    """left ⋈ right_table on ``key``; right must be driver-small. The table is put
    in the object store once and read per actor/task, not re-shipped per batch."""
    right_ref = ray.put(right_table)

    def merge(batch: pa.Table) -> pa.Table:
        right = ray.get(right_ref)
        lpdf = batch.to_pandas()
        rpdf = right.to_pandas()
        out = lpdf.merge(rpdf, on=key, how=how)
        return pa.Table.from_pandas(out, preserve_index=False)

    return left.map_batches(merge, batch_format="pyarrow")


def bucket_hash_join(left: ray.data.Dataset, right: ray.data.Dataset, key: str,
                     n_buckets: int = 32, how: str = "inner") -> ray.data.Dataset:
    """Partitioned hash join: tag each side, union, groupby bucket, merge within
    the group. Key assumption: each bucket's rows fit in one worker (size B to the
    data; salt hot keys upstream if a single key exceeds a bucket)."""

    lschema = left.schema()
    rschema = right.schema()
    lcols = list(lschema.names)
    rcols = list(rschema.names)
    shared = (set(lcols) & set(rcols)) - {key}
    if shared:
        raise ValueError(f"non-key column collision: {shared}")

    # union requires one schema: align both sides, padding the other side's
    # columns with typed nulls
    all_fields = ([(n, lschema.types[lschema.names.index(n)]) for n in lcols]
                  + [(n, rschema.types[rschema.names.index(n)]) for n in rcols
                     if n != key])

    def tag(side: str):
        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {}
            for name, typ in all_fields:
                if name in batch.column_names:
                    cols[name] = batch[name]
                else:
                    cols[name] = pa.nulls(n, typ)
            out = pa.table(cols)
            buckets = [zlib.crc32(str(v).encode()) % n_buckets
                       for v in batch[key].to_pylist()]
            return (out
                    .append_column("__bucket", pa.array(buckets, pa.int32()))
                    .append_column("__side", pa.array([side] * n)))
        return f

    combined = left.map_batches(tag("l"), batch_format="pyarrow").union(
        right.map_batches(tag("r"), batch_format="pyarrow"))

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        lpdf = g[g["__side"] == "l"][[c for c in lcols]]
        rpdf = g[g["__side"] == "r"][[c for c in rcols]]
        out = lpdf.merge(rpdf, on=key, how=how)
        return out

    return combined.groupby("__bucket").map_groups(merge_group, batch_format="pandas")
