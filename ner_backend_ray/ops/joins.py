"""Distributed join strategies (SURVEY.md §2.4).

The reference has no dataflow joins (its joins are SQL-side); at Ray scale we need:

- **broadcast_join**: small side shipped once (ray.put / closure) and merged per
  batch — no shuffle. The default whenever one side fits in a worker heap.
- **bucket_hash_join**: both sides large — add ``bucket = hash(key) % B`` to both,
  groupby bucket, Arrow-native ``pa.Table.join`` inside each group. An explicit
  partitioned hash join; B and the within-bucket salt bound skew. Dtypes are
  preserved end-to-end (no pandas round-trip — null-padded int columns would be
  promoted to float64, see round-1 verdict on join_lineitem_part).
- ``Dataset.join`` (hash shuffle) exists in recent Ray; we keep these explicit
  implementations so the partitioning assumptions are visible and testable.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

# On-disk parquet bytes under which a dimension table is broadcast (ray.put
# once, read per task); above it the planner routes through bucket_hash_join.
# Parquet compresses ~3-5× vs heap, so 64 MiB on disk is a few hundred MB in
# every actor heap — about the ceiling a per-worker lookup side should take.
# TPC-H dimension tables GROW with sf: at sf100 customer.parquet is multi-GB
# and an unconditional broadcast is a driver-memory wall (round-3 verdict).
_BROADCAST_BUDGET_BYTES = 64 << 20


def broadcast_budget() -> int:
    """Byte budget for the broadcast side; GRAFT_BROADCAST_BUDGET_BYTES
    overrides (tests force 0 to exercise the large-dim join path)."""
    return int(os.environ.get("GRAFT_BROADCAST_BUDGET_BYTES",
                              _BROADCAST_BUDGET_BYTES))


def parquet_bytes(path: str) -> int:
    """On-disk bytes of a parquet file or directory — the size signal the
    planner gates on (metadata-only; nothing is read)."""
    if os.path.isdir(path):
        return sum(os.path.getsize(os.path.join(root, f))
                   for root, _, files in os.walk(path) for f in files)
    return os.path.getsize(path)


def buckets_for(n_bytes: int, target_bucket_bytes: int = 256 << 20) -> int:
    """bucket_hash_join bucket count sized to the DATA: at least one bucket
    per cluster core (so the per-bucket reduce can use the whole cluster) and
    at least one per ~target_bucket_bytes of expanded input (parquet ~4×
    decompressed), so one bucket's rows always fit a worker. Replaces the
    fixed n_buckets=32 that capped reduce parallelism at 100× scale."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 16))
    except Exception:
        cpus = 16
    return max(16, cpus, -(-(n_bytes * 4) // target_bucket_bytes))


def gated_dim_join(left: ray.data.Dataset, dim_path: str, key: str,
                   columns: list[str], rename: list[str] | None = None,
                   how: str = "inner", left_bytes: int = 0) -> ray.data.Dataset:
    """The size-gated small-side join strategy (the planner rule the round-3
    verdict asked for): broadcast the dimension parquet when it is under
    :func:`broadcast_budget` on disk, else read it as a Dataset and run the
    partitioned :func:`bucket_hash_join`. ``rename`` maps the dim columns onto
    the left's key/name space; ``left_bytes`` (optional) lets the caller pass
    the fact side's on-disk size so the bucket count tracks the bigger side."""
    n_bytes = parquet_bytes(dim_path)
    if n_bytes <= broadcast_budget():
        t = pq.read_table(dim_path, columns=columns)
        if rename:
            t = t.rename_columns(rename)
        return broadcast_join(left, t, key, how=how)
    dim = ray.data.read_parquet(dim_path, columns=columns)
    if rename:
        ren = list(rename)
        dim = dim.map_batches(lambda b: b.rename_columns(ren),
                              batch_format="pyarrow")
    return bucket_hash_join(left, dim, key,
                            n_buckets=buckets_for(max(n_bytes, left_bytes)),
                            how=how)


def _bucket_of(col: pa.ChunkedArray | pa.Array, n_buckets: int) -> pa.Array:
    """Vectorized deterministic bucket assignment for a key column.

    Uses pandas' SipHash-based ``hash_array`` (fixed default key, so both join
    sides — and every worker process — agree) over the column's numpy view; no
    per-row Python hashing.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vals = col.to_numpy(zero_copy_only=False)
    h = pd.util.hash_array(vals, categorize=False)
    return pa.array((h % n_buckets).astype("int32"))


def broadcast_join(left: ray.data.Dataset, right_table: pa.Table, key: str,
                   how: str = "inner") -> ray.data.Dataset:
    """left ⋈ right_table on ``key``; right must be driver-small. The table is put
    in the object store once and read per actor/task, not re-shipped per batch.

    The per-batch merge is ``pa.Table.join`` (Acero hash join) — zero pandas
    round-trips, so input Arrow dtypes survive exactly (pandas merge promotes
    null-padded int columns to float64)."""
    right_ref = ray.put(right_table)
    join_type = {"inner": "inner", "left": "left outer",
                 "right": "right outer", "outer": "full outer"}[how]
    rcols = [c for c in right_table.column_names if c != key]

    def merge(batch: pa.Table) -> pa.Table:
        right = ray.get(right_ref)
        out = batch.join(right, keys=key, join_type=join_type)
        # Acero may reorder columns; pin the left-then-right layout.
        return out.select(list(batch.column_names) + rcols)

    return left.map_batches(merge, batch_format="pyarrow")


def bucket_hash_join(left: ray.data.Dataset, right: ray.data.Dataset, key: str,
                     n_buckets: int = 32, how: str = "inner") -> ray.data.Dataset:
    """Partitioned hash join: tag each side, union, groupby bucket, Arrow join
    within the group. Key assumption: each bucket's rows fit in one worker (size
    B to the data; salt hot keys upstream if a single key exceeds a bucket).

    Dtype contract: output columns carry the exact input Arrow types. The merge
    is ``pa.Table.join`` (Acero hash join) — never pandas, whose null handling
    promotes int columns to float64."""

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
                    cols[name] = batch[name].cast(typ)
                else:
                    cols[name] = pa.nulls(n, typ)
            out = pa.table(cols)
            return (out
                    .append_column("__bucket", _bucket_of(batch[key], n_buckets))
                    .append_column("__side", pa.array([side] * n)))
        return f

    combined = left.map_batches(tag("l"), batch_format="pyarrow").union(
        right.map_batches(tag("r"), batch_format="pyarrow"))

    join_type = {"inner": "inner", "left": "left outer",
                 "right": "right outer", "outer": "full outer"}[how]

    def merge_group(g: pa.Table) -> pa.Table:
        side = g["__side"]
        lpt = g.filter(pa.compute.equal(side, "l")).select(lcols)
        rpt = g.filter(pa.compute.equal(side, "r")).select(rcols)
        out = lpt.join(rpt, keys=key, join_type=join_type)
        # Acero may reorder columns; pin the l-then-r layout callers expect.
        return out.select(lcols + [c for c in rcols if c != key])

    return combined.groupby("__bucket").map_groups(merge_group,
                                                   batch_format="pyarrow")
