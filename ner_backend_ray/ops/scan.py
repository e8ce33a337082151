"""Global ordered prefix scan (distributed cumulative sum).

``partitioned_running`` (ops/window.py) covers PARTITION BY windows, where a
groupby co-locates each key's rows. The global frame —
``SUM(v) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)`` with no partition key —
can't be a groupby: every row's result depends on every earlier row across
the whole dataset. The classic two-pass scan fixes that without ever
materializing the data on the driver:

1. range-partition by the order key (``Dataset.sort`` — the one unavoidable
   all-to-all; skipped when the caller says the input is already sorted),
   then freeze the block layout (``materialize``);
2. pass 1: one summary row PER BLOCK (first key, block total) — #blocks rows
   reach the driver, never data rows;
3. driver: exclusive prefix-sum over the block summaries in key order — an
   O(#blocks) loop on ~KB of data;
4. pass 2: re-map the SAME materialized blocks, adding each block's driver
   offset to its local vectorized cumsum.

Scale shape: two narrow passes over the data plus one sort; driver state is
one row per block (a 100-TB input at 128 MB blocks is ~800k summary rows —
MBs). Block-order stability between the passes is guaranteed by scanning the
same materialized dataset with ``batch_size=None`` (one batch == one block,
zero-copy).

The order key must be UNIQUE (e.g. a primary key): after a range sort,
duplicate keys may straddle a block boundary, and "first key" would no
longer identify the block's rank among blocks. Uniqueness is asserted per
block boundary via min/max disjointness on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def global_running_sum(ds: ray.data.Dataset, order_col: str, value_col: str,
                       out_col: str = "running",
                       presorted: bool = False) -> ray.data.Dataset:
    """Append ``out_col`` = inclusive cumulative sum of ``value_col`` in
    global ``order_col`` order (int64). ``order_col`` values must be unique.
    Rows come back range-partitioned (globally sorted) by ``order_col``."""
    in_schema = ds.schema()
    s = (ds if presorted else ds.sort(order_col)).materialize()
    if s.count() == 0:
        # a sorted-empty Dataset drops its schema; rebuild the typed result
        base = getattr(in_schema, "base_schema", None) or in_schema
        empty = base.empty_table().append_column(
            out_col, pa.array([], pa.int64()))
        return ray.data.from_arrow(empty)

    def summary(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table({"first": pa.array([], pa.int64()),
                             "last": pa.array([], pa.int64()),
                             "total": pa.array([], pa.int64())})
        k = block[order_col].cast(pa.int64())
        v = block[value_col].cast(pa.int64())
        return pa.table({
            "first": pa.array([pc.min(k).as_py()], pa.int64()),
            "last": pa.array([pc.max(k).as_py()], pa.int64()),
            "total": pa.array([int(pc.sum(v).as_py() or 0)], pa.int64())})

    # batch_size=None → exactly one batch per materialized block, so pass 1
    # and pass 2 see identical boundaries.
    rows = s.map_batches(summary, batch_format="pyarrow",
                         batch_size=None, zero_copy_batch=True).take_all()
    rows.sort(key=lambda r: r["first"])
    offsets: dict[int, int] = {}
    acc = 0
    prev_last = None
    for r in rows:
        if prev_last is not None and r["first"] <= prev_last:
            raise ValueError(
                f"global_running_sum: order key '{order_col}' ranges overlap "
                f"across blocks ({r['first']} <= {prev_last}); the key must "
                "be unique")
        offsets[r["first"]] = acc
        acc += r["total"]
        prev_last = r["last"]
    offsets_ref = ray.put(offsets)

    def apply(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return block.append_column(out_col, pa.array([], pa.int64()))
        off = ray.get(offsets_ref)
        k = block[order_col].cast(pa.int64())
        base = off[pc.min(k).as_py()]
        v = block[value_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        run = np.cumsum(v, dtype=np.int64) + base
        return block.append_column(out_col, pa.array(run))

    return s.map_batches(apply, batch_format="pyarrow",
                         batch_size=None, zero_copy_batch=True)
