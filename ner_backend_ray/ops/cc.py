"""Connected components over a pair/edge Dataset — the scale path for near-dup
cluster resolution.

Round-1 verdict: collecting all verified near-dup pairs to the driver and
running an in-process union-find makes the driver the memory bottleneck on
template-heavy corpora (pair lists are unbounded at 100 TB). The fix here:

- :func:`union_find` — the driver fast path, unchanged semantics.
- :func:`connected_components` — distributed large-star / small-star label
  propagation (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14 — public algorithm), expressed purely as ``groupby().map_groups``
  rounds over (hi, lo) edge rows. Converges in O(log² n) rounds; each round
  touches only the edge set, never document payloads. At convergence the edge
  set is a star forest: every row is (member, cluster_min).
- :func:`resolve_roots_budgeted` — the seam both dedup and KG canonicalization
  use: count the pair set first; under ``budget`` collect + union-find (cheap,
  exact), over it run distributed CC and collect only the final star edges
  (one row per clustered node — the same size as the root map the caller is
  about to broadcast anyway). The fallback event is recorded in the metrics
  actor so it is observable in lineage.

Partitioning assumption: one node's neighbor list fits in a worker (group =
one node per round). A cluster of size C produces a C-member star at the end —
fine, since the caller's broadcast map holds C entries regardless.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..state.metrics import incr_metric


def union_find(edges: list[tuple]) -> dict:
    """In-process min-label union-find: edge list → {node → cluster_min} for
    every node that appears in an edge (singletons absent)."""
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {k: find(k) for k in parent}


def _normalize(batch: pa.Table, a_col: str, b_col: str) -> pa.Table:
    """(a, b) rows → (hi, lo) with hi > lo; self-loops dropped."""
    a = batch[a_col].to_pylist()
    b = batch[b_col].to_pylist()
    hi, lo = [], []
    for x, y in zip(a, b):
        if x == y:
            continue
        if x > y:
            hi.append(x); lo.append(y)
        else:
            hi.append(y); lo.append(x)
    typ = batch.schema.field(a_col).type
    return pa.table({"hi": pa.array(hi, typ), "lo": pa.array(lo, typ)})


def _large_star_rows(batch: pa.Table) -> pa.Table:
    """Symmetrize (hi, lo) → grouped-by-center rows (u, v)."""
    hi = batch["hi"]
    lo = batch["lo"]
    typ = batch.schema.field("hi").type
    u = pa.chunked_array([hi.combine_chunks(), lo.combine_chunks()]).cast(typ)
    v = pa.chunked_array([lo.combine_chunks(), hi.combine_chunks()]).cast(typ)
    return pa.table({"u": u, "v": v})


def _large_star_group(g: pa.Table) -> pa.Table:
    u = g["u"][0].as_py()
    nbrs = set(g["v"].to_pylist())
    m = min(min(nbrs), u)
    hi = sorted(v for v in nbrs if v > u)
    typ = g.schema.field("u").type
    return pa.table({"hi": pa.array(hi, typ),
                     "lo": pa.array([m] * len(hi), typ)})


def _small_star_group(g: pa.Table) -> pa.Table:
    u = g["hi"][0].as_py()
    nbrs = set(g["lo"].to_pylist())  # all < u by normalization
    m = min(nbrs)
    out = sorted(v for v in (nbrs | {u}) if v != m)
    typ = g.schema.field("hi").type
    return pa.table({"hi": pa.array(out, typ),
                     "lo": pa.array([m] * len(out), typ)})


def _checksum(edges: ray.data.Dataset) -> tuple[int, int]:
    def part(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_array(batch["hi"].to_numpy(zero_copy_only=False),
                               categorize=False)
        l = pd.util.hash_array(batch["lo"].to_numpy(zero_copy_only=False),
                               categorize=False)
        # 32-bit partials: Ray sums these as int64 across blocks — a full
        # 63-bit partial would overflow the int64 accumulator within 2 blocks.
        s = int((h ^ l).astype(np.uint64).sum() & np.uint64(0xFFFFFFFF))
        return pa.table({"n": pa.array([batch.num_rows], pa.int64()),
                         "s": pa.array([s], pa.int64())})

    agg = edges.map_batches(part, batch_format="pyarrow")
    n = agg.sum("n") or 0
    s = agg.sum("s") or 0
    return int(n), int(s)


def connected_components(pairs: ray.data.Dataset, a_col: str = "a",
                         b_col: str = "b", max_iters: int = 25) -> ray.data.Dataset:
    """Pair Dataset → star-forest Dataset with columns (node, root); singletons
    (nodes with no edge) are absent, matching :func:`union_find`."""
    edges = pairs.map_batches(
        lambda b: _normalize(b, a_col, b_col), batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return edges.map_batches(
            lambda b: b.rename_columns(["node", "root"]), batch_format="pyarrow")

    # Compact to a bounded block count ONCE: the sort-based groupby creates
    # (input blocks)² shuffle partitions at ~20 ms driver cost each (measured —
    # see the perf playbook), so a fragmented pair set (map_groups emits one
    # tiny block per bucket) would spend minutes on shuffle bookkeeping per
    # round. The groupby keeps block count ≈ its input thereafter, so one
    # compaction bounds every iteration.
    try:
        import ray
        target = max(8, min(64, int(ray.cluster_resources().get("CPU", 8))))
    except Exception:
        target = 16
    if edges.num_blocks() > 2 * target:
        edges = edges.repartition(target).materialize()

    prev = _checksum(edges)
    for _ in range(max_iters):
        edges = (edges.map_batches(_large_star_rows, batch_format="pyarrow")
                 .groupby("u").map_groups(_large_star_group, batch_format="pyarrow")
                 .groupby("hi").map_groups(_small_star_group, batch_format="pyarrow")
                 .materialize())
        cur = _checksum(edges)
        if cur == prev:
            break
        prev = cur
    else:
        incr_metric("cc_unconverged_runs")

    return edges.map_batches(
        lambda b: b.rename_columns(["node", "root"]), batch_format="pyarrow")


def resolve_roots_budgeted(pairs: ray.data.Dataset, a_col: str = "a",
                           b_col: str = "b", budget: int = 500_000) -> dict:
    """{node → cluster_min} for every clustered node. Under ``budget`` pairs the
    edge list is collected and union-found on the driver (fast, exact); over it
    the resolution runs distributed (:func:`connected_components`) and only the
    final star edges — one per clustered node, the same cardinality as the map
    being returned — reach the driver. Pair count and fallbacks are recorded in
    the metrics actor."""
    pairs = pairs.materialize()
    n_pairs = pairs.count()
    incr_metric("near_dup_pairs_total", n_pairs)
    if n_pairs <= budget:
        rows = pairs.take_all()
        return union_find([(r[a_col], r[b_col]) for r in rows])
    incr_metric("cc_distributed_fallbacks")
    stars = connected_components(pairs, a_col, b_col)
    return {r["node"]: r["root"] for r in stars.take_all()}
