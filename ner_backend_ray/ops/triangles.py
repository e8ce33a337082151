"""Distributed triangle counting — the wedge-check algorithm.

The third member of the iterative/graph family (sum-product PageRank,
min-plus BFS): a SINGLE-round structural count. Algorithm (node-iterator /
Cohen's MapReduce form, public): orient each undirected edge low→high, emit
for every node u all ordered pairs (v, w), v < w, of its out-neighbors (the
"wedges" u<v<w), and count wedges whose closing edge (v, w) exists. Each
triangle u<v<w is counted exactly once — at its lowest vertex.

Plan shape, all existing primitives:
1. wedge generation: bucket edges by u; inside a bucket one sorted table +
   the k-offset trick (pair each row with the row k positions later while
   the segment id matches) emits every out-neighbor pair with ZERO per-node
   Python — the loop is over k up to the max out-degree in the bucket,
   each iteration fully vectorized;
2. wedge check: the wedge set and the edge set are co-partitioned by a
   fused (v << 32 | w) key; inside each bucket group a sorted membership
   test (np.isin on the fused key) counts closures, and only per-bucket
   COUNT partials reach the final 1-row aggregate.

Scale notes: wedge volume is Σ_u C(outdeg(u), 2) — the algorithm's
intrinsic cost. Orienting low→high bounds it by the skew of the id order;
the standard degree-ordering refinement (orient toward higher degree) drops
worst-case hub blowup and composes here by re-labelling ids by degree rank
first (a groupby + the global scan) — left to the caller, noted for 100×.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Sum

from .joins import _bucket_of


def wedges_from_edges(edges: ray.data.Dataset, n_buckets: int = 32
                      ) -> ray.data.Dataset:
    """edges (u, v) int64 with u < v, distinct → wedge rows (v, w), v < w,
    one per ordered out-neighbor pair of each u."""

    def tagu(batch: pa.Table) -> pa.Table:
        return batch.append_column("__b", _bucket_of(batch["u"], n_buckets))

    def bucket_wedges(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"v": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        idx = pc.sort_indices(g, sort_keys=[("u", "ascending"),
                                            ("v", "ascending")])
        t = g.take(idx)
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        n = len(u)
        seg = np.empty(n, dtype=bool)
        seg[0] = True
        seg[1:] = u[1:] != u[:-1]
        seg_id = np.cumsum(seg) - 1
        counts = np.bincount(seg_id)
        out_v, out_w = [], []
        for k in range(1, int(counts.max()) if n else 0):
            same = seg_id[k:] == seg_id[:-k]
            if not same.any():
                break
            out_v.append(v[:-k][same])  # v sorted within u → v < w holds
            out_w.append(v[k:][same])
        if not out_v:
            return pa.table({"v": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        return pa.table({"v": pa.array(np.concatenate(out_v)),
                         "w": pa.array(np.concatenate(out_w))})

    return (edges.map_batches(tagu, batch_format="pyarrow")
            .groupby("__b").map_groups(bucket_wedges,
                                       batch_format="pyarrow"))


def distinct_pairs(pairs: ray.data.Dataset, n_buckets: int = 32
                   ) -> ray.data.Dataset:
    """DISTINCT over (u, v) int64 pairs — bucket by u, one sorted
    consecutive-dup mask per bucket (the same vectorized-distinct pattern
    as PageRank's node table)."""

    def tagu(batch: pa.Table) -> pa.Table:
        return batch.append_column("__b", _bucket_of(batch["u"], n_buckets))

    def dedupe(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        idx = pc.sort_indices(g, sort_keys=[("u", "ascending"),
                                            ("v", "ascending")])
        t = g.take(idx)
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        keep = np.empty(len(u), dtype=bool)
        keep[0] = True
        keep[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
        m = pa.array(keep)
        return pa.table({"u": t["u"].filter(m), "v": t["v"].filter(m)})

    return (pairs.map_batches(tagu, batch_format="pyarrow")
            .groupby("__b").map_groups(dedupe, batch_format="pyarrow"))


def triangle_count(edges: ray.data.Dataset, n_buckets: int = 32
                   ) -> ray.data.Dataset:
    """1-row (n_triangles, n_edges) over a distinct low→high edge list."""
    edges = edges.materialize()
    n_edges = edges.count()
    wedges = wedges_from_edges(edges, n_buckets)

    def fuse(side: str):
        def f(batch: pa.Table) -> pa.Table:
            a = batch["u" if side == "e" else "v"].cast(pa.int64())
            b = batch["v" if side == "e" else "w"].cast(pa.int64())
            key = pc.bit_wise_or(
                pc.shift_left(a, pa.scalar(32, pa.int64())), b)
            t = pa.table({"k": key,
                          "is_edge": pa.array(
                              np.full(batch.num_rows, 1 if side == "e"
                                      else 0, np.int8))})
            return t.append_column("__b", _bucket_of(t["k"], n_buckets))
        return f

    def close_count(g: pa.Table) -> pa.Table:
        is_e = g["is_edge"].to_numpy(zero_copy_only=False)
        k = g["k"].to_numpy(zero_copy_only=False)
        closed = np.isin(k[is_e == 0], k[is_e == 1])
        return pa.table({"pn": pa.array([int(closed.sum())], pa.int64())})

    combined = (edges.map_batches(fuse("e"), batch_format="pyarrow")
                .union(wedges.map_batches(fuse("w"),
                                          batch_format="pyarrow")))
    parts = combined.groupby("__b").map_groups(close_count,
                                               batch_format="pyarrow")
    total = parts.aggregate(Sum("pn", alias_name="n_triangles"))
    return ray.data.from_arrow(pa.table({
        "n_triangles": pa.array([int(total["n_triangles"] or 0)], pa.int64()),
        "n_edges": pa.array([n_edges], pa.int64())}))
