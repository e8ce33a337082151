"""BFS levels / single-source-set shortest paths — the MIN-PLUS iteration.

PageRank (ops/pagerank.py) is the sum-product instance of the iterative
bucket-join-plus-groupby pattern; breadth-first levels are its min-plus
twin: dist(v) ← min(dist(v), min_{u→v} dist(u) + 1), seeded at a source
set, repeated k times. Each iteration is exactly two bucket shuffles:

1. relax: co-partition the current dist table with the edge list by
   src-bucket; inside each group join and emit per-dst candidate partials,
   pre-MINIMIZED within the group (the combiner — a hot dst's candidates
   collapse before they move);
2. apply: union candidates with the current dist table, bucket by node,
   per-group min.

The dist table only ever holds REACHED nodes, so there is no infinity
sentinel and the table grows monotonically toward the k-hop ball of the
sources — unreached nodes never occupy rows. All arithmetic is int64
(dist + 1), so an unrolled CTE oracle reproduces it bit-for-bit.

Scale shape: per iteration the shuffle volume is |frontier-adjacent edges| +
|reached| rows of two int64 columns; no driver-side state beyond per-
iteration row counts. Hot destinations are combined per src-bucket before
the apply shuffle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .joins import _bucket_of
from .pagerank import _right_size


def bfs_levels(edges: ray.data.Dataset, sources: ray.data.Dataset,
               n_iters: int = 3, src: str = "src", dst: str = "dst",
               node: str = "node",
               n_buckets: int = 32) -> ray.data.Dataset:
    """k-round BFS from a source-node set over a directed edge list.
    Returns (node, dist) for every node within ``n_iters`` hops (dist 0 =
    source). Duplicate edges/sources are harmless (min absorbs them)."""

    def edge_norm(batch: pa.Table) -> pa.Table:
        t = pa.table({"src": batch[src].cast(pa.int64()),
                      "dst": batch[dst].cast(pa.int64())})
        return t.append_column("__b", _bucket_of(t["src"], n_buckets))

    e = _right_size(
        edges.map_batches(edge_norm, batch_format="pyarrow").materialize())

    def seed(batch: pa.Table) -> pa.Table:
        u = pc.unique(batch[node].cast(pa.int64()))
        return pa.table({"node": u,
                         "dist": pa.array([0] * len(u), pa.int64())})

    dist = _right_size(
        sources.map_batches(seed, batch_format="pyarrow").materialize())

    def tag_d(batch: pa.Table) -> pa.Table:
        t = pa.table({"src": batch["node"], "dst": pa.nulls(
            batch.num_rows, pa.int64()), "dist": batch["dist"]})
        return (t.append_column("__b", _bucket_of(t["src"], n_buckets))
                 .append_column("__side", pa.array(["d"] * batch.num_rows)))

    def tag_e(batch: pa.Table) -> pa.Table:
        t = batch.select(["src", "dst", "__b"]).append_column(
            "dist", pa.nulls(batch.num_rows, pa.int64()))
        return (t.select(["src", "dst", "dist", "__b"])
                 .append_column("__side", pa.array(["e"] * batch.num_rows)))

    def relax_group(g: pa.Table) -> pa.Table:
        side = g["__side"]
        ed = g.filter(pc.equal(side, "e")).select(["src", "dst"])
        dd = g.filter(pc.equal(side, "d")).select(["src", "dist"])
        j = ed.join(dd, keys="src", join_type="inner")
        if j.num_rows == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "dist": pa.array([], pa.int64())})
        cand = pa.table({"node": j["dst"],
                         "dist": pc.add(j["dist"], pa.scalar(1, pa.int64()))})
        agg = cand.group_by("node").aggregate([("dist", "min")])
        return agg.rename_columns(["node", "dist"])

    def tag_n(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__b", _bucket_of(batch["node"], n_buckets))

    def min_group(g: pa.Table) -> pa.Table:
        agg = (g.select(["node", "dist"]).group_by("node")
               .aggregate([("dist", "min")]))
        return agg.rename_columns(["node", "dist"])

    for _ in range(n_iters):
        combined = (e.map_batches(tag_e, batch_format="pyarrow")
                    .union(dist.map_batches(tag_d, batch_format="pyarrow")))
        cands = combined.groupby("__b").map_groups(relax_group,
                                                   batch_format="pyarrow")
        dist = _right_size(
            dist.union(cands)
            .map_batches(tag_n, batch_format="pyarrow")
            .groupby("__b").map_groups(min_group, batch_format="pyarrow")
            .materialize())

    return dist
