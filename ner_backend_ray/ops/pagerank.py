"""Iterative PageRank as a Dataset-native fixpoint loop — integer-exact.

The missing family in a groupby/join engine is the ITERATIVE graph
algorithm: rank(v) ← base + d·Σ_{u→v} rank(u)/outdeg(u), repeated. Each
iteration here is one bucket-co-partitioned join of the rank table with the
edge list plus one combiner groupby — the same two primitives every other
wide op in this engine uses — so an N-iteration run is a chain of 2N
shuffles over (node, rank) pairs, never a driver-side loop over rows.
Ranks stay in the object store between iterations (each iteration's output
Dataset is materialized — it is read twice: joined with edges AND unioned as
the no-in-edge fallback); only per-iteration row counts reach the driver.

Arithmetic is scaled int64 throughout: ranks are in units of 1/SCALE, the
per-edge contribution is ``rank // outdeg`` (floor), and the damping update
is ``base + (85 · Σcontrib) // 100``. Floor division leaks a little mass
(the classic fixed-point trade), but every step is exactly reproducible in
ANSI SQL (``//``), which makes an iterative algorithm — normally the
"weaker rows-only check" case — fully value-hash verifiable against an
unrolled DuckDB oracle. No dangling-mass redistribution: a sink's rank
simply leaks, identically on both sides.

Scale notes: the rank table is O(|V|) and the join is bucketed by node id,
so the iteration cost is |E| shuffle rows — linear per iteration, no
all-pairs anywhere. Hot (high in-degree) nodes concentrate their ADDENDS in
one bucket's combiner, not their edges on one key's row — the per-block
partial sum collapses them before the shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .joins import _bucket_of


def _right_size(ds: ray.data.Dataset,
                target_block_bytes: int = 32 << 20) -> ray.data.Dataset:
    """Coalesce a materialized dataset to ~target-sized blocks. The iteration
    tables inherit their block count from the input scan (64+ blocks for a
    2 MB graph at 32 CPUs), and every per-iteration shuffle then schedules
    blocks×buckets tiny tasks — pure overhead. Sizing blocks to bytes keeps
    small graphs on a few blocks while leaving a 100-TB edge list exactly as
    wide as it was."""
    n_bytes = ds.size_bytes() or 0
    want = max(1, -(-n_bytes // target_block_bytes))
    if want < ds.num_blocks():
        return ds.repartition(want).materialize()
    return ds


def pagerank_int(edges: ray.data.Dataset, src: str = "src", dst: str = "dst",
                 n_iters: int = 3, scale_total: int = 10**12,
                 n_buckets: int = 32) -> ray.data.Dataset:
    """Integer PageRank over a directed edge list. Returns (node, rank)
    with rank in units of 1/``scale_total`` of total initial mass:
    init = scale_total // |V| per node, base = (15 · init) // 100,
    rank⁺(v) = base + (85 · Σ_{u→v} rank(u) // outdeg(u)) // 100."""

    # ---- static graph tables (computed once, reused every iteration) ----
    def edge_norm(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch[src].cast(pa.int64()),
                         "dst": batch[dst].cast(pa.int64())})

    e = _right_size(
        edges.map_batches(edge_norm, batch_format="pyarrow").materialize())

    # DISTINCT by bucketed per-group unique — NOT groupby("node").map_groups,
    # which pays one Python UDF call per distinct key (~150× slower at 400k
    # keys, measured). Each bucket group holds every copy of its keys, so a
    # per-group pc.unique is a complete distinct.
    def nodes_part(batch: pa.Table) -> pa.Table:
        u = pc.unique(pa.chunked_array([batch["src"], batch["dst"]]))
        t = pa.table({"node": u})
        return t.append_column("__b", _bucket_of(t["node"], n_buckets))

    def uniq_group(g: pa.Table) -> pa.Table:
        return pa.table({"node": pc.unique(g["node"])})

    nodes = _right_size(
        e.map_batches(nodes_part, batch_format="pyarrow")
        .groupby("__b").map_groups(uniq_group, batch_format="pyarrow")
        .materialize())
    n_nodes = nodes.count()
    init = scale_total // max(1, n_nodes)
    base = (15 * init) // 100

    # annotate each edge with its src's out-degree, once (the divisor is
    # iteration-invariant). The bucket groupby is keyed by src, so every row
    # of a src lands in one group and the count is complete WITHIN the group
    # — no separate out-degree shuffle or join.
    def tag_e(batch: pa.Table) -> pa.Table:
        return batch.append_column("__b", _bucket_of(batch["src"], n_buckets))

    def join_deg(g: pa.Table) -> pa.Table:
        deg = (g.select(["src"]).group_by("src")
               .aggregate([([], "count_all")])
               .rename_columns(["src", "outdeg"]))
        return (g.select(["src", "dst"]).join(deg, keys="src",
                                              join_type="inner")
                .select(["src", "dst", "outdeg"]))

    edges_deg = _right_size(
        e.map_batches(tag_e, batch_format="pyarrow")
        .groupby("__b").map_groups(join_deg, batch_format="pyarrow")
        .materialize())

    rank = nodes.map_batches(
        lambda b: pa.table({"node": b["node"],
                            "rank": pa.array(
                                np.full(b.num_rows, init, np.int64))}),
        batch_format="pyarrow").materialize()

    def tag(side: str, key: str):
        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {"node": batch[key] if side == "r" else batch["node"],
                    "dst": (batch["dst"] if side == "e"
                            else pa.nulls(n, pa.int64())),
                    "outdeg": (batch["outdeg"] if side == "e"
                               else pa.nulls(n, pa.int64())),
                    "rank": (batch["rank"] if side == "r"
                             else pa.nulls(n, pa.int64()))}
            t = pa.table(cols)
            return (t.append_column("__b", _bucket_of(t["node"], n_buckets))
                     .append_column("__side", pa.array([side] * n)))
        return f

    def contrib_group(g: pa.Table) -> pa.Table:
        """Per src-bucket: join ranks onto edges, emit per-dst partial sums
        of rank // outdeg (combined before the dst shuffle)."""
        side = g["__side"]
        ed = g.filter(pc.equal(side, "e")).select(["node", "dst", "outdeg"])
        rk = g.filter(pc.equal(side, "r")).select(["node", "rank"])
        j = ed.join(rk, keys="node", join_type="inner")
        if j.num_rows == 0:
            return pa.table({"dst": pa.array([], pa.int64()),
                             "pc_": pa.array([], pa.int64())})
        c = pc.divide(j["rank"], j["outdeg"])  # int64 floor for positives
        agg = (pa.table({"dst": j["dst"], "c": c})
               .group_by("dst").aggregate([("c", "sum")]))
        return agg.rename_columns(["dst", "pc_"])

    # rank⁺ = base + 85·s // 100 for nodes with in-edges; base otherwise.
    # The contribution PARTIALS (per src-bucket, keyed by dst) feed straight
    # into the rank-apply bucket groupby — the per-node sum completes inside
    # the apply group, so each iteration is exactly TWO shuffles
    # (contrib bucket, apply bucket), not three.
    def tag2(side: str, key: str, val: str | None = None):
        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            t = pa.table({"node": batch[key].cast(pa.int64()),
                          "s": (batch[val].cast(pa.int64()) if val
                                else pa.nulls(n, pa.int64()))})
            return (t.append_column("__b",
                                    _bucket_of(t["node"], n_buckets))
                     .append_column("__side", pa.array([side] * n)))
        return f

    def apply_group(g: pa.Table) -> pa.Table:
        side = g["__side"]
        nd = g.filter(pc.equal(side, "n")).select(["node"])
        sm = (g.filter(pc.equal(side, "s")).select(["node", "s"])
              .group_by("node").aggregate([("s", "sum")])
              .rename_columns(["node", "s"]))
        j = nd.join(sm, keys="node", join_type="left outer")
        s = j["s"].fill_null(0)
        newrank = pc.add(pa.scalar(base, pa.int64()),
                         pc.divide(pc.multiply(s, pa.scalar(85)),
                                   pa.scalar(100)))
        return pa.table({"node": j["node"],
                         "rank": newrank.cast(pa.int64())})

    for _ in range(n_iters):
        tagged = (edges_deg.map_batches(
            lambda b: b.rename_columns(["node", "dst", "outdeg"])
            , batch_format="pyarrow")
            .map_batches(tag("e", "node"), batch_format="pyarrow")
            .union(rank.map_batches(tag("r", "node"),
                                    batch_format="pyarrow")))
        partials = tagged.groupby("__b").map_groups(contrib_group,
                                                    batch_format="pyarrow")
        rank = (nodes.map_batches(tag2("n", "node"), batch_format="pyarrow")
                .union(partials.map_batches(tag2("s", "dst", "pc_"),
                                            batch_format="pyarrow"))
                .groupby("__b").map_groups(apply_group,
                                           batch_format="pyarrow")
                .materialize())
        rank = _right_size(rank)

    return rank
