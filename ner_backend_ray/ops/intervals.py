"""Global interval-overlap self-join via domain tiling.

The no-equi-key twin of ``ops/joins.py::range_join`` (which co-partitions by
a join key): here ANY two intervals in the dataset may pair, so the domain
``[min(s), max(e)]`` is tiled with width ``>= max(e - s)`` and every interval
is replicated to each tile it touches (at most 2 with the default width).
Two intervals overlap iff they co-occur in the tile containing the LATER of
the two starts — that tile holds the overlap's first instant — so each pair
is owned by exactly one tile and no global pair-dedup shuffle is needed (the
same exactly-once trick as ops/fuzzy.py and simhash's first-intact-block).

Scale shape:
- one cheap stats scan (min/max/maxlen partials, one row per block),
- replication factor ``1 + len/tile_width`` per interval (≤ 2 by default),
- tiles are hash-grouped into ``n_buckets`` shuffle groups; inside a bucket
  each tile is processed independently with sorted starts + searchsorted —
  no per-row Python, output rows only for true overlaps,
- a tile's cost is quadratic in ITS OWN occupancy, never in the dataset:
  pathological clustering (everything inside one max-length window) degrades
  that tile alone; the per-tile pair count is the true output size.

No direct reference analog — the reference's joins are equi-key
(internal/core/search.go group evaluation); this covers the temporal-overlap
queries a 100 TB event corpus needs (co-active sessions, concurrent spans).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_PAIR_SCHEMA = pa.schema([("a_id", pa.int64()), ("b_id", pa.int64())])


def _stats(ds: ray.data.Dataset, s: str, e: str) -> tuple[int, int, int]:
    """(min start, max end, max length) via per-block one-row partials."""

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64()),
                             "ln": pa.array([], pa.int64())})
        ln = pc.max(pc.subtract(batch[e], batch[s])).as_py()
        return pa.table({"lo": [pc.min(batch[s]).as_py()],
                         "hi": [pc.max(batch[e]).as_py()],
                         "ln": [ln]})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    if not rows:
        return 0, 0, 0
    return (min(r["lo"] for r in rows), max(r["hi"] for r in rows),
            max(r["ln"] for r in rows))


def interval_self_pairs(ds: ray.data.Dataset, id_col: str, s: str, e: str,
                        tile_width: int | None = None,
                        n_buckets: int | None = None) -> ray.data.Dataset:
    """All unordered pairs of rows whose closed intervals ``[s, e]`` overlap.

    Emits ``(a_id, b_id)`` with ``(s_a, id_a) < (s_b, id_b)`` lexicographically
    (so each pair appears once, earlier-starting interval first). ``s``/``e``
    must be int64-comparable (cast timestamps to epoch units upstream);
    rows with ``e < s`` are treated as empty and never pair.
    """
    from .joins import _bucket_of, buckets_for
    n_buckets = n_buckets or buckets_for(0)

    lo, _hi, max_len = _stats(ds, s, e)
    width = int(tile_width or max(max_len, 1))

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        ss = batch[s].combine_chunks().to_numpy(zero_copy_only=False)
        ee = batch[e].combine_chunks().to_numpy(zero_copy_only=False)
        keep = ee >= ss
        ids, ss, ee = ids[keep], ss[keep], ee[keep]
        t0 = (ss - lo) // width
        t1 = (ee - lo) // width
        reps = (t1 - t0 + 1).astype(np.int64)
        ridx = np.repeat(np.arange(len(ss)), reps)
        # tile index for each replica: t0[row] + position-within-run
        offs = np.arange(len(ridx)) - np.repeat(
            np.cumsum(reps) - reps, reps)
        tiles = t0[ridx] + offs
        out = pa.table({"id": pa.array(ids[ridx], pa.int64()),
                        "s": pa.array(ss[ridx], pa.int64()),
                        "e": pa.array(ee[ridx], pa.int64()),
                        "tile": pa.array(tiles, pa.int64())})
        return out.append_column("__b", _bucket_of(out["tile"], n_buckets))

    def bucket_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        idx = pc.sort_indices(g, sort_keys=[("tile", "ascending"),
                                            ("s", "ascending"),
                                            ("id", "ascending")])
        t = g.take(idx)
        tiles = t["tile"].to_numpy(zero_copy_only=False)
        ss = t["s"].to_numpy(zero_copy_only=False)
        ee = t["e"].to_numpy(zero_copy_only=False)
        ids = t["id"].to_numpy(zero_copy_only=False)
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        bounds = np.append(
            np.flatnonzero(np.r_[True, tiles[1:] != tiles[:-1]]), len(tiles))
        for g0, g1 in zip(bounds[:-1], bounds[1:]):
            tile = tiles[g0]
            sv, ev, iv = ss[g0:g1], ee[g0:g1], ids[g0:g1]
            n = len(sv)
            # for row i, partners are rows j>i with s_j <= e_i (starts are
            # sorted, so that prefix is exactly the overlap candidates)
            hi = np.searchsorted(sv, ev, side="right")
            cnt = np.maximum(hi - np.arange(1, n + 1), 0)
            total = int(cnt.sum())
            if total == 0:
                continue
            ai = np.repeat(np.arange(n), cnt)
            bj = (np.arange(total)
                  - np.repeat(np.cumsum(cnt) - cnt, cnt)) + ai + 1
            # exactly-once ownership: the LATER start (s_j) lies in this tile
            own = (sv[bj] - lo) // width == tile
            out_a.append(iv[ai[own]])
            out_b.append(iv[bj[own]])
        if not out_a:
            return _PAIR_SCHEMA.empty_table()
        return pa.table({"a_id": pa.array(np.concatenate(out_a), pa.int64()),
                         "b_id": pa.array(np.concatenate(out_b), pa.int64())})

    return (ds.map_batches(explode, batch_format="pyarrow")
            .groupby("__b").map_groups(bucket_pairs, batch_format="pyarrow"))
