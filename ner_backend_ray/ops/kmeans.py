"""Lloyd's k-means as a Dataset-native iterative op — integer-exact.

The clustering sibling of ``ops/pagerank.py``: an iterative ML algorithm
whose every step is exactly reproducible in ANSI SQL, so the driver's oracle
can value-hash the assignments instead of settling for a rows-only check.

Plan shape per iteration: ONE stateless ``map_batches`` pass over the
vectors computes assignments against the broadcast centroid matrix
(``ray.put`` once per iteration — k×dims int64, trivially small) and emits
per-cluster partial sums in narrow (cid, d, s) form, then one tiny groupby
reduces k × (dims+1) rows to the driver, which derives the next centroids.
The vector table is scanned once per iteration and NOTHING row-shaped ever
shuffles — the exchange volume is k·dims·blocks integers, independent of
row count. That is the textbook 100-TB k-means layout (centroid broadcast +
partial-sum reduction), here with exact arithmetic:

* coordinates quantize to int64 micro-units: x ← ⌊x·10⁶ + ½⌋ (float32 →
  float64 first, matching SQL's float→double promotion);
* distance = Σ(x−c)², pure int64 (|x| ≤ ~2·10⁶ over unit vectors → the
  64-dim sum stays < 2⁶³ by 8 orders of magnitude);
* ties break to the LOWEST centroid id (numpy argmin's first-minimum ==
  SQL ``row_number() ORDER BY dist, cid``);
* centroid update is the MATHEMATICAL floor mean, computed as
  ``(s − mod(s, n)) // n`` with a non-negative mod so engine (numpy floor
  division) and SQL (whose ``%``/``//`` truncate toward zero) agree on
  negative sums;
* a cluster that loses all members is dropped (its id simply stops
  existing), identically on both sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Sum


def _quantize(col: pa.ChunkedArray, quant: int) -> np.ndarray:
    """(rows, dims) int64 from a list<float> column — float64 promotion
    BEFORE scaling, mirroring SQL expression evaluation."""
    arr = col.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dims = len(arr[0])
    return np.floor(flat * quant + 0.5).astype(np.int64).reshape(-1, dims)


def _assign(x: np.ndarray, cents: np.ndarray,
            cids: np.ndarray) -> np.ndarray:
    """Per-row id of the nearest centroid; ties → lowest cid (cents rows are
    kept sorted by cid, so argmin's first-minimum is the lowest id)."""
    # ||x-c||² = ||x||² - 2x·c + ||c||²; the x·c matmul is the only O(n·k·d)
    # term and BLAS-shaped. All int64, exact.
    cross = x @ cents.T                      # (n, k)
    c2 = np.einsum("kd,kd->k", cents, cents)  # (k,)
    dd = c2[None, :] - 2 * cross             # ||x||² constant per row — omit
    return cids[np.argmin(dd, axis=1)]


def kmeans_int(vectors: ray.data.Dataset, vec_col: str, id_col: str,
               k: int, n_iters: int = 2,
               quant: int = 10**6) -> ray.data.Dataset:
    """Integer-exact Lloyd iterations; centroids init from the k rows with
    the smallest ``id_col`` (deterministic, oracle-reproducible). Returns
    (``id_col``, cid) assignments under the final centroids."""

    def init_rows(batch: pa.Table) -> pa.Table:
        sub = batch.filter(pa.compute.less(batch[id_col], k))
        return pa.table({id_col: sub[id_col], vec_col: sub[vec_col]})

    seed = pa.concat_tables(
        ray.get(vectors.map_batches(init_rows,
                                    batch_format="pyarrow").to_arrow_refs()))
    order = np.argsort(seed[id_col].to_numpy(zero_copy_only=False))
    cents = _quantize(seed[vec_col], quant)[order]
    cids = seed[id_col].to_numpy(zero_copy_only=False)[order].astype(np.int64)

    for _ in range(n_iters):
        ref = ray.put((cents, cids))

        def partials(batch: pa.Table) -> pa.Table:
            empty = pa.table({"cid": pa.array([], pa.int64()),
                              "d": pa.array([], pa.int64()),
                              "s": pa.array([], pa.int64())})
            if batch.num_rows == 0:
                return empty
            c, ids = ray.get(ref)
            x = _quantize(batch[vec_col], quant)
            a = _assign(x, c, ids)
            out_cid, out_d, out_s = [], [], []
            for cid in np.unique(a):
                sub = x[a == cid]
                out_cid.append(np.full(x.shape[1] + 1, cid, np.int64))
                out_d.append(np.arange(-1, x.shape[1], dtype=np.int64))
                out_s.append(np.concatenate([[len(sub)], sub.sum(axis=0)]))
            return pa.table({"cid": np.concatenate(out_cid),
                             "d": np.concatenate(out_d),
                             "s": np.concatenate(out_s)})

        agg = (vectors.map_batches(partials, batch_format="pyarrow")
               .groupby(["cid", "d"]).aggregate(Sum("s", alias_name="s"))
               .to_pandas())
        counts = (agg[agg["d"] == -1].set_index("cid")["s"])
        sums = agg[agg["d"] >= 0].pivot(index="cid", columns="d",
                                        values="s").sort_index()
        n = counts.loc[sums.index].to_numpy()[:, None].astype(np.int64)
        s = sums.to_numpy().astype(np.int64)
        mod = ((s % n) + n) % n              # mathematical mod, ≥ 0
        cents = (s - mod) // n               # exact floor mean
        cids = sums.index.to_numpy().astype(np.int64)  # empty clusters drop

    ref = ray.put((cents, cids))

    def final_assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cid": pa.array([], pa.int64())})
        c, ids = ray.get(ref)
        x = _quantize(batch[vec_col], quant)
        return pa.table({id_col: batch[id_col],
                         "cid": pa.array(_assign(x, c, ids))})

    return vectors.map_batches(final_assign, batch_format="pyarrow")
