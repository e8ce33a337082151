"""Fuzzy (edit-distance-1) pair join via deletion-neighborhood blocking.

The typo-tolerant twin of the MinHash alias clustering
(stages/canonicalize.py): two strings are at Levenshtein distance ≤ 1 iff
they share a key in {s} ∪ {delete(s, i)} — a substitution pair shares the
deletion at the mismatch position, an insertion/deletion pair shares the
shorter string itself, so the neighborhood is a complete blocking scheme,
never a recall trade. Sharing a key only bounds the distance by 2
(del_i(a) == del_j(b) allows one deletion on EACH side), so candidates are
verified exactly.

Scale shape (the same contract as the other near-dup ops in ops/dedup.py):
- distinct values first (hash-bucket groupby; duplicates never fan out),
- each value emits ≤ len+1 keys — linear blow-up, no all-pairs anywhere,
- candidate pairs form inside (hash(key) % n_buckets) groups only,
- every pair is OWNED by exactly one key (the lexicographically smallest
  shared key, recomputed from the pair itself), so no global pair-dedup
  shuffle is needed — the simhash first-intact-block trick
  (ops/dedup.py::simhash_near_dups).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_PAIR_SCHEMA = pa.schema([("a", pa.string()), ("b", pa.string())])


def _del1_keys(s: str) -> set[str]:
    """{s} ∪ single-deletion neighborhood (deduped — 'aab' deletes to 'ab'
    twice)."""
    return {s} | {s[:i] + s[i + 1:] for i in range(len(s))}


def _is_edit1(a: str, b: str) -> bool:
    """Exact Levenshtein(a, b) ≤ 1 in O(len) (a != b assumed)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:  # exactly one substitution
        return sum(x != y for x, y in zip(a, b)) == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # b is a + one inserted char: skip the first mismatch in b
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def _owner_key(a: str, b: str) -> str:
    """The lexicographically smallest shared deletion-neighborhood key —
    deterministic single ownership of the pair across buckets."""
    return min(_del1_keys(a) & _del1_keys(b))


def distinct_values(ds: ray.data.Dataset, col: str,
                    n_buckets: int) -> ray.data.Dataset:
    """Global distinct of one string column: per-block pc.unique partials →
    hash-bucket groupby → per-bucket unique. Only distinct-per-block rows
    shuffle."""
    from .joins import _bucket_of

    def partial(batch: pa.Table) -> pa.Table:
        u = batch[col].combine_chunks().unique()
        t = pa.table({col: u})
        return t.append_column("__b", _bucket_of(t[col], n_buckets))

    def uniq(g: pa.Table) -> pa.Table:
        return pa.table({col: g[col].combine_chunks().unique()})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("__b").map_groups(uniq, batch_format="pyarrow"))


def edit1_pairs(ds: ray.data.Dataset, col: str,
                n_buckets: int | None = None) -> ray.data.Dataset:
    """All unordered pairs (a < b) of DISTINCT ``col`` values with
    Levenshtein distance ≤ 1. Returns (a, b) rows."""
    from .joins import _bucket_of, buckets_for
    n_buckets = n_buckets or buckets_for(0)
    values = distinct_values(ds, col, n_buckets)

    def explode_keys(batch: pa.Table) -> pa.Table:
        vals = batch[col].to_pylist()  # distinct-only rows reach here
        out_v, out_k = [], []
        for s in vals:
            for k in _del1_keys(s):
                out_v.append(s)
                out_k.append(k)
        t = pa.table({"v": pa.array(out_v, pa.string()),
                      "k": pa.array(out_k, pa.string())})
        return t.append_column("__b", _bucket_of(t["k"], n_buckets))

    def bucket_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        idx = pc.sort_indices(g, sort_keys=[("k", "ascending"),
                                            ("v", "ascending")])
        t = g.take(idx)
        ks = np.asarray(t["k"].to_pylist(), dtype=object)
        vs = np.asarray(t["v"].to_pylist(), dtype=object)
        new = np.empty(len(ks), dtype=bool)
        new[0] = True
        new[1:] = ks[1:] != ks[:-1]
        bounds = np.append(np.flatnonzero(new), len(ks))
        out_a, out_b = [], []
        for s0, s1 in zip(bounds[:-1], bounds[1:]):
            key = ks[s0]
            grp = vs[s0:s1]
            for i in range(len(grp)):
                for j in range(i + 1, len(grp)):
                    a, b = grp[i], grp[j]
                    if a == b or not _is_edit1(a, b):
                        continue
                    if _owner_key(a, b) == key:  # exactly-once emission
                        out_a.append(a)
                        out_b.append(b)
        return pa.table({"a": pa.array(out_a, pa.string()),
                         "b": pa.array(out_b, pa.string())})

    return (values.map_batches(explode_keys, batch_format="pyarrow")
            .groupby("__b").map_groups(bucket_pairs, batch_format="pyarrow"))
