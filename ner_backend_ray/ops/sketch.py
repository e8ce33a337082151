"""Mergeable sketches: KLL quantiles, HyperLogLog distincts, Count-Min freqs.

The exact grouped-quantile path (`pipelines/queries.py::q_price_quantiles`)
relies on a bounded value domain (fixed-point cents) — when the domain is
unbounded (latencies, scores, arbitrary doubles) exact distributed order
statistics need a full sort. This sketch is the scale path for that case:
each block folds its values into a fixed-size summary, only sketch bytes
cross the wire, and summaries merge associatively, so a 100-TB column costs
one `map_batches` pass plus a driver merge of per-block sketches (a few KB
each — the classic mergeable-summary pattern, Karnin–Lang–Liberty 2016).

Determinism: the classic KLL compacts by keeping a RANDOM parity of the
sorted level; this implementation alternates the kept parity per level
(deterministic), trading the randomized guarantee for reproducible output —
rank error is pinned empirically by the unit suite (≤1.5 % of n at k=256 on
adversarial and uniform inputs) rather than claimed from the paper.

Weight bookkeeping: level i holds values each representing 2^i inputs; a
compaction sorts the level, keeps every other element of its EVEN-length
body, and promotes the kept half to level i+1 — an odd leftover (the sorted
max) stays behind at level i, so the summary's weight mass equals the true
input count exactly at all times (asserted by the unit suite).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


class KLLSketch:
    """Deterministic KLL-style quantile sketch over float64 values.

    ``k`` bounds each level's capacity; memory is O(k · log(n/k)) and the
    serialized form is a (value, weight) table suitable for a parquet export
    seam. Merging two sketches = concatenating levels then re-compacting —
    associative up to compaction order, which the alternating parity keeps
    deterministic for a fixed fold order.
    """

    def __init__(self, k: int = 256):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self._parity: list[int] = [0]
        self.n = 0

    # ----------------------------------------------------------------- fold
    def add_batch(self, values: np.ndarray) -> "KLLSketch":
        vals = np.asarray(values, np.float64)
        vals = vals[~np.isnan(vals)]
        if len(vals):
            self.levels[0] = np.concatenate([self.levels[0], vals])
            self.n += len(vals)
            self._compact_all()
        return self

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, np.float64))
            self._parity.append(0)
        for i, lvl in enumerate(other.levels):
            if len(lvl):
                self.levels[i] = np.concatenate([self.levels[i], lvl])
        self.n += other.n
        self._compact_all()
        return self

    def _compact_all(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) > self.k:
                lvl = np.sort(self.levels[i], kind="stable")
                cut = len(lvl) - (len(lvl) & 1)
                keep = lvl[self._parity[i]:cut:2]
                self._parity[i] ^= 1
                self.levels[i] = lvl[cut:]
                if i + 1 == len(self.levels):
                    self.levels.append(np.empty(0, np.float64))
                    self._parity.append(0)
                self.levels[i + 1] = np.concatenate([self.levels[i + 1], keep])
            i += 1

    @classmethod
    def from_levels(cls, levels: np.ndarray, values: np.ndarray,
                    k: int = 256) -> "KLLSketch":
        """Rebuild a sketch from flat (level, value) rows — the wire format a
        `map_batches` fold emits per block. Reconstruction IS the merge rule
        (concatenate each level across blocks, then recompact), so the driver
        merge of B block summaries is one call. ``n`` is restored as the
        summary weight mass, which even-body compaction keeps exactly equal
        to the true input count."""
        sk = cls(k)
        lv = np.asarray(levels, np.int64)
        vals = np.asarray(values, np.float64)
        depth = int(lv.max()) + 1 if len(lv) else 1
        while len(sk.levels) < depth:
            sk.levels.append(np.empty(0, np.float64))
            sk._parity.append(0)
        for i in range(depth):
            sk.levels[i] = vals[lv == i]
        sk.n = int((np.int64(1) << lv).sum())
        sk._compact_all()
        return sk

    def level_rows(self) -> tuple[np.ndarray, np.ndarray]:
        """Flat (level, value) rows — inverse of :meth:`from_levels`."""
        lvls = [(i, l) for i, l in enumerate(self.levels) if len(l)]
        if not lvls:
            return np.empty(0, np.int32), np.empty(0, np.float64)
        return (np.concatenate([np.full(len(l), i, np.int32)
                                for i, l in lvls]),
                np.concatenate([l for _, l in lvls]))

    # ---------------------------------------------------------------- query
    def items(self) -> tuple[np.ndarray, np.ndarray]:
        """(values, weights) of the summary, sorted by value — the export
        form the SQL oracle re-derives quantiles from."""
        vals = np.concatenate([lvl for lvl in self.levels]) \
            if any(len(l) for l in self.levels) else np.empty(0, np.float64)
        wts = np.concatenate([np.full(len(lvl), 1 << i, np.int64)
                              for i, lvl in enumerate(self.levels)]) \
            if len(vals) else np.empty(0, np.int64)
        order = np.argsort(vals, kind="stable")
        return vals[order], wts[order]

    def quantile(self, q: float) -> float:
        """Weighted quantile_disc: the smallest summary value whose
        cumulative weight reaches ceil(q · total) (mirrored in SQL by the
        export-seam oracle)."""
        vals, wts = self.items()
        if not len(vals):
            raise ValueError("empty sketch")
        cum = np.cumsum(wts)
        rank = max(1, int(np.ceil(q * cum[-1])))
        return float(vals[int(np.searchsorted(cum, rank, side="left"))])

    def rank(self, x: float) -> int:
        """Estimated number of inputs ≤ x (weight mass at-or-below x)."""
        vals, wts = self.items()
        return int(wts[:np.searchsorted(vals, x, side="right")].sum())


# ===========================================================================
# HyperLogLog distinct-count sketch (Flajolet et al. 2007)
# ===========================================================================
#
# The 100-TB shape: each block folds its keys into (register, rho) partials —
# at most 2^p rows per block regardless of block size — so the distinct-count
# shuffle moves O(blocks · 2^p) integer rows instead of the key column. The
# global combine is max-per-register (associative, order-free), expressible as
# a plain groupby, which is exactly what the SQL oracle re-derives from the
# exported partials. Only the final estimate (a scalar formula over 2^p
# integers) runs on the driver.

_SPLITMIX_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_C2 = np.uint64(0x94D049BB133111EB)
_SPLITMIX_INC = np.uint64(0x9E3779B97F4B7C15)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — a public-domain avalanche mixer
    (Steele/Vigna); deterministic, seedless, uniform over uint64."""
    x = np.asarray(x).astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += _SPLITMIX_INC
        x = (x ^ (x >> np.uint64(30))) * _SPLITMIX_C1
        x = (x ^ (x >> np.uint64(27))) * _SPLITMIX_C2
        return x ^ (x >> np.uint64(31))


def _clz64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized count-leading-zeros over uint64 (binary descent, six
    vector ops — no float round-trip, so no exponent-rounding edge cases)."""
    w = w.copy()
    n = np.zeros(w.shape, np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        mask = w < (np.uint64(1) << np.uint64(64 - shift))
        n[mask] += shift
        with np.errstate(over="ignore"):
            w[mask] <<= np.uint64(shift)
    n[w == 0] = 64
    return n


def hll_partial(keys: np.ndarray, p: int = 10) -> tuple[np.ndarray, np.ndarray]:
    """Per-row HLL kernel: (register, rho) for each key.

    register = top ``p`` hash bits; rho = 1 + leading zeros of the remaining
    64-p bits (1..64-p+1). Deterministic — both the Ray combine and the SQL
    oracle consume these exact rows.
    """
    if not 4 <= p <= 18:
        raise ValueError("p must be in [4, 18]")
    h = splitmix64(keys)
    reg = (h >> np.uint64(64 - p)).astype(np.int32)
    with np.errstate(over="ignore"):
        w = h << np.uint64(p)
    rho = np.where(w == 0, 64 - p + 1, _clz64(w) + 1).astype(np.int64)
    return reg, rho


def hll_fold(registers: np.ndarray, rhos: np.ndarray, p: int = 10) -> np.ndarray:
    """Dense register array (length 2^p) = max rho per register, 0 where the
    register was never hit. Folding partials from any number of blocks in any
    order yields the same array (max is associative + commutative)."""
    dense = np.zeros(1 << p, np.int64)
    np.maximum.at(dense, np.asarray(registers, np.int64),
                  np.asarray(rhos, np.int64))
    return dense


def cms_partial(keys: np.ndarray, counts: np.ndarray | None = None,
                d: int = 4, w: int = 2048) -> tuple[np.ndarray, np.ndarray,
                                                    np.ndarray]:
    """Count-Min partial for one block (Cormode–Muthukrishnan 2005): sparse
    (row, col, count) entries of the block's d×w counter matrix.

    Each key increments one counter per row, at column
    ``splitmix64(hash(key) ^ seed_row) % w`` — ``pd.util.hash_array``'s fixed
    SipHash key plus a deterministic per-row seed makes every worker agree.
    Partials from any number of blocks combine by (row, col) SUM (associative
    + commutative — a plain groupby), so estimating frequencies over a 100-TB
    key column ships at most ``blocks × d × w`` integer rows. ``counts`` lets
    a caller fold pre-aggregated (key, count) pairs (e.g. a block's
    value_counts) instead of raw occurrences."""
    if d < 1 or w < 2:
        raise ValueError("need d >= 1, w >= 2")
    base = pd.util.hash_array(np.asarray(keys), categorize=False)
    n = np.ones(len(base), np.int64) if counts is None \
        else np.asarray(counts, np.int64)
    dense = np.zeros((d, w), np.int64)
    for i in range(d):
        col = splitmix64(base ^ splitmix64(np.uint64(i + 1))) % np.uint64(w)
        np.add.at(dense[i], col.astype(np.int64), n)
    r, c = np.nonzero(dense)
    return r.astype(np.int32), c.astype(np.int32), dense[r, c]


def cms_fold(rows: np.ndarray, cols: np.ndarray, counts: np.ndarray,
             d: int = 4, w: int = 2048) -> np.ndarray:
    """Dense d×w matrix from sparse partial entries (sums duplicates, so
    folding any concatenation of block partials in any order is exact)."""
    dense = np.zeros((d, w), np.int64)
    np.add.at(dense, (np.asarray(rows, np.int64), np.asarray(cols, np.int64)),
              np.asarray(counts, np.int64))
    return dense


def cms_estimate(dense: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Point-query estimates: min over rows of each key's counter. Never
    under-counts; over-counts by ≤ e/w · total with prob ≥ 1 − e^−d."""
    d, w = dense.shape
    base = pd.util.hash_array(np.asarray(keys), categorize=False)
    est = np.full(len(base), np.iinfo(np.int64).max, np.int64)
    for i in range(d):
        col = (splitmix64(base ^ splitmix64(np.uint64(i + 1)))
               % np.uint64(w)).astype(np.int64)
        est = np.minimum(est, dense[i, col])
    return est


def hll_estimate(dense: np.ndarray, p: int = 10) -> float:
    """Standard HLL estimator with the small-range (linear-counting)
    correction; the 32-bit large-range correction does not apply to a 64-bit
    hash at any realistic cardinality. Relative error ≈ 1.04/sqrt(2^p)."""
    m = 1 << p
    if len(dense) != m:
        raise ValueError("dense register array must have length 2^p")
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.power(2.0, -dense.astype(np.float64)).sum()
    zeros = int((dense == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)
