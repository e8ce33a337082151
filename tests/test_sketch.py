"""Unit suite for ops/sketch.py — pure-numpy, no Ray session needed.

Pins the properties the driver queries rely on: KLL rank error at k=256,
merge == fold up to the same error bound, wire-format roundtrip, determinism;
HLL fold associativity (block partials == whole pass, exactly) and estimator
accuracy at p=10/12.
"""

import numpy as np
import pytest

from ner_backend_ray.ops.sketch import (KLLSketch, _clz64, cms_estimate,
                                        cms_fold, cms_partial, hll_estimate,
                                        hll_fold, hll_partial, splitmix64)

RNG = np.random.default_rng(0xC0FFEE)


def _true_rank(sorted_vals: np.ndarray, x: float) -> int:
    return int(np.searchsorted(sorted_vals, x, side="right"))


QS = (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)


def _assert_rank_error(sk: KLLSketch, data: np.ndarray, tol: float = 0.015):
    s = np.sort(data)
    n = len(s)
    for q in QS:
        est = sk.quantile(q)
        target = int(np.ceil(q * n))
        # the returned value's true rank must be within tol·n of the target
        lo = _true_rank(s, np.nextafter(est, -np.inf))  # rank just below est
        hi = _true_rank(s, est)
        err = 0 if lo < target <= hi else min(abs(lo - target),
                                              abs(hi - target))
        assert err <= tol * n, (q, est, lo, hi, target)


def test_kll_exact_when_small():
    data = RNG.normal(size=200)
    sk = KLLSketch(k=256).add_batch(data)
    s = np.sort(data)
    for q in QS:
        assert sk.quantile(q) == s[int(np.ceil(q * len(s))) - 1]


@pytest.mark.parametrize("shape", ["uniform", "sorted", "dupes", "lognormal"])
def test_kll_rank_error(shape):
    n = 100_000
    if shape == "uniform":
        data = RNG.uniform(-1e9, 1e9, n)
    elif shape == "sorted":
        data = np.sort(RNG.uniform(0, 1, n))  # adversarial fold order
    elif shape == "dupes":
        data = RNG.integers(0, 50, n).astype(np.float64)
    else:
        data = RNG.lognormal(0, 4, n)
    sk = KLLSketch(k=256).add_batch(data)
    assert sk.n == n
    _assert_rank_error(sk, data)


def test_kll_merge_matches_fold_error_bound():
    n = 80_000
    data = RNG.uniform(0, 1, n)
    chunks = np.array_split(data, 7)
    sk = KLLSketch(k=256).add_batch(chunks[0])
    for c in chunks[1:]:
        sk.merge(KLLSketch(k=256).add_batch(c))
    assert sk.n == n
    _assert_rank_error(sk, data)
    # weight mass is preserved exactly through compaction
    _, wts = sk.items()
    assert int(wts.sum()) == n


def test_kll_wire_roundtrip_and_determinism():
    data = RNG.normal(size=30_000)
    sk1 = KLLSketch(k=128).add_batch(data)
    sk2 = KLLSketch(k=128).add_batch(data)
    lv1, v1 = sk1.level_rows()
    lv2, v2 = sk2.level_rows()
    np.testing.assert_array_equal(lv1, lv2)  # deterministic parity schedule
    np.testing.assert_array_equal(v1, v2)
    rt = KLLSketch.from_levels(lv1, v1, k=128)
    vals_a, wts_a = sk1.items()
    vals_b, wts_b = rt.items()
    np.testing.assert_array_equal(vals_a, vals_b)
    np.testing.assert_array_equal(wts_a, wts_b)
    assert rt.n == int(wts_a.sum())


def test_kll_nan_skipped_and_empty_raises():
    sk = KLLSketch()
    sk.add_batch(np.array([np.nan, 1.0, np.nan]))
    assert sk.n == 1
    with pytest.raises(ValueError):
        KLLSketch().quantile(0.5)


# ---------------------------------------------------------------------- HLL

def test_clz64_exact():
    vals = np.concatenate([
        np.array([0, 1, 2, 3, 2**63, 2**64 - 1, 2**32, 2**31], np.uint64),
        RNG.integers(1, 2**63, 1000).astype(np.uint64)])
    got = _clz64(vals)
    want = np.array([64 - int(v).bit_length() for v in vals], np.int64)
    np.testing.assert_array_equal(got, want)


def test_splitmix64_matches_scalar_reference():
    # pin the vectorized path to a straight-line pure-Python transcription of
    # Vigna's public-domain C (wrap-around arithmetic mod 2^64)
    def scalar(s: int) -> int:
        z = (s + 0x9E3779B97F4B7C15) & (2**64 - 1)
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & (2**64 - 1)
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & (2**64 - 1)
        return z ^ (z >> 31)

    seeds = np.concatenate([np.array([0, 1, 2**63, 2**64 - 1], np.uint64),
                            RNG.integers(0, 2**63, 500).astype(np.uint64)])
    got = splitmix64(seeds)
    want = np.array([scalar(int(s)) for s in seeds], np.uint64)
    np.testing.assert_array_equal(got, want)


def test_hll_fold_associative_exact():
    keys = RNG.integers(0, 10**12, 40_000)
    reg, rho = hll_partial(keys, p=10)
    whole = hll_fold(reg, rho, p=10)
    acc = np.zeros(1 << 10, np.int64)
    for chunk in np.array_split(keys, 11):
        r, h = hll_partial(chunk, p=10)
        acc = np.maximum(acc, hll_fold(r, h, p=10))
    np.testing.assert_array_equal(whole, acc)


@pytest.mark.parametrize("n,p,tol", [(100, 12, 0.05), (5_000, 12, 0.05),
                                     (50_000, 12, 0.05), (50_000, 10, 0.10)])
def test_hll_estimate_accuracy(n, p, tol):
    keys = np.arange(n, dtype=np.int64) * 7919 + 13  # n distinct keys
    keys = np.repeat(keys, 3)                        # duplicates are free
    reg, rho = hll_partial(keys, p=p)
    est = hll_estimate(hll_fold(reg, rho, p=p), p=p)
    assert abs(est - n) / n <= tol, (est, n)


def test_hll_partial_bounds():
    reg, rho = hll_partial(RNG.integers(0, 2**62, 10_000), p=10)
    assert reg.min() >= 0 and reg.max() < 1024
    assert rho.min() >= 1 and rho.max() <= 64 - 10 + 1


# ---------------------------------------------------------------------- CMS

def test_cms_never_undercounts_and_bounded_overcount():
    # zipf-ish token stream: heavy head + long tail
    keys = np.concatenate([np.repeat(np.arange(20), 500),
                           RNG.integers(1000, 100_000, 30_000)])
    d, w = 4, 2048
    r, c, n = cms_partial(keys, d=d, w=w)
    dense = cms_fold(r, c, n, d=d, w=w)
    uniq, true = np.unique(keys, return_counts=True)
    est = cms_estimate(dense, uniq)
    assert (est >= true).all()
    eps_bound = np.e / w * len(keys)  # e/w · n, the paper's per-row bound
    assert (est - true <= eps_bound).all()
    # head keys should be near-exact at this load factor
    assert (est[:20] - true[:20] <= 0.01 * len(keys)).all()


def test_cms_fold_associative_and_weighted_counts():
    keys = RNG.integers(0, 5_000, 40_000)
    whole_r, whole_c, whole_n = cms_partial(keys, d=3, w=512)
    whole = cms_fold(whole_r, whole_c, whole_n, d=3, w=512)
    acc = np.zeros((3, 512), np.int64)
    for chunk in np.array_split(keys, 9):
        # fold each chunk via its value_counts (the pre-aggregated path)
        u, cnt = np.unique(chunk, return_counts=True)
        r, c, n = cms_partial(u, counts=cnt, d=3, w=512)
        acc += cms_fold(r, c, n, d=3, w=512)
    np.testing.assert_array_equal(whole, acc)


def test_cms_string_keys():
    toks = np.array(["alpha", "beta", "alpha", "gamma", "alpha", "beta"],
                    dtype=object)
    dense = cms_fold(*cms_partial(toks, d=4, w=64), d=4, w=64)
    est = cms_estimate(dense, np.array(["alpha", "beta", "gamma", "absent"],
                                       dtype=object))
    assert est[0] >= 3 and est[1] >= 2 and est[2] >= 1
    assert int(dense[0].sum()) == 6  # each row holds the full mass
