"""Unit + Ray tests for ops/bloom.py.

Pins: no false negatives ever; false-positive rate near the sizing formula;
OR-fold associativity (block partials == whole pass); semi-join exactness vs
a pandas isin oracle, including under a degenerate (everything-passes) filter
and a mismatched key dtype.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data

from ner_backend_ray.ops.bloom import (bloom_build, bloom_might_contain,
                                       bloom_params, bloom_semi_join,
                                       _local_bitmap)

RNG = np.random.default_rng(0xB100)


def test_bloom_params_formula():
    m, k = bloom_params(10_000, 0.01)
    assert m % 64 == 0
    assert 9.0 <= m / 10_000 <= 10.1  # ≈9.59 bits/key at 1 %
    assert k == 7


def test_no_false_negatives_and_fpp():
    keys = RNG.integers(0, 2**40, 20_000)
    m, k = bloom_params(len(keys), 0.01)
    bm = _local_bitmap(pa.array(keys), m, k)
    assert bloom_might_contain(bm, pa.array(keys), m, k).all()
    absent = RNG.integers(2**41, 2**42, 50_000)  # disjoint range
    fp = bloom_might_contain(bm, pa.array(absent), m, k).mean()
    assert fp <= 0.03  # sized for 1 %, allow 3× slack


def test_or_fold_associative():
    keys = RNG.integers(0, 10**9, 30_000)
    m, k = bloom_params(len(keys), 0.05)
    whole = _local_bitmap(pa.array(keys), m, k)
    acc = np.zeros(m // 8, np.uint8)
    for chunk in np.array_split(keys, 7):
        acc |= _local_bitmap(pa.array(chunk), m, k)
    np.testing.assert_array_equal(whole, acc)


def _semi_oracle(probe: pd.DataFrame, keys: np.ndarray,
                 on: str) -> pd.DataFrame:
    out = probe[probe[on].isin(set(keys.tolist()))]
    return out.sort_values(list(out.columns)).reset_index(drop=True)


@pytest.mark.parametrize("fpp", [0.01, 0.9999])  # tight and degenerate filter
def test_semi_join_exact(ray_session, fpp):
    probe_pd = pd.DataFrame({
        "k": RNG.integers(0, 500, 4_000),
        "v": RNG.normal(size=4_000)})
    build_keys = np.unique(RNG.integers(0, 500, 120))
    build_keys = np.repeat(build_keys, 3)  # dup build keys must not multiply
    probe = ray.data.from_pandas(probe_pd).map_batches(
        lambda b: b, batch_format="pyarrow")
    build = ray.data.from_arrow(pa.table({"bk": build_keys}))
    got = (bloom_semi_join(probe, "k", build, "bk",
                           n_build_keys=len(build_keys), fpp=fpp,
                           n_buckets=8)
           .to_pandas().sort_values(["k", "v"]).reset_index(drop=True))
    want = _semi_oracle(probe_pd, build_keys, "k").sort_values(["k", "v"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_semi_join_casts_mismatched_key_dtype(ray_session):
    probe_pd = pd.DataFrame({"k": np.arange(200, dtype=np.int64), "v": 1.0})
    build = ray.data.from_arrow(
        pa.table({"bk": pa.array(np.arange(0, 200, 2, dtype=np.int32))}))
    probe = ray.data.from_pandas(probe_pd)
    got = bloom_semi_join(probe, "k", build, "bk", n_build_keys=100,
                          n_buckets=4).to_pandas()
    assert sorted(got["k"].tolist()) == list(range(0, 200, 2))


def test_bloom_params_capped():
    m, k = bloom_params(10**9, 0.01)  # uncapped would need ~9.6e9 bits
    assert m == 1 << 29 and m % 64 == 0
    assert k == 1  # re-derived for the capped bits-per-key ratio


def test_bloom_build_tree_reduction_matches_local(ray_session):
    keys = RNG.integers(0, 10**8, 5_000)
    m, k = bloom_params(len(keys), 0.05)
    ds = ray.data.from_arrow(pa.table({"x": keys})).repartition(40)
    got = bloom_build(ds, "x", m, k, fan_in=4)  # forces ≥2 OR rounds
    np.testing.assert_array_equal(got, _local_bitmap(pa.array(keys), m, k))


def test_bloom_build_distributed_matches_local(ray_session):
    keys = RNG.integers(0, 10**8, 10_000)
    m, k = bloom_params(len(keys), 0.02)
    ds = ray.data.from_arrow(pa.table({"x": keys})).repartition(6)
    np.testing.assert_array_equal(bloom_build(ds, "x", m, k),
                                  _local_bitmap(pa.array(keys), m, k))


def test_bloom_anti_join_matches_set_difference(ray_session):
    from ner_backend_ray.ops.bloom import bloom_anti_join
    probe_keys = np.arange(1_000, dtype=np.int64)
    build_keys = RNG.choice(probe_keys, 300, replace=False)
    probe = ray.data.from_arrow(pa.table({"k": probe_keys,
                                          "v": probe_keys * 2})).repartition(7)
    build = ray.data.from_arrow(pa.table({"bk": build_keys})).repartition(3)
    got = bloom_anti_join(probe, "k", build, "bk",
                          n_build_keys=300).to_pandas()
    exp = sorted(set(probe_keys.tolist()) - set(build_keys.tolist()))
    assert sorted(got["k"].tolist()) == exp
    assert (got["v"] == got["k"] * 2).all()


def test_bloom_anti_join_empty_build(ray_session):
    from ner_backend_ray.ops.bloom import bloom_anti_join
    probe = ray.data.from_arrow(pa.table({"k": np.arange(50, dtype=np.int64)}))
    build = ray.data.from_arrow(
        pa.table({"bk": pa.array([], pa.int64())}))
    got = bloom_anti_join(probe, "k", build, "bk", n_build_keys=1).to_pandas()
    assert sorted(got["k"].tolist()) == list(range(50))


def test_bloom_anti_join_casts_mismatched_key_dtype(ray_session):
    from ner_backend_ray.ops.bloom import bloom_anti_join
    probe = ray.data.from_arrow(
        pa.table({"k": np.arange(200, dtype=np.int64)}))
    build = ray.data.from_arrow(
        pa.table({"bk": pa.array(range(0, 200, 2), pa.int32())}))
    got = bloom_anti_join(probe, "k", build, "bk", n_build_keys=100).to_pandas()
    assert sorted(got["k"].tolist()) == list(range(1, 200, 2))
