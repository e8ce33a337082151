"""Deterministic sampling ops (ops/sampling.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data

from ner_backend_ray.ops.sampling import (_bucket100, hash_split, knuth32,
                                          stratified_sample)

RNG = np.random.default_rng(7)


def test_knuth32_matches_sql_expression():
    keys = np.array([0, 1, 17, 10**6, 2**40], np.int64)
    got = knuth32(keys)
    exp = [(int(k) * 2654435761) % 4294967296 for k in keys]
    assert got.tolist() == exp


def test_bucket100_in_range_and_deterministic():
    keys = RNG.integers(0, 2**62, 10_000)
    for fn in ("knuth32", "splitmix64"):
        b = _bucket100(keys, fn)
        assert b.min() >= 0 and b.max() < 100
        np.testing.assert_array_equal(b, _bucket100(keys, fn))
        # roughly uniform: every percent bucket hit on 10k keys
        assert len(np.unique(b)) == 100


def test_hash_split_stable_under_repartition(ray_session):
    t = pa.table({"id": np.arange(5_000, dtype=np.int64)})
    a = hash_split(ray.data.from_arrow(t), "id").to_pandas()
    b = hash_split(ray.data.from_arrow(t).repartition(17), "id").to_pandas()
    a = a.sort_values("id").reset_index(drop=True)
    b = b.sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    frac = a["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.03
    assert abs(frac["valid"] - 0.1) < 0.02
    assert abs(frac["test"] - 0.1) < 0.02


def test_hash_split_custom_fractions_and_validation(ray_session):
    t = pa.table({"id": np.arange(1_000, dtype=np.int64)})
    ds = ray.data.from_arrow(t)
    out = hash_split(ds, "id", fractions={"a": 50, "b": 100}).to_pandas()
    assert set(out["split"]) == {"a", "b"}
    with pytest.raises(ValueError):
        hash_split(ds, "id", fractions={"a": 50, "b": 90})
    with pytest.raises(ValueError):
        hash_split(ds, "id", fractions={"a": 60, "b": 40, "c": 100})


def test_stratified_sample_matches_bruteforce(ray_session):
    n = 2_000
    df = pd.DataFrame({"k": np.arange(n, dtype=np.int64),
                       "g": RNG.choice(list("abcde"), n)})
    ds = ray.data.from_pandas(df).repartition(13)
    got = (stratified_sample(ds, "g", "k", k=4).to_pandas()
           .sort_values(["g", "h", "k"]).reset_index(drop=True))
    from ner_backend_ray.ops.sketch import splitmix64
    df["h"] = splitmix64(df["k"].to_numpy().astype(np.uint64))
    exp = (df.sort_values(["h", "k"]).groupby("g").head(4)
           .sort_values(["g", "h", "k"]).reset_index(drop=True)[got.columns])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert (got.groupby("g").size() == 4).all()
