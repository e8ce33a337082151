"""Global ordered prefix scan (ops/scan.py::global_running_sum)."""

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data

from ner_backend_ray.ops.scan import global_running_sum

RNG = np.random.default_rng(7)


def test_global_running_sum_matches_numpy(ray_session):
    n = 5_000
    keys = RNG.permutation(n).astype(np.int64)
    vals = RNG.integers(-50, 50, n).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"k": keys, "v": vals})).repartition(13)
    out = global_running_sum(ds, "k", "v").to_pandas().sort_values("k")
    order = np.argsort(keys)
    expect = np.cumsum(vals[order], dtype=np.int64)
    assert (out["k"].to_numpy() == keys[order]).all()
    assert (out["running"].to_numpy() == expect).all()


def test_global_running_sum_presorted_single_block(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "v": pa.array([10, 20, 30], pa.int64())}))
    out = global_running_sum(ds, "k", "v", presorted=True).to_pandas()
    assert out["running"].tolist() == [10, 30, 60]


def test_global_running_sum_rejects_overlapping_blocks(ray_session):
    # duplicate keys that straddle a block boundary must be refused, not
    # silently mis-ranked (presorted input pins the block layout exactly)
    t1 = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                   "v": pa.array([1, 1, 1], pa.int64())})
    t2 = pa.table({"k": pa.array([3, 4], pa.int64()),
                   "v": pa.array([1, 1], pa.int64())})
    ds = ray.data.from_arrow([t1, t2])
    with pytest.raises(ValueError, match="unique"):
        global_running_sum(ds, "k", "v", presorted=True).materialize()


def test_global_running_sum_empty(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array([], pa.int64()), "v": pa.array([], pa.int64())}))
    out = global_running_sum(ds, "k", "v")
    assert out.count() == 0
    assert "running" in out.schema().names
