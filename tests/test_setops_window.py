"""Distinct set ops (ops/setops.py) and per-partition window analytics."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ner_backend_ray.ops.setops import distinct_except, distinct_intersect
from ner_backend_ray.ops.window import partitioned_running

RNG = np.random.default_rng(31)


def _ds(vals, col="k"):
    return ray.data.from_arrow(
        pa.table({col: pa.array(vals, pa.int64())})).repartition(5)


def test_distinct_intersect_and_except(ray_session):
    a = _ds([1, 2, 2, 3, 5, 5, 7])
    b = _ds([2, 3, 3, 4, 6, 7, 7])
    inter = sorted(distinct_intersect(a, b, ["k"]).to_pandas()["k"])
    exc = sorted(distinct_except(a, b, ["k"]).to_pandas()["k"])
    assert inter == [2, 3, 7]
    assert exc == [1, 5]


def test_setops_multi_column(ray_session):
    ta = pa.table({"x": pa.array([1, 1, 2], pa.int64()),
                   "y": ["a", "b", "a"]})
    tb = pa.table({"x": pa.array([1, 2, 2], pa.int64()),
                   "y": ["b", "a", "b"]})
    a, b = ray.data.from_arrow(ta), ray.data.from_arrow(tb)
    inter = (distinct_intersect(a, b, ["x", "y"]).to_pandas()
             .sort_values(["x", "y"]).values.tolist())
    assert inter == [[1, "b"], [2, "a"]]
    exc = (distinct_except(a, b, ["x", "y"]).to_pandas()
           .sort_values(["x", "y"]).values.tolist())
    assert exc == [[1, "a"]]


def test_partitioned_range_sum_matches_brute_force(ray_session):
    from ner_backend_ray.ops.window import partitioned_range_sum
    n, win = 3_000, 50
    keys = RNG.integers(0, 40, n).astype(np.int64)
    ts = RNG.integers(0, 500, n).astype(np.int64)  # heavy ties → peers
    vals = RNG.integers(-9, 10, n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table(
        {"k": keys, "t": ts, "v": vals})).repartition(7)
    out = (partitioned_range_sum(ds, "k", "t", "v", win=win, n_buckets=8)
           .to_pandas())
    # brute force: all rows of same key with t in [t_i - win, t_i]
    got = {(r.k, r.t): r.range_sum for r in out.itertuples()}
    for kk in np.unique(keys):
        m = keys == kk
        tk, vk = ts[m], vals[m]
        for t0 in np.unique(tk):
            expect = int(vk[(tk >= t0 - win) & (tk <= t0)].sum())
            assert got[(kk, t0)] == expect
    assert len(out) == n


def test_partitioned_running_matches_pandas(ray_session):
    n = 2_000
    df = pd.DataFrame({
        "key": RNG.integers(0, 20, n),
        "o1": RNG.integers(0, 10**6, n),
        "tie": np.arange(n, dtype=np.int64),  # unique → total order
        "v": RNG.integers(-50, 50, n),
    })
    ds = ray.data.from_pandas(df).repartition(7)
    got = (partitioned_running(ds, "key", ["o1", "tie"], "v")
           .to_pandas().sort_values(["key", "o1", "tie"])
           .reset_index(drop=True))
    exp = df.sort_values(["key", "o1", "tie"]).reset_index(drop=True)
    g = exp.groupby("key")["v"]
    exp["running"] = g.cumsum()
    exp["prev"] = g.shift(1).fillna(-1).astype(np.int64)
    exp["rn"] = g.cumcount() + 1
    got = got.sort_values(["key", "o1", "tie"]).reset_index(drop=True)
    exp = exp.sort_values(["key", "o1", "tie"]).reset_index(drop=True)
    for c in ("running", "prev", "rn"):
        np.testing.assert_array_equal(got[c].to_numpy(), exp[c].to_numpy(),
                                      err_msg=c)


def test_partitioned_range_sum_many_segments_one_bucket(ray_session):
    """Regression: with a fixed 2^44 lane, seg_id * lane wrapped int64 once a
    bucket held >= 2^19 distinct keys, silently corrupting frame sums. The
    lane is now sized to the data (max span + win + 1)."""
    from ner_backend_ray.ops.window import partitioned_range_sum
    n = 600_000  # > 2^19 segments, all in ONE bucket
    keys = np.arange(n, dtype=np.int64)
    ts = np.zeros(n, dtype=np.int64)
    vals = RNG.integers(-9, 10, n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table(
        {"k": keys, "t": ts, "v": vals})).repartition(4)
    out = (partitioned_range_sum(ds, "k", "t", "v", win=1000, n_buckets=1)
           .to_pandas().sort_values("k").reset_index(drop=True))
    # each key has exactly one row -> its frame sum is its own value
    assert len(out) == n
    np.testing.assert_array_equal(out["range_sum"].to_numpy(), vals)


def test_partitioned_range_sum_extent_guard(ray_session):
    """n_segments * lane exceeding int64 must raise, not wrap."""
    import pytest

    from ner_backend_ray.ops.window import partitioned_range_sum
    n = 10_000
    ds = ray.data.from_arrow(pa.table({
        "k": np.arange(n, dtype=np.int64),
        "t": np.zeros(n, dtype=np.int64),
        "v": np.ones(n, dtype=np.int64)}))
    with pytest.raises(Exception, match="exceeds int64"):
        partitioned_range_sum(ds, "k", "t", "v", win=1 << 50,
                              n_buckets=1).to_pandas()
