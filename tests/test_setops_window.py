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
