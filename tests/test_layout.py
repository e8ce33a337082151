"""Z-order layout (ops/layout.py)."""

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ner_backend_ray.ops.layout import (column_ranges, morton_key_2d,
                                        quantize, zorder_sort)

RNG = np.random.default_rng(23)


def test_morton_key_known_values():
    x = np.array([0b11, 0b10, 0xFFFF], np.int64)
    y = np.array([0b00, 0b11, 0xFFFF], np.int64)
    z = morton_key_2d(x, y)
    assert z[0] == 0b0101          # x bits in even positions
    assert z[1] == 0b1110          # y=11 odd bits, x=10 even bits
    assert z[2] == (1 << 32) - 1   # all 32 bits set


def test_morton_key_is_bijective_on_grid():
    g = np.arange(64, dtype=np.int64)
    xs, ys = np.meshgrid(g, g)
    z = morton_key_2d(xs.ravel(), ys.ravel())
    assert len(np.unique(z)) == 64 * 64


def test_quantize_endpoints_and_sql_twin():
    v = np.array([10, 55, 100], np.int64)
    q = quantize(v, 10, 100, bits=16)
    assert q[0] == 0 and q[2] == 65535
    assert q[1] == (55 - 10) * 65535 // 90  # exact SQL expression


def test_zorder_sort_clusters_and_preserves_rows(ray_session):
    n = 4_000
    t = pa.table({"x": RNG.integers(0, 10_000, n),
                  "y": RNG.integers(0, 10_000, n)})
    ds = ray.data.from_arrow(t).repartition(8)
    out = zorder_sort(ds, "x", "y").to_pandas()
    assert len(out) == n
    # keys are globally sorted
    z = out["zkey"].to_numpy()
    assert (np.diff(z) >= 0).all()
    # row multiset preserved
    assert (np.sort(out["x"].to_numpy()) ==
            np.sort(t["x"].to_numpy())).all()
    # locality: mean |Δx| between z-adjacent rows is far below random
    # shuffling's expectation (~3333 for uniform [0, 10k))
    dx = np.abs(np.diff(out["x"].to_numpy()))
    assert dx.mean() < 1200


def test_column_ranges(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "x": pa.array([5, -3, 9], pa.int64()),
        "y": pa.array([0, 100, 50], pa.int64())})).repartition(2)
    r = column_ranges(ds, ["x", "y"])
    assert r == {"x": (-3, 9), "y": (0, 100)}


def test_column_ranges_skips_empty_blocks(ray_session):
    """Regression: pc.min/max on a zero-row block returned null -> None
    poisoned the driver-side min()/max() with a TypeError."""
    schema = pa.schema([("x", pa.int64()), ("y", pa.int64())])
    empty = schema.empty_table()
    data = pa.table({"x": pa.array([5, -3, 9], pa.int64()),
                     "y": pa.array([0, 100, 50], pa.int64())})
    ds = ray.data.from_arrow([empty, data, empty])
    assert column_ranges(ds, ["x", "y"]) == {"x": (-3, 9), "y": (0, 100)}


def test_column_ranges_all_empty_raises(ray_session):
    import pytest
    schema = pa.schema([("x", pa.int64())])
    ds = ray.data.from_arrow(schema.empty_table())
    with pytest.raises(ValueError, match="no rows"):
        column_ranges(ds, ["x"])
