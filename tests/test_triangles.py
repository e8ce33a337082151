"""Triangle counting (ops/triangles.py) vs brute force."""

import itertools

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ner_backend_ray.ops.triangles import (distinct_pairs, triangle_count,
                                           wedges_from_edges)

RNG = np.random.default_rng(17)


def _brute_triangles(edge_set):
    nodes = sorted({x for e in edge_set for x in e})
    return sum(1 for u, v, w in itertools.combinations(nodes, 3)
               if (u, v) in edge_set and (u, w) in edge_set
               and (v, w) in edge_set)


def test_triangle_count_matches_brute_force(ray_session):
    n_nodes, n_edges = 60, 400
    a = RNG.integers(0, n_nodes, n_edges)
    b = RNG.integers(0, n_nodes, n_edges)
    keep = a != b
    u = np.minimum(a[keep], b[keep]).astype(np.int64)
    v = np.maximum(a[keep], b[keep]).astype(np.int64)
    edge_set = set(zip(u.tolist(), v.tolist()))
    ds = ray.data.from_arrow(pa.table({"u": u, "v": v})).repartition(5)
    edges = distinct_pairs(ds, n_buckets=8)
    got = triangle_count(edges, n_buckets=8).to_pandas()
    assert got["n_edges"].iloc[0] == len(edge_set)
    assert got["n_triangles"].iloc[0] == _brute_triangles(edge_set)


def test_wedges_are_ordered_neighbor_pairs(ray_session):
    # star at node 0 with leaves 1,2,3 → C(3,2)=3 wedges, all v<w
    ds = ray.data.from_arrow(pa.table({
        "u": pa.array([0, 0, 0], pa.int64()),
        "v": pa.array([3, 1, 2], pa.int64())}))
    w = wedges_from_edges(ds, n_buckets=4).to_pandas()
    got = sorted(map(tuple, w[["v", "w"]].values.tolist()))
    assert got == [(1, 2), (1, 3), (2, 3)]


def test_degree_orientation_same_count_on_hub_graph(ray_session):
    # hub 0 connected to all, plus a random sparse layer — degree
    # orientation must not change the count
    n_nodes = 40
    hub_u = np.zeros(n_nodes - 1, np.int64)
    hub_v = np.arange(1, n_nodes, dtype=np.int64)
    a = RNG.integers(1, n_nodes, 150)
    b = RNG.integers(1, n_nodes, 150)
    keep = a != b
    u = np.concatenate([hub_u, np.minimum(a[keep], b[keep])])
    v = np.concatenate([hub_v, np.maximum(a[keep], b[keep])])
    edge_set = set(zip(u.tolist(), v.tolist()))
    ds = ray.data.from_arrow(pa.table(
        {"u": u.astype(np.int64), "v": v.astype(np.int64)})).repartition(4)
    edges = distinct_pairs(ds, n_buckets=8)
    by_id = triangle_count(edges, n_buckets=8).to_pandas()
    by_deg = triangle_count(edges, n_buckets=8,
                            orient="degree").to_pandas()
    expect = _brute_triangles(edge_set)
    assert by_id["n_triangles"].iloc[0] == expect
    assert by_deg["n_triangles"].iloc[0] == expect


def test_triangle_count_empty_and_triangle_free(ray_session):
    # a path graph has zero triangles
    ds = ray.data.from_arrow(pa.table({
        "u": pa.array([1, 2, 3], pa.int64()),
        "v": pa.array([2, 3, 4], pa.int64())}))
    got = triangle_count(ds, n_buckets=4).to_pandas()
    assert got["n_triangles"].iloc[0] == 0 and got["n_edges"].iloc[0] == 3


def test_triangle_count_rejects_wide_ids(ray_session):
    """The fused closure key (lo << 32) | hi is only injective for ids in
    [0, 2^32); out-of-range ids must raise, not silently mis-count."""
    import pytest
    ds = ray.data.from_arrow(pa.table({
        "u": pa.array([1 << 32], pa.int64()),
        "v": pa.array([1], pa.int64())}))
    with pytest.raises(Exception, match="node ids"):
        triangle_count(ds, n_buckets=2).to_pandas()
