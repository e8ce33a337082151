"""BFS levels (ops/bfs.py::bfs_levels) vs a driver-side reference BFS."""

import collections

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ner_backend_ray.ops.bfs import bfs_levels

RNG = np.random.default_rng(11)


def _reference_bfs(edge_list, sources, k):
    adj = collections.defaultdict(list)
    for s, d in edge_list:
        adj[s].append(d)
    dist = {s: 0 for s in sources}
    frontier = set(sources)
    for level in range(1, k + 1):
        nxt = set()
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = level
                    nxt.add(v)
        frontier = nxt
    return dist


def test_bfs_levels_matches_reference(ray_session):
    n_nodes, n_edges, k = 300, 1_500, 3
    src = RNG.integers(0, n_nodes, n_edges).astype(np.int64)
    dst = RNG.integers(0, n_nodes, n_edges).astype(np.int64)
    sources = [0, 1, 2]
    edges = ray.data.from_arrow(
        pa.table({"src": src, "dst": dst})).repartition(7)
    seed = ray.data.from_arrow(
        pa.table({"node": pa.array(sources, pa.int64())}))
    got = bfs_levels(edges, seed, n_iters=k, n_buckets=8).to_pandas()
    expect = _reference_bfs(zip(src.tolist(), dst.tolist()), sources, k)
    assert dict(zip(got["node"], got["dist"])) == expect


def test_bfs_levels_duplicate_sources_and_edges(ray_session):
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([1, 1, 2, 2], pa.int64()),
        "dst": pa.array([2, 2, 3, 3], pa.int64())}))
    seed = ray.data.from_arrow(
        pa.table({"node": pa.array([1, 1], pa.int64())})).repartition(2)
    got = bfs_levels(edges, seed, n_iters=2, n_buckets=4).to_pandas()
    assert dict(zip(got["node"], got["dist"])) == {1: 0, 2: 1, 3: 2}
