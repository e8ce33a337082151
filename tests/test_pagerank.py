"""Integer PageRank fixpoint loop (ops/pagerank.py) vs brute force."""

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ner_backend_ray.ops.pagerank import pagerank_int

RNG = np.random.default_rng(23)


def brute_pagerank_int(src, dst, n_iters, scale_total=10**12):
    nodes = np.unique(np.concatenate([src, dst]))
    init = scale_total // len(nodes)
    base = (15 * init) // 100
    rank = {int(n): init for n in nodes}
    outdeg = {}
    for s in src:
        outdeg[int(s)] = outdeg.get(int(s), 0) + 1
    for _ in range(n_iters):
        sums = {}
        for s, d in zip(src, dst):
            sums[int(d)] = sums.get(int(d), 0) + rank[int(s)] // outdeg[int(s)]
        rank = {int(n): base + (85 * sums.get(int(n), 0)) // 100
                for n in nodes}
    return rank


def _run(src, dst, n_iters, **kw):
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64())})).repartition(5)
    out = pagerank_int(edges, n_iters=n_iters, **kw).to_pandas()
    return dict(zip(out["node"].astype(int), out["rank"].astype(int)))


def test_pagerank_matches_bruteforce_random_graph(ray_session):
    n, m = 120, 900
    src = RNG.integers(0, n, m).astype(np.int64)
    dst = RNG.integers(0, n, m).astype(np.int64)
    got = _run(src, dst, n_iters=3, n_buckets=7)
    exp = brute_pagerank_int(src, dst, 3)
    assert got == exp


def test_pagerank_sources_sinks_and_multiedges(ray_session):
    # 0 -> 1 (twice, multi-edge), 1 -> 2, 3 is a pure source, 2 a pure sink
    src = np.array([0, 0, 1, 3], np.int64)
    dst = np.array([1, 1, 2, 0], np.int64)
    got = _run(src, dst, n_iters=4)
    exp = brute_pagerank_int(src, dst, 4)
    assert got == exp
    # a pure source converges to base rank
    scale = 10**12
    init = scale // 4
    assert got[3] == (15 * init) // 100
