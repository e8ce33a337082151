"""Integer-exact Lloyd's k-means (ops/kmeans.py) vs brute force."""

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ner_backend_ray.ops.kmeans import kmeans_int

RNG = np.random.default_rng(41)
QUANT = 10**6


def brute_kmeans(vecs, ids, k, n_iters):
    x = np.floor(np.asarray(vecs, np.float64) * QUANT + 0.5).astype(np.int64)
    seed_order = np.argsort(ids[ids < k])
    cents = x[ids < k][seed_order]
    cids = np.sort(ids[ids < k]).astype(np.int64)

    def assign(c, cidv):
        dd = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return cidv[np.argmin(dd, axis=1)]

    for _ in range(n_iters):
        a = assign(cents, cids)
        new_c, new_ids = [], []
        for cid in np.unique(a):
            sub = x[a == cid]
            s, n = sub.sum(axis=0), len(sub)
            mod = ((s % n) + n) % n
            new_c.append((s - mod) // n)
            new_ids.append(cid)
        cents = np.array(new_c, np.int64)
        cids = np.array(new_ids, np.int64)
    return dict(zip(ids.tolist(), assign(cents, cids).tolist()))


def _run(vecs, ids, k, n_iters):
    t = pa.table({"vid": pa.array(ids, pa.int64()),
                  "v": pa.array([list(map(float, r)) for r in vecs],
                                pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(t).repartition(4)
    out = kmeans_int(ds, "v", "vid", k=k, n_iters=n_iters).to_pandas()
    return dict(zip(out["vid"].astype(int), out["cid"].astype(int)))


def test_kmeans_matches_bruteforce(ray_session):
    n, d, k = 300, 8, 4
    vecs = RNG.normal(0, 0.3, (n, d)).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    got = _run(vecs, ids, k, n_iters=2)
    exp = brute_kmeans(vecs, ids, k, 2)
    assert got == exp
    assert len(set(got.values())) > 1  # clustering actually happened


def test_kmeans_duplicate_seeds_drop_empty_cluster(ray_session):
    # seeds 0 and 1 identical → every point ties to the LOWER cid, cluster 1
    # empties after iteration 1 and must vanish identically on both paths
    vecs = np.array([[0.0, 0.0], [0.0, 0.0], [1.0, 1.0],
                     [0.1, 0.0], [0.9, 1.0]], np.float32)
    ids = np.arange(5, dtype=np.int64)
    got = _run(vecs, ids, k=3, n_iters=2)
    exp = brute_kmeans(vecs, ids, 3, 2)
    assert got == exp
    assert 1 not in set(got.values())
