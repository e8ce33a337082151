"""Ordered funnel (ops/funnel.py) vs a per-user brute force."""

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ner_backend_ray.ops.funnel import funnel_counts

RNG = np.random.default_rng(41)

STAGES = ["a", "b", "c"]


def _brute(users, ts, types):
    counts = dict.fromkeys(STAGES, 0)
    for u in np.unique(users):
        m = users == u
        evs = sorted(zip(ts[m], types[m]))
        done = -np.inf
        for si, stage in enumerate(STAGES):
            nxt = [t for t, ty in evs if ty == stage and t > done]
            if not nxt:
                break
            done = min(nxt)
            counts[stage] += 1
    return counts


def test_funnel_matches_brute_force(ray_session):
    n = 4_000
    users = RNG.integers(0, 200, n).astype(np.int64)
    ts = RNG.integers(0, 1_000, n).astype(np.int64)
    types = RNG.choice(np.array(STAGES + ["x"], dtype=object), n)
    ds = ray.data.from_arrow(pa.table({
        "user_id": users, "ts": ts, "event_type": types})).repartition(7)
    got = dict(zip(*[funnel_counts(ds, STAGES, n_buckets=8)
                     .to_pandas()[c] for c in ("stage", "n_users")]))
    assert got == _brute(users, ts, types)


def test_funnel_with_gap_matches_brute_force(ray_session):
    n, gap = 3_000, 30
    users = RNG.integers(0, 150, n).astype(np.int64)
    ts = RNG.integers(0, 800, n).astype(np.int64)
    types = RNG.choice(np.array(STAGES + ["x"], dtype=object), n)
    ds = ray.data.from_arrow(pa.table({
        "user_id": users, "ts": ts, "event_type": types})).repartition(6)
    got = dict(zip(*[funnel_counts(ds, STAGES, max_gap=gap, n_buckets=8)
                     .to_pandas()[c] for c in ("stage", "n_users")]))
    counts = dict.fromkeys(STAGES, 0)
    for u in np.unique(users):
        m = users == u
        evs = sorted(zip(ts[m], types[m]))
        done, first = -np.inf, True
        for stage in STAGES:
            nxt = [t for t, ty in evs if ty == stage and t > done
                   and (first or t <= done + gap)]
            if not nxt:
                break
            done, first = min(nxt), False
            counts[stage] += 1
    assert got == counts


def test_funnel_strict_order_and_ties(ray_session):
    # same-timestamp b does NOT advance past a; later b does
    t = pa.table({"user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
                  "ts": pa.array([10, 10, 20, 10, 10], pa.int64()),
                  "event_type": ["a", "b", "b", "a", "b"]})
    got = dict(zip(*[funnel_counts(ray.data.from_arrow(t), ["a", "b"],
                                   n_buckets=4)
                     .to_pandas()[c] for c in ("stage", "n_users")]))
    assert got == {"a": 2, "b": 1}
