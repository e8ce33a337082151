"""Empty-input robustness across the op library.

The sf0.1 sweep caught one real bug of this class (an all-empty Dataset
losing its schema in to_pandas); this file pins the rest of the op surface
against zero-row inputs — each op must return a typed, zero-row result, not
raise and not degrade to a schemaless frame.
"""

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ner_backend_ray.ops.bloom import bloom_anti_join, bloom_semi_join
from ner_backend_ray.ops.dedup import dedup_exact
from ner_backend_ray.ops.joins import bucket_hash_join
from ner_backend_ray.ops.reshape import melt, pivot_counts
from ner_backend_ray.ops.sampling import hash_split, stratified_sample
from ner_backend_ray.ops.setops import distinct_except, distinct_intersect
from ner_backend_ray.ops.window import partitioned_running, tumbling_window


def _empty(schema: dict) -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.table({k: pa.array([], t) for k, t in schema.items()}))


def _ids(n=10):
    return ray.data.from_arrow(
        pa.table({"k": pa.array(range(n), pa.int64())}))


def test_joins_with_empty_sides(ray_session):
    import pytest

    full = _ids()
    emptyr = _empty({"k": pa.int64(), "v": pa.int64()})
    out = bucket_hash_join(full, emptyr, "k", n_buckets=4)
    assert out.count() == 0
    left = bucket_hash_join(full, emptyr, "k", n_buckets=4, how="left")
    df = left.to_pandas()
    assert len(df) == 10 and df["v"].isna().all()
    # a post-map empty dataset is SCHEMALESS in Ray — the join cannot plan
    # an output schema and must say so, not die on an AttributeError
    schemaless = emptyr.map_batches(lambda b: b, batch_format="pyarrow")
    with pytest.raises(ValueError, match="schema"):
        bucket_hash_join(full, schemaless, "k", n_buckets=4)


def test_bloom_joins_with_empty_build(ray_session):
    probe = _ids()
    build = _empty({"bk": pa.int64()})
    assert bloom_semi_join(probe, "k", build, "bk", n_build_keys=1).count() == 0
    assert sorted(bloom_anti_join(probe, "k", build, "bk",
                                  n_build_keys=1).to_pandas()["k"]) == list(range(10))


def test_scalar_ops_on_empty_input(ray_session):
    docs = _empty({"doc_id": pa.int64(), "text": pa.string()})
    assert dedup_exact(docs).count() == 0
    ids = _empty({"k": pa.int64()})
    assert hash_split(ids, "k").count() == 0
    g = _empty({"g": pa.string(), "k": pa.int64()})
    assert stratified_sample(g, "g", "k", k=3).count() == 0
    ev = _empty({"ts": pa.int64(), "event_type": pa.string(),
                 "value": pa.float64()})
    assert tumbling_window(ev).count() == 0
    run = _empty({"key": pa.int64(), "o": pa.int64(), "v": pa.int64()})
    assert partitioned_running(run, "key", ["o"], "v").count() == 0


def test_reshape_and_setops_on_empty_input(ray_session):
    e = _empty({"day": pa.string(), "ev": pa.string()})
    assert pivot_counts(e, "day", "ev", ["x"]).count() == 0
    w = _empty({"day": pa.string(), "x": pa.int64()})
    assert melt(w, ["day"], ["x"]).count() == 0
    a = _empty({"k": pa.int64()})
    b = _ids(3)
    assert distinct_intersect(a, b, ["k"]).count() == 0
    assert distinct_except(a, b, ["k"]).count() == 0
    # non-empty EXCEPT empty keeps everything
    assert sorted(distinct_except(b, a, ["k"]).to_pandas()["k"]) == [0, 1, 2]
