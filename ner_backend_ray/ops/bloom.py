"""Bloom-filter runtime prefilter + exact semi-join (SURVEY.md §2.4 joins).

The 100-TB pattern this implements is the *runtime filter*: a selective
predicate on a small-ish build side (e.g. "urgent orders") should prune the
probe side's rows BEFORE they enter any shuffle. Broadcasting the exact key
set works until the key set outgrows worker heaps; a Bloom filter is the
fixed-size stand-in — ``m`` bits summarize any number of keys with a tunable
false-positive rate, membership tests are vectorized, and per-block filter
partials combine by bitwise OR (associative, order-free), so the build is one
``map_batches`` pass plus a driver OR of ``blocks × m/8`` bytes.

A Bloom test admits false positives, so the semi-join stays EXACT by routing
only the (few) surviving probe rows through a bucket co-partition with the
distinct build keys and applying a per-bucket ``is_in`` — the Bloom pass cuts
the shuffle volume by ~the predicate's selectivity; the verify pass restores
set semantics. With a degenerate filter (m too small, 100 % fp) the result is
still correct, just unpruned — tests pin both properties.

Hashing: ``pd.util.hash_array`` (SipHash, fixed default key — identical in
every worker process) maps any key dtype to uint64; Kirsch–Mitzenmacher
double hashing derives the k probe positions from two mixes of that one hash.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .sketch import splitmix64


# Hard ceiling on the bitmap: 2^29 bits = 64 MiB. A runtime filter must stay
# broadcast-cheap — beyond ~50M build keys the asked-for fpp would need a
# bitmap too big to ship to every worker, so we cap m and let the REAL
# false-positive rate rise instead (correctness never depends on fpp; the
# verify pass restores exact semantics, the filter just prunes less).
_MAX_M_BITS = 1 << 29


def bloom_params(n_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """Standard sizing: m = -n·ln(p)/ln(2)², k = (m/n)·ln(2); m is rounded up
    to a multiple of 64 so the bitmap packs into whole words, and capped at
    ``_MAX_M_BITS`` (k re-derived for the capped m/n, so the filter stays
    optimal for the size it actually gets)."""
    if not 0 < fpp < 1:
        raise ValueError("fpp must be in (0, 1)")
    n = max(1, int(n_keys))
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = min((m + 63) & ~63, _MAX_M_BITS)
    k = max(1, int(round(m / n * math.log(2))))
    return m, k


def _positions(col: pa.ChunkedArray | pa.Array | np.ndarray,
               m_bits: int, k: int) -> np.ndarray:
    """(len(col), k) bit positions via double hashing over one SipHash pass."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vals = col.to_numpy(zero_copy_only=False) if isinstance(col, pa.Array) \
        else np.asarray(col)
    h1 = pd.util.hash_array(vals, categorize=False)
    h2 = splitmix64(h1) | np.uint64(1)  # odd → full-period stride
    i = np.arange(k, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return ((h1[:, None] + i[None, :] * h2[:, None])
                % np.uint64(m_bits)).astype(np.int64)


def _local_bitmap(col, m_bits: int, k: int) -> np.ndarray:
    bits = np.zeros(m_bits, np.uint8)
    if len(col):
        bits[_positions(col, m_bits, k).ravel()] = 1
    return np.packbits(bits)


def bloom_build(keys: ray.data.Dataset, key: str,
                m_bits: int, k: int, fan_in: int = 32) -> np.ndarray:
    """Fold a key column into one packed bitmap. Each block emits its m/8-byte
    partial; partials OR-combine in distributed tree rounds of ``fan_in``
    until few enough remain for one driver pass, so driver traffic is
    O(fan_in · m/8) bytes however many blocks the scan produced (a flat
    driver OR would pull blocks × m/8 — gigabytes at 100-TB scan widths).
    Only bitmap bytes leave the workers — the build never collects keys."""

    def fold(batch: pa.Table) -> pa.Table:
        bm = _local_bitmap(batch[key], m_bits, k)
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary())})

    def or_batch(batch: pa.Table) -> pa.Table:
        acc = np.zeros(m_bits // 8, np.uint8)
        for bm in batch["bm"]:
            acc |= np.frombuffer(bm.as_py(), np.uint8)
        return pa.table({"bm": pa.array([acc.tobytes()], pa.binary())})

    # materialize before each count(): on a lazy plan every count() would
    # RE-EXECUTE the whole upstream scan+fold per tree round. The partials
    # are m/8-byte rows — cheap to pin in the object store.
    parts = keys.map_batches(fold, batch_format="pyarrow").materialize()
    n_parts = parts.count()
    while n_parts > fan_in:
        parts = (parts.repartition(max(1, -(-n_parts // fan_in)))
                 .map_batches(or_batch, batch_format="pyarrow",
                              batch_size=None).materialize())
        n_parts = parts.count()

    out = np.zeros(m_bits // 8, np.uint8)
    for row in parts.take_all():
        out |= np.frombuffer(row["bm"], np.uint8)
    return out


def bloom_might_contain(bitmap: np.ndarray, col,
                        m_bits: int, k: int) -> np.ndarray:
    """Vectorized membership mask: True iff all k probed bits are set (no
    false negatives; false-positive rate set by bloom_params)."""
    if not hasattr(col, "__len__") or not len(col):
        return np.zeros(0, bool)
    pos = _positions(col, m_bits, k)
    bits = np.unpackbits(bitmap)
    return bits[pos].all(axis=1)


def _prepared_build(probe: ray.data.Dataset, probe_key: str,
                    build: ray.data.Dataset, build_key: str,
                    n_build_keys: int, fpp: float):
    """Shared semi/anti front end: pin the build key to the probe key's Arrow
    type (hash_array is dtype-sensitive — an int32 build key and int64 probe
    key hash differently, turning fp-free misses into FALSE NEGATIVES), build
    the Bloom bitmap, and broadcast it once via ray.put."""
    pschema = probe.schema()
    pcols = list(pschema.names)
    ptypes = [pschema.types[i] for i in range(len(pcols))]
    ktype = ptypes[pcols.index(probe_key)]

    def cast_key(batch: pa.Table) -> pa.Table:
        idx = batch.column_names.index(build_key)
        return batch.set_column(idx, build_key, batch[build_key].cast(ktype))

    # the build side is consumed twice (bitmap build + bucket verify); the
    # runtime-filter pattern assumes it is the small side, so pin it once
    # instead of re-running its scan+filter per consumer
    build = build.map_batches(cast_key, batch_format="pyarrow").materialize()
    m_bits, k = bloom_params(n_build_keys, fpp)
    bm_ref = ray.put(bloom_build(build, build_key, m_bits, k))
    return build, bm_ref, m_bits, k, pcols, ptypes


def _bucket_verify(survivors: ray.data.Dataset, build: ray.data.Dataset,
                   probe_key: str, build_key: str,
                   pcols: list, ptypes: list, n_buckets: int,
                   anti: bool) -> ray.data.Dataset:
    """Bucket co-partition the Bloom survivors with the distinct build keys
    and apply a per-bucket ``is_in`` (semi) / ``NOT is_in`` (anti) — exactness
    restored over only the rows the filter could not decide."""
    from .joins import _bucket_of

    def tag(side: str, keycol: str):
        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {name: (batch[name].cast(typ) if name in batch.column_names
                           else pa.nulls(n, typ))
                    for name, typ in zip(pcols, ptypes)}
            out = pa.table(cols)
            if side == "r":  # build keys ride in the probe-key column
                out = out.set_column(pcols.index(probe_key), probe_key,
                                     batch[keycol].cast(
                                         ptypes[pcols.index(probe_key)]))
            return (out
                    .append_column("__bucket",
                                   _bucket_of(out[probe_key], n_buckets))
                    .append_column("__side", pa.array([side] * n)))
        return f

    combined = survivors.map_batches(tag("l", probe_key),
                                     batch_format="pyarrow").union(
        build.map_batches(tag("r", build_key), batch_format="pyarrow"))

    def verify(g: pa.Table) -> pa.Table:
        side = g["__side"]
        lpt = g.filter(pc.equal(side, "l")).select(pcols)
        rkeys = g.filter(pc.equal(side, "r"))[probe_key].unique()
        hit = pc.is_in(lpt[probe_key], value_set=rkeys)
        return lpt.filter(pc.invert(hit) if anti else hit)

    return combined.groupby("__bucket").map_groups(verify,
                                                   batch_format="pyarrow")


def bloom_semi_join(probe: ray.data.Dataset, probe_key: str,
                    build: ray.data.Dataset, build_key: str,
                    n_build_keys: int, fpp: float = 0.01,
                    n_buckets: int = 32) -> ray.data.Dataset:
    """Exact semi-join ``probe ⋉ build``: Bloom prefilter (no shuffle) then a
    bucket co-partitioned ``is_in`` verify over the survivors only.

    ``n_build_keys`` sizes the filter (an estimate is fine — a low guess only
    raises the false-positive rate, never costs correctness). The verify pass
    reuses the bucket-hash plan from :func:`ops.joins.bucket_hash_join` but
    with a distinct-keys + ``is_in`` kernel, so probe rows are never
    multiplied by duplicate build keys — true semi semantics."""
    build, bm_ref, m_bits, k, pcols, ptypes = _prepared_build(
        probe, probe_key, build, build_key, n_build_keys, fpp)

    def prefilter(batch: pa.Table) -> pa.Table:
        mask = bloom_might_contain(ray.get(bm_ref), batch[probe_key],
                                   m_bits, k)
        return batch.filter(pa.array(mask))

    survivors = probe.map_batches(prefilter, batch_format="pyarrow")
    return _bucket_verify(survivors, build, probe_key, build_key,
                          pcols, ptypes, n_buckets, anti=False)


def bloom_anti_join(probe: ray.data.Dataset, probe_key: str,
                    build: ray.data.Dataset, build_key: str,
                    n_build_keys: int, fpp: float = 0.01,
                    n_buckets: int = 32) -> ray.data.Dataset:
    """Exact anti-join ``probe ▷ build`` (rows of probe whose key appears in
    no build row): a Bloom miss proves NON-membership, so rows rejected by
    the filter are final anti matches and never enter a shuffle; only the
    (few, for a selective build side) Bloom hits route through the bucket
    co-partitioned ``NOT is_in`` verify. Result = definite-miss branch ∪
    verified-survivor branch.

    Plan-shape note for 100-TB probes: the two branches are two consumers of
    ``probe``, so a lazy upstream scan executes twice — column-pruned reads,
    no shuffle on the definite branch. The alternative (one scan, every probe
    row through the bucket shuffle) moves the full probe through the object
    store; re-reading pruned columns from storage is the cheaper side of that
    trade, and callers holding a tiny probe can ``materialize()`` it first."""
    build, bm_ref, m_bits, k, pcols, ptypes = _prepared_build(
        probe, probe_key, build, build_key, n_build_keys, fpp)

    def split(keep_hits: bool):
        def f(batch: pa.Table) -> pa.Table:
            mask = bloom_might_contain(ray.get(bm_ref), batch[probe_key],
                                       m_bits, k)
            return batch.filter(pa.array(mask if keep_hits else ~mask))
        return f

    definite = probe.map_batches(split(False), batch_format="pyarrow")
    survivors = probe.map_batches(split(True), batch_format="pyarrow")
    verified = _bucket_verify(survivors, build, probe_key, build_key,
                              pcols, ptypes, n_buckets, anti=True)
    return definite.union(verified)
