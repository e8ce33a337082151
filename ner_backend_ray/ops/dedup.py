"""Deduplication operators over a document table.

All operators are Ray-Data-native and shuffle-frugal:

- **exact**: content hash per batch (vectorized) → groupby(hash) → keep first
  (min id). The groupby moves only (hash, id) pairs, never document text.
- **minhash-LSH near-dup**: shingle → k minhashes → band → (band, band_hash, id)
  rows → groupby bands → candidate pairs → verified Jaccard → min-label
  union-find. Same machinery as the KG canonicalization stage.
- **simhash**: 64-bit simhash over token hashes; near-dups = identical simhash
  prefix buckets with Hamming distance <= t verification.
- **n-gram Jaccard**: exact verification kernel used by the LSH pipelines.
- **embedding near-dup**: cosine >= threshold within LSH (random hyperplane)
  buckets.

At 10^12-document scale each stage stays a map_batches (per-batch vectorized) +
one groupby on small derived rows; document payloads never pass a shuffle.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


# ------------------------------- exact dedup -------------------------------

def add_content_hash(batch: pa.Table, text_col: str = "text",
                     out_col: str = "content_hash") -> pa.Table:
    hashes = [hashlib.md5(t.encode("utf-8")).hexdigest()
              for t in batch[text_col].to_pylist()]
    return batch.append_column(out_col, pa.array(hashes, pa.string()))


def dedup_exact(docs: ray.data.Dataset, id_col: str = "doc_id",
                text_col: str = "text") -> ray.data.Dataset:
    """Returns one (id) row per distinct text — the min id of each hash group
    (hash-partition + per-group first; SURVEY.md §2.7 D4 pattern)."""
    from ray.data.aggregate import Min
    hashed = docs.map_batches(
        lambda b: add_content_hash(b, text_col).select(["content_hash", id_col]),
        batch_format="pyarrow")
    return (hashed.groupby("content_hash")
            .aggregate(Min(id_col, alias_name=id_col))
            .select_columns([id_col]))


# ----------------------------- shingles / jaccard -----------------------------

def ngram_set(text: str, n: int = 3) -> set[bytes]:
    b = text.lower().encode("utf-8")
    if len(b) <= n:
        return {b}
    return {b[i:i + n] for i in range(len(b) - n + 1)}


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    sa, sb = ngram_set(a, n), ngram_set(b, n)
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter) if inter else 0.0


# ------------------------------ MinHash-LSH ------------------------------

def minhash_sig(text: str, k: int = 64) -> np.ndarray:
    grams = ngram_set(text)
    sig = np.empty(k, dtype=np.uint32)
    for i in range(k):
        salt = b"d%d\x00" % i
        sig[i] = min(zlib.crc32(salt + g) for g in grams)
    return sig


def dedup_minhash_lsh(docs: ray.data.Dataset, id_col: str = "doc_id",
                      text_col: str = "text", k: int = 64, bands: int = 16,
                      jaccard_threshold: float = 0.8) -> dict[int, int]:
    """Near-duplicate clustering: returns {doc_id → root_doc_id} for every doc in
    a near-dup cluster (absent → unique). The returned map covers only clustered
    docs; callers broadcast it to filter."""
    rows_per_band = k // bands

    def band_rows(batch: pa.Table) -> pa.Table:
        # documents never pass the shuffle — only (id, band, band_hash, signature)
        # rows; candidate verification estimates Jaccard from full signatures.
        ids, band_ids, band_hashes, sigs = [], [], [], []
        for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            sig = minhash_sig(t, k)
            sb = sig.tobytes()
            for b in range(bands):
                chunk = sig[b * rows_per_band:(b + 1) * rows_per_band]
                ids.append(i)
                band_ids.append(b)
                band_hashes.append(zlib.crc32(chunk.tobytes()))
                sigs.append(sb)
        return pa.table({id_col: pa.array(ids), "band": pa.array(band_ids, pa.int32()),
                         "band_hash": pa.array(band_hashes, pa.int64()),
                         "sig": pa.array(sigs, pa.binary())})

    def bucket_pairs(group: pa.Table) -> pa.Table:
        items = sorted({(i, s) for i, s in zip(group[id_col].to_pylist(),
                                               group["sig"].to_pylist())})
        out_a, out_b = [], []
        if 1 < len(items) <= 512:
            sigs = [np.frombuffer(s, dtype=np.uint32) for _, s in items]
            for i in range(len(items)):
                for j in range(i + 1, len(items)):
                    est = float(np.mean(sigs[i] == sigs[j]))
                    if est >= jaccard_threshold:
                        out_a.append(items[j][0])
                        out_b.append(items[i][0])
        return pa.table({"child": pa.array(out_a, pa.int64()),
                         "root": pa.array(out_b, pa.int64())})

    pairs = (docs.map_batches(band_rows, batch_format="pyarrow")
             .groupby(["band", "band_hash"])
             .map_groups(bucket_pairs, batch_format="pyarrow")
             .take_all())

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for r in pairs:
        a, b = find(int(r["child"])), find(int(r["root"]))
        if a != b:
            lo, hi = min(a, b), max(a, b)
            parent[hi] = lo
    return {k_: find(k_) for k_ in parent}


# -------------------------------- SimHash --------------------------------

def simhash64(text: str) -> int:
    acc = np.zeros(64, dtype=np.int64)
    for tok in text.lower().split():
        h = int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "little")
        for bit in range(64):
            acc[bit] += 1 if (h >> bit) & 1 else -1
    out = 0
    for bit in range(64):
        if acc[bit] > 0:
            out |= 1 << bit
    return out


def add_simhash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    vals = [simhash64(t) for t in batch[text_col].to_pylist()]
    return batch.append_column("simhash", pa.array(np.array(vals, dtype=np.uint64)))


def simhash_near_dups(docs: ray.data.Dataset, id_col: str = "doc_id",
                      text_col: str = "text", max_hamming: int = 3) -> list[tuple[int, int]]:
    """Candidate near-dup pairs: bucket by each of 4 16-bit simhash blocks (any
    pair within Hamming<=3 shares at least one intact block), verify Hamming."""
    def block_rows(batch: pa.Table) -> pa.Table:
        ids, blocks, keys, sims = [], [], [], []
        for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            sh = simhash64(t)
            for blk in range(4):
                ids.append(i)
                blocks.append(blk)
                keys.append((sh >> (blk * 16)) & 0xFFFF)
                sims.append(sh)
        return pa.table({id_col: pa.array(ids), "block": pa.array(blocks, pa.int32()),
                         "key": pa.array(keys, pa.int64()),
                         "simhash": pa.array(np.array(sims, dtype=np.uint64))})

    def verify(group: pa.Table) -> pa.Table:
        items = sorted(set(zip(group[id_col].to_pylist(),
                               [int(x) for x in group["simhash"].to_pylist()])))
        a_out, b_out = [], []
        if 1 < len(items) <= 512:
            for i in range(len(items)):
                for j in range(i + 1, len(items)):
                    if bin(items[i][1] ^ items[j][1]).count("1") <= max_hamming:
                        a_out.append(items[i][0])
                        b_out.append(items[j][0])
        return pa.table({"a": pa.array(a_out, pa.int64()),
                         "b": pa.array(b_out, pa.int64())})

    rows = (docs.map_batches(block_rows, batch_format="pyarrow")
            .groupby(["block", "key"])
            .map_groups(verify, batch_format="pyarrow")
            .take_all())
    return sorted({(min(r["a"], r["b"]), max(r["a"], r["b"])) for r in rows})


# --------------------------- embedding near-dup ---------------------------

def embedding_near_dups(embs: ray.data.Dataset, id_col: str = "vec_id",
                        vec_col: str = "embedding", n_planes: int = 12,
                        cos_threshold: float = 0.95, seed: int = 7) -> list[tuple[int, int]]:
    """Cosine near-dup pairs via random-hyperplane LSH buckets + exact verify.
    The hyperplanes are broadcast; only (bucket, id, vec) rows shuffle."""
    rng = np.random.default_rng(seed)

    def bucket(batch: pa.Table) -> pa.Table:
        vecs = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
        dim = vecs.shape[1]
        planes = np.random.default_rng(seed).standard_normal((dim, n_planes))
        signs = (vecs @ planes) > 0
        keys = signs.dot(1 << np.arange(n_planes)).astype(np.int64)
        return pa.table({id_col: batch[id_col],
                         "bucket": pa.array(keys),
                         vec_col: batch[vec_col]})

    def verify(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_pylist()
        vecs = np.array(group[vec_col].to_pylist(), dtype=np.float64)
        a_out, b_out = [], []
        if 1 < len(ids) <= 2048:
            norms = np.linalg.norm(vecs, axis=1)
            norms[norms == 0] = 1.0
            nv = vecs / norms[:, None]
            sims = nv @ nv.T
            ii, jj = np.where(np.triu(sims >= cos_threshold, k=1))
            for i, j in zip(ii, jj):
                a, b = ids[i], ids[j]
                a_out.append(min(a, b))
                b_out.append(max(a, b))
        return pa.table({"a": pa.array(a_out, pa.int64()),
                         "b": pa.array(b_out, pa.int64())})

    rows = (embs.map_batches(bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(verify, batch_format="pyarrow")
            .take_all())
    return sorted({(r["a"], r["b"]) for r in rows})
