"""Multimodal (binary-column) plumbing: decode / feature-extract / resize /
frame-sample as actor-pool map_batches stages.

Media columns are opaque ``binary`` with typed metadata, exactly like the pages
``html`` column. The image/audio codecs are not available in this environment, so
the decode kernels are STUBBED behind ``deterministic_fake=True`` (a seeded,
content-derived fake that keeps schemas, batch shapes and actor signatures real
and testable) or raise NotImplementedError when a real codec is requested. The
Ray-side plumbing — small batch sizes for wide binary rows, actor-pool state,
list<float>/fixed-shape outputs — is the part that matters at scale and is real.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

IMAGE_META = pa.struct([("width", pa.int32()), ("height", pa.int32()),
                        ("format", pa.string())])


def _content_rng(data: bytes) -> np.random.Generator:
    seed = int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")
    return np.random.default_rng(seed)


class DecodeImage:
    """Actor stage: binary → (height, width, embedding). Real codecs (PIL/cv2)
    load in __init__ once per actor when available."""

    def __init__(self, embedding_dim: int = 16, deterministic_fake: bool = True):
        if not deterministic_fake:
            raise NotImplementedError(
                "no image codec in this environment; pass deterministic_fake=True")
        self.dim = embedding_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, embs = [], [], []
        for data in batch["data"].to_pylist():
            rng = _content_rng(data or b"")
            widths.append(int(rng.integers(64, 1920)))
            heights.append(int(rng.integers(64, 1080)))
            embs.append(rng.standard_normal(self.dim).astype(np.float32).tolist())
        return (batch.drop_columns(["data"])
                .append_column("width", pa.array(widths, pa.int32()))
                .append_column("height", pa.array(heights, pa.int32()))
                .append_column("embedding", pa.array(embs, pa.list_(pa.float32()))))


class SampleFrames:
    """Actor stage: video binary → n evenly-spaced frame payloads (fake: content-
    derived byte slices), preserving the (id, frame_idx, frame) explosion shape."""

    def __init__(self, n_frames: int = 4, deterministic_fake: bool = True):
        if not deterministic_fake:
            raise NotImplementedError("no video codec in this environment")
        self.n = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        for vid, data in zip(batch["id"].to_pylist(), batch["data"].to_pylist()):
            data = data or b""
            step = max(1, len(data) // self.n)
            for f in range(self.n):
                ids.append(vid)
                idxs.append(f)
                frames.append(data[f * step:(f + 1) * step][:256])
        return pa.table({"id": pa.array(ids), "frame_idx": pa.array(idxs, pa.int32()),
                         "frame": pa.array(frames, pa.binary())})
