"""Multimodal (binary-column) stages: decode / feature-extract / resize /
frame-sample as actor-pool map_batches stages.

Media columns are opaque ``binary`` with typed metadata, exactly like the
pages ``html`` column. Round 1 stubbed every kernel; these are now REAL
pure-Python/numpy codecs for the formats that need no external library:

- images: PPM (P6) / PGM (P5) and uncompressed 24-bit BMP → numpy pixels,
  real width/height/mean-channel features and a 16-dim downsampled-grayscale
  embedding (content-derived, comparable under cosine);
- audio: RIFF/WAV PCM via the stdlib ``wave`` module → duration, RMS,
  zero-crossing rate, spectral centroid (np.fft);
- video: a concatenated-PPM stream (the standard trick for piping raw video
  frames, e.g. ppmtoy4m-style pipelines) → parsed frame boundaries, evenly
  spaced frame sampling.

JPEG/PNG/MP4 need entropy codecs this container does not ship; those inputs
fall back to a clearly-flagged deterministic content-derived fake
(``allow_fake=True``, the round-1 behavior) or raise ValueError so failures
route to a ``failed`` status column — never a silent wrong answer.

Scale shape: one decoded image is ~W·H·3 bytes, so ``batch_size`` must be
small (tens) and ``concurrency × batch × payload`` sized to worker heap; the
stages are callable classes for ``map_batches(Cls, concurrency=N, ...)`` so
any per-actor model state loads once.
"""

from __future__ import annotations

import hashlib
import io

import numpy as np
import pyarrow as pa

IMAGE_META = pa.struct([("width", pa.int32()), ("height", pa.int32()),
                        ("format", pa.string())])


# ----------------------------- image codecs -----------------------------

def _parse_pnm_header(data: bytes) -> tuple[str, int, int, int, int]:
    """(magic, width, height, maxval, header_end) for P5/P6; ValueError else."""
    if data[:2] not in (b"P5", b"P6"):
        raise ValueError("not a P5/P6 PNM")
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(data) and data[i:i + 1].isspace():
            i += 1
        if data[i:i + 1] == b"#":  # comment to end of line
            while i < len(data) and data[i:i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(data) and not data[j:j + 1].isspace():
            j += 1
        fields.append(int(data[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    return data[:2].decode(), fields[0], fields[1], fields[2], i


def decode_ppm(data: bytes) -> np.ndarray:
    """P6 → (H, W, 3) uint8; P5 → (H, W) uint8."""
    magic, w, h, maxval, off = _parse_pnm_header(data)
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    ch = 3 if magic == "P6" else 1
    need = w * h * ch
    pix = np.frombuffer(data, dtype=np.uint8, count=need, offset=off)
    return pix.reshape(h, w, 3) if ch == 3 else pix.reshape(h, w)


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP → (H, W, 3) uint8 (RGB)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    pix_off = int.from_bytes(data[10:14], "little")
    hdr = int.from_bytes(data[14:18], "little")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    comp = int.from_bytes(data[30:34], "little")
    if hdr < 40 or bpp != 24 or comp != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    flip = h > 0  # positive height = bottom-up row order
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h,
                         offset=pix_off).reshape(h, stride)
    img = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return img[::-1] if flip else img


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → P6 bytes (round-trip partner for tests/pipelines)."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(img).tobytes()


def decode_image(data: bytes) -> np.ndarray:
    """Magic-byte dispatch → pixel array; ValueError on unknown formats."""
    if data[:2] in (b"P5", b"P6"):
        return decode_ppm(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    raise ValueError("unsupported image format (PPM/PGM/BMP only)")


def image_embedding(img: np.ndarray, grid: int = 4) -> np.ndarray:
    """Real content embedding: grayscale, nearest-resample to grid×grid,
    mean-centered and L2-normalized → grid² float32s."""
    gray = img.mean(axis=2) if img.ndim == 3 else img.astype(np.float64)
    h, w = gray.shape
    ys = (np.arange(grid) * h) // grid
    xs = (np.arange(grid) * w) // grid
    cell = gray[ys][:, xs].astype(np.float64).ravel()
    cell -= cell.mean()
    norm = np.linalg.norm(cell)
    return (cell / norm if norm else cell).astype(np.float32)


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize — pure numpy fancy-indexing, no codec needed."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return img[ys][:, xs]


def _content_rng(data: bytes) -> np.random.Generator:
    seed = int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")
    return np.random.default_rng(seed)


class DecodeImage:
    """Actor stage: binary → (width, height, format, mean_lum, embedding).

    Real decode for PPM/PGM/BMP. Unknown formats: with ``allow_fake=True`` a
    content-derived deterministic fake keeps the pipeline flowing (flagged by
    format="fake"); otherwise the row routes to format="error" with nulls —
    callers count those exactly like the source parser's ``failed`` status."""

    def __init__(self, embedding_dim: int = 16, allow_fake: bool = False):
        self.grid = int(np.sqrt(embedding_dim))
        if self.grid * self.grid != embedding_dim:
            raise ValueError("embedding_dim must be a square (grid²)")
        self.allow_fake = allow_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, fmts, lums, embs = [], [], [], [], []
        for data in batch["data"].to_pylist():
            data = data or b""
            try:
                img = decode_image(data)
                h, w = img.shape[:2]
                widths.append(w)
                heights.append(h)
                fmts.append("ppm" if data[:1] == b"P" else "bmp")
                lums.append(float(img.mean()))
                embs.append(image_embedding(img, self.grid).tolist())
            except ValueError:
                if self.allow_fake:
                    rng = _content_rng(data)
                    widths.append(int(rng.integers(64, 1920)))
                    heights.append(int(rng.integers(64, 1080)))
                    fmts.append("fake")
                    lums.append(float(rng.uniform(0, 255)))
                    embs.append(rng.standard_normal(self.grid ** 2)
                                .astype(np.float32).tolist())
                else:
                    widths.append(0)
                    heights.append(0)
                    fmts.append("error")
                    lums.append(0.0)
                    embs.append([0.0] * (self.grid ** 2))
        return (batch.drop_columns(["data"])
                .append_column("width", pa.array(widths, pa.int32()))
                .append_column("height", pa.array(heights, pa.int32()))
                .append_column("format", pa.array(fmts, pa.string()))
                .append_column("mean_lum", pa.array(lums, pa.float64()))
                .append_column("embedding", pa.array(embs, pa.list_(pa.float32()))))


class ResizeImage:
    """Actor stage: image binary → resized PPM binary (nearest-neighbor)."""

    def __init__(self, out_w: int = 64, out_h: int = 64):
        self.out_w, self.out_h = out_w, out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for data in batch["data"].to_pylist():
            img = decode_image(data or b"")
            if img.ndim == 2:
                img = np.repeat(img[:, :, None], 3, axis=2)
            out.append(encode_ppm(resize_nearest(img, self.out_w, self.out_h)))
        return batch.set_column(batch.column_names.index("data"), "data",
                                pa.array(out, pa.binary()))


def _pcm_samples(raw: bytes, width: int) -> np.ndarray:
    """PCM frame bytes → float64 samples. 1/2/4-byte widths map to numpy
    dtypes; 24-bit (width=3) is sign-extended by hand (no numpy int24)."""
    if width == 3:
        b = np.frombuffer(raw, dtype=np.uint8)
        b = b[:len(b) - len(b) % 3].reshape(-1, 3).astype(np.int32)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        return np.where(v >= 1 << 23, v - (1 << 24), v).astype(np.float64)
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(width)
    if dtype is None:
        raise ValueError(f"unsupported PCM sample width {width}")
    pcm = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    if width == 1:
        pcm -= 128.0
    return pcm


class DecodeAudio:
    """Actor stage: WAV binary → (sample_rate, n_channels, duration_sec, rms,
    zero_cross_rate, spectral_centroid, status) via the stdlib wave module +
    np.fft. Malformed/unsupported files route to status="error" with zeroed
    features (same loss-is-countable contract as DecodeImage/SampleFrames) —
    one corrupt file never kills the map_batches task."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import wave
        rates, chans, durs, rmss, zcrs, cents, stats = [], [], [], [], [], [], []
        for data in batch["data"].to_pylist():
            try:
                with wave.open(io.BytesIO(data or b""), "rb") as wf:
                    rate = wf.getframerate()
                    nch = wf.getnchannels()
                    width = wf.getsampwidth()
                    n = wf.getnframes()
                    raw = wf.readframes(n)
                pcm = _pcm_samples(raw, width)
                if nch > 1:
                    pcm = pcm[:len(pcm) - len(pcm) % nch].reshape(-1, nch).mean(axis=1)
            except (wave.Error, EOFError, ValueError):
                rates.append(0); chans.append(0); durs.append(0.0)
                rmss.append(0.0); zcrs.append(0.0); cents.append(0.0)
                stats.append("error")
                continue
            rates.append(rate)
            chans.append(nch)
            durs.append(n / rate if rate else 0.0)
            rmss.append(float(np.sqrt(np.mean(pcm ** 2))) if len(pcm) else 0.0)
            zcrs.append(float(np.mean(np.signbit(pcm[1:]) != np.signbit(pcm[:-1])))
                        if len(pcm) > 1 else 0.0)
            if len(pcm):
                spec = np.abs(np.fft.rfft(pcm))
                freqs = np.fft.rfftfreq(len(pcm), d=1.0 / rate) if rate else spec * 0
                tot = spec.sum()
                cents.append(float((freqs * spec).sum() / tot) if tot else 0.0)
            else:
                cents.append(0.0)
            stats.append("ok")
        return (batch.drop_columns(["data"])
                .append_column("sample_rate", pa.array(rates, pa.int32()))
                .append_column("n_channels", pa.array(chans, pa.int32()))
                .append_column("duration_sec", pa.array(durs, pa.float64()))
                .append_column("rms", pa.array(rmss, pa.float64()))
                .append_column("zero_cross_rate", pa.array(zcrs, pa.float64()))
                .append_column("spectral_centroid", pa.array(cents, pa.float64()))
                .append_column("status", pa.array(stats, pa.string())))


def split_ppm_stream(data: bytes) -> list[bytes]:
    """Concatenated-P6 stream → frame byte slices (real parse: each frame's
    length comes from its own header, no magic-scanning false positives)."""
    frames = []
    i = 0
    while i < len(data):
        if data[i:i + 2] != b"P6":
            raise ValueError(f"bad frame boundary at byte {i}")
        _, w, h, _, off = _parse_pnm_header(data[i:])
        end = i + off + w * h * 3
        frames.append(data[i:end])
        i = end
    return frames


class SampleFrames:
    """Actor stage: video (concatenated-PPM stream) → n evenly-spaced frames,
    exploded to (id, frame_idx, frame) rows. Unknown containers: content-
    derived fake slices when ``allow_fake=True`` (round-1 behavior), else the
    row is dropped with a frame_idx=-1 marker row so loss is countable."""

    def __init__(self, n_frames: int = 4, allow_fake: bool = False):
        self.n = n_frames
        self.allow_fake = allow_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        for vid, data in zip(batch["id"].to_pylist(), batch["data"].to_pylist()):
            data = data or b""
            try:
                all_frames = split_ppm_stream(data)
                if not all_frames:
                    # empty payload parses to zero frames — still emit the
                    # marker row so the loss is countable, not silent
                    raise ValueError("no frames")
                picks = np.linspace(0, len(all_frames) - 1, num=self.n,
                                    dtype=np.int64)
                for f, src in enumerate(picks):
                    ids.append(vid)
                    idxs.append(f)
                    frames.append(all_frames[int(src)])
            except ValueError:
                if self.allow_fake:
                    step = max(1, len(data) // self.n)
                    for f in range(self.n):
                        ids.append(vid)
                        idxs.append(f)
                        frames.append(data[f * step:(f + 1) * step][:256])
                else:
                    ids.append(vid)
                    idxs.append(-1)
                    frames.append(b"")
        return pa.table({"id": pa.array(ids),
                         "frame_idx": pa.array(idxs, pa.int32()),
                         "frame": pa.array(frames, pa.binary())})
