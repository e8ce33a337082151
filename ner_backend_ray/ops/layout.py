"""Z-order (Morton) data layout — multi-column locality for scan pruning.

At 100 TB the cheapest query is the one that never reads a block: writers
cluster rows so that per-file min/max statistics prune MULTI-column range
predicates (Delta/Iceberg Z-ORDER). The op is two narrow passes plus the
one unavoidable sort:

1. a combiner pass collects per-column global min/max (one row per block to
   the driver);
2. each column is quantized to ``bits`` levels by its range — a pure
   map using the broadcast min/max — and the quantized coordinates are
   bit-interleaved into one int64 Morton key with the classic
   spread-multiply trick (vectorized numpy, no per-row Python);
3. ``Dataset.sort`` on the key range-partitions the data so every output
   block covers a small hyper-rectangle of the column space.

The quantization and interleave are exact integer arithmetic, so an SQL
oracle can recompute the key bit-for-bit — layout ops are value-checkable,
not just "looks clustered".
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _spread16(x: np.ndarray) -> np.ndarray:
    """Interleave zeros between the low 16 bits of each value
    (Morton part1by1): 0b1111 -> 0b01010101."""
    x = x.astype(np.int64) & 0xFFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def morton_key_2d(qx: np.ndarray, qy: np.ndarray) -> np.ndarray:
    """Interleaved 2×16-bit Morton key (x in even bits, y in odd)."""
    return _spread16(qx) | (_spread16(qy) << 1)


def column_ranges(ds: ray.data.Dataset,
                  cols: list[str]) -> dict[str, tuple[int, int]]:
    """Global (min, max) per column via one combiner pass — one partial row
    per block reaches the driver."""

    schema = pa.schema([(f"{c}_{side}", pa.int64())
                        for c in cols for side in ("min", "max")])

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # pc.min/max on a zero-row block is null → None would poison
            # the driver-side min()/max() below
            return schema.empty_table()
        out = {}
        for c in cols:
            v = batch[c].cast(pa.int64())
            out[f"{c}_min"] = pa.array([pc.min(v).as_py()], pa.int64())
            out[f"{c}_max"] = pa.array([pc.max(v).as_py()], pa.int64())
        return pa.table(out)

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    if not rows:
        raise ValueError("column_ranges: dataset has no rows")
    return {c: (min(r[f"{c}_min"] for r in rows),
                max(r[f"{c}_max"] for r in rows)) for c in cols}


def quantize(v: np.ndarray, lo: int, hi: int, bits: int = 16) -> np.ndarray:
    """(v - lo) * (2^bits - 1) // max(hi - lo, 1) — exact integer quantization
    to [0, 2^bits), identical in SQL."""
    levels = (1 << bits) - 1
    span = max(hi - lo, 1)
    return (v.astype(np.int64) - lo) * levels // span


def zorder_sort(ds: ray.data.Dataset, col_x: str, col_y: str,
                bits: int = 16, key_col: str = "zkey",
                ranges: dict[str, tuple[int, int]] | None = None
                ) -> ray.data.Dataset:
    """Append the 2-D Morton key of (col_x, col_y) and range-sort by it.
    ``ranges`` (from :func:`column_ranges`) can be passed to reuse a prior
    stats pass. Output blocks then cover compact rectangles of the
    (col_x, col_y) space — the property file-level min/max pruning needs."""
    r = ranges or column_ranges(ds, [col_x, col_y])
    (x_lo, x_hi), (y_lo, y_hi) = r[col_x], r[col_y]

    def key(batch: pa.Table) -> pa.Table:
        x = batch[col_x].cast(pa.int64()).to_numpy(zero_copy_only=False)
        y = batch[col_y].cast(pa.int64()).to_numpy(zero_copy_only=False)
        z = morton_key_2d(quantize(x, x_lo, x_hi, bits),
                          quantize(y, y_lo, y_hi, bits))
        return batch.append_column(key_col, pa.array(z))

    return ds.map_batches(key, batch_format="pyarrow").sort(key_col)
