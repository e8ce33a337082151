"""Windowed aggregates over an ordered event stream.

Ray Data has no event-time windows (SURVEY.md §2.10 — neither does the reference);
windows are expressed as: assign window id per batch (vectorized) → combiner
partial aggregate per (key, window) → small groupby. Sliding/session windows use
``groupby(key).map_groups`` over ts-sorted groups.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def tumbling_window(events: ray.data.Dataset, ts_col: str = "ts",
                    key_col: str = "event_type", value_col: str = "value",
                    window_us: int = 3_600_000_000) -> ray.data.Dataset:
    """count + sum(value) per (key, tumbling window). Returns columns
    (key, window_start, n_events, sum_value); window_start is epoch micros."""

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow-native combiner (pa.Table.group_by) — no pandas round-trip
        ts = batch[ts_col].cast(pa.int64())
        win = pc.multiply(pc.divide(ts, window_us), window_us)  # floor to window
        t = pa.table({key_col: batch[key_col], "window_start": win,
                      value_col: batch[value_col]})
        agg = (t.group_by([key_col, "window_start"])
               .aggregate([(value_col, "sum"), ([], "count_all")]))
        return agg.rename_columns([key_col, "window_start", "psum", "pn"])

    from ray.data.aggregate import Sum
    return (events.map_batches(partial, batch_format="pyarrow")
            .groupby([key_col, "window_start"])
            .aggregate(Sum("pn", alias_name="n_events"),
                       Sum("psum", alias_name="sum_value")))


def sliding_window(events: ray.data.Dataset, ts_col: str = "ts",
                   key_col: str = "event_type", value_col: str = "value",
                   window_us: int = 7_200_000_000,
                   slide_us: int = 3_600_000_000) -> ray.data.Dataset:
    """count + sum(value) per (key, sliding window): each event lands in
    ``window_us / slide_us`` overlapping windows, assigned VECTORIZED per
    batch (repeat + offset — no per-row loop) and pre-aggregated by the same
    combiner-then-groupby shape as the tumbling variant. ``window_us`` must
    be a multiple of ``slide_us``."""
    if window_us % slide_us:
        raise ValueError("window_us must be a multiple of slide_us")
    per_event = window_us // slide_us

    def partial(batch: pa.Table) -> pa.Table:
        import numpy as np
        ts = batch[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = (ts // slide_us) * slide_us
        # windows containing ts: starts base, base - slide, ..., base - (k-1)*slide
        starts = (np.repeat(base, per_event)
                  - np.tile(np.arange(per_event, dtype=np.int64) * slide_us,
                            len(base)))
        idx = pa.array(np.repeat(np.arange(len(base), dtype=np.int64), per_event))
        t = pa.table({key_col: pc.take(batch[key_col], idx),
                      "window_start": pa.array(starts),
                      value_col: pc.take(batch[value_col], idx)})
        agg = (t.group_by([key_col, "window_start"])
               .aggregate([(value_col, "sum"), ([], "count_all")]))
        return agg.rename_columns([key_col, "window_start", "psum", "pn"])

    from ray.data.aggregate import Sum
    return (events.map_batches(partial, batch_format="pyarrow")
            .groupby([key_col, "window_start"])
            .aggregate(Sum("pn", alias_name="n_events"),
                       Sum("psum", alias_name="sum_value")))


def session_windows(events: ray.data.Dataset, ts_col: str = "ts",
                    key_col: str = "user_id",
                    gap_us: int = 1_800_000_000) -> ray.data.Dataset:
    """Per-key session windowing (sorted within group; gap > gap_us splits).
    Returns (key, session_start, session_end, n_events)."""

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col)
        ts = g[ts_col].astype("int64")
        new_session = (ts.diff().fillna(gap_us + 1) > gap_us).cumsum()
        out = g.groupby(new_session).agg(
            session_start=(ts_col, "min"), session_end=(ts_col, "max"),
            n_events=(ts_col, "size"))
        out[key_col] = g[key_col].iloc[0]
        return out.reset_index(drop=True)

    return events.groupby(key_col).map_groups(sessions, batch_format="pandas")


def partitioned_running(events: ray.data.Dataset, key_col: str,
                        order_cols: list[str], value_col: str,
                        lag_fill: int = -1) -> ray.data.Dataset:
    """SQL window functions as a dataflow op: per-``key_col`` partition,
    ordered by ``order_cols``, emit running sum, lag(value) and row_number
    over ``value_col`` (int64 — callers fix-point floats first so the math
    is exact on both engine and oracle).

    Plan shape: one groupby(key) shuffle; inside each group the analytics
    are a vectorized sort + cumsum/shift — no per-row Python. Partitions
    must fit a worker (true for per-user/per-entity streams); a key whose
    history exceeds that needs range-partitioning by (key, time) with
    carry-in offsets, which is the checkpointed runner's segment pattern,
    not this op's.

    Returns all input columns plus ``running`` (cumulative sum inclusive),
    ``prev`` (lagged value, ``lag_fill`` for the partition head) and ``rn``
    (1-based dense position)."""
    import numpy as np

    def analyze(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[(c, "ascending") for c in order_cols])
        t = g.take(idx)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        prev = np.empty_like(v)
        prev[0] = lag_fill
        prev[1:] = v[:-1]
        return (t.append_column("running", pa.array(np.cumsum(v)))
                 .append_column("prev", pa.array(prev))
                 .append_column("rn", pa.array(
                     np.arange(1, len(v) + 1, dtype=np.int64))))

    return events.groupby(key_col).map_groups(analyze,
                                              batch_format="pyarrow")
