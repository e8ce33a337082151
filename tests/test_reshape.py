"""Pivot/crosstab and ROLLUP expansion (ops/reshape.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ner_backend_ray.ops.reshape import (cube_expand, pivot_counts,
                                          rollup_expand)

RNG = np.random.default_rng(11)


def test_pivot_counts_matches_crosstab(ray_session):
    n = 3_000
    df = pd.DataFrame({"day": RNG.choice(["d1", "d2", "d3"], n),
                       "ev": RNG.choice(["x", "y", "z", "other"], n)})
    ds = ray.data.from_pandas(df).repartition(9)
    got = (pivot_counts(ds, "day", "ev", categories=["x", "y", "z"])
           .to_pandas().sort_values("day").reset_index(drop=True))
    ct = pd.crosstab(df["day"], df["ev"])
    for _, row in got.iterrows():
        for c in ("x", "y", "z"):
            assert row[c] == ct.loc[row["day"], c]
        # unlisted category still counts toward total
        assert row["total"] == ct.loc[row["day"]].sum()
    assert got["total"].sum() == n


def test_rollup_expand_levels_and_sentinels():
    finest = pa.table({
        "region": ["EU", "EU", "US"],
        "nation": ["FR", "DE", "US"],
        "v": pa.array([10, 20, 5], pa.int64()),
        "n": pa.array([1, 2, 3], pa.int64()),
    })
    out = rollup_expand(finest, ["region", "nation"], ["v", "n"]).to_pandas()
    assert len(out) == 3 + 2 + 1
    eu = out[(out.region == "EU") & (out.nation == "ALL")].iloc[0]
    assert eu.v == 30 and eu.n == 3
    tot = out[(out.region == "ALL") & (out.nation == "ALL")].iloc[0]
    assert tot.v == 35 and tot.n == 6
    # finest rows pass through untouched
    fr = out[(out.region == "EU") & (out.nation == "FR")].iloc[0]
    assert fr.v == 10 and fr.n == 1


def test_cube_expand_all_subsets():
    finest = pa.table({
        "region": ["EU", "EU", "US"],
        "prio": ["HI", "LO", "HI"],
        "v": pa.array([10, 20, 5], pa.int64()),
        "n": pa.array([1, 2, 3], pa.int64()),
    })
    out = cube_expand(finest, ["region", "prio"], ["v", "n"]).to_pandas()
    # 2^2 grouping sets: finest 3 + region 2 + prio 2 + grand 1
    assert len(out) == 3 + 2 + 2 + 1
    # the level ROLLUP can't produce: (ALL, prio)
    hi = out[(out.region == "ALL") & (out.prio == "HI")].iloc[0]
    assert hi.v == 15 and hi.n == 4
    tot = out[(out.region == "ALL") & (out.prio == "ALL")].iloc[0]
    assert tot.v == 35 and tot.n == 6
    eu = out[(out.region == "EU") & (out.prio == "ALL")].iloc[0]
    assert eu.v == 30 and eu.n == 3


def test_melt_inverts_pivot(ray_session):
    from ner_backend_ray.ops.reshape import melt
    n = 1_000
    df = pd.DataFrame({"day": RNG.choice(["d1", "d2"], n),
                       "ev": RNG.choice(["x", "y"], n)})
    wide = pivot_counts(ray.data.from_pandas(df).repartition(4),
                        "day", "ev", categories=["x", "y"])
    long = (melt(wide, ["day"], ["x", "y"], var_name="ev", value_name="n")
            .to_pandas().sort_values(["day", "ev"]).reset_index(drop=True))
    ct = pd.crosstab(df["day"], df["ev"])
    for _, r in long.iterrows():
        assert r["n"] == ct.loc[r["day"], r["ev"]]
    assert len(long) == 2 * 2
