"""Tests for the Pareto skyline operator and the one-pass numeric
column profiler."""
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

SF = "/root/testdata/sf0.001"


def _brute_skyline(df: pd.DataFrame) -> pd.DataFrame:
    keep = []
    for _, p in df.iterrows():
        dominated = (
            (df.p_retailprice <= p.p_retailprice)
            & (df.p_size <= p.p_size)
            & (
                (df.p_retailprice < p.p_retailprice)
                | (df.p_size < p.p_size)
            )
        ).any()
        if not dominated:
            keep.append(p)
    return pd.DataFrame(keep).reset_index(drop=True)


def test_skyline_kernel_matches_brute_force_with_ties():
    """Duplicate coordinate points survive together; same-price smaller
    size dominates; cheaper equal-size dominates."""
    from kgray.pipelines.tpch_extra import _skyline_2d

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "p_partkey": np.arange(60, dtype=np.int64),
            # tiny domains to force heavy coordinate collisions
            "p_size": rng.integers(1, 5, 60).astype(np.int64),
            "p_retailprice": rng.integers(1, 5, 60) * 1.5,
        }
    )
    got = (
        _skyline_2d(df)
        .sort_values("p_partkey")
        .reset_index(drop=True)
    )
    want = (
        _brute_skyline(df)
        .sort_values("p_partkey")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["p_partkey", "p_size", "p_retailprice"]],
        want[["p_partkey", "p_size", "p_retailprice"]],
        check_dtype=False,  # iterrows upcasts the brute-force frame
    )


def test_skyline_distributed_matches_single_frame():
    """Per-block frontier combiner + final scan == one global scan."""
    from kgray.pipelines.tpch_extra import _skyline_2d, part_skyline

    got = (
        part_skyline(SF)
        .to_pandas()
        .sort_values("p_partkey")
        .reset_index(drop=True)
    )
    whole = pd.read_parquet(
        SF + "/part.parquet",
        columns=["p_partkey", "p_size", "p_retailprice"],
    )
    want = (
        _skyline_2d(whole).sort_values("p_partkey").reset_index(drop=True)
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(
        got.astype({"p_size": np.int64}),
        want[got.columns].astype({"p_size": np.int64}),
    )
    # every survivor is truly undominated
    for _, p in got.iterrows():
        dom = (
            (whole.p_retailprice <= p.p_retailprice)
            & (whole.p_size <= p.p_size)
            & (
                (whole.p_retailprice < p.p_retailprice)
                | (whole.p_size < p.p_size)
            )
        )
        assert not dom.any()


def test_lineitem_profile_matches_exact_recompute():
    from kgray.pipelines.analytics import lineitem_profile

    got = (
        lineitem_profile(SF)
        .to_pandas()
        .set_index("col")
        .sort_index()
    )
    li = pd.read_parquet(
        SF + "/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )
    for c in li.columns:
        v = li[c].dropna().to_numpy(np.float64)
        cents = [int(x) for x in np.floor(v * 100.0 + 0.5)]
        n, s, ss = len(cents), sum(cents), sum(x * x for x in cents)
        r = got.loc[c]
        assert r.n == n and r.n_null == li[c].isna().sum()
        assert r.vmin == v.min() and r.vmax == v.max()
        mean = float(s) / (100.0 * n)
        std = math.sqrt(
            float(n * ss - s * s) / float(n * n) / 10000.0
        )
        assert r["mean"] == np.floor(mean * 1e6 + 0.5) / 1e6
        assert r["std"] == np.floor(std * 1e6 + 0.5) / 1e6


def test_lineitem_profile_moments_survive_int64_scale():
    """The hi/lo transport must stay exact where a numpy int64 Σcents²
    accumulator would wrap (the ADVICE-r2 overflow family)."""
    from kgray.pipelines.analytics import lineitem_profile  # noqa: F401

    # Σcents² for extendedprice-sized values wraps int64 at ~9.2e4 rows
    big = np.full(110_000, 95_000.0)  # cents 9.5e6, cents² ≈ 9e13
    cents = int(np.floor(big[0] * 100.0 + 0.5))
    ss = cents * cents * len(big)
    assert ss > np.iinfo(np.int64).max  # the trap exists...
    hi, lo = divmod(ss, 1 << 32)
    assert (int(hi) << 32) + int(lo) == ss  # ...and the transport is exact


def test_user_journeys_order_and_counts():
    """Ordered string_agg parity: journeys follow (ts, event_id) order
    and every user's event count is conserved."""
    from kgray.pipelines.relational import user_journeys

    got = user_journeys(SF).to_pandas().set_index("user_id")
    ev = pd.read_parquet(
        SF + "/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    ).sort_values(["ts", "event_id"])
    want = ev.groupby("user_id").event_type.agg(">".join)
    assert len(got) == ev.user_id.nunique()
    for uid, j in want.items():
        assert got.loc[uid, "journey"] == j
        assert got.loc[uid, "n_events"] == (ev.user_id == uid).sum()


def test_skyline_degenerate_all_ties_survive(tmp_path):
    """All-identical coordinates dominate nothing — every row must
    survive, and the final scan sees ONE distinct coordinate, not the
    tie multiplicity (the single-worker blowup guard)."""
    from kgray.pipelines.tpch_extra import part_skyline

    deg = pd.DataFrame(
        {
            "p_partkey": np.arange(2000, dtype=np.int64),
            "p_size": np.full(2000, 3, np.int64),
            "p_retailprice": np.full(2000, 9.5),
        }
    )
    deg.to_parquet(tmp_path / "part.parquet")
    out = part_skyline(str(tmp_path)).to_pandas()
    assert len(out) == 2000
    assert set(out.p_partkey) == set(range(2000))


def test_events_twap_matches_pandas_reference():
    """Trapezoid integral / duration per type, pairs in (ts, event_id)
    order, exact integer accumulation."""
    from kgray.pipelines.analytics import events_twap

    got = events_twap(SF).to_pandas().set_index("event_type")
    ev = pd.read_parquet(
        SF + "/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
    )
    ev["t"] = ev.ts.astype("datetime64[us]").astype("int64")
    ev["vc"] = np.floor(ev.value.to_numpy() * 100.0 + 0.5).astype(
        np.int64
    )
    for et, g in ev.groupby("event_type"):
        g = g.sort_values(["t", "event_id"])
        t = [int(x) for x in g.t]
        v = [int(x) for x in g.vc]
        S = sum(
            (v[i] + v[i + 1]) * (t[i + 1] - t[i])
            for i in range(len(t) - 1)
        )
        twap = float(S) / (200.0 * float(t[-1] - t[0]))
        r = got.loc[et]
        assert r.n_events == len(t)
        assert r.twap == np.floor(twap * 1e6 + 0.5) / 1e6
