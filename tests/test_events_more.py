"""Semantics tests for the round-2 streaming-window / ingestion-hygiene
ops: hopping windows, per-window top-k, tolerance dedup, per-user-hour
throttle, deterministic weighted sampling."""
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"

HOP_US = 900_000_000
WIN = 4  # 60min window / 15min hop
HOUR_US = 3_600_000_000


def _ev():
    return pd.read_parquet(SF + "/events.parquet")


def _us(ts):
    return ts.astype("datetime64[us]").astype("int64")


def test_hopping_counts_cover_each_event_exactly_window_over_hop_times():
    from kgray.pipelines.analytics import events_hopping_counts

    out = events_hopping_counts(SF).to_pandas()
    ev = _ev()
    # conservation: every event is in exactly WIN windows
    assert out.n.sum() == len(ev) * WIN
    # spot-check one event's membership
    t0 = _us(ev.ts).iloc[0]
    base = (t0 // HOP_US) * HOP_US
    expected_ws = {base - i * HOP_US for i in range(WIN)}
    got_ws = set(_us(out.window_start))
    assert expected_ws <= got_ws
    # brute-force a single window's count
    ws = base
    m = (_us(ev.ts) >= ws) & (_us(ev.ts) < ws + WIN * HOP_US)
    etype = ev.event_type.iloc[0]
    exp = int((m & (ev.event_type == etype)).sum())
    g = out[(_us(out.window_start) == ws) & (out.event_type == etype)]
    assert g.n.iloc[0] == exp


def test_window_topk_types_rank_semantics():
    from kgray.pipelines.analytics import events_window_topk_types

    out = events_window_topk_types(SF, k=2).to_pandas()
    ev = _ev()
    hours = (_us(ev.ts) // HOUR_US) * HOUR_US
    c = (
        pd.DataFrame({"h": hours, "t": ev.event_type})
        .groupby(["h", "t"]).size().reset_index(name="n")
    )
    some = c.h.iloc[len(c) // 2]
    exp = c[c.h == some].sort_values(
        ["n", "t"], ascending=[False, True]
    ).head(2)
    g = out[_us(out.hour) == some].sort_values("rnk")
    assert g.event_type.tolist() == exp.t.tolist()
    assert g.n.tolist() == exp.n.tolist()
    assert (out.groupby("hour").rnk.max() <= 2).all()


def test_event_dedup_tolerance_lag_semantics():
    from kgray.pipelines.analytics import event_dedup_tolerance

    tol_us = 3600 * 1_000_000
    out = event_dedup_tolerance(SF).to_pandas()
    ev = _ev().sort_values(["user_id", "event_type", "ts", "event_id"])
    prev = (
        _us(ev.ts).groupby([ev.user_id, ev.event_type], sort=False).shift()
    )
    keep = prev.isna() | ((_us(ev.ts) - prev) > tol_us)
    exp = set(ev.loc[keep, "event_id"])
    assert set(out.event_id) == exp
    # first event of every (user, type) always survives
    firsts = ev.drop_duplicates(["user_id", "event_type"]).event_id
    assert set(firsts) <= set(out.event_id)


def test_user_hour_throttle_cap():
    from kgray.pipelines.analytics import user_hour_throttle

    out = user_hour_throttle(SF, cap=2).to_pandas()
    ev = _ev().sort_values(["user_id", "ts", "event_id"])
    hour = _us(ev.ts) // HOUR_US
    pos = ev.groupby([ev.user_id, hour], sort=False).cumcount()
    exp = set(ev.loc[pos < 2, "event_id"])
    assert set(out.event_id) == exp
    got_hours = _us(out.ts) // HOUR_US
    assert (out.groupby([out.user_id, got_hours]).size() <= 2).all()


def test_weighted_sample_aes_ordering_and_determinism():
    from kgray.pipelines.analytics import weighted_sample
    from kgray.pipelines.curate import SPLIT_MULT

    out = weighted_sample(SF, k=50).to_pandas()
    docs = pd.read_parquet(SF + "/documents.parquet",
                           columns=["doc_id", "n_chars"])
    with np.errstate(over="ignore"):
        h = docs.doc_id.to_numpy().astype(np.uint64) * np.uint64(SPLIT_MULT)
    u = (h.astype(np.float64) + 1.0) / 2.0 ** 64
    key = np.log(u) / docs.n_chars.to_numpy().astype(np.float64)
    exp = docs.assign(key=key).sort_values(
        ["key", "doc_id"], ascending=[False, True]
    ).head(50)
    assert out.doc_id.tolist() == exp.doc_id.tolist()
    assert out.rnk.tolist() == list(range(1, 51))
    # deterministic: rerun is identical
    out2 = weighted_sample(SF, k=50).to_pandas()
    assert out.doc_id.tolist() == out2.doc_id.tolist()


def test_ks_statistic_matches_scipy_style_reference():
    from kgray.pipelines.analytics import ks_statistic

    out = ks_statistic(SF).to_pandas()
    ev = _ev()
    a = np.sort(ev.loc[ev.event_type == "purchase", "value"].to_numpy())
    b = np.sort(ev.loc[ev.event_type == "view", "value"].to_numpy())
    pts = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(a, pts, side="right") / len(a)
    fb = np.searchsorted(b, pts, side="right") / len(b)
    exp = np.floor(np.abs(fa - fb).max() * 1e6 + 0.5) / 1e6
    assert out.ks.iloc[0] == exp
    assert out.n_a.iloc[0] == len(a) and out.n_b.iloc[0] == len(b)
    assert 0.0 <= out.ks.iloc[0] <= 1.0


def test_ks_statistic_zero_on_identical_distribution():
    from kgray.pipelines.analytics import ks_statistic

    out = ks_statistic(SF, type_a="view", type_b="view").to_pandas()
    assert out.ks.iloc[0] == 0.0


def test_benford_digits_conservation_and_reference():
    from kgray.pipelines.analytics import benford_digits

    out = benford_digits(SF).to_pandas()
    li = pd.read_parquet(SF + "/lineitem.parquet",
                         columns=["l_extendedprice"])
    cents = np.floor(li.l_extendedprice.to_numpy() * 100.0 + 0.5).astype(
        np.int64
    )
    exp = pd.Series(cents).astype(str).str[0].astype(int).value_counts()
    got = out.set_index("digit").n
    assert got.sort_index().to_dict() == exp.sort_index().to_dict()
    assert out.n.sum() == len(li)
    assert abs(out.frac.sum() - 1.0) < 1e-9


def test_running_distinct_users_monotone_and_total():
    from kgray.pipelines.analytics import running_distinct_users

    out = running_distinct_users(SF).to_pandas().sort_values("day")
    ev = _ev()
    assert out.cum_users.iloc[-1] == ev.user_id.nunique()
    assert (out.cum_users.diff().dropna() > 0).all()
    assert (out.new_users.to_numpy() == out.cum_users.diff()
            .fillna(out.cum_users.iloc[0]).to_numpy()).all()
    first_day = (
        _us(ev.ts).groupby(ev.user_id).min() // 86_400_000_000
    )
    exp = first_day.value_counts().sort_index()
    got_days = pd.to_datetime(out.day).astype("datetime64[us]").astype(
        "int64"
    ) // 86_400_000_000
    assert got_days.tolist() == list(exp.index)
    assert out.new_users.tolist() == exp.tolist()


def test_events_mad_matches_numpy_quantiles():
    from kgray.pipelines.analytics import events_mad

    out = events_mad(SF).to_pandas().set_index("event_type")
    ev = _ev()
    for t, g in ev.groupby("event_type"):
        med = g.value.quantile(0.5, interpolation="linear")
        mad = (g.value - med).abs().quantile(0.5, interpolation="linear")
        assert out.loc[t, "median_value"] == np.floor(med * 1e4 + 0.5) / 1e4
        assert out.loc[t, "mad"] == np.floor(mad * 1e4 + 0.5) / 1e4


def test_user_value_ewma_matches_pandas_ewm():
    from kgray.pipelines.relational import user_value_ewma

    out = user_value_ewma(SF, alpha=0.25).to_pandas().set_index("user_id")
    ev = _ev().sort_values(["user_id", "ts", "event_id"])
    for uid, g in list(ev.groupby("user_id"))[:25]:
        exp = g.value.ewm(alpha=0.25, adjust=False).mean().iloc[-1]
        assert out.loc[uid, "ewma"] == np.floor(exp * 1e6 + 0.5) / 1e6
        assert out.loc[uid, "n_events"] == len(g)
        assert out.loc[uid, "last_value"] == g.value.iloc[-1]
    assert len(out) == ev.user_id.nunique()


def test_nation_revenue_share_sums_to_one_per_region():
    from kgray.pipelines.relational import nation_revenue_share

    out = nation_revenue_share(SF).to_pandas()
    s = out.groupby("r_name").share.sum()
    assert ((s - 1.0).abs() < 1e-4).all()
    li = pd.read_parquet(SF + "/lineitem.parquet")
    cents = np.floor(
        (li.l_extendedprice * (1.0 - li.l_discount)) * 100.0 + 0.5
    ).astype(np.int64)
    assert abs(out.revenue.sum() - cents.sum() / 100.0) < 1e-6


def test_event_value_trend_matches_polyfit():
    from kgray.pipelines.analytics import event_value_trend

    out = event_value_trend(SF).to_pandas().set_index("event_type")
    ev = _ev()
    origin = pd.Timestamp("2024-01-01").value // 1_000
    for t, g in ev.groupby("event_type"):
        x = (
            (_us(g.ts) - origin) // 1_000_000
        ).to_numpy(np.float64)
        y = np.floor(g.value.to_numpy() * 100.0 + 0.5) / 100.0
        slope = np.polyfit(x, y, 1)[0] * 86400.0
        got = out.loc[t, "slope_per_day"]
        # same estimator, different arithmetic path — agree to ~1e-6
        assert abs(got - slope) < 1e-6 * max(1.0, abs(slope))
        assert out.loc[t, "n"] == len(g)


def test_event_value_trend_exact_at_overflow_scale(tmp_path):
    """Σt² over a 1-year window at 30k rows/type exceeds int64 (~1e19):
    the hi/lo-pair partials must stay exact where numpy int64 sums wrap
    silently (ADVICE r2)."""
    from kgray.pipelines.analytics import event_value_trend

    rng = np.random.RandomState(3)
    n = 30000
    # one year of second-resolution timestamps; t ~ 3.15e7, t² ~ 1e15
    secs = np.sort(rng.randint(0, 365 * 86400, size=n))
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(secs, unit="s")
    vals = 10.0 + secs / 86400.0 * 0.25 + rng.normal(0, 0.5, n).round(2)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": np.zeros(n, dtype=np.int64),
            "event_type": "purchase",
            "ts": ts.astype("datetime64[us]"),
            "value": vals,
            "props": "{}",
        }
    )
    df.to_parquet(tmp_path / "events.parquet", index=False)

    # int64 really would wrap here — the guard the fix is about
    t_int = secs.astype(np.int64)
    assert (t_int * t_int).sum(dtype=np.int64) != sum(
        int(x) * int(x) for x in t_int
    ) or (t_int * t_int).sum(dtype=object) > 2 ** 63

    out = event_value_trend(str(tmp_path)).to_pandas()
    row = out[out.event_type == "purchase"].iloc[0]

    # exact reference: same integerized closed form in python ints
    t = [int(x) for x in secs]
    v = [int(x) for x in np.floor(vals * 100.0 + 0.5)]
    nn = len(t)
    num = nn * sum(x * y for x, y in zip(t, v)) - sum(t) * sum(v)
    den = nn * sum(x * x for x in t) - sum(t) ** 2
    slope = (float(num) / float(den)) * 86400.0 / 100.0
    expect = np.floor(slope * 1e8 + 0.5) / 1e8
    assert row.n == n
    assert row.slope_per_day == expect


def test_events_cube_levels_consistent():
    """CUBE invariants: each level re-aggregates exactly to the grand
    total, and the finest level matches a pandas groupby."""
    from kgray.pipelines.relational import events_cube

    out = events_cube(SF).to_pandas()
    ev = pd.read_parquet(SF + "/events.parquet",
                         columns=["event_type", "ts", "value"])
    cents = np.floor(ev.value.to_numpy(np.float64) * 100.0 + 0.5).astype(
        np.int64
    )
    base = pd.DataFrame({
        "event_type": ev.event_type,
        "day": ev.ts.dt.floor("D").dt.strftime("%Y-%m-%d"),
        "cents": cents,
    })

    finest = out[(out.event_type != "ALL") & (out.day != "ALL")]
    exp = base.groupby(["event_type", "day"], as_index=False).agg(
        n_events=("cents", "size"), cents=("cents", "sum")
    )
    m = finest.merge(exp, on=["event_type", "day"])
    assert len(m) == len(exp) == len(finest)
    assert (m.n_events_x == m.n_events_y).all()
    assert np.allclose(m.sum_value, m.cents / 100.0)

    grand = out[(out.event_type == "ALL") & (out.day == "ALL")]
    assert len(grand) == 1
    assert grand.n_events.iloc[0] == len(ev)
    assert grand.sum_value.iloc[0] == cents.sum() / 100.0
    # every rollup level sums to the grand total
    for lvl in [finest,
                out[(out.event_type != "ALL") & (out.day == "ALL")],
                out[(out.event_type == "ALL") & (out.day != "ALL")]]:
        assert lvl.n_events.sum() == len(ev)
        assert abs(lvl.sum_value.sum() - cents.sum() / 100.0) < 1e-9
