"""Semantics tests for the distributed rank/time-series statistics:
Spearman rank correlation (average-rank ties, doubled-rank integer
moments) and the gap-filled hourly autocorrelation function."""
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _spearman_ref(x: np.ndarray, y: np.ndarray) -> float:
    rx = pd.Series(x).rank(method="average").to_numpy()
    ry = pd.Series(y).rank(method="average").to_numpy()
    return float(np.corrcoef(rx, ry)[0, 1])


def test_spearman_matches_pandas_rank_corr():
    from kgray.pipelines.analytics import spearman_qty_price

    out = spearman_qty_price(SF).to_pandas()
    li = pd.read_parquet(SF + "/lineitem.parquet",
                         columns=["l_quantity", "l_extendedprice"])
    ref = _spearman_ref(li.l_quantity.to_numpy(),
                        li.l_extendedprice.to_numpy())
    assert int(out.n.iloc[0]) == len(li)
    assert abs(float(out.spearman_qty_price.iloc[0]) - ref) < 2e-6


def test_spearman_heavy_ties_and_few_bins(tmp_path):
    """Ties dominating both columns (every value repeated) must rank by
    the average method on every replica, across bin boundaries too."""
    from kgray.pipelines.analytics import spearman_qty_price

    rng = np.random.RandomState(7)
    n = 4000
    q = rng.randint(1, 6, n)                      # 5 distinct values
    price = np.round(q * 10.0 + rng.randint(0, 3, n) * 0.5, 2)  # ~15
    pd.DataFrame({
        "l_quantity": q.astype(np.int64),
        "l_extendedprice": price,
    }).to_parquet(tmp_path / "lineitem.parquet", index=False)

    out = spearman_qty_price(str(tmp_path), n_bins=4).to_pandas()
    ref = _spearman_ref(q, price)
    got = float(out.spearman_qty_price.iloc[0])
    assert abs(got - np.floor(ref * 1e6 + 0.5) / 1e6) < 2e-6
    assert got > 0.9  # monotone by construction


def test_events_acf_matches_dense_numpy():
    from kgray.pipelines.analytics import events_acf

    out = events_acf(SF).to_pandas()
    ev = pd.read_parquet(SF + "/events.parquet", columns=["event_type", "ts"])
    h = ev.ts.astype("datetime64[us]").astype("int64") // 3_600_000_000
    h0, h1 = int(h.min()), int(h.max())
    for et, g in pd.DataFrame({"event_type": ev.event_type, "h": h}).groupby(
        "event_type"
    ):
        x = np.zeros(h1 - h0 + 1)
        vc = g.h.value_counts()
        x[vc.index.to_numpy() - h0] = vc.to_numpy()
        for k in (1, 2, 3, 6, 12, 24):
            row = out[(out.event_type == et) & (out.lag == k)]
            assert len(row) == 1
            ref = float(np.corrcoef(x[:-k], x[k:])[0, 1])
            assert abs(float(row.acf.iloc[0]) - ref) < 2e-6
            assert int(row.n_pairs.iloc[0]) == len(x) - k


def test_events_acf_perfect_daily_cycle(tmp_path):
    """A strictly 24h-periodic signal has acf(24) = 1 and the gap-filled
    zeros must participate (hours with no events are the signal)."""
    from kgray.pipelines.analytics import events_acf

    hours = np.arange(0, 24 * 14)  # 14 days
    active = hours[hours % 24 < 6]  # events only in hours 0..5 each day
    rows = []
    for hh in active:
        for i in range(3):  # 3 events in each active hour
            rows.append((
                pd.Timestamp("2024-03-01")
                + pd.Timedelta(hours=int(hh), minutes=10 * i + 1)
            ))
    df = pd.DataFrame({
        "event_id": np.arange(len(rows), dtype=np.int64),
        "user_id": np.int64(1),
        "event_type": "cycle",
        "ts": pd.Series(rows).astype("datetime64[us]"),
        "value": 1.0,
        "props": "{}",
    })
    df.to_parquet(tmp_path / "events.parquet", index=False)

    out = events_acf(str(tmp_path)).to_pandas().set_index("lag")
    assert float(out.loc[24, "acf"]) == 1.0
    # half-period anticorrelation: active block vs quiet block overlap
    assert float(out.loc[12, "acf"]) < 0.0


def test_lineitem_unpivot_conserves_and_melts():
    from kgray.pipelines.analytics import lineitem_unpivot

    out = lineitem_unpivot(SF).to_pandas()
    li = pd.read_parquet(SF + "/lineitem.parquet")
    assert set(out.measure) == {
        "l_quantity", "l_extendedprice", "l_discount", "l_tax"
    }
    # every (flag, measure) cell counts exactly the flag's rows
    for flag, g in out.groupby("l_returnflag"):
        assert (g.n == (li.l_returnflag == flag).sum()).all()
    # exact-cents conservation per measure across flags
    for m in out.measure.unique():
        cents = np.floor(li[m].to_numpy() * 100.0 + 0.5).astype(np.int64)
        got = out[out.measure == m].total.sum()
        assert abs(got - cents.sum() / 100.0) < 1e-6


def test_diversified_topk_quota_semantics(tmp_path):
    """A whale customer owning the 5 highest-value orders may place at
    most ``per_customer`` rows; the greedy-quota answer equals
    per-customer top-q then global top-k."""
    from kgray.pipelines.analytics import diversified_topk

    rows = []
    # whale: customer 1 has the five biggest orders
    for i in range(5):
        rows.append((100 + i, 1, 1000.0 - i))
    # long tail: customers 2..9, one order each
    for c in range(2, 10):
        rows.append((200 + c, c, 500.0 - c))
    df = pd.DataFrame(rows, columns=["o_orderkey", "o_custkey",
                                     "o_totalprice"])
    df.to_parquet(tmp_path / "orders.parquet", index=False)

    out = diversified_topk(str(tmp_path), k=6, per_customer=2).to_pandas()
    assert len(out) == 6
    # whale capped at 2 (its two best), tail fills the rest in value order
    assert (out.o_custkey == 1).sum() == 2
    assert set(out.o_orderkey.head(2)) == {100, 101}
    assert list(out.rnk) == [1, 2, 3, 4, 5, 6]
    assert out.o_totalprice.is_monotonic_decreasing


def _wmedian_ref(v: np.ndarray, w: np.ndarray) -> float:
    order = np.argsort(v, kind="stable")
    vs, ws = v[order], w[order]
    # merge ties
    uv, inv = np.unique(vs, return_inverse=True)
    uw = np.bincount(inv, weights=ws).astype(np.int64)
    cum = uw.cumsum()
    t = (int(uw.sum()) + 1) // 2
    return float(uv[np.searchsorted(cum, t)])


def test_weighted_median_matches_bruteforce():
    from kgray.pipelines.analytics import weighted_median

    out = weighted_median(SF).to_pandas().set_index("l_returnflag")
    li = pd.read_parquet(
        SF + "/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_quantity"],
    )
    for f, g in li.groupby("l_returnflag"):
        ref = _wmedian_ref(
            g.l_extendedprice.to_numpy(np.float64),
            g.l_quantity.to_numpy(np.int64),
        )
        assert float(out.loc[f, "wmedian"]) == ref
        assert int(out.loc[f, "total_weight"]) == int(g.l_quantity.sum())


def test_weighted_median_ties_and_degenerate_bins(tmp_path):
    """Heavy ties around the crossing + one flag whose values are all
    identical (bin width collapses to the epsilon floor)."""
    from kgray.pipelines.analytics import weighted_median

    rng = np.random.RandomState(5)
    v = np.concatenate([
        np.repeat([10.0, 20.0, 30.0], 300),          # flag A: 3 values
        np.full(500, 7.0),                           # flag B: constant
        rng.uniform(0, 100, 700).round(1),           # flag C: continuous
    ])
    f = np.array(["A"] * 900 + ["B"] * 500 + ["C"] * 700)
    w = rng.randint(1, 6, len(v))
    pd.DataFrame({
        "l_returnflag": f, "l_extendedprice": v,
        "l_quantity": w.astype(np.int64),
    }).to_parquet(tmp_path / "lineitem.parquet", index=False)

    out = weighted_median(str(tmp_path), n_bins=8).to_pandas()
    out = out.set_index("l_returnflag")
    for flag in ("A", "B", "C"):
        m = f == flag
        assert float(out.loc[flag, "wmedian"]) == _wmedian_ref(v[m], w[m])
    assert float(out.loc["B", "wmedian"]) == 7.0


# ---------------------------------------------------------------------------
# Sweep-line interval concurrency (lines_in_flight)
# ---------------------------------------------------------------------------

def test_lines_in_flight_matches_bruteforce():
    from kgray.pipelines.analytics import lines_in_flight

    out = lines_in_flight(SF).to_pandas()
    li = pd.read_parquet(SF + "/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    orders = pd.read_parquet(SF + "/orders.parquet",
                             columns=["o_orderkey", "o_orderdate"])
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    opens = j.groupby(j.o_orderdate.dt.strftime("%Y-%m-%d")).size()
    closes = li.groupby(li.l_shipdate.dt.strftime("%Y-%m-%d")).size()
    delta = opens.sub(closes, fill_value=0).astype(np.int64)
    ref = delta.cumsum()

    got = out.set_index("day")
    assert len(got) == len(ref)
    assert (got.delta == delta).all()
    assert (got.in_flight == ref.loc[got.index]).all()
    # conservation: every line that opens eventually closes
    assert int(got.delta.sum()) == 0
    assert int(got.in_flight.iloc[-1]) == 0


def test_lines_in_flight_interval_semantics(tmp_path):
    """Open on [orderdate, shipdate): a line counts on its order day and
    stops counting on its ship day; a ship-before-order line dips the
    count negative transiently but conserves to zero."""
    from kgray.pipelines.analytics import lines_in_flight

    d = pd.Timestamp("2024-01-01")
    day = pd.Timedelta(days=1)
    orders = pd.DataFrame({
        "o_orderkey": [1, 2, 3],
        "o_orderdate": [d, d + day, d + 3 * day],
    })
    li = pd.DataFrame({
        "l_orderkey": [1, 1, 2, 3],
        # order 1: two lines ship on day 2 and day 4; order 2 ships day 2;
        # order 3 ships BEFORE its order date (day 2 < day 3)
        "l_shipdate": [d + 2 * day, d + 4 * day, d + 2 * day, d + 2 * day],
    })
    orders.to_parquet(tmp_path / "orders.parquet", index=False)
    li.to_parquet(tmp_path / "lineitem.parquet", index=False)

    out = lines_in_flight(str(tmp_path)).to_pandas().set_index("day")
    assert out.loc["2024-01-01", "in_flight"] == 2   # order 1 opens x2
    assert out.loc["2024-01-02", "in_flight"] == 3   # order 2 opens
    # Jan 3: all three early lines ship, including order 3's line BEFORE
    # its own order date — its -1 lands here, its +1 lands on Jan 4
    assert out.loc["2024-01-03", "in_flight"] == 0
    assert out.loc["2024-01-04", "in_flight"] == 1   # o1 line2 still open
    assert out.loc["2024-01-05", "in_flight"] == 0
    assert int(out.delta.sum()) == 0


# ---------------------------------------------------------------------------
# Grouped mode (user_modal_event)
# ---------------------------------------------------------------------------

def test_user_modal_event_matches_pandas():
    from kgray.pipelines.analytics import user_modal_event

    out = user_modal_event(SF).to_pandas().set_index("user_id")
    ev = pd.read_parquet(SF + "/events.parquet",
                         columns=["user_id", "event_type"])
    c = ev.groupby(["user_id", "event_type"]).size().reset_index(name="cnt")
    c = c.sort_values(["user_id", "cnt", "event_type"],
                      ascending=[True, False, True], kind="mergesort")
    ref = c.drop_duplicates("user_id").set_index("user_id").sort_index()
    out = out.sort_index()
    assert len(out) == len(ref)
    assert (out.index == ref.index).all()
    assert (out.modal_type.to_numpy() == ref.event_type.to_numpy()).all()
    assert (out.cnt.to_numpy() == ref.cnt.to_numpy()).all()


def test_user_modal_event_tie_breaks_ascending(tmp_path):
    from kgray.pipelines.analytics import user_modal_event

    ev = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 2, 2],
        "event_type": ["view", "view", "click", "click", "zzz", "aaa"],
    })
    ev["ts"] = pd.Timestamp("2024-01-01")
    ev.to_parquet(tmp_path / "events.parquet", index=False)
    out = user_modal_event(str(tmp_path)).to_pandas().set_index("user_id")
    assert out.loc[1, "modal_type"] == "click"   # 2-2 tie -> ASC wins
    assert out.loc[1, "cnt"] == 2
    assert out.loc[2, "modal_type"] == "aaa"     # 1-1 tie -> ASC wins


# ---------------------------------------------------------------------------
# Peak concurrent sessions (concurrent_sessions_peak)
# ---------------------------------------------------------------------------

def _brute_peak(ev: pd.DataFrame, gap_min=30):
    g = ev.sort_values(["user_id", "ts"])
    new = g.user_id.ne(g.user_id.shift()) | (
        g.ts.diff() > pd.Timedelta(minutes=gap_min)
    )
    sid = new.cumsum()
    sess = g.groupby(sid).agg(st=("ts", "min"), en=("ts", "max"))
    s = sess.st.to_numpy("datetime64[us]").astype(np.int64)
    e = sess.en.to_numpy("datetime64[us]").astype(np.int64) + 1
    b = pd.DataFrame({
        "t": np.concatenate([s, e]),
        "d": np.concatenate([np.ones(len(s), np.int64),
                             -np.ones(len(e), np.int64)]),
    }).groupby("t", as_index=False).agg(d=("d", "sum")).sort_values("t")
    b["conc"] = b.d.cumsum()
    b["hour"] = b.t // 3_600_000_000
    return b.groupby("hour").conc.max()


def test_concurrent_sessions_matches_bruteforce():
    from kgray.pipelines.analytics import concurrent_sessions_peak

    out = concurrent_sessions_peak(SF).to_pandas().set_index("hour")
    ev = pd.read_parquet(SF + "/events.parquet", columns=["user_id", "ts"])
    ref = _brute_peak(ev)
    assert len(out) == len(ref)
    assert (out.loc[ref.index].peak_concurrent == ref).all()


def test_concurrent_sessions_range_carry(tmp_path):
    """Sessions spanning many range slices: with n_ranges=4 the running
    count must carry correctly across slice borders (a long session that
    opens in slice 0 stays counted in slice 3)."""
    from kgray.pipelines.analytics import concurrent_sessions_peak

    d = pd.Timestamp("2024-01-01")
    h = pd.Timedelta(hours=1)
    rows = []
    # user 1: one long session (events < 30 min apart) hours 0..10
    for i in range(0, 21):
        rows.append((1, d + i * 0.5 * h))
    # user 2: short session at hour 5 (overlaps user 1)
    rows.append((2, d + 5 * h))
    # user 3: short session at hour 20 (user 1 long gone)
    rows.append((3, d + 20 * h))
    ev = pd.DataFrame(rows, columns=["user_id", "ts"])
    ev["event_type"] = "x"
    ev["value"] = 1.0
    ev.to_parquet(tmp_path / "events.parquet", index=False)

    out = concurrent_sessions_peak(
        str(tmp_path), n_ranges=4
    ).to_pandas().set_index("hour")
    ref = _brute_peak(ev)
    assert (out.loc[ref.index].peak_concurrent == ref).all()
    hour0 = int(pd.Timestamp("2024-01-01").to_datetime64().astype(
        "datetime64[us]").astype(np.int64) // 3_600_000_000)
    assert out.loc[hour0 + 5, "peak_concurrent"] == 2  # overlap hour
    assert out.loc[hour0 + 20, "peak_concurrent"] == 1


# ---------------------------------------------------------------------------
# Sliding COUNT DISTINCT (rolling_active_users)
# ---------------------------------------------------------------------------

def test_rolling_active_users_gap_semantics(tmp_path):
    """A user inactive for > window days drops out; gaps in the observed
    day set emit no row (only observed days report)."""
    from kgray.pipelines.analytics import rolling_active_users

    d = pd.Timestamp("2024-05-01")
    day = pd.Timedelta(days=1)
    rows = [
        (1, d),                 # user 1 active day 0 only
        (2, d), (2, d + 9 * day),   # user 2 active days 0 and 9
        (3, d + 9 * day),       # user 3 active day 9 only
    ]
    ev = pd.DataFrame(rows, columns=["user_id", "ts"])
    ev["event_type"] = "x"
    ev.to_parquet(tmp_path / "events.parquet", index=False)

    out = rolling_active_users(str(tmp_path), window_days=7) \
        .to_pandas().set_index("day")
    d0 = int(d.to_datetime64().astype("datetime64[us]").astype(np.int64)
             // 86_400_000_000)
    # only observed days 0 and 9 report
    assert sorted(out.index) == [d0, d0 + 9]
    assert out.loc[d0, "active_users"] == 2          # users 1 and 2
    # day 9's trailing week [3..9] excludes day-0 activity
    assert out.loc[d0 + 9, "active_users"] == 2      # users 2 and 3


# ---------------------------------------------------------------------------
# Equal-width grouped histogram (events_histogram)
# ---------------------------------------------------------------------------

def test_events_histogram_conservation_and_edges():
    from kgray.pipelines.analytics import events_histogram

    out = events_histogram(SF).to_pandas()
    ev = pd.read_parquet(SF + "/events.parquet",
                         columns=["event_type", "value"])
    # every event lands in exactly one bin
    assert int(out.n.sum()) == len(ev)
    per_type = out.groupby("event_type").n.sum()
    ref = ev.groupby("event_type").size()
    assert (per_type.sort_index() == ref.sort_index()).all()
    # bins tile [min, max] without gaps and the top value is included
    lo, hi = ev.value.min(), ev.value.max()
    w = (hi - lo) / 16
    for _, r in out.iterrows():
        assert abs(r.bin_lo - (lo + r.bin * w)) < 1e-9
        assert 0 <= r.bin <= 15
