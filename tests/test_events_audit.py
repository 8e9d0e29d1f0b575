"""Semantics tests for events_wau (rolling 7-day distinct users),
last_event_per_user (SCD latest-row), and integrity_audit (FK orphan
counts).  Exact parity is covered by the DuckDB oracles; these pin the
semantics on sf0.001 with hand-rolled pandas."""
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_events_wau_matches_pandas():
    from kgray.pipelines.relational import events_wau

    out = events_wau(SF).to_pandas().set_index("day").sort_index()
    ev = pd.read_parquet(SF + "/events.parquet", columns=["user_id", "ts"])
    ev["day"] = ev.ts.dt.floor("D")
    pairs = ev[["day", "user_id"]].drop_duplicates()
    dau = pairs.groupby("day").user_id.nunique()
    assert out.dau.to_dict() == dau.to_dict()
    for d in out.index:
        lo = d - pd.Timedelta(days=6)
        w = pairs[(pairs.day >= lo) & (pairs.day <= d)].user_id.nunique()
        assert out.loc[d, "wau"] == w
    # WAU dominates DAU; both positive
    assert (out.wau >= out.dau).all()
    assert (out.dau > 0).all()


def test_last_event_per_user_matches_pandas():
    from kgray.pipelines.relational import last_event_per_user

    out = last_event_per_user(SF).to_pandas()
    ev = pd.read_parquet(SF + "/events.parquet")
    exp = (
        ev.sort_values(["user_id", "ts", "event_id"])
        .drop_duplicates("user_id", keep="last")
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    got = out.sort_values("user_id").reset_index(drop=True)
    assert len(got) == ev.user_id.nunique()
    assert got.user_id.tolist() == exp.user_id.tolist()
    assert got.event_id.tolist() == exp.event_id.tolist()
    assert got.ts.tolist() == exp.ts.tolist()


def test_integrity_audit_counts_and_planted_orphans(tmp_path):
    from kgray.pipelines.analytics import integrity_audit

    out = integrity_audit(SF).to_pandas().set_index("relationship")
    li = pd.read_parquet(SF + "/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    assert out.loc["lineitem.l_orderkey->orders.o_orderkey",
                   "n_child_keys"] == li.l_orderkey.nunique()
    assert out.loc["lineitem.l_partkey->part.p_partkey",
                   "n_child_keys"] == li.l_partkey.nunique()
    # the synthetic star schema is referentially intact
    assert (out.n_orphan_keys == 0).all()
    assert len(out) == 7

    # plant orphans: copy the tables, break some lineitem FKs
    import shutil

    for t in ["lineitem", "orders", "part", "supplier", "customer",
              "nation", "region"]:
        shutil.copy(f"{SF}/{t}.parquet", tmp_path / f"{t}.parquet")
    li2 = pd.read_parquet(tmp_path / "lineitem.parquet")
    li2.loc[li2.index[:5], "l_orderkey"] = [10**9 + i for i in range(5)]
    li2.to_parquet(tmp_path / "lineitem.parquet", index=False)
    out2 = integrity_audit(str(tmp_path)).to_pandas().set_index(
        "relationship"
    )
    assert out2.loc["lineitem.l_orderkey->orders.o_orderkey",
                    "n_orphan_keys"] == 5


def test_revenue_gini_matches_closed_form():
    from kgray.pipelines.relational import revenue_gini

    out = revenue_gini(SF).to_pandas()
    orders = pd.read_parquet(SF + "/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])
    cents = np.floor(orders.o_totalprice * 100.0 + 0.5).astype(np.int64)
    d = cents.groupby(orders.o_custkey).sum().reset_index()
    d.columns = ["o_custkey", "cents"]
    d = d.sort_values(["cents", "o_custkey"]).reset_index(drop=True)
    i = np.arange(1, len(d) + 1, dtype=np.float64)
    x = d.cents.to_numpy(np.float64)
    n = float(len(d))
    gini = 2.0 * (i * x).sum() / (n * x.sum()) - (n + 1.0) / n
    assert abs(out.gini.iloc[0] - gini) < 1e-6
    assert 0.0 < out.gini.iloc[0] < 1.0
    assert out.n_customers.iloc[0] == orders.o_custkey.nunique()
    assert out.total_cents.iloc[0] == cents.sum()


def test_events_gapfill_dense_spine():
    from kgray.pipelines.relational import events_gapfill

    out = events_gapfill(SF).to_pandas()
    ev = pd.read_parquet(SF + "/events.parquet",
                         columns=["event_type", "ts"])
    ev["day"] = ev.ts.dt.floor("D")
    counts = ev.groupby(["event_type", "day"]).size()
    days = pd.date_range(ev.day.min(), ev.day.max(), freq="D")
    types = ev.event_type.unique()
    # dense: every (type, day) cell present exactly once
    assert len(out) == len(days) * len(types)
    assert not out.duplicated(["event_type", "day"]).any()
    got = out.set_index(["event_type", "day"]).n_events
    for key, n in counts.items():
        assert got.loc[key] == n
    # zero-filled cells really had no events
    zeros = out[out.n_events == 0]
    for _, r in zeros.head(20).iterrows():
        assert (r.event_type, r.day) not in counts.index
    assert out.n_events.sum() == len(ev)


def test_event_anomalies_flags_planted_outliers():
    from kgray.pipelines.analytics import event_anomalies

    ev = pd.read_parquet(SF + "/events.parquet",
                         columns=["event_id", "event_type", "value"])
    mu = ev.groupby("event_type").value.transform("mean")
    sd = ev.groupby("event_type").value.transform(lambda v: v.std(ddof=0))
    z = (ev.value - mu) / sd
    exp = set(ev.event_id[np.abs(z) > 3.0])

    out = event_anomalies(SF).to_pandas()
    assert set(out.event_id) == exp
    got_z = out.set_index("event_id").z
    for eid in list(exp)[:25]:
        assert abs(got_z.loc[eid]
                   - z[ev.event_id == eid].iloc[0]) < 1e-6
    assert (np.abs(out.z) > 3.0 - 1e-9).all()


def test_repurchase_latency_matches_pandas():
    from kgray.pipelines.analytics import repurchase_latency

    out = repurchase_latency(SF).to_pandas().set_index("o_custkey")
    orders = pd.read_parquet(SF + "/orders.parquet")
    g = orders.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    gaps = g.groupby("o_custkey").o_orderdate.diff().dt.days.dropna()
    per = gaps.groupby(g.o_custkey).agg(["size", "mean", "max"])
    n_orders = g.o_custkey.value_counts()
    multi = per[per["size"] >= 1]
    assert len(out) == len(multi)
    for ck, row in multi.head(30).iterrows():
        assert out.loc[ck, "n_gaps"] == row["size"]
        assert abs(out.loc[ck, "mean_gap_days"] - row["mean"]) < 1e-6
        assert out.loc[ck, "max_gap_days"] == row["max"]
        assert out.loc[ck, "n_orders"] == n_orders[ck]
