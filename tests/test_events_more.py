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
