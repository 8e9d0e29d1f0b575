"""Bucketed range join (stages/rangejoin) + the operators built on it."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from kgray.stages.rangejoin import (
    point_in_interval_count,
    point_in_interval_pairs,
)

SF = "/root/testdata/sf0.001"


def _count_ds(points, intervals, **kw):
    pts = ray.data.from_pandas(
        pd.DataFrame({"p": np.asarray(points, np.int64),
                      "pid": np.arange(len(points), dtype=np.int64)})
    )
    iv = ray.data.from_pandas(
        pd.DataFrame({
            "s": np.asarray([a for a, _ in intervals], np.int64),
            "e": np.asarray([b for _, b in intervals], np.int64),
            "iid": np.arange(len(intervals), dtype=np.int64),
        })
    )
    return pts, iv


def _brute_counts(points, intervals):
    return np.array(
        [sum(1 for s, e in intervals if s <= p < e) for p in points],
        dtype=np.int64,
    )


@pytest.mark.parametrize("n_buckets", [1, 3, 64])
def test_count_matches_bruteforce_across_bucketings(n_buckets):
    rng = np.random.RandomState(7)
    points = rng.randint(0, 1000, size=200)
    starts = rng.randint(-50, 1000, size=300)
    spans = rng.randint(-20, 400, size=300)  # includes inverted intervals
    intervals = list(zip(starts, starts + spans))
    pts, iv = _count_ds(points, intervals)
    out = point_in_interval_count(
        pts, iv, "p", "pid", "s", "e", n_buckets=n_buckets,
        num_partitions=4,
    ).to_pandas().set_index("pid").sort_index()
    ref = _brute_counts(points, intervals)
    assert len(out) == len(points)  # count-0 points kept
    assert (out.n_cover.to_numpy() == ref).all()


def test_count_half_open_and_empty_interval_semantics():
    points = [5, 10, 15]
    intervals = [(5, 10), (10, 10), (12, 11), (0, 100)]
    pts, iv = _count_ds(points, intervals)
    out = point_in_interval_count(
        pts, iv, "p", "pid", "s", "e", n_buckets=4, num_partitions=2,
    ).to_pandas().set_index("pid").sort_index()
    # p=5: [5,10) + [0,100); p=10: [0,100) only (end exclusive, empty and
    # inverted intervals never match); p=15: [0,100)
    assert list(out.n_cover) == [2, 1, 1]


def test_count_no_intervals_yields_zeros():
    pts, iv = _count_ds([1, 2, 3], [])
    out = point_in_interval_count(
        pts, iv, "p", "pid", "s", "e", n_buckets=4, num_partitions=2,
    ).to_pandas()
    assert len(out) == 3 and (out.n_cover == 0).all()


def test_pairs_matches_bruteforce():
    rng = np.random.RandomState(11)
    points = rng.randint(0, 300, size=60)
    starts = rng.randint(0, 300, size=80)
    intervals = list(zip(starts, starts + rng.randint(0, 120, size=80)))
    pts, iv = _count_ds(points, intervals)
    out = point_in_interval_pairs(
        pts, iv, "p", "pid", "s", "e", "iid", n_buckets=5,
        num_partitions=3,
    ).to_pandas()
    got = set(zip(out.pid, out.iid))
    want = {
        (pi, ii)
        for pi, p in enumerate(points)
        for ii, (s, e) in enumerate(intervals)
        if s <= p < e
    }
    assert got == want  # replication never duplicates a match


def test_open_lines_at_order_matches_bruteforce():
    from kgray.pipelines.analytics import open_lines_at_order

    out = open_lines_at_order(SF).to_pandas().set_index("o_orderkey")
    li = pd.read_parquet(SF + "/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    orders = pd.read_parquet(SF + "/orders.parquet",
                             columns=["o_orderkey", "o_orderdate"])
    iv = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    s = iv.o_orderdate.to_numpy("datetime64[us]").astype(np.int64)
    e = iv.l_shipdate.to_numpy("datetime64[us]").astype(np.int64)
    # the endpoint-counting identity needs inverted intervals (the
    # testdata's ship-before-order lines) dropped first — they can never
    # cover a point but would subtract one wherever e <= p < s
    keep = e > s
    s, e = s[keep], e[keep]
    p = orders.o_orderdate.to_numpy("datetime64[us]").astype(np.int64)
    ref = (
        np.searchsorted(np.sort(s), p, side="right")
        - np.searchsorted(np.sort(e), p, side="right")
    )
    assert len(out) == len(orders)
    assert (
        out.loc[orders.o_orderkey].open_lines.to_numpy() == ref
    ).all()


def test_user_streaks_islands(tmp_path):
    from kgray.pipelines.analytics import user_streaks

    d = pd.Timestamp("2024-03-01")
    day = pd.Timedelta(days=1)
    rows = []
    # user 1: days 0,1,2, 4,5 -> longest 3, active 5 (two events on day 1
    # must not split the streak)
    for off in [0, 1, 1, 2, 4, 5]:
        rows.append((1, d + off * day + pd.Timedelta(hours=off)))
    # user 2: one day
    rows.append((2, d))
    # user 3: days 10..13 -> longest 4
    for off in range(10, 14):
        rows.append((3, d + off * day))
    ev = pd.DataFrame(rows, columns=["user_id", "ts"])
    ev["event_type"] = "x"
    ev.to_parquet(tmp_path / "events.parquet", index=False)
    out = user_streaks(str(tmp_path)).to_pandas().set_index("user_id")
    assert out.loc[1, "longest_streak"] == 3 and out.loc[1, "active_days"] == 5
    assert out.loc[2, "longest_streak"] == 1 and out.loc[2, "active_days"] == 1
    assert out.loc[3, "longest_streak"] == 4 and out.loc[3, "active_days"] == 4


def test_knn_filtered_pushes_predicate_into_kernel():
    """A query whose k nearest neighbours ALL share its label must still
    get k cross-label results — post-filtering an unfiltered top-k would
    return fewer."""
    from kgray.stages.similarity import knn_cosine_filtered

    rng = np.random.RandomState(3)
    base = rng.standard_normal(8)
    # 6 vectors nearly identical to the query, same label; 5 far, other label
    near = base + 0.01 * rng.standard_normal((6, 8))
    far = -base + 0.01 * rng.standard_normal((5, 8))
    emb = np.vstack([near, far])
    labels = np.array(["a"] * 6 + ["b"] * 5, dtype=object)
    corpus = ray.data.from_arrow(
        pa.table({
            "vec_id": pa.array(np.arange(11), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in emb]),
            "label": pa.array(labels, pa.string()),
        })
    )
    out = knn_cosine_filtered(
        corpus, base[None, :], np.array([99]), np.array(["a"], object), k=5
    ).to_pandas()
    assert len(out) == 5
    assert set(out.neighbor_id) == {6, 7, 8, 9, 10}  # only label 'b'


def test_rangejoin_no_driver_collection():
    """Both range-join variants must stay Datasets end to end — the only
    driver state is the two-scalar domain bound (an aggregate, not a
    collection)."""
    rng = np.random.RandomState(23)
    points = rng.randint(0, 5000, size=3000)
    starts = rng.randint(0, 5000, size=4000)
    intervals = list(zip(starts, starts + rng.randint(1, 300, size=4000)))
    pts, iv = _count_ds(points, intervals)

    def boom(self, *a, **k):
        raise AssertionError("driver-side collection inside range join")

    orig_take_all = ray.data.Dataset.take_all
    orig_to_pandas = ray.data.Dataset.to_pandas
    ray.data.Dataset.take_all = boom
    ray.data.Dataset.to_pandas = boom
    try:
        n1 = point_in_interval_count(
            pts, iv, "p", "pid", "s", "e", n_buckets=16, num_partitions=4,
        ).count()
        n2 = point_in_interval_pairs(
            pts, iv, "p", "pid", "s", "e", "iid", n_buckets=16,
            num_partitions=4,
        ).count()
    finally:
        ray.data.Dataset.take_all = orig_take_all
        ray.data.Dataset.to_pandas = orig_to_pandas
    assert n1 == len(points)
    assert n2 > 0


def test_empty_points_and_empty_events():
    """Zero-row inputs return typed empty results, not a crash on the
    None aggregate."""
    import pyarrow as pa
    from kgray.pipelines.analytics import concurrent_sessions_peak

    pts = ray.data.from_arrow(
        pa.schema([("p", pa.int64()), ("pid", pa.int64())]).empty_table()
    )
    iv = ray.data.from_arrow(
        pa.schema([("s", pa.int64()), ("e", pa.int64()),
                   ("iid", pa.int64())]).empty_table()
    )
    out = point_in_interval_count(pts, iv, "p", "pid", "s", "e")
    assert out.count() == 0
    assert set(out.schema().names) == {"pid", "n_cover"}
    out2 = point_in_interval_pairs(pts, iv, "p", "pid", "s", "e", "iid")
    assert out2.count() == 0


def test_concurrent_sessions_empty_events(tmp_path):
    from kgray.pipelines.analytics import concurrent_sessions_peak

    ev = pd.DataFrame({
        "user_id": pd.Series([], dtype=np.int64),
        "ts": pd.Series([], dtype="datetime64[us]"),
        "event_type": pd.Series([], dtype=object),
        "value": pd.Series([], dtype=np.float64),
    })
    ev.to_parquet(tmp_path / "events.parquet", index=False)
    out = concurrent_sessions_peak(str(tmp_path))
    assert out.count() == 0
