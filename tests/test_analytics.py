"""Kernel-level tests for pipelines/analytics: outer join semantics,
rollup level consistency, pivot conservation, pair-generation symmetry,
ordered string aggregation determinism.

The exact end-to-end values are covered by the DuckDB oracles in
__ray_entry__ (scripts/check_oracle.py); these tests pin the SEMANTICS on
small controlled inputs so a refactor that silently changes a kernel fails
here first.
"""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# repartition_join how="outer"
# ---------------------------------------------------------------------------

def test_outer_join_emits_both_unmatched_sides():
    from kgray.utils import repartition_join

    left = ray.data.from_pandas(
        pd.DataFrame({"k": [1, 2, 3], "a": [10, 20, 30]})
    )
    right = ray.data.from_pandas(
        pd.DataFrame({"kk": [2, 3, 4, 4], "b": [200, 300, 400, 401]})
    )
    out = repartition_join(
        left, right, "k", "kk",
        {"k": pa.int64(), "a": pa.int64()},
        {"kk": pa.int64(), "b": pa.int64()},
        num_partitions=4, how="outer",
    ).to_pandas().sort_values(["k", "b"]).reset_index(drop=True)

    # matched: 2, 3; left-only: 1 (b null); right-only: 4 twice (a null)
    assert len(out) == 5
    assert set(out.k) == {1, 2, 3, 4}
    row1 = out[out.k == 1]
    assert row1.a.tolist() == [10] and row1.b.isna().all()
    row4 = out[out.k == 4]
    assert sorted(row4.b.tolist()) == [400, 401] and row4.a.isna().all()
    assert out[out.k == 2].b.tolist() == [200]


def test_outer_join_right_only_partition():
    """A hash partition holding ONLY right rows must still emit them —
    regression guard for the l.empty early-return in merge_partition."""
    from kgray.utils import repartition_join

    left = ray.data.from_pandas(pd.DataFrame({"k": [1], "a": [1]}))
    right = ray.data.from_pandas(
        pd.DataFrame({"kk": list(range(100, 140)),
                      "b": list(range(40))})
    )
    out = repartition_join(
        left, right, "k", "kk",
        {"k": pa.int64(), "a": pa.int64()},
        {"kk": pa.int64(), "b": pa.int64()},
        num_partitions=8, how="outer",
    ).to_pandas()
    assert len(out) == 41
    assert set(out.k) == {1} | set(range(100, 140))


# ---------------------------------------------------------------------------
# rollup
# ---------------------------------------------------------------------------

def test_rollup_levels_are_consistent():
    from kgray.pipelines.analytics import pricing_rollup

    df = pricing_rollup(SF).to_pandas()
    fine = df[(df.l_returnflag != "ALL") & (df.l_linestatus != "ALL")]
    lv1 = df[(df.l_returnflag != "ALL") & (df.l_linestatus == "ALL")]
    lv0 = df[(df.l_returnflag == "ALL") & (df.l_linestatus == "ALL")]
    assert len(lv0) == 1
    assert lv0.n_rows.iloc[0] == fine.n_rows.sum() == lv1.n_rows.sum()
    # per-flag subtotal equals the sum of its finest rows (counts exact;
    # revenue within rounding of independently-rounded parts)
    for flag, sub in lv1.set_index("l_returnflag").iterrows():
        mine = fine[fine.l_returnflag == flag]
        assert sub.n_rows == mine.n_rows.sum()
        assert abs(sub.revenue - mine.revenue.sum()) < 0.05


# ---------------------------------------------------------------------------
# pivot
# ---------------------------------------------------------------------------

def test_pivot_conserves_rows_and_handles_missing_cells():
    from kgray.pipelines.analytics import EVENT_TYPES, events_type_pivot

    df = events_type_pivot(SF).to_pandas()
    n_events = ray.data.read_parquet(f"{SF}/events.parquet").count()
    assert df[[f"n_{t}" for t in EVENT_TYPES]].to_numpy().sum() == n_events
    assert sorted(df.hour) == sorted(set(df.hour))  # one row per hour
    # every count column is int64 (missing cells zero-filled, not NaN)
    for t in EVENT_TYPES:
        assert df[f"n_{t}"].dtype == np.int64


# ---------------------------------------------------------------------------
# co-purchase pairs
# ---------------------------------------------------------------------------

def test_copurchase_pairs_tiny_graph(tmp_path):
    """Orders {1: (a,b,c), 2: (a,b), 3: (c)} → pairs o1 = (a,b),(a,c),(b,c)
    and o2 = (a,b); degrees a=3, b=3, c=2; the duplicate (1,a) lineitem
    must count once."""
    from kgray.pipelines.analytics import (
        part_copurchase_degree,
        part_copurchase_pairs,
    )

    li = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 1, 1, 2, 2, 3],
            # duplicate (1, a) lineitem must count once
            "l_partkey": [100, 200, 300, 100, 100, 200, 300],
        }
    )
    pa.parquet.write_table(
        pa.Table.from_pandas(li), str(tmp_path / "lineitem.parquet")
    )
    deg = part_copurchase_degree(str(tmp_path), k=10).to_pandas()
    got = dict(zip(deg.part, deg.degree))
    assert got == {100: 3, 200: 3, 300: 2}
    # rnk ordering: degree desc then part asc
    assert deg.sort_values("rnk").part.tolist() == [100, 200, 300]

    pairs = part_copurchase_pairs(str(tmp_path)).to_pandas()
    pset = {(a, b): n for a, b, n in
            zip(pairs.part_a, pairs.part_b, pairs.n_orders)}
    assert pset == {(100, 200): 2, (100, 300): 1, (200, 300): 1}
    assert (pairs.part_a < pairs.part_b).all()


# ---------------------------------------------------------------------------
# ordered string aggregation
# ---------------------------------------------------------------------------

def test_string_agg_is_orderkey_ordered_regardless_of_input_order(tmp_path):
    from kgray.pipelines.analytics import customer_order_statuses

    rng = np.random.default_rng(7)
    orders = pd.DataFrame(
        {
            "o_custkey": [5] * 6 + [9] * 3,
            "o_orderkey": [13, 11, 12, 10, 15, 14, 2, 1, 3],
            "o_orderstatus": list("DBCAFE") + list("YXZ"),
        }
    ).sample(frac=1.0, random_state=3)  # shuffled input
    pa.parquet.write_table(
        pa.Table.from_pandas(orders), str(tmp_path / "orders.parquet")
    )
    out = customer_order_statuses(str(tmp_path)).to_pandas()
    got = dict(zip(out.o_custkey, out.status_seq))
    assert got == {5: "ABCDEF", 9: "XYZ"}
    assert dict(zip(out.o_custkey, out.n_orders)) == {5: 6, 9: 3}


# ---------------------------------------------------------------------------
# shipping priority
# ---------------------------------------------------------------------------

def test_q3_rank_contract():
    from kgray.pipelines.analytics import shipping_priority

    df = shipping_priority(SF, k=5).to_pandas()
    assert len(df) == 5
    assert df.rnk.tolist() == [1, 2, 3, 4, 5]
    # revenue non-increasing in rank
    assert (np.diff(df.sort_values("rnk").revenue.to_numpy()) <= 1e-9).all()


def test_user_activity_outer_covers_three_cases():
    from kgray.pipelines.analytics import user_activity_outer

    df = user_activity_outer(SF, cutoff=450000.0).to_pandas()
    assert (df[(df.n_events > 0) & (df.n_high_orders == 0)].shape[0] > 0)
    assert (df[(df.n_events == 0) & (df.n_high_orders > 0)].shape[0] > 0)
    assert (df[(df.n_events > 0) & (df.n_high_orders > 0)].shape[0] > 0)
    assert df.key.is_unique


def test_orders_above_cust_avg_decorrelated():
    from kgray.pipelines.analytics import orders_above_cust_avg

    out = orders_above_cust_avg(SF).to_pandas()
    o = pd.read_parquet(SF + "/orders.parquet",
                        columns=["o_orderkey", "o_custkey", "o_totalprice"])
    cents = np.floor(o.o_totalprice.to_numpy() * 100.0 + 0.5).astype(np.int64)
    o = o.assign(cents=cents)
    a = o.groupby("o_custkey").cents.agg(["sum", "size"])
    j = o.join(a, on="o_custkey")
    ref = j[j.cents * j["size"] > j["sum"]]
    assert set(out.o_orderkey) == set(ref.o_orderkey)
    # strictly-above: no order at exactly the average survives; every
    # customer with >= 2 distinct order values contributes >= 1 row
    got = out.set_index("o_orderkey")
    for _, r in ref.head(50).iterrows():
        assert got.loc[r.o_orderkey, "o_totalprice"] == r.cents / 100.0


def test_revenue_mom_growth_lag_semantics(tmp_path):
    from kgray.pipelines.analytics import revenue_mom_growth

    # three observed months with a GAP: 2024-01, 2024-02, 2024-05 —
    # May's prev must be February (LAG over observed months)
    rows = []
    for m, day, price in [(1, 5, 100.0), (1, 20, 50.0),
                          (2, 10, 300.0), (5, 1, 150.0)]:
        rows.append((pd.Timestamp(f"2024-{m:02d}-{day:02d}"), price, 0.0))
    li = pd.DataFrame(rows, columns=["l_shipdate", "l_extendedprice",
                                     "l_discount"])
    li.to_parquet(tmp_path / "lineitem.parquet", index=False)
    out = revenue_mom_growth(str(tmp_path)).to_pandas().set_index("month")
    assert list(out.index) == [202401, 202402, 202405]
    assert out.loc[202401, "revenue"] == 150.0
    assert np.isnan(out.loc[202401, "growth_pct"])
    assert out.loc[202402, "prev_revenue"] == 150.0
    assert out.loc[202402, "growth_pct"] == 100.0
    assert out.loc[202405, "prev_revenue"] == 300.0
    assert out.loc[202405, "growth_pct"] == -50.0


def test_association_rules_hand_example(tmp_path):
    """Baskets {1,2},{1,2},{1,3},{2}: rule 1->2 has n_both=2, n_1=3,
    n_2=3, N=4 -> support .5, confidence 2/3, lift 8/9."""
    from kgray.pipelines.analytics import association_rules

    rows = [(10, 1), (10, 2), (11, 1), (11, 2), (12, 1), (12, 3), (13, 2)]
    li = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    li["l_quantity"] = 1.0
    li.to_parquet(tmp_path / "lineitem.parquet", index=False)
    out = association_rules(str(tmp_path), min_pair_orders=2).to_pandas()
    out = out.set_index(["ante", "cons"])
    r = out.loc[(1, 2)]
    assert r.n_both == 2 and r.n_ante == 3 and r.n_cons == 3
    assert r.support == 0.5
    assert abs(r.confidence - 2 / 3) < 2e-6
    assert abs(r.lift - 8 / 9) < 2e-6
    # symmetric direction shares n_both but swaps the denominators
    r2 = out.loc[(2, 1)]
    assert r2.n_both == 2 and r2.n_ante == 3
    # the {1,3} pair appears once -> below min_pair_orders, no rule
    assert (1, 3) not in out.index and (3, 1) not in out.index
