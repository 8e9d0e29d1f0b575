"""Semantics tests for pipelines/tpch_extra (Q18/Q14/Q22-shape composites
and the windowed running total).  Exact cross-engine parity is covered by
the DuckDB oracles in __ray_entry__; these pin invariants on sf0.001."""
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_large_orders_threshold_join_and_order():
    from kgray.pipelines.tpch_extra import large_orders

    out = large_orders(SF, qty_threshold=150.0, k=20).to_pandas()
    assert (out.sum_qty > 150.0).all()
    # ranked by totalprice desc, orderkey asc; rnk dense from 1
    assert out.rnk.tolist() == list(range(1, len(out) + 1))
    keys = list(zip(-out.o_totalprice, out.o_orderkey))
    assert keys == sorted(keys)
    # recompute one order's quantity from raw lineitem
    li = pd.read_parquet(SF + "/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity"])
    row = out.iloc[0]
    assert li[li.l_orderkey == row.o_orderkey].l_quantity.sum() == \
        row.sum_qty
    # customer name attached correctly
    cust = pd.read_parquet(SF + "/customer.parquet",
                           columns=["c_custkey", "c_name"])
    assert row.c_name == \
        cust.set_index("c_custkey").loc[row.o_custkey, "c_name"]


def test_promo_revenue_matches_handrolled():
    from kgray.pipelines.tpch_extra import promo_revenue

    got = promo_revenue(SF).to_pandas().promo_revenue_pct.iloc[0]
    li = pd.read_parquet(SF + "/lineitem.parquet")
    part = pd.read_parquet(SF + "/part.parquet",
                           columns=["p_partkey", "p_type"])
    w = li[(li.l_shipdate >= "1995-09-01") & (li.l_shipdate < "1995-10-01")]
    j = w.merge(part, left_on="l_partkey", right_on="p_partkey")
    rev = j.l_extendedprice * (1.0 - j.l_discount)
    exp = 100.0 * rev[j.p_type == "PROMO"].sum() / rev.sum()
    assert abs(got - exp) < 1e-5
    assert 0.0 < got < 100.0


def test_idle_rich_customers_membership():
    from kgray.pipelines.tpch_extra import idle_rich_customers

    out = idle_rich_customers(SF, since="2000-01-01").to_pandas()
    cust = pd.read_parquet(SF + "/customer.parquet")
    orders = pd.read_parquet(SF + "/orders.parquet",
                             columns=["o_custkey", "o_orderdate"])
    avg = cust.c_acctbal[cust.c_acctbal > 0].mean()
    recent = set(
        orders.loc[orders.o_orderdate >= "2000-01-01", "o_custkey"]
    )
    rich_idle = cust[
        (cust.c_acctbal > avg) & ~cust.c_custkey.isin(recent)
    ]
    exp = rich_idle.groupby("c_mktsegment").agg(
        n_customers=("c_custkey", "size"), total_acctbal=("c_acctbal", "sum")
    )
    got = out.set_index("c_mktsegment").sort_index()
    assert got.n_customers.to_dict() == exp.n_customers.to_dict()
    for seg in exp.index:
        assert abs(got.loc[seg, "total_acctbal"]
                   - exp.loc[seg, "total_acctbal"]) < 0.01


def test_customer_running_total_is_cumulative():
    from kgray.pipelines.tpch_extra import customer_running_total

    out = customer_running_total(SF).to_pandas()
    orders = pd.read_parquet(SF + "/orders.parquet")
    assert len(out) == len(orders)
    # per customer: ordered by (date, key) the totals are the prefix sums
    g = out.sort_values(["o_custkey", "o_orderdate", "o_orderkey"]).groupby(
        "o_custkey"
    )
    for ck, grp in list(g)[:25]:
        raw = orders[orders.o_custkey == ck].sort_values(
            ["o_orderdate", "o_orderkey"]
        )
        exp = raw.o_totalprice.cumsum().to_numpy()
        assert np.allclose(grp.running_total.to_numpy(), exp, atol=0.01)
        # monotone nondecreasing (prices are positive)
        assert (np.diff(grp.running_total.to_numpy()) >= 0).all()


def test_events_winsorized_hand_checked():
    from kgray.pipelines.relational import events_winsorized

    out = events_winsorized(SF).to_pandas().set_index("event_type")
    ev = pd.read_parquet(SF + "/events.parquet",
                         columns=["event_type", "value"])
    for t, g in ev.groupby("event_type"):
        lo, hi = g.value.quantile([0.01, 0.99], interpolation="linear")
        clip = g.value.clip(lo, hi)
        row = out.loc[t]
        assert row.n == len(g)
        assert abs(row.mean_raw - g.value.mean()) < 1e-6
        assert abs(row.mean_winsorized - clip.mean()) < 1e-6
        assert row.n_clipped_low == (g.value < lo).sum()
        assert row.n_clipped_high == (g.value > hi).sum()
        # winsorizing must pull the mean toward the median
        assert row.mean_winsorized != row.mean_raw or \
            row.n_clipped_low + row.n_clipped_high == 0


def test_ship_latency_quantiles_matches_pandas():
    import numpy as np
    import pandas as pd

    from kgray.pipelines.tpch_extra import ship_latency_quantiles

    SF = "/root/testdata/sf0.001"
    out = ship_latency_quantiles(SF).to_pandas()
    li = pd.read_parquet(SF + "/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    orders = pd.read_parquet(SF + "/orders.parquet")
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    days = (
        j.l_shipdate.astype("datetime64[us]").astype("int64")
        - j.o_orderdate.astype("datetime64[us]").astype("int64")
    ) // 86_400_000_000
    for p, g in days.groupby(j.o_orderpriority):
        for q in (0.5, 0.9, 0.99):
            exp = np.floor(
                g.quantile(q, interpolation="linear") * 1e4 + 0.5
            ) / 1e4
            got = out[(out.o_orderpriority == p) & (out.q == q)]
            assert got.latency_days.iloc[0] == exp
    # latency is non-negative and quantiles are monotone in q
    piv = out.pivot(index="o_orderpriority", columns="q",
                    values="latency_days")
    assert (piv[0.5] <= piv[0.9]).all() and (piv[0.9] <= piv[0.99]).all()
    assert (out.latency_days >= 0).all()
