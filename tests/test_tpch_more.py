"""Semantics tests for pipelines/tpch_more (Q10/Q7/Q4-shape composites).
Exact cross-engine parity is covered by the DuckDB oracles in
__ray_entry__; these pin invariants on sf0.001 against hand-rolled pandas."""
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _rev(df):
    return df.l_extendedprice * (1.0 - df.l_discount)


def test_returned_item_ranking_matches_pandas():
    from kgray.pipelines.tpch_more import returned_item_ranking

    out = returned_item_ranking(SF, k=10).to_pandas()
    li = pd.read_parquet(SF + "/lineitem.parquet")
    orders = pd.read_parquet(SF + "/orders.parquet")
    cust = pd.read_parquet(SF + "/customer.parquet")
    nation = pd.read_parquet(SF + "/nation.parquet")

    w = orders[(orders.o_orderdate >= "1995-01-01")
               & (orders.o_orderdate < "1995-04-01")]
    r = li[li.l_returnflag == "R"].copy()
    r["rev"] = _rev(r)
    j = r.merge(w, left_on="l_orderkey", right_on="o_orderkey")
    per = j.groupby("o_custkey", as_index=False).agg(rev=("rev", "sum"))
    per["revenue"] = np.floor(per.rev * 100.0 + 0.5) / 100.0
    exp = (
        per.merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(nation, left_on="c_nationkey", right_on="n_nationkey")
        .sort_values(["revenue", "c_custkey"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    assert out.c_custkey.tolist() == exp.c_custkey.tolist()
    assert np.allclose(out.revenue, exp.revenue)
    assert out.n_name.tolist() == exp.n_name.tolist()
    assert list(out.columns) == [
        "c_custkey", "c_name", "revenue", "c_acctbal", "n_name"
    ]


def test_nation_trade_volume_matches_pandas():
    from kgray.pipelines.tpch_more import nation_trade_volume

    out = nation_trade_volume(SF).to_pandas()
    li = pd.read_parquet(SF + "/lineitem.parquet")
    supp = pd.read_parquet(SF + "/supplier.parquet")
    orders = pd.read_parquet(SF + "/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    cust = pd.read_parquet(SF + "/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    nation = pd.read_parquet(SF + "/nation.parquet")

    w = li[li.l_shipdate.dt.year.between(1995, 1996)].copy()
    w["cents"] = np.floor(_rev(w) * 100.0 + 0.5).astype(np.int64)
    w["year"] = w.l_shipdate.dt.year.astype(np.int64)
    nn = nation.set_index("n_nationkey").n_name
    j = (
        w.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
        .merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
    )
    j["supp_nation"] = j.s_nationkey.map(nn)
    j["cust_nation"] = j.c_nationkey.map(nn)
    exp = j.groupby(["supp_nation", "cust_nation", "year"]).cents.sum() / 100.0

    got = out.set_index(["supp_nation", "cust_nation", "year"]).volume
    assert len(got) == len(exp)
    assert got.sort_index().equals(exp.sort_index().rename("volume"))


def test_order_priority_exists_counts():
    from kgray.pipelines.tpch_more import order_priority_exists

    out = order_priority_exists(SF).to_pandas()
    li = pd.read_parquet(SF + "/lineitem.parquet",
                         columns=["l_orderkey", "l_returnflag"])
    orders = pd.read_parquet(SF + "/orders.parquet")
    returned = set(li.loc[li.l_returnflag == "R", "l_orderkey"])
    w = orders[(orders.o_orderdate >= "1995-01-01")
               & (orders.o_orderdate < "1995-04-01")]
    w = w[w.o_orderkey.isin(returned)]
    exp = w.groupby("o_orderpriority").size()
    got = out.set_index("o_orderpriority").order_count
    assert got.sort_index().to_dict() == exp.sort_index().to_dict()
    # EXISTS, not a count of lineitems: every order counted at most once
    assert out.order_count.sum() == len(w)
