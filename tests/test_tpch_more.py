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


def test_latency_priority_counts_matches_pandas():
    from kgray.pipelines.tpch_more import latency_priority_counts

    out = latency_priority_counts(SF).to_pandas().sort_values(
        "ship_bucket"
    ).reset_index(drop=True)
    li = pd.read_parquet(SF + "/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    orders = pd.read_parquet(
        SF + "/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    days = (j.l_shipdate - j.o_orderdate).dt.days
    j["ship_bucket"] = np.where(
        days < 0, "early", np.where(days <= 90, "on-time", "late")
    )
    j["high"] = j.o_orderpriority.isin(["1-URGENT", "2-HIGH"])
    exp = j.groupby("ship_bucket", as_index=False).agg(
        high_line_count=("high", "sum"),
        low_line_count=("high", lambda s: (~s).sum()),
    ).sort_values("ship_bucket").reset_index(drop=True)
    assert out.ship_bucket.tolist() == exp.ship_bucket.tolist()
    assert out.high_line_count.tolist() == exp.high_line_count.tolist()
    assert out.low_line_count.tolist() == exp.low_line_count.tolist()
    # conservation: every joined lineitem is in exactly one bucket
    assert out.high_line_count.sum() + out.low_line_count.sum() == len(j)


def test_dominant_suppliers_matches_pandas():
    from kgray.pipelines.tpch_more import dominant_suppliers

    out = dominant_suppliers(SF).to_pandas().sort_values(
        "s_suppkey"
    ).reset_index(drop=True)
    li = pd.read_parquet(
        SF + "/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity"],
    )
    supp = pd.read_parquet(SF + "/supplier.parquet",
                           columns=["s_suppkey", "s_name"])
    ps = li.groupby(["l_partkey", "l_suppkey"], as_index=False).agg(
        q=("l_quantity", "sum")
    )
    pt = ps.groupby("l_partkey", as_index=False).agg(
        tq=("q", "sum"), ns=("q", "size")
    )
    m = ps.merge(pt, on="l_partkey")
    dom = m[(m.ns >= 2) & (m.q * m.ns > 2.0 * m.tq)]
    exp = dom.groupby("l_suppkey", as_index=False).agg(
        n_dominant_parts=("l_partkey", "size")
    ).merge(supp, left_on="l_suppkey", right_on="s_suppkey").sort_values(
        "s_suppkey"
    ).reset_index(drop=True)
    assert out.s_suppkey.tolist() == exp.s_suppkey.tolist()
    assert out.s_name.tolist() == exp.s_name.tolist()
    assert (
        out.n_dominant_parts.tolist() == exp.n_dominant_parts.tolist()
    )


def test_waiting_suppliers_matches_pandas():
    from kgray.pipelines.tpch_more import waiting_suppliers

    out = waiting_suppliers(SF, late_days=180, k=100).to_pandas()
    li = pd.read_parquet(
        SF + "/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    )
    orders = pd.read_parquet(
        SF + "/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderstatus"],
    )
    supp = pd.read_parquet(SF + "/supplier.parquet",
                           columns=["s_suppkey", "s_name"])
    f = orders[orders.o_orderstatus == "F"]
    j = li.merge(f, left_on="l_orderkey", right_on="o_orderkey")
    j["late"] = j.l_shipdate > j.o_orderdate + pd.Timedelta(days=180)
    pair = j.groupby(["l_orderkey", "l_suppkey"], as_index=False).agg(
        late=("late", "max")
    )
    g = pair.groupby("l_orderkey")
    ns = g.l_suppkey.transform("size")
    nl = g.late.transform("sum")
    culprit = pair[pair.late & (ns > 1) & (nl == 1)]
    exp = (
        culprit.groupby("l_suppkey", as_index=False)
        .agg(numwait=("l_suppkey", "size"))
        .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
        .sort_values(["numwait", "s_name"], ascending=[False, True])
        .head(100)
        .reset_index(drop=True)
    )
    assert out.s_name.tolist() == exp.s_name.tolist()
    assert out.numwait.tolist() == exp.numwait.tolist()


def test_copurchase_components_matches_union_find():
    from kgray.pipelines.analytics import (
        copurchase_components,
        part_copurchase_pairs,
    )

    out = copurchase_components(SF, min_count=2).to_pandas()
    edges = part_copurchase_pairs(SF).to_pandas()
    edges = edges[edges.n_orders >= 2]

    # reference union-find over the same thresholded edge list
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(edges.part_a, edges.part_b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    exp = {n: find(n) for n in parent}
    got = dict(zip(out.l_partkey, out.component_id))
    assert got == exp
    # every component's label is its own minimum member
    comp = out.groupby("component_id").l_partkey.min()
    assert (comp.index == comp.values).all()


def test_local_supplier_volume_matches_pandas():
    from kgray.pipelines.tpch_more import local_supplier_volume

    out = local_supplier_volume(SF).to_pandas().set_index("n_name")
    li = pd.read_parquet(SF + "/lineitem.parquet")
    o = pd.read_parquet(SF + "/orders.parquet")
    c = pd.read_parquet(SF + "/customer.parquet")
    s = pd.read_parquet(SF + "/supplier.parquet")
    n = pd.read_parquet(SF + "/nation.parquet")
    r = pd.read_parquet(SF + "/region.parquet")
    asia = n.merge(r[r.r_name == "ASIA"], left_on="n_regionkey",
                   right_on="r_regionkey")
    j = (
        li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(s, left_on="l_suppkey", right_on="s_suppkey")
    )
    j = j[
        (j.c_nationkey == j.s_nationkey)
        & (j.o_orderdate >= "1995-01-01")
        & (j.o_orderdate < "1997-01-01")
        & j.s_nationkey.isin(asia.n_nationkey)
    ]
    cents = np.floor(
        j.l_extendedprice.to_numpy() * (1.0 - j.l_discount.to_numpy())
        * 100.0 + 0.5
    ).astype(np.int64)
    ref = (
        pd.DataFrame({"k": j.s_nationkey, "rev": cents})
        .groupby("k").rev.sum()
    )
    names = n.set_index("n_nationkey").n_name
    assert len(out) == len(ref)
    for k, v in ref.items():
        assert out.loc[names[k], "revenue"] == v / 100.0
