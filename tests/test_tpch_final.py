"""Semantics tests for pipelines/tpch_final (Q6/Q13/Q15/Q17/Q19 shapes).
Exact cross-engine parity is covered by the DuckDB oracles in
__ray_entry__; these pin invariants on sf0.001 against hand-rolled pandas."""
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _cents(x):
    return np.floor(np.asarray(x) * 100.0 + 0.5).astype(np.int64)


def test_forecast_revenue_matches_pandas():
    from kgray.pipelines.tpch_final import forecast_revenue

    out = forecast_revenue(SF).to_pandas()
    li = pd.read_parquet(SF + "/lineitem.parquet")
    m = (
        (li.l_shipdate >= "1995-01-01") & (li.l_shipdate < "1996-01-01")
        & (li.l_discount >= 0.05) & (li.l_discount <= 0.07)
        & (li.l_quantity < 24)
    )
    sel = li[m]
    exp = _cents(sel.l_extendedprice * sel.l_discount).sum() / 100.0
    assert len(out) == 1
    assert out.revenue.iloc[0] == exp


def test_customer_order_distribution_includes_zero_counts():
    from kgray.pipelines.tpch_final import customer_order_distribution

    out = customer_order_distribution(SF).to_pandas()
    orders = pd.read_parquet(SF + "/orders.parquet")
    cust = pd.read_parquet(SF + "/customer.parquet", columns=["c_custkey"])
    per = (
        orders[orders.o_orderpriority != "1-URGENT"]
        .groupby("o_custkey").size()
        .reindex(cust.c_custkey, fill_value=0)
    )
    exp = per.value_counts().sort_index()
    got = out.set_index("c_count").custdist.sort_index()
    assert got.to_dict() == exp.to_dict()
    # every customer is in exactly one bucket — including the zero bucket
    assert out.custdist.sum() == len(cust)
    assert (out.c_count == 0).any() or 0 not in exp.index


def test_top_supplier_keeps_all_ties_at_exact_max():
    from kgray.pipelines.tpch_final import top_supplier

    out = top_supplier(SF).to_pandas()
    li = pd.read_parquet(SF + "/lineitem.parquet")
    supp = pd.read_parquet(SF + "/supplier.parquet")
    w = li[(li.l_shipdate >= "1995-01-01") & (li.l_shipdate < "1995-04-01")]
    cents = pd.Series(
        _cents(w.l_extendedprice * (1.0 - w.l_discount)), index=w.index
    )
    per = cents.groupby(w.l_suppkey).sum()
    best = per.max()
    winners = sorted(per[per == best].index)
    assert sorted(out.s_suppkey) == winners
    assert np.allclose(out.total_revenue, best / 100.0)
    assert set(out.s_name) == set(
        supp[supp.s_suppkey.isin(winners)].s_name
    )


def test_small_quantity_revenue_correlated_threshold():
    from kgray.pipelines.tpch_final import small_quantity_revenue

    out = small_quantity_revenue(SF).to_pandas()
    li = pd.read_parquet(SF + "/lineitem.parquet")
    part = pd.read_parquet(SF + "/part.parquet")
    keys = set(part.loc[part.p_brand == "Brand#2", "p_partkey"])
    b = li[li.l_partkey.isin(keys)]
    thr = 0.2 * b.groupby("l_partkey").l_quantity.transform("mean")
    sel = b[b.l_quantity < thr]
    exp = _cents(sel.l_extendedprice).sum() / 100.0 / 7.0
    assert len(out) == 1
    assert out.avg_yearly.iloc[0] == exp


def test_disjunctive_brand_revenue_matches_pandas():
    from kgray.pipelines.tpch_final import disjunctive_brand_revenue
    from kgray.pipelines.tpch_final import DEFAULT_CLAUSES

    out = disjunctive_brand_revenue(SF).to_pandas()
    li = pd.read_parquet(SF + "/lineitem.parquet")
    part = pd.read_parquet(SF + "/part.parquet")
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    keep = np.zeros(len(j), dtype=bool)
    for brand, slo, shi, qlo, qhi in DEFAULT_CLAUSES:
        keep |= (
            (j.p_brand == brand) & j.p_size.between(slo, shi)
            & j.l_quantity.between(qlo, qhi)
        ).to_numpy()
    sel = j[keep]
    exp = _cents(sel.l_extendedprice * (1.0 - sel.l_discount)).sum() / 100.0
    assert len(out) == 1
    assert out.revenue.iloc[0] == exp


def test_disjunctive_clauses_not_pushable_to_one_side():
    # sanity: the disjunction must differ from applying each side's hull
    # independently — i.e. some joined row passes the hulls but no clause
    li = pd.read_parquet(SF + "/lineitem.parquet")
    part = pd.read_parquet(SF + "/part.parquet")
    from kgray.pipelines.tpch_final import DEFAULT_CLAUSES

    brands = {c[0] for c in DEFAULT_CLAUSES}
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    hull = (
        j.p_brand.isin(brands)
        & j.p_size.between(1, 35) & j.l_quantity.between(1, 30)
    )
    clause = np.zeros(len(j), dtype=bool)
    for brand, slo, shi, qlo, qhi in DEFAULT_CLAUSES:
        clause |= (
            (j.p_brand == brand) & j.p_size.between(slo, shi)
            & j.l_quantity.between(qlo, qhi)
        ).to_numpy()
    assert (hull & ~clause).any()


def test_cheapest_supplier_argmin_with_ties():
    from kgray.pipelines.tpch_final import cheapest_supplier_per_part

    out = cheapest_supplier_per_part(SF).to_pandas()
    li = pd.read_parquet(SF + "/lineitem.parquet")
    part = pd.read_parquet(SF + "/part.parquet")
    li = li.copy()
    li["unit_cents"] = np.floor(
        li.l_extendedprice * 100.0 / li.l_quantity + 0.5
    ).astype(np.int64)
    win = (
        li.sort_values(["l_partkey", "unit_cents", "l_suppkey"])
        .drop_duplicates("l_partkey", keep="first")
    )
    keys = set(part.loc[part.p_type == "SMALL", "p_partkey"])
    exp = win[win.l_partkey.isin(keys)]
    got = out.set_index("p_partkey")
    assert set(got.index) == set(exp.l_partkey)
    e = exp.set_index("l_partkey")
    assert got.s_suppkey.to_dict() == e.l_suppkey.to_dict()
    assert np.allclose(
        got.min_unit_price.sort_index(),
        (e.unit_cents / 100.0).sort_index(),
    )


def test_nation_market_share_ratio_of_exact_cents():
    from kgray.pipelines.tpch_final import nation_market_share

    out = nation_market_share(SF).to_pandas()
    li = pd.read_parquet(SF + "/lineitem.parquet")
    supp = pd.read_parquet(SF + "/supplier.parquet")
    orders = pd.read_parquet(SF + "/orders.parquet")
    cust = pd.read_parquet(SF + "/customer.parquet")
    nation = pd.read_parquet(SF + "/nation.parquet")
    region = pd.read_parquet(SF + "/region.parquet")

    rkey = region.set_index("r_name").r_regionkey["AMERICA"]
    rn = set(nation.loc[nation.n_regionkey == rkey, "n_nationkey"])
    tn = set(nation.loc[nation.n_name == "NATION_3", "n_nationkey"])

    j = (
        li.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
        .merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
    )
    j = j[j.c_nationkey.isin(rn)].copy()
    j["cents"] = _cents(j.l_extendedprice * (1.0 - j.l_discount))
    j["o_year"] = j.o_orderdate.dt.year
    j["tc"] = np.where(j.s_nationkey.isin(tn), j.cents, 0)
    exp = j.groupby("o_year").apply(
        lambda g: g.tc.sum() / g.cents.sum(), include_groups=False
    )
    got = out.set_index("o_year").mkt_share.sort_index()
    assert np.allclose(got, exp.sort_index())
    assert ((out.mkt_share >= 0) & (out.mkt_share <= 1)).all()


def test_product_profit_two_sided_amount():
    from kgray.pipelines.tpch_final import product_profit

    out = product_profit(SF).to_pandas()
    li = pd.read_parquet(SF + "/lineitem.parquet")
    part = pd.read_parquet(SF + "/part.parquet")
    supp = pd.read_parquet(SF + "/supplier.parquet")
    orders = pd.read_parquet(SF + "/orders.parquet")
    nation = pd.read_parquet(SF + "/nation.parquet")

    p = part[part.p_name.str.contains("red", regex=False)]
    j = (
        li.merge(p, left_on="l_partkey", right_on="p_partkey")
        .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
        .merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(nation, left_on="s_nationkey", right_on="n_nationkey")
    )
    amount = (
        _cents(j.l_extendedprice * (1.0 - j.l_discount))
        - _cents(j.p_retailprice) * j.l_quantity.astype(np.int64)
    )
    j = j.assign(amount=amount, o_year=j.o_orderdate.dt.year)
    exp = j.groupby(["n_name", "o_year"]).amount.sum() / 100.0
    got = out.set_index(["nation", "o_year"]).sum_profit
    assert len(got) == len(exp)
    assert np.allclose(got.sort_index(), exp.sort_index())


def test_important_parts_threshold_is_exact():
    from kgray.pipelines.tpch_final import important_parts

    out = important_parts(SF).to_pandas()
    li = pd.read_parquet(SF + "/lineitem.parquet")
    cents = pd.Series(
        _cents(li.l_extendedprice * (1.0 - li.l_discount)), index=li.index
    )
    per = cents.groupby(li.l_partkey).sum()
    total = per.sum()
    exp = per[per * 1600 > total]
    assert set(out.l_partkey) == set(exp.index)
    assert np.allclose(
        out.set_index("l_partkey").value.sort_index(),
        (exp / 100.0).sort_index(),
    )


def test_supplier_count_excludes_low_balance_suppliers():
    from kgray.pipelines.tpch_final import supplier_count_by_part

    out = supplier_count_by_part(SF).to_pandas()
    li = pd.read_parquet(SF + "/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey"]).drop_duplicates()
    part = pd.read_parquet(SF + "/part.parquet")
    supp = pd.read_parquet(SF + "/supplier.parquet")
    bad = set(supp.loc[supp.s_acctbal < 1000.0, "s_suppkey"])
    li = li[~li.l_suppkey.isin(bad)]
    j = li.merge(part[part.p_brand != "Brand#2"],
                 left_on="l_partkey", right_on="p_partkey")
    exp = j.groupby(["p_brand", "p_type", "p_size"]).l_suppkey.nunique()
    got = out.set_index(["p_brand", "p_type", "p_size"]).supplier_cnt
    assert len(got) == len(exp)
    assert got.sort_index().to_dict() == exp.sort_index().to_dict()
