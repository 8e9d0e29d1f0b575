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
