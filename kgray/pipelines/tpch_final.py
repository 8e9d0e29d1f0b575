"""Final TPC-H-shaped relational composites — the remaining distinctive
distributed query shapes the suite did not yet cover (adapted to the
synthetic tables, which lack partsupp / l_commitdate / l_shipmode /
p_container; each op keeps its TPC-H twin's SHAPE, cited per function):

- ``forecast_revenue``            — Q6: pure scan-filter scalar aggregate
  (no shuffle at all — the degenerate case every engine must not
  over-plan).
- ``customer_order_distribution`` — Q13: LEFT join + double aggregation
  (count per customer including zero-order customers, then the
  distribution of those counts).
- ``top_supplier``                — Q15: windowed per-supplier revenue,
  keep every supplier tied at the global maximum (scalar-subquery-on-
  aggregate shape).
- ``small_quantity_revenue``      — Q17: per-key correlated average
  threshold applied to the key's own rows, one grouped partition pass.
- ``disjunctive_brand_revenue``   — Q19: join with a DISJUNCTION of
  multi-column conjuncts (predicate cannot be pushed to one side; the
  join must carry both sides' columns into the filter).

Scale posture identical to pipelines/tpch_more: per-batch PARTIAL
aggregation before every shuffle, utils.repartition_join for fact↔fact
hops (both sides move exactly once, hash-partitioned on the key),
utils.coarse_grouped_map for keyed reduces (vectorized per-partition
pandas, no per-group Python), money quantized to integer CENTS per
input row (floor(x*100+0.5) — bit-identical in any IEEE engine; int64
sums are exact and order-independent) so every oracle comparison is
bit-for-bit with zero summation-order slack.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .relational import _read
from ..utils import coarse_grouped_map, repartition_join


def _cents(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 100.0 + 0.5).astype(np.int64)


# ---------------------------------------------------------------------------
# Q6: forecast revenue change — scan-filter scalar aggregate
# ---------------------------------------------------------------------------

def forecast_revenue(
    sf_dir: str,
    start: str = "1995-01-01",
    end: str = "1996-01-01",
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
) -> "ray.data.Dataset":
    """One-row ``revenue = sum(l_extendedprice * l_discount)`` over the
    ship-date window with discount in [disc_lo, disc_hi] and quantity
    below ``max_qty`` (TPC-H Q6, reference shape: main.py has no
    relational ops — this is the beyond-reference suite).

    Shape: column-pruned read → vectorized filter + per-batch partial
    cents sum → one tiny global sum.  NO shuffle: the only all-to-all
    a naive engine would add here (a groupby on a constant key) is
    exactly what this op exists to avoid.
    """
    s, e = pd.Timestamp(start), pd.Timestamp(end)
    li = _read(
        sf_dir, "lineitem",
        columns=["l_shipdate", "l_discount", "l_quantity",
                 "l_extendedprice"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        m = (
            (df.l_shipdate >= s) & (df.l_shipdate < e)
            & (df.l_discount >= disc_lo) & (df.l_discount <= disc_hi)
            & (df.l_quantity < max_qty)
        )
        sel = df.loc[m]
        cents = _cents(
            (sel.l_extendedprice * sel.l_discount).to_numpy()
        ).sum() if len(sel) else 0
        return pa.table({"cents": pa.array([int(cents)], pa.int64())})

    total = li.map_batches(partial, batch_format="pyarrow").sum("cents")
    return ray.data.from_arrow(
        pa.table({"revenue": pa.array([(total or 0) / 100.0], pa.float64())})
    )


# ---------------------------------------------------------------------------
# Q13: customer order-count distribution — LEFT join + double aggregation
# ---------------------------------------------------------------------------

def customer_order_distribution(
    sf_dir: str, exclude_priority: str = "1-URGENT"
) -> "ray.data.Dataset":
    """(c_count, custdist): how many customers placed exactly ``c_count``
    qualifying orders — INCLUDING the zero-order customers a plain inner
    join would silently drop (TPC-H Q13; the comment-pattern exclusion is
    adapted to an order-priority exclusion, the only free-text-ish orders
    column the synthetic table has).

    Shape: orders partially counted per custkey inside map_batches,
    coarse-reduced to one row per customer, then customer LEFT-joins the
    counts via utils.repartition_join (zero-order customers surface as
    nulls → 0), and the count-of-counts rollup is a second keyed reduce.
    Both aggregations move pre-compacted rows only.
    """
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])

    def o_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df.o_orderpriority != exclude_priority]
        g = df.groupby("o_custkey", as_index=False).agg(
            n=("o_orderpriority", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    per_cust = coarse_grouped_map(
        orders.map_batches(o_partial, batch_format="pyarrow"),
        "o_custkey",
        lambda df: df.groupby("o_custkey", as_index=False).agg(n=("n", "sum")),
    )

    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    joined = repartition_join(
        cust,
        per_cust,
        left_on="c_custkey",
        right_on="o_custkey",
        left_types={"c_custkey": pa.int64()},
        right_types={"o_custkey": pa.int64(), "n": pa.int64()},
        how="left",
    )

    def dist_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        c = df.n.fillna(0).astype(np.int64)
        g = c.value_counts().rename_axis("c_count").reset_index(
            name="custdist"
        )
        g["custdist"] = g.custdist.astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    return coarse_grouped_map(
        joined.map_batches(dist_partial, batch_format="pyarrow"),
        "c_count",
        lambda df: df.groupby("c_count", as_index=False).agg(
            custdist=("custdist", "sum")
        ),
    )


# ---------------------------------------------------------------------------
# Q15: top supplier — scalar-subquery-on-aggregate with ties
# ---------------------------------------------------------------------------

def top_supplier(
    sf_dir: str, start: str = "1995-01-01", end: str = "1995-04-01"
) -> "ray.data.Dataset":
    """Supplier(s) whose revenue in the ship-date window equals the
    GLOBAL maximum per-supplier revenue — all ties kept, never top-1
    (TPC-H Q15's revenue view + scalar max subquery).

    Shape: windowed lineitem partially aggregated per suppkey →
    coarse keyed reduce (cents-exact) → global max is a scalar
    ``Dataset.max`` (tiny, per-supplier table) → filter == max →
    repartition join against the supplier dimension for names (supplier
    scales with sf — never broadcast).  Ties are exact because revenue
    is compared in integer cents.
    """
    s, e = pd.Timestamp(start), pd.Timestamp(end)
    li = _read(
        sf_dir, "lineitem",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[(df.l_shipdate >= s) & (df.l_shipdate < e)].copy()
        df["cents"] = _cents(
            (df.l_extendedprice * (1.0 - df.l_discount)).to_numpy()
        )
        g = df.groupby("l_suppkey", as_index=False).agg(
            cents=("cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    per_supp = coarse_grouped_map(
        li.map_batches(partial, batch_format="pyarrow"),
        "l_suppkey",
        lambda df: df.groupby("l_suppkey", as_index=False).agg(
            cents=("cents", "sum")
        ),
    ).materialize()  # consumed twice (max + filter); per-supplier-sized

    best = per_supp.max("cents")

    def keep_max(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.equal(batch.column("cents"), best))

    winners = per_supp.map_batches(keep_max, batch_format="pyarrow")

    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    named = repartition_join(
        winners,
        supp,
        left_on="l_suppkey",
        right_on="s_suppkey",
        left_types={"l_suppkey": pa.int64(), "cents": pa.int64()},
        right_types={"s_suppkey": pa.int64(), "s_name": pa.string()},
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "s_suppkey": df.l_suppkey.astype(np.int64),
                "s_name": df.s_name,
                "total_revenue": df.cents.astype(np.int64) / 100.0,
            }
        )

    return named.map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# Q17: small-quantity-order revenue — correlated per-key average
# ---------------------------------------------------------------------------

def small_quantity_revenue(
    sf_dir: str, brand: str = "Brand#2", frac: float = 0.2
) -> "ray.data.Dataset":
    """One-row ``avg_yearly``: sum(l_extendedprice)/7 over lineitems of
    ``brand`` parts whose quantity is below ``frac`` x that PART'S OWN
    average quantity (TPC-H Q17's correlated scalar subquery; the
    p_container filter is dropped — the synthetic part table has no
    container column).

    Shape: part is filtered to the brand and semi-filters lineitem via
    ONE repartition join on the part key; because the join lands every
    row of a part key in one partition, the correlated average, the
    per-row threshold filter, and the partial revenue sum all happen in
    the SAME grouped partition pass — no second shuffle, no broadcast
    of a per-key threshold table.  Quantities are integral in this
    corpus, so the mean is computed from exact int64 sums and the
    threshold comparison is bit-identical to the SQL oracle's
    ``sum::DOUBLE / count`` form.
    """
    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])

    def brand_keys(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = df.loc[df.p_brand == brand, ["p_partkey"]]
        return pa.Table.from_pandas(out, preserve_index=False)

    li = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )

    def per_part_filter_sum(df: pd.DataFrame) -> pd.DataFrame:
        # all rows of a part key are in this partition by construction:
        # correlated avg + threshold filter + partial sum in one pass
        qty = df.l_quantity.to_numpy()
        qsum = df.groupby("l_partkey").l_quantity.transform("sum").to_numpy()
        qcnt = df.groupby("l_partkey").l_quantity.transform("size").to_numpy()
        thr = frac * (qsum / qcnt)
        sel = df.loc[qty < thr]
        cents = _cents(sel.l_extendedprice.to_numpy()).sum() if len(sel) else 0
        return pd.DataFrame({"cents": [int(cents)]})

    # fused (post_fn): the semi join is part-keyed, so the correlated
    # pass runs inside the join task — the docstring's "no second
    # shuffle" now holds literally
    partials = repartition_join(
        li,
        part.map_batches(brand_keys, batch_format="pyarrow"),
        left_on="l_partkey",
        right_on="p_partkey",
        left_types={"l_partkey": pa.int64(), "l_quantity": pa.float64(),
                    "l_extendedprice": pa.float64()},
        right_types={"p_partkey": pa.int64()},
        how="semi",
        post_fn=per_part_filter_sum,
    )
    total = partials.sum("cents")
    return ray.data.from_arrow(
        pa.table(
            {"avg_yearly": pa.array([((total or 0) / 100.0) / 7.0],
                                    pa.float64())}
        )
    )


# ---------------------------------------------------------------------------
# Q19: disjunctive multi-column join predicate
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Q2: cheapest supplier per part — grouped argmin + dimension joins
# ---------------------------------------------------------------------------

def cheapest_supplier_per_part(
    sf_dir: str, p_type: str = "SMALL"
) -> "ray.data.Dataset":
    """For every part of ``p_type``, the supplier offering the minimum
    observed unit price (cents of l_extendedprice/l_quantity), ties
    broken by the smaller suppkey (TPC-H Q2's correlated min-cost
    subquery; partsupp does not exist in the synthetic tables, so the
    supply relation is DERIVED from the lineitem fact — "cheapest
    supplier this part was ever bought from").

    Shape: lineitem partially ARGMIN-reduced per partkey inside each
    batch (carrying the winning suppkey with the min), coarse keyed
    reduce finishes the argmin, then one repartition semi/inner hop per
    dimension: part (type filter + name) and supplier (name + nation),
    nation from the 25-row broadcast.  The fact moves once; everything
    after is per-part-sized.
    """
    from .tpch_more import _nation_lookup

    li = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"],
    )

    def argmin_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["unit_cents"] = np.floor(
            df.l_extendedprice.to_numpy() * 100.0
            / df.l_quantity.to_numpy() + 0.5
        ).astype(np.int64)
        df = df.sort_values(["l_partkey", "unit_cents", "l_suppkey"])
        g = df.drop_duplicates("l_partkey", keep="first")
        return pa.Table.from_pandas(
            g[["l_partkey", "l_suppkey", "unit_cents"]], preserve_index=False
        )

    def argmin_reduce(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["l_partkey", "unit_cents", "l_suppkey"])
        return df.drop_duplicates("l_partkey", keep="first")

    per_part = coarse_grouped_map(
        li.map_batches(argmin_partial, batch_format="pyarrow"),
        "l_partkey",
        argmin_reduce,
    )

    part = _read(sf_dir, "part", columns=["p_partkey", "p_name", "p_type"])

    def type_filter(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = df.loc[df.p_type == p_type, ["p_partkey", "p_name"]]
        return pa.Table.from_pandas(out, preserve_index=False)

    with_part = repartition_join(
        per_part,
        part.map_batches(type_filter, batch_format="pyarrow"),
        left_on="l_partkey",
        right_on="p_partkey",
        left_types={"l_partkey": pa.int64(), "l_suppkey": pa.int64(),
                    "unit_cents": pa.int64()},
        right_types={"p_partkey": pa.int64(), "p_name": pa.string()},
    )

    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_name",
                                              "s_nationkey"])
    named = repartition_join(
        with_part,
        supp,
        left_on="l_suppkey",
        right_on="s_suppkey",
        left_types={"l_suppkey": pa.int64(), "l_partkey": pa.int64(),
                    "unit_cents": pa.int64(), "p_name": pa.string()},
        right_types={"s_suppkey": pa.int64(), "s_name": pa.string(),
                     "s_nationkey": pa.int64()},
    )

    n_ref = ray.put(_nation_lookup(sf_dir))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(n_ref)
        return pd.DataFrame(
            {
                "p_partkey": df.l_partkey.astype(np.int64),
                "p_name": df.p_name,
                "s_suppkey": df.l_suppkey.astype(np.int64),
                "s_name": df.s_name,
                "n_name": df.s_nationkey.astype(np.int64).map(lookup),
                "min_unit_price": df.unit_cents.astype(np.int64) / 100.0,
            }
        )

    return named.map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# Q8: nation market share — conditional aggregation over a 3-fact join
# ---------------------------------------------------------------------------

def nation_market_share(
    sf_dir: str, supp_nation: str = "NATION_3", region: str = "AMERICA"
) -> "ray.data.Dataset":
    """Per order year: the share of revenue (orders placed by customers
    in ``region``) supplied by ``supp_nation`` (TPC-H Q8).

    Shape: lineitem ⋈ supplier (repartition; supplier scales with sf)
    tags each row is_target via the broadcast nation table, combiner
    compacts to (l_orderkey, year-agnostic cents, target cents) rows,
    ⋈ orders attaches the order year and customer key, ⋈ customer +
    broadcast nation→region prunes to the region, and the final keyed
    reduce emits one row per year with ``mkt_share`` as a ratio of two
    exact int64 cents sums (deterministic double).
    """
    import os
    import pyarrow.parquet as pq

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet")
    ).to_pandas()
    regiont = pq.read_table(
        os.path.join(sf_dir, "region.parquet")
    ).to_pandas()
    rkey = regiont.set_index("r_name").r_regionkey[region]
    region_nations = set(
        nation.loc[nation.n_regionkey == rkey, "n_nationkey"]
    )
    target_nations = set(
        nation.loc[nation.n_name == supp_nation, "n_nationkey"]
    )

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def li_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["cents"] = _cents(
            (df.l_extendedprice * (1.0 - df.l_discount)).to_numpy()
        )
        g = df.groupby(["l_orderkey", "l_suppkey"], as_index=False).agg(
            cents=("cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    with_supp = repartition_join(
        li.map_batches(li_partial, batch_format="pyarrow"),
        supp,
        left_on="l_suppkey",
        right_on="s_suppkey",
        left_types={"l_suppkey": pa.int64(), "l_orderkey": pa.int64(),
                    "cents": pa.int64()},
        right_types={"s_suppkey": pa.int64(), "s_nationkey": pa.int64()},
    )

    tgt = target_nations

    def order_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        is_t = df.s_nationkey.astype(np.int64).isin(tgt)
        df["target_cents"] = np.where(is_t, df.cents, 0).astype(np.int64)
        g = df.groupby("l_orderkey", as_index=False).agg(
            cents=("cents", "sum"), target_cents=("target_cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def o_proj(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = pd.DataFrame(
            {
                "o_orderkey": df.o_orderkey,
                "o_custkey": df.o_custkey,
                "o_year": df.o_orderdate.dt.year.astype(np.int64),
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    with_orders = repartition_join(
        with_supp.map_batches(order_partial, batch_format="pyarrow"),
        orders.map_batches(o_proj, batch_format="pyarrow"),
        left_on="l_orderkey",
        right_on="o_orderkey",
        left_types={"l_orderkey": pa.int64(), "cents": pa.int64(),
                    "target_cents": pa.int64()},
        right_types={"o_orderkey": pa.int64(), "o_custkey": pa.int64(),
                     "o_year": pa.int64()},
    )

    def cust_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(["o_custkey", "o_year"], as_index=False).agg(
            cents=("cents", "sum"), target_cents=("target_cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    with_cust = repartition_join(
        with_orders.map_batches(cust_partial, batch_format="pyarrow"),
        cust,
        left_on="o_custkey",
        right_on="c_custkey",
        left_types={"o_custkey": pa.int64(), "o_year": pa.int64(),
                    "cents": pa.int64(), "target_cents": pa.int64()},
        right_types={"c_custkey": pa.int64(), "c_nationkey": pa.int64()},
    )

    rn = region_nations

    def year_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df.c_nationkey.astype(np.int64).isin(rn)]
        g = df.groupby("o_year", as_index=False).agg(
            cents=("cents", "sum"), target_cents=("target_cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def year_reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_year", as_index=False).agg(
            cents=("cents", "sum"), target_cents=("target_cents", "sum")
        )
        g["mkt_share"] = (
            g.target_cents.to_numpy().astype(np.float64)
            / g.cents.to_numpy().astype(np.float64)
        )
        return g[["o_year", "mkt_share"]]

    return coarse_grouped_map(
        with_cust.map_batches(year_partial, batch_format="pyarrow"),
        "o_year",
        year_reduce,
    )


# ---------------------------------------------------------------------------
# Q9: product-line profit by supplier nation and year
# ---------------------------------------------------------------------------

def product_profit(
    sf_dir: str, name_like: str = "red"
) -> "ray.data.Dataset":
    """Profit per (supplier nation, order year) over lineitems of parts
    whose name contains ``name_like`` (TPC-H Q9; with no partsupp table
    the supply cost is proxied by p_retailprice x quantity, keeping the
    two-sided amount arithmetic that makes Q9's join tree distinctive).

    amount_cents = cents(l_extendedprice x (1-l_discount))
                 - cents(p_retailprice) x qty   — all-int64, exact.

    Shape: part name-filter → repartition join attaches retail cents to
    the fact, supplier join attaches the nation, orders join attaches
    the year; a combiner compacts between every hop, final keyed reduce
    emits the <= nations x years matrix.
    """
    from .tpch_more import _nation_lookup

    part = _read(sf_dir, "part", columns=["p_partkey", "p_name",
                                          "p_retailprice"])
    needle = name_like

    def name_filter(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df.p_name.str.contains(needle, regex=False)].copy()
        df["retail_cents"] = _cents(df.p_retailprice.to_numpy())
        return pa.Table.from_pandas(
            df[["p_partkey", "retail_cents"]], preserve_index=False
        )

    li = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_orderkey", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )

    with_part = repartition_join(
        li,
        part.map_batches(name_filter, batch_format="pyarrow"),
        left_on="l_partkey",
        right_on="p_partkey",
        left_types={"l_partkey": pa.int64(), "l_suppkey": pa.int64(),
                    "l_orderkey": pa.int64(), "l_quantity": pa.float64(),
                    "l_extendedprice": pa.float64(),
                    "l_discount": pa.float64()},
        right_types={"p_partkey": pa.int64(), "retail_cents": pa.int64()},
    )

    def amount_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        rev = _cents((df.l_extendedprice * (1.0 - df.l_discount)).to_numpy())
        cost = df.retail_cents.to_numpy().astype(np.int64) * (
            df.l_quantity.to_numpy().astype(np.int64)
        )
        df["amount_cents"] = rev - cost
        g = df.groupby(["l_suppkey", "l_orderkey"], as_index=False).agg(
            amount_cents=("amount_cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    with_supp = repartition_join(
        with_part.map_batches(amount_partial, batch_format="pyarrow"),
        supp,
        left_on="l_suppkey",
        right_on="s_suppkey",
        left_types={"l_suppkey": pa.int64(), "l_orderkey": pa.int64(),
                    "amount_cents": pa.int64()},
        right_types={"s_suppkey": pa.int64(), "s_nationkey": pa.int64()},
    )

    n_ref = ray.put(_nation_lookup(sf_dir))

    def order_partial(batch: pa.Table) -> pa.Table:
        lookup = ray.get(n_ref)
        df = batch.to_pandas()
        df["nation"] = df.s_nationkey.astype(np.int64).map(lookup)
        g = df.groupby(["l_orderkey", "nation"], as_index=False).agg(
            amount_cents=("amount_cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def o_proj(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = pd.DataFrame(
            {
                "o_orderkey": df.o_orderkey,
                "o_year": df.o_orderdate.dt.year.astype(np.int64),
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    with_orders = repartition_join(
        with_supp.map_batches(order_partial, batch_format="pyarrow"),
        orders.map_batches(o_proj, batch_format="pyarrow"),
        left_on="l_orderkey",
        right_on="o_orderkey",
        left_types={"l_orderkey": pa.int64(), "nation": pa.string(),
                    "amount_cents": pa.int64()},
        right_types={"o_orderkey": pa.int64(), "o_year": pa.int64()},
    )

    def final_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(["nation", "o_year"], as_index=False).agg(
            amount_cents=("amount_cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def final_reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["nation", "o_year"], as_index=False).agg(
            amount_cents=("amount_cents", "sum")
        )
        g["sum_profit"] = g.amount_cents.to_numpy().astype(np.float64) / 100.0
        return g[["nation", "o_year", "sum_profit"]]

    return coarse_grouped_map(
        with_orders.map_batches(final_partial, batch_format="pyarrow"),
        ["nation", "o_year"],
        final_reduce,
    )


# ---------------------------------------------------------------------------
# Q11: important parts — group aggregate vs a global-scalar threshold
# ---------------------------------------------------------------------------

def important_parts(
    sf_dir: str, fraction: float = 1.0 / 1600.0
) -> "ray.data.Dataset":
    """Parts whose total observed purchase value exceeds ``fraction`` of
    the GLOBAL purchase value (TPC-H Q11's group-sum vs scalar-subquery
    threshold; the partsupp inventory value is proxied by lineitem
    purchase value).

    Shape: per-partkey cents sum (combiner + coarse keyed reduce),
    materialized once because it is consumed twice — the global total is
    a scalar ``sum`` over the SAME per-part table (no second fact scan),
    then a vectorized filter keeps the heavy parts.  Threshold compare
    is ``value_cents x 1/fraction > total_cents`` in exact int64 when
    1/fraction is integral (the default), so no FP boundary exists.
    """
    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["cents"] = _cents(
            (df.l_extendedprice * (1.0 - df.l_discount)).to_numpy()
        )
        g = df.groupby("l_partkey", as_index=False).agg(cents=("cents", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    per_part = coarse_grouped_map(
        li.map_batches(partial, batch_format="pyarrow"),
        "l_partkey",
        lambda df: df.groupby("l_partkey", as_index=False).agg(
            cents=("cents", "sum")
        ),
    ).materialize()

    total = per_part.sum("cents") or 0
    inv = round(1.0 / fraction)

    def keep_heavy(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df.cents.to_numpy().astype(np.int64) * inv > total].copy()
        df["value"] = df.cents.astype(np.int64) / 100.0
        return pa.Table.from_pandas(
            df[["l_partkey", "value"]], preserve_index=False
        )

    return per_part.map_batches(keep_heavy, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Q16: supplier count by part attributes, with supplier exclusion
# ---------------------------------------------------------------------------

def supplier_count_by_part(
    sf_dir: str,
    exclude_brand: str = "Brand#2",
    min_acctbal: float = 1000.0,
) -> "ray.data.Dataset":
    """(p_brand, p_type, p_size, supplier_cnt): distinct suppliers that
    ever supplied each part-attribute combination — excluding parts of
    ``exclude_brand`` and suppliers with account balance below
    ``min_acctbal`` (TPC-H Q16; the comment-pattern supplier exclusion
    is adapted to an acctbal threshold, and the supply relation is
    derived from lineitem).

    Shape: lineitem compacts to DISTINCT (partkey, suppkey) pairs
    per batch, the excluded-supplier set anti-joins the pairs via
    utils.smart_join (the exclusion list is a FILTERED fraction of the
    supplier dimension — broadcast while it fits, shuffle when it
    doesn't; the adaptive call makes that decision from a row count),
    a second adaptive join attaches part attributes (brand filtered),
    then one keyed reduce counts distinct suppliers per attribute cell.
    """
    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def pair_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_acctbal"])

    def excluded(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = df.loc[df.s_acctbal < min_acctbal, ["s_suppkey"]]
        return pa.Table.from_pandas(out, preserve_index=False)

    from ..utils import smart_join

    pairs = smart_join(
        li.map_batches(pair_partial, batch_format="pyarrow"),
        supp.map_batches(excluded, batch_format="pyarrow"),
        left_on="l_suppkey",
        right_on="s_suppkey",
        left_types={"l_suppkey": pa.int64(), "l_partkey": pa.int64()},
        right_types={"s_suppkey": pa.int64()},
        how="anti",
    )

    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_brand", "p_type", "p_size"])
    exb = exclude_brand

    def brand_filter(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df.p_brand != exb].copy()
        df["p_size"] = df.p_size.astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    with_part = smart_join(
        pairs,
        part.map_batches(brand_filter, batch_format="pyarrow"),
        left_on="l_partkey",
        right_on="p_partkey",
        left_types={"l_partkey": pa.int64(), "l_suppkey": pa.int64()},
        right_types={"p_partkey": pa.int64(), "p_brand": pa.string(),
                     "p_type": pa.string(), "p_size": pa.int64()},
    )

    def count_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates(
            ["p_brand", "p_type", "p_size", "l_suppkey"]
        )
        return pa.Table.from_pandas(
            df[["p_brand", "p_type", "p_size", "l_suppkey"]],
            preserve_index=False,
        )

    def count_reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["p_brand", "p_type", "p_size"], as_index=False).agg(
            supplier_cnt=("l_suppkey", "nunique")
        )
        g["supplier_cnt"] = g.supplier_cnt.astype(np.int64)
        return g

    return coarse_grouped_map(
        with_part.map_batches(count_partial, batch_format="pyarrow"),
        ["p_brand", "p_type", "p_size"],
        count_reduce,
    )


DEFAULT_CLAUSES = (
    ("Brand#2", 1, 15, 1.0, 11.0),
    ("Brand#17", 1, 25, 10.0, 20.0),
    ("Brand#4", 1, 35, 20.0, 30.0),
)


def disjunctive_brand_revenue(
    sf_dir: str, clauses=DEFAULT_CLAUSES
) -> "ray.data.Dataset":
    """One-row ``revenue`` over lineitem⋈part rows matching ANY
    (brand, size-range, quantity-range) conjunct (TPC-H Q19's OR-of-ANDs
    — the predicate spans BOTH sides, so it can only run after the join;
    each side is still pre-pruned to the union of its own clause ranges
    before the shuffle).

    Shape: part pre-filtered to the brands/sizes any clause could match
    (attaching p_brand/p_size), lineitem pre-filtered to the quantity
    hull, ONE repartition join on the part key, then the vectorized
    disjunction + per-batch partial cents sum → scalar total.
    """
    brands = {c[0] for c in clauses}
    size_hull = (min(c[1] for c in clauses), max(c[2] for c in clauses))
    qty_hull = (min(c[3] for c in clauses), max(c[4] for c in clauses))

    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])

    def part_prune(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[
            df.p_brand.isin(brands)
            & (df.p_size >= size_hull[0]) & (df.p_size <= size_hull[1])
        ]
        df = df.copy()
        df["p_size"] = df.p_size.astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    li = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def li_prune(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[(df.l_quantity >= qty_hull[0]) & (df.l_quantity <= qty_hull[1])]
        return pa.Table.from_pandas(df, preserve_index=False)

    joined = repartition_join(
        li.map_batches(li_prune, batch_format="pyarrow"),
        part.map_batches(part_prune, batch_format="pyarrow"),
        left_on="l_partkey",
        right_on="p_partkey",
        left_types={"l_partkey": pa.int64(), "l_quantity": pa.float64(),
                    "l_extendedprice": pa.float64(),
                    "l_discount": pa.float64()},
        right_types={"p_partkey": pa.int64(), "p_brand": pa.string(),
                     "p_size": pa.int64()},
    )

    def disjunct_sum(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"cents": [0]})
        keep = np.zeros(len(df), dtype=bool)
        for brand, slo, shi, qlo, qhi in clauses:
            keep |= (
                (df.p_brand == brand).to_numpy()
                & (df.p_size >= slo).to_numpy() & (df.p_size <= shi).to_numpy()
                & (df.l_quantity >= qlo).to_numpy()
                & (df.l_quantity <= qhi).to_numpy()
            )
        sel = df.loc[keep]
        cents = _cents(
            (sel.l_extendedprice * (1.0 - sel.l_discount)).to_numpy()
        ).sum() if len(sel) else 0
        return pd.DataFrame({"cents": [int(cents)]})

    total = joined.map_batches(
        disjunct_sum, batch_format="pandas"
    ).sum("cents")
    return ray.data.from_arrow(
        pa.table({"revenue": pa.array([(total or 0) / 100.0], pa.float64())})
    )


# ---------------------------------------------------------------------------
# Q20: excess suppliers — suppliers dominating a prefix-named part's volume
# ---------------------------------------------------------------------------

def excess_suppliers(
    sf_dir: str,
    name_prefix: str = "small",
    year_lo: str = "1996-01-01",
    year_hi: str = "1997-01-01",
) -> "ray.data.Dataset":
    """Suppliers who shipped MORE THAN HALF of a part's total shipped
    quantity within one year, for parts whose name starts with
    ``name_prefix`` (TPC-H Q20's nested-subquery shape: the per-
    (supplier, part) sum compared against a per-part scalar subquery;
    partsupp availability is proxied by shipped volume, the reference
    data model has no partsupp table).

    Shape: the fact table is filtered map-side (date window) and
    pre-aggregated per batch before its ONE hash partitioning — the
    keyed reduce yields the (partkey, suppkey, qty) supply relation.
    The part dimension arrives prefix-filtered through an adaptive
    smart_join (broadcast while the filtered subset fits, shuffle when
    it doesn't — at web scale a part dimension is NOT broadcastable
    unfiltered).  Per-part totals are a second keyed reduce over the
    SAME supply relation (no second fact scan), re-attached by partkey;
    the >50% threshold compares exact int64 quantity sums (quantities
    are integral), so no FP boundary exists.  Qualifying suppkeys
    dedup to a small set that joins the supplier + 25-row nation
    dimensions.
    """
    import numpy as _np

    lo = _np.datetime64(year_lo)
    hi = _np.datetime64(year_hi)
    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_quantity",
                        "l_shipdate"])

    def supply_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        sd = df.l_shipdate.to_numpy()
        df = df.loc[(sd >= lo) & (sd < hi)]
        df = df.assign(qty=df.l_quantity.to_numpy().astype(np.int64))
        g = df.groupby(["l_partkey", "l_suppkey"], as_index=False).agg(
            qty=("qty", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    supply = coarse_grouped_map(
        li.map_batches(supply_partial, batch_format="pyarrow"),
        ["l_partkey", "l_suppkey"],
        lambda df: df.groupby(
            ["l_partkey", "l_suppkey"], as_index=False
        ).agg(qty=("qty", "sum")),
    )

    part = _read(sf_dir, "part", columns=["p_partkey", "p_name"])
    pref = name_prefix

    def prefix_keys(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = df.loc[df.p_name.str.startswith(pref), ["p_partkey"]]
        return pa.Table.from_pandas(out, preserve_index=False)

    from ..utils import smart_join

    supply = smart_join(
        supply,
        part.map_batches(prefix_keys, batch_format="pyarrow"),
        left_on="l_partkey",
        right_on="p_partkey",
        left_types={"l_partkey": pa.int64(), "l_suppkey": pa.int64(),
                    "qty": pa.int64()},
        right_types={"p_partkey": pa.int64()},
        how="semi",
    ).materialize()  # consumed twice: per-part totals + threshold probe

    totals = coarse_grouped_map(
        supply,
        "l_partkey",
        lambda df: df.groupby("l_partkey", as_index=False).agg(
            total_qty=("qty", "sum")
        ),
    )

    probed = smart_join(
        supply,
        totals,
        left_on="l_partkey",
        right_on="l_partkey",
        left_types={"l_partkey": pa.int64(), "l_suppkey": pa.int64(),
                    "qty": pa.int64()},
        right_types={"l_partkey": pa.int64(), "total_qty": pa.int64()},
    )

    def dominating(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.loc[2 * df.qty.to_numpy() > df.total_qty.to_numpy(),
                    ["l_suppkey"]].drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    winners = coarse_grouped_map(
        probed.map_batches(dominating, batch_format="pyarrow"),
        "l_suppkey",
        lambda df: df.drop_duplicates("l_suppkey"),
    )

    supp = _read(sf_dir, "supplier",
                 columns=["s_suppkey", "s_name", "s_nationkey"])
    named = smart_join(
        winners,
        supp,
        left_on="l_suppkey",
        right_on="s_suppkey",
        left_types={"l_suppkey": pa.int64()},
        right_types={"s_suppkey": pa.int64(), "s_name": pa.string(),
                     "s_nationkey": pa.int32()},
    )

    import pyarrow.parquet as _pq

    nat = _pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nmap = ray.put(dict(zip(nat.column("n_nationkey").to_pylist(),
                            nat.column("n_name").to_pylist())))

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        m = ray.get(nmap)
        df["n_name"] = df.s_nationkey.map(m)
        return pa.Table.from_pandas(
            df[["s_name", "n_name"]], preserve_index=False
        )

    return named.map_batches(finish, batch_format="pyarrow").sort("s_name")
