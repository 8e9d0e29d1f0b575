"""More TPC-H-shaped relational composites over the synthetic tables
(the testdata lacks partsupp / l_commitdate / l_shipmode, so Q4/Q7/Q10
are adapted to the columns that exist while keeping each query's
distinctive distributed shape):

- ``returned_item_ranking`` — Q10: revenue of RETURNED items per
  customer in a date window; two fact-fact repartition joins, a
  broadcast nation dimension, global top-k.
- ``nation_trade_volume``   — Q7: supplier-nation x customer-nation
  revenue matrix per ship year; combiner-first re-aggregation BETWEEN
  every join hop so each shuffle moves pre-compacted rows.
- ``order_priority_exists`` — Q4: per-priority count of orders having
  >= 1 returned lineitem (EXISTS), as a distinct-key semi repartition
  join — the fact side is never collected.

Scale posture (same as pipelines/tpch_extra): per-batch PARTIAL
aggregation before every shuffle, utils.repartition_join for
fact<->fact hops, utils.coarse_grouped_map for keyed reduces,
broadcasts only for the 25-row nation dimension, top-k as per-block
head -> driver reduce over <= blocks x k rows.
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .relational import _read
from ..utils import coarse_grouped_map, repartition_join


def _nation_lookup(sf_dir: str):
    """25-row nation dimension as a broadcast-able pandas Series
    (n_nationkey -> n_name).  Read driver-local with pyarrow — a ray.data
    read would cost ~1s of task overhead for a KB-sized table."""
    import pyarrow.parquet as pq

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"],
    ).to_pandas()
    return nation.set_index("n_nationkey")["n_name"]


# ---------------------------------------------------------------------------
# Q10: returned-item customer ranking
# ---------------------------------------------------------------------------

def returned_item_ranking(
    sf_dir: str,
    start: str = "1995-01-01",
    end: str = "1995-04-01",
    k: int = 20,
) -> "ray.data.Dataset":
    """Top-``k`` customers by revenue of RETURNED lineitems whose order
    was placed in ``[start, end)``, with nation names.

    Shape (TPC-H Q10): lineitem is filtered to l_returnflag='R' and
    partially aggregated per order key inside map_batches; the
    surviving per-order revenue joins the date-windowed orders fact via
    a repartition join on the order key, is re-aggregated per customer
    key (combiner + coarse keyed reduce), joins customer via a second
    repartition join, and picks up n_name from the broadcast 25-row
    nation dimension.  Top-k runs per block then once on <= blocks x k
    candidate rows.  Revenue is rounded half-up to 2 decimals
    (summation order differs between engines).
    """
    s, e = pd.Timestamp(start), pd.Timestamp(end)

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_returnflag"],
    )

    def li_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df.l_returnflag == "R"]
        df["rev"] = df.l_extendedprice * (1.0 - df.l_discount)
        g = df.groupby("l_orderkey", as_index=False).agg(rev=("rev", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    orders = _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )

    def o_window(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.loc[(df.o_orderdate >= s) & (df.o_orderdate < e),
                    ["o_orderkey", "o_custkey"]]
        return pa.Table.from_pandas(df, preserve_index=False)

    with_orders = repartition_join(
        li.map_batches(li_partial, batch_format="pyarrow"),
        orders.map_batches(o_window, batch_format="pyarrow"),
        left_on="l_orderkey",
        right_on="o_orderkey",
        left_types={"l_orderkey": pa.int64(), "rev": pa.float64()},
        right_types={"o_orderkey": pa.int64(), "o_custkey": pa.int64()},
    )

    def cust_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("o_custkey", as_index=False).agg(rev=("rev", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    def cust_reduce(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_custkey", as_index=False).agg(
            rev=("rev", "sum")
        )

    per_cust = coarse_grouped_map(
        with_orders.map_batches(cust_partial, batch_format="pyarrow"),
        "o_custkey",
        cust_reduce,
    )

    cust = _read(
        sf_dir, "customer",
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
    )
    named = repartition_join(
        per_cust,
        cust,
        left_on="o_custkey",
        right_on="c_custkey",
        left_types={"o_custkey": pa.int64(), "rev": pa.float64()},
        right_types={
            "c_custkey": pa.int64(),
            "c_name": pa.string(),
            "c_acctbal": pa.float64(),
            "c_nationkey": pa.int64(),
        },
    )

    n_ref = ray.put(_nation_lookup(sf_dir))
    sort_cols = ["revenue", "c_custkey"]
    asc = [False, True]

    def finish_block(df: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(n_ref)  # 25 rows, zero-copy local get
        df = df.rename(columns={"o_custkey": "c_custkey"})
        df["n_name"] = df.c_nationkey.map(lookup)
        df["revenue"] = np.floor(df.rev.to_numpy() * 100.0 + 0.5) / 100.0
        df = df[["c_custkey", "c_name", "revenue", "c_acctbal", "n_name"]]
        return df.sort_values(sort_cols, ascending=asc).head(k)

    cand = named.map_batches(
        finish_block, batch_format="pandas", batch_size=None
    ).to_pandas()
    t = cand.sort_values(sort_cols, ascending=asc).head(k).reset_index(
        drop=True
    )
    t["c_custkey"] = t["c_custkey"].astype(np.int64)
    return ray.data.from_pandas(t)


# ---------------------------------------------------------------------------
# Q7: nation trade-volume matrix
# ---------------------------------------------------------------------------

def nation_trade_volume(
    sf_dir: str, year_lo: int = 1995, year_hi: int = 1996
) -> "ray.data.Dataset":
    """Revenue shipped supplier-nation -> customer-nation per ship year,
    for ship years in ``[year_lo, year_hi]``.

    Shape (TPC-H Q7, all nation pairs kept): three fact-side hops with a
    COMBINER between each —
      1. lineitem ⋈ supplier on l_suppkey (repartition join; supplier
         scales with sf, never broadcast), supplier nation attached from
         the broadcast 25-row nation table, then re-aggregated to one
         row per (l_orderkey, supp_nation, year);
      2. ⋈ orders on the order key (repartition join), re-aggregated to
         one row per (o_custkey, supp_nation, year);
      3. ⋈ customer on the customer key (repartition join), customer
         nation from the same broadcast, final coarse keyed reduce to
         the <= 25 x 25 x years matrix.
    Each shuffle therefore moves rows already compacted by the previous
    group keys.  Revenue is quantized to integer CENTS per input row
    (floor(x*100+0.5) — the per-row double is bit-identical in any IEEE
    engine, and int64 summation is exact and order-independent), so the
    final volume matches the SQL oracle bit-for-bit with no
    summation-order slack at all.
    """
    n_ref = ray.put(_nation_lookup(sf_dir))

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount", "l_shipdate"],
    )

    def li_window(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        yr = df.l_shipdate.dt.year
        df = df[(yr >= year_lo) & (yr <= year_hi)].copy()
        df["year"] = df.l_shipdate.dt.year.astype(np.int64)
        rev = df.l_extendedprice.to_numpy() * (1.0 - df.l_discount.to_numpy())
        df["rev"] = np.floor(rev * 100.0 + 0.5).astype(np.int64)
        g = df.groupby(["l_suppkey", "l_orderkey", "year"],
                       as_index=False).agg(rev=("rev", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    with_supp = repartition_join(
        li.map_batches(li_window, batch_format="pyarrow"),
        supp,
        left_on="l_suppkey",
        right_on="s_suppkey",
        left_types={"l_suppkey": pa.int64(), "l_orderkey": pa.int64(),
                    "year": pa.int64(), "rev": pa.int64()},
        right_types={"s_suppkey": pa.int64(), "s_nationkey": pa.int64()},
    )

    def order_partial(batch: pa.Table) -> pa.Table:
        lookup = ray.get(n_ref)
        df = batch.to_pandas()
        df["supp_nation"] = df.s_nationkey.astype(np.int64).map(lookup)
        g = df.groupby(["l_orderkey", "supp_nation", "year"],
                       as_index=False).agg(rev=("rev", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    with_orders = repartition_join(
        with_supp.map_batches(order_partial, batch_format="pyarrow"),
        orders,
        left_on="l_orderkey",
        right_on="o_orderkey",
        left_types={"l_orderkey": pa.int64(), "supp_nation": pa.string(),
                    "year": pa.int64(), "rev": pa.int64()},
        right_types={"o_orderkey": pa.int64(), "o_custkey": pa.int64()},
    )

    def cust_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(["o_custkey", "supp_nation", "year"],
                       as_index=False).agg(rev=("rev", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    with_cust = repartition_join(
        with_orders.map_batches(cust_partial, batch_format="pyarrow"),
        cust,
        left_on="o_custkey",
        right_on="c_custkey",
        left_types={"o_custkey": pa.int64(), "supp_nation": pa.string(),
                    "year": pa.int64(), "rev": pa.int64()},
        right_types={"c_custkey": pa.int64(), "c_nationkey": pa.int64()},
    )

    def matrix_partial(batch: pa.Table) -> pa.Table:
        lookup = ray.get(n_ref)
        df = batch.to_pandas()
        df["cust_nation"] = df.c_nationkey.astype(np.int64).map(lookup)
        g = df.groupby(["supp_nation", "cust_nation", "year"],
                       as_index=False).agg(rev=("rev", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    def matrix_reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["supp_nation", "cust_nation", "year"],
                       as_index=False).agg(volume=("rev", "sum"))
        g["volume"] = g.volume.to_numpy().astype(np.float64) / 100.0
        return g

    return coarse_grouped_map(
        with_cust.map_batches(matrix_partial, batch_format="pyarrow"),
        ["supp_nation", "cust_nation", "year"],
        matrix_reduce,
    )


# ---------------------------------------------------------------------------
# Q4: order-priority EXISTS counts
# ---------------------------------------------------------------------------

def order_priority_exists(
    sf_dir: str, start: str = "1995-01-01", end: str = "1995-04-01"
) -> "ray.data.Dataset":
    """Per o_orderpriority: count of orders placed in ``[start, end)``
    that have AT LEAST ONE returned (l_returnflag='R') lineitem.

    Shape (TPC-H Q4's EXISTS): lineitem reduces to per-batch DISTINCT
    returned order keys (the combiner for a semi join), the date-windowed
    orders fact semi-joins those keys via utils.repartition_join
    (how='semi' — multiplicity of orders preserved, keys deduped inside
    the partition merge), and the priority rollup is one coarse keyed
    reduce.  Neither fact is ever collected on the driver.
    """
    s, e = pd.Timestamp(start), pd.Timestamp(end)

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"])

    def returned_keys(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        keys = df.loc[df.l_returnflag == "R", ["l_orderkey"]]
        return pa.Table.from_pandas(
            keys.drop_duplicates(), preserve_index=False
        )

    orders = _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )

    def o_window(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.loc[(df.o_orderdate >= s) & (df.o_orderdate < e),
                    ["o_orderkey", "o_orderpriority"]]
        return pa.Table.from_pandas(df, preserve_index=False)

    matched = repartition_join(
        orders.map_batches(o_window, batch_format="pyarrow"),
        li.map_batches(returned_keys, batch_format="pyarrow"),
        left_on="o_orderkey",
        right_on="l_orderkey",
        left_types={"o_orderkey": pa.int64(), "o_orderpriority": pa.string()},
        right_types={"l_orderkey": pa.int64()},
        how="semi",
    )

    def rollup(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_orderpriority", as_index=False).agg(
            order_count=("o_orderkey", "size")
        )
        g["order_count"] = g["order_count"].astype(np.int64)
        return g

    return coarse_grouped_map(matched, "o_orderpriority", rollup)


# ---------------------------------------------------------------------------
# Q12: shipping-latency x order-priority conditional aggregation
# ---------------------------------------------------------------------------

def latency_priority_counts(
    sf_dir: str, on_time_days: int = 90
) -> "ray.data.Dataset":
    """Per shipping-latency bucket: how many lineitems belong to
    high-priority (1-URGENT / 2-HIGH) vs lower-priority orders.

    Shape (TPC-H Q12, adapted — the testdata has no l_shipmode /
    l_commitdate, so the grouping dimension is the DERIVED latency
    bucket of l_shipdate - o_orderdate: 'early' (< 0 days), 'on-time'
    (<= ``on_time_days``), 'late'): one fact<->fact repartition join on
    the order key, then the conditional counts collapse map-side to
    <= 3 rows per batch before a tiny keyed reduce — the classic
    "join is the cost, aggregation is free" profile.  Day arithmetic
    is exact: both columns are midnight timestamps, so the timedelta
    is a whole day count and matches SQL datediff('day', ...).
    """
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    orders = _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )

    joined = repartition_join(
        li,
        orders,
        left_on="l_orderkey",
        right_on="o_orderkey",
        left_types={"l_orderkey": pa.int64(),
                    "l_shipdate": pa.timestamp("us")},
        right_types={"o_orderkey": pa.int64(),
                     "o_orderdate": pa.timestamp("us"),
                     "o_orderpriority": pa.string()},
    )

    cut = on_time_days

    def bucket_partial(df: pd.DataFrame) -> pd.DataFrame:
        days = (df.l_shipdate - df.o_orderdate).dt.days
        bucket = np.where(
            days < 0, "early", np.where(days <= cut, "on-time", "late")
        )
        high = df.o_orderpriority.isin(["1-URGENT", "2-HIGH"])
        t = pd.DataFrame({"ship_bucket": bucket, "high": high})
        g = t.groupby("ship_bucket", as_index=False).agg(
            high_line_count=("high", "sum"),
            low_line_count=("high", lambda s: (~s).sum()),
        )
        return g

    def bucket_reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("ship_bucket", as_index=False).agg(
            high_line_count=("high_line_count", "sum"),
            low_line_count=("low_line_count", "sum"),
        )
        g["high_line_count"] = g.high_line_count.astype(np.int64)
        g["low_line_count"] = g.low_line_count.astype(np.int64)
        return g

    return coarse_grouped_map(
        joined.map_batches(
            bucket_partial, batch_format="pandas", batch_size=None
        ),
        "ship_bucket",
        bucket_reduce,
        num_partitions=4,
    )


# ---------------------------------------------------------------------------
# Q20: suppliers dominating a part's shipped volume (nested aggregate)
# ---------------------------------------------------------------------------

def dominant_suppliers(sf_dir: str) -> "ray.data.Dataset":
    """Per supplier: the number of multi-supplier parts for which this
    supplier shipped MORE THAN TWICE the part's average per-supplier
    quantity (share > 2/ns) — i.e. parts whose volume the supplier
    dominates relative to its peers.

    Shape (TPC-H Q20's nested aggregate, adapted — no partsupp table,
    so "available quantity" becomes shipped quantity and the 50%
    threshold becomes a peer-relative one that discriminates when
    parts have many suppliers): the inner per-(part, supplier) sums
    compact map-side, the per-part totals are a second keyed reduce
    OVER THE ALREADY-REDUCED pair rows (never the raw fact), the
    threshold test is one part-keyed repartition join, and supplier
    names attach by a supplier-keyed join — no driver collection
    anywhere.  Quantities are integral doubles, so every sum is exact
    in any order.
    """
    li = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_quantity"],
    )

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(
            ["l_partkey", "l_suppkey"], as_index=False
        ).agg(q=("l_quantity", "sum"))

    def pair_reduce(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(
            ["l_partkey", "l_suppkey"], as_index=False
        ).agg(q=("q", "sum"))

    ps = coarse_grouped_map(
        li.map_batches(pair_partial, batch_format="pandas",
                       batch_size=None),
        ["l_partkey", "l_suppkey"],
        pair_reduce,
    ).materialize()  # two consumers: part totals + the threshold join

    def total_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("l_partkey", as_index=False).agg(
            tq=("q", "sum"), ns=("q", "size")
        )

    def total_reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_partkey", as_index=False).agg(
            tq=("tq", "sum"), ns=("ns", "sum")
        )
        return g

    pt = coarse_grouped_map(
        ps.map_batches(total_partial, batch_format="pandas",
                       batch_size=None),
        "l_partkey",
        total_reduce,
    )

    joined = repartition_join(
        ps,
        pt,
        left_on="l_partkey",
        right_on="l_partkey",
        left_types={"l_partkey": pa.int64(), "l_suppkey": pa.int64(),
                    "q": pa.float64()},
        right_types={"l_partkey": pa.int64(), "tq": pa.float64(),
                     "ns": pa.int64()},
    )

    def dominate_partial(df: pd.DataFrame) -> pd.DataFrame:
        # share > 2/ns  <=>  q * ns > 2 * tq; both sides integral
        # doubles < 2^53, so the float compare is exact
        keep = df[(df.ns >= 2) & (df.q * df.ns > 2.0 * df.tq)]
        g = keep.groupby("l_suppkey", as_index=False).agg(
            n_dominant_parts=("l_partkey", "size")
        )
        return g

    def dominate_reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_suppkey", as_index=False).agg(
            n_dominant_parts=("n_dominant_parts", "sum")
        )
        g["n_dominant_parts"] = g.n_dominant_parts.astype(np.int64)
        return g

    counts = coarse_grouped_map(
        joined.map_batches(dominate_partial, batch_format="pandas",
                           batch_size=None),
        "l_suppkey",
        dominate_reduce,
    )

    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    named = repartition_join(
        counts,
        supp,
        left_on="l_suppkey",
        right_on="s_suppkey",
        left_types={"l_suppkey": pa.int64(),
                    "n_dominant_parts": pa.int64()},
        right_types={"s_suppkey": pa.int64(), "s_name": pa.string()},
    )

    def project(df: pd.DataFrame) -> pd.DataFrame:
        out = df.rename(columns={"l_suppkey": "s_suppkey"})
        out["s_suppkey"] = out.s_suppkey.astype(np.int64)
        out["n_dominant_parts"] = out.n_dominant_parts.astype(np.int64)
        return out[["s_suppkey", "s_name", "n_dominant_parts"]]

    return named.map_batches(project, batch_format="pandas",
                             batch_size=None)


# ---------------------------------------------------------------------------
# Q21: suppliers who alone held up multi-supplier orders
# ---------------------------------------------------------------------------

def waiting_suppliers(
    sf_dir: str, late_days: int = 180, k: int = 100
) -> "ray.data.Dataset":
    """Top-``k`` suppliers by the number of finished ('F') multi-supplier
    orders in which THIS supplier shipped late (> ``late_days`` after
    the order date) and NO other supplier did.

    Shape (TPC-H Q21's EXISTS / NOT EXISTS pair, adapted — late is
    l_shipdate > o_orderdate + late_days since the testdata has no
    l_commitdate / l_receiptdate): lineitem compacts MAP-SIDE to
    per-batch (order, supplier, max shipdate) partials (any-late over
    lines == max-shipdate late, so partial max loses nothing and no
    dedicated pair shuffle is ever paid); the orders filter also runs
    map-side before the fact<->fact repartition join; then ONE
    order-keyed partition pass folds the remaining pair max, the
    EXISTS / NOT EXISTS per-order counts (ns suppliers, nl late ones)
    and the qualifying-supplier emit together; the final per-supplier
    count is a keyed reduce and top-k is per-block head -> driver over
    <= blocks x k rows.
    """
    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    )
    orders = _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_orderdate", "o_orderstatus"],
    )

    def finished(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.equal(batch.column("o_orderstatus"), "F")
        return batch.filter(mask).select(["o_orderkey", "o_orderdate"])

    def ship_partial(df: pd.DataFrame) -> pd.DataFrame:
        # batch-local combiner: max shipdate per (order, supplier) —
        # partial maxima are fold-safe, so the pair never needs its own
        # all-to-all; the order-keyed pass below finishes the max
        return df.groupby(
            ["l_orderkey", "l_suppkey"], as_index=False
        ).agg(ship=("l_shipdate", "max"))

    lag = pd.Timedelta(days=late_days)

    def lone_late(df: pd.DataFrame) -> pd.DataFrame:
        # all partial-pairs of an order are in this partition: finish
        # the per-pair max, then EXISTS another supplier == ns > 1 and
        # NOT EXISTS another late one == nl == 1
        pair = df.assign(late=df.ship > df.o_orderdate + lag).groupby(
            ["l_orderkey", "l_suppkey"], as_index=False
        ).agg(late=("late", "max"))
        g = pair.groupby("l_orderkey")
        ns = g.l_suppkey.transform("size")
        nl = g.late.transform("sum")
        keep = pair[pair.late & (ns > 1) & (nl == 1)]
        return keep[["l_suppkey"]]

    # join + grouped-reduce FUSION (utils.repartition_join post_fn): the
    # join already co-locates every row of an order key, so the
    # EXISTS/NOT-EXISTS pass runs inside the join's partition task —
    # the pair table is never re-shuffled on the same key it arrived on
    culprits = repartition_join(
        li.map_batches(ship_partial, batch_format="pandas",
                       batch_size=None),
        orders.map_batches(finished, batch_format="pyarrow"),
        left_on="l_orderkey",
        right_on="o_orderkey",
        left_types={"l_orderkey": pa.int64(), "l_suppkey": pa.int64(),
                    "ship": pa.timestamp("us")},
        right_types={"o_orderkey": pa.int64(),
                     "o_orderdate": pa.timestamp("us")},
        post_fn=lone_late,
    )

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_suppkey", as_index=False).agg(
            numwait=("l_suppkey", "size")
        )
        return g

    def count_reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_suppkey", as_index=False).agg(
            numwait=("numwait", "sum")
        )
        g["numwait"] = g.numwait.astype(np.int64)
        return g

    counts = coarse_grouped_map(
        culprits.map_batches(count_partial, batch_format="pandas",
                             batch_size=None),
        "l_suppkey",
        count_reduce,
    )

    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    named = repartition_join(
        counts,
        supp,
        left_on="l_suppkey",
        right_on="s_suppkey",
        left_types={"l_suppkey": pa.int64(), "numwait": pa.int64()},
        right_types={"s_suppkey": pa.int64(), "s_name": pa.string()},
    )

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["numwait", "s_name"], ascending=[False, True]
        ).head(k)

    cand = named.map_batches(
        block_topk, batch_format="pandas", batch_size=None
    ).to_pandas()
    t = cand.sort_values(
        ["numwait", "s_name"], ascending=[False, True]
    ).head(k).reset_index(drop=True)
    t["numwait"] = t.numwait.astype(np.int64)
    return ray.data.from_pandas(t[["s_name", "numwait"]])


# ---------------------------------------------------------------------------
# Q5: local supplier volume (customer nation == supplier nation)
# ---------------------------------------------------------------------------

def local_supplier_volume(
    sf_dir: str,
    region: str = "ASIA",
    date_lo: str = "1995-01-01",
    date_hi: str = "1997-01-01",
) -> "ray.data.Dataset":
    """(n_name, revenue): revenue from order lines where the CUSTOMER and
    the SUPPLIER sit in the same nation of ``region``, for orders placed
    in ``[date_lo, date_hi)`` — TPC-H Q5, whose distinctive feature is the
    c_nationkey = s_nationkey equality between two different dimension
    hops of the same fact row.

    Shape: the two nation keys are attached on SEPARATE fact paths —
    lineitem ⋈ supplier (repartition join; supplier scales with sf) gives
    per-(orderkey, supp_nation) cent-exact revenue partials, while
    orders(σ date) ⋈ customer (repartition join) gives each qualifying
    order's cust_nation — and the equality becomes a map-side filter
    AFTER the single orderkey-keyed join of the two paths.  The region
    membership test uses the broadcast 25-row nation⋈region dimension.
    Revenue is quantized to integer cents per input row, so the final sum
    is exact and order-independent (bit-identical to the SQL oracle).
    """
    import pyarrow.parquet as pq

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).to_pandas()
    reg = pq.read_table(
        os.path.join(sf_dir, "region.parquet"),
        columns=["r_regionkey", "r_name"],
    ).to_pandas()
    dim = nation.merge(
        reg[reg.r_name == region], left_on="n_regionkey",
        right_on="r_regionkey",
    )
    keys = set(dim.n_nationkey.astype(int))
    names = dict(zip(dim.n_nationkey.astype(int), dim.n_name))
    dim_ref = ray.put((keys, names))

    lo, hi = pd.Timestamp(date_lo), pd.Timestamp(date_hi)

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def li_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        rev = df.l_extendedprice.to_numpy() * (1.0 - df.l_discount.to_numpy())
        df["rev"] = np.floor(rev * 100.0 + 0.5).astype(np.int64)
        g = df.groupby(["l_suppkey", "l_orderkey"], as_index=False).agg(
            rev=("rev", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    li_side = repartition_join(
        li.map_batches(li_partial, batch_format="pyarrow"),
        supp,
        left_on="l_suppkey",
        right_on="s_suppkey",
        left_types={"l_suppkey": pa.int64(), "l_orderkey": pa.int64(),
                    "rev": pa.int64()},
        right_types={"s_suppkey": pa.int64(), "s_nationkey": pa.int64()},
    )

    def li_compact(batch: pa.Table) -> pa.Table:
        keys_, _ = ray.get(dim_ref)
        df = batch.to_pandas()
        df = df[df.s_nationkey.isin(keys_)]
        g = df.groupby(["l_orderkey", "s_nationkey"], as_index=False).agg(
            rev=("rev", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def o_window(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[(df.o_orderdate >= lo) & (df.o_orderdate < hi)]
        return pa.table(
            {
                "o_orderkey": pa.array(
                    df.o_orderkey.to_numpy(np.int64), pa.int64()
                ),
                "o_custkey": pa.array(
                    df.o_custkey.to_numpy(np.int64), pa.int64()
                ),
            }
        )

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    order_side = repartition_join(
        orders.map_batches(o_window, batch_format="pyarrow"),
        cust,
        left_on="o_custkey",
        right_on="c_custkey",
        left_types={"o_custkey": pa.int64(), "o_orderkey": pa.int64()},
        right_types={"c_custkey": pa.int64(), "c_nationkey": pa.int64()},
    )

    def o_compact(batch: pa.Table) -> pa.Table:
        keys_, _ = ray.get(dim_ref)
        df = batch.to_pandas()
        df = df[df.c_nationkey.isin(keys_)]
        return pa.table(
            {
                "o_orderkey": pa.array(
                    df.o_orderkey.to_numpy(np.int64), pa.int64()
                ),
                "c_nationkey": pa.array(
                    df.c_nationkey.to_numpy(np.int64), pa.int64()
                ),
            }
        )

    both = repartition_join(
        li_side.map_batches(li_compact, batch_format="pyarrow"),
        order_side.map_batches(o_compact, batch_format="pyarrow"),
        left_on="l_orderkey",
        right_on="o_orderkey",
        left_types={"l_orderkey": pa.int64(), "s_nationkey": pa.int64(),
                    "rev": pa.int64()},
        right_types={"o_orderkey": pa.int64(), "c_nationkey": pa.int64()},
    )

    def local_partial(batch: pa.Table) -> pa.Table:
        _, names_ = ray.get(dim_ref)
        df = batch.to_pandas()
        df = df[df.s_nationkey == df.c_nationkey].copy()
        df["n_name"] = df.s_nationkey.astype(np.int64).map(names_)
        g = df.groupby("n_name", as_index=False).agg(rev=("rev", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("n_name", as_index=False).agg(rev=("rev", "sum"))
        g["revenue"] = g.rev.to_numpy().astype(np.float64) / 100.0
        return g[["n_name", "revenue"]]

    return coarse_grouped_map(
        both.map_batches(local_partial, batch_format="pyarrow"),
        "n_name",
        finish,
        num_partitions=4,
    )
