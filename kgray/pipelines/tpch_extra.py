"""Hard relational composites in TPC-H shapes the suite didn't cover yet:

- ``large_orders``    — Q18: HAVING-filtered fact aggregate joined back
                        through two repartition joins, global top-k.
- ``promo_revenue``   — Q14: windowed fact scan, partial-agg by part key,
                        fact-dimension repartition join, one-row ratio.
- ``idle_rich_customers`` — Q22 shape: scalar-subquery threshold
                        (distributed moments -> one broadcast float),
                        date-windowed anti join at fact scale, segment
                        rollup.
- ``customer_running_total`` — per-customer cumulative window sum
                        (SUM OVER PARTITION BY ... ORDER BY ...) as a
                        single keyed shuffle with vectorized per-group
                        cumsum.

Scale posture, same as pipelines/analytics: per-batch PARTIAL aggregation
before every shuffle, utils.repartition_join for fact<->fact hops (both
sides move exactly once on hash(key)), utils.coarse_grouped_map for keyed
reduces, broadcasts only for true scalars, top-k as per-block head ->
driver reduce over <= blocks x k rows.
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


# ---------------------------------------------------------------------------
# Q18: large-volume orders
# ---------------------------------------------------------------------------

def large_orders(
    sf_dir: str, qty_threshold: float = 250.0, k: int = 100
) -> "ray.data.Dataset":
    """Orders whose total lineitem quantity exceeds ``qty_threshold``,
    with customer names, top-``k`` by (o_totalprice desc, o_orderkey).

    lineitem is pre-aggregated per order inside map_batches (combiner),
    the HAVING filter runs distributed after one keyed reduce, and the
    surviving keys — a data-dependent set, NOT assumed small — flow
    through two repartition joins (orders on the order key, customer on
    the customer key) rather than any driver-side broadcast.  Quantities
    are integral doubles, so sums are exact in any order.
    """
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def li_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("l_orderkey", as_index=False).agg(
            sum_qty=("l_quantity", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def having(df: pd.DataFrame) -> pd.DataFrame:
        t = df.groupby("l_orderkey", as_index=False).agg(
            sum_qty=("sum_qty", "sum")
        )
        return t[t.sum_qty > qty_threshold]

    big = coarse_grouped_map(
        li.map_batches(li_partial, batch_format="pyarrow"),
        "l_orderkey",
        having,
    )

    orders = _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    with_orders = repartition_join(
        big,
        orders,
        left_on="l_orderkey",
        right_on="o_orderkey",
        left_types={"l_orderkey": pa.int64(), "sum_qty": pa.float64()},
        right_types={
            "o_orderkey": pa.int64(),
            "o_custkey": pa.int64(),
            "o_orderdate": pa.timestamp("us"),
            "o_totalprice": pa.float64(),
        },
    )

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    named = repartition_join(
        with_orders,
        cust,
        left_on="o_custkey",
        right_on="c_custkey",
        left_types={
            "o_custkey": pa.int64(),
            "l_orderkey": pa.int64(),
            "sum_qty": pa.float64(),
            "o_orderdate": pa.timestamp("us"),
            "o_totalprice": pa.float64(),
        },
        right_types={"c_custkey": pa.int64(), "c_name": pa.string()},
    )

    sort_cols = ["o_totalprice", "l_orderkey"]
    asc = [False, True]

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(sort_cols, ascending=asc).head(k)

    cand = named.map_batches(
        block_topk, batch_format="pandas", batch_size=None
    ).to_pandas()
    t = cand.sort_values(sort_cols, ascending=asc).head(k).reset_index(
        drop=True
    )
    t["rnk"] = np.arange(1, len(t) + 1, dtype=np.int64)
    t = t.rename(columns={"l_orderkey": "o_orderkey"})
    t["o_custkey"] = t["o_custkey"].astype(np.int64)
    return ray.data.from_pandas(
        t[
            [
                "rnk", "c_name", "o_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "sum_qty",
            ]
        ]
    )


# ---------------------------------------------------------------------------
# Q14: promotion revenue share
# ---------------------------------------------------------------------------

def promo_revenue(
    sf_dir: str, start: str = "1995-09-01", end: str = "1995-10-01"
) -> "ray.data.Dataset":
    """Share of discounted revenue from PROMO parts in one ship month.

    The month's lineitems are partially aggregated per part key inside
    map_batches, joined to part via a repartition join on p_partkey
    (part is partkey-dimensional but GROWS with sf — no broadcast), and
    folded to a single row.  The ratio is rounded half-up to 6 decimals:
    summation order differs between engines, so the last ~4 of the 15
    significant digits are FP noise by construction.
    """
    s, e = pd.Timestamp(start), pd.Timestamp(end)
    li = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def li_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[(df.l_shipdate >= s) & (df.l_shipdate < e)]
        df["rev"] = df.l_extendedprice * (1.0 - df.l_discount)
        g = df.groupby("l_partkey", as_index=False).agg(rev=("rev", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    part = _read(sf_dir, "part", columns=["p_partkey", "p_type"])
    joined = repartition_join(
        li.map_batches(li_partial, batch_format="pyarrow"),
        part,
        left_on="l_partkey",
        right_on="p_partkey",
        left_types={"l_partkey": pa.int64(), "rev": pa.float64()},
        right_types={"p_partkey": pa.int64(), "p_type": pa.string()},
    )

    def moments(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        promo = df.rev.where(df.p_type == "PROMO", 0.0).sum()
        return pa.table(
            {
                "promo": pa.array([float(promo)], pa.float64()),
                "total": pa.array([float(df.rev.sum())], pa.float64()),
            }
        )

    parts = joined.map_batches(
        moments, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    ratio = 100.0 * parts.promo.sum() / parts.total.sum()
    ratio = np.floor(ratio * 1e6 + 0.5) / 1e6
    return ray.data.from_pandas(
        pd.DataFrame({"promo_revenue_pct": [ratio]})
    )


# ---------------------------------------------------------------------------
# Q22 shape: rich customers gone idle
# ---------------------------------------------------------------------------

def idle_rich_customers(
    sf_dir: str, since: str = "2000-01-01"
) -> "ray.data.Dataset":
    """Per market segment: customers with above-average (positive) account
    balance and NO order since ``since`` — count and total balance.

    The threshold is a true scalar (sum/count moments reduced
    distributed, one float returned to the driver — the only legitimate
    driver-side value here).  The "no recent order" predicate is a
    repartition anti join against the date-filtered orders fact, so
    neither side is ever collected.  total_acctbal is rounded half-up to
    2 decimals (cross-engine summation order).
    """
    cust = _read(
        sf_dir, "customer",
        columns=["c_custkey", "c_acctbal", "c_mktsegment"],
    )

    def bal_moments(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        pos = df.c_acctbal[df.c_acctbal > 0.0]
        return pa.table(
            {
                "s": pa.array([float(pos.sum())], pa.float64()),
                "n": pa.array([int(pos.size)], pa.int64()),
            }
        )

    m = cust.map_batches(
        bal_moments, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    avg_bal = m.s.sum() / float(m.n.sum())

    import pyarrow.compute as pc

    rich = cust.map_batches(
        lambda b: b.filter(pc.greater(b.column("c_acctbal"), avg_bal)),
        batch_format="pyarrow",
    )

    since_ts = pd.Timestamp(since)
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])

    def recent_keys(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        keys = df.loc[df.o_orderdate >= since_ts, ["o_custkey"]]
        return pa.Table.from_pandas(
            keys.drop_duplicates(), preserve_index=False
        )

    idle = repartition_join(
        rich,
        orders.map_batches(recent_keys, batch_format="pyarrow"),
        left_on="c_custkey",
        right_on="o_custkey",
        left_types={
            "c_custkey": pa.int64(),
            "c_acctbal": pa.float64(),
            "c_mktsegment": pa.string(),
        },
        right_types={"o_custkey": pa.int64()},
        how="anti",
    )

    def seg_rollup(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("c_mktsegment", as_index=False).agg(
            n_customers=("c_custkey", "size"),
            total_acctbal=("c_acctbal", "sum"),
        )
        g["n_customers"] = g["n_customers"].astype(np.int64)
        g["total_acctbal"] = (
            np.floor(g["total_acctbal"].to_numpy() * 100.0 + 0.5) / 100.0
        )
        return g

    return coarse_grouped_map(idle, "c_mktsegment", seg_rollup)


# ---------------------------------------------------------------------------
# window: per-customer running order total
# ---------------------------------------------------------------------------

def customer_running_total(sf_dir: str) -> "ray.data.Dataset":
    """SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY
    o_orderdate, o_orderkey) for every order — the canonical windowed
    cumulative aggregate, as ONE keyed shuffle + vectorized per-group
    cumsum (both engines accumulate left-to-right in the same order, so
    2-decimal rounding removes the only FP slack)."""
    orders = _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def running(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["o_custkey", "o_orderdate", "o_orderkey"]
        ).reset_index(drop=True)
        rt = df.groupby("o_custkey").o_totalprice.cumsum().to_numpy()
        df["running_total"] = np.floor(rt * 100.0 + 0.5) / 100.0
        return df[
            ["o_custkey", "o_orderkey", "o_orderdate", "running_total"]
        ]

    return coarse_grouped_map(orders, "o_custkey", running)


def ship_latency_quantiles(
    sf_dir: str, qs=(0.5, 0.9, 0.99)
) -> "ray.data.Dataset":
    """Order-to-ship latency distribution per order priority:
    (o_orderpriority, q, latency_days) with exact linear-interpolated
    quantiles of ``l_shipdate - o_orderdate`` in whole days — the
    fulfillment-SLA report, a cross-table DERIVED duration (neither
    table holds it) fed into grouped exact quantiles.

    Shape: one repartition join on the order key attaches the order
    date + priority to every lineitem (both facts shuffle once), the
    latency computes vectorized in int64 days, and the per-priority
    quantiles run in one priority-keyed partition pass (five groups —
    every group's latencies co-locate; at petabyte scale swap in the
    mergeable-histogram sketch of events_value_quantiles_approx).
    """
    from ..utils import coarse_grouped_map, repartition_join

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    orders = _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )

    def li_proj(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = pd.DataFrame(
            {
                "l_orderkey": df.l_orderkey,
                "ship_us": df.l_shipdate.astype("datetime64[us]").astype(
                    "int64"
                ),
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    def o_proj(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = pd.DataFrame(
            {
                "o_orderkey": df.o_orderkey,
                "order_us": df.o_orderdate.astype("datetime64[us]").astype(
                    "int64"
                ),
                "o_orderpriority": df.o_orderpriority,
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    joined = repartition_join(
        li.map_batches(li_proj, batch_format="pyarrow"),
        orders.map_batches(o_proj, batch_format="pyarrow"),
        left_on="l_orderkey",
        right_on="o_orderkey",
        left_types={"l_orderkey": pa.int64(), "ship_us": pa.int64()},
        right_types={"o_orderkey": pa.int64(), "order_us": pa.int64(),
                     "o_orderpriority": pa.string()},
    )

    q_list = list(qs)

    def latency_days(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        days = (
            (df.ship_us - df.order_us) // 86_400_000_000
        ).astype(np.int64)
        out = pd.DataFrame(
            {"o_orderpriority": df.o_orderpriority, "days": days}
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    def quantiles_partition(g: pd.DataFrame) -> pd.DataFrame:
        rows = {"o_orderpriority": [], "q": [], "latency_days": []}
        for p, gd in g.groupby("o_orderpriority", sort=False):
            vals = gd["days"].quantile(q_list, interpolation="linear")
            rows["o_orderpriority"] += [p] * len(q_list)
            rows["q"] += q_list
            rows["latency_days"] += [
                np.floor(v * 1e4 + 0.5) / 1e4 for v in vals
            ]
        return pd.DataFrame(rows)

    return coarse_grouped_map(
        joined.map_batches(latency_days, batch_format="pyarrow"),
        "o_orderpriority",
        quantiles_partition,
        num_partitions=8,
    )


# ---------------------------------------------------------------------------
# Pareto skyline (2-D dominance frontier)
# ---------------------------------------------------------------------------

def _skyline_2d(df: pd.DataFrame) -> pd.DataFrame:
    """Rows NOT dominated on (p_retailprice, p_size), minimising both.

    q dominates p iff q.price <= p.price AND q.size <= p.size with at
    least one strict.  Vectorized sort-scan: order by (price, size),
    compute each equal-price run's min size and the running min over all
    strictly cheaper runs; a row survives iff it ties its run's min AND
    beats every cheaper run's min strictly.  Duplicate (price, size)
    points never dominate each other, so whole tie groups survive
    together — the same semantics as the NOT EXISTS oracle.
    """
    if len(df) == 0:
        return df
    d = df.sort_values(
        ["p_retailprice", "p_size", "p_partkey"]
    ).reset_index(drop=True)
    price = d.p_retailprice.to_numpy(np.float64)
    size = d.p_size.to_numpy(np.int64)
    starts = np.empty(len(d), dtype=bool)
    starts[0] = True
    starts[1:] = price[1:] != price[:-1]
    gid = np.cumsum(starts) - 1
    run_min = np.minimum.reduceat(size, np.flatnonzero(starts))
    cheaper_min = np.concatenate(
        ([np.iinfo(np.int64).max], np.minimum.accumulate(run_min)[:-1])
    )
    keep = (size == run_min[gid]) & (size < cheaper_min[gid])
    return d[keep]


def part_skyline(sf_dir: str) -> "ray.data.Dataset":
    """Pareto frontier of parts minimising (p_retailprice, p_size) — the
    SKYLINE operator (Borzsony et al., ICDE 2001): every part for which
    no other part is at most as expensive AND at most as large with one
    strict improvement.

    Distributed as a frontier COMBINER with a DISTINCT-PAIR final scan:
    (1) each block reduces to its local row frontier map-side
    (sort-scan, vectorized; skyline(A∪B) ⊆ skyline(A)∪skyline(B));
    (2) the final scan runs over the DISTINCT surviving (price, size)
    coordinates only — duplicate-heavy degenerate inputs (every point
    tied, nothing dominated) collapse to one row per coordinate instead
    of landing the whole table on one worker; (3) surviving rows attach
    back with a distributed semi join on the coordinate key.  Note the
    skyline is OUTPUT-SIZED by definition (fully anti-correlated
    distinct coordinates keep everything) — step 2 is bounded by
    distinct surviving coordinates, never by tie multiplicity.
    Comparisons only (no float arithmetic), so results are bit-exact vs
    the NOT EXISTS oracle.
    """
    from ..utils import repartition_join

    part = _read(
        sf_dir, "part", columns=["p_partkey", "p_size", "p_retailprice"]
    )

    def local(batch: pa.Table) -> pa.Table:
        out = _skyline_2d(batch.to_pandas())
        return pa.Table.from_pandas(out, preserve_index=False)

    # two consumers (pair frontier + semi join back); bounded by the
    # union of per-block frontiers
    local_rows = part.map_batches(
        local, batch_format="pyarrow"
    ).materialize()

    def to_pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["p_retailprice", "p_size"]].drop_duplicates()
        d["p_partkey"] = np.int64(0)  # _skyline_2d sort filler
        return d

    def final_pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = _skyline_2d(to_pairs(df))
        return _with_sky_key(d)[["sk"]]

    pair_frontier = (
        local_rows.map_batches(
            lambda df: to_pairs(df), batch_format="pandas"
        )
        .repartition(1)  # distinct-coordinate rows, never tie-multiplied
        .map_batches(final_pairs, batch_format="pandas", batch_size=None)
    )

    keyed = local_rows.map_batches(_with_sky_key, batch_format="pandas")
    survivors = repartition_join(
        keyed,
        pair_frontier,
        "sk",
        "sk",
        {"sk": pa.string(), "p_partkey": pa.int64(),
         "p_size": pa.int32(), "p_retailprice": pa.float64()},
        {"sk": pa.string()},
        num_partitions=16,
        how="semi",
    )
    return survivors.map_batches(
        lambda df: df[["p_partkey", "p_size", "p_retailprice"]],
        batch_format="pandas",
    )


def _with_sky_key(df: pd.DataFrame) -> pd.DataFrame:
    """Exact string key for a (price, size) coordinate: float64 hex is
    lossless, so equal keys ⟺ equal coordinates (no float re-encoding)."""
    out = df.copy()
    out["sk"] = [
        float(p).hex() + "|" + str(int(s))
        for p, s in zip(out.p_retailprice, out.p_size)
    ]
    return out
