"""Relational demonstration pipelines over the TPC-H-ish driver tables.

These exercise the engine's generic wide operators — combiner-first grouped
aggregation, broadcast hash joins, sort/top-k, windowed and sessionized
event aggregation — each with an exact DuckDB oracle in __ray_entry__.

Scale pattern notes:
- joins: dimension sides (customer/nation/part/orders-at-sf) are broadcast
  via ``ray.put`` + per-batch pandas merge, never shuffled;
- aggregates: per-batch partial aggregation before the keyed groupby, so
  the shuffle moves one row per (key × block);
- windows/sessions: `groupby(key).map_groups` over per-key ordered pandas.
"""
from __future__ import annotations

import os
from typing import Dict

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum


def _read(sf_dir: str, name: str, columns=None) -> "ray.data.Dataset":
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{name}.parquet"), columns=columns
    )


def _round_half_up(ds: "ray.data.Dataset", cols: Dict[str, int]):
    """floor(x*10^d + 0.5)/10^d — the exact fp expression the SQL oracles
    use, so float aggregate results compare bit-identically despite
    summation-order differences between engines."""

    def fn(batch: pa.Table) -> pa.Table:
        for c, d in cols.items():
            p = float(10 ** d)
            v = np.floor(
                batch.column(c).to_numpy(zero_copy_only=False) * p + 0.5
            ) / p
            batch = batch.set_column(
                batch.schema.get_field_index(c), c, pa.array(v, pa.float64())
            )
        return batch

    return ds.map_batches(fn, batch_format="pyarrow")


def pricing_summary(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q1-shaped grouped aggregate with per-batch partials."""
    li = _read(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["revenue"] = df.l_extendedprice * (1.0 - df.l_discount)
        g = (
            df.groupby(["l_returnflag", "l_linestatus"], as_index=False)
            .agg(
                sum_qty=("l_quantity", "sum"),
                sum_base_price=("l_extendedprice", "sum"),
                revenue=("revenue", "sum"),
                n_rows=("l_quantity", "size"),
            )
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        li.map_batches(partial, batch_format="pyarrow")
        .repartition(8)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_price", alias_name="sum_base_price"),
            Sum("revenue", alias_name="revenue"),
            Sum("n_rows", alias_name="n_rows"),
        )
    )
    return _round_half_up(
        out, {"sum_qty": 2, "sum_base_price": 2, "revenue": 2}
    )


def revenue_by_nation(
    sf_dir: str, join_partitions: int = 64
) -> "ray.data.Dataset":
    """lineitem ⋈ orders ⋈ customer ⋈ nation.  nation (a FIXED 25-row
    table) is the only driver-read broadcast; customer SCALES with sf
    (1.5M rows at sf10, far more at the web tier), so the orders⋈customer
    hop goes through ``smart_join`` — broadcast while the dimension is
    provably small, automatic repartition join past the threshold, never
    an unconditional driver collect.  The fact-fact hop
    (lineitem ↔ orders on l_orderkey) is a distributed repartition join
    — orders scales with sf, so it must never be collected on the driver.
    Lineitem is pre-aggregated per l_orderkey inside map_batches before
    the join, so the join's left side carries ≤ one row per
    (orderkey × block)."""
    from ..utils import repartition_join, smart_join

    # nation is genuinely constant-sized (25 rows by TPC-H definition):
    # the one dimension a driver-local read + ray.put is always right for.
    import pyarrow.parquet as pq

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"],
    ).to_pandas()
    n_ref = ray.put(nation.set_index("n_nationkey")["n_name"])

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    def attach_nname(batch: pa.Table) -> pa.Table:
        lookup = ray.get(n_ref)  # 25 rows, zero-copy from local store
        df = batch.to_pandas()
        df["n_name"] = df.c_nationkey.map(lookup)
        return pa.Table.from_pandas(
            df[["c_custkey", "n_name"]], preserve_index=False
        )

    cust_n = cust.map_batches(attach_nname, batch_format="pyarrow")

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    # adaptive: broadcast at bench scale (customer ≤ 100k rows), shuffle
    # join automatically once the dimension outgrows a task heap
    o_n = smart_join(
        orders,
        cust_n,
        "o_custkey",
        "c_custkey",
        {"o_custkey": pa.int64(), "o_orderkey": pa.int64()},
        {"c_custkey": pa.int64(), "n_name": pa.string()},
        num_partitions=join_partitions,
    )

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def li_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["revenue"] = df.l_extendedprice * (1.0 - df.l_discount)
        g = df.groupby("l_orderkey", as_index=False).agg(
            revenue=("revenue", "sum"), n_items=("revenue", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    joined = repartition_join(
        li.map_batches(li_partial, batch_format="pyarrow"),
        o_n,
        "l_orderkey",
        "o_orderkey",
        {"l_orderkey": pa.int64(), "revenue": pa.float64(),
         "n_items": pa.int64()},
        {"o_orderkey": pa.int64(), "n_name": pa.string()},
        num_partitions=join_partitions,
    )

    def nation_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("n_name", as_index=False).agg(
            revenue=("revenue", "sum"), n_items=("n_items", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        joined.map_batches(nation_partial, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(
            Sum("revenue", alias_name="revenue"),
            Sum("n_items", alias_name="n_items"),
        )
    )
    return _round_half_up(out, {"revenue": 2})


def top_parts_by_revenue(sf_dir: str, k: int = 10) -> "ray.data.Dataset":
    """Top-k parts by lineitem revenue: partial agg → coarse-partition
    keyed reduce (utils.coarse_grouped_map — a plain 20k-group
    ``aggregate`` pays ~0.5 ms/group of Python in the reducer) → per-block
    top-k → driver-side final top-k over the ≤ blocks×k survivors.  The
    part-name dimension is attached to the FINAL k rows only — no
    broadcast of the dimension at all."""
    from ..utils import coarse_grouped_map

    li = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )

    def part_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["revenue"] = df.l_extendedprice * (1.0 - df.l_discount)
        g = df.groupby("l_partkey", as_index=False).agg(
            revenue=("revenue", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def final_reduce(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("l_partkey", as_index=False).agg(
            revenue=("revenue", "sum")
        )

    agg = coarse_grouped_map(
        li.map_batches(part_partial, batch_format="pyarrow"),
        "l_partkey",
        final_reduce,
    )

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["revenue", "l_partkey"], ascending=[False, True]
        ).head(k)

    # blocks×k candidate rows (bounded by the top-k contract, not by data
    # size) are the only driver-side collection
    cand = agg.map_batches(
        block_topk, batch_format="pandas", batch_size=None
    ).to_pandas()
    t = cand.sort_values(
        ["revenue", "l_partkey"], ascending=[False, True]
    ).head(k).reset_index(drop=True)

    import pyarrow.parquet as pq

    # dimension attach for the FINAL k rows only, with the key filter
    # pushed into the parquet read (row-group + dictionary pruning): the
    # driver reads O(k) part rows, never the sf-scaling part table
    p_df = pq.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_name"],
        filters=[("p_partkey", "in", t.l_partkey.tolist())],
    ).to_pandas()
    t = t.merge(p_df, left_on="l_partkey", right_on="p_partkey")
    # rank column makes the result order-insensitive for comparison
    t["rnk"] = np.arange(1, len(t) + 1, dtype=np.int64)
    t["revenue"] = np.floor(t["revenue"] * 100.0 + 0.5) / 100.0
    return ray.data.from_pandas(t[["rnk", "l_partkey", "p_name", "revenue"]])


def events_hourly(sf_dir: str) -> "ray.data.Dataset":
    """Tumbling 1-hour window per event_type: count + value sum."""
    ev = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["hour"] = df.ts.dt.floor("h")
        g = df.groupby(["event_type", "hour"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def final_reduce(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["event_type", "hour"], as_index=False).agg(
            n_events=("n_events", "sum"), sum_value=("sum_value", "sum")
        )

    from ..utils import coarse_grouped_map

    # coarse keyed reduce, not .aggregate(): thousands of (type, hour)
    # groups would pay per-group Python in Ray's reducer (see utils)
    out = coarse_grouped_map(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "hour"],
        final_reduce,
    )
    return _round_half_up(out, {"sum_value": 4})


def events_sessions(sf_dir: str, gap_minutes: int = 30) -> "ray.data.Dataset":
    """Sessionization: per user, a new session starts after a ≥gap silence.

    Ordered stateful logic runs inside groupby(user_id).map_groups over the
    per-user timeline (the Ray Data pattern for keyed windows); output is
    one row per session with start/end/count.
    """
    ev = _read(sf_dir, "events", columns=["user_id", "ts", "value"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def sessionize_partition(g: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pass over a partition holding THOUSANDS of whole
        # users: session breaks at user boundaries or ≥gap silences —
        # per-user map_groups would pay a Python call per user instead
        g = g.sort_values(["user_id", "ts"])
        new_user = g.user_id.ne(g.user_id.shift())
        sess = (new_user | (g.ts.diff() > gap)).cumsum()
        out = g.groupby(sess).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("value", "size"),
            sum_value=("value", "sum"),
        )
        return out.reset_index(drop=True)

    from ..utils import coarse_grouped_map

    return _round_half_up(
        coarse_grouped_map(ev, "user_id", sessionize_partition),
        {"sum_value": 4},
    )


def supplier_balance_stats(sf_dir: str) -> "ray.data.Dataset":
    """Simple multi-aggregate per nation over the supplier dimension."""
    sup = _read(sf_dir, "supplier",
                columns=["s_nationkey", "s_acctbal"])
    out = (
        sup.groupby("s_nationkey")
        .aggregate(
            Count(alias_name="n_suppliers"),
            Sum("s_acctbal", alias_name="sum_bal"),
            Min("s_acctbal", alias_name="min_bal"),
            Max("s_acctbal", alias_name="max_bal"),
        )
    )
    return _round_half_up(out, {"sum_bal": 2})


def filter_orders_high_value(sf_dir: str, cutoff: float = 100000.0):
    """Vectorized Arrow filter + projection (pushdown-style read)."""
    orders = _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_totalprice", "o_orderstatus"],
    )
    return orders.map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], cutoff)),
        batch_format="pyarrow",
    )


def _customer_vs_high_value_orders(
    sf_dir: str, cutoff: float, how: str
) -> "ray.data.Dataset":
    """customer ⋉/▷ orders-with-totalprice-over-cutoff via the distributed
    repartition join (semi keeps customers WITH such an order, anti those
    WITHOUT).  The right side is pre-collapsed to distinct custkeys per
    batch (combiner), so the shuffle carries at most one right row per
    (custkey × block) — existence needs no payload."""
    from ..utils import repartition_join

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def high_value_keys(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater(batch.column("o_totalprice"), cutoff))
        return pa.table({"o_custkey": t.column("o_custkey")}).group_by(
            "o_custkey"
        ).aggregate([])

    return repartition_join(
        cust,
        orders.map_batches(high_value_keys, batch_format="pyarrow"),
        "c_custkey",
        "o_custkey",
        {"c_custkey": pa.int64(), "c_name": pa.string()},
        {"o_custkey": pa.int64()},
        how=how,
    )


def customers_with_high_value_orders(
    sf_dir: str, cutoff: float = 350000.0
) -> "ray.data.Dataset":
    """Semi join: customers having at least one order above ``cutoff``."""
    return _customer_vs_high_value_orders(sf_dir, cutoff, "semi")


def customers_without_high_value_orders(
    sf_dir: str, cutoff: float = 350000.0
) -> "ray.data.Dataset":
    """Anti join: customers with NO order above ``cutoff``."""
    return _customer_vs_high_value_orders(sf_dir, cutoff, "anti")


def customer_high_value_counts(
    sf_dir: str, cutoff: float = 350000.0
) -> "ray.data.Dataset":
    """Left join: every customer with their count of orders above
    ``cutoff`` (0 for none).  The right side is pre-aggregated to one
    (custkey, count) row before the join — the join attaches a number,
    never order rows."""
    from ..utils import coarse_grouped_map, repartition_join

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial_counts(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater(batch.column("o_totalprice"), cutoff))
        return (
            pa.table({"o_custkey": t.column("o_custkey")})
            .group_by("o_custkey")
            .aggregate([([], "count_all")])
            .rename_columns(["o_custkey", "n_hv"])
        )

    counts = coarse_grouped_map(
        orders.map_batches(partial_counts, batch_format="pyarrow"),
        "o_custkey",
        lambda df: df.groupby("o_custkey", as_index=False).agg(
            n_hv=("n_hv", "sum")
        ),
    )

    joined = repartition_join(
        cust,
        counts,
        "c_custkey",
        "o_custkey",
        {"c_custkey": pa.int64(), "c_name": pa.string()},
        {"o_custkey": pa.int64(), "n_hv": pa.int64()},
        how="left",
    )

    def fill_zero(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["n_hv"] = df.n_hv.fillna(0).astype("int64")
        return df

    return joined.map_batches(fill_zero, batch_format="pandas")


def events_rolling(
    sf_dir: str, window: int = 3
) -> "ray.data.Dataset":
    """Per-user rolling mean over the last ``window`` events (inclusive),
    ordered by (ts, event_id) — the keyed sliding-window aggregate.

    Composition: coarse-partition by user (one all-to-all — every event
    of a user lands in one partition), then ONE vectorized
    ``groupby(user).rolling`` pass per partition.  A per-user map_groups
    would pay Ray's per-group reduce machinery per user instead."""
    from ..utils import coarse_grouped_map

    ev = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"])

    def roll_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        g = g.copy()
        g["avg_value"] = (
            g.groupby("user_id", sort=False)["value"]
            .rolling(window, min_periods=1)
            .mean()
            .reset_index(level=0, drop=True)
        )
        return g[["event_id", "user_id", "ts", "avg_value"]]

    return _round_half_up(
        coarse_grouped_map(ev, "user_id", roll_partition),
        {"avg_value": 4},
    )


def events_distinct_users(sf_dir: str) -> "ray.data.Dataset":
    """Exact COUNT(DISTINCT user_id) + COUNT(*) per event_type.

    Two-level distinct: each batch first collapses to its own distinct
    (type, user) pairs (map-side combiner — the shuffle moves at most one
    row per pair per block), a coarse keyed reduce makes them globally
    distinct, and the per-type counts that remain are type-cardinality
    sized.  Total event counts ride the same partial-aggregate shape.
    The driver only ever holds the type-cardinality result rows."""
    from ..utils import coarse_grouped_map

    ev = _read(sf_dir, "events", columns=["event_type", "user_id"])

    def partial_pairs(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "user_id": batch.column("user_id"),
            }
        )
        return t.group_by(["event_type", "user_id"]).aggregate([])

    distinct_pairs = coarse_grouped_map(
        ev.map_batches(partial_pairs, batch_format="pyarrow"),
        ["event_type", "user_id"],
        lambda df: df.drop_duplicates(["event_type", "user_id"]),
    )

    def count_users(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("event_type", as_index=False).agg(
            n_users=("user_id", "size")
        )

    users = coarse_grouped_map(
        distinct_pairs, "event_type", count_users, num_partitions=8,
    ).to_pandas()
    users = users.groupby("event_type", as_index=False).agg(
        n_users=("n_users", "sum")
    )

    def partial_counts(batch: pa.Table) -> pa.Table:
        return (
            pa.table({"event_type": batch.column("event_type")})
            .group_by("event_type")
            .aggregate([([], "count_all")])
            .rename_columns(["event_type", "n_events"])
        )

    counts = coarse_grouped_map(
        ev.map_batches(partial_counts, batch_format="pyarrow"),
        "event_type",
        lambda df: df.groupby("event_type", as_index=False).agg(
            n_events=("n_events", "sum")
        ),
        num_partitions=8,
    ).to_pandas()

    out = users.merge(counts, on="event_type")
    out["n_users"] = out.n_users.astype("int64")
    out["n_events"] = out.n_events.astype("int64")
    return ray.data.from_pandas(out)


def events_distinct_users_hll(
    sf_dir: str, b: int = 10
) -> "ray.data.Dataset":
    """APPROXIMATE COUNT(DISTINCT user_id) per event_type via a
    HyperLogLog sketch — the scale path beside the exact two-level
    distinct: the shuffle carries at most types × m=2^b (register, rho)
    rows per block instead of one row per distinct pair, and sketches
    merge by elementwise max (associative + commutative, so the partial
    aggregation is exact over the sketch).  Standard error 1.04/√m
    (~3.3% at b=10); raise ``b`` to trade shuffle bytes for accuracy."""
    from pandas.util import hash_array

    from ..utils import coarse_grouped_map

    m = 1 << b
    ev = _read(sf_dir, "events", columns=["event_type", "user_id"])

    def partial_registers(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        h = hash_array(df.user_id.to_numpy())
        reg = (h & np.uint64(m - 1)).astype(np.int32)
        w = h >> np.uint64(b)
        # rho = leading-zero count of the remaining 64-b bits, + 1
        bits = 64 - b
        expo = np.frexp(w.astype(np.float64))[1]  # floor(log2(w)) + 1
        rho = np.where(w > 0, bits - expo + 1, bits + 1).astype(np.int32)
        g = (
            pd.DataFrame({"event_type": df.event_type, "reg": reg,
                          "rho": rho})
            .groupby(["event_type", "reg"], as_index=False)["rho"]
            .max()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    alpha = 0.7213 / (1 + 1.079 / m)

    def estimate(g: pd.DataFrame) -> pd.DataFrame:
        rows = {"event_type": [], "n_users_approx": []}
        for t, gd in g.groupby("event_type", sort=False):
            regs = np.zeros(m, dtype=np.int32)
            agg = gd.groupby("reg")["rho"].max()
            regs[agg.index.to_numpy()] = agg.to_numpy()
            est = alpha * m * m / np.sum(np.power(2.0, -regs))
            zeros = int((regs == 0).sum())
            if est <= 2.5 * m and zeros > 0:
                est = m * np.log(m / zeros)  # small-range correction
            rows["event_type"].append(t)
            rows["n_users_approx"].append(int(round(est)))
        return pd.DataFrame(rows)

    return coarse_grouped_map(
        ev.map_batches(partial_registers, batch_format="pyarrow"),
        "event_type",
        estimate,
        num_partitions=8,
    )


def top_tokens(sf_dir: str, k: int = 20) -> "ray.data.Dataset":
    """Corpus token frequency top-k (vocabulary analysis): per-batch
    token counts (map-side combiner — the shuffle moves one row per
    distinct token per block), coarse keyed reduce, per-block top-k,
    driver-side final top-k over ≤ blocks×k survivors.  Single-space
    split to stay expression-identical with the SQL oracle."""
    from ..utils import coarse_grouped_map

    docs = _read(sf_dir, "documents", columns=["text"])

    def partial_counts(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch.column("text").to_pylist(), dtype=object)
        toks = s.str.split(" ").explode()
        toks = toks[(toks.notna()) & (toks != "")]
        vc = toks.value_counts()
        return pa.table(
            {
                "token": pa.array(vc.index.to_numpy(), pa.string()),
                "n": pa.array(vc.to_numpy().astype(np.int64), pa.int64()),
            }
        )

    counts = coarse_grouped_map(
        docs.map_batches(partial_counts, batch_format="pyarrow"),
        "token",
        lambda df: df.groupby("token", as_index=False).agg(n=("n", "sum")),
    )

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "token"],
                              ascending=[False, True]).head(k)

    cand = counts.map_batches(
        block_topk, batch_format="pandas", batch_size=None
    ).to_pandas()
    t = cand.sort_values(["n", "token"], ascending=[False, True]).head(
        k
    ).reset_index(drop=True)
    t["rnk"] = np.arange(1, len(t) + 1, dtype=np.int64)
    return ray.data.from_pandas(t[["rnk", "token", "n"]])


def top_customers_per_nation(sf_dir: str, k: int = 3) -> "ray.data.Dataset":
    """Per-group top-k: the ``k`` highest-spending customers of each
    nation by total order value, rank within nation.

    orders are pre-aggregated per customer inside map_batches (combiner),
    reduced with a coarse keyed reduce (customer-cardinality groups), the
    customer→nation dimension attached through ``smart_join`` (customer
    SCALES with sf — broadcast only while provably small, shuffle join
    past the threshold; only the fixed 25-row nation table is a driver
    broadcast), and the final per-nation top-k is ONE more coarse pass
    keyed by nation — each partition ranks all its nations with a
    vectorized groupby-head."""
    import pyarrow.parquet as pq

    from ..utils import coarse_grouped_map, smart_join

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"],
    ).to_pandas()
    n_ref = ray.put(nation.set_index("n_nationkey")["n_name"])

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    def attach_nname(batch: pa.Table) -> pa.Table:
        lookup = ray.get(n_ref)  # fixed 25 rows
        df = batch.to_pandas()
        df["n_name"] = df.c_nationkey.map(lookup)
        return pa.Table.from_pandas(
            df[["c_custkey", "n_name"]], preserve_index=False
        )

    cust_n = cust.map_batches(attach_nname, batch_format="pyarrow")

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("o_custkey", as_index=False).agg(
            total_spent=("o_totalprice", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    per_cust = coarse_grouped_map(
        orders.map_batches(partial, batch_format="pyarrow"),
        "o_custkey",
        lambda df: df.groupby("o_custkey", as_index=False).agg(
            total_spent=("total_spent", "sum")
        ),
    )

    with_nation = smart_join(
        per_cust,
        cust_n,
        "o_custkey",
        "c_custkey",
        {"o_custkey": pa.int64(), "total_spent": pa.float64()},
        {"c_custkey": pa.int64(), "n_name": pa.string()},
    )

    def topk_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["n_name", "total_spent", "o_custkey"],
            ascending=[True, False, True],
        )
        g = g.groupby("n_name", sort=False).head(k).copy()
        g["rnk"] = g.groupby("n_name", sort=False).cumcount() + 1
        return g[["n_name", "rnk", "o_custkey", "total_spent"]]

    out = coarse_grouped_map(
        with_nation,
        "n_name",
        topk_partition,
        num_partitions=8,
    )
    return _round_half_up(out, {"total_spent": 2})


def events_value_quantiles(
    sf_dir: str, qs=(0.25, 0.5, 0.75, 0.95)
) -> "ray.data.Dataset":
    """EXACT per-type value quantiles (linear interpolation).

    Exact quantiles need every value of a key in one place: coarse
    partition by event_type, one vectorized pandas quantile per type.
    Partitioning assumption (documented, inherent to exactness): one
    key's values fit in a worker — when they don't, use
    ``events_value_quantiles_approx`` (mergeable-sketch scale path)."""
    from ..utils import coarse_grouped_map

    ev = _read(sf_dir, "events", columns=["event_type", "value"])
    q_list = list(qs)

    def quantiles_partition(g: pd.DataFrame) -> pd.DataFrame:
        rows = {"event_type": [], "q": [], "value": []}
        for t, gd in g.groupby("event_type", sort=False):
            vals = gd["value"].quantile(q_list, interpolation="linear")
            rows["event_type"] += [t] * len(q_list)
            rows["q"] += q_list
            rows["value"] += list(vals)
        return pd.DataFrame(rows)

    return _round_half_up(
        coarse_grouped_map(ev, "event_type", quantiles_partition,
                           num_partitions=8),
        {"value": 4},
    )


def events_value_quantiles_approx(
    sf_dir: str, qs=(0.25, 0.5, 0.75, 0.95), n_bins: int = 4096,
    emit: str = "value",
) -> "ray.data.Dataset":
    """Approximate per-type quantiles via a MERGEABLE equi-width
    histogram sketch — the scale path: each batch folds its values into a
    (type, bin)-count partial, the coarse reduce sums counts, and the
    quantile is interpolated inside the winning bin.  The shuffle carries
    at most types×bins count rows per block, never values.

    Accuracy contract (honest form): the selected bin is EXACTLY the bin
    containing the ceil(q·n)-th order statistic, so the estimate is
    within one bin width of that order statistic.  Against the linearly
    INTERPOLATED quantile (quantile_cont) the error additionally carries
    the local gap between adjacent order statistics — unbounded a priori
    in sparse tail bins (measured up to ~6 widths at the 0.95 tail on
    the bench events table).

    ``emit="bin"`` returns (event_type, q, qbin) — the selected bin
    index instead of the interpolated value.  Because the bin choice is
    an exact, deterministic function of the data it is SQL-recomputable
    and serves as the sketch's hash-exact oracle certificate
    (events_quantiles_approx_check)."""
    import pyarrow.parquet as pq

    from ..utils import coarse_grouped_map

    # value range from parquet column statistics — metadata, not a scan
    pf = pq.ParquetFile(os.path.join(sf_dir, "events.parquet"))
    idx = pf.schema_arrow.get_field_index("value")
    lo, hi = np.inf, -np.inf
    for rg in range(pf.metadata.num_row_groups):
        st = pf.metadata.row_group(rg).column(idx).statistics
        lo, hi = min(lo, st.min), max(hi, st.max)
    width = (hi - lo) / n_bins or 1.0

    ev = _read(sf_dir, "events", columns=["event_type", "value"])
    q_list = list(qs)

    def partial_hist(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        bins = np.clip(
            ((df["value"] - lo) / width).astype(np.int64), 0, n_bins - 1
        )
        g = (
            pd.DataFrame({"event_type": df.event_type, "bin": bins})
            .groupby(["event_type", "bin"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    emit_bin = emit == "bin"

    def reduce_hist(g: pd.DataFrame) -> pd.DataFrame:
        out_col = "qbin" if emit_bin else "value"
        rows = {"event_type": [], "q": [], out_col: []}
        for t, gd in g.groupby("event_type", sort=False):
            h = gd.groupby("bin")["n"].sum().sort_index()
            counts = h.to_numpy()
            bins = h.index.to_numpy()
            edges = lo + bins * width
            cum = np.cumsum(counts)
            total = cum[-1]
            for q in q_list:
                target = q * total
                i = int(np.searchsorted(cum, target))
                i = min(i, len(counts) - 1)
                prev = cum[i - 1] if i > 0 else 0
                frac = (target - prev) / counts[i] if counts[i] else 0.0
                rows["event_type"].append(t)
                rows["q"].append(q)
                rows[out_col].append(
                    int(bins[i]) if emit_bin
                    else edges[i] + frac * width
                )
        return pd.DataFrame(rows)

    return coarse_grouped_map(
        ev.map_batches(partial_hist, batch_format="pyarrow"),
        "event_type",
        reduce_hist,
        num_partitions=8,
    )


def orders_top100_global_sort(sf_dir: str, k: int = 100) -> "ray.data.Dataset":
    """Global distributed sort + limit: the k highest-value orders with a
    dense rank.  Exercises Ray's range-partitioned sort end to end (the
    sample→boundaries→exchange→merge all-to-all), then takes the head —
    the pattern for any 'global leaderboard' question."""
    orders = _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    top = orders.sort(
        ["o_totalprice", "o_orderkey"], descending=[True, False]
    ).limit(k)
    t = top.to_pandas()  # k rows by contract
    t["rnk"] = np.arange(1, len(t) + 1, dtype=np.int64)
    return ray.data.from_pandas(
        t[["rnk", "o_orderkey", "o_custkey", "o_totalprice"]]
    )


def events_asof_join(
    sf_dir: str, num_partitions: int = 32
) -> "ray.data.Dataset":
    """As-of join: each purchase event matched to the latest click by the
    same user at-or-before its timestamp (inner: unmatched purchases drop).

    Ray Data has no asof-join primitive; the scale-correct composition is
    hash-partition BOTH sides by user (one all-to-all), then inside each
    partition run one vectorized ``pandas.merge_asof(by=user_id)`` over the
    partition's time-sorted rows — a coarse partition holds thousands of
    users, so the merge is one C-speed pass, not per-user tiny groups.
    Partitioning assumption: a single user's events fit in one partition
    (true by construction of the hash partitioning)."""

    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type", "value"])

    P = num_partitions

    def tag(batch: pa.Table) -> pa.Table:
        from pandas.util import hash_array

        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        pk = (hash_array(uid) % np.uint64(P)).astype(np.int32)
        return batch.append_column("_pkey", pa.array(pk, pa.int32()))

    def asof_partition(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g.event_type == "purchase"].sort_values("ts")
        right = g[g.event_type == "click"].sort_values("ts")
        if left.empty or right.empty:
            return pd.DataFrame()
        m = pd.merge_asof(
            left[["event_id", "ts", "user_id", "value"]],
            right[["event_id", "ts", "user_id", "value"]].rename(
                columns={"event_id": "click_event_id", "ts": "click_ts",
                         "value": "click_value"}
            ),
            left_on="ts",
            right_on="click_ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        )
        m = m[m.click_event_id.notna()].copy()
        m["click_event_id"] = m.click_event_id.astype("int64")
        return m[["event_id", "user_id", "ts", "value",
                  "click_event_id", "click_ts", "click_value"]]

    return (
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("_pkey")
        .map_groups(asof_partition, batch_format="pandas")
    )


def events_range_join(
    sf_dir: str, window_minutes: int = 60, num_partitions: int = 32
) -> "ray.data.Dataset":
    """Range join: every (purchase, click) pair for the same user with the
    click inside (purchase_ts - window, purchase_ts].  Same partitioning
    composition as the as-of join (hash both sides by user, one all-to-all),
    with an in-partition merge + interval filter; the window bound keeps
    the per-partition pair fan-out linear in practice (each purchase meets
    only its own user's clicks inside one window)."""
    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type", "value"])
    P = num_partitions
    win = pd.Timedelta(minutes=window_minutes)

    def tag(batch: pa.Table) -> pa.Table:
        from pandas.util import hash_array

        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        pk = (hash_array(uid) % np.uint64(P)).astype(np.int32)
        return batch.append_column("_pkey", pa.array(pk, pa.int32()))

    def range_partition(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g.event_type == "purchase"]
        right = g[g.event_type == "click"]
        if left.empty or right.empty:
            return pd.DataFrame()
        m = left[["event_id", "ts", "user_id", "value"]].merge(
            right[["event_id", "ts", "user_id", "value"]].rename(
                columns={"event_id": "click_event_id", "ts": "click_ts",
                         "value": "click_value"}
            ),
            on="user_id",
        )
        m = m[(m.click_ts <= m.ts) & (m.click_ts > m.ts - win)]
        return m[["event_id", "user_id", "ts", "value",
                  "click_event_id", "click_ts", "click_value"]]

    return (
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("_pkey")
        .map_groups(range_partition, batch_format="pandas")
    )


def events_winsorized(
    sf_dir: str, lo_q: float = 0.01, hi_q: float = 0.99
) -> "ray.data.Dataset":
    """Per-event-type winsorized statistics: clip values at the exact
    [lo_q, hi_q] quantiles and report raw vs clipped means plus clip
    counts — the outlier-robust aggregate a metrics pipeline runs before
    trusting a mean.

    Two passes: (1) exact per-type thresholds via the same
    coarse-partitioned quantile kernel as events_value_quantiles — the
    result is one row per event TYPE, small by construction (key
    cardinality, not data size), so broadcasting it is the legitimate
    small-side pattern; (2) a vectorized clip + per-type partial moments
    inside map_batches, one tiny keyed reduce.  Means are rounded
    half-up to 6 decimals (cross-engine summation order).
    """
    from ..utils import coarse_grouped_map

    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    def thresholds_partition(g: pd.DataFrame) -> pd.DataFrame:
        rows = {"event_type": [], "lo": [], "hi": []}
        for t, gd in g.groupby("event_type", sort=False):
            q = gd["value"].quantile([lo_q, hi_q],
                                     interpolation="linear")
            rows["event_type"].append(t)
            rows["lo"].append(float(q.iloc[0]))
            rows["hi"].append(float(q.iloc[1]))
        return pd.DataFrame(rows)

    thr = coarse_grouped_map(
        ev, "event_type", thresholds_partition, num_partitions=8
    ).to_pandas()
    lo = ray.put(dict(zip(thr.event_type, thr.lo)))
    hi = ray.put(dict(zip(thr.event_type, thr.hi)))

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        lo_m = df.event_type.map(ray.get(lo)).to_numpy(np.float64)
        hi_m = df.event_type.map(ray.get(hi)).to_numpy(np.float64)
        v = df.value.to_numpy(np.float64)
        clipped = np.minimum(np.maximum(v, lo_m), hi_m)
        out = pd.DataFrame(
            {
                "event_type": df.event_type,
                "n": 1,
                "s_raw": v,
                "s_win": clipped,
                "c_lo": (v < lo_m).astype(np.int64),
                "c_hi": (v > hi_m).astype(np.int64),
            }
        )
        g = out.groupby("event_type", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("event_type", as_index=False).sum()
        res = pd.DataFrame(
            {
                "event_type": g.event_type,
                "n": g.n.astype(np.int64),
                "mean_raw": np.floor(
                    g.s_raw / g.n * 1e6 + 0.5
                ) / 1e6,
                "mean_winsorized": np.floor(
                    g.s_win / g.n * 1e6 + 0.5
                ) / 1e6,
                "n_clipped_low": g.c_lo.astype(np.int64),
                "n_clipped_high": g.c_hi.astype(np.int64),
            }
        )
        return res

    return coarse_grouped_map(
        ev.map_batches(partial, batch_format="pyarrow"),
        "event_type",
        final,
        num_partitions=8,
    )


def events_wau(sf_dir: str) -> "ray.data.Dataset":
    """Per calendar day: daily active users AND rolling 7-day active
    users (distinct users over [day-6, day]) — the exact WAU metric.

    Rolling DISTINCT cannot be pre-aggregated like a sum, so the shape
    is: (1) one shuffle to exact distinct (day, user) pairs — the
    per-batch partial distinct makes the shuffle move at most one row
    per (day, user, block); (2) map-side EXPLODE of each pair to the
    <= 7 window days it serves (window days are validated against the
    tiny broadcast set of days that actually occur); (3) a second
    distinct+count shuffle on (window_day, user).  Work is bounded by
    7x the distinct-pair count, never by raw event volume, and no
    driver-side state exceeds the day list.
    """
    from ..utils import coarse_grouped_map

    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def pair_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["day"] = df.ts.dt.floor("D")
        p = df[["day", "user_id"]].drop_duplicates()
        return pa.Table.from_pandas(p, preserve_index=False)

    pairs = coarse_grouped_map(
        ev.map_batches(pair_partial, batch_format="pyarrow"),
        ["day", "user_id"],
        lambda d: d.drop_duplicates(["day", "user_id"]),
    ).materialize()  # two consumers below — avoid re-running the shuffle

    # the calendar-day dimension is tiny (years x 365); broadcast it
    days = pairs.map_batches(
        lambda d: d[["day"]].drop_duplicates(), batch_format="pandas"
    ).to_pandas().day.drop_duplicates()
    days_ref = ray.put(frozenset(days))

    def explode_windows(df: pd.DataFrame) -> pd.DataFrame:
        valid = ray.get(days_ref)
        outs = []
        for off in range(7):
            w = df[["day", "user_id"]].copy()
            w["day"] = w.day + pd.Timedelta(days=off)
            outs.append(w)
        out = pd.concat(outs, ignore_index=True)
        return out[out.day.isin(valid)]

    def wau_reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates(["day", "user_id"]).groupby(
            "day", as_index=False
        ).agg(wau=("user_id", "size"))
        g["wau"] = g.wau.astype(np.int64)
        return g

    wau = coarse_grouped_map(
        pairs.map_batches(explode_windows, batch_format="pandas"),
        "day",
        wau_reduce,
        num_partitions=16,
    )

    def dau_reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("day", as_index=False).agg(dau=("user_id", "size"))
        g["dau"] = g.dau.astype(np.int64)
        return g

    dau = coarse_grouped_map(pairs, "day", dau_reduce, num_partitions=16)

    from ..utils import repartition_join

    out = repartition_join(
        dau,
        wau,
        left_on="day",
        right_on="day",
        left_types={"day": pa.timestamp("us"), "dau": pa.int64()},
        right_types={"day": pa.timestamp("us"), "wau": pa.int64()},
        num_partitions=16,
    )

    def fix_types(df: pd.DataFrame) -> pd.DataFrame:
        df["dau"] = df.dau.astype(np.int64)
        df["wau"] = df.wau.astype(np.int64)
        return df[["day", "dau", "wau"]]

    return out.map_batches(fix_types, batch_format="pandas")


def last_event_per_user(sf_dir: str) -> "ray.data.Dataset":
    """Each user's latest event (max ts, event_id as tiebreak) — the
    SCD-style 'current row per key' pattern.

    One user-keyed coarse shuffle; inside the partition the latest row
    per user falls out of a vectorized sort + drop_duplicates(keep=
    'last').  At scale a per-batch partial (keep each batch's latest
    row per user) bounds the shuffle to one row per (user, block)."""
    from ..utils import coarse_grouped_map

    ev = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type", "value"])

    def batch_latest(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(["user_id", "ts", "event_id"])
        return pa.Table.from_pandas(
            df.drop_duplicates("user_id", keep="last"),
            preserve_index=False,
        )

    def latest(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        return df.drop_duplicates("user_id", keep="last")

    return coarse_grouped_map(
        ev.map_batches(batch_latest, batch_format="pyarrow"),
        "user_id",
        latest,
    )


def revenue_gini(sf_dir: str) -> "ray.data.Dataset":
    """Gini coefficient of per-customer order spend — the standard
    revenue-concentration metric: G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n over
    customers sorted by spend ascending (custkey tiebreak).

    Shape: per-customer spend via one keyed coarse reduce (spend is
    quantized to integer cents per order, so the per-customer sums are
    exact in any order); ONE distributed sort on (cents, custkey); a
    dense global index from utils.zip_with_index (two metadata passes,
    blocks never leave the workers); then the three regression-style
    moments (Σi·x, Σx, n) fold map-side to one tiny row per block.
    The i·x moment accumulates in float64 — matching the oracle's
    explicit DOUBLE casts — and the final G is rounded half-up to 6
    decimals (summation order).
    """
    from ..utils import coarse_grouped_map, zip_with_index

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def spend_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["cents"] = np.floor(
            df.o_totalprice.to_numpy() * 100.0 + 0.5
        ).astype(np.int64)
        g = df.groupby("o_custkey", as_index=False).agg(
            cents=("cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    spend = coarse_grouped_map(
        orders.map_batches(spend_partial, batch_format="pyarrow"),
        "o_custkey",
        lambda d: d.groupby("o_custkey", as_index=False).agg(
            cents=("cents", "sum")
        ),
    )

    ranked = zip_with_index(
        spend.sort(["cents", "o_custkey"]), "i", offset=1
    )

    def moments(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        ix = (df.i.to_numpy(np.float64) * df.cents.to_numpy(np.float64))
        return pa.table(
            {
                "six": pa.array([float(ix.sum())], pa.float64()),
                "sx": pa.array([int(df.cents.sum())], pa.int64()),
                "n": pa.array([len(df)], pa.int64()),
            }
        )

    m = ranked.map_batches(moments, batch_format="pyarrow").to_pandas()
    n = float(m.n.sum())
    sx = float(m.sx.sum())
    gini = 2.0 * m.six.sum() / (n * sx) - (n + 1.0) / n
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "gini": [np.floor(gini * 1e6 + 0.5) / 1e6],
                "n_customers": np.array([int(n)], np.int64),
                "total_cents": np.array([int(m.sx.sum())], np.int64),
            }
        )
    )


def events_gapfill(sf_dir: str) -> "ray.data.Dataset":
    """Daily event counts per type over a DENSE calendar spine — days
    with no events appear with n_events = 0 (the gap-filling step every
    time-series consumer needs before resampling).

    The only fact-scale work is the (type, day) count (per-batch
    partials + one coarse keyed reduce).  The counted result and the
    spine are both DIMENSION-bounded (types x days), so the driver-side
    cross product + left merge is legitimate at any event volume.
    """
    from ..utils import coarse_grouped_map

    ev = _read(sf_dir, "events", columns=["event_type", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["day"] = df.ts.dt.floor("D")
        g = df.groupby(["event_type", "day"], as_index=False).size()
        g.columns = ["event_type", "day", "n"]
        g["n"] = g.n.astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = coarse_grouped_map(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "day"],
        lambda d: d.groupby(["event_type", "day"], as_index=False).agg(
            n=("n", "sum")
        ),
    ).to_pandas()  # types x days rows — dimension-bounded

    days = pd.date_range(counts.day.min(), counts.day.max(), freq="D")
    types = sorted(counts.event_type.unique())
    spine = pd.MultiIndex.from_product(
        [types, days], names=["event_type", "day"]
    ).to_frame(index=False)
    out = spine.merge(counts, on=["event_type", "day"], how="left")
    out["n_events"] = out.n.fillna(0).astype(np.int64)
    return ray.data.from_pandas(out[["event_type", "day", "n_events"]])


def nation_revenue_share(sf_dir: str) -> "ray.data.Dataset":
    """Percent-of-total window (ratio_to_report): each nation's revenue
    share within its REGION — a partition-total normalization, the
    window shape where every row needs its partition's aggregate.

    Revenue per nation reuses the revenue_by_nation plan (combiner →
    order/customer joins → keyed reduce, cents-exact int64); the
    region-partition totals are then a ~5-row second aggregate over the
    25-row nation result, and the share division runs map-side — the
    window never touches the fact table.  share = nation_cents::DOUBLE
    / region_cents::DOUBLE, rounded half-up to 6 decimals.
    """
    import os as _os

    import pyarrow.parquet as pq

    from ..utils import coarse_grouped_map, repartition_join

    nation = pq.read_table(
        _os.path.join(sf_dir, "nation.parquet")
    ).to_pandas()
    region = pq.read_table(
        _os.path.join(sf_dir, "region.parquet")
    ).to_pandas()
    nmap = nation.set_index("n_nationkey")
    rmap = region.set_index("r_regionkey").r_name

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def li_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["cents"] = np.floor(
            (df.l_extendedprice * (1.0 - df.l_discount)).to_numpy()
            * 100.0 + 0.5
        ).astype(np.int64)
        g = df.groupby("l_orderkey", as_index=False).agg(
            cents=("cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    with_orders = repartition_join(
        li.map_batches(li_partial, batch_format="pyarrow"),
        orders,
        left_on="l_orderkey",
        right_on="o_orderkey",
        left_types={"l_orderkey": pa.int64(), "cents": pa.int64()},
        right_types={"o_orderkey": pa.int64(), "o_custkey": pa.int64()},
    )

    def cust_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("o_custkey", as_index=False).agg(
            cents=("cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    with_cust = repartition_join(
        with_orders.map_batches(cust_partial, batch_format="pyarrow"),
        cust,
        left_on="o_custkey",
        right_on="c_custkey",
        left_types={"o_custkey": pa.int64(), "cents": pa.int64()},
        right_types={"c_custkey": pa.int64(), "c_nationkey": pa.int64()},
    )

    nk = nmap.n_name
    rk = nmap.n_regionkey

    def nation_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("c_nationkey", as_index=False).agg(
            cents=("cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    per_nation = coarse_grouped_map(
        with_cust.map_batches(nation_partial, batch_format="pyarrow"),
        "c_nationkey",
        lambda df: df.groupby("c_nationkey", as_index=False).agg(
            cents=("cents", "sum")
        ),
        num_partitions=8,
    ).to_pandas()  # 25 rows — the dimension-bounded window input

    per_nation["r_name"] = per_nation.c_nationkey.map(rk).map(rmap)
    per_nation["n_name"] = per_nation.c_nationkey.map(nk)
    tot = per_nation.groupby("r_name").cents.transform("sum")
    out = pd.DataFrame(
        {
            "r_name": per_nation.r_name,
            "n_name": per_nation.n_name,
            "revenue": per_nation.cents.astype(np.int64) / 100.0,
            "share": np.floor(
                per_nation.cents.to_numpy(np.float64)
                / tot.to_numpy(np.float64) * 1e6 + 0.5
            ) / 1e6,
        }
    )
    return ray.data.from_pandas(out.reset_index(drop=True))


def user_value_ewma(
    sf_dir: str, alpha: float = 0.25
) -> "ray.data.Dataset":
    """Per-user exponentially weighted moving average of event values,
    final state per user: (user_id, n_events, last_value, ewma) with
    ewma_t = alpha·x_t + (1-alpha)·ewma_{t-1} over (ts, event_id) order
    — the online feature a streaming scorer keeps per key, computed
    batch-distributed (one user-keyed partition pass; the recursion is
    vectorized per user with the standard weight identity rather than a
    Python loop over rows).  Rounded half-up to 6 decimals.

    No SQL oracle: the recursion is per-key sequential state (DuckDB
    has no EWMA aggregate); pinned by a pandas.ewm reference pytest.
    """
    from ..utils import coarse_grouped_map

    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "value"])

    def ewma_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        out = []
        for uid, g in df.groupby("user_id", sort=False):
            x = g.value.to_numpy(np.float64)
            n = len(x)
            # vectorized recursion: ewma_t = (1-a)^t·[a·sum(x_i/(1-a)^i)
            # ... numerically unstable for long series; use the pandas
            # ewm kernel (C-implemented, adjust=False matches the
            # recursion exactly)
            e = pd.Series(x).ewm(alpha=alpha, adjust=False).mean().iloc[-1]
            out.append((uid, n, x[-1], np.floor(e * 1e6 + 0.5) / 1e6))
        return pd.DataFrame(
            out, columns=["user_id", "n_events", "last_value", "ewma"]
        )

    return coarse_grouped_map(ev, "user_id", ewma_partition)


def events_cube(sf_dir: str) -> "ray.data.Dataset":
    """CUBE(event_type, day): counts and value sums at all four grouping
    levels — (type, day), (type, ALL), (ALL, day), (ALL, ALL) — with
    'ALL' string sentinels for rolled-up dimensions.

    The multi-level rollup aggregates the RAW events exactly once, at
    the finest grain (per-batch partial + one coarse keyed reduce);
    the three coarser levels re-aggregate the bounded finest-grain
    table (|types| x |days| rows) by exploding each row into its four
    grouping-set tags and running one more tiny keyed reduce — raw
    rows never make a second pass, which is the whole point of a cube
    at 100 TB.  Values sit on a cent grid, so sums are integerized
    int64 (order-independent, exact at every level including the grand
    total) and divided back once at the end.
    """
    from ..utils import coarse_grouped_map

    ev = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        day = df.ts.dt.floor("D").dt.strftime("%Y-%m-%d")
        cents = np.floor(
            df.value.to_numpy(np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        t = pd.DataFrame(
            {"event_type": df.event_type, "day": day, "cents": cents}
        )
        g = t.groupby(["event_type", "day"], as_index=False).agg(
            n_events=("cents", "size"), cents=("cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def finest_reduce(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["event_type", "day"], as_index=False).agg(
            n_events=("n_events", "sum"), cents=("cents", "sum")
        )

    finest = coarse_grouped_map(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "day"],
        finest_reduce,
    )

    def explode_sets(df: pd.DataFrame) -> pd.DataFrame:
        full = df[["event_type", "day", "n_events", "cents"]]
        by_type = full.assign(day="ALL")
        by_day = full.assign(event_type="ALL")
        grand = full.assign(event_type="ALL", day="ALL")
        return pd.concat(
            [full, by_type, by_day, grand], ignore_index=True
        )

    def cube_reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["event_type", "day"], as_index=False).agg(
            n_events=("n_events", "sum"), cents=("cents", "sum")
        )
        g["n_events"] = g.n_events.astype(np.int64)
        g["sum_value"] = g.cents.astype(np.int64) / 100.0
        return g[["event_type", "day", "n_events", "sum_value"]]

    return coarse_grouped_map(
        finest.map_batches(
            explode_sets, batch_format="pandas", batch_size=None
        ),
        ["event_type", "day"],
        cube_reduce,
        num_partitions=8,
    )


# ---------------------------------------------------------------------------
# Ordered string aggregation (user journey sequences)
# ---------------------------------------------------------------------------

def user_journeys(sf_dir: str) -> "ray.data.Dataset":
    """Per-user ordered event-type journey: the '>'-joined sequence of a
    user's event types in (ts, event_id) order — SQL
    ``string_agg(event_type, '>' ORDER BY ts, event_id)`` exactly.  The
    ORDER-SENSITIVE aggregation class: unlike sums, the result depends
    on within-group order, so the group must be assembled in one place.

    One user-keyed coarse shuffle; each partition sorts its users' rows
    vectorized ((user_id, ts, event_id) — ts as int64 epoch micros) and
    joins per user.  The per-user join IS the payload construction (not
    an avoidable inner loop, same rationale as chunk assembly in
    dedup.word_chunks).  Partitioning assumption: one user's events fit
    in a worker — the same bound every sessionization op here carries.
    Output: (user_id, n_events, journey).
    """
    from ..utils import coarse_grouped_map

    ev = _read(
        sf_dir, "events",
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["user_id", "ts", "event_id"])
        g = d.groupby("user_id", sort=False)
        out = pd.DataFrame(
            {
                "n_events": g.event_id.size(),
                "journey": g.event_type.agg(">".join),
            }
        ).reset_index()
        out["user_id"] = out.user_id.astype(np.int64)
        out["n_events"] = out.n_events.astype(np.int64)
        return out[["user_id", "n_events", "journey"]]

    return coarse_grouped_map(ev, "user_id", per_partition,
                              num_partitions=16)
