"""Composite analytics pipelines: multi-join shipping-priority query,
rollup/pivot aggregates, ordered string aggregation, self-join pair
generation (co-purchase graph), and a full-outer activity join.

These widen the engine's relational surface beyond pipelines/relational —
every operator here has an exact DuckDB oracle in __ray_entry__ and uses
the scale patterns established there:

- per-batch PARTIAL aggregation before any keyed shuffle;
- utils.coarse_grouped_map for every keyed reduce (vectorized pandas per
  coarse partition — never per-group Python);
- utils.repartition_join for fact↔fact hops (both sides shuffled once on
  hash(key), per-partition vectorized merge);
- broadcast only for true dimension sides;
- top-k selection as per-block top-k → driver reduce over ≤ blocks×k rows.
"""
from __future__ import annotations

import os
from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .relational import _read, _round_half_up
from ..utils import coarse_grouped_map, repartition_join, schema_floor


# ---------------------------------------------------------------------------
# TPC-H Q3-shaped shipping priority
# ---------------------------------------------------------------------------

def shipping_priority(
    sf_dir: str,
    segment: str = "BUILDING",
    cutoff: str = "1998-01-01",
    k: int = 10,
) -> "ray.data.Dataset":
    """customer(σ segment) ⋈ orders(σ date) ⋈ lineitem(σ date), grouped by
    order, top-k by revenue — the classic 3-table analytic join.

    Join strategy (same reasoning as relational.revenue_by_nation): the
    customer side is filtered to the segment DISTRIBUTED (a map over the
    customer Dataset — customer scales with sf, so its keys are never
    unconditionally collected) and attached with a ``smart_join`` SEMI on
    o_custkey: a broadcast key-set probe while the filtered side is
    provably small, an automatic repartition semi-join past the
    threshold.  The fact↔fact hop lineitem↔orders runs as a distributed
    repartition join on the order key, with lineitem pre-aggregated per
    order inside map_batches so the join's left side carries ≤ one row per
    (orderkey × block); the per-order revenue sum and the per-partition
    top-k combiner run FUSED inside the join task (post_fn), so the only
    rows after the join's all-to-all are ≤ partitions × k candidates.
    """
    from ..utils import smart_join

    cutoff_ts = pd.Timestamp(cutoff)

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    def seg_filter(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(
            pc.equal(batch.column("c_mktsegment"), segment)
        ).select(["c_custkey"])

    cust_seg = cust.map_batches(seg_filter, batch_format="pyarrow")

    orders = _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )

    def date_filter(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(
            pc.less(batch.column("o_orderdate"), pa.scalar(cutoff_ts))
        )

    o_filt = smart_join(
        orders.map_batches(date_filter, batch_format="pyarrow"),
        cust_seg,
        "o_custkey",
        "c_custkey",
        {"o_custkey": pa.int64(), "o_orderkey": pa.int64(),
         "o_orderdate": pa.timestamp("us"),
         "o_orderpriority": pa.string()},
        {"c_custkey": pa.int64()},
        how="semi",
    )

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def li_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df.l_shipdate > cutoff_ts]
        df["revenue"] = df.l_extendedprice * (1.0 - df.l_discount)
        g = df.groupby("l_orderkey", as_index=False).agg(
            revenue=("revenue", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def final_reduce(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(
            ["l_orderkey", "o_orderdate", "o_orderpriority"], as_index=False
        ).agg(revenue=("revenue", "sum"))

    sort_cols = ["revenue", "o_orderdate", "l_orderkey"]
    asc = [False, True, True]

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(sort_cols, ascending=asc).head(k)

    # join + reduce + top-k fusion (post_fn): the join co-locates every
    # revenue partial of an order key, so the per-order sum AND the
    # per-partition top-k combiner run inside the join task; the driver
    # then reduces <= partitions x k candidate rows
    joined = repartition_join(
        li.map_batches(li_partial, batch_format="pyarrow"),
        o_filt,
        left_on="l_orderkey",
        right_on="o_orderkey",
        left_types={"l_orderkey": pa.int64(), "revenue": pa.float64()},
        right_types={
            "o_orderkey": pa.int64(),
            "o_orderdate": pa.timestamp("us"),
            "o_orderpriority": pa.string(),
        },
        post_fn=lambda df: block_topk(final_reduce(df)),
    )

    cand = joined.to_pandas()
    t = cand.sort_values(sort_cols, ascending=asc).head(k).reset_index(
        drop=True
    )
    t["rnk"] = np.arange(1, len(t) + 1, dtype=np.int64)
    t["revenue"] = np.floor(t["revenue"] * 100.0 + 0.5) / 100.0
    return ray.data.from_pandas(
        t[["rnk", "l_orderkey", "o_orderdate", "o_orderpriority", "revenue"]]
    )


# ---------------------------------------------------------------------------
# ROLLUP aggregate
# ---------------------------------------------------------------------------

def pricing_rollup(sf_dir: str) -> "ray.data.Dataset":
    """GROUP BY ROLLUP(l_returnflag, l_linestatus): finest level, per-flag
    subtotals, and the grand total in one result, rollup nulls encoded as
    'ALL'.

    Only the finest level touches the fact table (partial agg → coarse
    keyed reduce); the coarser levels re-aggregate the FINEST RESULT,
    which is ≤ |flag|×|status| rows by construction — the rollup costs one
    extra tiny stage, not extra passes over the data.
    """
    li = _read(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["revenue"] = df.l_extendedprice * (1.0 - df.l_discount)
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            revenue=("revenue", "sum"),
            n_rows=("l_quantity", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def reduce_fine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(
            ["l_returnflag", "l_linestatus"], as_index=False
        ).agg(
            sum_qty=("sum_qty", "sum"),
            revenue=("revenue", "sum"),
            n_rows=("n_rows", "sum"),
        )

    fine = coarse_grouped_map(
        li.map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        reduce_fine,
    )

    def rollup_levels(df: pd.DataFrame) -> pd.DataFrame:
        aggs = dict(
            sum_qty=("sum_qty", "sum"),
            revenue=("revenue", "sum"),
            n_rows=("n_rows", "sum"),
        )
        lv1 = df.groupby("l_returnflag", as_index=False).agg(**aggs)
        lv1["l_linestatus"] = "ALL"
        lv0 = df.agg({"sum_qty": "sum", "revenue": "sum", "n_rows": "sum"})
        lv0 = pd.DataFrame([lv0])
        lv0["l_returnflag"] = "ALL"
        lv0["l_linestatus"] = "ALL"
        cols = ["l_returnflag", "l_linestatus", "sum_qty", "revenue",
                "n_rows"]
        out = pd.concat([df[cols], lv1[cols], lv0[cols]], ignore_index=True)
        out["n_rows"] = out.n_rows.astype(np.int64)
        return out

    # one partition: the finest level is dimension-bounded (|flag|×|status|)
    out = fine.repartition(1).map_batches(
        rollup_levels, batch_format="pandas", batch_size=None
    )
    return _round_half_up(out, {"sum_qty": 2, "revenue": 2})


# ---------------------------------------------------------------------------
# Pivot (conditional aggregation)
# ---------------------------------------------------------------------------

EVENT_TYPES: List[str] = ["click", "error", "purchase", "signup", "view"]


def events_type_pivot(sf_dir: str) -> "ray.data.Dataset":
    """Pivot event_type into columns: per hour-of-day, count and value-sum
    per type (conditional aggregation — the distributed form of PIVOT for
    a known category vocabulary).

    Partial (hour, type) cells are aggregated per batch, the keyed reduce
    is per hour, and the pivot itself is a per-partition pandas reshape of
    ≤ 24×|types| cells.
    """
    ev = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["hour"] = df.ts.dt.hour.astype(np.int64)
        g = df.groupby(["hour", "event_type"], as_index=False).agg(
            n=("value", "size"), v=("value", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def pivot_partition(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["hour", "event_type"], as_index=False).agg(
            n=("n", "sum"), v=("v", "sum")
        )
        wide = g.pivot(index="hour", columns="event_type", values=["n", "v"])
        out = pd.DataFrame({"hour": wide.index.to_numpy()})
        for t in EVENT_TYPES:
            n = (
                wide[("n", t)] if ("n", t) in wide.columns
                else pd.Series(0.0, index=wide.index)
            )
            v = (
                wide[("v", t)] if ("v", t) in wide.columns
                else pd.Series(0.0, index=wide.index)
            )
            out[f"n_{t}"] = n.fillna(0).to_numpy().astype(np.int64)
            out[f"v_{t}"] = v.fillna(0.0).to_numpy()
        return out

    out = coarse_grouped_map(
        ev.map_batches(partial, batch_format="pyarrow"),
        "hour",
        pivot_partition,
    )
    return _round_half_up(out, {f"v_{t}": 4 for t in EVENT_TYPES})


# ---------------------------------------------------------------------------
# Ordered grouped string aggregation
# ---------------------------------------------------------------------------

def customer_order_statuses(sf_dir: str) -> "ray.data.Dataset":
    """Per customer: the order-key-ordered concatenation of order statuses
    (string_agg ... ORDER BY) plus the order count — grouped sequence
    materialization, e.g. building per-user event strings for sessionized
    training data."""
    orders = _read(
        sf_dir, "orders",
        columns=["o_custkey", "o_orderkey", "o_orderstatus"],
    )

    def concat_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderkey"])
        g = df.groupby("o_custkey", as_index=False).agg(
            status_seq=("o_orderstatus", "".join),
            n_orders=("o_orderkey", "size"),
        )
        g["n_orders"] = g.n_orders.astype(np.int64)
        return g

    return coarse_grouped_map(orders, "o_custkey", concat_partition)


# ---------------------------------------------------------------------------
# Self-join pair generation: co-purchase degree
# ---------------------------------------------------------------------------

def part_copurchase_degree(sf_dir: str, k: int = 20) -> "ray.data.Dataset":
    """Top-k parts by co-purchase degree: parts sharing an order form a
    pair; a part's degree counts its (other-part, order) incidences.

    Pair generation is the canonical bounded self-join: lineitem is
    shuffled once on l_orderkey (coarse keyed reduce), and each partition
    self-merges its orders vectorized — safe because an order's distinct
    part count is bounded by the order, not the dataset (≤ O(10) at any
    scale; contrast the capped LSH buckets in stages/dedup.py where group
    size is data-dependent).  Degrees then reduce per part, and top-k is
    per-block → driver over ≤ blocks×k rows.
    """
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def pairs_partition(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = d.merge(d, on="l_orderkey")
        m = m[m.l_partkey_x < m.l_partkey_y]
        both = pd.concat(
            [m.l_partkey_x, m.l_partkey_y], ignore_index=True
        ).to_frame("part")
        g = both.groupby("part", as_index=False).agg(degree=("part", "size"))
        g["degree"] = g.degree.astype(np.int64)
        return g

    partial_deg = coarse_grouped_map(li, "l_orderkey", pairs_partition)

    def reduce_deg(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("part", as_index=False).agg(degree=("degree", "sum"))
        g["degree"] = g.degree.astype(np.int64)
        return g

    deg = coarse_grouped_map(partial_deg, "part", reduce_deg)

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["degree", "part"], ascending=[False, True]
        ).head(k)

    cand = deg.map_batches(
        block_topk, batch_format="pandas", batch_size=None
    ).to_pandas()
    t = cand.sort_values(
        ["degree", "part"], ascending=[False, True]
    ).head(k).reset_index(drop=True)
    t["rnk"] = np.arange(1, len(t) + 1, dtype=np.int64)
    return ray.data.from_pandas(t[["rnk", "part", "degree"]])


def part_copurchase_pairs(sf_dir: str) -> "ray.data.Dataset":
    """The full (part_a, part_b, n_orders) co-purchase edge list —
    the graph that part_pagerank walks.  Same bounded self-join as
    part_copurchase_degree, without the top-k."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def pairs_partition(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = d.merge(d, on="l_orderkey")
        m = m[m.l_partkey_x < m.l_partkey_y]
        g = m.groupby(["l_partkey_x", "l_partkey_y"], as_index=False).agg(
            n_orders=("l_orderkey", "size")
        )
        return g.rename(columns={"l_partkey_x": "part_a",
                                 "l_partkey_y": "part_b"})

    partial = coarse_grouped_map(li, "l_orderkey", pairs_partition)

    def reduce_pairs(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["part_a", "part_b"], as_index=False).agg(
            n_orders=("n_orders", "sum")
        )
        g["n_orders"] = g.n_orders.astype(np.int64)
        return g

    return coarse_grouped_map(partial, ["part_a", "part_b"], reduce_pairs)


def copurchase_components(
    sf_dir: str, min_count: int = 2
) -> "ray.data.Dataset":
    """Connected components of the co-purchase graph: parts linked when
    they share >= ``min_count`` orders, labeled with their component's
    minimum part key -> (l_partkey, component_id).

    The edge list is ``part_copurchase_pairs`` filtered map-side (the
    count threshold is what keeps the graph sparse — unthresholded
    co-purchase is near-complete and components degenerate to one
    blob); the solve AUTO-dispatches on the exact edge count exactly
    like stages/dedup.components_assign: under
    COMPONENTS_DRIVER_MAX_PAIRS the bounded driver union-find wins
    (the LP loop's per-round shuffles are pure fixed cost on a
    few-thousand-edge graph), above it the distributed
    min-label-propagation loop (graph_algos.connected_components —
    itself oracle-verified by ``near_dup_dedup_lp``) runs with no
    driver state.  SQL-checkable end to end either way: the oracle
    replays the propagation as a recursive CTE (min reachable label ==
    component minimum).
    """
    from ..stages.dedup import (
        COMPONENTS_DRIVER_MAX_PAIRS,
        pair_components,
    )
    from ..stages.graph_algos import connected_components

    pairs = part_copurchase_pairs(sf_dir)

    def threshold(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if "n_orders" not in batch.schema.names or batch.num_rows == 0:
            return pa.table(
                {"part_a": pa.array([], pa.int64()),
                 "part_b": pa.array([], pa.int64())}
            )
        keep = batch.filter(
            pc.greater_equal(batch.column("n_orders"), min_count)
        )
        return keep.select(["part_a", "part_b"])

    edges = pairs.map_batches(
        threshold, batch_format="pyarrow"
    ).materialize()  # consumed by the dispatch count + one solver
    if edges.count() <= COMPONENTS_DRIVER_MAX_PAIRS:
        rep = pair_components(edges, "part_a", "part_b")
        nodes: set = set()  # ≤ 2×bound ints, same memory contract
        for b in edges.iter_batches(batch_format="pyarrow"):
            nodes.update(b.column("part_a").to_pylist())
            nodes.update(b.column("part_b").to_pylist())
        keys = sorted(nodes)
        return ray.data.from_arrow(
            pa.table(
                {
                    "l_partkey": pa.array(keys, pa.int64()),
                    "component_id": pa.array(
                        [rep.get(k, k) for k in keys], pa.int64()
                    ),
                }
            )
        )
    cc = connected_components(
        edges, left_col="part_a", right_col="part_b"
    )

    def project(batch: pa.Table) -> pa.Table:
        if "doc_id" not in batch.schema.names or batch.num_rows == 0:
            return pa.table(
                {"l_partkey": pa.array([], pa.int64()),
                 "component_id": pa.array([], pa.int64())}
            )
        return pa.table(
            {"l_partkey": batch.column("doc_id").cast(pa.int64()),
             "component_id": batch.column("rep_id").cast(pa.int64())}
        )

    return cc.map_batches(project, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Bloom-filter-accelerated semi join
# ---------------------------------------------------------------------------

# kernels shared with the dedup text-side prefilter live in kgray.utils
from ..utils import bloom_hashes as _bloom_hashes  # noqa: F401
from ..utils import bloom_positions as _bloom_positions


def customers_semi_join_bloom(
    sf_dir: str,
    cutoff: float = 350000.0,
    m_bits: int = 1 << 20,
    n_hashes: int = 4,
) -> "ray.data.Dataset":
    """Semi join with a broadcast Bloom prefilter: same answer as
    relational.customers_with_high_value_orders, different scale shape.

    When the build side's key set is too large to broadcast exactly, a
    Bloom filter broadcasts in O(m_bits) regardless of key count: per-batch
    bitmaps are OR-merged (the merge is sketch-sized — blocks × m/8 bytes —
    never key-count-sized), the probe side filters to candidates with zero
    shuffle, and only the candidate SUPERSET (exact hits + ~(1-e^{-kn/m})^k
    false positives) pays the exact repartition-join semi that removes
    false positives.  The final answer is exact — the Bloom stage only
    shrinks the join's left side, typically by orders of magnitude.
    """
    import pyarrow.compute as pc

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def build_bitmap(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater(batch.column("o_totalprice"), cutoff))
        keys = np.unique(t.column("o_custkey").to_numpy(
            zero_copy_only=False))
        bits = np.zeros(m_bits >> 3, dtype=np.uint8)
        if len(keys):
            for pos in _bloom_positions(keys, m_bits, n_hashes):
                np.bitwise_or.at(bits, pos >> 3,
                                 np.uint8(1) << (pos & 7).astype(np.uint8))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    # sketch-sized driver reduce: blocks × m/8 bytes, independent of keys
    parts = orders.map_batches(
        build_bitmap, batch_format="pyarrow"
    ).to_pandas()
    merged = np.zeros(m_bits >> 3, dtype=np.uint8)
    for b in parts.bits:
        merged |= np.frombuffer(b, dtype=np.uint8)
    bloom_ref = ray.put(merged)

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])

    def probe(batch: pa.Table) -> pa.Table:
        bits = ray.get(bloom_ref)
        keys = batch.column("c_custkey").to_numpy(zero_copy_only=False)
        ok = np.ones(len(keys), dtype=bool)
        for pos in _bloom_positions(keys, m_bits, n_hashes):
            ok &= (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1 == 1
        return batch.filter(pa.array(ok))

    candidates = cust.map_batches(probe, batch_format="pyarrow")

    def high_value_keys(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater(batch.column("o_totalprice"), cutoff))
        return pa.table({"o_custkey": t.column("o_custkey")}).group_by(
            "o_custkey"
        ).aggregate([])

    return repartition_join(
        candidates,
        orders.map_batches(high_value_keys, batch_format="pyarrow"),
        "c_custkey",
        "o_custkey",
        {"c_custkey": pa.int64(), "c_name": pa.string()},
        {"o_custkey": pa.int64()},
        how="semi",
    )


# ---------------------------------------------------------------------------
# Full-outer activity join
# ---------------------------------------------------------------------------

def user_activity_outer(
    sf_dir: str, cutoff: float = 450000.0
) -> "ray.data.Dataset":
    """FULL OUTER join of two independent per-key aggregates: event counts
    per user vs high-value order counts per customer, on user_id ≡
    o_custkey.  Unmatched sides (users with no high-value orders;
    customers outside the event log) report zero — the
    reconciliation-report shape.  Both sides partial-aggregate before the
    single repartition_join(how="outer") shuffle."""
    ev = _read(sf_dir, "events", columns=["user_id"])

    def ev_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("user_id", as_index=False).agg(
            n_events=("user_id", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    ev_counts = coarse_grouped_map(
        ev.map_batches(ev_partial, batch_format="pyarrow"),
        "user_id",
        lambda df: df.groupby("user_id", as_index=False).agg(
            n_events=("n_events", "sum")
        ),
    )

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def o_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df.o_totalprice > cutoff]
        g = df.groupby("o_custkey", as_index=False).agg(
            n_high_orders=("o_custkey", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    o_counts = coarse_grouped_map(
        orders.map_batches(o_partial, batch_format="pyarrow"),
        "o_custkey",
        lambda df: df.groupby("o_custkey", as_index=False).agg(
            n_high_orders=("n_high_orders", "sum")
        ),
    )

    joined = repartition_join(
        ev_counts,
        o_counts,
        left_on="user_id",
        right_on="o_custkey",
        left_types={"user_id": pa.int64(), "n_events": pa.int64()},
        right_types={"o_custkey": pa.int64(), "n_high_orders": pa.int64()},
        how="outer",
    )

    def fill_zero(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "key": df.user_id.astype(np.int64),
                "n_events": df.n_events.fillna(0).astype(np.int64),
                "n_high_orders": df.n_high_orders.fillna(0).astype(np.int64),
            }
        )
        return out

    return joined.map_batches(
        fill_zero, batch_format="pandas", batch_size=None
    )


# ---------------------------------------------------------------------------
# Per-user inter-arrival gaps (lag/diff window) and JSON props extraction
# ---------------------------------------------------------------------------


def events_interarrival(sf_dir: str) -> "ray.data.Dataset":
    """Per-user inter-arrival statistics: (user_id, n_events, sum_gap_us,
    max_gap_us) where gaps are microsecond differences between successive
    events of that user ordered by (ts, event_id).

    The lag/diff window needs every event of a user in one place sorted
    by time — coarse partition on user_id (all of a user's rows co-locate
    by construction), then ONE vectorized sort + groupby-diff per
    partition.  Gap arithmetic stays int64 microseconds end-to-end, so
    the engine and the SQL oracle agree bit-for-bit (no float summation
    order).  Skew note: a single user's history must fit in a worker —
    true for any real per-user stream; a hot synthetic key would need
    time-bucketed pre-gapping (diff within bucket + boundary stitch).
    """
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])

    def gaps_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        # normalize to µs regardless of the frame's datetime resolution
        # (arrow timestamp[us] → datetime64[us], pd.to_datetime → [ns])
        ts_us = df.ts.astype("datetime64[us]").astype("int64")
        gap = ts_us.groupby(df.user_id, sort=False).diff()
        out = pd.DataFrame(
            {"user_id": df.user_id, "gap": gap}
        ).dropna()
        out["gap"] = out.gap.astype("int64")
        g = out.groupby("user_id", as_index=False).agg(
            n_gaps=("gap", "size"),
            sum_gap_us=("gap", "sum"),
            max_gap_us=("gap", "max"),
        )
        g["n_gaps"] = g.n_gaps.astype("int64")
        return g

    return coarse_grouped_map(ev, "user_id", gaps_partition)


_PROPS_K_RE = r'"k": (?P<k>\d+)'


def events_props_stats(sf_dir: str) -> "ray.data.Dataset":
    """Semi-structured extraction: pull the integer ``k`` field out of
    the JSON-ish ``props`` string column with ONE vectorized RE2 pass
    (pyarrow.compute.extract_regex — no JSON parser, no Python rows),
    then aggregate per event_type: (event_type, n, sum_k, max_k).

    Combiner-first: each batch collapses to ≤ |event_type| rows before
    the keyed shuffle.  All-integer outputs — exact vs the SQL oracle.
    """
    import pyarrow.compute as pc

    ev = _read(sf_dir, "events", columns=["event_type", "props"])

    def partial(batch: pa.Table) -> pa.Table:
        k = pc.cast(
            pc.struct_field(
                pc.extract_regex(batch.column("props"), _PROPS_K_RE), "k"
            ),
            pa.int64(),
        )
        t = pa.table({"event_type": batch.column("event_type"), "k": k})
        t = t.filter(pc.is_valid(t.column("k")))
        return (
            t.group_by("event_type")
            .aggregate([("k", "count"), ("k", "sum"), ("k", "max")])
            .rename_columns(["event_type", "n", "sum_k", "max_k"])
        )

    return coarse_grouped_map(
        ev.map_batches(partial, batch_format="pyarrow"),
        "event_type",
        lambda df: df.groupby("event_type", as_index=False).agg(
            n=("n", "sum"), sum_k=("sum_k", "sum"), max_k=("max_k", "max")
        ),
        num_partitions=8,
    )


def events_funnel(sf_dir: str) -> "ray.data.Dataset":
    """Ordered conversion funnel view → click → purchase: one row
    (n_view, n_click, n_purchase) counting users whose first view is
    strictly before some click which is strictly before some purchase.

    Funnel matching needs each user's events together — ONE coarse
    partition by user_id, then the whole three-stage match is vectorized
    pandas inside the partition (min view ts; min click ts after it; any
    purchase after that).  Partitions emit per-partition counts; the
    driver-visible result is three integers, never rows.
    """
    ev = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])

    def funnel_partition(df: pd.DataFrame) -> pd.DataFrame:
        v = (
            df[df.event_type == "view"]
            .groupby("user_id")
            .ts.min()
            .rename("t1")
        )
        c = df[df.event_type == "click"].join(v, on="user_id", how="inner")
        c = (
            c[c.ts > c.t1]
            .groupby("user_id")
            .ts.min()
            .rename("t2")
        )
        p = df[df.event_type == "purchase"].join(
            c, on="user_id", how="inner"
        )
        p = p[p.ts > p.t2].groupby("user_id").ts.min()
        return pd.DataFrame(
            {
                "n_view": [np.int64(len(v))],
                "n_click": [np.int64(len(c))],
                "n_purchase": [np.int64(len(p))],
            }
        )

    parts = coarse_grouped_map(ev, "user_id", funnel_partition)

    def total(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n_view": [np.int64(df.n_view.sum())],
                "n_click": [np.int64(df.n_click.sum())],
                "n_purchase": [np.int64(df.n_purchase.sum())],
            }
        )

    return parts.repartition(1).map_batches(
        total, batch_format="pandas", batch_size=None
    )


def lineitem_qty_price_corr(sf_dir: str) -> "ray.data.Dataset":
    """One-pass distributed Pearson correlation between l_quantity and
    l_extendedprice: each batch emits the six moment sums (n, Σx, Σy,
    Σx², Σy², Σxy) in float64, one tiny reduce adds them, and the
    closed-form r = (nΣxy − ΣxΣy)/√((nΣx²−(Σx)²)(nΣy²−(Σy)²)) is
    evaluated once — the moment-sketch shape every streaming statistic
    (variance, covariance, OLS slope) shares.  The oracle evaluates the
    SAME closed form from SQL sums; both sides round half-up to 1e-6.
    Output: one row (n, corr_qty_price).
    """
    li = _read(sf_dir, "lineitem",
               columns=["l_quantity", "l_extendedprice"])

    def moments(batch: pa.Table) -> pa.Table:
        x = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        y = batch.column("l_extendedprice").to_numpy(
            zero_copy_only=False
        )
        x = x.astype(np.float64)
        y = y.astype(np.float64)
        return pa.table(
            {
                "n": pa.array([np.int64(len(x))], pa.int64()),
                "sx": pa.array([x.sum()], pa.float64()),
                "sy": pa.array([y.sum()], pa.float64()),
                "sxx": pa.array([(x * x).sum()], pa.float64()),
                "syy": pa.array([(y * y).sum()], pa.float64()),
                "sxy": pa.array([(x * y).sum()], pa.float64()),
            }
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        n = float(df.n.sum())
        sx, sy = df.sx.sum(), df.sy.sum()
        sxx, syy, sxy = df.sxx.sum(), df.syy.sum(), df.sxy.sum()
        r = (n * sxy - sx * sy) / np.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )
        return pd.DataFrame(
            {
                "n": [np.int64(n)],
                "corr_qty_price": [float(np.floor(r * 1e6 + 0.5) / 1e6)],
            }
        )

    return (
        li.map_batches(moments, batch_format="pyarrow")
        .repartition(1)
        .map_batches(combine, batch_format="pandas", batch_size=None)
    )


def user_event_sets(
    sf_dir: str, a: str = "view", b: str = "purchase",
    mode: str = "intersect", b_min_value: float = None,
) -> "ray.data.Dataset":
    """Distributed set operations on per-user event participation:
    mode='intersect' -> users with BOTH an ``a`` and a ``b`` event;
    mode='except'    -> users with an ``a`` event and NO ``b`` event
    (``b_min_value`` optionally restricts the b side to events above a
    value threshold — without it, every user at small sf participates
    in every type and the difference is empty).

    One pass: each batch folds to (user_id, has_a, has_b) partial flags
    (the combiner — bool OR is algebraic), one coarse keyed reduce ORs
    the partials and applies the set predicate.  Equivalent SQL
    INTERSECT / EXCEPT move both operand sets through a shuffle too;
    this form moves ≤ one row per (user × block) instead of one per
    event.
    """
    if mode not in ("intersect", "except"):
        raise ValueError(f"unknown mode: {mode}")
    cols = ["user_id", "event_type"]
    if b_min_value is not None:
        cols.append("value")
    ev = _read(sf_dir, "events", columns=cols)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df.event_type.isin((a, b))]
        is_b = df.event_type == b
        if b_min_value is not None:
            is_b &= df.value > b_min_value
        g = df.assign(
            has_a=(df.event_type == a).astype(np.int8),
            has_b=is_b.astype(np.int8),
        ).groupby("user_id", as_index=False)[["has_a", "has_b"]].max()
        return pa.Table.from_pandas(g, preserve_index=False)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", as_index=False)[["has_a", "has_b"]].max()
        if mode == "intersect":
            keep = (g.has_a == 1) & (g.has_b == 1)
        else:
            keep = (g.has_a == 1) & (g.has_b == 0)
        return g.loc[keep, ["user_id"]]

    out = coarse_grouped_map(
        ev.map_batches(partial, batch_format="pyarrow"),
        "user_id",
        final,
    )
    # an empty set difference must still carry its column
    return schema_floor(out, pa.schema([("user_id", pa.int64())]))


def cohort_retention(sf_dir: str) -> "ray.data.Dataset":
    """Day-cohort retention matrix: users grouped by their FIRST active
    day, counted distinct on every subsequent active day — the classic
    product-analytics triangle.

    Three fully distributed steps: (1) per-user first day (per-batch min
    partials, one keyed reduce); (2) per-user distinct active days
    (per-batch combiner) repartition-joined to the cohort table on
    user_id — fact↔fact, both sides shuffle once, no broadcast of the
    user dimension (it scales with the data); (3) distinct-user counts
    per (cohort_day, activity_day) — a keyed reduce whose partition key
    is the matrix cell, so one cell's users land together and the count
    is one vectorized nunique.
    """
    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def first_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["day"] = df.ts.dt.floor("D")
        g = df.groupby("user_id", as_index=False).agg(
            cohort_day=("day", "min")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def first_final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("user_id", as_index=False).agg(
            cohort_day=("cohort_day", "min")
        )

    cohorts = coarse_grouped_map(
        ev.map_batches(first_partial, batch_format="pyarrow"),
        "user_id",
        first_final,
    )

    def active_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["activity_day"] = df.ts.dt.floor("D")
        g = df[["user_id", "activity_day"]].drop_duplicates()
        return pa.Table.from_pandas(g, preserve_index=False)

    active = ev.map_batches(active_partial, batch_format="pyarrow")

    joined = repartition_join(
        active,
        cohorts,
        left_on="user_id",
        right_on="user_id",
        left_types={
            "user_id": pa.int64(),
            "activity_day": pa.timestamp("us"),
        },
        right_types={
            "user_id": pa.int64(),
            "cohort_day": pa.timestamp("us"),
        },
    )

    def cell_counts(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates(
            ["cohort_day", "activity_day", "user_id"]
        ).groupby(["cohort_day", "activity_day"], as_index=False).agg(
            n_users=("user_id", "nunique")
        )
        g["n_users"] = g["n_users"].astype(np.int64)
        return g

    return coarse_grouped_map(
        joined, ["cohort_day", "activity_day"], cell_counts
    )


# ---------------------------------------------------------------------------
# Markov transition counts over per-user event sequences
# ---------------------------------------------------------------------------

def event_transitions(sf_dir: str) -> "ray.data.Dataset":
    """Corpus-wide event-type transition matrix: for every consecutive
    pair in a user's timeline (ordered by ts, event_id), count
    (from_type -> to_type) occurrences.

    The LAG window runs as ONE user-keyed coarse shuffle; inside a
    partition the pairing is a vectorized shift guarded by a same-user
    mask (thousands of whole users per partition, no per-user Python),
    and the partition emits PRE-COUNTED (from_type, to_type, n) rows —
    the final reduce over the type-squared matrix moves only
    dimension-bounded rows.  Ties on ts are broken by event_id, same as
    the oracle's window ORDER BY.
    """
    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_id",
                                          "event_type"])

    def pair_counts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g.user_id.to_numpy()
        t = g.event_type.to_numpy(object)
        if len(g) < 2:
            return pd.DataFrame(
                {
                    "from_type": pd.Series([], dtype=object),
                    "to_type": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        same = u[:-1] == u[1:]
        d = pd.DataFrame({"from_type": t[:-1][same], "to_type": t[1:][same]})
        out = d.groupby(["from_type", "to_type"], as_index=False).size()
        out.columns = ["from_type", "to_type", "n"]
        out["n"] = out.n.astype(np.int64)
        return out

    partial = coarse_grouped_map(ev, "user_id", pair_counts)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["from_type", "to_type"], as_index=False).agg(
            n=("n", "sum")
        )
        g["n"] = g.n.astype(np.int64)
        return g

    return coarse_grouped_map(partial, ["from_type", "to_type"], final,
                              num_partitions=8)


# ---------------------------------------------------------------------------
# Per-user session-level summary
# ---------------------------------------------------------------------------

def session_stats(sf_dir: str, gap_minutes: int = 30) -> "ray.data.Dataset":
    """Per user over their 30-minute-gap sessions: session count, total
    events, largest session, and mean session duration in seconds.

    Builds on the events_sessions shape — the sessionization AND the
    per-user rollup happen inside the SAME user-keyed coarse partition
    (a user's whole timeline is co-located by construction), so the
    whole operator is one all-to-all.  mean_session_seconds is rounded
    half-up to 6 decimals (the oracle divides in a different dtype
    order).
    """
    ev = _read(sf_dir, "events", columns=["user_id", "ts"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"])
        new_user = g.user_id.ne(g.user_id.shift())
        sess = (new_user | (g.ts.diff() > gap)).cumsum()
        s = g.groupby(sess).agg(
            user_id=("user_id", "first"),
            start=("ts", "min"),
            end=("ts", "max"),
            n=("ts", "size"),
        )
        s["dur"] = (s.end - s.start).dt.total_seconds()
        out = s.groupby("user_id", as_index=False).agg(
            n_sessions=("n", "size"),
            n_events=("n", "sum"),
            max_session_events=("n", "max"),
            mean_session_seconds=("dur", "mean"),
        )
        for c in ["n_sessions", "n_events", "max_session_events"]:
            out[c] = out[c].astype(np.int64)
        out["mean_session_seconds"] = (
            np.floor(out.mean_session_seconds.to_numpy() * 1e6 + 0.5) / 1e6
        )
        return out

    return coarse_grouped_map(ev, "user_id", per_user)


# ---------------------------------------------------------------------------
# Referential-integrity audit
# ---------------------------------------------------------------------------

def integrity_audit(sf_dir: str) -> "ray.data.Dataset":
    """Data-quality audit across the star schema: for each foreign-key
    relationship, the total child rows and the count whose parent key
    is MISSING (orphans).

    ALL seven relationships audit through ONE all-to-all: every table
    contributes per-batch-distinct (rel_id, key, is_child) rows tagged
    with its relationship and side, the union shuffles once on
    hash(rel_id, key) — a key's child and parent sightings land in the
    same partition — and a single grouped pass computes per-
    relationship distinct-child and orphan counts as partition-local
    partials (≤ 7 rows each), finished by a 7-row reduce.  No
    driver-side key sets, and no per-relationship sequential pipelines
    (the previous shape paid 7 × 3 sequential shuffle fixed costs).
    """

    rels = [
        ("lineitem.l_orderkey", "orders.o_orderkey"),
        ("lineitem.l_partkey", "part.p_partkey"),
        ("lineitem.l_suppkey", "supplier.s_suppkey"),
        ("orders.o_custkey", "customer.c_custkey"),
        ("customer.c_nationkey", "nation.n_nationkey"),
        ("supplier.s_nationkey", "nation.n_nationkey"),
        ("nation.n_regionkey", "region.r_regionkey"),
    ]

    # one READ per table: a table contributes every (relationship,
    # side) role it plays from a single column-pruned scan — lineitem's
    # three FK columns tag in one map rather than three pipelines
    # (union input count is what sets the fixed cost here)
    roles: dict = {}
    for i, (child_ref, parent_ref) in enumerate(rels):
        ct, ck = child_ref.split(".")
        pt, pk = parent_ref.split(".")
        roles.setdefault(ct, []).append((i, ck, 1))
        roles.setdefault(pt, []).append((i, pk, 0))

    parts = []
    for tbl, rs in roles.items():
        ds = _read(sf_dir, tbl, columns=sorted({c for _, c, _ in rs}))

        def tag(batch: pa.Table, _roles=tuple(rs)) -> pa.Table:
            # per-batch distinct bounds the shuffle to one row per
            # (key, block); global dedup happens in the keyed pass
            df = batch.to_pandas()
            outs = []
            for rid, col, is_child in _roles:
                keys = df[[col]].drop_duplicates()[col].to_numpy(np.int64)
                outs.append(
                    pa.table(
                        {
                            "rel_id": pa.array(
                                np.full(len(keys), rid, np.int64)
                            ),
                            "key": pa.array(keys, pa.int64()),
                            "is_child": pa.array(
                                np.full(len(keys), is_child, np.int64)
                            ),
                        }
                    )
                )
            return pa.concat_tables(outs)

        parts.append(ds.map_batches(tag, batch_format="pyarrow"))

    unioned = parts[0].union(*parts[1:])

    def audit_partition(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["rel_id", "key"], as_index=False).agg(
            mx=("is_child", "max"), mn=("is_child", "min")
        )
        has_child = g.mx == 1
        orphan = has_child & (g.mn == 1)  # no parent sighting
        return pd.DataFrame(
            {"rel_id": g.rel_id, "child": has_child, "orph": orphan}
        ).groupby("rel_id", as_index=False).agg(
            n_child_keys=("child", "sum"), n_orphan_keys=("orph", "sum")
        )

    partials = coarse_grouped_map(
        unioned,
        ["rel_id", "key"],
        audit_partition,
        num_partitions=16,
    )

    names = [f"{c}->{p}" for c, p in rels]

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("rel_id", as_index=False).agg(
            n_child_keys=("n_child_keys", "sum"),
            n_orphan_keys=("n_orphan_keys", "sum"),
        )
        return pd.DataFrame(
            {
                "relationship": [names[i] for i in g.rel_id],
                "n_child_keys": g.n_child_keys.astype(np.int64),
                "n_orphan_keys": g.n_orphan_keys.astype(np.int64),
            }
        )

    return (
        partials.repartition(1)  # <= 7 x partitions tiny rows
        .map_batches(finish, batch_format="pandas", batch_size=None)
    )


# ---------------------------------------------------------------------------
# Z-score anomaly flags per event type
# ---------------------------------------------------------------------------

def event_anomalies(sf_dir: str, z_thresh: float = 3.0) -> "ray.data.Dataset":
    """Events whose value is a |z| > ``z_thresh`` outlier within their
    event type, plus each type's population moments.

    Two passes, both map-shaped: (1) per-type count/sum/sumsq moments
    fold per batch into type-bounded rows (the classic moment sketch —
    no shuffle of raw events); (2) the tiny moment table broadcasts
    back and a pure vectorized map flags outliers.  Output is one row
    per anomalous event (id, type, value, z), z rounded half-up to 6
    decimals.
    """
    ev = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def moment_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["v2"] = df.value * df.value
        g = df.groupby("event_type", as_index=False).agg(
            n=("value", "size"), s=("value", "sum"), sq=("v2", "sum")
        )
        g["n"] = g.n.astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    m = (
        ev.map_batches(moment_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("event_type", as_index=False)
        .agg(n=("n", "sum"), s=("s", "sum"), sq=("sq", "sum"))
    )
    m["mean"] = m.s / m.n
    m["std"] = np.sqrt(m.sq / m.n - m["mean"] ** 2)  # population std
    m_ref = ray.put(m.set_index("event_type")[["mean", "std"]])

    def flag(batch: pa.Table) -> pa.Table:
        look = ray.get(m_ref)
        df = batch.to_pandas()
        mu = df.event_type.map(look["mean"]).to_numpy()
        sd = df.event_type.map(look["std"]).to_numpy()
        z = (df.value.to_numpy() - mu) / sd
        keep = np.abs(z) > z_thresh
        out = df.loc[keep, ["event_id", "event_type", "value"]].copy()
        out["z"] = np.floor(z[keep] * 1e6 + 0.5) / 1e6
        return pa.Table.from_pandas(out, preserve_index=False)

    return ev.map_batches(flag, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Repurchase latency: gap between consecutive orders per customer
# ---------------------------------------------------------------------------

def repurchase_latency(sf_dir: str) -> "ray.data.Dataset":
    """Per customer with >= 2 orders: number of orders, mean and max gap
    in days between consecutive orders (date, orderkey tiebreak).

    One customer-keyed coarse shuffle; gaps come from a vectorized diff
    over the partition-sorted timeline with a same-customer mask.
    mean_gap_days is rounded half-up to 6 decimals.
    """
    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderdate", "o_orderkey"])

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        cust = g.o_custkey.to_numpy()
        days = g.o_orderdate.to_numpy("datetime64[D]").astype(np.int64)
        same = cust[:-1] == cust[1:]
        d = pd.DataFrame(
            {
                "o_custkey": cust[1:][same],
                "gap": (days[1:] - days[:-1])[same].astype(np.float64),
            }
        )
        n_orders = pd.Series(cust).value_counts()
        out = d.groupby("o_custkey", as_index=False).agg(
            n_gaps=("gap", "size"),
            mean_gap_days=("gap", "mean"),
            max_gap_days=("gap", "max"),
        )
        out["n_orders"] = out.o_custkey.map(n_orders).astype(np.int64)
        out["n_gaps"] = out.n_gaps.astype(np.int64)
        out["mean_gap_days"] = (
            np.floor(out.mean_gap_days.to_numpy() * 1e6 + 0.5) / 1e6
        )
        out["max_gap_days"] = out.max_gap_days.astype(np.int64)
        return out[["o_custkey", "n_orders", "n_gaps", "mean_gap_days",
                    "max_gap_days"]]

    return coarse_grouped_map(orders, "o_custkey", gaps)


# ---------------------------------------------------------------------------
# Join-key skew profile (shuffle planning diagnostics)
# ---------------------------------------------------------------------------

def key_skew_profile(sf_dir: str) -> "ray.data.Dataset":
    """Frequency-of-frequency histogram for the hot join keys
    (lineitem.l_orderkey, events.user_id): how many keys occur exactly
    r times.  This is the diagnostic that decides salting / hot-key
    handling before a 100-TB shuffle.

    Per key: one combiner-first keyed reduce to exact per-key counts,
    then the counts collapse map-side to the (rows_per_key, n_keys)
    histogram — O(distinct multiplicities) rows, the same
    histogram-bounded argument as corpus_stats.zipf_slope.
    """

    def one(table: str, key: str) -> pd.DataFrame:
        ds = _read(sf_dir, table, columns=[key])

        def partial(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            g = df.groupby(key, as_index=False).size()
            g.columns = [key, "c"]
            g["c"] = g.c.astype(np.int64)
            return pa.Table.from_pandas(g, preserve_index=False)

        counts = coarse_grouped_map(
            ds.map_batches(partial, batch_format="pyarrow"),
            key,
            lambda d: d.groupby(key, as_index=False).agg(c=("c", "sum")),
            num_partitions=16,
        )

        def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
            h = df.groupby("c", as_index=False).size()
            h.columns = ["rows_per_key", "n_keys"]
            return h

        hist = (
            counts.map_batches(hist_partial, batch_format="pandas",
                               batch_size=None)
            .to_pandas()
            .groupby("rows_per_key", as_index=False)
            .agg(n_keys=("n_keys", "sum"))
        )
        hist.insert(0, "table_key", f"{table}.{key}")
        return hist

    out = pd.concat(
        [one("lineitem", "l_orderkey"), one("events", "user_id")],
        ignore_index=True,
    )
    out["rows_per_key"] = out.rows_per_key.astype(np.int64)
    out["n_keys"] = out.n_keys.astype(np.int64)
    return ray.data.from_pandas(out)


# ---------------------------------------------------------------------------
# Hopping (sliding) window counts
# ---------------------------------------------------------------------------

def events_hopping_counts(
    sf_dir: str, window_min: int = 60, hop_min: int = 15
) -> "ray.data.Dataset":
    """Per (window_start, event_type): event count for HOPPING windows of
    ``window_min`` minutes advancing every ``hop_min`` — each event lands
    in window/hop overlapping windows (the streaming-aggregation shape
    tumbling ``events_hourly`` cannot express).

    Map side explodes each event into its window/hop (window_start,
    type) memberships with one numpy tile — already partially counted
    per batch — then ONE keyed reduce.  Window starts are exact int64
    epoch-µs multiples of the hop, so the oracle comparison has no
    timestamp-rounding slack.
    """
    hop_us = hop_min * 60_000_000
    win_us = window_min * 60_000_000
    n_win = win_us // hop_us
    ev = _read(sf_dir, "events", columns=["ts", "event_type"])

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        ts_us = batch.ts.astype("datetime64[us]").astype("int64").to_numpy()
        base = (ts_us // hop_us) * hop_us
        starts = (
            base[:, None]
            - np.arange(n_win, dtype=np.int64)[None, :] * hop_us
        ).ravel()
        types = np.repeat(batch.event_type.to_numpy(), n_win)
        df = pd.DataFrame({"window_start_us": starts, "event_type": types})
        g = df.groupby(["window_start_us", "event_type"],
                       as_index=False).size()
        g.columns = ["window_start_us", "event_type", "n"]
        return g.astype({"n": "int64"})

    counts = coarse_grouped_map(
        ev.map_batches(explode, batch_format="pandas"),
        ["window_start_us", "event_type"],
        lambda df: df.groupby(["window_start_us", "event_type"],
                              as_index=False).agg(n=("n", "sum")),
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "window_start": pd.to_datetime(
                    df.window_start_us, unit="us"
                ).astype("datetime64[us]"),
                "event_type": df.event_type,
                "n": df.n.astype(np.int64),
            }
        )

    return counts.map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# Per-window top-k event types
# ---------------------------------------------------------------------------

def events_window_topk_types(sf_dir: str, k: int = 3) -> "ray.data.Dataset":
    """Top-``k`` event types per hour bucket with in-window rank (count
    desc, type asc) — the per-window grouped rank of a streaming
    leaderboard.  Counts compact map-side per (hour, type); the rank
    runs over the compacted table grouped by hour."""
    ev = _read(sf_dir, "events", columns=["ts", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hour = (
            df.ts.astype("datetime64[us]").astype("int64")
            // 3_600_000_000
        ) * 3_600_000_000
        g = pd.DataFrame({"hour_us": hour, "event_type": df.event_type})
        g = g.groupby(["hour_us", "event_type"], as_index=False).size()
        g.columns = ["hour_us", "event_type", "n"]
        return g.astype({"n": "int64"})

    counts = coarse_grouped_map(
        ev.map_batches(partial, batch_format="pandas"),
        ["hour_us", "event_type"],
        lambda df: df.groupby(["hour_us", "event_type"],
                              as_index=False).agg(n=("n", "sum")),
    )

    def hour_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["hour_us", "n", "event_type"], ascending=[True, False, True]
        )
        df = df.groupby("hour_us", as_index=False).head(k)
        df["rnk"] = df.groupby("hour_us").cumcount() + 1
        out = pd.DataFrame(
            {
                "hour": pd.to_datetime(df.hour_us, unit="us").astype(
                    "datetime64[us]"
                ),
                "rnk": df.rnk.astype(np.int64),
                "event_type": df.event_type,
                "n": df.n.astype(np.int64),
            }
        )
        return out

    return coarse_grouped_map(counts, "hour_us", hour_topk)


# ---------------------------------------------------------------------------
# Delivery dedup within a time tolerance
# ---------------------------------------------------------------------------

def event_dedup_tolerance(sf_dir: str, tol_s: int = 3600) -> "ray.data.Dataset":
    """At-least-once delivery dedup: drop an event when the PREVIOUS
    event of the same (user_id, event_type) — ordered by (ts, event_id)
    — is within ``tol_s`` seconds (default 1h on the sparse synthetic
    stream; the lag-based dedup rule — note this
    is the SQL-window semantics, NOT the sequential kept-state variant:
    three events 3s apart keep #1 and #3 here, while a stateful
    deduper would keep only #1).  → surviving (event_id, user_id,
    event_type, ts).

    One user-keyed coarse partition; inside, a vectorized sort + shift
    per (user, type).  Gap math is int64 µs — zero FP slack vs oracle.
    """
    tol_us = tol_s * 1_000_000
    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type"])

    def dedup_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "event_type", "ts", "event_id"])
        ts_us = df.ts.astype("datetime64[us]").astype("int64")
        prev = ts_us.groupby(
            [df.user_id, df.event_type], sort=False
        ).shift()
        keep = prev.isna() | ((ts_us - prev) > tol_us)
        out = df.loc[keep, ["event_id", "user_id", "event_type", "ts"]]
        return out

    return coarse_grouped_map(ev, "user_id", dedup_partition)


# ---------------------------------------------------------------------------
# Per-user-per-hour throttle
# ---------------------------------------------------------------------------

def user_hour_throttle(sf_dir: str, cap: int = 3) -> "ray.data.Dataset":
    """Rate-limit materialization: keep only the first ``cap`` events of
    each (user, hour) by (ts, event_id) — the ingestion throttle a
    pipeline applies against event spam before anything downstream pays
    for the flood.  → (event_id, user_id, ts).

    One user-keyed coarse partition (a user's hours all co-locate);
    inside, sort + cumcount < cap, fully vectorized.
    """
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])

    def throttle(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        hour = (
            df.ts.astype("datetime64[us]").astype("int64") // 3_600_000_000
        )
        pos = df.groupby([df.user_id, hour], sort=False).cumcount()
        return df.loc[pos < cap, ["event_id", "user_id", "ts"]]

    return coarse_grouped_map(ev, "user_id", throttle)


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (deterministic A-ES)
# ---------------------------------------------------------------------------

def weighted_sample(sf_dir: str, k: int = 100) -> "ray.data.Dataset":
    """Deterministic weighted sampling WITHOUT replacement over
    documents, weight = n_chars (Efraimidis-Spirakis A-ES: key =
    ln(u)/w with u ∈ (0,1] derived from the engine-stable multiplicative
    hash of doc_id; the k LARGEST keys are the sample — equivalent to
    u^(1/w) ranking, inclusion probability ∝ weight).

    Pure map (key computation) + per-block top-k + driver finish over
    ≤ blocks×k rows — the deterministic twin of reservoir sampling, and
    exactly reproducible in SQL because u is a hash, not an RNG.
    """
    from .curate import SPLIT_MULT

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "n_chars"],
    )

    def keys(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        w = batch.column("n_chars").to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            h = ids.astype(np.uint64) * np.uint64(SPLIT_MULT)
        u = (h.astype(np.float64) + 1.0) / 18446744073709551616.0
        key = np.log(u) / w.astype(np.float64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": batch.column("n_chars"),
                "key": pa.array(key, pa.float64()),
            }
        )

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["key", "doc_id"],
                              ascending=[False, True]).head(k)

    cand = (
        docs.map_batches(keys, batch_format="pyarrow")
        .map_batches(block_topk, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    t = cand.sort_values(["key", "doc_id"], ascending=[False, True]).head(
        k
    ).reset_index(drop=True)
    t["rnk"] = np.arange(1, len(t) + 1, dtype=np.int64)
    return ray.data.from_pandas(t[["rnk", "doc_id", "n_chars"]])


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov statistic (distribution drift)
# ---------------------------------------------------------------------------

def ks_statistic(
    sf_dir: str,
    type_a: str = "purchase",
    type_b: str = "view",
    n_ranges: int = 64,
) -> "ray.data.Dataset":
    """One-row exact two-sample KS statistic between the value
    distributions of two event types: max |F_a(x) - F_b(x)| over all
    observed values — the drift test a pipeline runs between data
    vintages before trusting a new batch.

    Fully distributed ECDF: per-batch (value, a_cnt, b_cnt) partials,
    value-keyed reduce (distinct values compacted), then a distributed
    prefix sum in value order — values are RANGE-partitioned by a
    linear bucket of the parquet min/max stats (order-preserving), each
    range's totals go to the driver (n_ranges rows, the only driver
    state), offsets broadcast back, local cumsum per range, per-range
    max |·|, scalar max.  Same shape as stages/pack.pack_sequences'
    prefix sum.  Result rounded half-up to 6 decimals.
    """
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(os.path.join(sf_dir, "events.parquet"))
    idx = pf.schema_arrow.get_field_index("value")
    lo, hi = np.inf, -np.inf
    for rg in range(pf.metadata.num_row_groups):
        st = pf.metadata.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            lo, hi = np.inf, -np.inf
            break
        lo, hi = min(lo, st.min), max(hi, st.max)

    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    if not (np.isfinite(lo) and np.isfinite(hi)):
        # files written with statistics disabled (or an all-null value
        # column): fall back to one distributed min/max pass for the
        # range-partition bounds — the bounds only steer partitioning,
        # so any exact pair works
        lo = ev.min("value")
        hi = ev.max("value")
        if lo is None or hi is None:  # no rows at all
            lo, hi = 0.0, 1.0
    width = (hi - lo) / n_ranges or 1.0

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        df = batch[batch.event_type.isin([type_a, type_b])]
        if df.empty:
            return pd.DataFrame(
                {"value": pd.Series([], dtype="float64"),
                 "r": pd.Series([], dtype="int64"),
                 "ca": pd.Series([], dtype="int64"),
                 "cb": pd.Series([], dtype="int64")}
            )
        g = df.assign(
            ca=(df.event_type == type_a).astype(np.int64),
            cb=(df.event_type == type_b).astype(np.int64),
        ).groupby("value", as_index=False).agg(
            ca=("ca", "sum"), cb=("cb", "sum")
        )
        r = np.clip(
            ((g.value - lo) / width).astype(np.int64), 0, n_ranges - 1
        )
        return pd.DataFrame(
            {"value": g.value, "r": r,
             "ca": g.ca.astype(np.int64), "cb": g.cb.astype(np.int64)}
        )

    compacted = coarse_grouped_map(
        ev.map_batches(partial, batch_format="pandas"),
        "value",
        lambda df: df.groupby(["value", "r"], as_index=False).agg(
            ca=("ca", "sum"), cb=("cb", "sum")
        ),
    ).materialize()  # feeds range totals AND the per-range cumsum pass

    totals = (
        coarse_grouped_map(
            compacted,
            "r",
            lambda d: d.groupby("r", as_index=False).agg(
                ta=("ca", "sum"), tb=("cb", "sum")
            ),
            num_partitions=8,
        )
        .to_pandas()
        .sort_values("r")
    )
    na, nb = int(totals.ta.sum()), int(totals.tb.sum())
    off_a = dict(zip(totals.r, np.concatenate([[0], np.cumsum(totals.ta)[:-1]])))
    off_b = dict(zip(totals.r, np.concatenate([[0], np.cumsum(totals.tb)[:-1]])))
    off_ref = ray.put((off_a, off_b))

    def range_max(df: pd.DataFrame) -> pd.DataFrame:
        oa, ob = ray.get(off_ref)
        out = []
        for r, g in df.groupby("r", sort=False):
            g = g.sort_values("value")
            fa = (g.ca.cumsum() + oa[r]).to_numpy(np.float64) / float(na)
            fb = (g.cb.cumsum() + ob[r]).to_numpy(np.float64) / float(nb)
            out.append(np.abs(fa - fb).max())
        return pd.DataFrame({"m": out})

    best = coarse_grouped_map(
        compacted, "r", range_max, num_partitions=8
    ).max("m")
    ks = np.floor((best or 0.0) * 1e6 + 0.5) / 1e6
    return ray.data.from_pandas(
        pd.DataFrame({"ks": [ks], "n_a": [np.int64(na)],
                      "n_b": [np.int64(nb)]})
    )


# ---------------------------------------------------------------------------
# Benford first-digit profile
# ---------------------------------------------------------------------------

def benford_digits(sf_dir: str) -> "ray.data.Dataset":
    """First-significant-digit distribution of lineitem extended prices
    (the fraud/synthetic-data smell test): (digit, n, frac).  Prices are
    quantized to integer cents and the digit read from the exact decimal
    rendering of that integer — no float log10 boundary risk, identical
    in any engine.  Pure map + one 9-row keyed reduce.
    """
    li = _read(sf_dir, "lineitem", columns=["l_extendedprice"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(
            batch.l_extendedprice.to_numpy() * 100.0 + 0.5
        ).astype(np.int64)
        digits = pd.Series(cents).astype(str).str[0].astype(np.int64)
        g = digits.value_counts().rename_axis("digit").reset_index(name="n")
        return g.astype({"n": "int64"})

    counts = coarse_grouped_map(
        li.map_batches(partial, batch_format="pandas"),
        "digit",
        lambda df: df.groupby("digit", as_index=False).agg(n=("n", "sum")),
        num_partitions=8,
    ).materialize()

    total = counts.sum("n") or 1

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "digit": df.digit.astype(np.int64),
                "n": df.n.astype(np.int64),
                "frac": df.n.to_numpy(np.float64) / float(total),
            }
        )

    return counts.map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# Running cumulative distinct users per day
# ---------------------------------------------------------------------------

def running_distinct_users(sf_dir: str) -> "ray.data.Dataset":
    """(day, new_users, cum_users): how many users were EVER seen up to
    each calendar day — the growth curve a naive per-window COUNT
    DISTINCT cannot produce without rescanning history.

    Distinct-user state collapses to first-seen day (one keyed reduce
    over users); per-day new-user counts are day-keyed partials, and the
    running total is a driver cumsum over the DAY table (calendar days
    are dimension-bounded — the documented small side).  Day rendered
    as 'YYYY-MM-DD' text so both engines hash identical strings.
    """
    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def first_partial(batch: pd.DataFrame) -> pd.DataFrame:
        day = (
            batch.ts.astype("datetime64[us]").astype("int64")
            // 86_400_000_000
        )
        g = pd.DataFrame({"user_id": batch.user_id, "d": day}).groupby(
            "user_id", as_index=False
        ).agg(d=("d", "min"))
        return g

    firsts = coarse_grouped_map(
        ev.map_batches(first_partial, batch_format="pandas"),
        "user_id",
        lambda df: df.groupby("user_id", as_index=False).agg(d=("d", "min")),
    )

    per_day = coarse_grouped_map(
        firsts,
        "d",
        lambda df: df.groupby("d", as_index=False).agg(
            new_users=("user_id", "size")
        ),
        num_partitions=8,
    ).to_pandas().sort_values("d")  # calendar-bounded

    per_day["cum_users"] = per_day.new_users.cumsum()
    out = pd.DataFrame(
        {
            "day": pd.to_datetime(
                per_day.d * 86_400_000_000, unit="us"
            ).dt.strftime("%Y-%m-%d"),
            "new_users": per_day.new_users.astype(np.int64),
            "cum_users": per_day.cum_users.astype(np.int64),
        }
    )
    return ray.data.from_pandas(out.reset_index(drop=True))


# ---------------------------------------------------------------------------
# Median absolute deviation per event type
# ---------------------------------------------------------------------------

def events_mad(sf_dir: str) -> "ray.data.Dataset":
    """Robust per-type location/scale: (event_type, median_value, mad)
    with MAD = median(|value - median|), both medians linear-interpolated
    (quantile_cont convention, the one events_value_quantiles already
    oracle-matches).  One type-keyed partition carries both passes —
    the correlated second median needs the first, and all of a type's
    values are already co-located.  Rounded half-up to 4 decimals.
    """
    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    def mad_partition(g: pd.DataFrame) -> pd.DataFrame:
        rows = {"event_type": [], "median_value": [], "mad": []}
        for t, gd in g.groupby("event_type", sort=False):
            med = gd.value.quantile(0.5, interpolation="linear")
            mad = (gd.value - med).abs().quantile(
                0.5, interpolation="linear"
            )
            rows["event_type"].append(t)
            rows["median_value"].append(np.floor(med * 1e4 + 0.5) / 1e4)
            rows["mad"].append(np.floor(mad * 1e4 + 0.5) / 1e4)
        return pd.DataFrame(rows)

    return coarse_grouped_map(ev, "event_type", mad_partition,
                              num_partitions=8)


# ---------------------------------------------------------------------------
# Grouped OLS trend slope
# ---------------------------------------------------------------------------

def event_value_trend(
    sf_dir: str, origin: str = "2024-01-01"
) -> "ray.data.Dataset":
    """Per event type: the least-squares TREND of value over time —
    (event_type, n, slope_per_day) — the drift detector run per metric
    before a data vintage is trusted.

    Moment-sketch shape (one pass, no value ever shuffled twice):
    per-batch ARBITRARY-PRECISION moment partials (n, Σt, Σv, Σt², Σtv)
    with value in exact CENTS and t in whole SECONDS since ``origin``
    (both integerized so the sums are order-independent).  The high
    moments are accumulated as Python ints per batch — Σt² over a
    ~1-year window wraps numpy int64 at only ~10⁴ rows per type, while
    the DuckDB oracle accumulates in HUGEINT — and each partial travels
    as a hi/lo int64 pair (S = hi·2³² + lo), exact until |S| < 2⁹⁵.
    One keyed reduce recombines and re-sums in Python ints, then the
    closed form evaluates in arbitrary precision (python int here,
    HUGEINT in the oracle — n·Σtv overflows int64 by design) before one
    exact-rounded double division.  slope_per_day = cents/sec slope ×
    86400 / 100, rounded half-up to 8 decimals.
    """
    origin_us = int(pd.Timestamp(origin).value // 1_000)

    ev = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    _MOMS = ("st", "sv", "stt", "stv")

    def _split_frame(g: pd.DataFrame) -> pd.DataFrame:
        # exact python-int sums → transport-safe hi/lo int64 pairs
        out = {"event_type": g.event_type, "n": g.n.astype(np.int64)}
        for c in _MOMS:
            hi, lo = zip(*(divmod(int(s), 1 << 32) for s in g[c]))
            out[c + "_hi"] = np.array(hi, dtype=np.int64)
            out[c + "_lo"] = np.array(lo, dtype=np.int64)
        return pd.DataFrame(out)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        t = (
            (batch.ts.astype("datetime64[us]").astype("int64") - origin_us)
            // 1_000_000
        ).tolist()  # python ints from here on — no wrap anywhere
        v = [
            int(x)
            for x in np.floor(batch.value.to_numpy() * 100.0 + 0.5)
        ]
        df = pd.DataFrame(
            {
                "event_type": batch.event_type.to_numpy(),
                "n": 1,
                "st": pd.Series(t, dtype=object),
                "sv": pd.Series(v, dtype=object),
                "stt": pd.Series([x * x for x in t], dtype=object),
                "stv": pd.Series([x * y for x, y in zip(t, v)],
                                 dtype=object),
            }
        )
        g = df.groupby("event_type", as_index=False).agg(
            n=("n", "sum"), st=("st", "sum"), sv=("sv", "sum"),
            stt=("stt", "sum"), stv=("stv", "sum"),
        )
        return _split_frame(g)

    def reduce_sums(df: pd.DataFrame) -> pd.DataFrame:
        rec = {"event_type": df.event_type, "n": df.n}
        for c in _MOMS:
            rec[c] = pd.Series(
                [
                    (int(h) << 32) + int(lo)
                    for h, lo in zip(df[c + "_hi"], df[c + "_lo"])
                ],
                index=df.index,
                dtype=object,
            )
        g = pd.DataFrame(rec).groupby("event_type", as_index=False).agg(
            n=("n", "sum"), st=("st", "sum"), sv=("sv", "sum"),
            stt=("stt", "sum"), stv=("stv", "sum"),
        )
        return _split_frame(g)

    sums = coarse_grouped_map(
        ev.map_batches(partial, batch_format="pandas"),
        "event_type",
        reduce_sums,
        num_partitions=8,
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for r in df.itertuples():
            st = (int(r.st_hi) << 32) + int(r.st_lo)
            sv = (int(r.sv_hi) << 32) + int(r.sv_lo)
            stt = (int(r.stt_hi) << 32) + int(r.stt_lo)
            stv = (int(r.stv_hi) << 32) + int(r.stv_lo)
            # python ints: n·Σtv and Σt·Σv exceed int64 by construction
            num = int(r.n) * stv - st * sv
            den = int(r.n) * stt - st * st
            slope = (float(num) / float(den)) * 86400.0 / 100.0 if den else 0.0
            rows.append(
                (r.event_type, np.int64(r.n),
                 np.floor(slope * 1e8 + 0.5) / 1e8)
            )
        return pd.DataFrame(
            rows, columns=["event_type", "n", "slope_per_day"]
        )

    return sums.map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# One-pass numeric column profiler (data-quality audit)
# ---------------------------------------------------------------------------

def lineitem_profile(sf_dir: str) -> "ray.data.Dataset":
    """Per-column statistical profile of lineitem's numeric measures —
    the single-pass audit (count / nulls / min / max / mean / population
    std) a pipeline runs before trusting a new data vintage.

    One pass over the fact table, ALL columns profiled simultaneously:
    each batch melts its four measures into per-column ARBITRARY-
    PRECISION moment partials (n, n_null, min, max, Σcents, Σcents²) —
    values integerized to exact cents so the sums are order-independent,
    the two moment sums carried as Python ints and shipped as hi/lo
    int64 pairs (exact until 2⁹⁵; Σcents² over web-scale row counts
    wraps int64 by design, same HUGEINT discipline as
    ``event_value_trend``).  The keyed reduce sees ≤ 4 rows per block;
    the closed forms evaluate in exact ints before one double division
    per statistic, matching the DuckDB oracle's HUGEINT→DOUBLE ops
    bit-for-bit.  Output: (col, n, n_null, vmin, vmax, mean, std).
    """
    import math

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    li = _read(sf_dir, "lineitem", columns=cols)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in cols:
            v = batch[c]
            n_null = int(v.isna().sum())
            vv = v.dropna().to_numpy(np.float64)
            cents = [int(x) for x in np.floor(vv * 100.0 + 0.5)]
            s = sum(cents)
            ss = sum(x * x for x in cents)
            s_hi, s_lo = divmod(s, 1 << 32)
            ss_hi, ss_lo = divmod(ss, 1 << 32)
            rows.append(
                (
                    c,
                    len(vv),
                    n_null,
                    float(vv.min()) if len(vv) else np.nan,
                    float(vv.max()) if len(vv) else np.nan,
                    s_hi,
                    s_lo,
                    ss_hi,
                    ss_lo,
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "col", "n", "n_null", "vmin", "vmax",
                "s_hi", "s_lo", "ss_hi", "ss_lo",
            ],
        )

    def reduce_finish(df: pd.DataFrame) -> pd.DataFrame:
        rec = pd.DataFrame(
            {
                "col": df.col,
                "n": df.n.astype(np.int64),
                "n_null": df.n_null.astype(np.int64),
                "vmin": df.vmin,
                "vmax": df.vmax,
                "s": pd.Series(
                    [
                        (int(h) << 32) + int(lo)
                        for h, lo in zip(df.s_hi, df.s_lo)
                    ],
                    index=df.index,
                    dtype=object,
                ),
                "ss": pd.Series(
                    [
                        (int(h) << 32) + int(lo)
                        for h, lo in zip(df.ss_hi, df.ss_lo)
                    ],
                    index=df.index,
                    dtype=object,
                ),
            }
        )
        g = rec.groupby("col", as_index=False).agg(
            n=("n", "sum"),
            n_null=("n_null", "sum"),
            vmin=("vmin", "min"),
            vmax=("vmax", "max"),
            s=("s", "sum"),
            ss=("ss", "sum"),
        )
        rows = []
        for r in g.itertuples():
            n, s, ss = int(r.n), int(r.s), int(r.ss)
            if n == 0:
                mean = std = float("nan")
            else:
                # same op order as the oracle: HUGEINT→DOUBLE casts,
                # then two double divisions, then libm sqrt
                mean = float(s) / (100.0 * n)
                var = float(n * ss - s * s) / float(n * n) / 10000.0
                std = math.sqrt(var)
            rows.append(
                (
                    r.col,
                    np.int64(n),
                    np.int64(r.n_null),
                    r.vmin,
                    r.vmax,
                    np.floor(mean * 1e6 + 0.5) / 1e6,
                    np.floor(std * 1e6 + 0.5) / 1e6,
                )
            )
        return pd.DataFrame(
            rows,
            columns=["col", "n", "n_null", "vmin", "vmax", "mean", "std"],
        )

    return coarse_grouped_map(
        li.map_batches(partial, batch_format="pandas"),
        "col",
        reduce_finish,
        num_partitions=4,
    )


# ---------------------------------------------------------------------------
# Time-weighted average (trapezoid integral per event type)
# ---------------------------------------------------------------------------

def events_twap(sf_dir: str) -> "ray.data.Dataset":
    """Time-weighted average value per event type: the trapezoid
    integral of value over time divided by the observed duration —
    twap = Σ (vᵢ+vᵢ₊₁)/2 · (tᵢ₊₁−tᵢ) / (t_last − t_first) with pairs in
    (ts, event_id) order.  The neighbor-pair windowed-arithmetic class:
    each term needs ADJACENT rows of a global per-type order.

    Distributed with the same block-partial + boundary-stitch shape as
    the pack.py prefix sums: ONE global sort on (type, t, event_id),
    then each block folds its within-block trapezoid terms to one
    partial row per type segment (exact python-int sums of integerized
    cents × micros — per-term products exceed int64 by construction,
    HUGEINT discipline), and the driver stitches only the
    blocks × types boundary rows (one extra term where consecutive
    blocks share a type) — bounded by the block count, never the data.
    The closed form divides once in float64 with the same op order as
    the oracle.  Output: (event_type, n_events, twap) rounded 1e-6.
    """
    ev = _read(
        sf_dir, "events",
        columns=["event_type", "ts", "event_id", "value"],
    )

    def to_cols(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": df.event_type,
                "t": df.ts.astype("datetime64[us]").astype("int64"),
                "event_id": df.event_id.astype(np.int64),
                "vc": np.floor(
                    df.value.to_numpy(np.float64) * 100.0 + 0.5
                ).astype(np.int64),
            }
        )

    s = ev.map_batches(to_cols, batch_format="pandas").sort(
        ["event_type", "t", "event_id"]
    )

    def block_partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type", sort=False):
            t = [int(x) for x in g.t]          # python ints: products
            v = [int(x) for x in g.vc]         # exceed int64 at scale
            S = sum(
                (v[i] + v[i + 1]) * (t[i + 1] - t[i])
                for i in range(len(t) - 1)
            )
            hi, lo = divmod(S, 1 << 32)
            rows.append(
                (et, len(t), t[0], int(g.event_id.iloc[0]), v[0],
                 t[-1], v[-1], hi, lo)
            )
        return pd.DataFrame(
            rows,
            columns=["event_type", "n", "t_first", "id_first",
                     "v_first", "t_last", "v_last", "s_hi", "s_lo"],
        )

    partials = s.map_batches(
        block_partial, batch_format="pandas", batch_size=None
    ).to_pandas()  # blocks × types rows — block-bounded driver state

    out_rows = []
    p = partials.sort_values(["event_type", "t_first", "id_first"])
    for et, g in p.groupby("event_type", sort=False):
        S = 0
        for _, r in g.iterrows():
            S += (int(r.s_hi) << 32) + int(r.s_lo)
        # boundary terms between consecutive blocks of the same type
        for (_, a), (_, b) in zip(g[:-1].iterrows(), g[1:].iterrows()):
            S += (int(a.v_last) + int(b.v_first)) * (
                int(b.t_first) - int(a.t_last)
            )
        n = int(g.n.sum())
        dur = int(g.t_last.iloc[-1]) - int(g.t_first.iloc[0])
        twap = (
            float(S) / (200.0 * float(dur)) if dur > 0 else float("nan")
        )
        out_rows.append(
            (et, np.int64(n), np.floor(twap * 1e6 + 0.5) / 1e6)
        )
    return ray.data.from_pandas(
        pd.DataFrame(out_rows, columns=["event_type", "n_events", "twap"])
    )


# ---------------------------------------------------------------------------
# Distributed Spearman rank correlation (average-rank ties)
# ---------------------------------------------------------------------------

def spearman_qty_price(sf_dir: str, n_bins: int = 64) -> "ray.data.Dataset":
    """Spearman rank correlation between l_quantity and l_extendedprice
    — the outlier-robust monotonic-association check run alongside the
    Pearson ``lineitem_corr``.  ρ = Pearson correlation of the two
    columns' AVERAGE ranks (ties share the mean of their rank range),
    which needs a global ranking of every row on BOTH columns — the
    genuinely distributed part.

    Ranks are never materialized per row on the driver; each column is
    ranked by the strategy its domain allows:

    - l_quantity is DOMAIN-bounded (integral 1..50): a combiner-first
      value-count reduce yields the ≤50-row (value, count) table, whose
      prefix sums give every value's average rank.  Broadcast is
      bounded by the domain, not the corpus.
    - l_extendedprice is continuous (distinct ≈ rows): rows are
      range-BINNED on value (equal values always share a bin, so ties
      never straddle partitions), per-bin totals give bin rank offsets
      (n_bins driver rows — the only driver state for this column),
      and each bin ranks its own rows vectorized.  The same distributed
      prefix-sum shape as pack_sequences.

    Working in DOUBLED ranks (2·avg_rank = 2·offset + count + 1) keeps
    everything integral, so the five moment sums accumulate as exact
    Python ints (hi/lo int64 transport, HUGEINT in the oracle — the
    same arbitrary-precision discipline as event_value_trend; Σ(2r)²
    ~ 4n³ wraps int64 at n ≈ 2M by design).  The 2× scale cancels in
    the closed form.  Output: one row (n, spearman_qty_price), rounded
    half-up to 1e-6 in both engines.
    """
    li = _read(sf_dir, "lineitem",
               columns=["l_quantity", "l_extendedprice"])

    # -- pass 1: global y-range for binning (tiny: one row per batch)
    def minmax(batch: pa.Table) -> pa.Table:
        y = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        if len(y) == 0:  # empty block: contribute nothing to the range
            return pa.table({"ymin": pa.array([], pa.float64()),
                             "ymax": pa.array([], pa.float64())})
        return pa.table({"ymin": pa.array([float(y.min())]),
                         "ymax": pa.array([float(y.max())])})

    mm = li.map_batches(minmax, batch_format="pyarrow").to_pandas()
    if len(mm) == 0:  # empty lineitem table: typed single-NaN result
        return ray.data.from_arrow(pa.table({
            "n": pa.array([0], pa.int64()),
            "spearman_qty_price": pa.array([float("nan")], pa.float64()),
        }))
    ymin, ymax = float(mm.ymin.min()), float(mm.ymax.max())
    width = (ymax - ymin) / n_bins if ymax > ymin else 1.0

    def bin_of(y: np.ndarray) -> np.ndarray:
        b = np.floor((y - ymin) / width).astype(np.int64)
        return np.clip(b, 0, n_bins - 1)

    # -- pass 2 (fused): x value counts + y bin counts, one keyed reduce
    def count_partial(batch: pa.Table) -> pa.Table:
        x = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        y = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        xv, xc = np.unique(x.astype(np.int64), return_counts=True)
        bv, bc = np.unique(bin_of(y), return_counts=True)
        return pa.table({
            "kind": pa.array(["x"] * len(xv) + ["b"] * len(bv)),
            "key": pa.array(np.concatenate([xv, bv]), pa.int64()),
            "c": pa.array(np.concatenate([xc, bc]), pa.int64()),
        })

    counts = coarse_grouped_map(
        li.map_batches(count_partial, batch_format="pyarrow"),
        ["kind", "key"],
        lambda d: d.groupby(["kind", "key"], as_index=False).agg(
            c=("c", "sum")
        ),
        num_partitions=8,
    ).to_pandas()  # ≤ |x domain| + n_bins rows — never corpus-sized

    xs = counts[counts.kind == "x"].sort_values("key")
    x_off = np.concatenate([[0], xs.c.cumsum().to_numpy()[:-1]])
    # 2·avg_rank(v) = 2·offset + count + 1 — exact integer
    rx2_map = {
        int(k): 2 * int(o) + int(c) + 1
        for k, o, c in zip(xs.key, x_off, xs.c)
    }
    bs = counts[counts.kind == "b"].sort_values("key")
    b_off = dict(zip(
        bs.key.astype(int),
        np.concatenate([[0], bs.c.cumsum().to_numpy()[:-1]]).astype(int),
    ))
    state = ray.put((rx2_map, b_off))

    # -- pass 3: per-bin rank + exact integer moment partials
    def moments(df: pd.DataFrame) -> pd.DataFrame:
        rx2_map_, b_off_ = ray.get(state)
        rows = []
        for b, g in df.groupby("bin", sort=False):
            y = g.l_extendedprice.to_numpy(np.float64)
            order = np.argsort(y, kind="stable")
            ys = y[order]
            # local value-count prefix sums -> doubled average ranks
            uniq, start, cnt = np.unique(
                ys, return_index=True, return_counts=True
            )
            off0 = int(b_off_[int(b)])
            r2_per_uniq = 2 * (off0 + start) + cnt + 1
            r2_sorted = np.repeat(r2_per_uniq, cnt)
            ry2 = np.empty(len(y), dtype=np.int64)
            ry2[order] = r2_sorted
            # vectorized domain-table lookup (≤50 entries)
            lut = np.zeros(max(rx2_map_) + 1, dtype=np.int64)
            for k_, v_ in rx2_map_.items():
                lut[k_] = v_
            rx2 = lut[g.l_quantity.to_numpy(np.int64)]
            # exact python-int partials (Σ(2r)² wraps int64 at scale)
            lx = [int(v) for v in rx2]
            ly = [int(v) for v in ry2]
            sx, sy = sum(lx), sum(ly)
            sxx = sum(v * v for v in lx)
            syy = sum(v * v for v in ly)
            sxy = sum(a * c for a, c in zip(lx, ly))
            rec = {"n": len(lx)}
            for nm, s in (("sx", sx), ("sy", sy), ("sxx", sxx),
                          ("syy", syy), ("sxy", sxy)):
                hi, lo = divmod(int(s), 1 << 32)
                rec[nm + "_hi"], rec[nm + "_lo"] = hi, lo
            rows.append(rec)
        return pd.DataFrame(rows)

    def add_bin(batch: pa.Table) -> pa.Table:
        y = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        return batch.append_column("bin", pa.array(bin_of(y), pa.int64()))

    parts = coarse_grouped_map(
        li.map_batches(add_bin, batch_format="pyarrow"),
        "bin",
        moments,
        num_partitions=8,
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = int(df.n.sum())
        tot = {}
        for nm in ("sx", "sy", "sxx", "syy", "sxy"):
            tot[nm] = sum(
                (int(h) << 32) + int(lo)
                for h, lo in zip(df[nm + "_hi"], df[nm + "_lo"])
            )
        num = n * tot["sxy"] - tot["sx"] * tot["sy"]
        dx = n * tot["sxx"] - tot["sx"] * tot["sx"]
        dy = n * tot["syy"] - tot["sy"] * tot["sy"]
        import math
        rho = (
            float(num) / math.sqrt(float(dx) * float(dy))
            if dx > 0 and dy > 0 else float("nan")
        )
        return pd.DataFrame({
            "n": [np.int64(n)],
            "spearman_qty_price": [np.floor(rho * 1e6 + 0.5) / 1e6],
        })

    return parts.repartition(1).map_batches(
        finish, batch_format="pandas", batch_size=None
    )


# ---------------------------------------------------------------------------
# Lag-k autocorrelation over a gap-filled hourly series
# ---------------------------------------------------------------------------

def events_acf(
    sf_dir: str, lags: List[int] = (1, 2, 3, 6, 12, 24)
) -> "ray.data.Dataset":
    """Autocorrelation function of HOURLY event counts per event type at
    the given lags — the periodicity diagnostic (is there a daily
    cycle?) run before any seasonal model is trusted.  acf(k) = Pearson
    correlation of the pairs (x_t, x_{t+k}) over the GAP-FILLED hourly
    grid (missing hours count 0 — skipping them would silently shift
    every lag).

    Only the (type, hour)-count reduce touches the fact table: per-batch
    partials then one coarse keyed reduce, the events_gapfill shape.
    The reduced series is DIMENSION-bounded (types × hours), so each
    type's full series fits a worker: a coarse partition by event_type
    densifies its own grid from the broadcast global [h0, h1] bounds and
    evaluates all lags vectorized.  Counts are integers, so the moment
    sums accumulate as exact Python ints (hours-bounded, cheap) and the
    closed form matches the oracle's HUGEINT arithmetic bit-for-bit
    after one double division, rounded half-up to 1e-6.  Output:
    (event_type, lag, n_pairs, acf) — acf NULL when a window is
    constant.
    """
    ev = _read(sf_dir, "events", columns=["event_type", "ts"])

    US_PER_H = 3_600_000_000

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        h = (
            df.ts.astype("datetime64[us]").astype("int64") // US_PER_H
        ).to_numpy(np.int64)
        g = pd.DataFrame({"event_type": df.event_type, "h": h}).groupby(
            ["event_type", "h"], as_index=False
        ).size()
        g.columns = ["event_type", "h", "c"]
        g["c"] = g.c.astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = coarse_grouped_map(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "h"],
        lambda d: d.groupby(["event_type", "h"], as_index=False).agg(
            c=("c", "sum")
        ),
        num_partitions=8,
    ).materialize()  # dimension-bounded (types × hours); feeds bounds + ACF

    h0, h1 = int(counts.min("h")), int(counts.max("h"))
    lags_t = tuple(int(k) for k in lags)

    def acf_for_types(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type", sort=False):
            x = np.zeros(h1 - h0 + 1, dtype=np.int64)
            x[g.h.to_numpy(np.int64) - h0] = g.c.to_numpy(np.int64)
            xl = [int(v) for v in x]  # python ints: exact at any count
            for k in lags_t:
                if k >= len(xl):
                    continue
                a, b = xl[:-k], xl[k:]
                n = len(a)
                sx, sy = sum(a), sum(b)
                sxx = sum(v * v for v in a)
                syy = sum(v * v for v in b)
                sxy = sum(p * q for p, q in zip(a, b))
                dx, dy = n * sxx - sx * sx, n * syy - sy * sy
                if dx > 0 and dy > 0:
                    import math
                    r = float(n * sxy - sx * sy) / math.sqrt(
                        float(dx) * float(dy)
                    )
                    acf = np.floor(r * 1e6 + 0.5) / 1e6
                else:
                    acf = None
                rows.append((et, np.int64(k), np.int64(n), acf))
        return pd.DataFrame(
            rows, columns=["event_type", "lag", "n_pairs", "acf"]
        )

    return coarse_grouped_map(
        counts, "event_type", acf_for_types, num_partitions=4
    )


# ---------------------------------------------------------------------------
# Wide-to-long reshaping (UNPIVOT / melt) with grouped aggregation
# ---------------------------------------------------------------------------

def lineitem_unpivot(sf_dir: str) -> "ray.data.Dataset":
    """Melt lineitem's four numeric measures into long form and
    aggregate per (returnflag, measure) — the UNPIVOT the events_pivot
    operator mirrors, closing the reshaping pair.  The melt itself is
    FREE at scale: it happens inside the per-batch partial (each batch
    emits ≤ |flags|×4 pre-aggregated rows), so the 4× row expansion a
    naive melt-then-shuffle would pay never reaches the exchange.

    Measures are integerized to exact cents; per-batch sums accumulate
    as Python ints and travel as hi/lo int64 pairs (Σcents over a
    web-scale fact table wraps int64 — same HUGEINT discipline as
    lineitem_profile).  Output: (l_returnflag, measure, n, total) with
    total = cents/100 after one exact division, matching the DuckDB
    UNPIVOT oracle bit-for-bit.
    """
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    li = _read(sf_dir, "lineitem", columns=["l_returnflag"] + cols)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for flag, g in batch.groupby("l_returnflag", sort=False):
            for c in cols:
                cents = np.floor(
                    g[c].to_numpy(np.float64) * 100.0 + 0.5
                ).astype(np.int64)
                s = sum(int(x) for x in cents)  # exact python int
                hi, lo = divmod(s, 1 << 32)
                rows.append((flag, c, len(cents), hi, lo))
        return pd.DataFrame(
            rows,
            columns=["l_returnflag", "measure", "n", "s_hi", "s_lo"],
        )

    def reduce_group(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (flag, c), g in df.groupby(["l_returnflag", "measure"],
                                       sort=False):
            s = sum(
                (int(h) << 32) + int(lo)
                for h, lo in zip(g.s_hi, g.s_lo)
            )
            out.append((flag, c, np.int64(g.n.sum()), float(s) / 100.0))
        return pd.DataFrame(
            out, columns=["l_returnflag", "measure", "n", "total"]
        )

    return coarse_grouped_map(
        li.map_batches(partial, batch_format="pandas"),
        ["l_returnflag", "measure"],
        reduce_group,
        num_partitions=4,
    )


# ---------------------------------------------------------------------------
# Diversified top-k (global selection under a per-group quota)
# ---------------------------------------------------------------------------

def diversified_topk(
    sf_dir: str, k: int = 10, per_customer: int = 2
) -> "ray.data.Dataset":
    """The k highest-value orders subject to a DIVERSITY quota — at most
    ``per_customer`` orders from any one customer (the result-diversity
    constraint every leaderboard/retrieval surface applies so one whale
    doesn't fill the page).  Greedy quota semantics: scanning the global
    value order and skipping quota-exhausted customers selects exactly
    each customer's top-``per_customer`` rows, so the answer is
    (per-customer top-q) ∩ (global top-k of that pool) — and
    per-group-top-q IS mergeable, which makes the whole thing two
    combiner passes:

    1. per-block per-customer top-q partial (≤ q rows per customer per
       block cross the wire);
    2. one customer-keyed coarse reduce re-takes top-q per customer
       (full groups co-located);
    3. global top-k over the quota pool: per-block top-k, then a ≤
       blocks×k-row driver finish — the sanctioned top-k shape.

    Ties break by (o_totalprice DESC, o_orderkey ASC) everywhere, so
    the selection is bit-deterministic.  Output adds the global rank.
    """
    orders = _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    BY = ["o_totalprice", "o_orderkey"]
    ASC = [False, True]

    def per_cust_topq(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(BY, ascending=ASC)
            .groupby("o_custkey", sort=False)
            .head(per_customer)
        )

    pool = coarse_grouped_map(
        orders.map_batches(per_cust_topq, batch_format="pandas"),
        "o_custkey",
        per_cust_topq,
        num_partitions=8,
    )

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(BY, ascending=ASC).head(k)

    t = (
        pool.map_batches(block_topk, batch_format="pandas",
                         batch_size=None)
        .to_pandas()  # ≤ blocks × k rows — never order-scale
        .sort_values(BY, ascending=ASC)
        .head(k)
        .reset_index(drop=True)
    )
    t["rnk"] = np.arange(1, len(t) + 1, dtype=np.int64)
    return ray.data.from_pandas(
        t[["rnk", "o_orderkey", "o_custkey", "o_totalprice"]]
    )


# ---------------------------------------------------------------------------
# Exact distributed weighted median (two-pass bin selection)
# ---------------------------------------------------------------------------

def weighted_median(sf_dir: str, n_bins: int = 64) -> "ray.data.Dataset":
    """Per returnflag: the l_quantity-WEIGHTED median of
    l_extendedprice — min v with cumulative weight(≤v) ≥ ceil(W/2) —
    the robust "typical price actually shipped" statistic (each row
    votes its quantity, not once).

    Unlike the exact-quantile operators (which document a key's-values-
    fit-in-a-worker assumption), this is exact WITHOUT that assumption —
    the two-pass distributed-selection shape:

    1. per-(flag, value-BIN) weight sums — combiner partials, one coarse
       reduce, flags×bins driver rows; the per-flag bin cumsum locates
       the single bin containing the crossing and the weight W0 before
       it (equal values share a bin, so the crossing can't straddle);
    2. only that bin's rows are re-read and reduced per (flag, value) —
       bin-bounded, ~1/n_bins of the key's rows — and one co-located
       per-flag cumsum picks min v with W0 + cum ≥ T.

    Weights are integers (quantity ≤ 50 ⇒ Σ fits int64 to ~10¹⁷ rows;
    the oracle sums in HUGEINT), T = (W+1)//2 in exact ints, and the
    selected v is an INPUT value — no averaging — so parity is
    bit-exact with no rounding step.  Output:
    (l_returnflag, wmedian, total_weight).
    """
    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_extendedprice", "l_quantity"])

    # pass 0: per-flag value range for binning (blocks×flags rows)
    def minmax(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_returnflag", as_index=False).agg(
            lo=("l_extendedprice", "min"), hi=("l_extendedprice", "max")
        )
        return g

    mm = (
        li.map_batches(minmax, batch_format="pandas", batch_size=None)
        .to_pandas()
        .groupby("l_returnflag", as_index=False)
        .agg(lo=("lo", "min"), hi=("hi", "max"))
    )
    lo_map = dict(zip(mm.l_returnflag, mm.lo))
    wid_map = {
        f: max((hi - lo) / n_bins, 1e-12)
        for f, lo, hi in zip(mm.l_returnflag, mm.lo, mm.hi)
    }

    def bin_col(df: pd.DataFrame) -> np.ndarray:
        lo = df.l_returnflag.map(lo_map).to_numpy(np.float64)
        wd = df.l_returnflag.map(wid_map).to_numpy(np.float64)
        v = df.l_extendedprice.to_numpy(np.float64)
        return np.clip(
            ((v - lo) / wd).astype(np.int64), 0, n_bins - 1
        )

    # pass 1: (flag, bin) weight sums -> crossing bin per flag
    def bin_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "l_returnflag": df.l_returnflag,
            "bin": bin_col(df),
            "w": df.l_quantity.to_numpy(np.int64),
        })
        return d.groupby(["l_returnflag", "bin"], as_index=False).agg(
            w=("w", "sum")
        )

    bw = coarse_grouped_map(
        li.map_batches(bin_partial, batch_format="pandas"),
        ["l_returnflag", "bin"],
        lambda d: d.groupby(["l_returnflag", "bin"], as_index=False).agg(
            w=("w", "sum")
        ),
        num_partitions=4,
    ).to_pandas().sort_values(["l_returnflag", "bin"])  # flags×bins

    sel = {}  # flag -> (target bin, W0 weight before it, threshold T, W)
    for f, g in bw.groupby("l_returnflag"):
        W = int(g.w.sum())
        T = (W + 1) // 2
        cum = g.w.cumsum().to_numpy()
        i = int(np.searchsorted(cum, T))
        sel[f] = (int(g.bin.iloc[i]), int(cum[i - 1]) if i else 0, T, W)

    # pass 2: only the crossing bin's rows, per-(flag, value) weights,
    # one co-located per-flag cumsum
    def inbin_partial(df: pd.DataFrame) -> pd.DataFrame:
        b = bin_col(df)
        tgt = df.l_returnflag.map({f: s[0] for f, s in sel.items()})
        d = df[b == tgt.to_numpy(np.int64)]
        if d.empty:
            return pd.DataFrame({
                "l_returnflag": pd.Series([], dtype=object),
                "v": pd.Series([], dtype=np.float64),
                "w": pd.Series([], dtype=np.int64),
            })
        g = pd.DataFrame({
            "l_returnflag": d.l_returnflag,
            "v": d.l_extendedprice.to_numpy(np.float64),
            "w": d.l_quantity.to_numpy(np.int64),
        }).groupby(["l_returnflag", "v"], as_index=False).agg(
            w=("w", "sum")
        )
        return g

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for f, g in df.groupby("l_returnflag", sort=False):
            _, w0, t, wtot = sel[f]
            g = g.groupby("v", as_index=False).agg(w=("w", "sum")).sort_values("v")
            cum = w0 + g.w.cumsum().to_numpy()
            i = int(np.searchsorted(cum, t))
            rows.append((f, float(g.v.iloc[i]), np.int64(wtot)))
        return pd.DataFrame(
            rows, columns=["l_returnflag", "wmedian", "total_weight"]
        )

    return coarse_grouped_map(
        li.map_batches(inbin_partial, batch_format="pandas"),
        "l_returnflag",
        pick,
        num_partitions=4,
    )


# ---------------------------------------------------------------------------
# Sweep-line interval concurrency: order lines in flight per calendar day
# ---------------------------------------------------------------------------

def lines_in_flight(sf_dir: str) -> "ray.data.Dataset":
    """(day, delta, in_flight): how many order lines are OPEN — ordered but
    not yet shipped — at each calendar day, the classic sweep-line /
    interval-concurrency operator (cf. max-concurrent-sessions, inventory
    in transit).  An order line is open on day d iff
    o_orderdate <= d < l_shipdate.

    Distributed shape: interval endpoints become +/-1 deltas —
    +n(order lines) at the order date, -1 at each ship date — so the
    whole interval table collapses to one row per boundary DAY before any
    ordering happens.  The open side needs the order date, which lives on
    the orders fact: lineitem is pre-counted per order key inside
    map_batches (<= one row per (orderkey x block)) and repartition-joined
    to orders, the close side maps straight off lineitem.  Both delta
    streams reduce day-keyed; the running sum runs on the driver over the
    CALENDAR-bounded day table (~2.5k rows at any corpus size — same
    documented small side as running_distinct_users).  Negative dips are
    possible when a line ships before its order date (the testdata's
    'early' bucket, see latency_priority_counts) — the cumulative count
    is still exact.
    """
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("l_orderkey", as_index=False).agg(
            n=("l_orderkey", "size")
        )

    li_counts = li.map_batches(count_partial, batch_format="pandas")

    joined = repartition_join(
        li_counts,
        orders,
        left_on="l_orderkey",
        right_on="o_orderkey",
        left_types={"l_orderkey": pa.int64(), "n": pa.int64()},
        right_types={"o_orderkey": pa.int64(),
                     "o_orderdate": pa.timestamp("us")},
    )

    def open_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.o_orderdate.astype("datetime64[us]").astype("int64") \
            // 86_400_000_000
        return pd.DataFrame({"d": d, "delta": df.n.to_numpy(np.int64)}) \
            .groupby("d", as_index=False).agg(delta=("delta", "sum"))

    def close_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.l_shipdate.astype("datetime64[us]").astype("int64") \
            // 86_400_000_000
        out = pd.DataFrame({"d": d}).groupby("d", as_index=False).agg(
            delta=("d", "size")
        )
        out["delta"] = -out.delta.to_numpy(np.int64)
        return out

    deltas = joined.map_batches(
        open_partial, batch_format="pandas"
    ).union(li.map_batches(close_partial, batch_format="pandas"))

    per_day = coarse_grouped_map(
        deltas,
        "d",
        lambda df: df.groupby("d", as_index=False).agg(
            delta=("delta", "sum")
        ),
        num_partitions=8,
    ).to_pandas().sort_values("d")  # calendar-bounded

    per_day["in_flight"] = per_day.delta.cumsum()
    out = pd.DataFrame({
        "day": pd.to_datetime(
            per_day.d * 86_400_000_000, unit="us"
        ).dt.strftime("%Y-%m-%d"),
        "delta": per_day.delta.astype(np.int64),
        "in_flight": per_day.in_flight.astype(np.int64),
    })
    return ray.data.from_pandas(out.reset_index(drop=True))


# ---------------------------------------------------------------------------
# Grouped mode: each user's most frequent event type
# ---------------------------------------------------------------------------

def user_modal_event(sf_dir: str) -> "ray.data.Dataset":
    """(user_id, modal_type, cnt): the most frequent event type per user,
    ties broken by event_type ASC — grouped MODE, the aggregate SQL spells
    row_number()-over-count and pandas spells .mode().  Key cardinality is
    the USER population (unbounded at scale), so the argmax itself must be
    distributed: per-batch (user, type) partial counts collapse map-side,
    one user-keyed all-to-all co-locates each user's <= |type| rows, and
    the per-partition argmax is a vectorized sort + drop_duplicates over
    thousands of users at once — never per-group Python, no driver state.
    """
    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["user_id", "event_type"], as_index=False).agg(
            cnt=("event_type", "size")
        )

    def modal_reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["user_id", "event_type"], as_index=False).agg(
            cnt=("cnt", "sum")
        )
        g = g.sort_values(
            ["user_id", "cnt", "event_type"],
            ascending=[True, False, True],
            kind="mergesort",
        ).drop_duplicates("user_id", keep="first")
        return pd.DataFrame({
            "user_id": g.user_id.to_numpy(np.int64),
            "modal_type": g.event_type,
            "cnt": g.cnt.astype(np.int64),
        })

    return coarse_grouped_map(
        ev.map_batches(pair_partial, batch_format="pandas"),
        "user_id",
        modal_reduce,
    )


# ---------------------------------------------------------------------------
# Bucketed range join: order-line intervals covering each order date
# ---------------------------------------------------------------------------

def open_lines_at_order(sf_dir: str) -> "ray.data.Dataset":
    """(o_orderkey, open_lines): for every order, how many order LINES —
    from any order, including its own — were in flight (ordered but not
    yet shipped) on the day that order was placed.  A point-in-interval
    RANGE join: points are order dates, intervals are per-line
    [o_orderdate, l_shipdate) half-open spans.

    Ray Data has no non-equi join; stages/rangejoin.point_in_interval_count
    implements the bucketed range join — intervals replicate only to the
    grid buckets they overlap (partitioning assumption: bucket width ~
    typical line open-span, here span/64 over a ~7-year domain vs ~3-month
    typical spans), points route to exactly one bucket, and each bucket
    counts covers with two sorted-endpoint searchsorteds — matched pairs
    are NEVER materialized, so output is one row per order no matter how
    many lines are open.  The interval table itself needs the order date
    on every line, which is one key-equi repartition join lineitem<->orders.
    Timestamps stay raw int64 microseconds: no day-granularity assumption.

    The point-domain bounds come from the orders parquet COLUMN
    STATISTICS when present (a driver-side metadata read — no data
    pass); stats min/max always cover the true values, which is exactly
    the safety contract point_in_interval_count's ``bounds`` needs.
    Falls back to the operator's own aggregate pass when stats are
    absent.
    """
    import pyarrow.parquet as pq

    from ..stages.rangejoin import point_in_interval_count

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    bounds = None
    try:
        pf = pq.ParquetFile(os.path.join(sf_dir, "orders.parquet"))
        idx = pf.schema_arrow.get_field_index("o_orderdate")
        los, his = [], []
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                los = []
                break
            los.append(st.min)
            his.append(st.max)
        if los:
            bounds = (
                int(pd.Timestamp(min(los)).value // 1000),
                int(pd.Timestamp(max(his)).value // 1000),
            )
    except Exception:
        bounds = None

    joined = repartition_join(
        li,
        orders,
        left_on="l_orderkey",
        right_on="o_orderkey",
        left_types={"l_orderkey": pa.int64(),
                    "l_shipdate": pa.timestamp("us")},
        right_types={"o_orderkey": pa.int64(),
                     "o_orderdate": pa.timestamp("us")},
    )

    def iv_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "s": df.o_orderdate.astype("datetime64[us]").astype(np.int64),
            "e": df.l_shipdate.astype("datetime64[us]").astype(np.int64),
        })

    def pt_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": df.o_orderkey.to_numpy(np.int64),
            "p": df.o_orderdate.astype("datetime64[us]").astype(np.int64),
        })

    return point_in_interval_count(
        orders.map_batches(pt_rows, batch_format="pandas"),
        joined.map_batches(iv_rows, batch_format="pandas"),
        point_col="p",
        id_col="o_orderkey",
        start_col="s",
        end_col="e",
        out_col="open_lines",
        bounds=bounds,
    )


# ---------------------------------------------------------------------------
# Gaps-and-islands: longest consecutive-day activity streak per user
# ---------------------------------------------------------------------------

def user_streaks(sf_dir: str) -> "ray.data.Dataset":
    """(user_id, longest_streak, active_days): the longest run of
    CONSECUTIVE calendar days on which each user produced at least one
    event, plus their total distinct active days — the classic
    gaps-and-islands operator (SQL spells it day - row_number()).

    Distributed shape: per-batch distinct (user, day) pairs collapse
    map-side, one user-keyed all-to-all co-locates each user's <= |days|
    rows, and islands are found VECTORIZED across all users in a
    partition at once: sort by (user, day), an island starts where the
    user changes or the day gap exceeds 1, island ids are a cumsum of
    starts, and streak lengths fall out of one groupby(island).size() —
    never per-user Python, no driver state.
    """
    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def day_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.ts.astype("datetime64[us]").astype(np.int64) \
            // 86_400_000_000
        return pd.DataFrame(
            {"user_id": df.user_id.to_numpy(np.int64), "day": d}
        ).drop_duplicates()

    def island_reduce(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["user_id", "day"]).sort_values(
            ["user_id", "day"], kind="mergesort"
        )
        u = d.user_id.to_numpy(np.int64)
        day = d.day.to_numpy(np.int64)
        new_island = np.ones(len(d), dtype=bool)
        if len(d) > 1:
            new_island[1:] = (u[1:] != u[:-1]) | (day[1:] - day[:-1] != 1)
        isl = np.cumsum(new_island)
        lens = pd.DataFrame({"user_id": u, "isl": isl}).groupby(
            ["user_id", "isl"], as_index=False
        ).agg(n=("isl", "size"))
        out = lens.groupby("user_id", as_index=False).agg(
            longest_streak=("n", "max"), active_days=("n", "sum")
        )
        out["longest_streak"] = out.longest_streak.astype(np.int64)
        out["active_days"] = out.active_days.astype(np.int64)
        return out

    return coarse_grouped_map(
        ev.map_batches(day_partial, batch_format="pandas"),
        "user_id",
        island_reduce,
    )


# ---------------------------------------------------------------------------
# Peak concurrent sessions per hour (sessionize -> distributed prefix sum)
# ---------------------------------------------------------------------------

def concurrent_sessions_peak(
    sf_dir: str, gap_minutes: int = 30, n_ranges: int = 32
) -> "ray.data.Dataset":
    """(hour, peak_concurrent): the maximum number of SIMULTANEOUSLY open
    user sessions observed at any session boundary within each epoch hour
    — capacity planning's classic "max concurrent" metric, composed from
    two scale patterns already in the engine: gap-based sessionization
    (events_sessions) and the range-partitioned distributed prefix sum
    (ks_statistic / pack_sequences).

    Session boundary timestamps are µs-granular, so unlike
    lines_in_flight the running sum CANNOT finish on the driver (the
    boundary table is 2x|sessions|, data-sized).  Instead: boundaries
    become ±1 deltas, one aggregate pass finds the time domain, deltas
    range-partition over n_ranges uniform time slices, per-range delta
    TOTALS (n_ranges rows, the only driver state) prefix-sum into
    carry-in offsets, and each range independently sorts its own slice,
    cumsums + offset (= the exact global running concurrency at each of
    its boundaries), and emits per-hour partial maxima; a final keyed max
    merges hours that straddle range borders.  Peak is measured AT
    change points; hours with no session boundary emit no row (both
    engines agree by construction).  Sessions count as open on
    [start, end] inclusive (the -1 lands at end + 1µs).
    """
    from .relational import events_sessions
    from ..stages.rangejoin import _minmax_int64

    sess = events_sessions(sf_dir, gap_minutes).select_columns(
        ["session_start", "session_end"]
    )

    def deltas(df: pd.DataFrame) -> pd.DataFrame:
        s = df.session_start.astype("datetime64[us]").astype(np.int64)
        e = df.session_end.astype("datetime64[us]").astype(np.int64) + 1
        return pd.DataFrame({
            "t": np.concatenate([s.to_numpy(), e.to_numpy()]),
            "d": np.concatenate([
                np.ones(len(s), np.int64), -np.ones(len(e), np.int64)
            ]),
        })

    # pinned: three consumers (domain bounds, range totals, local pass) —
    # lazy lineage would re-run sessionization per consumer
    b = sess.map_batches(deltas, batch_format="pandas").materialize()

    lo, hi = _minmax_int64(b, "t")
    if lo is None:  # no events at all
        return ray.data.from_arrow(
            pa.schema(
                [("hour", pa.int64()), ("peak_concurrent", pa.int64())]
            ).empty_table()
        )
    width = max(1, -(-(hi - lo + 1) // n_ranges))

    def add_rng(batch: pa.Table) -> pa.Table:
        t = batch.column("t").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "rng", pa.array((t - lo) // width, pa.int64())
        )

    ranged = b.map_batches(add_rng, batch_format="pyarrow").materialize()

    totals = coarse_grouped_map(
        ranged.select_columns(["rng", "d"]),
        "rng",
        lambda df: df.groupby("rng", as_index=False).agg(dsum=("d", "sum")),
        num_partitions=4,
    ).to_pandas().sort_values("rng")  # n_ranges rows — bounded
    carry = dict(zip(
        totals.rng,
        np.concatenate(([0], totals.dsum.cumsum().to_numpy()[:-1])),
    ))
    carry_ref = ray.put(carry)

    US_PER_HOUR = 3_600_000_000

    def local_peak(df: pd.DataFrame) -> pd.DataFrame:
        carry_ = ray.get(carry_ref)
        outs = []
        for rng, g in df.groupby("rng", sort=False):
            g = g.groupby("t", as_index=False).agg(d=("d", "sum"))
            g = g.sort_values("t")
            conc = g.d.cumsum().to_numpy(np.int64) + int(carry_.get(rng, 0))
            hour = g.t.to_numpy(np.int64) // US_PER_HOUR
            outs.append(
                pd.DataFrame({"hour": hour, "peak": conc})
                .groupby("hour", as_index=False).agg(peak=("peak", "max"))
            )
        if not outs:
            return pd.DataFrame({
                "hour": pd.Series([], dtype=np.int64),
                "peak": pd.Series([], dtype=np.int64),
            })
        return pd.concat(outs, ignore_index=True)

    partials = coarse_grouped_map(ranged, "rng", local_peak)

    def hour_max(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("hour", as_index=False).agg(
            peak_concurrent=("peak", "max")
        )
        g["peak_concurrent"] = g.peak_concurrent.astype(np.int64)
        return g

    return coarse_grouped_map(partials, "hour", hour_max, num_partitions=4)


# ---------------------------------------------------------------------------
# Decorrelated per-key subquery: orders above their customer's average
# ---------------------------------------------------------------------------

def orders_above_cust_avg(sf_dir: str) -> "ray.data.Dataset":
    """(o_orderkey, o_custkey, o_totalprice, cust_avg): orders strictly
    above their own customer's average order value — the classic
    CORRELATED subquery (WHERE price > (SELECT avg .. same customer)),
    decorrelated the way a distributed engine must: aggregate once per
    key, join back, filter map-side.

    The per-customer average is exact: per-batch (custkey, Σcents, n)
    partials collapse map-side, one customer-keyed reduce finishes the
    (sum, count) pair, and the join back to orders is the same
    customer-keyed repartition join — two all-to-alls total, both moving
    rows pre-compacted per customer.  The comparison runs on integer
    cents cross-multiplied (cents·n > Σcents) so no division enters the
    predicate — bit-identical to the SQL oracle with zero float slack;
    the reported cust_avg divides only for display, rounded 1e-6.
    """
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def cents(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        c = np.floor(
            df.o_totalprice.to_numpy(np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table({
            "o_orderkey": pa.array(df.o_orderkey.to_numpy(np.int64)),
            "o_custkey": pa.array(df.o_custkey.to_numpy(np.int64)),
            "cents": pa.array(c, pa.int64()),
        })

    oc = orders.map_batches(cents, batch_format="pyarrow").materialize()
    # pinned: feeds the per-customer aggregate AND the join back (lazy
    # lineage would re-run the read + quantization per consumer)

    def agg_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("o_custkey", as_index=False).agg(
            s=("cents", "sum"), n=("cents", "size")
        )
        g["s"] = g.s.astype(np.int64)
        g["n"] = g.n.astype(np.int64)
        return pa.Table.from_pandas(g[["o_custkey", "s", "n"]],
                                    preserve_index=False)

    per_cust = coarse_grouped_map(
        oc.map_batches(agg_partial, batch_format="pyarrow"),
        "o_custkey",
        lambda d: d.groupby("o_custkey", as_index=False).agg(
            s=("s", "sum"), n=("n", "sum")
        ),
    )

    joined = repartition_join(
        oc,
        per_cust,
        left_on="o_custkey",
        right_on="o_custkey",
        left_types={"o_custkey": pa.int64(), "o_orderkey": pa.int64(),
                    "cents": pa.int64()},
        right_types={"o_custkey": pa.int64(), "s": pa.int64(),
                     "n": pa.int64()},
    )

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        c = df.cents.to_numpy(np.int64)
        s = df.s.to_numpy(np.int64)
        n = df.n.to_numpy(np.int64)
        keep = c * n > s  # integer cross-multiply, no division
        d = df[keep]
        return pd.DataFrame({
            "o_orderkey": d.o_orderkey.to_numpy(np.int64),
            "o_custkey": d.o_custkey.to_numpy(np.int64),
            "o_totalprice": d.cents.to_numpy(np.int64) / 100.0,
            "cust_avg": np.floor(
                d.s.to_numpy(np.int64) / d.n.to_numpy(np.int64)
                / 100.0 * 1e6 + 0.5
            ) / 1e6,
        })

    return joined.map_batches(pick, batch_format="pandas")


# ---------------------------------------------------------------------------
# Period-over-period growth: month-over-month revenue with LAG
# ---------------------------------------------------------------------------

def revenue_mom_growth(sf_dir: str) -> "ray.data.Dataset":
    """(month, revenue, prev_revenue, growth_pct): monthly lineitem
    revenue with its previous-month value and percent change — the LAG
    window over a period aggregate.

    Per-batch cent partials collapse to ≤ |months| rows before one
    month-keyed reduce; the LAG itself runs on the driver over the
    CALENDAR-bounded month table (≤ a few hundred rows at any corpus
    size — the same documented small side as running_distinct_users).
    ``prev_revenue`` is the previous OBSERVED month (SQL LAG over the
    aggregate, whether or not the months are consecutive); the first
    month's prev/growth are null.  growth_pct is rounded 1e-6 on both
    engines.
    """
    li = _read(sf_dir, "lineitem",
               columns=["l_shipdate", "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        rev = df.l_extendedprice.to_numpy() * (1.0 - df.l_discount.to_numpy())
        c = np.floor(rev * 100.0 + 0.5).astype(np.int64)
        m = (df.l_shipdate.dt.year * 100 + df.l_shipdate.dt.month
             ).astype(np.int64)
        g = pd.DataFrame({"month": m, "c": c}).groupby(
            "month", as_index=False
        ).agg(c=("c", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    monthly = coarse_grouped_map(
        li.map_batches(partial, batch_format="pyarrow"),
        "month",
        lambda d: d.groupby("month", as_index=False).agg(c=("c", "sum")),
        num_partitions=4,
    ).to_pandas().sort_values("month")  # calendar-bounded

    rev = monthly.c.to_numpy(np.int64)
    prev = np.concatenate(([0], rev[:-1]))
    has_prev = np.ones(len(rev), dtype=bool)
    has_prev[0] = False
    growth = np.where(
        has_prev & (prev != 0),
        np.floor((rev - prev) / np.where(prev == 0, 1, prev)
                 * 100.0 * 1e6 + 0.5) / 1e6,
        np.nan,
    )
    out = pd.DataFrame({
        "month": monthly.month.to_numpy(np.int64),
        "revenue": rev / 100.0,
        "prev_revenue": np.where(has_prev, prev / 100.0, np.nan),
        "growth_pct": growth,
    })
    return ray.data.from_pandas(out.reset_index(drop=True))


# ---------------------------------------------------------------------------
# Market-basket association rules (support / confidence / lift)
# ---------------------------------------------------------------------------

def association_rules(
    sf_dir: str, min_pair_orders: int = 2
) -> "ray.data.Dataset":
    """(ante, cons, n_both, n_ante, n_cons, support, confidence, lift):
    directed association rules over parts co-purchased in the same order
    — the classic market-basket mining output (Agrawal & Srikant 1994),
    thresholded on pair support ``min_pair_orders``.

    support(a→b)    = n_ab / N          (N = distinct orders)
    confidence(a→b) = n_ab / n_a
    lift(a→b)       = n_ab · N / (n_a · n_b)

    Distributed shape: pair counts reuse part_copurchase_pairs' bounded
    per-order self-join (combiner inside each order-keyed partition);
    item counts are a combiner-first keyed reduce over distinct
    (order, part) baskets; N is one distinct-count scalar.  The two
    count attachments are part-keyed repartition joins — the rule table
    is the fact side, the item-count table the (part-bounded) build
    side.  All ratios are double divisions of exact int64 counts,
    rounded half-up to 1e-6 identically in the oracle.
    """
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def distinct_orders_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"o": batch.column("l_orderkey")})
        return t.group_by("o").aggregate([])

    n_orders = coarse_grouped_map(
        li.map_batches(distinct_orders_partial, batch_format="pyarrow"),
        "o",
        lambda d: d.drop_duplicates("o"),
        num_partitions=8,
    ).count()
    N = float(n_orders)

    def basket_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    item_counts = coarse_grouped_map(
        li.map_batches(basket_partial, batch_format="pyarrow"),
        "l_partkey",
        lambda d: d.drop_duplicates().groupby(
            "l_partkey", as_index=False
        ).agg(c=("l_orderkey", "size")),
    )

    thr = int(min_pair_orders)

    def directed(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df.n_orders >= thr]
        return pd.DataFrame({
            "ante": np.concatenate([df.part_a.to_numpy(np.int64),
                                    df.part_b.to_numpy(np.int64)]),
            "cons": np.concatenate([df.part_b.to_numpy(np.int64),
                                    df.part_a.to_numpy(np.int64)]),
            "n_both": np.concatenate([df.n_orders.to_numpy(np.int64)] * 2),
        })

    rules = part_copurchase_pairs(sf_dir).map_batches(
        directed, batch_format="pandas"
    )

    with_ante = repartition_join(
        rules,
        item_counts.map_batches(
            lambda b: pa.table({"pa_": b.column("l_partkey"),
                                "n_ante": b.column("c")}),
            batch_format="pyarrow",
        ),
        "ante",
        "pa_",
        {"ante": pa.int64(), "cons": pa.int64(), "n_both": pa.int64()},
        {"pa_": pa.int64(), "n_ante": pa.int64()},
    )

    with_both = repartition_join(
        with_ante,
        item_counts.map_batches(
            lambda b: pa.table({"pc_": b.column("l_partkey"),
                                "n_cons": b.column("c")}),
            batch_format="pyarrow",
        ),
        "cons",
        "pc_",
        {"cons": pa.int64(), "ante": pa.int64(), "n_both": pa.int64(),
         "n_ante": pa.int64()},
        {"pc_": pa.int64(), "n_cons": pa.int64()},
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        nab = df.n_both.to_numpy(np.float64)
        na = df.n_ante.to_numpy(np.float64)
        nc = df.n_cons.to_numpy(np.float64)
        r6 = lambda x: np.floor(x * 1e6 + 0.5) / 1e6
        return pd.DataFrame({
            "ante": df.ante.to_numpy(np.int64),
            "cons": df.cons.to_numpy(np.int64),
            "n_both": df.n_both.to_numpy(np.int64),
            "n_ante": df.n_ante.to_numpy(np.int64),
            "n_cons": df.n_cons.to_numpy(np.int64),
            "support": r6(nab / N),
            "confidence": r6(nab / na),
            "lift": r6(nab * N / (na * nc)),
        })

    return with_both.map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# Rolling 7-day distinct active users (sliding COUNT DISTINCT)
# ---------------------------------------------------------------------------

def rolling_active_users(
    sf_dir: str, window_days: int = 7
) -> "ray.data.Dataset":
    """(day, active_users): distinct users active in the trailing
    ``window_days`` window ending at each observed day — the sliding
    COUNT DISTINCT, which no subtract-the-leaving-bucket trick can
    compute (distinct is not subtractable).

    The scalable identity: user u counts toward day d iff u was active
    on some day in [d-window+1, d], i.e. each distinct (user, day)
    activity pair COVERS the days [day, day+window-1].  So: distinct
    (user, day) pairs collapse map-side, each expands to its ≤ window
    covered days (np.repeat — a bounded ×window blowup of the already
    user×day-bounded pair table), one coverday-keyed all-to-all, and
    each partition deduplicates (user, coverday) and counts distinct
    users per day vectorized.  Output days clip to the OBSERVED day set
    (calendar-bounded driver list, same documented small side as
    running_distinct_users).
    """
    ev = _read(sf_dir, "events", columns=["user_id", "ts"])
    W = int(window_days)

    def day_pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df.ts.astype("datetime64[us]").astype(np.int64) \
            // 86_400_000_000
        return pd.DataFrame(
            {"user_id": df.user_id.to_numpy(np.int64), "day": d}
        ).drop_duplicates()

    pairs = ev.map_batches(
        day_pairs, batch_format="pandas"
    ).materialize()  # feeds the observed-day set AND the expansion

    observed = set(
        coarse_grouped_map(
            pairs.select_columns(["day"]),
            "day",
            lambda d: d.drop_duplicates(),
            num_partitions=4,
        ).to_pandas().day  # calendar-bounded
    )
    obs_ref = ray.put(observed)

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        obs = ray.get(obs_ref)
        u = np.repeat(df.user_id.to_numpy(np.int64), W)
        d = np.repeat(df.day.to_numpy(np.int64), W) + np.tile(
            np.arange(W, dtype=np.int64), len(df)
        )
        out = pd.DataFrame({"user_id": u, "coverday": d})
        return out[out.coverday.isin(obs)].drop_duplicates()

    def count_day(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates().groupby("coverday", as_index=False).agg(
            active_users=("user_id", "nunique")
        )
        return pd.DataFrame({
            "day": g.coverday.to_numpy(np.int64),
            "active_users": g.active_users.to_numpy(np.int64),
        })

    return coarse_grouped_map(
        pairs.map_batches(expand, batch_format="pandas"),
        "coverday",
        count_day,
        num_partitions=8,
    )


# ---------------------------------------------------------------------------
# Equal-width histogram per event type
# ---------------------------------------------------------------------------

def events_histogram(sf_dir: str, n_bins: int = 16) -> "ray.data.Dataset":
    """(event_type, bin, bin_lo, bin_hi, n): equal-width histogram of
    ``value`` per event type over the GLOBAL value range — the profiling
    primitive behind every distribution dashboard.

    Bounds come from the parquet column statistics when present (driver
    metadata read, no data pass; stats always cover the true range) with
    a distributed min/max fallback — the ks_statistic pattern.  Bin
    assignment is one vectorized floor per batch with the top edge
    clamped into the last bin (v == max), partial (type, bin) counts
    collapse map-side, and the keyed reduce moves ≤ |types| × n_bins
    rows.  Bin edges are pure double arithmetic (lo + i·width) computed
    identically in the oracle, so the output is hash-exact.
    """
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(os.path.join(sf_dir, "events.parquet"))
    idx = pf.schema_arrow.get_field_index("value")
    lo, hi = np.inf, -np.inf
    for rg in range(pf.metadata.num_row_groups):
        st = pf.metadata.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            lo, hi = np.inf, -np.inf
            break
        lo, hi = min(lo, st.min), max(hi, st.max)

    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    if not (np.isfinite(lo) and np.isfinite(hi)):
        lo = ev.min("value")
        hi = ev.max("value")
        if lo is None or hi is None:
            return ray.data.from_arrow(pa.schema([
                ("event_type", pa.string()), ("bin", pa.int64()),
                ("bin_lo", pa.float64()), ("bin_hi", pa.float64()),
                ("n", pa.int64()),
            ]).empty_table())
    lo, hi = float(lo), float(hi)
    width = (hi - lo) / n_bins or 1.0

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df.value.to_numpy(np.float64)
        # NaN values have no bin (the oracle's comparisons drop NULLs);
        # floor(NaN) would otherwise cast to an arbitrary int64.  Clip
        # TWO-sided: stats-derived bounds can be narrower than a value
        # only through float rounding, but a below-lo value must land in
        # bin 0, not bin -1.
        keep = ~np.isnan(v)
        v = v[keep]
        b = np.clip(
            np.floor((v - lo) / width).astype(np.int64), 0, n_bins - 1
        )
        g = pd.DataFrame(
            {"event_type": df.event_type.to_numpy()[keep], "bin": b}
        ) \
            .groupby(["event_type", "bin"], as_index=False) \
            .agg(n=("bin", "size"))
        g["n"] = g.n.astype(np.int64)
        return g

    def reduce_bins(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["event_type", "bin"], as_index=False).agg(
            n=("n", "sum")
        )
        b = g.bin.to_numpy(np.float64)
        g["bin_lo"] = lo + b * width
        g["bin_hi"] = lo + (b + 1.0) * width
        g["n"] = g.n.astype(np.int64)
        return g[["event_type", "bin", "bin_lo", "bin_hi", "n"]]

    return coarse_grouped_map(
        ev.map_batches(partial, batch_format="pandas"),
        ["event_type", "bin"],
        reduce_bins,
        num_partitions=4,
    )
