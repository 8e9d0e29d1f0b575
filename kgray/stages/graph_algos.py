"""Iterative graph algorithms over edge tables — PageRank power
iteration as Dataset-to-Dataset transforms.

The engine's KG output is a node/edge table pair (stages/graph.py,
reference convert_to_cx2.py:124-166 emits the same shape); downstream
consumers rank entities on it.  PageRank is the representative iterative
algorithm: every iteration is a join + keyed aggregate, the one dataflow
shape Ray Data has no built-in loop for — so it is expressed here as a
driver-side Python loop over fully distributed per-iteration steps.

Scale shape per iteration (T iterations, E edges, V nodes):
- one ``repartition_join`` of the edge table against the rank table on
  src (both sides shuffled once on hash(key) — no broadcast of the
  V-sized rank vector, which at web scale does not fit a worker);
- one coarse keyed reduce summing contributions per dst;
- one left join back onto the node set (restores zero-indegree nodes);
- two scalar aggregates (dangling mass, node count) — driver receives
  exactly two floats, never a table.
Each iteration's rank table is materialized (V rows — the one
deliberately pinned intermediate; Ray re-executes lazy lineage per
consumer, and iteration k+1 consumes iteration k twice).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..utils import coarse_grouped_map, repartition_join


def _distinct_edges(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """(src, dst) with exact duplicates removed (combiner-first)."""

    def partial(batch: pa.Table) -> pa.Table:
        return batch.select(["src", "dst"]).group_by(
            ["src", "dst"]
        ).aggregate([])

    return coarse_grouped_map(
        edges.map_batches(partial, batch_format="pyarrow"),
        ["src", "dst"],
        lambda df: df.drop_duplicates(["src", "dst"]),
        num_partitions=8,
    )


def pagerank(
    edges: "ray.data.Dataset",
    damping: float = 0.85,
    iters: int = 4,
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """PageRank over a directed edge Dataset (src, dst) → (node, rank).

    Standard formulation: r₀ = 1/V;
    r_{t+1}(v) = (1-d)/V + d·(Σ_{u→v} r_t(u)/outdeg(u) + m_t/V)
    where m_t is the dangling (outdeg-0) mass.  Self-loops count as
    ordinary edges; duplicate edges collapse first.  Ranks are rounded
    half-up to 6 decimals ONLY on the final iteration, matching the SQL
    oracle's unrolled iterations expression-for-expression.

    ``num_partitions`` sizes every per-iteration shuffle — one partition
    per cluster core at small scale, ≈ edge_bytes/256 MB at web scale.
    """
    e = _distinct_edges(edges).materialize()

    deg = coarse_grouped_map(
        e.map_batches(
            lambda b: b.group_by("src").aggregate([([], "count_all")])
            .rename_columns(["src", "outdeg"]),
            batch_format="pyarrow",
        ),
        "src",
        lambda df: df.groupby("src", as_index=False).agg(
            outdeg=("outdeg", "sum")
        ),
        num_partitions=num_partitions,
    )

    def node_halves(batch: pa.Table) -> pa.Table:
        both = pa.chunked_array(
            batch.column("src").chunks + batch.column("dst").chunks
        )
        return pa.table({"node": both})

    nodes = coarse_grouped_map(
        e.map_batches(node_halves, batch_format="pyarrow"),
        "node",
        lambda df: df.drop_duplicates("node"),
        num_partitions=num_partitions,
    ).materialize()
    n = float(nodes.count())

    # state: (node, r, outdeg); outdeg NaN ⟺ dangling
    state = repartition_join(
        nodes,
        deg,
        "node",
        "src",
        {"node": pa.string()},
        {"src": pa.string(), "outdeg": pa.int64()},
        num_partitions=num_partitions,
        how="left",
    ).map_batches(
        lambda df: df.assign(r=1.0 / n), batch_format="pandas"
    ).materialize()

    base = (1 - damping) / n
    for t in range(iters):
        dangling = state.map_batches(
            lambda df: pd.DataFrame(
                {"m": [df.r[df.outdeg.isna()].sum()]}
            ),
            batch_format="pandas",
            batch_size=None,
        ).sum("m")
        m = float(dangling or 0.0)

        contrib = repartition_join(
            e,
            state,
            "src",
            "node",
            {"src": pa.string(), "dst": pa.string()},
            {"node": pa.string(), "r": pa.float64(),
             "outdeg": pa.float64()},
            num_partitions=num_partitions,
        )

        def partial_sum(df: pd.DataFrame) -> pd.DataFrame:
            df = df.assign(w=df.r / df.outdeg)
            return df.groupby("dst", as_index=False).agg(c=("w", "sum"))

        summed = coarse_grouped_map(
            contrib.map_batches(
                partial_sum, batch_format="pandas", batch_size=None
            ),
            "dst",
            lambda df: df.groupby("dst", as_index=False).agg(
                c=("c", "sum")
            ),
            num_partitions=num_partitions,
        )

        joined = repartition_join(
            state.select_columns(["node", "outdeg"]),
            summed,
            "node",
            "dst",
            {"node": pa.string(), "outdeg": pa.float64()},
            {"dst": pa.string(), "c": pa.float64()},
            num_partitions=num_partitions,
            how="left",
        )

        def update(df: pd.DataFrame, _m=m) -> pd.DataFrame:
            c = df.c.fillna(0.0)
            return df.assign(r=base + damping * (c + _m / n))[
                ["node", "r", "outdeg"]
            ]

        state = joined.map_batches(
            update, batch_format="pandas"
        ).materialize()

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": df.node,
                "pr": np.floor(df.r.to_numpy() * 1e6 + 0.5) / 1e6,
            }
        )

    return state.map_batches(finalize, batch_format="pandas")


def connected_components(
    pairs: "ray.data.Dataset",
    max_iters: int = 50,
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """Distributed connected components over an undirected pair-edge
    Dataset (doc_a, doc_b) → (doc_id, rep_id), rep = component minimum.

    Iterative min-label propagation, fully distributed — the scale path
    next to ``stages/dedup.pair_components`` (driver union-find over
    pair edges, fine while the PAIR GRAPH is collection-bounded; this
    variant never collects it).  Each round: ship every node's current
    label across its edges in both directions (one repartition join per
    direction), take the per-node minimum of self+received labels (one
    coarse keyed reduce), and stop when a round changes nothing (scalar
    aggregate).  Rounds needed = component diameter — small for
    near-dup/similarity graphs; a long-path graph would want the
    hash-to-min doubling variant (same building blocks, halves the
    rounds), noted here as the extension point.  ``num_partitions``
    sizes the per-round shuffles (scale like any keyed reduce).
    """

    def to_edges(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a")
        b = batch.column("doc_b")
        return pa.table(
            {
                "src": pa.chunked_array(a.chunks + b.chunks),
                "dst": pa.chunked_array(b.chunks + a.chunks),
            }
        )

    edges = pairs.map_batches(to_edges, batch_format="pyarrow").materialize()

    labels = coarse_grouped_map(
        edges.map_batches(
            lambda b: pa.table({"node": b.column("src")}),
            batch_format="pyarrow",
        ),
        "node",
        lambda df: df.drop_duplicates("node"),
        num_partitions=num_partitions,
    ).map_batches(
        lambda b: b.append_column("label", b.column("node")),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(max_iters):
        received = repartition_join(
            edges,
            labels,
            "src",
            "node",
            {"src": pa.int64(), "dst": pa.int64()},
            {"node": pa.int64(), "label": pa.int64()},
            num_partitions=num_partitions,
        )

        def min_partial(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("dst", as_index=False).agg(
                new_label=("label", "min")
            )
            return g.rename(columns={"dst": "node"})

        candidate = coarse_grouped_map(
            received.map_batches(
                min_partial, batch_format="pandas", batch_size=None
            ),
            "node",
            lambda df: df.groupby("node", as_index=False).agg(
                new_label=("new_label", "min")
            ),
            num_partitions=num_partitions,
        )

        merged = repartition_join(
            labels,
            candidate,
            "node",
            "node",
            {"node": pa.int64(), "label": pa.int64()},
            {"node": pa.int64(), "new_label": pa.int64()},
            num_partitions=num_partitions,
            how="left",
        )

        def take_min(df: pd.DataFrame) -> pd.DataFrame:
            nl = df.new_label.fillna(df.label)
            out = pd.DataFrame(
                {
                    "node": df.node.astype("int64"),
                    "label": np.minimum(
                        df.label.astype("int64"), nl.astype("int64")
                    ),
                    "changed": (
                        nl.astype("int64") < df.label.astype("int64")
                    ).astype("int64"),
                }
            )
            return out

        new_labels = merged.map_batches(
            take_min, batch_format="pandas"
        ).materialize()
        n_changed = new_labels.sum("changed") or 0
        labels = new_labels.drop_columns(["changed"]).materialize()
        if n_changed == 0:
            break

    return labels.map_batches(
        lambda b: pa.table(
            {"doc_id": b.column("node"), "rep_id": b.column("label")}
        ),
        batch_format="pyarrow",
    )


def count_triangles(
    edges: "ray.data.Dataset",
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Triangle count over an ordered undirected edge Dataset
    (src, dst with src < dst, distinct) → one row (n_triangles).

    The join plan: wedges = E ⋈ E on (e1.dst = e2.src) — every (a<b<c)
    path — then a semi join of wedges against E on the composite
    (a, c) key closes them.  Two repartition joins, one scalar count;
    the composite key packs both int keys into one int64 so the second
    hop is a plain single-key hash join.  Skew note: wedge fan-out at a
    node is deg², so a hot node dominates its partition — at web scale
    cap or sample per-node adjacency (the standard heavy-hitter split)
    before the wedge join.
    """
    e = edges.materialize()  # feeds three consumers below

    right = e.map_batches(
        lambda b: pa.table(
            {"wb": b.column("src"), "c": b.column("dst")}
        ),
        batch_format="pyarrow",
    )

    wedges = repartition_join(
        e,
        right,
        "dst",
        "wb",
        {"src": pa.int64(), "dst": pa.int64()},
        {"wb": pa.int64(), "c": pa.int64()},
        num_partitions=num_partitions,
    )

    def add_key(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "k": df.src.astype("int64") * np.int64(2 ** 32)
                + df.c.astype("int64")
            }
        )

    def edge_key(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        k = pc.add(
            pc.multiply(b.column("src"), 2 ** 32), b.column("dst")
        )
        return pa.table({"k": k})

    closed = repartition_join(
        wedges.map_batches(add_key, batch_format="pandas"),
        e.map_batches(edge_key, batch_format="pyarrow"),
        "k",
        "k",
        {"k": pa.int64()},
        {"k": pa.int64()},
        num_partitions=num_partitions,
        how="semi",
    )
    n = closed.count()
    return ray.data.from_pandas(
        pd.DataFrame({"n_triangles": [np.int64(n)]})
    )


def two_hop_counts(
    edges: "ray.data.Dataset", num_partitions: int = 8
) -> "ray.data.Dataset":
    """Per node: how many DISTINCT nodes are reachable in exactly two
    directed hops (excluding the node itself) — the canonical multi-hop
    traversal, as a distributed self-join over the edge table.

    Plan: distinct edges (combiner-first), wedge join e.dst = e'.src via
    one repartition_join (both copies of the edge table shuffle once on
    the mid node — never a broadcast of the edge set), map-side
    drop_duplicates of (src, far) per batch, a keyed distinct on the
    pair, then partial counts reduced per src.  A hot mid node fans out
    |in(mid)| x |out(mid)| wedge rows — that blowup is inherent to the
    query; the pair-keyed distinct immediately re-hashes the wedges so
    no single reducer holds a hot node's full fan-out.

    The distinct edge table is materialized once: both sides of the
    wedge join consume it, and Ray re-executes lazy lineage per
    consumer — without pinning, the whole upstream pipeline (e.g. KG
    extraction) would run twice.
    """
    e = _distinct_edges(edges).materialize()

    def rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {"mid": b.column("src"), "far": b.column("dst")}
        )

    wedges = repartition_join(
        e,
        e.map_batches(rename, batch_format="pyarrow"),
        "dst",
        "mid",
        {"src": pa.string(), "dst": pa.string()},
        {"mid": pa.string(), "far": pa.string()},
        num_partitions=num_partitions,
    )

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        p = df[df.far != df.src][["src", "far"]]
        return p.drop_duplicates()

    pairs = coarse_grouped_map(
        wedges.map_batches(pair_partial, batch_format="pandas"),
        ["src", "far"],
        lambda df: df.drop_duplicates(["src", "far"]),
        num_partitions=num_partitions,
    )

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("src", as_index=False).agg(n=("far", "size"))
        return g

    def count_final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("src", as_index=False).agg(n_two_hop=("n", "sum"))
        g["n_two_hop"] = g["n_two_hop"].astype(np.int64)
        return g.rename(columns={"src": "node"})

    return coarse_grouped_map(
        pairs.map_batches(count_partial, batch_format="pandas"),
        "src",
        count_final,
        num_partitions=num_partitions,
    )
