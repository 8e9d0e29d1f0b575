"""Small Ray helpers the Dataset API cannot express directly."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


@ray.remote
def _num_rows(t: pa.Table) -> int:
    return t.num_rows


@ray.remote
def _append_index(t: pa.Table, col: str, offset: int) -> pa.Table:
    return t.append_column(
        col, pa.array(np.arange(offset, offset + t.num_rows), pa.int64())
    )


def zip_with_index(
    ds: "ray.data.Dataset", col: str, offset: int = 0
) -> "ray.data.Dataset":
    """Append a dense global row index in current block order.

    Ray Data has no zipWithIndex; this is the standard two-pass pattern:
    count rows per block (tiny metadata tasks), cumsum offsets on the driver,
    then one remote task per block appends ``offset + arange``.  Blocks never
    move to the driver — intended for SMALL sorted outputs (e.g. the nodes
    table after canonicalization), not the main corpus.
    """
    refs = ds.to_arrow_refs()
    counts = ray.get([_num_rows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts[:-1])]) + offset if counts else []
    out = [
        _append_index.remote(r, col, int(o)) for r, o in zip(refs, offsets)
    ]
    return ray.data.from_arrow_refs(out)


def _session_token():
    """Identity of the CURRENT Ray session: (gcs_address, job_id).  The
    address alone is not enough — after ray.shutdown()/re-init in one
    process the OS can hand the new GCS the same port, and a dataset
    cached under that address would point at object-store blocks that
    died with the old session."""
    try:
        ctx = ray.get_runtime_context()
        return (ctx.gcs_address, ctx.get_job_id())
    except Exception:
        return None


def session_memo(cache: dict, key, builder, probe=None):
    """Per-Ray-session memoization with stale-session eviction.

    ``cache`` is a module-level dict owned by the caller.  When the Ray
    session changes (``_session_token``), every entry is dropped — dead
    sessions must not leak entries forever.  A hit is additionally
    PROBED (default: ``hit.take(1)``) so a dataset whose blocks are gone
    invalidates and rebuilds instead of erroring downstream; pass
    ``probe`` for non-Dataset cached values.
    """
    token = _session_token()
    if cache.get("_session") != token:
        cache.clear()
        cache["_session"] = token
    hit = cache.get(key)
    if hit is not None:
        try:
            (probe or (lambda v: v.take(1)))(hit)
            return hit
        except Exception:
            cache.pop(key, None)
    val = builder()
    cache[key] = val
    return val


def ensure_join_resources(
    ds: "ray.data.Dataset" = None, cpus_per_partition: float = 0.05
) -> None:
    """Cap the CPU reservation of ``Dataset.join`` aggregator actors.

    Ray 2.49's hash-join reserves ``min(1, (cluster_cpus/2)/P)`` CPUs per
    aggregator — i.e. HALF the cluster per join operator regardless of
    ``num_partitions``.  A pipeline with a join plus any actor-pool stage
    (or two joins) then deadlocks on small CPU budgets: the long-lived,
    mostly-idle aggregators pin every core and the producing map tasks can
    never schedule.  Aggregators block on network/IPC, not CPU, so a small
    fractional reservation is correct; set it once per session (a no-op if
    the user already configured an override).  On a large cluster raise it
    (e.g. 0.25-0.5) so finalization gets real cores.

    Each Dataset CAPTURES a DataContext copy at creation, so patching the
    global context after an input dataset exists has no effect on its plan
    — pass the pipeline's input dataset to patch its captured context too.
    """
    ctxs = [ray.data.DataContext.get_current()]
    if ds is not None:
        ctxs.append(ds.context)
    for ctx in ctxs:
        if ctx.join_operator_actor_num_cpus_per_partition_override is None:
            ctx.join_operator_actor_num_cpus_per_partition_override = (
                cpus_per_partition
            )


def coarse_grouped_map(
    ds: "ray.data.Dataset",
    key_cols,
    fn,
    num_partitions: int = 32,
    coalesce_blocks="auto",
):
    """Keyed aggregation/transform with VECTORIZED per-partition reduce.

    ``ds.groupby(keys).aggregate(...)`` and ``.map_groups(...)`` pay a
    per-GROUP Python cost in the reduce phase — ~0.5 ms per group, which is
    15+ seconds for a 20k-group aggregate (measured) and grows with key
    cardinality, i.e. with data scale.  This helper instead groups by a
    COARSE partition key (hash of the group keys mod ``num_partitions``)
    and hands each partition — thousands of whole groups — to ``fn`` as one
    pandas DataFrame, so the reduce is one C-speed ``df.groupby`` per
    partition.  Every row of a group lands in the same partition by
    construction.

    ``fn(df) -> df`` must itself group by ``key_cols`` (it sees all rows of
    each of its groups, nothing else is guaranteed about partition
    contents).  One all-to-all, same as the plain groupby; partition count
    bounds both sort fan-in and reducer memory — raise it at scale so a
    partition's groups fit in a worker's heap.
    """
    from pandas.util import hash_array

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    P = num_partitions

    def add_pkey(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("_pkey", pa.array([], pa.int32()))
        acc = np.zeros(batch.num_rows, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for c in keys:
                v = batch.column(c).to_numpy(zero_copy_only=False)
                acc = acc * np.uint64(0x9E3779B97F4A7C15) + hash_array(
                    np.asarray(v)
                )
        return batch.append_column(
            "_pkey", pa.array((acc % np.uint64(P)).astype(np.int32))
        )

    def run_partition(g):
        return fn(g.drop(columns=["_pkey"]))

    tagged = ds.map_batches(add_pkey, batch_format="pyarrow")
    # bound the sort fan-in (same rationale as repartition_join): micro-
    # blocks from a small read make the shuffle pay per-task cost for
    # nothing; one partition per core is right while partitions fit in heap
    width = coalesce_blocks
    if width == "auto":
        try:
            width = max(8, int(ray.cluster_resources().get("CPU", 8)))
        except Exception:
            width = 32
    if width:
        tagged = tagged.repartition(width)
    return (
        tagged.groupby("_pkey")
        .map_groups(run_partition, batch_format="pandas")
    )


def repartition_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_on: str,
    right_on: str,
    left_types: dict,
    right_types: dict,
    num_partitions: int = 64,
    coalesce_blocks="auto",
    how: str = "inner",
    salt: int = 1,
    post_fn=None,
):
    """Distributed hash-join via tag-union + coarse-partition groupby
    + per-partition vectorized pandas merge.

    ``salt`` > 1 enables the SKEW-SALTED plan for hot join keys: every
    LEFT row scatters to one of ``salt`` sub-keys of its join key and
    every RIGHT row is replicated to ALL ``salt`` sub-keys, so a key
    holding a large share of the left side spreads over ``salt``
    partitions instead of serializing one reducer (the join itself then
    matches on (key, salt), which each left row satisfies exactly once —
    output is identical to the unsalted plan, row order aside).  Cost:
    the right side's shuffle volume ×salt — ``salt`` therefore ASSUMES
    THE RIGHT SIDE IS THE SMALL ONE (a dimension/aggregate table, not a
    fact table); use it when the LEFT side is the skewed fact.  Replicas
    are emitted one salt value at a time so a map task's heap stays ~1×
    its input batch, but the shuffled bytes still grow ×salt.  Supported
    for inner/left/semi/anti; "outer" raises (unmatched RIGHT replicas
    would duplicate).

    ``post_fn(df) -> df``, if given, runs on each partition's joined
    frame BEFORE it is emitted — join + grouped-reduce FUSION.  Every
    row of a join key lands in one partition (like coarse_grouped_map),
    so a reduce grouped by the join key is exact here and the fused
    plan skips one full all-to-all of the joined rows.  Not valid with
    ``salt`` > 1 (a key's left rows then span ``salt`` partitions).

    ``how``: "inner" | "left" | "outer" | "semi" | "anti".  Inner/left/
    outer emit [left_on] + left cols + right cols (unmatched sides pad
    with nulls — numeric columns therefore come back as float64, cast
    downstream if needed); semi/anti emit [left_on] + left cols only
    (the right side contributes existence, never columns), with left
    multiplicity preserved.  All variants shuffle both sides exactly
    once on hash(key) — the per-partition kernel is the only
    difference, since every row of a key lands in one partition.

    Why not ``Dataset.join``: Ray 2.49's hash-join aggregators (a) reserve
    half the cluster's CPUs per join operator regardless of
    ``num_partitions`` (deadlocks pipelines that also hold actor pools on
    small CPU budgets) and (b) finalize EMPTY partitions as zero-column
    Arrow tables, which the underlying acero join rejects ("No match for
    key field") whenever a partition receives no rows — i.e. whenever the
    build side is sparse.  This helper uses only the sort-based shuffle
    (task-based, empty-block tolerant) and scales the same way: both
    sides move through one all-to-all partitioned on ``hash(key) %
    num_partitions``, and each partition joins with one in-memory merge.

    ``left_types`` / ``right_types``: {column: pyarrow type} for each
    side INCLUDING its key column (schemas are declared, not inferred, so
    the lazy plans are never executed early).  Non-key column names must
    be disjoint.  Output columns: [left_on] + left non-keys + right
    non-keys, as pandas blocks.
    """
    from pandas.util import hash_array

    lcols = [c for c in left_types if c != left_on]
    rcols = [c for c in right_types if c != right_on]
    key_type = left_types[left_on]
    P = num_partitions
    if salt > 1 and how == "outer":
        raise ValueError("salt > 1 is not supported for outer joins")
    if salt > 1 and post_fn is not None:
        raise ValueError(
            "post_fn requires all rows of a key in one partition; "
            "salt > 1 spreads them"
        )

    def pkey_of(arr: pa.ChunkedArray, salts=None) -> pa.Array:
        v = arr.to_numpy(zero_copy_only=False)
        h = hash_array(np.asarray(v))
        if salts is not None:
            with np.errstate(over="ignore"):
                h = h + salts * np.uint64(0x9E3779B97F4A7C15)
        h = h % np.uint64(P)
        return pa.array(h.astype(np.int32), pa.int32())

    def pad(n: int, t: pa.DataType) -> pa.Array:
        # Zero-pad numeric filler columns: null-padded ints become float64
        # after the pandas conversion inside the groupby, corrupting the
        # joined dtypes.  The filler values are never read (the merge only
        # takes each side's own columns from its own rows).
        if pa.types.is_integer(t) or pa.types.is_floating(t):
            return pa.array(np.zeros(n, dtype=t.to_pandas_dtype()), t)
        return pa.nulls(n, t)

    def tag_left(b: pa.Table) -> pa.Table:
        jkey = b.column(left_on).cast(key_type)
        # left rows scatter round-robin over the salt sub-keys — any
        # assignment is correct (the right side covers all of them)
        salts = (
            np.arange(b.num_rows, dtype=np.uint64) % np.uint64(salt)
            if salt > 1 else None
        )
        cols = {
            "_pkey": pkey_of(jkey, salts),
            "_side": pa.array(np.zeros(b.num_rows, np.int8), pa.int8()),
            "_jkey": jkey,
        }
        if salt > 1:
            cols["_salt"] = pa.array(salts.astype(np.int32), pa.int32())
        for c in lcols:
            cols[c] = b.column(c)
        for c in rcols:
            cols[c] = pad(b.num_rows, right_types[c])
        return pa.table(cols)

    def tag_right_one(b: pa.Table, s) -> pa.Table:
        salts = (
            np.full(b.num_rows, s, dtype=np.uint64) if s is not None
            else None
        )
        jkey = b.column(right_on).cast(key_type)
        cols = {
            "_pkey": pkey_of(jkey, salts),
            "_side": pa.array(np.ones(b.num_rows, np.int8), pa.int8()),
            "_jkey": jkey,
        }
        if s is not None:
            cols["_salt"] = pa.array(salts.astype(np.int32), pa.int32())
        for c in lcols:
            cols[c] = pad(b.num_rows, left_types[c])
        for c in rcols:
            cols[c] = b.column(c)
        return pa.table(cols)

    def tag_right(b: pa.Table):
        # Replicas are YIELDED one salt value at a time, never built as
        # one salt-times-wider table: a task's peak heap stays ~1× the
        # input batch (plus the block being emitted) regardless of
        # ``salt``.  The total shuffle volume is still ×salt by design —
        # see the ``salt`` parameter note above.
        if salt <= 1:
            yield tag_right_one(b, None)
            return
        for s in range(salt):
            yield tag_right_one(b, s)

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )
    # Bound the sort-shuffle fan-in: the union CONCATENATES both sides'
    # block lists, and Ray's sort inherits that block count, paying a fixed
    # per-task cost per partition (two 64-block reads → a 128-partition
    # sort for data that fits in 32).  One partition per cluster core is
    # right while partitions fit in worker heap; at 100 TB callers should
    # instead size ``num_partitions ≈ total_bytes / 256 MB`` and skip the
    # coalesce by passing ``coalesce_blocks=None``.
    width = coalesce_blocks
    if width == "auto":
        try:
            width = max(8, int(ray.cluster_resources().get("CPU", 8)))
        except Exception:
            width = 32
    if width:
        tagged = tagged.repartition(width)

    if how not in ("inner", "left", "outer", "semi", "anti"):
        raise ValueError(f"unsupported join type: {how!r}")
    out_cols = (
        [left_on] + lcols if how in ("semi", "anti")
        else [left_on] + lcols + rcols
    )

    # a salted partition holds right replicas for SEVERAL salt values of
    # the same key — matching must be on (key, salt) so each left row
    # meets each right row exactly once
    jk = ["_jkey", "_salt"] if salt > 1 else ["_jkey"]

    def merge_partition(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        l = g[g._side == 0]
        r = g[g._side == 1]
        if l.empty and how != "outer":
            # ZERO-column empty frame: map_batches passes empties through
            # untouched and pd.concat ignores column-less frames, so this
            # never pollutes the joined schema downstream.
            return pd.DataFrame()
        if how == "outer":
            m = l[["_jkey"] + lcols].merge(
                r[["_jkey"] + rcols], on="_jkey", how="outer"
            )
        elif how in ("semi", "anti"):
            if salt > 1:
                hit = pd.MultiIndex.from_frame(l[jk]).isin(
                    pd.MultiIndex.from_frame(r[jk])
                )
            else:
                hit = l._jkey.isin(r._jkey)
            m = l[hit if how == "semi" else ~hit][["_jkey"] + lcols]
        elif how == "left":
            m = l[jk + lcols].merge(
                r[jk + rcols], on=jk, how="left"
            )
        else:
            if r.empty:
                return pd.DataFrame()
            m = l[jk + lcols].merge(
                r[jk + rcols], on=jk, how="inner"
            )
        if m.empty:
            return pd.DataFrame()
        m = m.rename(columns={"_jkey": left_on})
        m = m[out_cols]
        return post_fn(m) if post_fn is not None else m

    return (
        tagged.groupby("_pkey")
        .map_groups(merge_partition, batch_format="pandas")
    )


def schema_floor(ds: "ray.data.Dataset", schema: pa.Schema):
    """Guarantee a typed schema on a possibly-empty keyed result.

    Ray's sort-based groupby finalizes key-less partitions as
    ZERO-COLUMN empty blocks ("new schema: ." RefBundle warnings);
    they coexist harmlessly with nonempty blocks, but when EVERY
    partition is empty the dataset's unified schema collapses to zero
    columns — ``to_pandas()`` returns a (0, 0) frame and downstream
    column references crash.  ``union`` with a typed empty block does
    NOT fix it (the zero-column block still poisons unification), so
    this helper materializes the result once and substitutes a typed
    empty table iff there are no rows.

    Use on operators whose output may be legitimately empty (set
    differences, threshold joins).  The materialize is the result the
    caller was about to consume anyway — keyed-aggregate outputs, the
    small end of the pipeline.

    Known Ray 2.49 limitation this canNOT fix: ``Dataset.to_pandas()``
    drops all columns for ANY fully-empty dataset, typed or not (even
    ``from_arrow(schema.empty_table())`` round-trips to a (0, 0)
    frame).  ``schema()``, ``write_parquet`` and ``iter_batches`` see
    the correct typed schema; pandas consumers of possibly-empty
    results must guard on ``len(df)``.
    """
    m = ds.materialize()
    if m.count() == 0:
        return ray.data.from_arrow(schema.empty_table())
    return m


def smart_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_on: str,
    right_on: str,
    left_types: dict,
    right_types: dict,
    num_partitions: int = 64,
    how: str = "inner",
    broadcast_threshold: int = 100_000,
):
    """Adaptive join: broadcast the right side when it is small, shuffle
    both sides otherwise — the one planning decision a distributed engine
    must make per join, made here from an O(metadata) row count.

    - right rows ≤ ``broadcast_threshold``: the right table is collected
      ONCE, ``ray.put`` into the object store (zero-copy shared-memory
      read per task), and the join is a pure map over the left side —
      no shuffle at all, the fact table never moves.
    - otherwise: ``repartition_join`` (both sides hash-partitioned once).

    Same output contract as ``repartition_join`` for how ∈ {inner, left,
    semi, anti}: columns [left_on] + left non-keys (+ right non-keys for
    inner/left).  "outer" always shuffles — an outer join's unmatched
    RIGHT rows can't be emitted from a map over the left side without
    duplicating them per block.

    The threshold is rows, not bytes, deliberately: the caller knows the
    row width; at 100 TB set it to whatever fits the task heap (the
    default ≈ a few MB for typical dimension rows).
    """
    # validate up front: the broadcast path feeds ``how`` straight into
    # pandas.merge, so an unsupported type would otherwise error (or
    # silently mis-join) only when the right side happens to be small
    if how not in ("inner", "left", "outer", "semi", "anti"):
        raise ValueError(f"unsupported join type: {how!r}")
    if how == "outer":
        return repartition_join(
            left, right, left_on, right_on, left_types, right_types,
            num_partitions=num_partitions, how=how,
        )
    # materialize once: the count would otherwise execute the right plan
    # and to_pandas()/the shuffle would re-execute it (lazy lineage).  A
    # big right side lands in the object store and spills — same cost the
    # shuffle was about to pay reading it.
    right = right.materialize()
    n_right = right.count()
    if n_right > broadcast_threshold:
        return repartition_join(
            left, right, left_on, right_on, left_types, right_types,
            num_partitions=num_partitions, how=how,
        )

    import pandas as pd

    rcols = [c for c in right_types if c != right_on]
    small = right.to_pandas()
    if len(small) == 0:
        small = pd.DataFrame({c: pd.Series([], dtype="object")
                              for c in [right_on] + rcols})
    small = small.rename(columns={right_on: left_on})
    if how in ("semi", "anti"):
        keys = set(small[left_on])
    r_ref = ray.put(small if how in ("inner", "left") else keys)
    lcols = [c for c in left_types if c != left_on]
    out_cols = (
        [left_on] + lcols if how in ("semi", "anti")
        else [left_on] + lcols + rcols
    )

    def probe(df: "pd.DataFrame") -> "pd.DataFrame":
        rhs = ray.get(r_ref)
        if how == "semi":
            m = df[df[left_on].isin(rhs)]
        elif how == "anti":
            m = df[~df[left_on].isin(rhs)]
        else:
            m = df.merge(rhs, on=left_on, how=how)
        if m.empty:
            return pd.DataFrame()
        return m[out_cols]

    return left.map_batches(probe, batch_format="pandas")


def stage_stats(ds: "ray.data.Dataset"):
    """Parse ``ds.stats()`` into one row per operator — the feedback loop
    the per-stage tuning in this repo ran on (which stage dominates wall
    time, how many blocks it produced, whether a shuffle starved).

    Returns a pandas DataFrame (operator, wall_s, n_blocks) in plan
    order.  Call AFTER consuming the dataset (stats exist only for
    executed plans).  Parsing is best-effort over the human-readable
    stats text — Ray exposes no structured per-operator API at 2.49 —
    so absent fields come back NaN rather than raising.
    """
    import re

    import pandas as pd

    text = ds.stats()
    rows = []
    # Ray 2.49 header shape:
    #   "Operator N <name>: T tasks executed, B blocks produced in Xs"
    for m in re.finditer(
        r"Operator \d+ (.+?): (\d+) tasks? executed, (\d+) blocks? "
        r"produced in ([0-9.]+)s",
        text,
    ):
        rows.append(
            {
                "operator": m.group(1),
                "n_tasks": int(m.group(2)),
                "n_blocks": int(m.group(3)),
                "wall_s": float(m.group(4)),
            }
        )
    # all-to-all sections: "Operator N <name>: executed in Xs"
    for m in re.finditer(
        r"Operator \d+ (.+?): executed in ([0-9.]+)s", text
    ):
        rows.append(
            {
                "operator": m.group(1),
                "n_tasks": None,
                "n_blocks": None,
                "wall_s": float(m.group(2)),
            }
        )
    return pd.DataFrame(
        rows, columns=["operator", "n_tasks", "n_blocks", "wall_s"]
    )


# ---------------------------------------------------------------------------
# Bloom filter kernels (shared by the semi-join and dedup prefilters)
# ---------------------------------------------------------------------------

_BLOOM_MIX = np.uint64(0xFF51AFD7ED558CCD)


def bloom_hashes(keys: np.ndarray):
    """Two independent 64-bit hash streams for double hashing
    (pos_i = h1 + i·h2), both via the engine's stable vectorized hasher."""
    from pandas.util import hash_array

    k = np.asarray(keys)
    h1 = hash_array(k)
    with np.errstate(over="ignore"):
        h2 = hash_array(h1 * _BLOOM_MIX) | np.uint64(1)  # odd → full cycle
    return h1, h2


def bloom_positions(keys: np.ndarray, m_bits: int, n_hashes: int):
    h1, h2 = bloom_hashes(keys)
    m = np.uint64(m_bits)
    with np.errstate(over="ignore"):
        return [
            ((h1 + np.uint64(i) * h2) % m).astype(np.int64)
            for i in range(n_hashes)
        ]


def bloom_set(bits: np.ndarray, keys: np.ndarray, m_bits: int,
              n_hashes: int) -> None:
    """OR the keys into a packed uint8 bitmap in place."""
    if len(keys):
        for pos in bloom_positions(keys, m_bits, n_hashes):
            np.bitwise_or.at(
                bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8)
            )


def bloom_test(bits: np.ndarray, keys: np.ndarray, m_bits: int,
               n_hashes: int) -> np.ndarray:
    """Boolean membership-candidate mask (no false negatives)."""
    ok = np.ones(len(keys), dtype=bool)
    for pos in bloom_positions(keys, m_bits, n_hashes):
        ok &= (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1 == 1
    return ok
