"""Distributed range (interval) join.

Ray Data has no non-equi join; the classic workaround — cross join then
filter — moves |points| x |intervals| candidate rows and dies at scale.
This module implements the standard BUCKETED range join instead: pick a
fixed grid of ``n_buckets`` over the point domain, replicate each
interval to every bucket it overlaps, route each point to exactly ONE
bucket, and co-group per bucket.  The partitioning assumption (document
it at every call site): interval span / bucket width is the replication
factor, so buckets must be sized near the TYPICAL interval span — a few
long-lived intervals replicate to many buckets (bounded by n_buckets),
but the bulk of the interval table must not.

``point_in_interval_count`` never materializes matched pairs at all:
within a bucket the per-point cover count is

    #(start <= p) - #(end <= p)

over two sorted endpoint arrays (np.searchsorted), the same
endpoint-counting identity the sweep-line operators use — so the
all-to-all moves only (bucket, endpoint) rows and the output is one row
per point regardless of match multiplicity.  ``point_in_interval_pairs``
materializes the (point, interval) matches for when the interval payload
is needed; its output IS the match set, so it is only as scalable as the
join's selectivity.

Intervals are half-open ``[start, end)``; inverted intervals
(end <= start) match nothing and are dropped map-side.  All domain
values are int64 (timestamps enter as raw microseconds — no granularity
assumption).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..utils import coarse_grouped_map


def _minmax_int64(ds: "ray.data.Dataset", col: str):
    """One aggregate pass for the point-domain bounds (two int64s to the
    driver — the only driver state the bucketing needs).  Returns
    (None, None) for an empty dataset (callers emit a typed empty
    result)."""
    from ray.data.aggregate import Max, Min

    agg = ds.aggregate(Min(col), Max(col))
    lo, hi = agg.get(f"min({col})"), agg.get(f"max({col})")
    if lo is None or hi is None:
        return None, None
    return int(lo), int(hi)


def _bucket_points(
    points: "ray.data.Dataset", point_col: str, id_col: str,
    lo: int, width: int,
) -> "ray.data.Dataset":
    def tag(batch: pa.Table) -> pa.Table:
        p = batch.column(point_col).to_numpy(zero_copy_only=False)
        p = p.astype(np.int64, copy=False)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array((p - lo) // width, pa.int64()),
                "tag": pa.array(np.zeros(len(p), np.int8), pa.int8()),
                "v1": pa.array(p, pa.int64()),
                "v2": pa.array(ids.astype(np.int64, copy=False), pa.int64()),
            }
        )

    return points.map_batches(tag, batch_format="pyarrow")


def _bucket_intervals(
    intervals: "ray.data.Dataset", start_col: str, end_col: str,
    lo: int, hi: int, width: int,
) -> "ray.data.Dataset":
    def replicate(batch: pa.Table) -> pa.Table:
        s = batch.column(start_col).to_numpy(zero_copy_only=False)
        e = batch.column(end_col).to_numpy(zero_copy_only=False)
        s = s.astype(np.int64, copy=False)
        e = e.astype(np.int64, copy=False)
        # clip to the point domain: buckets outside it hold no points
        cs = np.maximum(s, lo)
        ce = np.minimum(e, hi + 1)
        keep = ce > cs  # drops inverted AND fully-out-of-domain intervals
        s, e, cs, ce = s[keep], e[keep], cs[keep], ce[keep]
        b0 = (cs - lo) // width
        b1 = (ce - 1 - lo) // width
        reps = (b1 - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(s)), reps)
        # bucket id of each replica: b0[i] + (0, 1, ..., reps[i]-1)
        off = np.arange(len(idx)) - np.repeat(
            np.concatenate(([0], np.cumsum(reps)[:-1])), reps
        )
        return pa.table(
            {
                "bucket": pa.array(b0[idx] + off, pa.int64()),
                "tag": pa.array(np.ones(len(idx), np.int8), pa.int8()),
                "v1": pa.array(s[idx], pa.int64()),
                "v2": pa.array(e[idx], pa.int64()),
            }
        )

    return intervals.map_batches(replicate, batch_format="pyarrow")


def point_in_interval_count(
    points: "ray.data.Dataset",
    intervals: "ray.data.Dataset",
    point_col: str,
    id_col: str,
    start_col: str,
    end_col: str,
    out_col: str = "n_cover",
    n_buckets: int = 64,
    num_partitions: int = 32,
    bounds=None,
) -> "ray.data.Dataset":
    """(id_col, out_col): for every point row, how many intervals cover
    it (start <= p < end).  One row out per point row, including count 0.

    Shape: one aggregate pass for the point-domain bounds, one map per
    side (points -> 1 row, intervals -> <= span/width + 1 replicas), one
    bucket-keyed all-to-all, vectorized per-bucket endpoint counting.
    Matched pairs are never materialized.

    ``bounds=(lo, hi)`` skips the aggregate pass when the caller already
    knows a COVERING range for the points (e.g. from parquet column
    statistics).  A wider-than-true range is safe — points still route
    to one bucket each and intervals replicate across the covered span;
    a range that misses points silently undercounts them, so only pass
    bounds that provably cover.
    """
    lo, hi = bounds if bounds is not None else _minmax_int64(
        points, point_col
    )
    if lo is None:  # no points at all
        return ray.data.from_arrow(
            pa.schema(
                [(id_col, pa.int64()), (out_col, pa.int64())]
            ).empty_table()
        )
    width = max(1, -(-(hi - lo + 1) // n_buckets))

    tagged = _bucket_points(points, point_col, id_col, lo, width).union(
        _bucket_intervals(intervals, start_col, end_col, lo, hi, width)
    )

    def count_bucket(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby("bucket", sort=False):
            pts = g[g.tag == 0]
            if pts.empty:
                continue
            iv = g[g.tag == 1]
            starts = np.sort(iv.v1.to_numpy(np.int64))
            ends = np.sort(iv.v2.to_numpy(np.int64))
            p = pts.v1.to_numpy(np.int64)
            n = (
                np.searchsorted(starts, p, side="right")
                - np.searchsorted(ends, p, side="right")
            )
            outs.append(
                pd.DataFrame(
                    {
                        id_col: pts.v2.to_numpy(np.int64),
                        out_col: n.astype(np.int64),
                    }
                )
            )
        if not outs:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype=np.int64),
                    out_col: pd.Series([], dtype=np.int64),
                }
            )
        return pd.concat(outs, ignore_index=True)

    return coarse_grouped_map(
        tagged, "bucket", count_bucket, num_partitions=num_partitions
    )


def point_in_interval_pairs(
    points: "ray.data.Dataset",
    intervals: "ray.data.Dataset",
    point_col: str,
    id_col: str,
    start_col: str,
    end_col: str,
    interval_id_col: str,
    n_buckets: int = 64,
    num_partitions: int = 32,
    bounds=None,
) -> "ray.data.Dataset":
    """(id_col, interval_id_col): every (point, covering interval) match.

    Same bucketing as the count variant, but each bucket emits its
    matches via a vectorized two-pointer sweep (sort intervals by start,
    prefix-count starts <= p, then filter the candidate block on end > p).
    Output size equals the true match count — use the count variant when
    only multiplicity is needed.  ``bounds``: same covering-range
    contract as point_in_interval_count.
    """
    lo, hi = bounds if bounds is not None else _minmax_int64(
        points, point_col
    )
    if lo is None:  # no points at all
        return ray.data.from_arrow(
            pa.schema(
                [(id_col, pa.int64()), (interval_id_col, pa.int64())]
            ).empty_table()
        )
    width = max(1, -(-(hi - lo + 1) // n_buckets))

    def tag_iv(batch: pa.Table) -> pa.Table:
        s = batch.column(start_col).to_numpy(zero_copy_only=False)
        e = batch.column(end_col).to_numpy(zero_copy_only=False)
        s = s.astype(np.int64, copy=False)
        e = e.astype(np.int64, copy=False)
        iid = batch.column(interval_id_col).to_numpy(zero_copy_only=False)
        cs = np.maximum(s, lo)
        ce = np.minimum(e, hi + 1)
        keep = ce > cs
        s, e, iid, cs, ce = s[keep], e[keep], iid[keep], cs[keep], ce[keep]
        b0 = (cs - lo) // width
        b1 = (ce - 1 - lo) // width
        reps = (b1 - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(s)), reps)
        off = np.arange(len(idx)) - np.repeat(
            np.concatenate(([0], np.cumsum(reps)[:-1])), reps
        )
        return pa.table(
            {
                "bucket": pa.array(b0[idx] + off, pa.int64()),
                "tag": pa.array(np.ones(len(idx), np.int8), pa.int8()),
                "v1": pa.array(s[idx], pa.int64()),
                "v2": pa.array(e[idx], pa.int64()),
                "v3": pa.array(
                    iid[idx].astype(np.int64, copy=False), pa.int64()
                ),
            }
        )

    def tag_pts(batch: pa.Table) -> pa.Table:
        p = batch.column(point_col).to_numpy(zero_copy_only=False)
        p = p.astype(np.int64, copy=False)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        z = np.zeros(len(p), np.int64)
        return pa.table(
            {
                "bucket": pa.array((p - lo) // width, pa.int64()),
                "tag": pa.array(np.zeros(len(p), np.int8), pa.int8()),
                "v1": pa.array(p, pa.int64()),
                "v2": pa.array(ids.astype(np.int64, copy=False), pa.int64()),
                "v3": pa.array(z, pa.int64()),
            }
        )

    tagged = points.map_batches(tag_pts, batch_format="pyarrow").union(
        intervals.map_batches(tag_iv, batch_format="pyarrow")
    )

    def match_bucket(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby("bucket", sort=False):
            pts = g[g.tag == 0]
            iv = g[g.tag == 1]
            if pts.empty or iv.empty:
                continue
            order = np.argsort(iv.v1.to_numpy(np.int64), kind="stable")
            s = iv.v1.to_numpy(np.int64)[order]
            e = iv.v2.to_numpy(np.int64)[order]
            iid = iv.v3.to_numpy(np.int64)[order]
            p = pts.v1.to_numpy(np.int64)
            pid = pts.v2.to_numpy(np.int64)
            hi_idx = np.searchsorted(s, p, side="right")
            cand = np.repeat(np.arange(len(p)), hi_idx)
            iv_idx = np.arange(len(cand)) - np.repeat(
                np.concatenate(([0], np.cumsum(hi_idx)[:-1])), hi_idx
            )
            ok = e[iv_idx] > p[cand]
            outs.append(
                pd.DataFrame(
                    {
                        id_col: pid[cand[ok]],
                        interval_id_col: iid[iv_idx[ok]],
                    }
                )
            )
        if not outs:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype=np.int64),
                    interval_id_col: pd.Series([], dtype=np.int64),
                }
            )
        return pd.concat(outs, ignore_index=True)

    return coarse_grouped_map(
        tagged, "bucket", match_bucket, num_partitions=num_partitions
    )
