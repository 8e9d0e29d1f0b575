"""Table I/O facade: Lance when available, Parquet otherwise.

The north rule names Lance as the input/output format for the interleaved
document corpus.  This container has pyarrow but no ``lance`` /
``pylance`` wheel (SURVEY §7.4), so the engine reads/writes through this
facade: identical call sites, Lance behind an import-try, Parquet as the
always-available fallback.  The on-disk layout convention is the same for
both: one dataset directory per logical table, partition column
``partition_id`` for resume (pipelines/checkpoint.py).
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence

import ray
import ray.data

try:  # pragma: no cover - lance not installable in this sandbox
    import lance  # type: ignore

    HAVE_LANCE = True
except ImportError:
    lance = None
    HAVE_LANCE = False


def detect_format(uri: str) -> str:
    """'lance' for .lance dirs (or when only lance data exists), else
    'parquet'."""
    if uri.endswith(".lance"):
        return "lance"
    if uri.endswith(".parquet"):
        return "parquet"
    if os.path.isdir(uri):
        names = os.listdir(uri)
        if any(n.endswith(".lance") or n == "_versions" for n in names):
            return "lance"
    return "parquet"


def read_table(
    uri: str,
    columns: Optional[Sequence[str]] = None,
    **kwargs,
) -> "ray.data.Dataset":
    """Read a logical table as a Ray Dataset (column-pruned at the read)."""
    fmt = detect_format(uri)
    if fmt == "lance":
        if not HAVE_LANCE:
            raise RuntimeError(
                f"{uri} is a Lance dataset but the lance package is not "
                "available; install pylance or convert to parquet"
            )
        return ray.data.read_lance(uri, columns=list(columns) if columns
                                   else None, **kwargs)
    if os.path.isdir(uri):
        files = sorted(
            os.path.join(root, f)
            for root, _, fs in os.walk(uri)
            for f in fs
            if f.endswith(".parquet")
        )
        return ray.data.read_parquet(files, columns=list(columns)
                                     if columns else None, **kwargs)
    return ray.data.read_parquet(uri, columns=list(columns) if columns
                                 else None, **kwargs)


def write_table(
    ds: "ray.data.Dataset",
    uri: str,
    partition_cols: Optional[List[str]] = None,
) -> None:
    """Write a Ray Dataset as a Lance dataset when lance is importable and
    the target names .lance, else partitioned Parquet."""
    if uri.endswith(".lance"):
        if not HAVE_LANCE:
            raise RuntimeError(
                "lance output requested but the lance package is not "
                "available in this environment"
            )
        ds.write_lance(uri)  # pragma: no cover
        return
    if partition_cols:
        ds.write_parquet(uri, partition_cols=partition_cols)
    else:
        ds.write_parquet(uri)
