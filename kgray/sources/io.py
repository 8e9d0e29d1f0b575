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
    the target names .lance, else partitioned Parquet.

    Lance has no hive-style directory partitioning: ``partition_cols``
    ride as ordinary COLUMNS of the lance dataset and resume consumers
    filter on them as predicates (contract pinned by
    tests/test_lance_facade.py)."""
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


def read_jsonl(
    uri: str, columns: Optional[Sequence[str]] = None, **kwargs
) -> "ray.data.Dataset":
    """Read newline-delimited JSON as a Ray Dataset (the reference
    persists every stage as JSON — indra_download_extract.py:36-40; this
    is the bulk-ingest twin of those artifacts).  Column pruning happens
    right after parse: JSON text cannot be projected at the read the way
    parquet can, so prune-at-the-read here means dropping columns before
    the first shuffle."""
    ds = ray.data.read_json(uri, **kwargs)
    if columns:
        ds = ds.select_columns(list(columns))
    return ds


def write_jsonl(ds: "ray.data.Dataset", uri: str) -> None:
    """Write a Dataset as sharded newline-delimited JSON (one file per
    block — the resumable layout convention, never one giant file)."""
    ds.write_json(uri)


def read_csv_table(
    uri: str, columns: Optional[Sequence[str]] = None, **kwargs
) -> "ray.data.Dataset":
    """Read CSV as a Ray Dataset; column pruning is pushed into the Arrow
    CSV reader (convert_options) so non-selected columns never
    materialize."""
    if columns:
        from pyarrow import csv as pacsv

        kwargs = dict(kwargs)
        kwargs["convert_options"] = pacsv.ConvertOptions(
            include_columns=list(columns)
        )
    return ray.data.read_csv(uri, **kwargs)


def write_csv_table(ds: "ray.data.Dataset", uri: str) -> None:
    """Write a Dataset as sharded CSV files."""
    ds.write_csv(uri)
