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
