"""Per-partition checkpointing + lineage for the extraction stage.

The reference writes per-document stage JSONs (indra_download_extract.py:36-40
via main.py:63/68/75/98) but never resumes from them.  Here resume is a
first-class contract (BASELINE.json north_rule: "any partition can resume
from checkpoint without re-invoking the LLM"):

- Every document belongs to a fixed partition: ``crc32(doc_id) % P`` (stable
  across processes/runs — NOT Python ``hash``).  ``P`` is recorded in the
  manifest and must not change across resumes of the same checkpoint dir.
- The LLM-bearing prefix (explode → annotate → extract) runs ONLY for
  partitions without a completed manifest; its output is written as
  partitioned parquet: ``ckpt_dir/extractions/partition_id=K/``.
- The commit point is the per-partition manifest JSON
  (``ckpt_dir/manifests/partition-K.json``) holding lineage + metrics:
  input fingerprint, doc/span/extraction counts, wall time.  Data files
  without a manifest are treated as garbage from a crashed run and deleted
  before recompute — exactly-once per partition.
- Downstream (graph) stages read the full checkpointed extractions table,
  so a resumed run never re-invokes the extractor for finished partitions.

Scale note: one run materializes only the PENDING partitions' extraction
output (orders of magnitude smaller than the input corpus); completed
partitions stream straight from parquet.
"""
from __future__ import annotations

import json
import os
import shutil
import time
import zlib
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Set

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .. import schemas
from .kg import KGConfig, run_extractions

MANIFEST_VERSION = 1


def partition_of(doc_id: str, num_partitions: int) -> int:
    return zlib.crc32(doc_id.encode("utf-8")) % num_partitions


def _add_partition_column(num_partitions: int):
    def fn(batch: pa.Table) -> pa.Table:
        pids = [
            partition_of(d, num_partitions)
            for d in batch.column("doc_id").to_pylist()
        ]
        return batch.append_column("partition_id", pa.array(pids, pa.int32()))

    return fn


@dataclass
class CheckpointState:
    ckpt_dir: str
    num_partitions: int
    completed: Set[int] = field(default_factory=set)

    @property
    def data_dir(self) -> str:
        return os.path.join(self.ckpt_dir, "extractions")

    @property
    def manifest_dir(self) -> str:
        return os.path.join(self.ckpt_dir, "manifests")

    def manifest_path(self, pid: int) -> str:
        return os.path.join(self.manifest_dir, f"partition-{pid}.json")

    def partition_data_dir(self, pid: int) -> str:
        return os.path.join(self.data_dir, f"partition_id={pid}")


def load_state(ckpt_dir: str, num_partitions: int) -> CheckpointState:
    st = CheckpointState(ckpt_dir, num_partitions)
    os.makedirs(st.data_dir, exist_ok=True)
    os.makedirs(st.manifest_dir, exist_ok=True)
    for name in os.listdir(st.manifest_dir):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(st.manifest_dir, name)) as f:
            m = json.load(f)
        if m.get("status") == "complete":
            if m.get("num_partitions") != num_partitions:
                raise ValueError(
                    f"checkpoint was written with num_partitions="
                    f"{m.get('num_partitions')}, cannot resume with "
                    f"{num_partitions}"
                )
            st.completed.add(int(m["partition_id"]))
    return st


def run_checkpointed_extractions(
    documents: "ray.data.Dataset",
    ckpt_dir: str,
    num_partitions: int = 16,
    cfg: Optional[KGConfig] = None,
) -> "ray.data.Dataset":
    """Return the full EXTRACTIONS dataset, computing only pending partitions.

    Lineage/metrics manifest per partition::

        {partition_id, num_partitions, stage, status, input_fingerprint,
         n_docs, n_spans, n_admitted, n_extraction_rows, n_statements,
         wall_time_sec, written_at, version}
    """
    st = load_state(ckpt_dir, num_partitions)
    docs_p = documents.map_batches(
        _add_partition_column(num_partitions), batch_format="pyarrow"
    )

    completed_ref = ray.put(st.completed)

    def only_pending(batch: pa.Table) -> pa.Table:
        done = ray.get(completed_ref)
        if not done:
            return batch
        mask = [
            p not in done for p in batch.column("partition_id").to_pylist()
        ]
        return batch.filter(pa.array(mask, pa.bool_()))

    pending = docs_p.map_batches(only_pending, batch_format="pyarrow")

    # crashed-run garbage: data dirs without a manifest
    for name in os.listdir(st.data_dir):
        if not name.startswith("partition_id="):
            continue
        pid = int(name.split("=", 1)[1])
        if pid not in st.completed:
            shutil.rmtree(os.path.join(st.data_dir, name))

    t0 = time.time()
    ext = run_extractions(pending.drop_columns(["partition_id"]), cfg)
    ext = ext.map_batches(
        _add_partition_column(num_partitions), batch_format="pyarrow"
    ).materialize()

    # lineage metrics as distributed partial aggregates: each batch emits one
    # row per partition; the driver only ever folds ≤ P rows per batch —
    # never the corpus itself (no iter_rows / concat of the full table).
    def _ext_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                "partition_id": batch.column("partition_id").to_numpy(
                    zero_copy_only=False
                ),
                "admitted": batch.column("admitted").to_numpy(
                    zero_copy_only=False
                ),
                "n_stmt": pc.list_value_length(batch.column("results"))
                .fill_null(0)
                .to_numpy(zero_copy_only=False),
                "is_doc_start": pc.equal(batch.column("span_seq"), 0)
                .to_numpy(zero_copy_only=False),
                "doc_crc": [
                    zlib.crc32(d.encode()) if s == 0 else 0
                    for d, s in zip(
                        batch.column("doc_id").to_pylist(),
                        batch.column("span_seq").to_pylist(),
                    )
                ],
            }
        )
        g = df.groupby("partition_id").agg(
            n_spans=("admitted", "size"),
            n_admitted=("admitted", "sum"),
            n_statements=("n_stmt", "sum"),
            n_docs=("is_doc_start", "sum"),
            crc_sum=("doc_crc", "sum"),
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    if ext.count() > 0:
        import pandas as pd

        partials = pd.concat(
            [
                b
                for b in ext.map_batches(
                    _ext_partial, batch_format="pyarrow"
                ).iter_batches(batch_format="pandas")
            ]
        )
        stats = partials.groupby("partition_id").sum().reset_index()
        ext.write_parquet(st.data_dir, partition_cols=["partition_id"])
        wall = time.time() - t0
        for _, row in stats.iterrows():
            pid = int(row["partition_id"])
            manifest = {
                "version": MANIFEST_VERSION,
                "partition_id": pid,
                "num_partitions": num_partitions,
                "stage": "extractions",
                "status": "complete",
                "input_fingerprint": (
                    f"crcsum:{int(row['crc_sum']) & 0xFFFFFFFFFFFFFFFF:x}"
                    f":n={int(row['n_docs'])}"
                ),
                "n_docs": int(row["n_docs"]),
                "n_spans": int(row["n_spans"]),
                "n_admitted": int(row["n_admitted"]),
                "n_statements": int(row["n_statements"]),
                "wall_time_sec": round(wall, 3),
                "written_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
            }
            tmp = st.manifest_path(pid) + ".tmp"
            with open(tmp, "w") as f:
                json.dump(manifest, f, indent=1)
            os.replace(tmp, st.manifest_path(pid))  # atomic commit point

    # full table = checkpointed parquet (completed + just-written partitions);
    # read the partition dirs explicitly so stray files in the checkpoint
    # root can never break the read
    cols = [f.name for f in schemas.EXTRACTIONS]
    part_files = sorted(
        os.path.join(st.data_dir, name, f)
        for name in os.listdir(st.data_dir)
        if name.startswith("partition_id=")
        for f in os.listdir(os.path.join(st.data_dir, name))
        if f.endswith(".parquet")
    )
    if not part_files:
        return ray.data.from_arrow(schemas.EXTRACTIONS.empty_table())
    out = ray.data.read_parquet(part_files)
    # parquet partition column comes back as dictionary/string; drop it and
    # restore declared column order
    return out.select_columns(cols)


def checkpoint_summary(ckpt_dir: str) -> List[dict]:
    mdir = os.path.join(ckpt_dir, "manifests")
    out = []
    if os.path.isdir(mdir):
        for name in sorted(os.listdir(mdir)):
            if name.endswith(".json"):
                with open(os.path.join(mdir, name)) as f:
                    out.append(json.load(f))
    return out
