"""Fault injection (r4 verdict ask #6): the checkpointed KG pipeline
survives (a) an extract ACTOR being killed mid-run — Ray restarts the
actor and retries the batch, output unchanged — and (b) a DRIVER crash
after partition K committed — the restarted driver re-extracts only the
uncommitted partitions, completed manifests show exactly one attempt,
and the final tables are identical to a never-crashed run."""
import json
import os

import pandas as pd
import pyarrow as pa
import ray.data

from kgray.corpus import generate_documents
from kgray.pipelines.checkpoint import (
    load_state,
    partition_of,
    run_checkpointed_kg,
)
from kgray.pipelines.kg import KGConfig, run_kg_pipeline

N_PARTS = 4


def _cfg(backend=None):
    # (1, 1) pools: the kill test RESTARTS an actor mid-run — on the
    # 4-CPU test session two (1, 2) pools plus a restarting actor can
    # starve the repartition split tasks (the documented 4-CPU
    # actor-pool deadlock), which is a harness artifact, not the fault
    # path under test
    cfg = KGConfig(annotate_concurrency=(1, 1), extract_concurrency=(1, 1))
    if backend is not None:
        cfg.backend = backend
    return cfg


def _sorted_df(ds, keys):
    df = ds.to_pandas()
    for c in df.columns:
        if isinstance(df[c].dtype, pd.CategoricalDtype):
            df[c] = df[c].astype(object)
    return df.sort_values(keys).reset_index(drop=True)


def test_extract_actor_kill_mid_run_retries_and_matches(tmp_path):
    # KillOnceBackend lives in kgray.testing: actor-bound classes pickle
    # BY REFERENCE, and pytest test modules are not importable on workers
    from kgray.testing import KillOnceBackend

    docs, gold, _ = generate_documents(24, seed=11)
    ds = ray.data.from_arrow(docs).repartition(2)

    res = run_kg_pipeline(
        ds, _cfg(KillOnceBackend(str(tmp_path / "killed.flag")))
    )
    e = _sorted_df(res.edges, ["doc_id", "span_seq", "stmt_seq", "subj"])
    assert os.path.exists(tmp_path / "killed.flag")  # the kill fired

    got = set(zip(e.doc_id, e.span_seq, e.subj, e.pred, e.obj))
    want = set(
        zip(*[gold.column(c).to_pylist()
              for c in ["doc_id", "span_seq", "subj", "pred", "obj"]])
    )
    assert got == want  # retried batch produced the exact gold triples


def test_driver_crash_after_partition_commits_resumes_exactly_once(
    tmp_path,
):
    from kgray.stages.chunk import explode_spans, filter_admitted
    from kgray.testing import MarkerBackend

    docs, gold, _ = generate_documents(24, seed=7)
    ds = ray.data.from_arrow(docs)
    ckpt = str(tmp_path / "ckpt")

    committed = {0, 1}
    doc_ids = docs.column("doc_id").to_pylist()
    first_wave = [d for d in doc_ids
                  if partition_of(d, N_PARTS) in committed]
    assert first_wave and len(first_wave) < len(doc_ids)

    # ---- run 1: the "crashed" driver — it completed partitions {0,1}
    # and died while writing partition 2 (garbage data dir, no manifest)
    def first_wave_only(batch: pa.Table) -> pa.Table:
        # arrow-level filter: a row-based ds.filter would round-trip the
        # spans struct through Python and widen its int32 offsets
        keep = [partition_of(d, N_PARTS) in committed
                for d in batch.column("doc_id").to_pylist()]
        return batch.filter(pa.array(keep, pa.bool_()))

    ds1 = ds.map_batches(first_wave_only, batch_format="pyarrow")
    m1 = str(tmp_path / "m1")
    run_checkpointed_kg(ds1, ckpt, num_partitions=N_PARTS,
                        cfg=_cfg(MarkerBackend(m1)))
    st = load_state(ckpt, N_PARTS)
    assert st.completed == committed
    garbage = st.partition_data_dir(2)
    os.makedirs(garbage)
    with open(os.path.join(garbage, "part-crashed.parquet"), "w") as f:
        f.write("torn write")

    # snapshot the committed manifests: bytes + mtime prove run 2 never
    # rewrites them (exactly one attempt per completed partition)
    def snap(pid):
        p = st.manifest_path(pid)
        with open(p, "rb") as f:
            return f.read(), os.stat(p).st_mtime_ns

    before = {pid: snap(pid) for pid in committed}

    # ---- run 2: restarted driver over the FULL corpus
    m2 = str(tmp_path / "m2")
    res2, graphs2 = run_checkpointed_kg(
        ds, ckpt, num_partitions=N_PARTS, cfg=_cfg(MarkerBackend(m2))
    )

    # extraction scope: exactly the admitted spans of partitions {2,3} —
    # no re-extraction of committed work, no skipped pending work
    def pid_col(batch: pa.Table) -> pa.Table:
        pids = [partition_of(d, N_PARTS)
                for d in batch.column("doc_id").to_pylist()]
        return batch.append_column(
            "pid", pa.array(pids, pa.int32())
        )

    spans = (
        ds.map_batches(explode_spans, batch_format="pyarrow")
        .map_batches(filter_admitted, batch_format="pyarrow")
        .map_batches(pid_col, batch_format="pyarrow")
        .to_pandas()
    )
    expected = int((~spans.pid.isin(list(committed))).sum())
    extracted = sum(
        int(open(os.path.join(m2, f)).read()) for f in os.listdir(m2)
    )
    assert extracted == expected

    # completed manifests untouched: same bytes, same mtime
    for pid in committed:
        assert snap(pid) == before[pid], f"partition {pid} re-attempted"
    # the torn partition recovered: garbage gone, manifest complete
    man2 = json.load(open(st.manifest_path(2)))
    assert man2["status"] == "complete"
    assert not os.path.exists(os.path.join(garbage,
                                           "part-crashed.parquet"))

    # final tables identical to a never-crashed run, and gold-exact
    fresh = run_kg_pipeline(ds, _cfg())
    for a, b, keys in [
        (res2.edges, fresh.edges,
         ["doc_id", "span_seq", "stmt_seq", "subj"]),
        (res2.nodes, fresh.nodes, ["node_id"]),
    ]:
        pd.testing.assert_frame_equal(_sorted_df(a, keys),
                                      _sorted_df(b, keys))
    e2 = _sorted_df(res2.edges, ["doc_id", "span_seq", "stmt_seq", "subj"])
    got = set(zip(e2.doc_id, e2.span_seq, e2.subj, e2.pred, e2.obj))
    want = set(
        zip(*[gold.column(c).to_pylist()
              for c in ["doc_id", "span_seq", "subj", "pred", "obj"]])
    )
    assert got == want
    # every doc that produced an edge has its CX2 graph row
    g2 = _sorted_df(graphs2, ["doc_id"])
    assert set(e2.doc_id) <= set(g2.doc_id)
