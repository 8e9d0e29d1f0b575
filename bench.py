"""Benchmark harness: headline KG pipeline + representative operator suite.

Prints ONE JSON line:
  {"metric": "kg_pipeline_sec", "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>, "num_cpus": N,
   "docs_per_sec": ...}

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1),
     RAY_GRAFT_CPUS (default 32).

``--scaling``: runs the headline pipeline in two fresh processes at 8 and
32 CPUs on the same input and reports throughputs + scaling efficiency
(the sandbox stand-in for N vs 4N cluster sizes).
"""
import json
import os
import shutil
import subprocess
import sys
import time


def run_bench() -> dict:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=ncpu,
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from kgray.pipelines.kg import run_kg_pipeline
    from kgray.sources.generic import (
        generic_documents_dataset,
        generic_kg_config,
    )

    # warm the OS page cache (untimed) so we measure compute+shuffle
    import pyarrow.parquet as pq

    for t in ["documents", "embeddings", "lineitem", "orders", "events"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            pq.read_table(p)

    n_docs = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows

    timings = {}

    # ---- headline: full KG pipeline with parquet sinks -------------------
    out_dir = "/tmp/kgray_bench_out"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    docs = generic_documents_dataset(sf_dir)
    res = run_kg_pipeline(docs, generic_kg_config())
    res.edges.write_parquet(os.path.join(out_dir, "edges"))
    res.nodes.write_parquet(os.path.join(out_dir, "nodes"))
    headline = time.time() - t0
    timings["kg_pipeline"] = round(headline, 3)

    # ---- representative operators ---------------------------------------
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    for name in [
        "dedup_exact",
        "minhash_near_dup",
        "simhash",
        "knn_cosine",
        "pricing_summary",
        "revenue_by_nation",
        "events_hourly",
        "events_sessions",
        "token_count",
        "text_quality",
    ]:
        t0 = time.time()
        out = qs[name](sf_dir)
        # consume to completion without driver materialization of big data
        if hasattr(out, "count"):
            out.count()
        timings[name] = round(time.time() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    return {
        "metric": "kg_pipeline_sec",
        "value": timings["kg_pipeline"],
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "num_cpus": ncpu,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / timings["kg_pipeline"], 2),
    }


def run_scaling() -> dict:
    """Same headline job at 8 and 32 CPUs in fresh processes."""
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo = one(lo)
    r_hi = one(hi)
    tput_lo = r_lo["n_docs"] / r_lo["value"]
    tput_hi = r_hi["n_docs"] / r_hi["value"]
    eff = (tput_hi / tput_lo) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": r_lo["value"],
        "sec_hi": r_hi["value"],
        "docs_per_sec_lo": round(tput_lo, 2),
        "docs_per_sec_hi": round(tput_hi, 2),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        result = run_bench()
        import ray

        ray.shutdown()
        print(json.dumps(result))
