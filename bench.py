"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, ...}

``--scaling`` runs the headline pipeline in two fresh processes
(num_cpus=8 and 32) on the same input and reports both throughputs and
the scaling efficiency (BASELINE.md north-rule evidence).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _warm_cache():
    for name in ("events", "nation", "region", "documents", "embeddings"):
        path = f"{SF_DIR}/{name}.parquet"
        if os.path.exists(path):
            with open(path, "rb") as f:
                while f.read(1 << 24):
                    pass


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from orionbelt_ontology_builder_ray.pipelines.kg_build import build_kg
    from orionbelt_ontology_builder_ray.pipelines import queries as q

    _warm_cache()
    queries: dict[str, float] = {}
    out_dir = "/tmp/bench_kg_out"
    shutil.rmtree(out_dir, ignore_errors=True)

    # headline: flagship KG pipeline end-to-end (extract -> link ->
    # dedup -> sort -> partitioned parquet)
    t0 = time.time()
    ds = build_kg(SF_DIR, final_sort=True,
                  extract_concurrency=(1, NUM_CPUS),
                  link_concurrency=(1, NUM_CPUS),
                  dedup_buckets=max(16, NUM_CPUS * 2),
                  output_path=out_dir)
    headline = time.time() - t0
    queries["kg_build"] = round(headline, 3)

    import pyarrow.dataset as pads

    n_triples = pads.dataset(out_dir).count_rows()

    t0 = time.time()
    q.doc_token_counts(SF_DIR).count()
    queries["doc_token_counts"] = round(time.time() - t0, 3)

    t0 = time.time()
    q.doc_dedup_exact(SF_DIR).count()
    queries["doc_dedup_exact"] = round(time.time() - t0, 3)

    t0 = time.time()
    from orionbelt_ontology_builder_ray.stages.dedup import minhash_candidate_pairs
    import ray.data as rd

    docs = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"])
    minhash_candidate_pairs(docs).count()
    queries["doc_minhash_pairs"] = round(time.time() - t0, 3)

    t0 = time.time()
    q.ann_topk_query(SF_DIR)
    queries["ann_topk"] = round(time.time() - t0, 3)

    t0 = time.time()
    q.events_hourly(SF_DIR).count()
    queries["events_hourly"] = round(time.time() - t0, 3)

    ray.shutdown()
    return {
        "metric": "kg_build_e2e",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "triples": n_triples,
        "triples_per_sec": round(n_triples / headline, 1),
    }


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    eff = (lo["value"] / hi["value"]) / (32 / 8)
    return {
        "metric": "kg_build_scaling",
        "sec_8": lo["value"],
        "sec_32": hi["value"],
        "triples_per_sec_8": lo["triples_per_sec"],
        "triples_per_sec_32": hi["triples_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    result = run_scaling() if "--scaling" in sys.argv else run_bench()
    print(json.dumps(result))
