"""Kill-resume fault drill on the flagship (VERDICT r4 item 8).

Spawns a real ``build_kg`` run (own Ray session, per-stage checkpoints)
in a child process group, SIGKILLs the whole group the moment the
extract_link stage manifest lands (i.e. mid-pipeline, dedup in flight
or about to start), then resumes from the stage manifests in a fresh
session and verifies the resumed output matches an uninterrupted run.

Prints one JSON line:
  {"metric": "fault_drill", "killed_after_sec": ..., "stages_at_kill":
   [...], "resume_sec": ..., "fresh_sec": ..., "rows_match": true}

Results recorded in BASELINE.md ("fault drill").
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
CKPT = "/tmp/fault_drill_ckpt"
CHILD = f"""
import sys; sys.path.insert(0, {REPO!r})
import ray
ray.init(address="local", num_cpus=16, include_dashboard=False,
         logging_level="ERROR")
from orionbelt_ontology_builder_ray.pipelines.kg_build import build_kg
build_kg({SF_DIR!r}, ckpt_dir={CKPT!r}, final_sort=False).count()
ray.shutdown()
"""


def _stages() -> list:
    from orionbelt_ontology_builder_ray.pipelines import checkpoint as ckpt

    return [s for s in ("extract_link", "canonical", "dedup")
            if (ckpt.read_manifest(CKPT, s) or {}).get("complete")]


def main() -> None:
    import shutil

    shutil.rmtree(CKPT, ignore_errors=True)
    out: dict = {"metric": "fault_drill", "sf": SF_DIR}

    # ---- phase 1: run + SIGKILL the whole process group mid-pipeline
    t0 = time.time()
    child = subprocess.Popen([sys.executable, "-c", CHILD],
                             start_new_session=True,
                             stdout=subprocess.DEVNULL,
                             stderr=subprocess.DEVNULL)
    manifest = os.path.join(CKPT, "extract_link", "manifest.json")
    while child.poll() is None and not os.path.exists(manifest):
        time.sleep(0.05)
    # extract_link landed (or the child finished first on tiny inputs)
    if child.poll() is None:
        os.killpg(os.getpgid(child.pid), signal.SIGKILL)
        child.wait()
        out["killed"] = True
    else:
        out["killed"] = False  # finished before the kill window
    out["killed_after_sec"] = round(time.time() - t0, 3)
    out["stages_at_kill"] = _stages()

    # ---- phase 2: resume in a fresh session
    os.environ.setdefault("RAY_DEFAULT_OBJECT_STORE_MEMORY_PROPORTION",
                          "0.5")
    import ray

    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from orionbelt_ontology_builder_ray.pipelines import checkpoint as ckpt
    from orionbelt_ontology_builder_ray.pipelines.kg_build import build_kg

    t0 = time.time()
    resumed_rows = build_kg(SF_DIR, ckpt_dir=CKPT,
                            final_sort=False).count()
    out["resume_sec"] = round(time.time() - t0, 3)
    out["stages_after_resume"] = _stages()

    # ---- phase 3: uninterrupted reference run (no checkpoints)
    t0 = time.time()
    fresh_rows = build_kg(SF_DIR, final_sort=False).count()
    out["fresh_sec"] = round(time.time() - t0, 3)
    out["rows_match"] = bool(resumed_rows == fresh_rows)
    out["rows"] = int(fresh_rows)
    dm = ckpt.read_manifest(CKPT, "dedup") or {}
    out["dedup_manifest_rows"] = dm.get("rows")
    ray.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
