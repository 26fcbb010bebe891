"""Per-stage Parquet checkpoints with lineage + metrics manifests.

The data-plane analog of the reference's undo snapshots
(ontology_manager.py:2400-2408, 2904-2963): each completed stage
writes a versioned snapshot directory

    <ckpt_dir>/<stage>/data/*.parquet     (partitioned output)
    <ckpt_dir>/<stage>/manifest.json      (lineage + metrics)

A resumed run (same input fingerprint) skips completed stages by
reading the snapshot instead of recomputing — this is what makes a
``ray job submit`` run resumable mid-pipeline (north_rule).  Writes
are atomic: data lands in ``data.tmp`` and is renamed after the
manifest's row count is recorded.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Optional


def _manifest_path(ckpt_dir: str, stage: str) -> str:
    return os.path.join(ckpt_dir, stage, "manifest.json")


def _data_path(ckpt_dir: str, stage: str) -> str:
    return os.path.join(ckpt_dir, stage, "data")


def stage_complete(ckpt_dir: Optional[str], stage: str,
                   input_fingerprint: str) -> bool:
    if not ckpt_dir:
        return False
    try:
        with open(_manifest_path(ckpt_dir, stage)) as f:
            manifest = json.load(f)
        return (manifest.get("complete") is True
                and manifest.get("input_fingerprint") == input_fingerprint)
    except (OSError, json.JSONDecodeError):
        return False


def load_stage(ckpt_dir: str, stage: str):
    import ray.data as rd

    return rd.read_parquet(_data_path(ckpt_dir, stage))


def save_stage(ckpt_dir: str, stage: str, ds, input_fingerprint: str,
               metrics: Optional[dict] = None):
    """Write ds to the stage snapshot atomically; returns a re-read
    Dataset (so downstream stages consume the checkpoint, not the
    upstream lineage)."""
    stage_dir = os.path.join(ckpt_dir, stage)
    tmp = os.path.join(stage_dir, "data.tmp")
    final = _data_path(ckpt_dir, stage)
    shutil.rmtree(stage_dir, ignore_errors=True)
    os.makedirs(stage_dir, exist_ok=True)
    ds.write_parquet(tmp)
    rows = sum(1 for _ in ())  # filled from parquet metadata below
    import pyarrow.parquet as pq
    import pyarrow.dataset as pads

    rows = pads.dataset(tmp).count_rows()
    os.rename(tmp, final)
    manifest = {
        "stage": stage,
        "complete": True,
        "input_fingerprint": input_fingerprint,
        "rows": rows,
        "written_at": time.time(),
        "metrics": metrics or {},
    }
    with open(_manifest_path(ckpt_dir, stage), "w") as f:
        json.dump(manifest, f, indent=2)
    return load_stage(ckpt_dir, stage)


def read_manifest(ckpt_dir: str, stage: str) -> Optional[dict]:
    try:
        with open(_manifest_path(ckpt_dir, stage)) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None
