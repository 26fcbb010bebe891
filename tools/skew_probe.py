"""Skew dress rehearsal (VERDICT r4 item 6).

Two measured scenarios, each skewed-vs-uniform on identical row
counts, printing one JSON line with walls and ratios:

1. **Flagship under conversation + mention skew** — synthetic
   transcripts where ONE conversation holds 10% of all turns and ONE
   surface form accounts for 30% of all mentions (the north-rule
   "skewed conversations" case).  Runs the full build_kg (fused
   extract+link actor pool, scoped dedup, partitioned layout).  The
   scoped dedup's turn-subject fast path never groups by conversation
   and the non-scoped remainder is vocabulary-sized, so the skewed
   wall must stay within 1.5x of uniform.

2. **Canonicalize under hot-surface-form skew** — a triples table
   where 30% of all prefLabel rows normalize to ONE surface form
   (distinct entity URIs, case/punct variants).  Exercises the salted
   (norm, salt(entity)) phase-1 groupby (stages/canonicalize.py): the
   hot key splits across num_salts groups and only per-salt
   representatives meet in phase 2, so group size is bounded and the
   skewed wall must stay within 1.5x of uniform.

Usage: python tools/skew_probe.py [n_turns] [n_entities]
Results are recorded in BASELINE.md ("skew dress rehearsal").
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def synth_transcripts(n_turns: int, skew: bool, out_dir: str) -> None:
    """Transcripts in the input_hint shape.  skew=True: turns
    0..n/10 all belong to conv-000000, and 30% of ALL turns mention
    nation 0 (one surface form); uniform: ~20-turn conversations,
    mentions round-robin over the 25 nations."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from orionbelt_ontology_builder_ray.sources.transcripts import (
        _nation_lookup)

    n_names, r_names = _nation_lookup(SF_DIR)
    i = np.arange(n_turns, dtype=np.int64)
    if skew:
        hot = n_turns // 10
        conv_num = np.where(i < hot, 0, 1 + (i - hot) // 20)
        nk = np.where(i % 10 < 3, 0, i % 25)  # 30% hot surface form
    else:
        conv_num = i // 20
        nk = i % 25
    # dense per-conversation turn_idx (synth is already conv-ordered)
    starts = np.flatnonzero(np.diff(conv_num, prepend=conv_num[0] - 1))
    turn_idx = (i - np.repeat(i[starts], np.diff(
        np.append(starts, n_turns)))).astype(np.int32)
    conv_id = pd.Series(conv_num).astype(str).str.zfill(6).radd("conv-")
    text = ("view event regarding [" + pd.Series(n_names[nk % 25])
            + "] in [" + pd.Series(r_names[nk % 25])
            + "] with props p" + pd.Series(i).astype(str))
    tbl = pa.table({
        "conv_id": pa.array(conv_id, pa.string()),
        "turn_idx": pa.array(turn_idx, pa.int32()),
        "role": pa.array(np.full(n_turns, "user"), pa.string()),
        "text": pa.array(text, pa.string()),
        "tool": pa.array(np.full(n_turns, ""), pa.string()),
        "ts": pa.array(
            pd.Timestamp("2026-01-01").value // 1000 + i * 1_000_000,
            pa.timestamp("us")),
    })
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(tbl, os.path.join(out_dir, "part.parquet"))


def synth_label_triples(n_entities: int, skew: bool):
    """Triples with prefLabel rows; skew=True: 30% of rows carry
    case/punct variants of ONE normalized surface form."""
    import ray.data as rd

    from orionbelt_ontology_builder_ray.functions.terms import (
        SKOS_PREF_LABEL)

    i = np.arange(n_entities, dtype=np.int64)
    if skew:
        hot = i % 10 < 3
        # distinct raw strings, one normalized form for the hot 30%
        labels = np.where(
            hot, pd.Series(i).astype(str).radd("Acme Corp !").to_numpy(),
            pd.Series(i).astype(str).radd("entity ").to_numpy())
        labels = np.where(
            hot, np.full(n_entities, "Acme Corp"), labels)
        # make hot raw labels VARY (case/punct) but normalize equal
        variants = np.array(["Acme Corp", "acme corp.", "ACME-CORP",
                             "acme_corp", "Acme  Corp"], dtype=object)
        labels = np.where(hot, variants[i % 5], labels)
    else:
        labels = pd.Series(i).astype(str).radd("entity ").to_numpy()
    df = pd.DataFrame({
        "subject": pd.Series(i).astype(str).radd("urn:e:"),
        "predicate": SKOS_PREF_LABEL,
        "object": labels,
        "object_kind": "literal",
        "lang": "",
        "datatype": "",
    })
    return rd.from_pandas(df).repartition(32)


def main() -> None:
    os.environ.setdefault("RAY_DEFAULT_OBJECT_STORE_MEMORY_PROPORTION",
                          "0.5")
    import ray

    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_entities = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from orionbelt_ontology_builder_ray.pipelines.kg_build import build_kg
    from orionbelt_ontology_builder_ray.stages.canonicalize import (
        canonicalize)

    out: dict = {"metric": "skew_probe", "n_turns": n_turns,
                 "n_entities": n_entities}

    # ---- scenario 1: flagship under conversation + mention skew
    walls = {}
    for label in ("uniform", "skewed"):
        tdir = f"/tmp/skew_probe_transcripts_{label}"
        shutil.rmtree(tdir, ignore_errors=True)
        synth_transcripts(n_turns, skew=label == "skewed", out_dir=tdir)
        kout = f"/dev/shm/skew_probe_kg_{label}"
        shutil.rmtree(kout, ignore_errors=True)
        t0 = time.time()
        build_kg(SF_DIR, transcripts_path=tdir, final_sort=False,
                 partition_buckets=16, dedup_strategy="scoped",
                 output_path=kout)
        walls[label] = round(time.time() - t0, 3)
        shutil.rmtree(kout, ignore_errors=True)
    out["kg_build_uniform_sec"] = walls["uniform"]
    out["kg_build_skewed_sec"] = walls["skewed"]
    out["kg_build_skew_ratio"] = round(walls["skewed"] / walls["uniform"], 3)

    # ---- scenario 2: canonicalize under hot-surface-form skew
    walls = {}
    merged = {}
    for label in ("uniform", "skewed"):
        ds = synth_label_triples(n_entities,
                                 skew=label == "skewed").materialize()
        t0 = time.time()
        _, mapping = canonicalize(ds, use_labels=True)
        walls[label] = round(time.time() - t0, 3)
        merged[label] = len(mapping)
    out["canonicalize_uniform_sec"] = walls["uniform"]
    out["canonicalize_skewed_sec"] = walls["skewed"]
    out["canonicalize_skew_ratio"] = round(
        walls["skewed"] / walls["uniform"], 3)
    # correctness: every hot variant merged (30% of entities - 1 rep)
    out["canonicalize_skewed_merged"] = merged["skewed"]
    out["canonicalize_expected_merged"] = int(
        (np.arange(n_entities) % 10 < 3).sum()) - 1
    ray.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
