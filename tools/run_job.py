"""Flagship KG-construction job entry point.

This is the script a cluster operator submits:

    ray job submit --working-dir . -- \
        python tools/run_job.py --sf-dir /data/sf --ckpt-dir /ckpt \
            --output /out/triples [--transcripts /data/transcripts] \
            [--partition-buckets 64] [--resume]

It owns its Ray session (standalone script — the driver-contract
``__ray_entry__`` path never calls ray.init).  Checkpoints land under
``--ckpt-dir`` with lineage manifests; re-submitting the same command
after a failure resumes after the last complete stage.  Exit code 0 on
success; a JSON summary (rows, wall, stage manifests) prints last.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", required=True,
                    help="testdata dir (alias dictionary + derivation source)")
    ap.add_argument("--transcripts", default=None,
                    help="transcripts parquet path/dir (default: derive "
                         "from <sf-dir>/events.parquet)")
    ap.add_argument("--ckpt-dir", default=None,
                    help="checkpoint dir (enables resume)")
    ap.add_argument("--output", required=True, help="output parquet dir")
    ap.add_argument("--partition-buckets", type=int, default=None,
                    help="hash(subject) hive partitioning (no global sort)")
    ap.add_argument("--sort", action="store_true",
                    help="globally sort (subject,predicate,object) instead")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local-mode CPU count (omit on a real cluster)")
    ap.add_argument("--emit-ts", action="store_true", default=True)
    ap.add_argument("--canonicalize", action="store_true",
                    help="enable the label-merge canonicalization stage")
    ap.add_argument("--update-from", default=None, metavar="EXISTING",
                    help="incremental ingest: anti-join the new "
                         "triples against this existing triples store "
                         "and write ONLY the additions to --output")
    ap.add_argument("--store-hashes", action="store_true",
                    help="persist the 128-bit content-hash pair as "
                         "_h1/_h2 store columns (16 B/row) so later "
                         "--update-from probes read the pruned hash "
                         "columns instead of re-hashing the payload")
    ap.add_argument("--dict-columns", action="store_true",
                    help="keep the low-cardinality triple columns "
                         "dictionary-encoded in flight (less memory "
                         "traffic; wins when bandwidth-bound — see "
                         "BASELINE.md; needs the default scoped/"
                         "partitioned configuration)")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        init_kwargs = dict(include_dashboard=False, logging_level="ERROR")
        if args.num_cpus:
            init_kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**init_kwargs)

    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from orionbelt_ontology_builder_ray.pipelines import checkpoint as ckpt
    from orionbelt_ontology_builder_ray.pipelines.kg_build import build_kg

    t0 = time.time()
    if args.update_from:
        from orionbelt_ontology_builder_ray.pipelines.kg_build import update_kg

        update_kg(args.update_from,
                  sf_dir=args.sf_dir,
                  transcripts_path=args.transcripts,
                  output_path=args.output,
                  emit_ts=args.emit_ts,
                  canonicalize_labels=args.canonicalize)
    else:
        build_kg(
            args.sf_dir,
            transcripts_path=args.transcripts,
            emit_ts=args.emit_ts,
            canonicalize_labels=args.canonicalize,
            dedup_strategy="scoped" if not args.canonicalize else "broadcast",
            ckpt_dir=args.ckpt_dir,
            final_sort=args.sort,
            partition_buckets=(args.partition_buckets
                               if not args.sort else None),
            output_path=args.output,
            store_hashes=args.store_hashes,
            dict_columns=args.dict_columns,
        )
    wall = time.time() - t0

    import os

    import pyarrow.dataset as pads

    if not os.path.exists(args.output):
        rows = 0  # an incremental run with zero additions writes nothing
    else:
        rows = pads.dataset(args.output,
                            partitioning="hive" if args.partition_buckets
                            and not args.update_from else None).count_rows()
    manifests = {}
    if args.ckpt_dir:
        for stage in ("extract_link", "canonical", "dedup"):
            m = ckpt.read_manifest(args.ckpt_dir, stage)
            if m:
                manifests[stage] = {"rows": m["rows"],
                                    "complete": m["complete"]}
    ray.shutdown()
    print(json.dumps({"status": "ok", "triples": rows,
                      "wall_sec": round(wall, 2),
                      "triples_per_sec": round(rows / wall, 1),
                      "stages": manifests}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
