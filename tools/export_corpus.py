"""Training-corpus export job entry point.

    ray job submit --working-dir . -- \
        python tools/export_corpus.py --sf-dir /data/sf \
            --output /out/train [--seq-len 2048] [--partitions 64] \
            [--min-tokens 20] [--num-cpus N]

clean (fused quality filter + exact dedup) -> sequence-pack
(distributed prefix sum) -> partitioned parquet with _SUCCESS markers.
Re-submitting after a failure skips finished partitions (the export is
pre-shuffle-pruned, so only missing key ranges recompute their
shuffle).  Owns its Ray session; prints one JSON summary line last.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--seq-len", type=int, default=2048)
    ap.add_argument("--partitions", type=int, default=64,
                    help="key-range count; size to ~input_bytes/256MiB, "
                         "not CPU count")
    ap.add_argument("--min-tokens", type=int, default=20)
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local-mode CPU count (omit on a real cluster)")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    try:
        from orionbelt_ontology_builder_ray.pipelines.export import (
            export_training_corpus)
        from orionbelt_ontology_builder_ray.pipelines.queries import _read

        t0 = time.time()
        report = export_training_corpus(
            _read(args.sf_dir, "documents", columns=["doc_id", "text"]),
            args.output, seq_len=args.seq_len,
            num_partitions=args.partitions, min_tokens=args.min_tokens)
        report["wall_sec"] = round(time.time() - t0, 3)
        print(json.dumps(report))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
