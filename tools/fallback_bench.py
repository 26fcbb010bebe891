"""Forced-fallback bench (VERDICT r4 item 7).

Measures the STREAMED above-cap paths — the 100-TB shapes — against
the default broadcast paths on the same sf0.1 input, so the fallbacks
carry a measured number, not just cap=0 equality tests:

- ``verified_near_dup_edges`` (minhash clusters' verify stage) with
  ``broadcast_id_cap=0`` → bucket-hash semi-join of shingle sets.
- ``ngram_jaccard_pairs`` with ``broadcast_id_cap=0`` → same streamed
  semi-join on the verify payload; plus a ``df_cap=64`` run showing
  the hot-shingle guard's effect (NOTE: df_cap intentionally CHANGES
  the candidate set — the pair count is printed alongside).
- ``simhash_near_dup_pairs`` with ``broadcast_id_cap=0``.

Prints one JSON line; results recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    os.environ.setdefault("RAY_DEFAULT_OBJECT_STORE_MEMORY_PROPORTION",
                          "0.5")
    import ray

    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from orionbelt_ontology_builder_ray.pipelines.queries import _read
    from orionbelt_ontology_builder_ray.stages.dedup import (
        ngram_jaccard_pairs, simhash_near_dup_pairs,
        verified_near_dup_edges)

    docs = _read(SF_DIR, "documents",
                 columns=["doc_id", "text"]).materialize()
    out: dict = {"metric": "fallback_bench", "sf": SF_DIR,
                 "n_docs": docs.count()}

    def timed(name, fn):
        t0 = time.time()
        n = fn().count()
        out[f"{name}_sec"] = round(time.time() - t0, 3)
        out[f"{name}_rows"] = n

    timed("minhash_verify_broadcast",
          lambda: verified_near_dup_edges(docs))
    timed("minhash_verify_semijoin",
          lambda: verified_near_dup_edges(docs, broadcast_id_cap=0))
    timed("jaccard_broadcast", lambda: ngram_jaccard_pairs(docs))
    timed("jaccard_semijoin",
          lambda: ngram_jaccard_pairs(docs, broadcast_id_cap=0))
    timed("jaccard_dfcap64", lambda: ngram_jaccard_pairs(docs, df_cap=64))
    timed("simhash_broadcast",
          lambda: simhash_near_dup_pairs(docs, hash_mode="fast"))
    timed("simhash_semijoin",
          lambda: simhash_near_dup_pairs(docs, hash_mode="fast",
                                         broadcast_id_cap=0))
    for base in ("minhash_verify", "jaccard", "simhash"):
        out[f"{base}_semijoin_vs_broadcast"] = round(
            out[f"{base}_semijoin_sec"] / out[f"{base}_broadcast_sec"], 3)
    ray.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
