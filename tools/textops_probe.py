"""Scale probe for the round-5 tokenizer/LM/rewrite family: 100k
synthetic docs (deterministic RNG, ~60 tokens each, 5% planted
duplicate spans), 32 CPUs.  Measures wall time for strip_dup_spans,
bpe_train, lm+dsir scoring and global_rank_buckets at 20x the sf0.1
corpus — the shape evidence BASELINE.md records for every op family.

Usage: python tools/textops_probe.py [n_docs]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import pandas as pd


def synth_docs(n: int, seed: int = 42) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    vocab = np.array([f"w{i:04d}" for i in range(5000)], dtype=object)
    texts = []
    dup_span = " ".join(vocab[rng.randint(0, 5000, 12)])
    for i in range(n):
        toks = list(vocab[rng.randint(0, 5000, 60)])
        if rng.rand() < 0.05:  # plant a shared span
            pos = rng.randint(0, 48)
            texts.append(" ".join(toks[:pos]) + " " + dup_span + " "
                         + " ".join(toks[pos:]))
        else:
            texts.append(" ".join(toks))
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    from orionbelt_ontology_builder_ray.stages.bpe import bpe_encode, bpe_train
    from orionbelt_ontology_builder_ray.stages.pack import global_rank_buckets
    from orionbelt_ontology_builder_ray.stages.scrub import strip_dup_spans
    from orionbelt_ontology_builder_ray.stages.textops import (
        corpus_bigram_lm, dsir_scores, lm_perplexity_scores)

    df = synth_docs(n)
    ds = rd.from_pandas(df).repartition(64).materialize()
    out = {"n_docs": n}

    t0 = time.time()
    kept = strip_dup_spans(ds, k=3).count()
    out["strip_dup_spans_sec"] = round(time.time() - t0, 2)
    assert kept == n

    t0 = time.time()
    merges, ops = bpe_train(ds, num_merges=8, with_ops=True)
    out["bpe_train8_sec"] = round(time.time() - t0, 2)
    out["bpe_top_merge"] = f"{merges.iloc[0]['left']}+{merges.iloc[0]['right']}"

    t0 = time.time()
    bpe_encode(ds, ops).count()
    out["bpe_encode_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    model = corpus_bigram_lm(ds)
    scores = lm_perplexity_scores(ds, model=model).materialize()
    out["lm_train_score_sec"] = round(time.time() - t0, 2)
    out["lm_model_rows"] = int(len(model[0]) + len(model[1]))

    t0 = time.time()

    def tmask(t):
        import pyarrow as pa

        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 5 == 0))

    dsir_scores(ds, ds.map_batches(tmask, batch_format="pyarrow"),
                source_model=model).count()
    out["dsir_score_sec"] = round(time.time() - t0, 2)

    t0 = time.time()

    def to_score(t):
        import pyarrow as pa

        s = np.round(t["avg_logp"].to_numpy(zero_copy_only=False) * 1e6) \
            .astype(np.int64)
        return pa.table({"doc_id": t["doc_id"],
                         "score_e6": pa.array(s)})

    global_rank_buckets(
        scores.map_batches(to_score, batch_format="pyarrow"),
        score_col="score_e6", n_buckets=3).count()
    out["rank_buckets_sec"] = round(time.time() - t0, 2)

    from orionbelt_ontology_builder_ray.stages.classifier import (
        quality_scores_lr, train_quality_classifier)

    t0 = time.time()

    def lab(t):
        import pyarrow as pa

        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.append_column("label",
                               pa.array((ids % 2).astype("int64")))

    labeled = ds.map_batches(lab, batch_format="pyarrow")
    w = train_quality_classifier(labeled, n_iter=10)
    out["lr_train10_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    quality_scores_lr(ds, w).count()
    out["lr_score_sec"] = round(time.time() - t0, 2)

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
