"""Sequence packing (stages/pack.py pack_sequences).

Concat-and-chunk document -> training-sequence assignment via the
two-phase distributed prefix sum (no reference analog; graft
requirement: beyond-reference training-data ops)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from orionbelt_ontology_builder_ray.stages.pack import pack_sequences


def _docs(texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    return pd.DataFrame({"doc_id": np.array(ids, np.int64),
                         "text": texts})


def _brute(df, seq_len):
    """Reference semantics: global doc_id order, exclusive prefix sum."""
    df = df.sort_values("doc_id").reset_index(drop=True)
    n = df["text"].map(lambda t: len(t.split())).to_numpy(np.int64)
    off = np.concatenate([[0], n[:-1]]).cumsum()
    return pd.DataFrame({
        "doc_id": df["doc_id"].to_numpy(),
        "n_tokens": n,
        "token_offset": off,
        "seq_id": off // seq_len,
        "seq_id_last": (off + np.maximum(n - 1, 0)) // seq_len,
    })


def _run(df, seq_len, repartition=None):
    import ray.data as rd

    ds = rd.from_pandas(df)
    if repartition:
        ds = ds.repartition(repartition)
    out = pack_sequences(ds, seq_len=seq_len).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_pack_matches_brute_force(ray_session):
    rng = np.random.default_rng(7)
    texts = [" ".join(f"w{j}" for j in range(rng.integers(0, 40)))
             for _ in range(200)]
    df = _docs(texts)
    expected = _brute(df, seq_len=64)
    got = _run(df, seq_len=64)
    pd.testing.assert_frame_equal(got, expected, check_dtype=False)


def test_pack_partition_invariant(ray_session):
    rng = np.random.default_rng(11)
    texts = [" ".join("tok" for _ in range(rng.integers(1, 30)))
             for _ in range(120)]
    # shuffled input order AND different block structure must not
    # change the packing (global order is doc_id, not arrival order)
    df = _docs(texts).sample(frac=1, random_state=3)
    a = _run(df, seq_len=32, repartition=1)
    b = _run(df, seq_len=32, repartition=9)
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(
        a, _brute(df, 32), check_dtype=False)


def test_pack_boundary_crossing_and_empty_docs(ray_session):
    # doc 0: 5 tokens [0,5) -> seq 0 only; doc 1: 6 tokens [5,11)
    # crosses the seq_len=8 boundary -> first seq 0, last seq 1;
    # doc 2 empty: occupies no tokens, seq_id_last == seq_id
    df = _docs(["a b c d e", "f g h i j k", "", "x y"],
               ids=[0, 1, 2, 3])
    out = _run(df, seq_len=8)
    assert out["token_offset"].tolist() == [0, 5, 11, 11]
    assert out["seq_id"].tolist() == [0, 0, 1, 1]
    assert out["seq_id_last"].tolist() == [0, 1, 1, 1]
    assert out["n_tokens"].tolist() == [5, 6, 0, 2]


def test_pack_rejects_bad_seq_len(ray_session):
    import ray.data as rd

    with pytest.raises(ValueError):
        pack_sequences(rd.from_pandas(_docs(["a"])), seq_len=0)


def test_export_partitioned_resumable(ray_session, tmp_path):
    """Partitioned export skips finished partitions on re-run and
    redoes exactly the missing ones; the re-read equals the input."""
    import os

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from orionbelt_ontology_builder_ray.pipelines.export import (
        export_corpus_partitioned, read_exported)

    df = pd.DataFrame({
        "doc_id": np.arange(100, dtype=np.int64),
        "text": [f"doc {i}" for i in range(100)]})
    out = str(tmp_path / "corpus")
    r1 = export_corpus_partitioned(rd.from_pandas(df).repartition(5),
                                   out, num_partitions=8)
    assert r1["written"] == list(range(8)) and r1["skipped"] == []
    assert r1["rows_written"] == 100

    # idempotent: everything skipped, nothing rewritten
    mtimes = {p: os.path.getmtime(os.path.join(out, f"p={p}",
                                               "part.parquet"))
              for p in range(8)}
    r2 = export_corpus_partitioned(rd.from_pandas(df).repartition(5),
                                   out, num_partitions=8)
    assert r2["written"] == [] and r2["skipped"] == list(range(8))
    for p, m in mtimes.items():
        assert os.path.getmtime(
            os.path.join(out, f"p={p}", "part.parquet")) == m

    # kill two partitions (simulate mid-write death: marker gone)
    for p in (2, 5):
        os.remove(os.path.join(out, f"p={p}", "_SUCCESS"))
        os.remove(os.path.join(out, f"p={p}", "part.parquet"))
    r3 = export_corpus_partitioned(rd.from_pandas(df).repartition(5),
                                   out, num_partitions=8)
    assert r3["written"] == [2, 5]
    assert r3["rows_written"] == int((df["doc_id"] % 8).isin([2, 5]).sum())

    back = read_exported(out).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    # hive read surfaces the partition key as a column; body equality
    # is on the payload columns
    back = back.drop(columns=[c for c in back.columns
                              if c not in df.columns])
    pd.testing.assert_frame_equal(back, df, check_like=True)


def test_export_training_corpus_end_to_end(ray_session, tmp_path):
    """clean -> pack -> resumable export: survivors only, packed
    offsets contiguous in doc order, re-run writes nothing."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from orionbelt_ontology_builder_ray.pipelines.export import (
        export_training_corpus, read_exported)

    rng = np.random.RandomState(8)
    words = ["the", "and", "of", "to", "a", "in", "is", "it"]
    texts = [" ".join(rng.choice(words, 30)) for _ in range(40)]
    texts[5] = texts[4]          # exact dup: loses to min id
    texts[9] = "short"           # fails min_tokens
    df = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64),
                       "text": texts})
    out = str(tmp_path / "train")
    r1 = export_training_corpus(rd.from_pandas(df).repartition(4), out,
                                seq_len=64, num_partitions=4,
                                min_tokens=10)
    back = read_exported(out).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert 5 not in set(back["doc_id"]) and 9 not in set(back["doc_id"])
    assert 4 in set(back["doc_id"])
    # offsets are the exclusive prefix sum of n_tokens in doc order
    assert (back["token_offset"].to_numpy()
            == np.concatenate([[0], back["n_tokens"].cumsum()
                               .to_numpy()[:-1]])).all()
    assert (back["seq_id"].to_numpy()
            == back["token_offset"].to_numpy() // 64).all()
    assert r1["rows_written"] == len(back)

    r2 = export_training_corpus(rd.from_pandas(df).repartition(4), out,
                                seq_len=64, num_partitions=4,
                                min_tokens=10)
    assert r2["written"] == [] and len(r2["skipped"]) == 4


def test_export_random_partition_deaths_restore_equality(ray_session,
                                                         tmp_path):
    """Randomized crash simulation: delete arbitrary subsets of
    finished partitions (marker and/or data), re-run, and the re-read
    must equal the full input every time."""
    import os
    import shutil

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from orionbelt_ontology_builder_ray.pipelines.export import (
        export_corpus_partitioned, read_exported)

    rng = np.random.RandomState(17)
    df = pd.DataFrame({
        "doc_id": np.arange(120, dtype=np.int64),
        "text": [f"t{i}" for i in range(120)]})
    out = str(tmp_path / "x")
    export_corpus_partitioned(rd.from_pandas(df).repartition(6), out,
                              num_partitions=10)
    for _ in range(3):
        dead = rng.choice(10, rng.randint(1, 5), replace=False)
        for p in dead:
            pdir = os.path.join(out, f"p={p}")
            if rng.rand() < 0.5:
                shutil.rmtree(pdir)          # whole partition gone
            else:
                os.remove(os.path.join(pdir, "_SUCCESS"))  # marker only
        r = export_corpus_partitioned(rd.from_pandas(df).repartition(6),
                                      out, num_partitions=10)
        assert sorted(r["written"]) == sorted(int(p) for p in dead)
        back = read_exported(out).to_pandas()
        back = back[["doc_id", "text"]].sort_values("doc_id") \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(back, df)


def test_export_manifest_refuses_scheme_mismatch(ray_session, tmp_path):
    """Resume validation (ADVICE r4): a re-run with a different
    partition count or key column must be refused — stale p=k dirs
    keyed by the old scheme would otherwise silently count as
    finished.  Stray non-numeric p=* directories are ignored, not a
    crash."""
    import os

    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from orionbelt_ontology_builder_ray.pipelines.export import (
        export_corpus_partitioned)

    df = pd.DataFrame({"doc_id": np.arange(30, dtype=np.int64),
                       "text": [f"d{i}" for i in range(30)]})
    out = str(tmp_path / "c")
    export_corpus_partitioned(rd.from_pandas(df), out, num_partitions=4)

    with pytest.raises(ValueError, match="refusing to resume"):
        export_corpus_partitioned(rd.from_pandas(df), out,
                                  num_partitions=8)
    with pytest.raises(ValueError, match="refusing to resume"):
        export_corpus_partitioned(rd.from_pandas(df), out,
                                  key_col="text", num_partitions=4)

    # junk partition dir: ignored by the resume scan
    os.makedirs(os.path.join(out, "p=junk"))
    open(os.path.join(out, "p=junk", "_SUCCESS"), "w").close()
    r = export_corpus_partitioned(rd.from_pandas(df), out,
                                  num_partitions=4)
    assert r["written"] == [] and r["skipped"] == [0, 1, 2, 3]


def test_pack_precounted_equals_tokenized(ray_session):
    """pack_sequences(precounted=True) over a (doc_id, n_tokens) table
    must equal the text-tokenizing path on the same corpus."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.pack import pack_sequences

    rng = np.random.RandomState(5)
    df = pd.DataFrame({
        "doc_id": np.arange(50, dtype=np.int64),
        "text": [" ".join(["w"] * rng.randint(0, 9)) for _ in range(50)]})
    full = pack_sequences(rd.from_pandas(df).repartition(4), seq_len=16) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pre = pd.DataFrame({
        "doc_id": df["doc_id"],
        "n_tokens": df["text"].str.split().str.len().astype(np.int64),
        "extra": np.ones(50)})
    got = pack_sequences(rd.from_pandas(pre).repartition(4), seq_len=16,
                         precounted=True) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, full)


def test_global_rank_buckets_brute_force(ray_session):
    """Exact global ranks/buckets == a driver sort, with heavy score
    TIES (broken by id), partition-invariant, uneven bucket edges."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.pack import (
        global_rank_buckets)

    rng = np.random.RandomState(5)
    n = 257  # not divisible by 3: exercises the floor-division edges
    df = pd.DataFrame({
        "doc_id": rng.permutation(np.arange(n)).astype(np.int64),
        "score_e6": rng.randint(-4, 4, n).astype(np.int64)})  # ties
    exp = df.sort_values(["score_e6", "doc_id"]).reset_index(drop=True)
    exp["rank"] = np.arange(n, dtype=np.int64)
    exp["bucket"] = exp["rank"] * 3 // n
    for nparts in (1, 6):
        got = global_rank_buckets(
            rd.from_pandas(df).repartition(nparts),
            score_col="score_e6", n_buckets=3).to_pandas() \
            .sort_values("rank").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["doc_id", "score_e6", "rank", "bucket"]],
            exp[["doc_id", "score_e6", "rank", "bucket"]])
    # bucket sizes differ by at most one
    sizes = got.groupby("bucket").size()
    assert sizes.max() - sizes.min() <= 1 and len(sizes) == 3
