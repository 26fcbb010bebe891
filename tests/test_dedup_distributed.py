"""Distributed near-dup closures (VERDICT r1 items 3+4): MinHash
clustering with join-based verify + min-label-propagation components,
and IVF-bucketed embedding near-dup — no whole-corpus driver
materialization in either path."""

import numpy as np
import pandas as pd
import pytest


def _near_dup_docs(n_groups=40, seed=0):
    rng = np.random.RandomState(seed)
    words = [f"w{i}" for i in range(200)]
    docs = []
    for i in range(n_groups):
        base = " ".join(rng.choice(words, 30))
        docs.append((i * 3, base))
        docs.append((i * 3 + 1, base + " extra token"))
        docs.append((i * 3 + 2, " ".join(rng.choice(words, 30))))
    return pd.DataFrame(docs, columns=["doc_id", "text"])


def test_minhash_clusters_distributed_equals_driver(ray_session):
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.dedup import (
        _minhash_clusters_driver_reference, minhash_dedup_clusters,
    )

    ds = rd.from_pandas(_near_dup_docs()).repartition(5)  # >1 block
    dist = minhash_dedup_clusters(ds)
    ref = _minhash_clusters_driver_reference(ds)
    assert dist == ref
    assert sum(1 for i, c in dist if i != c) >= 30  # real merges happened


def test_minhash_clusters_transitive_chain(ray_session):
    """A~B and B~C near-dups must land in ONE component even when A~C
    alone is under threshold (exercises >1 propagation round)."""
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.dedup import (
        minhash_dedup_clusters,
    )

    base = " ".join(f"tok{i}" for i in range(40))
    mid = " ".join(f"tok{i}" for i in range(4, 44))
    far = " ".join(f"tok{i}" for i in range(8, 48))
    df = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                       "text": [base, mid, far, "unrelated one two"]})
    out = dict(minhash_dedup_clusters(rd.from_pandas(df).repartition(3),
                                      threshold=0.7))
    assert out[1] == out[2] == out[3] == 1
    assert out[4] == 4


@pytest.mark.parametrize("single_task_limit", [0, 1_000_000])
def test_label_propagation_components(ray_session, single_task_limit):
    """limit=0 forces the iterative Ray-Data propagation loop; the
    large limit takes the single-remote-task union-find — identical
    components either way."""
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.dedup import (
        _propagate_min_labels,
    )

    edges = pd.DataFrame({"id_a": [10, 20, 30, 50],
                          "id_b": [20, 30, 40, 60]})
    labels = _propagate_min_labels(rd.from_pandas(edges).repartition(2),
                                   single_task_limit=single_task_limit)
    got = dict(zip(labels["node"].astype(int), labels["label"].astype(int)))
    assert got == {10: 10, 20: 10, 30: 10, 40: 10, 50: 50, 60: 50}


def _clustered_vectors(n_centers=8, per=25, dim=16, seed=1):
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_centers, dim) * 4
    rows = []
    vid = 0
    for c in centers:
        for _ in range(per):
            rows.append((vid, (c + rng.randn(dim) * 0.01).astype(np.float64)))
            vid += 1
    return pd.DataFrame(rows, columns=["vec_id", "embedding"])


def test_embedding_near_dup_bucketed_matches_exact(ray_session):
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.dedup import (
        _embedding_near_dup_bucketed, embedding_near_dup_pairs,
    )

    df = _clustered_vectors()
    ds = rd.from_pandas(df).repartition(4)
    exact = embedding_near_dup_pairs(ds, threshold=0.999).to_pandas()
    bucketed = _embedding_near_dup_bucketed(
        ds, len(df), 0.999, "vec_id", "embedding",
        n_centroids=16, probes=2).to_pandas()
    se = set(zip(exact["id_a"], exact["id_b"]))
    sb = set(zip(bucketed["id_a"], bucketed["id_b"]))
    assert sb <= se  # no false pairs: per-bucket comparison is exact
    assert len(se & sb) / max(1, len(se)) >= 0.95  # multi-probe recall


def test_embedding_near_dup_cap_selects_bucketed(ray_session):
    """Above the broadcast cap the bucketed path runs (and still only
    emits true pairs)."""
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.dedup import (
        embedding_near_dup_pairs,
    )

    df = _clustered_vectors(n_centers=4, per=10)
    ds = rd.from_pandas(df).repartition(2)
    out = embedding_near_dup_pairs(ds, threshold=0.999,
                                   max_broadcast_rows=10).to_pandas()
    assert len(out) > 0
    assert (out["id_a"] < out["id_b"]).all()
    assert (out["cosine"] >= 0.999).all()
    assert not out.duplicated(["id_a", "id_b"]).any()


def test_corpus_clean_composite(ray_session):
    """Quality+lang filter then dedup: short docs, non-English docs,
    repetitive docs, and exact duplicates all drop; min id survives."""
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.textops import clean_corpus

    base = ("the quick brown fox jumps over a lazy dog and then it ran "
            "to the hills you see that is life")  # 21 tokens, english
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            base,                      # keeps
            base,                      # exact duplicate -> dropped
            "too short",               # < min_tokens
            "der die das und ist nicht ein mit zu der die das und ist "
            "nicht ein mit zu der die das",   # german
            ("spam " * 25).strip(),    # distinct ratio 1/25 < 0.2
        ],
    })
    out = clean_corpus(rd.from_pandas(df).repartition(2)).to_pandas()
    assert set(map(tuple, out.to_numpy())) == {(1, 21)}


def test_minhash_clusters_md5_mode_equals_driver(ray_session):
    """md5 hash mode (the DuckDB-oracle-checkable primitive) runs the
    same topology and matches the md5-mode driver reference; the
    dataset-returning assign_clusters path feeds both."""
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.dedup import (
        _minhash_clusters_driver_reference, minhash_dedup_clusters,
    )

    ds = rd.from_pandas(_near_dup_docs(n_groups=12)).repartition(4)
    dist = minhash_dedup_clusters(ds, hash_mode="md5")
    ref = _minhash_clusters_driver_reference(ds, hash_mode="md5")
    assert dist == ref
    assert sum(1 for i, c in dist if i != c) >= 8


def test_assign_clusters_dataset_path(ray_session):
    """assign_clusters returns a streaming Dataset with the broadcast
    mapping applied; unmapped ids are their own cluster."""
    import pandas as pd
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.dedup import assign_clusters

    corpus = rd.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2, 3, 7, 9]})).repartition(3)
    labels = pd.DataFrame({"node": [3, 2, 9], "label": [1, 1, 9]})
    out = assign_clusters(corpus, labels).to_pandas()
    got = dict(zip(out["doc_id"].astype(int), out["cluster"].astype(int)))
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 9: 9}


def test_stratified_sampler_deterministic_and_partition_invariant():
    """Hash-based sampling is a pure row function: the kept set is
    identical across repeated calls and across any batch split, rates
    bind per stratum, and rate 0/1 are exact."""
    import pandas as pd

    from orionbelt_ontology_builder_ray.stages.textops import StratifiedSampler

    df = pd.DataFrame({
        "doc_id": range(2000),
        "pred_lang": ["en", "fr", "unknown", "de"] * 500,
    })
    s = StratifiedSampler({"en": 0.5, "fr": 0.0, "unknown": 1.0},
                          default_rate=0.1)
    kept = s(df)
    # deterministic: same frame, same result; partition-invariant:
    # concatenated per-row calls equal the single-batch call
    assert s(df).equals(kept)
    parts = pd.concat([s(df.iloc[:777]), s(df.iloc[777:])])
    assert parts.equals(kept)
    by = kept.groupby("pred_lang").size()
    assert by.get("fr", 0) == 0                   # rate 0: nothing
    assert by["unknown"] == 500                   # rate 1: everything
    assert 150 < by["en"] < 350                   # ~0.5 of 500
    assert 10 < by.get("de", 0) < 120             # default 0.1 of 500
    # fast mode also deterministic (different sample, same machinery)
    f = StratifiedSampler({"en": 0.5}, default_rate=0.1,
                          hash_mode="fast")
    assert f(df).equals(f(df))


def test_stratified_sampler_nested_samples():
    """Hash-keyed sampling is threshold-monotone: raising a stratum's
    rate only ADDS rows (kept(r1) ⊆ kept(r2) for r1 <= r2) — a sample
    can be grown without resampling, across both hash modes."""
    import pandas as pd

    from orionbelt_ontology_builder_ray.stages.textops import StratifiedSampler

    df = pd.DataFrame({"doc_id": range(5000), "pred_lang": ["en"] * 5000})
    for mode in ("md5", "fast"):
        prev: set = set()
        for rate in (0.05, 0.2, 0.5, 0.9, 1.0):
            kept = set(StratifiedSampler({"en": rate}, hash_mode=mode)(df)
                       ["doc_id"])
            assert prev <= kept, (mode, rate)
            prev = kept
        assert len(prev) == 5000  # rate 1.0 keeps everything


def test_corpus_split_disjoint_exhaustive(ray_session):
    """corpus_split assigns EVERY doc to EXACTLY ONE split (disjoint +
    exhaustive by construction), fractions land near 80/10/10, the
    assignment is partition-invariant (1 block == 7 blocks), and the
    Ray-side md5 residue rule matches a per-row python replay."""
    import hashlib

    import pandas as pd
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.textops import corpus_split

    ids = list(range(3000))
    df = pd.DataFrame({"doc_id": ids})

    out = corpus_split(rd.from_pandas(df)).to_pandas()
    assert len(out) == 3000
    assert out["doc_id"].is_unique
    by = out.groupby("split").size()
    assert set(by.index) == {"train", "val", "test"}
    assert 2200 < by["train"] < 2600          # ~0.8 of 3000
    assert 200 < by["val"] < 400              # ~0.1
    assert 200 < by["test"] < 400             # ~0.1

    # partition invariance: 7 blocks give the identical assignment
    out7 = corpus_split(
        rd.from_pandas(df).repartition(7)).to_pandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out7.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)

    # per-row replay of the contract: md5 low64 >> 1 mod 100
    m = dict(zip(out["doc_id"], out["split"]))
    for i in (0, 1, 17, 999, 2999):
        h = int.from_bytes(
            hashlib.md5(str(i).encode()).digest()[:8], "big")
        u = (h >> 1) % 100
        want = "train" if u < 80 else ("val" if u < 90 else "test")
        assert m[i] == want, i


def test_corpus_split_custom_fractions_and_fast_mode(ray_session):
    """Integer fractions bind exactly (denominator = their sum);
    fast hash mode is deterministic and still disjoint+exhaustive."""
    import pandas as pd
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.textops import corpus_split

    df = pd.DataFrame({"doc_id": [f"d{i}" for i in range(1000)]})
    ds = rd.from_pandas(df)
    out = corpus_split(ds, fractions=(("a", 1), ("b", 3)),
                       hash_mode="fast").to_pandas()
    assert len(out) == 1000 and out["doc_id"].is_unique
    by = out.groupby("split").size()
    assert 150 < by["a"] < 350                # ~1/4
    assert by["a"] + by["b"] == 1000
    out2 = corpus_split(ds, fractions=(("a", 1), ("b", 3)),
                        hash_mode="fast").to_pandas()
    assert out.sort_values("doc_id").reset_index(drop=True).equals(
        out2.sort_values("doc_id").reset_index(drop=True))


def test_embedding_dedup_clusters_planted(ray_session):
    """Planted embedding clusters close transitively: a ~ b and b ~ c
    (a !~ c directly) land in one cluster labeled min id; isolated
    vectors are singletons."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.dedup import (
        _propagate_min_labels, assign_clusters, embedding_near_dup_pairs)

    rng = np.random.RandomState(3)
    base = rng.randn(8)
    vecs = {
        0: base,
        1: base + 0.08 * rng.randn(8),          # ~ 0
        2: base + 0.16 * rng.randn(8),          # ~ 1 (chains to 0)
        3: rng.randn(8) + 5.0,                  # isolated
        4: -base,                               # anti-correlated: isolated
    }
    df = pd.DataFrame({"vec_id": list(vecs),
                       "embedding": [v.tolist() for v in vecs.values()]})
    ds = rd.from_pandas(df).repartition(2)
    pairs = embedding_near_dup_pairs(ds, threshold=0.95, id_col="vec_id",
                                     vec_col="embedding") \
        .select_columns(["id_a", "id_b"])
    labels = _propagate_min_labels(pairs)
    out = assign_clusters(ds, labels, id_col="vec_id").to_pandas()
    got = dict(zip(out["vec_id"].astype(int), out["cluster"].astype(int)))
    assert got[0] == 0 and got[1] == 0
    assert got[3] == 3 and got[4] == 4
    assert got[2] in (0, 2)  # 2 joins iff cos(1,2) clears the threshold
    assert len(got) == 5


def test_ngram_jaccard_pairs_equal_brute_force(ray_session):
    """Inverted-index Jaccard pairs == brute-force jaccard() over all
    pairs (candidates are complete for threshold > 0), with exact
    intersection/union counts."""
    import random

    import pandas as pd
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.dedup import (
        _shingle_hashes, jaccard, ngram_jaccard_pairs)

    rng = random.Random(4)
    words = ["ash", "birch", "cedar", "elm", "fir", "oak"]
    texts = [" ".join(rng.choices(words, k=rng.randint(1, 14)))
             for _ in range(40)]
    texts += [t + " oak" for t in texts[:10]]      # planted near-dups
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    t = 0.4
    out = ngram_jaccard_pairs(rd.from_pandas(df).repartition(4),
                              threshold=t).to_pandas()
    got = {(int(r["id_a"]), int(r["id_b"])): (int(r["n_inter"]),
                                              int(r["n_union"]))
           for _, r in out.iterrows()}
    exp = {}
    for a in range(len(texts)):
        sa = set(_shingle_hashes(texts[a], 3).tolist())
        for b in range(a + 1, len(texts)):
            sb = set(_shingle_hashes(texts[b], 3).tolist())
            if jaccard(texts[a], texts[b]) >= t:
                exp[(a, b)] = (len(sa & sb), len(sa | sb))
    assert got == exp
    assert len(exp) > 0


def test_ngram_jaccard_no_candidates_typed_empty(ray_session):
    """Disjoint vocabularies -> zero candidate pairs -> a typed empty
    result with the full 4-column schema (not the bare pair schema)."""
    import pandas as pd
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.dedup import ngram_jaccard_pairs

    df = pd.DataFrame({"doc_id": [0, 1, 2],
                       "text": ["aa bb cc", "dd ee ff", "gg hh ii"]})
    out = ngram_jaccard_pairs(rd.from_pandas(df).repartition(2))
    assert out.count() == 0
    # Ray's to_pandas drops columns of an empty dataset; the dataset
    # schema itself must carry the full 4-column contract
    assert out.schema().names == ["id_a", "id_b", "n_inter", "n_union"]


def test_ngram_jaccard_df_cap_skips_hot_shingles(ray_session):
    """df_cap: a shingle shared by more docs than the cap produces no
    candidates through it (the hot-key guard), while rarer shingles
    still pair up."""
    import pandas as pd
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.dedup import ngram_jaccard_pairs

    hot = ["common stop words"] * 10                  # df 10 > cap
    rare = ["rare unique gram", "rare unique gram"]   # df 2 <= cap
    df = pd.DataFrame({"doc_id": range(12), "text": hot + rare})
    out = ngram_jaccard_pairs(rd.from_pandas(df).repartition(3),
                              threshold=0.9, df_cap=5).to_pandas()
    pairs = set(zip(out["id_a"].astype(int), out["id_b"].astype(int)))
    assert pairs == {(10, 11)}


def test_simhash_pairs_equal_brute_force(ray_session):
    """Banded-LSH SimHash pairs == brute-force XOR-popcount pairs over
    the same signatures (pigeonhole recall 1.0; verify kills band
    false positives).  Corpus has planted near-identical docs plus
    random background, split over several blocks."""
    import random

    import pandas as pd
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.dedup import (
        SimHasher, simhash_near_dup_pairs)

    rng = random.Random(11)
    words = ["red", "green", "blue", "ochre", "cyan", "teal", "mauve"]
    texts = []
    for i in range(60):
        texts.append(" ".join(rng.choices(words, k=30)))
    # planted: heavy token overlap -> small Hamming distance
    for i in range(0, 40, 2):
        toks = texts[i].split()
        toks[rng.randrange(len(toks))] = "zzz"
        texts.append(" ".join(toks))
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = rd.from_pandas(df).repartition(4)
    k = 6
    out = simhash_near_dup_pairs(ds, max_hamming=k, hash_mode="fast") \
        .to_pandas()
    got = set(zip(out["id_a"].astype(int), out["id_b"].astype(int)))

    hasher = SimHasher(hash_mode="fast")
    sigs = hasher(df)["simhash"].to_numpy().astype(np.uint64)
    exp = set()
    for a in range(len(sigs)):
        for b in range(a + 1, len(sigs)):
            if bin(int(sigs[a] ^ sigs[b])).count("1") <= k:
                exp.add((a, b))
    assert got == exp
    assert len(exp) > 0  # the plant actually produced near-dups
    # reported hamming matches brute force
    for _, r in out.iterrows():
        d = bin(int(sigs[int(r["id_a"])] ^ sigs[int(r["id_b"])])).count("1")
        assert d == int(r["hamming"])


def test_gazetteer_trie_engine_equals_alternation(ray_session):
    """10k-alias dict: the trie-regex engine produces IDENTICAL
    scanner output to the longest-first alternation engine (VERDICT r2
    item 6), including overlapping-prefix aliases."""
    import random

    import pandas as pd

    from orionbelt_ontology_builder_ray.stages.link import GazetteerMentionScanner

    rng = random.Random(3)
    words = ["alpha", "beta", "gamma", "delta", "corp", "labs"]
    alias = {}
    while len(alias) < 10000:
        k = " ".join(rng.choices(words, k=rng.randint(1, 3))) \
            + str(rng.randint(0, 99999))
        alias[k] = ("http://kg/e-" + k.replace(" ", "_"), "", k)
    for k in ("acme", "acme corp", "acme corporation"):
        alias[k] = ("http://kg/e-" + k.replace(" ", "_"), "", k)
    batch = pd.DataFrame({
        "conv_id": ["c1", "c2"],
        "turn_idx": [0, 1],
        "text": ["We met Acme Corporation and acme corp near "
                 + " ".join(list(alias)[:50]),
                 "nothing to see acme here"],
    })
    out_alt = GazetteerMentionScanner(alias, engine="alternation")(batch)
    out_trie = GazetteerMentionScanner(alias, engine="trie")(batch)
    out_ac = GazetteerMentionScanner(alias, engine="ac")(batch)
    key = ["turn", "entity", "surface"]
    a = out_alt.sort_values(key).reset_index(drop=True)
    t = out_trie.sort_values(key).reset_index(drop=True)
    c = out_ac.sort_values(key).reset_index(drop=True)
    assert a.equals(t)
    assert a.equals(c)
    assert (a["surface"] == "acme corporation").any()  # longest wins
    assert len(a) > 40


def test_gazetteer_ac_engine_fuzz_equals_alternation():
    """Seeded fuzz over adversarial alias sets (overlaps, prefixes,
    non-word chars, word-boundary edge cases): the Aho-Corasick engine
    reproduces the regex engine's leftmost-longest boundary-checked
    non-overlapping matches exactly (round-3 scale path for
    multi-million-alias gazetteers)."""
    import random

    import pandas as pd

    from orionbelt_ontology_builder_ray.stages.link import GazetteerMentionScanner

    rng = random.Random(99)
    chars = "ab _-.x"
    for trial in range(120):
        n = rng.randint(1, 12)
        keys = set()
        while len(keys) < n:
            k = "".join(rng.choices(chars, k=rng.randint(1, 6))).strip()
            if k:
                keys.add(k.lower())
        alias = {k: ("e-" + k, "", k) for k in keys}
        texts = ["".join(rng.choices(chars + "AB", k=rng.randint(0, 40)))
                 for _ in range(3)]
        batch = pd.DataFrame({"conv_id": [f"c{i}" for i in range(3)],
                              "turn_idx": [0, 1, 2], "text": texts})
        o_alt = GazetteerMentionScanner(alias, engine="alternation")(batch)
        o_ac = GazetteerMentionScanner(alias, engine="ac")(batch)
        key = ["turn", "entity", "surface"]
        a = o_alt.sort_values(key).reset_index(drop=True)
        c = o_ac.sort_values(key).reset_index(drop=True)
        assert a.equals(c), (trial, sorted(alias), texts)


def test_gazetteer_ac_boundary_and_overlap_semantics():
    """Pinned edge cases: string-start/end boundaries, adjacent
    matches, longest-at-position with an invalid trailing boundary
    falling back to the shorter alias, and hyphenated aliases."""
    import pandas as pd

    from orionbelt_ontology_builder_ray.stages.link import GazetteerMentionScanner

    alias = {k: ("e-" + k, "", k)
             for k in ("acme", "acme corp", "x-corp", "ab", "ab cd")}
    batch = pd.DataFrame({
        "conv_id": ["c1", "c2", "c3", "c4"],
        "turn_idx": [0, 1, 2, 3],
        "text": [
            "acme",                       # whole-string match
            "acme corpse",                # 'acme corp' fails \b -> 'acme'
            "x-corp ab cdx",              # 'ab cd' fails \b -> 'ab'
            "ab ab cd",                   # adjacent + longest
        ]})
    for eng in ("alternation", "ac"):
        out = GazetteerMentionScanner(alias, engine=eng)(batch)
        got = sorted(zip(out["turn"].str[-5:], out["surface"]))
        assert got == sorted([
            ("c1-t0", "acme"),
            ("c2-t1", "acme"),
            ("c3-t2", "x-corp"), ("c3-t2", "ab"),
            ("c4-t3", "ab"), ("c4-t3", "ab cd"),
        ]), (eng, got)


def test_simhash_pairs_rejects_too_many_bands():
    """max_hamming >= BITS would make zero-width bands (mask 0) and a
    quadratic cross-product candidate set — must raise (ADVICE r3)."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.dedup import (
        SimHasher, simhash_near_dup_pairs)

    ds = rd.from_pandas(pd.DataFrame({"doc_id": [0], "text": ["a"]}))
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_near_dup_pairs(ds, max_hamming=SimHasher.BITS)


def test_wanted_shingle_sets_requires_wanted_ref():
    """Omitting the broadcast candidate-id array must fail loudly, not
    silently produce an empty verify stage (ADVICE r3)."""
    import pytest

    from orionbelt_ontology_builder_ray.stages.dedup import _WantedShingleSets

    with pytest.raises(ValueError, match="wanted_ref"):
        _WantedShingleSets(3, "doc_id", "text")


def test_bpe_token_count_matches_duckdb_on_nonascii_whitespace():
    """The shared BPE pretokenizer pattern must count identically in
    Python re (Unicode) and DuckDB RE2 (ASCII \\s) — pinned on text
    with U+00A0 inside a punctuation run (ADVICE r3)."""
    import re

    import duckdb

    from orionbelt_ontology_builder_ray.stages.textops import BPE_TOKEN_RE

    texts = ["a !?b", "hello world", "x ! ? y",
             "plain ascii, text 42 it's", " thin space !"]
    pat = re.compile(BPE_TOKEN_RE)
    sql_lit = BPE_TOKEN_RE.replace("'", "''")
    for t in texts:
        py_n = len(pat.findall(t))
        duck_n = duckdb.sql(
            "SELECT length(regexp_extract_all(?, '" + sql_lit + "'))",
            params=[t]).fetchone()[0]
        assert py_n == duck_n, (t, py_n, duck_n)


def test_streamed_semi_join_equals_broadcast(ray_session):
    """broadcast_id_cap=0 routes candidate-doc payload filtering
    through the streamed bucket-hash semi-join (candidate ids stay a
    Dataset) — the output pair sets must be identical to the default
    broadcast path for all three verify families (VERDICT r3 item 8)."""
    import random

    import pandas as pd
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.dedup import (
        ngram_jaccard_pairs, simhash_near_dup_pairs,
        verified_near_dup_edges)

    rng = random.Random(23)
    words = ["red", "green", "blue", "ochre", "cyan", "teal", "mauve"]
    texts = [" ".join(rng.choices(words, k=25)) for _ in range(50)]
    for i in range(0, 30, 2):          # planted near-dups
        toks = texts[i].split()
        toks[rng.randrange(len(toks))] = "zzz"
        texts.append(" ".join(toks))
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = rd.from_pandas(df).repartition(4)

    def pairset(out, cols):
        p = out.to_pandas()
        return set(map(tuple, p[cols].astype(int).to_numpy()))

    for fn, cols, kw in [
        (ngram_jaccard_pairs, ["id_a", "id_b", "n_inter", "n_union"],
         dict(threshold=0.5)),
        (simhash_near_dup_pairs, ["id_a", "id_b", "hamming"],
         dict(max_hamming=6, hash_mode="fast")),
        (verified_near_dup_edges, ["id_a", "id_b"],
         dict(threshold=0.5)),
    ]:
        bcast = pairset(fn(ds, **kw), cols)
        streamed = pairset(fn(ds, broadcast_id_cap=0, **kw), cols)
        assert streamed == bcast and len(bcast) > 0, fn.__name__


def test_token_counter_arrow_equals_pandas_on_ascii():
    """The arrow TokenCounter (RE2 kernels) must equal the pandas
    reference on ASCII corpora (where Python's Unicode \\s and RE2's
    ASCII \\s coincide); on non-ASCII whitespace the arrow stage must
    side with the DuckDB oracle."""
    import duckdb
    import pandas as pd
    import pyarrow as pa

    from orionbelt_ontology_builder_ray.stages.textops import (
        BPE_TOKEN_RE, TokenCounter, TokenCounterPandas)

    ascii_docs = pd.DataFrame({
        "doc_id": range(5),
        "text": ["hello world", "", "  a  b  ", "it's 42, ok?!",
                 "one\ttwo\nthree"]})
    got = TokenCounter()(pa.Table.from_pandas(
        ascii_docs, preserve_index=False)).to_pandas()
    exp = TokenCounterPandas()(ascii_docs)
    pd.testing.assert_frame_equal(got, exp)

    # non-ASCII whitespace: arrow == DuckDB (RE2), by construction
    nb = "a b c"
    t = TokenCounter()(pa.table({"doc_id": [0], "text": [nb]})).to_pandas()
    d = duckdb.sql(
        "SELECT CAST(length(?) AS BIGINT) AS n_chars, "
        "CASE WHEN trim(?) = '' THEN 0 ELSE CAST(array_length("
        "regexp_split_to_array(trim(?), '\\s+')) AS BIGINT) END AS n_tokens, "
        "CAST(length(regexp_extract_all(?, '"
        + BPE_TOKEN_RE.replace("'", "''") + "')) AS BIGINT) AS n_bpe",
        params=[nb, nb, nb, nb]).fetchone()
    assert (int(t["n_chars"][0]), int(t["n_tokens"][0]),
            int(t["n_bpe_tokens"][0])) == (d[0], d[1], d[2])


def _incr_corpus():
    """Store/new split with planted cross-split and in-split dups."""
    rng = np.random.RandomState(11)
    words = [f"w{i}" for i in range(50)]
    texts = [" ".join(rng.choice(words, 12)) for _ in range(60)]
    store = pd.DataFrame({
        "doc_id": np.arange(0, 40, dtype=np.int64),
        "text": texts[:40]})
    # new split: 10 fresh, 5 copies of store texts (must drop), 5
    # in-split dup pairs of the fresh ones (keep min id only)
    new_texts = texts[40:50] + texts[0:5] + texts[40:45]
    new = pd.DataFrame({
        "doc_id": np.arange(100, 100 + len(new_texts), dtype=np.int64),
        "text": new_texts})
    return store, new


def _brute_incremental(store: pd.DataFrame, new: pd.DataFrame):
    keep = new[~new["text"].isin(set(store["text"]))]
    return keep.groupby("text", as_index=False)["doc_id"].min() \
        .sort_values("doc_id").reset_index(drop=True)[["doc_id", "text"]]


def test_incremental_dedup_broadcast_equals_brute_force(ray_session):
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.dedup import (
        incremental_dedup_docs)

    store, new = _incr_corpus()
    out = incremental_dedup_docs(
        rd.from_pandas(new).repartition(4),
        rd.from_pandas(store).repartition(3),
        strategy="broadcast").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)[["doc_id", "text"]]
    pd.testing.assert_frame_equal(out, _brute_incremental(store, new))


def test_incremental_dedup_shuffle_equals_broadcast(ray_session):
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.dedup import (
        incremental_dedup_docs)

    store, new = _incr_corpus()
    outs = {}
    for strat in ("broadcast", "shuffle"):
        outs[strat] = incremental_dedup_docs(
            rd.from_pandas(new).repartition(4),
            rd.from_pandas(store).repartition(3),
            strategy=strat).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)[["doc_id", "text"]]
    pd.testing.assert_frame_equal(outs["broadcast"], outs["shuffle"])


def test_incremental_dedup_empty_store(ray_session):
    """No store -> pure exact dedup of the new split."""
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.dedup import (
        incremental_dedup_docs)

    _, new = _incr_corpus()
    empty = pd.DataFrame({"doc_id": np.empty(0, np.int64),
                          "text": np.empty(0, object)})
    out = incremental_dedup_docs(
        rd.from_pandas(new).repartition(4),
        rd.from_pandas(empty),
        strategy="broadcast").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)[["doc_id", "text"]]
    pd.testing.assert_frame_equal(out, _brute_incremental(empty, new))


def _brute_kmeans(ids, mat, k, n_iter):
    """Single-process Lloyd mirror of kmeans_embeddings' protocol."""
    order = np.argsort(ids)
    cents = mat[order[:k]].astype(np.float64)
    for _ in range(n_iter):
        d = ((cents * cents).sum(axis=1)
             - 2.0 * (mat.astype(np.float64) @ cents.T))
        a = d.argmin(axis=1)
        new = cents.copy()
        for c in range(k):
            m = a == c
            if m.any():
                new[c] = mat[m].astype(np.float64).sum(axis=0) / m.sum()
        cents = np.round(new, 6)
    d = ((cents * cents).sum(axis=1)
         - 2.0 * (mat.astype(np.float64) @ cents.T))
    return d.argmin(axis=1)


def test_kmeans_equals_brute_force_and_partition_invariant(ray_session):
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.similarity import (
        kmeans_embeddings)

    rng = np.random.RandomState(5)
    n, dim, k = 120, 8, 4
    mat = rng.randn(n, dim).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    df = pd.DataFrame({"vec_id": ids,
                       "embedding": [v for v in mat]})
    expect = _brute_kmeans(ids, mat, k, 3)
    for nparts in (2, 7):
        out, cents = kmeans_embeddings(
            rd.from_pandas(df).repartition(nparts), k=k, n_iter=3)
        got = out.to_pandas().sort_values("vec_id")
        assert (got["cluster"].to_numpy() == expect).all(), nparts
    assert cents.shape == (k, dim)
    assert len(np.unique(expect)) > 1  # non-degenerate clustering


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    """A centroid that captures no points must persist unchanged
    (matching the oracle's COALESCE) instead of going NaN."""
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.similarity import (
        kmeans_embeddings)

    # two tight blobs far apart + k=3: the 3rd initial centroid sits
    # inside blob A and loses all its points to centroid 0 by iter 2
    a = np.zeros((10, 4), np.float32)
    b = np.ones((10, 4), np.float32) * 100
    mat = np.vstack([a, b])
    df = pd.DataFrame({"vec_id": np.arange(20, dtype=np.int64),
                       "embedding": [v for v in mat]})
    out, cents = kmeans_embeddings(rd.from_pandas(df), k=3, n_iter=4)
    assert not np.isnan(cents).any()
    got = out.to_pandas()
    assert set(got["cluster"].unique()) <= {0, 1, 2}


def test_topn_per_stratum_deterministic_budget(ray_session):
    """Fixed-budget sampling: exactly min(N, |stratum|) rows per
    stratum, selected by smallest md5 hash — partition-invariant and
    equal to the brute-force ranking."""
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.dedup import _hash_strings_md5
    from orionbelt_ontology_builder_ray.stages.windows import grouped_topk

    rng = np.random.RandomState(2)
    df = pd.DataFrame({
        "doc_id": np.arange(200, dtype=np.int64),
        "pred_lang": rng.choice(["en", "de", "rare"], 200,
                                p=[0.6, 0.38, 0.02])})
    N = 15
    h = (_hash_strings_md5(df["doc_id"].astype(str).tolist())
         >> np.uint64(1)).astype(np.int64)
    expect = df.assign(_h=h).sort_values(["_h", "doc_id"]) \
        .groupby("pred_lang", sort=False).head(N)
    expect = set(map(tuple, expect[["doc_id", "pred_lang"]].to_numpy()))

    def add_hash(b):
        b = b.copy()
        b["_h"] = (_hash_strings_md5(b["doc_id"].astype(str).tolist())
                   >> np.uint64(1)).astype(np.int64)
        return b

    for nparts in (1, 6):
        got = grouped_topk(
            rd.from_pandas(df).repartition(nparts).map_batches(
                add_hash, batch_format="pandas"),
            key_cols=["pred_lang"], order_cols=["_h", "doc_id"],
            k=N, descending=False).to_pandas()
        assert set(map(tuple, got[["doc_id", "pred_lang"]]
                       .to_numpy())) == expect, nparts
        sizes = got.groupby("pred_lang").size()
        full = df.groupby("pred_lang").size()
        for lang, n in sizes.items():
            assert n == min(N, full[lang])


def test_corpus_vocab_matches_duckdb(ray_session):
    """Global top-M token frequencies == the DuckDB groupby (engine
    parity without a driver slot), partition-invariant, deterministic
    tie-break."""
    import duckdb
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.textops import corpus_vocab

    rng = np.random.RandomState(9)
    vocab = [f"tok{i}" for i in range(30)]
    docs = pd.DataFrame({
        "doc_id": np.arange(50, dtype=np.int64),
        "text": [" ".join(rng.choice(vocab, rng.randint(1, 40)))
                 for _ in range(50)]})
    con = duckdb.connect()
    con.register("documents", docs)
    expect = con.sql("""
        SELECT tok AS token, COUNT(*)::BIGINT AS n FROM (
          SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
          FROM documents WHERE trim(text) <> '')
        GROUP BY tok ORDER BY n DESC, token LIMIT 12""").df()
    for nparts in (1, 5):
        got = corpus_vocab(rd.from_pandas(docs).repartition(nparts),
                           top_m=12)
        pd.testing.assert_frame_equal(got, expect, check_exact=True)


def test_incremental_dedup_auto_overflows_to_shuffle(ray_session,
                                                     monkeypatch):
    """auto with a tiny broadcast cap must bail to the shuffle path
    mid-stream and still produce the exact result."""
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages import dedup as dd

    store, new = _incr_corpus()
    monkeypatch.setattr(dd, "_INCR_BROADCAST_MAX", 5)
    out = dd.incremental_dedup_docs(
        rd.from_pandas(new).repartition(4),
        rd.from_pandas(store).repartition(3),
        strategy="auto").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)[["doc_id", "text"]]
    pd.testing.assert_frame_equal(out, _brute_incremental(store, new))


def test_ivf_accepts_kmeans_centroids(ray_session):
    """Full-probe IVF with a kmeans_embeddings-trained quantizer still
    equals brute-force top-k exactly (quantizer choice only moves
    bucket boundaries, never full-probe results)."""
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.similarity import (
        ann_topk, ivf_topk, kmeans_embeddings)

    rng = np.random.RandomState(7)
    n, dim = 80, 16
    df = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [v for v in rng.randn(n, dim).astype(np.float32)]})
    ds = rd.from_pandas(df).repartition(3)
    _, cents = kmeans_embeddings(ds, k=4, n_iter=2)
    q = rng.randn(2, dim)
    brute = ann_topk(ds, q, k=5)
    ivf = ivf_topk(rd.from_pandas(df).repartition(3), q, k=5,
                   n_centroids=4, nprobe=4, centroids=cents)
    pd.testing.assert_frame_equal(
        brute[["query_idx", "vec_id", "rnk"]].reset_index(drop=True),
        ivf[["query_idx", "vec_id", "rnk"]].reset_index(drop=True))


def test_kmeans_spread_init_separates_planted_blobs(ray_session):
    """Farthest-point init must place seeds across all planted blobs
    (id init can start all seeds inside one blob); the final
    assignment separates the blobs exactly."""
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.similarity import (
        kmeans_embeddings)

    rng = np.random.RandomState(4)
    blobs = []
    for c in range(3):
        center = np.zeros(6)
        center[c] = 50.0
        blobs.append(center + rng.randn(20, 6) * 0.1)
    mat = np.vstack(blobs).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(60, dtype=np.int64),
                       "embedding": [v for v in mat]})
    out, cents = kmeans_embeddings(rd.from_pandas(df).repartition(4),
                                   k=3, n_iter=3, init="spread")
    got = out.to_pandas().sort_values("vec_id")["cluster"].to_numpy()
    # each blob maps to one distinct cluster id
    ids = [set(got[i * 20:(i + 1) * 20]) for i in range(3)]
    assert all(len(s) == 1 for s in ids)
    assert len(set.union(*ids)) == 3


def test_oov_counts_brute_force_and_full_vocab_zero(ray_session):
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.textops import oov_counts

    rng = np.random.RandomState(12)
    common = [f"c{i}" for i in range(5)]
    rare = [f"r{i}" for i in range(40)]
    texts = [" ".join(list(rng.choice(common, 10))
                      + list(rng.choice(rare, 3))) for _ in range(30)]
    df = pd.DataFrame({"doc_id": np.arange(30, dtype=np.int64),
                       "text": texts})
    out = oov_counts(rd.from_pandas(df).repartition(4),
                     vocab_top_m=5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # top-5 vocab == the 5 common tokens (each appears ~60x vs <=3x)
    expect = np.array([sum(w not in set(common) for w in t.split())
                       for t in texts], dtype=np.int64)
    assert (out["n_oov"].to_numpy() == expect).all()
    # vocab covering everything -> zero OOV everywhere
    full = oov_counts(rd.from_pandas(df), vocab_top_m=1000).to_pandas()
    assert (full["n_oov"] == 0).all()


def test_budget_mix_thresholds_exact_integer_math():
    """The budgeted-mix threshold contract: exact integer floor
    division, capped at DENOM, zero on empty sources; the sampled
    token mass lands near weight*budget."""
    import duckdb

    from orionbelt_ontology_builder_ray.stages.dedup import _hash_strings_md5
    from orionbelt_ontology_builder_ray.stages.textops import (
        StratifiedSampler)

    DENOM = 1_000_000
    rng = np.random.RandomState(6)
    n = 4000
    df = pd.DataFrame({
        "source": np.where(np.arange(n) % 3 == 0, "turns", "docs"),
        "mix_key": [f"k{i}" for i in range(n)],
        "text": [" ".join(["w"] * rng.randint(5, 15)) for _ in range(n)]})
    toks = df["text"].str.split().str.len()
    totals = toks.groupby(df["source"]).sum().to_dict()
    budget, weights = 5000, (("docs", 7, 10), ("turns", 3, 10))
    thr = {s: min(DENOM, (wn * budget * DENOM) // (wd * int(totals[s])))
           for s, wn, wd in weights}
    out = StratifiedSampler(rates={}, default_rate=0.0, id_col="mix_key",
                            strata_col="source", thresholds=thr)(df)
    got_tokens = out["text"].str.split().str.len() \
        .groupby(out["source"]).sum()
    for s, wn, wd in weights:
        target = budget * wn / wd
        assert abs(got_tokens.get(s, 0) - target) < 0.25 * target, \
            (s, got_tokens.get(s, 0), target)
    # DuckDB floor division reproduces the identical thresholds
    con = duckdb.connect()
    for s, wn, wd in weights:
        sql_thr = con.sql(
            f"SELECT LEAST({DENOM}, (CAST({wn} AS BIGINT) * {budget} * "
            f"{DENOM}) // (CAST({wd} AS BIGINT) * {int(totals[s])}))"
        ).fetchone()[0]
        assert int(sql_thr) == thr[s], s
    # empty source -> threshold 0 semantics
    assert StratifiedSampler(rates={}, default_rate=0.0,
                             id_col="mix_key", strata_col="source",
                             thresholds={"docs": 0, "turns": 0})(df) \
        .empty


def test_ngram_jaccard_count_path_equals_verify_path(ray_session):
    """The default co-occurrence-count design == the legacy
    candidate+set-verify design (forced via broadcast_id_cap) on a
    random corpus with planted near-dups — same pairs, same exact
    (n_inter, n_union)."""
    import random

    import pandas as pd
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.dedup import (
        _ngram_jaccard_pairs_verify, ngram_jaccard_pairs)

    rng = random.Random(17)
    words = ["ash", "birch", "cedar", "elm", "fir", "oak", "pine"]
    texts = [" ".join(rng.choices(words, k=rng.randint(2, 18)))
             for _ in range(80)]
    texts += [t + " elm" for t in texts[:15]]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = rd.from_pandas(df).repartition(5)
    key = ["id_a", "id_b"]
    new = ngram_jaccard_pairs(ds, threshold=0.35).to_pandas() \
        .sort_values(key).reset_index(drop=True)
    old = _ngram_jaccard_pairs_verify(ds, threshold=0.35).to_pandas() \
        .sort_values(key).reset_index(drop=True)
    assert len(new) > 0
    pd.testing.assert_frame_equal(new.astype("int64"),
                                  old.astype("int64"))


def test_expand_run_offsets_property():
    """_expand_run_offsets: for random run-length vectors, the emitted
    offsets are exactly [1..run[i]] per element, concatenated — the
    invariant the vectorized pair expansion rests on."""
    import random

    import numpy as np

    from orionbelt_ontology_builder_ray.stages.dedup import (
        _expand_run_offsets)

    rng = random.Random(23)
    for _ in range(25):
        run = np.array([rng.randint(0, 6)
                        for _ in range(rng.randint(0, 40))],
                       dtype=np.int64)
        got = _expand_run_offsets(run)
        exp = np.concatenate([np.arange(1, r + 1) for r in run]) \
            if run.sum() else np.array([], dtype=np.int64)
        assert np.array_equal(got, exp)


def test_bigram_lm_brute_force_parity(ray_session):
    """corpus_bigram_lm + LmPerplexityScorer == a hand-rolled
    add-alpha bigram model on the same corpus: exact counts,
    min_count pruning treated as c=0, identical avg logp; partition-
    invariant; short docs emit no row."""
    import math
    import re
    from collections import Counter

    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.textops import (
        corpus_bigram_lm, lm_perplexity_scores)

    rng = np.random.RandomState(21)
    vocab = [f"w{i}" for i in range(12)]
    texts = [" ".join(rng.choice(vocab, rng.randint(2, 25)))
             for _ in range(40)]
    texts += ["solo", "", "  \t \n "]  # <2 tokens: no LM row
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})

    split = re.compile(r"[ \t\n\r\f\v]+").split
    uni, bi, toks_by = Counter(), Counter(), {}
    for i, t in zip(df["doc_id"], df["text"]):
        toks = [w for w in split(t) if w]
        toks_by[i] = toks
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    v = len(uni)
    alpha, min_count = 0.5, 2
    expect = {}
    for i, toks in toks_by.items():
        if len(toks) < 2:
            continue
        lps = [math.log(((bi[p] if bi[p] >= min_count else 0) + alpha)
                        / (uni[p[0]] + alpha * v))
               for p in zip(toks, toks[1:])]
        expect[i] = (len(lps), sum(lps) / len(lps))

    for nparts in (1, 5):
        ds = rd.from_pandas(df).repartition(nparts)
        out = lm_perplexity_scores(ds).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert set(out["doc_id"]) == set(expect)
        for _, r in out.iterrows():
            n, lp = expect[r["doc_id"]]
            assert r["n_lm_bigrams"] == n
            assert abs(r["avg_logp"] - lp) < 1e-12

    # model shape: unigrams complete, bigrams pruned to >= min_count
    mu, mb, nv = corpus_bigram_lm(rd.from_pandas(df).repartition(3))
    assert nv == v and len(mu) == v
    assert dict(zip(mu["w1"], mu["n"])) == dict(uni)
    kept = {k: n for k, n in bi.items() if n >= min_count}
    assert dict(zip(zip(mb["w1"], mb["w2"]), mb["n"])) == kept


def test_dsir_scores_brute_force_parity(ray_session):
    """dsir_scores == hand-rolled mean(logp_target - logp_source) per
    doc under two independently trained add-alpha bigram models;
    source model shared with the lm leg; target-OOV heads fall back
    to c=0 under the target model."""
    import math
    import re
    from collections import Counter

    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.textops import (
        corpus_bigram_lm, dsir_scores)

    rng = np.random.RandomState(33)
    # target-flavored docs use a disjoint sub-vocabulary so the two
    # models genuinely disagree
    voc_t = [f"t{i}" for i in range(8)]
    voc_s = [f"s{i}" for i in range(8)]
    texts = []
    for i in range(36):
        voc = voc_t if i % 5 == 0 else voc_s
        texts.append(" ".join(rng.choice(voc, rng.randint(2, 20))))
    texts.append("solo")  # no bigrams -> no row
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})

    split = re.compile(r"[ \t\n\r\f\v]+").split

    def train(sub):
        uni, bi = Counter(), Counter()
        for t in sub:
            toks = [w for w in split(t) if w]
            uni.update(toks)
            bi.update(zip(toks, toks[1:]))
        return uni, {k: n for k, n in bi.items() if n >= 2}, len(uni)

    s_uni, s_bi, s_v = train(df["text"])
    t_uni, t_bi, t_v = train(df[df["doc_id"] % 5 == 0]["text"])
    a = 0.5

    def logp(p, uni, bi, v):
        return math.log((bi.get(p, 0) + a)
                        / (uni.get(p[0], 0) + a * max(v, 1)))

    expect = {}
    for i, t in zip(df["doc_id"], df["text"]):
        toks = [w for w in split(t) if w]
        if len(toks) < 2:
            continue
        lrs = [logp(p, t_uni, t_bi, t_v) - logp(p, s_uni, s_bi, s_v)
               for p in zip(toks, toks[1:])]
        expect[i] = sum(lrs) / len(lrs)

    ds = rd.from_pandas(df).repartition(4)
    target = rd.from_pandas(
        df[df["doc_id"] % 5 == 0].reset_index(drop=True)).repartition(2)
    out = dsir_scores(ds, target).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert set(out["doc_id"]) == set(expect)
    for _, r in out.iterrows():
        assert abs(r["avg_logratio"] - expect[r["doc_id"]]) < 1e-12
    # target docs read target-typical: every i % 5 == 0 doc scores
    # above every off-target doc on this disjoint-vocab corpus
    on = out[out["doc_id"] % 5 == 0]["avg_logratio"].min()
    off = out[out["doc_id"] % 5 != 0]["avg_logratio"].max()
    assert on > off
    # sharing a pre-trained source model is identical
    m_s = corpus_bigram_lm(ds)
    out2 = dsir_scores(ds, target, source_model=m_s).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)


def _ref_bpe(texts, num_merges):
    """Pure list-of-symbols BPE (Sennrich): freq-weighted adjacent
    pair counts (overlaps included), greedy left-to-right merge,
    tie-break (n desc, left asc, right asc) on expanded symbols."""
    import re
    from collections import Counter

    split = re.compile(r"[ \t\n\r\f\v]+").split
    wf = Counter()
    for t in texts:
        wf.update(w for w in split(t) if w)
    vocab = {w: list(w) for w in wf}
    merges = []
    for k in range(num_merges):
        pc = Counter()
        for w, f in wf.items():
            syms = vocab[w]
            for p in zip(syms, syms[1:]):
                pc[p] += f
        if not pc:
            break
        (a, b), n = min(pc.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((k + 1, a, b, n))
        for w in vocab:
            syms, out, i = vocab[w], [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def test_bpe_train_matches_reference_random(ray_session):
    """Distributed BPE (sentinel-string symbols, bucket-argmax pair
    counting) == the classic list-of-symbols algorithm on random
    corpora — including overlap counting ('aaaa'), tie-breaks and
    merge-of-merged-symbol cases; partition-invariant."""
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.bpe import bpe_train

    base_words = ["lower", "lowest", "newer", "wider", "low", "new",
                  "news", "abcabc", "aaaa", "banana", "bandana"]
    for seed, nparts in ((7, 4), (11, 1), (13, 7)):
        rng = np.random.RandomState(seed)
        texts = [" ".join(rng.choice(base_words, rng.randint(1, 12)))
                 for _ in range(50)]
        df = pd.DataFrame({
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts})
        exp = _ref_bpe(texts, 6)
        got = bpe_train(rd.from_pandas(df).repartition(nparts),
                        num_merges=6)
        assert [tuple(r) for r in got.itertuples(index=False)] == exp
    # fewer distinct pairs than merges: stops early, no crash
    tiny = pd.DataFrame({"doc_id": np.array([0], dtype=np.int64),
                         "text": ["ab ab ab"]})
    got = bpe_train(rd.from_pandas(tiny), num_merges=5)
    assert [tuple(r) for r in got.itertuples(index=False)] \
        == _ref_bpe(["ab ab ab"], 5)


def test_bpe_encode_matches_reference_symbol_counts(ray_session):
    """bpe_encode (rank-ordered str.replace over raw text) == the sum
    of per-word symbol counts from the classic list-of-symbols BPE —
    including tab/newline-delimited words and docs with no tokens."""
    import re
    from collections import Counter

    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.bpe import (
        bpe_encode, bpe_train)

    rng = np.random.RandomState(17)
    base_words = ["lower", "lowest", "newer", "low", "aaaa", "banana"]
    texts = ["\t".join(rng.choice(base_words, rng.randint(1, 10)))
             if i % 3 else " ".join(rng.choice(base_words,
                                               rng.randint(1, 10)))
             for i in range(40)]
    texts.append("   ")  # 0 tokens -> 0 symbols
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})

    # reference: replay the merges on list-of-symbols vocab
    split = re.compile(r"[ \t\n\r\f\v]+").split
    wf = Counter()
    for t in texts:
        wf.update(w for w in split(t) if w)
    vocab = {w: list(w) for w in wf}
    merges = _ref_bpe(texts, 5)
    for _, a, b, _n in merges:
        for w in vocab:
            syms, out, i = vocab[w], [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    expect = {i: sum(len(vocab[w]) for w in split(t) if w)
              for i, t in zip(df["doc_id"], df["text"])}

    ds = rd.from_pandas(df).repartition(3)
    got_merges, ops = bpe_train(ds, num_merges=5, with_ops=True)
    assert [tuple(r) for r in got_merges.itertuples(index=False)] \
        == merges
    out = bpe_encode(ds, ops).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert {i: n for i, n in zip(out["doc_id"], out["n_bpe_tokens"])} \
        == expect


def test_semdedup_embeddings_brute_force(ray_session):
    """semdedup_embeddings == an independent numpy replay: ids-init
    kmeans (4 Lloyd iterations, 6-decimal rounding, first-min
    tie-break), within-cluster cosine pairs, union-find min-label;
    pairs across different kmeans buckets must NOT merge."""
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.similarity import (
        semdedup_embeddings)

    rng = np.random.RandomState(3)
    n, dim, k, n_iter, thr = 120, 8, 4, 4, 0.9
    base = rng.randn(k, dim) * 3
    vecs = base[rng.randint(0, k, n)] + rng.randn(n, dim) * 0.6
    # plant tight near-dup pairs inside clumps
    for i in range(0, 30, 3):
        vecs[i + 1] = vecs[i] + rng.randn(dim) * 0.01
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": [v.astype(np.float64) for v in vecs]})

    # --- reference kmeans (mirrors the documented contract)
    cents = np.stack(df["embedding"].to_numpy()[:k]).astype(np.float64)
    X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    for _ in range(n_iter):
        d = (cents * cents).sum(1) - 2.0 * X @ cents.T
        a = d.argmin(1)
        new = cents.copy()
        for c in range(k):
            if (a == c).any():
                new[c] = X[a == c].mean(0)
        cents = np.round(new, 6)
    a = ((cents * cents).sum(1) - 2.0 * X @ cents.T).argmin(1)

    # --- reference within-cluster pairs + union-find
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    n_pairs = 0
    for i in range(n):
        for j in range(i + 1, n):
            if a[i] == a[j] and Xn[i] @ Xn[j] >= thr:
                n_pairs += 1
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    assert n_pairs >= 10  # the fixture really exercises merging
    expect = {i: find(i) for i in range(n)}

    out = semdedup_embeddings(
        rd.from_pandas(df).repartition(5), k=k, n_iter=n_iter,
        threshold=thr).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    got = dict(zip(out["vec_id"].astype(int), out["cluster"].astype(int)))
    assert got == expect


def test_exact_quantiles_brute_force(ray_session):
    """rank-ceil(q*n) order statistic vs numpy sort, multiple
    partitionings and duplicate-heavy values."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.textops import exact_quantiles

    rng = np.random.RandomState(7)
    vals = np.concatenate([rng.randint(0, 50, 500),
                           np.full(100, 13)]).astype(np.int64)
    df = pd.DataFrame({"n_tokens": vals})
    qs = (0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    want = {}
    srt = np.sort(vals)
    for q in qs:
        rank = max(1, min(int(np.ceil(q * len(vals))), len(vals)))
        want[q] = int(srt[rank - 1])
    for nparts in (1, 7):
        got = exact_quantiles(rd.from_pandas(df).repartition(nparts),
                              "n_tokens", qs=qs)
        assert got == want, nparts


def test_exact_quantiles_empty_raises(ray_session):
    import pandas as pd
    import pytest
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.textops import exact_quantiles

    empty = rd.from_pandas(pd.DataFrame({"n_tokens": pd.Series([], dtype="int64")}))
    with pytest.raises(ValueError, match="empty"):
        exact_quantiles(empty, "n_tokens")
