"""PII scrubbing, n-gram decontamination, and the fused text profile.

Covers stages/scrub.py (PiiRedactor / decontaminate /
dup_ngram_counts) and stages/textops.TextProfile — the training-data
compliance operators (no reference analog; graft requirement)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from orionbelt_ontology_builder_ray.stages.scrub import (
    MAX_EVAL_GRAMS, PiiRedactor, ascii_tokens, decontaminate,
    doc_gram_hashes, dup_ngram_counts, inject_pii)


def _docs_table(rows):
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })


# ---------------------------------------------------------------------------
# PiiRedactor
# ---------------------------------------------------------------------------


def test_pii_redactor_counts_and_redaction():
    t = _docs_table([
        (1, "mail bob.smith@corp.example.org now"),
        (2, "call +1 555-123-4567 or 44 555-000-1111"),
        (3, "host 192.168.0.1 ref 1234567"),
        (4, "clean text with no pii at all"),
    ])
    out = PiiRedactor()(t)
    assert out["n_emails"].to_pylist() == [1, 0, 0, 0]
    assert out["n_phones"].to_pylist() == [0, 2, 0, 0]
    assert out["n_ips"].to_pylist() == [0, 0, 1, 0]
    assert out["n_ids"].to_pylist() == [0, 0, 1, 0]
    red = out["text_redacted"].to_pylist()
    assert red[0] == "mail [EMAIL] now"
    assert red[1] == "call [PHONE] or [PHONE]"
    assert red[2] == "host [IP] ref [ID]"
    assert red[3] == "clean text with no pii at all"


def test_pii_redactor_email_digits_not_half_eaten():
    # the email is replaced FIRST, so its long digit run never
    # surfaces as a standalone [ID] match
    t = _docs_table([(1, "reach 123456789@example.com please")])
    out = PiiRedactor()(t)
    assert out["n_emails"].to_pylist() == [1]
    assert out["text_redacted"].to_pylist() == ["reach [EMAIL] please"]
    # counts are on the ORIGINAL text: the digit run inside the email
    # has no word boundary break, so n_ids sees the full run once
    assert out["n_ids"].to_pylist() == [1]


def test_inject_pii_deterministic_and_mod_gated():
    t = _docs_table([(0, "zero"), (1, "one"), (4, "four"), (5, "five")])
    out = inject_pii(t)
    texts = out["text"].to_pylist()
    assert texts[0] == "zero"          # doc_id % 4 == 0: untouched
    assert texts[2] == "four"
    assert "user1@example.com" in texts[1]
    assert " ref 100025" in texts[3]   # 5*5 + 100000
    # injection is a pure function: re-running yields identical text
    assert out["text"].to_pylist() == inject_pii(t)["text"].to_pylist()


def test_pii_redactor_empty_batch():
    out = PiiRedactor()(_docs_table([]))
    assert out.num_rows == 0
    assert set(out.column_names) == {
        "doc_id", "n_emails", "n_phones", "n_ips", "n_ids", "text_redacted"}


# ---------------------------------------------------------------------------
# gram machinery
# ---------------------------------------------------------------------------


def test_ascii_tokens_explicit_class():
    assert ascii_tokens("a  b\tc\nd") == ["a", "b", "c", "d"]
    # non-ASCII whitespace is NOT a separator (RE2 parity)
    assert ascii_tokens("a b c") == ["a b", "c"]
    assert ascii_tokens("   ") == []


def test_doc_gram_hashes_short_doc_empty():
    assert len(doc_gram_hashes("one two", 3)) == 0
    assert len(doc_gram_hashes("", 3)) == 0
    h = doc_gram_hashes("one two three four", 3)
    assert len(h) == 2  # two distinct 3-grams
    # distinct: repeated grams hash once
    h2 = doc_gram_hashes("a b a b a b", 2)  # grams: "a b", "b a"
    assert len(h2) == 2


def test_doc_gram_hashes_md5_matches_duckdb():
    import duckdb
    import hashlib

    g = "one two three"
    expect = int(hashlib.md5(g.encode()).hexdigest()[:16], 16)
    got = duckdb.sql(
        "SELECT CAST(('0x' || substr(md5('one two three'), 1, 16)) "
        "AS UBIGINT)").fetchone()[0]
    assert got == expect
    assert doc_gram_hashes(g, 3, "md5")[0] == np.uint64(expect)


# ---------------------------------------------------------------------------
# decontaminate / dup_ngram_counts (Ray paths)
# ---------------------------------------------------------------------------


def _corpus_ds(ray_session):
    import ray.data as rd

    # doc 0 and 97 are "eval" (doc_id % 97 == 0); doc 1 shares a
    # 3-gram with doc 0; doc 2 is disjoint; docs 3/4 duplicate each
    # other; doc 5 is too short to shingle
    rows = [
        (0, "alpha beta gamma delta"),
        (97, "epsilon zeta eta theta"),
        (1, "alpha beta gamma omega"),
        (2, "iota kappa lambda mu"),
        (3, "nu xi omicron pi rho"),
        (4, "nu xi omicron pi rho"),
        (5, "too short"),
    ]
    return rd.from_arrow(_docs_table(rows)), rows


def test_decontaminate(ray_session):
    ds, _ = _corpus_ds(ray_session)
    out = decontaminate(ds).to_pandas().sort_values("doc_id")
    # doc 1 shares exactly one 3-gram ("alpha beta gamma") with eval
    assert out["doc_id"].tolist() == [1]
    assert out["n"].tolist() == [1]


def test_decontaminate_empty_eval_split(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_docs_table([(1, "a b c d"), (2, "e f g h")]))
    out = decontaminate(ds).to_pandas()
    assert len(out) == 0


def test_decontaminate_budget_enforced(ray_session, monkeypatch):
    import orionbelt_ontology_builder_ray.stages.scrub as scrub

    ds, _ = _corpus_ds(ray_session)
    monkeypatch.setattr(scrub, "MAX_EVAL_GRAMS", 1)
    with pytest.raises(ValueError, match="broadcast"):
        scrub.decontaminate(ds).to_pandas()
    assert MAX_EVAL_GRAMS > 1_000_000  # real budget is generous


def test_dup_ngram_counts(ray_session):
    ds, _ = _corpus_ds(ray_session)
    out = dup_ngram_counts(ds).to_pandas().sort_values("doc_id")
    # docs 0 and 1 share 1 gram; docs 3 and 4 share all 3 grams
    assert out["doc_id"].tolist() == [0, 1, 3, 4]
    assert out["n"].tolist() == [1, 1, 3, 3]


def test_dup_ngram_counts_partition_invariant(ray_session):
    import ray.data as rd

    t = _docs_table([(i, f"w{i % 3} x{i % 2} common tail words {i}")
                     for i in range(40)])
    a = dup_ngram_counts(rd.from_arrow(t), k=2) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = dup_ngram_counts(rd.from_arrow(t).repartition(7), k=2,
                         num_buckets=3) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_gram_ops_hash_mode_agreement(ray_session):
    # fast and md5 hashes differ, but the COUNTS they induce agree
    import ray.data as rd

    t = _docs_table([(i, f"p{i % 4} q{i % 3} r s t u{i}")
                     for i in range(1, 30)])
    fast = dup_ngram_counts(rd.from_arrow(t), k=3, hash_mode="fast") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    md5 = dup_ngram_counts(rd.from_arrow(t), k=3, hash_mode="md5") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, md5)


# ---------------------------------------------------------------------------
# fused TextProfile == its three parts
# ---------------------------------------------------------------------------


def test_text_profile_matches_parts():
    from orionbelt_ontology_builder_ray.stages.textops import (
        Fingerprinter, LangId, QualityScorer, TextProfile)

    b = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [
            "the cat and the dog in the house",
            "der hund ist nicht ein vogel und das ist gut",
            "xyzzy plugh",
            "",
            "le chat est dans la maison et il est pour les chats",
            "a a a a a a a",
        ],
    })
    prof = TextProfile()(b)
    q = QualityScorer()(b)
    for c in ("n_chars", "n_tokens", "punct_ratio", "stopword_ratio",
              "distinct_token_ratio"):
        np.testing.assert_array_equal(prof[c].to_numpy(), q[c].to_numpy(), c)
    np.testing.assert_array_equal(
        prof["pred_lang"].to_numpy(), LangId()(b)["pred_lang"].to_numpy())
    np.testing.assert_array_equal(
        prof["fingerprint"].to_numpy(),
        Fingerprinter()(b)["fingerprint"].to_numpy())


def test_repetition_stats_hand_computed():
    from orionbelt_ontology_builder_ray.stages.textops import RepetitionStats

    stage = RepetitionStats()
    out = stage(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        # 1: "a b a b a" -> tokens: a x3 of 5; bigrams (a b)x2 (b a)x2
        #    of 4 -> top 2/4, distinct 2/4 -> dup 0.5; 5-grams: 1 of 1
        "text": ["a b a b a",
                 # 2: all-distinct 6 tokens, no repeats anywhere
                 "u v w x y z",
                 # 3: the same 5-gram twice ("a b c d e" x2)
                 "a b c d e a b c d e",
                 ""],  # 4: empty -> all zeros
    }))
    got = out.set_index("doc_id")
    assert got.loc[1, "top_token_frac"] == 3 / 5
    assert got.loc[1, "top_bigram_frac"] == 2 / 4
    assert got.loc[1, "dup_bigram_frac"] == 1 - 2 / 4
    assert got.loc[1, "dup_5gram_frac"] == 0.0
    assert got.loc[2, "top_token_frac"] == 1 / 6
    assert got.loc[2, "dup_bigram_frac"] == 0.0
    # doc 3: 10 tokens, 9 bigrams of which distinct = 5 ("e a" once,
    # others twice); 6 5-grams, distinct = 5 ("a b c d e" twice)
    assert got.loc[3, "dup_bigram_frac"] == 1 - 5 / 9
    assert got.loc[3, "dup_5gram_frac"] == 1 - 5 / 6
    assert (got.loc[4] == 0.0).all()


def test_repetition_stats_matches_duckdb_formula():
    """The fraction arithmetic (divide-then-subtract on exact ints)
    must be bit-identical to the SQL mirror's."""
    import duckdb

    from orionbelt_ontology_builder_ray.pipelines.oracles import (
        sql_doc_repetition)
    from orionbelt_ontology_builder_ray.stages.textops import RepetitionStats

    rng = np.random.RandomState(3)
    vocab = ["alpha", "beta", "gamma", "delta"]
    docs = pd.DataFrame({
        "doc_id": np.arange(40, dtype=np.int64),
        "text": [" ".join(rng.choice(vocab, rng.randint(0, 30)))
                 for _ in range(40)],
    })
    ours = RepetitionStats()(docs).sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", docs)
    theirs = con.sql(sql_doc_repetition()).df()
    pd.testing.assert_frame_equal(ours, theirs, check_exact=True)


def test_fingerprint_fast_mode_same_shape_and_md5_unchanged():
    """fast mode = same min-sampling semantics on a different hash
    family; md5 mode must keep its exact per-doc values (oracle
    contract)."""
    from orionbelt_ontology_builder_ray.stages.textops import Fingerprinter

    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["a b c d e", "a b c", "x", ""]})
    md5 = Fingerprinter(hash_mode="md5")(docs)
    fast = Fingerprinter(hash_mode="fast")(docs)
    assert list(md5.columns) == list(fast.columns)
    # identical texts -> identical fingerprints within each mode
    dup = pd.DataFrame({"doc_id": [0, 1], "text": ["a b c d e"] * 2})
    for mode in ("md5", "fast"):
        f = Fingerprinter(hash_mode=mode)(dup)["fingerprint"]
        assert f.iloc[0] == f.iloc[1]
    # md5 mode equals the hand-computable definition
    import hashlib

    grams = ["a b c", "b c d", "c d e"]
    expect = min(int(hashlib.md5(g.encode()).hexdigest()[:16], 16) >> 1
                 for g in grams)
    assert md5.loc[0, "fingerprint"] == expect


def test_repetition_stats_ascii_split_matches_duckdb_on_nbsp():
    """U+00A0 inside a token must NOT split it (RE2 '\\s' is
    ASCII-only; Python str.split would split — the BPE_TOKEN_RE
    contract applied to the repetition stats)."""
    import duckdb

    from orionbelt_ontology_builder_ray.pipelines.oracles import (
        sql_doc_repetition)
    from orionbelt_ontology_builder_ray.stages.textops import RepetitionStats

    docs = pd.DataFrame({
        "doc_id": np.array([0], dtype=np.int64),
        "text": ["a b a b c c c"]})
    ours = RepetitionStats()(docs)
    con = duckdb.connect()
    con.register("documents", docs)
    theirs = con.sql(sql_doc_repetition()).df()
    pd.testing.assert_frame_equal(ours.reset_index(drop=True), theirs,
                                  check_exact=True)
    # 5 ASCII-split tokens ('a\xa0b' stays whole; Python str.split
    # would see 7), top = 'c' x3
    assert ours.loc[0, "top_token_frac"] == 3 / 5


def test_gopher_filter_equals_stats_then_filter():
    from orionbelt_ontology_builder_ray.stages.textops import (
        GopherRepetitionFilter, RepetitionStats)

    rng = np.random.RandomState(13)
    vocab = ["a", "b", "c", "d", "e", "f"]
    docs = pd.DataFrame({
        "doc_id": np.arange(60, dtype=np.int64),
        "text": [" ".join(rng.choice(vocab, rng.randint(0, 25)))
                 for _ in range(60)]})
    out = GopherRepetitionFilter()(docs)
    s = RepetitionStats()(docs)
    keep = s[(s["top_token_frac"] <= 0.10)
             & (s["dup_bigram_frac"] <= 0.05)
             & (s["dup_5gram_frac"] <= 0.05)]["doc_id"]
    assert set(out["doc_id"]) == set(keep)
    got = out.set_index("doc_id")["n_tokens"]
    for d in out["doc_id"]:
        assert got[d] == len(docs.loc[d, "text"].split())


def test_tokenize_edge_whitespace_matches_duckdb():
    """Leading/trailing tabs/newlines (ADVICE r4, medium): DuckDB
    trim() strips only spaces, so the old trim+split oracle counted
    phantom empty tokens the Ray side filters.  All four tokenizing
    oracles must now agree with their Ray stages on edge-whitespace
    docs — pinned here on repetition, token counts, and bigrams."""
    import duckdb

    from orionbelt_ontology_builder_ray.pipelines.oracles import (
        sql_doc_ngram_stats, sql_doc_repetition, sql_doc_token_counts)
    from orionbelt_ontology_builder_ray.stages.textops import (
        BigramStats, RepetitionStats, TokenCounter)

    docs = pd.DataFrame({
        "doc_id": np.arange(7, dtype=np.int64),
        "text": ["\ta b", "a\tb\n", "\t\t", "", " x  y ",
                 "a a\nb b\tb", "\n\na a a\t"]})
    con = duckdb.connect()
    con.register("documents", docs)

    ours = RepetitionStats()(docs).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        ours, con.sql(sql_doc_repetition()).df(), check_exact=True)
    # '\ta b': 2 real tokens, top fraction 1/2 (old SQL said 1/3)
    assert ours.loc[0, "top_token_frac"] == 1 / 2

    import pyarrow as pa

    tc = TokenCounter()(pa.Table.from_pandas(docs)).to_pandas()
    sql_tc = con.sql(sql_doc_token_counts()).df()
    pd.testing.assert_frame_equal(tc.reset_index(drop=True), sql_tc,
                                  check_exact=True)
    assert tc.loc[2, "n_tokens"] == 0        # '\t\t' has no tokens

    bg = BigramStats()(docs).reset_index(drop=True)
    sql_bg = con.sql(sql_doc_ngram_stats()).df()
    pd.testing.assert_frame_equal(bg, sql_bg, check_exact=True)


def test_strip_dup_spans_brute_force(ray_session):
    """strip_dup_spans == a pure-Python occurrence-multiplicity
    reference: cross-doc duplicated spans stripped, WITHIN-doc
    repeats stripped (multiplicity semantics), short docs pass
    through, fully-covered docs become empty; partition-invariant."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.scrub import (
        ascii_tokens, strip_dup_spans)

    k = 3
    texts = [
        "the quick brown fox jumps over the lazy dog",   # 0: shares
        "a quick brown fox runs fast today ok",          # 1: shares
        "totally unique sentence with fresh words here",  # 2: clean
        "spam spam spam spam spam",                      # 3: self-dup
        "one two",                                       # 4: < k toks
        "the quick brown fox jumps",                     # 5: subset of 0
        "",                                              # 6: empty
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})

    # reference: count every k-gram occurrence corpus-wide
    from collections import Counter
    occ = Counter()
    for t in texts:
        toks = ascii_tokens(t)
        for i in range(len(toks) - k + 1):
            occ[" ".join(toks[i:i + k])] += 1
    expect = {}
    for d, t in zip(df["doc_id"], df["text"]):
        toks = ascii_tokens(t)
        cov = [False] * len(toks)
        for i in range(len(toks) - k + 1):
            if occ[" ".join(toks[i:i + k])] >= 2:
                for j in range(i, i + k):
                    cov[j] = True
        kept = [w for w, c in zip(toks, cov) if not c]
        expect[int(d)] = (" ".join(kept), len(kept))

    # sanity on the fixture itself: doc 3 self-dups away entirely,
    # doc 2 survives whole, doc 4 passes through
    assert expect[3] == ("", 0)
    assert expect[2][1] == 7 and expect[4] == ("one two", 2)
    assert expect[0][1] < 9  # shared prefix with doc 5 stripped

    for nparts in (1, 4):
        out = strip_dup_spans(rd.from_pandas(df).repartition(nparts),
                              k=k).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        got = {int(d): (t, int(n)) for d, t, n in zip(
            out["doc_id"], out["text_clean"], out["n_tokens_kept"])}
        assert got == expect


def test_strip_contaminated_spans_brute_force(ray_session):
    """strip_contaminated_spans == pure reference: tokens covered by
    any eval-split k-gram stripped from training docs, eval docs
    emit no row, gram-free docs pass through."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.scrub import (
        ascii_tokens, strip_contaminated_spans)

    k, eval_mod = 3, 5
    texts = [
        "the secret eval answer is forty two exactly",  # 0: eval
        "model output said the secret eval answer is forty two",  # 1
        "a completely clean training document here",    # 2
        "is forty two exactly what the oracle said",    # 3: tail hit
        "tiny doc",                                     # 4: < k, eval? 4%5!=0 -> training
        "another eval probe question text",             # 5: eval
        "another eval probe appears here in training",  # 6
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})

    eval_grams = set()
    for d, t in zip(df["doc_id"], df["text"]):
        if d % eval_mod == 0:
            toks = ascii_tokens(t)
            for i in range(len(toks) - k + 1):
                eval_grams.add(" ".join(toks[i:i + k]))
    expect = {}
    for d, t in zip(df["doc_id"], df["text"]):
        if d % eval_mod == 0:
            continue
        toks = ascii_tokens(t)
        cov = [False] * len(toks)
        for i in range(len(toks) - k + 1):
            if " ".join(toks[i:i + k]) in eval_grams:
                for j in range(i, i + k):
                    cov[j] = True
        kept = [w for w, c in zip(toks, cov) if not c]
        expect[int(d)] = (" ".join(kept), len(kept))
    assert expect[2][1] == 6 and expect[4] == ("tiny doc", 2)
    assert expect[1][1] < 10 and expect[6][1] < 7  # real strips

    for nparts in (1, 4):
        out = strip_contaminated_spans(
            rd.from_pandas(df).repartition(nparts), k=k,
            eval_mod=eval_mod).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        got = {int(d): (t, int(n)) for d, t, n in zip(
            out["doc_id"], out["text_clean"], out["n_tokens_kept"])}
        assert got == expect


def test_quality_classifier_lr_brute_force(ray_session):
    """Distributed full-batch logistic regression == a pure-numpy GD
    replay (same featurization, same iteration count) to float
    tolerance; the trained classifier separates the planted
    good/bad vocabularies; partition-invariant."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from orionbelt_ontology_builder_ray.stages.classifier import (
        _featurize_batch, _sigmoid, quality_scores_lr,
        train_quality_classifier)

    rng = np.random.RandomState(8)
    good_v = [f"fine{i}" for i in range(30)]
    bad_v = [f"junk{i}" for i in range(30)]
    texts, labels = [], []
    for i in range(200):
        y = i % 2
        voc = good_v if y else bad_v
        texts.append(" ".join(rng.choice(voc, rng.randint(5, 30))))
        labels.append(y)
    df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64),
                       "text": texts,
                       "label": np.array(labels, np.int64)})

    dim, n_iter, lr = 64, 20, 2.0
    # pure reference
    X = _featurize_batch(texts, dim)
    y = np.array(labels, np.float64)
    w_ref = np.zeros(dim + 1)
    for _ in range(n_iter):
        w_ref = w_ref - lr * ((_sigmoid(X @ w_ref) - y) @ X) / len(y)

    for nparts in (1, 6):
        w = train_quality_classifier(
            rd.from_pandas(df).repartition(nparts), n_iter=n_iter,
            lr=lr, dim=dim)
        # partial sums accumulate in a different order than one big
        # matmul; agreement is to float tolerance, not bit-exact
        np.testing.assert_allclose(w, w_ref, rtol=1e-9, atol=1e-12)

    scores = quality_scores_lr(rd.from_pandas(df), w, dim=dim) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    p = scores["quality_prob"].to_numpy()
    assert (p[1::2] > 0.5).mean() > 0.95  # good docs score high
    assert (p[0::2] < 0.5).mean() > 0.95  # bad docs score low


def test_quality_classifier_oracle_parity_random_corpus(
        ray_session, tmp_path):
    """queries.doc_quality_classifier == its unrolled-GD DuckDB
    mirror e6-exactly on a random corpus (md5 feature hashing,
    binary features, ROUND(w, 6) resync after every step) — the
    kmeans-style iterative-algorithm parity, pinned off the driver
    harness too."""
    import duckdb
    import numpy as np
    import pandas as pd

    from orionbelt_ontology_builder_ray.pipelines.oracles import (
        sql_doc_quality_classifier)
    from orionbelt_ontology_builder_ray.pipelines.queries import (
        doc_quality_classifier)

    rng = np.random.RandomState(17)
    voc = ["data", "table", "the", "fast", "slow", "row", "scan",
           "merge", "spark", "key"]
    texts = [" ".join(rng.choice(voc, rng.randint(0, 12)))
             for _ in range(120)]
    df = pd.DataFrame({"doc_id": np.arange(120, dtype=np.int64),
                       "text": texts})
    df.to_parquet(tmp_path / "documents.parquet")

    ours = doc_quality_classifier(str(tmp_path), dim=16, n_iter=5,
                                  lr=0.5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    sql = sql_doc_quality_classifier(dim=16, n_iter=5, lr=0.5,
                                     feat_mode="binary")
    want = con.execute(sql).df().sort_values("doc_id") \
        .reset_index(drop=True)

    assert len(ours) == 120 == len(want)
    pd.testing.assert_frame_equal(
        ours.astype({"quality_prob_e6": np.int64}),
        want.astype({"quality_prob_e6": np.int64}))
