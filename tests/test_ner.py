"""Statistical NER (stages/ner.py): hashed char-n-gram naive Bayes.

The SQL-mirror parity (train+score in DuckDB) is covered by the
kg_ner_mentions oracle; these tests pin the model semantics the mirror
relies on, plus the properties no oracle can show: generalization to
held-out surface forms and the scanner's batch invariants.
"""

import pandas as pd
import pytest

from orionbelt_ontology_builder_ray.stages.ner import (
    BACKGROUND, DEFAULT_BACKGROUND, N_FEATURES, NaiveBayesNER,
    NERMentionScanner, char_ngrams, feature_index, train_from_aliases,
)

PLACE = "http://example.org/kg#Place"
REGION = "http://example.org/kg#Region"


def _alias(names_places, names_regions):
    d = {}
    for n in names_places:
        d[n.casefold()] = ("uri:" + n, PLACE, n)
    for n in names_regions:
        d[n.casefold()] = ("uri:" + n, REGION, n)
    return d


PLACES = [f"NATION_{i}" for i in range(12)]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


def test_char_ngrams_exact():
    assert char_ngrams("ab") == ["^a", "ab", "b$", "^ab", "ab$", "^ab$"]
    # empty string still yields the boundary bigram
    assert char_ngrams("") == ["^$"]


def test_feature_index_deterministic_and_bounded():
    idx = [feature_index(g) for g in ("^a", "ab", "tion", "^$")]
    assert idx == [feature_index(g) for g in ("^a", "ab", "tion", "^$")]
    assert all(0 <= i < N_FEATURES for i in idx)


def test_training_set_precision_and_background_rejection():
    model = train_from_aliases(_alias(PLACES, REGIONS))
    assert model.classes == [BACKGROUND, "place", "region"]
    preds = model.predict(PLACES)
    assert preds == ["place"] * len(PLACES)
    assert model.predict(REGIONS) == ["region"] * len(REGIONS)
    assert model.predict([w.upper() for w in DEFAULT_BACKGROUND[:10]]) \
        == [BACKGROUND] * 10


def test_held_out_generalization():
    """The point of statistical NER over the gazetteer: surface forms
    ABSENT from the dictionary classify by character morphology."""
    train_places = [p for p in PLACES if p not in ("NATION_3", "NATION_7")]
    model = train_from_aliases(_alias(train_places, REGIONS))
    assert model.predict(["NATION_3", "NATION_7", "NATION_83"]) \
        == ["place", "place", "place"]
    assert model.predict(["ERROR", "JSON"]) == [BACKGROUND, BACKGROUND]


def test_fit_is_deterministic():
    a = train_from_aliases(_alias(PLACES, REGIONS))
    b = train_from_aliases(_alias(PLACES, REGIONS))
    spans = PLACES + REGIONS + ["HTTP", "NATION_99", "WEST EUROPE"]
    assert a.predict(spans) == b.predict(spans)
    assert (a.log_lik == b.log_lik).all()


def _batch(rows):
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"])


def test_scanner_batch_invariants():
    model = train_from_aliases(_alias(PLACES, REGIONS))
    scan = NERMentionScanner(model, base="kg:")
    # empty batch: typed empty frame
    out = scan(_batch([]))
    assert list(out.columns) == ["turn", "mention", "label"]
    assert len(out) == 0
    # no candidates: same schema
    out = scan(_batch([("c1", 0, "all lowercase text only")]))
    assert len(out) == 0 and list(out.columns) == ["turn", "mention", "label"]
    # dedup per (turn, mention); background filtered; multiword span
    out = scan(_batch([
        ("c1", 0, "saw [NATION_3] and NATION_3 again plus ERROR"),
        ("c1", 1, "in MIDDLE EAST with JSON payload"),
    ]))
    got = sorted(map(tuple, out[["turn", "mention", "label"]].to_numpy()))
    assert got == [
        ("kg:c1-t0", "NATION_3", "place"),
        ("kg:c1-t1", "MIDDLE EAST", "region"),
    ]


def test_scanner_unseen_entity_detected():
    """A surface form not in the alias dict is still found and typed —
    the capability the dictionary gazetteer lacks."""
    model = train_from_aliases(_alias(PLACES, REGIONS))
    scan = NERMentionScanner(model, base="kg:")
    out = scan(_batch([("c9", 4, "migrating [NATION_77] datasets")]))
    assert sorted(map(tuple, out.to_numpy())) \
        == [("kg:c9-t4", "NATION_77", "place")]


def test_query_matches_gazetteer_turn_counts(ray_session):
    """On the fixture corpus every mention surface is dictionary-known,
    so NER turn counts must agree with the gazetteer's per-surface
    counts (NER counts by raw surface, gazetteer by canonical entity)."""
    from orionbelt_ontology_builder_ray.pipelines.queries import (
        kg_gazetteer_mentions, kg_ner_mentions,
    )

    sf = "/root/testdata/sf0.001"
    ner = kg_ner_mentions(sf).to_pandas()
    gaz = kg_gazetteer_mentions(sf).to_pandas()
    ner_counts = dict(zip(ner["mention"], ner["n_turns"]))
    gaz_counts = dict(zip(gaz["surface"], gaz["n_turns"]))
    assert ner_counts == gaz_counts
    assert set(ner.loc[ner["label"] == "region", "mention"]) \
        == {"AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"}
