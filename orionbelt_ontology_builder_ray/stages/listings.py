"""Entity-listing projections as Dataset ops (SURVEY.md §2.5).

Each listing is: predicate/type-filtered projection -> groupby(subject)
re-assembly.  The filters are vectorized Arrow; group re-assembly uses
``map_groups`` only where the group count is entity-scale (bounded by
the vocabulary, not the corpus).

Reference parity: get_classes om:487-515, hierarchy om:517-528,
individuals om:1061-1097, statistics om:2868-2901, concepts
om:1480-1539.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.terms import (
    OWL_CLASS, OWL_NAMED_INDIVIDUAL, RDF_TYPE, RDFS_COMMENT, RDFS_LABEL,
    RDFS_SUBCLASSOF, SKOS_CONCEPT, SKOS_PREF_LABEL,
)


def _filter_pred(ds, predicate: str, columns=("subject", "object")):
    return ds.map_batches(
        lambda t: t.filter(pc.equal(t["predicate"], predicate))
        .select(list(columns)),
        batch_format="pyarrow")


def typed_subjects(ds, type_uri: str):
    """Distinct subjects with ``rdf:type type_uri``."""
    rows = ds.map_batches(
        lambda t: t.filter(pc.and_(pc.equal(t["predicate"], RDF_TYPE),
                                   pc.equal(t["object"], type_uri)))
        .select(["subject"]).group_by(["subject"]).aggregate([]),
        batch_format="pyarrow")
    return rows.groupby("subject").map_groups(lambda t: t.slice(0, 1),
                                              batch_format="pyarrow")


def type_counts(ds):
    """groupby(object).count over rdf:type rows (statistics basis)."""
    from ray.data.aggregate import Count

    typed = ds.map_batches(
        lambda t: t.filter(pc.equal(t["predicate"], RDF_TYPE))
        .select(["object"]),
        batch_format="pyarrow")
    out = typed.groupby("object").aggregate(Count(alias_name="n"))
    return out.map_batches(lambda t: t.rename_columns(["type_uri", "n"]),
                           batch_format="pyarrow")


def _fetch(ds, columns) -> pd.DataFrame:
    """to_pandas that survives all-empty results (schema loss)."""
    df = ds.to_pandas()
    if list(df.columns) != list(columns):
        return pd.DataFrame({c: pd.Series([], dtype=str) for c in columns})
    return df


def class_listing(ds) -> pd.DataFrame:
    """get_classes as a Dataset job: classes with label/comment and
    parent/child counts; returns a (small) entity-scale frame sorted by
    local name."""
    from ..functions.terms import local_name

    classes = _fetch(typed_subjects(ds, OWL_CLASS), ["subject"])
    labels = _fetch(_filter_pred(ds, RDFS_LABEL), ["subject", "object"]) \
        .sort_values(["subject", "object"]).drop_duplicates("subject") \
        .rename(columns={"object": "label"})
    comments = _fetch(_filter_pred(ds, RDFS_COMMENT), ["subject", "object"]) \
        .sort_values(["subject", "object"]).drop_duplicates("subject") \
        .rename(columns={"object": "comment"})
    sub = ds.map_batches(
        lambda t: t.filter(pc.and_(pc.equal(t["predicate"], RDFS_SUBCLASSOF),
                                   pc.equal(t["object_kind"], "uri")))
        .select(["subject", "object"]),
        batch_format="pyarrow").to_pandas().drop_duplicates()
    out = classes.merge(labels, on="subject", how="left") \
        .merge(comments, on="subject", how="left")
    parent_counts = sub.groupby("subject").size().rename("n_parents")
    child_counts = sub.groupby("object").size().rename("n_children")
    out = out.merge(parent_counts, left_on="subject", right_index=True,
                    how="left")
    out = out.merge(child_counts, left_on="subject", right_index=True,
                    how="left")
    out["label"] = out["label"].fillna("")
    out["comment"] = out["comment"].fillna("")
    out["n_parents"] = out["n_parents"].fillna(0).astype("int64")
    out["n_children"] = out["n_children"].fillna(0).astype("int64")
    out["name"] = out["subject"].map(local_name)
    return out.sort_values("name").reset_index(drop=True)[
        ["subject", "name", "label", "comment", "n_parents", "n_children"]]


def individuals_by_class(ds):
    """(class_uri, n_individuals): instances per class — the instance
    typing view of get_individuals (om:1061-1097)."""
    from ray.data.aggregate import Count

    named = typed_subjects(ds, OWL_NAMED_INDIVIDUAL)
    named_set = set(named.to_pandas()["subject"])

    def class_edges(t: pa.Table) -> pa.Table:
        m = t.filter(pc.and_(pc.equal(t["predicate"], RDF_TYPE),
                             pc.invert(pc.equal(t["object"],
                                                OWL_NAMED_INDIVIDUAL))))
        return m.select(["subject", "object"]).group_by(
            ["subject", "object"]).aggregate([])

    edges = ds.map_batches(class_edges, batch_format="pyarrow")
    edges = edges.groupby(["subject", "object"]).map_groups(
        lambda t: t.slice(0, 1), batch_format="pyarrow")
    import numpy as np

    def only_named(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["subject"].isin(named_set)]

    named_edges = edges.map_batches(only_named, batch_format="pandas")
    out = named_edges.groupby("object").aggregate(
        Count(alias_name="n_individuals"))
    return out.map_batches(
        lambda t: t.rename_columns(["class_uri", "n_individuals"]),
        batch_format="pyarrow")


def concept_listing(ds) -> pd.DataFrame:
    """get_concepts distilled: concept uri + first prefLabel."""
    concepts = typed_subjects(ds, SKOS_CONCEPT).to_pandas()
    labels = _filter_pred(ds, SKOS_PREF_LABEL).to_pandas() \
        .sort_values(["subject", "object"]).drop_duplicates("subject") \
        .rename(columns={"object": "prefLabel"})
    out = concepts.merge(labels, on="subject", how="left")
    out["prefLabel"] = out["prefLabel"].fillna("")
    return out.sort_values("subject").reset_index(drop=True)
