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


def individuals_by_class(ds, num_buckets: int = 64):
    """(class_uri, n_individuals): instances per class — the instance
    typing view of get_individuals (om:1061-1097).

    Bucket-hash semi-join: a subject's NamedIndividual marker row and
    its class-type rows co-locate in the same hash(subject) bucket, so
    the "is it a named individual" check is a vectorized per-bucket
    pandas join and only (class_uri, partial count) rows leave each
    bucket.  This replaces the previous shape — a corpus-sized driver
    set of every individual URI pickled into each task PLUS two
    per-subject groupbys (millions of 1-row groups, the measured Ray
    sort-groupby cliff) — with ONE shuffle of the distinct type pairs
    into ``num_buckets`` groups."""
    from ray.data.aggregate import Sum

    nb = num_buckets
    pair_schema = pa.schema([("subject", pa.string()),
                             ("object", pa.string()),
                             ("_bucket", pa.int32())])

    def type_pairs(t: pa.Table) -> pa.Table:
        m = t.filter(pc.equal(t["predicate"], RDF_TYPE))
        m = m.select(["subject", "object"]).group_by(
            ["subject", "object"]).aggregate([])  # per-batch dedup
        df = m.to_pandas()
        h = pd.util.hash_pandas_object(df["subject"], index=False)
        df["_bucket"] = (h % nb).astype("int32")
        return pa.Table.from_pandas(df, schema=pair_schema,
                                    preserve_index=False)

    pairs = ds.map_batches(type_pairs, batch_format="pyarrow")

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["subject", "object"])
        marker = g["object"] == OWL_NAMED_INDIVIDUAL
        named = set(g.loc[marker, "subject"])  # bucket-scoped, bounded
        cls = g[~marker & g["subject"].isin(named)]
        out = cls.groupby("object").size().reset_index(name="n_individuals")
        return out.rename(columns={"object": "class_uri"})[
            ["class_uri", "n_individuals"]]

    parts = pairs.groupby("_bucket").map_groups(bucket_counts,
                                                batch_format="pandas")
    return parts.groupby("class_uri").aggregate(
        Sum("n_individuals", alias_name="n_individuals"))


def concept_listing(ds) -> pd.DataFrame:
    """get_concepts distilled: concept uri + first prefLabel."""
    concepts = typed_subjects(ds, SKOS_CONCEPT).to_pandas()
    labels = _filter_pred(ds, SKOS_PREF_LABEL).to_pandas() \
        .sort_values(["subject", "object"]).drop_duplicates("subject") \
        .rename(columns={"object": "prefLabel"})
    out = concepts.merge(labels, on="subject", how="left")
    out["prefLabel"] = out["prefLabel"].fillna("")
    return out.sort_values("subject").reset_index(drop=True)
