"""Distributed RDFS forward chaining (SURVEY.md §2.11, §7 step 9).

Semi-naive evaluation over a triples Dataset:

- schema rules (subClassOf/subPropertyOf transitivity) run driver-side
  on the schema slice — the class/property hierarchy is
  vocabulary-sized even at 10^12 assertions;
- instance rules (rdfs2/3/7/9: domain/range typing, subproperty
  propagation, type inheritance) run as ONE vectorized ``map_batches``
  pass per round over the assertion stream, joining each batch against
  the broadcast schema closure.  Rounds are bounded by hierarchy depth
  (1 pass suffices once the schema closure is precomputed).

The reference applies owlrl in-process over workbench-sized graphs
(ontology_manager.py:2853-2864); full OWL-RL on the assertion stream
is explicitly out of scope — the driver-side ``TripleStore.
apply_reasoning`` covers the schema plane.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Set

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.terms import (
    pool_size,
    OWL_INVERSE_OF, OWL_SYMMETRIC, OWL_TRANSITIVE,
    RDF_TYPE, RDFS_DOMAIN, RDFS_RANGE, RDFS_SUBCLASSOF, RDFS_SUBPROPERTYOF,
)
from .extract import TRIPLE_COLS


def _transitive_closure(edges) -> Dict[str, Set[str]]:
    parents = defaultdict(set)
    for a, b in edges:
        parents[a].add(b)
    changed = True
    while changed:
        changed = False
        for a in list(parents):
            expand = set()
            for b in parents[a]:
                expand |= parents.get(b, set())
            if not expand <= parents[a]:
                parents[a] |= expand
                changed = True
    return dict(parents)


def collect_schema(ds) -> dict:
    """Gather the (small) schema slice: subClassOf / subPropertyOf /
    domain / range edges -> closed maps ready to broadcast."""
    preds = [RDFS_SUBCLASSOF, RDFS_SUBPROPERTYOF, RDFS_DOMAIN, RDFS_RANGE]

    def slice_(t: pa.Table) -> pa.Table:
        # arrow-native corpus scan: the string columns never box into
        # pandas objects; only the schema-sized survivors do (below)
        import pyarrow.compute as pc

        keep = pc.and_(pc.and_(
            pc.is_in(t["predicate"], value_set=pa.array(preds)),
            pc.equal(t["object_kind"], "uri")),
            pc.invert(pc.starts_with(t["object"], "_:")))
        m = t.filter(keep).select(["subject", "predicate", "object"])
        return m.group_by(m.column_names).aggregate([])

    schema = ds.map_batches(slice_, batch_format="pyarrow").to_pandas()
    if schema.empty or "predicate" not in schema.columns:
        # an all-empty-blocks dataset can lose its schema entirely
        schema = pd.DataFrame({"subject": [], "predicate": [],
                               "object": []})
    schema = schema.drop_duplicates()
    by_pred = {p: list(zip(g["subject"], g["object"]))
               for p, g in schema.groupby("predicate")}
    return {
        "class_parents": _transitive_closure(by_pred.get(RDFS_SUBCLASSOF, [])),
        "prop_parents": _transitive_closure(by_pred.get(RDFS_SUBPROPERTYOF, [])),
        "domains": dict(by_pred.get(RDFS_DOMAIN, [])),
        "ranges": dict(by_pred.get(RDFS_RANGE, [])),
    }


class RdfsInferencer:
    """map_batches stage: emit inferred rows for one batch (input rows
    pass through; inferred rows appended; dedup happens downstream)."""

    def __init__(self, schema_ref):
        try:
            import ray

            if isinstance(schema_ref, ray.ObjectRef):
                schema_ref = ray.get(schema_ref)
        except ImportError:
            pass
        self.schema = schema_ref
        # exploded (child, parent) frames built ONCE per actor so the
        # per-batch rules are pure pandas merges — type rows are the
        # bulk of the stream at scale, so a per-row Python loop here
        # would dominate the whole closure
        s = schema_ref
        self._cls_parents = pd.DataFrame(
            [(c, p) for c, ps in s["class_parents"].items() for p in ps],
            columns=["_cls", "_parent"])
        self._prop_parents = pd.DataFrame(
            [(c, p) for c, ps in s["prop_parents"].items() for p in ps],
            columns=["_prop", "_parent"])

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = self.schema
        frames = [batch]

        def rows(subj, pred, obj, kind):
            return pd.DataFrame({
                "subject": subj, "predicate": pred, "object": obj,
                "object_kind": kind, "lang": "", "datatype": "",
            })

        # rdfs9: type inheritance through the closed class hierarchy
        # (vectorized merge of the batch's type rows against the
        # exploded child→parent frame)
        types = batch[(batch["predicate"] == RDF_TYPE)
                      & (batch["object_kind"] == "uri")]
        if len(types) and len(self._cls_parents):
            inh = types[["subject", "object"]].merge(
                self._cls_parents, left_on="object", right_on="_cls")
            if len(inh):
                frames.append(rows(inh["subject"].to_numpy(), RDF_TYPE,
                                   inh["_parent"].to_numpy(), "uri"))

        # rdfs7: subproperty propagation (copies the full row identity)
        if len(self._prop_parents):
            sub = batch.merge(self._prop_parents, left_on="predicate",
                              right_on="_prop")
            if len(sub):
                sub = sub.drop(columns=["predicate", "_prop"]).rename(
                    columns={"_parent": "predicate"})
                frames.append(sub[TRIPLE_COLS])

        # rdfs2/rdfs3: domain/range typing (through closure afterwards
        # via the emitted rdf:type rows + rdfs9 in the same pass order;
        # a second pass closes any remaining chain)
        dom = batch[batch["predicate"].isin(s["domains"].keys())]
        if len(dom):
            frames.append(rows(
                dom["subject"].to_numpy(),
                RDF_TYPE,
                dom["predicate"].map(s["domains"]).to_numpy(), "uri"))
        rng = batch[batch["predicate"].isin(s["ranges"].keys())
                    & (batch["object_kind"] == "uri")]
        if len(rng):
            frames.append(rows(
                rng["object"].to_numpy(),
                RDF_TYPE,
                rng["predicate"].map(s["ranges"]).to_numpy(), "uri"))
        return pd.concat(frames, ignore_index=True)[TRIPLE_COLS]


# ---------------------------------------------------------------------------
# OWL-RL instance rules (VERDICT r1 item 6): inverseOf / symmetric /
# transitive object-property semantics over the assertion stream,
# matching the reference's owl-rl profile surface
# (ontology_manager.py:2853-2864, app.py:2884) and the driver
# TripleStore.apply_reasoning("owl-rl") fixpoint (state/graph.py).
# ---------------------------------------------------------------------------


def collect_owl_schema(ds) -> dict:
    """Gather the (small) OWL property-characteristics slice:
    inverse-of pairs (both directions), symmetric and transitive
    property sets, and property-chain axioms (rdf-list walk over the
    schema slice) — schema-plane even at 10^12 assertions."""
    from ..functions.terms import (
        OWL_HAS_KEY, OWL_PROPERTY_CHAIN_AXIOM, RDF_FIRST, RDF_REST,
        walk_rdf_list,
    )

    preds = [OWL_INVERSE_OF, OWL_PROPERTY_CHAIN_AXIOM, OWL_HAS_KEY,
             RDF_FIRST, RDF_REST]

    def slice_(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.or_(
            pc.is_in(t["predicate"], value_set=pa.array(preds)),
            pc.and_(pc.equal(t["predicate"], RDF_TYPE),
                    pc.is_in(t["object"], value_set=pa.array(
                        [OWL_SYMMETRIC, OWL_TRANSITIVE]))))
        m = t.filter(keep).select(["subject", "predicate", "object"])
        return m.group_by(m.column_names).aggregate([])

    schema = ds.map_batches(slice_, batch_format="pyarrow").to_pandas()
    if schema.empty or "predicate" not in schema.columns:
        schema = pd.DataFrame({"subject": [], "predicate": [],
                               "object": []})
    schema = schema.drop_duplicates()
    inv = schema[schema["predicate"] == OWL_INVERSE_OF]
    inverses = {}
    for a, b in zip(inv["subject"], inv["object"]):
        inverses[a] = b
        inverses[b] = a
    typ = schema[schema["predicate"] == RDF_TYPE]
    first_map = dict(zip(
        schema[schema["predicate"] == RDF_FIRST]["subject"],
        schema[schema["predicate"] == RDF_FIRST]["object"]))
    rest_map = dict(zip(
        schema[schema["predicate"] == RDF_REST]["subject"],
        schema[schema["predicate"] == RDF_REST]["object"]))
    chains = []
    chain_rows = schema[schema["predicate"] == OWL_PROPERTY_CHAIN_AXIOM]
    for p, head in zip(chain_rows["subject"], chain_rows["object"]):
        members = walk_rdf_list(head, first_map, rest_map)
        if members:
            chains.append((p, members))
    keys = []
    key_rows = schema[schema["predicate"] == OWL_HAS_KEY]
    for c, head in zip(key_rows["subject"], key_rows["object"]):
        members = walk_rdf_list(head, first_map, rest_map)
        if members:
            keys.append((c, members))
    return {
        "inverses": inverses,
        "symmetric": set(typ[typ["object"] == OWL_SYMMETRIC]["subject"]),
        "transitive": set(typ[typ["object"] == OWL_TRANSITIVE]["subject"]),
        "chains": sorted(chains),
        "keys": sorted(keys),
    }


class OwlInferencer:
    """map_batches stage: inverse + symmetric rows for one batch (input
    passes through; local vectorized merges — transitivity is handled
    separately because it is inherently cross-batch)."""

    def __init__(self, owl_ref):
        try:
            import ray

            if isinstance(owl_ref, ray.ObjectRef):
                owl_ref = ray.get(owl_ref)
        except ImportError:
            pass
        self._inv = pd.DataFrame(owl_ref["inverses"].items(),
                                 columns=["_p", "_invp"])
        self._sym = sorted(owl_ref["symmetric"])

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        frames = [batch]
        uri = batch[batch["object_kind"] == "uri"]

        def flipped(df: pd.DataFrame, pred) -> pd.DataFrame:
            return pd.DataFrame({
                "subject": df["object"].to_numpy(),
                "predicate": pred,
                "object": df["subject"].to_numpy(),
                "object_kind": "uri", "lang": "", "datatype": ""})

        if len(self._inv) and len(uri):
            m = uri.merge(self._inv, left_on="predicate", right_on="_p")
            if len(m):
                frames.append(flipped(m, m["_invp"].to_numpy()))
        if self._sym:
            m = uri[uri["predicate"].isin(self._sym)]
            if len(m):
                frames.append(flipped(m, m["predicate"].to_numpy()))
        return pd.concat(frames, ignore_index=True)[TRIPLE_COLS]


def _edge_slice(ds, pred: str):
    def f(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch[(batch["predicate"] == pred)
                  & (batch["object_kind"] == "uri")]
        return m[["subject", "object"]].drop_duplicates()

    return ds.map_batches(f, batch_format="pandas")


def _compose_edges(left, right, num_buckets: int = 16):
    """left ∘ right (left.object == right.subject) via a bucket-hash
    join on the mid node."""

    def tag_l(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "k": df["object"], "v": df["subject"], "_side": np.int8(0),
            "_b": (pd.util.hash_pandas_object(df["object"], index=False)
                   % num_buckets).astype(np.int32)})

    def tag_r(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "k": df["subject"], "v": df["object"], "_side": np.int8(1),
            "_b": (pd.util.hash_pandas_object(df["subject"], index=False)
                   % num_buckets).astype(np.int32)})

    def join(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["_side"] == 0]
        r = df[df["_side"] == 1]
        m = l.merge(r, on="k", suffixes=("_l", "_r"))
        return pd.DataFrame({"subject": m["v_l"],
                             "object": m["v_r"]}).drop_duplicates()

    return left.map_batches(tag_l, batch_format="pandas").union(
        right.map_batches(tag_r, batch_format="pandas")) \
        .groupby("_b").map_groups(join, batch_format="pandas")


def property_chain_edges(ds, chains, num_buckets: int = 16):
    """prp-spo2 at the instance level, distributed: for each axiom
    q1 ∘ … ∘ qn ⊑ p, compose the qi edge relations left-to-right with
    bucket-hash joins and emit the derived p edges (full-schema rows).
    ``chains`` comes from collect_owl_schema (schema-plane)."""
    outs = []
    for p, chain in chains:
        cur = _edge_slice(ds, chain[0])
        for q in chain[1:]:
            cur = _compose_edges(cur, _edge_slice(ds, q), num_buckets)

        def widen(df: pd.DataFrame, pred=p) -> pd.DataFrame:
            return pd.DataFrame({
                "subject": df["subject"], "predicate": pred,
                "object": df["object"], "object_kind": "uri",
                "lang": "", "datatype": ""})[TRIPLE_COLS]

        outs.append(cur.map_batches(widen, batch_format="pandas"))
    if not outs:
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame(
            {c: pd.Series([], dtype=object) for c in TRIPLE_COLS}))
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out


def transitive_closure_edges(ds, transitive_preds, num_buckets: int = 16,
                             max_rounds: int = 10):
    """Materialize the transitive closure of the instance edges of the
    given predicates by iterative squaring (R ← R ∪ R∘R): each round is
    one bucket-hash self-join on the mid node + a dedup, so
    ``max_rounds`` covers paths up to 2^rounds long.  Returns a
    Dataset of NEW (full-schema) triple rows only."""
    preds = sorted(transitive_preds)
    if not preds:
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame(
            {c: pd.Series([], dtype=object) for c in TRIPLE_COLS}))

    def edge_slice(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.and_(pc.is_in(t["predicate"], value_set=pa.array(preds)),
                       pc.equal(t["object_kind"], "uri"))
        m = t.filter(keep).select(["predicate", "subject", "object"])
        return m.group_by(m.column_names).aggregate([])

    edges = ds.map_batches(edge_slice, batch_format="pyarrow").materialize()
    total = edges.count()

    def dedup_edges(e):
        def bucket(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["_b"] = (pd.util.hash_pandas_object(df["subject"],
                                                   index=False)
                        % num_buckets).astype(np.int32)
            return df

        def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
            return df.drop_duplicates(["predicate", "subject", "object"])[
                ["predicate", "subject", "object"]]

        return e.map_batches(bucket, batch_format="pandas") \
            .groupby("_b").map_groups(per_bucket, batch_format="pandas")

    for _ in range(max_rounds):
        # join edges.object == edges.subject per predicate (bucket on
        # the mid node; per-bucket pandas merge)
        def tag_left(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "predicate": df["predicate"], "a": df["subject"],
                "mid": df["object"], "_side": np.int8(0),
                "_b": (pd.util.hash_pandas_object(df["object"], index=False)
                       % num_buckets).astype(np.int32)})

        def tag_right(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "predicate": df["predicate"], "a": df["object"],
                "mid": df["subject"], "_side": np.int8(1),
                "_b": (pd.util.hash_pandas_object(df["subject"], index=False)
                       % num_buckets).astype(np.int32)})

        def compose(df: pd.DataFrame) -> pd.DataFrame:
            left = df[df["_side"] == 0]
            right = df[df["_side"] == 1]
            m = left.merge(right, on=["predicate", "mid"],
                           suffixes=("_l", "_r"))
            # keep reflexive derivations: a cycle under a transitive
            # property entails a P a (driver parity, graph.py rdfs-owl
            # fixpoint derives it too)
            return pd.DataFrame({
                "predicate": m["predicate"],
                "subject": m["a_l"], "object": m["a_r"]
            }).drop_duplicates()

        new = edges.map_batches(tag_left, batch_format="pandas").union(
            edges.map_batches(tag_right, batch_format="pandas")) \
            .groupby("_b").map_groups(compose, batch_format="pandas")
        edges = dedup_edges(edges.union(new)).materialize()
        grown = edges.count()
        if grown == total:
            break
        total = grown

    def widen(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "subject": df["subject"], "predicate": df["predicate"],
            "object": df["object"], "object_kind": "uri",
            "lang": "", "datatype": ""})[TRIPLE_COLS]

    return edges.map_batches(widen, batch_format="pandas")


def _empty_triples():
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame(
        {c: pd.Series([], dtype=object) for c in TRIPLE_COLS}))


def has_key_same_as_edges(ds, keys, num_buckets: int = 16):
    """prp-key distributed (reference's "OWL-RL Extended" profile,
    app.py:2887): for each (class, [key properties]) axiom from
    collect_owl_schema, individuals of the class sharing a value for
    EVERY key property are owl:sameAs.

    Shape: one subject-hash bucket shuffle co-locates each
    individual's typed/value rows (partitioning assumption: an
    individual's key rows fit one group — they are per-entity, not
    per-corpus); each bucket emits the cartesian key-combo strings per
    individual; a second combo-hash bucket groupby finds combos shared
    by >1 individual and emits (min sameAs other) edges.  The
    symmetric/transitive closure is completed by replicate_same_as.
    Only rows touching keyed classes/properties enter the shuffle."""
    from itertools import product

    from ..functions.terms import OWL_SAME_AS, is_bnode

    if not keys:
        return _empty_triples()
    keys_list = [(c, list(ps)) for c, ps in keys]
    keyed_classes = sorted({c for c, _ in keys_list})
    key_props = sorted({p for _, ps in keys_list for p in ps})

    def slice_(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.or_(
            pc.and_(pc.equal(t["predicate"], RDF_TYPE),
                    pc.is_in(t["object"],
                             value_set=pa.array(keyed_classes))),
            pc.is_in(t["predicate"], value_set=pa.array(key_props)))
        m = t.filter(keep).select(["subject", "predicate", "object",
                                   "object_kind", "lang", "datatype"])
        m = m.group_by(m.column_names).aggregate([])
        # only the (small) keyed survivors box into pandas for the hash
        h = pd.util.hash_pandas_object(m["subject"].to_pandas(),
                                       index=False).to_numpy()
        return m.append_column(
            "_b", pa.array((h % num_buckets).astype(np.int32)))

    def combos_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out_combo: list = []
        out_subj: list = []
        typed = df[df["predicate"] == RDF_TYPE]
        vals = df[df["predicate"] != RDF_TYPE]
        val_groups = {s: g for s, g in vals.groupby("subject")} \
            if len(vals) else {}
        for ci, (c, props) in enumerate(keys_list):
            for x in typed.loc[typed["object"] == c, "subject"].unique():
                if is_bnode(x):
                    continue
                g = val_groups.get(x)
                if g is None:
                    continue
                sets = []
                for p in props:
                    vs = g[g["predicate"] == p]
                    if not len(vs):
                        break
                    sets.append({
                        "\x01".join((o, k, la, d)) for o, k, la, d in zip(
                            vs["object"], vs["object_kind"],
                            vs["lang"], vs["datatype"])})
                else:
                    for combo in product(*sets):
                        out_combo.append(f"{ci}\x02" + "\x02".join(combo))
                        out_subj.append(x)
        return pd.DataFrame({"_combo": pd.Series(out_combo, dtype=object),
                             "subject": pd.Series(out_subj, dtype=object)})

    combos = ds.map_batches(slice_, batch_format="pyarrow") \
        .groupby("_b").map_groups(combos_in_bucket, batch_format="pandas")

    def rebucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_b"] = (pd.util.hash_pandas_object(df["_combo"], index=False)
                    % num_buckets).astype(np.int32)
        return df

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        subs: list = []
        objs: list = []
        for _, g in df.groupby("_combo", sort=False):
            xs = sorted(g["subject"].unique())
            for y in xs[1:]:
                subs.append(xs[0])
                objs.append(y)
        n = len(subs)
        return pd.DataFrame({
            "subject": pd.Series(subs, dtype=object),
            "predicate": pd.Series([OWL_SAME_AS] * n, dtype=object),
            "object": pd.Series(objs, dtype=object),
            "object_kind": pd.Series(["uri"] * n, dtype=object),
            "lang": pd.Series([""] * n, dtype=object),
            "datatype": pd.Series([""] * n, dtype=object)})[TRIPLE_COLS]

    return combos.map_batches(rebucket, batch_format="pandas") \
        .groupby("_b").map_groups(pairs_in_bucket, batch_format="pandas")


def replicate_same_as(ds, num_buckets: int = 16):
    """prp-eq with statement replication, distributed — the option for
    users who need sameAs statements PRESERVED rather than rewritten
    (the default scale treatment is stages/canonicalize.py, which
    rewrites references onto the canonical member; see the
    apply_owl_closure docstring for the trade).

    The sameAs alias graph is collected to the driver (documented
    boundary: the alias EDGE set must fit driver memory — it is
    vocabulary-sized in workbench ontologies; at assertion-scale alias
    graphs use canonicalization instead), union-found, and the member
    -> alias-group map broadcast once via ``ray.put``.  Each assertion
    batch then expands subject/object across their alias groups —
    non-alias rows (the overwhelming majority) pass through untouched
    by a vectorized mask; the full symmetric/transitive sameAs closure
    ships as one small driver-built frame.  Output needs a dedup
    downstream (apply_owl_closure runs one each round)."""
    import ray
    import ray.data as rd

    from ..functions.terms import OWL_SAME_AS

    def same_slice(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.and_(pc.equal(t["predicate"], OWL_SAME_AS),
                       pc.equal(t["object_kind"], "uri"))
        m = t.filter(keep).select(["subject", "object"])
        return m.group_by(m.column_names).aggregate([])

    edges = ds.map_batches(same_slice, batch_format="pyarrow").to_pandas()
    if edges.empty or "subject" not in edges.columns:
        return ds
    edges = edges.drop_duplicates()

    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(edges["subject"], edges["object"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members = defaultdict(set)
    for x in parent:
        members[find(x)].add(x)
    alias = {x: tuple(sorted(members[find(x)])) for x in parent
             if len(members[find(x)]) > 1}
    if not alias:
        return ds
    ref = ray.put(alias)

    class Replicator:
        def __init__(self):
            self.alias = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            non_same = batch[batch["predicate"] != OWL_SAME_AS]
            hit_s = non_same["subject"].isin(self.alias)
            hit_o = (non_same["object"].isin(self.alias)
                     & (non_same["object_kind"] == "uri"))
            todo = non_same[hit_s | hit_o]
            frames = [batch]  # originals pass through; dedup downstream
            rows = {c: [] for c in TRIPLE_COLS}
            for t in todo.itertuples(index=False):
                subs = self.alias.get(t.subject, (t.subject,))
                objs = self.alias.get(t.object, (t.object,)) \
                    if t.object_kind == "uri" else (t.object,)
                for s2 in subs:
                    for o2 in objs:
                        rows["subject"].append(s2)
                        rows["predicate"].append(t.predicate)
                        rows["object"].append(o2)
                        rows["object_kind"].append(t.object_kind)
                        rows["lang"].append(t.lang)
                        rows["datatype"].append(t.datatype)
            if rows["subject"]:
                frames.append(pd.DataFrame(
                    {c: pd.Series(v, dtype=object)
                     for c, v in rows.items()}))
            return pd.concat(frames, ignore_index=True)[TRIPLE_COLS]

    closure_rows = {c: [] for c in TRIPLE_COLS}
    for group in {g: None for g in alias.values()}:
        for x in group:
            for y in group:
                if x != y:
                    closure_rows["subject"].append(x)
                    closure_rows["predicate"].append(OWL_SAME_AS)
                    closure_rows["object"].append(y)
                    closure_rows["object_kind"].append("uri")
                    closure_rows["lang"].append("")
                    closure_rows["datatype"].append("")
    closure = rd.from_pandas(pd.DataFrame(
        {c: pd.Series(v, dtype=object) for c, v in closure_rows.items()}))

    out = ds.map_batches(Replicator, batch_format="pandas",
                         concurrency=pool_size())
    return out.union(closure)


def apply_owl_closure(ds, max_rounds: int = 5, profile: str = "owl-rl",
                      replicate_same_as_stmts: bool | None = None):
    """Dataset -> Dataset with the OWL-RL(-lite) closure materialized:
    the RDFS rules plus inverseOf / symmetric / transitive /
    property-chain instance rules, mirroring the driver's
    apply_reasoning("owl-rl") fixpoint.  ``profile="owl-rl-ext"``
    additionally runs prp-key (owl:hasKey -> owl:sameAs,
    has_key_same_as_edges) and full prp-eq sameAs statement
    replication, matching the driver's "owl-rl-ext" profile (the
    reference's "OWL-RL Extended", app.py:2887).

    Outer rounds interleave the rule families so derivations that feed
    each other (e.g. an inverse edge of a transitive property) close;
    each round ends in an exact dedup, and iteration stops at fixpoint
    (row count stable) or after ``max_rounds``.

    Deliberate scale boundary: under the default profile owl:sameAs is
    NOT replicated — at assertion scale, replication multiplies the
    stream by alias-class size; the canonicalization stage
    (stages/canonicalize.py) is the scale-correct treatment (rewrite
    every reference onto the canonical member).  Users who need sameAs
    statements preserved opt in with
    ``replicate_same_as_stmts=True`` (defaults to True only for the
    ext profile); see replicate_same_as for its driver-memory
    boundary."""
    try:
        import ray

        put = ray.put
    except ImportError:
        put = lambda x: x  # noqa: E731
    from .dedup import dedup_triples

    ext = profile == "owl-rl-ext"
    if replicate_same_as_stmts is None:
        replicate_same_as_stmts = ext

    out = ds.materialize()
    total = out.count()
    for _ in range(max_rounds):
        # both schema slices come off the materialized round input (one
        # scan each, no re-execution of lazy inferencer stages)
        schema_ref = put(collect_schema(out))
        owl = collect_owl_schema(out)
        owl_ref = put(owl)
        out = out.map_batches(RdfsInferencer,
                              fn_constructor_kwargs=dict(schema_ref=schema_ref),
                              batch_format="pandas", concurrency=pool_size())
        out = out.map_batches(OwlInferencer,
                              fn_constructor_kwargs=dict(owl_ref=owl_ref),
                              batch_format="pandas", concurrency=pool_size())
        out = dedup_triples(out.materialize())
        if owl["transitive"]:
            closed = transitive_closure_edges(out, owl["transitive"])
            out = dedup_triples(out.union(closed))
        if owl["chains"]:
            derived = property_chain_edges(out.materialize(), owl["chains"])
            out = dedup_triples(out.union(derived))
        if ext and owl["keys"]:
            same = has_key_same_as_edges(out.materialize(), owl["keys"])
            out = dedup_triples(out.union(same))
        out = out.materialize()
        grown = out.count()
        if grown == total and replicate_same_as_stmts:
            # run replication only once the rule stages are stable:
            # both operators are monotone, so interleaving order does
            # not change the joint fixpoint — but replicating every
            # round paid a full-corpus expansion pass + dedup shuffle
            # per round even when no sameAs state had changed.  If
            # replication adds rows, the loop continues and the rules
            # see them next round.
            out = dedup_triples(replicate_same_as(out)).materialize()
            grown = out.count()
        if grown == total:
            break
        total = grown
    return out


def apply_rdfs_closure(ds, rounds: int = 2):
    """Dataset -> Dataset with the RDFS closure materialized.

    ``rounds=2`` closes domain/range-derived types through the class
    hierarchy (round 1 emits the type, round 2 inherits it); the
    schema hierarchies themselves are pre-closed driver-side, so no
    further rounds are needed.
    """
    try:
        import ray

        schema_ref = ray.put(collect_schema(ds))
    except ImportError:
        schema_ref = collect_schema(ds)
    from .dedup import dedup_triples

    out = ds
    for _ in range(rounds):
        out = out.map_batches(RdfsInferencer,
                              fn_constructor_kwargs=dict(schema_ref=schema_ref),
                              batch_format="pandas", concurrency=pool_size())
        out = dedup_triples(out)
    return out
