"""Stage 2: entity linking against an actor-resident alias dictionary.

The linker is a stateful actor-pool stage: the alias dictionary is
broadcast once (``ray.put`` on the driver), fetched in ``__init__``
(once per actor), and applied per batch with a vectorized pandas map —
the distributed analog of the reference's label-index lookups
(ontology_manager.py:2326-2328 search fields; skos:prefLabel /
rdfs:label alias machinery).

Triple rows pass through untouched; ``object_kind == "mention"`` rows
are resolved: matched surface forms become ``kg:mentions`` object
triples plus the linked entity's ``add_individual`` + ``prefLabel``
pattern; unmatched mentions are dropped (NIL linking).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import pandas as pd

from ..functions.kg import KG, KG_PLACE, KG_REGION, PREF_LABEL, NAMED_INDIVIDUAL
from ..functions.terms import RDF_TYPE
from .extract import MENTION_KIND, TRIPLE_COLS, _const_frame

# surface form -> (entity_uri, class_uri, canonical_label)
AliasDict = Dict[str, Tuple[str, str, str]]


def build_alias_dict(sf_dir: str, base: str = KG) -> AliasDict:
    """Alias dictionary from the dimension tables (driver-side, tiny).

    Keys are casefolded surface forms; values carry the canonical URI,
    class, and display label.  At 100 TB this dict is still
    vocabulary-sized (entities, not turns) — broadcast, never joined.
    """
    import pyarrow.parquet as pq

    alias: AliasDict = {}
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_name"])
    for name in nation.column("n_name").to_pylist():
        alias[name.casefold()] = (
            base + "place-" + name.lower().replace(" ", "_"), KG_PLACE, name)
    region = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_name"])
    for name in region.column("r_name").to_pylist():
        alias[name.casefold()] = (
            base + "region-" + name.lower().replace(" ", "_"), KG_REGION, name)
    return alias


def alias_dict_from_store(store, class_by_subject=None, base: str = KG) -> AliasDict:
    """Alias dict from a schema store's label triples (rdfs:label /
    skos:prefLabel / skos:altLabel) — the seed-ontology path."""
    from ..functions.terms import RDFS_LABEL, SKOS_ALT_LABEL, SKOS_PREF_LABEL

    alias: AliasDict = {}
    for t in store.rows:
        if t.predicate in (SKOS_PREF_LABEL, RDFS_LABEL, SKOS_ALT_LABEL) \
                and t.object_kind == "literal":
            cls = (class_by_subject or {}).get(t.subject, "")
            alias.setdefault(t.object.casefold(), (t.subject, cls, t.object))
    return alias


class ExtractLinkFused:
    """Fused stage-1+2 (+ optional dedup-hash combiner) actor:
    TripleExtractor -> EntityLinker chained in-process.

    Semantically identical to running the two stages as separate actor
    pools; physically it saves two pandas<->Arrow round-trips and an
    object-store hop per batch, and puts ALL the heavy per-turn work
    behind ONE pool that can be sized to the whole node.  Used by the
    flagship/bench path; the separate stages remain for composition.
    """

    def __init__(self, alias_ref, emit_ts: bool = True,
                 with_dedup_hash: bool = True,
                 with_local_dedup: bool = False):
        from .extract import TripleExtractor

        self.extract = TripleExtractor(emit_ts=emit_ts)
        self.link = EntityLinker(alias_ref)
        self.with_dedup_hash = with_dedup_hash
        self.with_local_dedup = with_local_dedup

    def __call__(self, batch: pd.DataFrame):
        out = self.link(self.extract(batch))
        if not (self.with_dedup_hash or self.with_local_dedup):
            return out
        import pyarrow as pa

        table = pa.Table.from_pandas(out, preserve_index=False)
        if self.with_dedup_hash:
            from .dedup import _DedupAndHash

            return _DedupAndHash()(table)
        from .dedup import _local_dedup

        return _local_dedup(table)


class EntityLinker:
    """``map_batches(EntityLinker, fn_constructor_kwargs=..., concurrency=N)``.

    ``alias_ref`` may be a plain dict (tests) or a ``ray.ObjectRef``
    from ``ray.put`` (broadcast path).
    """

    def __init__(self, alias_ref):
        try:
            import ray

            if isinstance(alias_ref, ray.ObjectRef):
                alias_ref = ray.get(alias_ref)
        except ImportError:  # pure-driver tests without ray
            pass
        self.alias: AliasDict = alias_ref
        self._uri_map = {k: v[0] for k, v in self.alias.items()}
        self._cls_map = {k: v[1] for k, v in self.alias.items()}
        self._label_map = {k: v[2] for k, v in self.alias.items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        kinds = batch["object_kind"].to_numpy()
        mention_mask = kinds == MENTION_KIND
        if not mention_mask.any():
            return batch
        passthrough = batch[~mention_mask]
        mentions = batch[mention_mask]
        surface = mentions["object"].str.casefold()
        uri = surface.map(self._uri_map)
        hit = uri.notna().to_numpy()
        if not hit.any():
            return passthrough[TRIPLE_COLS]
        uri = uri.to_numpy(dtype=object)[hit]
        cls = surface.map(self._cls_map).to_numpy(dtype=object)[hit]
        label = surface.map(self._label_map).to_numpy(dtype=object)[hit]
        subj = mentions["subject"].to_numpy(dtype=object)[hit]
        pred = mentions["predicate"].to_numpy(dtype=object)[hit]

        mention_triples = pd.DataFrame({
            "subject": subj, "predicate": pred, "object": uri,
            "object_kind": np.repeat("uri", len(uri)),
            "lang": np.repeat("", len(uri)),
            "datatype": np.repeat("", len(uri)),
        })
        # entity triples repeat once per mention occurrence — dedup
        # within the batch before emitting (combiner; cuts the volume
        # entering the global dedup shuffle)
        ent = pd.DataFrame({"uri": uri, "cls": cls,
                            "label": label}).drop_duplicates("uri")
        e_uri = ent["uri"].to_numpy(dtype=object)
        entity_frames = [
            _const_frame(e_uri, RDF_TYPE, NAMED_INDIVIDUAL),
            pd.DataFrame({
                "subject": e_uri, "predicate": np.repeat(RDF_TYPE, len(e_uri)),
                "object": ent["cls"].to_numpy(dtype=object),
                "object_kind": np.repeat("uri", len(e_uri)),
                "lang": np.repeat("", len(e_uri)),
                "datatype": np.repeat("", len(e_uri)),
            }),
            _const_frame(e_uri, PREF_LABEL, ent["label"].to_numpy(dtype=object),
                         "literal"),
        ]
        out = pd.concat([passthrough] + [mention_triples] + entity_frames,
                        ignore_index=True)
        return out[TRIPLE_COLS]


# Above this many aliases the scanner compiles a prefix-sharing trie
# regex instead of a flat longest-first alternation: Python `re`
# alternation retries every alternative at every position (linear in
# alternative count), while the trie pattern shares prefixes so each
# position costs O(longest alias).  Measured crossover is well under
# this (tests pass both engines on 10k aliases); the threshold only
# keeps tiny dicts on the simpler pattern.
GAZETTEER_TRIE_THRESHOLD = 256


def _trie_regex(keys) -> str:
    """Build a prefix-trie regex equivalent to longest-first
    alternation of ``keys``: at every node child branches are a greedy
    optional group, so backtracking prefers the LONGEST alias at each
    match position — identical match semantics to
    ``"|".join(sorted(keys, key=len, reverse=True))``."""
    import re

    trie: dict = {}
    for k in keys:
        node = trie
        for ch in k:
            node = node.setdefault(ch, {})
        node[""] = True  # end-of-alias marker

    def emit(node: dict) -> str:
        end = "" in node
        chars = sorted(c for c in node if c != "")
        if not chars:
            return ""
        alts = [re.escape(c) + emit(node[c]) for c in chars]
        body = "|".join(alts)
        if end:
            return "(?:" + body + ")?"
        return alts[0] if len(alts) == 1 else "(?:" + body + ")"

    return emit(trie)


class GazetteerMentionScanner:
    """NER-style dictionary mention detection over UNMARKED text
    (actor-pool stage): one combined word-bounded regex over every
    known alias, compiled once per actor from the broadcast alias
    dict; matches need no ``[...]`` markup (STATUS round-1 gap:
    non-bracketed mention patterns).

    Engine selection: flat longest-first alternation below
    GAZETTEER_TRIE_THRESHOLD aliases, prefix-trie regex above it
    (same matches — see _trie_regex; pytest asserts equality on a
    10k-alias dict).  Upgrade path for multi-million-alias gazetteers:
    an Aho-Corasick automaton (true O(text) multi-pattern scan) —
    not needed at the tested vocabulary sizes, where the C regex
    engine over a trie pattern wins on constant factors.

    Emits (turn, entity, surface) rows, de-duplicated per batch; the
    per-entity aggregation happens downstream.
    """

    def __init__(self, alias_ref, base: str = KG, engine: str = "auto"):
        import re

        try:
            import ray

            if isinstance(alias_ref, ray.ObjectRef):
                alias_ref = ray.get(alias_ref)
        except ImportError:
            pass
        self.alias: AliasDict = alias_ref
        self.base = base
        if engine == "auto":
            engine = ("trie" if len(self.alias) > GAZETTEER_TRIE_THRESHOLD
                      else "alternation")
        self.engine = engine
        if not self.alias:
            self.rx = None
        elif engine == "trie":
            self.rx = re.compile(
                r"\b(" + _trie_regex(self.alias) + r")\b")
        else:
            # longest-first so overlapping aliases prefer the longer
            # match
            keys = sorted(self.alias, key=len, reverse=True)
            self.rx = re.compile(
                r"\b(" + "|".join(re.escape(k) for k in keys) + r")\b")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "turn": pd.Series([], dtype=str),
            "entity": pd.Series([], dtype=str),
            "surface": pd.Series([], dtype=str)})
        if self.rx is None or not len(batch):
            return empty
        turn = (self.base + batch["conv_id"] + "-t"
                + batch["turn_idx"].astype(str))
        spans = batch["text"].str.lower().str.extractall(self.rx)
        if not len(spans):
            return empty
        row_pos = batch.index.get_indexer(spans.index.get_level_values(0))
        surf = spans[0]
        return pd.DataFrame({
            "turn": turn.to_numpy(dtype=object)[row_pos],
            "entity": [self.alias[s][0] for s in surf],
            "surface": [self.alias[s][2] for s in surf],
        }).drop_duplicates()
