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

# the four low-cardinality triple columns (~20/4/2/3 distinct values):
# as plain strings they are most of the bytes a triple block carries
# in flight; dictionary-encoded they shrink to int32 codes + a tiny
# per-chunk dictionary.  Opt-in via build_kg(dict_columns=True) — the
# in-flight representation changes, parquet output and row values do
# not (parquet reads dictionary pages back as plain strings).
DICT_COLS = ("predicate", "object_kind", "lang", "datatype")


def encode_dict_cols(t):
    """Dictionary-encode the low-cardinality triple columns of an
    Arrow table (idempotent; non-triple columns untouched)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for c in DICT_COLS:
        if c in t.column_names \
                and not pa.types.is_dictionary(t.schema.field(c).type):
            t = t.set_column(t.column_names.index(c), c,
                             pc.dictionary_encode(t[c].combine_chunks()))
    return t


def decode_dict_cols(t):
    """Inverse of encode_dict_cols (cast dictionary columns back to
    plain strings; idempotent)."""
    import pyarrow as pa

    for c in t.column_names:
        if pa.types.is_dictionary(t.schema.field(c).type):
            t = t.set_column(t.column_names.index(c), c,
                             t[c].cast(pa.string()))
    return t


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


class ExtractLinkFusedArrow:
    """Arrow-native fused stage-1+2 (+ optional dedup combiner):
    the same triples as ``ExtractLinkFused`` computed directly on
    zero-copy ``pyarrow`` batches (``batch_format="pyarrow"``).

    Measured 2.7x faster per batch than the pandas fused kernel on a
    realistic 8192-turn batch (BASELINE.md round 3 A/B): the URI
    concatenations, constant columns, timestamp formatting and tool
    handling run as pyarrow.compute kernels with no pandas round-trip;
    only the mention scan is a Python regex pass (pyarrow 16 has no
    all-matches regex kernel), prefiltered to rows that contain ``[``
    so mention-free turns never reach Python.  Linking happens inline
    during the scan (dict lookups against the broadcast alias dict),
    which also removes the pandas ``extractall``/``map`` overhead the
    A/B showed dominating the old kernel.

    Output parity with the pandas path is pinned by
    tests/test_extract_link.py::test_arrow_fused_equals_pandas_fused
    and end-to-end by the kg_triples oracle (build_kg uses this kernel
    by default)."""

    def __init__(self, alias_ref, emit_ts: bool = True,
                 with_dedup_hash: bool = True,
                 with_local_dedup: bool = False, base: str = KG,
                 dict_columns: bool = False):
        try:
            import ray

            if isinstance(alias_ref, ray.ObjectRef):
                alias_ref = ray.get(alias_ref)
        except ImportError:
            pass
        alias: AliasDict = alias_ref
        self._uri = {k: v[0] for k, v in alias.items()}
        self._cls = {k: v[1] for k, v in alias.items()}
        self._label = {k: v[2] for k, v in alias.items()}
        self.base = base
        self.emit_ts = emit_ts
        self.with_dedup_hash = with_dedup_hash
        self.with_local_dedup = with_local_dedup
        self.dict_columns = dict_columns
        from .extract import _MENTION_RE

        self.mention_re = _MENTION_RE

    @staticmethod
    def _const_table(subject, predicate, obj, kind="uri", lang="",
                     datatype=""):
        import pyarrow as pa

        n = len(subject)
        if not isinstance(obj, (pa.Array, pa.ChunkedArray)):
            obj = pa.repeat(pa.scalar(obj, pa.string()), n)
        return pa.table({
            "subject": subject,
            "predicate": pa.repeat(pa.scalar(predicate, pa.string()), n),
            "object": obj,
            "object_kind": pa.repeat(pa.scalar(kind, pa.string()), n),
            "lang": pa.repeat(pa.scalar(lang, pa.string()), n),
            "datatype": pa.repeat(pa.scalar(datatype, pa.string()), n),
        })

    def __call__(self, t):
        import pyarrow as pa
        import pyarrow.compute as pc

        from ..functions.kg import (
            KG_AT_TIME, KG_CONVERSATION, KG_IN_CONVERSATION, KG_MENTIONS,
            KG_ROLE, KG_TEXT, KG_TOOL, KG_TURN, KG_TURN_INDEX, KG_USED_TOOL,
            LABEL, NAMED_INDIVIDUAL, PREF_LABEL,
        )
        from ..functions.terms import RDF_TYPE, XSD_DATETIME, XSD_INTEGER

        schema = pa.schema([(c, pa.string()) for c in TRIPLE_COLS])
        if len(t) == 0:
            out = schema.empty_table()
            return self._finish(out)
        base = pa.scalar(self.base, pa.string())
        sep = ""
        conv = pc.cast(t["conv_id"], pa.string())
        idx_str = pc.cast(t["turn_idx"], pa.string())
        conv_uri = pc.binary_join_element_wise(base, conv, sep)
        turn_uri = pc.binary_join_element_wise(
            base, conv, pa.scalar("-t", pa.string()), idx_str, sep)
        role = pc.cast(t["role"], pa.string())
        text = pc.cast(t["text"], pa.string())

        parts = [
            self._const_table(turn_uri, RDF_TYPE, NAMED_INDIVIDUAL),
            self._const_table(turn_uri, RDF_TYPE, KG_TURN),
            self._const_table(turn_uri, KG_IN_CONVERSATION, conv_uri),
            self._const_table(turn_uri, KG_ROLE, role, "literal"),
            self._const_table(turn_uri, KG_TEXT, text, "literal"),
            self._const_table(turn_uri, KG_TURN_INDEX, idx_str,
                              "literal", "", XSD_INTEGER),
            self._const_table(conv_uri, RDF_TYPE, NAMED_INDIVIDUAL),
            self._const_table(conv_uri, RDF_TYPE, KG_CONVERSATION),
        ]

        if self.emit_ts:
            # Arrow %S includes the fractional seconds for sub-second
            # units (and %f is unsupported): cast to us so %S prints
            # SS.ffffff — exactly pandas' strftime("...%S.%f")
            iso = pc.strftime(pc.cast(t["ts"], pa.timestamp("us")),
                              format="%Y-%m-%dT%H:%M:%S")
            parts.append(self._const_table(
                turn_uri, KG_AT_TIME, pc.cast(iso, pa.string()),
                "literal", "", XSD_DATETIME))

        tool = pc.cast(t["tool"], pa.string())
        tool_mask = pc.not_equal(tool, "")
        if pc.any(tool_mask).as_py():
            tools = tool.filter(tool_mask)
            t_turn = turn_uri.filter(tool_mask)
            tool_uri = pc.binary_join_element_wise(base, tools, sep)
            parts += [
                self._const_table(t_turn, KG_USED_TOOL, tool_uri),
                self._const_table(tool_uri, RDF_TYPE, NAMED_INDIVIDUAL),
                self._const_table(tool_uri, RDF_TYPE, KG_TOOL),
                self._const_table(tool_uri, LABEL, tools, "literal"),
            ]

        # mention scan + inline linking: only rows containing "[" reach
        # the Python regex; entity triples dedup per batch (combiner)
        has_br = pc.match_substring(text, "[")
        if pc.any(has_br).as_py():
            m_texts = text.filter(has_br).to_pylist()
            m_turns = turn_uri.filter(has_br).to_pylist()
            m_subj: list = []
            m_obj: list = []
            ents: dict = {}
            uri_map, finditer = self._uri, self.mention_re.finditer
            for turn, txt in zip(m_turns, m_texts):
                for m in finditer(txt):
                    key = m.group(1).casefold()
                    uri = uri_map.get(key)
                    if uri is not None:
                        m_subj.append(turn)
                        m_obj.append(uri)
                        # FIRST surface wins per entity — the pandas
                        # kernel's drop_duplicates("uri") keeps the
                        # first occurrence; setdefault preserves the
                        # byte-identical-output parity for multi-alias
                        # dictionaries (two surfaces -> one URI)
                        ents.setdefault(uri, key)
            if m_subj:
                parts.append(self._const_table(
                    pa.array(m_subj, pa.string()), KG_MENTIONS,
                    pa.array(m_obj, pa.string())))
                e_uri = pa.array(list(ents), pa.string())
                parts += [
                    self._const_table(e_uri, RDF_TYPE, NAMED_INDIVIDUAL),
                    self._const_table(
                        e_uri, RDF_TYPE,
                        pa.array([self._cls[k] for k in ents.values()],
                                 pa.string())),
                    self._const_table(
                        e_uri, PREF_LABEL,
                        pa.array([self._label[k] for k in ents.values()],
                                 pa.string()), "literal"),
                ]

        return self._finish(pa.concat_tables(parts))

    def _finish(self, out):
        if self.with_dedup_hash:
            from .dedup import _DedupAndHash

            out = _DedupAndHash()(out)
        elif self.with_local_dedup:
            from .dedup import _local_dedup

            out = _local_dedup(out)
        if self.dict_columns:
            out = encode_dict_cols(out)
        return out


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

# Above this many aliases even the trie REGEX stops being the right
# engine: `re.compile` time and compiled-pattern size grow with total
# trie chars (measured in BASELINE.md), while an Aho-Corasick automaton
# builds in one O(total chars) pass and scans in true O(text) per
# batch.  The AC scan is a Python-level char loop, so per-byte it
# loses to the C regex engine — the crossover is where pattern build
# cost (paid once per actor) and `re` internal limits dominate, i.e.
# multi-hundred-thousand-alias gazetteers.
GAZETTEER_AC_THRESHOLD = 200_000


class _AhoCorasick:
    """Aho-Corasick automaton over a fixed alias set that reproduces
    the EXACT match semantics of the regex engines above, i.e.
    ``re.finditer(r"\\b(<longest-first alternation>)\\b", text)``:

    - occurrences are collected for every alias (classic AC);
    - a match is valid only if both ends sit on ``\\b`` boundaries
      (word-ness XOR across the edge, string ends count as non-word);
    - of the valid occurrences, the leftmost match wins, ties broken
      by LONGEST alias, and scanning resumes at the match end
      (non-overlapping), exactly like the regex engine's scan loop.

    Memory is O(total alias chars) in per-node Python dicts — the
    documented trade for a pure-Python automaton; at multi-million
    aliases this is the engine that still builds in seconds where
    ``re.compile`` over the trie pattern takes minutes (BASELINE.md).
    """

    __slots__ = ("goto", "fail", "out")

    def __init__(self, keys):
        from collections import deque

        goto = [{}]   # state -> {char: state}
        out = [()]    # state -> alias lengths ending here (desc)
        for k in keys:
            st = 0
            g = goto[st]
            for ch in k:
                nxt = g.get(ch)
                if nxt is None:
                    goto.append({})
                    out.append(())
                    nxt = len(goto) - 1
                    g[ch] = nxt
                st = nxt
                g = goto[st]
            out[st] = out[st] + (len(k),)
        fail = [0] * len(goto)
        q = deque()
        for s in goto[0].values():
            q.append(s)          # depth-1: fail stays 0
        while q:
            r = q.popleft()
            for ch, s in goto[r].items():
                q.append(s)
                f = fail[r]
                while f and ch not in goto[f]:
                    f = fail[f]
                fs = goto[f].get(ch, 0)
                fail[s] = fs if fs != s else 0
                if out[fail[s]]:
                    # BFS order guarantees fail[s] (smaller depth) final
                    merged = sorted(set(out[s] + out[fail[s]]),
                                    reverse=True)
                    out[s] = tuple(merged)
        self.goto, self.fail, self.out = goto, fail, out

    def occurrences(self, text: str):
        """All raw (start, end) alias occurrences in ``text``
        (boundary filtering and leftmost-longest selection happen in
        the caller, vectorized)."""
        goto, fail, out = self.goto, self.fail, self.out
        st = 0
        occ_s, occ_e = [], []
        for i, ch in enumerate(text):
            nxt = goto[st].get(ch)
            while nxt is None and st:
                st = fail[st]
                nxt = goto[st].get(ch)
            st = nxt if nxt is not None else 0
            o = out[st]
            if o:
                e = i + 1
                for length in o:
                    occ_s.append(e - length)
                    occ_e.append(e)
        return occ_s, occ_e


def _ac_scan(ac: _AhoCorasick, texts) -> tuple:
    """Scan a batch of (already lowercased) texts with one automaton
    pass over the ``\\x00``-joined concatenation (the separator is in
    no alias, so matches cannot span rows and the automaton resets
    itself via fail links).  Returns (row_indices, surfaces) after
    boundary filtering and per-row leftmost-longest non-overlapping
    selection — byte-identical to the regex engines' extractall.
    """
    import re

    joined = "\x00".join(texts)
    row_starts = np.zeros(len(texts), dtype=np.int64)
    if len(texts) > 1:
        np.cumsum([len(t) + 1 for t in texts[:-1]], out=row_starts[1:])
    occ_s, occ_e = ac.occurrences(joined)
    if not occ_s:
        return np.array([], dtype=np.int64), []
    # \b mask: word-ness per char, one sentinel False past the end
    wmask = np.zeros(len(joined) + 1, dtype=bool)
    for m in re.finditer(r"\w+", joined):
        wmask[m.start():m.end()] = True
    s = np.asarray(occ_s, dtype=np.int64)
    e = np.asarray(occ_e, dtype=np.int64)
    left_ok = np.where(s == 0, wmask[0] if len(wmask) else False,
                       wmask[s - 1] != wmask[s])
    right_ok = wmask[e - 1] != wmask[e]
    valid = left_ok & right_ok
    s, e = s[valid], e[valid]
    if not len(s):
        return np.array([], dtype=np.int64), []
    order = np.lexsort((s - e, s))   # start asc, length desc
    s, e = s[order], e[order]
    chosen_s, chosen_e = [], []
    pos = 0
    for a, b in zip(s.tolist(), e.tolist()):
        if a >= pos:
            chosen_s.append(a)
            chosen_e.append(b)
            pos = b
    rows = np.searchsorted(row_starts, np.asarray(chosen_s, dtype=np.int64),
                           side="right") - 1
    surfaces = [joined[a:b] for a, b in zip(chosen_s, chosen_e)]
    return rows, surfaces


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

    Engine selection (all three produce IDENTICAL matches — pytest
    asserts pairwise equality): flat longest-first alternation below
    GAZETTEER_TRIE_THRESHOLD aliases, prefix-trie regex above it, and
    an Aho-Corasick automaton (``_AhoCorasick``) above
    GAZETTEER_AC_THRESHOLD — the multi-million-alias path, where
    ``re.compile`` over the trie pattern stops scaling (build time and
    pattern size are linear in total trie chars; BASELINE.md records
    the measured crossover).  All engines build once per actor in
    ``__init__`` and scan per batch.

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
            if len(self.alias) > GAZETTEER_AC_THRESHOLD:
                engine = "ac"
            elif len(self.alias) > GAZETTEER_TRIE_THRESHOLD:
                engine = "trie"
            else:
                engine = "alternation"
        self.engine = engine
        self.rx = None
        self.ac = None
        if not self.alias:
            pass
        elif engine == "ac":
            self.ac = _AhoCorasick(self.alias)
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
        if (self.rx is None and self.ac is None) or not len(batch):
            return empty
        turn = (self.base + batch["conv_id"] + "-t"
                + batch["turn_idx"].astype(str))
        if self.ac is not None:
            rows, surf = _ac_scan(self.ac,
                                  batch["text"].str.lower().tolist())
        else:
            spans = batch["text"].str.lower().str.extractall(self.rx)
            if not len(spans):
                return empty
            rows = batch.index.get_indexer(spans.index.get_level_values(0))
            surf = spans[0].tolist()
        if not len(surf):
            return empty
        return pd.DataFrame({
            "turn": turn.to_numpy(dtype=object)[rows],
            "entity": [self.alias[s][0] for s in surf],
            "surface": [self.alias[s][2] for s in surf],
        }).drop_duplicates()
