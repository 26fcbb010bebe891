"""Stage 1: per-turn triple extraction (stateful actor-pool map_batches).

Reproduces the reference's emission semantics driven by transcript rows
instead of UI forms (SURVEY.md §2.2 mapping): each turn emits
``add_individual`` / ``add_individual_property`` / ``add_annotation``
patterns (ontology_manager.py:976-1002, 1199-1240) over the KG
vocabulary, plus *mention rows* (``object_kind == "mention"``) that the
linking stage resolves — so extraction + linking is a single streaming
pass with no second scan of the input.

Per-row invariant: output URIs derive only from ``(conv_id, turn_idx)``
and row content — retried tasks emit byte-identical rows.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ..functions.kg import (
    KG, KG_AT_TIME, KG_CONVERSATION, KG_IN_CONVERSATION, KG_MENTIONS,
    KG_ROLE, KG_TEXT, KG_TOOL, KG_TURN, KG_TURN_INDEX, KG_USED_TOOL, LABEL,
    NAMED_INDIVIDUAL,
)
from ..functions.terms import RDF_TYPE, XSD_DATETIME, XSD_INTEGER

TRIPLE_COLS = ["subject", "predicate", "object", "object_kind", "lang", "datatype"]

MENTION_KIND = "mention"
_MENTION_RE = re.compile(r"\[([^\]]+)\]")

# ISO format for kg:atTime literals; must match the DuckDB oracle's
# strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') (both emit 6-digit microseconds).
TS_FORMAT = "%Y-%m-%dT%H:%M:%S.%f"


def _const_frame(subject, predicate, obj, kind="uri", lang="", datatype=""):
    n = len(subject)
    return pd.DataFrame({
        "subject": subject,
        "predicate": np.repeat(predicate, n),
        "object": obj if not np.isscalar(obj) else np.repeat(obj, n),
        "object_kind": np.repeat(kind, n),
        "lang": np.repeat(lang, n),
        "datatype": np.repeat(datatype, n),
    })


class TripleExtractor:
    """Callable class for ``map_batches(TripleExtractor, concurrency=N)``.

    State (compiled regex, vocabulary constants) is built once per
    actor; ``__call__`` is fully vectorized pandas/numpy.
    """

    def __init__(self, base: str = KG, emit_ts: bool = True,
                 emit_mentions: bool = True):
        self.base = base
        self.emit_ts = emit_ts
        self.emit_mentions = emit_mentions
        self.mention_re = _MENTION_RE

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        base = self.base
        conv_uri = (base + batch["conv_id"]).to_numpy(dtype=object)
        turn_uri = (base + batch["conv_id"] + "-t"
                    + batch["turn_idx"].astype(str)).to_numpy(dtype=object)

        frames = [
            # add_individual(turn, Turn): both type triples (om:976-990)
            _const_frame(turn_uri, RDF_TYPE, NAMED_INDIVIDUAL),
            _const_frame(turn_uri, RDF_TYPE, KG_TURN),
            # add_individual_property object/data assertions (om:992-1002)
            _const_frame(turn_uri, KG_IN_CONVERSATION, conv_uri),
            _const_frame(turn_uri, KG_ROLE,
                         batch["role"].to_numpy(dtype=object), "literal"),
            _const_frame(turn_uri, KG_TEXT,
                         batch["text"].to_numpy(dtype=object), "literal"),
            _const_frame(turn_uri, KG_TURN_INDEX,
                         batch["turn_idx"].astype(str).to_numpy(dtype=object),
                         "literal", "", XSD_INTEGER),
            _const_frame(conv_uri, RDF_TYPE, NAMED_INDIVIDUAL),
            _const_frame(conv_uri, RDF_TYPE, KG_CONVERSATION),
        ]

        if self.emit_ts:
            iso = batch["ts"].dt.strftime(TS_FORMAT).to_numpy(dtype=object)
            frames.append(_const_frame(turn_uri, KG_AT_TIME, iso,
                                       "literal", "", XSD_DATETIME))

        tool_mask = (batch["tool"] != "").to_numpy()
        if tool_mask.any():
            tools = batch["tool"].to_numpy(dtype=object)[tool_mask]
            t_turn = turn_uri[tool_mask]
            tool_uri = np.array([base + t for t in tools], dtype=object)
            frames += [
                _const_frame(t_turn, KG_USED_TOOL, tool_uri),
                _const_frame(tool_uri, RDF_TYPE, NAMED_INDIVIDUAL),
                _const_frame(tool_uri, RDF_TYPE, KG_TOOL),
                _const_frame(tool_uri, LABEL, tools, "literal"),
            ]

        if self.emit_mentions:
            # mention detection: bracketed spans -> candidate rows for the
            # linking stage (object_kind="mention", object=surface form)
            spans = batch["text"].str.extractall(self.mention_re)
            if len(spans):
                row_pos = batch.index.get_indexer(
                    spans.index.get_level_values(0))
                frames.append(_const_frame(
                    turn_uri[row_pos], KG_MENTIONS,
                    spans[0].to_numpy(dtype=object), MENTION_KIND))

        out = pd.concat(frames, ignore_index=True)
        return out[TRIPLE_COLS]
