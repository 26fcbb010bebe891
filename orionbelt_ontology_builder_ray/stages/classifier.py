"""Distributed quality-classifier training: logistic regression over
hashed bag-of-tokens features (the fastText-style linear classifier a
curation pipeline trains on "good vs bad" document labels, e.g.
gopher-gate survivors vs rejects, or a curated seed set vs random
crawl — the classifier half of the GPT-3/LLaMA quality-filtering
recipe).

No model runtime exists in this container, and none is needed: the
classifier is a (dim+1)-float vector trained with full-batch gradient
descent expressed Ray-Data-first —

- featurize: one streaming pass; token -> md5-low64 % dim bucket,
  counts normalized by doc token count (bounded features, no
  vocabulary state; the identical md5 feature hashing contract as
  stages/ner.py).
- each GD iteration: broadcast the weight vector (``ray.put``), one
  pass emits per-batch (sum_grad, n) PARTIALS of (dim+1) floats each
  — the kmeans (count, sum) traffic shape; the driver folds
  block-count-sized partials and steps.  The corpus never shuffles;
  only model-sized state moves.
- score: broadcast the final weights, one streaming sigmoid pass.

At 100 TB you train on a label-balanced SAMPLE (classifier training
saturates long before corpus scale) and score the full corpus with
the one streaming pass — both shapes are exactly what ships here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.terms import pool_spec

_FEAT_DIM = 64


def _featurize_batch(texts, dim: int, hash_mode: str = "fast",
                     feat_mode: str = "tf") -> np.ndarray:
    """Hashed bag-of-tokens features, one row per doc: token-hash %
    dim bucket counts, normalized by the doc's token count (empty doc
    -> zero row); a constant 1.0 bias column is appended.  Flat-batch
    vectorized: ONE hashing call over the batch's flattened tokens and
    one np.add.at scatter — no per-doc loop.  ``fast`` (default) uses
    the pandas production hash; ``md5`` keeps the stages/ner.py
    feature-hash contract for cross-engine mirrors.  ``feat_mode``:
    ``tf`` = token-frequency (count / doc length, the fastText-mean
    shape); ``binary`` = 1.0 per present bucket (the sklearn
    HashingVectorizer(binary=True) shape — stronger per-token signals
    on short docs, and exactly representable floats so the scatter
    order can never cost an ulp)."""
    from itertools import chain

    from .dedup import _hash_strings, _hash_strings_md5
    from .scrub import ascii_tokens

    per_doc = [ascii_tokens(str(t)) for t in texts]
    lens = np.fromiter((len(x) for x in per_doc), np.int64,
                       len(per_doc))
    out = np.zeros((len(texts), dim + 1), dtype=np.float64)
    out[:, dim] = 1.0  # bias
    if lens.sum():
        flat = list(chain.from_iterable(per_doc))
        hasher = (_hash_strings_md5 if hash_mode == "md5"
                  else _hash_strings)
        idx = (hasher(flat) % np.uint64(dim)).astype(np.int64)
        rows = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
        if feat_mode == "binary":
            out[rows, idx] = 1.0
        else:
            wts = np.repeat(1.0 / np.maximum(lens, 1), lens)
            np.add.at(out, (rows, idx), wts)
    return out


def _sigmoid(z: np.ndarray) -> np.ndarray:
    # piecewise-stable sigmoid: exp only ever sees non-positive args
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    e = np.exp(z[~pos])
    out[~pos] = e / (1.0 + e)
    return out


class _GradPartial:
    """One GD iteration's map stage: per-batch gradient partial
    sum((sigmoid(Xw) - y) * X) and the row count — (dim+2) floats
    leave each batch."""

    def __init__(self, w_ref, dim, text_col, label_col,
                 hash_mode="fast", feat_mode="tf"):
        import ray

        self.w = (ray.get(w_ref) if isinstance(w_ref, ray.ObjectRef)
                  else w_ref)
        self.dim, self.text_col, self.label_col = dim, text_col, label_col
        self.hash_mode, self.feat_mode = hash_mode, feat_mode

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        X = _featurize_batch(b[self.text_col].tolist(), self.dim,
                             hash_mode=self.hash_mode,
                             feat_mode=self.feat_mode)
        y = b[self.label_col].to_numpy(np.float64)
        err = _sigmoid(X @ self.w) - y
        g = err @ X
        return pd.DataFrame({"g": [g], "n": [len(b)]})


def train_quality_classifier(ds, label_col: str = "label",
                             text_col: str = "text", dim: int = _FEAT_DIM,
                             n_iter: int = 20, lr: float = 2.0,
                             hash_mode: str = "fast",
                             feat_mode: str = "tf",
                             round_decimals=None):
    """Full-batch logistic regression on (text, label in {0,1}) ->
    weight vector np.ndarray of dim+1 (bias last).  Deterministic:
    zero init, fixed iteration count, mean-gradient steps.

    ``hash_mode="md5"`` keeps the DuckDB-mirrorable feature hashing;
    ``round_decimals=6`` rounds the weight vector after EVERY step —
    the kmeans ROUND(,6) determinism contract (similarity.py:238):
    both engines land on the same decimal grid each iteration, so the
    per-engine summation-order ulps never compound and an ITERATIVE
    algorithm hash-matches exactly."""
    import ray

    w = np.zeros(dim + 1, dtype=np.float64)
    cols = ds.select_columns([text_col, label_col]).materialize()

    # TASK stages, not an actor pool: a fresh pool per GD iteration is
    # pure spin-up (the measured kmeans lesson, similarity.py:268) —
    # the per-task state rebuild is one zero-copy plasma read of a
    # (dim+1)-float vector
    def _stage(wref):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            return _GradPartial(wref, dim, text_col, label_col,
                                hash_mode=hash_mode,
                                feat_mode=feat_mode)(b)
        return f

    for _ in range(n_iter):
        wref = ray.put(w)
        parts = cols.map_batches(_stage(wref),
                                 batch_format="pandas").to_pandas()
        n = int(parts["n"].sum())
        if n == 0:
            break
        grad = np.sum(np.stack(parts["g"].to_numpy()), axis=0) / n
        w = w - lr * grad
        if round_decimals is not None:
            w = np.round(w, round_decimals)
    return w


class QualityScorerLR:
    """(doc_id, text) -> (doc_id, quality_prob): the broadcast trained
    weights applied in one streaming sigmoid pass."""

    def __init__(self, w_ref, dim=_FEAT_DIM, id_col="doc_id",
                 text_col="text", hash_mode="fast", feat_mode="tf"):
        import ray

        self.w = (ray.get(w_ref) if isinstance(w_ref, ray.ObjectRef)
                  else np.asarray(w_ref, dtype=np.float64))
        self.dim, self.id_col, self.text_col = dim, id_col, text_col
        self.hash_mode, self.feat_mode = hash_mode, feat_mode

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        X = _featurize_batch(b[self.text_col].tolist(), self.dim,
                             hash_mode=self.hash_mode,
                             feat_mode=self.feat_mode)
        return pd.DataFrame({
            self.id_col: b[self.id_col].to_numpy(np.int64),
            "quality_prob": _sigmoid(X @ self.w)})


def quality_scores_lr(ds, weights, dim: int = _FEAT_DIM,
                      id_col: str = "doc_id", text_col: str = "text",
                      hash_mode: str = "fast", feat_mode: str = "tf"):
    """Score every doc under a trained classifier: one broadcast, one
    streaming pass."""
    import ray

    wref = ray.put(np.asarray(weights, dtype=np.float64))
    return ds.map_batches(
        QualityScorerLR, fn_constructor_kwargs=dict(
            w_ref=wref, dim=dim, id_col=id_col, text_col=text_col,
            hash_mode=hash_mode, feat_mode=feat_mode),
        batch_format="pandas", concurrency=pool_spec())
