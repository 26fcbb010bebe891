"""Mergeable sketches — HyperLogLog cardinality, count-min
frequency, Bloom membership.

At 100 TB you cannot COUNT(DISTINCT token) with an exact shuffle every
time a pipeline wants a cardinality gate (vocab growth monitoring,
join-side estimation, dedup-rate forecasting).  HyperLogLog (Flajolet
et al. 2007) is the standard answer, and it is embarrassingly
Ray-Data-shaped: every batch folds its values into a tiny register
array (2^p int8-sized maxima), register arrays merge by element-wise
MAX — a per-batch partial + driver fold, the kmeans traffic shape,
zero shuffles, one corpus scan.

Determinism / parity contract (the md5 oracle-mode family):

- value hash = leading-64-bit md5 (``dedup._hash_strings_md5`` /
  DuckDB ``CAST('0x'||substr(md5(v),1,16) AS UBIGINT)``);
- bucket = top ``p`` bits (``h >> (64-p)``), ``w`` = low ``64-p``
  bits, rho = leading-zero count of ``w`` + 1 (``57 -
  bit_length(w)`` at p=8; ``w == 0 -> 64-p+1``) — all integer, all
  engine-exact (DuckDB mirror: ``57 - length(bin(w))``, verified);
- registers are exact integers, driver-hashable one by one;
- the raw estimate ``alpha_m * m^2 / sum(2^-M[j])`` is computed from
  the registers with an EXACT integer harmonic denominator
  (``sum(2^(Mmax - M[j]))`` as arbitrary-precision int / HUGEINT) so
  no summation-order ulps exist; the single int->double conversion
  and the final multiply/divide are IEEE-identical across engines;
  the linear-counting estimate ``m * ln(m / V)`` carries the same
  documented ln-ulp-under-e6-rounding trade as TF-IDF's idf.
  Both estimates ride as e6 ints; the HLL small/large-range branch
  CHOICE is a trivial client-side comparison, so both candidates are
  reported instead of baking the branch into the contract.

``hash_mode="fast"`` swaps the vectorized production hash in (no SQL
mirror, ~40x on wide corpora) — the minhash/simhash precedent.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .textops import _WS


def _alpha(m: int) -> float:
    # the standard HLL bias constant for m >= 128; both engines
    # evaluate this exact literal expression identically
    return 0.7213 / (1.0 + 1.079 / m)


class _HllPartial:
    """Per-batch register partial: distinct tokens -> (bucket, rho)
    -> per-batch max per bucket.  Emits at most m rows per batch."""

    def __init__(self, p: int, text_col: str, hash_mode: str):
        self.p, self.text_col, self.hash_mode = p, text_col, hash_mode
        self._split = re.compile(f"[{_WS}]+").split

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        from .dedup import _hash_strings, _hash_strings_md5

        toks = set()
        for t in b[self.text_col]:
            toks.update(w for w in self._split(str(t)) if w)
        if not toks:
            return pd.DataFrame({"j": pd.Series([], dtype=np.int64),
                                 "r": pd.Series([], dtype=np.int64)})
        toks = list(toks)
        h = (_hash_strings_md5(toks) if self.hash_mode == "md5"
             else _hash_strings(np.array(toks, dtype=object)))
        h = h.astype(np.uint64)
        shift = np.uint64(64 - self.p)
        bucket = (h >> shift).astype(np.int64)
        w = h & np.uint64((1 << (64 - self.p)) - 1)
        # rho = (64-p) - bit_length(w) + 1; w == 0 -> (64-p) + 1.
        # bit_length via int.bit_length: w can exceed 2^53 so float
        # log tricks are unsafe; the loop runs over DISTINCT tokens
        # of the batch only (same cost class as the md5 loop).
        width = 64 - self.p
        rho = np.fromiter(
            (width - int(x).bit_length() + 1 for x in w),
            dtype=np.int64, count=len(w))
        df = pd.DataFrame({"j": bucket, "r": rho})
        return df.groupby("j", sort=False)["r"].max().reset_index()


def hll_registers(ds, text_col: str = "text", p: int = 8,
                  hash_mode: str = "md5") -> np.ndarray:
    """Distinct-token HLL registers over a text corpus: one streaming
    pass, per-batch partials, driver element-wise-MAX fold
    (m x n_blocks tiny rows; nothing shuffles)."""
    from ..functions.terms import pool_spec

    m = 1 << p
    parts = ds.map_batches(
        _HllPartial, fn_constructor_kwargs=dict(
            p=p, text_col=text_col, hash_mode=hash_mode),
        batch_format="pandas", concurrency=pool_spec()).to_pandas()
    regs = np.zeros(m, dtype=np.int64)
    if len(parts):
        np.maximum.at(regs, parts["j"].to_numpy(),
                      parts["r"].to_numpy().astype(np.int64))
    return regs


class _CmsPartial:
    """Per-batch count-min partial: token occurrences hashed into a
    d x w counter matrix.  Partials merge by ADDITION (CMS is a
    linear sketch), so the fold is exact integer arithmetic — no
    contract subtleties at all.  Row hashes are the md5 low-64 split
    into d independent 16-bit lanes (w <= 65536), mirrored in SQL by
    the same substr(md5) byte slices."""

    def __init__(self, d: int, w: int, text_col: str):
        assert d <= 4 and w <= 65536, "d x 16-bit lanes from one md5"
        self.d, self.w, self.text_col = d, w, text_col
        self._split = re.compile(f"[{_WS}]+").split

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        import hashlib
        from collections import Counter

        c = Counter()
        for t in b[self.text_col]:
            c.update(w for w in self._split(str(t)) if w)
        if not c:
            return pd.DataFrame({"i": pd.Series([], dtype=np.int64),
                                 "n": pd.Series([], dtype=np.int64)})
        toks = list(c.keys())
        cnt = np.fromiter(c.values(), dtype=np.int64, count=len(c))
        h = np.fromiter(
            (int(hashlib.md5(s.encode()).hexdigest()[:16], 16)
             for s in toks), dtype=np.uint64, count=len(toks))
        rows = []
        for r in range(self.d):
            lane = ((h >> np.uint64(16 * r)) & np.uint64(0xFFFF)) \
                .astype(np.int64) % self.w
            flat = r * self.w + lane
            uniq, inv = np.unique(flat, return_inverse=True)
            sums = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(sums, inv, cnt)
            rows.append(pd.DataFrame({"i": uniq, "n": sums}))
        return pd.concat(rows, ignore_index=True)


def cms_counters(ds, text_col: str = "text", d: int = 4,
                 w: int = 1024) -> np.ndarray:
    """Count-min sketch of token frequencies: one streaming pass,
    per-batch partial matrices, driver ADD fold.  Returns the d x w
    int64 counter matrix."""
    from ..functions.terms import pool_spec

    parts = ds.map_batches(
        _CmsPartial, fn_constructor_kwargs=dict(
            d=d, w=w, text_col=text_col),
        batch_format="pandas", concurrency=pool_spec()).to_pandas()
    m = np.zeros(d * w, dtype=np.int64)
    if len(parts):
        np.add.at(m, parts["i"].to_numpy(),
                  parts["n"].to_numpy().astype(np.int64))
    return m.reshape(d, w)


def cms_query(m: np.ndarray, tokens) -> np.ndarray:
    """Point-query estimates (min over the d lanes) for each token —
    always >= the true count, == for tokens with no lane collisions."""
    import hashlib

    d, w = m.shape
    out = np.empty(len(tokens), dtype=np.int64)
    for k, s in enumerate(tokens):
        h = int(hashlib.md5(s.encode()).hexdigest()[:16], 16)
        out[k] = min(m[r][((h >> (16 * r)) & 0xFFFF) % w]
                     for r in range(d))
    return out


BLOOM_M = 65536  # one full 16-bit md5 lane per hash fn, no modulo


class _BloomPartial:
    """Per-batch Bloom-filter partial: distinct tokens -> k 16-bit
    md5 lanes (the CMS lane slicing, without the % w fold) -> unique
    bit indices.  Partials merge by bitwise OR (set union), so the
    driver fold is exact integer state — the HLL/CMS mergeable
    family.  Emits at most BLOOM_M rows per batch."""

    def __init__(self, k: int, text_col: str, hash_mode: str):
        assert k <= 4, "k x 16-bit lanes from one md5 low-64"
        self.k, self.text_col, self.hash_mode = k, text_col, hash_mode
        self._split = re.compile(f"[{_WS}]+").split

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        from .dedup import _hash_strings, _hash_strings_md5

        toks = set()
        for t in b[self.text_col]:
            toks.update(w for w in self._split(str(t)) if w)
        if not toks:
            return pd.DataFrame({"j": pd.Series([], dtype=np.int64)})
        toks = list(toks)
        h = (_hash_strings_md5(toks) if self.hash_mode == "md5"
             else _hash_strings(np.array(toks, dtype=object)))
        h = h.astype(np.uint64)
        bits = np.concatenate([
            ((h >> np.uint64(16 * r)) & np.uint64(0xFFFF))
            .astype(np.int64) for r in range(self.k)])
        return pd.DataFrame({"j": np.unique(bits)})


def bloom_bits(ds, text_col: str = "text", k: int = 2,
               hash_mode: str = "md5") -> np.ndarray:
    """Distinct-token Bloom filter over a text corpus — the
    membership pre-gate a 100-TB ingest puts in front of expensive
    probes (benchmark decontamination: "is this n-gram possibly in
    the eval set?"; incremental dedup: "is this hash possibly in the
    store?" — a negative answer skips the anti-join probe entirely,
    and Bloom negatives are NEVER wrong).  One streaming pass,
    per-batch bit partials, driver bitwise-OR fold (<= BLOOM_M tiny
    ints per block; nothing shuffles).  Returns the BLOOM_M uint8
    bit array."""
    from ..functions.terms import pool_spec

    parts = ds.map_batches(
        _BloomPartial, fn_constructor_kwargs=dict(
            k=k, text_col=text_col, hash_mode=hash_mode),
        batch_format="pandas", concurrency=pool_spec()).to_pandas()
    bits = np.zeros(BLOOM_M, dtype=np.uint8)
    if len(parts):
        bits[parts["j"].to_numpy()] = 1
    return bits


def bloom_query(bits: np.ndarray, tokens, k: int = 2) -> np.ndarray:
    """Membership probes (1 = possibly present, 0 = definitely
    absent): present iff ALL k lane bits are set.  Deterministic
    given the same hash, so even false positives are engine-exact."""
    import hashlib

    out = np.empty(len(tokens), dtype=np.int64)
    for i, s in enumerate(tokens):
        h = int(hashlib.md5(s.encode()).hexdigest()[:16], 16)
        out[i] = int(all(bits[(h >> (16 * r)) & 0xFFFF]
                         for r in range(k)))
    return out


def hll_estimates(regs: np.ndarray) -> dict:
    """(raw, linear-counting) estimate pair from a register array,
    both as e6 ints.  The harmonic denominator is EXACT (python
    ints): denom = sum(2^(Mmax - M[j])) * 2^-Mmax, so the only float
    steps are one int->double conversion and one multiply/divide —
    engine-identical.  lin = m * ln(m / V) (V = zero registers;
    V == 0 -> -1 sentinel)."""
    m = len(regs)
    mmax = int(regs.max())
    denom_int = sum(1 << (mmax - int(x)) for x in regs)  # exact
    raw = _alpha(m) * m * m * (2.0 ** mmax) / float(denom_int)
    v = int((regs == 0).sum())
    lin = m * float(np.log(m / v)) if v > 0 else None
    return {
        "est_raw_e6": int(np.round(raw * 1e6)),
        "est_lin_e6": int(np.round(lin * 1e6)) if lin is not None else -1,
        "n_zero_regs": v,
    }
