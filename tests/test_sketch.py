"""HyperLogLog sketch: register parity vs a pure-python reference,
mergeability, partition invariance, estimate sanity."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from orionbelt_ontology_builder_ray.stages.sketch import (
    hll_estimates, hll_registers)


def _docs_ds(texts, blocks=4):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))
    return ds.repartition(blocks)


def _ref_regs(texts, p=8):
    toks = set()
    for t in texts:
        toks.update(w for w in str(t).split() if w)
    regs = [0] * (1 << p)
    width = 64 - p
    for w in toks:
        h = int(hashlib.md5(w.encode()).hexdigest()[:16], 16)
        j = h >> width
        rest = h & ((1 << width) - 1)
        rho = width - rest.bit_length() + 1
        regs[j] = max(regs[j], rho)
    return np.array(regs, dtype=np.int64)


def _texts(seed, n_docs, vocab):
    rng = np.random.RandomState(seed)
    words = [f"tok{i}" for i in range(vocab)]
    return [" ".join(rng.choice(words, rng.randint(2, 40)))
            for _ in range(n_docs)]


def test_registers_match_reference(ray_session):
    texts = _texts(3, 80, 600)
    got = hll_registers(_docs_ds(texts))
    assert np.array_equal(got, _ref_regs(texts))


def test_partition_invariance(ray_session):
    texts = _texts(5, 60, 400)
    a = hll_registers(_docs_ds(texts, blocks=1))
    b = hll_registers(_docs_ds(texts, blocks=7))
    assert np.array_equal(a, b)


def test_merge_is_elementwise_max(ray_session):
    ta, tb = _texts(7, 40, 300), _texts(8, 40, 350)
    ra = hll_registers(_docs_ds(ta))
    rb = hll_registers(_docs_ds(tb))
    rab = hll_registers(_docs_ds(ta + tb))
    assert np.array_equal(rab, np.maximum(ra, rb))


def test_estimate_sanity(ray_session):
    vocab = 3000
    texts = [" ".join(f"tok{i}" for i in range(j, min(j + 50, vocab)))
             for j in range(0, vocab, 50)]
    regs = hll_registers(_docs_ds(texts))
    est = hll_estimates(regs)
    raw = est["est_raw_e6"] / 1e6
    # HLL at m=256 has ~6.5% std error; 20% is a safe determinism-free bound
    assert abs(raw - vocab) / vocab < 0.20
    assert est["n_zero_regs"] == int((regs == 0).sum())


def test_fast_mode_shape(ray_session):
    texts = _texts(11, 30, 200)
    regs = hll_registers(_docs_ds(texts), hash_mode="fast")
    assert regs.shape == (256,) and regs.max() >= 1
    est = hll_estimates(regs)
    assert est["est_raw_e6"] > 0


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


def _ref_cms(texts, d=4, w=1024):
    from collections import Counter

    m = np.zeros((d, w), dtype=np.int64)
    c = Counter()
    for t in texts:
        c.update(x for x in str(t).split() if x)
    for tok, n in c.items():
        h = int(hashlib.md5(tok.encode()).hexdigest()[:16], 16)
        for r in range(d):
            m[r][((h >> (16 * r)) & 0xFFFF) % w] += n
    return m, c


def test_cms_matches_reference(ray_session):
    from orionbelt_ontology_builder_ray.stages.sketch import cms_counters

    texts = _texts(21, 50, 300)
    got = cms_counters(_docs_ds(texts))
    ref, _ = _ref_cms(texts)
    assert np.array_equal(got, ref)


def test_cms_partition_invariance_and_additivity(ray_session):
    from orionbelt_ontology_builder_ray.stages.sketch import cms_counters

    ta, tb = _texts(23, 30, 150), _texts(24, 30, 180)
    ra = cms_counters(_docs_ds(ta, blocks=1))
    rb = cms_counters(_docs_ds(tb, blocks=5))
    rab = cms_counters(_docs_ds(ta + tb, blocks=3))
    assert np.array_equal(rab, ra + rb)  # linear sketch


def test_cms_query_upper_bound(ray_session):
    from orionbelt_ontology_builder_ray.stages.sketch import (
        cms_counters, cms_query)

    texts = _texts(29, 40, 200)
    m = cms_counters(_docs_ds(texts))
    _, true = _ref_cms(texts)
    toks = sorted(true)
    est = cms_query(m, toks)
    truth = np.array([true[t] for t in toks], dtype=np.int64)
    assert (est >= truth).all()
    # 200 tokens in 4x1024 lanes: collisions are rare; most exact
    assert (est == truth).mean() > 0.9


# ---------------------------------------------------------------------------
# Bloom filter (bloom_bits / bloom_query)
# ---------------------------------------------------------------------------


def _ref_bloom(texts, k=2):
    from orionbelt_ontology_builder_ray.stages.sketch import BLOOM_M

    toks = set()
    for t in texts:
        toks.update(x for x in str(t).split() if x)
    bits = np.zeros(BLOOM_M, dtype=np.uint8)
    for tok in toks:
        h = int(hashlib.md5(tok.encode()).hexdigest()[:16], 16)
        for r in range(k):
            bits[(h >> (16 * r)) & 0xFFFF] = 1
    return bits, toks


def test_bloom_matches_reference(ray_session):
    from orionbelt_ontology_builder_ray.stages.sketch import bloom_bits

    texts = _texts(31, 50, 400)
    assert np.array_equal(bloom_bits(_docs_ds(texts)),
                          _ref_bloom(texts)[0])


def test_bloom_merge_is_or_and_partition_invariant(ray_session):
    from orionbelt_ontology_builder_ray.stages.sketch import bloom_bits

    ta, tb = _texts(33, 30, 200), _texts(34, 30, 250)
    ra = bloom_bits(_docs_ds(ta, blocks=1))
    rb = bloom_bits(_docs_ds(tb, blocks=6))
    rab = bloom_bits(_docs_ds(ta + tb, blocks=3))
    assert np.array_equal(rab, np.maximum(ra, rb))  # set union


def test_bloom_zero_false_negatives_and_true_negatives(ray_session):
    from orionbelt_ontology_builder_ray.stages.sketch import (
        bloom_bits, bloom_query)

    texts = _texts(37, 40, 300)
    bits = bloom_bits(_docs_ds(texts))
    _, toks = _ref_bloom(texts)
    present = sorted(toks)
    assert (bloom_query(bits, present) == 1).all()  # never-wrong side
    absent = [t + "~absent~" for t in present]
    est = bloom_query(bits, absent)
    # 300 distinct tokens x 2 lanes in 65536 bits: FP rate ~1e-4
    assert est.mean() < 0.1
    # spot-pin determinism: each probe == AND of its lane bits
    for t, e in zip(absent[:20], est[:20]):
        h = int(hashlib.md5(t.encode()).hexdigest()[:16], 16)
        assert e == int(bits[h & 0xFFFF] and bits[(h >> 16) & 0xFFFF])


def test_bloom_empty_and_fast_mode(ray_session):
    from orionbelt_ontology_builder_ray.stages.sketch import (
        BLOOM_M, bloom_bits, bloom_query)

    bits = bloom_bits(_docs_ds(["", "   "]))
    assert bits.sum() == 0
    assert (bloom_query(bits, ["anything"]) == 0).all()
    fast = bloom_bits(_docs_ds(_texts(41, 20, 100)), hash_mode="fast")
    assert fast.shape == (BLOOM_M,) and 0 < fast.sum() <= 2 * 100
