"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages.  The actual codecs are NOT in this container,
so the decode kernel is stubbed: ``DecodeStub`` raises
``NotImplementedError`` unless ``fake=True``, in which case it emits a
deterministic fake decode (content-hash-derived dimensions/features)
so the Ray-side plumbing — schema, batch sizing, actor signature,
output layout — is real and tested.

Scale notes: binary payload batches must be SMALL (``batch_size`` of
tens, not thousands) so batch × concurrency fits worker heaps; blocks
with wide binary rows keep ``target_max_block_size`` meaningful.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.terms import pool_size

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # image | audio | video
    ("payload", pa.binary()),
    ("content_type", pa.string()),
    ("source", pa.string()),
])


def synthesize_media_dataset(num_items: int = 64, seed: int = 42):
    """Deterministic fake media table (binary payloads from a seeded
    generator) for exercising the plumbing."""
    import ray.data as rd

    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = {
        "media_id": np.arange(num_items, dtype=np.int64),
        "kind": [kinds[i % 3] for i in range(num_items)],
        "payload": [rng.bytes(256 + (i % 7) * 64) for i in range(num_items)],
        "content_type": ["application/octet-stream"] * num_items,
        "source": [f"synthetic://{i}" for i in range(num_items)],
    }
    return rd.from_arrow(pa.table(rows, schema=MEDIA_SCHEMA))


class DecodeStub:
    """Actor-pool decode stage.

    Real deployments replace ``_decode`` with PIL/ffmpeg calls loaded
    once per actor in ``__init__``; here the codec libraries are
    unavailable, so ``fake=True`` derives deterministic pseudo-features
    from the payload hash and ``fake=False`` raises.
    """

    def __init__(self, fake: bool = True, feature_dim: int = 8):
        self.fake = fake
        self.feature_dim = feature_dim

    def _decode(self, payload: bytes, kind: str):
        if not self.fake:
            raise NotImplementedError(
                "media codecs are not available in this environment; "
                "run with fake=True or install PIL/ffmpeg in production")
        h = hashlib.blake2b(payload, digest_size=16).digest()
        width = 16 + h[0]
        height = 16 + h[1]
        feats = np.frombuffer(
            hashlib.blake2b(payload, digest_size=self.feature_dim * 8).digest(),
            dtype=np.uint64).astype(np.float64)
        feats = feats / np.float64(2 ** 64)
        return width, height, feats

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        widths, heights, feats = [], [], []
        for payload, kind in zip(batch["payload"], batch["kind"]):
            w, h, f = self._decode(bytes(payload), kind)
            widths.append(w)
            heights.append(h)
            feats.append(f)
        return pd.DataFrame({
            "media_id": batch["media_id"].to_numpy(),
            "kind": batch["kind"].to_numpy(),
            "width": np.array(widths, dtype=np.int32),
            "height": np.array(heights, dtype=np.int32),
            "n_bytes": batch["payload"].map(len).astype(np.int64),
            "features": feats,
        })


def decode_media(ds, concurrency=None, batch_size: int = 32, fake: bool = True):
    """Small batches + actor pool: the canonical multimodal stage shape."""
    if concurrency is None:
        concurrency = pool_size()
    return ds.map_batches(DecodeStub,
                          fn_constructor_kwargs=dict(fake=fake),
                          batch_format="pandas", batch_size=batch_size,
                          concurrency=concurrency, num_cpus=1)
