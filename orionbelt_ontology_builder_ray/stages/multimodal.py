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
    """Small batches + actor pool: the canonical multimodal stage shape.
    Decode and feature extraction are fused in one pass (DecodeStub
    emits width/height AND the feature vector — the decoded pixels
    never need to travel between stages)."""
    if concurrency is None:
        concurrency = pool_size()
    return ds.map_batches(DecodeStub,
                          fn_constructor_kwargs=dict(fake=fake),
                          batch_format="pandas", batch_size=batch_size,
                          concurrency=concurrency, num_cpus=1)


class ResizeStub:
    """Actor-pool resize stage over raw media rows.

    Real deployments decode + resample in ``_resize`` (PIL/libvips
    loaded once per actor); here the fake path derives a deterministic
    payload of exactly ``3 * target_w * target_h`` bytes from the
    source payload hash, so the output SIZE contract (resized payloads
    are bounded by the target box, unlike inputs) and the schema are
    real and tested.  Output keeps MEDIA_SCHEMA so resized datasets
    feed every downstream media stage unchanged.
    """

    def __init__(self, target_w: int = 64, target_h: int = 64,
                 fake: bool = True):
        self.target_w = target_w
        self.target_h = target_h
        self.fake = fake

    def _resize(self, payload: bytes) -> bytes:
        if not self.fake:
            raise NotImplementedError(
                "media codecs are not available in this environment; "
                "run with fake=True or install PIL/libvips in production")
        n = 3 * self.target_w * self.target_h
        h = hashlib.blake2b(payload, digest_size=32).digest()
        reps = -(-n // len(h))  # ceil
        return (h * reps)[:n]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["payload"] = [self._resize(bytes(p)) for p in batch["payload"]]
        out["content_type"] = "application/x-raw-rgb"
        return out


def resize_media(ds, target_w: int = 64, target_h: int = 64,
                 concurrency=None, batch_size: int = 32, fake: bool = True):
    """Resize as its own actor-pool stage; output rows keep the input
    schema with bounded payloads (the scale point of resizing early:
    every downstream byte moved is `3*w*h`, not the original size)."""
    if concurrency is None:
        concurrency = pool_size()
    return ds.map_batches(
        ResizeStub,
        fn_constructor_kwargs=dict(target_w=target_w, target_h=target_h,
                                   fake=fake),
        batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)


FRAME_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("frame_idx", pa.int64()),
    ("ts_sec", pa.float64()),
    ("payload", pa.binary()),
])


class FrameSampleStub:
    """Actor-pool frame sampler: one input VIDEO row fans out to
    ``n_frames`` frame rows (a flat-map-shaped map_batches — output
    row count differs from input); non-video rows are dropped.

    Real deployments seek/decode keyframes in ``_frame`` (ffmpeg once
    per actor); the fake path derives each frame payload from
    blake2b(payload, frame_idx) so fan-out, schema, and ordering are
    real and tested.  ``fps`` positions the deterministic timestamps.
    """

    def __init__(self, n_frames: int = 4, fps: float = 1.0,
                 fake: bool = True):
        self.n_frames = n_frames
        self.fps = fps
        self.fake = fake

    def _frame(self, payload: bytes, idx: int) -> bytes:
        if not self.fake:
            raise NotImplementedError(
                "media codecs are not available in this environment; "
                "run with fake=True or install ffmpeg in production")
        return hashlib.blake2b(payload + idx.to_bytes(4, "big"),
                               digest_size=64).digest()

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        vids = batch[batch["kind"] == "video"]
        ids, idxs, ts, frames = [], [], [], []
        for media_id, payload in zip(vids["media_id"], vids["payload"]):
            for i in range(self.n_frames):
                ids.append(media_id)
                idxs.append(i)
                ts.append(i / self.fps)
                frames.append(self._frame(bytes(payload), i))
        return pd.DataFrame({
            "media_id": pd.Series(ids, dtype=np.int64),
            "frame_idx": pd.Series(idxs, dtype=np.int64),
            "ts_sec": pd.Series(ts, dtype=np.float64),
            "payload": pd.Series(frames, dtype=object),
        })


def sample_frames(ds, n_frames: int = 4, fps: float = 1.0,
                  concurrency=None, batch_size: int = 16,
                  fake: bool = True):
    """Frame sampling as an actor-pool stage.  batch_size is SMALLER
    than decode's: each input row multiplies into n_frames output
    payloads, so the in-flight bytes per batch scale by the fan-out."""
    if concurrency is None:
        concurrency = pool_size()
    return ds.map_batches(
        FrameSampleStub,
        fn_constructor_kwargs=dict(n_frames=n_frames, fps=fps, fake=fake),
        batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)
