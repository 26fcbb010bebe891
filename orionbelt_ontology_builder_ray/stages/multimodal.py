"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages.

Codecs: PNG and WAV decode/resize are REAL — pure-stdlib
implementations in sources/codecs.py (zlib scanline filters, RIFF
PCM16) — selected with ``mode="real"``/``"auto"``.  Video decode has
no hand-rollable codec, so the frame sampler (and ``mode="fake"``,
the original stub and the driver-slot oracle path) derives
deterministic pseudo-outputs from the payload hash; the Ray-side
plumbing — schema, batch sizing, actor signature, output layout — is
identical across modes.

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


def synthesize_media_dataset(num_items: int = 64, seed: int = 42,
                             real: bool = False):
    """Deterministic media table for exercising the plumbing.

    ``real=False``: opaque seeded byte payloads (the original stub
    corpus).  ``real=True``: images are REAL PNGs (seeded pixel
    arrays, varying sizes) and audio rows are REAL PCM16 WAVs (seeded
    sine mixes) via sources/codecs.py; only video payloads stay
    opaque bytes (no video codec can be honestly hand-rolled)."""
    import ray.data as rd

    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    payloads, ctypes = [], []
    for i in range(num_items):
        kind = kinds[i % 3]
        if not real:
            payloads.append(rng.bytes(256 + (i % 7) * 64))
            ctypes.append("application/octet-stream")
        elif kind == "image":
            from ..sources.codecs import png_encode

            w, h = 16 + int(rng.randint(0, 48)), 16 + int(rng.randint(0, 48))
            payloads.append(png_encode(
                rng.randint(0, 256, (h, w, 3), dtype=np.uint8)))
            ctypes.append("image/png")
        elif kind == "audio":
            from ..sources.codecs import wav_encode

            n = 800 + int(rng.randint(0, 1600))
            t = np.arange(n)
            f0 = 5 + rng.randint(0, 40)
            s = (np.sin(t / f0) * 12000
                 + np.sin(t / (f0 * 2.7)) * 6000).astype(np.int16)
            payloads.append(wav_encode(s, rate=16000))
            ctypes.append("audio/wav")
        else:
            payloads.append(rng.bytes(256 + (i % 7) * 64))
            ctypes.append("application/octet-stream")
    rows = {
        "media_id": np.arange(num_items, dtype=np.int64),
        "kind": [kinds[i % 3] for i in range(num_items)],
        "payload": payloads,
        "content_type": ctypes,
        "source": [f"synthetic://{i}" for i in range(num_items)],
    }
    return rd.from_arrow(pa.table(rows, schema=MEDIA_SCHEMA))


class DecodeStub:
    """Actor-pool decode stage.

    Modes (``mode``, or the legacy ``fake`` bool):

    - ``fake``  — deterministic pseudo-decode from the payload hash
      (the original stub; the driver-slot oracle pins this path).
    - ``real``  — REAL decode via the pure-stdlib codecs
      (sources/codecs.py): ``image/png`` -> pixel array (true
      width/height, per-channel mean/std features), ``audio/wav`` ->
      PCM samples (width = n_samples, height = channels, RMS/mean/
      zero-crossing features).  Payloads with no hand-rollable codec
      (video) raise — filter kinds first.
    - ``auto``  — real where a codec exists (by content_type),
      hash-fake otherwise: the practical mixed-corpus setting.

    Production swaps the codec table for PIL/ffmpeg loaded once per
    actor in ``__init__`` — the stage shape does not change.
    """

    def __init__(self, fake: bool = True, feature_dim: int = 8,
                 mode: str = None):
        self.mode = mode if mode else ("fake" if fake else "real")
        self.feature_dim = feature_dim

    def _decode_fake(self, payload: bytes):
        h = hashlib.blake2b(payload, digest_size=16).digest()
        feats = np.frombuffer(
            hashlib.blake2b(payload, digest_size=self.feature_dim * 8).digest(),
            dtype=np.uint64).astype(np.float64)
        return 16 + h[0], 16 + h[1], feats / np.float64(2 ** 64)

    def _decode_real(self, payload: bytes, content_type: str):
        d = self.feature_dim
        if content_type == "image/png":
            from ..sources.codecs import png_decode

            img = png_decode(payload)
            px = img.reshape(-1, 1 if img.ndim == 2 else img.shape[2])
            px = px.astype(np.float64) / 255.0
            feats = np.zeros(d, np.float64)
            stats = np.concatenate([px.mean(axis=0), px.std(axis=0)])
            feats[:min(d, len(stats))] = stats[:d]
            return img.shape[1], img.shape[0], feats
        if content_type == "audio/wav":
            from ..sources.codecs import wav_decode

            samples, rate = wav_decode(payload)
            mono = (samples if samples.ndim == 1
                    else samples[:, 0]).astype(np.float64) / 32768.0
            feats = np.zeros(d, np.float64)
            zc = float(np.mean(np.abs(np.diff(np.signbit(mono).astype(
                np.int8))))) if len(mono) > 1 else 0.0
            stats = np.array([np.sqrt(np.mean(mono ** 2)), mono.mean(),
                              mono.max(initial=0.0), zc, rate / 1e5])
            feats[:min(d, len(stats))] = stats[:d]
            n_ch = 1 if samples.ndim == 1 else samples.shape[1]
            return len(mono), n_ch, feats
        raise NotImplementedError(
            f"no hand-rollable codec for {content_type!r}; use "
            "mode='auto' to pseudo-decode unknown payloads")

    def _decode(self, payload: bytes, content_type: str):
        if self.mode == "fake":
            return self._decode_fake(payload)
        if self.mode == "real":
            return self._decode_real(payload, content_type)
        try:
            return self._decode_real(payload, content_type)
        except Exception:
            # 'auto' is the mixed/dirty-corpus path: a corrupt PNG
            # raises zlib.error, a truncated header struct.error /
            # wave.Error — all of them fall back to the deterministic
            # pseudo-decode rather than crashing the stage (ADVICE r4)
            return self._decode_fake(payload)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        widths, heights, feats = [], [], []
        for payload, ctype in zip(batch["payload"], batch["content_type"]):
            w, h, f = self._decode(bytes(payload), ctype)
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


def decode_media(ds, concurrency=None, batch_size: int = 32,
                 fake: bool = True, mode: str = None):
    """Small batches + actor pool: the canonical multimodal stage shape.
    Decode and feature extraction are fused in one pass (DecodeStub
    emits width/height AND the feature vector — the decoded pixels
    never need to travel between stages)."""
    if concurrency is None:
        concurrency = pool_size()
    return ds.map_batches(DecodeStub,
                          fn_constructor_kwargs=dict(fake=fake, mode=mode),
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
                 fake: bool = True, mode: str = None):
        self.target_w = target_w
        self.target_h = target_h
        self.mode = mode if mode else ("fake" if fake else "real")

    def _resize_fake(self, payload: bytes) -> bytes:
        n = 3 * self.target_w * self.target_h
        h = hashlib.blake2b(payload, digest_size=32).digest()
        reps = -(-n // len(h))  # ceil
        return (h * reps)[:n]

    def _resize(self, payload: bytes, content_type: str):
        if self.mode != "fake" and content_type == "image/png":
            # REAL resize: decode -> nearest-neighbour resample ->
            # re-encode (sources/codecs.py; deterministic kernel)
            from ..sources.codecs import (png_decode, png_encode,
                                          resize_nearest)

            img = resize_nearest(png_decode(payload),
                                 self.target_w, self.target_h)
            return png_encode(img), "image/png"
        if self.mode == "real":
            raise NotImplementedError(
                f"no hand-rollable resize for {content_type!r}; use "
                "mode='auto' to pseudo-resize unknown payloads")
        return self._resize_fake(payload), "application/x-raw-rgb"

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        pairs = [self._resize(bytes(p), c)
                 for p, c in zip(batch["payload"], batch["content_type"])]
        out["payload"] = [p for p, _ in pairs]
        out["content_type"] = [c for _, c in pairs]
        return out


def resize_media(ds, target_w: int = 64, target_h: int = 64,
                 concurrency=None, batch_size: int = 32,
                 fake: bool = True, mode: str = None):
    """Resize as its own actor-pool stage; output rows keep the input
    schema with bounded payloads (the scale point of resizing early:
    every downstream byte moved is `3*w*h`, not the original size)."""
    if concurrency is None:
        concurrency = pool_size()
    return ds.map_batches(
        ResizeStub,
        fn_constructor_kwargs=dict(target_w=target_w, target_h=target_h,
                                   fake=fake, mode=mode),
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
