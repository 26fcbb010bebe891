"""Pure-stdlib media codecs: PNG (zlib + numpy) and WAV (wave module).

The container has no PIL/ffmpeg, but PNG is just zlib-compressed
filtered scanlines and WAV is a RIFF header over PCM — both fully
decodable with the standard library plus numpy.  These codecs upgrade
the multimodal stages (stages/multimodal.py) from hash-derived fakes
to REAL decode/resize work for images and audio (video stays stubbed:
no container/codec library can be hand-rolled honestly).

Scope (deliberately minimal, round-trips everything we encode):
- PNG: 8-bit greyscale / RGB / RGBA, non-interlaced; decoder handles
  all five scanline filters (None/Sub/Up/Average/Paeth), encoder
  writes filter 0.
- WAV: PCM16, any channel count / sample rate.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def png_encode(arr: np.ndarray) -> bytes:
    """uint8 array (h, w) / (h, w, 3) / (h, w, 4) -> PNG bytes
    (filter 0 scanlines, one zlib stream)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        color, channels = 0, 1
        arr = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color, channels = 2, 3
    elif arr.ndim == 3 and arr.shape[2] == 4:
        color, channels = 6, 4
    else:
        raise ValueError(f"unsupported image shape {arr.shape}")
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8),              # filter byte 0 per row
         arr.reshape(h, w * channels)], axis=1).tobytes()
    return (_PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 6))
            + _chunk(b"IEND", b""))


def _paeth(a, b, c):
    # vectorized Paeth predictor over int16 numpy arrays
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa_, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc), a,
                   np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (h, w[, channels]).  8-bit
    grey/RGB/RGBA, non-interlaced; all five filters."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat = 8, []
    w = h = color = None
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8 or color not in _CHANNELS or interlace:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={color}, "
                    f"interlace={interlace})")
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    ch = _CHANNELS[color]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    raw = raw.reshape(h, stride + 1)
    filters, rows = raw[:, 0], raw[:, 1:]
    out = np.zeros((h, stride), np.uint8)
    zero_row = np.zeros(stride, np.uint8)
    for y in range(h):
        f, cur = int(filters[y]), rows[y].copy()
        prev = out[y - 1] if y else zero_row
        if f == 0:
            out[y] = cur
        elif f == 2:                       # Up: fully vectorized
            out[y] = cur + prev
        else:                              # Sub/Average/Paeth need the
            row = out[y]                   # in-progress row; go per
            for x in range(stride):        # byte with window lookups
                a = int(row[x - ch]) if x >= ch else 0
                b = int(prev[x])
                if f == 1:
                    row[x] = (int(cur[x]) + a) & 0xFF
                elif f == 3:
                    row[x] = (int(cur[x]) + ((a + b) >> 1)) & 0xFF
                elif f == 4:
                    c = int(prev[x - ch]) if x >= ch else 0
                    row[x] = (int(cur[x]) + int(_paeth(
                        np.uint8(a), np.uint8(b), np.uint8(c)))) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter {f}")
    img = out.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


def resize_nearest(img: np.ndarray, target_w: int,
                   target_h: int) -> np.ndarray:
    """Nearest-neighbour resample (the deterministic resize kernel —
    no interpolation-library variance across platforms)."""
    h, w = img.shape[:2]
    ys = (np.arange(target_h) * h // target_h).clip(0, h - 1)
    xs = (np.arange(target_w) * w // target_w).clip(0, w - 1)
    return img[ys][:, xs]


def wav_encode(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 array (n,) or (n, channels) -> WAV (PCM16) bytes."""
    samples = np.asarray(samples, dtype=np.int16)
    channels = 1 if samples.ndim == 1 else samples.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(channels)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.tobytes())
    return buf.getvalue()


def wav_decode(data: bytes):
    """WAV bytes -> (int16 array (n,) or (n, channels), rate)."""
    with wave.open(io.BytesIO(data), "rb") as f:
        if f.getsampwidth() != 2:
            raise ValueError("only PCM16 supported")
        n, ch, rate = f.getnframes(), f.getnchannels(), f.getframerate()
        arr = np.frombuffer(f.readframes(n), np.int16)
    return (arr if ch == 1 else arr.reshape(-1, ch)), rate
