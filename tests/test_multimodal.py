"""Multimodal stage plumbing (stages/multimodal.py): decode /
feature-extract (fused), resize, frame-sample.  Codecs are absent in
this container — the fakes are deterministic, so the Ray-side schema,
fan-out, batch-size, and actor contracts are what these tests pin.
"""

import numpy as np
import pytest

from orionbelt_ontology_builder_ray.stages.multimodal import (
    DecodeStub, FrameSampleStub, ResizeStub, decode_media, resize_media,
    sample_frames, synthesize_media_dataset,
)


def test_decode_fake_deterministic(ray_session):
    a = decode_media(synthesize_media_dataset(24), concurrency=2).to_pandas()
    b = decode_media(synthesize_media_dataset(24), concurrency=2).to_pandas()
    a = a.sort_values("media_id").reset_index(drop=True)
    b = b.sort_values("media_id").reset_index(drop=True)
    assert (a["width"] == b["width"]).all()
    assert all(np.array_equal(x, y) for x, y in zip(a["features"],
                                                    b["features"]))


def test_decode_real_path_raises():
    """real mode on a payload with no hand-rollable codec (video /
    opaque bytes) must raise, not silently pseudo-decode."""
    import pandas as pd

    stub = DecodeStub(fake=False)
    with pytest.raises(NotImplementedError):
        stub(pd.DataFrame({"media_id": [1], "kind": ["video"],
                           "payload": [b"xx"],
                           "content_type": ["application/octet-stream"]}))


def test_resize_bounds_payload_and_keeps_schema(ray_session):
    ds = synthesize_media_dataset(12)
    out = resize_media(ds, target_w=8, target_h=8, concurrency=2) \
        .to_pandas().sort_values("media_id").reset_index(drop=True)
    assert len(out) == 12
    assert set(out.columns) == {"media_id", "kind", "payload",
                                "content_type", "source"}
    # the resize contract: every output payload is exactly 3*w*h bytes
    assert all(len(p) == 3 * 8 * 8 for p in out["payload"])
    # deterministic
    again = resize_media(synthesize_media_dataset(12), target_w=8,
                         target_h=8, concurrency=2) \
        .to_pandas().sort_values("media_id").reset_index(drop=True)
    assert all(bytes(a) == bytes(b)
               for a, b in zip(out["payload"], again["payload"]))


def test_resized_output_feeds_decode(ray_session):
    """Resize keeps MEDIA_SCHEMA, so its output pipes straight into the
    decode stage."""
    ds = resize_media(synthesize_media_dataset(9), concurrency=2)
    dec = decode_media(ds, concurrency=2).to_pandas()
    assert len(dec) == 9


def test_frame_sampling_fanout(ray_session):
    ds = synthesize_media_dataset(12)  # kinds cycle image/audio/video
    out = sample_frames(ds, n_frames=3, fps=2.0, concurrency=2) \
        .to_pandas().sort_values(["media_id", "frame_idx"]) \
        .reset_index(drop=True)
    n_videos = 12 // 3  # every third item is a video
    assert len(out) == n_videos * 3
    assert sorted(out["frame_idx"].unique()) == [0, 1, 2]
    # fps positions timestamps: frame i at i/fps seconds
    assert np.allclose(sorted(out["ts_sec"].unique()), [0.0, 0.5, 1.0])
    # frames differ per index but are deterministic per (video, idx)
    g = out.groupby("media_id")["payload"].apply(
        lambda s: len({bytes(p) for p in s}))
    assert (g == 3).all()


def test_frame_sample_real_path_raises():
    import pandas as pd

    stub = FrameSampleStub(fake=False)
    with pytest.raises(NotImplementedError):
        stub(pd.DataFrame({"media_id": [1], "kind": ["video"],
                           "payload": [b"xx"]}))


def test_resize_real_path_raises():
    import pandas as pd

    stub = ResizeStub(fake=False)
    with pytest.raises(NotImplementedError):
        stub(pd.DataFrame({"media_id": [1], "kind": ["image"],
                           "payload": [b"xx"], "content_type": ["x"],
                           "source": ["s"]}))


def test_codecs_roundtrip():
    from orionbelt_ontology_builder_ray.sources.codecs import (
        png_decode, png_encode, resize_nearest, wav_decode, wav_encode)

    rng = np.random.RandomState(1)
    for shape in [(9, 7), (12, 5, 3), (6, 6, 4)]:
        img = rng.randint(0, 256, shape, dtype=np.uint8)
        out = png_decode(png_encode(img))
        assert out.shape == img.shape and (out == img).all()
    s = (np.sin(np.arange(1500) / 11) * 15000).astype(np.int16)
    d, rate = wav_decode(wav_encode(s, rate=22050))
    assert rate == 22050 and (d == s).all()
    r = resize_nearest(rng.randint(0, 256, (10, 20, 3), np.uint8), 5, 4)
    assert r.shape == (4, 5, 3)


def test_png_decoder_handles_filtered_scanlines():
    """The decoder must handle filters our encoder never writes
    (Sub/Up/Average/Paeth) — real-world PNGs use them."""
    import struct
    import zlib

    from orionbelt_ontology_builder_ray.sources.codecs import (
        _PNG_SIG, _chunk, png_decode)

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (8, 6, 3), dtype=np.uint8)
    h, w, ch = img.shape
    stride = w * ch
    rows = img.reshape(h, stride).astype(np.int16)
    for f in (1, 2, 3, 4):
        enc = np.zeros((h, stride + 1), np.uint8)
        for y in range(h):
            enc[y, 0] = f
            prev = rows[y - 1] if y else np.zeros(stride, np.int16)
            cur = rows[y]
            left = np.concatenate([np.zeros(ch, np.int16), cur[:-ch]])
            upleft = np.concatenate([np.zeros(ch, np.int16), prev[:-ch]])
            if f == 1:
                delta = cur - left
            elif f == 2:
                delta = cur - prev
            elif f == 3:
                delta = cur - ((left + prev) >> 1)
            else:
                p = left + prev - upleft
                pa_, pb, pc = (np.abs(p - left), np.abs(p - prev),
                               np.abs(p - upleft))
                pred = np.where((pa_ <= pb) & (pa_ <= pc), left,
                                np.where(pb <= pc, prev, upleft))
                delta = cur - pred
            enc[y, 1:] = (delta & 0xFF).astype(np.uint8)
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        png = (_PNG_SIG + _chunk(b"IHDR", ihdr)
               + _chunk(b"IDAT", zlib.compress(enc.tobytes()))
               + _chunk(b"IEND", b""))
        out = png_decode(png)
        assert (out == img).all(), f"filter {f}"


def test_real_decode_recovers_true_dimensions(ray_session):
    from orionbelt_ontology_builder_ray.sources.codecs import png_decode, wav_decode
    from orionbelt_ontology_builder_ray.stages.multimodal import (
        decode_media, synthesize_media_dataset)

    ds = synthesize_media_dataset(num_items=18, real=True)
    rows = {r["media_id"]: r for r in ds.take_all()}
    out = decode_media(ds, mode="auto", batch_size=6).to_pandas() \
        .set_index("media_id")
    for mid, r in rows.items():
        got = out.loc[mid]
        if r["content_type"] == "image/png":
            img = png_decode(bytes(r["payload"]))
            assert (got["width"], got["height"]) == (img.shape[1],
                                                     img.shape[0])
            assert abs(got["features"][0]
                       - img[:, :, 0].mean() / 255.0) < 1e-12
        elif r["content_type"] == "audio/wav":
            samples, _ = wav_decode(bytes(r["payload"]))
            assert got["width"] == len(samples)
            assert got["height"] == 1


def test_real_mode_raises_on_video(ray_session):
    import pytest as _pytest

    from orionbelt_ontology_builder_ray.stages.multimodal import (
        decode_media, synthesize_media_dataset)

    ds = synthesize_media_dataset(num_items=6, real=True)
    with _pytest.raises(Exception):
        decode_media(ds, mode="real", batch_size=6).materialize()


def test_real_resize_reencodes_png(ray_session):
    from orionbelt_ontology_builder_ray.sources.codecs import png_decode
    from orionbelt_ontology_builder_ray.stages.multimodal import (
        resize_media, synthesize_media_dataset)

    ds = synthesize_media_dataset(num_items=9, real=True)
    out = resize_media(ds, target_w=8, target_h=5, mode="auto",
                       batch_size=4).to_pandas()
    for _, r in out.iterrows():
        if r["content_type"] == "image/png":
            img = png_decode(bytes(r["payload"]))
            assert img.shape == (5, 8, 3)


def test_codec_fuzz_roundtrip():
    """Randomized shapes/dtypes through the PNG and WAV codecs."""
    from orionbelt_ontology_builder_ray.sources.codecs import (
        png_decode, png_encode, wav_decode, wav_encode)

    rng = np.random.RandomState(99)
    for _ in range(25):
        h, w = int(rng.randint(1, 40)), int(rng.randint(1, 40))
        ch = rng.choice([0, 3, 4])
        shape = (h, w) if ch == 0 else (h, w, int(ch))
        img = rng.randint(0, 256, shape, dtype=np.uint8)
        out = png_decode(png_encode(img))
        assert out.shape == img.shape and (out == img).all(), shape
    for _ in range(10):
        n = int(rng.randint(1, 5000))
        nch = int(rng.choice([1, 2]))
        s = rng.randint(-32768, 32767, (n,) if nch == 1 else (n, nch)) \
            .astype(np.int16)
        rate = int(rng.choice([8000, 16000, 44100]))
        d, r = wav_decode(wav_encode(s, rate=rate))
        assert r == rate and d.shape == s.shape and (d == s).all()


def test_auto_mode_survives_corrupt_payloads():
    """mode='auto' is the mixed/dirty-corpus path (ADVICE r4): a
    corrupt PNG body (zlib.error), a truncated header (struct.error),
    and a mangled WAV (wave.Error) must all fall back to the
    deterministic pseudo-decode, never crash the stage — while valid
    payloads still take the real decoder."""
    import pandas as pd

    from orionbelt_ontology_builder_ray.sources.codecs import (
        png_encode, wav_encode)

    good_png = png_encode(np.full((4, 3, 3), 7, dtype=np.uint8))
    corrupt_png = good_png[:40] + b"\x00" * 20 + good_png[60:]
    truncated_png = good_png[:20]
    bad_wav = b"RIFF" + b"\x01" * 30
    batch = pd.DataFrame({
        "media_id": np.arange(5, dtype=np.int64),
        "kind": ["image", "image", "image", "audio", "audio"],
        "payload": [good_png, corrupt_png, truncated_png, bad_wav,
                    wav_encode(np.zeros(64, np.int16))],
        "content_type": ["image/png"] * 3 + ["audio/wav"] * 2})
    out = DecodeStub(mode="auto")(batch)
    assert len(out) == 5
    # the valid PNG really decoded (true dims), corrupt ones got the
    # deterministic fake (same contract as mode='fake')
    assert out.loc[0, "width"] == 3 and out.loc[0, "height"] == 4
    fake = DecodeStub(mode="fake")(batch.iloc[[1, 2, 3]])
    assert (out.loc[[1, 2, 3], "width"].to_numpy()
            == fake["width"].to_numpy()).all()
