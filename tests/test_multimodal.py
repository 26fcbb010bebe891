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
    import pandas as pd

    stub = DecodeStub(fake=False)
    with pytest.raises(NotImplementedError):
        stub(pd.DataFrame({"media_id": [1], "kind": ["image"],
                           "payload": [b"xx"]}))


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
