"""Multimodal binary-column stages: real Ray plumbing over the
deterministic fake codec (the codec libs are absent in this env; the
``codec='real'`` path is a gated NotImplementedError stub)."""

from __future__ import annotations

import numpy as np
import pytest
import ray.data as rd

from dxa_pagerank_ray.stages.multimodal import (
    AudioFeatures,
    ImageDecoder,
    _decode_fake_audio,
    _decode_fake_image,
    audio_features,
    decode_images,
    encode_fake_audio,
    encode_fake_image,
    media_table,
    resize_images,
    sample_frames,
)


def test_fake_codec_roundtrip_deterministic():
    a = encode_fake_image("k", 16, 9)
    b = encode_fake_image("k", 16, 9)
    assert a == b
    img = _decode_fake_image(a)
    assert img.shape == (9, 16)
    rate, samples = _decode_fake_audio(encode_fake_audio("k", 8000, 100))
    assert rate == 8000 and len(samples) == 100


def test_decode_images_distributed_matches_local():
    t = media_table(40, seed=7)
    out = (
        decode_images(rd.from_arrow(t).repartition(4), concurrency=2)
        .sort("media_id")
        .take_all()
    )
    local = ImageDecoder()(t)
    assert len(out) == 40
    for row, i in zip(out, range(40)):
        assert row["width"] == local["width"][i].as_py()
        assert row["height"] == local["height"][i].as_py()
        assert row["mean_px"] == pytest.approx(local["mean_px"][i].as_py())


def test_resize_then_decode_schema():
    t = media_table(12, seed=3)
    small = resize_images(rd.from_arrow(t), out_w=8, out_h=8, concurrency=2)
    decoded = decode_images(small, concurrency=2).take_all()
    assert all(r["width"] == 8 and r["height"] == 8 for r in decoded)


def test_audio_features_distributed():
    t = media_table(24, seed=5)
    out = audio_features(rd.from_arrow(t).repartition(3), concurrency=2) \
        .sort("media_id").take_all()
    local = AudioFeatures()(t)
    for i, row in enumerate(out):
        assert row["rms"] == pytest.approx(local["rms"][i].as_py())
        assert row["duration_s"] == pytest.approx(local["duration_s"][i].as_py())


def test_frame_sampler_row_expansion():
    t = media_table(10, seed=9)
    rows = sample_frames(rd.from_arrow(t), every_k=2, concurrency=2).take_all()
    # every video has 2..5 frames; every 2nd sampled -> 1..3 rows per video
    per_id = {}
    for r in rows:
        per_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert set(per_id) == set(range(10))
    for idxs in per_id.values():
        assert sorted(idxs) == idxs and all(i % 2 == 0 for i in idxs)
    # frames decode as 8x8 fake images
    assert _decode_fake_image(rows[0]["image"]).shape == (8, 8)


def test_real_codec_is_gated_stub():
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present; real codec gate not exercised")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        ImageDecoder(codec="real")
    with pytest.raises(ValueError):
        ImageDecoder(codec="nope")


# ---------------------------------------------------------------- golden
# Content pinning for the driver's rows-only media queries: the fixture
# is an on-disk parquet source and every query output hashes to a pinned
# value — these fail on ANY content drift, not just row-count drift.

_GOLDEN = {
    "media_decode": (256, "36cbc8c3fe6c1edc08d52543237912e3"),
    "media_audio_features": (256, "34615b990548f6d5d323df193ce17139"),
    "media_frame_sample": (509, "12eaa2b241c954c26953993138b23791"),
}
_FIXTURE_HASH = "1b8d0610dc91ed8785a28c620a99fe56"


def _df_hash(df):
    import hashlib

    df = df[sorted(df.columns)].sort_values(sorted(df.columns)) \
        .reset_index(drop=True)
    b = df.round(12).to_csv(index=False).encode()
    return hashlib.blake2b(b, digest_size=16).hexdigest()


@pytest.mark.parametrize("name", sorted(_GOLDEN))
def test_media_query_golden_hash(name):
    import __ray_entry__ as entrymod

    rows, want = _GOLDEN[name]
    df = entrymod.queries()[name]("/root/testdata/sf0.001").to_pandas()
    assert len(df) == rows
    assert _df_hash(df) == want


def test_media_parquet_fixture_partition_independent(tmp_path):
    """Two different block counts write byte-identical fixture content,
    equal to the local media_table and to the pinned fixture hash."""
    import hashlib

    from dxa_pagerank_ray.stages.multimodal import write_media_parquet

    tables = []
    for blocks in (3, 8):
        out = str(tmp_path / f"m{blocks}")
        write_media_parquet(out, 256, seed=42, num_blocks=blocks)
        tables.append(
            rd.read_parquet(out).sort("media_id").to_pandas()
        )
    a, b = tables
    assert a.equals(b)
    local = media_table(256, seed=42).to_pandas()
    assert a.equals(local)
    fb = hashlib.blake2b(digest_size=16)
    for c in ["media_id", "image", "audio", "video"]:
        for v in a[c]:
            fb.update(str(v).encode() if c == "media_id" else v)
    assert fb.hexdigest() == _FIXTURE_HASH
