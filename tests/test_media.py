"""Audio/video multimodal plumbing: deterministic codecs, byte-offset
frame seeking, actor-pool feature stages, stubbed real-codec boundary."""

import numpy as np
import pytest

from dumb_crawler_ray.sources import media


def test_audio_codec_roundtrip():
    sr = 8000
    t = np.arange(sr)
    wave = 0.5 * np.sin(2 * np.pi * 440 * t / sr)
    blob = media.encode_audio(wave, sr)
    out, sr2 = media.decode_audio(blob)
    assert sr2 == sr and len(out) == sr
    assert np.abs(out - wave).max() < 1e-3  # int16 quantization only
    with pytest.raises(ValueError):
        media.decode_audio(b"garbage")
    with pytest.raises(ValueError):
        media.decode_audio(blob[:50])


def test_video_offsets_and_frame_decode():
    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 255, (16, 24, 3), dtype=np.uint8) for _ in range(5)]
    blob = media.encode_video(frames)
    offs = media.video_frame_offsets(blob)
    assert len(offs) == 5
    for k, (off, ln) in enumerate(offs):
        assert (media.decode_video_frame(blob, off, ln) == frames[k]).all()
    with pytest.raises(ValueError):
        media.video_frame_offsets(b"nope")


def test_gen_deterministic():
    a1, a2 = media.gen_audio(42, 8), media.gen_audio(42, 8)
    assert a1.equals(a2)
    v1, v2 = media.gen_video(42, 4), media.gen_video(42, 4)
    assert v1.equals(v2)
    assert media.gen_audio(43, 8).column("bytes")[0].as_py() != \
        a1.column("bytes")[0].as_py()


def test_external_codec_stubs_raise():
    from dumb_crawler_ray.ops.media import (decode_external_audio,
                                            decode_external_video)

    with pytest.raises(NotImplementedError):
        decode_external_audio(b"", "mp3")
    with pytest.raises(NotImplementedError):
        decode_external_video(b"", "h264")


def test_audio_features_pipeline(ray_session, tmp_path):
    from dumb_crawler_ray.ops.media import audio_features
    from dumb_crawler_ray.sources.media import write_media_fixture

    d = write_media_fixture(tmp_path, seed=7, n_audio=32, n_video=4)
    df = audio_features(f"{d}/audio.parquet").to_pandas()
    assert len(df) == 32
    assert (df["duration_s"] == 1.0).all()
    assert df["rms"].between(0.05, 1.0).all()
    assert df["spectral_centroid_hz"].between(40, 2400).all()


def test_video_frame_sample_pipeline(ray_session, tmp_path):
    from dumb_crawler_ray.ops.media import video_frame_sample
    from dumb_crawler_ray.sources.media import write_media_fixture

    d = write_media_fixture(tmp_path, seed=7, n_audio=4, n_video=8)
    df = video_frame_sample(f"{d}/video.parquet", every_k=4).to_pandas()
    # 12 frames, every 4th → frames 0, 4, 8 per video
    assert len(df) == 8 * 3
    assert sorted(df["frame_idx"].unique()) == [0, 4, 8]
    assert (df["w"] == 48).all() and (df["h"] == 32).all()
    # brightness drifts upward within a clip (deterministic generator) —
    # except the planted scene-cut clips (every 3rd), whose second half
    # restarts from an independent base
    for vid, g in df.groupby("video_id"):
        if int(vid.rsplit("-", 1)[1]) % 3 == 0:
            continue
        g = g.sort_values("frame_idx")
        assert g["mean_pixel"].is_monotonic_increasing


def test_audio_vad_segments(ray_session, tmp_path):
    """Gated clips (every 3rd) must segment into exactly the 3 planted
    active spans; continuous clips are one full-clip segment."""
    from dumb_crawler_ray.ops.media import audio_vad_segments
    from dumb_crawler_ray.sources.media import write_media_fixture

    d = write_media_fixture(tmp_path, seed=7, n_audio=24, n_video=4)
    df = audio_vad_segments(f"{d}/audio.parquet").to_pandas()
    for aid, g in df.groupby("audio_id"):
        idx = int(aid.rsplit("-", 1)[1])
        if idx % 3 == 0:
            assert len(g) == 3, (aid, g)
            assert list(g.sort_values("seg_idx")["start_s"]) == [0.0, 0.4,
                                                                 0.8]
            assert (g["end_s"] - g["start_s"]).round(4).eq(0.2).all()
        else:
            assert len(g) == 1
            assert g["start_s"].iloc[0] == 0.0
            assert g["end_s"].iloc[0] == 1.0
    assert (df["mean_rms"] > 0.01).all()


def test_video_scene_cuts(ray_session, tmp_path):
    """Every 3rd clip has its planted cut detected at the midpoint
    frame; smooth-pan clips report zero cuts."""
    from dumb_crawler_ray.ops.media import video_scene_cuts
    from dumb_crawler_ray.sources.media import write_media_fixture

    d = write_media_fixture(tmp_path, seed=7, n_audio=4, n_video=12)
    df = video_scene_cuts(f"{d}/video.parquet").to_pandas()
    assert len(df) == 12
    for row in df.itertuples():
        idx = int(row.video_id.rsplit("-", 1)[1])
        if idx % 3 == 0:
            assert row.n_cuts == 1 and row.first_cut_idx == 6, row
        else:
            assert row.n_cuts == 0 and row.first_cut_idx == -1, row
