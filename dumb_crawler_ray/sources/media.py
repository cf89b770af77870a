"""Deterministic synthetic audio/video fixtures — multimodal binary
columns with typed metadata (the audio/video siblings of the image
input-hint table).

Formats are in-repo byte layouts so the PLUMBING (schemas, byte-offset
frame indexing, batch sizing for wide binaries, actor signatures) is real
and tested; real-codec decode (mp3/h264/...) is the stubbed integration
point (`ops.media.decode_external_*`, NotImplementedError — no media
library ships in this container).

audio `bytes`: b"AUD1" + <u32 sample_rate> + <u32 n_samples> + int16 LE PCM
video `bytes`: b"VID1" + <u32 n_frames> + n_frames × frame, where each
frame is one image-codec payload (functions.codec) prefixed by <u32 len>.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from ..functions import codec

AUDIO_MAGIC = b"AUD1"
VIDEO_MAGIC = b"VID1"


def encode_audio(samples: np.ndarray, sample_rate: int) -> bytes:
    pcm = np.clip(samples, -1.0, 1.0)
    ints = (pcm * 32767.0).astype("<i2")
    return AUDIO_MAGIC + struct.pack("<II", sample_rate, len(ints)) + ints.tobytes()


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """→ (float64 samples in [-1, 1], sample_rate). Raises ValueError on a
    corrupt payload."""
    if len(data) < 12 or data[:4] != AUDIO_MAGIC:
        raise ValueError("bad audio magic")
    sr, n = struct.unpack_from("<II", data, 4)
    pcm = np.frombuffer(data, dtype="<i2", offset=12, count=n)
    if len(pcm) != n:
        raise ValueError("truncated audio payload")
    return pcm.astype(np.float64) / 32767.0, sr


def encode_video(frames: list[np.ndarray]) -> bytes:
    parts = [VIDEO_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        payload = codec.encode(f, "png")
        parts.append(struct.pack("<I", len(payload)))
        parts.append(payload)
    return b"".join(parts)


def video_frame_offsets(data: bytes) -> list[tuple[int, int]]:
    """Byte-offset index of frames — lets a sampler skip frames WITHOUT
    decoding them (the real-container analogue of keyframe seeking)."""
    if len(data) < 8 or data[:4] != VIDEO_MAGIC:
        raise ValueError("bad video magic")
    (n,) = struct.unpack_from("<I", data, 4)
    out = []
    pos = 8
    for _ in range(n):
        if pos + 4 > len(data):
            raise ValueError("truncated video payload")
        (ln,) = struct.unpack_from("<I", data, pos)
        pos += 4
        out.append((pos, ln))
        pos += ln
    return out


def decode_video_frame(data: bytes, offset: int, length: int) -> np.ndarray:
    return codec.decode(data[offset:offset + length])


def gen_audio(seed: int, n: int, sample_rate: int = 8000) -> pa.Table:
    rng = np.random.default_rng(seed * 7919 + 11)
    ids, blobs, srs, lens, caps = [], [], [], [], []
    t = np.arange(sample_rate)  # 1 s clips
    for i in range(n):
        f1, f2 = rng.uniform(80, 1200, 2)
        amp = rng.uniform(0.2, 0.9)
        wave = amp * 0.6 * np.sin(2 * np.pi * f1 * t / sample_rate)
        wave += amp * 0.4 * np.sin(2 * np.pi * f2 * t / sample_rate)
        cap = f"tone mix {f1:.0f}Hz+{f2:.0f}Hz amp {amp:.2f}"
        if i % 3 == 0:
            # every 3rd clip is GATED: 5 × 0.2 s segments, the odd ones
            # silent — planted structure so VAD segmentation has true
            # positives (continuous clips stay the common case)
            seg = (t // (sample_rate // 5)) % 2 == 0
            wave = wave * seg
            cap += " gated"
        ids.append(f"aud-{seed}-{i:06d}")
        blobs.append(encode_audio(wave, sample_rate))
        srs.append(sample_rate)
        lens.append(len(t))
        caps.append(cap)
    return pa.table(
        {
            "audio_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "sample_rate": pa.array(srs, pa.int32()),
            "n_samples": pa.array(lens, pa.int32()),
            "fmt": pa.array(["pcm16"] * n, pa.string()),
            "caption": pa.array(caps, pa.string()),
        }
    )


def gen_video(seed: int, n: int, w: int = 48, h: int = 32,
              n_frames: int = 12) -> pa.Table:
    rng = np.random.default_rng(seed * 104729 + 13)
    ids, blobs, caps = [], [], []
    for i in range(n):
        base = rng.integers(0, 200, size=(h, w, 3), dtype=np.uint8)
        drift = rng.integers(1, 5)
        cut_at = n_frames // 2 if i % 3 == 0 else None
        if cut_at is not None:
            # every 3rd clip has a planted SCENE CUT halfway: the second
            # half drifts from an independent base
            base2 = rng.integers(0, 200, size=(h, w, 3), dtype=np.uint8)
        frames = []
        for k in range(n_frames):
            if cut_at is not None and k >= cut_at:
                f = base2.astype(np.int16) + (k - cut_at) * drift
            else:
                f = base.astype(np.int16) + k * drift
            frames.append(np.clip(f, 0, 255).astype(np.uint8))
        ids.append(f"vid-{seed}-{i:06d}")
        blobs.append(encode_video(frames))
        caps.append(f"synthetic pan drift {drift}"
                    + (f" cut@{cut_at}" if cut_at is not None else ""))
    return pa.table(
        {
            "video_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "n_frames": pa.array([n_frames] * n, pa.int32()),
            "w": pa.array([w] * n, pa.int32()),
            "h": pa.array([h] * n, pa.int32()),
            "fps": pa.array([12] * n, pa.int32()),
            "fmt": pa.array(["rawv1"] * n, pa.string()),
            "caption": pa.array(caps, pa.string()),
        }
    )


def _with_expected_audio(t: pa.Table) -> pa.Table:
    """Stored-pixel pact for the audio ops: append the EXPECTED
    feature/VAD outputs computed from the encoded bytes at build time by
    the actual workers (bit-identical by construction), so the
    distributed pipelines must reproduce them from `bytes` alone.
    Lazy import — ops depends on sources, not vice versa."""
    from ..ops.media import AudioFeaturesWorker, AudioVadWorker

    feats = AudioFeaturesWorker()(t)  # 1:1 with input order
    vad = AudioVadWorker()(t)         # variable rows per clip, in order
    by_id: dict[str, list] = {aid: [] for aid in t.column("audio_id").to_pylist()}
    for row in vad.to_pylist():
        by_id[row["audio_id"]].append(row)
    ids = t.column("audio_id").to_pylist()
    return (
        t.append_column("exp_rms", feats.column("rms"))
        .append_column("exp_zcr", feats.column("zero_crossing_rate"))
        .append_column("exp_peak", feats.column("peak"))
        .append_column("exp_centroid_hz",
                       feats.column("spectral_centroid_hz"))
        .append_column("exp_duration_s", feats.column("duration_s"))
        .append_column("exp_vad_seg_idx", pa.array(
            [[r["seg_idx"] for r in by_id[a]] for a in ids],
            pa.list_(pa.int64())))
        .append_column("exp_vad_start_s", pa.array(
            [[r["start_s"] for r in by_id[a]] for a in ids],
            pa.list_(pa.float64())))
        .append_column("exp_vad_end_s", pa.array(
            [[r["end_s"] for r in by_id[a]] for a in ids],
            pa.list_(pa.float64())))
        .append_column("exp_vad_n_frames", pa.array(
            [[r["n_frames"] for r in by_id[a]] for a in ids],
            pa.list_(pa.int64())))
        .append_column("exp_vad_mean_rms", pa.array(
            [[r["mean_rms"] for r in by_id[a]] for a in ids],
            pa.list_(pa.float64())))
    )


def _with_expected_video(t: pa.Table) -> pa.Table:
    """Stored-pixel pact for the video ops (every_k=4 default sampling
    and the scene-cut summary), same build-time worker replay as audio."""
    from ..ops.media import FrameSampleWorker, SceneCutWorker

    frames = FrameSampleWorker()(t)  # rows per sampled frame, in order
    cuts = SceneCutWorker()(t)       # 1:1 with input order
    by_id: dict[str, list] = {vid: [] for vid in t.column("video_id").to_pylist()}
    for row in frames.to_pylist():
        by_id[row["video_id"]].append(row)
    ids = t.column("video_id").to_pylist()
    return (
        t.append_column("exp_frame_idx", pa.array(
            [[r["frame_idx"] for r in by_id[v]] for v in ids],
            pa.list_(pa.int64())))
        .append_column("exp_frame_means", pa.array(
            [[r["mean_pixel"] for r in by_id[v]] for v in ids],
            pa.list_(pa.float64())))
        .append_column("exp_n_cuts", cuts.column("n_cuts"))
        .append_column("exp_first_cut_idx", cuts.column("first_cut_idx"))
        .append_column("exp_max_frame_diff", cuts.column("max_frame_diff"))
    )


def write_media_fixture(out_dir, seed: int = 42, n_audio: int = 256,
                        n_video: int = 64):
    """audio.parquet + video.parquet under out_dir (idempotent)."""
    import json
    from pathlib import Path

    import pyarrow.parquet as pq

    out = Path(out_dir)
    meta = out / "media_meta.json"
    want = {"seed": seed, "n_audio": n_audio, "n_video": n_video, "version": 3}
    if meta.exists() and json.loads(meta.read_text()) == want:
        return out
    out.mkdir(parents=True, exist_ok=True)
    pq.write_table(_with_expected_audio(gen_audio(seed, n_audio)),
                   out / "audio.parquet", row_group_size=256)
    pq.write_table(_with_expected_video(gen_video(seed, n_video)),
                   out / "video.parquet", row_group_size=64)
    meta.write_text(json.dumps(want))
    return out
