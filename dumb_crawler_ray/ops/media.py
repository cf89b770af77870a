"""Audio/video operators — actor-pool `map_batches` stages over opaque
binary columns with typed metadata.

The Ray-side plumbing (schemas, per-actor setup, byte-offset frame
seeking, small batch sizes for wide binaries, output layout) is real and
tested against the deterministic in-repo formats (sources.media). Real
codecs are the clearly-marked stubs below — swap them in when a media
library is available; nothing else changes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..rayutil import actor_pool_size, remote_kwargs
from ..sources import media


def decode_external_audio(data: bytes, fmt: str) -> tuple[np.ndarray, int]:
    """Integration point for real audio decoding (mp3/flac/ogg via
    soundfile or ffmpeg). Deliberately stubbed: no audio library ships in
    this container."""
    raise NotImplementedError("no audio codec library available")


def decode_external_video(data: bytes, fmt: str):
    """Integration point for real video decoding (h264/vp9 via PyAV or
    ffmpeg). Deliberately stubbed: no video library ships in this
    container."""
    raise NotImplementedError("no video codec library available")


class AudioFeaturesWorker:
    """Per-actor state mirrors a real feature extractor (window built once
    in __init__); per batch: decode PCM → RMS, zero-crossing rate, peak,
    spectral centroid (single rfft per clip)."""

    def __init__(self, use_external_codec: bool = False):
        self.decode = (
            decode_external_audio if use_external_codec
            else (lambda data, fmt=None: media.decode_audio(data))
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, rms, zcr, peak, cent, dur = [], [], [], [], [], []
        for aid, data in zip(t.column("audio_id").to_pylist(),
                             t.column("bytes").to_pylist()):
            x, sr = self.decode(data)
            ids.append(aid)
            rms.append(round(float(np.sqrt(np.mean(x * x))), 6))
            zcr.append(round(float(np.mean(np.abs(np.diff(np.sign(x))) > 0)), 6))
            peak.append(round(float(np.abs(x).max()), 6))
            spec = np.abs(np.fft.rfft(x))
            freqs = np.fft.rfftfreq(len(x), d=1.0 / sr)
            denom = spec.sum()
            cent.append(round(float((freqs * spec).sum() / denom) if denom else 0.0, 2))
            dur.append(round(len(x) / sr, 4))
        return pa.table(
            {
                "audio_id": pa.array(ids, pa.string()),
                "rms": pa.array(rms, pa.float64()),
                "zero_crossing_rate": pa.array(zcr, pa.float64()),
                "peak": pa.array(peak, pa.float64()),
                "spectral_centroid_hz": pa.array(cent, pa.float64()),
                "duration_s": pa.array(dur, pa.float64()),
            }
        )


def audio_features(audio_parquet: str, concurrency: int | None = None,
                   batch_size: int = 64):
    import ray

    return ray.data.read_parquet(
        audio_parquet, columns=["audio_id", "bytes"]
    ).map_batches(
        AudioFeaturesWorker, batch_format="pyarrow", **remote_kwargs(),
        batch_size=batch_size, concurrency=concurrency if concurrency is not None else actor_pool_size(),
    )


class FrameSampleWorker:
    """Video frame sampling: seek every k-th frame by BYTE OFFSET (no
    decode of skipped frames — the keyframe-seek pattern), decode only the
    sampled ones, emit one row per sampled frame. Output is a flat_map
    shape (rows out > rows in) expressed inside map_batches."""

    def __init__(self, every_k: int = 4, use_external_codec: bool = False):
        self.every_k = every_k
        self.use_external = use_external_codec

    def __call__(self, t: pa.Table) -> pa.Table:
        vids, idxs, ws, hs, means = [], [], [], [], []
        for vid, data in zip(t.column("video_id").to_pylist(),
                             t.column("bytes").to_pylist()):
            if self.use_external:
                decode_external_video(data, "h264")  # raises
            offsets = media.video_frame_offsets(data)
            for fi in range(0, len(offsets), self.every_k):
                off, ln = offsets[fi]
                arr = media.decode_video_frame(data, off, ln)
                vids.append(vid)
                idxs.append(fi)
                hs.append(arr.shape[0])
                ws.append(arr.shape[1])
                means.append(round(float(arr.mean()), 4))
        return pa.table(
            {
                "video_id": pa.array(vids, pa.string()),
                "frame_idx": pa.array(idxs, pa.int64()),
                "w": pa.array(ws, pa.int32()),
                "h": pa.array(hs, pa.int32()),
                "mean_pixel": pa.array(means, pa.float64()),
            }
        )


VAD_FRAME_S = 0.02       # 20 ms analysis frames
VAD_RMS_THRESHOLD = 0.01  # frame active iff frame RMS exceeds this


class AudioVadWorker:
    """Energy-based voice-activity segmentation — the audio-side
    curation primitive (silence stripping / speech-span extraction for
    ASR-style training data): 20 ms frame RMS (one vectorized reshape
    per clip), threshold, contiguous active runs → one row per segment
    with timing and energy."""

    def __init__(self, use_external_codec: bool = False):
        self.decode = (
            decode_external_audio if use_external_codec
            else (lambda data, fmt=None: media.decode_audio(data))
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, segs, starts, ends, nfr, energy = [], [], [], [], [], []
        for aid, data in zip(t.column("audio_id").to_pylist(),
                             t.column("bytes").to_pylist()):
            x, sr = self.decode(data)
            flen = max(1, int(sr * VAD_FRAME_S))
            n_frames = len(x) // flen
            fr = x[:n_frames * flen].reshape(n_frames, flen)
            rms = np.sqrt((fr * fr).mean(axis=1))
            active = rms > VAD_RMS_THRESHOLD
            if not active.any():
                continue
            bounds = np.flatnonzero(np.diff(
                np.concatenate([[False], active, [False]]).astype(np.int8)))
            for si, (lo, hi) in enumerate(zip(bounds[::2], bounds[1::2])):
                ids.append(aid)
                segs.append(si)
                starts.append(round(lo * flen / sr, 4))
                ends.append(round(hi * flen / sr, 4))
                nfr.append(int(hi - lo))
                energy.append(round(float(rms[lo:hi].mean()), 6))
        return pa.table(
            {"audio_id": pa.array(ids, pa.string()),
             "seg_idx": pa.array(segs, pa.int64()),
             "start_s": pa.array(starts, pa.float64()),
             "end_s": pa.array(ends, pa.float64()),
             "n_frames": pa.array(nfr, pa.int64()),
             "mean_rms": pa.array(energy, pa.float64())})


def audio_vad_segments(audio_parquet: str, concurrency: int | None = None,
                       batch_size: int = 64):
    import ray

    return ray.data.read_parquet(
        audio_parquet, columns=["audio_id", "bytes"]
    ).map_batches(
        AudioVadWorker, batch_format="pyarrow", **remote_kwargs(),
        batch_size=batch_size,
        concurrency=concurrency if concurrency is not None
        else actor_pool_size(),
    ).sort(["audio_id", "seg_idx"])


SCENE_CUT_THRESHOLD = 16.0  # mean |Δpixel| between consecutive frames


class SceneCutWorker:
    """Frame-difference scene-cut detection — the video-side curation
    primitive (clip segmentation for video-training data): decode
    consecutive frames, mean absolute pixel difference, a cut wherever
    the diff exceeds SCENE_CUT_THRESHOLD (smooth pans drift a few
    gray-levels per frame; a scene change jumps ~uniform-random
    distance). One summary row per clip so no-cut clips stay visible."""

    def __init__(self, use_external_codec: bool = False):
        self.use_external = use_external_codec

    def __call__(self, t: pa.Table) -> pa.Table:
        vids, ncuts, first, maxd = [], [], [], []
        for vid, data in zip(t.column("video_id").to_pylist(),
                             t.column("bytes").to_pylist()):
            if self.use_external:
                decode_external_video(data, "h264")  # raises
            offsets = media.video_frame_offsets(data)
            prev = None
            cuts = []
            worst = 0.0
            for fi, (off, ln) in enumerate(offsets):
                arr = media.decode_video_frame(data, off, ln).astype(
                    np.int16)
                if prev is not None:
                    d = float(np.abs(arr - prev).mean())
                    worst = max(worst, d)
                    if d > SCENE_CUT_THRESHOLD:
                        cuts.append(fi)
                prev = arr
            vids.append(vid)
            ncuts.append(len(cuts))
            first.append(cuts[0] if cuts else -1)
            maxd.append(round(worst, 4))
        return pa.table(
            {"video_id": pa.array(vids, pa.string()),
             "n_cuts": pa.array(ncuts, pa.int64()),
             "first_cut_idx": pa.array(first, pa.int64()),
             "max_frame_diff": pa.array(maxd, pa.float64())})


def video_scene_cuts(video_parquet: str, concurrency: int | None = None,
                     batch_size: int = 16):
    import ray

    return ray.data.read_parquet(
        video_parquet, columns=["video_id", "bytes"]
    ).map_batches(
        SceneCutWorker, batch_format="pyarrow", **remote_kwargs(),
        batch_size=batch_size,
        concurrency=concurrency if concurrency is not None
        else actor_pool_size(),
    ).sort("video_id")


def video_frame_sample(video_parquet: str, every_k: int = 4,
                       concurrency: int | None = None, batch_size: int = 16):
    """Small batch_size on purpose: each row carries a whole clip of
    frames (batch × concurrency of wide binaries must fit worker heaps)."""
    import ray

    return ray.data.read_parquet(
        video_parquet, columns=["video_id", "bytes"]
    ).map_batches(
        FrameSampleWorker, batch_format="pyarrow", **remote_kwargs(),
        batch_size=batch_size, concurrency=concurrency if concurrency is not None else actor_pool_size(),
        fn_constructor_kwargs={"every_k": every_k},
    )
