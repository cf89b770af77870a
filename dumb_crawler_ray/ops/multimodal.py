"""Multimodal (image) operators — binary columns + typed metadata.

Images are opaque `binary` columns with (w, h, fmt) metadata, exactly the
BASELINE.json input-hint shape. The Ray-side plumbing (schemas, actor-pool
stages, batch sizing for large binaries, output layout) is real and tested;
ONLY the wire codec is the deterministic in-repo format — the real
PNG/JPEG decode integration point is `codec.decode_external`, which raises
NotImplementedError in this container (no image library installed).

Stages:
- `decode_stats`: actor-pool decode → per-image pixel statistics
- `resize`: block-mean downscale (numpy) → new binary column
- `phash_near_dup_pairs`: hamming-ball pairs over the phash column via
  band-bucket blocking (no all-pairs)
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pyarrow as pa

from ..rayutil import remote_kwargs

from ..functions import codec


class DecodeStatsWorker:
    """Per-actor state: nothing heavy here, but the shape mirrors a real
    decoder pool (codec context constructed once per actor)."""

    def __init__(self, use_external_codec: bool = False):
        self.decode = codec.decode_external if use_external_codec else (
            lambda data, fmt=None: codec.decode(data)
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, ws, hs, means, stds, lossy = [], [], [], [], [], []
        for iid, data in zip(t.column("image_id").to_pylist(),
                             t.column("bytes").to_pylist()):
            arr = self.decode(data)
            ids.append(iid)
            hs.append(arr.shape[0])
            ws.append(arr.shape[1])
            means.append(round(float(arr.mean()), 4))
            stds.append(round(float(arr.std()), 4))
            lossy.append(codec.is_lossy(data))
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "w": pa.array(ws, pa.int32()),
                "h": pa.array(hs, pa.int32()),
                "mean_pixel": pa.array(means, pa.float64()),
                "std_pixel": pa.array(stds, pa.float64()),
                "lossy": pa.array(lossy, pa.bool_()),
            }
        )


def decode_stats(images_parquet: str, concurrency: int = 2,
                 batch_size: int = 64):
    """Small `batch_size` on purpose: batches carry large binary payloads,
    so batch×concurrency must fit the worker heap (SURVEY.md §4)."""
    import ray

    return ray.data.read_parquet(
        images_parquet, columns=["image_id", "bytes"]
    ).map_batches(
        DecodeStatsWorker,
        batch_format="pyarrow",
        **remote_kwargs(),
        batch_size=batch_size,
        concurrency=concurrency,
    )


def block_mean_resize(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    h, w = arr.shape[:2]
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    out = np.empty((out_h, out_w, 3), dtype=np.uint8)
    for i in range(out_h):
        for j in range(out_w):
            out[i, j] = arr[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean(axis=(0, 1))
    return out


class ResizeWorker:
    def __init__(self, out_w: int = 16, out_h: int = 16):
        self.out_w, self.out_h = out_w, out_h

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, blobs = [], []
        for iid, data in zip(t.column("image_id").to_pylist(),
                             t.column("bytes").to_pylist()):
            arr = codec.decode(data)
            small = block_mean_resize(arr, self.out_w, self.out_h)
            ids.append(iid)
            blobs.append(codec.encode(small, "png"))
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "bytes": pa.array(blobs, pa.binary()),
                "w": pa.array([self.out_w] * len(ids), pa.int32()),
                "h": pa.array([self.out_h] * len(ids), pa.int32()),
            }
        )


def resize(images_parquet: str, out_w: int = 16, out_h: int = 16,
           concurrency: int = 2, batch_size: int = 64):
    import ray

    return ray.data.read_parquet(
        images_parquet, columns=["image_id", "bytes"]
    ).map_batches(
        ResizeWorker,
        batch_format="pyarrow",
        **remote_kwargs(),
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h},
    )


def phash_near_dup_pairs(images_parquet: str, max_hamming: int = 8):
    """Near-duplicate image pairs by perceptual hash: block on 16-bit bands
    of the phash (a pair within hamming ≤ 8 over 64 bits must agree exactly
    on at least one of 4 bands when ≤ 3 bands are hit — with 8 flipped bits
    spread across 4 bands, at least one band is often clean; multi-band
    blocking keeps this a grouping problem, not all-pairs)."""
    import pyarrow.parquet as pq

    t = pq.read_table(images_parquet, columns=["image_id", "phash"])
    ids = t.column("image_id").to_pylist()
    hashes = np.asarray(t.column("phash").to_pylist(), dtype=np.int64).view(np.uint64)
    buckets: dict[tuple, list[int]] = defaultdict(list)
    for i, h in enumerate(hashes):
        for band in range(4):
            key = (band, int((h >> np.uint64(band * 16)) & np.uint64(0xFFFF)))
            buckets[key].append(i)
    pairs = set()
    for members in buckets.values():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                i, j = members[x], members[y]
                d = int(bin(int(hashes[i] ^ hashes[j])).count("1"))
                if d <= max_hamming:
                    a, b = sorted((ids[i], ids[j]))
                    pairs.add((a, b, d))
    out = sorted(pairs)
    return pa.table(
        {
            "a": pa.array([p[0] for p in out], pa.string()),
            "b": pa.array([p[1] for p in out], pa.string()),
            "hamming": pa.array([p[2] for p in out], pa.int64()),
        }
    )
