"""Deterministic image codec, PSNR, and perceptual hash.

No image library (PIL / cv2) ships in this container, so the engine uses its
own deterministic codec for the ``bytes`` column of the image+caption table
(BASELINE.json ``input_hint``). The *plumbing* — binary columns, decode
stage signatures, PSNR/caption validation per stored row — is real and
tested; only the wire format is synthetic:

    header  = magic(4) | w:uint32 | h:uint32        (little-endian)
    payload = zlib(deflate) of the raw uint8 RGB array
    magic   = b"DCP0" lossless ("png")  |  b"DCL1" lossy ("jpeg")

The lossy path quantizes each channel to step 4 before compression — its
PSNR vs the source is ≈ 47 dB, comfortably above the ≥ 40 dB per-row
invariant the validation stage enforces (SURVEY.md M7 / §5.3). A real-codec
integration point is `decode_external`, stubbed with NotImplementedError.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC_LOSSLESS = b"DCP0"
MAGIC_LOSSY = b"DCL1"
_HEADER = struct.Struct("<4sII")
LOSSY_STEP = 4


def encode(arr: np.ndarray, fmt: str) -> bytes:
    """Encode an (h, w, 3) uint8 array. fmt: 'png' lossless, 'jpeg' lossy."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8 array")
    h, w = arr.shape[:2]
    if fmt == "png":
        magic, payload = MAGIC_LOSSLESS, arr
    elif fmt == "jpeg":
        magic = MAGIC_LOSSY
        payload = ((arr // LOSSY_STEP) * LOSSY_STEP + LOSSY_STEP // 2).astype(np.uint8)
    else:
        raise ValueError(f"unknown fmt {fmt!r}")
    return _HEADER.pack(magic, w, h) + zlib.compress(payload.tobytes(), level=6)


def decode(data: bytes) -> np.ndarray:
    """Decode to (h, w, 3) uint8. Raises ValueError on a corrupt payload."""
    if len(data) < _HEADER.size:
        raise ValueError("truncated image payload")
    magic, w, h = _HEADER.unpack_from(data)
    if magic not in (MAGIC_LOSSLESS, MAGIC_LOSSY):
        raise ValueError(f"bad image magic {magic!r}")
    raw = zlib.decompress(data[_HEADER.size:])
    if len(raw) != w * h * 3:
        raise ValueError("image payload size mismatch")
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def is_lossy(data: bytes) -> bool:
    return data[:4] == MAGIC_LOSSY


def decode_external(data: bytes, fmt: str) -> np.ndarray:
    """Integration point for real PNG/JPEG decoding (PIL / turbojpeg).

    Deliberately stubbed: the container ships no image library. Swap this in
    for `decode` in FetchWorker/multimodal stages when one is available.
    """
    raise NotImplementedError("no image codec library available in this environment")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical arrays."""
    if a.shape != b.shape:
        return float("-inf")
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def phash64(arr: np.ndarray) -> int:
    """64-bit average-hash of the decoded pixels (8×8 block-mean grayscale).

    Computed, not random (FIXTURES.md §1), so near-duplicate tests over the
    ``phash`` column are meaningful. Returns a signed int64.
    """
    gray = arr.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    ys = (np.arange(8 + 1) * h) // 8
    xs = (np.arange(8 + 1) * w) // 8
    cells = np.empty((8, 8), dtype=np.float64)
    for i in range(8):
        for j in range(8):
            cells[i, j] = gray[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean()
    bits = (cells > cells.mean()).flatten()
    value = 0
    for bit in bits:
        value = (value << 1) | int(bit)
    return np.int64(np.uint64(value)).item()


def hamming64(a: int, b: int) -> int:
    return int(bin((int(a) ^ int(b)) & 0xFFFFFFFFFFFFFFFF).count("1"))
