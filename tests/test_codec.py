import numpy as np
import pytest

from dumb_crawler_ray.functions import codec


def _arr(seed=0, w=32, h=48):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8).astype(np.uint8)


def test_lossless_roundtrip_exact():
    a = _arr()
    data = codec.encode(a, "png")
    b = codec.decode(data)
    assert np.array_equal(a, b)
    assert codec.psnr(a, b) == float("inf")
    assert not codec.is_lossy(data)


def test_lossy_psnr_above_40db():
    a = _arr(1)
    data = codec.encode(a, "jpeg")
    b = codec.decode(data)
    assert codec.is_lossy(data)
    assert codec.psnr(a, b) >= 40.0
    assert not np.array_equal(a, b)


def test_decode_rejects_corrupt():
    with pytest.raises(ValueError):
        codec.decode(b"nope")
    with pytest.raises(ValueError):
        codec.decode(b"XXXX" + b"\x00" * 16)


def test_decode_external_is_stubbed():
    with pytest.raises(NotImplementedError):
        codec.decode_external(b"", "png")


def test_phash_deterministic_and_locality():
    a = _arr(2, 64, 64)
    h1 = codec.phash64(a)
    assert h1 == codec.phash64(a.copy())
    # small perturbation → small hamming distance; inverted → large
    noisy = np.clip(a.astype(int) + 2, 0, 255).astype(np.uint8)
    assert codec.hamming64(h1, codec.phash64(noisy)) <= 8
    assert codec.hamming64(h1, codec.phash64(255 - a)) >= 40


def test_phash_int64_range():
    h = codec.phash64(_arr(3))
    assert -(2**63) <= h < 2**63
