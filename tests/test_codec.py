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


def test_fixed_gemm_batch_independence():
    """The contract the whole embedding-family oracle rests on: a row's
    fixed_gemm result is BIT-identical regardless of how many rows share
    the call, their order, or their position inside the padded chunk —
    and fixed_sims inherits it on the corpus axis for both dtypes the
    top-k ops use (float32 image_ann, float64 caption_to_image)."""
    import numpy as np

    from dumb_crawler_ray.ops.vecutil import GEMM_ROWS, fixed_gemm, fixed_sims

    rng = np.random.default_rng(3)
    n_in, dim, n = 3072, 512, 3 * GEMM_ROWS + 17
    w = (rng.standard_normal((n_in, dim)) / np.sqrt(n_in)).astype(np.float32)
    a = rng.standard_normal((n, n_in)).astype(np.float32)

    full = fixed_gemm(a, w)
    # any split point → identical rows
    for cut in (1, 3, GEMM_ROWS - 1, GEMM_ROWS, GEMM_ROWS + 5, n - 2):
        parts = np.vstack([fixed_gemm(a[:cut], w), fixed_gemm(a[cut:], w)])
        assert np.array_equal(parts.view(np.int32), full.view(np.int32))
    # any order → identical per-row values (position inside the chunk
    # must not matter)
    perm = rng.permutation(n)
    shuffled = fixed_gemm(a[perm], w)
    assert np.array_equal(shuffled.view(np.int32), full[perm].view(np.int32))

    for dtype in (np.float32, np.float64):
        qm = rng.standard_normal((16, dim)).astype(dtype)
        mat = full.astype(dtype)
        s_full = fixed_sims(qm, mat)
        s_parts = np.hstack([fixed_sims(qm, mat[:71]), fixed_sims(qm, mat[71:])])
        assert s_full.dtype == dtype
        assert np.array_equal(
            s_full.view(np.int32 if dtype == np.float32 else np.int64),
            s_parts.view(np.int32 if dtype == np.float32 else np.int64))


def test_embed_pixels_batch_independence():
    """ImageEmbedWorker.embed_pixels end-to-end: one batched call equals
    per-image calls bit-for-bit (the property the stored emb_digest /
    clip-score / top-k pacts certify under any Ray partitioning)."""
    import numpy as np

    from dumb_crawler_ray.ops.multimodal import ImageEmbedWorker

    rng = np.random.default_rng(5)
    arrs = [rng.integers(0, 256, size=(40 + i, 52 - i, 3)).astype(np.uint8)
            for i in range(7)]
    worker = ImageEmbedWorker()
    batched = worker.embed_pixels(arrs)
    singles = np.vstack([worker.embed_pixels([a]) for a in arrs])
    assert np.array_equal(batched.view(np.int32), singles.view(np.int32))
