"""Deduplication family over the `documents` / `embeddings` tables —
the large-scale training-data cleaners.

- exact:        md5-fingerprint hash-partition → per-group keep-min-id
- MinHash+LSH:  word-shingles → 64 minhash perms → 16 bands × 4 rows →
                band-bucket groupby → candidate pairs → EXACT shingle-
                Jaccard verify (so LSH fpp never produces a wrong pair)
- SimHash:      64-bit token-hash majority signature per doc
- n-gram Jaccard: the exact verifier, also exposed standalone
- embedding cosine: random-hyperplane LSH buckets → in-bucket exact cosine

Scale shape: every stage is a `map_batches` or a single `groupby` on a
precomputed key; pairwise work only ever happens INSIDE a bucket/group
(never all-pairs). Signatures use stable md5-derived hashing (never
Python's salted `hash`) so results are identical across processes and
cluster sizes.
"""

from __future__ import annotations

import hashlib
import struct
from collections import defaultdict

import numpy as np
import pyarrow as pa

from ..rayutil import remote_kwargs

from .text import TOKEN_REGEX, normalize_expr

N_PERM = 64
N_BANDS = 16
ROWS_PER_BAND = N_PERM // N_BANDS
_MERSENNE = (1 << 61) - 1


def _stable64(s: str) -> int:
    return struct.unpack(">Q", hashlib.md5(s.encode("utf-8")).digest()[:8])[0]


def _docs(sf_dir: str, columns):
    import ray

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# ------------------------------------------------------------------ exact

def dedup_exact(sf_dir: str):
    """Groups by normalized-text md5; keeps the smallest doc_id per group.
    SQL-checkable. The crawl engine's A5 'insert-if-absent' in batch form."""
    import ray

    def fp(t: pa.Table) -> pa.Table:
        norm = normalize_expr(t.column("text")).to_pylist()
        fps = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in norm]
        return pa.table(
            {"fingerprint": pa.array(fps, pa.string()), "doc_id": t.column("doc_id")}
        )

    def keep_first(g: pa.Table) -> pa.Table:
        ids = g.column("doc_id").to_numpy()
        return pa.table(
            {
                "fingerprint": g.column("fingerprint").slice(0, 1),
                "keep_id": pa.array([int(ids.min())], pa.int64()),
                "n_dups": pa.array([len(ids)], pa.int64()),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(fp, batch_format="pyarrow", **remote_kwargs())
        .groupby("fingerprint")
        .map_groups(keep_first, batch_format="pyarrow", **remote_kwargs())
        .sort("keep_id")
    )


# ---------------------------------------------------------------- minhash

def _shingles(text: str, k: int = 3) -> set[str]:
    import re

    toks = [w.lower() for w in re.findall(TOKEN_REGEX, text)]
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


class _MinHasher:
    """64 universal-hash permutations h_i(x) = (a_i·x + b_i) mod p."""

    def __init__(self, seed: int = 1234):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=N_PERM, dtype=np.int64).astype(object)
        self.b = rng.integers(0, _MERSENNE, size=N_PERM, dtype=np.int64).astype(object)

    def signature(self, shingle_set: set[str]) -> np.ndarray:
        if not shingle_set:
            return np.full(N_PERM, _MERSENNE, dtype=np.int64)
        xs = np.array([_stable64(s) % _MERSENNE for s in shingle_set], dtype=object)
        # (n_perm, n_shingles) via object ints to avoid overflow, then min
        sig = np.empty(N_PERM, dtype=np.int64)
        for i in range(N_PERM):
            sig[i] = int(((self.a[i] * xs + self.b[i]) % _MERSENNE).min())
        return sig


class MinHashWorker:
    """Actor-pool stage: permutations built once per actor."""

    def __init__(self, seed: int = 1234):
        self.hasher = _MinHasher(seed)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, sigs, bands = [], [], []
        for doc_id, text in zip(t.column("doc_id").to_pylist(),
                                t.column("text").to_pylist()):
            sig = self.hasher.signature(_shingles(text))
            ids.append(doc_id)
            sigs.append([int(x) for x in sig])
            bands.append(
                [
                    f"{b}:" + hashlib.md5(
                        sig[b * ROWS_PER_BAND:(b + 1) * ROWS_PER_BAND].tobytes()
                    ).hexdigest()[:16]
                    for b in range(N_BANDS)
                ]
            )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "signature": pa.array(sigs, pa.list_(pa.int64())),
                "bands": pa.array(bands, pa.list_(pa.string())),
            }
        )


def minhash_signatures(sf_dir: str, concurrency: int = 2):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        MinHashWorker, batch_format="pyarrow", concurrency=concurrency,
        **remote_kwargs(),
    )


def minhash_near_dup_pairs(sf_dir: str, threshold: float = 0.5,
                           concurrency: int = 2):
    """LSH candidate generation (band-bucket groupby) + exact shingle-
    Jaccard verification. Returns (a, b, jaccard) pairs with a < b,
    sorted — deterministic. Rows-only oracle (not SQL-expressible)."""
    import ray

    sigs = minhash_signatures(sf_dir, concurrency)

    # explode (band_key, doc_id) then groupby band_key → candidate pairs
    def explode(t: pa.Table) -> pa.Table:
        keys, ids = [], []
        for doc_id, bands in zip(t.column("doc_id").to_pylist(),
                                 t.column("bands").to_pylist()):
            for bk in bands:
                keys.append(bk)
                ids.append(doc_id)
        return pa.table(
            {"band_key": pa.array(keys, pa.string()),
             "doc_id": pa.array(ids, pa.int64())}
        )

    def pairs_in_bucket(g: pa.Table) -> pa.Table:
        ids = sorted(set(g.column("doc_id").to_pylist()))
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pa.table(
            {"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())}
        )

    cand = (
        sigs.map_batches(explode, batch_format="pyarrow", **remote_kwargs())
        .groupby("band_key")
        .map_groups(pairs_in_bucket, batch_format="pyarrow", **remote_kwargs())
    )
    cand_tbl = pa.concat_tables(
        tb for tb in cand.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    pair_set = sorted(
        set(zip(cand_tbl.column("a").to_pylist(), cand_tbl.column("b").to_pylist()))
    )
    if not pair_set:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})

    # exact verification — distribute pairs, broadcast the (small) text map
    docs_tbl = pa.concat_tables(
        tb for tb in _docs(sf_dir, ["doc_id", "text"]).iter_batches(
            batch_format="pyarrow", batch_size=None)
    )
    text_map = dict(zip(docs_tbl.column("doc_id").to_pylist(),
                        docs_tbl.column("text").to_pylist()))
    text_ref = ray.put(text_map)

    def verify(t: pa.Table) -> pa.Table:
        tm = ray.get(text_ref)
        keep_a, keep_b, jac = [], [], []
        cache: dict[int, set] = {}
        for a, b in zip(t.column("a").to_pylist(), t.column("b").to_pylist()):
            sa = cache.setdefault(a, _shingles(tm[a]))
            sb = cache.setdefault(b, _shingles(tm[b]))
            union = len(sa | sb)
            j = (len(sa & sb) / union) if union else 0.0
            if j >= threshold:
                keep_a.append(a)
                keep_b.append(b)
                jac.append(round(j, 4))
        return pa.table(
            {"a": pa.array(keep_a, pa.int64()), "b": pa.array(keep_b, pa.int64()),
             "jaccard": pa.array(jac, pa.float64())}
        )

    pair_tbl = pa.table(
        {"a": pa.array([p[0] for p in pair_set], pa.int64()),
         "b": pa.array([p[1] for p in pair_set], pa.int64())}
    )
    verified = ray.data.from_arrow(pair_tbl).map_batches(
        verify, batch_format="pyarrow", **remote_kwargs()
    )
    out = pa.concat_tables(
        tb for tb in verified.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    return out.sort_by([("a", "ascending"), ("b", "ascending")])


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa, sb = _shingles(text_a, k), _shingles(text_b, k)
    union = len(sa | sb)
    return (len(sa & sb) / union) if union else 0.0


# ---------------------------------------------------------------- simhash

def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (stable md5 token hashes)."""
    import re

    acc = np.zeros(64, dtype=np.int64)
    for tok in re.findall(TOKEN_REGEX, text.lower()):
        h = _stable64(tok)
        bits = (h >> np.arange(64, dtype=np.uint64)) & 1
        acc += np.where(bits.astype(bool), 1, -1)
    val = 0
    for i in range(63, -1, -1):
        val = (val << 1) | (1 if acc[i] > 0 else 0)
    return val - (1 << 64) if val >= (1 << 63) else val


def simhash_signatures(sf_dir: str):
    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "simhash": pa.array(
                    [simhash64(s) for s in t.column("text").to_pylist()], pa.int64()
                ),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow", **remote_kwargs())


# ------------------------------------------------------ embedding near-dup

def embedding_near_dup_pairs(sf_dir: str, threshold: float = 0.95,
                             n_planes: int = 12, seed: int = 99):
    """Random-hyperplane LSH buckets → in-bucket exact cosine. Pairs with
    cosine ≥ threshold, plus multi-probe via 1-bit flips so near-boundary
    pairs aren't lost. Deterministic; rows-only oracle."""
    import ray

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    tbl = pa.concat_tables(
        tb for tb in emb.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    ids = np.asarray(tbl.column("vec_id").to_pylist())
    mat = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    mat = mat / np.maximum(norms, 1e-12)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((mat.shape[1], n_planes))
    codes = (mat @ planes > 0).astype(np.uint64)
    keys = np.zeros(len(ids), dtype=np.uint64)
    for j in range(n_planes):
        keys = (keys << np.uint64(1)) | codes[:, j]
    buckets: dict[int, list[int]] = defaultdict(list)
    for i, k in enumerate(keys):
        buckets[int(k)].append(i)
        for f in range(n_planes):  # multi-probe: 1-bit neighborhoods
            buckets[int(k) ^ (1 << f)].append(i)
    pairs = set()
    for members in buckets.values():
        if len(members) < 2:
            continue
        arr = np.asarray(sorted(set(members)))
        sub = mat[arr] @ mat[arr].T
        ii, jj = np.where(np.triu(sub, 1) >= threshold)
        for x, y in zip(arr[ii], arr[jj]):
            a, b = int(ids[x]), int(ids[y])
            pairs.add((min(a, b), max(a, b), round(float(mat[x] @ mat[y]), 4)))
    out = sorted(pairs)
    return pa.table(
        {
            "a": pa.array([p[0] for p in out], pa.int64()),
            "b": pa.array([p[1] for p in out], pa.int64()),
            "cosine": pa.array([p[2] for p in out], pa.float64()),
        }
    )
