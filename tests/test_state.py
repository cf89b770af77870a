import numpy as np

from dumb_crawler_ray.pipelines import semantics as S
from dumb_crawler_ray.state.bloom import BloomFilter
from dumb_crawler_ray.state.cuckoo import CuckooFilter
from dumb_crawler_ray.state.frontier import FrontierShardState, shard_of_batch


def _hashes(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(-(2**62), 2**62, size=n, dtype=np.int64)


def test_bloom_no_false_negatives_and_low_fpp():
    b = BloomFilter(capacity=10_000, fpp=0.01)
    ins = _hashes(10_000, 1)
    b.add_many(ins)
    assert b.contains_many(ins).all()
    other = _hashes(10_000, 2)
    fresh = other[~np.isin(other, ins)]
    fpp = b.contains_many(fresh).mean()
    assert fpp < 0.03


def test_bloom_snapshot_roundtrip():
    b = BloomFilter(capacity=1000)
    ins = _hashes(500, 3)
    b.add_many(ins)
    b2 = BloomFilter.from_snapshot(b.snapshot())
    assert b2.contains_many(ins).all()
    assert b2.n_bits == b.n_bits and b2.k == b.k


def test_cuckoo_membership_and_snapshot():
    c = CuckooFilter(capacity=5000)
    ins = _hashes(4000, 4)
    c.add_many(ins)
    assert c.contains_many(ins).all()  # no false negatives (stash backstop)
    other = _hashes(4000, 5)
    fresh = other[~np.isin(other, ins)]
    assert c.contains_many(fresh).mean() < 0.02
    c2 = CuckooFilter.from_snapshot(c.snapshot())
    assert c2.contains_many(ins).all()


def _rows(items):
    from dumb_crawler_ray.functions.urlhash import hash64_batch

    return {
        "url": [u for u, *_ in items],
        "url_hash": [h for _, h, *_ in items],
        "domain": [d for _, _, d, *_ in items],
        "tags": [["t"]] * len(items),
        "priority": [p for *_, p in items],
        "hash64": hash64_batch([h for _, h, *_ in items]),
    }


def test_frontier_shard_insert_select_complete():
    st = FrontierShardState(0, respect_robots=False)
    d = st.insert_candidates(_rows([
        ("https://a/1", "h1", "a", 5),
        ("https://a/2", "h2", "a", 9),
        ("https://b/3", "h3", "b", 9),
        ("https://a/1", "h1", "a", 5),  # dup → dropped
    ]))
    assert d["discovered"] == 3
    # pinned order: priority DESC, attempt ASC, url_hash ASC
    sel = st.select_candidates(k=10, per_domain_cap=0, max_attempt=3)
    assert sel["url_hash"] == ["h2", "h3", "h1"]
    # per-domain cap: only one `a` in the first pass
    sel2 = st.select_candidates(k=10, per_domain_cap=1, max_attempt=3)
    assert sel2["url_hash"] == ["h2", "h3"]
    st.mark_selected(["h2"])
    sel3 = st.select_candidates(k=10, per_domain_cap=0, max_attempt=3)
    assert sel3["url_hash"] == ["h3", "h1"]  # h2 now PROCESSING
    st.complete({"url_hash": ["h2"], "status": [S.PROCESSED], "error": [None],
                 "tags": [["x"]], "attempt": [1]})
    assert st.seen_entries()["h2"] == (S.PROCESSED, 1, None, "x", 9)


def test_frontier_orphan_requeue_and_snapshot():
    st = FrontierShardState(0, respect_robots=False)
    st.insert_candidates(_rows([("https://a/1", "h1", "a", 5)]))
    st.mark_selected(["h1"])
    snap = st.snapshot_rows()
    st2 = FrontierShardState.from_snapshot_rows(0, False, snap)
    # PROCESSING orphan requeued on restore (URLStore.java:54-58 semantics)
    sel = st2.select_candidates(k=5, per_domain_cap=0, max_attempt=3)
    assert sel["url_hash"] == ["h1"]


def test_frontier_max_attempt_filter():
    st = FrontierShardState(0, respect_robots=False)
    st.insert_candidates(_rows([("https://a/1", "h1", "a", 5)]))
    st.mark_selected(["h1"])
    st.complete({"url_hash": ["h1"], "status": [S.QUEUED], "error": [None],
                 "tags": [["t"]], "attempt": [3]})
    # re-queued with attempt=3: selection must skip it at max_attempt=3
    st.requeue_orphans()  # no-op; push fresh heap entry for QUEUED row
    import heapq

    heapq.heappush(st.heap, (-5, 3, "h1"))
    sel = st.select_candidates(k=5, per_domain_cap=0, max_attempt=3)
    assert sel["url_hash"] == []


def test_compact_terminal_mode_equivalence():
    """compact_terminal (production scale): PROCESSED/FAILED rows demote
    to packed status+attempt. Dedup membership, status totals, counters
    and selection behavior stay identical to full mode; the full-row dict
    stops growing with crawl history."""
    items = [(f"https://a/{i}", f"h{i}", "a", 5) for i in range(6)]
    full = FrontierShardState(0, respect_robots=False)
    comp = FrontierShardState(0, respect_robots=False, compact_terminal=True)
    for st in (full, comp):
        st.insert_candidates(_rows(items))
        st.mark_selected(["h0", "h1", "h2"])
        st.complete({"url_hash": ["h0", "h1", "h2"],
                     "status": [S.PROCESSED, S.FAILED, S.PROCESSED],
                     "error": [None, "X", None],
                     "tags": [["t"], [], ["t"]],
                     "attempt": [1, 2, 1]})
    assert comp.status_counts() == full.status_counts()
    assert comp.counters == full.counters
    # terminal rows left the full-row dict but stay members for dedup
    assert set(comp.records) == {"h3", "h4", "h5"}
    assert comp.terminal == {"h0": (S.PROCESSED << 32) | 1,
                             "h1": (S.FAILED << 32) | 2,
                             "h2": (S.PROCESSED << 32) | 1}
    for st in (full, comp):
        d = st.insert_candidates(_rows([("https://a/0", "h0", "a", 5),
                                        ("https://a/9", "h9", "a", 5)]))
        assert d["discovered"] == 1  # h0 still recognized as seen
    assert sorted(comp.record_hash64().tolist()) == \
        sorted(full.record_hash64().tolist())
    # selection identical (terminal rows never re-selected in either mode)
    assert comp.select_candidates(10, 0, 3)["url_hash"] == \
        full.select_candidates(10, 0, 3)["url_hash"]
    # full-detail views are refused rather than silently partial
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        comp.seen_entries()
    with _pytest.raises(RuntimeError):
        comp.snapshot_rows()


def test_shard_routing_salting():
    domains = ["hot.test"] * 8 + ["cold.test"] * 8
    hashes = [f"h{i}" for i in range(16)]
    sids = shard_of_batch(domains, hashes, 4, frozenset(["hot.test"]))
    hot_ids = set(sids[:8])
    cold_ids = set(sids[8:])
    assert len(hot_ids) > 1      # hot domain salted across shards
    assert len(cold_ids) == 1    # cold domain sticks to one shard
