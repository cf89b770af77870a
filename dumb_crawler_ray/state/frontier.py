"""Sharded URL frontier — the distributed replacement for the reference's
single SQLite ``links`` table (J/services/URLStore.java, SURVEY.md ST1).

Partitioning: hash-by-domain so per-domain politeness state is shard-local;
HOT domains are salted across all shards by url-hash (SURVEY.md §7 hard
part e) and the driver re-applies the per-domain cap at merge time, which
keeps politeness exact for salted domains at the cost of a tiny per-round
merge (bounded by shards × batch).

Each shard holds, per SURVEY.md ST1/ST8:
  - the exact record map for its partition (url_hash → status ledger row)
  - a cuckoo filter fronting exact membership probes
  - per-domain politeness bookkeeping + robots rules cache
  - a lazy-deletion selection heap ordered by the pinned total order
    (priority DESC, attempt ASC, url_hash ASC — SURVEY.md K1)

Scale note: at 10^10 URLs the in-memory record dict becomes a Lance/parquet
key-range store per shard; the probe order (bloom → cuckoo → exact) is
designed so that store is only consulted on cuckoo positives. Actors are
soft state — `snapshot()`/`from_snapshot()` rebuild them from the
checkpoint, mirroring the reference's orphan-reset resume
(URLStore.java:54-58).
"""

from __future__ import annotations

import heapq
from collections import Counter

import numpy as np

from ..pipelines import semantics as S
from .cuckoo import CuckooFilter

# record tuple indexes
R_URL, R_DOMAIN, R_TAGS, R_PRIORITY, R_STATUS, R_ATTEMPT, R_ERROR, R_SEQ = range(8)


def shard_of(domain: str, url_hash: str, n_shards: int, hot_domains: frozenset) -> int:
    """Deterministic shard routing: by domain, salted by url_hash for hot
    domains. Uses a stable string hash (md5-derived via S-layer hash64)."""
    from ..functions.urlhash import hash64

    key = url_hash if domain in hot_domains else domain
    return hash64(key) % n_shards


def shard_of_batch(domains, url_hashes, n_shards: int, hot_domains: frozenset) -> np.ndarray:
    from ..functions.urlhash import hash64_batch

    keys = [h if d in hot_domains else d for d, h in zip(domains, url_hashes)]
    return (hash64_batch(keys) % n_shards).astype(np.int64)


class FrontierShardState:
    """Pure-Python shard state; wrapped by the Ray actor below. Testable
    without a Ray runtime."""

    def __init__(self, shard_id: int, respect_robots: bool, seen_capacity: int = 1 << 16):
        self.shard_id = shard_id
        self.respect_robots = respect_robots
        self.records: dict[str, list] = {}
        self.heap: list[tuple] = []  # (neg_priority, attempt, url_hash) lazy-deleted
        self.cuckoo = CuckooFilter(seen_capacity)
        self.counters: Counter = Counter()
        self.robots_cache: dict[str, list[str]] = {}
        self._seq = 0

    # ------------------------------------------------------------- insert

    def _robots(self, domain: str) -> list[str]:
        rules = self.robots_cache.get(domain)
        if rules is None:
            from ..sources.synthweb import robots_disallow

            rules = robots_disallow(domain)
            self.robots_cache[domain] = rules
        return rules

    def insert_candidates(self, rows: dict, maybe_seen=None) -> dict:
        """Insert-if-absent for a routed candidate batch.

        ``rows``: a pa.Table (url, url_hash, domain, tags, priority,
        hash64) — zero-copy from the driver's object-store put — or a
        columnar dict of lists with the same keys. ``maybe_seen``: bloom
        verdicts — False is authoritative "new", so the exact probe is
        skipped for those rows (the 10^10-scale fast path).
        Returns counter deltas {discovered, robots_denied, exact_probes}.
        """
        if not isinstance(rows, dict):
            t = rows
            rows = {
                "url": t.column("url").to_pylist(),
                "url_hash": t.column("url_hash").to_pylist(),
                "domain": t.column("domain").to_pylist(),
                "tags": t.column("tags").to_pylist(),
                "priority": t.column("priority").to_pylist(),
                "hash64": t.column("hash64").to_numpy(),
            }
        hashes = rows["url_hash"]
        n = len(hashes)
        if n == 0:
            return {"discovered": 0, "robots_denied": 0, "exact_probes": 0}
        h64 = np.asarray(rows["hash64"], dtype=np.int64)
        if maybe_seen is None:
            maybe_seen = np.ones(n, dtype=bool)
        # cuckoo pre-probe only for bloom-positive rows
        cuckoo_hit = np.zeros(n, dtype=bool)
        idx_maybe = np.flatnonzero(maybe_seen)
        if len(idx_maybe):
            cuckoo_hit[idx_maybe] = self.cuckoo.contains_many(h64[idx_maybe])
        discovered = 0
        robots_denied = 0
        exact_probes = 0
        new_h64 = []
        batch_seen: set[str] = set()  # ST2: within-call dedup (URLStore.java:154-157)
        for i in range(n):
            h = hashes[i]
            if h in batch_seen:
                continue
            batch_seen.add(h)
            if cuckoo_hit[i]:
                exact_probes += 1
                if h in self.records:  # true positive → already seen
                    continue
            rec = [
                rows["url"][i], rows["domain"][i], list(rows["tags"][i]),
                int(rows["priority"][i]), S.QUEUED, 0, None, self._seq,
            ]
            self._seq += 1
            if self.respect_robots and S.robots_denied(rec[R_URL], self._robots(rec[R_DOMAIN])):
                rec[R_STATUS] = S.FAILED
                rec[R_ERROR] = S.ROBOTS_ERROR
                robots_denied += 1
            else:
                heapq.heappush(self.heap, (-rec[R_PRIORITY], 0, h))
            self.records[h] = rec
            new_h64.append(int(h64[i]))
            discovered += 1
        if new_h64:
            self.cuckoo.add_many(np.asarray(new_h64, dtype=np.int64))
        self.counters["DISCOVERED_URLS"] += discovered
        self.counters["ROBOTS_DENIED_URLS"] += robots_denied
        return {
            "discovered": discovered,
            "robots_denied": robots_denied,
            "exact_probes": exact_probes,
        }

    # ------------------------------------------------------------ select

    def select_candidates(self, k: int, per_domain_cap: int, max_attempt: int) -> dict:
        """Peek this shard's top-k eligible rows in the pinned order,
        honoring the per-domain cap locally. Does NOT change status — the
        driver merges shards, re-applies the cap globally (for salted
        domains) and calls ``mark_selected`` with the final picks."""
        taken: list[tuple] = []
        per_domain: Counter = Counter()
        popped: list[tuple] = []
        while self.heap and len(taken) < k:
            entry = heapq.heappop(self.heap)
            neg_p, attempt, h = entry
            rec = self.records.get(h)
            if (
                rec is None
                or rec[R_STATUS] != S.QUEUED
                or rec[R_ATTEMPT] != attempt
                or -neg_p != rec[R_PRIORITY]
            ):
                continue  # stale lazy-deleted entry
            if rec[R_ATTEMPT] >= max_attempt:
                continue
            popped.append(entry)
            if per_domain_cap and per_domain[rec[R_DOMAIN]] >= per_domain_cap:
                continue
            per_domain[rec[R_DOMAIN]] += 1
            taken.append((h, rec))
        # push back everything valid we popped (still QUEUED until marked)
        for entry in popped:
            heapq.heappush(self.heap, entry)
        return {
            "url_hash": [h for h, _ in taken],
            "url": [r[R_URL] for _, r in taken],
            "domain": [r[R_DOMAIN] for _, r in taken],
            "priority": [r[R_PRIORITY] for _, r in taken],
            "attempt": [r[R_ATTEMPT] for _, r in taken],
        }

    def mark_selected(self, url_hashes: list[str]) -> None:
        for h in url_hashes:
            rec = self.records[h]
            rec[R_STATUS] = S.PROCESSING

    # ---------------------------------------------------------- complete

    def complete(self, rows: dict) -> None:
        """Apply fetch outcomes: url_hash, status, error, tags, attempt.
        Reference markProcessed (URLStore.java:171-183): recomputed tags are
        written back, attempt incremented. (MAX_ATTEMPT accounting happens
        in CrawlPipeline._harvest, not here.)"""
        for i, h in enumerate(rows["url_hash"]):
            rec = self.records[h]
            rec[R_STATUS] = int(rows["status"][i])
            rec[R_ERROR] = rows["error"][i]
            rec[R_TAGS] = list(rows["tags"][i])
            rec[R_ATTEMPT] = int(rows["attempt"][i])

    def requeue_orphans(self) -> int:
        """Resume semantics (URLStore.java:54-58): PROCESSING → QUEUED."""
        n = 0
        for h, rec in self.records.items():
            if rec[R_STATUS] == S.PROCESSING:
                rec[R_STATUS] = S.QUEUED
                heapq.heappush(self.heap, (-rec[R_PRIORITY], rec[R_ATTEMPT], h))
                n += 1
        return n

    # ------------------------------------------------------ observability

    def status_counts(self) -> dict:
        c = Counter(rec[R_STATUS] for rec in self.records.values())
        return {int(k): int(v) for k, v in c.items()}

    def seen_entries(self) -> dict:
        """url_hash → (status, attempt, error, tags_joined, priority) —
        the conformance seen-set view (matches OracleResult.seen_entry)."""
        return {
            h: (r[R_STATUS], r[R_ATTEMPT], r[R_ERROR], ",".join(r[R_TAGS]), r[R_PRIORITY])
            for h, r in self.records.items()
        }

    def snapshot_rows(self) -> dict:
        """Columnar full-state dump for checkpointing."""
        hs = list(self.records.keys())
        recs = [self.records[h] for h in hs]
        return {
            "url_hash": hs,
            "url": [r[R_URL] for r in recs],
            "domain": [r[R_DOMAIN] for r in recs],
            "tags": [list(r[R_TAGS]) for r in recs],
            "priority": [int(r[R_PRIORITY]) for r in recs],
            "status": [int(r[R_STATUS]) for r in recs],
            "attempt": [int(r[R_ATTEMPT]) for r in recs],
            "error": [r[R_ERROR] for r in recs],
            "seq": [int(r[R_SEQ]) for r in recs],
        }

    @classmethod
    def from_snapshot_rows(cls, shard_id: int, respect_robots: bool, rows: dict,
                           seen_capacity: int = 1 << 16) -> "FrontierShardState":
        st = cls(shard_id, respect_robots, seen_capacity)
        from ..functions.urlhash import hash64_batch

        n = len(rows["url_hash"])
        for i in range(n):
            h = rows["url_hash"][i]
            rec = [
                rows["url"][i], rows["domain"][i], list(rows["tags"][i]),
                int(rows["priority"][i]), int(rows["status"][i]),
                int(rows["attempt"][i]), rows["error"][i], int(rows["seq"][i]),
            ]
            st.records[h] = rec
            if rec[R_STATUS] == S.QUEUED:
                heapq.heappush(st.heap, (-rec[R_PRIORITY], rec[R_ATTEMPT], h))
            st._seq = max(st._seq, rec[R_SEQ] + 1)
        if n:
            st.cuckoo.add_many(hash64_batch(rows["url_hash"]))
        st.requeue_orphans()
        return st


def make_frontier_actor():
    """Ray actor wrapper (created lazily so the module imports without Ray)."""
    import ray

    @ray.remote
    class FrontierShard:
        def __init__(self, shard_id: int, respect_robots: bool, seen_capacity: int = 1 << 16):
            self.state = FrontierShardState(shard_id, respect_robots, seen_capacity)

        def insert_candidates(self, rows, maybe_seen=None):
            return self.state.insert_candidates(rows, maybe_seen)

        def select_candidates(self, k, per_domain_cap, max_attempt):
            return self.state.select_candidates(k, per_domain_cap, max_attempt)

        def mark_selected(self, url_hashes):
            return self.state.mark_selected(url_hashes)

        def complete(self, rows):
            return self.state.complete(rows)

        def requeue_orphans(self):
            return self.state.requeue_orphans()

        def status_counts(self):
            return self.state.status_counts()

        def seen_entries(self):
            return self.state.seen_entries()

        def snapshot_rows(self):
            return self.state.snapshot_rows()

        def restore(self, rows):
            self.state = FrontierShardState.from_snapshot_rows(
                self.state.shard_id, self.state.respect_robots, rows
            )

    return FrontierShard
