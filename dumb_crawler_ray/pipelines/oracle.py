"""Pure-Python sequential oracle simulator (SURVEY.md §5.2).

Implements the reference crawl loop semantics exactly — priority frontier
with the pinned total order, BSP refill batches, insert-if-absent dedup,
tag-gated storage, terminal failures — on top of the SAME operator library
(`pipelines.semantics`) the Ray pipeline uses. The Ray Data pipeline must
produce an identical crawl order, seen set and counter map at any
parallelism level; the oracle is the ground truth because the Java
original's own order is thread-timing- and SQLite-plan-dependent
(SURVEY.md K1 note).
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass

from ..config import JobConfig
from ..sources.synthweb import SynthWeb, robots_disallow
from . import semantics as S


@dataclass
class Record:
    url_hash: str
    url: str
    domain: str
    tags: list[str]
    priority: int
    status: int = S.QUEUED
    attempt: int = 0
    error: str | None = None
    seq: int = 0


@dataclass
class OracleResult:
    crawl_order: list[str]
    seen_set: dict[str, tuple]
    counters: dict[str, int]
    stored_pages: list[str]      # url_hash in store order
    stored_images: list[str]     # image_id in store order
    rounds: int

    @staticmethod
    def seen_entry(r: Record) -> tuple:
        return (r.status, r.attempt, r.error, ",".join(r.tags), r.priority)


class OracleSimulator:
    def __init__(self, config: JobConfig, web: SynthWeb):
        self.cfg = config
        self.web = web
        self.comp = S.CrawlComponents(config)
        self.store: dict[str, Record] = {}
        self.counters: Counter = Counter()
        self.crawl_order: list[str] = []
        self.stored_pages: list[str] = []
        self.stored_images: list[str] = []
        self._stored_hashes: set[str] = set()
        self._stored_image_ids: set[str] = set()
        self._seq = 0
        self._robots_cache: dict[str, list[str]] = {}

    # ------------------------------------------------------------ helpers

    def _robots(self, domain: str) -> list[str]:
        if domain not in self._robots_cache:
            self._robots_cache[domain] = robots_disallow(domain)
        return self._robots_cache[domain]

    def add_tasks(self, tasks: list[dict]):
        """Insert-if-absent dedup path (URLStore.java:113-148). ``tasks``
        carry url/url_hash/tags/priority; first occurrence per hash wins."""
        http = [t for t in tasks if t["url"].startswith("http")]
        self.counters["IGNORED_URLS"] += len(tasks) - len(http)
        batch_first: dict[str, dict] = {}
        for t in http:
            batch_first.setdefault(t["url_hash"], t)
        new = 0
        for h, t in batch_first.items():
            if h in self.store:
                continue
            domain = self.comp.domain_of(t["url"])
            rec = Record(h, t["url"], domain, list(t["tags"]), int(t["priority"]),
                         seq=self._seq)
            self._seq += 1
            if self.cfg.respect_robots and S.robots_denied(t["url"], self._robots(domain)):
                rec.status = S.FAILED
                rec.error = S.ROBOTS_ERROR
                self.counters["ROBOTS_DENIED_URLS"] += 1
            self.store[h] = rec
            new += 1
        self.counters["DISCOVERED_URLS"] += new

    def inject_seeds(self):
        seeds = self.cfg.seeds
        tags_list, prio, hashes, _, _, _ = self.comp.analyze_urls(seeds)
        tasks = [
            {"url": u, "url_hash": h, "tags": [S.SEED_TAG] + t, "priority": int(p)}
            for u, h, t, p in zip(seeds, hashes, tags_list, prio)
        ]
        self.add_tasks(tasks)

    def select_round(self) -> list[Record]:
        """Pinned top-k selection with per-domain politeness cap."""
        k = self.cfg.scheduler_batch_size
        cap = self.cfg.max_per_domain_per_round
        eligible = [
            r for r in self.store.values()
            if r.status == S.QUEUED and r.attempt < self.cfg.max_attempt_count
        ]
        eligible.sort(key=lambda r: S.selection_sort_key(r.priority, r.attempt, r.url_hash))
        taken: list[Record] = []
        per_domain: Counter = Counter()
        for r in eligible:
            if len(taken) >= k:
                break
            if cap and per_domain[r.domain] >= cap:
                continue
            per_domain[r.domain] += 1
            taken.append(r)
        return taken

    # --------------------------------------------------------------- run

    def run(self, max_rounds: int | None = None) -> OracleResult:
        self.inject_seeds()
        rounds = 0
        while max_rounds is None or rounds < max_rounds:
            selected = self.select_round()
            if not selected:
                break
            rounds += 1
            # mark PROCESSING + schedule-time re-tag / re-filter
            fetchable: list[tuple[Record, list[str]]] = []
            urls = [r.url for r in selected]
            tags_list, _, _, allowed, n_a, n_i = self.comp.analyze_urls(urls)
            self.counters["ALLOWED_LINKS"] += n_a
            self.counters["IGNORED_LINKS"] += n_i
            for r, tags, ok in zip(selected, tags_list, allowed):
                r.status = S.PROCESSING
                if ok:
                    fetchable.append((r, tags))
                # else: stays PROCESSING forever (faithful quirk)
            # fetch + harvest in selection-rank order
            for r, tags in fetchable:
                self.crawl_order.append(r.url_hash)
                resp = self.web.fetch(self.comp.fetch_url_for(r.url, tags))
                error, links, _html = self.comp.fetch_outcome(resp, r.url, tags)
                if len(links) > 300:  # K2 warning counter, no truncation
                    self.counters["TOO_MANY_LINKS_PAGES"] += 1
                r.tags = tags  # markProcessed writes recomputed tags back
                r.attempt += 1
                if r.attempt >= self.cfg.max_attempt_count:
                    self.counters["MAX_ATTEMPT_COUNT_REACHED"] += 1
                if error is not None:
                    r.status = S.FAILED
                    r.error = error
                    self.counters[f"ERROR_{error}"] += 1
                    continue
                # saveLinks: tag → filter → insert (per page)
                ltags, lprio, lhashes, lallowed, n_a, n_i = self.comp.analyze_urls(links)
                self.counters["ALLOWED_LINKS"] += n_a
                self.counters["IGNORED_LINKS"] += n_i
                self.add_tasks([
                    {"url": u, "url_hash": h, "tags": t, "priority": int(p)}
                    for u, h, t, p, ok in zip(links, lhashes, ltags, lprio, lallowed)
                    if ok
                ])
                # storage (tag gate → page + image rows)
                if self.comp.should_store(tags):
                    self.counters["SAVED_PAGES"] += 1
                    if r.url_hash not in self._stored_hashes:
                        self._stored_hashes.add(r.url_hash)
                        self.counters["NEW_SAVED_PAGES"] += 1
                        self.stored_pages.append(r.url_hash)
                    else:
                        self.counters["UPDATED_PAGES"] += 1
                    for iid in resp.image_ids:
                        if iid in self._stored_image_ids:
                            self.counters["DUP_IMAGE_REFS"] += 1
                        else:
                            self._stored_image_ids.add(iid)
                            self.counters["SAVED_IMAGES"] += 1
                            self.stored_images.append(iid)
                else:
                    self.counters["UNSAVED_PAGES"] += 1
                self.counters["PROCESSED_URLS"] += 1
                r.status = S.PROCESSED
        seen = {h: OracleResult.seen_entry(r) for h, r in self.store.items()}
        return OracleResult(
            crawl_order=self.crawl_order,
            seen_set=seen,
            counters={k: int(v) for k, v in self.counters.items() if v},
            stored_pages=self.stored_pages,
            stored_images=self.stored_images,
            rounds=rounds,
        )


def simulate(config: JobConfig | dict, web: SynthWeb, max_rounds=None) -> OracleResult:
    if isinstance(config, dict):
        config = JobConfig(config)
    return OracleSimulator(config, web).run(max_rounds=max_rounds)
