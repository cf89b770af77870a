"""Fetch + parse + tag + validate — the actor-pool `map_batches` stage.

One FetchWorker instance per actor; construction loads the synthetic web
(the sandbox "network", SURVEY.md S3) and compiles every config-derived
operator ONCE (`__init__`), then `__call__` processes Arrow batches:

  input  rows: rank, url_hash, url, attempt, priority
  output rows: rank, url_hash, url, attempt, schedule_allowed, error,
               store_ok, tags (list), image_ids (list),
               n_links_allowed, n_links_ignored,
               cand_* (flattened per-page allowed candidate links)

Heavy payloads (page html, image bytes) are written to the checkpoint
directory *from inside the stage* as per-round parquet fragments — they
never flow back to the driver; only the small scheduling/lineage columns
do. That is the 100 TB-scale contract: the driver handles O(batch) control
rows per round, workers stream the data plane straight to storage
(resumable, partitioned by round).

Reference parity: the whole CrawlingTaskCallable chain (schedule-time
re-tag + re-filter J/DumbCrawler.java:276-279, render S3, blank check,
validate M7, extract M6) plus the north-rule image validation
(decoded-pixel PSNR/caption equality per stored row).
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import JobConfig
from ..pipelines import semantics as S
from ..sources.httpweb import FetchTransportError
from ..sources.synthweb import SynthWeb


PAGES_SCHEMA = pa.schema(
    [
        ("url_hash", pa.string()),
        ("url", pa.string()),
        ("tags", pa.list_(pa.string())),
        ("html", pa.large_string()),
        ("round", pa.int64()),
        ("rank", pa.int64()),
    ]
)

# debug-HTML sink for failed validations (S10): the reference writes raw
# HTML to debug/{errorCode}/{taskId}.html (CrawlingTaskCallable.java:73-84);
# here failed pages land as queryable per-round parquet fragments
FAILED_PAGES_SCHEMA = pa.schema(
    [
        ("url_hash", pa.string()),
        ("url", pa.string()),
        ("error_code", pa.string()),
        ("html", pa.large_string()),
        ("round", pa.int64()),
        ("rank", pa.int64()),
    ]
)

IMAGES_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.large_binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
        ("page_url_hash", pa.string()),
        ("round", pa.int64()),
        ("rank", pa.int64()),
        ("validation_error", pa.string()),
    ]
)


def _rowgroup_entries(paths: list[str]) -> list[tuple]:
    """(path, rg, lo, hi) per row group from parquet FOOTER metadata only
    — the image_id min/max column statistics. O(files) driver/actor work,
    no data pages touched."""
    out = []
    for p in paths:
        pf = pq.ParquetFile(p)
        md = pf.metadata
        names = [md.row_group(0).column(i).path_in_schema
                 for i in range(md.row_group(0).num_columns)] \
            if md.num_row_groups else []
        ci = names.index("image_id") if "image_id" in names else -1
        for rg in range(md.num_row_groups):
            lo = hi = None
            if ci >= 0:
                st = md.row_group(rg).column(ci).statistics
                if st is not None and st.has_min_max:
                    lo, hi = st.min, st.max
                    if isinstance(lo, bytes):
                        lo, hi = lo.decode(), hi.decode()
            out.append((p, rg, lo, hi))
    return out


def _image_store_paths(fixture_dir: str) -> list[str]:
    """images.parquet may be one file or a sharded directory."""
    root = os.path.join(fixture_dir, "images.parquet")
    if os.path.isdir(root):
        return sorted(os.path.join(root, n) for n in os.listdir(root)
                      if n.endswith(".parquet"))
    return [root] if os.path.exists(root) else []


# what the crawl actually consumes from the image store: validation
# (image_id/bytes/caption) + the stored-image fragment row (IMAGES_SCHEMA
# payload columns). The test fixture carries 14 additional stored-pact
# columns for the registry oracles — a store read that shipped those into
# every broadcast shard would pay object-store space and per-row as_py()
# conversion for columns the crawl never looks at.
IMAGE_STORE_COLUMNS = ["image_id", "bytes", "w", "h", "fmt", "caption",
                       "phash"]


def load_image_rowgroup(path: str, rg: int) -> pa.Table:
    """Shard loader for the distributed image store — runs as a Ray task
    (the DRIVER never reads image bytes; workers read their shard and the
    task's return ref IS the broadcast handle). Column-pruned: only the
    payload columns the crawl consumes leave storage."""
    f = pq.ParquetFile(path)
    cols = [c for c in IMAGE_STORE_COLUMNS if c in f.schema_arrow.names]
    return f.read_row_group(rg, columns=cols)


class FetchWorker:
    def __init__(self, fixture_dir: str, config_raw: dict, seed: int, scale: int,
                 ckpt_dir: str | None = None, fetch_delay_s: float = 0.0,
                 images_shards=None, proxy_api_key: str | None = None,
                 fetch_threads: int = 1, n_shards: int = 1,
                 hot_domains: frozenset = frozenset()):
        # n_shards/hot_domains: frontier routing — workers precompute each
        # candidate's hash64 + owning shard (vectorized, in parallel) so
        # the driver's serial insert path never rehashes or re-routes; the
        # dataset candidate path additionally pre-partitions by shard
        self.n_shards = max(1, int(n_shards))
        self.hot_domains = hot_domains
        self.cfg = JobConfig(config_raw)
        self.comp = S.CrawlComponents(self.cfg)
        if proxy_api_key is not None:
            self.comp.proxy_api_key = proxy_api_key
        self.seed = seed
        if self.cfg.fetcher_mode == "http":
            # real-network seam (SimpleHttpRenderer semantics); raises
            # FetchTransportError per fetch in a network-less sandbox
            from ..sources.httpweb import HttpWeb

            self.web = HttpWeb.from_config(self.cfg)
        else:
            pages = pq.read_table(os.path.join(fixture_dir, "pages.parquet"))
            self.web = SynthWeb(pages, seed, scale)
        # SHARDED image store (verdict r3 #3): the store is a list of
        # range-pruned shard descriptors — ('ref', ObjectRef) when the
        # pipeline pre-loaded row groups via Ray tasks (workers read, the
        # driver holds only refs), ('file', (path, rg)) in the local lazy
        # fallback — each with the image_id min/max from parquet FOOTER
        # stats. Per-actor setup is O(shards) metadata, NEVER an
        # O(corpus) id scan; an actor materializes + indexes only the
        # shards its pages actually reference (zero-copy plasma for the
        # ref kind), with an LRU on the index dicts.
        entries: list[tuple] = []
        if images_shards is not None:
            entries = [("ref", r, lo, hi) for (r, lo, hi) in images_shards]
        else:
            entries = [("file", (p, rg), lo, hi)
                       for (p, rg, lo, hi) in _rowgroup_entries(
                           _image_store_paths(fixture_dir))]
        with_stats = sorted((e for e in entries if e[2] is not None),
                            key=lambda e: e[2])
        self._img_shards = with_stats + [e for e in entries if e[2] is None]
        self._img_los = [e[2] for e in with_stats]
        self._img_his = [e[3] for e in with_stats]
        runmax: list[str] = []
        for h in self._img_his:
            runmax.append(h if not runmax or h > runmax[-1] else runmax[-1])
        self._img_hi_runmax = runmax
        self._n_stat_shards = len(with_stats)
        self._shard_cache: dict[int, dict] = {}  # j -> {"cols", "index"}
        # cap sized so a bench/scaling-scale store (hundreds of shards)
        # never thrashes: an actor whose pages reference the whole corpus
        # holds at most the same id->row index the old whole-table
        # broadcast built per actor anyway (tables stay zero-copy in
        # plasma; the cache holds only index dicts + column handles).
        # Tune down via DCR_IMG_SHARD_CACHE only when per-actor id-index
        # memory, not plasma, is the binding constraint.
        self._shard_cache_max = int(
            os.environ.get("DCR_IMG_SHARD_CACHE", "4096"))
        self.ckpt_dir = ckpt_dir
        self.fetch_delay_s = fetch_delay_s
        # politeness pacing (north rule): min wall-clock delay between
        # fetches of the same domain. Domains are shard-local and rank-
        # contiguous in a slice, so per-actor clocks pace the strict
        # per-round budget (the cap) without affecting crawl ORDER.
        self.politeness_delay_s = self.cfg.politeness_delay_ms / 1000.0
        self._domain_last_fetch: dict[str, float] = {}
        # in-actor fetch threads — the reference's `threadCount` semantics
        # (J/DumbCrawler.java task executor): RTT overlaps WITHIN a worker
        # while outcomes stay deterministic (results re-ordered by input
        # index; the per-domain politeness clock is lock-protected). 1 =
        # serial (conformance default).
        import threading

        self.fetch_threads = max(1, int(fetch_threads))
        self._pace_lock = threading.Lock()
        self._executor = None
        self.round = -1  # set via batch column

    def _cache_shard_table(self, j: int, tbl: pa.Table) -> dict:
        entry = {
            "cols": {c: tbl.column(c) for c in tbl.column_names},
            "index": {iid: i for i, iid in enumerate(
                tbl.column("image_id").to_pylist())},
        }
        if len(self._shard_cache) >= self._shard_cache_max:
            self._shard_cache.pop(next(iter(self._shard_cache)))
        self._shard_cache[j] = entry
        return entry

    def _load_shards(self, js: list[int]) -> None:
        """Materialize + index the listed shards (once per actor,
        LRU-capped). Ref shards resolve in ONE batched zero-copy
        `ray.get`; file shards read one row group each."""
        missing = [j for j in js if j not in self._shard_cache]
        if not missing:
            return
        ref_js = [j for j in missing if self._img_shards[j][0] == "ref"]
        if ref_js:
            import ray

            for j, tbl in zip(ref_js,
                              ray.get([self._img_shards[j][1]
                                       for j in ref_js])):
                self._cache_shard_table(j, tbl)
        for j in missing:
            if self._img_shards[j][0] != "ref":
                path, rg = self._img_shards[j][1]
                self._cache_shard_table(j, load_image_rowgroup(path, rg))

    def _candidate_shards(self, iid: str):
        """Interval stabbing over the sorted (lo, hi) shard ranges: with
        sorted disjoint row groups (how the fixtures — and any id-sorted
        store — are written) exactly ONE shard is probed; overlapping or
        stat-less shards degrade gracefully to extra probes."""
        import bisect

        j = bisect.bisect_right(self._img_los, iid) - 1
        while j >= 0 and self._img_hi_runmax[j] >= iid:
            if self._img_his[j] >= iid:
                yield j
            j -= 1
        for j in range(self._n_stat_shards, len(self._img_shards)):
            yield j

    def _image_rows_bulk(self, ids: list[str]) -> dict[str, dict]:
        """Load many image rows from the sharded store: group the needed
        ids per candidate shard, materialize each touched shard once."""
        by_shard: dict[int, list[str]] = {}
        for iid in set(ids):
            for j in self._candidate_shards(iid):
                by_shard.setdefault(j, []).append(iid)
        self._load_shards(list(by_shard))
        out: dict[str, dict] = {}
        for j, members in sorted(by_shard.items()):
            entry = self._shard_cache.get(j)
            if entry is None:  # evicted within this bulk (cap < working set)
                self._load_shards([j])
                entry = self._shard_cache[j]
            cols, index = entry["cols"], entry["index"]
            for iid in members:
                if iid in out:
                    continue
                i = index.get(iid)
                if i is not None:
                    out[iid] = {c: col[i].as_py() for c, col in cols.items()}
        return out

    def __call__(self, batch: pa.Table, return_cand_ref: bool = False):
        """Process one selection slice. Default: one Arrow table with the
        per-page candidate lists inline (driver-side candidate path).
        With ``return_cand_ref=True`` (the dataset candidate path for
        large rounds): candidates leave as FLAT (url, url_hash, domain,
        tags, priority, rank, link_idx) tables `ray.put` into the object
        store, PRE-PARTITIONED by owning frontier shard — they never
        cross the driver — and the return value is (control_table,
        {shard_id: ref}, n_candidates); non-http candidates are filtered
        here with per-page counts so the driver counts IGNORED_URLS
        without seeing them."""
        urls = batch.column("url").to_pylist()
        ranks = batch.column("rank").to_pylist()
        hashes = batch.column("url_hash").to_pylist()
        attempts = batch.column("attempt").to_pylist()
        rnd = int(batch.column("round")[0].as_py()) if len(batch) else 0
        n = len(urls)

        # schedule-time re-tag + re-filter (vectorized, one call per batch)
        tags_list, _prio, _h, sched_allowed, _na, _ni = self.comp.analyze_urls(urls)

        out = {
            "rank": ranks, "url_hash": hashes, "url": urls, "attempt": attempts,
            "domain": batch.column("domain").to_pylist(),
            "schedule_allowed": [bool(a) for a in sched_allowed],
            "error": [None] * n, "store_ok": [False] * n,
            "tags": [list(t) for t in tags_list],
            "image_ids": [[] for _ in range(n)],
            "n_links_allowed": [0] * n, "n_links_ignored": [0] * n,
            "too_many_links": [False] * n,
            "cand_url": [[] for _ in range(n)],
            "cand_hash": [[] for _ in range(n)],
            "cand_domain": [[] for _ in range(n)],
            "cand_tags": [[] for _ in range(n)],
            "cand_priority": [[] for _ in range(n)],
            "cand_h64": [[] for _ in range(n)],
            "cand_shard": [[] for _ in range(n)],
        }
        page_rows = []
        image_rows = []
        failed_rows = []

        # pass 1: fetch + outcome (optionally overlapped across
        # fetch_threads in-actor threads — RTT/network I/O releases the
        # GIL; results are consumed in input-index order so outcomes are
        # bit-identical at any thread count)
        crawl_delay_s = (
            [d / 1000.0 for d in batch.column("crawl_delay_ms").to_pylist()]
            if "crawl_delay_ms" in batch.column_names else [0.0] * n)
        # driver-scheduled domain-GLOBAL politeness stamps: when present,
        # they already encode max(config delay, robots Crawl-delay) across
        # the WHOLE round and pool (crawl.py _select), so actor-local
        # pacing is skipped — it would only double-wait
        not_before = (
            batch.column("not_before_ts").to_pylist()
            if "not_before_ts" in batch.column_names else None)

        def fetch_one(i: int):
            import time as _time

            url, tags = urls[i], tags_list[i]
            if not_before is not None:
                wait = not_before[i] - _time.time()
                if wait > 0:
                    _time.sleep(wait)
            else:
                # per-domain pacing, actor-local fallback (direct worker
                # use without a driver schedule): the stricter of the
                # config politeness delay and the robots Crawl-delay
                delay_s = max(self.politeness_delay_s, crawl_delay_s[i])
                if delay_s:
                    self._pace(self.comp.domain_of(url), delay_s)
            if self.fetch_delay_s:
                import time

                time.sleep(self.fetch_delay_s)  # simulated per-URL RTT
            try:
                resp = self.web.fetch(self.comp.fetch_url_for(url, tags))
            except FetchTransportError:
                # reference throws CrawlingException("HTML_RENDERING_ERROR")
                # from the renderer (SimpleHttpRenderer.java:24-26)
                return i, "HTML_RENDERING_ERROR", [], "", []
            error, links, html = self.comp.fetch_outcome(resp, url, tags)
            return i, error, links, html, list(resp.image_ids)

        todo = [i for i in range(n) if sched_allowed[i]]
        if self.fetch_threads > 1 and len(todo) > 1:
            if self._executor is None:
                from concurrent.futures import ThreadPoolExecutor

                self._executor = ThreadPoolExecutor(
                    max_workers=self.fetch_threads)
            fetched = list(self._executor.map(fetch_one, todo))
        else:
            fetched = [fetch_one(i) for i in todo]

        page_links: list[tuple[int, list[str]]] = []
        stored: list[tuple[int, list[str], str]] = []  # (i, image_ids, html)
        for i, error, links, html, image_ids in fetched:
            if error is not None:
                out["error"][i] = error
                if html:  # validation failures carry the body; persist it
                    failed_rows.append(
                        {"url_hash": hashes[i], "url": urls[i],
                         "error_code": error, "html": html,
                         "round": rnd, "rank": ranks[i]}
                    )
                continue
            if len(links) > 300:  # reference warns at >300 (K2), no truncation
                out["too_many_links"][i] = True
            page_links.append((i, links))
            if self.comp.should_store(tags_list[i]):
                out["store_ok"][i] = True
                out["image_ids"][i] = image_ids
                stored.append((i, image_ids, html))
        # pass 2: ONE vectorized link analysis for the whole batch
        flat_links = [l for _, links in page_links for l in links]
        if flat_links:
            ltags, lprio, lhash, lallow, _na, _ni = self.comp.analyze_urls(flat_links)
            pos = 0
            # batch-local first-occurrence dedup (pinned order): the driver
            # re-applies the same rule globally over chunks in rank order,
            # so dropping later duplicates HERE cannot change which
            # occurrence wins — it only shrinks the result transfer and
            # the frontier-shard insert volume (most links repeat within a
            # chunk). Link counters stay pre-dedup (reference counts every
            # allowed/ignored link, dedup happens at insert).
            batch_seen: set = set()
            kept_pages: list[tuple[int, int]] = []  # (page row, n kept)
            flat_hash: list[str] = []
            flat_dom: list[str] = []
            for i, links in page_links:
                m = len(links)
                sl = slice(pos, pos + m)
                pos += m
                allow = lallow[sl]
                out["n_links_allowed"][i] = int(allow.sum())
                out["n_links_ignored"][i] = int(m - allow.sum())
                keep = []
                for j in np.flatnonzero(allow) + sl.start:
                    h = lhash[j]
                    if h in batch_seen:
                        continue
                    batch_seen.add(h)
                    keep.append(j)
                out["cand_url"][i] = [flat_links[j] for j in keep]
                out["cand_hash"][i] = [lhash[j] for j in keep]
                out["cand_domain"][i] = [
                    self.comp.domain_of(flat_links[j]) for j in keep
                ]
                out["cand_tags"][i] = [ltags[j] for j in keep]
                out["cand_priority"][i] = [int(lprio[j]) for j in keep]
                kept_pages.append((i, len(keep)))
                flat_hash.extend(out["cand_hash"][i])
                flat_dom.extend(out["cand_domain"][i])
            # hash64 + owning-shard per kept candidate, computed HERE
            # (vectorized, in parallel across fetch workers) so the
            # driver's serial insert path never rehashes or re-routes
            if flat_hash:
                from ..functions.urlhash import hash64_batch
                from ..state.frontier import shard_of_batch

                h64 = hash64_batch(np.asarray(flat_hash, dtype=object))
                sids = shard_of_batch(flat_dom,
                                      np.asarray(flat_hash, dtype=object),
                                      self.n_shards, self.hot_domains)
                off = 0
                for i, nk in kept_pages:
                    out["cand_h64"][i] = h64[off:off + nk].tolist()
                    out["cand_shard"][i] = sids[off:off + nk].tolist()
                    off += nk
        # pass 3: grouped image loads + per-row payload validation
        all_image_ids = [iid for _, iids, _ in stored for iid in iids]
        img_rows = self._image_rows_bulk(all_image_ids) if all_image_ids else {}
        for i, iids, html in stored:
            page_rows.append(
                {"url_hash": hashes[i], "url": urls[i], "tags": list(tags_list[i]),
                 "html": html, "round": rnd, "rank": ranks[i]}
            )
            for iid in iids:
                row = img_rows.get(iid)
                if row is None:
                    continue
                verr = S.validate_image_row(row, self.seed)
                image_rows.append(
                    {**row, "page_url_hash": hashes[i],
                     "round": rnd, "rank": ranks[i], "validation_error": verr}
                )
        self._write_fragments(rnd, page_rows, image_rows, failed_rows)
        out["image_errors"] = [
            sum(1 for r in image_rows if r["rank"] == ranks[i] and r["validation_error"])
            for i in range(n)
        ]
        if not return_cand_ref:
            return _to_arrow(out)
        import ray

        # reuse pass 2's hash64 + shard routing (computed ONCE per kept
        # candidate — no second shard_of_batch here, no rehash shard-side)
        c = {"url": [], "url_hash": [], "domain": [], "tags": [],
             "priority": [], "rank": [], "link_idx": [], "hash64": [],
             "shard": []}
        n_nonhttp = [0] * n
        for i in range(n):
            for j, u in enumerate(out["cand_url"][i]):
                if not u.startswith("http"):
                    n_nonhttp[i] += 1
                    continue
                c["url"].append(u)
                c["url_hash"].append(out["cand_hash"][i][j])
                c["domain"].append(out["cand_domain"][i][j])
                c["tags"].append(out["cand_tags"][i][j])
                c["priority"].append(int(out["cand_priority"][i][j]))
                c["rank"].append(ranks[i])
                c["link_idx"].append(j)
                c["hash64"].append(int(out["cand_h64"][i][j]))
                c["shard"].append(int(out["cand_shard"][i][j]))
        n_cand = len(c["url"]) + sum(n_nonhttp)
        refs: dict[int, object] = {}
        if c["url"]:
            cand = pa.table(
                {"url": pa.array(c["url"], pa.string()),
                 "url_hash": pa.array(c["url_hash"], pa.string()),
                 "domain": pa.array(c["domain"], pa.string()),
                 "tags": pa.array(c["tags"], pa.list_(pa.string())),
                 "priority": pa.array(c["priority"], pa.int64()),
                 "rank": pa.array(c["rank"], pa.int64()),
                 "link_idx": pa.array(c["link_idx"], pa.int64()),
                 "hash64": pa.array(c["hash64"], pa.int64())})
            sids = np.asarray(c["shard"], dtype=np.int64)
            for sid in np.unique(sids):
                idx = np.flatnonzero(sids == sid)
                refs[int(sid)] = ray.put(cand.take(pa.array(idx)))
        return _to_arrow(out, include_cand=False,
                         n_cand_nonhttp=n_nonhttp), refs, n_cand

    def _pace(self, domain: str, delay_s: float | None = None) -> None:
        """Min wall-clock delay between fetches of one domain (config
        politeness or, when larger, the domain's robots Crawl-delay).
        Lock-protected claim-then-sleep so concurrent fetch threads
        serialize per domain without holding the lock while sleeping."""
        import time

        if delay_s is None:
            delay_s = self.politeness_delay_s
        while True:
            with self._pace_lock:
                now = time.monotonic()
                last = self._domain_last_fetch.get(domain)
                wait = 0.0 if last is None else (delay_s - (now - last))
                if wait <= 0:
                    self._domain_last_fetch[domain] = now
                    return
            time.sleep(wait)

    def _write_fragments(self, rnd: int, page_rows, image_rows,
                         failed_rows=()) -> None:
        if self.ckpt_dir is None:
            return
        part = uuid.uuid4().hex[:12]
        if failed_rows:
            d = os.path.join(self.ckpt_dir, "pages_failed", f"round={rnd}")
            os.makedirs(d, exist_ok=True)
            pq.write_table(
                pa.Table.from_pylist(list(failed_rows), schema=FAILED_PAGES_SCHEMA),
                os.path.join(d, f"part-{part}.parquet"),
            )
        if page_rows:
            d = os.path.join(self.ckpt_dir, "pages", f"round={rnd}")
            os.makedirs(d, exist_ok=True)
            # storage.maxFileSize (WarcStorageManager.java:97-100 rotation):
            # split a batch's pages into fragments under the size budget
            budget = self.cfg.max_file_size_mb * (1 << 20)
            chunk: list[dict] = []
            size = 0
            n_out = 0
            for row in page_rows:
                chunk.append(row)
                size += len(row["html"]) + 256
                if size >= budget:
                    pq.write_table(
                        pa.Table.from_pylist(chunk, schema=PAGES_SCHEMA),
                        os.path.join(d, f"part-{part}-{n_out:03d}.parquet"),
                    )
                    chunk, size = [], 0
                    n_out += 1
            if chunk:
                pq.write_table(
                    pa.Table.from_pylist(chunk, schema=PAGES_SCHEMA),
                    os.path.join(d, f"part-{part}-{n_out:03d}.parquet"),
                )
        if image_rows:
            d = os.path.join(self.ckpt_dir, "images", f"round={rnd}")
            os.makedirs(d, exist_ok=True)
            pq.write_table(
                pa.Table.from_pylist(image_rows, schema=IMAGES_SCHEMA),
                os.path.join(d, f"part-{part}.parquet"),
            )


def _to_arrow(out: dict, include_cand: bool = True,
              n_cand_nonhttp=None) -> pa.Table:
    cols = {
        "rank": pa.array(out["rank"], pa.int64()),
        "url_hash": pa.array(out["url_hash"], pa.string()),
        "url": pa.array(out["url"], pa.string()),
        "domain": pa.array(out["domain"], pa.string()),
        "attempt": pa.array(out["attempt"], pa.int64()),
        "schedule_allowed": pa.array(out["schedule_allowed"], pa.bool_()),
        "error": pa.array(out["error"], pa.string()),
        "store_ok": pa.array(out["store_ok"], pa.bool_()),
        "tags": pa.array(out["tags"], pa.list_(pa.string())),
        "image_ids": pa.array(out["image_ids"], pa.list_(pa.string())),
        "image_errors": pa.array(out["image_errors"], pa.int64()),
        "too_many_links": pa.array(out["too_many_links"], pa.bool_()),
        "n_links_allowed": pa.array(out["n_links_allowed"], pa.int64()),
        "n_links_ignored": pa.array(out["n_links_ignored"], pa.int64()),
    }
    if include_cand:
        cols.update({
            "cand_url": pa.array(out["cand_url"], pa.list_(pa.string())),
            "cand_hash": pa.array(out["cand_hash"], pa.list_(pa.string())),
            "cand_domain": pa.array(out["cand_domain"], pa.list_(pa.string())),
            "cand_tags": pa.array(out["cand_tags"], pa.list_(pa.list_(pa.string()))),
            "cand_priority": pa.array(out["cand_priority"], pa.list_(pa.int64())),
            "cand_h64": pa.array(out["cand_h64"], pa.list_(pa.int64())),
            "cand_shard": pa.array(out["cand_shard"], pa.list_(pa.int64())),
        })
    if n_cand_nonhttp is not None:
        cols["n_cand_nonhttp"] = pa.array(n_cand_nonhttp, pa.int64())
    return pa.table(cols)
