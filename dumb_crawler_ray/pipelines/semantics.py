"""Shared crawl semantics — ONE implementation used by both the oracle
simulator and the Ray Data pipeline, so the conformance gate compares two
schedulers, not two interpretations of the reference.

Pinned decisions for behaviors the reference leaves unspecified (SURVEY.md
§2, M2/K1/J3):

- tag evaluation order = config insertion order (reference: HashMap)
- frontier selection total order = (priority DESC, attempt ASC,
  url_hash ASC) (reference: SQLite plan beyond priority/attempt)
- duplicate-id merge within a batch = FIRST occurrence wins in
  (parent_rank, link_index) order (reference: HashSet/toMap encounter order)
- per-page link order = document order, first occurrence

Faithful reference quirks preserved (with citations):

- seeds carry an extra leading ``seed`` tag but their priority is computed
  from expression tags only (J/DumbCrawler.java:292-299)
- scheduled URLs are re-tagged and re-filtered (J/DumbCrawler.java:276-279);
  rows dropped by the schedule-time filter stay PROCESSING forever, and the
  filter counters are incremented AGAIN for them
- failures are terminal in-session; ``attempt`` is bumped on completion and
  only matters across resumes (J/services/URLStore.java:171-187)
- MAX_ATTEMPT_COUNT_REACHED increments on completion (either status) when
  attempt+1 >= maxAttemptCount (URLStore.java:173-179)

Intentional deviation (documented): the reference's ``addUrlsInternal``
computes the non-http filter but then inserts from the UNfiltered
collection (URLStore.java:127-143 builds ``toInsert`` from ``tasks``); the
rebuild implements the evident intent — non-http rows are dropped and
counted as IGNORED_URLS. Unobservable in practice because extraction and
the link filter already drop non-http URLs upstream.

North-rule extensions (BASELINE.json, absent in the reference): per-domain
per-round politeness cap, robots.txt deny (status FAILED / ROBOTS_DENIED at
insert), and per-stored-row image validation (decoded-pixel PSNR ≥ 40 dB
lossy / exact lossless + caption equality).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..config import JobConfig
from ..functions import codec
from ..functions.links import _clean_html, css_select_exists, extract_links
from ..functions.tagging import LinkFilter, LinkPrioritizer, UrlTagger
from ..functions.urlhash import UrlHasher
from ..functions.urlparts import split_one

# frontier statuses (reference: URLStore.java:17-22)
QUEUED, PROCESSING, PROCESSED, FAILED = 0, 1, 2, 3

SEED_TAG = "seed"
ROBOTS_ERROR = "ROBOTS_DENIED"


@dataclass
class CrawlComponents:
    """All config-derived operators, compiled once (driver or actor init)."""

    config: JobConfig
    hasher: UrlHasher = field(init=False)
    tagger: UrlTagger = field(init=False)
    link_filter: LinkFilter = field(init=False)
    prioritizer: LinkPrioritizer = field(init=False)

    def __post_init__(self):
        cfg = self.config
        self.hasher = UrlHasher(cfg.id_extractor_pattern)
        self.tagger = UrlTagger(cfg.tagger)
        self.link_filter = LinkFilter(cfg.whitelist, cfg.blacklist, cfg.allow_by_default)
        self.prioritizer = LinkPrioritizer(cfg.priorities)
        self.validators = dict(cfg.validation_selectors)
        self.included_tags = set(cfg.included_tags)
        self.proxify_tags = set(cfg.proxify_tags)

    # ---------------------------------------------------------- per batch

    def analyze_urls(self, urls: list[str]):
        """(tags, priority, url_hash, allowed, n_allowed, n_ignored, domain)
        for a batch of candidate URLs — the M1/M2/M4/M5 stage, vectorized."""
        m = self.tagger.tag_matrix(urls)
        tags = self.tagger.tags_from_matrix(m)
        prio = self.prioritizer.priorities_from_matrix(m, self.tagger.vocab)
        is_http = np.fromiter(
            (u.startswith("http://") or u.startswith("https://") for u in urls),
            dtype=bool, count=len(urls),
        )
        allowed, n_allowed, n_ignored = self.link_filter.allowed(
            m, self.tagger.vocab, is_http
        )
        hashes = self.hasher.hash_batch(urls)
        return tags, prio, hashes, allowed, n_allowed, n_ignored

    def domain_of(self, url: str) -> str:
        d = split_one(url)
        return d["host"] if d else ""

    # ------------------------------------------------------ fetch outcome

    def fetch_outcome(self, resp, url: str, tags: list[str]):
        """Interpret a FetchResponse exactly like CrawlingTaskCallable:
        status check → blank check → validate (per tag, in tag order) →
        extract links. Returns (error_code|None, links, html).
        Reference: J/services/CrawlingTaskCallable.java:42-63,
        J/services/renderer/SimpleHttpRenderer.java:38-42."""
        if resp.status_code != 200:
            return f"INVALID_STATUS_CODE_{resp.status_code}", [], ""
        # faithful quirk: SimpleHttpRenderer reads the body line-by-line and
        # concatenates WITHOUT newlines (SimpleHttpRenderer.java:44-50) —
        # validation, extraction and storage all see the stripped form
        html = "".join(resp.html.splitlines())
        if not html.strip():
            return "EMPTY_RESPONSE_BODY", [], ""
        # strip comments/script/style ONCE per page; validation selectors
        # and link extraction share the cleaned form (the stored html stays
        # the raw newline-stripped body)
        cleaned = _clean_html(html)
        for tag in tags:
            selector = self.validators.get(tag)
            if selector is not None and not css_select_exists(
                    cleaned, selector, pre_cleaned=True):
                return f"CONTENT_VALIDATION_ERROR_{tag}", [], html
        return None, extract_links(cleaned, url, pre_cleaned=True), html

    def should_store(self, tags: list[str]) -> bool:
        """Tag gate (AbstractStorageManager.java:29-41): any-tag-in-order."""
        return any(t in self.included_tags for t in tags)

    # -------------------------------------------------- renderer dispatch

    def needs_proxy(self, tags: list[str]) -> bool:
        """ContentRenderer.requiresProxy (ContentRenderer.java:41-52):
        proxify contains 'all' or any task tag."""
        p = self.proxify_tags
        return bool(p) and ("all" in p or any(t in p for t in tags))

    def proxy_url(self, url: str) -> str:
        """RocketscrapeRenderer.transformUrl (RocketscrapeRenderer.java:20-25):
        rewrite through the proxy API; key from $ROCKETSCRAPE_API_KEY,
        validated non-empty and ≥10 chars (:11-19). The inner URL is NOT
        url-encoded — faithful to the reference. Fetch actors run in their
        own processes and do not see driver env mutations, so the driver
        captures its env and ships it via ``proxy_api_key``."""
        import os

        key = getattr(self, "proxy_api_key", None) or os.environ.get(
            "ROCKETSCRAPE_API_KEY"
        )
        if not key or len(key) < 10:
            raise RuntimeError(
                "Please provide a valid ROCKETSCRAPE_API_KEY environment variable!"
            )
        return f"https://api.rocketscrape.com/?apiKey={key}&url={url}"

    def fetch_url_for(self, url: str, tags: list[str]) -> str:
        return self.proxy_url(url) if self.needs_proxy(tags) else url


def selection_sort_key(priority: int, attempt: int, url_hash: str):
    """Pinned frontier total order (SURVEY.md K1)."""
    return (-priority, attempt, url_hash)


def _robots_rule_match(path: str, pat: str) -> bool:
    """RFC 9309 §2.2.3 rule matching: ``*`` matches any char run, a
    trailing ``$`` anchors the end; otherwise prefix match."""
    anchored = pat.endswith("$")
    core = pat[:-1] if anchored else pat
    parts = core.split("*")
    if len(parts) == 1:  # no wildcard — the common (and synthetic-web) case
        return path == core if anchored else path.startswith(core)
    if not path.startswith(parts[0]):
        return False
    pos = len(parts[0])
    for seg in parts[1:-1]:
        if seg:
            i = path.find(seg, pos)
            if i < 0:
                return False
            pos = i + len(seg)
    last = parts[-1]
    if anchored:
        if not last:
            return True  # trailing '*$' matches any suffix
        return path.endswith(last) and len(path) - len(last) >= pos
    return True if not last else path.find(last, pos) >= 0


def robots_denied(url: str, rules: list[str]) -> bool:
    """Longest-matching rule wins; Allow (``!``-prefixed entries, see
    sources.robots) wins a length tie; no match → allowed. Plain
    disallow-prefix lists (synthetic-web robots) reduce to the old
    any-prefix semantics."""
    d = split_one(url)
    if d is None:
        return False
    # RFC 9309 matches against path + optional query ("/page?x=1")
    path = d["path"] + (f"?{d['query']}" if d["query"] else "")
    best_len = -1
    best_allow = False
    for r in rules:
        allow = r.startswith("!")
        pat = r[1:] if allow else r
        if pat and _robots_rule_match(path, pat):
            n = len(pat)
            if n > best_len or (n == best_len and allow and not best_allow):
                best_len, best_allow = n, allow
    return best_len >= 0 and not best_allow


def validate_image_row(row: dict, seed: int) -> str | None:
    """Per-row payload invariant (BASELINE.json input_hint): decoded pixels
    allclose to the source (PSNR ≥ 40 dB when lossy, exact when lossless)
    and caption byte-equality. Returns error string or None."""
    from ..sources.synthweb import source_caption, source_pixels

    idx = int(row["image_id"][3:])
    try:
        decoded = codec.decode(row["bytes"])
    except ValueError as ex:
        return f"DECODE_ERROR: {ex}"
    src = source_pixels(seed, idx)
    if codec.is_lossy(row["bytes"]):
        if codec.psnr(src, decoded) < 40.0:
            return "PSNR_BELOW_40DB"
    elif not np.array_equal(src, decoded):
        return "LOSSLESS_MISMATCH"
    if row["caption"] != source_caption(seed, idx):
        return "CAPTION_MISMATCH"
    return None
