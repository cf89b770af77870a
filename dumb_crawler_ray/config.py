"""Job configuration — same JSON shape as the reference.

Reference: config loaded from ``~/.apricoot/crawler/{jobId}/config.json``
with dot-path accessors and defaults (J/api/CrawlingSessionContext.java:
117-140, J/util/JsonUtil.java:15-51); period strings ``([0-9]+)([smhdw])``
parsed to milliseconds (J/util/Misc.java:41-69).

The rebuild keeps config-file compatibility (same keys, reference
README.md:13-47) and adds the north-rule ``politeness`` section
(BASELINE.json) which the reference lacks:

    politeness.delay_ms                 min delay between fetches per domain
    politeness.max_per_domain_per_round per-round per-domain selection cap
    politeness.respect_robots           honor robots.txt disallow rules
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

_PERIOD = re.compile(r"^([0-9]+)([smhdw])$")
_PERIOD_MS = {"s": 1_000, "m": 60_000, "h": 3_600_000, "d": 86_400_000, "w": 604_800_000}


def parse_period_ms(text: str) -> int | None:
    """``"10m"`` → 600000; None when unparseable (Misc.java:41-69)."""
    m = _PERIOD.match(text.strip())
    if not m:
        return None
    return int(m.group(1)) * _PERIOD_MS[m.group(2)]


def get_path(cfg: dict, dotted: str, default: Any = None) -> Any:
    cur: Any = cfg
    for part in dotted.split("."):
        if not isinstance(cur, dict) or part not in cur:
            return default
        cur = cur[part]
    return cur


@dataclass
class JobConfig:
    """Validated view over the free-form config JSON. Small and picklable —
    shipped to every actor via constructor args (broadcast once)."""

    raw: dict = field(default_factory=dict)

    # --- reference keys (defaults per CrawlingSessionContext.java:100-111) ---
    @property
    def seeds(self) -> list[str]:
        return list(self.raw.get("seeds", []))

    @property
    def id_extractor_pattern(self) -> str | None:
        return self.raw.get("idExtractorPattern")

    @property
    def thread_count(self) -> int:
        return int(self.raw.get("threadCount", 3))

    @property
    def max_attempt_count(self) -> int:
        return int(self.raw.get("maxAttemptCount", 5))

    @property
    def tagger(self) -> dict[str, str]:
        return dict(self.raw.get("tagger", {}))

    @property
    def whitelist(self) -> list[str]:
        return list(get_path(self.raw, "linkFilter.whitelist", []) or [])

    @property
    def blacklist(self) -> list[str]:
        return list(get_path(self.raw, "linkFilter.blacklist", []) or [])

    @property
    def allow_by_default(self) -> bool:
        return bool(get_path(self.raw, "linkFilter.allowByDefault", False))

    @property
    def priorities(self) -> dict[str, int]:
        return {k: int(v) for k, v in (self.raw.get("priorities") or {}).items()}

    @property
    def validation_selectors(self) -> dict[str, str]:
        return dict(self.raw.get("validationSelectors", {}))

    @property
    def included_tags(self) -> list[str]:
        return list(get_path(self.raw, "storage.includedTags", []) or [])

    @property
    def max_file_size_mb(self) -> int:
        """storage.maxFileSize (WarcStorageManager.java:30): output-file
        rotation budget, reused as the page-fragment size budget."""
        return int(get_path(self.raw, "storage.maxFileSize", 50))

    @property
    def proxify_tags(self) -> list[str]:
        """renderer.proxify (ContentRenderer.java:55-64): tags routed
        through the proxy renderer; 'all' proxies everything."""
        return list(get_path(self.raw, "renderer.proxify", []) or [])

    @property
    def task_killer_timeout_ms(self) -> int:
        text = str(get_path(self.raw, "taskKiller.timeout", "10m"))
        parsed = parse_period_ms(text)
        # faithful default fallback (TaskKiller.java:25: 60*60*10 — note the
        # reference value is *seconds-flavored*; we keep the intended 10m)
        return parsed if parsed is not None else 600_000

    # --- north-rule politeness extension (absent in reference) ---
    @property
    def politeness_delay_ms(self) -> int:
        return int(get_path(self.raw, "politeness.delay_ms", 0))

    @property
    def max_per_domain_per_round(self) -> int:
        return int(get_path(self.raw, "politeness.max_per_domain_per_round", 0) or 0)

    @property
    def respect_robots(self) -> bool:
        return bool(get_path(self.raw, "politeness.respect_robots", False))

    # --- fetch backend selection (rebuild extension) ---
    @property
    def fetcher_mode(self) -> str:
        """``fetcher.mode``: "synthetic" (sandbox web, default) or "http"
        (real network via sources/httpweb.py — the SimpleHttpRenderer
        integration seam)."""
        return str(get_path(self.raw, "fetcher.mode", "synthetic"))

    @property
    def fetcher_user_agent(self) -> str:
        """``fetcher.userAgent`` (reference default,
        SimpleHttpRenderer.java:33)."""
        return str(get_path(self.raw, "fetcher.userAgent", "Mozilla/5.0"))

    @property
    def fetcher_connect_timeout_s(self) -> float:
        """``fetcher.connectTimeoutMs`` — the reference's 10 s connect
        budget (SimpleHttpRenderer.java:34)."""
        return float(get_path(self.raw, "fetcher.connectTimeoutMs", 10_000)) / 1000.0

    @property
    def fetcher_read_timeout_s(self) -> float:
        """``fetcher.readTimeoutMs`` — the reference's 30 s read budget
        (SimpleHttpRenderer.java:35)."""
        return float(get_path(self.raw, "fetcher.readTimeoutMs", 30_000)) / 1000.0

    # --- rebuild scheduler knobs ---
    @property
    def scheduler_batch_size(self) -> int:
        """Frontier refill size per BSP round. Defaults to the reference's
        queue watermark 2×threadCount (J/DumbCrawler.java:266-275); raise it
        for throughput runs — ordering semantics are identical per-round."""
        return int(get_path(self.raw, "scheduler.batchSize", 2 * self.thread_count))

    def get(self, dotted: str, default: Any = None) -> Any:
        return get_path(self.raw, dotted, default)


def load_job_config(path: str | Path) -> JobConfig:
    with open(path, "r", encoding="utf-8") as fh:
        return JobConfig(json.load(fh))
