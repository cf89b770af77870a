"""robots.txt fetch + parse for ``fetcher.mode = "http"``.

The reference crawler has no robots support at all; the north rule
mandates it, so the rebuild owns the whole path: each frontier shard
fetches `/robots.txt` once per domain through the SAME `HttpWeb`
transport the fetch stage uses (same UA/timeouts/config), parses the
Disallow prefixes for our user agent, and caches the rules next to the
domain's politeness state — the hash-by-domain partitioning already
co-locates everything per-domain, so no extra exchange exists.

Semantics (RFC 9309, pragmatically):
- records are grouped by consecutive ``User-agent`` lines; the group
  whose agent token is the LONGEST case-insensitive substring of our UA
  wins; ``*`` is the fallback group
- ``Disallow:`` values are path prefixes (matching
  ``semantics.robots_denied``); an empty value allows everything;
  ``Allow`` lines and wildcards inside paths are not interpreted (a
  disallow prefix containing ``*`` or ``$`` is ignored rather than
  mis-applied)
- HTTP 4xx (incl. 404) → no rules (allow all)
- HTTP 5xx → complete disallow (["/"]) — RFC 9309 §2.3.1.4
- transport failure (DNS/refused/timeout) → no rules (unreachable
  robots MAY be treated as allow; a crawl must not dead-lock on a
  broken robots endpoint)
"""

from __future__ import annotations

from .httpweb import FetchTransportError, HttpWeb

MAX_CRAWL_DELAY_S = 30.0  # honor Crawl-delay only up to this (crawler-
# standard cap; RFC 9309 doesn't define the field at all)


def parse_robots_full(text: str, user_agent: str) -> tuple[list[str], float]:
    """robots.txt body → (Disallow path prefixes, Crawl-delay seconds)
    for `user_agent` (delay 0.0 when the winning group sets none)."""
    ua = user_agent.lower()
    # (agents, disallows, delay_s) per record
    groups: list[tuple[list[str], list[str], float]] = []
    agents: list[str] = []
    disallows: list[str] = []
    delay = 0.0
    in_group_body = False

    def flush():
        nonlocal agents, disallows, delay, in_group_body
        if agents or disallows:
            groups.append((agents, disallows, delay))
        agents, disallows, delay = [], [], 0.0
        in_group_body = False

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_group_body:  # a new record starts
                flush()
            agents.append(value.lower())
        elif field == "disallow":
            in_group_body = True
            if value and "*" not in value and "$" not in value:
                disallows.append(value)
        elif field == "crawl-delay":
            in_group_body = True
            try:
                # capped: an unbounded delay from one hostile/misconfigured
                # robots.txt must never stall a fetch actor (and with it
                # the whole BSP round) for hours
                delay = min(max(0.0, float(value)), MAX_CRAWL_DELAY_S)
            except ValueError:
                pass
        elif field in ("allow", "sitemap"):
            in_group_body = True  # ends the user-agent run, not parsed
    flush()
    best: tuple[list[str], float] | None = None
    best_len = -1
    for g_agents, g_dis, g_delay in groups:
        for a in g_agents:
            if a == "*":
                if best_len < 0:
                    best = (g_dis, g_delay)
            elif a and a in ua and len(a) > best_len:
                best, best_len = (g_dis, g_delay), len(a)
    return (list(best[0]), best[1]) if best else ([], 0.0)


def parse_robots(text: str, user_agent: str) -> list[str]:
    """Disallow prefixes only (see `parse_robots_full`)."""
    return parse_robots_full(text, user_agent)[0]


class RobotsFetcher:
    """Per-domain robots rules over an ``HttpWeb`` transport (injectable
    — tests pass an opener-mocked HttpWeb). Stateless: the frontier
    shard owns the per-domain cache."""

    def __init__(self, web: HttpWeb):
        self.web = web

    def rules_for(self, domain: str, scheme: str = "http") -> list[str]:
        return self.fetch_rules(domain, scheme)[0]

    def fetch_rules(self, domain: str,
                    scheme: str = "http") -> tuple[list[str], float]:
        """(Disallow prefixes, Crawl-delay seconds) for `domain`."""
        try:
            resp = self.web.fetch(f"{scheme}://{domain}/robots.txt")
        except FetchTransportError:
            return [], 0.0  # unreachable → allow (never dead-lock on robots)
        if resp.status_code >= 500:
            return ["/"], 0.0  # server error → complete disallow (RFC 9309)
        if resp.status_code != 200:
            return [], 0.0  # 4xx → allow all
        return parse_robots_full(resp.html, self.web.user_agent)
