"""HTML link extraction and minimal CSS-selector existence checks.

Reference semantics (J/services/CrawlingTaskCallable.java:86-106):

- candidate elements: ``a[href]`` union ``link[href]``
- elements whose ``rel`` attribute equals ``nofollow`` are skipped
- hrefs are absolutized against the page URL (Jsoup ``absUrl`` with
  ``setBaseUri(task.url)``, CrawlingTaskCallable.java:52-53)
- only ``http://`` / ``https://`` links are kept (``isValidLink``, :86-90)
- per-page set-dedup; the reference's HashSet order is unspecified, the
  rebuild PINS document order / first occurrence (SURVEY.md M6) so the crawl
  is deterministic.

No HTML parser library ships in this environment; extraction is a compiled
regex scan over the tag stream, which exactly covers the deterministic HTML
the synthetic web emits (FIXTURES.md §2) and ordinary well-formed pages.

``css_select_exists`` supports the selector shapes the reference configs use
for ``validationSelectors`` (J/services/ContentValidator.java:29-47):
``tag``, ``.class``, ``#id``, ``tag.class``, ``tag#id``.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

_LINK_TAG = re.compile(r"<(a|link)\b([^>]*)>", re.IGNORECASE | re.DOTALL)
_ATTR = re.compile(
    r"""([A-Za-z][A-Za-z0-9_-]*)\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""",
    re.DOTALL,
)


def _attrs(tag_body: str) -> dict[str, str]:
    out = {}
    for m in _ATTR.finditer(tag_body):
        val = m.group(3)
        if val is None:
            val = m.group(4)
        if val is None:
            val = m.group(5)
        out[m.group(1).lower()] = val
    return out


def extract_links(html: str, base_url: str) -> list[str]:
    """Absolute http(s) outlinks in document order, first occurrence only."""
    seen = set()
    out = []
    for m in _LINK_TAG.finditer(html):
        attrs = _attrs(m.group(2))
        href = attrs.get("href")
        if href is None:
            continue
        if attrs.get("rel") == "nofollow":
            continue
        absolute = urljoin(base_url, href.strip()).strip()
        if not (absolute.startswith("http://") or absolute.startswith("https://")):
            continue
        if absolute in seen:
            continue
        seen.add(absolute)
        out.append(absolute)
    return out


_TAG_CACHE: dict[str, re.Pattern] = {}


def _tag_regex(tag: str | None) -> re.Pattern:
    key = tag or "*"
    rx = _TAG_CACHE.get(key)
    if rx is None:
        name = re.escape(tag) if tag else r"[A-Za-z][A-Za-z0-9-]*"
        rx = re.compile(r"<(%s)\b([^>]*)>" % name, re.IGNORECASE | re.DOTALL)
        _TAG_CACHE[key] = rx
    return rx


def css_select_exists(html: str, selector: str) -> bool:
    selector = selector.strip()
    tag = cls = ident = None
    m = re.fullmatch(
        r"([A-Za-z][A-Za-z0-9-]*)?(?:\.([A-Za-z0-9_-]+)|#([A-Za-z0-9_-]+))?",
        selector,
    )
    if not m or (m.group(1) is None and m.group(2) is None and m.group(3) is None):
        raise ValueError(f"unsupported CSS selector {selector!r}")
    tag, cls, ident = m.group(1), m.group(2), m.group(3)
    for t in _tag_regex(tag).finditer(html):
        if cls is None and ident is None:
            return True
        attrs = _attrs(t.group(2))
        if cls is not None and cls in (attrs.get("class") or "").split():
            return True
        if ident is not None and attrs.get("id") == ident:
            return True
    return False
