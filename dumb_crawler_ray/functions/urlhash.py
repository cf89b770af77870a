"""URL canonical identity — the dedup key of the whole engine.

Reference semantics (J/api/URLHasher.java:31-42): if ``idExtractorPattern``
is configured and FULL-matches the URL, the canonical id is the value of the
named group ``id`` (so two different URLs carrying the same extracted id are
ONE crawl unit); otherwise the id is ``md5hex(url)``. The pattern must
contain ``?<id>`` (URLHasher.java:19-29).

Additionally (north-rule extension, BASELINE.json) we derive ``hash64`` — a
signed 64-bit hash of the canonical id — used by the bloom / cuckoo
membership filters. It is pandas' siphash64 (``pd.util.hash_array`` with the
fixed default key), stable across processes and machines (unlike Python's
salted ``hash``). Persisted bloom/cuckoo snapshot compatibility therefore
depends on pandas keeping ``hash_array`` stable across versions.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

from .expr import java_regex_to_python


class UrlHasher:
    def __init__(self, id_extractor_pattern: str | None = None):
        if id_extractor_pattern is not None and "?<id>" not in id_extractor_pattern:
            raise ValueError("Invalid idExtractorPattern, should contain '?<id>'")
        self.pattern = (
            re.compile(java_regex_to_python(id_extractor_pattern))
            if id_extractor_pattern
            else None
        )

    def hash_url(self, url: str) -> str:
        if self.pattern is not None:
            m = self.pattern.fullmatch(url)
            if m is not None:
                return m.group("id")
        return hashlib.md5(url.encode("utf-8")).hexdigest()

    def hash_batch(self, urls) -> list[str]:
        """Per-batch canonical ids. md5 is inherently per-item; the regex
        path is a compiled C-level fullmatch — this is the vectorized form
        for string identity work (no Arrow kernel computes md5)."""
        pat = self.pattern
        if pat is None:
            return [hashlib.md5(u.encode("utf-8")).hexdigest() for u in urls]
        out = []
        for u in urls:
            m = pat.fullmatch(u)
            out.append(
                m.group("id") if m is not None
                else hashlib.md5(u.encode("utf-8")).hexdigest()
            )
        return out


def hash64(canonical_id: str) -> int:
    """Stable signed 64-bit hash of a canonical id (for bloom/cuckoo).
    Must agree with ``hash64_batch`` — both are pandas siphash64 with the
    fixed default key, which is deterministic across processes/machines
    (unlike Python's salted ``hash``)."""
    return int(hash64_batch([canonical_id])[0])


def hash64_batch(ids) -> np.ndarray:
    """Vectorized stable 64-bit hashing (pandas siphash, fixed key). ~10×
    the per-string md5 loop this replaced — membership-filter hashing is on
    the driver's per-round critical path."""
    import pandas as pd

    if not isinstance(ids, np.ndarray):
        ids = np.asarray(ids, dtype=object)
    elif ids.dtype != object:
        ids = ids.astype(object)
    return pd.util.hash_array(ids, categorize=False).view(np.int64)
