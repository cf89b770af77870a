"""Tagging, link filtering and prioritization — vectorized truth tables.

Reference semantics:

- **Tagger** (J/api/UrlTagger.java:40-48): a URL's tags are ALL configured
  tag expressions that evaluate true; if none match the reserved tag
  ``other`` is assigned (:34-37 — a configured ``other`` entry is ignored).
  The reference iterates a HashMap (order unspecified); the rebuild PINS
  config-insertion order (SURVEY.md M2) so first-hit-wins filtering below is
  deterministic.

- **LinkFilter** (J/services/LinkFilter.java:24-44): reject non-http(s);
  then scan the tag array IN ORDER — a blacklisted tag rejects, a
  whitelisted tag accepts, first hit wins; fallthrough → ``allowByDefault``
  (default false). Counters ALLOWED_LINKS / IGNORED_LINKS are incremented
  for every decision made in the tag loop or fallthrough (NOT for the
  non-http early reject).

- **Prioritizer** (J/services/LinkPrioritizer.java:22-25): priority = max of
  ``priorities[tag]`` over the tag array (missing → 0), 0 when empty.
  Faithful quirk: seeds get an extra ``seed`` tag STORED first in their tag
  array (J/DumbCrawler.java:292-299) but their priority is computed from the
  expression tags only — ``priorities.seed`` is never actually applied.

Everything here operates on a boolean tag-presence matrix [n_rows × n_tags]
computed once per Arrow batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .expr import compile_expression
from .urlparts import split_batch

OTHER_TAG = "other"


class UrlTagger:
    def __init__(self, tagger_config: dict[str, str] | None):
        cfg = dict(tagger_config or {})
        cfg.pop(OTHER_TAG, None)  # reserved (UrlTagger.java:34-37)
        self.tag_names: list[str] = list(cfg.keys())  # pinned config order
        self.expressions = [compile_expression(v) for v in cfg.values()]
        # full tag vocabulary, with `other` always last
        self.vocab: list[str] = self.tag_names + [OTHER_TAG]

    def tag_matrix(self, urls) -> np.ndarray:
        """bool[n, len(vocab)] — presence of each tag per URL, `other` last."""
        ctx = split_batch(urls)
        n = len(urls)
        m = np.zeros((n, len(self.vocab)), dtype=bool)
        for j, ex in enumerate(self.expressions):
            m[:, j] = ex.evaluate(ctx)
        m[:, -1] = ~m[:, :-1].any(axis=1)  # `other` iff nothing matched
        return m

    def tags_from_matrix(self, m: np.ndarray) -> list[list[str]]:
        vocab = self.vocab
        return [[vocab[j] for j in np.flatnonzero(row)] for row in m]

    def tag_batch(self, urls) -> list[list[str]]:
        return self.tags_from_matrix(self.tag_matrix(urls))

    def tags_arrow(self, m: np.ndarray) -> pa.ListArray:
        """Zero-loop construction of a list<string> tags column."""
        counts = m.sum(axis=1)
        offsets = np.zeros(len(m) + 1, dtype=np.int32)
        np.cumsum(counts, out=offsets[1:])
        rows, cols = np.nonzero(m)
        vocab = np.asarray(self.vocab, dtype=object)
        values = pa.array(vocab[cols], type=pa.string())
        return pa.ListArray.from_arrays(pa.array(offsets), values)


class LinkFilter:
    def __init__(self, whitelist=(), blacklist=(), allow_by_default: bool = False):
        self.whitelist = set(whitelist or ())
        self.blacklist = set(blacklist or ())
        self.allow_by_default = bool(allow_by_default)

    def verdicts(self, vocab: list[str]) -> np.ndarray:
        """-1 reject / +1 accept / 0 neutral per vocabulary tag."""
        v = np.zeros(len(vocab), dtype=np.int8)
        for j, t in enumerate(vocab):
            if t in self.blacklist:  # blacklist checked first (LinkFilter.java:30-38)
                v[j] = -1
            elif t in self.whitelist:
                v[j] = 1
        return v

    def allowed(self, m: np.ndarray, vocab: list[str], is_http: np.ndarray):
        """Vectorized first-hit-wins decision.

        Returns (allowed: bool[n], n_allowed_counted, n_ignored_counted) —
        the two counts reproduce ALLOWED_LINKS / IGNORED_LINKS (non-http rows
        are rejected without counting).
        """
        v = self.verdicts(vocab)
        relevant = m & (v != 0)[None, :]
        has_hit = relevant.any(axis=1)
        first = np.argmax(relevant, axis=1)
        hit_accept = v[first] > 0
        decided = np.where(has_hit, hit_accept, self.allow_by_default)
        allowed = decided & is_http
        n_allowed = int((decided & is_http).sum())
        n_ignored = int((~decided & is_http).sum())
        return allowed, n_allowed, n_ignored


class LinkPrioritizer:
    def __init__(self, priorities: dict[str, int] | None):
        self.priorities = {k: int(v) for k, v in (priorities or {}).items()}

    def weights(self, vocab: list[str]) -> np.ndarray:
        return np.asarray([self.priorities.get(t, 0) for t in vocab], dtype=np.int64)

    def priorities_from_matrix(self, m: np.ndarray, vocab: list[str]) -> np.ndarray:
        w = self.weights(vocab)
        # max over present tags; absent tags contribute -inf, empty rows → 0
        masked = np.where(m, w[None, :], np.iinfo(np.int64).min)
        out = masked.max(axis=1)
        out[~m.any(axis=1)] = 0
        return out.astype(np.int32)
