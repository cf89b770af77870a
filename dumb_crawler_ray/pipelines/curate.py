"""Crawl → curated-corpus pipeline — the end-to-end composition the whole
engine exists for: the crawl's partitioned page checkpoint feeds the
training-data operators and comes out the other side as a deduplicated,
quality-filtered corpus table.

Stages (all streaming Ray Data, no driver materialization):

  read_parquet(ckpt/pages)        partitioned per-round fragments
  groupby(url_hash).map_groups    latest-version-wins (max round, then
                                  max rank) — the S7 re-crawl semantics
  map_batches(extract_text)       strip tags/entities from the stored
                                  html (vectorized regex)
  map_batches(quality)            n_chars / n_tokens + keep flag
  groupby(fingerprint)            exact dedup: md5(normalized text),
  .map_groups(keep-min)           one survivor per content fingerprint
  sort(url_hash)                  pinned output order

Output columns: url_hash, url, round, n_chars, n_tokens, fingerprint,
n_dups (how many stored pages shared this content), quality_ok.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..ops.text import TOKEN_REGEX  # the SQL-oracle-checked definition
from ..rayutil import remote_kwargs

_TAG_RE = r"<[^>]*>"


def extract_text_expr(html_col) -> pa.Array:
    """HTML → visible text: strip tags, collapse whitespace (vectorized
    pyarrow regex kernels — no per-row Python)."""
    no_tags = pc.replace_substring_regex(html_col, pattern=_TAG_RE,
                                         replacement=" ")
    collapsed = pc.replace_substring_regex(no_tags, pattern=r"\s+",
                                           replacement=" ")
    return pc.utf8_trim_whitespace(collapsed)


def curate_corpus(ckpt_dir: str, min_chars: int = 20):
    """Run the curation pipeline over a crawl checkpoint's pages table.
    Returns a Dataset of curated (deduplicated, quality-flagged) docs."""
    import ray

    pages = ray.data.read_parquet(
        f"{ckpt_dir}/pages", columns=["url_hash", "url", "html", "round", "rank"]
    )

    def latest_version(g: pa.Table) -> pa.Table:
        rounds = g.column("round").to_numpy()
        ranks = g.column("rank").to_numpy()
        i = int(np.lexsort((ranks, rounds))[-1])  # max round, then max rank
        return g.slice(i, 1)

    latest = pages.groupby("url_hash").map_groups(
        latest_version, batch_format="pyarrow", **remote_kwargs()
    )

    def text_and_quality(t: pa.Table) -> pa.Table:
        text = extract_text_expr(
            pc.cast(t.column("html"), pa.string()))
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
        n_tokens = pc.cast(
            pc.count_substring_regex(text, pattern=TOKEN_REGEX), pa.int64()
        )
        norm = pc.utf8_lower(text)
        fps = [hashlib.md5(s.encode("utf-8")).hexdigest()
               for s in norm.to_pylist()]
        return pa.table(
            {
                "url_hash": t.column("url_hash"),
                "url": t.column("url"),
                "round": t.column("round"),
                "n_chars": n_chars,
                "n_tokens": n_tokens,
                "fingerprint": pa.array(fps, pa.string()),
                "quality_ok": pc.greater_equal(n_chars,
                                               pa.scalar(min_chars, pa.int64())),
            }
        )

    scored = latest.map_batches(text_and_quality, batch_format="pyarrow",
                                **remote_kwargs())

    def keep_one(g: pa.Table) -> pa.Table:
        hashes = np.asarray(g.column("url_hash").to_pylist(), dtype=object)
        i = int(np.argsort(hashes)[0])  # pinned survivor: min url_hash
        out = g.slice(i, 1)
        return out.append_column("n_dups", pa.array([len(g)], pa.int64()))

    return (
        scored.groupby("fingerprint")
        .map_groups(keep_one, batch_format="pyarrow", **remote_kwargs())
        .sort("url_hash")
    )
