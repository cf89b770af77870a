"""Candidate dedup — the A5/J1 'big dedup' in its distributed form.

Two equivalent implementations of the pinned first-occurrence-wins merge
(SURVEY.md J3: keep the candidate with the smallest (rank, link_idx) — i.e.
the order the oracle's sequential per-page inserts would see):

- ``dedup_candidates_local``: numpy/dict scan, used by the driver when the
  per-round candidate volume is O(k·links) — cheap, no shuffle.
- ``dedup_candidates_dataset``: ``ray.data`` ``groupby(url_hash)`` —
  the hash-shuffle form for rounds with millions of candidates, where a
  driver-side scan would make the driver the bottleneck. Same semantics,
  verified equal in tests.

At 10^10-URL scale the dataset form runs BEFORE the shard insert so each
shard receives each new url_hash exactly once per round; the bloom probe
then splits known-new rows away from the exact-membership path
(SURVEY.md §7 hard part d).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..rayutil import remote_kwargs


def flatten_candidates(result_rows: list[dict]) -> dict:
    """Explode per-page cand_* lists into flat columns with a global
    ``seq`` = position in (rank, link_idx) order. Input rows must already
    be rank-sorted."""
    out = {"url": [], "url_hash": [], "domain": [], "tags": [], "priority": []}
    for r in result_rows:
        out["url"].extend(r["cand_url"])
        out["url_hash"].extend(r["cand_hash"])
        out["domain"].extend(r["cand_domain"])
        out["tags"].extend(r["cand_tags"])
        out["priority"].extend(r["cand_priority"])
    out["seq"] = list(range(len(out["url"])))
    return out


def dedup_candidates_local(cand: dict) -> dict:
    """First occurrence per url_hash, preserving input (pinned) order."""
    seen: set[str] = set()
    keep: list[int] = []
    for i, h in enumerate(cand["url_hash"]):
        if h in seen:
            continue
        seen.add(h)
        keep.append(i)
    return {k: [cand[k][i] for i in keep] for k in cand}


def dedup_candidates_dataset(cand: dict) -> dict:
    """Same merge as ``dedup_candidates_local`` expressed as a Ray Data
    hash shuffle: groupby(url_hash) → per-group min-seq row → global sort
    by seq restores the pinned order."""
    import ray

    if not cand["url_hash"]:
        return cand
    t = pa.table(
        {
            "url": pa.array(cand["url"], pa.string()),
            "url_hash": pa.array(cand["url_hash"], pa.string()),
            "domain": pa.array(cand["domain"], pa.string()),
            "tags": pa.array(cand["tags"], pa.list_(pa.string())),
            "priority": pa.array([int(p) for p in cand["priority"]], pa.int64()),
            "seq": pa.array(cand["seq"], pa.int64()),
        }
    )

    def first_by_seq(group: pa.Table) -> pa.Table:
        i = int(np.argmin(group.column("seq").to_numpy()))
        return group.slice(i, 1)

    ds = ray.data.from_arrow(t)
    out = (
        ds.groupby("url_hash")
        .map_groups(first_by_seq, batch_format="pyarrow", **remote_kwargs())
        .sort("seq")
    )
    merged = pa.concat_tables(
        tb for tb in out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    return {c: merged.column(c).to_pylist() for c in merged.column_names}
