"""Checkpoint delta-file layout helpers.

Frontier delta tables (`frontier_inserts`, `frontier_updates`, `order`)
are per-round: either ONE file `round=NNNNNN.parquet` (driver-side
candidate path) or a DIRECTORY `round=NNNNNN/part-*.parquet` (the
dataset-side candidate path writes its partition files in parallel).
Both layouts are equivalent: within a round every url_hash appears at
most once (post-dedup), so part order inside a round is immaterial;
ROUND order is the replay order and is what these helpers pin down.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq


def round_of(name: str) -> int:
    """`round=NNNNNN[.parquet]` → NNNNNN (negative rounds — the seed
    phase commits under -1 — parse fine)."""
    return int(name.split("=", 1)[1].split(".", 1)[0])


def round_entries(base: str) -> list[tuple[int, str]]:
    """(round, path) for every per-round file or directory under `base`,
    sorted by round."""
    if not os.path.isdir(base):
        return []
    out = [(round_of(n), os.path.join(base, n)) for n in os.listdir(base)
           if n.startswith("round=")]
    out.sort()
    return out


def read_round(path: str, columns=None) -> pa.Table:
    """One round's delta rows — a single file or a part directory."""
    if os.path.isdir(path):
        parts = sorted(os.path.join(path, n) for n in os.listdir(path)
                       if n.endswith(".parquet"))
        return pa.concat_tables(
            [pq.read_table(p, columns=columns) for p in parts])
    return pq.read_table(path, columns=columns)


def remove_round(path: str) -> None:
    import shutil

    if os.path.isdir(path):
        shutil.rmtree(path)
    else:
        os.remove(path)
