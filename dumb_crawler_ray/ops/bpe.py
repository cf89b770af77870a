"""Distributed BPE tokenizer training (Sennrich et al. 2016) over the
`documents` table.

The algorithm's scale structure is its own optimization: the CORPUS is
touched exactly once (a distributed wordcount — the only pass whose cost
grows with the data), and every merge round then runs over the WORD
TABLE (distinct words ≪ tokens; dataset-resident, never on the driver):

    round r: per-block weighted adjacent-pair partial counts
             → driver dict-merge (bounded by distinct symbol pairs —
               a vocabulary quantity, not a corpus one; the Misra-Gries
               precedent for bounded driver merges)
             → pinned argmax (count DESC, pair ASC — byte order on the
               lowercase-alnum alphabet, identical in DuckDB)
             → broadcast the winning pair, one map_batches applies it.

Merge application is defined as a STRING REWRITE so both engines are
bit-identical: with symbols double-space-joined and the word padded,
``replace(' l  r ', ' lr ')`` performs exactly the left-to-right
non-overlapping merge of classic BPE (the double spacing stops one
match's trailing space from consuming the next match's leading space),
then double spaces collapse back. Python ``str.replace`` and DuckDB
``replace`` share these semantics, so the FULL training run — word
counts, every pair pick, every rewrite — has an exact chained-CTE
DuckDB oracle, and a single-process reimplementation parity test.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..rayutil import remote_kwargs

DEFAULT_MERGES = 12


def merge_syms(syms: str, left: str, right: str) -> str:
    """Apply ONE merge to a space-joined symbol string — the rewrite
    authority shared by the distributed op, the local reimplementation
    and (verbatim) the SQL oracle."""
    padded = " " + syms.replace(" ", "  ") + " "
    padded = padded.replace(f" {left}  {right} ", f" {left}{right} ")
    return padded.replace("  ", " ").strip()


def _pair_counts(syms_list, ns) -> dict:
    out: dict[str, int] = {}
    for syms, n in zip(syms_list, ns):
        toks = syms.split(" ")
        for a, b in zip(toks, toks[1:]):
            key = f"{a} {b}"
            out[key] = out.get(key, 0) + int(n)
    return out


def bpe_train_local(word_counts: dict, n_merges: int) -> list[tuple]:
    """Single-process reference implementation over a word→count dict —
    the parity oracle for the distributed op (same pick rule, same
    rewrite)."""
    state = {" ".join(w): n for w, n in word_counts.items()}
    merges = []
    for rank in range(n_merges):
        counts = _pair_counts(list(state), list(state.values()))
        if not counts:
            break
        pair = min(counts, key=lambda p: (-counts[p], p))
        left, right = pair.split(" ")
        merges.append((rank, left, right, counts[pair]))
        state = {merge_syms(s, left, right): n for s, n in state.items()}
    return merges


def bpe_train(sf_dir: str, n_merges: int = DEFAULT_MERGES):
    """Distributed BPE training; returns the merge table
    (rank, left, right, merged_count)."""
    import re

    import ray

    from .text import TOKEN_REGEX

    tok_re = re.compile(TOKEN_REGEX)

    def local_counts(t: pa.Table) -> pa.Table:
        toks: list = []
        for s in t.column("text").to_pylist():
            toks.extend(tok_re.findall(s.lower()))
        if not toks:
            return pa.table({"syms": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        words, counts = np.unique(np.asarray(toks, dtype=object),
                                  return_counts=True)
        return pa.table(
            {"syms": pa.array([" ".join(w) for w in words], pa.string()),
             "n": pa.array(counts.astype(np.int64), pa.int64())})

    from ray.data.aggregate import Sum

    state = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                              columns=["text"])
        .map_batches(local_counts, batch_format="pyarrow",
                     **remote_kwargs())
        .groupby("syms")
        .aggregate(Sum("n", alias_name="n"))
        .materialize()
    )

    def pair_partial(t: pa.Table) -> pa.Table:
        counts = _pair_counts(t.column("syms").to_pylist(),
                              t.column("n").to_numpy())
        return pa.table(
            {"pair": pa.array(list(counts), pa.string()),
             "cnt": pa.array(list(counts.values()), pa.int64())})

    merges: list[tuple] = []
    for rank in range(n_merges):
        totals: dict[str, int] = {}
        for b in state.map_batches(pair_partial, batch_format="pyarrow",
                                   **remote_kwargs()).iter_batches(
                batch_format="pyarrow", batch_size=None):
            for p, c in zip(b.column("pair").to_pylist(),
                            b.column("cnt").to_numpy()):
                totals[p] = totals.get(p, 0) + int(c)
        if not totals:
            break
        pair = min(totals, key=lambda p: (-totals[p], p))
        left, right = pair.split(" ")
        merges.append((rank, left, right, totals[pair]))
        lr_ref = ray.put((left, right))

        def apply(t: pa.Table) -> pa.Table:
            l, r = ray.get(lr_ref)
            return pa.table(
                {"syms": pa.array(
                    [merge_syms(s, l, r)
                     for s in t.column("syms").to_pylist()], pa.string()),
                 "n": t.column("n")})

        state = state.map_batches(apply, batch_format="pyarrow",
                                  **remote_kwargs()).materialize()

    return pa.table(
        {"rank": pa.array([m[0] for m in merges], pa.int64()),
         "left": pa.array([m[1] for m in merges], pa.string()),
         "right": pa.array([m[2] for m in merges], pa.string()),
         "merged_count": pa.array([m[3] for m in merges], pa.int64())})


def bpe_oracle_sql(n_merges: int = DEFAULT_MERGES) -> str:
    """The chained-CTE replay: s0 = char-split word counts, then per
    round p{i} (pinned argmax pair) and s{i+1} (the double-space padded
    replace rewrite — semantics identical to Python str.replace)."""
    parts = ["""
WITH wc AS MATERIALIZED (
    SELECT word, CAST(count(*) AS BIGINT) AS n FROM (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
        FROM documents
    ) GROUP BY word
),
s0 AS MATERIALIZED (
    SELECT array_to_string(string_split(word, ''), ' ') AS syms, n FROM wc
)"""]
    for i in range(n_merges):
        parts.append(f""",
p{i} AS MATERIALIZED (
    SELECT z[1] || ' ' || z[2] AS pair, sum(n) AS cnt
    FROM (SELECT unnest(list_zip(string_split(syms, ' '),
                                 string_split(syms, ' ')[2:])) AS z, n
          FROM s{i})
    WHERE z[2] IS NOT NULL
    GROUP BY 1 ORDER BY cnt DESC, pair ASC LIMIT 1
),
s{i + 1} AS MATERIALIZED (
    SELECT trim(replace(replace(
               ' ' || replace(syms, ' ', '  ') || ' ',
               ' ' || replace((SELECT pair FROM p{i}), ' ', '  ') || ' ',
               ' ' || replace((SELECT pair FROM p{i}), ' ', '') || ' '),
               '  ', ' ')) AS syms, n
    FROM s{i}
)""")
    selects = " UNION ALL ".join(
        f"SELECT {i} AS rank, split_part(pair, ' ', 1) AS left, "
        f"split_part(pair, ' ', 2) AS right, "
        f"CAST(cnt AS BIGINT) AS merged_count FROM p{i}"
        for i in range(n_merges))
    return "".join(parts) + "\n" + selects + "\nORDER BY rank"
