"""Operator-suite CLI — run any registry query and write partitioned
parquet: `python -m dumb_crawler_ray.ops_cli <query> [--sf DIR] [--out DIR]`.

The batch-job entry point for the training-data operators (the crawl has
`run.py`): results stream to a partitioned parquet directory via
`Dataset.write_parquet` (resumable output — never one giant file), or
print to stdout with `--show`. `--list` enumerates the registry with
oracle status.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("query", nargs="?", help="registry query name")
    ap.add_argument("--sf", default="/root/testdata/sf0.001",
                    help="input table directory")
    ap.add_argument("--out", default=None,
                    help="output directory (partitioned parquet)")
    ap.add_argument("--show", action="store_true",
                    help="print rows to stdout instead of writing")
    ap.add_argument("--limit", type=int, default=20,
                    help="--show row limit")
    ap.add_argument("--list", action="store_true", dest="list_queries",
                    help="list available queries")
    args = ap.parse_args(argv)

    from .ops.registry import build_registry

    reg = build_registry()
    if args.list_queries or not args.query:
        for name, (_fn, sql) in sorted(reg.items()):
            kind = "sql-oracle" if sql else "rows-only"
            print(f"{name:32s} {kind}")
        return 0
    if args.query not in reg:
        print(f"unknown query {args.query!r}; use --list", file=sys.stderr)
        return 2

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    result = reg[args.query][0](args.sf)

    import pandas as pd
    import pyarrow as pa

    if args.show or not args.out:
        if isinstance(result, ray.data.Dataset):
            rows = result.take(args.limit)
        elif isinstance(result, pa.Table):
            rows = result.slice(0, args.limit).to_pylist()
        elif isinstance(result, pd.DataFrame):
            rows = result.head(args.limit).to_dict("records")
        else:
            rows = list(result)[: args.limit]
        for r in rows:
            print(r)
        return 0

    if isinstance(result, pd.DataFrame):
        result = pa.Table.from_pandas(result)
    if isinstance(result, pa.Table):
        result = ray.data.from_arrow(result)
    # partitioned parquet: one file per block — a failed run re-writes only
    # missing partitions; never a single giant file
    result.write_parquet(args.out)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    try:
        raise SystemExit(main(sys.argv[1:]))
    except BrokenPipeError:  # piped into head etc.
        raise SystemExit(0)
