"""Driver contract for the graft builder (Ray Data target).

`entry()` — flagship smoke: a TPC-H-style pricing summary over the
sf0.001 test tables AND a scale-1 crawl of the synthetic web (the engine's
namesake pipeline), returning the pricing summary Dataset.

`queries()` / `oracle_sql()` — one entry per implemented operator/pipeline
(SURVEY.md §2 + the training-data extensions); names and columns match the
DuckDB oracle SQL exactly. Non-SQL-expressible ops omit the oracle entry
(driver records rows-only).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF0001 = "/root/testdata/sf0.001"


def entry() -> Any:
    from dumb_crawler_ray.ops.registry import build_registry
    from dumb_crawler_ray.pipelines.crawl import CrawlPipeline
    from dumb_crawler_ray.sources.synthweb import DEFAULT_CONFIG, write_fixture

    # flagship crawl (scale 1, fast) — exercises the whole engine
    fix = write_fixture("/tmp/dcr_fixtures/sf1", seed=42, scale=1)
    crawl = CrawlPipeline(
        fix, DEFAULT_CONFIG, seed=42, scale=1, n_shards=2, fetch_concurrency=2
    ).run()
    assert len(crawl.crawl_order) > 0 and crawl.counters["SAVED_PAGES"] > 0

    # testdata pipeline with a stable schema for the smoke check
    reg = build_registry()
    return reg["lineitem_pricing_summary"][0](SF0001)


def queries() -> dict[str, Callable[[str], Any]]:
    from dumb_crawler_ray.ops.registry import build_registry

    return {name: fn for name, (fn, _sql) in build_registry().items()}


def oracle_sql() -> dict[str, str]:
    from dumb_crawler_ray.ops.registry import build_registry, ensure_oracle_inputs

    # the phash-pairs oracle reads the fixture parquet by path; make sure
    # it exists even if the DuckDB side runs before the Ray side
    ensure_oracle_inputs()
    return {
        name: sql for name, (_fn, sql) in build_registry().items() if sql is not None
    }
