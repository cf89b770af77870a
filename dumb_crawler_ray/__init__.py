"""dumb_crawler_ray — a Ray-Data-native rebuild of thordickinson/dumb-crawler.

A from-scratch data-processing engine with the query and data-processing
capabilities of the reference crawler (see /root/repo/SURVEY.md), expressed
Ray-Data-first:

- ``functions/``  pure, vectorized operator semantics (URL hashing, the
  expression DSL, tagging / filtering / prioritization, link extraction,
  the deterministic image codec). Shared by BOTH the Ray pipeline and the
  pure-Python oracle simulator so there is exactly one semantics.
- ``sources/``    deterministic synthetic-web + image-table generators
  (FIXTURES.md) and job-config loading.
- ``state/``      distributed state: bloom / cuckoo filters, the sharded
  frontier actor pool, and the parquet-fragment checkpoint store.
- ``stages/``     Ray Data ``map_batches`` stages (fetch actor pool,
  vectorized link processing, dedup).
- ``pipelines/``  the BSP crawl round loop and the oracle simulator.
- ``ops/``        training-data operators over the TPC-H-ish test tables
  (dedup family, ANN, text analysis, multimodal stubs, relational
  pipelines) — the SURVEY.md §2-adjacent large-scale additions.
"""

__version__ = "0.1.0"
