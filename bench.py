#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line with the headline metrics.

Headline: crawl throughput (URLs fetched+deduped/sec) over the synthetic
web (BASELINE.json metric), with the per-row image PSNR/caption validation
enabled. Fetch latency is modeled with a fixed simulated RTT per URL
(DCR_BENCH_RTT_MS, default 15 ms) because a crawler's wall-clock is
network-latency-bound; all parsing/tagging/dedup/validation compute is
real. Plus per-query timings for the Ray Data operator suite over
$GRAFT_SF_DIR.

--scaling: runs the SAME crawl job in fresh processes at num_cpus=8 and
num_cpus=32 (the sandbox stand-in for N vs 4N nodes) and reports both
throughputs and the scaling efficiency tp_4N / (4 × tp_N). Also runs a
compute-bound Ray Data scaling probe (image decode+stats over the image
table) at both sizes. Results land in BENCH/BASELINE.md.

Usage:
  python bench.py                # headline JSON line
  python bench.py --scaling     # N vs 4N runs + efficiency report
  python bench.py --crawl-only  # crawl metric only (used by --scaling)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
RTT_MS = float(os.environ.get("DCR_BENCH_RTT_MS", "15"))
BENCH_SCALE = int(os.environ.get("DCR_BENCH_SCALE", "256"))
SCALING_SCALE = int(os.environ.get("DCR_SCALING_SCALE", "1024"))
BENCH_K = int(os.environ.get("DCR_BENCH_K", "2048"))
FIXTURE_DIR = f"/tmp/dcr_fixtures/bench_sf{BENCH_SCALE}"

BENCH_CONFIG_OVERRIDES = {
    # throughput shape: few large BSP rounds, politeness cap off
    "scheduler": {"batchSize": BENCH_K},
    "politeness": {"delay_ms": 0, "max_per_domain_per_round": 0},
}


def _ray_init(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 log_to_driver=False)
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)


def run_crawl(num_cpus: int) -> dict:
    from dumb_crawler_ray.pipelines.crawl import CrawlPipeline
    from dumb_crawler_ray.sources.synthweb import DEFAULT_CONFIG, write_fixture

    fix = write_fixture(FIXTURE_DIR, seed=42, scale=BENCH_SCALE)
    cfg = json.loads(json.dumps(DEFAULT_CONFIG))
    cfg.update(BENCH_CONFIG_OVERRIDES)
    # actor pool strictly proportional to cluster size so N vs 4N compares
    # like-for-like (4× the fetch slots at 4× the CPUs); each actor runs
    # `threadCount`-style in-actor fetch threads (reference semantics) so
    # RTT overlaps within a worker — in-flight fetches = conc × threads
    conc = max(2, (num_cpus * 3) // 4)
    threads = int(os.environ.get("DCR_BENCH_THREADS", "4"))
    t0 = time.time()
    res = CrawlPipeline(
        fix, cfg, seed=42, scale=BENCH_SCALE, n_shards=8,
        fetch_concurrency=conc, fetch_delay_s=RTT_MS / 1000.0,
        fetch_threads=threads,
    ).run()
    wall = time.time() - t0
    return {
        "wall_s": round(wall, 3),
        "urls_fetched": len(res.crawl_order),
        "urls_discovered": res.counters.get("DISCOVERED_URLS", 0),
        "pages_saved": res.counters.get("SAVED_PAGES", 0),
        "images_validated": res.counters.get("SAVED_IMAGES", 0),
        "rounds": res.rounds,
        "urls_per_sec": round(len(res.crawl_order) / wall, 1),
        "fetch_concurrency": conc,
        "fetch_threads": threads,
        "rtt_ms": RTT_MS,
    }


def run_compute_probe(num_cpus: int) -> dict:
    """Compute-bound Ray Data scaling probe: decode → resize → linear-
    projection embedding (the model-inference stand-in) over 4× the bench
    image table (union of repeated reads — long enough that actor-pool
    ramp is amortized). Pool sized BELOW num_cpus so parquet read tasks
    are not starved (measured 2.5× slower when the pool claims every
    CPU)."""
    import ray

    from dumb_crawler_ray.ops.multimodal import ImageEmbedWorker
    from dumb_crawler_ray.sources.synthweb import write_fixture

    fix = write_fixture(FIXTURE_DIR, seed=42, scale=BENCH_SCALE)
    conc = max(2, (num_cpus * 3) // 4)
    # probe length: after the r3s5 block_mean_resize vectorization the
    # old 24k-row probe finished in ~6 s — actor-pool ramp dominated and
    # the efficiency number measured startup, not compute. 96k rows
    # (capped by the fixture size) keeps the probe in steady state.
    n_rows = int(os.environ.get("DCR_PROBE_ROWS", "98304"))
    ds = ray.data.read_parquet(
        f"{fix}/images.parquet", columns=["image_id", "bytes"]
    ).limit(n_rows).map_batches(
        ImageEmbedWorker, batch_format="pyarrow", batch_size=128,
        concurrency=conc,
        # dim/side chosen so BLAS arithmetic (~7 MFLOP/image) dominates
        # memory traffic — the shape of real model inference; lighter
        # probes measure this shared box's DRAM bandwidth, not Ray
        fn_constructor_kwargs={"dim": 1024, "side": 48},
        # ray.init(num_cpus=N) is a LOGICAL cap: numpy's BLAS pools spawn
        # OS threads across every PHYSICAL core, so an "8-CPU" probe run
        # silently uses the whole box and the 8-vs-32 premise collapses
        # (measured: the probe INVERTED, 4N slower than N). Pin BLAS to
        # one thread per actor — parallelism must come from Ray, like a
        # real multi-node run where each node owns its cores.
        runtime_env={"env_vars": {"OMP_NUM_THREADS": "1",
                                  "OPENBLAS_NUM_THREADS": "1",
                                  "MKL_NUM_THREADS": "1"}},
    )
    t0 = time.time()
    n = sum(len(b) for b in ds.iter_batches(batch_format="pyarrow", batch_size=None))
    wall = time.time() - t0
    return {"wall_s": round(wall, 3), "images": int(n),
            "images_per_sec": round(n / wall, 1), "concurrency": conc}


def cpu_parallel_baseline() -> dict:
    """Machine parallel-capacity baseline: pure-Python busy loops in 8 vs
    32 processes. On a dedicated box this is ~1.0; on a shared/virtualized
    host it is the HARD CEILING any 8→32 scaling measurement can reach, so
    the probe efficiencies below are reported raw AND normalized by it."""
    import multiprocessing as mp

    def burn(q):
        t0 = time.time()
        x = 0
        while time.time() - t0 < 2.0:
            for _ in range(10000):
                x += 1
        q.put(x)

    rates = {}
    for n in (8, 32):
        q = mp.Queue()
        ps = [mp.Process(target=burn, args=(q,)) for _ in range(n)]
        t0 = time.time()
        for p in ps:
            p.start()
        total = sum(q.get() for _ in ps)
        for p in ps:
            p.join()
        rates[n] = total / (time.time() - t0)
    return {
        "work_rate_8": round(rates[8] / 1e6, 1),
        "work_rate_32": round(rates[32] / 1e6, 1),
        "machine_parallel_eff": round(rates[32] / (4 * rates[8]), 3),
    }


def run_queries() -> dict:
    """Per-query wall times for the operator suite over $GRAFT_SF_DIR."""
    from dumb_crawler_ray.ops import ann, dedup, multimodal, relational, text
    from dumb_crawler_ray.sources.synthweb import write_fixture

    fix = write_fixture(FIXTURE_DIR, seed=42, scale=BENCH_SCALE)

    def consume(result):
        if hasattr(result, "iter_batches"):
            return sum(len(b) for b in result.iter_batches(
                batch_format="pyarrow", batch_size=None))
        return result.num_rows

    # actor pools sized BELOW the CPU count so read tasks are never starved
    pool = max(2, (NUM_CPUS * 7) // 16)
    # warm the Ray worker pool once so the first timed query doesn't pay
    # process spawn for every other query's workers
    import ray

    ray.data.range(NUM_CPUS * 4, override_num_blocks=NUM_CPUS * 4).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).count()

    timings = {}
    suite = {
        "lineitem_pricing_summary": lambda: relational.lineitem_agg(SF_DIR),
        "order_priority_revenue": lambda: relational.order_priority_revenue(SF_DIR),
        "events_hourly_window": lambda: relational.events_hourly_window(SF_DIR),
        "user_sessions": lambda: relational.user_sessions(SF_DIR),
        "top_users_by_value": lambda: relational.top_users(SF_DIR),
        "orders_by_segment": lambda: relational.orders_by_segment(SF_DIR),
        "doc_fingerprints": lambda: text.doc_fingerprint(SF_DIR),
        "dedup_exact": lambda: dedup.dedup_exact(SF_DIR),
        # signature stage is ~0.1 ms/doc after vectorization: a big actor
        # pool is pure ramp cost at sf0.1 — 4 actors saturate it
        "minhash_near_dup_pairs": lambda: dedup.minhash_near_dup_pairs(
            SF_DIR, concurrency=4),
        # df-capped mode: the exact all-pairs form is quadratic in shingle
        # document-frequency — max_df is the documented scale knob
        "ngram_jaccard_pairs_df64": lambda: dedup.ngram_jaccard_pairs(
            SF_DIR, max_df=64),
        "simhash_signatures": lambda: dedup.simhash_signatures(SF_DIR),
        "ann_bruteforce_topk": lambda: ann.ann_bruteforce(SF_DIR),
        "embedding_near_dup_pairs": lambda: dedup.embedding_near_dup_pairs(SF_DIR),
        "image_decode_stats": lambda: multimodal.decode_stats(
            f"{fix}/images.parquet", concurrency=pool, batch_size=256),
        "image_features": lambda: multimodal.image_features(
            f"{fix}/images.parquet", concurrency=pool),
    }
    for name, fn in suite.items():
        t0 = time.time()
        consume(fn())
        timings[name] = round(time.time() - t0, 3)
    return timings


def run_queries_extra() -> dict:
    """Round-2/3 operators, timed under a separate key so the headline
    `value` stays comparable across rounds."""
    from dumb_crawler_ray.ops import (ann, dedup, export, filters, graph,
                                      multimodal, relational, text)
    from dumb_crawler_ray.sources.synthweb import write_fixture

    fix = write_fixture(FIXTURE_DIR, seed=42, scale=BENCH_SCALE)

    def consume(result):
        if hasattr(result, "iter_batches"):
            return sum(len(b) for b in result.iter_batches(
                batch_format="pyarrow", batch_size=None))
        return result.num_rows

    suite = {
        "event_value_quantiles": lambda: relational.event_value_quantiles(SF_DIR),
        "heavy_hitters_users": lambda: text.heavy_hitters(SF_DIR),
        "word_frequencies": lambda: text.word_frequencies(SF_DIR),
        "top_terms_per_doc": lambda: text.top_terms_per_doc(SF_DIR),
        "embedding_kmeans": lambda: ann.embedding_kmeans(SF_DIR),
        "event_funnel": lambda: relational.event_funnel(SF_DIR),
        "high_value_week": lambda: relational.high_value_week(SF_DIR),
        "supplier_nation_stats": lambda: relational.supplier_nation_stats(SF_DIR),
        # round 3: SQL-oracle'd simhash pairs / CC clusters / language-ID
        "simhash_near_dup_pairs": lambda: dedup.simhash_near_dup_pairs(SF_DIR),
        "jaccard_clusters": lambda: dedup.jaccard_clusters(SF_DIR),
        "lang_id": lambda: text.lang_id(SF_DIR),
        # round 3: quality-filter family (ops/filters.py)
        "gopher_quality_flags": lambda: filters.gopher_quality_flags(SF_DIR),
        "pii_scrub_stats": lambda: filters.pii_scrub_stats(SF_DIR, inject=True),
        "contamination_overlap": lambda: filters.contamination_overlap(SF_DIR),
        "line_dedup_stats": lambda: filters.line_dedup_stats(SF_DIR, chunk=64),
        "repetition_ratios": lambda: filters.repetition_ratios(SF_DIR),
        "source_balanced_sample": lambda: filters.source_balanced_sample(SF_DIR),
        "pack_sequences": lambda: filters.pack_sequences(SF_DIR),
        "duplicated_text_share": lambda: filters.duplicated_text_share(SF_DIR),
        # round 5 session 3: the removal action + DSIR weights
        "substring_dedup": lambda: filters.substring_dedup(SF_DIR),
        "dsir_importance_weights":
            lambda: filters.dsir_importance_weights(SF_DIR),
        "source_overlap_matrix": lambda: dedup.source_overlap_matrix(SF_DIR),
        # round 5 session 5: the fused curation decision + its release
        "doc_curation_full": lambda: filters.doc_curation_full(SF_DIR),
        "curated_doc_release": lambda: export.curated_doc_release(
            SF_DIR, out_dir=f"/tmp/dcr_release/bench_docs_{os.getpid()}"),
        "quality_classifier_scores": lambda: filters.quality_classifier_scores(
            SF_DIR),
        "doc_split": lambda: text.doc_split(SF_DIR),
        "retention_cohorts": lambda: relational.retention_cohorts(SF_DIR),
        "filtered_ann_topk": lambda: ann.filtered_ann_topk(SF_DIR),
        "page_rank": lambda: graph.page_rank(f"{fix}/pages.parquet"),
        "bigram_lm_scores": lambda: filters.bigram_lm_scores(SF_DIR),
        "page_indegree": lambda: graph.page_indegree(f"{fix}/pages.parquet"),
        "ann_ivfpq_topk": lambda: ann.ann_ivfpq_topk(SF_DIR),
        "cms_user_counts": lambda: text.cms_user_counts(SF_DIR),
        "bm25_topk": lambda: text.bm25_topk(SF_DIR),
        "semantic_dedup": lambda: ann.semantic_dedup(SF_DIR, threshold=0.45),
        "approx_daily_active_users": lambda: text.approx_daily_active_users(
            SF_DIR),
        "leakage_safe_split": lambda: text.leakage_safe_split(SF_DIR),
        # pid-keyed out_dir: a stale manifest would skip every write and
        # time the no-op resume path instead of the export
        "export_corpus": lambda: export.export_corpus(
            SF_DIR, out_dir=f"/tmp/dcr_export/bench_{os.getpid()}"),
        # round 3: image-table curation ops (fixture-backed, SQL-checked)
        "image_caption_stats": lambda: multimodal.caption_stats(
            f"{fix}/images.parquet"),
        "image_exact_dedup": lambda: multimodal.image_exact_dedup(
            f"{fix}/images.parquet"),
        "image_shard_pack": lambda: multimodal.image_shard_pack(
            f"{fix}/images.parquet"),
        "image_caption_alignment": lambda: multimodal.image_caption_alignment(
            f"{fix}/images.parquet"),
        "image_curation_full": lambda: multimodal.image_curation_full(
            f"{fix}/images.parquet"),
        "image_semantic_dedup": lambda: multimodal.image_semantic_dedup(
            f"{fix}/images.parquet"),
        "image_aspect_buckets": lambda: multimodal.image_aspect_buckets(
            f"{fix}/images.parquet"),
        "image_size_filter": lambda: multimodal.image_size_filter(
            f"{fix}/images.parquet"),
        "caption_to_image_topk": lambda: multimodal.caption_to_image_topk(
            f"{fix}/images.parquet"),
        "dataset_mixture": lambda: filters.dataset_mixture(SF_DIR),
        "export_image_shards": lambda: export.export_image_shards(
            f"{fix}/images.parquet",
            out_dir=f"/tmp/dcr_release/bench_imgs_{os.getpid()}"),
        "eval_decontaminate": lambda: filters.eval_decontaminate(SF_DIR),
        "bpe_train": lambda: __import__(
            "dumb_crawler_ray.ops.bpe",
            fromlist=["bpe_train"]).bpe_train(SF_DIR),
        "export_webdataset": lambda: __import__(
            "dumb_crawler_ray.sources.webdataset",
            fromlist=["export_webdataset"]).export_webdataset(
                f"{fix}/images.parquet",
                out_dir=f"/tmp/dcr_release/bench_wds_{os.getpid()}"),
    }
    timings = {}
    for name, fn in suite.items():
        t0 = time.time()
        consume(fn())
        timings[name] = round(time.time() - t0, 3)
    return timings


def main_headline() -> dict:
    _ray_init(NUM_CPUS)
    crawl = run_crawl(NUM_CPUS)
    queries = run_queries()
    queries["crawl"] = crawl["wall_s"]
    extra = run_queries_extra()
    total = round(sum(queries.values()), 3)
    return {
        "metric": "crawl throughput (URLs fetched+deduped/sec) + operator suite wall",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "crawl_urls_per_sec": crawl["urls_per_sec"],
        "crawl_detail": crawl,
        "queries_extra": extra,
    }


def main_scaling() -> dict:
    # scaling runs use a larger web + batch so steady-state fetch work
    # dominates the constant startup/ramp costs; warm the fixture cache
    # once so neither subprocess pays generation
    from dumb_crawler_ray.sources.synthweb import write_fixture

    scaling_fixture = f"/tmp/dcr_fixtures/bench_sf{SCALING_SCALE}"
    write_fixture(scaling_fixture, seed=42, scale=SCALING_SCALE)
    out = {}
    for label, cpus in (("N", 8), ("4N", 32)):
        # the scaling CRITERION runs the latency-bound regime (1 fetch
        # thread/actor, in-flight strictly CPU-proportional) — the regime
        # the north rule describes. With RTT-overlap threads the N-size
        # job is already compute-saturated on this shared single box, so a
        # single-host 8→32-CPU ratio stops measuring the engine (see
        # BASELINE.md); override with DCR_SCALING_THREADS to measure that
        # regime anyway.
        env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus),
                   DCR_BENCH_SCALE=str(SCALING_SCALE), DCR_BENCH_K="4096",
                   DCR_BENCH_THREADS=os.environ.get("DCR_SCALING_THREADS", "1"))
        proc = subprocess.run(
            [sys.executable, __file__, "--crawl-only"],
            capture_output=True, text=True, env=env, cwd=os.path.dirname(__file__),
            timeout=1800,
        )
        line = proc.stdout.strip().splitlines()[-1]
        out[label] = json.loads(line)
        out[label]["num_cpus"] = cpus
        # compute-bound probe in its own fresh process too
        proc2 = subprocess.run(
            [sys.executable, __file__, "--compute-probe"],
            capture_output=True, text=True, env=env, cwd=os.path.dirname(__file__),
            timeout=1800,
        )
        out[label]["compute_probe"] = json.loads(proc2.stdout.strip().splitlines()[-1])
    tp_n, tp_4n = out["N"]["urls_per_sec"], out["4N"]["urls_per_sec"]
    eff = tp_4n / (4 * tp_n) if tp_n else 0.0
    cp_n = out["N"]["compute_probe"]["images_per_sec"]
    cp_4n = out["4N"]["compute_probe"]["images_per_sec"]
    cp_eff = cp_4n / (4 * cp_n) if cp_n else 0.0
    base = cpu_parallel_baseline()
    ceiling = base["machine_parallel_eff"] or 1.0
    report = {
        "metric": "crawl scaling efficiency (4N vs N CPUs, fresh processes)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "throughput_N": tp_n,
        "throughput_4N": tp_4n,
        "compute_probe_eff": round(cp_eff, 3),
        "compute_probe_eff_normalized": round(cp_eff / ceiling, 3),
        "compute_probe_N": cp_n,
        "compute_probe_4N": cp_4n,
        "machine_parallel_baseline": base,
        "detail": out,
    }
    _write_bench_md(report)
    return report


def _write_bench_md(report: dict) -> None:
    os.makedirs(os.path.join(os.path.dirname(__file__) or ".", "BENCH"),
                exist_ok=True)
    path = os.path.join(os.path.dirname(__file__) or ".", "BENCH", "BASELINE.md")
    # everything below the marker is curated by hand (certified best runs,
    # per-session noise context, triage pointers) — a fresh --scaling run
    # must never erase it; only the template ABOVE the marker (this run's
    # numbers) is regenerated
    marker = "<!-- NOTES — preserved across --scaling runs -->"
    notes = ""
    if os.path.exists(path):
        prev = open(path).read()
        if marker in prev:
            notes = prev[prev.index(marker):]
    if not notes:
        notes = marker + "\n"
    n, f4 = report["detail"]["N"], report["detail"]["4N"]
    with open(path, "w") as fh:
        fh.write(f"""# BENCH — measured scaling (sandbox N vs 4N CPUs)

Same crawl job (synthetic web scale={SCALING_SCALE}, simulated fetch RTT
{RTT_MS} ms, full per-row image PSNR/caption validation) run in fresh
processes via `python bench.py --scaling`:

| cluster size | num_cpus | fetch actors | URLs fetched | wall (s) | URLs/s |
|---|---|---|---|---|---|
| N  | {n['num_cpus']} | {n['fetch_concurrency']} | {n['urls_fetched']} | {n['wall_s']} | {n['urls_per_sec']} |
| 4N | {f4['num_cpus']} | {f4['fetch_concurrency']} | {f4['urls_fetched']} | {f4['wall_s']} | {f4['urls_per_sec']} |

**Crawl scaling efficiency (tp_4N / 4·tp_N): {report['value']}**

Compute-bound Ray Data probe (image decode→resize→linear-projection
embedding actor pool, no sleeps, 4× image table):
N = {report['compute_probe_N']} images/s, 4N = {report['compute_probe_4N']}
images/s → efficiency {report['compute_probe_eff']} raw,
{report['compute_probe_eff_normalized']} normalized by the machine's own
parallel ceiling.

Machine baseline (pure-Python busy loops, 8 vs 32 processes on this
shared/virtualized host): parallel efficiency
{report['machine_parallel_baseline']['machine_parallel_eff']} — the hard
ceiling ANY 8→32 CPU measurement can reach here. On a real 4N-node
cluster each node brings its own cores, memory bandwidth and object
store, so this single-box ceiling does not apply; the crawl metric beats
the ceiling because fetch latency (the real-world bottleneck this engine
is built around) parallelizes ideally.

Reference baseline: the original publishes no numbers; its design ceiling
is `threadCount / fetch_latency` ≈ single-digit URLs/s at default
threadCount=3 (BASELINE.md). Identical crawl order and URL-seen set vs the
oracle are enforced by the conformance suite at any parallelism.

""")
        fh.write(notes)


def _write_last_json(report: dict, name: str = "LAST.json") -> str:
    bench_dir = os.path.join(os.path.dirname(__file__) or ".", "BENCH")
    os.makedirs(bench_dir, exist_ok=True)
    path = os.path.join(bench_dir, name)
    with open(path, "w") as fh:
        json.dump(report, fh, indent=1)
    return os.path.relpath(path, os.path.dirname(__file__) or ".")


def _compact_headline(rep: dict, detail_path: str) -> dict:
    # the round driver captures only a short stdout tail — keep the final
    # line under ~500 bytes so it always parses; full detail in BENCH/LAST.json
    q = rep["queries"]
    return {
        "metric": rep["metric"],
        "value": rep["value"],
        "unit": "sec",
        "queries": {
            "suite_core_s": round(sum(v for k, v in q.items() if k != "crawl"), 3),
            "suite_extra_s": round(sum(rep["queries_extra"].values()), 3),
            "crawl": q.get("crawl"),
        },
        "n_queries": len(q) + len(rep["queries_extra"]),
        "sf": rep["sf"],
        "num_cpus": rep["num_cpus"],
        "crawl_urls_per_sec": rep["crawl_urls_per_sec"],
        "detail": detail_path,
    }


def _compact_scaling(rep: dict, detail_path: str) -> dict:
    return {
        "metric": rep["metric"],
        "value": rep["value"],
        "unit": "efficiency",
        "throughput_N": rep["throughput_N"],
        "throughput_4N": rep["throughput_4N"],
        "compute_probe_eff": rep["compute_probe_eff"],
        "machine_parallel_eff":
            rep["machine_parallel_baseline"]["machine_parallel_eff"],
        "detail": detail_path,
    }


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else ""
    if mode == "--crawl-only":
        _ray_init(NUM_CPUS)
        print(json.dumps(run_crawl(NUM_CPUS)))
    elif mode == "--compute-probe":
        _ray_init(NUM_CPUS)
        print(json.dumps(run_compute_probe(NUM_CPUS)))
    elif mode == "--scaling":
        rep = main_scaling()
        path = _write_last_json(rep, "LAST_scaling.json")
        print(json.dumps(rep))
        print(json.dumps(_compact_scaling(rep, path)))
    else:
        rep = main_headline()
        # same-run host context (~4 s): absolute totals on this shared
        # host drift ±40% with external load (BENCH/TRIAGE.md), so every
        # recorded headline carries the host's own 8→32 busy-loop
        # parallel efficiency measured seconds after the suite — a
        # degraded recording is then self-explaining
        rep["machine_parallel_baseline"] = cpu_parallel_baseline()
        path = _write_last_json(rep, "LAST.json")
        print(json.dumps(rep))
        compact = _compact_headline(rep, path)
        compact["host_parallel_eff"] = (
            rep["machine_parallel_baseline"]["machine_parallel_eff"])
        print(json.dumps(compact))
    import ray

    if ray.is_initialized():
        ray.shutdown()
