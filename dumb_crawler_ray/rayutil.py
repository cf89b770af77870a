"""Ray worker-environment helpers shared by all pipeline stages."""

from __future__ import annotations

import os


def pkg_parent_dir() -> str:
    import dumb_crawler_ray

    return os.path.dirname(os.path.dirname(os.path.abspath(dumb_crawler_ray.__file__)))


def _workers_can_import() -> bool:
    """True when Ray workers will already find the package: its parent dir
    is the current working directory (workers inherit cwd in local mode) or
    is on the inherited PYTHONPATH."""
    parent = pkg_parent_dir()
    if os.path.abspath(os.getcwd()) == parent:
        return True
    return parent in os.environ.get("PYTHONPATH", "").split(os.pathsep)


def actor_pool_size(frac: float = 0.4, lo: int = 2, hi: int = 12) -> int:
    """Default actor-pool concurrency: ~40% of cluster CPUs, clamped.
    Pools sized at or above the CPU count starve their own upstream
    parquet read (measured 2.5× slower at 30 actors / 32 CPUs); tiny
    fixed pools serialize the stage on big machines. Falls back to
    os.cpu_count() when Ray isn't initialized yet (graph build time)."""
    import ray

    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 4))
    else:
        cpus = os.cpu_count() or 4
    return max(lo, min(hi, int(cpus * frac)))


def remote_kwargs() -> dict:
    """kwargs to splice into map_batches(...)/ray.remote(...).options(...)
    so workers can import this package even when the driver put it on
    sys.path manually (driver-local sys.path does NOT propagate to
    workers). Empty when workers can already import it — a runtime_env
    forces dedicated worker processes, which is per-stage startup cost we
    skip when unnecessary."""
    if _workers_can_import():
        return {}
    parent = pkg_parent_dir()
    existing = os.environ.get("PYTHONPATH", "")
    path = parent if not existing else f"{parent}{os.pathsep}{existing}"
    return {"runtime_env": {"env_vars": {"PYTHONPATH": path}}}


def keyed_colocate(build_fn):
    """Run ``build_fn()`` — a Dataset chain containing a keyed
    ``repartition(keys=...)`` — under a scoped HASH_SHUFFLE
    DataContext, materialize it, and return a dataset rebuilt from the
    plasma blocks.

    This is THE mechanism for keyed co-location in this repo, extracted
    because its two subtleties were each bitten once: (a) datasets
    capture their DataContext at creation, so the WHOLE chain (reads
    included) must be constructed inside ``build_fn`` while the scope is
    active; (b) a dataset materialized under the scoped context must be
    rebuilt via ``from_arrow_refs`` or downstream operations (sorts,
    groupbys) plan under the captured HASH_SHUFFLE strategy and can
    deadlock small clusters."""
    import ray

    ctx = ray.data.DataContext.get_current()
    prev = ctx.shuffle_strategy
    ctx.shuffle_strategy = ray.data.context.ShuffleStrategy.HASH_SHUFFLE
    try:
        mat = build_fn().materialize()
    finally:
        ctx.shuffle_strategy = prev
    return ray.data.from_arrow_refs(list(mat.to_arrow_refs()))
