import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    """Synthetic web fixture at conformance scale (seed=42, scale=8)."""
    from dumb_crawler_ray.sources.synthweb import write_fixture

    out = tmp_path_factory.mktemp("synthweb") / "sf8"
    return str(write_fixture(out, seed=42, scale=8))


@pytest.fixture(scope="session")
def small_fixture_dir(tmp_path_factory):
    """Tiny fixture (scale=1) for smoke-level tests."""
    from dumb_crawler_ray.sources.synthweb import write_fixture

    out = tmp_path_factory.mktemp("synthweb_small") / "sf1"
    return str(write_fixture(out, seed=42, scale=1))
