"""Oracle simulator sanity: determinism, termination, counter algebra."""

import pytest

from dumb_crawler_ray.config import JobConfig
from dumb_crawler_ray.pipelines import oracle, semantics as S
from dumb_crawler_ray.sources.synthweb import DEFAULT_CONFIG, SynthWeb


@pytest.fixture(scope="module")
def web8():
    return SynthWeb.generate(42, 8)


def test_oracle_deterministic(web8):
    r1 = oracle.simulate(DEFAULT_CONFIG, web8)
    r2 = oracle.simulate(DEFAULT_CONFIG, web8)
    assert r1.crawl_order == r2.crawl_order
    assert r1.seen_set == r2.seen_set
    assert r1.counters == r2.counters


def test_oracle_terminates_and_covers(web8):
    r = oracle.simulate(DEFAULT_CONFIG, web8)
    assert r.rounds > 3
    assert len(r.crawl_order) > 50
    # crawl order has no repeats in-session (terminal statuses)
    assert len(r.crawl_order) == len(set(r.crawl_order))
    # every fetched hash ends PROCESSED or FAILED
    for h in r.crawl_order:
        assert r.seen_set[h][0] in (S.PROCESSED, S.FAILED)
    # error paths were exercised by the fixture
    errs = [k for k in r.counters if k.startswith("ERROR_")]
    assert any("INVALID_STATUS_CODE" in e for e in errs)
    assert r.counters["SAVED_PAGES"] > 10
    assert r.counters["SAVED_IMAGES"] > 10
    assert r.counters["NEW_SAVED_PAGES"] == r.counters["SAVED_PAGES"]


def test_oracle_counter_algebra(web8):
    r = oracle.simulate(DEFAULT_CONFIG, web8)
    c = r.counters
    # every crawl_order entry resolves to exactly one outcome
    n_err = sum(v for k, v in c.items() if k.startswith("ERROR_"))
    assert c["PROCESSED_URLS"] + n_err == len(r.crawl_order)
    # stored + unstored = processed
    assert c["SAVED_PAGES"] + c["UNSAVED_PAGES"] == c["PROCESSED_URLS"]
    # seeds both discovered
    assert c["DISCOVERED_URLS"] == len(r.seen_set)


def test_politeness_cap_changes_order(web8):
    tight = dict(DEFAULT_CONFIG)
    tight["politeness"] = {"delay_ms": 0, "max_per_domain_per_round": 1}
    r_loose = oracle.simulate(DEFAULT_CONFIG, web8)
    r_tight = oracle.simulate(tight, web8)
    assert r_loose.crawl_order != r_tight.crawl_order
    # but the final seen-set key space is the same reachable set
    assert set(r_loose.seen_set) == set(r_tight.seen_set)


def test_robots_denial(web8):
    robo = dict(DEFAULT_CONFIG)
    robo["politeness"] = {"delay_ms": 0, "max_per_domain_per_round": 8,
                          "respect_robots": True}
    r = oracle.simulate(robo, web8)
    base = oracle.simulate(DEFAULT_CONFIG, web8)
    assert r.counters.get("ROBOTS_DENIED_URLS", 0) > 0
    # even-domain /listing/ pages never fetched
    denied = [h for h, v in r.seen_set.items() if v[2] == S.ROBOTS_ERROR]
    assert denied
    for h in denied:
        assert h not in r.crawl_order
    assert len(r.crawl_order) < len(base.crawl_order)


def test_max_rounds_cutoff(web8):
    r = oracle.simulate(DEFAULT_CONFIG, web8, max_rounds=2)
    assert r.rounds == 2
    cfg = JobConfig(DEFAULT_CONFIG)
    assert len(r.crawl_order) <= 2 * cfg.scheduler_batch_size
