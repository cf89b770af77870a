"""Property-based tests (hypothesis) for the hashing/membership/sketch
primitives — classes of inputs rather than fixtures."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

int64s = st.lists(
    st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
    min_size=0, max_size=300,
)


@settings(max_examples=50, deadline=None)
@given(int64s)
def test_bloom_no_false_negatives(xs):
    from dumb_crawler_ray.state.bloom import BloomFilter

    b = BloomFilter(capacity=4096, fpp=0.01)
    arr = np.asarray(xs, dtype=np.int64)
    b.add_many(arr)
    assert b.contains_many(arr).all()


@settings(max_examples=50, deadline=None)
@given(int64s)
def test_cuckoo_no_false_negatives(xs):
    from dumb_crawler_ray.state.cuckoo import CuckooFilter

    c = CuckooFilter(capacity=4096)
    arr = np.asarray(xs, dtype=np.int64)
    c.add_many(arr)
    assert c.contains_many(arr).all()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 31) - 1),
                min_size=2, max_size=50, unique=True))
def test_pair_packing_round_trip(ids):
    """(a<<32)|b packing used by the dedup pair shuffles is lossless for
    31-bit doc ids with a < b."""
    ids = sorted(ids)
    a, b = np.asarray(ids[:-1], dtype=np.int64), np.asarray(ids[1:], dtype=np.int64)
    packed = (a << 32) | b
    assert ((packed >> 32) == a).all()
    assert ((packed & 0x7FFFFFFF) == b).all()


@settings(max_examples=25, deadline=None)
@given(st.text(max_size=400))
def test_rolling_fingerprints_match_naive(s):
    """Rabin-Karp rolling update == naive per-window polynomial hash for
    arbitrary unicode text."""
    from dumb_crawler_ray.ops.text import polynomial_hash, rolling_fingerprints

    MOD, BASE, W = (1 << 61) - 1, 257, 32
    got = rolling_fingerprints(s, W)
    data = s.encode("utf-8", errors="replace")
    if not s:
        want = []
    elif len(s) < W:
        want = [polynomial_hash(s)]
    else:
        want = []
        for i in range(len(data) - W + 1):
            h = 0
            for c in data[i:i + W]:
                h = (h * BASE + c) % MOD
            want.append(h)
    assert got == want


@settings(max_examples=25, deadline=None)
@given(st.text(max_size=200))
def test_simhash_stable_and_locality_free(s):
    """simhash64 is deterministic and int64-ranged for arbitrary text."""
    from dumb_crawler_ray.ops.dedup import simhash64

    a = simhash64(s)
    assert a == simhash64(s)
    assert -(1 << 63) <= a < (1 << 63)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=30), min_size=1,
                max_size=500),
       st.integers(min_value=1, max_value=16))
def test_misra_gries_bound_property(items, cap):
    """Any item with count > n/(cap+1) survives _mg_trim; output ≤ cap."""
    from dumb_crawler_ray.ops.text import _mg_trim

    arr = np.asarray(items, dtype=np.int64)
    u, c = np.unique(arr, return_counts=True)
    kept, _ = _mg_trim(u, c.astype(np.int64), cap)
    assert len(kept) <= cap
    n = len(arr)
    for item, cnt in zip(u, c):
        if cnt > n / (cap + 1):
            assert item in kept


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=100000), min_size=1,
                max_size=400),
       st.floats(min_value=0.01, max_value=0.99))
def test_quantile_histogram_equals_sorted_rank(vals, q):
    """The histogram-cumsum quantile equals the sorted-array
    ceil(q*n)-1 discrete quantile (DuckDB quantile_disc semantics)."""
    arr = np.asarray(vals, dtype=np.int64)
    v, c = np.unique(arr, return_counts=True)
    cum = np.cumsum(c)
    total = int(cum[-1])
    rank = min(total, int(np.ceil(q * total)))
    got = int(v[np.searchsorted(cum, rank)])
    want = int(np.sort(arr)[max(0, int(np.ceil(q * len(arr))) - 1)])
    assert got == want


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=80), st.text(max_size=300))
def test_css_select_never_raises(selector, html):
    """The validator contract: ANY selector string against ANY html either
    matches or doesn't — it must never raise (a config typo cannot be
    allowed to kill the fetch stage)."""
    from dumb_crawler_ray.functions.links import css_select_exists

    assert css_select_exists(html, selector) in (True, False)


@settings(max_examples=60, deadline=None)
@given(
    st.from_regex(
        r"(div|p|\*)?(\.[a-z]{1,4}|#[a-z]{1,4})?"
        r":(contains|has|nope)\([a-z >.()]{0,12}\)"
        r"( > (span|b)| (span|b))?",
        fullmatch=True,
    ),
    st.text(alphabet="<>/abdiv spn.\"'=x", max_size=300),
)
def test_css_pseudo_selectors_never_raise(selector, html):
    """Fuzz the TREE match path specifically: pseudo-class selectors
    (valid, nested-paren-invalid, unknown) against tag-soup html must
    never raise."""
    from dumb_crawler_ray.functions.links import css_select_exists

    assert css_select_exists(html, selector) in (True, False)


@settings(max_examples=40, deadline=None)
@given(st.text(max_size=200))
def test_extract_links_never_raises(html):
    from dumb_crawler_ray.functions.links import extract_links

    links = extract_links(html, "https://base.test/")
    assert isinstance(links, list)
    assert all(l.startswith(("http://", "https://")) for l in links)


@settings(max_examples=30, deadline=None)
@given(st.lists(
    st.tuples(
        st.from_regex(r"https://[a-z]{1,8}\.test/[a-z0-9/]{0,20}",
                      fullmatch=True),
        st.text(max_size=200),
    ),
    min_size=0, max_size=5,
))
def test_warc_round_trip_property(pages):
    """write_warc → iter_warc_pages is lossless for arbitrary unicode
    bodies (modulo nothing — urls and html round-trip exactly)."""
    import tempfile, os

    from dumb_crawler_ray.sources.warc import iter_warc_pages, write_warc

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.warc")
        write_warc(pages, p)
        got = list(iter_warc_pages(p))
    assert got == [(u, h) for u, h in pages]


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                min_size=0, max_size=60))
def test_unionfind_matches_bfs_components(edges):
    """components_unionfind (the small-side CC path) must assign every
    node its component-min representative — checked against a naive BFS
    on random graphs with self-loops and duplicate edges."""
    import pyarrow as pa

    from dumb_crawler_ray.ops.cc import components_unionfind

    pairs = pa.table({
        "a": pa.array([a for a, _ in edges], pa.int64()),
        "b": pa.array([b for _, b in edges], pa.int64()),
    })
    got = components_unionfind([pairs])

    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want: dict = {}
    for start in adj:
        if start in want:
            continue
        comp = {start}
        frontier = [start]
        while frontier:
            x = frontier.pop()
            for y in adj[x]:
                if y not in comp:
                    comp.add(y)
                    frontier.append(y)
        rep = min(comp)
        for m in comp:
            want[m] = rep
    assert got == want


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.integers(min_value=0, max_value=2000),
                          st.integers(min_value=0, max_value=700)),
                min_size=1, max_size=120, unique_by=lambda x: x[0]),
       st.integers(min_value=1, max_value=600))
def test_greedy_pack_properties(docs, budget):
    """Bins never exceed the budget except singleton oversize docs; the
    assignment is invariant to input row order; within a group, bin ids
    are non-decreasing in doc_id order."""
    import numpy as np

    from dumb_crawler_ray.ops.filters import greedy_pack

    ids = np.array([d[0] for d in docs])
    toks = np.array([d[1] for d in docs])
    grps = ids // 16
    a_ids, a_toks, a_bins = greedy_pack(ids, toks, grps, budget)
    # permutation invariance
    perm = np.random.default_rng(0).permutation(len(ids))
    b_ids, b_toks, b_bins = greedy_pack(ids[perm], toks[perm], grps[perm],
                                        budget)
    assert (a_ids == b_ids).all() and (a_bins == b_bins).all()
    # budget respected except oversize singletons
    fills = {}
    counts = {}
    for b, t in zip(a_bins, a_toks):
        fills[b] = fills.get(b, 0) + int(t)
        counts[b] = counts.get(b, 0) + 1
    for b, f in fills.items():
        assert f <= budget or counts[b] == 1
    # monotone within group
    order = np.argsort(a_ids)
    for i in range(1, len(order)):
        if a_ids[order[i]] // 16 == a_ids[order[i - 1]] // 16:
            assert a_bins[order[i]] >= a_bins[order[i - 1]]


@settings(max_examples=40, deadline=None)
@given(st.text(max_size=300), st.integers(min_value=1, max_value=80))
def test_doc_lines_chunk_mode_partitions_text(s, chunk):
    """Chunk mode is a partition of the text: concatenation round-trips,
    every chunk is ≤ chunk chars, count is ceil(len/chunk)."""
    from dumb_crawler_ray.ops.filters import _doc_lines

    lines = _doc_lines(s, chunk)
    assert "".join(lines) == s
    assert all(1 <= len(ln) <= chunk for ln in lines)
    assert len(lines) == (len(s) + chunk - 1) // chunk


@settings(max_examples=40, deadline=None)
@given(st.text(max_size=300))
def test_doc_lines_newline_mode_strips_and_drops(s):
    from dumb_crawler_ray.ops.filters import LINE_STRIP, _doc_lines

    lines = _doc_lines(s, 0)
    for ln in lines:
        assert ln == ln.strip(LINE_STRIP) and ln != ""
        assert "\n" not in ln


@settings(max_examples=30, deadline=None)
@given(st.text(max_size=300))
def test_pii_redaction_is_idempotent_and_never_raises(s):
    """Redacting already-redacted text changes nothing: the placeholders
    can never re-match either pattern."""
    import re

    from dumb_crawler_ray.ops.filters import EMAIL_RE, PHONE_RE

    def scrub(x):
        x = re.sub(EMAIL_RE, "<EMAIL>", x)
        return re.sub(PHONE_RE, "<PHONE>", x)

    once = scrub(s)
    assert scrub(once) == once
