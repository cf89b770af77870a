"""Unit tests for the pure operator library (SURVEY.md §5.1)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from dumb_crawler_ray.config import JobConfig, parse_period_ms
from dumb_crawler_ray.functions.expr import compile_expression
from dumb_crawler_ray.functions.links import css_select_exists, extract_links
from dumb_crawler_ray.functions.tagging import LinkFilter, LinkPrioritizer, UrlTagger
from dumb_crawler_ray.functions.urlhash import UrlHasher, hash64, hash64_batch
from dumb_crawler_ray.functions.urlparts import split_batch, split_one


# ---------------------------------------------------------------- urlparts

def test_split_one_basic():
    d = split_one("https://example.com/a/b?q=1#frag")
    assert d["protocol"] == "https"
    assert d["host"] == "example.com"
    assert d["path"] == "/a/b"
    assert d["port"] == 443
    assert d["query"] == "q=1"
    assert d["fragment"] == "frag"


def test_split_one_defaults_and_invalid():
    assert split_one("http://example.com")["path"] == "/"  # HttpUrl gives "/"
    assert split_one("http://example.com:8080/")["port"] == 8080
    assert split_one("mailto:x@y.z") is None
    assert split_one("ftp://example.com/") is None
    assert split_one("not a url") is None


def test_split_batch_masks_invalid():
    out = split_batch(["https://a.com/x", "mailto:b", "http://c.org"])
    assert out["valid"].to_pylist() == [True, False, True]
    assert out["host"].to_pylist() == ["a.com", None, "c.org"]


# ---------------------------------------------------------------- urlhash

def test_hasher_id_pattern_hit_and_miss():
    # reference: URLHasher.java:31-42 — full match → named group id, else md5
    h = UrlHasher(".*-(?<id>[0-9]+)$")
    assert h.hash_url("https://x.com/article-123") == "123"
    md5 = hashlib.md5(b"https://x.com/article").hexdigest()
    assert h.hash_url("https://x.com/article") == md5


def test_hasher_requires_id_group():
    with pytest.raises(ValueError):
        UrlHasher(".*-([0-9]+)$")


def test_hasher_no_pattern_md5():
    h = UrlHasher(None)
    url = "https://x.com/a"
    assert h.hash_url(url) == hashlib.md5(url.encode()).hexdigest()
    assert h.hash_batch([url]) == [h.hash_url(url)]


def test_hash64_stable():
    a = hash64("abc")
    assert a == hash64("abc")
    assert hash64_batch(["abc", "def"]).tolist() == [hash64("abc"), hash64("def")]
    assert hash64_batch(["abc"]).dtype == np.int64


# -------------------------------------------------------------- expression

URLS = [
    "https://d00.example.test/article/p1-123",
    "https://other.com/page",
    "https://d01.example.test/resource/x.css",
    "mailto:nope",
]


def _ctx():
    return split_batch(URLS)


def test_matches_full_match_semantics():
    ex = compile_expression("matches(host, 'd[0-9]+\\.example\\.test')")
    assert ex.evaluate(_ctx()).tolist() == [True, False, True, False]
    # full match, not substring: bare 'example' must NOT match
    ex2 = compile_expression("matches(host, 'example')")
    assert ex2.evaluate(_ctx()).tolist() == [False, False, False, False]


def test_isresource():
    ex = compile_expression("isResource(path)")
    assert ex.evaluate(_ctx()).tolist() == [False, False, True, False]


def test_boolean_ops_and_comparison():
    ex = compile_expression(
        "matches(path, '.*-[0-9]+$') and not isResource(path) or port == 8080"
    )
    assert ex.evaluate(_ctx()).tolist() == [True, False, False, False]
    ex2 = compile_expression("protocol == 'https'")
    assert ex2.evaluate(_ctx()).tolist() == [True, True, True, False]


def test_extract_named_group():
    from dumb_crawler_ray.functions.expr import _CompiledRegex

    rx = _CompiledRegex(".*-(?<value>[0-9]+)$")
    out = rx.extract_group(pa.array(["https://x/a-42", "https://x/a"]), "value")
    assert out.to_pylist() == ["42", None]


# ----------------------------------------------------------------- tagging

CFG = JobConfig(
    {
        "tagger": {
            "internal": "matches(host, 'd[0-9]+\\.example\\.test')",
            "article": "matches(path, '.*-[0-9]+$')",
            "resource": "isResource(path)",
            "other": "matches(host, 'ignored')",  # reserved → dropped
        },
        "linkFilter": {"whitelist": ["internal"], "blacklist": ["resource"]},
        "priorities": {"seed": 1000, "article": 900, "other": 10},
    }
)


def test_tagger_vocab_and_matrix():
    t = UrlTagger(CFG.tagger)
    assert t.vocab == ["internal", "article", "resource", "other"]
    tags = t.tag_batch(URLS)
    assert tags == [
        ["internal", "article"],
        ["other"],
        ["internal", "resource"],
        ["other"],  # invalid URL → no expression matches → other
    ]


def test_tags_arrow_roundtrip():
    t = UrlTagger(CFG.tagger)
    m = t.tag_matrix(URLS)
    arr = t.tags_arrow(m)
    assert arr.to_pylist() == t.tags_from_matrix(m)


def test_filter_first_hit_wins_and_counters():
    t = UrlTagger(CFG.tagger)
    m = t.tag_matrix(URLS)
    f = LinkFilter(whitelist=["internal"], blacklist=["resource"])
    is_http = np.array([True, True, True, False])
    allowed, n_allowed, n_ignored = f.allowed(m, t.vocab, is_http)
    # row2 is internal+resource: internal (whitelist) comes FIRST in tag
    # order → accepted. row3 non-http → rejected without counting.
    assert allowed.tolist() == [True, False, True, False]
    assert n_allowed == 2 and n_ignored == 1


def test_filter_blacklist_first_in_order():
    t = UrlTagger({"resource": "isResource(path)",
                   "internal": "matches(host, 'd[0-9]+\\.example\\.test')"})
    m = t.tag_matrix(URLS)
    f = LinkFilter(whitelist=["internal"], blacklist=["resource"])
    is_http = np.ones(len(URLS), dtype=bool)
    allowed, _, _ = f.allowed(m, t.vocab, is_http)
    # now `resource` precedes `internal` → the css row is rejected
    assert allowed.tolist() == [True, False, False, False]


def test_filter_allow_by_default():
    t = UrlTagger(CFG.tagger)
    m = t.tag_matrix(["https://nowhere.com/x"])
    f = LinkFilter(whitelist=["internal"], blacklist=[], allow_by_default=True)
    allowed, n_a, n_i = f.allowed(m, t.vocab, np.array([True]))
    assert allowed.tolist() == [True] and n_a == 1 and n_i == 0


def test_prioritizer_max_over_tags():
    t = UrlTagger(CFG.tagger)
    p = LinkPrioritizer(CFG.priorities)
    m = t.tag_matrix(URLS)
    pr = p.priorities_from_matrix(m, t.vocab)
    assert pr.tolist() == [900, 10, 0, 10]


# ------------------------------------------------------------------- links

HTML = """
<html><body>
<a href="https://a.com/1">one</a>
<a href="/rel/2">two</a>
<a rel="nofollow" href="https://a.com/3">three</a>
<link href="https://a.com/style.css" rel="stylesheet">
<a href="mailto:x@y.z">mail</a>
<a href="https://a.com/1">dup</a>
<A HREF='https://a.com/4'>caps</A>
</body></html>
"""


def test_extract_links_semantics():
    out = extract_links(HTML, "https://a.com/base/")
    assert out == [
        "https://a.com/1",
        "https://a.com/rel/2",       # absolutized
        "https://a.com/style.css",   # <link href> included
        "https://a.com/4",           # case-insensitive tag/attr
    ]


def test_css_select_exists():
    html = '<div class="article-body main">x</div><span id="top"></span>'
    assert css_select_exists(html, "div.article-body")
    assert css_select_exists(html, ".main")
    assert css_select_exists(html, "span#top")
    assert css_select_exists(html, "div")
    assert not css_select_exists(html, "div.missing")
    assert not css_select_exists(html, "p")


# ------------------------------------------------------------------ config

def test_period_parser():
    # reference: Misc.java:41-69
    assert parse_period_ms("10m") == 600_000
    assert parse_period_ms("5s") == 5_000
    assert parse_period_ms("2h") == 7_200_000
    assert parse_period_ms("1d") == 86_400_000
    assert parse_period_ms("1w") == 604_800_000
    assert parse_period_ms("nope") is None


def test_config_defaults():
    c = JobConfig({})
    assert c.thread_count == 3
    assert c.max_attempt_count == 5
    assert c.task_killer_timeout_ms == 600_000
    assert c.scheduler_batch_size == 6
    assert not c.respect_robots


def test_css_selector_combinators_and_attrs():
    """Jsoup-shape truth table (ContentValidator.java:29-47 accepts
    arbitrary Jsoup selectors; this engine covers the config-realistic
    subset and degrades gracefully on the rest)."""
    html = (
        '<html><body>'
        '<div class="header__principal" id="hp" data-kind="main article">'
        '  <span class="price" data-cur="USD">10</span>'
        '</div>'
        '<section><p><b>deep</b></p></section>'
        '<input type="text">'
        '</body></html>'
    )
    T = lambda s: css_select_exists(html, s)
    # compound
    assert T("div.header__principal")
    assert T("div#hp")
    assert T("#hp")
    assert T("*")
    assert T("div[data-kind]")
    assert T('div[data-kind~=article]')
    assert T('[data-cur=USD]')
    assert T('[data-cur="USD"]')
    assert T("[data-kind^=main]")
    assert T("[data-kind$=article]")
    assert T("[data-kind*=n ar]")
    assert not T("[data-cur=EUR]")
    assert not T("div.price")
    # descendant / child
    assert T("div span.price")
    assert T("div > span")
    assert T("body section p b")
    assert T("section > p > b")
    assert T("html b")
    assert not T("span > div")
    assert not T("section > b")      # b is a grandchild
    assert not T("div section")      # siblings, not nested
    # groups
    assert T("nope, div > span.price")
    assert not T("nope, .missing")
    # void elements don't capture children
    assert not T("input b")
    # unsupported syntax: logged, False, never raises
    assert not T("p + b")
    assert not T("")
    assert not T("div:first-of-type")


def test_css_pseudo_contains_and_has():
    """Jsoup :contains / :has truth table (the two pseudo-classes real
    validationSelector configs use, e.g. div:contains(price))."""
    html = (
        '<html><body>'
        '<div class="prod" id="d1">'
        '  <h2>Blue Widget</h2>'
        '  <span class="price">Price: <b>10 USD</b></span>'
        '</div>'
        '<div class="empty-box"><i>no cost here</i></div>'
        '<ul><li><a href="https://x.test/">cart</a></li></ul>'
        '</body></html>'
    )
    T = lambda s: css_select_exists(html, s)
    # :contains — own + descendant text, case-insensitive, normalized
    assert T("div:contains(price)")
    assert T("div:contains(PRICE)")
    assert T("span:contains(price: 10)")     # text spans a child boundary
    assert T("b:contains(usd)")
    assert T(":contains(blue widget)")
    assert not T("h2:contains(price)")
    assert not T("div:contains(gold)")
    # :has — any strict descendant matches the inner selector
    assert T("div:has(span)")
    assert T("div:has(.price)")
    assert T("div:has(span > b)")
    assert T("body:has(div.prod)")
    assert T("ul:has(a[href^=https])")
    assert not T("span:has(h2)")             # sibling's child, not descendant
    assert not T("div:has(ul)")
    # combined and chained
    assert T("div:has(b):contains(widget)")
    assert T("body div:contains(price) > h2")
    assert not T("div.empty-box:contains(price)")
    # unquoted-attr-value trailing slash is NOT self-closing: the <a> above
    # stays open, so its text is reachable
    assert T("li a:contains(cart)")
    # nested parenthesized pseudo-classes are unsupported → logged
    # no-match, never raises
    assert not T("ul:has(li:contains(cart))")
    assert not T("ul:has(li:has(a))")


def test_css_pseudo_nth_child():
    """Jsoup :nth-child(an+b) truth table — 1-based element index among
    the parent's element children; text nodes don't count."""
    html = (
        '<html><body><ul>'
        'text node'
        '<li id="a">one</li>'
        '<li id="b">two</li>'
        '<li id="c">three</li>'
        '<li id="d">four</li>'
        '</ul></body></html>'
    )
    T = lambda s: css_select_exists(html, s)
    # bare index (1-based; the text node is not a child element)
    assert T("li:nth-child(1)")
    assert T("#a:nth-child(1)")
    assert not T("#a:nth-child(2)")
    assert T("#d:nth-child(4)")
    assert not T("li:nth-child(5)")
    assert not T("li:nth-child(0)")
    # odd / even
    assert T("#c:nth-child(odd)")
    assert not T("#c:nth-child(even)")
    assert T("#b:nth-child(EVEN)")      # case-insensitive
    # an+b forms (n ranges over 0,1,2,...)
    assert T("#c:nth-child(2n+1)")
    assert not T("#b:nth-child(2n+1)")
    assert T("#b:nth-child(2n)")        # b omitted → 2n
    assert T("#a:nth-child(n)")         # bare n → matches every element
    assert T("#d:nth-child(3n+1)")      # 1, 4, 7, ...
    assert not T("#c:nth-child(3n+1)")
    assert T("#b:nth-child(-n+2)")      # first two only
    assert not T("#c:nth-child(-n+2)")
    assert T("#b:nth-child( 2n + 0 )")  # whitespace tolerated
    # combinator interaction + guards
    assert T("ul > li:nth-child(2)")
    assert not T("ul:nth-child(2)")     # ul is body's first element child
    assert T("body:nth-child(1) li")
    # malformed argument → unsupported, logged no-match, never raises
    assert not T("li:nth-child(x)")
    assert not T("li:nth-child()")


def test_nth_matches_definition_property():
    """`_nth_matches(a, b, idx)` ⟺ ∃ n ≥ 0 with a·n + b = idx — checked
    against the definition over the full small-parameter grid (covers
    a = 0, negative a, negative b)."""
    from dumb_crawler_ray.functions.links import _nth_matches, _parse_nth

    for a in range(-5, 6):
        for b in range(-10, 11):
            for idx in range(1, 31):
                want = (idx == b) if a == 0 else any(
                    a * n + b == idx for n in range(0, 60))
                assert _nth_matches(a, b, idx) == want, (a, b, idx)
    # grammar spot checks against the parser
    assert _parse_nth("odd") == (2, 1)
    assert _parse_nth("even") == (2, 0)
    assert _parse_nth("7") == (0, 7)
    assert _parse_nth("-n+3") == (-1, 3)
    assert _parse_nth("+2n-1") == (2, -1)
    assert _parse_nth(" 3N + 4 ") == (3, 4)


def test_extract_links_ignores_comments_and_scripts():
    """Jsoup does not surface links inside comments or script bodies —
    neither does the regex scan after block stripping."""
    html = (
        '<html><body>'
        '<a href="https://keep.test/a">real</a>'
        '<!-- <a href="https://drop.test/commented">x</a> -->'
        '<script>var s = \'<a href="https://drop.test/script">y</a>\';</script>'
        '<style>a { color: red } /* <a href="https://drop.test/css">z</a> */</style>'
        '<a href="https://keep.test/b">real2</a>'
        '</body></html>'
    )
    links = extract_links(html, "https://keep.test/")
    assert links == ["https://keep.test/a", "https://keep.test/b"]
    # selector matching also ignores commented-out markup
    assert not css_select_exists("<!-- <div class='x'></div> -->", "div.x")


def test_attr_tilde_is_jsoup_regex_match():
    """Jsoup's [attr~=x] is a REGEX match (org.jsoup.select.Selector),
    not the CSS whitespace word list."""
    html = '<a href="https://site.test/item-12345">x</a>'
    assert css_select_exists(html, r"[href~=\d{5}]")
    assert not css_select_exists(html, r"[href~=\d{9}]")
    # invalid regex degrades to unsupported (logged, False), never raises
    assert not css_select_exists(html, "[href~=(unclosed]")


def test_css_tree_path_linear_on_pathological_nesting():
    """20k-deep nesting and 20k-wide sibling lists must neither raise
    (iterative walks — never blow the recursion limit mid-crawl) nor go
    quadratic (:contains text and :has subtree matches are precomputed
    in one linear pass per document)."""
    import time

    t0 = time.time()
    deep = "<div>" * 20000 + "needle text" + "</div>" * 20000
    assert css_select_exists(deep, "div:contains(needle)") is True
    assert css_select_exists(deep, "div:has(span)") is False
    assert css_select_exists(deep, "div:has(div > div)") is True
    wide = ("<body>" + "".join(f"<p><b>x{i}</b></p>" for i in range(20000))
            + "</body>")
    assert css_select_exists(wide, "body:has(p > b)")
    assert not css_select_exists(wide, "body:has(span)")
    assert time.time() - t0 < 30  # quadratic versions took minutes


def test_css_contains_sees_document_order_text():
    """:contains matches Jsoup element.text() — text interleaved across
    child boundaries in READING order, not own-text-then-children."""
    html = "<span>alpha <b>beta</b> gamma</span>"
    assert css_select_exists(html, "span:contains(alpha beta gamma)")
    assert css_select_exists(html, "span:contains(beta gamma)")
    assert not css_select_exists(html, "span:contains(alpha gamma)")
