import numpy as np
import pyarrow.parquet as pq

from dumb_crawler_ray.functions import codec
from dumb_crawler_ray.functions.links import extract_links
from dumb_crawler_ray.sources import synthweb as sw


def test_images_deterministic_and_invariant():
    t1 = sw.gen_images(42, 1)
    t2 = sw.gen_images(42, 1)
    assert t1.equals(t2)
    assert t1.num_rows == 64
    rows = t1.to_pylist()
    for idx, r in enumerate(rows[:16]):
        src = sw.source_pixels(42, idx)
        dec = codec.decode(r["bytes"])
        assert dec.shape == (r["h"], r["w"], 3)
        if r["fmt"] == "png":
            assert np.array_equal(dec, src)
        else:
            assert codec.psnr(src, dec) >= 40.0
        assert r["caption"] == sw.source_caption(42, idx)
        assert r["phash"] == codec.phash64(dec)


def test_pages_deterministic_and_reachable():
    p1 = sw.gen_pages(42, 1)
    p2 = sw.gen_pages(42, 1)
    assert p1.equals(p2)
    assert p1.num_rows == 40
    rows = p1.to_pylist()
    kinds = {r["kind"] for r in rows}
    assert kinds <= {"article", "listing", "resource"}
    # hot domain receives roughly half the pages
    hot = sum(r["domain"] == "d00.example.test" for r in rows)
    assert 10 <= hot <= 30
    # every outlink resolves to a real page url
    urls = {r["url"] for r in rows}
    for r in rows:
        for link in r["outlinks"]:
            assert link in urls


def test_fetch_and_html_rules():
    web = sw.SynthWeb.generate(42, 1)
    # root page exists and links to all domains
    root = web.fetch("https://d00.example.test/")
    assert root.status_code == 200
    links = extract_links(root.html, "https://d00.example.test/")
    assert any(l.startswith("https://d01.") for l in links)
    # a normal 200 page: extraction drops the nofollow + mailto links and
    # dedups the duplicate
    for r in web._rows:
        if r["status_code"] == 200 and not r["empty_body"] and r["outlinks"]:
            resp = web.fetch(r["url"])
            got = extract_links(resp.html, r["url"])
            style = f"https://{r['domain']}/resource/style.css"
            assert got[0] == style  # <link href> first in document order
            assert got[1:] == list(dict.fromkeys(r["outlinks"]))
            break
    # unknown URL → 404
    assert web.fetch("https://d00.example.test/nope").status_code == 404


def test_validation_selector_presence():
    web = sw.SynthWeb.generate(42, 8)
    from dumb_crawler_ray.functions.links import css_select_exists

    arts = [r for r in web._rows if r["kind"] == "article" and r["status_code"] == 200
            and not r["empty_body"]]
    valid = next(r for r in arts if r["valid"])
    invalid = next(r for r in arts if not r["valid"])
    assert css_select_exists(web.fetch(valid["url"]).html, "div.article-body")
    assert not css_select_exists(web.fetch(invalid["url"]).html, "div.article-body")


def test_robots_rules():
    assert sw.robots_disallow("d00.example.test") == ["/listing/"]
    assert sw.robots_disallow("d01.example.test") == []


def test_write_fixture_idempotent(tmp_path):
    out = sw.write_fixture(tmp_path / "f", seed=42, scale=1)
    t = pq.read_table(out / "images.parquet")
    assert t.num_rows == 64
    # second call is a no-op (meta matches)
    mtime = (out / "images.parquet").stat().st_mtime
    sw.write_fixture(tmp_path / "f", seed=42, scale=1)
    assert (out / "images.parquet").stat().st_mtime == mtime
