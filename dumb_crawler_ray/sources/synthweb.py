"""Deterministic synthetic web + image/caption input table (FIXTURES.md).

Everything is a pure function of ``(seed, scale)`` — stable across runs,
machines, chunking and parallelism levels. Per-element randomness comes from
``np.random.default_rng([seed, idx, purpose])`` so no draw order couples
elements.

The "web" the crawler fetches:
- ``images`` table — the authoritative input shape (BASELINE.json
  ``input_hint``): image_id, bytes, w, h, fmt, caption, phash.
- ``site_pages`` — one row per crawlable page; fetching a URL renders its
  HTML deterministically from the row (outlinks incl. one duplicate, one
  rel=nofollow and one mailto: link to exercise extraction rules —
  SURVEY.md M6), plus per-domain root index pages and robots.txt rules.

In production this module is replaced by real HTTP fetches; the engine-side
contract is only `fetch(url) -> FetchResponse`.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions import codec

WORDS = (
    "amber basalt cedar delta ember fjord garnet harbor indigo juniper krill "
    "lagoon maple nectar onyx prairie quartz raven sierra tundra umber vortex "
    "willow xenon yonder zephyr anchor breeze canyon drift echo flare grove "
    "haze isle jade knoll lumen mesa nimbus oasis pine quarry reef summit "
    "thicket upland vale wharf yarrow zenith arbor bluff crest dune eyrie "
    "fern glen heath inlet knot loch moor ridge"
).split()
assert len(WORDS) == 64

KINDS = ("article", "listing", "resource")
# four dim classes: square, two 4:3 sizes, and one extreme-wide 4:1
# banner — so metadata gates (min side, aspect) all have true positives
W_CYCLE = (32, 64, 128, 256)
H_CYCLE = (32, 48, 96, 64)


def _rng(seed: int, idx: int, purpose: int) -> np.random.Generator:
    return np.random.default_rng([seed, idx, purpose])


# ------------------------------------------------------------------ images

def n_images(scale: int) -> int:
    return 64 * scale


def image_dims(idx: int) -> tuple[int, int]:
    return W_CYCLE[idx % len(W_CYCLE)], H_CYCLE[idx % len(H_CYCLE)]


def image_fmt(idx: int) -> str:
    return "png" if idx % 4 else "jpeg"


def image_id(idx: int) -> str:
    return f"img{idx:08d}"


def source_pixels(seed: int, idx: int) -> np.ndarray:
    """The ground-truth pixel array (h, w, 3) uint8 for image idx.

    Smooth per-image sinusoidal pattern + seeded noise: compresses like a
    real photo (unlike pure noise), keeps the lossy-PSNR invariant
    meaningful, and gives every image a DISTINCT perceptual hash (a shared
    base gradient would make every phash collide). Every 16th image is a
    lightly-noised copy of its predecessor — planted near-duplicates so
    phash/near-dup operators have true positives to find.
    """
    w, h = image_dims(idx)
    if idx % 16 == 15:  # planted near-dup of idx-1 (dims differ: idx%4 differs!)
        base = source_pixels(seed, idx - 1)
        rng = _rng(seed, idx, 3)
        noisy = base.astype(np.int16) + rng.integers(-6, 7, size=base.shape)
        # resize to this idx's own dims via nearest-neighbor index mapping
        ys = (np.arange(h) * base.shape[0]) // h
        xs = (np.arange(w) * base.shape[1]) // w
        return np.clip(noisy[np.ix_(ys, xs)], 0, 255).astype(np.uint8)
    rng = _rng(seed, idx, 3)
    fx = rng.uniform(0.5, 4.0, size=3)
    fy = rng.uniform(0.5, 4.0, size=3)
    phase = rng.uniform(0, 2 * np.pi, size=3)
    yy = np.arange(h)[:, None] / h
    xx = np.arange(w)[None, :] / w
    chans = [
        127.5 + 90.0 * np.sin(2 * np.pi * (fx[c] * xx + fy[c] * yy) + phase[c])
        for c in range(3)
    ]
    base = np.stack(chans, axis=2)
    noise = rng.integers(-12, 13, size=(h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def source_caption(seed: int, idx: int) -> str:
    rng = _rng(seed, idx, 4)
    picks = rng.integers(0, 64, size=8)
    return f"caption {idx}: " + " ".join(WORDS[int(p)] for p in picks)


def gen_images(seed: int, scale: int) -> pa.Table:
    return gen_images_and_pacts(seed, scale)[0]


def gen_images_and_pacts(seed: int, scale: int) -> tuple[pa.Table, pa.Table]:
    # build-time expected values for the stored-pixel pact (same as the
    # stored phash: derived from the DECODED pixels at fixture build, so
    # the distributed pipelines must reproduce them from `bytes` alone):
    # aesthetic score, quality metrics, and the feature/embedding tower
    # digests; lazy import — ops depends on sources, not vice versa
    import hashlib

    from ..ops.multimodal import (CaptionEmbedWorker, ImageAestheticWorker,
                                  ImageQualityWorker,
                                  assign_aspect_buckets, ASPECT_LADDER,
                                  block_mean_resize)
    from ..ops.vecutil import GEMM_ROWS

    scorer = ImageAestheticWorker()
    quality = ImageQualityWorker()
    cap_tower = CaptionEmbedWorker()
    n = n_images(scale)
    ids, blobs, ws, hs, fmts, captions, phashes = [], [], [], [], [], [], []
    q_mean, q_rms, q_grad, q_lc, q_bad = [], [], [], [], []
    mean_px, std_px, thumb_dig, thumb_png = [], [], [], []
    bkt_id, bkt_tw, bkt_th, bkt_nb, bkt_dig = [], [], [], [], []
    # embed-dependent pact columns flush in GEMM_ROWS chunks: embed_pixels
    # is batch-shape-independent (fixed_gemm), so chunked build-time
    # embeds are bit-identical to whatever batching the pipelines use —
    # and the build stops paying a padded 64-row gemm per single image
    emb_dig, aesthetics = [], []
    img_embs: list[np.ndarray] = []
    _pending: list[np.ndarray] = []

    def _flush_embeds():
        if not _pending:
            return
        embs = scorer.embed.embed_pixels(_pending)
        img_embs.extend(embs)
        emb_dig.extend(hashlib.md5(e.astype(np.float32).tobytes()).hexdigest()
                       for e in embs)
        aesthetics.extend(float(s) for s in scorer.score_from_emb(embs))
        _pending.clear()

    for idx in range(n):
        w, h = image_dims(idx)
        fmt = image_fmt(idx)
        arr = source_pixels(seed, idx)
        data = codec.encode(arr, fmt)
        ids.append(image_id(idx))
        blobs.append(data)
        ws.append(w)
        hs.append(h)
        fmts.append(fmt)
        captions.append(source_caption(seed, idx))
        # stored expected values are of the *decoded* pixels so they
        # match `bytes` (ONE decode + ONE chunked embed feed everything)
        decoded = codec.decode(data)
        phashes.append(codec.phash64(decoded))
        _pending.append(decoded)
        if len(_pending) == GEMM_ROWS:
            _flush_embeds()
        m, rms, g, lc, bad = quality.metrics(decoded)
        q_mean.append(m)
        q_rms.append(rms)
        q_grad.append(g)
        q_lc.append(lc)
        q_bad.append(bad)
        mean_px.append(round(float(decoded.mean()), 4))
        std_px.append(round(float(decoded.std()), 4))
        thumb = block_mean_resize(decoded, 16, 16)
        thumb_dig.append(hashlib.md5(thumb.tobytes()).hexdigest())
        thumb_png.append(len(codec.encode(thumb, "png")))
        b = int(assign_aspect_buckets(np.asarray([w], dtype=np.int64),
                                      np.asarray([h], dtype=np.int64))[0])
        _bid, tw, th, _rw, _rh = ASPECT_LADDER[b]
        bucket_png = codec.encode(block_mean_resize(decoded, tw, th), "png")
        bkt_id.append(b)
        bkt_tw.append(tw)
        bkt_th.append(th)
        bkt_nb.append(len(bucket_png))
        bkt_dig.append(hashlib.md5(bucket_png).hexdigest())
    _flush_embeds()
    # exp_clip_score: the CLIP-style image↔caption cosine the alignment /
    # full-curation pipelines must reproduce from (bytes, caption) alone —
    # EXACTLY their arithmetic: float32 tower rows → float64 via the Arrow
    # list round-trip semantics (float32 values widen exactly) → the same
    # rounded-4 einsum row dot (`ops/multimodal.py` merge)
    cap_embs = cap_tower.embed_captions(captions)
    a64 = (np.stack(img_embs).astype(np.float32).astype(np.float64)
           if img_embs else np.empty((0, 1)))
    c64 = cap_embs.astype(np.float64)
    clip_scores = (np.round(np.einsum("ij,ij->i", a64, c64), 4)
                   if len(a64) else np.empty(0))
    topk = _gen_topk_pacts(ids, img_embs, cap_embs)
    imgs = pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
            "caption": pa.array(captions, pa.string()),
            "phash": pa.array(phashes, pa.int64()),
            "aesthetic_score": pa.array(aesthetics, pa.float64()),
            "q_mean_luma": pa.array(q_mean, pa.float64()),
            "q_rms_contrast": pa.array(q_rms, pa.float64()),
            "q_grad_energy": pa.array(q_grad, pa.float64()),
            "q_low_contrast": pa.array(q_lc, pa.bool_()),
            "q_bad_exposure": pa.array(q_bad, pa.bool_()),
            "mean_pixel": pa.array(mean_px, pa.float64()),
            "std_pixel": pa.array(std_px, pa.float64()),
            "thumb_digest": pa.array(thumb_dig, pa.string()),
            "emb_digest": pa.array(emb_dig, pa.string()),
            "thumb_png_bytes": pa.array(thumb_png, pa.int64()),
            "exp_bucket_id": pa.array(bkt_id, pa.int64()),
            "exp_target_w": pa.array(bkt_tw, pa.int64()),
            "exp_target_h": pa.array(bkt_th, pa.int64()),
            "exp_bucket_png_bytes": pa.array(bkt_nb, pa.int64()),
            "exp_bucket_digest": pa.array(bkt_dig, pa.string()),
            "exp_clip_score": pa.array(clip_scores.tolist(), pa.float64()),
        }
    )
    return imgs, topk


def _gen_topk_pacts(ids: list[str], img_embs: list[np.ndarray],
                    cap_embs: np.ndarray) -> pa.Table:
    """Build-time replay of the cross-modal brute-force top-k ops —
    EXACTLY `ops/multimodal.py`'s arithmetic (fixed_sims chunked gemm,
    pinned (-sim, neighbor_id) tie-break, rounded-4 float64 sims), so
    the stored answers are bit-identical to the distributed pipelines'
    at any partitioning. Two op families share the table, keyed by the
    `op` column:
      - 'image_ann'        ≡ image_ann_topk(n_queries=16, k=5)
        (image-tower queries vs image tower, self excluded, float32 sims
        — 16 matches the registry wrapper, which widens the query set so
        the planted near-dup pair lands in it)
      - 'caption_to_image' ≡ caption_to_image_topk(n_queries=16, k=5)
        (caption-tower queries vs image tower, self kept, float64 sims)
    """
    from ..ops.vecutil import fixed_sims

    out_op, out_q, out_r, out_n, out_s = [], [], [], [], []
    if img_embs:
        vids = np.asarray(ids, dtype=object)
        e32 = np.stack(img_embs).astype(np.float32)
        order = np.argsort(vids)

        def topk_into(op: str, qids, sims, k: int, exclude_self: bool):
            for qi, qid in enumerate(qids):
                s = sims[qi].astype(np.float64)
                mask = (vids != qid) if exclude_self \
                    else np.ones(len(vids), dtype=bool)
                sel = np.lexsort((vids[mask], -s[mask]))[:k]
                for r, j in enumerate(sel, start=1):
                    out_op.append(op)
                    out_q.append(str(qid))
                    out_r.append(r)
                    out_n.append(str(vids[mask][j]))
                    out_s.append(round(float(s[mask][j]), 4))

        q_idx = order[:16]
        topk_into("image_ann", vids[q_idx],
                  fixed_sims(e32[q_idx], e32), k=5, exclude_self=True)
        e64 = e32.astype(np.float64)
        c_idx = order[:16]
        topk_into("caption_to_image", vids[c_idx],
                  fixed_sims(cap_embs[c_idx].astype(np.float64), e64),
                  k=5, exclude_self=False)
    return pa.table(
        {"op": pa.array(out_op, pa.string()),
         "query_id": pa.array(out_q, pa.string()),
         "rank": pa.array(out_r, pa.int64()),
         "neighbor_id": pa.array(out_n, pa.string()),
         "sim": pa.array(out_s, pa.float64())})


# ------------------------------------------------------------------- pages

def n_pages(scale: int) -> int:
    return 40 * scale


def domains_for(scale: int) -> list[str]:
    return [f"d{i:02d}.example.test" for i in range(max(4, scale // 4))]


HOT_DOMAIN_INDEX = 0  # d00 receives ~50% of pages (FIXTURES.md §2)


def page_id(idx: int) -> str:
    return f"p{idx:08d}"


def page_fields(seed: int, idx: int, domains: list[str]) -> tuple[str, str, str]:
    """(domain, kind, url) for page idx — pure, O(1), no table needed."""
    r_dom = _rng(seed, idx, 11)
    if r_dom.random() < 0.5:
        domain = domains[HOT_DOMAIN_INDEX]
    else:
        domain = domains[int(r_dom.integers(0, len(domains)))]
    u = _rng(seed, idx, 12).random()
    kind = "article" if u < 0.6 else ("listing" if u < 0.9 else "resource")
    pid = page_id(idx)
    if kind == "article":
        url = f"https://{domain}/article/{pid}-{100000 + idx}"
    elif kind == "listing":
        url = f"https://{domain}/listing/{pid}"
    else:
        url = f"https://{domain}/resource/{pid}.css"
    return domain, kind, url


def gen_pages(seed: int, scale: int) -> pa.Table:
    n = n_pages(scale)
    domains = domains_for(scale)
    n_img = n_images(scale)
    rows = {
        "url": [], "page_id": [], "domain": [], "kind": [], "outlinks": [],
        "image_refs": [], "valid": [], "status_code": [], "empty_body": [],
    }
    for idx in range(n):
        domain, kind, url = page_fields(seed, idx, domains)
        r_out = _rng(seed, idx, 13)
        k_out = int(r_out.integers(3, 13))
        # power-law-ish target choice: prefer low idx
        targets = [min(n - 1, int(n * (r_out.random() ** 3))) for _ in range(k_out)]
        outlinks = [page_fields(seed, t, domains)[2] for t in targets]
        r_img = _rng(seed, idx, 14)
        image_refs = (
            [image_id(int(i)) for i in r_img.integers(0, n_img, size=int(r_img.integers(1, 4)))]
            if kind == "article"
            else []
        )
        valid = True
        if kind == "article":
            valid = _rng(seed, idx, 15).random() >= 0.05
        s = _rng(seed, idx, 16).random()
        status = 500 if s < 0.02 else (404 if s < 0.03 else 200)
        empty = _rng(seed, idx, 17).random() < 0.01
        rows["url"].append(url)
        rows["page_id"].append(page_id(idx))
        rows["domain"].append(domain)
        rows["kind"].append(kind)
        rows["outlinks"].append(outlinks)
        rows["image_refs"].append(image_refs)
        rows["valid"].append(valid)
        rows["status_code"].append(status)
        rows["empty_body"].append(empty)
    return pa.table(
        {
            "url": pa.array(rows["url"], pa.string()),
            "page_id": pa.array(rows["page_id"], pa.string()),
            "domain": pa.array(rows["domain"], pa.string()),
            "kind": pa.array(rows["kind"], pa.string()),
            "outlinks": pa.array(rows["outlinks"], pa.list_(pa.string())),
            "image_refs": pa.array(rows["image_refs"], pa.list_(pa.string())),
            "valid": pa.array(rows["valid"], pa.bool_()),
            "status_code": pa.array(rows["status_code"], pa.int32()),
            "empty_body": pa.array(rows["empty_body"], pa.bool_()),
        }
    )


# ------------------------------------------------------------ HTML render

def render_page_html(row: dict) -> str:
    """Pure function row → HTML (FIXTURES.md §2)."""
    domain = row["domain"]
    parts = [
        "<html><head>",
        f'<link rel="stylesheet" href="https://{domain}/resource/style.css">',
        "</head><body>",
    ]
    if row["kind"] == "article" and row["valid"]:
        parts.append('<div class="article-body">Article body text.</div>')
    outlinks = list(row["outlinks"])
    for i, link in enumerate(outlinks):
        parts.append(f'<a href="{link}">link {i}</a>')
    if outlinks:  # one duplicate link (exercises per-page set dedup)
        parts.append(f'<a href="{outlinks[0]}">dup</a>')
        # one rel=nofollow link (must be skipped by extraction)
        parts.append(f'<a rel="nofollow" href="{outlinks[-1]}">nf</a>')
    # one non-http link (must be dropped)
    parts.append('<a href="mailto:someone@example.test">mail</a>')
    for img in row["image_refs"]:
        parts.append(f'<img src="https://{domain}/img/{img}.png" alt="{img}">')
    parts.append("</body></html>")
    return "\n".join(parts)


def render_root_html(domain: str, domain_page_urls: list[str], domains: list[str]) -> str:
    parts = ["<html><head></head><body>", '<div class="index">root</div>']
    for d in domains:
        parts.append(f'<a href="https://{d}/">site {d}</a>')
    for u in domain_page_urls[:20]:
        parts.append(f'<a href="{u}">page</a>')
    parts.append("</body></html>")
    return "\n".join(parts)


def robots_disallow(domain: str) -> list[str]:
    """Deterministic robots rules: even-numbered domains disallow /listing/."""
    try:
        num = int(domain.split(".")[0][1:])
    except ValueError:
        return []
    return ["/listing/"] if num % 2 == 0 else []


# ------------------------------------------------------------------ web API

@dataclass
class FetchResponse:
    status_code: int
    html: str
    image_ids: list


class SynthWeb:
    """Resolves URLs against the generated tables — the sandbox 'network'.

    Arrow-backed: the pages table stays columnar (no per-row dict blowup —
    at bench scale a pylist copy costs ~5× the table's memory in every
    fetch actor); per-fetch row access is a handful of `.as_py()` calls.
    """

    def __init__(self, pages: pa.Table, seed: int, scale: int):
        self.seed = seed
        self.scale = scale
        self.domains = domains_for(scale)
        pages = pages.combine_chunks()
        self._cols = {name: pages.column(name) for name in pages.column_names}
        urls = self._cols["url"].to_pylist()
        self._by_url = {u: i for i, u in enumerate(urls)}
        # first ≤20 page urls per domain for the root index pages
        domain_urls: dict[str, list] = {d: [] for d in self.domains}
        for d, u in zip(self._cols["domain"].to_pylist(), urls):
            lst = domain_urls.get(d)
            if lst is not None and len(lst) < 20:
                lst.append(u)
        self._roots = {
            f"https://{d}/": render_root_html(d, domain_urls[d], self.domains)
            for d in self.domains
        }

    @classmethod
    def generate(cls, seed: int, scale: int) -> "SynthWeb":
        return cls(gen_pages(seed, scale), seed, scale)

    def _row(self, i: int) -> dict:
        return {name: col[i].as_py() for name, col in self._cols.items()}

    @property
    def _rows(self):  # test/introspection helper (materializes)
        n = len(self._by_url)
        return [self._row(i) for i in range(n)]

    def fetch(self, url: str) -> FetchResponse:
        # transparent proxy unwrap (RocketscrapeRenderer URL shape): the
        # synthetic network serves the inner url= target — the reference
        # does not url-encode it, so everything after the first "&url="
        # IS the target
        if url.startswith("https://api.rocketscrape.com/"):
            _, _, inner = url.partition("&url=")
            if inner:
                url = inner
        root = self._roots.get(url)
        if root is not None:
            return FetchResponse(200, root, [])
        i = self._by_url.get(url)
        if i is None:
            if url.endswith("/resource/style.css"):
                return FetchResponse(200, "body { margin: 0 }", [])
            return FetchResponse(404, "", [])
        status = self._cols["status_code"][i].as_py()
        if status != 200:
            return FetchResponse(status, "", [])
        if self._cols["empty_body"][i].as_py():
            return FetchResponse(200, "", [])
        row = self._row(i)
        return FetchResponse(200, render_page_html(row), list(row["image_refs"]))


# ------------------------------------------------------------- fixture I/O

DEFAULT_CONFIG = {
    "seeds": ["https://d00.example.test/", "https://d01.example.test/listing/p00000001"],
    "idExtractorPattern": ".*-(?<id>[0-9]+)$",
    "threadCount": 4,
    "maxAttemptCount": 3,
    # `resource` first: first-hit-wins filtering must see the blacklist tag
    # before the whitelisted `internal` tag (SURVEY.md M2/M4 order pinning)
    "tagger": {
        "resource": "isResource(path)",
        "internal": "matches(host, 'd[0-9]+\\.example\\.test')",
        "article": "matches(path, '.*-[0-9]+$')",
    },
    "linkFilter": {"whitelist": ["internal"], "blacklist": ["resource"]},
    "priorities": {"seed": 1000, "article": 900, "other": 10},
    "validationSelectors": {"article": "div.article-body"},
    "storage": {"includedTags": ["article"]},
    "politeness": {"delay_ms": 0, "max_per_domain_per_round": 8},
    "taskKiller": {"timeout": "10m"},
}


def write_fixture(out_dir: str | Path, seed: int = 42, scale: int = 1) -> Path:
    """Materialize images.parquet + pages.parquet + config.json under
    ``out_dir`` (idempotent — skips when the meta file already matches)."""
    import shutil

    out = Path(out_dir)
    meta = out / "meta.json"
    want = {"seed": seed, "scale": scale, "version": 12}
    if meta.exists() and json.loads(meta.read_text()) == want:
        return out
    out.mkdir(parents=True, exist_ok=True)
    # images.parquet is a DIRECTORY of part files: a single parquet file is
    # read by ONE Ray Data task (the whole downstream pipeline serializes
    # behind it — measured 2× wall on the decode bench); sharded parts give
    # the read genuine parallelism and model the partitioned layout a
    # 100 TB ingest would use. Small row groups keep lazy per-row-group
    # loads cheap for fetch actors without the broadcast table.
    imgs, topk = gen_images_and_pacts(seed, scale)
    img_dir = out / "images.parquet"
    if img_dir.exists() and img_dir.is_file():
        img_dir.unlink()
    elif img_dir.exists():
        shutil.rmtree(img_dir)
    img_dir.mkdir()
    n_files = max(1, min(64, len(imgs) // 2048))
    step = -(-len(imgs) // n_files)
    for i, off in enumerate(range(0, len(imgs), step)):
        pq.write_table(imgs.slice(off, step), img_dir / f"part-{i:04d}.parquet",
                       row_group_size=256)
    pq.write_table(gen_pages(seed, scale), out / "pages.parquet")
    # stored-answer pact for the cross-modal brute-force top-k ops (the
    # media-family pattern: build-time replay of the exact op arithmetic,
    # unnested by the SQL oracle)
    pq.write_table(topk, out / "topk.parquet")
    (out / "config.json").write_text(json.dumps(DEFAULT_CONFIG, indent=2))
    meta.write_text(json.dumps(want))
    return out
