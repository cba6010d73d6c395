"""Deterministic synthetic corpus generator (seed=42, no network).

Produces the five input tables from FIXTURES.md as pyarrow tables and
writes them as parquet under a cache dir:

  images  (image_id, bytes, w, h, fmt, caption, phash)   -- BASELINE.json input_hint shape
  pages   (url, host, status, fetch_ms, out_links, image_id, caption, title, body)
  seeds   (seed_id, url, priority)
  robots  (host, disallow, crawl_delay_ms)
  budgets (host, max_requests)

Everything is a pure function of (seed, scale params): the payload
validator re-derives original pixels from image_id alone, which is how
the PSNR-vs-reference invariant is checked without PIL or a second
copy of the data.

Graph shape per FIXTURES.md §2: per-host trees + cross-host edges +
hot-host skew (host 0 owns ~30% of URLs) + fragment/duplicate/relative
link variants to exercise the seen-set semantics of
/root/reference/custom/social.js:103-143.
"""

from __future__ import annotations

import os
import zlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..codec.png import encode, png_decode, png_encode, quantize, resize_indices
from ..codec.phash import phash64

MASTER_SEED = 42

_CAPTION_WORDS = [
    "sunset", "harbor", "café", "montaña", "skyline", "fjord", "garden",
    "naïve", "bridge", "über", "panorama", "mosaic", "lantern", "Straße",
]


def _rng(*parts) -> np.random.Generator:
    """Deterministic per-entity RNG: seed derived from crc32 of the key."""
    key = ":".join(str(p) for p in (MASTER_SEED,) + parts)
    return np.random.default_rng(zlib.crc32(key.encode()) & 0xFFFFFFFF)


@dataclass(frozen=True)
class CorpusParams:
    n_images: int = 100
    n_hosts: int = 8
    n_pages: int = 240
    n_seeds: int = 12
    img_w: int = 32
    img_h: int = 24
    max_links: int = 14
    # deterministic filler words per body: sizes the per-row regex-scan
    # work (the real per-page cost at 100 TB, where bodies are KBs not
    # the ~200B of the tiny fixtures)
    body_filler_words: int = 0

    @property
    def tag(self) -> str:
        return (
            f"i{self.n_images}_h{self.n_hosts}_p{self.n_pages}"
            f"_s{self.n_seeds}_{self.img_w}x{self.img_h}_l{self.max_links}"
            f"_f{self.body_filler_words}"
        )


SMOKE = CorpusParams()
# bench warmup corpus: exercises every engine plan shape (multi-depth
# crawl reaching terminal-depth drain) with minimal rows, so a bench
# leg's warmup run caches codegen/plan-compile in ~1/4 the wall of a
# SMOKE warmup — warmup fidelity needs the PLANS compiled, not data
WARM = CorpusParams(n_images=16, n_hosts=4, n_pages=60, n_seeds=3)
CORRECTNESS = CorpusParams(n_images=5000, n_hosts=24, n_pages=12000, n_seeds=120)
# BENCH v2 (2026-08-18): 450k pages / 90k seeds, up from 300k/60k. The
# sizing rule (BASELINE.md) is that a timed crawl leg must run >= 60s
# wall so per-run fixed costs (driver round-trips, plan compiles,
# snapshot commits — O(seconds), invariant in data size) stay amortized
# the way they are at the 10^10-URL target scale; the engine speedups
# of this date pushed the local[4] leg on the 300k corpus to ~55s,
# under the floor. Numbers measured on the v1 corpus are marked in
# BENCH.md and are not directly comparable.
BENCH = CorpusParams(
    n_images=30000,
    n_hosts=64,
    n_pages=450000,
    n_seeds=90000,
    img_w=48,
    img_h=32,
    max_links=20,
    body_filler_words=300,
)


# ------------------------------------------------------------------- images


def image_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic gradient+noise pixels for an image_id (original,
    pre-quantization pixels — the 'reference payload')."""
    rng = _rng("img", image_id)
    gx = np.linspace(0, 255, w)
    gy = np.linspace(0, 255, h)
    base = (gy[:, None] * 0.5 + gx[None, :] * 0.5)
    phase = rng.uniform(0, 2 * np.pi, size=3)
    freq = rng.uniform(0.05, 0.3, size=3)
    chans = [
        base * rng.uniform(0.4, 1.0)
        + 40 * np.sin(freq[c] * (gy[:, None] + gx[None, :]) + phase[c])
        + rng.normal(0, 6, size=(h, w))
        for c in range(3)
    ]
    return np.clip(np.stack(chans, axis=-1), 0, 255).astype(np.uint8)


def _caption(image_id: str) -> str:
    rng = _rng("cap", image_id)
    k = int(rng.integers(3, 7))
    words = [
        _CAPTION_WORDS[int(i)] for i in rng.integers(0, len(_CAPTION_WORDS), size=k)
    ]
    # exercise the ' · ' and ' - ' split ops (google_scraper.js:359; bing_scraper.js:634)
    sep = " · " if rng.random() < 0.5 else " - "
    return sep.join([" ".join(words[: k // 2 + 1]), " ".join(words[k // 2 + 1 :]) or "view"])


def _img_fmt(i: int) -> str:
    """The ONE fmt rule (qpng every 3rd image) both gen_images and the
    expected-value sidecar derive from — no hand-synchronized copies."""
    return "qpng" if i % 3 == 0 else "png"


def gen_images(p: CorpusParams) -> pa.Table:
    ids, blobs, ws, hs, fmts, captions, phashes = [], [], [], [], [], [], []
    for i in range(p.n_images):
        image_id = f"img_{i:08d}"
        pix = image_pixels(image_id, p.img_w, p.img_h)
        fmt = _img_fmt(i)
        stored = quantize(pix) if fmt == "qpng" else pix
        ids.append(image_id)
        blobs.append(encode(pix, fmt))
        ws.append(p.img_w)
        hs.append(p.img_h)
        fmts.append(fmt)
        captions.append(_caption(image_id))
        phashes.append(phash64(stored))
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
            "caption": pa.array(captions, pa.string()),
            "phash": pa.array(phashes, pa.int64()),
        }
    )


def gen_image_expected(p: CorpusParams) -> pa.Table:
    """Driver-side expected outputs for the multimodal operators,
    computed from the GENERATOR's pixel arrays (never through the PNG
    bytes): per-channel means / gray std / phash of the stored pixels,
    the phash of the 16x12 nearest-neighbor resize, and the single
    stub-frame phash. The Spark ops re-derive all of these on
    executors by DECODING the stored payload bytes, so a DuckDB twin
    over this sidecar turns the three formerly rows-only multimodal
    queries into full value-hash checks of codec round-trip + math.
    Shares gen_images' fmt rule (_img_fmt) and the resize index math
    (codec.png.resize_indices, the same helper the resize operator
    calls) so the ground truth cannot drift from the code it
    validates."""
    out: dict[str, list] = {
        k: []
        for k in (
            "image_id", "mean_r_x1000", "mean_g_x1000", "mean_b_x1000",
            "std_gray_x1000", "phash", "resized_phash", "frame_phash", "w", "h",
        )
    }
    for i in range(p.n_images):
        image_id = f"img_{i:08d}"
        pix = image_pixels(image_id, p.img_w, p.img_h)
        stored = quantize(pix) if _img_fmt(i) == "qpng" else pix
        pxf = stored.astype(np.float64)
        means = pxf.mean(axis=(0, 1))
        gray = pxf.mean(axis=2)
        ys, xs = resize_indices(stored.shape[0], stored.shape[1], 12, 16)
        small = stored[ys][:, xs]
        out["image_id"].append(image_id)
        out["mean_r_x1000"].append(int(round(means[0] * 1000)))
        out["mean_g_x1000"].append(int(round(means[1] * 1000)))
        out["mean_b_x1000"].append(int(round(means[2] * 1000)))
        out["std_gray_x1000"].append(int(round(gray.std() * 1000)))
        out["phash"].append(phash64(stored))
        out["resized_phash"].append(phash64(small))
        out["frame_phash"].append(phash64(stored))  # 1-frame stub clip
        out["w"].append(p.img_w)
        out["h"].append(p.img_h)
    return pa.table(
        {
            "image_id": pa.array(out["image_id"], pa.string()),
            "mean_r_x1000": pa.array(out["mean_r_x1000"], pa.int64()),
            "mean_g_x1000": pa.array(out["mean_g_x1000"], pa.int64()),
            "mean_b_x1000": pa.array(out["mean_b_x1000"], pa.int64()),
            "std_gray_x1000": pa.array(out["std_gray_x1000"], pa.int64()),
            "phash": pa.array(out["phash"], pa.int64()),
            "resized_phash": pa.array(out["resized_phash"], pa.int64()),
            "frame_phash": pa.array(out["frame_phash"], pa.int64()),
            "w": pa.array(out["w"], pa.int32()),
            "h": pa.array(out["h"], pa.int32()),
        }
    )


# Sidecar files carry a VERSION in the name: bump it whenever the
# generating formulas change, or an existing cache would silently serve
# stale expected values (the main corpus marker solves this with its
# .done2 bump; sidecars need the same discipline). Writes are atomic
# (tmp + rename) so an interrupted run can never leave a truncated
# parquet that os.path.exists would treat as complete.
_SIDECAR_VER = "v2"


def _write_sidecar_atomic(table: pa.Table, path: str, **kw) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp, **kw)
    os.replace(tmp, path)


def ensure_image_expected(p: CorpusParams) -> str:
    """Additive sidecar next to the cached corpus (does not touch the
    main generation marker, so existing caches stay valid)."""
    path = os.path.join(
        default_cache_dir(p), f"image_expected_{_SIDECAR_VER}.parquet"
    )
    if not os.path.exists(path):
        _write_sidecar_atomic(gen_image_expected(p), path, row_group_size=4096)
    return path


def ensure_screenshot_expected(p: CorpusParams) -> str:
    """Expected sink_screenshot output per page URL, rendered
    driver-side (base64 of the 16x12 deterministic-pixel PNG). The
    Spark query renders the same URLs on EXECUTORS through the
    mapInPandas path, so a DuckDB twin over this sidecar pins the
    distributed encode byte-for-byte (zlib output is deterministic for
    a fixed library — same interpreter on driver and executors)."""
    import base64

    path = os.path.join(
        default_cache_dir(p), f"screenshot_expected_{_SIDECAR_VER}.parquet"
    )
    if not os.path.exists(path):
        pages = pq.read_table(ensure_corpus(p)["pages"], columns=["url"])
        urls = pages["url"].to_pylist()
        shots = [
            base64.b64encode(png_encode(image_pixels(u, 16, 12))).decode("ascii")
            for u in urls
        ]
        _write_sidecar_atomic(
            pa.table(
                {
                    "url": pa.array(urls, pa.string()),
                    "screen_base64": pa.array(shots, pa.string()),
                }
            ),
            path,
            row_group_size=4096,
        )
    return path


def gen_robots_txt(p: CorpusParams) -> pa.Table:
    """Raw robots.txt TEXT per host, rendered from the SAME rng stream
    gen_robots draws its structured rules from — so parsing the text
    must reproduce the structured table exactly (the tie
    tests/test_robots_txt.py pins). Formatting exercises the parser:
    comments, blank group separators, mixed-case field names, a
    fractional Crawl-delay in seconds, and (sometimes) a second
    user-agent group plus a Sitemap line the parser must not trip on."""
    hosts = [f"h{i}.example.com" for i in range(p.n_hosts)]
    texts = []
    for h in hosts:
        rng, d, delay_ms = _robots_rules(h)
        lines = [f"# robots for {h}", "User-Agent: *"]
        lines += [f"Disallow: {path}" for path in d]
        lines.append(f"Crawl-delay: {delay_ms / 1000:.3f}")
        # continue the same deterministic stream for the extras
        if rng.random() < 0.4:
            lines += ["", "user-agent: badbot", "disallow: /"]
        if rng.random() < 0.3:
            lines.append(f"Sitemap: http://{h}/sitemap.xml")
        texts.append("\n".join(lines) + "\n")
    return pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "robots_txt": pa.array(texts, pa.string()),
        }
    )


def _robots_rules(h: str):
    """The ONE rng-drawing function both the structured robots table
    (gen_robots) and the rendered robots.txt (gen_robots_txt) derive
    from — the two outputs stay in RNG lock-step structurally, not by
    hand-synchronized copies. Returns (rng, disallow, delay_ms); the
    rng is handed back so gen_robots_txt can continue the SAME stream
    for its formatting extras."""
    rng = _rng("robots", h)
    d = []
    if rng.random() < 0.5:
        d.append(f"/p{int(rng.integers(0, 9))}")
    if rng.random() < 0.2:
        d.append("/admin")
    delay_ms = int(rng.integers(0, 200))
    return rng, d, delay_ms


def ensure_robots_txt(p: CorpusParams) -> str:
    path = os.path.join(
        default_cache_dir(p), f"robots_txt_{_SIDECAR_VER}.parquet"
    )
    if not os.path.exists(path):
        _write_sidecar_atomic(gen_robots_txt(p), path)
    return path


def gen_warc_shards(p: CorpusParams, per_shard: int = 16) -> pa.Table:
    """WARC/1.0 shard text rendered from the page store — the archive
    format a real 100 TB crawl ingest reads (Common Crawl ships WARC).
    Each shard concatenates `per_shard` response records:

        WARC/1.0
        <headers incl. Content-Length: N>
        <blank line>
        <payload>
        <blank line>

    Corpus bodies contain no newlines (gen_pages joins body_bits with
    spaces), so the payload is exactly one line and the declared
    Content-Length slices it precisely. ~1/31 of records (url-hash
    bucket) store a payload 3 chars SHORTER than declared — a truncated
    record the parser must flag as malformed rather than mis-slice."""
    pages = pq.read_table(ensure_corpus(p)["pages"], columns=["url", "body"])
    shards: dict[int, list[str]] = {}
    for i, (u, b) in enumerate(
        zip(pages["url"].to_pylist(), pages["body"].to_pylist())
    ):
        b = b or ""
        if "\n" in b or "WARC/1.0" in b:
            # raise (not assert): this runs at catalog import via
            # ensure_warc, and asserts vanish under python -O — a corpus
            # change that breaks the one-line-payload invariant must
            # fail loudly with a pointer at the offending page
            raise ValueError(
                f"gen_warc_shards: page body for {u!r} violates the "
                "single-line / no-'WARC/1.0' invariant (Content-Length "
                "slicing assumes one-line payloads); escape or rework "
                "the corpus change that introduced it"
            )
        h = zlib.crc32(f"warc:{u}".encode()) & 0xFFFFFFFF
        declared = len(b)
        stored = b[:-3] if (h % 31 == 0 and len(b) > 3) else b
        rec = (
            "WARC/1.0\n"
            "WARC-Type: response\n"
            f"WARC-Target-URI: {u}\n"
            f"WARC-Date: 2026-07-{1 + h % 28:02d}T00:00:00Z\n"
            f"WARC-Record-ID: <urn:crc32:{h:08x}>\n"
            "Content-Type: application/http; msgtype=response\n"
            f"Content-Length: {declared}\n"
            "\n"
            f"{stored}\n\n"
        )
        shards.setdefault(i // per_shard, []).append(rec)
    ids = sorted(shards)
    return pa.table(
        {
            "shard_id": pa.array(ids, pa.int32()),
            "warc_text": pa.array(["".join(shards[i]) for i in ids], pa.string()),
        }
    )


def ensure_warc(p: CorpusParams) -> str:
    path = os.path.join(default_cache_dir(p), f"warc_{_SIDECAR_VER}.parquet")
    if not os.path.exists(path):
        _write_sidecar_atomic(gen_warc_shards(p), path)
    return path


def gen_sitemaps(p: CorpusParams, per_host: int = 20) -> pa.Table:
    """sitemap.xml text per host (sitemaps.org protocol) listing up to
    `per_host` of the host's page URLs in sorted order. lastmod and
    priority are OPTIONAL per entry (url-hash buckets omit ~1/5 and
    ~1/7 respectively) so the parser's null handling is exercised; all
    values derive from the url hash, never an RNG, so re-generation is
    order-independent."""
    pages = pq.read_table(ensure_corpus(p)["pages"], columns=["url", "host"])
    by_host: dict[str, list[str]] = {}
    for u, h in zip(pages["url"].to_pylist(), pages["host"].to_pylist()):
        by_host.setdefault(h, []).append(u)
    hosts, xmls = [], []
    for h in sorted(by_host):
        entries = []
        for u in sorted(by_host[h])[:per_host]:
            hh = zlib.crc32(f"sm:{u}".encode()) & 0xFFFFFFFF
            e = f"<loc>{u}</loc>"
            if hh % 5 != 0:
                e += f"<lastmod>2026-06-{1 + hh % 28:02d}</lastmod>"
            if hh % 7 != 0:
                e += f"<priority>0.{1 + hh % 9}</priority>"
            entries.append(f"  <url>{e}</url>")
        xmls.append(
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
            + "\n".join(entries)
            + "\n</urlset>\n"
        )
        hosts.append(h)
    return pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "sitemap_xml": pa.array(xmls, pa.string()),
        }
    )


def ensure_sitemaps(p: CorpusParams) -> str:
    path = os.path.join(default_cache_dir(p), f"sitemaps_{_SIDECAR_VER}.parquet")
    if not os.path.exists(path):
        _write_sidecar_atomic(gen_sitemaps(p), path)
    return path


# -------------------------------------------------------------------- pages


def _host_sizes(p: CorpusParams) -> list[int]:
    """Host 0 is the hot host with ~30% of all pages (skew fixture)."""
    if p.n_hosts == 1:
        return [p.n_pages]  # single-host experiment: no split arithmetic
    hot = max(1, int(p.n_pages * 0.3))
    rest = p.n_pages - hot
    base = [rest // (p.n_hosts - 1)] * (p.n_hosts - 1)
    for i in range(rest - sum(base)):
        base[i % len(base)] += 1
    return [hot] + base


_FILLER_WORDS = [
    "crawl", "frontier", "schedule", "politeness", "budget", "render", "fetch",
    "anchor", "snippet", "caption", "thumbnail", "viewport", "lorem", "ipsum",
    "dolor", "amet", "sed", "tempor", "archive", "sitemap", "header", "footer",
    # regex near-misses: tokens the entity families must NOT match
    "twitter", "github", "instagram.example", "facebook-page", "mail@",
    "@corp", "http://", "www.", "49-30", "(555", "intent", "share.php",
]


def _entity_snippets(rng: np.random.Generator, gi: int) -> list[str]:
    """Body fragments matching (and near-missing) the six regex families
    of social.js:145-222."""
    out = []
    if rng.random() < 0.5:
        out.append(f"contact us at user{gi % 97}@mail{gi % 13}.example.com today")
    if rng.random() < 0.3:
        out.append(f"or sales{gi % 31}@corp.example.org.")
    if rng.random() < 0.35:
        out.append(f"call +49 30 12 345 678 90 now")
    if rng.random() < 0.35:
        out.append(f"tel (555) 123-{4000 + gi % 999}")
    if rng.random() < 0.4:
        out.append(f"follow https://twitter.com/user_{gi % 53}")
    if rng.random() < 0.2:
        out.append("https://twitter.com/intent/tweet?text=no")  # excluded by regex
    if rng.random() < 0.4:
        out.append(f"code at https://github.com/dev-{gi % 41}")
    if rng.random() < 0.35:
        out.append(f"pics https://www.instagram.com/insta{gi % 29}")
    if rng.random() < 0.2:
        out.append("https://instagram.com/p/ABC123")  # excluded (?!p/)
    if rng.random() < 0.35:
        out.append(f"https://facebook.com/page.{gi % 37}/")
    if rng.random() < 0.2:
        out.append("https://facebook.com/share.php?u=x")  # excluded (?!share.php)
    return out


def gen_pages(p: CorpusParams) -> pa.Table:
    sizes = _host_sizes(p)
    hosts = [f"h{i}.example.com" for i in range(p.n_hosts)]
    urls: list[str] = []
    url_host: list[str] = []
    for hi, n in enumerate(sizes):
        for j in range(n):
            urls.append(f"http://{hosts[hi]}/p{j}")
            url_host.append(hosts[hi])

    statuses, fetch_ms, out_links, image_ids, captions, titles, bodies = (
        [], [], [], [], [], [], [],
    )
    # precompute captions for linked images lazily
    host_page_count = dict(zip(hosts, sizes))
    for gi, (url, host) in enumerate(zip(urls, url_host)):
        rng = _rng("page", url)
        r = rng.random()
        status = "ok" if r < 0.90 else ("partial" if r < 0.94 else ("error" if r < 0.98 else "blocked"))
        statuses.append(status)
        fetch_ms.append(int(rng.integers(20, 500)))

        n_here = host_page_count[host]
        k = int(rng.integers(2, p.max_links + 1))
        links: list[str] = []
        for _ in range(k):
            t = rng.random()
            tgt = int(rng.integers(0, n_here))
            if t < 0.45:
                links.append(f"/p{tgt}")  # root-relative, same host
            elif t < 0.65:
                links.append(f"http://{host}/p{tgt}")  # absolute, same host
            elif t < 0.75:
                links.append(f"/p{tgt}#s{int(rng.integers(1, 4))}")  # fragment variant
            elif t < 0.90:
                oh = hosts[int(rng.integers(0, p.n_hosts))]
                if host_page_count[oh] > 0:
                    links.append(f"http://{oh}/p{int(rng.integers(0, host_page_count[oh]))}")  # cross-host
                else:
                    # page-less host (tiny params): a dropped empty link —
                    # no extra rng draw, so populated-host corpora are
                    # byte-identical to before this guard
                    links.append("")
            elif t < 0.95:
                links.append("mailto:someone@example.com")  # unparseable for resolver
            else:
                links.append("")  # dropped by getLinks href-nonempty gate
        # guaranteed duplicates to exercise first-occurrence dedup
        # (social.js:127) — k >= 2 always, so no guard needed
        links.append(links[0])
        links.append(links[1])
        out_links.append(links)

        if rng.random() < 0.6 and p.n_images > 0:
            img = f"img_{int(rng.integers(0, p.n_images)):08d}"
        else:
            img = None
        image_ids.append(img)
        captions.append(_caption(img) if img else None)
        titles.append(f"  Page {host}/p{gi % n_here} — {_CAPTION_WORDS[gi % len(_CAPTION_WORDS)]}  ")
        body_bits = [f"<html><title>{titles[-1]}</title><body>Lorem ipsum {gi} on {host}."]
        body_bits += _entity_snippets(rng, gi)
        if p.body_filler_words:
            # deterministic prose filler with regex near-misses mixed in —
            # scales the per-page scan work without adding entity matches
            idx = rng.integers(0, len(_FILLER_WORDS), size=p.body_filler_words)
            body_bits.append(" ".join(_FILLER_WORDS[i] for i in idx))
        body_bits.append("</body></html>")
        bodies.append(" ".join(body_bits))

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "host": pa.array(url_host, pa.string()),
            "status": pa.array(statuses, pa.string()),
            "fetch_ms": pa.array(fetch_ms, pa.int32()),
            "out_links": pa.array(out_links, pa.list_(pa.string())),
            "image_id": pa.array(image_ids, pa.string()),
            "caption": pa.array(captions, pa.string()),
            "title": pa.array(titles, pa.string()),
            "body": pa.array(bodies, pa.string()),
        }
    )


# ------------------------------------------------------- seeds/robots/budgets


def gen_seeds(p: CorpusParams, pages: pa.Table) -> pa.Table:
    urls = pages.column("url").to_pylist()
    rng = _rng("seeds")
    want = p.n_seeds - 1
    chosen_set = set(int(i) for i in rng.integers(0, len(urls), size=p.n_seeds * 2))
    # top-up ONLY when the initial draw fell short of n_seeds-1 unique
    # indices (n_seeds close to n_pages): the shipped params never
    # trigger this, so their corpora stay byte-identical; without it
    # the seeds table silently held fewer rows than n_seeds
    while len(chosen_set) < min(want, len(urls)):
        chosen_set.update(int(i) for i in rng.integers(0, len(urls), size=p.n_seeds))
    chosen = sorted(chosen_set)[:want]
    seed_urls = [urls[i] for i in chosen]
    seed_urls.append("not a valid url")  # invalid-seed path (social.js:34-40)
    return pa.table(
        {
            "seed_id": pa.array(range(len(seed_urls)), pa.int64()),
            "url": pa.array(seed_urls, pa.string()),
            "priority": pa.array(
                [round(float(x), 3) for x in _rng("prio").uniform(0, 1, len(seed_urls))],
                pa.float64(),
            ),
        }
    )


def gen_robots(p: CorpusParams) -> pa.Table:
    hosts = [f"h{i}.example.com" for i in range(p.n_hosts)]
    dis, delays = [], []
    for h in hosts:
        _rng_unused, d, delay_ms = _robots_rules(h)
        dis.append(d)
        delays.append(delay_ms)
    return pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "disallow": pa.array(dis, pa.list_(pa.string())),
            "crawl_delay_ms": pa.array(delays, pa.int32()),
        }
    )


def gen_budgets(p: CorpusParams) -> pa.Table:
    hosts = [f"h{i}.example.com" for i in range(p.n_hosts)]
    vals = [int(_rng("budget", h).integers(0, 9)) for h in hosts]
    return pa.table(
        {"host": pa.array(hosts, pa.string()), "max_requests": pa.array(vals, pa.int32())}
    )


# ------------------------------------------------------------------ assembly


def generate(p: CorpusParams, out_dir: str) -> dict[str, str]:
    """Generate all five tables under out_dir (idempotent via tag marker).
    Returns {table_name: parquet_path}."""
    os.makedirs(out_dir, exist_ok=True)
    # marker generation bumped to v2 when row_group_size was added: a
    # pyarrow-default single row group (1M rows) makes a 234MB
    # pages.parquet UNSPLITTABLE — Spark's maxPartitionBytes yields N
    # splits but every row lives in the split holding the single
    # group's midpoint, so one task scans the whole file serially.
    # Small groups (~10MB) are what a real 100TB ingest would write.
    marker = os.path.join(out_dir, f".done2_{p.tag}")
    paths = {
        name: os.path.join(out_dir, f"{name}.parquet")
        for name in ("images", "pages", "seeds", "robots", "budgets")
    }
    if os.path.exists(marker):
        return paths
    images = gen_images(p)
    pages = gen_pages(p)
    pq.write_table(images, paths["images"], row_group_size=4096)
    pq.write_table(pages, paths["pages"], row_group_size=16384)
    pq.write_table(gen_seeds(p, pages), paths["seeds"], row_group_size=65536)
    pq.write_table(gen_robots(p), paths["robots"])
    pq.write_table(gen_budgets(p), paths["budgets"])
    with open(marker, "w") as f:
        f.write(p.tag)
    return paths


def cache_base() -> str:
    """$SPARK_GRAFT_CACHE > repo-root .cache > tmpdir. The repo-root
    probe must survive zip import (spark-submit --py-files puts this
    module INSIDE dist/scrapeulous_spark.zip, where dirname(__file__)
    is not a real directory). Shared by every on-disk cache (corpus,
    bucketed tables)."""
    base = os.environ.get("SPARK_GRAFT_CACHE")
    if base is None:
        repo = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        if os.path.isdir(repo):
            base = os.path.join(repo, ".cache")
        else:
            import tempfile

            base = os.path.join(tempfile.gettempdir(), "scrapeulous_cache")
    return base


def default_cache_dir(p: CorpusParams) -> str:
    return os.path.join(cache_base(), "corpus", p.tag)


def ensure_corpus(p: CorpusParams) -> dict[str, str]:
    return generate(p, default_cache_dir(p))
