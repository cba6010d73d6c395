"""Deterministic synthetic SERP page store (seed-free: pure index math).

One parquet table `serps(url, engine, keyword, page_num, body)` whose
`body` is SERP-shaped markup for the six page families the reference
extracts from:

  google        serp/google_scraper.js   (organic, ads, local map,
                                          places, related, search info)
  bing          serp/bing_scraper.js     (organic, ads, shopping,
                                          places A+B, questions,
                                          pagination, videos, info)
  amazon        serp/amazon.js
  nytimes       custom/nytimes.js
  revimg_google custom/reverse_image_google_final.js
  revimg_bing   custom/reverse_image_bing.js

The markup is simplified (flat, single-line, regex-parsable — class
names kept from the reference selectors) but the FIELD STRUCTURE and
failure modes are the reference's: blocks with missing titles/snippets/
hrefs to exercise each extractor's admission filter and rank
convention (§1.4.4), ' - ' / ' · ' splits with 1/2/3-part arity,
error-string fallback triggers, set-dedup'd extensions, %-encoded
image URL params. Variants are chosen by modular arithmetic on block
indices so every variant appears at every corpus size.

The 18 proj_* catalog queries (operators/catalog_serp.py) parse these
bodies with JVM-side regexp; their DuckDB twins parse the SAME parquet
with DuckDB regexp — the page payload, not a constructed column, is
the input on both sides.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq

_W = [
    "alpha", "bravo", "cedar", "delta", "ember", "falcon", "garnet",
    "harbor", "indigo", "juniper", "krypton", "lumen", "meadow",
    "nectar", "onyx", "prism",
]


def _w(i: int) -> str:
    return _W[i % len(_W)]


# fixed stand-ins for the service-option base64 blobs the reference
# compares against (google_scraper.js:386-391)
POS_SRC = "data:image/png;base64,POSITIVE"
NEG_SRC = "data:image/png;base64,NEGATIVE"

# deterministic %-encoding used in reverse-image hrefs; the decode is
# the same replace chain in Spark and DuckDB (decodeURIComponent
# stand-in for the three chars the corpus actually encodes)
_ENC = [("%", "%25"), (":", "%3A"), ("/", "%2F"), (" ", "%20")]


def url_encode_fixed(s: str) -> str:
    for ch, esc in _ENC:
        s = s.replace(ch, esc)
    return s


# -------------------------------------------------- markup variance (v2)
#
# Round-2 verdict #3: the v1 corpus was flat, single-line and
# fixed-attribute-order, so the regexp parsers matched it by
# construction. v2 stresses the three real-DOM variance classes the
# reference's querySelector-based extractors are naturally immune to
# (google_scraper.js:123 parses arbitrary browser DOM):
#
#   W — whitespace-only text nodes (spaces/tabs/NEWLINES) injected
#       between adjacent tags at '><' junctions;
#   A — attribute order permuted on every multi-attribute tag
#       (serializers don't guarantee order);
#   N — benign inline formatting tags (<em>/<b>/<strong>) nested
#       inside text the reference reads via innerText, which flattens
#       them;
#   E — href attribute values entity-encode '&' as '&amp;' (every DOM
#       serializer does; the reference reads DECODED values via
#       getAttribute/el.href).
#
# The parsers handle W and N with ONE canonicalization pre-pass
# (collapse '>\s+<' junctions, strip inline formatting tags — the
# regex twin of innerText flattening) applied identically on the
# Spark, DuckDB and serial-oracle sides, and A with order-insensitive
# two-stage tag extraction (match the tag by its distinguishing
# class/attribute anywhere, then pull the wanted attribute out of the
# matched tag text).

# "" entries leave the junction untouched so both varied and unvaried
# junctions appear on every page
_WS_CYCLE = ["", " ", "\n", "", "  ", "\n  ", "", "\t", "\n\t", ""]

# markup version active during generation: 1 = unvaried baseline (the
# variance helpers no-op), 2 = full W/A/N variance. Set by gen_serps
# from SerpParams.markup_version; tests generate BOTH and assert every
# extractor returns identical results on each (variance invisibility).
_ACTIVE = {"v": 2}


_HREF_RE = re.compile(r'href="[^"]*"')
_ATTR_RE = re.compile(r'([a-zA-Z][\w-]*)="([^"]*)"')
_TAG_RE = re.compile(r"<[^>]*>")


def encode_href_entities(html: str) -> str:
    """E class: a DOM serializer always writes '&' inside attribute
    values as '&amp;' (page.content() returns serialized HTML; the
    reference reads DECODED values via getAttribute/el.href,
    google_scraper.js:148, :174). Applied to every href value; parsers
    must decode at attribute extraction (catalog_serp._adec).

    Asymmetry guard (round-3 ADVICE): ONLY href values are encoded,
    and correspondingly only href reads decode. If a future vocab/
    template edit put a '&' into any OTHER attribute value the parsers
    read (data-rw, data-arwt, data-iurl, src, aria-label, ...), the
    serialized page would diverge from the reference's decoded
    getAttribute semantics silently — so generation fails loudly on
    that instead.  The guard scans only inside tag spans ('<...>'),
    so attribute-shaped substrings in visible TEXT content (e.g. the
    literal snippet text foo="a&b") cannot false-positive it
    (round-4 ADVICE, serp_corpus.py:128)."""
    html = _HREF_RE.sub(lambda m: m.group(0).replace("&", "&amp;"), html)
    for tag in _TAG_RE.finditer(html):
        for m in _ATTR_RE.finditer(tag.group(0)):
            if m.group(1).lower() != "href" and "&" in m.group(2):
                raise ValueError(
                    "serp corpus generator: '&' in non-href attribute "
                    f'{m.group(1)}="{m.group(2)}" — either extend entity '
                    "encoding+decoding to this attribute symmetrically or "
                    "keep '&' out of its vocab"
                )
    return html


def vary_junctions(html: str, j0: int) -> str:
    """Deterministically inject whitespace-only text nodes between
    adjacent tags (every '><' junction), cycling through the variant
    table from offset j0 — plus the E-class href entity encoding
    (this is the one assembly hook every family body passes through)."""
    if _ACTIVE["v"] < 2:
        return html
    html = encode_href_entities(html)
    parts = html.split("><")
    out = [parts[0]]
    for k, part in enumerate(parts[1:]):
        out.append(">" + _WS_CYCLE[(j0 + k) % len(_WS_CYCLE)] + "<")
        out.append(part)
    return "".join(out)


def rot_attrs(j: int, *attrs: str) -> str:
    """Attribute list rotated by j (empty entries dropped) — the
    attribute-order permutation a DOM serializer is allowed to make."""
    a = [x for x in attrs if x]
    if not a:
        return ""
    r = j % len(a) if _ACTIVE["v"] >= 2 else 0
    return " ".join(a[r:] + a[:r])


def inline_wrap(text: str, j: int) -> str:
    """Nest a benign inline formatting tag inside a text node the
    reference reads via innerText (which flattens nesting): wrap one
    word in <em>/<strong>, or the whole text in <b>, or leave as-is —
    chosen deterministically by j. Whitespace is never altered, so
    canonicalization recovers the exact original text."""
    if _ACTIVE["v"] < 2 or not text.strip():
        return text
    m = j % 4
    if m == 3:
        return text
    words = text.split(" ")
    if m == 1 or len(words) < 2:
        return f"<b>{text}</b>"
    tag = "em" if m == 0 else "strong"
    k = (j // 4) % len(words)
    if words[k] == "":
        return text
    words[k] = f"<{tag}>{words[k]}</{tag}>"
    return " ".join(words)


# the canonicalization pre-pass, shared verbatim by all three engines:
# 1. collapse whitespace-only text nodes between tags (W), restoring
#    single-line bodies so '.'-based block patterns stay valid;
# 2. unwrap bare matched inline-formatting pairs (N) — the regex twin
#    of innerText flattening. ONLY attributeless <em>/<strong>/<b>
#    pairs unwrap (the exact shape inline_wrap injects); tags carrying
#    attributes (amazon's '<em aria-label=...>', '<i class="a-icon-
#    prime">') are structural markup and must survive.
# Order matters: junction collapse first, so whitespace injected
# around an inline tag disappears before the tag itself does.
# (RE2 has no backreferences, so the three pairs are spelled out.)
INLINE_PAIR_RES = [
    (r"<em>([^<]*)</em>", 1),
    (r"<strong>([^<]*)</strong>", 1),
    (r"<b>([^<]*)</b>", 1),
]
JUNCTION_WS_RE = r">\s+<"


def canon_py(html: str) -> str:
    """Python twin of the canonicalization (serial oracle + tests)."""
    html = re.sub(JUNCTION_WS_RE, "><", html)
    for pat, _g in INLINE_PAIR_RES:
        html = re.sub(pat, r"\1", html)
    return html


@dataclass(frozen=True)
class SerpParams:
    n_kw: int = 4          # keywords per google/bing family
    pages_per_kw: int = 3  # SERP pages (page_num) per keyword
    n_single: int = 4      # pages per single-page family (amazon/nyt/revimg)
    markup_version: int = 2  # v2: W/A/N markup variance (see above)
    # generator revision: bump on ANY content change so cached corpora
    # (keyed by tag) regenerate; r2 = organic m==0 links target the
    # crawl corpus URL space; r3 = E-class href entity encoding
    gen_rev: int = 3

    @property
    def tag(self) -> str:
        return (
            f"serp_k{self.n_kw}_p{self.pages_per_kw}_s{self.n_single}"
            f"_v{self.markup_version}r{self.gen_rev}"
        )


SMOKE = SerpParams()


# ------------------------------------------------------------- google


def _google_organic(i: int, gi: int) -> str:
    m = (gi + i) % 7
    title = f"{_w(gi + i)} {_w(i + 3)} result {i}"
    if m == 0:
        # this admitted variant's link lands INSIDE the crawl corpus's
        # URL space (sources/corpus.py gen_pages: http://h{0..7}
        # .example.com/p{0..29} at SMOKE scale) so the SERP->crawl
        # lifecycle query (pipeline_serp_crawl_lifecycle) seeds a real
        # fetchable frontier from organic results — google_scraper.js
        # output feeding social.js input as one run
        link = f"http://h{(gi + i) % 8}.example.com/p{(gi * 7 + i) % 30}"
        disp = f"h{(gi + i) % 8}.example.com › p{(gi * 7 + i) % 30}"
    else:
        link = f"https://site{(gi + i) % 37}.example.org/a{i}"
        disp = f"site{(gi + i) % 37}.example.org › a{i}"
    snippet = f"Snippet {_w(i + gi)} number {i} with details."
    if m == 3:
        title = ""  # admission: title falsy -> dropped (js:204)
    title_html = inline_wrap(title, gi * 7 + i)  # N variance: innerText nesting
    anchor = (
        f'<a href="{link}"><h3>{title_html}</h3></a>' if m != 4
        else f"<a><h3>{title_html}</h3></a>"  # no href -> link null
    )
    if m == 1:
        st = ""  # no span.st -> snippet null -> dropped
    elif m == 2:
        st = '<span class="st">   </span>'  # whitespace -> trim -> dropped
    elif m == 5:
        # date node inside snippet (js:152-158): date captured, text removed
        st = f'<span class="st"><span class="f">Jun {1 + i % 28}, 2020 - </span>{inline_wrap(snippet, gi + 3 * i)}</span>'
    else:
        st = f'<span class="st">{inline_wrap(snippet, gi + 3 * i)}</span>'
    sitelinks = ""
    if m == 6:
        sl = "".join(
            "<a "
            + rot_attrs(i + k, 'class="fl"', f'href="{link}/s{k}"')
            + f">SL {_w(i + k)}</a>"
            for k in range(2)
        )
        sitelinks = f'<span class="osl">{sl}</span>'
    # block delimiter rule: the ONLY </div> in a .g block is its own close
    return (
        f'<div class="g"><span class="r">{anchor}<cite>{disp}</cite></span>'
        f"{st}{sitelinks}</div>"
    )


def _google_ad(i: int, gi: int, block: str) -> str:
    m = (gi + 2 * i) % 5
    title = f"Ad {_w(gi + i)} {i}"
    link = f"https://ad{(gi + i) % 23}.example.net/c{i}"
    track = f"https://track.example.net/rw?i={gi}{i}"
    disp = f"www.ad{(gi + i) % 23}.example.net"
    desc = f"Buy {_w(i)} now, offer {i}."
    heading = (
        f'<div role="heading">{inline_wrap(title, gi + 5 * i)}</div>' if m != 1 else ""
    )
    vis = f'<div class="vis"><span>Ad</span><span>{disp}</span></div>' if m != 2 else ""
    dd = f'<div class="desc">{desc}</div>' if m != 3 else ""
    sl = ""
    if m == 4:
        links = "".join(
            "<a "
            + rot_attrs(
                i + k, f'data-arwt="https://t.example.net/{k}"', f'href="{link}/s{k}"'
            )
            + f">Site {_w(k + i)}</a>"
            for k in range(2)
        )
        sl = f'<div role="list">{links}</div>'
    ad_a = rot_attrs(gi + i, f'data-rw="{track}"', f'href="{link}"')
    return f"<li><a {ad_a}></a>{vis}{heading}{dd}{sl}</li>"


def _google_place(i: int, gi: int) -> str:
    m = (gi + i) % 6
    cid = f'data-cid="{10000 + gi * 100 + i}"' if m != 1 else ""
    lsig = f"&lsig=AB{gi}x{i}" if m % 2 == 0 else ""
    rating = f"4,{i % 10}" if m % 3 == 0 else f"3.{i % 10}"
    reviews = 10 + (gi * 7 + i * 13) % 990
    ptype = f"{_w(i + 1)} restaurant"
    # three spans: rating=span:first-child, reviews=span:nth-child(3)
    # (google_scraper.js:344-357); innerText = "rating · (reviews) · type"
    r1 = (
        f'<div class="r1"><span>{rating}</span><span> · </span><span>({reviews})</span> · {ptype}</div>'
        if m != 2
        else ""  # no first row: rating stays 0.0, type/reviews absent (js:341-360)
    )
    addr = f"{100 + i} {_w(gi + i)} St"
    phone = f"030 55{i:02d}"
    r2 = (
        f'<div class="r2">{addr} · {phone}</div>' if m % 2 == 0
        else f'<div class="r2">{addr}</div>'  # 1-part arity: address only
    )
    r3 = f'<div class="r3">Open until {8 + i % 12} PM</div>' if m != 3 else ""
    desc = f'<div class="rllt__wrapped">{_w(i)} spot {i}</div>' if m == 5 else ""
    svc = ""
    if m % 2 == 1:
        svc_img_pos = rot_attrs(i, 'class="rISBZc"', f'src="{POS_SRC}"')
        svc_img_neg = rot_attrs(i + 1, 'class="rISBZc"', f'src="{NEG_SRC}"')
        svc = (
            f'<div class="RGCvMc"><img {svc_img_pos}>Dine in</div>'
            f'<div class="RGCvMc"><img {svc_img_neg}>No delivery</div>'
        )
        if m == 5:  # unknown blob -> no entry (js:399-401)
            svc += '<div class="RGCvMc"><img class="rISBZc" src="data:,other">Takeout</div>'
    card_a = rot_attrs(
        gi + 2 * i, 'class="rllt__link"', cid, f'href="/maps/place?p={i}{lsig}"'
    )
    return (
        f"<a {card_a}>"
        f'<img src="https://th.example.com/t{gi}_{i}.jpg">'
        f'<div role="heading"><span>{inline_wrap(f" {_w(gi)} {_w(i)} Cafe {i} ", gi + i)}</span></div>'
        f'<div class="rllt__details">{r1}{r2}{r3}</div>{desc}{svc}</a>'
    )


def google_body(kw: str, gi: int, page_num: int, next_url: str | None = None) -> str:
    if page_num > 1 and gi % 8 == 4:
        # recaptcha interstitial: wait_for_results races
        # ['#center_col .g', '#recaptcha'] (google_scraper.js:645-656);
        # the blocked page carries the IP between the 'IP address: '
        # and 'Time:' markers (:54-59)
        return vary_junctions(
            '<html><body><div id="recaptcha"></div>'
            f"IP address: 66.249.{gi}.{gi % 7} Time: 2020-06-01T00:00:00Z"
            "</body></html>",
            gi,
        )
    parts = [f"<html><title>{kw} - Google Search</title><body>"]
    if gi % 5 != 2:
        parts.append("<input " + rot_attrs(gi, 'name="q"', f'value="{kw}"') + ">")
    if gi % 4 != 3:
        n = 1000000 + gi * 54321
        parts.append(
            f'<div id="result-stats">About {n:,} results (0.{30 + gi % 60} seconds)</div>'
        )
    if gi % 5 == 1:
        parts.append(f'<span id="fprsl">{kw} corrected</span>')
    n_top = gi % 4  # 0..3 top ads
    if n_top:
        parts.append(
            '<ul id="tads">' + "".join(_google_ad(i, gi, "top") for i in range(n_top)) + "</ul>"
        )
    n_org = 8 + gi % 4
    parts.append(
        '<div id="center_col">'
        + "".join(_google_organic(i, gi) for i in range(n_org))
        + "</div>"
    )
    n_bot = (gi + 1) % 3  # 0..2 bottom ads
    if n_bot:
        parts.append(
            '<ul id="tadsb">' + "".join(_google_ad(i + 10, gi, "bottom") for i in range(n_bot)) + "</ul>"
        )
    if gi % 3 != 2:
        lat = 10000000 + (gi * 977) % 80000000
        lon = 10000000 + (gi * 1013) % 80000000
        rllag = f"{lat},{lon},{600 + gi % 2000}" if gi % 4 != 1 else f"{lat},{lon}"
        src = "data:image/png;base64," + "A" * 64  # sliced to 50 (js:289-291)
        parts.append(
            f'<div class="H93uF"><a href="https://www.google.com/maps?q={kw.replace(" ", "+")}'
            f'&rllag={rllag}&z=14"><img src="{src}"></a></div>'
        )
    n_pl = (gi + 1) % 5  # 0..4 places
    if n_pl:
        parts.append(
            '<div class="rlfl">' + "".join(_google_place(i, gi) for i in range(n_pl)) + "</div>"
        )
    if gi % 3 != 1:
        rel = "".join(
            f'<a href="/search?q={_w(gi + k)}+{_w(k)}">{_w(gi + k)} {_w(k)}</a>'
            for k in range(1 + gi % 4)
        )
        parts.append(f'<div id="brs"><span class="brs_col">{rel}</span></div>')
    if next_url is not None:
        # #pnnext advances the pagination loop (google_scraper.js:91-93,
        # :631-636); pages without it silently RE-PARSE the same page
        # for the remaining page_nums (next_page() is a no-op)
        parts.append(
            "<a " + rot_attrs(gi + 1, 'id="pnnext"', f'href="{next_url}"') + "></a>"
        )
    parts.append("</body></html>")
    return vary_junctions("".join(parts), gi)


# --------------------------------------------------------------- bing


def _bing_organic(i: int, gi: int) -> str:
    m = (gi + i) % 6
    title = f"{_w(gi + i)} bing hit {i}"
    link = f"https://b{(gi + i) % 41}.example.org/r{i}"
    disp = f"b{(gi + i) % 41}.example.org/r{i}"
    snippet = f"Bing snippet {_w(i)} {i}."
    h2 = (
        f'<h2><a href="{link}">{inline_wrap(title, gi + 4 * i)}</a></h2>'
        if m != 1
        else "<h2></h2>"
    )
    cap = (
        f'<div class="b_caption"><p>{inline_wrap(snippet, gi + 5 * i)}</p></div>'
        if m != 2
        else ""
    )
    rich = ""
    if m == 3:
        rich = (
            '<span class="b_factrow b_twofr">'
            + "".join(f'<span class="fre">ext {_w(i + k)}</span>' for k in range(2))
            + "</span>"
        )
    sl = ""
    if m == 4:
        sl = (
            '<span class="osl">'
            + "".join(
                "<a "
                + rot_attrs(i + k + 1, 'class="fl"', f'href="{link}/s{k}"')
                + f">bl{k}</a>"
                for k in range(2)
            )
            + "</span>"
        )
    return f'<li class="b_algo">{h2}<cite>{disp}</cite>{cap}{rich}{sl}</li>'


def _bing_ad(i: int, gi: int) -> str:
    m = (gi + 3 * i) % 6
    title = f"BAd {_w(gi + i)} {i}"
    link = f"https://bad{(gi + i) % 19}.example.net/t{i}"
    disp = f"bad{(gi + i) % 19}.example.net"
    desc = f"Bing ad body {_w(i)} {i}."
    t = (
        f'<div class="b_textAdTitleLink">{inline_wrap(title, gi + 7 * i)}</div>'
        if m != 1
        else ""
    )
    d = f'<div class="b_adurl"><cite>{disp}</cite></div>' if m != 2 else ""
    c = f'<div class="b_caption"><p>{desc}</p></div>' if m != 3 else ""
    ext = f'<div class="MUxGbd lyLwlc aLF0Z"> free shipping {i} </div>' if m % 2 == 0 else ""
    loc = (
        f'<div class="Qezod">{100 + i} {_w(gi)} Ave - 030 44{i:02d}</div>'
        if m % 3 == 0
        else (f'<div class="Qezod">{_w(gi)} plaza</div>' if m == 5 else "")
    )
    rat = ""
    if m % 2 == 1:
        val = f"4,{1 + i % 8}" if i % 2 == 0 else f"3.{1 + i % 8}"
        rat_attrs = rot_attrs(i, 'class="Hk2yDb KsR1A"', f'aria-label="Rated {val} of 5"')
        rat = f"<div {rat_attrs}></div>"
    phone = f'<div class="EkiqXc MUxGbd"> 0800 77{i:02d} </div>' if m == 4 else ""
    track = f'<h2><a href="https://r.bing.example/rd?i={gi}{i}"></a></h2>' if m != 5 else ""
    sl = ""
    if m == 0:
        links = "".join(
            f'<a href="https://bt.example.net/{k}"> bs{_w(k + i)} </a>' for k in range(2)
        )
        sl = f'<div class="b_ads1line">{links}</div>'
    return f"<li>{t}{d}{c}{ext}{loc}{rat}{phone}{track}{sl}</li>"


def _bing_shopping_unit(i: int, gi: int) -> str:
    m = (gi + i) % 5
    price = "" if m == 2 else (
        f"{3 + i},{10 + i % 90} €" if i % 2 == 0 else f"${3 + i}.{10 + i % 90}"
    )
    src_inner = f"shop{(gi + i) % 11}.example"
    # .rhsl5 inside .LbUacb when present, else .LbUacb text (js:278-285)
    source = (
        f'<span class="LbUacb"><span class="rhsl5s">{src_inner}</span></span>'
        if m % 2 == 0
        else f'<span class="LbUacb">{src_inner} direct</span>'
    )
    rat = ""
    if m != 3:
        rat = (
            f'<g-review-stars><span aria-label="stars 4,{i % 9} of 5, was 3,{i % 9}"></span>'
            "</g-review-stars>"
        )
    rev = f'<span class="fl">({1 + i % 4},{100 + i % 900})</span>' if m != 4 else ""
    ext = ""
    if m % 2 == 1:
        # duplicate text -> Set dedup (js:323-339)
        ext = (
            f'<span class="pla-extensions-container">promo {_w(i)}</span>'
            f'<span class="pla-extensions-container">promo {_w(i)}</span>'
            f'<span class="pla-extensions-container">fast ship</span>'
        )
    pr = f'<span class="T4OwTb">{price}</span>' if price else ""
    # a:first-child -> link; a.plantl.pla-unit-title-link -> source_link
    # AND vendor_link (both reference selectors resolve to this element)
    plantl = rot_attrs(
        gi + i,
        'class="plantl pla-unit-title-link"',
        f'href="https://v{(gi + i) % 13}.example.org/t{i}"',
    )
    return (
        f'<div class="pla-unit"><a href="https://pla{(gi + i) % 13}.example.org/u{i}"></a>'
        f"<a {plantl}></a>"
        f'{source}{rat}{rev}<span class="rhsl5">{inline_wrap(f"Item {_w(gi + i)} {i}", gi + 6 * i)}</span>{pr}{ext}'
        f'<span class="Gor6zc"><img src="https://img.example.com/p{gi}_{i}.jpg"></span></div>'
    )


def _bing_place_a(i: int, gi: int) -> str:
    m = (gi + i) % 5
    meta_attrs = rot_attrs(
        gi + i,
        'class="ent_id"',
        f'id="c-eid_{7000 + gi * 50 + i}"',
        f'elat="52.5{i}"',
        f'elong="13.4{i}"',
    )
    meta = f"<span {meta_attrs}></span>" if m != 1 else ""
    rat_attrs = rot_attrs(
        i, 'class="csrc sc_rc1"', f'aria-label="{4 if i % 2 else 3},{i % 9} stars"'
    )
    rat = f"<span {rat_attrs}></span>" if m != 2 else ""
    tags1 = (
        f'<span class="tag">Reviews ({50 + i * 7})</span>' if m != 3
        else '<span class="tag">new</span>'
    )
    t3 = f"{_w(i)} bar · €€ · {_w(gi)}burg"
    tags2 = (
        f'<span class="tag">{t3}</span>' if m % 2 == 0
        else f'<span class="tag">{_w(i)} bar · {_w(gi)}burg</span>'
    )
    return (
        f'<div class="item">{meta}<img src="https://bth.example.com/a{gi}_{i}.jpg">'
        f'<span class="tit">{inline_wrap(f" {_w(gi + i)} Haus {i} ", gi + 3 * i)}</span>'
        f'<span class="ft_otl b_primtxt">mention {_w(i)}</span>'
        f'<span class="opHours">open {9 + i % 3} am</span>'
        f'{rat}<span class="tags">{tags1}{tags2}</span></div>'
    )


def _bing_place_b(i: int, gi: int) -> str:
    m = (gi + i) % 4
    rat_attrs = rot_attrs(
        i + 1, 'class="csrc sc_rc1"', f'aria-label="{3 + i % 2},{i % 9} rating"'
    )
    rat = f"<span {rat_attrs}></span>" if m != 1 else ""
    rev_attrs = rot_attrs(
        gi + i, 'class="csrc"', f'aria-label="see ({20 + i * 3}) reviews"'
    )
    rev = (
        f'<span class="b_factrow"><cite {rev_attrs}></cite></span>' if m != 2 else ""
    )
    row = (
        f'<span class="b_factrow fr3">{200 + i} {_w(gi)} Str · 030 66{i:02d}</span>'
        if m % 2 == 0
        else f'<span class="b_factrow fr3">{_w(gi)} {i} corner</span>'
    )
    return (
        f'<div class="b_scard"><span class="ft_otl ft_wm">wm {_w(i)}</span>'
        f'<img src="https://bth.example.com/b{gi}_{i}.jpg">'
        f'<span class="lc_content"><h2>{inline_wrap(f" {_w(i + gi)} Scard {i} ", gi + i)}</h2></span>'
        f'<span class="b_factrow"><cite class="opHours">til {6 + i % 6} pm</cite></span>'
        f"{rat}{rev}{row}</div>"
    )


def _bing_video(i: int, gi: int) -> str:
    m = (gi + i) % 5
    title = (
        f'<div class="mB12kf">{inline_wrap(f" {_w(gi + i)} clip {i} ", gi + 2 * i)}</div>'
        if m != 1
        else ""
    )
    link = f'<a href="https://vid{(gi + i) % 17}.example.org/v{i}"></a>' if m != 2 else ""
    plat = (
        f'<div class="nHGuld">YouTube - {1 + i % 12} Jun 2020</div>'
        if m % 2 == 0
        else '<div class="nHGuld">vimeo channel only</div>'  # 1-part: no split
    )
    return (
        f'<li class="gT5me">{title}{link}<img src="https://vth.example.com/{gi}_{i}.jpg">'
        f'<div class="RgAZAc"> chan {_w(i)} </div>'
        f'<div class="Woharf LQFTgb"> {i % 12}:{10 + i % 50} </div>{plat}</li>'
    )


def bing_body(kw: str, gi: int, page_num: int) -> str:
    parts = [f"<html><title>{kw} - Bing</title><body>"]
    if gi % 5 != 2:
        parts.append("<input " + rot_attrs(gi + 1, 'name="q"', f'value="{kw}"') + ">")
    if gi % 4 == 1:
        parts.append(f'<span id="fprsl"> {kw} fixed </span>')
    if gi % 4 != 3:
        n = 2000000 + gi * 98765
        sep = "’" if gi % 2 else ","
        digits = f"{n:,}".replace(",", sep)
        parts.append(f'<div class="sb_count">{digits} results</div>')
    n_top = gi % 3
    if n_top:
        parts.append(
            '<div class="b_ad"><ul>'
            + "".join(_bing_ad(i, gi) for i in range(n_top))
            + "</ul></div>"
        )
    n_org = 8 + gi % 4
    parts.append(
        '<ol id="b_results">'
        + "".join(_bing_organic(i, gi) for i in range(n_org))
        + "</ol>"
    )
    n_bot = (gi + 2) % 3
    if n_bot:
        parts.append(
            '<div class="b_ad b_adBottom"><ul>'
            + "".join(_bing_ad(i + 10, gi) for i in range(n_bot))
            + "</ul></div>"
        )
    n_shop = (gi + 1) % 4  # 0..3 shopping units
    if n_shop:
        units = "".join(_bing_shopping_unit(i, gi) for i in range(n_shop))
        if gi % 2 == 0:
            parts.append(f'<section class="Yi78Pd">{units}</section>')  # right rail
        else:
            parts.append(f'<section class="top-pla-group-inner">{units}</section>')
    n_pa = gi % 3
    n_pb = (gi + 1) % 3
    if n_pa or n_pb:
        parts.append('<div id="lmSeeMore"><a href="/maps?q=more"></a></div>')
    if n_pa:
        parts.append(
            '<div id="ent-car-exp">'
            + "".join(_bing_place_a(i, gi) for i in range(n_pa))
            + "</div>"
        )
    if n_pb:
        parts.append(
            '<div id="lMapContainer">'
            + "".join(_bing_place_b(i, gi) for i in range(n_pb))
            + "</div>"
        )
    n_q = (gi + 2) % 4
    if n_q:
        parts.append(
            '<div id="relatedQnAListDisplay">'
            + "".join(f'<div class="df_topAlAs"> what is {_w(gi + k)} {k} </div>' for k in range(n_q))
            + "</div>"
        )
    if gi % 3 != 1:
        others = "".join(
            f'<li><a href="/search?q={kw.replace(" ", "+")}&first={1 + 10 * k}">{k + 1}</a></li>'
            for k in range(4)
        )
        nxt_attrs = rot_attrs(
            gi,
            'class="sb_pagN sb_pagN_bp"',
            f'href="/search?q={kw.replace(" ", "+")}&first={1 + 10 * page_num}"',
        )
        nxt = f"<a {nxt_attrs}></a>"
        cur = f'<a class="sb_pagS sb_pagS_bp b_widePag sb_bp">{page_num}</a>'
        parts.append(f'<div class="b_pag"><ul class="sb_pagF">{others}</ul>{nxt}{cur}</div>')
    n_vid = (gi + 1) % 4
    if n_vid:
        parts.append(
            '<ul class="vids">' + "".join(_bing_video(i, gi) for i in range(n_vid)) + "</ul>"
        )
    parts.append("</body></html>")
    return vary_junctions("".join(parts), gi + 1)


# ------------------------------------------------- amazon / nytimes


def _amazon_item(i: int, gi: int) -> str:
    m = (gi + i) % 6
    asin = f'data-asin="B0{gi:02d}{i:04d}"' if m != 1 else ""
    linkel = (
        f'<h2><a href="/dp/B0{gi:02d}{i:04d}"><cite>{inline_wrap(f"{_w(gi + i)} widget {i}", gi + 3 * i)}</cite></a></h2>'
        if m != 2
        else ""
    )
    info = "".join(
        f'<span class="a-section"> info {_w(i + k)} {k} </span>' for k in range(1 + m % 3)
    )
    prime = '<i class="a-icon-prime"></i>' if m % 2 == 0 else ""
    stock = f'<span class="a-color-price">Only {1 + i % 9} left</span>' if m == 3 else ""
    price = (
        f'<span class="a-price"><span class="a-offscreen">${9 + i},{10 + i % 90}</span></span>'
        if m != 4
        else ""
    )
    stars = (
        f'<span class="a-size-small"><em aria-label="s">{4 - i % 2}.{i % 10} out of 5</em>'
        f'<em aria-label="r">{100 + i * 11:,}</em></span>'
        if m % 3 == 0
        else ""
    )
    item_attrs = rot_attrs(gi + i, 'class="s-result-item"', asin)
    return f"<div {item_attrs}>{linkel}{info}{prime}{stock}{price}{stars}</div>"


def amazon_body(kw: str, gi: int) -> str:
    n = 8 + gi % 5
    items = "".join(_amazon_item(i, gi) for i in range(n))
    return vary_junctions(
        f"<html><title>Amazon.com: {kw}</title><body>"
        f'<div class="s-result-list">{items}</div></body></html>',
        gi + 2,
    )


def _nyt_story(i: int, gi: int) -> str:
    m = (gi + i) % 4
    head = f'<h2><span class="balancedHeadline">{inline_wrap(f"{_w(gi + i)} {_w(i)} headline {i}", gi + 2 * i)}</span></h2>'
    p = f"<p>{inline_wrap(f'Story {_w(i)} summary {i}.', gi + i)}</p>" if m != 1 else ""
    a = f'<a href="https://www.nytimes.com/2020/{1 + gi % 12:02d}/{1 + i % 28:02d}/s{i}.html"></a>' if m != 2 else ""
    return f'<div class="story">{head}{p}{a}</div>'


def nytimes_body(gi: int) -> str:
    n = 6 + gi % 4
    return vary_junctions(
        '<html><title>The New York Times</title><body><div id="site-content">'
        + "".join(_nyt_story(i, gi) for i in range(n))
        + "</div></body></html>",
        gi + 3,
    )


# ------------------------------------------------- reverse image


def _revimg_google_box(i: int, gi: int) -> str:
    m = (gi + i) % 6
    imgurl = url_encode_fixed(f"https://pics.example.org/full {gi}_{i}.jpg")
    refurl = url_encode_fixed(f"https://host{i % 9}.example.org/page/{i}")
    cap = f"caption {_w(gi + i)} {i}"
    if m == 1:
        # no imgurl param -> fallback chain (js:148-168); the img sits
        # INSIDE the first anchor so the second anchor is the block's
        # 2nd child ('a:nth-child(2)', js:158)
        img_attrs = rot_attrs(
            gi + i,
            f'data-iurl="https://iurl.example.org/d{gi}_{i}.jpg"',
            f'src="data:image/jpeg;base64,XX{i}"',
        )
        img = f"<img {img_attrs}>"
        a = f'<a href="/imgres?imgrefurl={refurl}&h=100"><span>{cap}</span>{img}</a>'
        second = f'<a href="https://second.example.org/ref{i}">second text {i}</a>'
        return f'<div class="rg_bx">{a}{second}</div>'
    if m == 2:
        # href missing entirely; img has NO data-iurl -> imgurl stays
        # null but type still becomes 'data-iurl' (js:152-156);
        # second_a href='#' -> imgrefurl null; then the dataimage
        # fallback (extract_data_image) reads `a img` src (js:170-176)
        # -- img must sit INSIDE the first anchor for that selector
        img = f'<img src="data:image/jpeg;base64,YY{i}">'
        second = f'<a href="#">hash text {i}</a>'
        return f'<div class="rg_bx"><a><span>{cap}</span>{img}</a>{second}</div>'
    if m == 3:
        # imgurl present but imgrefurl missing -> data-iurl overwrites
        # imgurl AND type; second anchor supplies imgrefurl + imgtext
        img_attrs = rot_attrs(
            gi + i + 1,
            f'data-iurl="https://iurl.example.org/e{gi}_{i}.jpg"',
            'src="x"',
        )
        img = f"<img {img_attrs}>"
        a = f'<a href="/imgres?imgurl={imgurl}&h=100"><span>{cap}</span>{img}</a>'
        second = f'<a href="https://second.example.org/alt{i}">alt text {i}</a>'
        return f'<div class="rg_bx">{a}{second}</div>'
    return (
        f'<div class="rg_bx"><a href="/imgres?imgurl={imgurl}&imgrefurl={refurl}&h=100">'
        f"<span>{cap}</span></a><img src=\"data:image/jpeg;base64,ZZ{i}\"></div>"
    )


def revimg_google_body(gi: int) -> str:
    n = 8 + gi % 4
    return vary_junctions(
        "<html><body>"
        + "".join(_revimg_google_box(i, gi) for i in range(n))
        + "</body></html>",
        gi + 4,
    )


def _revimg_bing_box(i: int, gi: int) -> str:
    m = (gi + i) % 4
    media = url_encode_fixed(f"https://media.example.org/m {gi}_{i}.png")
    if m == 1:
        # .richImgLnk missing -> catch -> rank-only row (js:62-69)
        return f'<div class="richImage"><span>broken {i}</span></div>'
    lnk_attrs = rot_attrs(
        gi + i, 'class="richImgLnk"', f'href="/images/search?mediaurl={media}"'
    )
    return (
        f'<div class="richImage"><a {lnk_attrs}>'
        f'</a><span class="captionContainer">bing cap {_w(gi + i)} {i}'
        f'<a href="https://ref{i % 7}.example.org/b{i}"></a></span></div>'
    )


def revimg_bing_body(gi: int) -> str:
    n = 6 + gi % 4
    return vary_junctions(
        '<html><body><div id="i_results">'
        + "".join(_revimg_bing_box(i, gi) for i in range(n))
        + "</div></body></html>",
        gi + 5,
    )


# ---------------------------------------------------------- assembly


def google_serp_url(kw: str, pg: int) -> str:
    return f"https://www.google.com/search?q={kw.replace(' ', '+')}&start={10 * (pg - 1)}"


def serp_keywords(p: SerpParams) -> list[str]:
    return [f"{_w(k)} {_w(k + 5)}" for k in range(p.n_kw)]


def gen_serps(p: SerpParams) -> pa.Table:
    """Page indices (gi) are PER-ENGINE counters so every modular
    variant branch is reachable for every engine family."""
    prev = _ACTIVE["v"]
    _ACTIVE["v"] = p.markup_version
    try:
        return _gen_serps_inner(p)
    finally:
        _ACTIVE["v"] = prev


def _gen_serps_inner(p: SerpParams) -> pa.Table:
    urls, engines, keywords, page_nums, bodies = [], [], [], [], []

    def add(url, engine, kw, page_num, body):
        urls.append(url)
        engines.append(engine)
        keywords.append(kw)
        page_nums.append(page_num)
        bodies.append(body)

    gi = 0
    for k in range(p.n_kw):
        kw = f"{_w(k)} {_w(k + 5)}"
        for pg in range(1, p.pages_per_kw + 1):
            gurl = google_serp_url(kw, pg)
            # no #pnnext on the last page, and on the gi%9==0 quirk
            # page (reference re-parse semantics, google_body)
            next_url = (
                google_serp_url(kw, pg + 1)
                if pg < p.pages_per_kw and not (gi % 9 == 0 and gi > 0)
                else None
            )
            add(gurl, "google", kw, pg, google_body(kw, gi, pg, next_url))
            add(
                f"https://www.bing.com/search?q={kw.replace(' ', '+')}&first={1 + 10 * (pg - 1)}",
                "bing", kw, pg, bing_body(kw, gi, pg),
            )
            gi += 1
    for s in range(p.n_single):
        kw = f"{_w(s + 2)} gadget"
        add(
            f"https://www.amazon.com/s?k={kw.replace(' ', '+')}",
            "amazon", kw, 1, amazon_body(kw, s),
        )
        add("https://www.nytimes.com/?v=" + str(s), "nytimes", "", 1, nytimes_body(s))
        add(
            f"https://www.google.com/searchbyimage?image_url=q{s}.png",
            "revimg_google", f"q{s}.png", 1, revimg_google_body(s),
        )
        add(
            f"https://www.bing.com/images/searchbyimage?v={s}",
            "revimg_bing", f"q{s}.png", 1, revimg_bing_body(s),
        )

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "engine": pa.array(engines, pa.string()),
            "keyword": pa.array(keywords, pa.string()),
            "page_num": pa.array(page_nums, pa.int32()),
            "body": pa.array(bodies, pa.string()),
        }
    )


def generate(p: SerpParams, out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "serps.parquet")
    marker = os.path.join(out_dir, f".done_{p.tag}")
    if not os.path.exists(marker):
        pq.write_table(gen_serps(p), path, row_group_size=16384)
        with open(marker, "w") as f:
            f.write(p.tag)
    return path


def ensure_serp_corpus(p: SerpParams = SMOKE) -> str:
    from .corpus import cache_base

    return generate(p, os.path.join(cache_base(), "serps", p.tag))
