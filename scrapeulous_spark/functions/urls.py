"""URL normalization semantics, pinned to the reference's literal behavior.

Two twins of the SAME semantics live here:
  * plain-Python functions (used by the serial oracle and the corpus
    generator), and
  * Spark Column expressions (used by the engine) — see
    :func:`resolve_col`, :func:`normalize_col`, :func:`host_col`.

Pinned reference behaviors (/root/reference/custom/social.js):
  * resolve: ``new URL(link, parsed_url.origin)`` — social.js:109.
    Our synthetic corpus emits only absolute (``http(s)://...``) and
    root-relative (``/path``) hrefs, so resolution is origin + path.
  * normalize: ``url_string.replace(/#/g, '')`` — social.js:121-123.
    NOTE: this removes every ``#`` CHARACTER, it does not strip the
    fragment — ``http://h/p#sec`` becomes ``http://h/psec``. That is
    the code's actual behavior and the north rule demands exact
    seen-set match, so we reproduce it literally.
  * same-host gate: exact hostname equality — social.js:115-119
    (``stay_within_domain`` is always coerced true, social.js:48-50).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------- python twin


def host_of(url: str) -> str:
    """Hostname of an absolute http(s) URL (lowercased; no port support
    needed — the synthetic corpus never emits ports)."""
    rest = url.split("://", 1)[1] if "://" in url else url
    return rest.split("/", 1)[0].lower()


def origin_of(url: str) -> str:
    scheme, rest = url.split("://", 1)
    return scheme + "://" + rest.split("/", 1)[0]


def path_of(url: str) -> str:
    rest = url.split("://", 1)[1] if "://" in url else url
    i = rest.find("/")
    return rest[i:] if i >= 0 else "/"


def resolve(link: str, seed_origin: str) -> str | None:
    """Resolve an href against the seed page origin. Returns None for
    unparseable links (oracle: ``continue`` on parse error, social.js:110-113).
    """
    link = link.strip()
    if not link:
        return None
    if link.startswith("http://") or link.startswith("https://"):
        if "://" not in link or not link.split("://", 1)[1]:
            return None
        return link
    if link.startswith("/"):
        return seed_origin + link
    # other forms (scheme-relative, mailto:, javascript:) -> unparseable here
    return None


def normalize(url: str) -> str:
    """The reference's literal '#'-removal normalization (social.js:122)."""
    return url.replace("#", "")


# ----------------------------------------------------------------- spark twin


# NOTE: each op is ONE regexp_extract, not a nested split_part chain.
# Catalyst's CollapseProject re-expands column references into their
# defining expressions, so a nested chain referenced through several
# projections blows up into a huge duplicated tree whose analysis +
# codegen dominates small-batch latency (measured: 19s to compile a
# 73-row groupBy before this change).


def host_col(url: Column) -> Column:
    """Hostname column expr — ``parse_url(url, 'HOST')`` equivalent."""
    return F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)", 1))


def origin_col(url: Column) -> Column:
    return F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]+)", 1)


def path_col(url: Column) -> Column:
    p = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*(/.*)$", 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def resolve_col(link: Column, seed_origin: Column) -> Column:
    """Spark twin of :func:`resolve` (NULL == unparseable). The
    absolute-link branch mirrors the Python twin's nothing-after-'://'
    rejection ('http://' is unparseable; 'http:///x' passes both)."""
    link = F.trim(link)
    abs_rest = F.regexp_extract(link, r"^https?://(.+)$", 1)
    return (
        F.when(link == "", F.lit(None).cast("string"))
        .when(
            link.startswith("http://") | link.startswith("https://"),
            F.when(abs_rest != "", link),  # NULL when nothing follows ://
        )
        .when(link.startswith("/"), F.concat(seed_origin, link))
        .otherwise(F.lit(None).cast("string"))
    )


def normalize_col(url: Column) -> Column:
    return F.replace(url, F.lit("#"), F.lit(""))


_TRACKING_PREFIXES = ("utm_", "gclid=", "fbclid=")


def canonicalize(url: str) -> str:
    """Python twin of :func:`canonicalize_col` (oracle/property tests):
    strip the fragment, drop tracking params (utm_*, gclid, fbclid),
    sort the survivors — so parameter order never splits a URL's
    identity in the seen set."""
    no_frag = url.split("#", 1)[0]
    base, _, query = no_frag.partition("?")
    params = sorted(
        p
        for p in query.split("&")
        if p and not any(p.startswith(t) for t in _TRACKING_PREFIXES)
    )
    return base + ("?" + "&".join(params) if params else "")


def canonicalize_col(raw: Column) -> Column:
    """Column twin of :func:`canonicalize` — a narrow projection (no
    shuffle), run before hashing into the frontier/seen path."""
    no_frag = F.regexp_replace(raw, "#.*$", "")
    segs = F.split(no_frag, r"\?", 2)
    base = F.element_at(segs, 1)
    query = F.when(F.size(segs) > 1, F.element_at(segs, 2))
    keep = F.array_sort(
        F.filter(
            F.split(F.coalesce(query, F.lit("")), "&"),
            lambda p: (p != "")
            & ~p.startswith("utm_")
            & ~p.startswith("gclid=")
            & ~p.startswith("fbclid="),
        )
    )
    return F.concat(
        base,
        F.when(F.size(keep) > 0, F.concat(F.lit("?"), F.array_join(keep, "&"))).otherwise(
            F.lit("")
        ),
    )
