"""Serial reference simulator — the golden oracle (SURVEY.md §5.2.1).

A pure-Python, single-threaded re-execution of the reference crawl
semantics (/root/reference/custom/social.js:20-101) over the synthetic
page store, extended with the north-rule gates (robots, per-host
budgets) that the engine also applies. The engine's distributed output
must match this oracle EXACTLY (crawl order + seen set), invariant
under parallelism.

Pinned semantics (file:line into /root/reference/custom/social.js):
  * frontier is a LIFO stack, seed pushed first        (:54, :79)
  * seed fetch has NO try/catch — failure aborts item  (:56)
  * expansion only from the seed page, depth exactly 1 (:67-76)
  * cleanLinks: resolve vs seed origin (:109), same-host gate
    (:115-119, always on per :48-50), '#'-char removal (:121-123),
    first-occurrence dedup (:127)
  * budget loop: pop, fetch in try/catch, decrement max_requests on
    SUCCESS only (:78-90, decrement at :86)
  * per-kind entity dedup, first-occurrence order (:93-98)
  * page_title = trimmed title of the SEED page only (:62-65)
North-rule extensions (applied identically in engine + oracle):
  * robots: links whose path starts with a disallowed prefix for the
    target host never enter the frontier
  * budget comes from the budgets table keyed by SEED host (the
    reference's per-job options.max_requests analog), falsy->0
    coercion preserved (:45-47)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..functions import urls as U
from ..constants import OK_STATUSES
from ..functions.entities import KIND_ORDER, extract_py


@dataclass
class OracleResult:
    # (seed_id, step, url, depth)
    crawl_order: list[tuple[int, int, str, int]] = field(default_factory=list)
    # normalized urls, globally distinct
    seen_set: list[str] = field(default_factory=list)
    # (seed_id, kind, ord, value)
    entities: list[tuple[int, str, int, str]] = field(default_factory=list)


def _clean_links(
    links: list[str], seed_origin: str, seed_host: str, robots_disallow: dict[str, list[str]]
) -> list[str]:
    filtered: list[str] = []
    for link in links:
        if not link or not link.strip():
            continue  # getLinks href-nonempty gate, social.js:135
        resolved = U.resolve(link, seed_origin)
        if resolved is None:
            continue  # parse error -> continue, social.js:110-113
        if U.host_of(resolved) != seed_host:
            continue  # same-domain gate, social.js:115-119
        norm = U.normalize(resolved)
        dis = robots_disallow.get(U.host_of(norm), [])
        if any(U.path_of(norm).startswith(p) for p in dis):
            continue  # north-rule robots gate
        filtered.append(norm)
    # first-occurrence-preserving dedup ([...new Set(filtered)], social.js:127)
    return list(dict.fromkeys(filtered))


def run_oracle(
    pages: dict[str, dict],
    seeds: list[tuple[int, str]],
    budgets: dict[str, int],
    robots_disallow: dict[str, list[str]],
) -> OracleResult:
    """pages: url -> {status, out_links, body, title}; seeds: [(seed_id, url)]."""
    res = OracleResult()
    seen: dict[str, None] = {}

    for seed_id, seed_url in seeds:
        # URL validation (social.js:34-40)
        if not (seed_url.startswith("http://") or seed_url.startswith("https://")):
            res.entities.append((seed_id, "invalid_url", 0, seed_url))
            continue
        seed_host = U.host_of(seed_url)
        seed_origin = U.origin_of(seed_url)
        budget = budgets.get(seed_host, 0) or 0  # falsy coercion, social.js:45-47

        raw_values: dict[str, list[str]] = {k: [] for k in KIND_ORDER}

        # ---- seed fetch: no try/catch (social.js:56); failure aborts item
        res.crawl_order.append((seed_id, 0, seed_url, 0))
        seen.setdefault(U.normalize(seed_url))
        page = pages.get(seed_url)
        if page is None or page["status"] not in OK_STATUSES:
            continue
        for kind in KIND_ORDER:
            raw_values[kind].extend(extract_py(kind, page["body"]))
        title = (page.get("title") or "").strip()
        if title:
            res.entities.append((seed_id, "page_title", 0, title))

        # ---- expansion, depth exactly 1 (social.js:67-76)
        cleaned = _clean_links(page["out_links"], seed_origin, seed_host, robots_disallow)
        for u in cleaned:
            seen.setdefault(u)
        to_visit = list(cleaned)

        # ---- budget loop (social.js:78-90)
        step = 1
        while to_visit and budget > 0:
            url = to_visit.pop()
            res.crawl_order.append((seed_id, step, url, 1))
            step += 1
            p2 = pages.get(url)
            if p2 is not None and p2["status"] in OK_STATUSES:
                for kind in KIND_ORDER:
                    raw_values[kind].extend(extract_py(kind, p2["body"]))
                budget -= 1  # decrement on success only (social.js:86)

        # ---- finalize: per-kind first-occurrence dedup (social.js:93-98)
        for kind in KIND_ORDER:
            for i, v in enumerate(dict.fromkeys(raw_values[kind])):
                res.entities.append((seed_id, kind, i, v))

    res.seen_set = list(seen)
    return res


def run_oracle_bfs(
    pages: dict[str, dict],
    seeds: list[tuple[int, str]],
    budgets: dict[str, int],
    robots_disallow: dict[str, list[str]],
    link_depth: int = 2,
) -> OracleResult:
    """Extended serial oracle for the multi-depth ENGINE EXTENSION
    (BFS-by-depth supersteps). Depth 1 is reference-exact; at depth
    d >= 2 the policy (documented in loop.py) is:
      * expansion from every successfully fetched depth-d page, enqueue
        order = (parent pop order, DOM order), first-occurrence dedup
      * candidates already visited/enqueued by this seed are excluded
      * budget is GLOBAL per seed across depths (success-decrement)
      * step numbering continues per seed
    """
    res = OracleResult()
    seen: dict[str, None] = {}

    for seed_id, seed_url in seeds:
        if not (seed_url.startswith("http://") or seed_url.startswith("https://")):
            res.entities.append((seed_id, "invalid_url", 0, seed_url))
            continue
        seed_host = U.host_of(seed_url)
        seed_origin = U.origin_of(seed_url)
        budget = budgets.get(seed_host, 0) or 0
        raw_values: dict[str, list[str]] = {k: [] for k in KIND_ORDER}

        res.crawl_order.append((seed_id, 0, seed_url, 0))
        seen.setdefault(U.normalize(seed_url))
        page = pages.get(seed_url)
        if page is None or page["status"] not in OK_STATUSES:
            continue
        for kind in KIND_ORDER:
            raw_values[kind].extend(extract_py(kind, page["body"]))
        title = (page.get("title") or "").strip()
        if title:
            res.entities.append((seed_id, "page_title", 0, title))

        current = (
            _clean_links(page["out_links"], seed_origin, seed_host, robots_disallow)
            if link_depth > 0
            else []
        )
        pair_seen: set[str] = {U.normalize(seed_url)} | set(current)
        for u in current:
            seen.setdefault(u)

        step = 1
        for d in range(1, link_depth + 1):
            to_visit = list(current)
            collected: list[str] = []  # next-depth candidates, enqueue order
            while to_visit and budget > 0:
                url = to_visit.pop()
                res.crawl_order.append((seed_id, step, url, d))
                step += 1
                p2 = pages.get(url)
                if p2 is not None and p2["status"] in OK_STATUSES:
                    for kind in KIND_ORDER:
                        raw_values[kind].extend(extract_py(kind, p2["body"]))
                    budget -= 1
                    if d < link_depth:
                        # resolve against the PARENT page's origin (browser
                        # semantics, matching frontier.expand_candidates) —
                        # identical to seed_origin at depth 0, but a
                        # cross-scheme parent (same-host gate compares
                        # hostname only) must resolve its own links
                        collected.extend(
                            _clean_links(
                                p2["out_links"],
                                U.origin_of(url),
                                seed_host,
                                robots_disallow,
                            )
                        )
            nxt = [u for u in dict.fromkeys(collected) if u not in pair_seen]
            pair_seen.update(nxt)
            for u in nxt:
                seen.setdefault(u)
            current = nxt
            if not current:
                break

        for kind in KIND_ORDER:
            for i, v in enumerate(dict.fromkeys(raw_values[kind])):
                res.entities.append((seed_id, kind, i, v))

    res.seen_set = list(seen)
    return res


def load_corpus_for_oracle(paths: dict[str, str]):
    """Read the generated parquet corpus into plain-Python structures."""
    import pyarrow.parquet as pq

    pages_t = pq.read_table(paths["pages"])
    pages = {
        r["url"]: {
            "status": r["status"],
            "out_links": r["out_links"],
            "body": r["body"],
            "title": r["title"],
        }
        for r in pages_t.to_pylist()
    }
    seeds = [(r["seed_id"], r["url"]) for r in pq.read_table(paths["seeds"]).to_pylist()]
    budgets = {
        r["host"]: int(r["max_requests"]) for r in pq.read_table(paths["budgets"]).to_pylist()
    }
    robots = {
        r["host"]: list(r["disallow"] or []) for r in pq.read_table(paths["robots"]).to_pylist()
    }
    return pages, seeds, budgets, robots
