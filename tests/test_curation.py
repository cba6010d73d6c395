"""Semantics pins for the training-data-curation operators
(pipeline.py curation section + catalog_engine.fn_pii_scrub) beyond
the DuckDB comparator: invariants a twin-SQL bug could silently share.
"""

import hashlib
import re

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def registry():
    from scrapeulous_spark.operators import load_all_catalogs

    return load_all_catalogs()


def _h32(s: str, salt: str) -> int:
    return int(hashlib.md5(f"{salt}:{s}".encode()).hexdigest()[:8], 16)


def test_gopher_rules_recomputed(spark, registry):
    rows = registry["text_gopher_quality"].spark(spark, SF).collect()
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    stops = {"the", "be", "to", "of", "and", "that", "have", "with"}
    assert len(rows) == len(docs)
    for r in rows:
        toks = re.split(r"\s+", docs[r.doc_id].strip())
        n_stop = len(stops & set(toks))
        mean_x1000 = 1000 * sum(len(t) for t in toks) // len(toks)
        assert r.n_words == len(toks)
        assert r.n_stop_kinds == n_stop
        assert r.mean_word_len_x1000 == mean_x1000
        assert r.admitted == (
            50 <= len(toks) <= 100000 and 3000 <= mean_x1000 <= 10000 and n_stop >= 2
        )


def test_stratified_sample_exact_membership(spark, registry):
    """Admission is a pure function of (doc_id, source) — recompute it
    row-for-row in Python; also confirm determinism across runs."""
    got = {
        (r.doc_id, r.source)
        for r in registry["sample_stratified_hash"].spark(spark, SF).collect()
    }
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "source").collect()
    want = set()
    for r in docs:
        rate = 250 + _h32(r.source, "rate") % 500
        if _h32(str(r.doc_id), "samp") % 1000 < rate:
            want.add((r.doc_id, r.source))
    assert got == want
    again = {
        (r.doc_id, r.source)
        for r in registry["sample_stratified_hash"].spark(spark, SF).collect()
    }
    assert again == got


def test_topk_per_key_is_exactly_k_and_uniform_by_hash(spark, registry):
    rows = registry["sample_topk_per_key"].spark(spark, SF).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "source").collect()
    per_src_ids: dict[str, list[int]] = {}
    for d in docs:
        per_src_ids.setdefault(d.source, []).append(d.doc_id)
    for src, picked in by_src.items():
        ids = per_src_ids[src]
        k = min(5, len(ids))
        assert sorted(r.pick_rank for r in picked) == list(range(1, k + 1))
        want = sorted(ids, key=lambda i: (_h32(str(i), "pick"), i))[:k]
        got = [r.doc_id for r in sorted(picked, key=lambda r: r.pick_rank)]
        assert got == want


def test_sessionize_partitions_events_and_bounds_gaps(spark, registry):
    sess = registry["agg_event_sessionize"].spark(spark, SF).collect()
    events = spark.read.parquet(f"{SF}/events.parquet").collect()
    # every event lands in exactly one session
    assert sum(r.n_events for r in sess) == len(events)
    # recompute one user's sessions serially
    uid = events[0].user_id
    mine = sorted(
        ((e.ts, e.event_id) for e in events if e.user_id == uid)
    )
    want_sessions, cur = [], [mine[0]]
    for prev, nxt in zip(mine, mine[1:]):
        # >= : a gap of exactly the window starts a new session
        # (session_window semantics — see _sessionized docstring)
        if (nxt[0] - prev[0]).total_seconds() >= 1800:
            want_sessions.append(cur)
            cur = []
        cur.append(nxt)
    want_sessions.append(cur)
    got = sorted(
        ((r.session_seq, r.n_events, r.duration_ms) for r in sess if r.user_id == uid)
    )
    want = [
        (i + 1, len(s), int((s[-1][0] - s[0][0]).total_seconds() * 1000))
        for i, s in enumerate(want_sessions)
    ]
    # unix_millis truncates to whole ms, so durations may differ by 1ms
    assert [g[:2] for g in got] == [w[:2] for w in want]
    for g, w in zip(got, want):
        assert abs(g[2] - w[2]) <= 1


def test_quantize_int8_range_and_extremes(spark, registry):
    rows = registry["emb_quantize_int8"].spark(spark, SF).collect()
    by_vec: dict[int, list] = {}
    for r in rows:
        by_vec.setdefault(r.vec_id, []).append(r.q)
    for vec_id, qs in by_vec.items():
        assert all(-127 <= q <= 127 for q in qs)
        if all(q == 0 for q in qs):  # all-zero vector: scale undefined
            continue
        # the max-|component| position must land on an int8 extreme
        assert max(qs) == 127 or min(qs) == -127


def test_pii_scrub_removes_all_pii_and_is_idempotent(spark, registry):
    from scrapeulous_spark.operators.catalog_engine import _PII_EMAIL, _PII_PHONE

    rows = registry["fn_pii_scrub"].spark(spark, SF).collect()
    assert rows and any(r.n_emails > 0 for r in rows) and any(
        r.n_phones > 0 for r in rows
    )
    # Rebuild the scrub in Python over the same corpus and verify the
    # digest — and that a second scrub pass changes nothing (no PII
    # survives one pass).
    from scrapeulous_spark.sources.corpus import SMOKE, ensure_corpus

    paths = ensure_corpus(SMOKE)
    bodies = {
        r.url: (r.body or "")
        for r in spark.read.parquet(paths["pages"]).select("url", "body").collect()
    }
    for r in rows[:50]:
        scrubbed = re.sub(_PII_PHONE, "[PHONE]", re.sub(_PII_EMAIL, "[EMAIL]", bodies[r.url]))
        assert hashlib.md5(scrubbed.encode()).hexdigest() == r.scrubbed_md5
        assert re.sub(_PII_PHONE, "[PHONE]", re.sub(_PII_EMAIL, "[EMAIL]", scrubbed)) == scrubbed


def test_robots_allow_longest_match(spark, registry):
    """Corpus URLs are all /pN: allow /p1 (len 3) beats disallow /p
    (len 2) for /p1* paths; everything else /p* is disallowed."""
    rows = registry["filt_robots_allow"].spark(spark, "unused").collect()
    assert rows
    for r in rows:
        path = r.url.split(".com", 1)[1]
        expect_allowed = path.startswith("/p1")
        assert r.allowed == expect_allowed, r
        assert r.matched_rule == ("/p1" if expect_allowed else "/p")


def test_curation_pipeline_stages_compose(spark, registry):
    rows = registry["pipeline_curation_e2e"].spark(spark, SF).collect()
    docs = {
        r.doc_id: r
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    assert rows
    seen_texts = {}
    for r in rows:
        d = docs[r.doc_id]
        toks = re.split(r"\s+", d.text.strip())
        # stage 1: every survivor passed the calibrated gate
        assert 50 <= len(toks) <= 100000
        kinds = len({"the", "a"} & set(toks))
        assert kinds >= 2
        # stage 3: every survivor passed the hash sample for its source
        rate = 250 + _h32(d.source, "rate") % 500
        assert _h32(str(r.doc_id), "samp") % 1000 < rate
        # stage 2: representatives are unique per text
        assert d.text not in seen_texts
        seen_texts[d.text] = r.doc_id
        assert r.n_copies >= 1
    # representative = min doc_id of its duplicate group among gated docs
    gated = [
        d for d in docs.values()
        if 50 <= len(re.split(r"\s+", d.text.strip())) <= 100000
        and len({"the", "a"} & set(re.split(r"\s+", d.text.strip()))) >= 2
    ]
    by_text = {}
    for d in gated:
        by_text.setdefault(d.text, []).append(d.doc_id)
    for r in rows:
        group = by_text[docs[r.doc_id].text]
        assert r.doc_id == min(group) and r.n_copies == len(group)


def test_url_canonicalize_semantics(spark, registry):
    rows = registry["fn_url_canonicalize"].spark(spark, "unused").collect()
    assert rows
    for r in rows:
        # fragment gone, tracking params gone, params sorted
        assert "#" not in r.canonical
        assert "utm_" not in r.canonical and "gclid=" not in r.canonical
        if "?" in r.canonical:
            ps = r.canonical.split("?", 1)[1].split("&")
            assert ps == sorted(ps) and all(p for p in ps)
        # the base url survives as the canonical prefix
        assert r.canonical.startswith(r.url.split("#")[0].split("?")[0])
    # the three decoration families produce the expected canonicals
    by_suffix = {r.raw.split(r.url, 1)[1]: r for r in rows}
    a = by_suffix.get("?utm_source=x&b=2&a=1#frag")
    if a:
        assert a.canonical == a.url + "?a=1&b=2"
    g = by_suffix.get("?gclid=g&z=9&utm_campaign=c")
    if g:
        assert g.canonical == g.url + "?z=9"
    f = by_suffix.get("#s1")
    if f:
        assert f.canonical == f.url


def test_canonicalize_col_matches_python_twin(spark):
    """Column twin == python twin on a deterministic hypothesis-shaped
    URL sample (one Spark job for the whole batch)."""
    import random

    from pyspark.sql import functions as F

    from scrapeulous_spark.functions.urls import canonicalize, canonicalize_col

    rng = random.Random(42)
    pools = ["a=1", "b=2", "z=", "utm_source=x", "gclid=g", "fbclid=f", "q=r"]
    urls = []
    for i in range(300):
        ps = rng.sample(pools, rng.randint(0, len(pools)))
        u = (
            f"http://h{i % 7}.example.com/p{i}"
            + ("?" + "&".join(ps) if ps else "")
            + ("#frag" if rng.random() < 0.4 else "")
        )
        urls.append(u)
    df = spark.createDataFrame([(u,) for u in urls], "raw string")
    got = {
        r.raw: r.canon
        for r in df.select("raw", canonicalize_col(F.col("raw")).alias("canon")).collect()
    }
    for u in urls:
        assert got[u] == canonicalize(u), u


def test_cluster_cc_matches_union_find(spark, registry):
    """Transitive-closure labels == an independent Python union-find
    over the SAME candidate pairs (the Spark side is iterative label
    propagation; a bug there — e.g. stopping one round early — would
    split a chained component, which union-find catches exactly)."""
    pairs = [
        (r.doc_a, r.doc_b)
        for r in registry["dedup_lsh_pairs"].spark(spark, SF).collect()
    ]
    assert pairs, "sf0.001 corpus must produce candidate pairs"
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    got = {
        r.doc_id: r.cluster_id
        for r in registry["dedup_cluster_cc"].spark(spark, SF).collect()
    }
    assert got == want


def test_cluster_canonical_one_keeper_per_cluster(spark, registry):
    """Exactly one kept doc per cluster, the keeper maximizes
    (n_chars, -doc_id), every document appears exactly once, and
    singleton docs keep themselves."""
    rows = registry["dedup_cluster_canonical"].spark(spark, SF).collect()
    docs = {
        r.doc_id: r.n_chars
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    assert sorted(r.doc_id for r in rows) == sorted(docs)
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        keepers = [r for r in members if r.is_kept]
        assert len(keepers) == 1, cid
        best = min(members, key=lambda r: (-docs[r.doc_id], r.doc_id))
        assert keepers[0].doc_id == best.doc_id
        if len(members) == 1:
            assert members[0].doc_id == cid or members[0].is_kept


def test_connected_components_chain_and_random_graphs(spark):
    """The corpus pair graph converges in ~2 rounds — exercise the
    iterative machinery where it earns its keep: a 65-node CHAIN
    (worst case for plain min-propagation, needs pointer jumping) and
    seeded random graphs, each checked against Python union-find."""
    import random

    from scrapeulous_spark.operators.pipeline import connected_components

    def uf(pairs):
        parent = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {x: find(x) for x in parent}

    cases = [[(i, i + 1) for i in range(65)]]  # descending-id chain
    rng = random.Random(7)
    for n, m in ((40, 25), (80, 60), (120, 40)):
        cases.append(
            [tuple(sorted(rng.sample(range(n), 2))) for _ in range(m)]
        )
    for pairs in cases:
        df = spark.createDataFrame(pairs, "a bigint, b bigint")
        got = {
            r.node: r.cluster_id
            for r in connected_components(df, "a", "b").collect()
        }
        assert got == uf(pairs), pairs[:5]


def test_img_admission_gate_rules_recomputed(spark, registry):
    """Each admission flag is a pure function of the metadata row —
    recompute all four rules in Python from the corpus parquet."""
    from scrapeulous_spark.sources.corpus import SMOKE, ensure_corpus

    paths = ensure_corpus(SMOKE)
    imgs = {
        r.image_id: r
        for r in spark.read.parquet(paths["images"])
        .select("image_id", "w", "h", "fmt", "caption")
        .collect()
    }
    rows = registry["img_admission_gate"].spark(spark, SF).collect()
    assert len(rows) == len(imgs)
    for r in rows:
        src = imgs[r.image_id]
        size_ok = src.w >= 24 and src.h >= 24
        aspect_ok = 1000 * max(src.w, src.h) <= 3000 * min(src.w, src.h)
        fmt_ok = src.fmt == "png"
        cap_ok = src.caption is not None and len(re.split(r"\s+", src.caption.strip())) >= 5
        assert (r.size_ok, r.aspect_ok, r.fmt_ok, r.cap_ok) == (
            size_ok,
            aspect_ok,
            fmt_ok,
            cap_ok,
        )
        assert r.admitted == (size_ok and aspect_ok and fmt_ok and cap_ok)


def test_shard_pack_recomputed(spark, registry):
    """Global prefix-sum exactness: the distributed two-pass result
    must equal the serial cumsum in image_id order, and shards must
    respect the 16 KiB budget (each shard's first row starts a new
    16384-byte window)."""
    from scrapeulous_spark.sources.corpus import SMOKE, ensure_corpus

    imgs = sorted(
        (r.image_id, len(bytes(r.bytes)))
        for r in spark.read.parquet(ensure_corpus(SMOKE)["images"])
        .select("image_id", "bytes")
        .collect()
    )
    rows = {r.image_id: r for r in registry["img_shard_pack"].spark(spark, SF).collect()}
    assert len(rows) == len(imgs)
    cum = 0
    shards = set()
    for iid, n in imgs:
        cum += n
        r = rows[iid]
        assert (r.nbytes, r.cum_bytes, r.shard_id) == (n, cum, (cum - 1) // 16384), iid
        shards.add(r.shard_id)
    assert len(shards) > 1  # the budget actually splits this corpus


def test_source_mix_recomputed(spark, registry):
    """Mixture weights and admission must equal a plain-Python
    recompute; apply must admit exactly the hash-selected doc set."""
    from collections import Counter

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "source").collect()
    n = Counter(r.source for r in docs)
    t = {s: _h32(s, "mix") % 20 + 1 for s in n}
    n_total, t_total = sum(n.values()), sum(t.values())
    max_ratio = max(t[s] / n[s] for s in n)
    import math

    for r in registry["sample_source_mix"].spark(spark, SF).collect():
        s = r.source
        assert r.n_docs == n[s] and r.t == t[s]
        assert r.weight_x1000 == math.floor(1000.0 * t[s] * n_total / (t_total * n[s]))
        assert r.admit_x1000 == math.floor(1000.0 * (t[s] / n[s]) / max_ratio)
    admit = {
        s: math.floor(1000.0 * (t[s] / n[s]) / max_ratio) for s in n
    }
    want = {
        r.doc_id
        for r in docs
        if _h32(str(r.doc_id), "mixsamp") % 1000 < admit[r.source]
    }
    got = {r.doc_id for r in registry["sample_mix_apply"].spark(spark, SF).collect()}
    assert got == want and 0 < len(got) < len(docs)


def test_rep_topgram_recomputed(spark, registry):
    """Top-2-gram repetition score recomputed serially per doc."""
    from collections import Counter

    docs = {
        r.doc_id: re.split(r"\s+", r.text.strip())
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    rows = registry["text_rep_topgram"].spark(spark, SF).collect()
    assert {r.doc_id for r in rows} == set(docs)
    for r in rows:
        toks = docs[r.doc_id]
        grams = Counter(
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        )
        maxc = max(grams.values()) if grams else 0
        want = 0 if not toks else int(1000 * 2 * maxc // len(toks))
        assert r.n_toks == len(toks), r.doc_id
        assert r.top2_count == maxc, r.doc_id
        assert r.rep_x1000 == want, (r.doc_id, r.rep_x1000, want)


def test_img_dedup_bytes_recomputed(spark, registry):
    """Payload-digest dedup groups exactly by raw byte equality."""
    import hashlib
    from collections import defaultdict

    from scrapeulous_spark.sources.corpus import SMOKE, ensure_corpus

    groups = defaultdict(list)
    for r in spark.read.parquet(ensure_corpus(SMOKE)["images"]).collect():
        groups[hashlib.md5(bytes(r.bytes).hex().upper().encode()).hexdigest()].append(
            r.image_id
        )
    got = {
        r.payload_digest: (r.representative, r.n_copies)
        for r in registry["img_dedup_bytes"].spark(spark, SF).collect()
    }
    assert got == {d: (min(ids), len(ids)) for d, ids in groups.items()}


def test_quality_bins_recomputed(spark, registry):
    """Exact decile assignment: global rank recomputed serially from
    the quality scores with the same (score, doc_id) tie-break; every
    bin must be populated and sizes may differ by at most 1."""
    from collections import Counter

    scores = {
        r.doc_id: r.stopword_x1000
        for r in registry["text_quality_score"].spark(spark, SF).collect()
    }
    order = sorted(scores, key=lambda d: (scores[d], d))
    n = len(order)
    want = {d: (10 * i) // n for i, d in enumerate(order)}
    rows = registry["sample_quality_bins"].spark(spark, SF).collect()
    assert len(rows) == n
    for r in rows:
        assert r.score == scores[r.doc_id], r.doc_id
        assert r.qbin == want[r.doc_id], (r.doc_id, r.qbin, want[r.doc_id])
    sizes = Counter(r.qbin for r in rows)
    assert set(sizes) == set(range(10))
    assert max(sizes.values()) - min(sizes.values()) <= 1


def test_df_topk_recomputed(spark, registry):
    """Document-frequency top-k recomputed serially (distinct tokens
    per doc, count docs per token, (n_docs desc, token) order)."""
    from collections import Counter

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("text").collect()
    df_counts = Counter()
    for r in docs:
        for tok in set(re.split(r"\s+", r.text.strip())):
            df_counts[tok] += 1
    want = sorted(df_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    rows = sorted(registry["text_df_topk"].spark(spark, SF).collect(), key=lambda r: r.rank)
    assert [(r.token, r.n_docs) for r in rows] == want
    assert [r.rank for r in rows] == list(range(1, len(want) + 1))


def test_exact_percentiles_match_percentile_cont(spark, registry):
    """The rank-based distributed percentile must reproduce Spark's
    own percentile() (percentile_cont semantics, group-buffering
    reference implementation) exactly in scaled-integer space — a
    rank/interpolation bug the DuckDB twin could share (same SQL
    shape) cannot survive this independent oracle."""
    from pyspark.sql import functions as F

    ours = {
        r["event_type"]: (r["p50_e4"], r["p95_e4"], r["p99_e4"])
        for r in registry["agg_value_percentiles"].spark(spark, SF).collect()
    }
    # reference: percentile() over values pre-scaled to exact cents, so
    # its double interpolation (cents * fraction with <=2 digits) is
    # exact and *10**4 has no representation error
    ref_rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("event_type", F.round(F.col("value") * 100).cast("bigint").alias("vc"))
        .groupBy("event_type")
        .agg(F.percentile("vc", [0.50, 0.95, 0.99]).alias("ps"))
        .collect()
    )
    ref = {
        r["event_type"]: tuple(int(round(p * 100)) for p in r["ps"]) for r in ref_rows
    }
    assert ours == ref


def test_rolling_rate_window_semantics(spark, registry):
    """Trailing-10-min counts recomputed per user in plain Python over
    the collected events: every event's count equals the number of
    that user's events with ts in (ts - 10min, ts] — inclusive bounds,
    millisecond precision, ties counted as peers."""
    from pyspark.sql import functions as F

    got = {
        r["event_id"]: r["n_trailing_10m"]
        for r in registry["agg_event_rolling_rate"].spark(spark, SF).collect()
    }
    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(
            "event_id",
            "user_id",
            F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"),
        )
        .collect()
    )
    by_user: dict[int, list[int]] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r["ms"])
    for r in rows:
        peers = by_user[r["user_id"]]
        want = sum(1 for m in peers if r["ms"] - 600_000 <= m <= r["ms"])
        assert got[r["event_id"]] == want, r["event_id"]


def test_session_range_join_partitions_events(spark, registry):
    """Independent invariant for join_event_session_range (its DuckDB
    twin shares the SQL shape, so a shared bounds bug would pass the
    comparator): the intervals must PARTITION the events — every event
    joins back to exactly one session — and per-user session counts
    must agree with agg_event_sessionize."""
    from pyspark.sql import functions as F

    joined = registry["join_event_session_range"].spark(spark, SF).cache()
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    # exactly one session per event: no row lost, no event in 2 intervals
    assert joined.count() == n_events
    assert joined.select("event_id").distinct().count() == n_events
    sess_counts = {
        (r["user_id"], r["n_sessions"])
        for r in joined.groupBy("user_id")
        .agg(F.countDistinct("session_seq").alias("n_sessions"))
        .collect()
    }
    ref = {
        (r["user_id"], r["n_sessions"])
        for r in registry["agg_event_sessionize"]
        .spark(spark, SF)
        .groupBy("user_id")
        .agg(F.countDistinct("session_seq").alias("n_sessions"))
        .collect()
    }
    assert sess_counts == ref


def test_pagerank_matches_pure_python(spark, registry):
    """rank_link_pagerank recomputed with Python dicts over the same
    smoke corpus — a fully independent third implementation (the
    DuckDB twin shares the SQL structure; this shares nothing)."""
    from scrapeulous_spark.functions import urls as U
    from scrapeulous_spark.operators.catalog_engine import _PR_ITERS, _PR_MASS
    from scrapeulous_spark.sources.corpus import SMOKE, ensure_corpus

    paths = ensure_corpus(SMOKE)
    pages = spark.read.parquet(paths["pages"]).select("url", "out_links").collect()
    nodes = [r.url for r in pages]
    node_set = set(nodes)
    edges = []
    for r in pages:
        origin = U.origin_of(r.url)
        for lnk in r.out_links or []:
            d = U.resolve(lnk, origin)
            if d is not None:
                d = U.normalize(d)
                if d in node_set:
                    edges.append((r.url, d))
    deg: dict[str, int] = {}
    for s, _d in edges:
        deg[s] = deg.get(s, 0) + 1
    n = len(nodes)
    base = (_PR_MASS * 15 // 100) // n
    rank = {u: _PR_MASS // n for u in nodes}
    for _ in range(_PR_ITERS):
        s: dict[str, int] = {}
        for src, dst in edges:
            s[dst] = s.get(dst, 0) + rank[src] // deg[src]
        rank = {u: base + (85 * s.get(u, 0)) // 100 for u in nodes}
    got = {
        (r.url, r.pr_scaled)
        for r in registry["rank_link_pagerank"].spark(spark, SF).collect()
    }
    assert got == set(rank.items())
    # the graph must actually differentiate nodes
    assert len({v for _u, v in got}) > 1
