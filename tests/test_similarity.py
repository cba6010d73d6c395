"""Semantics pins for the ANN search ops beyond the DuckDB comparator:
the probed search must relate to the brute-force baseline exactly the
way IVF promises (candidates = probed cells; scores identical to brute
force on the candidate set; recall loss only ever from unprobed cells).
"""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def registry():
    from scrapeulous_spark.operators import load_all_catalogs

    return load_all_catalogs()


def test_ivf_topk_is_brute_force_over_probed_cells(spark, registry):
    from scrapeulous_spark.operators.pipeline import _IVF_NPROBE, _ivf_assign

    assign = {
        (r.vec_id, r.rn): r.cell for r in _ivf_assign(spark, SF).collect()
    }
    probed = {assign[(0, rn)] for rn in range(1, _IVF_NPROBE + 1)}
    got = registry["sim_ivf_topk"].spark(spark, SF).collect()

    # every returned vector is assigned (rn=1) to a probed cell
    for r in got:
        assert assign[(r.vec_id, 1)] in probed, r

    # scores + ranking == brute force restricted to the candidate set
    brute = {
        r.vec_id: r.cos_x10000
        for r in registry["sim_cosine_topk"].spark(spark, SF).collect()
    }
    cand_in_brute = [r for r in got if r.vec_id in brute]
    for r in cand_in_brute:
        assert r.cos_x10000 == brute[r.vec_id], r

    # any brute-force top-10 vector the probe MISSED lives in an
    # unprobed cell — recall loss has exactly one cause
    missed = set(brute) - {r.vec_id for r in got}
    for v in missed:
        assert assign[(v, 1)] not in probed, v


def test_phash_neardup_equals_brute_force(spark, registry):
    """The multi-index candidate join must be EXACT at radius 3 — the
    DuckDB twin uses the same chunk join, so pin recall against an
    all-pairs Python brute force instead."""
    from scrapeulous_spark.operators.catalog_engine import _P, _PHASH_RADIUS

    imgs = [
        (r.image_id, r.phash)
        for r in spark.read.parquet(_P["images"]).select("image_id", "phash").collect()
    ]
    want = set()
    for i, (ida, pa) in enumerate(imgs):
        for idb, pb in imgs[i + 1:]:
            hd = bin(pa ^ pb).count("1")
            if hd <= _PHASH_RADIUS:
                a, b = sorted((ida, idb))
                want.add((a, b, hd))
    got = {
        (r.image_a, r.image_b, r.hamming)
        for r in registry["img_phash_neardup"].spark(spark, SF).collect()
    }
    assert want, "smoke corpus must contain near-dup phashes"
    assert got == want


def test_img_curation_e2e_invariants(spark, registry):
    """Composed image+caption pipeline: (a) exactly the >=5-token-
    caption images appear, (b) one keeper per cluster and the keeper
    has the longest caption (ties to min image_id), (c) clusters agree
    with a union-find over phash pairs RESTRICTED to admitted images
    (the gate runs before the pair join)."""
    from scrapeulous_spark.operators.catalog_engine import (
        _CAP_MIN_TOKENS,
        _P,
        _PHASH_RADIUS,
    )

    imgs = spark.read.parquet(_P["images"]).select(
        "image_id", "phash", "caption"
    ).collect()
    adm = {
        r.image_id: (len(r.caption.strip()), r.phash)
        for r in imgs
        if r.caption is not None and len(r.caption.strip().split()) >= _CAP_MIN_TOKENS
    }
    rows = registry["img_curation_e2e"].spark(spark, SF).collect()
    assert sorted(r.image_id for r in rows) == sorted(adm)

    ids = sorted(adm)
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin(adm[a][1] ^ adm[b][1]).count("1") <= _PHASH_RADIUS:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    for r in rows:
        assert r.cluster_id == find(r.image_id), r

    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        keepers = [r for r in members if r.is_kept]
        assert len(keepers) == 1, cid
        best = min(members, key=lambda r: (-adm[r.image_id][0], r.image_id))
        assert keepers[0].image_id == best.image_id


def test_emb_semdedup_recomputed(spark, registry):
    """Full serial recompute of the SemDeDup pipeline: centroid
    assignment, within-cell cosine pairs at the 0.35 threshold,
    union-find closure, min-id keeper — every row's (cell, sem_cluster,
    is_kept) must match, and both keeper outcomes must occur."""
    import hashlib
    import math
    from collections import defaultdict

    def h32(s, salt):
        return int(hashlib.md5(f"{salt}:{s}".encode()).hexdigest()[:8], 16)

    emb = {
        r.vec_id: [round(float(x) * 10000) for x in r.embedding]
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    cents = {
        c: [5000 if h32(f"{c}:{i}", "ivf") % 2 == 1 else -5000 for i in range(64)]
        for c in range(8)
    }
    cell = {
        v: max(cents, key=lambda c: (sum(a * b for a, b in zip(e, cents[c])), -c))
        for v, e in emb.items()
    }
    by_cell = defaultdict(list)
    for v in sorted(emb):
        by_cell[cell[v]].append(v)
    parent = {v: v for v in emb}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    n2 = {v: sum(x * x for x in e) for v, e in emb.items()}
    for vs in by_cell.values():
        for i, a in enumerate(vs):
            for b in vs[i + 1 :]:
                dot = sum(x * y for x, y in zip(emb[a], emb[b]))
                cos = math.floor(10000.0 * dot / (math.sqrt(n2[a]) * math.sqrt(n2[b])))
                if cos >= 3500:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    rows = registry["emb_semdedup"].spark(spark, SF).collect()
    assert len(rows) == len(emb)
    kept_flags = set()
    for r in rows:
        root = find(r.vec_id)
        assert r.cell == cell[r.vec_id], r.vec_id
        assert r.sem_cluster == root, r.vec_id
        assert r.is_kept == (root == r.vec_id), r.vec_id
        kept_flags.add(r.is_kept)
    assert kept_flags == {True, False}
