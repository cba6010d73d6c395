"""Multimodal operator invariants: real decode/resize/features over the
binary image column, stubbed-but-plumbed video frame sampling, and the
no-shuffle plan property (payload bytes must stay in a narrow map)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scrapeulous_spark.codec.phash import phash64  # noqa: E402
from scrapeulous_spark.codec.png import png_decode  # noqa: E402
from scrapeulous_spark.operators import multimodal as MM  # noqa: E402
from scrapeulous_spark.sources.corpus import SMOKE, ensure_corpus, image_pixels  # noqa: E402


@pytest.fixture(scope="module")
def images(spark):
    return spark.read.parquet(ensure_corpus(SMOKE)["images"])


def test_resize_dims_and_determinism(spark, images):
    out = MM.resize_images(images, 16, 12).toPandas().set_index("image_id")
    assert (out["w"] == 16).all() and (out["h"] == 12).all()
    assert len(out) == images.count()
    # spot-check one row against a driver-side recompute
    iid = out.index[0]
    row = images.filter(f"image_id = '{iid}'").select("bytes").head()
    px = png_decode(bytes(row[0]))
    ys = (np.arange(12) * px.shape[0] // 12).astype(np.int64)
    xs = (np.arange(16) * px.shape[1] // 16).astype(np.int64)
    small = px[ys][:, xs]
    dec = png_decode(bytes(out.loc[iid, "bytes"]))
    assert np.array_equal(dec, small)
    assert int(out.loc[iid, "phash"]) == phash64(small)


def test_features_match_numpy(spark, images):
    out = MM.image_features(images).toPandas().set_index("image_id")
    assert len(out) == images.count()
    iid = out.index[0]
    r = images.filter(f"image_id = '{iid}'").select("bytes", "w", "h").head()
    px = png_decode(bytes(r[0])).astype(np.float64)
    assert int(out.loc[iid, "mean_r_x1000"]) == int(round(px[..., 0].mean() * 1000))
    assert int(out.loc[iid, "std_gray_x1000"]) == int(
        round(px.mean(axis=2).std() * 1000)
    )


def test_frame_sample_stub_plumbing(spark, images):
    out = MM.frame_sample(images.limit(10), n_frames=4).toPandas()
    # 1-frame stub clip -> even sampling dedups to a single frame 0
    assert set(out["frame_idx"]) == {0}
    assert set(out["ts_ms"]) == {0}
    assert len(out) == 10
    # frame phash equals the phash of the decoded payload (fake decode
    # returns the PNG itself as the only frame)
    row = images.limit(1).select("image_id", "bytes").head()
    got = out.set_index("media_id").loc[row[0], "frame_phash"]
    assert int(got) == phash64(png_decode(bytes(row[1])))


def test_multimodal_plans_have_no_shuffle(spark, images):
    for df in (
        MM.resize_images(images, 16, 12),
        MM.image_features(images),
        MM.frame_sample(images),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


def test_payload_invariants_hold(spark, images):
    """BASELINE.json input_hint invariant: decoded-pixel allclose and
    PSNR>=40dB for the lossy format, on every corpus row."""
    from scrapeulous_spark.operators.fetch import validate_payloads

    rep = validate_payloads(images).toPandas()
    assert rep["decode_ok"].all()
    assert rep["pixels_allclose"].all()
    assert (rep["psnr_db"] >= 40.0).all()


def test_caption_align_recomputed(spark):
    """Recompute the alignment score in plain Python (codec decode +
    md5 caption projection) for every corpus row; the gate must split
    rows on this corpus (both flags present) or the threshold is
    verifying a constant."""
    import hashlib
    import math

    import numpy as np

    from scrapeulous_spark.codec.png import png_decode
    from scrapeulous_spark.operators import load_all_catalogs
    from scrapeulous_spark.sources.corpus import SMOKE, ensure_corpus

    reg = load_all_catalogs()
    rows = {r.image_id: r for r in reg["img_caption_align"].spark(spark, "unused").collect()}
    imgs = spark.read.parquet(ensure_corpus(SMOKE)["images"]).collect()
    assert len(rows) == len(imgs)

    def h32(s, salt):
        return int(hashlib.md5(f"{salt}:{s}".encode()).hexdigest()[:8], 16)

    flags = set()
    for r in imgs:
        px = png_decode(bytes(r.bytes)).astype(np.float64)
        means = px.mean(axis=(0, 1))
        v = [int(round(means[i] * 1000)) for i in range(3)] + [
            int(round(px.mean(axis=2).std() * 1000)) + 1
        ]
        c = [h32(r.caption, f"cap{d}") % 1000 + 1 for d in range(4)]
        dot = sum(a * b for a, b in zip(v, c))
        want = math.floor(
            1000.0 * dot / (math.sqrt(sum(x * x for x in v)) * math.sqrt(sum(x * x for x in c)))
        )
        got = rows[r.image_id]
        assert got.align_x1000 == want, r.image_id
        assert got.aligned == (want >= 850)
        flags.add(got.aligned)
    assert flags == {True, False}


def test_caption_safety_recomputed(spark):
    """Blocklist gate recomputed serially; both outcomes present."""
    import re as _re

    from scrapeulous_spark.operators import load_all_catalogs
    from scrapeulous_spark.operators.multimodal import _CAPTION_BLOCKLIST
    from scrapeulous_spark.sources.corpus import SMOKE, ensure_corpus

    reg = load_all_catalogs()
    rows = {r.image_id: r for r in reg["filt_caption_safety"].spark(spark, "x").collect()}
    caps = spark.read.parquet(ensure_corpus(SMOKE)["images"]).select(
        "image_id", "caption"
    ).collect()
    assert len(rows) == len(caps)
    seen_flags = set()
    for c in caps:
        hits = [
            t for t in _re.split(r"\s+", c.caption.strip())
            if t.lower() in _CAPTION_BLOCKLIST
        ]
        r = rows[c.image_id]
        assert r.n_matched == len(hits), c.image_id
        assert r.matched_term == (min(hits) if hits else None), c.image_id
        assert r.safe == (not hits)
        seen_flags.add(r.safe)
    assert seen_flags == {True, False}
