"""64-bit block-mean perceptual hash over decoded pixels.

Deterministic, pure numpy. Used for the ``phash BIGINT`` column of the
north-rule input table (BASELINE.json ``input_hint``) and re-derived by
the payload validator to prove the decode path is faithful.
"""

from __future__ import annotations

import numpy as np


def phash64(pixels: np.ndarray) -> int:
    """Block-mean hash: grayscale -> 8x8 block means -> bits vs mean.

    Returns a signed 64-bit int (two's complement) so it fits a Spark
    / parquet BIGINT exactly.
    """
    gray = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    # trim to a multiple of 8 then block-mean down to 8x8
    th, tw = (h // 8) * 8, (w // 8) * 8
    if th == 0 or tw == 0:
        raise ValueError("image too small for phash")
    g = gray[:th, :tw].reshape(8, th // 8, 8, tw // 8).mean(axis=(1, 3))
    bits = (g >= g.mean()).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    if val >= 1 << 63:
        val -= 1 << 64
    return val


def phash64_batch(batch: "list[np.ndarray]") -> np.ndarray:
    return np.array([phash64(p) for p in batch], dtype=np.int64)
