"""Pure zlib/struct PNG codec — no PIL/cv2 in the environment.

The north-rule input table carries encoded image payloads
(``bytes BINARY``) plus ``fmt`` of ``'png'`` (lossless) or ``'qpng'``
(a quantized variant standing in for a lossy format, to exercise the
PSNR >= 40 dB invariant from BASELINE.json ``input_hint``).

Only what the engine needs: 8-bit RGB (colour type 2), filter 0
scanlines. Encode and decode are exact inverses for ``png``;
``qpng`` quantizes pixels to a step-4 grid before encoding (max abs
error 2 -> PSNR ~= 46 dB, comfortably above the 40 dB gate).

Reference analog: binary payloads moved as files/base64 in
/root/reference/custom/pdf.js:29-32 and screenshot.js:18-30; the
image bytes fetched from S3 in reverse_image_google.js:47-51.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# Quantization step for the 'qpng' lossy stand-in format.
QPNG_STEP = 4


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def png_encode(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a PNG byte string."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("png_encode expects (h, w, 3) uint8")
    h, w = pixels.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # filter byte 0 per scanline
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def quantize(pixels: np.ndarray, step: int = QPNG_STEP) -> np.ndarray:
    """Lossy quantization used by the 'qpng' format (step-4 grid + 2)."""
    return ((pixels.astype(np.uint16) // step) * step + step // 2).clip(0, 255).astype(np.uint8)


def encode(pixels: np.ndarray, fmt: str = "png") -> bytes:
    if fmt == "png":
        return png_encode(pixels)
    if fmt == "qpng":
        return png_encode(quantize(pixels))
    raise ValueError(f"unknown fmt {fmt!r}")


def resize_indices(
    src_h: int, src_w: int, out_h: int, out_w: int
) -> tuple[np.ndarray, np.ndarray]:
    """Nearest-neighbor row/col index arrays — the ONE definition used
    by both the resize operator (operators/multimodal.py) and the
    expected-value sidecar generator (sources/corpus.py), so the
    ground truth can never drift from the code it validates."""
    ys = (np.arange(out_h) * src_h // out_h).astype(np.int64)
    xs = (np.arange(out_w) * src_w // out_w).astype(np.int64)
    return ys, xs


def png_decode(data: bytes) -> np.ndarray:
    """Decode a PNG produced by :func:`png_encode` back to (h, w, 3)
    uint8. Raises ValueError for ANY malformed input — truncated chunk
    headers and corrupt deflate streams included (struct/zlib errors
    are converted so callers can rely on one exception type)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    try:
        return _png_decode_body(data)
    except ValueError:
        raise
    except Exception as e:  # struct.error, zlib.error, reshape failures
        raise ValueError(f"malformed PNG: {e}") from e


def _png_decode_body(data: bytes) -> np.ndarray:
    pos = 8
    w = h = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or ctype != 2 or interlace != 0:
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    rows = raw.reshape(h, 1 + w * 3)
    if not (rows[:, 0] == 0).all():
        raise ValueError("unsupported PNG filter")
    return rows[:, 1:].reshape(h, w, 3).copy()


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical arrays."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)
