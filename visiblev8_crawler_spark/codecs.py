"""Deterministic image codecs + verification kernels (pure numpy, no native libs).

The reference "fetches" a page with an instrumented Chromium and validates the
artifacts it gets back (celery_workers/vv8_worker/tasks.py:105-178,
vv8_crawler/crawler.js:774-930). Per BASELINE.json ``north_rule``/``input_hint``
the rebuild replaces that browser with a *verifiable* fetch over an
image+caption table: decode the ``bytes`` column, check decoded pixels against
the deterministically re-derivable reference pixels (PSNR >= 40 dB for lossy
formats, exact for lossless), and check caption equality.

This container has no image libraries (no PIL/cv2), so:

- ``png``  : a real, spec-compliant PNG codec implemented on zlib+struct
             (8-bit RGB, filter type 0). Any standard PNG reader can decode
             our output; we decode filters 0-4 so standard encoders' output
             (e.g. Pillow's) also round-trips.
- ``jpeg`` : if Pillow is importable we use real JPEG (quality 85).
             Otherwise we fall back to ``VJPG`` — a clearly-marked
             DETERMINISTIC LOSSY STAND-IN (uniform quantizer, step q=4,
             zlib-compressed) whose reconstruction error (~q/sqrt(12) RMSE,
             PSNR ~= 47 dB) makes the PSNR>=40 dB gate meaningful. The
             container format is ``b"VJPG" + ver + w + h + q + zlib(idx)``.

Everything here is vectorizable per Arrow batch: these kernels are only ever
called from pandas UDFs / mapInPandas (operators/fetch.py) or from the
deterministic data generator (sources/synth.py) and the pure-Python reference
simulator (simulator.py) — never per-row from the driver.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np

try:  # real JPEG when available; deterministic fallback otherwise
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

PSNR_LOSSY_THRESHOLD_DB = 40.0
_VJPG_MAGIC = b"VJPG"
_VJPG_Q = 4  # quantizer step -> ~47 dB PSNR, safely above the 40 dB gate

# ---------------------------------------------------------------------------
# PNG (lossless)
# ---------------------------------------------------------------------------


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """Encode HxWx3 uint8 -> PNG bytes (color type 2, bit depth 8, filter 0)."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_png expects HxWx3 uint8")
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 1:] = arr.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode 8-bit RGB PNG -> HxWx3 uint8. Handles scanline filters 0-4."""
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, ihdr, idat = 8, None, []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError("truncated PNG chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, ctype, _, _, interlace = ihdr
    if depth != 8 or ctype != 2 or interlace != 0:
        raise ValueError(f"unsupported PNG variant depth={depth} ctype={ctype}")
    raw = zlib.decompress(b"".join(idat))
    stride = w * 3
    if len(raw) != h * (1 + stride):
        raise ValueError("bad PNG payload size")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    filters, lines = raw[:, 0], raw[:, 1:]
    if not filters.any():
        # filter-0-everywhere fast path (our own encoder always writes
        # filter 0): rec == cur for every scanline, so the per-line loop
        # is a straight copy — identical output, no per-row Python
        return lines.reshape(h, w, 3).copy()
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = 3
    for y in range(h):
        f, cur = filters[y], lines[y].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:
            rec = cur
        elif f == 2:  # Up — vectorized
            rec = (cur + prev) & 0xFF
        elif f == 1:  # Sub — a per-channel prefix sum: rec[x] = cumsum mod 256
            rec = np.empty(stride, np.int32)
            for c in range(bpp):
                rec[c::bpp] = np.cumsum(cur[c::bpp], dtype=np.int64) & 0xFF
        elif f in (3, 4):  # Average / Paeth: sequential in x by definition;
            # plain-int Python loop (numpy scalar indexing is ~10x slower)
            cl, pl = cur.tolist(), prev.tolist()
            rl = [0] * stride
            if f == 3:
                for x in range(stride):
                    a = rl[x - bpp] if x >= bpp else 0
                    rl[x] = (cl[x] + ((a + pl[x]) >> 1)) & 0xFF
            else:
                for x in range(stride):
                    a = rl[x - bpp] if x >= bpp else 0
                    b = pl[x]
                    c = pl[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rl[x] = (cl[x] + pr) & 0xFF
            rec = np.asarray(rl, dtype=np.int32)
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = rec.astype(np.uint8)
    return out.reshape(h, w, 3)


# ---------------------------------------------------------------------------
# Lossy codec: real JPEG via PIL when present, VJPG fallback otherwise
# ---------------------------------------------------------------------------


def _encode_vjpg(arr: np.ndarray, q: int = _VJPG_Q) -> bytes:
    h, w = arr.shape[:2]
    idx = (arr.astype(np.uint16) // q).astype(np.uint8)
    return _VJPG_MAGIC + struct.pack(">BIIB", 1, w, h, q) + zlib.compress(idx.tobytes(), 6)


def _decode_vjpg(data: bytes) -> np.ndarray:
    if data[:4] != _VJPG_MAGIC:
        raise ValueError("not a VJPG")
    ver, w, h, q = struct.unpack(">BIIB", data[4:14])
    if ver != 1:
        raise ValueError("bad VJPG version")
    raw = zlib.decompress(data[14:])
    if len(raw) != h * w * 3:
        raise ValueError("bad VJPG payload size")
    idx = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3).astype(np.uint16)
    return np.minimum(idx * q + q // 2, 255).astype(np.uint8)


def encode_lossy(arr: np.ndarray) -> bytes:
    if _HAVE_PIL:
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(arr, "RGB").save(buf, "JPEG", quality=85)
        return buf.getvalue()
    return _encode_vjpg(arr)


def decode_lossy(data: bytes) -> np.ndarray:
    if data[:4] == _VJPG_MAGIC:
        return _decode_vjpg(data)
    if _HAVE_PIL:
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    raise ValueError("unknown lossy container (no PIL in this environment)")


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(arr)
    if fmt == "jpeg":
        return encode_lossy(arr)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpeg":
        return decode_lossy(data)
    raise ValueError(f"unknown fmt {fmt!r}")


# ---------------------------------------------------------------------------
# Verification kernels
# ---------------------------------------------------------------------------


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    if a.shape != b.shape:
        return 0.0
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0.0:
        return float("inf")
    return float(20.0 * np.log10(255.0) - 10.0 * np.log10(mse))


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n).reshape(-1, 1)
    i = np.arange(n).reshape(1, -1)
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2.0 * n))
    m[0] = np.sqrt(1.0 / n)
    return m


_DCT32 = _dct_matrix(32)


def phash64(arr: np.ndarray) -> int:
    """64-bit DCT perceptual hash (signed int64, matching the table's phash
    column — SURVEY.md §1.2 maps the reference's BYTEA hashes to int64 keys).

    Grayscale -> nearest-neighbor 32x32 -> 2D DCT -> top-left 8x8 minus DC ->
    bit = coefficient > median.
    """
    return int(phash64_batch([arr])[0])


def phash64_batch(arrs: list) -> np.ndarray:
    """Vectorized phash64 over a batch of images (optimization round 6,
    guide §4.2): the per-image resize stays a cheap slice, but the two
    32x32 DCT matmuls, the medians and the bit packing run batched over
    the whole stack. Bit-identical to the scalar path: np.matmul over a
    stack invokes the same GEMM per slice, np.median selects the same
    middle elements per row, and bit packing is exact integer arithmetic
    (pinned by tests/test_imageops.py goldens and test_kernel_parity)."""
    n = len(arrs)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    smalls = np.empty((n, 32, 32), dtype=np.float64)
    for i, arr in enumerate(arrs):
        gray = arr.astype(np.float64).mean(axis=2)
        h, w = gray.shape
        ys = (np.arange(32) * h // 32).clip(0, h - 1)
        xs = (np.arange(32) * w // 32).clip(0, w - 1)
        smalls[i] = gray[np.ix_(ys, xs)]
    dct = np.matmul(np.matmul(_DCT32, smalls), _DCT32.T)
    block = dct[:, :8, :8].copy().reshape(n, 64)
    block[:, 0] = np.median(block[:, 1:], axis=1)  # neutralize DC
    med = np.median(block, axis=1)
    bits = block > med[:, None]
    weights = np.left_shift(np.uint64(1), np.arange(63, -1, -1, dtype=np.uint64))
    val = (bits.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)
    return val.view(np.int64)


# ---------------------------------------------------------------------------
# Deterministic reference pixels + captions (derivable from image_id alone,
# which is what makes the fetch verifiable without a second artifact store)
# ---------------------------------------------------------------------------

_CAPTION_WORDS = (
    "amber basalt cedar delta ember fjord garnet harbor iris juniper krill "
    "lagoon meadow nectar onyx prairie quartz reef summit tundra umber vale "
    "willow xenon yarrow zephyr"
).split()


def _seed_for(image_id: str) -> int:
    return int.from_bytes(hashlib.sha256(image_id.encode()).digest()[:8], "big")


def pixels_for(image_id: str, w: int, h: int) -> np.ndarray:
    """Procedural reference pixels: seeded gradients + noise, HxWx3 uint8."""
    rng = np.random.default_rng(_seed_for(image_id))
    gx = np.linspace(0, 255, w, dtype=np.float64)
    gy = np.linspace(0, 255, h, dtype=np.float64)
    base = np.stack(
        [
            np.add.outer(gy * rng.uniform(0.2, 1.0), gx * rng.uniform(0.2, 1.0)) / 2,
            np.add.outer(gy[::-1] * rng.uniform(0.2, 1.0), gx * rng.uniform(0.2, 1.0)) / 2,
            np.add.outer(gy * rng.uniform(0.2, 1.0), gx[::-1] * rng.uniform(0.2, 1.0)) / 2,
        ],
        axis=2,
    )
    noise = rng.normal(0, 12.0, size=(h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def caption_for(image_id: str) -> str:
    seed = _seed_for(image_id)
    n = len(_CAPTION_WORDS)
    words = [_CAPTION_WORDS[(seed >> (7 * k)) % n] for k in range(4)]
    return " ".join(words)
