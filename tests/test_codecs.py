"""Codec + verify-kernel unit tests (the §2.9 fetch operator's kernels)."""

import numpy as np
import pytest

from visiblev8_crawler_spark import codecs
from visiblev8_crawler_spark.sources import synth
from visiblev8_crawler_spark.verify import verify_image_row


def test_png_roundtrip_exact():
    a = codecs.pixels_for("t1", 24, 16)
    assert np.array_equal(codecs.decode_png(codecs.encode_png(a)), a)


def test_png_rejects_truncation():
    data = codecs.encode_png(codecs.pixels_for("t2", 16, 16))
    with pytest.raises(ValueError):
        codecs.decode_png(data[: len(data) // 2])


def _encode_png_with_filters(arr: np.ndarray, row_filters: list[int]) -> bytes:
    """Forward-filter each scanline per the PNG spec (the encode side our
    filter-0-only encoder never exercises) so decode_png's filter 1-4
    reconstruction can be checked against ground truth."""
    import struct
    import zlib

    h, w = arr.shape[:2]
    bpp, stride = 3, w * 3
    lines = arr.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        cur, f = lines[y], row_filters[y % len(row_filters)]
        a = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
        c = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - a
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            enc = cur - ((a + prev) >> 1)
        else:  # paeth
            p = a + prev - c
            pa, pb, pc = np.abs(p - a), np.abs(p - prev), np.abs(p - c)
            pr = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, prev, c))
            enc = cur - pr
        raw.append(f)
        raw.extend((enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + codecs._png_chunk(b"IHDR", ihdr)
        + codecs._png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + codecs._png_chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_decode_all_filters(filters):
    """decode_png reconstructs scanlines under every PNG filter type — the
    real-world-PNG path our own encoder (filter 0 only) never produces."""
    a = codecs.pixels_for(f"tf{filters[0]}", 25, 17)  # odd sizes on purpose
    assert np.array_equal(codecs.decode_png(_encode_png_with_filters(a, filters)), a)


def test_lossy_meets_psnr_gate():
    a = codecs.pixels_for("t3", 32, 32)
    d = codecs.decode_lossy(codecs.encode_lossy(a))
    assert codecs.psnr(d, a) >= codecs.PSNR_LOSSY_THRESHOLD_DB


def test_phash_stable_and_sensitive():
    a = codecs.pixels_for("t4", 32, 32)
    b = codecs.pixels_for("t5-different", 32, 32)
    assert codecs.phash64(a) == codecs.phash64(a)
    assert codecs.phash64(a) != codecs.phash64(b)


def test_captions_deterministic():
    assert codecs.caption_for("x") == codecs.caption_for("x")
    assert codecs.caption_for("x") != codecs.caption_for("y")


def test_verify_matches_expected_statuses():
    """Every generated corruption bucket is flagged with exactly the intended
    status (the failed-crawl handling analog, vv8_worker/tasks.py:281-289)."""
    rows = [synth.image_row(i) for i in range(300)]
    seen = set()
    for r in rows:
        v = verify_image_row(
            r["image_id"], r["bytes"], r["w"], r["h"], r["fmt"], r["caption"], r["phash"]
        )
        assert v.status == r["_expected_status"], r["image_id"]
        seen.add(v.status)
    assert {"OK", "DECODE_ERROR"} <= seen  # corpus exercises failures


def test_verify_timeout_budget():
    from visiblev8_crawler_spark.sources import synth
    from visiblev8_crawler_spark.verify import verify_image_row

    r = next(synth.image_row(i) for i in range(50) if synth.image_row(i)["_expected_status"] == "OK")
    args = (r["image_id"], r["bytes"], r["w"], r["h"], r["fmt"], r["caption"], r["phash"])
    assert verify_image_row(*args, timeout_ms=1e9).status == verify_image_row(*args).status
    v = verify_image_row(*args, timeout_ms=0.0)
    assert v.status == "TIMEOUT" and "budget" in v.error
    from visiblev8_crawler_spark.simulator import RETRYABLE

    assert "TIMEOUT" in RETRYABLE  # retry-once applies, like any failed fetch


def test_verify_not_found():
    assert verify_image_row("img_x", None, None, None, None, None, None).status == "NOT_FOUND"
