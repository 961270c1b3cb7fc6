"""Per-row fetch verification kernel — the rebuild's analog of the reference's
artifact validation / failed-crawl handling (celery_workers/vv8_worker/
tasks.py:105-178, 281-289).

One pure function, shared by the Spark Arrow UDF (operators/fetch.py) and the
pure-Python reference simulator (simulator.py), so "Spark result == simulator
result" is a scheduling-equality test, not a kernel-equality test.

Statuses (ordered: first failing check wins):
  NOT_FOUND        url's image_id has no row in the images table
  DECODE_ERROR     bytes don't decode (truncation analog of a failed crawl)
  TIMEOUT          decode exceeded the per-fetch budget (vv8_worker
                   tasks.py:131-141 hard-timeout analog; Spark has no
                   per-row preemption, so the budget is checked against the
                   measured decode wall — a slow row is *marked*, not killed,
                   which is the correct semantics for a pure kernel)
  DIM_MISMATCH     decoded (h,w) != declared (h,w)
  LOW_PSNR         decoded pixels vs reference pixels < 40 dB (lossy) / != (png)
  CAPTION_MISMATCH caption column != deterministic reference caption
  PHASH_MISMATCH   stored phash != phash of decoded pixels
  OK
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from . import codecs


@dataclass(frozen=True)
class VerifyResult:
    status: str
    psnr: float
    caption_ok: bool
    phash_ok: bool
    decode_ms: float
    error: str | None


def verify_image_row(
    image_id: str,
    data: bytes | None,
    w: int | None,
    h: int | None,
    fmt: str | None,
    caption: str | None,
    phash: int | None,
    timeout_ms: float | None = None,
) -> VerifyResult:
    if data is None:
        return VerifyResult("NOT_FOUND", 0.0, False, False, 0.0, "no image row")
    t0 = time.perf_counter()
    try:
        decoded = codecs.decode_image(bytes(data), fmt)
    except Exception as exc:  # truncated/garbled bytes
        ms = (time.perf_counter() - t0) * 1000.0
        return VerifyResult("DECODE_ERROR", 0.0, False, False, ms, str(exc)[:200])
    ms = (time.perf_counter() - t0) * 1000.0
    # DETERMINISM TRADE (documented by design): the TIMEOUT verdict derives
    # from measured wall clock, so enabling timeout_ms gives up byte-identical
    # replay of an in-flight wave — a borderline row can flip TIMEOUT<->OK
    # under load, exactly like the reference's real browser timeout
    # (vv8_worker/tasks.py:131-141). State stays CONSISTENT either way: every
    # table derives from the committed fetches ledger, and TIMEOUT is
    # retryable, so resume is still exact with respect to what was committed.
    # Campaigns that need bit-identical replay (the equality test suite, the
    # scaling bench) run with timeout_ms=None, where every verdict is a pure
    # function of the row.
    if timeout_ms is not None and ms > timeout_ms:
        return VerifyResult(
            "TIMEOUT", 0.0, False, False, ms, f"decode {ms:.1f} ms > budget {timeout_ms} ms"
        )
    if decoded.shape[0] != h or decoded.shape[1] != w:
        return VerifyResult(
            "DIM_MISMATCH", 0.0, False, False, ms, f"decoded {decoded.shape[:2]} != ({h},{w})"
        )
    ref = codecs.pixels_for(image_id, w, h)
    p = codecs.psnr(decoded, ref)
    if fmt == "png":
        psnr_ok = p == float("inf")
    else:
        psnr_ok = p >= codecs.PSNR_LOSSY_THRESHOLD_DB
    caption_ok = caption == codecs.caption_for(image_id)
    phash_ok = phash == codecs.phash64(decoded)
    if not psnr_ok:
        return VerifyResult("LOW_PSNR", p, caption_ok, phash_ok, ms, None)
    if not caption_ok:
        return VerifyResult("CAPTION_MISMATCH", p, False, phash_ok, ms, None)
    if not phash_ok:
        return VerifyResult("PHASH_MISMATCH", p, True, False, ms, None)
    return VerifyResult("OK", p, True, True, ms, None)
