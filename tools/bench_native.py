"""Opt-in native-decoder bench tier (r14 VERDICT item 5).

Measures the three ctypes system-library decode hooks against their
portable twins on fixed 256x256 fixtures and writes the numbers as a
datum (BENCH_native_rNN.json), not a sentence in a verification note:

- JPEG: libjpeg(-turbo) hook vs the numpy wave twin vs pure
  (tolerance-pinned: T.81 mandates no exact IDCT; max |delta| asserted)
- PNG:  libpng simplified-API hook vs the numpy twin vs pure
  (byte-identical asserted — PNG is lossless)
- GIF:  giflib DGifSlurp hook vs pure (exactly equal asserted — only
  the serial LZW index decode is native, the arithmetic is shared)

Every leg re-verifies equality/tolerance on every payload BEFORE its
timing is reported, so a fast-but-wrong decode cannot land in the
artifact. Each native leg is gated on its hazard probe exactly like the
production dispatch; a failed probe records {"available": false} for
that leg instead of running it. The default ("auto") driver path is
never touched — the hooks are called directly, no env var is set.

Usage:
    python tools/bench_native.py [out.json]

Prints one JSON line; also writes it to the given path (default
BENCH_native.json next to this file's repo root).
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

from bench import cpu_probe_seconds  # noqa: E402
from etl_sample_spark.operators import multimodal as mm  # noqa: E402

SIDE = 256
REPS = 5


def _px_gray(x: int, y: int) -> int:
    return (x * 37 + y * 113 + (x * y) % 41) % 256


def _px_rgb(x: int, y: int) -> tuple[int, int, int]:
    return (
        (x * 37 + y * 11) % 256,
        (y * 53 + x * 7) % 256,
        ((x + y) * 29 + (x * y) % 31) % 256,
    )


def _time_best(fn, payload, reps: int = REPS) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(payload)
        best = min(best, time.perf_counter() - t0)
    return best


def _mb_per_s(n_samples: int, sec: float) -> float:
    return round(n_samples / sec / 1e6, 2)


def bench_jpeg() -> dict:
    gray = mm.encode_jpeg(SIDE, SIDE, _px_gray, gray=True, restart_interval=8)
    color = mm.encode_jpeg(SIDE, SIDE, _px_rgb, gray=False, restart_interval=8)
    out: dict = {"fixture": f"{SIDE}x{SIDE} gray+color, restart_interval=8"}
    refs = {}
    for name, payload in (("gray", gray), ("color", color)):
        w, h, n, samples = mm._decode_jpeg_pure(payload)
        refs[name] = (w, h, n, samples)
        out[f"pure_{name}_sec"] = round(_time_best(mm._decode_jpeg_pure, payload, 1), 4)
        got = mm._decode_jpeg_numpy(payload)
        assert got == refs[name], f"numpy twin mismatch on {name}"
        out[f"numpy_{name}_sec"] = round(_time_best(mm._decode_jpeg_numpy, payload), 4)
    if not mm._libjpeg_available():
        out["libjpeg"] = {"available": False}
        return out
    lj: dict = {"available": True}
    for name, payload in (("gray", gray), ("color", color)):
        w, h, n, samples = mm._decode_jpeg_libjpeg(payload)
        pw, ph, pn, ps = refs[name]
        assert (w, h, n) == (pw, ph, pn), f"libjpeg shape mismatch on {name}"
        max_d = max(abs(a - b) for a, b in zip(samples, ps))
        assert max_d <= 3, f"libjpeg tolerance blown on {name}: {max_d}"
        sec = _time_best(mm._decode_jpeg_libjpeg, payload)
        lj[f"{name}_sec"] = round(sec, 4)
        lj[f"{name}_max_abs_delta"] = max_d
        lj[f"{name}_mb_per_s"] = _mb_per_s(len(samples), sec)
        lj[f"{name}_speedup_vs_numpy"] = round(out[f"numpy_{name}_sec"] / sec, 1)
    out["libjpeg"] = lj
    return out


def bench_png() -> dict:
    payload = mm.encode_png(SIDE, SIDE, _px_rgb)
    out: dict = {"fixture": f"{SIDE}x{SIDE} rgb"}
    ref = mm._png_raw(payload)
    out["pure_sec"] = round(_time_best(mm._png_raw, payload, 1), 4)
    assert mm._png_raw_numpy(payload) == ref, "numpy twin mismatch"
    out["numpy_sec"] = round(_time_best(mm._png_raw_numpy, payload), 4)
    if not mm._libpng_available():
        out["libpng"] = {"available": False}
        return out
    assert mm._png_raw_libpng(payload) == ref, "libpng not byte-identical"
    sec = _time_best(mm._png_raw_libpng, payload)
    out["libpng"] = {
        "available": True,
        "sec": round(sec, 4),
        "byte_identical": True,
        "mb_per_s": _mb_per_s(len(ref[3]), sec),
        "speedup_vs_numpy": round(out["numpy_sec"] / sec, 1),
    }
    return out


def bench_gif() -> dict:
    payload = mm.encode_gif(SIDE, SIDE, _px_gray)
    out: dict = {"fixture": f"{SIDE}x{SIDE} gray"}
    ref = mm._decode_gif(payload)
    out["pure_sec"] = round(_time_best(mm._decode_gif, payload), 4)
    if not mm._giflib_available():
        out["giflib"] = {"available": False}
        return out
    assert mm._decode_gif_giflib(payload) == ref, "giflib not exactly equal"
    sec = _time_best(mm._decode_gif_giflib, payload)
    out["giflib"] = {
        "available": True,
        "sec": round(sec, 4),
        "exactly_equal": True,
        "mb_per_s": _mb_per_s(SIDE * SIDE, sec),
        "speedup_vs_pure": round(out["pure_sec"] / sec, 1),
    }
    return out


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "BENCH_native.json")
    probe_before = round(cpu_probe_seconds(), 3)
    result = {
        "metric": "native_decoder_tier",
        "unit": "sec (best-of-5 single decode)",
        "jpeg": bench_jpeg(),
        "png": bench_png(),
        "gif": bench_gif(),
    }
    probe_after = round(cpu_probe_seconds(), 3)
    result["cpu_probe_sec"] = {"before": probe_before, "after": probe_after}
    result["cpu_probe_ref_sec"] = 0.8
    line = json.dumps(result)
    print(line)
    with open(out_path, "w") as f:
        f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
