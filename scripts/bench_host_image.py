#!/usr/bin/env python
"""Host image-path micro-benchmark: per-call latency of the native core's
resize and fused resize+normalize, plus the full VaultProcessor pair path.
Pure CPU — no TPU needed.  Optionally A/B against a second .so build
(e.g. the previous git revision) via IC_ALT_SO=/path/to/libimagecore_old.so
to keep before/after in ONE session on this 1-CPU box.

Usage: python scripts/bench_host_image.py
"""

import ctypes
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W = 480, 640            # the documented source geometry (BENCHMARKS.md)
OH, OW = 384, 512          # shorter-side-384 resize of 480x640
REPS = 200


def bench_so(path):
    lib = ctypes.CDLL(path)
    lib.ic_resize_rgb8.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                   ctypes.c_int, ctypes.c_void_p,
                                   ctypes.c_int, ctypes.c_int]
    lib.ic_resize_normalize.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float]
    rng = np.random.default_rng(0)
    src = np.ascontiguousarray(rng.integers(0, 255, (H, W, 3)), np.uint8)
    dst = np.empty((OH, OW, 3), np.uint8)
    fdst = np.zeros((3, OH, OW), np.float32)

    def timed(fn):
        ts = []
        fn()  # warm
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2] * 1e3

    r_ms = timed(lambda: lib.ic_resize_rgb8(
        src.ctypes.data, H, W, dst.ctypes.data, OH, OW))
    rn_ms = timed(lambda: lib.ic_resize_normalize(
        src.ctypes.data, H, W, OH, OW, fdst.ctypes.data, OH, OW, 0.5, 0.5))
    return {"resize_ms": round(r_ms, 3), "resize_normalize_ms": round(rn_ms, 3)}


def main():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = {"current": bench_so(os.path.join(here, "native",
                                            "libimagecore.so"))}
    alt = os.environ.get("IC_ALT_SO")
    if alt:
        out["alt"] = bench_so(alt)
    # the full-pair number is bench.py's protocol, imported so the two
    # stay comparable (same geometry/prompt/rep policy)
    from bench import bench_host_preprocess
    out["processor_pair_p50_ms"] = round(bench_host_preprocess(), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
