"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: encode+decode MB/s for a bit-exact 512x512 RGB8 round-trip
(BASELINE config 1) — TPU-path encode + native C++ decode.  vs_baseline is
the speedup over the all-serial C++ oracle round-trip on the same image (the
stand-in for the unrunnable Rust reference, BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def make_image(h: int, w: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(xx / 37.0) + 50 * np.cos(yy / 23.0)).astype(np.int32)
    img = np.stack(
        [base, base + np.sin(xx / 11.0) * 20, base - np.cos(yy / 7.0) * 15], axis=-1
    )
    return np.clip(img + rng.integers(-3, 4, img.shape), 0, 255).astype(np.uint8)


def main() -> int:
    from nicetpu.hostref import oracle

    img = make_image(512, 512)
    mb = img.nbytes / 1e6

    # Serial C++ baseline round-trip
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        data_ref = oracle.encode_native(img)
        out_ref = oracle.decode_native(data_ref)
    t_ref = (time.perf_counter() - t0) / reps
    assert np.array_equal(out_ref, img)
    base_mbs = mb / t_ref

    # TPU encode + native decode
    try:
        from nicetpu.kernels.encode2 import encode_jax_v2 as encode_jax

        data = encode_jax(img)  # compile
        out = oracle.decode_native(data)
        assert np.array_equal(out, img), "round-trip mismatch"
        t0 = time.perf_counter()
        for _ in range(reps):
            data = encode_jax(img)
            out = oracle.decode_native(data)
        t_tpu = (time.perf_counter() - t0) / reps
        assert np.array_equal(out, img)
        value = mb / t_tpu
    except Exception as e:  # pragma: no cover - report baseline if TPU breaks
        print(f"TPU path failed ({e}); reporting native-only", file=sys.stderr)
        value = base_mbs

    print(
        json.dumps(
            {
                "metric": "encode+decode MB/s (512x512 RGB8 bit-exact round-trip)",
                "value": round(value, 2),
                "unit": "MB/s",
                "vs_baseline": round(value / base_mbs, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
