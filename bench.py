"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: encode+decode throughput (MB/s) for bit-exact 512x512 RGB8
round-trips (BASELINE config 1) — fused single-dispatch TPU encode
(on-device Huffman tables) + native C++ decode, pipelined across a small
thread pool so tunnel transfers, device compute, and host decode overlap
(nicetpu/pipeline.py).  vs_baseline is the speedup over the all-serial C++
oracle round-trip on the same images (the stand-in for the unrunnable
single-threaded Rust reference, BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

N_IMAGES = 32
WORKERS = 8
BATCH = 4


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

    imgs = [make_image(512, 512, s) for s in range(N_IMAGES)]
    mb = sum(im.nbytes for im in imgs) / 1e6

    # Serial C++ baseline round-trip (single-threaded, like the reference)
    data_ref = oracle.encode_native(imgs[0])
    assert np.array_equal(oracle.decode_native(data_ref), imgs[0])
    t0 = time.perf_counter()
    for im in imgs[:8]:
        out = oracle.decode_native(oracle.encode_native(im))
    t_ref = (time.perf_counter() - t0) / 8
    assert np.array_equal(out, imgs[7])
    base_mbs = imgs[0].nbytes / 1e6 / t_ref

    # Pipelined TPU encode + native decode
    try:
        from nicetpu.pipeline import Pipeline

        with Pipeline(workers=WORKERS, batch=BATCH) as p:
            p.warmup(imgs)
            outs = p.roundtrip_many(imgs)  # warm all executables
            for (_, o), im in zip(outs, imgs):
                assert np.array_equal(o, im), "round-trip mismatch"
            value = 0.0
            for _ in range(3):
                t0 = time.perf_counter()
                outs = p.roundtrip_many(imgs)
                value = max(value, mb / (time.perf_counter() - t0))
            for (_, o), im in zip(outs, imgs):
                assert np.array_equal(o, im), "round-trip mismatch"
    except Exception as e:  # pragma: no cover - report baseline if TPU breaks
        print(f"TPU path failed ({e}); reporting native-only", file=sys.stderr)
        value = base_mbs

    print(
        json.dumps(
            {
                "metric": "encode+decode MB/s (512x512 RGB8 bit-exact round-trips, pipelined)",
                "value": round(value, 2),
                "unit": "MB/s",
                "vs_baseline": round(value / base_mbs, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
