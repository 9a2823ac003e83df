"""Extended benchmark: the five BASELINE.json configs, one JSON line each.

`bench.py` remains the driver's one-line headline; this script measures the
full scenario matrix (on the real TPU when available) and is the basis for
BENCH notes in the README/ARCHITECTURE docs.
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def make_img(h, w, seed=0, rgba=False):
    r = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(xx / (30 + seed)) + 50 * np.cos(yy / 23.0)).astype(np.int32)
    img = np.stack(
        [base, base + np.sin(xx / 11.0) * 20, base - np.cos(yy / 7.0) * 15], axis=-1
    )
    img = np.clip(img + r.integers(-3, 4, img.shape), 0, 255).astype(np.uint8)
    if rgba:
        img = np.dstack([img, np.full((h, w), 255, np.uint8)])
    return img


def report(config, value, unit, note=""):
    print(json.dumps({"config": config, "value": round(value, 2), "unit": unit, "note": note}), flush=True)


def main():
    from nicetpu import api
    from nicetpu.hostref import oracle

    oracle.get_lib()

    # 1. 512x512 round-trip (TPU encode + native decode)
    img = make_img(512, 512)
    data = api.encode(img)
    assert np.array_equal(oracle.decode_native(data), img)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        data = api.encode(img)
        out = oracle.decode_native(data)
    dt = (time.perf_counter() - t0) / reps
    report("512x512 RGB8 round-trip", img.nbytes / 1e6 / dt, "MB/s")

    # 2. Kodak-24 batch encode (per-image tables)
    imgs = np.stack([make_img(512, 768, s) for s in range(24)])
    outs = api.encode_batch(list(imgs))
    t0 = time.perf_counter()
    for _ in range(reps):
        outs = api.encode_batch(list(imgs))
    dt = (time.perf_counter() - t0) / reps
    ok = all(np.array_equal(d, i) for d, i in zip(api.decode_batch(outs), imgs))
    report("Kodak-24 batch encode", imgs.nbytes / 1e6 / dt, "MB/s", f"bit-exact={ok}")

    # 3. 4096x4096 RGBA (alpha dropped like the reference encoder)
    big = make_img(4096, 4096, 3, rgba=True)
    data = api.encode(big)
    t0 = time.perf_counter()
    data = api.encode(big)
    dt = time.perf_counter() - t0
    ok = np.array_equal(oracle.decode_native(data), big[:, :, :3])
    report("4096x4096 RGBA encode", big[:, :, :3].nbytes / 1e6 / dt, "MB/s", f"bit-exact={ok}")

    # 4. 100-image mixed-size streamed set (native OpenMP path)
    rng = np.random.default_rng(9)
    stream = [
        make_img(int(rng.integers(128, 768)), int(rng.integers(128, 768)), int(s))
        for s in range(100)
    ]
    t0 = time.perf_counter()
    blobs = api.encode_batch(stream, backend="native")
    outs = api.decode_batch(blobs)
    dt = time.perf_counter() - t0
    ok = all(np.array_equal(o, i) for o, i in zip(outs, stream))
    mb = sum(i.nbytes for i in stream) / 1e6
    report("100-image streamed round-trip", mb / dt, "MB/s", f"bit-exact={ok} ({mb:.0f} MB)")

    # 5. multi-host 16K raster: not runnable on one chip; the sharded path is
    # validated on the virtual mesh (tests + dryrun_multichip).
    report("16Kx16K multi-host", 0, "MB/s", "requires pod slice; sharded path dryrun-validated")


if __name__ == "__main__":
    main()
