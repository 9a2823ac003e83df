"""Extended benchmark: the five BASELINE.json configs, one JSON line each.

`bench.py` remains the driver's one-line headline; this script measures the
full scenario matrix on the real TPU (configs 1-4) and the 8-device virtual
CPU mesh (config 5, labeled — no pod slice is attached to this host).
Configs 2 and 4 run on REAL photographic images (nicetpu.realcorpus), with
the synthetic variant as a second labeled line; decode configs report the
TPU fast-path fallback count (must be 0 on valid streams).

Run: python bench_all.py              -> one JSON line per scenario
     python bench_all.py _config5 N   (internal: virtual-mesh worker)
Commit the output as BENCH_all_r{N}.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
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


def real_patches(n: int, h: int, w: int) -> list[np.ndarray]:
    """n real-photo (h, w, 3) patches tiled out of the realcorpus images."""
    from nicetpu.realcorpus import load_corpus

    corpus = [im for _, im in load_corpus()]
    out: list[np.ndarray] = []
    while len(out) < n:
        added = 0
        for im in corpus:
            if len(out) >= n:
                break
            H, W = im.shape[:2]
            while H < h or W < w:
                # upsample small camera shots by pixel-doubling until the
                # patch fits (still photo statistics, unlike sinusoids)
                im = np.repeat(np.repeat(im, 2, axis=0), 2, axis=1)
                H, W = im.shape[:2]
            k = len(out)
            y0 = (k * 173) % max(1, H - h + 1)
            x0 = (k * 257) % max(1, W - w + 1)
            out.append(np.ascontiguousarray(im[y0 : y0 + h, x0 : x0 + w]))
            added += 1
        if not added:  # empty corpus: fail loudly instead of spinning
            raise RuntimeError("real_patches: corpus produced no usable image")
    return out


def report(config, value, unit, note=""):
    print(
        json.dumps({"config": config, "value": round(value, 2), "unit": unit, "note": note}),
        flush=True,
    )


def report_verified(config, value, unit, ok, note=""):
    """REFUSE to report throughput for unverified output (VERDICT r4 next
    #2: an artifact that records the speed of producing garbage is worse
    than a missing one)."""
    if not ok:
        report(config, 0, unit, f"FAILED VERIFICATION (not reporting throughput); {note}")
    else:
        report(config, value, unit, note)


def _config5_worker(side: int) -> int:
    """Single-raster sharded encode+decode on the 8-device virtual CPU mesh
    at the BASELINE config-5 spec size (16384 default), through the
    multihost wrappers (bounded-memory ordered gather, SURVEY §7.3.6);
    records peak host RSS."""
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    import resource

    import jax

    jax.config.update("jax_platforms", "cpu")
    from nicetpu.dist.multihost import decode_multihost, encode_multihost
    from nicetpu.dist.sharded import make_mesh

    def stage(msg):
        rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
        print(f"config5[{side}]: {msg} (peak rss {rss:.1f} GB)", file=sys.stderr, flush=True)

    mesh = make_mesh(8)
    stage("mesh up; building image")
    img = make_img(side, side, 5)
    mb = img.nbytes / 1e6
    stage(f"image built ({mb:.0f} MB); cold encode")
    t0 = time.perf_counter()
    data = encode_multihost(img, mesh)
    t_enc_cold = time.perf_counter() - t0
    stage(f"cold encode done in {t_enc_cold:.0f}s ({len(data)} bytes); warm encode")
    t0 = time.perf_counter()
    data = encode_multihost(img, mesh)
    t_enc = time.perf_counter() - t0
    wbits = len(data) * 8
    # walk-record budget: the speculative walk emits wbits/steps_div slot
    # records x 4 int32 arrays; log it so an OOM death is attributable
    # (VERDICT r4 next #3 — budget the memory, don't hope)
    rec_gb = wbits / 8 * 16 / 1e9
    stage(f"warm encode {mb / t_enc:.1f} MB/s; decode (walk records ~{rec_gb:.1f} GB)")
    t0 = time.perf_counter()
    # fast ladder config: the robust config's walk records (~2.7x the step
    # budget x 3 rounds) would triple that budget; photo-like content
    # crosses at steps_div=8 (gate-checked — a miss would fall back to the
    # host decoder, visible as a huge t_dec)
    dec = decode_multihost(data, mesh, steps_div=8, rounds=2)
    t_dec = time.perf_counter() - t0
    stage(f"decode done in {t_dec:.0f}s; verifying")
    ok = bool(np.array_equal(dec, img))
    peak_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(
        json.dumps(
            {
                "side": side,
                "encode_mb_s": round(mb / t_enc, 2),
                "decode_mb_s": round(mb / t_dec, 2),
                "bit_exact": ok,
                "bytes": len(data),
                "cold_encode_s": round(t_enc_cold, 1),
                "peak_host_rss_gb": round(peak_gb, 1),
            }
        ),
        flush=True,
    )
    return 0


def main():
    from nicetpu import api
    from nicetpu.hostref import oracle
    from nicetpu.kernels import decode3

    oracle.get_lib()
    reps = 3

    # 1. 512x512 round-trip: TPU fused encode + TPU v3 decode (device paths
    #    both directions), bit-exact; decode fallback count must be 0.
    img = make_img(512, 512)
    data = api.encode(img)
    stats: dict = {}
    dec = decode3.decode_jax_v3(data, stats=stats)
    assert np.array_equal(dec, img)
    t0 = time.perf_counter()
    for _ in range(reps):
        data = api.encode(img)
        dec = decode3.decode_jax_v3(data, stats=stats)
    dt = (time.perf_counter() - t0) / reps
    report(
        "512x512 RGB8 round-trip (TPU enc+dec)",
        img.nbytes / 1e6 / dt,
        "MB/s",
        f"bit-exact, decode_fallbacks={stats['fallbacks']}",
    )

    # 2. Kodak-24-shape batch (24 x 512x768): REAL photo patches, device
    #    batch encode + device batch decode with per-image tables.
    patches = real_patches(24, 512, 768)
    imgs = np.stack(patches)
    outs = api.encode_batch(list(imgs))
    stats = {}
    decs = decode3.decode_batch_jax_v3(outs, stats=stats)
    ok = all(np.array_equal(d, i) for d, i in zip(decs, imgs))
    t0 = time.perf_counter()
    for _ in range(reps):
        outs = api.encode_batch(list(imgs))
    dt_e = (time.perf_counter() - t0) / reps
    t0 = time.perf_counter()
    for _ in range(reps):
        decs = decode3.decode_batch_jax_v3(outs, stats=stats)
    dt_d = (time.perf_counter() - t0) / reps
    ratio = imgs.nbytes / sum(len(o) for o in outs)
    report(
        "Kodak-24 batch encode (real photos)",
        imgs.nbytes / 1e6 / dt_e,
        "MB/s",
        f"bit-exact={ok} ratio={ratio:.2f} decode_fallbacks={stats['fallbacks']}",
    )
    report(
        "Kodak-24 batch decode (real photos, TPU)",
        imgs.nbytes / 1e6 / dt_d,
        "MB/s",
        f"bit-exact={ok} decode_fallbacks={stats['fallbacks']}",
    )
    # device-compute lines (resident batch, checksum-only fetch — same
    # convention as bench.py's device_only/decode_device: this host's tunnel
    # moves payloads at ~25-40 MB/s, slower than the codec itself, so the
    # e2e lines above measure the wire)
    import jax
    import jax.numpy as jnp
    from nicetpu.kernels.encode2 import encode_fused
    from nicetpu.pipeline import _w_cap, upload_batch

    N2 = 512 * 768
    dev_imgs = upload_batch(list(imgs))
    w_cap2 = _w_cap(N2)

    def enc_csum():
        words, small = encode_fused(dev_imgs, width=768, ndigits_cap=3, w_cap=w_cap2)
        np.asarray(small)

    enc_csum()
    t0 = time.perf_counter()
    for _ in range(reps):
        enc_csum()
    dt = (time.perf_counter() - t0) / reps
    report(
        "Kodak-24 device-compute encode (real photos)",
        imgs.nbytes / 1e6 / dt,
        "MB/s",
        "fused dispatch, payload resident",
    )

    # compute-only decode with the SAME retry ladder as the production
    # path: fast config first, robust config for any image it can't verify
    # (a fast-config-only probe reported ok=False on photos whose dense
    # regions exhaust the fast step budget)
    def ladder_csum(blobs):
        args_l, base_l = decode3.prepare_batch_args(blobs)
        fns = []
        for rung in decode3.LADDER:
            cfg = decode3._as_cfg(rung)
            kw_l = {
                **base_l,
                "chunk_bits": cfg.chunk_bits,
                "steps": decode3._steps(cfg.chunk_bits, cfg.steps_div),
                "rounds": cfg.rounds,
                "rows": cfg.rows,
            }
            fns.append(
                jax.jit(
                    lambda *a, _k=kw_l: (
                        lambda o, k, g: (jnp.sum(o.astype(jnp.int32), axis=(1, 2)), k)
                    )(*decode3._decode_core_v3(*a, **_k))
                )
            )

        def run():
            ok_acc = None
            for fn in fns:
                s_d, ok_d = fn(*args_l)
                ok_np = np.asarray(ok_d)
                ok_acc = ok_np if ok_acc is None else (ok_acc | ok_np)
                if ok_acc.all():
                    break
            return bool(ok_acc.all())

        return run

    run2 = ladder_csum(outs)
    ok_all = run2()
    t0 = time.perf_counter()
    for _ in range(reps):
        ok_all = run2() and ok_all
    dt = (time.perf_counter() - t0) / reps
    report_verified(
        "Kodak-24 device-compute decode (real photos)",
        imgs.nbytes / 1e6 / dt,
        "MB/s",
        ok_all,
        f"v3 pipeline + retry ladder, ok={ok_all}, raster resident",
    )

    simgs = np.stack([make_img(512, 768, s) for s in range(24)])
    souts = api.encode_batch(list(simgs))
    t0 = time.perf_counter()
    for _ in range(reps):
        souts = api.encode_batch(list(simgs))
    dt = (time.perf_counter() - t0) / reps
    sok = all(np.array_equal(d, i) for d, i in zip(api.decode_batch(souts), simgs))
    report(
        "Kodak-24 batch encode (synthetic)",
        simgs.nbytes / 1e6 / dt,
        "MB/s",
        f"bit-exact={sok}",
    )

    # 3. 4096x4096 RGBA encode (alpha dropped like the reference encoder) +
    #    2048x2048 REAL photo decode on device (production-size decode).
    big = make_img(4096, 4096, 3, rgba=True)
    data = api.encode(big)
    t0 = time.perf_counter()
    data = api.encode(big)
    dt = time.perf_counter() - t0
    ok = np.array_equal(oracle.decode_native(data), big[:, :, :3])
    report(
        "4096x4096 RGBA encode", big[:, :, :3].nbytes / 1e6 / dt, "MB/s", f"bit-exact={ok}"
    )
    from nicetpu.realcorpus import load_corpus

    soccer = dict(load_corpus()).get("soccer0")
    if soccer is not None and soccer.shape[0] >= 2048:
        blob = oracle.encode_native(soccer)
        stats = {}
        dec = decode3.decode_jax_v3(blob, stats=stats)
        ok = np.array_equal(dec, soccer)
        t0 = time.perf_counter()
        dec = decode3.decode_jax_v3(blob, stats=stats)
        dt = time.perf_counter() - t0
        report(
            "2048x2048 real-photo TPU decode",
            soccer.nbytes / 1e6 / dt,
            "MB/s",
            f"bit-exact={ok} decode_fallbacks={stats['fallbacks']}",
        )
        run3 = ladder_csum([blob])
        ok3 = run3()
        t0 = time.perf_counter()
        ok3 = run3() and ok3
        dt = time.perf_counter() - t0
        report_verified(
            "2048x2048 device-compute decode",
            soccer.nbytes / 1e6 / dt,
            "MB/s",
            ok3,
            f"v3 pipeline + retry ladder, ok={ok3}, raster resident",
        )

    # 4. 100-image mixed-size streamed set: REAL patches at mixed sizes
    #    (native OpenMP path — mixed shapes don't batch on device).
    rng = np.random.default_rng(9)
    sizes = [(int(rng.integers(128, 768)), int(rng.integers(128, 768))) for _ in range(100)]
    stream = [real_patches(1, h, w)[0] for h, w in sizes]
    t0 = time.perf_counter()
    blobs = api.encode_batch(stream, backend="native")
    outs4 = api.decode_batch(blobs)
    dt = time.perf_counter() - t0
    ok = all(np.array_equal(o, i) for o, i in zip(outs4, stream))
    mb = sum(i.nbytes for i in stream) / 1e6
    report(
        "100-image streamed round-trip (real photos)",
        mb / dt,
        "MB/s",
        f"bit-exact={ok} ({mb:.0f} MB)",
    )

    # 5. large single-raster sharded round-trip on the 8-device VIRTUAL CPU
    #    mesh (no pod slice on this host; validates the multi-chip path at
    #    scale, NOT ICI throughput).
    if os.environ.get("NICETPU_SKIP_CONFIG5"):
        return
    side = int(os.environ.get("NICETPU_CONFIG5_SIDE", "16384"))
    r = None
    try:
        r = subprocess.run(
            [sys.executable, __file__, "_config5", str(side)],
            capture_output=True,
            text=True,
            timeout=4500,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
        res = json.loads(line)
        report_verified(
            f"{side}x{side} sharded encode+decode (8-dev VIRTUAL cpu mesh)",
            res["encode_mb_s"],
            "MB/s",
            res["bit_exact"],
            f"bit-exact={res['bit_exact']} decode={res['decode_mb_s']} MB/s "
            f"peak_host_rss={res.get('peak_host_rss_gb', '?')} GB "
            "(virtual CPU devices, not ICI)",
        )
    except Exception as e:  # pragma: no cover
        # carry the worker's last words into the artifact: the r4 row lost
        # the actual failure cause by discarding stderr (VERDICT r4 next #3)
        tail = ""
        if r is not None and (r.stderr or r.stdout):
            lines = ((r.stderr or "") + (r.stdout or "")).strip().splitlines()
            tail = " | worker tail: " + " / ".join(lines[-4:])[-500:]
        report(f"{side}x{side} sharded (virtual mesh)", 0, "MB/s", f"failed: {e}{tail}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "_config5":
        raise SystemExit(_config5_worker(int(sys.argv[2])))
    main()
