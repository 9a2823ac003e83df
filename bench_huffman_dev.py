"""Microbench: on-device Huffman table build vs host tables (VERDICT r3 #6).

The fused encoder builds per-image Huffman code lengths ON DEVICE
(`kernels/huffman_dev.build_tables_device`: 341-iteration batched merge
loop) to avoid one host sync in the middle of the encode dispatch.  The
reference builds tables in ~50 LoC of serial Rust (ref hfe.rs:57-106); our
device builder must EARN its 230 LoC with a measured number.

This script times, at B = 1 / 4 / 8 (512x512 images, resident batches):
  fused     - single dispatch, device tables (production encode2.encode_fused)
  twostep   - dispatch 1: tokenize+histogram, SYNC counts to host, build
              tables on host (numpy), dispatch 2: join+fold+place
Prints one JSON line per batch size (each batch size runs in its own
process: the tunnel backend rejects re-dispatch after a different batch
shape compiled in the same process).  Commit the output as
BENCH_huffman_r{N}.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

from bench import make_image


def main(sizes=(1, 4, 8)) -> int:
    import jax
    import jax.numpy as jnp

    from nicetpu.format.huffman import build_tables_host
    from nicetpu.format import constants as C
    from nicetpu.kernels import encode2
    from nicetpu.pipeline import _w_cap, upload_batch

    H = W = 512
    N = H * W
    w_cap = _w_cap(N)

    @jax.jit
    def stage1(flat):
        core = lambda im: encode2._tokenize_core(im, width=W, ndigits_cap=3)
        bins, run_ovf = jax.vmap(core)(flat)
        from nicetpu.kernels.pallas_ops import histogram_pallas

        counts = histogram_pallas(bins)
        return bins, counts

    @jax.jit
    def stage2(bins, aob_tbl, code_tbl):
        from nicetpu.kernels.pallas_ops import table_join_pallas

        aob, code = table_join_pallas(bins, aob_tbl, code_tbl)
        B, M = aob.shape
        slots = M // N
        words, totals, ovf = encode2._fold_place_grouped_batched(
            aob.reshape(B, N, slots), code.reshape(B, N, slots), w_cap=w_cap
        )
        return words, totals

    def fused(flat):
        words, small = encode2.encode_fused(flat, width=W, ndigits_cap=3, w_cap=w_cap)
        return np.asarray(small)

    def twostep(flat):
        bins, counts = stage1(flat)
        counts_np = np.asarray(counts).astype(np.int64)  # <- the host sync
        tabs = [build_tables_host(c) for c in counts_np]
        aob = jnp.asarray(np.stack([t[0] for t in tabs]).astype(np.int32))
        code = jnp.asarray(np.stack([t[1] for t in tabs]))
        words, totals = stage2(bins, aob, code)
        return np.asarray(totals)

    def retry(fn, *a):
        """The tunnel backend sporadically fails a fetch right after heavy
        compiles; one retry, like the production pipeline."""
        try:
            return fn(*a)
        except jax.errors.JaxRuntimeError:
            time.sleep(1.0)
            return fn(*a)

    for B in sizes:
        imgs = [make_image(H, W, s) for s in range(B)]
        flat = upload_batch(imgs)
        mb = B * imgs[0].nbytes / 1e6
        sf = retry(fused, flat)
        tf = retry(twostep, flat)
        assert int(sf[:, 858].sum()) == int(tf.sum()), "total bits disagree"
        res = {}
        for name, fn in (("fused_device_tables", fused), ("twostep_host_tables", twostep)):
            best = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                retry(fn, flat)
                best = min(best, time.perf_counter() - t0)
            res[name] = round(best * 1e3, 1)
        print(
            json.dumps(
                {
                    "B": B,
                    "raw_mb": round(mb, 2),
                    "fused_ms": res["fused_device_tables"],
                    "twostep_ms": res["twostep_host_tables"],
                    "fused_mb_s": round(mb / (res["fused_device_tables"] / 1e3), 1),
                    "twostep_mb_s": round(mb / (res["twostep_host_tables"] / 1e3), 1),
                    "device_tables_win": res["fused_device_tables"]
                    < res["twostep_host_tables"],
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "_one":
        raise SystemExit(main((int(sys.argv[2]),)))
    import subprocess

    for b in (1, 4, 8):
        r = subprocess.run(
            [sys.executable, __file__, "_one", str(b)],
            capture_output=True, text=True, timeout=900,
        )
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                print(line, flush=True)
        if r.returncode:
            print(f'{{"B": {b}, "error": "worker rc {r.returncode}"}}', flush=True)
    raise SystemExit(0)
