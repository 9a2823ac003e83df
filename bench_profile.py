"""Stage-split profiler for the resident round-trip pipeline (dev aid).

Measures, on the real TPU, the per-stage costs that bench.py's pipelined
number hides: fused-dispatch latency vs batch size, payload D2H, host
assembly, native batch decode.  Prints one JSON block per experiment.
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

from bench import make_image


def timeit(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    from nicetpu.format import headers
    from nicetpu.hostref import oracle
    from nicetpu.kernels.bitpack import words_to_payload
    from nicetpu.kernels.encode2 import encode_fused
    from nicetpu.pipeline import FETCH_BUCKET_WORDS, _w_cap, upload_batch

    H = W = 512
    N = H * W
    w_cap = _w_cap(N)
    imgs = [make_image(H, W, s) for s in range(32)]
    mb1 = imgs[0].nbytes / 1e6

    import sys

    for B in (8, 16, 32):
        print(f"B={B}: upload...", file=sys.stderr, flush=True)
        batch = upload_batch(imgs[:B])
        mb = B * mb1

        def disp():
            _, small_d = encode_fused(batch, width=W, ndigits_cap=3, w_cap=w_cap)
            np.asarray(small_d)

        print(f"B={B}: compile dispatch...", file=sys.stderr, flush=True)
        disp()  # compile
        t_disp = timeit(disp)
        print(f"B={B}: dispatch {t_disp * 1e3:.1f} ms", file=sys.stderr, flush=True)

        words_d, small_d = encode_fused(batch, width=W, ndigits_cap=3, w_cap=w_cap)
        small = np.asarray(small_d)
        totals = small[:, 858]
        kmax = int(totals.max()) // 32 + 2
        kmax = min(-(-kmax // FETCH_BUCKET_WORDS) * FETCH_BUCKET_WORDS, w_cap)

        def fetch():
            np.asarray(words_d[:, :kmax])

        print(f"B={B}: fetch (kmax={kmax})...", file=sys.stderr, flush=True)
        fetch()
        t_fetch = timeit(fetch)
        fetched_mb = B * kmax * 4 / 1e6

        words = np.asarray(words_d[:, :kmax]).astype(np.uint32)
        file_hdr = headers.pack_file_header(W, H, 3)

        def assemble():
            return [
                file_hdr
                + headers.pack_stream_headers(small[b, :858].astype(np.uint8))
                + words_to_payload(words[b], int(totals[b]))
                for b in range(B)
            ]

        blobs = assemble()
        t_asm = timeit(assemble)

        def dec():
            oracle.decode_batch_native(blobs)

        dec()
        t_dec = timeit(dec)

        comp_mb = sum(len(b) for b in blobs) / 1e6
        print(
            json.dumps(
                {
                    "B": B,
                    "raw_mb": round(mb, 2),
                    "comp_mb": round(comp_mb, 2),
                    "dispatch_ms": round(t_disp * 1e3, 1),
                    "dispatch_mbs": round(mb / t_disp, 1),
                    "payload_fetch_ms": round(t_fetch * 1e3, 1),
                    "fetched_mb": round(fetched_mb, 2),
                    "fetch_mbs_wire": round(fetched_mb / t_fetch, 1),
                    "assemble_ms": round(t_asm * 1e3, 1),
                    "native_batch_decode_ms": round(t_dec * 1e3, 1),
                    "decode_mbs": round(mb / t_dec, 1),
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
