"""Stage-split profiler for the v3 TPU decoder (dev aid).

Times, on the real chip, the stages of `decode3._decode_core_v3` separately:
walk rounds (Pallas kernel), slot assembly + symbol join, placement, row
reconstruction — so optimization effort goes where the time is.  Prints one
JSON block per experiment.
"""

from __future__ import annotations

import json
import os
import sys
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
    import jax
    import jax.numpy as jnp

    from nicetpu.hostref import oracle
    from nicetpu.kernels import decode3 as d3

    H = W = 512
    B = 8
    imgs = [make_image(H, W, s) for s in range(B)]
    blobs = [oracle.encode_native(im) for im in imgs]
    mb = sum(im.nbytes for im in imgs) / 1e6

    t0 = time.perf_counter()
    args, kw = d3.prepare_batch_args(blobs)
    t_prep = time.perf_counter() - t0
    words, wbits, af, present, ib, pfx, sym_tbl = args
    print(f"prep host: {t_prep*1e3:.1f} ms  kw={kw}", file=sys.stderr, flush=True)

    chunk_bits = kw["chunk_bits"]
    steps = kw["steps"]
    maxl = kw["maxl"]
    rows = kw["rows"]
    cpb = d3._cpb(rows)
    Wn = words.shape[1]
    wpc = chunk_bits // 32
    nch_pad = ((Wn - d3._wrows(chunk_bits)) // wpc // cpb) * cpb
    KB = nch_pad // cpb
    aff, dD, inc = jax.jit(d3.derive_walk_tables)(af, present, ib)

    entries0 = jnp.broadcast_to(
        jnp.arange(nch_pad, dtype=jnp.int32)[None, :] * chunk_bits, (B, nch_pad)
    )

    # --- stage: make_word_blocks
    mwb = jax.jit(lambda w: d3.make_word_blocks(w, nch_pad, chunk_bits, rows))
    blk = mwb(words)
    blk.block_until_ready()
    t_blk = timeit(lambda: mwb(words).block_until_ready())

    # --- stage: one walk round (records + exits)
    def walk1(e):
        pos, sym, i12, i34, exits = d3.walk_pallas(
            blk, d3.chunk_layout(e, KB, rows), aff, dD, inc, pfx, wbits,
            chunk_bits=chunk_bits, steps=steps, maxl=maxl, rows=rows,
        )
        return exits

    jw = jax.jit(walk1)
    ex = jw(entries0)
    ex.block_until_ready()
    t_walk1 = timeit(lambda: jw(entries0).block_until_ready())

    # --- full decode incl. recon, checksum fetch only
    csum = jax.jit(
        lambda *a: (
            lambda o, k, g: (jnp.sum(o.astype(jnp.int32), axis=(1, 2)), k)
        )(*d3._decode_core_v3(*a, **kw))
    )
    s_d, ok_d = csum(*args)
    assert bool(np.asarray(ok_d).all())
    t_full = timeit(lambda: jax.block_until_ready(csum(*args)))

    # --- decode minus reconstruction: stop after place_and_unpack
    def no_recon(*a):
        words_, wbits_, af_, present_, ib_, pfx_, sym_tbl_ = a
        e = entries0
        blkx = d3.make_word_blocks(words_, nch_pad, chunk_bits, rows)
        affx, dDx, incx = d3.derive_walk_tables(af_, present_, ib_)

        def walk(ee):
            pos, sym, i12, i34, exits = d3.walk_pallas(
                blkx, d3.chunk_layout(ee, KB, rows), affx, dDx, incx, pfx_, wbits_,
                chunk_bits=chunk_bits, steps=steps, maxl=maxl, rows=rows,
            )
            return pos, sym, i12, i34, d3.chunk_unlayout(exits)

        for _ in range(kw["rounds"] - 1):
            _, _, _, _, exx = walk(e)
            e = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), exx[:, :-1]], axis=1)
        pos, sym, i12, i34, ex2 = walk(e)
        bins = d3._payload_bins(sym, i12, i34)
        syms = [
            d3._sym_join(b.reshape(B, -1), sym_tbl_).reshape(sym.shape)
            for b in bins
        ]
        rec, dst, (ok_cov, _okref) = d3.assemble_v3(
            pos, sym, syms[0], syms[1], syms[2], syms[3], H * W, W, wbits_,
            cumsum=d3._cumsum_walk, cummax=d3._cummax_walk,
        )
        form, delta, refoff = d3.place_and_unpack(rec, dst, H * W, W)
        return jnp.sum(form), jnp.sum(delta), ok_cov

    jnr = jax.jit(no_recon)
    jax.block_until_ready(jnr(*args))
    t_norecon = timeit(lambda: jax.block_until_ready(jnr(*args)))

    # --- walk rounds only (rounds as in ladder config)
    def walks_only(*a):
        words_, wbits_, af_, present_, ib_, pfx_, sym_tbl_ = a
        e = entries0
        blkx = d3.make_word_blocks(words_, nch_pad, chunk_bits, rows)
        affx, dDx, incx = d3.derive_walk_tables(af_, present_, ib_)
        for _ in range(kw["rounds"] - 1):
            _, _, _, _, exx = d3.walk_pallas(
                blkx, d3.chunk_layout(e, KB, rows), affx, dDx, incx, pfx_, wbits_,
                chunk_bits=chunk_bits, steps=steps, maxl=maxl, rows=rows,
            )
            exx = d3.chunk_unlayout(exx)
            e = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), exx[:, :-1]], axis=1)
        pos, sym, i12, i34, ex2 = d3.walk_pallas(
            blkx, d3.chunk_layout(e, KB, rows), affx, dDx, incx, pfx_, wbits_,
            chunk_bits=chunk_bits, steps=steps, maxl=maxl, rows=rows,
        )
        return jnp.sum(ex2), jnp.sum(sym)

    jwo = jax.jit(walks_only)
    jax.block_until_ready(jwo(*args))
    t_walks = timeit(lambda: jax.block_until_ready(jwo(*args)))

    print(
        json.dumps(
            {
                "B": B,
                "raw_mb": round(mb, 2),
                "kw": {k: v for k, v in kw.items()},
                "nch_pad": nch_pad,
                "prep_host_ms": round(t_prep * 1e3, 1),
                "word_blocks_ms": round(t_blk * 1e3, 1),
                "walk1_ms": round(t_walk1 * 1e3, 1),
                "walks_all_rounds_ms": round(t_walks * 1e3, 1),
                "no_recon_ms": round(t_norecon * 1e3, 1),
                "full_ms": round(t_full * 1e3, 1),
                "recon_ms_est": round((t_full - t_norecon) * 1e3, 1),
                "assembly_ms_est": round((t_norecon - t_walks - t_blk) * 1e3, 1),
                "full_mbs": round(mb / t_full, 1),
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
