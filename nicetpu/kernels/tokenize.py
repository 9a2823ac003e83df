"""Vectorized `.nice` tokenizer + histogram as a jittable JAX program.

TPU-first reformulation of the reference's per-pixel serial cascade
(ref code.rs:159-414): all predictors become statically-shifted tensor reads,
mode selection is a priority select over per-mode validity masks, run lengths
come from a reverse cummin over change indices, and the histogram is a
one-hot matmul/segment-sum.  Produces the exact serial token order as
(N, TOKEN_SLOTS) slot arrays (slot layout in format/constants.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nicetpu.format import constants as C


def _shift(x: jnp.ndarray, off: int) -> jnp.ndarray:
    """out[p] = x[p - off] with zero fill (validity handled by masks)."""
    if off == 0:
        return x
    return jnp.pad(x, (off, 0))[: x.shape[0]]


def _luma_diffs(r, g, b, rr, rg, rb):
    """Wrapping-u8 luma-style diffs vs a reference pixel (ref code.rs:252-339)."""
    dg = (g - rg) & 255
    dr = (r - rr - dg) & 255
    db = (b - rb - dg) & 255
    ok = (
        ((dg >= 224) | (dg < 32))
        & ((dr >= 240) | (dr < 16))
        & ((db >= 240) | (db < 16))
    )
    return dg, dr, db, ok


@partial(jax.jit, static_argnames=("width",))
def tokenize_and_count(img_flat: jnp.ndarray, *, width: int):
    """img_flat: (N, 3) uint8 (flattened raster).  Returns a dict with
    token slot arrays (N, TOKEN_SLOTS) and the flat (858,) histogram.

    `width` is static: all predictor offsets specialize at trace time.
    """
    W = width
    N = img_flat.shape[0]
    x = img_flat.astype(jnp.int32)
    r, g, b = x[:, 0], x[:, 1], x[:, 2]
    pos = jnp.arange(N, dtype=jnp.int32)
    row0 = pos < W

    pr, pg, pb = _shift(r, 1), _shift(g, 1), _shift(b, 1)  # raster predecessor
    ur, ug, ub = _shift(r, W), _shift(g, W), _shift(b, W)  # one row up

    # --- BACK_REF: first exact match over 5 offsets (priority select)
    br_hit = jnp.zeros(N, dtype=jnp.bool_)
    br_idx = jnp.zeros(N, dtype=jnp.int32)
    for i, off in enumerate(C.back_ref_offsets(W)):
        eq = (
            (pos >= off)
            & (r == _shift(r, off))
            & (g == _shift(g, off))
            & (b == _shift(b, off))
        )
        new = eq & ~br_hit
        br_idx = jnp.where(new, i, br_idx)
        br_hit = br_hit | eq

    # --- SMALL_DIFF: i16 diffs vs avg(up,left) / left (ref code.rs:210-247)
    avg_r, avg_g, avg_b = (ur + pr) // 2, (ug + pg) // 2, (ub + pb) // 2
    sd_r = r - jnp.where(row0, pr, avg_r)
    sd_g = g - jnp.where(row0, pg, avg_g)
    sd_b = b - jnp.where(row0, pb, avg_b)
    sd_hit = (
        (pos > 0)
        & (jnp.abs(sd_r) <= 3)
        & (jnp.abs(sd_g) <= 3)
        & (jnp.abs(sd_b) <= 3)
    )
    sd_code = (3 + sd_r) + 7 * (3 + sd_g) + 49 * (3 + sd_b)

    # --- COLOR_LUMA2: averaged predictor, needs p >= W (ref code.rs:252-292)
    l2_g, l2_r, l2_b, l2_ok = _luma_diffs(r, g, b, avg_r, avg_g, avg_b)
    l2_hit = (~row0) & l2_ok

    # --- COLOR_LUMA: 11 refs, first in-range wins (ref code.rs:295-339)
    lu_hit = jnp.zeros(N, dtype=jnp.bool_)
    lu_idx = jnp.zeros(N, dtype=jnp.int32)
    lu_g = jnp.zeros(N, dtype=jnp.int32)
    lu_r = jnp.zeros(N, dtype=jnp.int32)
    lu_b = jnp.zeros(N, dtype=jnp.int32)
    for i, off in enumerate(C.luma_ref_offsets(W)):
        dg, dr, db, ok = _luma_diffs(
            r, g, b, _shift(r, off), _shift(g, off), _shift(b, off)
        )
        ok = ok & (pos >= off)
        new = ok & ~lu_hit
        lu_idx = jnp.where(new, i, lu_idx)
        lu_g = jnp.where(new, dg, lu_g)
        lu_r = jnp.where(new, dr, lu_r)
        lu_b = jnp.where(new, db, lu_b)
        lu_hit = lu_hit | ok

    # --- RGB fallback residuals (ref code.rs:341-366); pixel-0 predictor = 0
    res_r = jnp.where(row0, (r - jnp.where(pos > 0, pr, 0)) & 255, (r - avg_r) & 255)
    res_g = jnp.where(row0, (g - jnp.where(pos > 0, pg, 0)) & 255, (g - avg_g) & 255)
    res_b = jnp.where(row0, (b - jnp.where(pos > 0, pb, 0)) & 255, (b - avg_b) & 255)

    # --- Priority select: backref > small > luma2 > luma > rgb
    mode = jnp.where(
        br_hit,
        C.PREFIX_BACK_REF,
        jnp.where(
            sd_hit,
            C.PREFIX_SMALL_DIFF,
            jnp.where(
                l2_hit,
                C.PREFIX_COLOR_LUMA2,
                jnp.where(lu_hit, C.PREFIX_COLOR_LUMA, C.PREFIX_RGB),
            ),
        ),
    )
    is_br = mode == C.PREFIX_BACK_REF
    is_sd = mode == C.PREFIX_SMALL_DIFF
    is_l2 = mode == C.PREFIX_COLOR_LUMA2
    is_lu = mode == C.PREFIX_COLOR_LUMA
    is_rgb = mode == C.PREFIX_RGB

    # --- Encoded-pixel set + run lengths (SURVEY §3.1)
    changed = (r != pr) | (g != pg) | (b != pb)
    enc = changed.at[0].set(True) if N > 0 else changed
    change_idx = jnp.where(enc, pos, N)
    suffix_min = jax.lax.cummin(change_idx, axis=0, reverse=True)
    next_change = jnp.concatenate([suffix_min[1:], jnp.array([N], jnp.int32)])
    run_len = next_change - pos - 1
    has_run = enc & (run_len > 0)
    v = jnp.maximum(run_len - 1, 0)
    ndigits = jnp.ones(N, dtype=jnp.int32)
    for j in range(1, C.MAX_RUN_DIGITS):
        ndigits = ndigits + (v >= (1 << (3 * j))).astype(jnp.int32)

    # --- Token slot assembly (slot order == serial order, SURVEY A.6)
    def sel(cond_vals, default):
        out = default
        for cond, val in reversed(cond_vals):
            out = jnp.where(cond, val, out)
        return out

    zeros = jnp.zeros(N, dtype=jnp.int32)
    slot_streams = []
    slot_symbols = []
    slot_valid = []

    # slot 0: mode prefix
    slot_streams.append(jnp.full(N, C.SC_PREFIXES, jnp.int32))
    slot_symbols.append(mode)
    slot_valid.append(enc)
    # slot 1
    slot_streams.append(
        sel(
            [
                (is_br, jnp.full(N, C.SC_BACK_REF, jnp.int32)),
                (is_sd, jnp.full(N, C.SC_SMALL_DIFF, jnp.int32)),
                (is_l2, jnp.full(N, C.SC_LUMA_BASE_DIFF2, jnp.int32)),
                (is_lu, jnp.full(N, C.SC_LUMA_BACK_REF, jnp.int32)),
            ],
            jnp.full(N, C.SC_RGB, jnp.int32),
        )
    )
    slot_symbols.append(
        sel(
            [
                (is_br, br_idx),
                (is_sd, sd_code),
                (is_l2, (l2_g + 32) & 255),
                (is_lu, lu_idx),
            ],
            res_r,
        )
    )
    slot_valid.append(enc)
    # slot 2
    slot_streams.append(
        sel(
            [
                (is_l2, jnp.full(N, C.SC_LUMA_OTHER_DIFF2, jnp.int32)),
                (is_lu, jnp.full(N, C.SC_LUMA_BASE_DIFF, jnp.int32)),
            ],
            jnp.full(N, C.SC_RGB, jnp.int32),
        )
    )
    slot_symbols.append(
        sel([(is_l2, (l2_r + 16) & 255), (is_lu, (lu_g + 32) & 255)], res_g)
    )
    slot_valid.append(enc & (is_l2 | is_lu | is_rgb))
    # slot 3
    slot_streams.append(
        sel(
            [
                (is_l2, jnp.full(N, C.SC_LUMA_OTHER_DIFFB2, jnp.int32)),
                (is_lu, jnp.full(N, C.SC_LUMA_OTHER_DIFF, jnp.int32)),
            ],
            jnp.full(N, C.SC_RGB, jnp.int32),
        )
    )
    slot_symbols.append(
        sel([(is_l2, (l2_b + 16) & 255), (is_lu, (lu_r + 16) & 255)], res_b)
    )
    slot_valid.append(enc & (is_l2 | is_lu | is_rgb))
    # slot 4 (COLOR_LUMA only)
    slot_streams.append(jnp.full(N, C.SC_LUMA_OTHER_DIFF, jnp.int32))
    slot_symbols.append((lu_b + 16) & 255)
    slot_valid.append(enc & is_lu)
    # run digit slots
    for j in range(C.MAX_RUN_DIGITS):
        slot_streams.append(jnp.full(N, C.SC_PREFIXES, jnp.int32))
        slot_symbols.append(((v >> (3 * j)) & 7) + C.PREFIX_RUN_BASE)
        slot_valid.append(has_run & (j < ndigits))

    streams = jnp.stack(slot_streams, axis=1)
    symbols = jnp.stack(slot_symbols, axis=1)
    valid = jnp.stack(slot_valid, axis=1)
    # Zero invalid slots so flat-table gathers stay in range downstream.
    streams = jnp.where(valid, streams, 0)
    symbols = jnp.where(valid, symbols, 0)

    # --- Histogram over the flat 858-bin layout
    base = jnp.asarray(np.asarray(C.STREAM_BASE, dtype=np.int32))
    bins = base[streams] + symbols
    counts = jnp.zeros(C.TOTAL_SYMBOLS, dtype=jnp.int32).at[bins.reshape(-1)].add(
        valid.reshape(-1).astype(jnp.int32), mode="drop"
    )

    return {
        "streams": streams,
        "symbols": symbols,
        "valid": valid,
        "counts": counts,
    }
