"""Pallas TPU kernel for the segment-LUT row reconstruction.

Same math as `decode_dev.reconstruct_rows` (segment transfer LUTs over 256
candidate boundary values, one-hot boundary resolve, replay, 3-column wrap
fixup — ref code.rs:573-684's value chain), but executed as ONE kernel with
the row loop as a sequential Pallas grid and the previous-4-rows carry in
VMEM scratch.

Why: the XLA scan formulation measured ~160 us per row for a batch of 8 at
512^2 (~81 ms of a 144 ms decode) against ~30 us of actual VPU work — the
serial chain of many small ops (boundary resolve, 3-column fixup) pays
per-op scheduling overhead 512 times.  In-kernel those are register ops,
and the whole batch's LUTs stay resident in VMEM.

Geometry: segments are LANE-ALIGNED — L = 128 positions per segment,
S = W/128 segments — so every (B, W) <-> (B, S, 128) view is a
tile-boundary split Mosaic can lower without data movement (the free-form
(S, L) reshapes of the XLA version are "unsupported shape cast" in
Mosaic).  The segmentation changes the schedule, not the result: any
contiguous segmentation reconstructs the identical row.  Widths not
divisible by 128 take the XLA path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from nicetpu.format import constants as C
from nicetpu.kernels.decode_dev import (
    F_ADD2,
    F_ADD3,
    _apply_form,
    _const_offsets,
)

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

LANE = 128  # positions per segment (the TPU lane count)

# Mosaic stack budget: the unrolled build keeps ~25 (B, S, 256) int32
# temporaries live; measured 33.69 MiB at B*S = 32 => ~1.05 MiB per
# image-segment.  Keep B*S under this bound per kernel invocation and
# chunk larger batches (max_batch_for_width); wider rasters than
# S = MAX_BS segments fall back to the XLA reconstruction.
MAX_BS = 88


def max_batch_for_width(width: int) -> int:
    """Images per kernel invocation within the Mosaic stack budget
    (0 = width too wide for the Pallas path)."""
    S = width // LANE
    if width % LANE or S > MAX_BS:
        return 0
    return max(1, MAX_BS // S)


def _recon_kernel(
    f_ref,  # (1, B, W) int32
    d_ref,  # (1, 3B, W) int32 (row b*3+c = channel c of image b)
    ro_ref,  # (1, B, W) int32
    out_ref,  # (1, 3B, W) int32
    prev4_scr,  # (3B, 4W) VMEM scratch
    *,
    W: int,
    offs: tuple,
):
    h = pl.program_id(0)
    S = W // LANE
    L = LANE
    B = f_ref.shape[1]

    @pl.when(h == 0)
    def _():
        prev4_scr[:] = jnp.zeros_like(prev4_scr)

    f_row = f_ref[0]  # (B, W)
    d_row = d_ref[0].reshape(B, 3, W)
    ro_row = ro_ref[0]  # (B, W)
    prev4 = prev4_scr[:].reshape(B, 3, 4 * W)
    prev4p = jnp.concatenate([prev4, jnp.zeros((B, 3, 3), jnp.int32)], axis=2)
    ab_row = prev4[:, :, 3 * W :]  # (B, 3, W)
    cv_row = jnp.zeros((B, 3, W), jnp.int32)
    for o in offs:
        cv_row = jnp.where(
            (ro_row == o)[:, None, :], prev4p[:, :, 4 * W - o : 5 * W - o], cv_row
        )

    # lane-aligned segment views: tile-boundary splits only
    f_sl = f_row.reshape(B, S, L)
    d_sl = d_row.reshape(B, 3, S, L)
    cv_sl = cv_row.reshape(B, 3, S, L)
    ab_sl = ab_row.reshape(B, 3, S, L)

    # ---- build: push all 256 candidate boundary values through each segment
    cand = jax.lax.broadcasted_iota(jnp.int32, (B, S, 256), 2)
    r1 = [cand, cand, cand]  # per channel, function of the lag tagged t1
    r2 = [cand, cand, cand]
    r3 = [cand, cand, cand]
    t1 = jnp.zeros((B, S), jnp.int32)
    t2 = jnp.ones((B, S), jnp.int32)
    t3 = jnp.full((B, S), 2, jnp.int32)
    for l in range(L):
        f_l = f_sl[:, :, l]  # (B, S)
        new = [
            _apply_form(
                f_l[:, :, None],
                d_sl[:, c, :, l][:, :, None],
                cv_sl[:, c, :, l][:, :, None],
                ab_sl[:, c, :, l][:, :, None],
                r1[c],
                r2[c],
                r3[c],
            )
            for c in range(3)
        ]
        nt = jnp.where(f_l == F_ADD2, t2, jnp.where(f_l == F_ADD3, t3, t1))
        r1, r2, r3 = new, r1, r2
        t1, t2, t3 = nt, t1, t2

    # ---- resolve: serial one-hot evaluation across the S segments.
    # All (B, 3)/(B, 3, S) values are built with predicated one-hot writes —
    # jnp.stack of (B,) pieces fails Mosaic lowering at small B ("offset
    # mismatch on non-concat dimension").
    iota256 = jax.lax.broadcasted_iota(jnp.int32, (B, 256), 1)
    iota3 = jax.lax.broadcasted_iota(jnp.int32, (B, 3), 1)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (B, 3, S), 2)
    # trip[k]: (B, 3) boundary values at lag k+1 (cols = channels)
    trip = [prev4[:, :, 4 * W - 1 - k] for k in range(3)]
    V = [jnp.zeros((B, 3, S), jnp.int32) for _ in range(3)]
    for s in range(S):
        for k in range(3):
            V[k] = jnp.where(iota_s == s, trip[k][:, :, None], V[k])
        rs = (r1, r2, r3)
        ts = (t1, t2, t3)
        new_trip = []
        for k in range(3):
            tag = ts[k][:, s]  # (B,)
            newk = jnp.zeros((B, 3), jnp.int32)
            for c in range(3):
                tv = jnp.where(
                    tag == 0,
                    trip[0][:, c],
                    jnp.where(tag == 1, trip[1][:, c], trip[2][:, c]),
                )
                lut = rs[k][c][:, s, :]  # (B, 256)
                oh = iota256 == tv[:, None]
                val = jnp.sum(jnp.where(oh, lut, 0), axis=1)
                newk = jnp.where(iota3 == c, val[:, None], newk)
            new_trip.append(newk)
        trip = new_trip

    # ---- replay with true inputs
    v1, v2, v3 = V
    row_sl = jnp.zeros((B, 3, S, L), jnp.int32)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (B, 3, S, L), 3)
    for l in range(L):
        f_l = f_sl[:, :, l][:, None, :]  # (B, 1, S)
        new = _apply_form(
            f_l, d_sl[:, :, :, l], cv_sl[:, :, :, l], ab_sl[:, :, :, l], v1, v2, v3
        )  # (B, 3, S)
        # lane-l one-hot blend (dynamic_update_slice is unimplemented in
        # the Mosaic TC lowering)
        row_sl = jnp.where(lane_iota == l, new[:, :, :, None], row_sl)
        v1, v2, v3 = new, v1, v2
    row = row_sl.reshape(B, 3, W)

    # ---- fixup: w-1/w-3 wrap refs from the last 3 columns (SURVEY A.8.2)
    for x in (W - 3, W - 2, W - 1):
        cv = jnp.zeros((B, 3), jnp.int32)
        for o in offs:
            src = (
                row[:, :, x - o]
                if x - o >= 0
                else prev4[:, :, 4 * W + x - o]
            )
            cv = jnp.where((ro_row[:, x] == o)[:, None], src, cv)
        lag = [
            row[:, :, x - k] if x - k >= 0 else prev4[:, :, 4 * W + x - k]
            for k in (1, 2, 3)
        ]
        val = _apply_form(
            f_row[:, x][:, None], d_row[:, :, x], cv, ab_row[:, :, x],
            lag[0], lag[1], lag[2],
        )  # (B, 3)
        pieces = [row[:, :, :x], val[:, :, None]]
        if x + 1 < W:  # Mosaic rejects zero-size vector slices
            pieces.append(row[:, :, x + 1 :])
        row = jnp.concatenate(pieces, axis=2)

    out_ref[0] = row.reshape(3 * B, W)
    prev4_scr[:] = jnp.concatenate([prev4[:, :, W:], row], axis=2).reshape(
        3 * B, 4 * W
    )


@partial(jax.jit, static_argnames=("n_pixels", "width", "interpret"))
def reconstruct_rows_pallas(
    form, delta, refoff, *, n_pixels: int, width: int, interpret: bool = False
):
    """Batched Pallas row reconstruction.

    form/refoff (B, N) int32; delta (B, 3, N) int32 CHANNEL-PLANAR.
    Requires width % 128 == 0 (lane-aligned segments).  Returns (B, 3, N)
    int32 — bit-identical to `vmap(decode_dev.reconstruct_rows)`
    (cross-tested in interpret mode)."""
    N, W = n_pixels, width
    if W % LANE:
        raise ValueError("pallas reconstruction requires width % 128 == 0")
    B = form.shape[0]
    H = N // W
    offs = tuple(_const_offsets(W))
    kern = partial(_recon_kernel, W=W, offs=offs)
    # stage row-major-outer so each block's trailing dims are (rows, W)
    f_h = jnp.transpose(form.reshape(B, H, W), (1, 0, 2))  # (H, B, W)
    d_h = jnp.transpose(delta.reshape(B, 3, H, W), (2, 0, 1, 3)).reshape(
        H, 3 * B, W
    )
    ro_h = jnp.transpose(refoff.reshape(B, H, W), (1, 0, 2))
    try:  # the unrolled build keeps many live temporaries on the Mosaic
        # stack; the default 16 MiB scoped-vmem limit is too small at B=8
        params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    except TypeError:  # pragma: no cover - older API name
        params = pltpu.TPUCompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    out = pl.pallas_call(
        kern,
        grid=(H,),
        interpret=interpret,
        compiler_params=params,
        in_specs=[
            pl.BlockSpec((1, B, W), lambda h: (h, 0, 0)),
            pl.BlockSpec((1, 3 * B, W), lambda h: (h, 0, 0)),
            pl.BlockSpec((1, B, W), lambda h: (h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 3 * B, W), lambda h: (h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((H, 3 * B, W), jnp.int32),
        scratch_shapes=[pltpu.VMEM((3 * B, 4 * W), jnp.int32)],
    )(f_h, d_h, ro_h)
    return jnp.transpose(out.reshape(H, B, 3, W), (1, 2, 0, 3)).reshape(B, 3, N)
