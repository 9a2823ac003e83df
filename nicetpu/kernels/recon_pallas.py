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

# Mosaic stack budget: the channel-fused build keeps ~8 live (3B*S, 256)
# int32 temporaries (r1..r3 rotate without copies); keep B*S under this
# bound per kernel invocation and chunk larger batches
# (max_batch_for_width); wider rasters than S = MAX_BS segments fall back
# to the XLA reconstruction.  Measured on chip: B*S = 126 compiles to
# 128.07 MiB of vmem against the 128 MiB cap — 104 leaves ~18% margin.
MAX_BS = 104


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
    """One raster row for the whole batch.

    r5 layout: every build/resolve/replay tensor is 2-D (M, x) with
    M = 3*B*S rows indexed ((b*3 + c)*S + s) — channels FUSED into the
    sublane dimension so each `_apply_form` is one full-tile op instead of
    three (B, S, 256) ops on half-empty sublane tiles (the r4 kernel
    measured 47 ms of the 106 ms batch decode; ~92 us/row against ~30 us
    of VPU element work).  All cross-shape moves are broadcast+leading-dim
    reshapes (free) — no jnp.stack of small pieces (Mosaic lowering
    rejects those at small B)."""
    h = pl.program_id(0)
    S = W // LANE
    L = LANE
    B = f_ref.shape[1]
    M = 3 * B * S

    @pl.when(h == 0)
    def _():
        prev4_scr[:] = jnp.zeros_like(prev4_scr)

    def rep_c(x):  # (B, k) -> (3B, k), channel-replicate (b-major rows)
        # jnp.repeat on the sublane dim lowers via tpu.repeat/concat for any
        # B; the broadcast_to+reshape formulation hit "Invalid input layout"
        # at B=1 (vector.broadcast (1,1)->(3,1))
        return jnp.repeat(x, 3, axis=0)

    f_row = f_ref[0]  # (B, W)
    d_row = d_ref[0]  # (3B, W)
    ro_row = ro_ref[0]  # (B, W)
    prev4 = prev4_scr[:]  # (3B, 4W)
    prev4p = jnp.concatenate([prev4, jnp.zeros((3 * B, 3), jnp.int32)], axis=1)
    ab_row = prev4[:, 3 * W :]  # (3B, W)
    ro3 = rep_c(ro_row)  # (3B, W)
    f3 = rep_c(f_row)  # (3B, W)
    cv_row = jnp.zeros((3 * B, W), jnp.int32)
    for o in offs:
        cv_row = jnp.where(ro3 == o, prev4p[:, 4 * W - o : 5 * W - o], cv_row)

    # flat (M, L) views: leading-dim reshapes only
    f_f = f3.reshape(M, L)
    d_f = d_row.reshape(M, L)
    cv_f = cv_row.reshape(M, L)
    ab_f = ab_row.reshape(M, L)
    f_seg = f_row.reshape(B, S, L)  # tag updates live on (B, S)

    # ---- build: push all 256 candidate boundary values through each segment
    cand = jax.lax.broadcasted_iota(jnp.int32, (M, 256), 1)
    r1, r2, r3 = cand, cand, cand  # LUT of the lag tagged t1/t2/t3
    t1 = jnp.zeros((B, S), jnp.int32)
    t2 = jnp.ones((B, S), jnp.int32)
    t3 = jnp.full((B, S), 2, jnp.int32)
    for l in range(L):
        new = _apply_form(
            f_f[:, l : l + 1], d_f[:, l : l + 1], cv_f[:, l : l + 1],
            ab_f[:, l : l + 1], r1, r2, r3,
        )  # (M, 256)
        f_l = f_seg[:, :, l]
        nt = jnp.where(f_l == F_ADD2, t2, jnp.where(f_l == F_ADD3, t3, t1))
        r1, r2, r3 = new, r1, r2
        t1, t2, t3 = nt, t1, t2

    # ---- resolve: serial one-hot evaluation across the S segments.
    # Per-segment values live as (3B, S) / (3B, 256) tensors — sublane-dim
    # regrouping reshapes of the (M, x) build tensors are leading-dim only
    # (a lane->sublane reshape like (3B, 1, S) -> (M, 1) is an unsupported
    # Mosaic shape cast).
    iota256 = jax.lax.broadcasted_iota(jnp.int32, (3 * B, 256), 1)
    iota_S = jax.lax.broadcasted_iota(jnp.int32, (3 * B, S), 1)
    # trip[k]: (3B, 1) boundary value at lag k+1 entering the next segment
    trip = [prev4[:, 4 * W - 1 - k : 4 * W - k] for k in range(3)]
    V = [jnp.zeros((3 * B, S), jnp.int32) for _ in range(3)]
    rs = [r.reshape(3 * B, S, 256) for r in (r1, r2, r3)]
    ts = (t1, t2, t3)
    for s in range(S):
        new_trip = []
        for k in range(3):
            V[k] = jnp.where(iota_S == s, trip[k], V[k])
            tag = rep_c(ts[k][:, s : s + 1])  # (3B, 1)
            tv = jnp.where(
                tag == 0, trip[0], jnp.where(tag == 1, trip[1], trip[2])
            )  # (3B, 1)
            oh = iota256 == tv  # (3B, 256)
            val = jnp.sum(
                jnp.where(oh, rs[k][:, s, :], 0), axis=1, keepdims=True
            )  # (3B, 1)
            new_trip.append(val)
        trip = new_trip

    # ---- replay with true inputs (all (3B, S)-shaped per-lane steps)
    f_s3 = f3.reshape(3 * B, S, L)
    d_s3 = d_row.reshape(3 * B, S, L)
    cv_s3 = cv_row.reshape(3 * B, S, L)
    ab_s3 = ab_row.reshape(3 * B, S, L)
    v1, v2, v3 = V  # (3B, S)
    row_sl = jnp.zeros((3 * B, S, L), jnp.int32)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (3 * B, S, L), 2)
    for l in range(L):
        new = _apply_form(
            f_s3[:, :, l], d_s3[:, :, l], cv_s3[:, :, l], ab_s3[:, :, l],
            v1, v2, v3,
        )  # (3B, S)
        # lane-l one-hot blend (dynamic_update_slice is unimplemented in
        # the Mosaic TC lowering)
        row_sl = jnp.where(lane_iota == l, new[:, :, None], row_sl)
        v1, v2, v3 = new, v1, v2
    row = row_sl.reshape(3 * B, W)

    # ---- fixup: w-1/w-3 wrap refs from the last 3 columns (SURVEY A.8.2)
    for x in (W - 3, W - 2, W - 1):
        cv = jnp.zeros((3 * B, 1), jnp.int32)
        rox = rep_c(ro_row[:, x : x + 1])
        for o in offs:
            src = (
                row[:, x - o : x - o + 1]
                if x - o >= 0
                else prev4[:, 4 * W + x - o : 4 * W + x - o + 1]
            )
            cv = jnp.where(rox == o, src, cv)
        lag = [
            row[:, x - k : x - k + 1]
            if x - k >= 0
            else prev4[:, 4 * W + x - k : 4 * W + x - k + 1]
            for k in (1, 2, 3)
        ]
        val = _apply_form(
            rep_c(f_row[:, x : x + 1]), d_row[:, x : x + 1], cv,
            ab_row[:, x : x + 1], lag[0], lag[1], lag[2],
        )  # (3B, 1)
        pieces = [row[:, :x], val]
        if x + 1 < W:  # Mosaic rejects zero-size vector slices
            pieces.append(row[:, x + 1 :])
        row = jnp.concatenate(pieces, axis=1)

    out_ref[0] = row
    prev4_scr[:] = jnp.concatenate([prev4[:, W:], row], axis=1)


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
    if form.shape[0] == 1:
        # B=1 hits Mosaic "Invalid input layout" on the kernel's (1,1)->(3,1)
        # channel replication; pad with a dummy image and slice it back off
        pad1 = lambda x: jnp.concatenate([x, jnp.zeros_like(x)], axis=0)
        return reconstruct_rows_pallas(
            pad1(form), pad1(delta), pad1(refoff),
            n_pixels=n_pixels, width=width, interpret=interpret,
        )[:1]
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
        # (measured ~1.01 MiB per image-segment; MAX_BS=104 => ~105 MiB,
        # hard device cap 128 MiB incl. I/O blocks)
        params = pltpu.CompilerParams(vmem_limit_bytes=116 * 1024 * 1024)
    except TypeError:  # pragma: no cover - older API name
        params = pltpu.TPUCompilerParams(vmem_limit_bytes=116 * 1024 * 1024)
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
