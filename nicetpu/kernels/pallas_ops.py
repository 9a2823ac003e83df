"""Pallas TPU kernels for the codec's hot ops (batched).

The measured cost model (see encode2.py) shows XLA's scatter/gather lower to
~5-9 ns/element on TPU while the MXU and VPU stream at bandwidth.  These
kernels therefore express histogram and table lookups as one-hot compare
matmuls entirely inside VMEM — the MXU/VPU become the random-access engine.

Two-level factorization: a flat bin index b < 1024 splits as b = 128*hi + lo
(hi < 8, lo < 128).  The one-hot over b factors into the outer product of a
tiny (8,)-wide one-hot over hi and a (128,)-wide one-hot over lo, so building
the indicators costs ~136 VPU lanes per token instead of ~1024, and the bin
dimension contracts on the MXU:

  histogram:  acc[hi, lo] += sum_t oh_hi[hi, t] * oh_lo[lo, t]   (one matmul)
  join:       B[hc, t]     = sum_l T[hc, l] * oh_lo[l, t]        (one matmul)
              val_c[t]     = sum_h oh_hi[h, t] * B[8c + h, t]    (VPU reduce)

This replaced a single-level (896-wide) one-hot design and measured ~5-7x
faster on TPU v5e (histogram 6.2 -> ~0.9 ms, join 5.5 -> ~1.2 ms at 2.1M
tokens) — see ARCHITECTURE.md's cost model.

Layout notes (Mosaic tiling rules):
  * token streams travel as natural (rows, 128) int32 tiles; each kernel
    invocation owns an (8, 128) block = 1024 tokens,
  * table entries are split into bytes (<= 255, exact in bf16); one-hot
    products are 0/1 in bf16; sums accumulate in f32, staying far inside
    f32's 24-bit exact-integer range; code reassembly happens in int32.

All kernels take a leading batch dimension with per-image tables (Kodak-24 /
streamed-corpus configs, BASELINE configs 2/4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nicetpu.format import constants as C

# 858 real bins padded to 1024 = 8 * 128; bins >= 858 are masked/invalid.
BINS_PAD = 1024
HI = 8  # bins split as bin = 128 * hi + lo
BLOCK_ROWS = 32  # sublane rows per kernel invocation
BLOCK_TOKENS = BLOCK_ROWS * 128  # tokens per kernel invocation


def _to_tiles(bins: jnp.ndarray) -> tuple[jnp.ndarray, int, int]:
    """(B, M) -> (B*rows, 128) padded to BLOCK_TOKENS per image."""
    B, M = bins.shape
    m_pad = -(-M // BLOCK_TOKENS) * BLOCK_TOKENS
    if m_pad != M:
        bins = jnp.pad(bins, ((0, 0), (0, m_pad - M)), constant_values=BINS_PAD - 1)
    rows = m_pad // 128
    return bins.reshape(B * rows, 128), m_pad, m_pad // BLOCK_TOKENS


def _onehots(row_hi, row_lo, ids_hi, ids_lo):
    """(1,128) hi/lo rows -> ((HI,128), (128,128)) bf16 one-hot indicators."""
    oh_hi = (jnp.broadcast_to(row_hi, (HI, 128)) == ids_hi).astype(jnp.bfloat16)
    oh_lo = (jnp.broadcast_to(row_lo, (128, 128)) == ids_lo).astype(jnp.bfloat16)
    return oh_hi, oh_lo


def _hist_kernel(bins_ref, out_ref):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    chunk = bins_ref[:]  # (BLOCK_ROWS, 128) int32
    hi = chunk >> 7
    lo = chunk & 127
    ids_hi = jax.lax.broadcasted_iota(jnp.int32, (HI, 128), 0)
    ids_lo = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    # Lane-concat the per-row one-hots so the whole block contracts in ONE
    # (HI, T) x (128, T) matmul instead of BLOCK_ROWS tiny ones.
    ohs = [
        _onehots(hi[r : r + 1, :], lo[r : r + 1, :], ids_hi, ids_lo)
        for r in range(BLOCK_ROWS)
    ]
    oh_hi = jnp.concatenate([p[0] for p in ohs], axis=1)  # (HI, T)
    oh_lo = jnp.concatenate([p[1] for p in ohs], axis=1)  # (128, T)
    acc = jax.lax.dot_general(
        oh_hi,
        oh_lo,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] += acc.astype(jnp.int32)


from functools import partial


@partial(jax.jit, static_argnames=("interpret",))
def histogram_pallas(bins: jnp.ndarray, *, interpret: bool = False) -> jnp.ndarray:
    """(B, M) int32 bins (invalid entries >= 858) -> (B, 858) int32 counts.

    interpret=True runs the kernel in Pallas interpret mode (CPU-testable —
    VERDICT r3 next #3); results are identical."""
    B, M = bins.shape
    tiles, m_pad, blocks = _to_tiles(bins)
    rows = m_pad // 128
    out = pl.pallas_call(
        _hist_kernel,
        interpret=interpret,
        grid=(B, blocks),
        in_specs=[
            pl.BlockSpec(
                (BLOCK_ROWS, 128),
                lambda b, i, r=rows: (b * (r // BLOCK_ROWS) + i, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (HI, 128), lambda b, i: (b, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B * HI, 128), jnp.int32),
    )(tiles)
    return out.reshape(B, BINS_PAD)[:, : C.TOTAL_SYMBOLS]


def _join_kernel(bins_ref, table_ref, aob_ref, code_ref):
    chunk = bins_ref[:]  # (BLOCK_ROWS, 128) int32
    hi = chunk >> 7
    lo = chunk & 127
    ids_hi = jax.lax.broadcasted_iota(jnp.int32, (HI, 128), 0)
    ids_lo = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    table = table_ref[:]  # (5*HI, 128) bf16: row 8c+h = byte c of bins h*128+..
    ohs = [
        _onehots(hi[r : r + 1, :], lo[r : r + 1, :], ids_hi, ids_lo)
        for r in range(BLOCK_ROWS)
    ]
    oh_lo = jnp.concatenate([p[1] for p in ohs], axis=1)  # (128, T)
    # Gather the lo dimension on the MXU once for the whole block:
    # b5[8c+h, t] = byte c of bin (h, lo_t).
    b5 = jax.lax.dot_general(
        table,
        oh_lo,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (5*HI, T)
    aob_rows = []
    code_rows = []
    for r in range(BLOCK_ROWS):
        oh_hi_f = ohs[r][0].astype(jnp.float32)  # (HI, 128)
        b5r = b5[:, 128 * r : 128 * (r + 1)]
        # select the hi dimension with the tiny oh_hi reduce
        vals = [
            jnp.sum(oh_hi_f * b5r[8 * c : 8 * (c + 1), :], axis=0, keepdims=True)
            for c in range(5)
        ]
        iv = [v.astype(jnp.int32) for v in vals]
        aob_rows.append(iv[0])
        code_rows.append((iv[1] << 24) | (iv[2] << 16) | (iv[3] << 8) | iv[4])
    aob_ref[:] = jnp.concatenate(aob_rows, axis=0)
    code_ref[:] = jnp.concatenate(code_rows, axis=0)


def _value_join_kernel(bins_ref, table_ref, val_ref):
    chunk = bins_ref[:]  # (BLOCK_ROWS, 128) int32
    hi = chunk >> 7
    lo = chunk & 127
    ids_hi = jax.lax.broadcasted_iota(jnp.int32, (HI, 128), 0)
    ids_lo = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    table = table_ref[:]  # (2*HI, 128) bf16: row 8c+h = byte c of bins h*128+..
    ohs = [
        _onehots(hi[r : r + 1, :], lo[r : r + 1, :], ids_hi, ids_lo)
        for r in range(BLOCK_ROWS)
    ]
    oh_lo = jnp.concatenate([p[1] for p in ohs], axis=1)  # (128, T)
    b2 = jax.lax.dot_general(
        table,
        oh_lo,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (2*HI, T)
    rows = []
    for r in range(BLOCK_ROWS):
        oh_hi_f = ohs[r][0].astype(jnp.float32)
        b2r = b2[:, 128 * r : 128 * (r + 1)]
        hi_b = jnp.sum(oh_hi_f * b2r[0:8, :], axis=0, keepdims=True)
        lo_b = jnp.sum(oh_hi_f * b2r[8:16, :], axis=0, keepdims=True)
        rows.append((hi_b.astype(jnp.int32) << 8) | lo_b.astype(jnp.int32))
    val_ref[:] = jnp.concatenate(rows, axis=0)


@partial(jax.jit, static_argnames=("interpret",))
def value_join_pallas(
    bins: jnp.ndarray, val_tbl: jnp.ndarray, *, interpret: bool = False
) -> jnp.ndarray:
    """MXU value lookup with per-image tables (16-bit values).

    bins (B, M) int32 (invalid entries >= 858 return 0); val_tbl (B, 858)
    int32 with values < 2^16.  Returns (B, M) int32."""
    B, M = bins.shape
    flat = jnp.zeros((B, 2, BINS_PAD), jnp.bfloat16)
    flat = flat.at[:, 0, : C.TOTAL_SYMBOLS].set(
        ((val_tbl >> 8) & 0xFF).astype(jnp.bfloat16)
    )
    flat = flat.at[:, 1, : C.TOTAL_SYMBOLS].set(
        (val_tbl & 0xFF).astype(jnp.bfloat16)
    )
    table = flat.reshape(B * 2 * HI, 128)

    tiles, m_pad, blocks = _to_tiles(bins)
    rows = m_pad // 128
    val = pl.pallas_call(
        _value_join_kernel,
        interpret=interpret,
        grid=(B, blocks),
        in_specs=[
            pl.BlockSpec(
                (BLOCK_ROWS, 128),
                lambda b, i, r=rows: (b * (r // BLOCK_ROWS) + i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (2 * HI, 128), lambda b, i: (b, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (BLOCK_ROWS, 128),
            lambda b, i, r=rows: (b * (r // BLOCK_ROWS) + i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(tiles.shape, jnp.int32),
    )(tiles, table)
    return val.reshape(B, m_pad)[:, :M]


@partial(jax.jit, static_argnames=("interpret",))
def table_join_pallas(
    bins: jnp.ndarray, aob_tbl: jnp.ndarray, code_tbl: jnp.ndarray,
    *, interpret: bool = False,
):
    """MXU table lookup with per-image tables.

    bins (B, M) int32 (invalid >= 858); aob_tbl (B, 858) int32;
    code_tbl (B, 858) uint32.  Returns aob (B, M) int32, code (B, M) uint32.
    """
    B, M = bins.shape
    # table layout (B, 5*HI, 128): row 8c+h holds byte c (c=0: aob; c=1..4:
    # code bytes, big-endian) of bins [h*128, (h+1)*128).
    flat = jnp.zeros((B, 5, BINS_PAD), jnp.bfloat16)
    flat = flat.at[:, 0, : C.TOTAL_SYMBOLS].set(aob_tbl.astype(jnp.bfloat16))
    for byte in range(4):
        flat = flat.at[:, 1 + byte, : C.TOTAL_SYMBOLS].set(
            ((code_tbl >> jnp.uint32(8 * (3 - byte))) & jnp.uint32(0xFF)).astype(
                jnp.bfloat16
            )
        )
    table = flat.reshape(B * 5 * HI, 128)

    tiles, m_pad, blocks = _to_tiles(bins)
    rows = m_pad // 128
    aob, code = pl.pallas_call(
        _join_kernel,
        interpret=interpret,
        grid=(B, blocks),
        in_specs=[
            pl.BlockSpec(
                (BLOCK_ROWS, 128),
                lambda b, i, r=rows: (b * (r // BLOCK_ROWS) + i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (5 * HI, 128), lambda b, i: (b, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (BLOCK_ROWS, 128),
                lambda b, i, r=rows: (b * (r // BLOCK_ROWS) + i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (BLOCK_ROWS, 128),
                lambda b, i, r=rows: (b * (r // BLOCK_ROWS) + i, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(tiles.shape, jnp.int32),
            jax.ShapeDtypeStruct(tiles.shape, jnp.int32),
        ),
    )(tiles, table)
    aob = aob.reshape(B, m_pad)[:, :M]
    code = code.reshape(B, m_pad)[:, :M]
    return aob, jax.lax.bitcast_convert_type(code, jnp.uint32)


def _fold_kernel(aob_ref, code_ref, rec_ref, k_ref, *, S: int, capw: int):
    """Fold one block of 1024 groups: each lane packs its group's S
    (aob, code) slots into a left-aligned capw-word bit record, entirely in
    registers (the XLA formulation materialized every intermediate to HBM —
    ~18 ms/batch; this kernel is the same math at VPU speed)."""
    rec = [jnp.zeros((8, 128), jnp.int32) for _ in range(capw)]
    cum = jnp.zeros((8, 128), jnp.int32)
    for s in range(S):
        L = aob_ref[0, s]
        cd = code_ref[0, s]
        sw = cum >> 5
        sb = cum & 31
        fits = sb + L <= 32
        k = jnp.where(fits, 0, sb + L - 32)
        shift_hi = jnp.clip(jnp.where(fits, 32 - sb - L, k), 0, 31)
        hi = jnp.where(
            fits, cd << shift_hi, jax.lax.shift_right_logical(cd, shift_hi)
        )
        mask_k = (1 << k) - 1
        shift_lo = jnp.clip(32 - k, 0, 31)
        lo = jnp.where(fits, 0, (cd & mask_k) << shift_lo)
        for j in range(min(capw, s + 2)):
            upd = jnp.where(sw == j, hi, 0)
            if j > 0:
                upd = upd | jnp.where(sw == j - 1, lo, 0)
            rec[j] = rec[j] | upd
        cum = cum + L
    for j in range(capw):
        rec_ref[0, j] = rec[j]
    k_ref[0, 0] = cum


def fold_records_pallas(
    aob2: jnp.ndarray, code2: jnp.ndarray, *, capw: int, interpret: bool = False
):
    """Batched group-record fold (encode2's grouped placement, hot path).

    aob2 (B, M, S) int32 per-slot code lengths; code2 (B, M, S) int32 (codes
    as int32 bit patterns).  Returns (rec (B, capw, Mp) int32 left-aligned
    records, k (B, Mp) int32 bit lengths) with Mp = M padded to 1024; group
    order is preserved (padded groups have k = 0, empty records)."""
    from functools import partial as _partial

    B, M, S = aob2.shape
    Mp = -(-M // 1024) * 1024
    if Mp != M:
        aob2 = jnp.pad(aob2, ((0, 0), (0, Mp - M), (0, 0)))
        code2 = jnp.pad(code2, ((0, 0), (0, Mp - M), (0, 0)))
    MR = Mp // 128
    a = jnp.transpose(aob2, (0, 2, 1)).reshape(B, S, MR, 128)
    c = jnp.transpose(code2, (0, 2, 1)).reshape(B, S, MR, 128)
    rec, k = pl.pallas_call(
        _partial(_fold_kernel, S=S, capw=capw),
        interpret=interpret,
        grid=(B, MR // 8),
        in_specs=[
            pl.BlockSpec((1, S, 8, 128), lambda b, i: (b, 0, i, 0)),
            pl.BlockSpec((1, S, 8, 128), lambda b, i: (b, 0, i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, capw, 8, 128), lambda b, i: (b, 0, i, 0)),
            pl.BlockSpec((1, 1, 8, 128), lambda b, i: (b, 0, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, capw, MR, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, MR, 128), jnp.int32),
        ),
    )(a, c)
    return rec.reshape(B, capw, Mp), k.reshape(B, Mp)
