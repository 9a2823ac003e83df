"""Pallas TPU kernels for the codec's hot ops (batched).

The measured cost model (see encode2.py) shows XLA's scatter/gather lower to
~5-9 ns/element on TPU while the MXU and VPU stream at bandwidth.  These
kernels therefore express histogram and table lookups as one-hot compare
matmuls entirely inside VMEM — the MXU/VPU become the random-access engine.

Layout notes (Mosaic tiling rules):
  * token streams travel as natural (rows, 128) int32 tiles; each kernel
    invocation owns an (8, 128) block = 1024 tokens,
  * the one-hot is built per 128-lane row by comparing a sublane iota
    (BINS_PAD, 128) against the lane-broadcast row — no in-kernel relayouts,
  * table entries are split into bytes (<= 255, exact in bf16); sums stay
    within f32's 24-bit mantissa; code reassembly happens in int32.

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

# 858 real bins padded to a lane-aligned 896; bin 858+ = masked/invalid.
BINS_PAD = 896
BLOCK_TOKENS = 1024  # (8, 128) tile per kernel invocation


def _to_tiles(bins: jnp.ndarray) -> tuple[jnp.ndarray, int, int]:
    """(B, M) -> (B*rows, 128) padded to BLOCK_TOKENS per image."""
    B, M = bins.shape
    m_pad = -(-M // BLOCK_TOKENS) * BLOCK_TOKENS
    if m_pad != M:
        bins = jnp.pad(bins, ((0, 0), (0, m_pad - M)), constant_values=BINS_PAD - 1)
    rows = m_pad // 128
    return bins.reshape(B * rows, 128), m_pad, m_pad // BLOCK_TOKENS


def _hist_kernel(bins_ref, out_ref):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    chunk = bins_ref[:]  # (8, 128) int32
    ids = jax.lax.broadcasted_iota(jnp.int32, (BINS_PAD, 128), 0)
    acc = jnp.zeros((BINS_PAD, 1), jnp.float32)
    for r in range(8):
        row = chunk[r : r + 1, :]  # (1, 128)
        oh = (jnp.broadcast_to(row, (BINS_PAD, 128)) == ids).astype(jnp.float32)
        acc = acc + jnp.sum(oh, axis=1, keepdims=True)
    out_ref[:] += acc.astype(jnp.int32)


@jax.jit
def histogram_pallas(bins: jnp.ndarray) -> jnp.ndarray:
    """(B, M) int32 bins (invalid entries >= 858) -> (B, 858) int32 counts."""
    B, M = bins.shape
    tiles, m_pad, blocks = _to_tiles(bins)
    rows = m_pad // 128
    out = pl.pallas_call(
        _hist_kernel,
        grid=(B, blocks),
        in_specs=[
            pl.BlockSpec(
                (8, 128),
                lambda b, i, r=rows: (b * (r // 8) + i, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (BINS_PAD, 1), lambda b, i: (b, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B * BINS_PAD, 1), jnp.int32),
    )(tiles)
    return out.reshape(B, BINS_PAD)[:, : C.TOTAL_SYMBOLS]


def _join_kernel(bins_ref, table_ref, aob_ref, code_ref):
    chunk = bins_ref[:]  # (8, 128) int32
    ids = jax.lax.broadcasted_iota(jnp.int32, (BINS_PAD, 128), 0)
    table = table_ref[:]  # (BINS_PAD, 128) bf16: cols 0..4 = aob, code bytes
    aob_rows = []
    code_rows = []
    for r in range(8):
        row = chunk[r : r + 1, :]
        oh = (jnp.broadcast_to(row, (BINS_PAD, 128)) == ids).astype(jnp.bfloat16)
        # (128 table cols, BINS_PAD) @ (BINS_PAD, 128 tokens) -> (128, 128)
        vals = jax.lax.dot_general(
            table,
            oh,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        iv = vals.astype(jnp.int32)
        aob_rows.append(iv[0:1, :])
        code_rows.append(
            (iv[1:2, :] << 24) | (iv[2:3, :] << 16) | (iv[3:4, :] << 8) | iv[4:5, :]
        )
    aob_ref[:] = jnp.concatenate(aob_rows, axis=0)
    code_ref[:] = jnp.concatenate(code_rows, axis=0)


@jax.jit
def table_join_pallas(
    bins: jnp.ndarray, aob_tbl: jnp.ndarray, code_tbl: jnp.ndarray
):
    """MXU table lookup with per-image tables.

    bins (B, M) int32 (invalid >= 858); aob_tbl (B, 858) int32;
    code_tbl (B, 858) uint32.  Returns aob (B, M) int32, code (B, M) uint32.
    """
    B, M = bins.shape
    table = jnp.zeros((B, BINS_PAD, 128), jnp.bfloat16)
    table = table.at[:, : C.TOTAL_SYMBOLS, 0].set(aob_tbl.astype(jnp.bfloat16))
    for byte in range(4):
        table = table.at[:, : C.TOTAL_SYMBOLS, 1 + byte].set(
            ((code_tbl >> jnp.uint32(8 * (3 - byte))) & jnp.uint32(0xFF)).astype(
                jnp.bfloat16
            )
        )
    table = table.reshape(B * BINS_PAD, 128)

    tiles, m_pad, blocks = _to_tiles(bins)
    rows = m_pad // 128
    aob, code = pl.pallas_call(
        _join_kernel,
        grid=(B, blocks),
        in_specs=[
            pl.BlockSpec(
                (8, 128),
                lambda b, i, r=rows: (b * (r // 8) + i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (BINS_PAD, 128), lambda b, i: (b, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (8, 128),
                lambda b, i, r=rows: (b * (r // 8) + i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, 128),
                lambda b, i, r=rows: (b * (r // 8) + i, 0),
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
