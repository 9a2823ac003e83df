"""Pallas TPU kernels for the codec's hot ops.

The measured cost model (see encode2.py) shows XLA's scatter/gather lower to
~5-9 ns/element on TPU while the MXU and VPU stream at bandwidth.  These
kernels therefore express histogram and table lookups as one-hot compare
matmuls entirely inside VMEM — the MXU becomes the random-access engine:

  * histogram:   counts = sum_chunks ones(1,K) @ onehot(K, BINS)
  * table join:  vals   = onehot(K, BINS) @ table(BINS, 3)

Exactness: every matmul operand is one-hot/boolean in bf16 and every summed
value fits f32's 24-bit mantissa (chunk counts <= K; table entries are split
into 16-bit halves), so results are exact integers.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nicetpu.format import constants as C

# 858 real bins padded to a lane-aligned 896; bin 858+ = masked/invalid.
BINS_PAD = 896
CHUNK = 2048


def _hist_kernel(bins_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    chunk = bins_ref[:]  # (CHUNK, 1) int32
    ids = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, BINS_PAD), 1)
    oh = (chunk == ids).astype(jnp.bfloat16)
    ones = jnp.ones((1, CHUNK), jnp.bfloat16)
    counts = jax.lax.dot_general(
        ones, oh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (1, BINS_PAD); chunk counts <= CHUNK < 2^24 => exact
    out_ref[:] += counts.astype(jnp.int32)


@jax.jit
def histogram_pallas(bins: jnp.ndarray) -> jnp.ndarray:
    """(M,) int32 bins (invalid entries >= 858) -> (858,) int32 counts."""
    M = bins.shape[0]
    m_pad = -(-M // CHUNK) * CHUNK
    if m_pad != M:
        bins = jnp.pad(bins, (0, m_pad - M), constant_values=BINS_PAD - 1)
    grid = m_pad // CHUNK
    out = pl.pallas_call(
        _hist_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((CHUNK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, BINS_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, BINS_PAD), jnp.int32),
    )(bins.reshape(m_pad, 1))
    return out[0, : C.TOTAL_SYMBOLS]


def _join_kernel(bins_ref, table_ref, out_ref):
    chunk = bins_ref[:]  # (CHUNK, 1) int32
    ids = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, BINS_PAD), 1)
    oh = (chunk == ids).astype(jnp.bfloat16)
    vals = jax.lax.dot_general(
        oh,
        table_ref[:].astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (CHUNK, 128); one-hot rows select single entries <= 255, exact in bf16
    out_ref[:] = vals.astype(jnp.int32)


@jax.jit
def table_join_pallas(bins: jnp.ndarray, aob_lut: jnp.ndarray, code_lut: jnp.ndarray):
    """MXU table lookup: (M,) bins -> (aob (M,) int32, code (M,) uint32).

    Invalid bins (>= 858) yield aob 0.  The table packs [aob, code byte 3..0]
    into lane-aligned 128 columns; every entry is <= 255 so the bf16 one-hot
    matmul is exact.
    """
    M = bins.shape[0]
    table = jnp.zeros((BINS_PAD, 128), jnp.int32)
    table = table.at[: C.TOTAL_SYMBOLS, 0].set(aob_lut.astype(jnp.int32))
    for b in range(4):
        table = table.at[: C.TOTAL_SYMBOLS, 1 + b].set(
            ((code_lut >> jnp.uint32(8 * (3 - b))) & jnp.uint32(0xFF)).astype(
                jnp.int32
            )
        )

    m_pad = -(-M // CHUNK) * CHUNK
    if m_pad != M:
        bins = jnp.pad(bins, (0, m_pad - M), constant_values=BINS_PAD - 1)
    grid = m_pad // CHUNK
    out = pl.pallas_call(
        _join_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((CHUNK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BINS_PAD, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CHUNK, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, 128), jnp.int32),
    )(bins.reshape(m_pad, 1), table)
    aob = out[:M, 0]
    code = (
        (out[:M, 1].astype(jnp.uint32) << jnp.uint32(24))
        | (out[:M, 2].astype(jnp.uint32) << jnp.uint32(16))
        | (out[:M, 3].astype(jnp.uint32) << jnp.uint32(8))
        | out[:M, 4].astype(jnp.uint32)
    )
    return aob, code
