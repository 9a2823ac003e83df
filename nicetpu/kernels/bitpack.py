"""Parallel bit-pack: exclusive-scan bit offsets + word-level scatter-add.

TPU-first replacement of the reference's serial Bitwriter loop
(ref hfe.rs:110-113, bitwriter.rs:55-73): each token's Huffman code is placed
at its exclusive-prefix-sum bit offset; codes land in one or two big-endian
u32 words via disjoint-bit scatter-adds.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nicetpu.format import constants as C


@partial(jax.jit, static_argnames=("capacity_words",))
def pack_tokens(
    streams: jnp.ndarray,  # (N, S) int32, zeroed where invalid
    symbols: jnp.ndarray,  # (N, S) int32
    valid: jnp.ndarray,  # (N, S) bool
    aob_lut: jnp.ndarray,  # (858,) int32 code lengths
    code_lut: jnp.ndarray,  # (858,) uint32 canonical codes
    *,
    capacity_words: int,
):
    """Returns (words uint32 (capacity_words,), total_bits int32).

    Flattening (N, S) row-major is the serial token order (SURVEY A.6).
    """
    base = jnp.asarray(np.asarray(C.STREAM_BASE, dtype=np.int32))
    bins = (base[streams] + symbols).reshape(-1)
    v = valid.reshape(-1)
    aob = jnp.where(v, aob_lut[bins], 0)
    code = jnp.where(v, code_lut[bins], jnp.uint32(0))

    offs = jnp.cumsum(aob) - aob  # exclusive scan, serial token order
    total_bits = offs[-1] + aob[-1]

    w = (offs >> 5).astype(jnp.int32)
    rbits = (offs & 31).astype(jnp.int32)
    L = aob
    fits = rbits + L <= 32
    k = jnp.where(fits, 0, rbits + L - 32)
    shift_hi = jnp.clip(jnp.where(fits, 32 - rbits - L, k), 0, 31)
    hi = jnp.where(
        fits,
        code << shift_hi.astype(jnp.uint32),
        code >> shift_hi.astype(jnp.uint32),
    )
    mask_k = (jnp.uint32(1) << k.astype(jnp.uint32)) - jnp.uint32(1)
    shift_lo = jnp.clip(32 - k, 0, 31)
    lo = jnp.where(
        fits, jnp.uint32(0), (code & mask_k) << shift_lo.astype(jnp.uint32)
    )

    words = jnp.zeros(capacity_words, dtype=jnp.uint32)
    words = words.at[w].add(hi, mode="drop")
    words = words.at[w + 1].add(lo, mode="drop")
    return words, total_bits


def payload_capacity_words(n_pixels: int, needed_bits: int | None = None) -> int:
    """Static word capacity: generous default, padded to a stable bucket."""
    cap_bits = max(48 * n_pixels + 8192, (needed_bits or 0) + 64)
    return (cap_bits + 31) // 32 + 1


def words_to_payload(words: np.ndarray, total_bits: int) -> bytes:
    """Host-side: big-endian word dump -> payload bytes + 5-byte flush tail."""
    raw = words.astype(">u4").tobytes()
    full = total_bits // 8
    B = raw[full] if total_bits % 8 else 0
    return raw[:full] + bytes([B, B, 0, 0, 0])
