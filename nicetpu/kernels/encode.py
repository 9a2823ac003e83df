"""TPU encode orchestration: device tokenize/histogram/pack + host tables.

Pipeline per image (SURVEY §7.2):
  1. device: tokenize_and_count (jit, specialized on width)
  2. host:   Huffman code lengths from the 858-bin histogram (native C++ when
             available — tiny alphabets, SURVEY §7.1 step C5) + canonical codes
  3. device: pack_tokens with the length/code LUTs
  4. host:   header assembly + payload slice

The exact payload size is known on the host before step 3 (sum of
counts*lengths), so the static word capacity never under-allocates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from nicetpu.format import constants as C
from nicetpu.format import headers, huffman
from nicetpu.kernels.bitpack import tokens_to_code_bits, words_to_payload
from nicetpu.kernels.tokenize import tokenize_and_count


def _build_tables(counts: np.ndarray):
    """Host table build; prefers the native C++ builder (identical output)."""
    try:
        from nicetpu.hostref.oracle import code_lengths_native

        flat_lengths = np.zeros(C.TOTAL_SYMBOLS, dtype=np.uint8)
        for s in range(C.NUM_STREAMS):
            b, sz = C.STREAM_BASE[s], C.ALPHABET_SIZES[s]
            flat_lengths[b : b + sz] = code_lengths_native(counts[b : b + sz])
        flat_codes = np.zeros(C.TOTAL_SYMBOLS, dtype=np.uint32)
        for s in range(C.NUM_STREAMS):
            b, sz = C.STREAM_BASE[s], C.ALPHABET_SIZES[s]
            flat_codes[b : b + sz] = huffman.canonical_codes(flat_lengths[b : b + sz])
        return flat_lengths, flat_codes
    except Exception:
        flat_lengths, flat_codes, _ = huffman.build_all_tables(counts)
        return flat_lengths, flat_codes


def encode_jax(img: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 image on the accelerator."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("expected (H, W, 3) uint8 image")
    H, W, _ = img.shape
    if W < C.MIN_WIDTH:
        raise ValueError(f"width must be >= {C.MIN_WIDTH} (SURVEY A.8.7)")
    N = H * W

    flat = jnp.asarray(img.reshape(N, 3))
    tok = tokenize_and_count(flat, width=W)
    counts = np.asarray(tok["counts"]).astype(np.int64)

    flat_lengths, flat_codes = _build_tables(counts)
    needed_bits = int((counts * flat_lengths.astype(np.int64)).sum())

    levels = max(1, (N * C.TOKEN_SLOTS - 1).bit_length())
    words, total_bits = tokens_to_code_bits(
        tok["streams"],
        tok["symbols"],
        tok["valid"],
        jnp.asarray(flat_lengths.astype(np.int32)),
        jnp.asarray(flat_codes),
        levels=levels,
    )
    total_bits = int(total_bits)
    assert total_bits == needed_bits, (total_bits, needed_bits)

    return (
        headers.pack_file_header(W, H, 3)
        + headers.pack_stream_headers(flat_lengths)
        + words_to_payload(np.asarray(words), total_bits)
    )
