"""Encode pipeline v2: sort-compaction + small scatters (measured TPU costs).

Primitive cost model measured on TPU v5e via this repo's microbenchmarks:
  * element-wise / static slicing: ~HBM bandwidth (effectively free)
  * lax.sort: ~2 ns/element        * scatter/gather: ~5-9 ns/element
  * dispatch round-trip: ~25 ms    * H2D ~90 MB/s, D2H ~40 MB/s (axon tunnel)

Consequences implemented here:
  1. Token slots are compacted to the ~1.5-3 tokens/pixel that are actually
     valid with ONE key-value sort (key = masked slot index), so every
     downstream scatter/gather touches C ~ 2N elements instead of 16N.
  2. The slot layout is adaptive: 3 run-digit slots (runs <= 512 pixels)
     on the fast path; a device-computed overflow flag triggers the full
     11-digit layout only when an image contains longer runs.
  3. Exactly two device dispatches per image (tokenize+compact+histogram,
     then table-join+offsets+pack), with only tiny host transfers between.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nicetpu.format import constants as C
from nicetpu.format import headers
from nicetpu.kernels.scan import suffix_min
from nicetpu.kernels.tokenize import assemble_slots, cascade, histogram
from nicetpu.kernels.bitpack import words_to_payload


def _use_pallas() -> bool:
    """MXU one-hot kernels on real TPU; jnp scatter/gather elsewhere (same
    results — pure performance switch)."""
    return jax.default_backend() not in ("cpu",)


def _slot_arrays(img_flat, *, width: int, ndigits_cap: int):
    """cascade + slot assembly, truncated to 5 + ndigits_cap slots.

    Returns (streams, symbols, valid) each (N, S) plus overflow flag
    (True if some run needs more digits than ndigits_cap).
    """
    N = img_flat.shape[0]
    x = img_flat.astype(jnp.int32)
    cas = cascade(x, jnp.int32(0), N, width=width, halo=0)
    pos = cas["pos"]
    enc = cas["changed"]
    change_idx = jnp.where(enc, pos, N)
    sfx = suffix_min(change_idx)
    next_change = jnp.concatenate([sfx[1:], jnp.array([N], jnp.int32)])
    run_len = next_change - pos - 1

    streams, symbols, valid = assemble_slots(cas, run_len)
    S = 5 + ndigits_cap
    overflow = jnp.any(valid[:, S:]) if S < C.TOKEN_SLOTS else jnp.bool_(False)
    return streams[:, :S], symbols[:, :S], valid[:, :S], overflow


@partial(jax.jit, static_argnames=("width", "ndigits_cap"))
def tokenize_compact(img_flat, *, width: int, ndigits_cap: int):
    """Dispatch A: tokenize, compact tokens by sort, histogram the compacts.

    Returns dict: sorted_bins (N*S,) int32 in serial token order (valid
    prefix), counts (858,), overflow flag.
    """
    streams, symbols, valid, overflow = _slot_arrays(
        img_flat, width=width, ndigits_cap=ndigits_cap
    )
    M = streams.shape[0] * streams.shape[1]
    base = jnp.asarray(np.asarray(C.STREAM_BASE, dtype=np.int32))
    bins = (base[streams] + symbols).reshape(-1)
    v = valid.reshape(-1)

    idx = jnp.arange(M, dtype=jnp.int32)
    key = jnp.where(v, idx, M + idx)  # unique keys; valid tokens first, in order
    _, sorted_bins = jax.lax.sort((key, bins), num_keys=1)

    n_valid = v.sum().astype(jnp.int32)
    # Histogram on the compacted prefix: mask out the invalid tail.
    cidx = jnp.arange(M, dtype=jnp.int32)
    live = cidx < n_valid
    if _use_pallas():
        from nicetpu.kernels.pallas_ops import BINS_PAD, histogram_pallas

        counts = histogram_pallas(jnp.where(live, sorted_bins, BINS_PAD - 1))
    else:
        counts = (
            jnp.zeros(C.TOTAL_SYMBOLS, dtype=jnp.int32)
            .at[jnp.where(live, sorted_bins, 0)]
            .add(live.astype(jnp.int32), mode="drop")
        )
    # Single small readback: counts ++ [overflow] (n_valid = counts.sum()).
    stats = jnp.concatenate([counts, overflow.astype(jnp.int32).reshape(1)])
    return {"sorted_bins": sorted_bins, "stats": stats}


@partial(jax.jit, static_argnames=("c_cap", "w_cap"))
def pack_compact(sorted_bins, n_valid, aob_lut, code_lut, *, c_cap: int, w_cap: int):
    """Dispatch B: join tables, exclusive-scan offsets, place codes in words.

    sorted_bins: (M,) from tokenize_compact; only the first n_valid entries
    are real (n_valid <= c_cap statically guaranteed by the caller's bucket).
    Returns (words (w_cap,) uint32, total_bits int32).
    """
    bins_c = jax.lax.slice_in_dim(sorted_bins, 0, c_cap)
    live = jnp.arange(c_cap, dtype=jnp.int32) < jnp.int32(n_valid)
    if _use_pallas():
        from nicetpu.kernels.pallas_ops import BINS_PAD, table_join_pallas

        aob, code = table_join_pallas(
            jnp.where(live, bins_c, BINS_PAD - 1), aob_lut, code_lut
        )
    else:
        aob = jnp.where(live, aob_lut[bins_c], 0)
        code = jnp.where(live, code_lut[bins_c], jnp.uint32(0))

    offs = jnp.cumsum(aob) - aob
    total_bits = offs[-1] + aob[-1]

    w = (offs >> 5).astype(jnp.int32)
    rb = offs & 31
    L = aob
    fits = rb + L <= 32
    k = jnp.where(fits, 0, rb + L - 32)
    shift_hi = jnp.clip(jnp.where(fits, 32 - rb - L, k), 0, 31).astype(jnp.uint32)
    hi = jnp.where(fits, code << shift_hi, code >> shift_hi)
    mask_k = (jnp.uint32(1) << k.astype(jnp.uint32)) - jnp.uint32(1)
    shift_lo = jnp.clip(32 - k, 0, 31).astype(jnp.uint32)
    lo = jnp.where(fits, jnp.uint32(0), (code & mask_k) << shift_lo)

    words = jnp.zeros(w_cap, dtype=jnp.uint32)
    words = words.at[w].add(hi, mode="drop")
    words = words.at[w + 1].add(lo, mode="drop")
    return words, total_bits


def _bucket(n: int, buckets=(1, 2, 3, 4, 6, 8, 12, 16)) -> int:
    """Round a size up to a stable bucket (limits jit recompiles)."""
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def encode_jax_v2(img: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 image on the accelerator (v2 pipeline)."""
    from nicetpu.kernels.encode import _build_tables

    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("expected (H, W, 3) uint8 image")
    H, W, _ = img.shape
    if W < C.MIN_WIDTH:
        raise ValueError(f"width must be >= {C.MIN_WIDTH} (SURVEY A.8.7)")
    N = H * W
    flat = jnp.asarray(img.reshape(N, 3))

    tok = tokenize_compact(flat, width=W, ndigits_cap=3)
    stats = np.asarray(tok["stats"]).astype(np.int64)
    if stats[-1]:  # run needing > 3 digits: rare full-layout fallback
        tok = tokenize_compact(flat, width=W, ndigits_cap=C.MAX_RUN_DIGITS)
        stats = np.asarray(tok["stats"]).astype(np.int64)

    counts = stats[:-1]
    n_valid = int(counts.sum())

    flat_lengths, flat_codes = _build_tables(counts)
    needed_bits = int((counts * flat_lengths.astype(np.int64)).sum())

    # Static capacity buckets (token count in units of N/2; words in N/8)
    M = int(tok["sorted_bins"].shape[0])
    c_cap = min(max(_bucket(-(-2 * n_valid // N)) * ((N + 1) // 2), n_valid), M)
    needed_words = needed_bits // 32 + 2
    w_cap = max(
        _bucket(-(-needed_words * 8 // max(N, 8))) * (N // 8 + 1) + 2, needed_words + 2
    )

    words, total_bits = pack_compact(
        tok["sorted_bins"],
        jnp.int32(n_valid),
        jnp.asarray(flat_lengths.astype(np.int32)),
        jnp.asarray(flat_codes),
        c_cap=c_cap,
        w_cap=w_cap,
    )
    total_bits = int(total_bits)
    assert total_bits == needed_bits, (total_bits, needed_bits)

    return (
        headers.pack_file_header(W, H, 3)
        + headers.pack_stream_headers(flat_lengths)
        + words_to_payload(np.asarray(words), total_bits)
    )
