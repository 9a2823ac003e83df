"""TPU-native `.nice` decode v3: Pallas lane-parallel speculative walk.

Parallel reformulation of the reference's strictly serial decoder (ref
code.rs:573-684 reconstruction, hfe.rs:206-222 symbol decode,
bitreader.rs:78-100 bit peek), re-architected from the v2 design after
on-chip profiling showed XLA gathers cost ~8 ns/element at ANY table size
while VPU element-wise ops cost ~1.8 ps/element-op — one gather is worth
~5000 predicated selects.  v2 spent 9.2 s/batch in gather-bound phases; v3
does the entire entropy walk gather-free:

1. **Pallas chunked walk** (`_walk_kernel`): the payload is cut into
   CHUNK_BITS-bit chunks; 1024 chunks ride the VPU as an (8, 128) vector,
   each lane walking its chunk group-by-group (prefix -> payload slots ->
   next group, ref code.rs:576-651).  Words are fetched from a per-chunk
   VMEM block with a two-level one-hot select (no gathers); canonical
   lengths/indices come from threshold compares against the per-image
   first-code tables (ref hfe.rs:206-222 vectorized).  Chunk entries are
   speculative (self-synchronizing Huffman, gap-array technique from the
   GPU Huffman literature, PAPERS.md): round 1 walks from chunk starts,
   round 2 re-walks from round-1 exits anchored at bit 0; if round-2 exits
   reproduce their entries, induction from the anchor proves every entry
   true.  Any inconsistency (corrupt stream, self-sync miss, step budget
   exhausted) clears `ok` and the caller falls back to the host decoder —
   correctness never rests on the heuristic.

2. **Slot-space assembly** (pure element-wise + cumsums): the walk's
   records (chunk-major, step-major = serial token order) yield run values
   via digit-ordinal arithmetic and pixel start positions via ONE cumsum of
   per-slot coverage — no compaction pass, no visited bitmask.

3. **MXU one-hot symbol join** (`pallas_ops.value_join_pallas`): canonical
   index -> symbol through the per-image (length asc, symbol asc) order
   tables at ~0.24 ns/lookup.

4. **One packed-int32 placement scatter** per slot (form + ref-index +
   3 delta bytes in 31 bits), then the v2 gather-free segment-LUT row
   reconstruction (`decode_dev.reconstruct_rows`) unchanged.

On a CPU backend the walk runs as an equivalent jnp scan (`walk_ref`),
which is also the cross-test oracle for the Pallas kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nicetpu.format import constants as C
from nicetpu.kernels.decode_dev import (
    F_ADD1,
    F_CONST,
    F_HALF,
    NPAYLOAD,
    SLOT_STREAM,
    _const_offsets,
    _sel,
    reconstruct_rows,
    reconstruct_serial,
)

# ---------------------------------------------------------------------------
# Walk geometry
# ---------------------------------------------------------------------------
# Chunk size is a self-synchronization safety margin: near-fixed-length
# streams (uniform noise -> almost fixed 25-bit RGB groups) realign slowly;
# measured sync-failure rates per chunk on a pure-noise stream were 26% at
# 1024 bits, 11% at 2048, 0/18 at 4096.  Every failure is caught by the
# consistency gate (host fallback), so 4096 buys throughput, not correctness.
CHUNK_BITS = 4096
STEPS_DIV = 3  # robust step budget divisor (min real group ~3 bits)
# Retry ladder for the batch decoder: (steps_div, rounds) configs tried in
# order.  The fast config covers photographic content (avg group ~8-25 bits,
# one propagation round); the robust config covers dense short-group regions
# and slow self-sync.  Images still failing fall back to the host decoder.
LADDER = ((8, 2), (3, 3))
CPB = 1024  # chunks per kernel invocation, as an (8, 128) vector
SBLK = 64  # walk steps per grid block (scratch carries position across)
MAX_GROUP_BITS = 5 * C.MAX_CODE_LEN  # prefix + <= 4 payload codes
MAXL_BUCKETS = (8, 12, 16, 20, 24, 31)
# Streams with tiny alphabets have provably short codes: lengths < alphabet.
MAXL_SMALL = 12  # covers SC_PREFIXES (13), SC_LUMA_BACK_REF / SC_BACK_REF (11)
_SMALL_STREAMS = frozenset(
    s for s in range(C.NUM_STREAMS) if C.ALPHABET_SIZES[s] <= MAXL_SMALL + 1
)

_MSB = -0x80000000  # int32 sign bit (Python int: safe to close over in Pallas)


def _wrows(chunk_bits: int) -> int:
    return chunk_bits // 32 + 8


WROWS = _wrows(CHUNK_BITS)


def _uge(a, b):
    """Unsigned >= on uint32 values carried as int32 (bias compare)."""
    return (a ^ _MSB) >= (b ^ _MSB)


def _steps(chunk_bits: int, steps_div: int = STEPS_DIV) -> int:
    return -(-(chunk_bits // steps_div) // SBLK) * SBLK


def pick_maxl(max_len: int) -> int:
    for b in MAXL_BUCKETS:
        if max_len <= b:
            return b
    return C.MAX_CODE_LEN


def pick_maxl_streams(per_stream_max) -> tuple:
    """Per-STREAM static code-length bounds, bucketed (10-tuple).

    The walk's `_canon_decode` unrolls one threshold compare per candidate
    length, so its cost is sum over visited streams of their bound; a
    single global bound of 31 (deep codes on rare RGB/SMALL_DIFF symbols)
    made EVERY stream pay 31 iterations — per-stream bounds cut the group
    decode to the lengths each alphabet actually uses (~1.7x fewer
    iterations on photo tables).  Bucketing keeps executable reuse."""
    return tuple(pick_maxl(int(m)) for m in per_stream_max)


# ---------------------------------------------------------------------------
# Shared group-decode math (used by the jnp reference AND the Pallas kernel;
# only the window fetch differs).  All windows are uint32 carried as int32.
# ---------------------------------------------------------------------------


def _stream_maxl(s: int, maxl) -> int:
    """Per-stream length bound; maxl is an int (uniform) or a 10-tuple."""
    m = maxl[s] if isinstance(maxl, tuple) else maxl
    return min(m, MAXL_SMALL) if s in _SMALL_STREAMS else m


def _canon_decode(win, s, tget, maxl):
    """(L, idx) of the canonical codeword at a window for stream s.

    One fused pass: L = max{l : present[l] and first_code[l] <= win}
    (left-aligned first codes increase over present lengths), tracking
    af[L]/ib[L] alongside, then idx = ib[L] + ((win - af[L]) >> (32 - L)).
    Valid (Kraft-complete, host-validated) tables give L >= 1 always."""
    L = jnp.zeros_like(win)
    afL = jnp.zeros_like(win)
    ibL = jnp.zeros_like(win)
    for l in range(1, _stream_maxl(s, maxl) + 1):
        af_l = tget("af", s, l)
        hit = _uge(win, af_l) & (tget("present", s, l) != 0)
        L = jnp.where(hit, l, L)
        afL = jnp.where(hit, af_l, afL)
        ibL = jnp.where(hit, tget("ib", s, l), ibL)
    idx = ibL + jax.lax.shift_right_logical(win - afL, 32 - L)
    return L, idx


def _decode_group(p, win_at, tget, pfx_get, maxl):
    """One pixel-group decode at bit position p (ref code.rs:576-651 +
    hfe.rs:206-222, vectorized over lanes).

    win_at(q) -> int32 window (bits q..q+31, MSB-first, uint32 as int32);
    tget(table, s, l) -> scalar table value for stream s, length l
      (table in {"af", "present", "ib"});
    pfx_get(j) -> prefix-stream canonical-order symbol j.

    Returns (sym, idx1..idx4, q_next).  For run digits (sym >= 5) the
    payload indices are 0 and q_next = p + prefix length.  Payload slots
    decode per MODE with static stream ids (per-stream maxl bounds), then
    select by the decoded mode — cheaper than blending tables per length."""
    sp = C.SC_PREFIXES
    win0 = win_at(p)
    L0, idx0 = _canon_decode(win0, sp, tget, maxl)
    sym = jnp.zeros_like(idx0)
    for j in range(C.ALPHABET_SIZES[sp]):
        sym = jnp.where(idx0 == j, pfx_get(j), sym)

    q = p + L0
    idxs = []
    for k in range(C.MODE_PAYLOAD_SLOTS):
        modes = [m for m in range(5) if SLOT_STREAM[m][k] >= 0]
        streams = sorted({SLOT_STREAM[m][k] for m in modes})
        win = win_at(q)
        per_stream = {s: _canon_decode(win, s, tget, maxl) for s in streams}
        Lk = jnp.zeros_like(sym)
        idxk = jnp.zeros_like(sym)
        has = jnp.zeros_like(sym, dtype=jnp.bool_)
        for m in modes:
            Ls, idxs_s = per_stream[SLOT_STREAM[m][k]]
            is_m = sym == m
            Lk = jnp.where(is_m, Ls, Lk)
            idxk = jnp.where(is_m, idxs_s, idxk)
            has = has | is_m
        idxs.append(jnp.where(has, idxk, 0))
        q = q + jnp.where(has, Lk, 0)
    return sym, idxs, q


# ---------------------------------------------------------------------------
# jnp reference walk (CPU backend + Pallas cross-test oracle)
# ---------------------------------------------------------------------------


def walk_ref(
    words, entries, af, present, ib, pfx_sorted, wbits,
    *, chunk_bits, steps, maxl, chunk0=0, bit_base=0,
):
    """Chunked walk, one image.  words (Wn,) uint32; entries (nch,) int32
    absolute bit positions.  Returns (pos, sym, idx12, idx34) each
    (nch, steps) int32 (pos = -1 where frozen/dead) and exits (nch,).

    chunk0/bit_base: for shard-local word slices — the walk handles chunks
    [chunk0, chunk0 + nch) and `words` starts at absolute bit `bit_base`
    (positions stay global)."""
    nch = entries.shape[0]
    wi = words.astype(jnp.int32)
    bound = (chunk0 + jnp.arange(nch, dtype=jnp.int32) + 1) * chunk_bits

    def win_at(q):
        q = q - bit_base
        w = q >> 5
        sh = (q & 31).astype(jnp.uint32)
        w0 = wi[jnp.minimum(w, wi.shape[0] - 1)]
        w1 = wi[jnp.minimum(w + 1, wi.shape[0] - 1)]
        lo = jnp.where(
            sh == 0,
            jnp.int32(0),
            jax.lax.shift_right_logical(w1, (jnp.uint32(32) - sh).astype(jnp.int32)),
        )
        return (w0 << sh.astype(jnp.int32)) | lo

    def tget(table, s, l):
        return {"af": af, "present": present, "ib": ib}[table][s, l]

    def pfx_get(j):
        return pfx_sorted[j]

    def step(p, _):
        alive = (p < bound) & (p < wbits)
        sym, idxs, q = _decode_group(p, win_at, tget, pfx_get, maxl)
        p_new = jnp.where(alive, jnp.maximum(p + 1, q), p)
        rec_pos = jnp.where(alive, p, -1)
        rec_sym = jnp.where(alive, sym, 0)
        i12 = jnp.where(alive, idxs[0] | (idxs[1] << 16), 0)
        i34 = jnp.where(alive, idxs[2] | (idxs[3] << 16), 0)
        return p_new, (rec_pos, rec_sym, i12, i34)

    exits, (pos, sym, i12, i34) = jax.lax.scan(step, entries, None, length=steps)
    return (
        jnp.swapaxes(pos, 0, 1),
        jnp.swapaxes(sym, 0, 1),
        jnp.swapaxes(i12, 0, 1),
        jnp.swapaxes(i34, 0, 1),
        exits,
    )


# ---------------------------------------------------------------------------
# Pallas walk kernel
# ---------------------------------------------------------------------------


def _walk_kernel(
    wbits_ref,  # (B,) int32 scalar-prefetch (whole array, indexed by image)
    entries_ref,  # (1, 1, 8, 128) int32
    wblk_ref,  # (1, 1, WROWS, 8, 128) int32 (uint32 words)
    af_ref,  # (1, 10, 32) int32
    present_ref,  # (1, 10, 32) int32
    ib_ref,  # (1, 10, 32) int32
    pfx_ref,  # (1, 1, 16) int32
    pos_out,  # (1, 1, 1, SBLK, 8, 128) int32
    sym_out,
    i12_out,
    i34_out,
    exit_out,  # (1, 1, 8, 128) int32
    p_scr,  # (8, 128) int32 scratch
    *,
    chunk_bits: int,
    maxl: int,
    wrows: int,
):
    kb = pl.program_id(1)
    sb = pl.program_id(2)

    @pl.when(sb == 0)
    def _():
        p_scr[:] = entries_ref[0, 0]

    wbits = wbits_ref[pl.program_id(0)]
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    chunk_id = kb * CPB + sub * 128 + lane
    base_bit = chunk_id * chunk_bits
    bound = base_bit + chunk_bits

    # Block-level early exit: once every lane of this chunk block is frozen
    # (crossed its chunk boundary or the payload end), the remaining SBLK
    # blocks only stamp dead records — on typical photo content (avg group
    # >= 2*steps_div bits) that skips ~half the walk compute.
    p0 = p_scr[:]
    any_alive = jnp.any((p0 < bound) & (p0 < wbits))

    @pl.when(jnp.logical_not(any_alive))
    def _():
        neg = jnp.full((8, 128), -1, jnp.int32)
        zero = jnp.zeros((8, 128), jnp.int32)
        for i in range(SBLK):
            pos_out[0, 0, 0, i] = neg
            sym_out[0, 0, 0, i] = zero
            i12_out[0, 0, 0, i] = zero
            i34_out[0, 0, 0, i] = zero
        exit_out[0, 0] = p0

    @pl.when(any_alive)
    def _walk_block():
        _walk_block_body(
            wbits_ref, entries_ref, wblk_ref, af_ref, present_ref, ib_ref,
            pfx_ref, pos_out, sym_out, i12_out, i34_out, exit_out, p_scr,
            bound=bound, wbits=wbits, base_bit=base_bit,
            chunk_bits=chunk_bits, maxl=maxl, wrows=wrows,
        )


def _walk_block_body(
    wbits_ref, entries_ref, wblk_ref, af_ref, present_ref, ib_ref, pfx_ref,
    pos_out, sym_out, i12_out, i34_out, exit_out, p_scr,
    *, bound, wbits, base_bit, chunk_bits, maxl, wrows,
):
    wblk = wblk_ref[0, 0]  # (WROWS, 8, 128)

    def tget(table, s, l):
        ref = {"af": af_ref, "present": present_ref, "ib": ib_ref}[table]
        return ref[0, s, l]

    def pfx_get(j):
        return pfx_ref[0, 0, j]

    def body(i, p):
        alive = (p < bound) & (p < wbits)
        rel = jnp.maximum(p - base_bit, 0)
        w = rel >> 5  # 0 .. WROWS-2
        # Two-level one-hot fetch of 8 consecutive words w .. w+7 (gather-free:
        # select the 8-row group containing w and its successor, then pick
        # ws[j] = word lo+j from the 15 candidates).
        hi = w >> 3
        lo = w & 7
        ngrp = wrows // 8
        g0 = [jnp.zeros((8, 128), jnp.int32) for _ in range(8)]
        g1 = [jnp.zeros((8, 128), jnp.int32) for _ in range(8)]
        for g in range(ngrp):
            m0 = hi == g
            for r in range(8):
                row = wblk[8 * g + r]
                g0[r] = jnp.where(m0, row, g0[r])
                if g >= 1:
                    g1[r] = jnp.where(hi == g - 1, row, g1[r])
        ws = []
        for j in range(8):
            v = jnp.zeros((8, 128), jnp.int32)
            for t in range(15):  # lo + j = t -> word index t within [G0, G1]
                src = g0[t] if t < 8 else g1[t - 8]
                v = jnp.where(lo + j == t, src, v)
            ws.append(v)

        def win_at(q):
            d = jnp.maximum(q - base_bit, 0) - (w << 5)  # bit offset from word w
            dw = d >> 5  # 0..6
            sh = (d & 31)
            w0 = jnp.zeros((8, 128), jnp.int32)
            w1 = jnp.zeros((8, 128), jnp.int32)
            for j in range(7):
                w0 = jnp.where(dw == j, ws[j], w0)
                w1 = jnp.where(dw == j, ws[j + 1], w1)
            lo32 = jnp.where(
                sh == 0,
                jnp.int32(0),
                jax.lax.shift_right_logical(w1, 32 - sh),
            )
            return (w0 << sh) | lo32

        sym, idxs, q = _decode_group(p, win_at, tget, pfx_get, maxl)
        p_new = jnp.where(alive, jnp.maximum(p + 1, q), p)
        pos_out[0, 0, 0, i] = jnp.where(alive, p, -1)
        sym_out[0, 0, 0, i] = jnp.where(alive, sym, 0)
        i12_out[0, 0, 0, i] = jnp.where(alive, idxs[0] | (idxs[1] << 16), 0)
        i34_out[0, 0, 0, i] = jnp.where(alive, idxs[2] | (idxs[3] << 16), 0)
        return p_new

    p = jax.lax.fori_loop(0, SBLK, body, p_scr[:])
    p_scr[:] = p
    exit_out[0, 0] = p


try:  # Pallas imports fail cleanly on backends without TPU support
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def walk_pallas(
    words_blk, entries, af, present, ib, pfx_sorted, wbits,
    *, chunk_bits, steps, maxl, interpret: bool = False,
):
    """Batched Pallas walk.  words_blk (B, KB, WROWS, 8, 128) int32;
    entries (B, KB, 8, 128) int32; af/present/ib (B, 10, 32) int32;
    pfx_sorted (B, 1, 16) int32; wbits (B,) int32 (scalar-prefetched).
    Returns pos/sym/i12/i34 (B, KB, SB, SBLK, 8, 128) and exits (B, KB, 8, 128).
    interpret=True runs in Pallas interpret mode (CPU parity tests)."""
    B, KB = entries.shape[:2]
    SB = steps // SBLK
    rec_shape = (B, KB, SB, SBLK, 8, 128)
    wrows = _wrows(chunk_bits)
    kern = partial(_walk_kernel, chunk_bits=chunk_bits, maxl=maxl, wrows=wrows)
    rec_spec = pl.BlockSpec(
        (1, 1, 1, SBLK, 8, 128), lambda b, kb, sb, *_: (b, kb, sb, 0, 0, 0)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # wbits (B,) readable whole in every step
        grid=(B, KB, SB),
        in_specs=[
            pl.BlockSpec((1, 1, 8, 128), lambda b, kb, sb, *_: (b, kb, 0, 0)),
            pl.BlockSpec((1, 1, wrows, 8, 128), lambda b, kb, sb, *_: (b, kb, 0, 0, 0)),
            pl.BlockSpec((1, 10, 32), lambda b, kb, sb, *_: (b, 0, 0)),
            pl.BlockSpec((1, 10, 32), lambda b, kb, sb, *_: (b, 0, 0)),
            pl.BlockSpec((1, 10, 32), lambda b, kb, sb, *_: (b, 0, 0)),
            pl.BlockSpec((1, 1, 16), lambda b, kb, sb, *_: (b, 0, 0)),
        ],
        out_specs=(
            rec_spec,
            rec_spec,
            rec_spec,
            rec_spec,
            pl.BlockSpec((1, 1, 8, 128), lambda b, kb, sb, *_: (b, kb, 0, 0)),
        ),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)],
    )
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=(
            jax.ShapeDtypeStruct(rec_shape, jnp.int32),
            jax.ShapeDtypeStruct(rec_shape, jnp.int32),
            jax.ShapeDtypeStruct(rec_shape, jnp.int32),
            jax.ShapeDtypeStruct(rec_shape, jnp.int32),
            jax.ShapeDtypeStruct((B, KB, 8, 128), jnp.int32),
        ),
    )(wbits, entries, words_blk, af, present, ib, pfx_sorted)
    return outs


# ---------------------------------------------------------------------------
# Block layout helpers (all element-wise)
# ---------------------------------------------------------------------------


def make_word_blocks(words, nch_pad: int, chunk_bits: int):
    """(B, Wn) uint32-as-int32 -> (B, KB, WROWS, 8, 128) per-chunk word blocks.

    Word r of chunk c = words[c * chunk_bits/32 + r]; Wn must be >=
    nch_pad * chunk_bits/32 + WROWS."""
    B = words.shape[0]
    wpc = chunk_bits // 32
    wrows = _wrows(chunk_bits)
    KB = nch_pad // CPB
    base = words[:, : nch_pad * wpc].reshape(B, nch_pad, wpc)
    nxt = jnp.concatenate(
        [base[:, 1:], jnp.zeros((B, 1, wpc), words.dtype)], axis=1
    )
    extra = wrows - wpc
    if extra <= wpc:
        look = nxt[:, :, :extra]
    else:  # chunk_bits < 256 never used; guard anyway
        raise ValueError("word-block lookahead exceeds one chunk")
    blk = jnp.concatenate([base, look], axis=2)  # (B, nch_pad, wrows)
    blk = blk.reshape(B, KB, 8, 128, wrows)
    return jnp.transpose(blk, (0, 1, 4, 2, 3))


def flatten_records(rec):
    """(B, KB, SB, SBLK, 8, 128) -> (B, S) in serial slot order.

    Used by tests/CPU twins only: the hot path keeps records in walk layout
    (this 6-D transpose moves the minor (8, 128) dims mid-array — ~5 ms per
    record array at 512^2 batch 8 — and the serial scans it fed are computed
    hierarchically in-layout instead, see `_cumsum_walk`)."""
    B, KB, SB, SB2, _, _ = rec.shape
    r = jnp.transpose(rec, (0, 1, 4, 5, 2, 3))  # (B, KB, 8, 128, SB, SBLK)
    return r.reshape(B, KB * CPB * SB * SB2)


def _cumsum_walk(x):
    """Serial-order inclusive cumsum of a walk-layout (B, KB, SB, SBLK, 8,
    128) int32 array WITHOUT the flattening transpose.

    Serial slot order is (kb, sub, lane, sb, sblk): steps within a chunk are
    contiguous on axes (2, 3); chunks order as (kb, sub, lane).  So: cumsum
    along the fused step axis per chunk, then an exclusive chunk-order
    cumsum of per-chunk totals (a (B, nch) array — tiny) broadcast back."""
    B, KB, SB, SBLK, _, _ = x.shape
    xx = x.reshape(B, KB, SB * SBLK, 8, 128)
    within = jnp.cumsum(xx, axis=2)
    tot = within[:, :, -1].reshape(B, KB * CPB)  # chunk serial order
    base = jnp.cumsum(tot, axis=1) - tot
    return (within + base.reshape(B, KB, 1, 8, 128)).reshape(x.shape)


def _cummax_walk(x):
    """Serial-order running max in walk layout (see `_cumsum_walk`)."""
    B, KB, SB, SBLK, _, _ = x.shape
    xx = x.reshape(B, KB, SB * SBLK, 8, 128)
    within = jax.lax.cummax(xx, axis=2)
    tot = within[:, :, -1].reshape(B, KB * CPB)
    base = jax.lax.cummax(tot, axis=1)
    base_excl = jnp.concatenate(
        [jnp.full((B, 1), -(2**31), jnp.int32), base[:, :-1]], axis=1
    )
    return jnp.maximum(within, base_excl.reshape(B, KB, 1, 8, 128)).reshape(x.shape)


def chunk_layout(x_flat, KB):
    """(B, nch_pad) chunk-indexed -> (B, KB, 8, 128) kernel layout."""
    B = x_flat.shape[0]
    return x_flat.reshape(B, KB, 8, 128)


def chunk_unlayout(x):
    B, KB = x.shape[:2]
    return x.reshape(B, KB * CPB)


# ---------------------------------------------------------------------------
# Assembly: walk records -> packed placement records (all element-wise)
# ---------------------------------------------------------------------------

REC_DEFAULT = F_ADD1  # form=ADD1, ref 0, deltas 0: the run-covered transfer


def _ref_index_table(width: int):
    """Static maps: payload symbol -> (lag 1..3 | 0) and (ref-index | 0)."""
    offs = _const_offsets(width)
    br = C.back_ref_offsets(width)
    lu = C.luma_ref_offsets(width)

    def split(tbl):
        lag, refi = [], []
        for o in tbl:
            if 1 <= o <= 3:
                lag.append(o)
                refi.append(0)
            else:
                lag.append(0)
                refi.append(offs.index(o) + 1)
        return tuple(lag), tuple(refi)

    return split(br), split(lu), offs


def assemble_v3(
    pos, sym, p1, p2, p3, p4, n_pixels: int, width: int, wbits,
    *, cumsum=None, cummax=None,
):
    """Slot records -> (rec int32, dst, (ok_cov, ok_ref) (B,) gate flags).

    pos/sym/p1..p4 (payload SYMBOLS, post-join) share any layout with a
    leading batch axis whose SERIAL slot order is realized by the `cumsum`
    and `cummax` scan callables (default: flat (B, S) arrays, axis-1 scans;
    the Pallas path passes walk-layout 6-D arrays with `_cumsum_walk` /
    `_cummax_walk` so no flattening transpose ever materializes).
    Implements the decoder state machine of ref code.rs:573-684 in slot
    space: run values via digit ordinals (ref code.rs:661-680), pixel
    starts via one coverage cumsum, transfer forms per mode (ref
    code.rs:576-651).

    Gates: ok_cov — the decoded pixel coverage tiles [0, N) exactly
    (truncated/corrupt streams under-cover); ok_ref — every BACK_REF index
    is < NUM_BACK_REF (stream 9's alphabet has 11 symbols but only 5 are
    placeable; the reference would panic, ref code.rs:634, and the spec
    decoder raises — the device path must reject, not misdecode)."""
    N, W = n_pixels, width
    if cumsum is None:
        cumsum = lambda x: jnp.cumsum(x, axis=1)
    if cummax is None:
        cummax = lambda x: jax.lax.cummax(x, axis=1)
    red_axes = tuple(range(1, pos.ndim))
    wb = wbits.reshape((-1,) + (1,) * (pos.ndim - 1))
    valid = (pos >= 0) & (pos < wb)
    is_pfx = valid & (sym < C.PREFIX_RUN_BASE)
    is_dig = valid & (sym >= C.PREFIX_RUN_BASE)

    cd = cumsum(is_dig.astype(jnp.int32))
    cd_base = cummax(jnp.where(is_pfx, cd, -1))
    kk = cd - cd_base - 1
    dig_ok = is_dig & (cd_base >= 0) & (kk >= 0) & (kk < C.MAX_RUN_DIGITS)
    kcl = jnp.clip(kk, 0, C.MAX_RUN_DIGITS - 1)
    dv = sym - C.PREFIX_RUN_BASE
    dv = jnp.where(kcl == C.MAX_RUN_DIGITS - 1, jnp.minimum(dv, 1), dv)
    cov = (
        is_pfx.astype(jnp.int32)
        + jnp.where(dig_ok, (dv << (3 * kcl)) + (kk == 0), 0)
    )
    # Clamp per-slot coverage to N: keeps the int32 cumsum overflow-free on
    # adversarial digit chains (legit coverage <= N per pixel by definition).
    cov = jnp.minimum(cov, N)
    incl = cumsum(cov)
    start = incl - cov
    real = is_pfx & (start < N)
    # coverage must tile [0, N) exactly: cumsum construction is gapless, so
    # the only failure is total < N (truncated walk / corrupt stream).
    # (total = sum of cov = last serial element of incl)
    ok_cov = jnp.sum(cov, axis=red_axes) >= N
    ok_ref = ~jnp.any(
        real & (sym == C.PREFIX_BACK_REF) & (p1 >= C.NUM_BACK_REF), axis=red_axes
    )

    rec, dst = slot_records(is_pfx, sym, p1, p2, p3, p4, start, real, N, W)
    return rec, dst, (ok_cov, ok_ref)


def slot_records(is_pfx, sym, p1, p2, p3, p4, start, real, n_pixels: int, width: int):
    """Packed placement records from decoded pixel slots (elementwise).

    Transfer-form selection per mode (ref code.rs:576-651): BACK_REF/LUMA
    refs split into chain lags 1..3 vs const offsets; SMALL_DIFF/RGB/LUMA2
    take the floor-average form off row 0.  Returns (rec, dst): rec packs
    form(3b) | ref-index(4b) | dr,dg,db (8b each, mod 256) in 31 bits."""
    N, W = n_pixels, width
    mode = jnp.where(is_pfx, sym, 0)
    is_br = mode == C.PREFIX_BACK_REF
    is_rgb = mode == C.PREFIX_RGB
    is_lu = mode == C.PREFIX_COLOR_LUMA
    is_sd = mode == C.PREFIX_SMALL_DIFF
    is_l2 = mode == C.PREFIX_COLOR_LUMA2
    row0 = start < W
    pos0 = start == 0

    (br_lag, br_refi), (lu_lag, lu_refi), _ = _ref_index_table(W)
    lag = jnp.where(is_br, _sel(p1, br_lag), jnp.where(is_lu, _sel(p1, lu_lag), 0))
    refi = jnp.where(is_br, _sel(p1, br_refi), jnp.where(is_lu, _sel(p1, lu_refi), 0))

    form = jnp.full(mode.shape, F_ADD1, jnp.int32)
    form = jnp.where(is_br | is_lu, jnp.where(lag > 0, F_CONST + lag, F_CONST), form)
    form = jnp.where(is_sd | is_rgb, jnp.where(row0, F_ADD1, F_HALF), form)
    form = jnp.where(is_l2, F_HALF, form)
    form = jnp.where(is_rgb & pos0, F_CONST, form)
    refi = jnp.where(lag > 0, 0, refi)

    lg = p2 - 32
    g2 = p1 - 32
    sd_r = p1 % 7
    sd_rem = (p1 - sd_r) // 7
    sd_g = sd_rem % 7
    sd_b = (sd_rem - sd_g) // 7
    dr = jnp.select(
        [is_br, is_lu, is_l2, is_sd], [0, p3 - 16 + lg, p2 - 16 + g2, sd_r - 3],
        default=p1,
    )
    dg = jnp.select([is_br, is_lu, is_l2, is_sd], [0, lg, g2, sd_g - 3], default=p2)
    db = jnp.select(
        [is_br, is_lu, is_l2, is_sd], [0, p4 - 16 + lg, p3 - 16 + g2, sd_b - 3],
        default=p3,
    )

    rec = (
        form
        | (refi << 3)
        | ((dr & 255) << 7)
        | ((dg & 255) << 15)
        | ((db & 255) << 23)
    )
    dst = jnp.where(real, start, N)
    return rec, dst


def place_and_unpack(rec, dst, n_pixels: int, width: int):
    """Scatter packed records to raster positions; unpack to (form (B, N),
    delta (B, 3, N) CHANNEL-PLANAR, refoff (B, N)) for the row
    reconstruction.  rec/dst: (B, ...) any layout (flattened internally —
    real slots have unique dst, so scatter order is irrelevant)."""
    N, W = n_pixels, width
    offs = _const_offsets(W)
    B = rec.shape[0]
    recf = rec.reshape(B, -1)
    dstf = dst.reshape(B, -1)

    def one(rec1, dst1):
        base = jnp.full(N + 1, REC_DEFAULT, jnp.int32)
        return base.at[dst1].set(rec1, mode="drop")[:N]

    recN = jax.vmap(one)(recf, dstf)
    form = recN & 7
    refi = (recN >> 3) & 15
    delta = jnp.stack(
        [(recN >> 7) & 255, (recN >> 15) & 255, (recN >> 23) & 255], axis=1
    )
    refoff = _sel(refi, (0,) + tuple(offs))
    return form, delta, refoff


# ---------------------------------------------------------------------------
# Orchestration
# ---------------------------------------------------------------------------


def _use_pallas_walk() -> bool:
    return _HAS_PALLAS and jax.default_backend() not in ("cpu",)


def _recon_blk(width: int) -> int:
    from nicetpu.kernels.recon_pallas import max_batch_for_width

    return max_batch_for_width(width)


def _sym_join(bins, sym_tbl):
    """Canonical-index bins -> symbols via per-image tables."""
    if _use_pallas_walk():
        from nicetpu.kernels.pallas_ops import value_join_pallas

        return value_join_pallas(bins, sym_tbl)

    def one(b, t):
        live = b < C.TOTAL_SYMBOLS
        return jnp.where(live, t[jnp.clip(b, 0, C.TOTAL_SYMBOLS - 1)], 0)

    return jax.vmap(one)(bins, sym_tbl)


def _payload_bins(sym, i12, i34):
    """Walk records -> 4 slot-wise flat canonical bins (invalid = padded)."""
    idx = (i12 & 0xFFFF, i12 >> 16, i34 & 0xFFFF, i34 >> 16)
    PAD = 1023  # pallas_ops.BINS_PAD - 1
    bins = []
    for k in range(C.MODE_PAYLOAD_SLOTS):
        b = jnp.full(sym.shape, PAD, jnp.int32)
        for m in range(5):
            s = SLOT_STREAM[m][k]
            if s >= 0:
                b = jnp.where(sym == m, C.STREAM_BASE[s] + idx[k], b)
        bins.append(b)
    return bins


def _decode_core_v3(
    words, wbits, af, present, ib, pfx, sym_tbl,
    *, n_pixels: int, width: int, chunk_bits: int, steps: int, maxl: int,
    segs: int, rounds: int = 3, serial_recon: bool = False,
):
    """Full device decode of a batch.

    words (B, Wn) uint32-as-int32 payload words (Wn >= nch_pad*chunk_bits/32
    + WROWS, nch_pad a CPB multiple); wbits (B,) int32; af/present/ib
    (B, 10, 32) int32; pfx (B, 1, 16) int32; sym_tbl (B, 858) int32.
    Returns (out (B, N, 3) uint8, ok (B,), gates (B, 4) bool) with gates =
    [consistency, crossing, coverage, backref-index] (ok = AND of all;
    per-gate flags let tests pin WHICH defense caught a corruption class,
    VERDICT r3 next #7)."""
    B, Wn = words.shape
    wpc = chunk_bits // 32
    nch_pad = (Wn - _wrows(chunk_bits)) // wpc
    entries0 = jnp.broadcast_to(
        jnp.arange(nch_pad, dtype=jnp.int32)[None, :] * chunk_bits, (B, nch_pad)
    )

    if _use_pallas_walk():
        KB = nch_pad // CPB
        words_blk = make_word_blocks(words, nch_pad, chunk_bits)
        # records stay in walk layout (B, KB, SB, SBLK, 8, 128): everything
        # downstream is elementwise except the serial scans, which run
        # in-layout (`_cumsum_walk`) — the four flattening transposes the r3
        # pipeline paid (~20 ms/batch) are gone.
        scan_cumsum, scan_cummax = _cumsum_walk, _cummax_walk

        def walk(e):
            pos, sym, i12, i34, exits = walk_pallas(
                words_blk, chunk_layout(e, KB), af, present, ib, pfx, wbits,
                chunk_bits=chunk_bits, steps=steps, maxl=maxl,
            )
            return pos, sym, i12, i34, chunk_unlayout(exits)

    else:
        scan_cumsum, scan_cummax = None, None  # flat (B, S) axis-1 scans

        def walk(e):
            def one(wd, ee, a, pr, i, pf, wb):
                return walk_ref(
                    wd, ee, a, pr, i, pf[0], wb,
                    chunk_bits=chunk_bits, steps=steps, maxl=maxl,
                )

            pos, sym, i12, i34, exits = jax.vmap(one)(
                words, e, af, present, ib, pfx, wbits
            )
            flat = lambda r: r.reshape(B, nch_pad * steps)
            return flat(pos), flat(sym), flat(i12), flat(i34), exits

    # round 1: speculative entries = chunk starts (anchored at bit 0).
    # Each later round re-walks from the previous exits: entry truth
    # propagates >= 1 chunk/round past a self-sync miss, so `rounds` walks
    # tolerate runs of (rounds - 2) consecutive non-syncing chunks.
    e = entries0
    for _ in range(rounds - 1):
        _, _, _, _, ex = walk(e)
        e = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), ex[:, :-1]], axis=1)
    pos, sym, i12, i34, ex2 = walk(e)

    # Gate (induction from the bit-0 anchor): every final-round exit that is
    # still inside the payload must equal the entry the NEXT chunk was given,
    # and every chunk that actually walked must have crossed its boundary
    # (not run out of step budget).  Any miss -> ok False -> host fallback.
    wb = wbits[:, None]
    starts = jnp.arange(nch_pad, dtype=jnp.int32)[None, :] * chunk_bits
    bounds = starts + chunk_bits
    ok_consist = jnp.all(
        (ex2[:, :-1] == e[:, 1:]) | (ex2[:, :-1] >= wb), axis=1
    )
    walked = e < wb
    crossed = ex2 >= jnp.minimum(bounds, wb)
    ok_cross = jnp.all(crossed | ~walked, axis=1)

    bins = _payload_bins(sym, i12, i34)
    # the join kernel wants (B, M); walk-layout bins reshape for free
    # (minor (8, 128) dims stay last) and the joined symbols reshape back
    syms = [
        _sym_join(b.reshape(B, -1), sym_tbl).reshape(sym.shape) for b in bins
    ]

    rec, dst, (ok_cov, ok_ref) = assemble_v3(
        pos, sym, syms[0], syms[1], syms[2], syms[3], n_pixels, width, wbits,
        cumsum=scan_cumsum, cummax=scan_cummax,
    )
    form, delta, refoff = place_and_unpack(rec, dst, n_pixels, width)
    if serial_recon:
        out = jax.vmap(lambda f, d, r: reconstruct_serial(f, d, r, n_pixels, width))(
            form, delta, refoff
        )
    elif _use_pallas_walk() and _recon_blk(width):
        # single-kernel row loop: the XLA scan paid ~160 us/row of op
        # scheduling on ~30 us of VPU work (see recon_pallas docstring);
        # batches chunk to the kernel's Mosaic stack budget
        from nicetpu.kernels.recon_pallas import reconstruct_rows_pallas

        b_blk = _recon_blk(width)
        outs = [
            reconstruct_rows_pallas(
                form[i : i + b_blk],
                delta[i : i + b_blk],
                refoff[i : i + b_blk],
                n_pixels=n_pixels,
                width=width,
            )
            for i in range(0, B, b_blk)
        ]
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    else:
        out = jax.vmap(
            lambda f, d, r: reconstruct_rows(f, d, r, n_pixels, width, segs)
        )(form, delta, refoff)
    gates = jnp.stack([ok_consist, ok_cross, ok_cov, ok_ref], axis=1)
    return out.astype(jnp.uint8), jnp.all(gates, axis=1), gates


_STATIC_V3 = ("n_pixels", "width", "chunk_bits", "steps", "maxl", "segs", "rounds", "serial_recon")
_device_decode_v3 = partial(jax.jit, static_argnames=_STATIC_V3)(_decode_core_v3)


# ---------------------------------------------------------------------------
# Host wrappers
# ---------------------------------------------------------------------------


def prepare_tables_v3(flat_lengths: np.ndarray):
    """Device tables for one image: (af, present, ib, pfx16, sym_tbl, maxl).

    af/present/ib: (10, 32) int32 (af = first codes left-aligned, as int32
    bit patterns); pfx16: (1, 16) canonical-order prefix symbols; sym_tbl:
    (858,) flat canonical-index -> symbol join table; the 6th element is
    the (10,) per-stream max code length (feeds `pick_maxl_streams`)."""
    from nicetpu.format import huffman

    af, present, ib, sorted_flat = huffman.decode_dev_tables(flat_lengths)
    sp = C.SC_PREFIXES
    base, size = C.STREAM_BASE[sp], C.ALPHABET_SIZES[sp]
    lengths = np.asarray(flat_lengths[base : base + size], dtype=np.int64)
    order = np.lexsort((np.arange(size), lengths))
    pfx16 = np.zeros((1, 16), np.int32)
    pfx16[0, :size] = order
    sym_tbl = np.zeros(C.TOTAL_SYMBOLS, np.int32)
    for s in range(C.NUM_STREAMS):
        b, n = C.STREAM_BASE[s], C.ALPHABET_SIZES[s]
        sym_tbl[b : b + n] = sorted_flat[s, :n]
    fl = np.asarray(flat_lengths)
    per_stream_max = np.array(
        [
            int(fl[C.STREAM_BASE[s] : C.STREAM_BASE[s] + C.ALPHABET_SIZES[s]].max())
            for s in range(C.NUM_STREAMS)
        ],
        np.int32,
    )
    return (
        af.view(np.int32),
        present.astype(np.int32),
        ib.astype(np.int32),
        pfx16,
        sym_tbl,
        per_stream_max,
    )


def prepare_tables_v3_batch(lengths_batch: np.ndarray):
    """Vectorized batch table build: (B, 858) code lengths -> stacked device
    tables (af (B,10,32) int32, present, ib, pfx16 (B,1,16), sym_tbl
    (B,858), stream_max (B,10)).

    Replaces B calls to `prepare_tables_v3`: the per-image python loops
    (canonical_codes' per-symbol walk + per-symbol LUT fill) measured
    ~30 ms/image — more than the entire device decode compute per image.
    All-numpy batch formulation: canonical order via one argsort per
    stream, left-aligned first codes via the identity
    A_i = sum_{j<i} 2^(32 - l_j) (the canonical-code cumsum), per-length
    first-index/presence via counting."""
    lens_all = np.asarray(lengths_batch, dtype=np.int64)
    B = lens_all.shape[0]
    af = np.full((B, C.NUM_STREAMS, 32), 0xFFFFFFFF, dtype=np.uint32)
    present = np.zeros((B, C.NUM_STREAMS, 32), dtype=np.int32)
    ib = np.zeros((B, C.NUM_STREAMS, 32), dtype=np.int32)
    sym_tbl = np.zeros((B, C.TOTAL_SYMBOLS), dtype=np.int32)
    pfx16 = np.zeros((B, 1, 16), dtype=np.int32)
    stream_max = np.zeros((B, C.NUM_STREAMS), dtype=np.int64)
    lvals = np.arange(32, dtype=np.int64)
    for s in range(C.NUM_STREAMS):
        base, size = C.STREAM_BASE[s], C.ALPHABET_SIZES[s]
        lens = lens_all[:, base : base + size]  # (B, size)
        stream_max[:, s] = lens.max(axis=1)
        # canonical order: (length asc, symbol asc) — stable keyed argsort
        order = np.argsort(lens * 1024 + np.arange(size), axis=1, kind="stable")
        sorted_lens = np.take_along_axis(lens, order, axis=1)
        sym_tbl[:, base : base + size] = order
        if s == C.SC_PREFIXES:
            pfx16[:, 0, :size] = order
        # left-aligned first codes: A_i = sum_{j<i} 2^(32 - l_j)
        contrib = np.uint64(1) << (np.uint64(32) - sorted_lens.astype(np.uint64))
        A = np.cumsum(contrib, axis=1) - contrib  # exclusive
        # per length l: first canonical index, presence, first code
        cnt_lt = (sorted_lens[:, None, :] < lvals[None, :, None]).sum(axis=2)
        cnt_le = (sorted_lens[:, None, :] <= lvals[None, :, None]).sum(axis=2)
        pres = cnt_le > cnt_lt  # (B, 32)
        first_idx = np.minimum(cnt_lt, size - 1)
        A_first = np.take_along_axis(A, first_idx, axis=1)
        present[:, s] = pres.astype(np.int32)
        ib[:, s] = np.where(pres, cnt_lt, 0).astype(np.int32)
        af[:, s] = np.where(pres, A_first.astype(np.uint32), np.uint32(0xFFFFFFFF))
    return (
        af.view(np.int32),
        present,
        ib,
        pfx16,
        sym_tbl,
        stream_max,
    )


def _words_cap(max_payload_bytes: int, chunk_bits: int) -> tuple[int, int]:
    """Bucketed (Wn, nch_pad) so nearby payload sizes share an executable.

    The Pallas kernel walks CPB chunks per invocation, so nch pads to a CPB
    multiple on TPU; the jnp reference path (CPU tests) pads to 8 only —
    padding 1024x for tiny test images made CPU runs minutes long."""
    align = CPB if _use_pallas_walk() else 8
    wbits_max = max_payload_bytes * 8
    nch = -(-wbits_max // chunk_bits)
    nch_pad = max(align, -(-nch // align) * align)
    Wn = nch_pad * (chunk_bits // 32) + _wrows(chunk_bits)
    return Wn, nch_pad


def _segs_for(width: int) -> int:
    from nicetpu.kernels.decode_dev import _pick_segs

    return _pick_segs(width)


def prepare_batch_args(
    datas: list[bytes], *, chunk_bits: int = CHUNK_BITS,
    steps_div: int | None = None, rounds: int | None = None,
):
    """Device arrays + static kwargs for `_decode_core_v3` on a same-shape
    batch (host-side header parse, table build, word upload).  The kwargs
    default to the fast ladder config; bench uses this to time the device
    pipeline with a checksum-only fetch."""
    from nicetpu.format import headers, huffman

    shapes = {headers.parse_file_header(d)[:2] for d in datas}
    if len(shapes) != 1:
        raise ValueError("batch decode requires same-shape streams")
    W, H = next(iter(shapes))
    if W < C.MIN_WIDTH:
        raise ValueError(f"width must be >= {C.MIN_WIDTH}")
    N = W * H

    lens, payloads = [], []
    for d in datas:
        if headers.parse_file_header(d)[2] != 3:
            raise ValueError("only channels=3 decode is defined (SURVEY A.8.3)")
        flat_lengths = headers.parse_stream_headers(d[C.FILE_HEADER_BYTES :])
        huffman.validate_flat_lengths(flat_lengths)
        lens.append(flat_lengths)
        payloads.append(d[C.FILE_HEADER_BYTES + C.STREAM_HEADERS_BYTES : len(d) - 4])
    af_b, pr_b, ib_b, pfx_b, sym_b, smax_b = prepare_tables_v3_batch(np.stack(lens))

    Wn, _ = _words_cap(max(len(p) for p in payloads), chunk_bits)
    words = np.zeros((len(datas), Wn), dtype=np.uint32)
    wbits = np.zeros(len(datas), dtype=np.int32)
    for i, p in enumerate(payloads):
        src = np.frombuffer(p + b"\0" * ((-len(p)) % 4), dtype=">u4")
        words[i, : src.shape[0]] = src
        wbits[i] = len(p) * 8

    maxl = pick_maxl_streams(smax_b.max(axis=0))
    args = (
        jnp.asarray(words.view(np.int32)),
        jnp.asarray(wbits),
        jnp.asarray(af_b),
        jnp.asarray(pr_b),
        jnp.asarray(ib_b),
        jnp.asarray(pfx_b),
        jnp.asarray(sym_b),
    )
    kw = dict(
        n_pixels=N,
        width=W,
        chunk_bits=chunk_bits,
        steps=_steps(chunk_bits, steps_div if steps_div else LADDER[0][0]),
        maxl=maxl,
        segs=_segs_for(W),
        rounds=rounds if rounds else LADDER[0][1],
    )
    return args, kw


def decode_batch_jax_v3(
    datas: list[bytes],
    *,
    chunk_bits: int = CHUNK_BITS,
    ladder: tuple = LADDER,
    serial_recon: bool = False,
    stats: dict | None = None,
) -> list[np.ndarray]:
    """Batched TPU-native decode of same-shape `.nice` streams (v3 pipeline).

    Tries each (steps_div, rounds) ladder config in order (fast first); any
    image the device pipeline cannot verify (`ok` False: corrupt stream,
    self-sync miss, step-budget truncation) after the last config falls back
    to the host decoder.  Pass `stats` to receive {"fallbacks": int,
    "retries": int, "ok": list[bool], "gates": list[[consistency,
    crossing, coverage, backref] bools] from the LAST attempted config} —
    bench/tests assert no silent fallback on valid streams and pin which
    gate rejected a corrupt one (VERDICT r2 weak #2, r3 next #7)."""
    from nicetpu.format import headers, huffman

    if not datas:
        return []
    shapes = {headers.parse_file_header(d)[:2] for d in datas}
    if len(shapes) != 1:
        raise ValueError("decode_batch_jax_v3 requires same-shape streams")
    W, H = next(iter(shapes))
    if W < C.MIN_WIDTH:
        raise ValueError(f"width must be >= {C.MIN_WIDTH}")
    N = W * H

    args, base_kw = prepare_batch_args(datas, chunk_bits=chunk_bits)
    out_np = None
    ok_np = np.zeros(len(datas), bool)
    gates_np = None
    retries = 0
    for steps_div, rounds in ladder:
        out, ok, gates = _device_decode_v3(
            *args,
            **{
                **base_kw,
                "steps": _steps(chunk_bits, steps_div),
                "rounds": rounds,
                "serial_recon": serial_recon,
            },
        )
        ok_new = np.asarray(ok)
        out_new = np.asarray(out)
        gates_np = np.asarray(gates)
        if out_np is None:
            out_np, ok_np = out_new, ok_new
        else:
            if not out_np.flags.writeable:
                out_np = out_np.copy()
            upd = ok_new & ~ok_np
            out_np[upd] = out_new[upd]
            ok_np = ok_np | ok_new
        if ok_np.all():
            break
        retries += 1
    if stats is not None:
        stats["fallbacks"] = int((~ok_np).sum())
        stats["retries"] = retries
        stats["ok"] = [bool(x) for x in ok_np]
        stats["gates"] = [[bool(g) for g in row] for row in gates_np]
    result = []
    for i, d in enumerate(datas):
        if bool(ok_np[i]):
            # device output is channel-planar (3, N); untangle on host
            result.append(out_np[i].reshape(3, H, W).transpose(1, 2, 0))
        else:
            from nicetpu.spec import codec

            result.append(codec.decode(d))
    return result


def decode_jax_v3(data: bytes, **kw) -> np.ndarray:
    """TPU-native `.nice` decode (v3): bytes -> (H, W, 3) uint8."""
    return decode_batch_jax_v3([data], **kw)[0]


# ---------------------------------------------------------------------------
# Device-verified round-trip decode (production hybrid path)
# ---------------------------------------------------------------------------


def _decode_verify_core(
    words, wbits, af, present, ib, pfx, sym_tbl, orig, **kw
):
    """Decode + on-device bit-exact comparison against the resident
    original.  orig: (B, N, 3) uint8 (the `pipeline.upload_batch` layout).
    Returns (ok (B,) gates passed, eq (B,) decoded == orig exactly) — only
    2B booleans cross the wire, the raster never does (the tunnel's D2H is
    ~25-35 MB/s; the round-trip's correctness proof is the on-device
    equality, which checks EVERY byte, strictly stronger than a host-side
    compare of a fetched copy)."""
    out, ok, _gates = _decode_core_v3(words, wbits, af, present, ib, pfx, sym_tbl, **kw)
    orig_planar = jnp.swapaxes(orig, 1, 2)  # (B, 3, N)
    eq = jnp.all(out == orig_planar, axis=(1, 2))
    return ok, eq


_device_decode_verify = partial(jax.jit, static_argnames=_STATIC_V3)(
    _decode_verify_core
)


def decode_batch_verify_device(
    datas: list[bytes],
    orig_dev,
    *,
    ladder: tuple = LADDER,
    stats: dict | None = None,
) -> np.ndarray:
    """Round-trip verification decode: decode same-shape `.nice` streams on
    device and PROVE each equals the resident (B, N, 3) uint8 original.

    Returns a (B,) bool array `verified`.  Semantics per image:
      * gates ok AND eq      -> True (bit-exact round trip proven on device)
      * gates not ok          -> False (caller decodes that image on host —
        the same fallback contract as `decode_batch_jax_v3`)
      * gates ok but NOT eq  -> RuntimeError: the device pipeline claims a
        consistent decode that differs from the encoder input; that is a
        kernel defect and must surface loudly, never as a silent fallback
        (VERDICT r3 next #5).
    """
    if not datas:
        return np.zeros(0, bool)
    args, base_kw = prepare_batch_args(datas)
    ok_np = np.zeros(len(datas), bool)
    eq_np = np.zeros(len(datas), bool)
    retries = 0
    for steps_div, rounds in ladder:
        ok, eq = _device_decode_verify(
            *args,
            orig_dev,
            **{
                **base_kw,
                "steps": _steps(base_kw["chunk_bits"], steps_div),
                "rounds": rounds,
            },
        )
        ok_new = np.asarray(ok)
        eq_new = np.asarray(eq)
        upd = ok_new & ~ok_np
        eq_np[upd] = eq_new[upd]
        ok_np |= ok_new
        if ok_np.all():
            break
        retries += 1
    if (ok_np & ~eq_np).any():
        bad = int(np.argmax(ok_np & ~eq_np))
        raise RuntimeError(
            f"device decode gate-consistent but NOT equal to original "
            f"(image {bad}): kernel defect, refusing silent fallback"
        )
    if stats is not None:
        stats["fallbacks"] = int((~ok_np).sum())
        stats["retries"] = retries
        stats["ok"] = [bool(x) for x in ok_np]
    return ok_np


def verify_words_device(
    words_dev,
    totals: np.ndarray,
    lengths: np.ndarray,
    orig_dev,
    *,
    n_pixels: int,
    width: int,
    skip: np.ndarray | None = None,
    ladder: tuple = LADDER,
    stats: dict | None = None,
) -> np.ndarray:
    """Device-RESIDENT round-trip verification: decode straight from the
    encoder's packed words (still in HBM from `encode2.encode_fused`) and
    prove equality with the resident original — the compressed payload
    never re-crosses the tunnel for the decode leg.

    words_dev: (B, w_cap) uint32 device words (payload bit 0 = word 0 MSB,
    zeros beyond the payload — exactly the walk's expected layout);
    totals: (B,) host int payload bit counts; lengths: (B, 858) host code
    lengths (from the fused encode's small fetch); orig_dev: (B, N, 3)
    uint8 resident originals; skip: optional (B,) bool — images whose fused
    encode overflowed (their words/lengths are unusable) are never
    verified and reported False.

    Returns (B,) bool `verified` with the same loud-failure contract as
    `decode_batch_verify_device`."""
    B = int(words_dev.shape[0])
    skip = np.zeros(B, bool) if skip is None else np.asarray(skip, bool)
    if skip.all():
        if stats is not None:
            stats["fallbacks"] = B
            stats["retries"] = 0
        return np.zeros(B, bool)
    from nicetpu.format import huffman

    # per-image tables; a skipped image borrows the first live image's
    # tables (its gates are ignored — `verified` stays False)
    donor = int(np.argmin(skip))
    src_rows = np.where(skip, donor, np.arange(B))
    lens_b = np.asarray(lengths, dtype=np.int64)[src_rows]
    for b in range(B):
        if not skip[b]:
            huffman.validate_flat_lengths(lens_b[b].astype(np.uint8))
    af_b, pr_b, ib_b, pfx_b, sym_b, smax_b = prepare_tables_v3_batch(lens_b)
    maxl = pick_maxl_streams(smax_b.max(axis=0))

    tot = np.where(skip, int(totals[donor]), np.asarray(totals)).astype(np.int64)
    Wn, _ = _words_cap(int(tot.max() + 7) // 8, CHUNK_BITS)
    wi = jax.lax.bitcast_convert_type(words_dev, jnp.int32)
    w_cap = int(wi.shape[1])
    if w_cap >= Wn:
        wi = wi[:, :Wn]
    else:
        wi = jnp.pad(wi, ((0, 0), (0, Wn - w_cap)))
    args = (
        wi,
        jnp.asarray(tot.astype(np.int32)),
        jnp.asarray(af_b),
        jnp.asarray(pr_b),
        jnp.asarray(ib_b),
        jnp.asarray(pfx_b),
        jnp.asarray(sym_b),
    )
    base_kw = dict(
        n_pixels=n_pixels,
        width=width,
        chunk_bits=CHUNK_BITS,
        maxl=maxl,
        segs=_segs_for(width),
    )
    ok_np = np.zeros(B, bool)
    eq_np = np.zeros(B, bool)
    retries = 0
    for steps_div, rounds in ladder:
        ok, eq = _device_decode_verify(
            *args,
            orig_dev,
            **base_kw,
            steps=_steps(CHUNK_BITS, steps_div),
            rounds=rounds,
        )
        ok_new = np.asarray(ok) & ~skip
        eq_new = np.asarray(eq)
        upd = ok_new & ~ok_np
        eq_np[upd] = eq_new[upd]
        ok_np |= ok_new
        if (ok_np | skip).all():
            break
        retries += 1
    if (ok_np & ~eq_np).any():
        bad = int(np.argmax(ok_np & ~eq_np))
        raise RuntimeError(
            f"device-resident decode gate-consistent but NOT equal to the "
            f"original (image {bad}): kernel defect, refusing silent fallback"
        )
    if stats is not None:
        stats["fallbacks"] = int((~ok_np).sum())
        stats["retries"] = retries
        stats["ok"] = [bool(x) for x in ok_np]
    return ok_np
