"""Encode pipeline v2: batched sort-compaction + MXU kernels.

Primitive cost model measured on TPU v5e via this repo's microbenchmarks:
  * element-wise / static slicing: ~HBM bandwidth (effectively free)
  * lax.sort: ~2 ns/element        * scatter/gather: ~5-9 ns/element
  * MXU one-hot matmul lookups: ~1 ns/element (pallas_ops.py)
  * dispatch round-trip: ~25 ms    * H2D ~90 MB/s, D2H ~40 MB/s (axon tunnel)

Consequences implemented here:
  1. Token slots are compacted to the ~1.5-3 tokens/pixel that are actually
     valid with ONE key-value sort (key = masked slot index), so every
     downstream op touches C ~ 2N elements instead of 16N.
  2. Histogram and Huffman-table joins run on the MXU (pallas_ops).
  3. The slot layout is adaptive: 3 run-digit slots (runs <= 512 pixels)
     on the fast path; a device-computed overflow flag triggers the full
     11-digit layout only when an image contains longer runs.
  4. The whole pipeline is batched over same-shape images (Kodak-24 /
     streamed-corpus configs): exactly two device dispatches and two small
     host transfers PER BATCH, with per-image Huffman tables.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nicetpu.format import constants as C
from nicetpu.format import headers
from nicetpu.kernels.bitpack import words_to_payload
from nicetpu.kernels.scan import suffix_min
from nicetpu.kernels.tokenize import assemble_bins, cascade


def _use_pallas() -> bool:
    """MXU one-hot kernels on real TPU; jnp scatter/gather elsewhere (same
    results — pure performance switch)."""
    return jax.default_backend() not in ("cpu",)


INVALID_BIN = 1023  # = pallas_ops.BINS_PAD - 1; >= 858 means "no token"


def _tokenize_core(img_flat, *, width: int, ndigits_cap: int):
    """(N, 3) -> (bins (M,), overflow): flat token bins in serial slot order
    with INVALID_BIN holes for empty slots.

    No compaction: slot order IS serial token order (SURVEY A.6), and holes
    cost nothing downstream (aob 0 -> zero contribution at a repeated bit
    offset).  A compaction sort was measured at ~14 ns/token on this TPU —
    4x the entire rest of the pipeline — so the pipeline stays hole-ful.
    Bins are built gather-free (assemble_bins folds stream bases in).
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

    bins, overflow = assemble_bins(
        cas, run_len, ndigits_cap=ndigits_cap, invalid_bin=INVALID_BIN
    )
    return bins.reshape(-1), overflow


@partial(jax.jit, static_argnames=("width", "ndigits_cap"))
def tokenize_compact(imgs_flat, *, width: int, ndigits_cap: int):
    """Dispatch A (batched): imgs_flat (B, N, 3) uint8.

    Returns (bins (B, M) int32 in serial slot order with INVALID_BIN holes,
    stats (B, 859) int32) where stats = per-image histogram ++ [overflow].
    """
    core = partial(_tokenize_core, width=width, ndigits_cap=ndigits_cap)
    bins, overflow = jax.vmap(core)(imgs_flat)
    if _use_pallas():
        from nicetpu.kernels.pallas_ops import histogram_pallas

        counts = histogram_pallas(bins)
    else:

        def hist1(b):
            live = b < C.TOTAL_SYMBOLS
            return (
                jnp.zeros(C.TOTAL_SYMBOLS, dtype=jnp.int32)
                .at[jnp.where(live, b, 0)]
                .add(live.astype(jnp.int32), mode="drop")
            )

        counts = jax.vmap(hist1)(bins)
    stats = jnp.concatenate(
        [counts, overflow.astype(jnp.int32).reshape(-1, 1)], axis=1
    )
    return bins, stats


def _cumsum_matmul(x: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Exact inclusive cumsum along axis -1 via per-block triangular matmul
    (MXU) + small cross-block int32 scan.  x: (..., L) int32 with L % 512 == 0
    and per-block sums < 2^24 (aob <= 31 per element guarantees it).

    dtype: matmul input dtype.  bfloat16 is exact only for element values
    <= 256; pass float32 when elements can exceed that (e.g. per-GROUP bit
    counts in the grouped fold, up to 32*capw).
    """
    K = 512
    lead = x.shape[:-1]
    L = x.shape[-1]
    blocks = x.reshape(*lead, L // K, K).astype(dtype)
    tri = jnp.tril(jnp.ones((K, K), dtype))
    inner = jax.lax.dot_general(
        blocks,
        tri,
        (((blocks.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # inclusive within block; values <= 512*31 < 2^24 => exact
    block_sums = inner[..., -1].astype(jnp.int32)  # (..., L//K)
    block_off = jnp.cumsum(block_sums, axis=-1) - block_sums
    return (inner.astype(jnp.int32) + block_off[..., None]).reshape(*lead, L)


def _place(aob, code, *, w_cap: int):
    """Exclusive-scan offsets + two-word scatter placement (one image)."""
    L = aob.shape[0]
    if L % 512 == 0:
        incl = _cumsum_matmul(aob)
        offs = incl - aob
        total_bits = incl[-1]
    else:
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


def _fold_pixel_records(aob2, code2, capw: int):
    """Per-pixel left-aligned bit records from per-slot (aob, code).

    aob2/code2: (N, S).  Builds only `capw` record words (contents beyond
    32*capw bits are dropped — the caller's overflow check catches it).
    Returns (rec: list of capw (N,) uint32 words, kbits (N,) int32)."""
    N, S = aob2.shape
    rec = [jnp.zeros(N, jnp.uint32) for _ in range(capw)]
    cum = jnp.zeros(N, jnp.int32)
    for s in range(S):
        L = aob2[:, s]
        cd = code2[:, s]
        sw = cum >> 5
        sb = cum & 31
        fits = sb + L <= 32
        k = jnp.where(fits, 0, sb + L - 32)
        shift_hi = jnp.clip(jnp.where(fits, 32 - sb - L, k), 0, 31).astype(jnp.uint32)
        hi = jnp.where(fits, cd << shift_hi, cd >> shift_hi)
        mask_k = (jnp.uint32(1) << k.astype(jnp.uint32)) - jnp.uint32(1)
        shift_lo = jnp.clip(32 - k, 0, 31).astype(jnp.uint32)
        lo = jnp.where(fits, jnp.uint32(0), (cd & mask_k) << shift_lo)
        for j in range(min(capw, s + 2)):  # cum <= 31*s => sw <= s, lo at sw+1
            rec[j] = (
                rec[j]
                | jnp.where(sw == j, hi, jnp.uint32(0))
                | jnp.where(sw == j - 1, lo, jnp.uint32(0))
            )
        cum = cum + L
    return rec, cum


# Grouped fold: 8 consecutive pixels fold into one <= 320-bit record, so
# the final scatter is (GROUP_CAPW+1) words per 8 PIXELS (1.375 updates per
# pixel vs 4/pixel for the per-pixel fold — scatter was ~3/4 of the whole
# fused dispatch on TPU, see ARCHITECTURE cost model).  320 bits/group =
# 40 bits avg/pixel; RGB-heavy noise runs ~33 bits/pixel, so real images
# fit.  The fold is a SINGLE elementwise pass over the group's G*S slots:
# a pairwise combine tree was tried first and measured 35% slower — its
# [0::2]/[1::2] strided slices relayout every level on TPU.
GROUP_CAPW = 10
GROUP = 8


def _fold_place_grouped(aob2, code2, *, w_cap: int, capw: int = GROUP_CAPW):
    """Group fold + (capw+1)-word scatter (one image).

    Folds GROUP consecutive pixels' slots into one left-aligned bit record
    (one `_fold_pixel_records` pass over G*S slots), then scatters each
    group record at its exclusive-scan bit offset.  Byte-identical to
    the per-slot `_place` whenever neither path overflows; a group exceeding
    32*capw bits sets the overflow flag (caller falls back to an exact
    path)."""
    N, S = aob2.shape
    G = GROUP
    pad = (-N) % G
    if pad:
        aob2 = jnp.pad(aob2, ((0, pad), (0, 0)))
        code2 = jnp.pad(code2, ((0, pad), (0, 0)))
    M = aob2.shape[0] // G
    rec, k = _fold_pixel_records(
        aob2.reshape(M, G * S), code2.reshape(M, G * S), capw
    )
    overflow = jnp.any(k > 32 * capw)

    padk = (-M) % 512
    kpad = jnp.pad(k, (0, padk))
    # float32 matmul: group bit counts exceed bfloat16's exact-int range
    incl = _cumsum_matmul(kpad, dtype=jnp.float32)
    total_bits = incl[M - 1]
    offs = incl[:M] - k

    w = (offs >> 5).astype(jnp.int32)
    r = (offs & 31).astype(jnp.uint32)
    r_nz = r > 0
    words = jnp.zeros(w_cap, dtype=jnp.uint32)
    for j in range(capw + 1):
        cur = rec[j] if j < capw else jnp.zeros(M, jnp.uint32)
        prev = rec[j - 1] if 0 < j <= capw else jnp.zeros(M, jnp.uint32)
        val = cur >> r
        val = val | jnp.where(r_nz, prev << (jnp.uint32(32) - r), jnp.uint32(0))
        words = words.at[w + j].add(val, mode="drop")
    return words, total_bits, overflow


def _fold_place_grouped_batched(aob3, code3, *, w_cap: int, capw: int = GROUP_CAPW):
    """Batched grouped fold + place: (B, N, S) -> (words (B, w_cap), totals
    (B,), overflow (B,)).  On TPU the record fold runs as a Pallas kernel
    (pallas_ops.fold_records_pallas); elsewhere it vmaps the jnp
    `_fold_place_grouped`.  Byte-identical outputs."""
    B, N, S = aob3.shape
    if not _use_pallas():
        return jax.vmap(partial(_fold_place_grouped, w_cap=w_cap, capw=capw))(
            aob3, code3
        )
    from nicetpu.kernels.pallas_ops import fold_records_pallas

    G = GROUP
    pad = (-N) % G
    if pad:
        aob3 = jnp.pad(aob3, ((0, 0), (0, pad), (0, 0)))
        code3 = jnp.pad(code3, ((0, 0), (0, pad), (0, 0)))
    M = aob3.shape[1] // G
    rec, k = fold_records_pallas(
        aob3.reshape(B, M, G * S),
        jax.lax.bitcast_convert_type(code3, jnp.int32).reshape(B, M, G * S),
        capw=capw,
    )  # rec (B, capw, Mp) int32; k (B, Mp) — padded groups are empty
    overflow = jnp.any(k > 32 * capw, axis=1)

    Mp = k.shape[1]
    padk = (-Mp) % 512
    kpad = jnp.pad(k, ((0, 0), (0, padk)))
    incl = _cumsum_matmul(kpad, dtype=jnp.float32)
    total_bits = incl[:, Mp - 1]
    offs = incl[:, :Mp] - k

    recu = jax.lax.bitcast_convert_type(rec, jnp.uint32)
    w = (offs >> 5).astype(jnp.int32)
    r = (offs & 31).astype(jnp.uint32)
    r_nz = r > 0
    zero = jnp.zeros((B, Mp), jnp.uint32)

    def scatter1(w1, vals1):
        out = jnp.zeros(w_cap, dtype=jnp.uint32)
        for j in range(capw + 1):
            out = out.at[w1 + j].add(vals1[j], mode="drop")
        return out

    vals = []
    for j in range(capw + 1):
        cur = recu[:, j] if j < capw else zero
        prev = recu[:, j - 1] if 0 < j <= capw else zero
        val = cur >> r
        val = val | jnp.where(r_nz, prev << (jnp.uint32(32) - r), jnp.uint32(0))
        vals.append(val)
    words = jax.vmap(scatter1)(w, jnp.stack(vals, axis=1))
    return words, total_bits, overflow


@partial(jax.jit, static_argnames=("w_cap", "slots", "mode"))
def pack_compact(bins, aob_tbl, code_tbl, *, w_cap: int, slots: int, mode: str = "fold"):
    """Dispatch B (batched): join per-image tables, scan offsets, place.

    bins (B, N*slots) with INVALID_BIN holes; aob_tbl (B, 858) int32;
    code_tbl (B, 858) uint32.
    Returns (words (B, w_cap) uint32, total_bits (B,) int32, overflow (B,)).
    """
    if _use_pallas():
        from nicetpu.kernels.pallas_ops import table_join_pallas

        aob, code = table_join_pallas(bins, aob_tbl, code_tbl)
    else:

        def join1(b, at, ct):
            live = b < C.TOTAL_SYMBOLS
            bi = jnp.clip(b, 0, C.TOTAL_SYMBOLS - 1)
            return jnp.where(live, at[bi], 0), jnp.where(
                live, ct[bi], jnp.uint32(0)
            )

        aob, code = jax.vmap(join1)(bins, aob_tbl, code_tbl)
    if mode == "fold":
        B, M = aob.shape
        aob2 = aob.reshape(B, M // slots, slots)
        code2 = code.reshape(B, M // slots, slots)
        return _fold_place_grouped_batched(aob2, code2, w_cap=w_cap)
    words, totals = jax.vmap(partial(_place, w_cap=w_cap))(aob, code)
    return words, totals, jnp.zeros(words.shape[0], jnp.bool_)


def _bucket(n: int, buckets=(1, 2, 3, 4, 6, 8, 12, 16)) -> int:
    """Round a size up to a stable bucket (limits jit recompiles)."""
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def encode_batch(imgs: np.ndarray) -> list[bytes]:
    """Encode a (B, H, W, 3) uint8 batch of same-shape images on the
    accelerator, with per-image Huffman tables (BASELINE configs 2/4)."""
    from nicetpu.format.huffman import build_tables_host

    if imgs.ndim != 4 or imgs.shape[3] != 3 or imgs.dtype != np.uint8:
        raise ValueError("expected (B, H, W, 3) uint8 batch")
    B, H, W, _ = imgs.shape
    if W < C.MIN_WIDTH:
        raise ValueError(f"width must be >= {C.MIN_WIDTH} (SURVEY A.8.7)")
    N = H * W
    flat = jnp.asarray(imgs.reshape(B, N, 3))

    bins, stats_d = tokenize_compact(flat, width=W, ndigits_cap=3)
    stats = np.asarray(stats_d).astype(np.int64)
    if stats[:, -1].any():  # some run needs > 3 digits: full-layout fallback
        bins, stats_d = tokenize_compact(
            flat, width=W, ndigits_cap=C.MAX_RUN_DIGITS
        )
        stats = np.asarray(stats_d).astype(np.int64)

    counts = stats[:, :-1]  # (B, 858)
    tables = [build_tables_host(counts[b]) for b in range(B)]
    aob_np = np.stack([t[0] for t in tables]).astype(np.int32)
    code_np = np.stack([t[1] for t in tables])
    needed_bits = (counts * aob_np.astype(np.int64)).sum(axis=1)

    needed_words = int(needed_bits.max()) // 32 + 2
    w_cap = max(
        _bucket(-(-needed_words * 8 // max(N, 8))) * (N // 8 + 1) + 2,
        needed_words + 2,
    )
    slots = bins.shape[1] // N

    words_d, totals_d, ovf_d = pack_compact(
        bins, jnp.asarray(aob_np), jnp.asarray(code_np), w_cap=w_cap, slots=slots
    )
    if bool(np.asarray(ovf_d).any()):
        # Rare: some group packs > 32*GROUP_CAPW bits; exact slot-level path.
        words_d, totals_d, _ = pack_compact(
            bins,
            jnp.asarray(aob_np),
            jnp.asarray(code_np),
            w_cap=w_cap,
            slots=slots,
            mode="slots",
        )
    words = np.asarray(words_d)
    totals = np.asarray(totals_d)

    out = []
    for b in range(B):
        total_bits = int(totals[b])
        assert total_bits == int(needed_bits[b]), (b, total_bits, needed_bits[b])
        out.append(
            headers.pack_file_header(W, H, 3)
            + headers.pack_stream_headers(aob_np[b].astype(np.uint8))
            + words_to_payload(words[b], total_bits)
        )
    return out


def encode_fused_core(imgs_flat, *, width: int, ndigits_cap: int, w_cap: int):
    """Traceable body of `encode_fused`: tokenize + histogram + on-device
    Huffman tables + join + fold + place, no jit wrapper — composable into
    larger fused dispatches (decode3's single-dispatch round-trip verify).

    Returns (words (B, w_cap) uint32, lengths (B, 858) int32,
    totals (B,) int32, ovf (B,) bool)."""
    from nicetpu.kernels.huffman_dev import build_tables_device

    core = partial(_tokenize_core, width=width, ndigits_cap=ndigits_cap)
    bins, run_ovf = jax.vmap(core)(imgs_flat)
    if _use_pallas():
        from nicetpu.kernels.pallas_ops import histogram_pallas

        counts = histogram_pallas(bins)
    else:

        def hist1(b):
            live = b < C.TOTAL_SYMBOLS
            return (
                jnp.zeros(C.TOTAL_SYMBOLS, dtype=jnp.int32)
                .at[jnp.where(live, b, 0)]
                .add(live.astype(jnp.int32), mode="drop")
            )

        counts = jax.vmap(hist1)(bins)

    lengths, codes, len_ovf = build_tables_device(counts)

    if _use_pallas():
        from nicetpu.kernels.pallas_ops import table_join_pallas

        aob, code = table_join_pallas(bins, lengths, codes)
    else:

        def join1(b, at, ct):
            live = b < C.TOTAL_SYMBOLS
            bi = jnp.clip(b, 0, C.TOTAL_SYMBOLS - 1)
            return jnp.where(live, at[bi], 0), jnp.where(live, ct[bi], jnp.uint32(0))

        aob, code = jax.vmap(join1)(bins, lengths, codes)

    B, M = aob.shape
    slots = M // imgs_flat.shape[1]
    aob2 = aob.reshape(B, M // slots, slots)
    code2 = code.reshape(B, M // slots, slots)
    # Grouped fold: 8 pixels per scattered record (11 updates / 8 pixels vs
    # 4/pixel — the scatter was ~3/4 of the whole dispatch); 320-bit group
    # cap = 40 bits avg/pixel, so long RGB-residual pixels borrow headroom
    # from their group instead of overflowing a per-pixel cap.
    words, totals, fold_ovf = _fold_place_grouped_batched(aob2, code2, w_cap=w_cap)

    cap_ovf = totals > jnp.int32(32 * (w_cap - 2))
    ovf = run_ovf | len_ovf | fold_ovf | cap_ovf
    return words, lengths, totals, ovf


@partial(jax.jit, static_argnames=("width", "ndigits_cap", "w_cap"))
def encode_fused(imgs_flat, *, width: int, ndigits_cap: int, w_cap: int):
    """Whole encode as ONE device dispatch: tokenize + histogram + on-device
    Huffman tables (kernels/huffman_dev.py) + join + fold + place.

    No host round-trip between histogram and packing — on the tunnel-attached
    TPU each host sync costs ~24 ms, which dominated single-image latency in
    the two-dispatch pipeline.

    imgs_flat: (B, N, 3) uint8.  Returns (words (B, w_cap) uint32,
    small (B, 860) int32) where small = per-image [flat code lengths (858),
    total payload bits, overflow flag].  When the overflow flag is set (run
    needs > ndigits_cap digits, a group packs > 32*GROUP_CAPW bits, or a
    Huffman length exceeds 31 bits) the caller must fall back to an exact
    host path; the fused outputs for that image are not usable.
    """
    words, lengths, totals, ovf = encode_fused_core(
        imgs_flat, width=width, ndigits_cap=ndigits_cap, w_cap=w_cap
    )
    small = jnp.concatenate(
        [lengths, totals[:, None], ovf.astype(jnp.int32)[:, None]], axis=1
    )
    return words, small


def encode_jax_v2(img: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 image on the accelerator (batch of one)."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("expected (H, W, 3) uint8 image")
    return encode_batch(img[None])[0]
