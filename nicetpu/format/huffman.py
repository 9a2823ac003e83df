"""Canonical Huffman code construction for the `.nice` entropy layer.

Semantics follow the reference (SURVEY §2.3):

* Code lengths: full-alphabet Huffman merge including zero-count symbols,
  minimum length 1 bit (ref hfe.rs:62-84 initializes every aob to 1 and stops
  the merge with 2 nodes left — standard optimal Huffman lengths).
* Tie-breaking among equal-weight heap nodes is *unspecified* in the reference
  (Rust BinaryHeap pop order).  All optimal tie-breaks yield the same total
  payload size (SURVEY §7.3.4), so we define our own deterministic order:
  nodes compare by (total count, smallest symbol under node).  The C++ oracle
  implements the identical rule so all our encoders are byte-identical.
* Canonical assignment (ref hfe.rs:255-296): symbols ordered by
  (length asc, symbol asc) receive codes counting up from 0 — verified
  equivalent to the reference's inverted-walk formula (SURVEY §2.3.2).
"""

from __future__ import annotations

import heapq

import numpy as np

from nicetpu.format import constants as C


def _huffman_lengths_once(counts: np.ndarray) -> np.ndarray:
    """One minimum-variance Huffman merge pass -> (n,) int64 lengths >= 1."""
    n = int(counts.shape[0])
    lengths = np.ones(n, dtype=np.int64)
    # Heap entries: (weight, is_internal, min_symbol, [symbol ids under node]).
    # Leaves pop before equal-weight internal nodes: this is minimum-variance
    # Huffman — optimal total like any tie-break (SURVEY §7.3.4), but with the
    # smallest max depth, keeping flat/zero-count alphabets at ~log2(n) bits
    # instead of degenerate chains.
    heap: list[tuple[int, int, int, list[int]]] = [
        (int(counts[i]), 0, i, [i]) for i in range(n)
    ]
    heapq.heapify(heap)
    # Stop at 2 nodes: the final (root) merge is accounted for by the aob=1
    # initialization (ref hfe.rs:62, hfe.rs:72).
    while len(heap) > 2:
        w1, _, m1, s1 = heapq.heappop(heap)
        w2, _, m2, s2 = heapq.heappop(heap)
        merged = s1 + s2
        lengths[merged] += 1
        heapq.heappush(heap, (w1 + w2, 1, min(m1, m2), merged))
    return lengths


def clamp_floor(total: int) -> int:
    """Minimum weight enforced by the length-limiting clamp: >= total/2^20.

    Clamping every count (including zeros) to this floor bounds the Huffman
    depth by the Fibonacci weight bound: w_min/total' >= 1/(2^20 * 1.001)
    > 1/F(33), so the re-merged depth is <= 31 with margin.  Shared verbatim
    by the C++ oracle and the on-device builder (kernels/huffman_dev.py).
    """
    return (int(total) >> 20) + 1


def code_lengths(counts: np.ndarray) -> np.ndarray:
    """Optimal Huffman code lengths (>= 1 bit) for a full alphabet.

    counts: (n,) nonnegative ints, n >= 2.  Returns (n,) uint8 lengths.
    Deterministic (the C++ oracle and the on-device builder implement the
    same tie-break).  When the unrestricted optimum exceeds the 31-bit limit
    of the 5-bit max_aob header field (the reference would silently corrupt
    there, ref hfe.rs:98), all counts are clamped up to `clamp_floor(total)`
    and the merge re-run — a deterministic, device-expressible limiter that
    only activates exactly where the reference format breaks down.
    """
    counts = np.asarray(counts, dtype=np.int64)
    if counts.shape[0] < 2:
        raise ValueError("alphabet must have >= 2 symbols")
    lengths = _huffman_lengths_once(counts)
    if int(lengths.max()) > C.MAX_CODE_LEN:
        lengths = _huffman_lengths_once(
            np.maximum(counts, clamp_floor(counts.sum()))
        )
        assert int(lengths.max()) <= C.MAX_CODE_LEN
    return lengths.astype(np.uint8)


def canonical_codes(lengths: np.ndarray) -> np.ndarray:
    """Canonical codes for given lengths: (len asc, symbol asc), counting up.

    Matches the reference's inverted-walk assignment (ref hfe.rs:255-296,
    shared by encoder and decoder).  Returns (n,) uint32 codes, each valid in
    its low `lengths[i]` bits.
    """
    lengths = np.asarray(lengths, dtype=np.int64)
    n = lengths.shape[0]
    order = np.lexsort((np.arange(n), lengths))  # length asc, symbol asc
    codes = np.zeros(n, dtype=np.uint32)
    code = 0
    prev_len = 0
    for sym in order:
        ln = int(lengths[sym])
        if prev_len:
            code = (code + 1) << (ln - prev_len)
        codes[sym] = code
        prev_len = ln
    return codes


def decode_lut(lengths: np.ndarray, codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """One-shot decoder LUT: (symbol, aob) for every max_aob-bit prefix.

    Mirrors ref hfe.rs:191-202: entry x = the unique code that prefixes x.
    Returns (symbols uint16 (2^max_aob,), aobs uint8 (2^max_aob,)).
    """
    lengths = np.asarray(lengths, dtype=np.int64)
    codes = np.asarray(codes, dtype=np.uint32)
    max_aob = int(lengths.max())
    if max_aob > C.MAX_LUT_AOB:
        raise OverflowError(f"max_aob {max_aob} too large for one-shot LUT")
    size = 1 << max_aob
    symbols = np.zeros(size, dtype=np.uint16)
    aobs = np.zeros(size, dtype=np.uint8)
    for sym in range(lengths.shape[0]):
        ln = int(lengths[sym])
        lo = int(codes[sym]) << (max_aob - ln)
        hi = (int(codes[sym]) + 1) << (max_aob - ln)
        symbols[lo:hi] = sym
        aobs[lo:hi] = ln
    return symbols, aobs


def canonical_decode_tables(
    lengths: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Tables for LUT-free canonical decoding of arbitrarily deep codes.

    Returns (sorted_symbols, index_base, aligned_first):
      sorted_symbols: symbols in (length asc, symbol asc) order (uint16)
      index_base[l]:  index into sorted_symbols of the first length-l symbol
      aligned_first[l]: first length-l code left-aligned to 32 bits (uint64)
    Decode: align the peeked max_aob bits to 32; pick the largest present
    length l with aligned >= aligned_first[l]; then
    symbol = sorted_symbols[index_base[l] + ((aligned - aligned_first[l]) >> (32-l))].
    """
    lengths = np.asarray(lengths, dtype=np.int64)
    codes = canonical_codes(lengths)
    n = lengths.shape[0]
    order = np.lexsort((np.arange(n), lengths))
    sorted_symbols = order.astype(np.uint16)
    index_base = np.zeros(C.MAX_CODE_LEN + 2, dtype=np.int64)
    aligned_first = np.full(C.MAX_CODE_LEN + 2, np.iinfo(np.uint64).max, dtype=np.uint64)
    for idx, sym in enumerate(order):
        ln = int(lengths[sym])
        if aligned_first[ln] == np.iinfo(np.uint64).max:
            index_base[ln] = idx
            aligned_first[ln] = np.uint64(int(codes[sym]) << (32 - ln))
    return sorted_symbols, index_base, aligned_first


def validate_flat_lengths(flat_lengths: np.ndarray) -> None:
    """Corrupt-header hardening shared by the decoders: every stream's code
    lengths must be in 1..=31 with an exactly complete Kraft sum (what every
    conforming encoder emits — full-alphabet Huffman, SURVEY §2.3.1)."""
    flat = np.asarray(flat_lengths, dtype=np.int64)
    for s in range(C.NUM_STREAMS):
        lens = flat[C.STREAM_BASE[s] : C.STREAM_BASE[s] + C.ALPHABET_SIZES[s]]
        if (lens < 1).any() or (lens > C.MAX_CODE_LEN).any():
            raise ValueError(f"corrupt stream header: stream {s} length out of range")
        if int((1 << (C.MAX_CODE_LEN - lens)).sum()) != 1 << C.MAX_CODE_LEN:
            raise ValueError(f"corrupt stream header: stream {s} Kraft sum != 1")


def decode_dev_tables(
    flat_lengths: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-stream canonical-decode tables in the device layout.

    Returns (af, present, ib, sorted_flat):
      af (NUM_STREAMS, 32) uint32: first code of each length, left-aligned to
        32 bits (0xFFFFFFFF where the length is absent — callers must ALSO
        check `present`, since a 32-one-bits window equals the sentinel);
      present (NUM_STREAMS, 32) bool;
      ib (NUM_STREAMS, 32) int32: index into the stream's (length asc,
        symbol asc) order of the first length-l symbol;
      sorted_flat (NUM_STREAMS, 343) int32: symbols in canonical order,
        zero-padded per stream (row s, col i = i-th canonical symbol).

    Decode (matches StreamDecoder.read / ref hfe.rs:206-222 for any depth):
      L = max{l : present[s,l] and af[s,l] <= win32}
      sym = sorted_flat[s, ib[s,L] + ((win32 - af[s,L]) >> (32-L))]
    """
    flat_lengths = np.asarray(flat_lengths, dtype=np.int64)
    af = np.full((C.NUM_STREAMS, 32), 0xFFFFFFFF, dtype=np.uint32)
    present = np.zeros((C.NUM_STREAMS, 32), dtype=bool)
    ib = np.zeros((C.NUM_STREAMS, 32), dtype=np.int32)
    sorted_flat = np.zeros((C.NUM_STREAMS, max(C.ALPHABET_SIZES)), dtype=np.int32)
    for s in range(C.NUM_STREAMS):
        base, size = C.STREAM_BASE[s], C.ALPHABET_SIZES[s]
        lengths = flat_lengths[base : base + size]
        codes = canonical_codes(lengths)
        order = np.lexsort((np.arange(size), lengths))
        sorted_flat[s, :size] = order
        for idx, sym in enumerate(order):
            ln = int(lengths[sym])
            if not present[s, ln]:
                present[s, ln] = True
                ib[s, ln] = idx
                af[s, ln] = np.uint32(int(codes[sym]) << (32 - ln))
    return af, present, ib, sorted_flat


def build_all_tables(
    flat_counts: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, list[int]]:
    """Per-stream tables from a flat (TOTAL_SYMBOLS,) histogram.

    Returns (flat_lengths uint8, flat_codes uint32, max_aobs per stream) in
    the flat STREAM_BASE layout shared with the JAX kernels.
    """
    flat_counts = np.asarray(flat_counts)
    flat_lengths = np.zeros(C.TOTAL_SYMBOLS, dtype=np.uint8)
    flat_codes = np.zeros(C.TOTAL_SYMBOLS, dtype=np.uint32)
    max_aobs: list[int] = []
    for s in range(C.NUM_STREAMS):
        base = C.STREAM_BASE[s]
        size = C.ALPHABET_SIZES[s]
        lens = code_lengths(flat_counts[base : base + size])
        flat_lengths[base : base + size] = lens
        flat_codes[base : base + size] = canonical_codes(lens)
        max_aobs.append(int(lens.max()))
    return flat_lengths, flat_codes, max_aobs


def build_tables_host(flat_counts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Host table build for the device encoders: (flat_lengths, flat_codes).

    Prefers the native C++ length builder (identical deterministic output,
    ~10x faster on the 858-symbol histogram); falls back to the Python
    builder when the shared library is unavailable."""
    flat_counts = np.asarray(flat_counts)
    try:
        from nicetpu.hostref.oracle import code_lengths_native

        flat_lengths = np.zeros(C.TOTAL_SYMBOLS, dtype=np.uint8)
        for s in range(C.NUM_STREAMS):
            b, sz = C.STREAM_BASE[s], C.ALPHABET_SIZES[s]
            flat_lengths[b : b + sz] = code_lengths_native(flat_counts[b : b + sz])
        flat_codes = np.zeros(C.TOTAL_SYMBOLS, dtype=np.uint32)
        for s in range(C.NUM_STREAMS):
            b, sz = C.STREAM_BASE[s], C.ALPHABET_SIZES[s]
            flat_codes[b : b + sz] = canonical_codes(flat_lengths[b : b + sz])
        return flat_lengths, flat_codes
    except Exception:
        flat_lengths, flat_codes, _ = build_all_tables(flat_counts)
        return flat_lengths, flat_codes
