"""Entropy-layer unit tests (model: ref hfe.rs tests, SURVEY §3.3/§4)."""

import itertools

import numpy as np
import pytest

from nicetpu.format import constants as C
from nicetpu.format import headers, huffman


def kraft(lengths) -> float:
    return float(sum(2.0 ** -int(l) for l in lengths))


class TestCodeLengths:
    def test_optimal_vs_bruteforce_small(self):
        rng = np.random.default_rng(3)
        for _ in range(25):
            n = int(rng.integers(2, 7))
            counts = rng.integers(0, 9, n)
            lens = huffman.code_lengths(counts)
            assert abs(kraft(lens) - 1.0) < 1e-12
            best = None
            for cand in itertools.product(range(1, n), repeat=n):
                if n > 2 and abs(kraft(cand) - 1.0) > 1e-12:
                    continue
                if n == 2 and cand != (1, 1):
                    continue
                tot = int(sum(c * l for c, l in zip(counts, cand)))
                best = tot if best is None else min(best, tot)
            assert int((counts * lens.astype(np.int64)).sum()) == best

    def test_full_alphabet_zero_counts(self):
        for n in C.ALPHABET_SIZES:
            lens = huffman.code_lengths(np.zeros(n, dtype=np.int64))
            assert abs(kraft(lens) - 1.0) < 1e-12
            assert int(lens.max()) <= C.MAX_CODE_LEN

    def test_length_limit_enforced(self):
        # Zero-heavy + tiny counts historically chain past 31 bits.
        counts = np.zeros(343, dtype=np.int64)
        counts[:40] = np.arange(1, 41)
        lens = huffman.code_lengths(counts)
        assert int(lens.max()) <= C.MAX_CODE_LEN
        assert abs(kraft(lens) - 1.0) < 1e-12

    def test_deterministic(self):
        rng = np.random.default_rng(4)
        counts = rng.integers(0, 1000, 256)
        a = huffman.code_lengths(counts)
        b = huffman.code_lengths(counts.copy())
        assert np.array_equal(a, b)


class TestCanonicalCodes:
    def test_prefix_free_and_complete(self):
        rng = np.random.default_rng(5)
        for _ in range(10):
            counts = rng.integers(0, 50, 64)
            lens = huffman.code_lengths(counts)
            codes = huffman.canonical_codes(lens)
            max_aob = int(lens.max())
            seen = np.zeros(1 << max_aob, dtype=bool)
            for s in range(64):
                ln = int(lens[s])
                lo = int(codes[s]) << (max_aob - ln)
                hi = (int(codes[s]) + 1) << (max_aob - ln)
                assert not seen[lo:hi].any(), "overlapping code ranges"
                seen[lo:hi] = True
            assert seen.all(), "code ranges must tile [0, 2^max_aob)"

    def test_ordering_matches_reference_formula(self):
        # Shortest code of the smallest symbol is all-zeros (SURVEY §2.3.2).
        lens = np.array([2, 1, 3, 3], dtype=np.uint8)
        codes = huffman.canonical_codes(lens)
        assert codes[1] == 0b0
        assert codes[0] == 0b10
        assert codes[2] == 0b110
        assert codes[3] == 0b111

    def test_decode_lut_roundtrip(self):
        rng = np.random.default_rng(6)
        counts = rng.integers(0, 100, 32)
        lens = huffman.code_lengths(counts)
        codes = huffman.canonical_codes(lens)
        sym_lut, aob_lut = huffman.decode_lut(lens, codes)
        max_aob = int(lens.max())
        for s in range(32):
            x = int(codes[s]) << (max_aob - int(lens[s]))
            assert sym_lut[x] == s
            assert aob_lut[x] == lens[s]

    def test_canonical_decode_tables(self):
        rng = np.random.default_rng(7)
        counts = rng.integers(0, 100, 343)
        lens = huffman.code_lengths(counts)
        codes = huffman.canonical_codes(lens)
        syms, base, first = huffman.canonical_decode_tables(lens)
        max_aob = int(lens.max())
        for s in range(0, 343, 17):
            aligned = int(codes[s]) << (32 - int(lens[s]))
            best_l = max(
                l for l in range(1, max_aob + 1) if int(first[l]) <= aligned
            )
            assert best_l == int(lens[s])
            idx = int(base[best_l]) + ((aligned - int(first[best_l])) >> (32 - best_l))
            assert int(syms[idx]) == s


class TestHeaders:
    def test_file_header_roundtrip(self):
        data = headers.pack_file_header(4096, 2160, 3)
        assert len(data) == C.FILE_HEADER_BYTES
        assert headers.parse_file_header(data) == (4096, 2160, 3)

    def test_stream_headers_roundtrip(self):
        rng = np.random.default_rng(8)
        flat = np.zeros(C.TOTAL_SYMBOLS, dtype=np.uint8)
        for s in range(C.NUM_STREAMS):
            base, size = C.STREAM_BASE[s], C.ALPHABET_SIZES[s]
            counts = rng.integers(0, 1000, size)
            flat[base : base + size] = huffman.code_lengths(counts)
        packed = headers.pack_stream_headers(flat)
        assert len(packed) == C.STREAM_HEADERS_BYTES
        assert np.array_equal(headers.parse_stream_headers(packed), flat)


class TestLengthLimitClamp:
    """The 31-bit limiter: clamp all counts to clamp_floor(total), re-merge.

    Activates exactly where the reference format corrupts (raw depth > 31
    can't be written to the 5-bit max_aob field, ref hfe.rs:98 / SURVEY
    §2.3.4); shared verbatim by Python, the C++ oracle, and the on-device
    builder."""

    def _pathological(self, rng):
        n = int(rng.choice([64, 256, 343]))
        counts = np.zeros(n, dtype=np.int64)
        fib = [1, 1]
        while len(fib) < 40:
            fib.append(fib[-1] + fib[-2])
        k = min(n - 4, 40)
        counts[rng.permutation(n)[:k]] = fib[:k]
        return counts

    def test_limit_kraft_and_validity(self):
        rng = np.random.default_rng(9)
        for _ in range(10):
            counts = self._pathological(rng)
            raw = huffman._huffman_lengths_once(counts)
            lens = huffman.code_lengths(counts)
            assert int(lens.max()) <= C.MAX_CODE_LEN
            assert abs(kraft(lens) - 1.0) < 1e-12
            if int(raw.max()) <= C.MAX_CODE_LEN:
                assert np.array_equal(lens, raw.astype(np.uint8))

    def test_matches_native(self):
        oracle = pytest.importorskip("nicetpu.hostref.oracle")
        try:
            oracle.get_lib()
        except Exception:
            pytest.skip("no toolchain")
        rng = np.random.default_rng(10)
        for _ in range(10):
            counts = self._pathological(rng)
            assert np.array_equal(
                huffman.code_lengths(counts), oracle.code_lengths_native(counts)
            )
