"""Native C++ oracle: byte-parity with the numpy spec + round-trips.

Model: the reference's golden-dump mechanism (SURVEY §4) — every backend is
validated against every other at the byte level.
"""

import numpy as np
import pytest

from nicetpu.format import huffman
from nicetpu.spec import codec

oracle = pytest.importorskip("nicetpu.hostref.oracle")

try:
    oracle.get_lib()
    HAVE_LIB = True
except Exception:  # pragma: no cover - build env missing
    HAVE_LIB = False

pytestmark = pytest.mark.skipif(not HAVE_LIB, reason="g++ toolchain unavailable")


def _images(seed=0, count=14):
    rng = np.random.default_rng(seed)
    for t in range(count):
        h = int(rng.integers(1, 16))
        w = int(rng.integers(4, 20))
        style = t % 4
        if style == 0:
            yield rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        elif style == 1:
            yield (rng.integers(0, 3, (h, w, 3)) * 100).astype(np.uint8)
        elif style == 2:
            yield (
                rng.integers(0, 8, (h, w, 1)) * 30 + rng.integers(0, 4, (h, w, 3))
            ).astype(np.uint8)
        else:
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            img[h // 2 :] = img[max(h // 2 - 1, 0), 0]
            yield img


class TestCodeLengthParity:
    def test_native_matches_python(self):
        rng = np.random.default_rng(1)
        for t in range(40):
            n = int(rng.integers(2, 344))
            style = t % 3
            if style == 0:
                counts = rng.integers(0, 1000, n)
            elif style == 1:
                counts = np.where(rng.random(n) < 0.8, 0, rng.integers(1, 5, n))
            else:
                counts = rng.integers(0, 2**31, n)
            np.testing.assert_array_equal(
                huffman.code_lengths(counts), oracle.code_lengths_native(counts)
            )


class TestEncodeParity:
    def test_byte_identical_to_spec(self):
        for img in _images(seed=2):
            assert oracle.encode_native(img) == codec.encode(img)


class TestCrossDecode:
    def test_native_decodes_spec_output(self):
        for img in _images(seed=3, count=8):
            np.testing.assert_array_equal(
                oracle.decode_native(codec.encode(img)), img
            )

    def test_spec_decodes_native_output(self):
        for img in _images(seed=4, count=8):
            np.testing.assert_array_equal(
                codec.decode(oracle.encode_native(img)), img
            )

    def test_native_roundtrip_medium(self):
        rng = np.random.default_rng(5)
        img = (rng.integers(0, 6, (128, 96, 1)) * 40 + rng.integers(0, 5, (128, 96, 3))).astype(np.uint8)
        np.testing.assert_array_equal(
            oracle.decode_native(oracle.encode_native(img)), img
        )

    def test_decode_rejects_bad_channels(self):
        img = np.full((5, 6, 3), 7, dtype=np.uint8)
        data = bytearray(oracle.encode_native(img))
        data[12] = 4
        with pytest.raises(ValueError):
            oracle.decode_native(bytes(data))


class TestDecoderRobustness:
    def test_corruption_never_crashes(self):
        # The reference corrupts memory / panics on hostile input
        # (SURVEY A.8.4-5); our decoder must fail cleanly.
        rng = np.random.default_rng(7)
        img = (rng.integers(0, 6, (20, 16, 1)) * 40 + rng.integers(0, 5, (20, 16, 3))).astype(np.uint8)
        data = oracle.encode_native(img)
        for _ in range(60):
            buf = bytearray(data)
            for _ in range(int(rng.integers(1, 6))):
                buf[int(rng.integers(13, len(buf)))] ^= int(rng.integers(1, 256))
            try:
                oracle.decode_native(bytes(buf))  # garbage output is fine
            except ValueError:
                pass  # clean error is fine

    def test_truncation_never_crashes(self):
        rng = np.random.default_rng(8)
        img = rng.integers(0, 256, (10, 8, 3), dtype=np.uint8)
        data = oracle.encode_native(img)
        for cut in (0, 5, 13, 14, 100, len(data) // 2, len(data) - 3):
            try:
                oracle.decode_native(data[:cut])
            except ValueError:
                pass
