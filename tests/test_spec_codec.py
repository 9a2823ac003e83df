"""Round-trip tests of the numpy spec codec (golden-oracle layer, SURVEY §4)."""

import numpy as np
import pytest

from nicetpu.spec import codec


def roundtrip(img: np.ndarray) -> bytes:
    data = codec.encode(img)
    out = codec.decode(data)
    np.testing.assert_array_equal(out, img)
    return data


class TestRoundTrip:
    def test_random(self):
        rng = np.random.default_rng(0)
        roundtrip(rng.integers(0, 256, (16, 8, 3), dtype=np.uint8))

    def test_constant_full_run(self):
        roundtrip(np.full((10, 7, 3), 200, dtype=np.uint8))

    def test_gradient(self):
        x = np.arange(32)[None, :, None] + np.arange(24)[:, None, None] * 2
        img = np.broadcast_to((x % 256).astype(np.uint8), (24, 32, 3)).copy()
        data = roundtrip(img)
        assert len(data) < img.nbytes  # gradients must compress

    def test_single_row(self):
        rng = np.random.default_rng(1)
        roundtrip(rng.integers(0, 256, (1, 5, 3), dtype=np.uint8))

    def test_image_ending_in_run(self):
        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, (4, 8, 3), dtype=np.uint8)
        img[2:] = img[1, -1]
        roundtrip(img)

    def test_run_crossing_rows(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
        img[2, 3:] = img[2, 2]
        img[3, :2] = img[2, 2]
        roundtrip(img)

    def test_min_width_enforced(self):
        with pytest.raises(ValueError):
            codec.encode(np.zeros((4, 3, 3), dtype=np.uint8))

    def test_fuzz(self):
        rng = np.random.default_rng(4)
        for t in range(24):
            h = int(rng.integers(1, 10))
            w = int(rng.integers(4, 12))
            style = t % 4
            if style == 0:
                img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            elif style == 1:
                img = (rng.integers(0, 3, (h, w, 3)) * 100).astype(np.uint8)
            elif style == 2:
                img = (
                    rng.integers(0, 8, (h, w, 1)) * 30 + rng.integers(0, 4, (h, w, 3))
                ).astype(np.uint8)
            else:
                img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                img[h // 2 :] = img[max(h // 2 - 1, 0), 0]
            roundtrip(img)


class TestFormatDetails:
    def test_header_layout(self):
        img = np.full((5, 6, 3), 9, dtype=np.uint8)
        data = codec.encode(img)
        assert data[:4] == b"nice"
        assert int.from_bytes(data[4:8], "big") == 6  # width
        assert int.from_bytes(data[8:12], "big") == 5  # height
        assert data[12] == 3  # channels

    def test_tail_padding(self):
        # Tail is [B, B, 0, 0, 0] (SURVEY A.1).
        rng = np.random.default_rng(5)
        data = codec.encode(rng.integers(0, 256, (6, 6, 3), dtype=np.uint8))
        assert data[-5] == data[-4]
        assert data[-3:] == b"\0\0\0"

    def test_tokenize_counts_match_histogram(self):
        rng = np.random.default_rng(6)
        img = rng.integers(0, 256, (12, 9, 3), dtype=np.uint8)
        plan = codec.tokenize(img)
        counts = codec.histogram(plan)
        assert counts.sum() == plan.valid.sum()
        # one prefix per encoded pixel + run digits also land in stream 1
        from nicetpu.format import constants as C

        n_prefix = counts[C.STREAM_BASE[C.SC_PREFIXES] : C.STREAM_BASE[C.SC_PREFIXES] + 13].sum()
        assert n_prefix >= plan.valid[:, 0].sum()
