"""On-device Huffman builder (kernels/huffman_dev.py) vs the host builder.

Byte-identity of the fused single-dispatch encode path rests on the device
table builder reproducing format.huffman exactly — merge order, tie-breaks,
the 31-bit clamp limiter, and canonical code assignment (SURVEY §2.3.1-2).
Runs on the CPU backend (pure jnp, no Pallas).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from nicetpu.format import constants as C
from nicetpu.format.huffman import build_all_tables
from nicetpu.kernels.huffman_dev import build_tables_device


def _check(counts_batch: np.ndarray) -> None:
    dl, dc, ovf = build_tables_device(jnp.asarray(counts_batch.astype(np.int32)))
    dl, dc, ovf = np.asarray(dl), np.asarray(dc), np.asarray(ovf)
    assert not ovf.any()
    for b in range(counts_batch.shape[0]):
        ref_l, ref_c, _ = build_all_tables(counts_batch[b])
        np.testing.assert_array_equal(dl[b], ref_l)
        np.testing.assert_array_equal(dc[b], ref_c)


class TestDeviceTables:
    def test_random_histograms(self):
        rng = np.random.default_rng(0)
        batch = np.stack(
            [rng.integers(0, 5000, C.TOTAL_SYMBOLS) for _ in range(3)]
        )
        _check(batch)

    def test_sparse_and_zero_heavy(self):
        rng = np.random.default_rng(1)
        rows = []
        for _ in range(3):
            counts = np.zeros(C.TOTAL_SYMBOLS, np.int64)
            counts[rng.integers(0, C.TOTAL_SYMBOLS, 25)] = rng.integers(
                1, 10**6, 25
            )
            rows.append(counts)
        _check(np.stack(rows))

    def test_clamp_limiter_path(self):
        # Fibonacci counts + zeros: raw merge exceeds 31 bits, the device
        # must take the same clamp+re-merge as the host.
        rng = np.random.default_rng(2)
        fib = [1, 1]
        while len(fib) < 40:
            fib.append(fib[-1] + fib[-2])
        rows = []
        for _ in range(2):
            counts = np.zeros(C.TOTAL_SYMBOLS, np.int64)
            counts[rng.permutation(C.TOTAL_SYMBOLS)[:40]] = fib
            rows.append(counts)
        _check(np.stack(rows))

    def test_real_image_histogram(self):
        from nicetpu.spec import codec as spec

        rng = np.random.default_rng(3)
        yy, xx = np.mgrid[0:48, 0:64]
        img = np.clip(
            128
            + 50 * np.sin(xx / 9.0)[..., None]
            + rng.integers(-4, 5, (48, 64, 3)),
            0,
            255,
        ).astype(np.uint8)
        counts = spec.histogram(spec.tokenize(img))
        _check(counts[None])
