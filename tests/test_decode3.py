"""Tests for the v3 TPU decoder (Pallas chunked walk + slot-space assembly).

On the CPU test platform the walk runs as the jnp reference (`walk_ref`);
the Pallas kernel itself is exercised on the real chip by bench.py and
cross-tested against walk_ref there (see scratch/bench history).  These
tests pin the full pipeline byte-exact against the executable spec codec.
"""

import numpy as np
import pytest

from nicetpu.format import constants as C
from nicetpu.kernels import decode3
from nicetpu.spec import codec


def mkimg(h, w, seed=0, runs=True):
    rng = np.random.default_rng(seed)
    if runs:
        img = (
            rng.integers(0, 5, (h, w, 1)) * 50 + rng.integers(0, 4, (h, w, 3))
        ).astype(np.uint8)
        img[h // 3 : h // 2] = img[h // 3, 0]  # long run crossing rows
        return img
    return rng.integers(0, 256, (h, w, 3)).astype(np.uint8)


@pytest.mark.parametrize("seed,runs", [(0, True), (1, False), (2, True)])
def test_roundtrip_matches_spec(seed, runs):
    img = mkimg(48, 64, seed, runs)
    data = codec.encode(img)
    stats = {}
    out = decode3.decode_jax_v3(data, stats=stats)
    assert stats["fallbacks"] == 0, "device path must not silently fall back"
    assert np.array_equal(out, img)


def test_batch_decode():
    imgs = [mkimg(32, 128, s) for s in range(3)]
    datas = [codec.encode(im) for im in imgs]
    stats = {}
    outs = decode3.decode_batch_jax_v3(datas, stats=stats)
    assert stats["fallbacks"] == 0
    for out, im in zip(outs, imgs):
        assert np.array_equal(out, im)


def test_multichunk_stream():
    # payload >> chunk_bits so several chunks walk speculatively
    img = mkimg(96, 256, 3, runs=False)
    data = codec.encode(img)
    stats = {}
    out = decode3.decode_jax_v3(data, stats=stats, chunk_bits=4096)
    assert stats["fallbacks"] == 0
    assert np.array_equal(out, img)


def test_small_chunks_correct_even_if_fallback():
    # 512-bit chunks self-sync poorly on noise (measured ~26% per-chunk
    # failure); the gate must catch misses and the result stay exact.
    img = mkimg(48, 128, 4, runs=False)
    data = codec.encode(img)
    out = decode3.decode_jax_v3(data, chunk_bits=512)
    assert np.array_equal(out, img)


def test_all_modes_exercised():
    # gradient + noise + flat patches hits every mode incl. LUMA refs
    h, w = 40, 64
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([xx * 3 % 256, (xx + yy) % 256, yy * 5 % 256], axis=-1).astype(
        np.uint8
    )
    img[10:20, 10:20] = 77
    rng = np.random.default_rng(7)
    img[25:] = rng.integers(0, 256, (h - 25, w, 3))
    data = codec.encode(img)
    out = decode3.decode_jax_v3(data)
    assert np.array_equal(out, img)


def test_long_run_digits():
    img = np.full((64, 128, 3), 9, np.uint8)  # one giant run, multi-digit
    img[0, 0] = [1, 2, 3]
    data = codec.encode(img)
    stats = {}
    out = decode3.decode_jax_v3(data, stats=stats)
    assert stats["fallbacks"] == 0
    assert np.array_equal(out, img)


def test_corrupt_stream_falls_back_or_raises():
    img = mkimg(32, 64, 5)
    data = bytearray(codec.encode(img))
    # flip payload bits mid-stream
    data[C.FILE_HEADER_BYTES + C.STREAM_HEADERS_BYTES + 40] ^= 0xFF
    try:
        out = decode3.decode_jax_v3(bytes(data))
        assert out.shape == img.shape  # defined-shape output, no crash
    except (ValueError, OverflowError):
        pass  # clean rejection also fine


def test_serial_recon_path():
    img = mkimg(16, 32, 6)
    data = codec.encode(img)
    out = decode3.decode_jax_v3(data, serial_recon=True)
    assert np.array_equal(out, img)
