"""Fused single-dispatch round-trip (decode3.roundtrip_verify_fused) and its
on-device decode-table builder (prepare_tables_v3_jnp).

The table builder must match the numpy batch builder bit-for-bit (it feeds
the same walk kernel), and the fused round trip must verify real images on
the CPU backend end-to-end, producing payloads the from-spec codec decodes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from nicetpu.format import huffman
from nicetpu.kernels import decode3


def _random_lengths(rng, B):
    lens = []
    for _ in range(B):
        counts = rng.integers(0, 50, 858).astype(np.int64)
        fl, _, _ = huffman.build_all_tables(counts)
        lens.append(fl)
    return np.stack(lens).astype(np.int32)


def test_tables_jnp_matches_numpy():
    rng = np.random.default_rng(7)
    lens_b = _random_lengths(rng, 3)
    af_r, pr_r, ib_r, pfx_r, sym_r, smax_r = decode3.prepare_tables_v3_batch(lens_b)
    af_d, pr_d, ib_d, pfx_d, sym_d, smax_d, ok = decode3.prepare_tables_v3_jnp(
        jnp.asarray(lens_b)
    )
    assert np.array_equal(np.asarray(af_d), af_r)
    assert np.array_equal(np.asarray(pr_d), pr_r)
    assert np.array_equal(np.asarray(ib_d), ib_r)
    assert np.array_equal(np.asarray(pfx_d), pfx_r)
    assert np.array_equal(np.asarray(sym_d), sym_r)
    assert np.array_equal(np.asarray(smax_d), smax_r.astype(np.int32))
    assert np.asarray(ok).all()


def test_tables_jnp_flags_corrupt():
    rng = np.random.default_rng(11)
    lens_b = _random_lengths(rng, 2)
    lens_b[1, 5] += 1  # breaks the Kraft sum of stream 0
    *_, ok = decode3.prepare_tables_v3_jnp(jnp.asarray(lens_b))
    ok = np.asarray(ok)
    assert bool(ok[0]) and not bool(ok[1])
    lens_b2 = _random_lengths(rng, 1)
    lens_b2[0, 0] = 0  # out-of-range length
    *_, ok2 = decode3.prepare_tables_v3_jnp(jnp.asarray(lens_b2))
    assert not bool(np.asarray(ok2)[0])


def _images(rng, B, H, W):
    yy, xx = np.mgrid[0:H, 0:W]
    out = []
    for b in range(B):
        base = (120 + 40 * np.sin(xx / 9.0 + b) + 30 * np.cos(yy / 5.0)).astype(
            np.int32
        )
        img = np.stack([base, base + 7, base - 9], axis=-1)
        img = np.clip(img + rng.integers(-2, 3, img.shape), 0, 255)
        out.append(img.astype(np.uint8))
    return out


def test_roundtrip_verify_fused_end_to_end():
    from nicetpu import pipeline
    from nicetpu.spec import codec

    rng = np.random.default_rng(3)
    H, W, B = 16, 128, 2
    imgs = _images(rng, B, H, W)
    flat = jnp.asarray(np.stack([im.reshape(H * W, 3) for im in imgs]))
    stats: dict = {}
    words, small, verified = decode3.roundtrip_verify_fused(
        flat, width=W, stats=stats
    )
    assert verified.all(), stats
    assert stats["fallbacks"] == 0
    datas = pipeline._assemble_payloads(words, small, (H, W, 3), flat=flat)
    for d, im in zip(datas, imgs):
        assert np.array_equal(codec.decode(d), im)


def test_roundtrip_fused_cap_overflow_reports_unverified():
    """An image whose payload exceeds the optimistic cap must come back
    unverified (ovf flag), never wrongly verified."""
    from nicetpu import pipeline

    rng = np.random.default_rng(5)
    H, W = 16, 128
    noise = rng.integers(0, 256, (H, W, 3)).astype(np.uint8)  # ~25 bits/pixel
    flat = jnp.asarray(noise.reshape(1, H * W, 3))
    # w_cap tight enough that pure noise cannot fit
    w_cap = H * W * 8 // 32 + 64
    stats: dict = {}
    words, small, verified = decode3.roundtrip_verify_fused(
        flat, width=W, w_cap=w_cap, stats=stats
    )
    assert not verified.any()
    assert small[0, 859] == 1  # ovf flag set
    # the production wrapper still yields correct bytes via native fallback
    pipeline.pop_stats()
    datas, ver2 = pipeline.roundtrip_batch_resident(
        flat, (H, W, 3), imgs=[noise]
    )
    from nicetpu.spec import codec

    assert np.array_equal(codec.decode(datas[0]), noise)
    assert pipeline.pop_stats()["overflow_fallbacks"] >= 0
