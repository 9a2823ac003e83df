"""Device-fallback observability (VERDICT r3 next #5): a deliberately
injected kernel bug must surface as a failure, not as a silent native
fallback; transient runtime errors must fall back AND be counted."""

import numpy as np
import pytest

from nicetpu import api, pipeline


def _img(seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 50, (16, 16, 3)).astype(np.uint8)


def test_injected_bug_propagates(monkeypatch):
    """A non-transient exception in the fused encode core is a hard error."""

    def boom(*a, **k):
        raise AssertionError("injected kernel bug")

    monkeypatch.setattr(pipeline, "_encode_batch_core", boom)
    with pytest.raises(AssertionError, match="injected kernel bug"):
        pipeline.encode_batch_fused([_img()])
    # and through the hybrid scheduler, too (its TPU leg is the fused
    # round-trip dispatch)
    monkeypatch.setattr(pipeline, "roundtrip_batch_resident", boom)
    with pytest.raises(AssertionError, match="injected kernel bug"):
        pipeline.roundtrip_hybrid(
            [([_img()], object())], tpu_threads=1, cpu_threads=0
        )


def test_transient_error_falls_back_and_is_counted(monkeypatch):
    import jax

    calls = {"n": 0}

    def flaky(*a, **k):
        calls["n"] += 1
        raise jax.errors.JaxRuntimeError("tunnel hiccup")

    monkeypatch.setattr(pipeline, "_encode_batch_core", flaky)
    pipeline.pop_stats()
    img = _img(1)
    out = pipeline.encode_batch_fused([img])
    from nicetpu.hostref import oracle

    assert out[0] == oracle.encode_native(img)
    stats = pipeline.pop_stats()
    assert stats["tpu_fallbacks"] == 1
    assert stats["tpu_retries"] == 2  # default retry budget exhausted
    assert calls["n"] == 3


def test_api_encode_batch_stats_plumbing():
    imgs = [_img(2), _img(3)]
    stats: dict = {}
    datas = api.encode_batch(imgs, backend="native", stats=stats)
    assert stats["backend"] == "native"
    dstats: dict = {}
    decs = api.decode_batch(datas, backend="native", stats=dstats)
    assert dstats["backend"] == "native"
    for im, dec in zip(imgs, decs):
        assert np.array_equal(im, dec)


def test_api_decode_batch_jax_stats():
    """Explicit jax backend fills the v3 decoder's fallback counters."""
    imgs = [_img(4), _img(5)]
    datas = api.encode_batch(imgs, backend="native")
    stats: dict = {}
    decs = api.decode_batch(datas, backend="jax", stats=stats)
    assert stats["backend"] == "jax"
    assert stats["fallbacks"] == 0
    for im, dec in zip(imgs, decs):
        assert np.array_equal(im, dec)
