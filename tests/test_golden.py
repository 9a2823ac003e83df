"""Frozen golden vectors: the wire format must never drift silently.

Fixtures were produced by the spec encoder and are decoded + re-encoded by
every backend.  If an encoder change alters bytes, these tests catch it —
any intentional format-affecting change must regenerate the fixtures and
say why.
"""

import os

import numpy as np
import pytest

from nicetpu.spec import codec

DATA = os.path.join(os.path.dirname(__file__), "data")
NAMES = ["random8x6", "gradient16x12", "flat9x7", "mixed20x14"]


@pytest.mark.parametrize("name", NAMES)
class TestGolden:
    def _load(self, name):
        img = np.load(os.path.join(DATA, f"{name}.npy"))
        with open(os.path.join(DATA, f"{name}.nice"), "rb") as f:
            return img, f.read()

    def test_spec_encode_frozen(self, name):
        img, data = self._load(name)
        assert codec.encode(img) == data

    def test_spec_decode_golden(self, name):
        img, data = self._load(name)
        np.testing.assert_array_equal(codec.decode(data), img)

    def test_native_both_ways(self, name):
        oracle = pytest.importorskip("nicetpu.hostref.oracle")
        try:
            oracle.get_lib()
        except Exception:
            pytest.skip("no toolchain")
        img, data = self._load(name)
        assert oracle.encode_native(img) == data
        np.testing.assert_array_equal(oracle.decode_native(data), img)

    def test_jax_encode_frozen(self, name):
        from nicetpu.kernels.encode2 import encode_jax_v2

        img, data = self._load(name)
        assert encode_jax_v2(img) == data
