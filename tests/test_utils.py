"""Config + profiling utilities."""

import json
import os

import numpy as np

from nicetpu.config import RuntimeConfig
from nicetpu.utils.profiling import StageTimer


class TestConfig:
    def test_env_and_overrides(self, monkeypatch):
        monkeypatch.setenv("NICETPU_BACKEND", "native")
        monkeypatch.setenv("NICETPU_BATCH_SIZE", "8")
        monkeypatch.setenv("NICETPU_VERBOSE", "true")
        cfg = RuntimeConfig.from_env(workers=2)
        assert cfg.backend == "native"
        assert cfg.batch_size == 8
        assert cfg.verbose is True
        assert cfg.workers == 2

    def test_unknown_field_rejected(self):
        import pytest

        with pytest.raises(ValueError):
            RuntimeConfig.from_env(bogus=1)


class TestStageTimer:
    def test_summary(self):
        t = StageTimer()
        with t.stage("a"):
            x = np.arange(1000).sum()
        with t.stage("b"):
            pass
        s = json.loads(t.summary(nbytes=10_000_000))
        assert "a" in s and "b" in s and "total_ms" in s and "MB/s" in s
