"""Typed runtime configuration (SURVEY §5 — the reference has none).

Format constants stay frozen in `format/constants.py`; this config only
covers runtime choices: backend selection, batching, cache dirs.
Resolution order: explicit kwargs > environment (NICETPU_*) > defaults.
"""

from __future__ import annotations

import dataclasses
import os


@dataclasses.dataclass
class RuntimeConfig:
    backend: str = "auto"  # auto | jax | native | spec
    batch_size: int = 4  # images per TPU batch dispatch (pipeline)
    workers: int = 4  # pipeline thread-pool width
    compilation_cache: str = "/root/repo/.jax_cache"
    omp_threads: int = 0  # 0 = OpenMP default
    verbose: bool = False  # stage-timing prints (cli / pipeline)

    @classmethod
    def from_env(cls, **overrides) -> "RuntimeConfig":
        cfg = cls()
        for f in dataclasses.fields(cls):
            env = os.environ.get(f"NICETPU_{f.name.upper()}")
            if env is not None:
                val = type(f.default)(env) if not isinstance(f.default, bool) else env.lower() in ("1", "true", "yes")
                setattr(cfg, f.name, val)
        for k, v in overrides.items():
            if not hasattr(cfg, k):
                raise ValueError(f"unknown config field {k!r}")
            setattr(cfg, k, v)
        return cfg

    def apply(self) -> None:
        """Apply process-level settings (call before first jax use)."""
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", self.compilation_cache)
        if self.omp_threads:
            os.environ["OMP_NUM_THREADS"] = str(self.omp_threads)
