"""Capture a device trace of encode_fused and print the op-level time split
(dev aid for kernel optimization; requires tensorboard_plugin_profile)."""

from __future__ import annotations

import glob
import os
import sys

import numpy as np

from bench import make_image


def main() -> int:
    import jax

    from nicetpu.kernels.encode2 import encode_fused
    from nicetpu.pipeline import _w_cap, upload_batch

    H = W = 512
    N = H * W
    w_cap = _w_cap(N)
    B = 8
    batch = upload_batch([make_image(H, W, s) for s in range(B)])

    def disp():
        words_d, small_d = encode_fused(batch, width=W, ndigits_cap=3, w_cap=w_cap)
        np.asarray(small_d)
        return words_d

    print("compiling...", file=sys.stderr, flush=True)
    disp()
    print("tracing...", file=sys.stderr, flush=True)
    logdir = "/tmp/jxtrace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(3):
            disp()

    # parse the xplane into per-op durations
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    xspaces = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("xplanes:", xspaces, file=sys.stderr)
    data, _ = rtd.xspace_to_tool_data(xspaces, "framework_op_stats", {})
    out = "/tmp/op_stats.csv"
    with open(out, "w") as f:
        f.write(data if isinstance(data, str) else data.decode())
    print(f"wrote {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
