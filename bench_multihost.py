"""Multi-host overhead of the sharded encoder (BASELINE: >=80% at N>=2 hosts).

Runs the SAME total work (one raster, 8 total virtual CPU devices) under
jax.distributed with 1, 2 and 4 local processes, each process PINNED to an
equal slice of the physical cores (so total compute is constant and the
ratio isolates the cross-process collective overhead).  CAVEATS recorded
with the numbers: (a) this host has very few cores, so per-process slices
are tiny and gRPC service threads contend with compute; (b) local gRPC is
not ICI/DCN — real pod interconnect latency/bandwidth differs by orders of
magnitude.  What this CAN establish is that the collective layout (halo
ppermute, psum histogram, all_gather run fix, replicated-reshard ordered
gather) introduces no algorithmic serialization as process count grows;
true >=80%-scaling validation needs a real pod slice.

Usage: python bench_multihost.py            (launcher; prints JSON lines)
       python bench_multihost.py worker <coord> <n> <pid> <devs> <out>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

H, W = 1024, 512
REPS = 3


def make_image():
    import numpy as np

    rng = np.random.default_rng(5)
    base = (rng.integers(0, 6, (H, W, 1)) * 40).astype(np.int32)
    img = np.clip(base + rng.integers(0, 4, (H, W, 3)), 0, 255).astype("uint8")
    img[H // 3 : H // 3 + 50] = img[H // 3, 0]
    return img


def worker(coordinator: str, n_procs: int, pid: int, n_dev: int, out_file: str) -> int:
    ncpu = os.cpu_count() or 1
    if n_procs <= ncpu:  # pin to an equal core slice (constant total compute)
        per = ncpu // n_procs
        os.sched_setaffinity(0, set(range(pid * per, (pid + 1) * per)))
    os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_dev}"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from nicetpu.dist.multihost import encode_multihost, initialize_distributed
    from nicetpu.dist.sharded import make_mesh

    initialize_distributed(coordinator, n_procs, pid)
    img = make_image()
    mesh = make_mesh()
    data = encode_multihost(img, mesh)  # warmup/compile
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        data = encode_multihost(img, mesh)
        best = min(best, time.perf_counter() - t0)
    if pid == 0:
        with open(out_file, "w") as f:
            json.dump({"bytes": len(data), "secs": best}, f)
    return 0


def launch(n_procs: int) -> dict:
    n_dev = 8 // n_procs
    port = 19765 + n_procs
    outs = []
    procs = []
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("JAX_PLATFORMS", None)
    env["JAX_PLATFORMS"] = "cpu"
    for pid in range(n_procs):
        out = tempfile.mktemp(suffix=".json")
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, __file__, "worker", f"localhost:{port}",
                    str(n_procs), str(pid), str(n_dev), out,
                ],
                env=env,
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
        )
    for p in procs:
        if p.wait(timeout=900) != 0:
            raise RuntimeError(f"worker failed rc={p.returncode}")
    with open(outs[0]) as f:
        return json.load(f)


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        return worker(
            sys.argv[2], int(sys.argv[3]), int(sys.argv[4]), int(sys.argv[5]),
            sys.argv[6],
        )
    mb = H * W * 3 / 1e6
    base = None
    for n in (1, 2, 4):
        r = launch(n)
        mbs = mb / r["secs"]
        if base is None:
            base = mbs
        eff = mbs / base
        print(
            json.dumps(
                {
                    "processes": n,
                    "devices_per_proc": 8 // n,
                    "mb_s": round(mbs, 2),
                    "efficiency_vs_1proc": round(eff, 3),
                    "bytes": r["bytes"],
                    "note": (
                        "same total work, 8 virtual CPU devices, core-pinned, "
                        f"local gRPC (not DCN); host has {os.cpu_count()} cores"
                        + (" (oversubscribed)" if n > (os.cpu_count() or 1) else "")
                    ),
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
