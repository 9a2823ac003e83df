"""CLI mirroring the reference binary's extension dispatch (ref main.rs:17-139).

Usage: python -m nicetpu.cli <from> <to> [--backend auto|jax|native|spec]
       [--verbose]

`.png -> .nice` encodes; `.nice -> .png` decodes.  Timing for each stage is
printed like the reference's Instant prints (SURVEY §5 tracing); --verbose
adds the structured StageTimer JSON summary.  Defaults (backend, caches,
OMP threads) resolve through RuntimeConfig / NICETPU_* environment.
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="nicetpu", description=__doc__)
    ap.add_argument("src", help="input file (.png or .nice)")
    ap.add_argument("dst", help="output file (.nice or .png)")
    ap.add_argument(
        "--backend",
        default=None,
        choices=["auto", "jax", "native", "spec"],
        help="default: RuntimeConfig / NICETPU_BACKEND",
    )
    ap.add_argument(
        "--verbose", action="store_true", help="print the StageTimer JSON summary"
    )
    args = ap.parse_args(argv)

    from nicetpu.config import RuntimeConfig

    cfg = RuntimeConfig.from_env()
    if args.backend is not None:
        cfg.backend = args.backend
    if args.verbose:
        cfg.verbose = True
    cfg.apply()  # compilation cache / OMP threads before first jax use

    from nicetpu import api
    from nicetpu.utils.profiling import StageTimer

    timer = StageTimer()
    src, dst = args.src, args.dst
    if src.endswith(".png"):
        if not dst.endswith(".nice"):
            dst += ".nice"
        t0 = time.perf_counter()
        with timer.stage("png_read"):
            img = api.imread(src)
        t1 = time.perf_counter()
        with timer.stage("encode"):
            data = api.encode(img, config=cfg)
        t2 = time.perf_counter()
        with timer.stage("write"):
            with open(dst, "wb") as f:
                f.write(data)
        print(f"png read: {1e3 * (t1 - t0):.1f} ms")
        print(f"encode:   {1e3 * (t2 - t1):.1f} ms  ({len(data)} bytes, "
              f"ratio {len(data) / img[:, :, :3].nbytes:.3f})")
        nbytes = img.nbytes
    elif src.endswith(".nice"):
        if not dst.endswith(".png"):
            dst += ".png"
        with timer.stage("read"):
            with open(src, "rb") as f:
                data = f.read()
        t0 = time.perf_counter()
        with timer.stage("decode"):
            img = api.decode(data, config=cfg)
        t1 = time.perf_counter()
        with timer.stage("png_write"):
            api.imwrite(dst, img)
        t2 = time.perf_counter()
        print(f"decode:    {1e3 * (t1 - t0):.1f} ms")
        print(f"png write: {1e3 * (t2 - t1):.1f} ms")
        nbytes = img.nbytes
    else:
        print("error: source must end in .png or .nice", file=sys.stderr)
        return 2
    if cfg.verbose:
        print(timer.summary(nbytes))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
