"""CLI mirroring the reference binary's extension dispatch (ref main.rs:17-139).

Usage: python -m nicetpu.cli <from> <to> [--backend auto|jax|native|spec]

`.png -> .nice` encodes; `.nice -> .png` decodes.  Timing for each stage is
printed like the reference's Instant prints (SURVEY §5 tracing).
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
        "--backend", default="auto", choices=["auto", "jax", "native", "spec"]
    )
    args = ap.parse_args(argv)

    from nicetpu import api

    src, dst = args.src, args.dst
    if src.endswith(".png"):
        if not dst.endswith(".nice"):
            dst += ".nice"
        t0 = time.perf_counter()
        img = api.imread(src)
        t1 = time.perf_counter()
        data = api.encode(img, backend=args.backend)
        t2 = time.perf_counter()
        with open(dst, "wb") as f:
            f.write(data)
        print(f"png read: {1e3 * (t1 - t0):.1f} ms")
        print(f"encode:   {1e3 * (t2 - t1):.1f} ms  ({len(data)} bytes, "
              f"ratio {len(data) / img[:, :, :3].nbytes:.3f})")
    elif src.endswith(".nice"):
        if not dst.endswith(".png"):
            dst += ".png"
        with open(src, "rb") as f:
            data = f.read()
        t0 = time.perf_counter()
        img = api.decode(data, backend=args.backend)
        t1 = time.perf_counter()
        api.imwrite(dst, img)
        t2 = time.perf_counter()
        print(f"decode:    {1e3 * (t1 - t0):.1f} ms")
        print(f"png write: {1e3 * (t2 - t1):.1f} ms")
    else:
        print("error: source must end in .png or .nice", file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
