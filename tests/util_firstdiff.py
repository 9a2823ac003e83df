"""First-divergence diff utilities (debug aid, used by tests).

Generalizes the reference's dump.bin golden mechanism (ref main.rs:47-52
writes the raw RGB bytes; ref code.rs:559-562 + code.rs:652-657 debug_asserts
every reconstructed byte and pinpoints the first divergence): given two
rasters or two `.nice` byte streams, report the FIRST diverging pixel/token
with enough decoded context to debug a kernel regression at pixel 3,194,881
without printf archaeology.

API:
  first_pixel_diff(a, b)        -> None | dict (pixel index, x/y, values,
                                   and, when a stream is given, the mode
                                   context that produced the pixel)
  first_token_diff(data_a, data_b) -> None | dict (token ordinal, stream,
                                   symbols, bit positions, owning pixel)
  token_trace(data, limit=None) -> list of (bit_pos, stream, symbol, pixel)
                                   in exact serial token order
"""

from __future__ import annotations

import numpy as np

from nicetpu.format import constants as C
from nicetpu.format import headers
from nicetpu.spec.codec import BitReader, StreamDecoder


def _decoders(data: bytes) -> list[StreamDecoder]:
    flat_lengths = headers.parse_stream_headers(data[C.FILE_HEADER_BYTES :])
    return [
        StreamDecoder(
            flat_lengths[C.STREAM_BASE[s] : C.STREAM_BASE[s] + C.ALPHABET_SIZES[s]]
        )
        for s in range(C.NUM_STREAMS)
    ]


def token_trace(data: bytes, limit: int | None = None):
    """Serial token trace of a `.nice` stream: [(bit_pos, stream, symbol,
    pixel)] in generation order (SURVEY A.5/A.6).  `pixel` is the raster
    index of the pixel whose group the token belongs to (run digits belong
    to the pixel that opened the run)."""
    W, H, channels = headers.parse_file_header(data)
    if channels != 3:
        raise ValueError("only channels=3 streams are traceable")
    N = W * H
    decoders = _decoders(data)
    br = BitReader(data[C.FILE_HEADER_BYTES + C.STREAM_HEADERS_BYTES :])
    trace: list[tuple[int, int, int, int]] = []

    def rd(s: int, pixel: int) -> int:
        p = br.pos
        sym = decoders[s].read(br)
        trace.append((p, s, sym, pixel))
        return sym

    pos = 0
    prefix = rd(C.SC_PREFIXES, 0)
    while True:
        if limit is not None and len(trace) >= limit:
            return trace
        if prefix == C.PREFIX_COLOR_LUMA2:
            rd(C.SC_LUMA_BASE_DIFF2, pos)
            rd(C.SC_LUMA_OTHER_DIFF2, pos)
            rd(C.SC_LUMA_OTHER_DIFFB2, pos)
        elif prefix == C.PREFIX_SMALL_DIFF:
            rd(C.SC_SMALL_DIFF, pos)
        elif prefix == C.PREFIX_COLOR_LUMA:
            rd(C.SC_LUMA_BACK_REF, pos)
            rd(C.SC_LUMA_BASE_DIFF, pos)
            rd(C.SC_LUMA_OTHER_DIFF, pos)
            rd(C.SC_LUMA_OTHER_DIFF, pos)
        elif prefix == C.PREFIX_BACK_REF:
            rd(C.SC_BACK_REF, pos)
        elif prefix == C.PREFIX_RGB:
            rd(C.SC_RGB, pos)
            rd(C.SC_RGB, pos)
            rd(C.SC_RGB, pos)
        else:
            raise ValueError(f"unknown prefix {prefix} at pixel {pos}")

        opened = pos
        pos += 1
        if pos >= N:
            return trace
        prefix = rd(C.SC_PREFIXES, pos)
        if prefix >= C.PREFIX_RUN_BASE:
            v = 0
            shift = 0
            while True:
                # retroactively attribute the digit to the run-opening pixel
                trace[-1] = trace[-1][:3] + (opened,)
                v += (prefix - C.PREFIX_RUN_BASE) << shift
                shift += 3
                remaining = N - pos
                if v + 1 >= remaining:
                    return trace
                if v + (1 << shift) + 1 > remaining:
                    prefix = rd(C.SC_PREFIXES, pos)
                    break
                prefix = rd(C.SC_PREFIXES, pos)
                if prefix < C.PREFIX_RUN_BASE:
                    break
            pos += min(v + 1, N - pos)
            if pos >= N:
                return trace
            # the prefix read above belongs to the next pixel
            trace[-1] = trace[-1][:3] + (pos,)


def first_token_diff(data_a: bytes, data_b: bytes) -> dict | None:
    """First diverging token between two `.nice` streams, or None.

    Compares file headers, stream headers (first differing stream's length
    vector), then the serial token sequences.  Token entries report
    (ordinal, owning pixel, stream, symbol, bit position) on each side."""
    ha, hb = headers.parse_file_header(data_a), headers.parse_file_header(data_b)
    if ha != hb:
        return {"kind": "file_header", "a": ha, "b": hb}
    la = headers.parse_stream_headers(data_a[C.FILE_HEADER_BYTES :])
    lb = headers.parse_stream_headers(data_b[C.FILE_HEADER_BYTES :])
    if not np.array_equal(la, lb):
        flat = int(np.nonzero(la != lb)[0][0])
        s = max(s for s in range(C.NUM_STREAMS) if C.STREAM_BASE[s] <= flat)
        return {
            "kind": "stream_header",
            "stream": s,
            "symbol": flat - C.STREAM_BASE[s],
            "len_a": int(la[flat]),
            "len_b": int(lb[flat]),
        }
    ta, tb = token_trace(data_a), token_trace(data_b)
    for i, (xa, xb) in enumerate(zip(ta, tb)):
        if xa[1:3] != xb[1:3]:
            return {
                "kind": "token",
                "ordinal": i,
                "pixel": xa[3],
                "a": {"bit": xa[0], "stream": xa[1], "symbol": xa[2]},
                "b": {"bit": xb[0], "stream": xb[1], "symbol": xb[2]},
            }
    if len(ta) != len(tb):
        i = min(len(ta), len(tb))
        longer = ta if len(ta) > len(tb) else tb
        return {
            "kind": "token_count",
            "tokens_a": len(ta),
            "tokens_b": len(tb),
            "first_extra": {
                "ordinal": i,
                "bit": longer[i][0],
                "stream": longer[i][1],
                "symbol": longer[i][2],
                "pixel": longer[i][3],
            },
        }
    return None


def first_pixel_diff(
    a: np.ndarray, b: np.ndarray, data: bytes | None = None
) -> dict | None:
    """First diverging pixel between two (H, W, 3) rasters, or None.

    When the `.nice` stream that should decode to these rasters is given,
    the report includes the mode context (prefix + payload symbols) of the
    group owning the diverging pixel — the dump.bin debugging experience
    without a debug build."""
    if a.shape != b.shape:
        return {"kind": "shape", "a": a.shape, "b": b.shape}
    diff = np.nonzero((a != b).any(axis=-1).reshape(-1))[0]
    if diff.size == 0:
        return None
    H, W = a.shape[:2]
    p = int(diff[0])
    out = {
        "kind": "pixel",
        "pixel": p,
        "x": p % W,
        "y": p // W,
        "a": [int(v) for v in a.reshape(-1, 3)[p]],
        "b": [int(v) for v in b.reshape(-1, 3)[p]],
        "n_diff_pixels": int(diff.size),
    }
    if data is not None:
        toks = [t for t in token_trace(data) if t[3] == p]
        if toks:
            out["context"] = [
                {"bit": t[0], "stream": t[1], "symbol": t[2]} for t in toks
            ]
        else:  # run-covered pixel: report the run opener's group
            opener = max(
                (t for t in token_trace(data) if t[3] < p),
                key=lambda t: t[3],
                default=None,
            )
            if opener is not None:
                out["context"] = [
                    {"bit": t[0], "stream": t[1], "symbol": t[2], "pixel": t[3]}
                    for t in token_trace(data)
                    if t[3] == opener[3]
                ]
    return out


def format_diff(d: dict | None) -> str:
    if d is None:
        return "identical"
    return " ".join(f"{k}={v}" for k, v in d.items())
