"""Interpret-mode parity tests for every Pallas kernel (VERDICT r3 next #3).

On the CPU test platform `_use_pallas()` is False, so the production paths
exercise the jnp twins; these tests run the actual Pallas kernel bodies via
`pallas_call(interpret=True)` and assert exact equality against those twins
— a kernel-logic regression now fails pytest instead of only surfacing on
the chip.  (Interpret mode validates kernel semantics, not Mosaic lowering;
the on-chip bench still covers the latter.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nicetpu.format import constants as C
from nicetpu.kernels import decode3 as d3
from nicetpu.kernels.pallas_ops import (
    BINS_PAD,
    fold_records_pallas,
    histogram_pallas,
    table_join_pallas,
    value_join_pallas,
)


def _rand_bins(B, M, seed=0):
    rng = np.random.default_rng(seed)
    bins = rng.integers(0, C.TOTAL_SYMBOLS, (B, M)).astype(np.int32)
    holes = rng.random((B, M)) < 0.3
    bins[holes] = BINS_PAD - 1
    return jnp.asarray(bins)


def _hist_ref(bins):
    def hist1(b):
        live = b < C.TOTAL_SYMBOLS
        return (
            jnp.zeros(C.TOTAL_SYMBOLS, dtype=jnp.int32)
            .at[jnp.where(live, b, 0)]
            .add(live.astype(jnp.int32), mode="drop")
        )

    return jax.vmap(hist1)(bins)


def test_histogram_interpret_parity():
    bins = _rand_bins(2, 5000)
    got = histogram_pallas(bins, interpret=True)
    want = _hist_ref(bins)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_table_join_interpret_parity():
    rng = np.random.default_rng(1)
    B, M = 2, 4096
    bins = _rand_bins(B, M, seed=2)
    aob_tbl = jnp.asarray(rng.integers(1, 32, (B, C.TOTAL_SYMBOLS)).astype(np.int32))
    code_tbl = jnp.asarray(
        rng.integers(0, 2**32, (B, C.TOTAL_SYMBOLS), dtype=np.uint64).astype(np.uint32)
    )
    aob, code = table_join_pallas(bins, aob_tbl, code_tbl, interpret=True)

    def join1(b, at, ct):
        live = b < C.TOTAL_SYMBOLS
        bi = jnp.clip(b, 0, C.TOTAL_SYMBOLS - 1)
        return jnp.where(live, at[bi], 0), jnp.where(live, ct[bi], jnp.uint32(0))

    aob_w, code_w = jax.vmap(join1)(bins, aob_tbl, code_tbl)
    np.testing.assert_array_equal(np.asarray(aob), np.asarray(aob_w))
    np.testing.assert_array_equal(np.asarray(code), np.asarray(code_w))


def test_value_join_interpret_parity():
    rng = np.random.default_rng(3)
    B, M = 2, 3000
    bins = _rand_bins(B, M, seed=4)
    val_tbl = jnp.asarray(rng.integers(0, 2**16, (B, C.TOTAL_SYMBOLS)).astype(np.int32))
    got = value_join_pallas(bins, val_tbl, interpret=True)

    def one(b, t):
        live = b < C.TOTAL_SYMBOLS
        return jnp.where(live, t[jnp.clip(b, 0, C.TOTAL_SYMBOLS - 1)], 0)

    want = jax.vmap(one)(bins, val_tbl)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fold_records_interpret_parity():
    from nicetpu.kernels.encode2 import _fold_pixel_records

    rng = np.random.default_rng(5)
    B, M, S = 2, 64, 16  # M groups of S slots
    capw = 10
    aob = rng.integers(0, 32, (B, M, S)).astype(np.int32)
    aob[rng.random((B, M, S)) < 0.4] = 0  # holes
    code = (rng.integers(0, 2**31, (B, M, S)) & ((1 << np.maximum(aob, 1)) - 1)).astype(
        np.int64
    )
    aob_j = jnp.asarray(aob)
    code_j = jnp.asarray(code.astype(np.uint32).view(np.int32))
    rec, k = fold_records_pallas(aob_j, code_j, capw=capw, interpret=True)

    # twin: the jnp per-group fold
    recw, cumw = jax.vmap(
        lambda a, c: (lambda r, k2: (jnp.stack(r, 0), k2))(
            *_fold_pixel_records(a, jax.lax.bitcast_convert_type(c, jnp.uint32), capw)
        )
    )(aob_j, code_j)
    Mp = k.shape[1]
    np.testing.assert_array_equal(np.asarray(k)[:, :M], np.asarray(cumw))
    assert (np.asarray(k)[:, M:] == 0).all()
    np.testing.assert_array_equal(
        np.asarray(rec)[:, :, :M].astype(np.uint32),
        np.asarray(recw).astype(np.uint32),
    )


def test_walk_layout_scans_match_flat():
    """_cumsum_walk/_cummax_walk == flat serial-order scans (ADVICE r4
    medium #2: the CPU path uses flat axis-1 scans, so only this test
    executes the in-layout hierarchical scans off-chip)."""
    rng = np.random.default_rng(8)
    for shape in [(2, 1, 2, 3, 8, 128), (1, 2, 2, 2, 32, 128)]:
        x = jnp.asarray(rng.integers(-5, 10, shape).astype(np.int32))
        flat = d3.flatten_records(x)
        np.testing.assert_array_equal(
            np.asarray(d3.flatten_records(d3._cumsum_walk(x))),
            np.asarray(jnp.cumsum(flat, axis=1)),
        )
        np.testing.assert_array_equal(
            np.asarray(d3.flatten_records(d3._cummax_walk(x))),
            np.asarray(jax.lax.cummax(flat, axis=1)),
        )


@pytest.mark.slow
def test_recon_rows_interpret_parity():
    """The Pallas segment-LUT row reconstruction vs its jnp twin, exact
    (ADVICE r4 medium #1: this is the default TPU reconstruction path and
    runs AFTER the consistency gates — a defect here would be silent wrong
    pixels for pure-decode callers)."""
    from nicetpu.kernels import decode_dev, recon_pallas

    rng = np.random.default_rng(9)
    B, H, W = 2, 12, 256
    N = H * W
    offs = decode_dev._const_offsets(W)
    form = rng.integers(0, 5, (B, N)).astype(np.int32)
    delta = rng.integers(0, 256, (B, 3, N)).astype(np.int32)
    refoff = np.asarray([0] + offs, np.int32)[
        rng.integers(0, len(offs) + 1, (B, N))
    ]
    segs = decode_dev._pick_segs(W)
    want = jax.vmap(
        lambda f, d, r: decode_dev.reconstruct_rows(f, d, r, N, W, segs)
    )(jnp.asarray(form), jnp.asarray(delta), jnp.asarray(refoff))
    got = recon_pallas.reconstruct_rows_pallas(
        jnp.asarray(form), jnp.asarray(delta), jnp.asarray(refoff),
        n_pixels=N, width=W, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.slow
def test_walk_kernel_interpret_parity():
    """The Pallas speculative walk vs its jnp oracle (walk_ref), exact."""
    from nicetpu.hostref import oracle

    rng = np.random.default_rng(6)
    img = (rng.integers(0, 18, (48, 64, 3)) * 7).astype(np.uint8)
    img[20:30] = img[20, 0]  # some runs
    data = oracle.encode_native(img)

    from nicetpu.format import headers

    payload = data[C.FILE_HEADER_BYTES + C.STREAM_HEADERS_BYTES : len(data) - 4]
    flat_lengths = headers.parse_stream_headers(data[C.FILE_HEADER_BYTES :])
    af, present, ib, pfx16, sym_tbl, stream_max = d3.prepare_tables_v3(flat_lengths)
    maxl = d3.pick_maxl_streams(stream_max)

    chunk_bits = 512
    rows = 8
    nch_pad = rows * 128  # one kernel block
    wpc = chunk_bits // 32
    Wn = nch_pad * wpc + d3._wrows(chunk_bits)
    words = np.zeros((1, Wn), np.uint32)
    src = np.frombuffer(payload + b"\0" * ((-len(payload)) % 4), dtype=">u4")
    assert src.shape[0] <= Wn, "test payload exceeds the single-block capacity"
    words[0, : src.shape[0]] = src
    wbits = np.array([len(payload) * 8], np.int32)

    steps = d3._steps(chunk_bits, 8)
    words_j = jnp.asarray(words.view(np.int32))
    wbits_j = jnp.asarray(wbits)
    pfx_j = jnp.asarray(pfx16[None])
    aff_j, dD_j, inc_j = d3.derive_walk_tables(
        jnp.asarray(af.view(np.int32)[None]),
        jnp.asarray(present.astype(np.int32)[None]),
        jnp.asarray(ib.astype(np.int32)[None]),
    )
    entries = jnp.arange(nch_pad, dtype=jnp.int32)[None, :] * chunk_bits

    blk = d3.make_word_blocks(words_j, nch_pad, chunk_bits, rows)
    pos_p, sym_p, i12_p, i34_p, ex_p = d3.walk_pallas(
        blk, d3.chunk_layout(entries, 1, rows), aff_j, dD_j, inc_j, pfx_j,
        wbits_j, chunk_bits=chunk_bits, steps=steps, maxl=maxl, rows=rows,
        interpret=True,
    )
    pos_r, sym_r, i12_r, i34_r, ex_r = d3.walk_ref(
        words_j[0], entries[0], aff_j[0], dD_j[0], inc_j[0], pfx_j[0, 0],
        wbits_j[0], chunk_bits=chunk_bits, steps=steps, maxl=maxl,
    )
    np.testing.assert_array_equal(
        np.asarray(d3.chunk_unlayout(ex_p))[0], np.asarray(ex_r)
    )
    flat = lambda r: np.asarray(d3.flatten_records(r))[0]
    np.testing.assert_array_equal(flat(pos_p), np.asarray(pos_r).reshape(-1))
    np.testing.assert_array_equal(flat(sym_p), np.asarray(sym_r).reshape(-1))
    np.testing.assert_array_equal(flat(i12_p), np.asarray(i12_r).reshape(-1))
    np.testing.assert_array_equal(flat(i34_p), np.asarray(i34_r).reshape(-1))
