"""Multi-host encode of giant rasters (BASELINE config 5: 16K x 16K).

Bring-up: `jax.distributed.initialize` (DCN coordination), then a global
mesh over every process's devices.  The row-block sharded pipeline of
`dist/sharded.py` runs unchanged — XLA lowers the halo `ppermute` and the
histogram `psum` over ICI within a slice and DCN across hosts.

Ordered gather: every process holds its shards' packed words; the final
bitstream needs them concatenated in global shard order at bit granularity.
We all-gather the per-shard bit totals (tiny), compute exclusive offsets,
and `process_allgather` the payload words to host 0 which stitches them
(SURVEY §2.2 "ordered gather"; avoids any device-side reshuffling).

On a single process this degrades to exactly the single-host path, which is
how it is tested here; multi-host execution requires a real pod slice.
"""

from __future__ import annotations

import numpy as np

import jax


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """`jax.distributed.initialize` wrapper; no-op when single-process."""
    if num_processes in (None, 1):
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def encode_multihost(img_local_or_full: np.ndarray, mesh=None) -> bytes | None:
    """Encode a raster across all hosts; returns bytes on process 0, None
    elsewhere.

    Single-process: behaves exactly like dist.sharded.encode_sharded.
    Multi-process: each process passes the full raster (or a loader shards
    it); jax.device_put with the mesh sharding places only the local rows.
    """
    from nicetpu.dist.sharded import encode_sharded, make_mesh

    if jax.process_count() == 1:
        mesh = mesh or make_mesh()
        return encode_sharded(img_local_or_full, mesh)

    # Multi-host: same sharded pipeline over the global mesh; the final
    # stitch happens on process 0 via an allgather of (words, bits).
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nicetpu.dist.sharded import build_sharded_encode, stitch_payload
    from nicetpu.format import headers
    from nicetpu.kernels.encode import _build_tables

    img = img_local_or_full
    H, W, _ = img.shape
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    tok, pack = build_sharded_encode(mesh, H, W)
    dev_img = jax.device_put(img, NamedSharding(mesh, P("d", None, None)))
    streams, symbols, valid, counts = tok(dev_img)

    counts_np = np.asarray(counts).astype(np.int64)  # replicated => identical
    flat_lengths, flat_codes = _build_tables(counts_np)

    import jax.numpy as jnp

    rep = NamedSharding(mesh, P())
    aob = jax.device_put(jnp.asarray(flat_lengths.astype(np.int32)), rep)
    codes = jax.device_put(jnp.asarray(flat_codes), rep)
    words, bits = pack(streams, symbols, valid, aob, codes)

    # Host-0 ordered gather of the variable-length payloads.
    words_all = multihost_utils.process_allgather(words, tiled=True)
    bits_all = multihost_utils.process_allgather(bits, tiled=True)
    if jax.process_index() != 0:
        return None
    payload, total_bits = stitch_payload(np.asarray(words_all), np.asarray(bits_all), n_dev)
    n_bytes = total_bits // 8
    B = payload[n_bytes] if total_bits % 8 else 0
    return (
        headers.pack_file_header(W, H, 3)
        + headers.pack_stream_headers(flat_lengths)
        + payload[:n_bytes]
        + bytes([B, B, 0, 0, 0])
    )
