"""Multi-host encode of giant rasters (BASELINE config 5: 16K x 16K).

Bring-up: `jax.distributed.initialize` (DCN coordination), then a global
mesh over every process's devices.  The row-block sharded pipeline of
`dist/sharded.py` runs unchanged — XLA lowers the halo `ppermute` and the
histogram `psum` over ICI within a slice and DCN across hosts.

Ordered gather: every process holds only its shards' packed words; the final
bitstream needs them concatenated in global shard order at bit granularity.
We reshard (words, bits) to a replicated layout with one jitted identity
(XLA inserts the all_gather over ICI/DCN), read the now fully-addressable
arrays on process 0, and stitch them there (SURVEY §2.2 "ordered gather").

Tested with 2 local CPU processes in tests/test_multihost.py (SURVEY §4's
multi-host-simulation plan); on a real pod slice the same code runs over DCN.
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


def _fetch_replicated(x, mesh) -> np.ndarray:
    """Read a (possibly cross-process sharded) array on every process.

    Single-process arrays are fully addressable already; multi-process
    arrays are resharded to replicated first (one all_gather under jit).
    """
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    return np.asarray(jax.jit(lambda a: a, out_shardings=rep)(x))


def encode_multihost(img: np.ndarray, mesh=None) -> bytes | None:
    """Encode a raster across all hosts; returns bytes on process 0, None
    elsewhere.

    Every process passes the SAME full raster (or a loader provides it);
    jax.device_put with the mesh sharding places only the local row blocks
    on each process's devices.  Single-process this is exactly
    dist.sharded.encode_sharded.
    """
    from nicetpu.dist.sharded import encode_sharded, make_mesh

    mesh = mesh or make_mesh()
    if jax.process_count() == 1:
        return encode_sharded(img, mesh)
    data = encode_sharded(img, mesh, fetch=lambda x: _fetch_replicated(x, mesh))
    return data if jax.process_index() == 0 else None
