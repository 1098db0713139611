"""Multi-chip sharding for the search pipeline.

The reference is single-node shared-memory (SURVEY.md §2.3); the TPU-native
scale-out splits the database k-mer incidence and the candidate alignment
batch across a `jax.sharding.Mesh`:

* the packed-bit incidence matrix is sharded along the sequence axis
  ("db" axis): each device counts shared k-mers against its DB shard,
  takes a local top-K, and the per-shard candidates are all-gathered for
  the host-side exact merge (collective analogue of the per-thread heaps),
* candidate pair alignment is data-parallel over pairs ("db" axis again —
  pairs are sharded by batch row).

The shapes here are exercised by `__graft_entry__.dryrun_multichip` on a
virtual CPU mesh and by the bench on real chips.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

from vsearch_tpu import configure_jax as _cfg
_cfg()
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_ACTIVE_MESH = None


def active_mesh() -> Optional[Mesh]:
    """The process-wide 1-D device mesh over every visible device, or None
    on a single-device (or force-disabled) runtime.

    The production pipeline consults this: with >1 device the DB k-mer
    incidence shards across the "db" axis and alignment pair batches run
    data-parallel over it.  VSEARCH_TPU_DEVICES=1 forces the single-device
    path (used by the multichip parity tests as the oracle)."""
    global _ACTIVE_MESH
    if _ACTIVE_MESH is None:
        import os
        limit = int(os.environ.get("VSEARCH_TPU_DEVICES", "0"))
        devices = jax.devices()
        if limit:
            devices = devices[:limit]
        if len(devices) > 1:
            _ACTIVE_MESH = Mesh(np.array(devices), axis_names=("db",))
        else:
            _ACTIVE_MESH = False
    return _ACTIVE_MESH or None


def make_mesh(n_devices: int) -> Mesh:
    devices = jax.devices()
    if len(devices) < n_devices:
        raise RuntimeError(
            "need %d devices but only %d available; for a virtual CPU mesh "
            "set JAX_PLATFORMS=cpu and "
            "XLA_FLAGS=--xla_force_host_platform_device_count=%d before "
            "jax initializes" % (n_devices, len(devices), n_devices))
    return Mesh(np.array(devices[:n_devices]), axis_names=("db",))


def sharded_count_topk(mesh: Mesh, hashsize: int, words_per_shard: int,
                       k: int):
    """Build the sharded count+local-topk step.

    Inputs: A (Q, hashsize) int8 replicated; bits (hashsize, S*words) uint32
    sharded along the word axis.  Returns per-shard top-k counts and local
    column indices, all-gathered to every device: (Q, S*k) each.
    """
    chunk = 256
    nchunks = hashsize // chunk
    cols = words_per_shard * 32

    def local_step(A, bits_shard):
        q = A.shape[0]
        shifts = jnp.arange(32, dtype=jnp.uint32)

        def body(acc, c):
            base = c * chunk
            a_c = jax.lax.dynamic_slice(A, (0, base), (q, chunk))
            b_c = jax.lax.dynamic_slice(bits_shard, (base, 0),
                                        (chunk, words_per_shard))
            unpacked = ((b_c[:, :, None] >> shifts[None, None, :]) & 1)
            unpacked = unpacked.astype(jnp.int8).reshape(chunk, cols)
            return acc + jax.lax.dot(
                a_c, unpacked, preferred_element_type=jnp.int32), None

        acc = jnp.zeros((q, cols), dtype=jnp.int32)
        # the carry becomes varying over the 'db' axis inside the body
        acc = jax.lax.pvary(acc, ("db",))
        acc, _ = jax.lax.scan(body, acc, jnp.arange(nchunks))
        top_counts, top_idx = jax.lax.top_k(acc, k)
        # local column index -> global column index
        shard_id = jax.lax.axis_index("db")
        top_idx = top_idx + shard_id * cols
        # gather every shard's candidates to all devices
        all_counts = jax.lax.all_gather(top_counts, "db", axis=1, tiled=True)
        all_idx = jax.lax.all_gather(top_idx, "db", axis=1, tiled=True)
        return all_counts, all_idx

    return jax.jit(
        jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(P(), P(None, "db")),
            out_specs=(P(), P()),
            check_vma=False,
        ))


def sharded_nw_scores(mesh: Mesh, scheme_key: tuple, M: int, N: int):
    """Pair-parallel forward NW scores over the mesh (no backtrack).

    Pairs are sharded along the batch axis; each device runs the wavefront
    scan on its slice.  Used by the multi-chip dry run / throughput bench.
    """
    from ..ops.nw_jax import _build_kernels

    kernel = _build_kernels(scheme_key, M, N)

    def local(q4, qlen, t4, tlen):
        score, overflow, ops = kernel(q4, qlen, t4, tlen)
        return score, overflow

    return jax.jit(
        jax.shard_map(
            local, mesh=mesh,
            in_specs=(P("db"), P("db"), P("db"), P("db")),
            out_specs=(P("db"), P("db")),
            # the wavefront kernel's scan carries are initialized unvarying;
            # disable vma checking rather than threading pvary through the
            # shared kernel
            check_vma=False,
        ))
