"""Multi-host runtime layer: jax.distributed over ICI/DCN.

The reference is single-node shared-memory; the TPU-native scale-out adds
a multi-controller SPMD layer (SURVEY.md §2.3 distributed row): every
process runs the IDENTICAL host-side program (the host replay of the
accept/reject walks is deterministic, so replicating it is free of
synchronization), while device state — the sharded k-mer incidence
matrix, the pair-sharded alignment batches — lives on the GLOBAL mesh
spanning all hosts' chips, with the collectives (all_gather candidate
merges, pair re-shards) riding ICI/DCN.  Only process 0 materializes
output files; the others direct theirs to the null device, keeping the
byte streams (and therefore the program trace) identical.

CPU-testable on localhost: N processes x M virtual CPU devices form an
N*M-device global mesh with Gloo collectives (tests/test_distributed.py
asserts an N-process run byte-matches the 1-process run).

Enable via env (read once, before any device use):
  VSEARCH_TPU_DIST_COORD   coordinator address, e.g. "10.0.0.1:9955"
  VSEARCH_TPU_DIST_NPROCS  number of processes
  VSEARCH_TPU_DIST_PROCID  this process's id (0..NPROCS-1)
"""

from __future__ import annotations

import os
from typing import Optional

_initialized = False
_is_distributed = False


def maybe_initialize() -> bool:
    """Initialize jax.distributed from env if configured (idempotent).

    Must run before the first JAX device query; cli.main calls it first
    thing.  Returns True when running multi-process."""
    global _initialized, _is_distributed
    if _initialized:
        return _is_distributed
    _initialized = True
    coord = os.environ.get("VSEARCH_TPU_DIST_COORD")
    if not coord:
        return False
    nprocs = int(os.environ.get("VSEARCH_TPU_DIST_NPROCS", "0"))
    procid = int(os.environ.get("VSEARCH_TPU_DIST_PROCID", "0"))
    import jax
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nprocs or None,
                               process_id=procid if nprocs else None)
    _is_distributed = True
    if (jax.process_index() != 0
            and os.environ.get("VSEARCH_TPU_DIST_VERBOSE", "0") != "1"):
        # replicated drivers narrate identically; only host 0 reports
        import sys
        sys.stderr = open(os.devnull, "w")
    return True


def process_index() -> int:
    if not _is_distributed:
        return 0
    import jax
    return jax.process_index()


def is_output_process() -> bool:
    """Only process 0 writes real output files / stderr reports; the
    other replicated drivers stream to the null device so their host
    state (byte counts, orderings) stays identical."""
    return process_index() == 0


def output_path(path: Optional[str]) -> Optional[str]:
    """Redirect non-primary processes' output paths to the null device."""
    if path is None or is_output_process():
        return path
    return os.devnull
