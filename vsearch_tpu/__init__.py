"""vsearch_tpu: TPU-native amplicon search/clustering engine.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
vsearch (torognes/vsearch, reference mounted read-only) designed TPU-first:
batched k-mer candidate scoring over an HBM-resident encoded database,
anti-diagonal wavefront Needleman-Wunsch alignment, host replay of the
accept/reject cascade for byte-exact output parity.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: TPU compiles of the scan-heavy NW and
# scoring kernels cost tens of seconds per geometry per process; caching
# the serialized executables on disk amortizes them across CLI invocations
# (the reference binary has no compile step to pay at all, so this is a
# competitiveness requirement, not an optimization).
#
# jax is NOT imported here: host-only commands (derep, filter, sort,
# stats, format conversion...) never touch a device, and the ~0.7 s jax
# import would dominate their runtime.  Device users call
# configure_jax() before their first jax import instead.
_JAX_CONFIGURED = False


def configure_jax() -> None:
    global _JAX_CONFIGURED
    if _JAX_CONFIGURED:
        return
    _JAX_CONFIGURED = True
    if _os.environ.get("VSEARCH_TPU_NO_COMPILE_CACHE") is None:
        try:
            import jax as _jax
            _jax.config.update(
                "jax_compilation_cache_dir",
                _os.environ.get("VSEARCH_TPU_COMPILE_CACHE",
                                _os.path.expanduser(
                                    "~/.cache/vsearch_tpu_xla")))
            _jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass
