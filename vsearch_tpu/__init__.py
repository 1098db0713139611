"""vsearch_tpu: TPU-native amplicon search/clustering engine.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
vsearch (torognes/vsearch, reference mounted read-only) designed TPU-first:
batched k-mer candidate scoring over an HBM-resident encoded database,
anti-diagonal wavefront Needleman-Wunsch alignment, host replay of the
accept/reject cascade for byte-exact output parity.
"""

__version__ = "0.1.0"
