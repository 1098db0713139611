"""Sequence digests for --relabel_sha1/--relabel_md5.

reference: src/utils/sequence_digest.cpp — hash the normalized sequence
(upcase, U->T via chrmap_normalize, src/utils/string_normalize.cpp) and emit
lowercase hex.
"""

from __future__ import annotations

import numpy as np

from .maps import CHRMAP_NORMALIZE


def normalize(seq: bytes) -> bytes:
    """reference: src/utils/string_normalize.cpp (chrmap_normalize map)."""
    return CHRMAP_NORMALIZE[np.frombuffer(seq, dtype=np.uint8)].tobytes()


def normalized_digest(algo, seq: bytes) -> bytes:
    """Hex digest of the normalized sequence (lowercase ascii bytes)."""
    return algo(normalize(seq)).hexdigest().encode()
