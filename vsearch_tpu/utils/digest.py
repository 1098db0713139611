"""Sequence digests for --relabel_sha1/--relabel_md5.

reference: src/utils/sequence_digest.cpp — hash the normalized sequence
(upcase, U->T via chrmap_normalize, src/utils/string_normalize.cpp) and emit
lowercase hex.
"""

from __future__ import annotations

from .maps import CHRMAP_NORMALIZE

# bytes.translate runs the 256-entry map at C speed
_NORMALIZE_TABLE = bytes(CHRMAP_NORMALIZE.tolist())


def normalize(seq: bytes) -> bytes:
    """reference: src/utils/string_normalize.cpp (chrmap_normalize map)."""
    return seq.translate(_NORMALIZE_TABLE)


def normalized_digest(algo, seq: bytes) -> bytes:
    """Hex digest of the normalized sequence (lowercase ascii bytes)."""
    return algo(normalize(seq)).hexdigest().encode()
