"""NW aligner unit tests: device wavefront vs exact scalar oracle.

The reference uses linmemalign as the trusted oracle for align_simd
(searchcore.cpp:806-832); here ops/nw.py's scalar DP is the oracle for the
batched JAX wavefront (ops/nw_jax.py), plus cross-checks of the
linear-memory fallback's scores.
"""

import random

import pytest

from vsearch_tpu.params import Parameters
from vsearch_tpu.ops.nw import ScoreScheme, align_pair_host
from vsearch_tpu.ops.nw_jax import BatchAligner
from vsearch_tpu.ops.linmem import linmem_align


def default_scheme():
    p = Parameters()
    p.apply_defaults_fixups()
    return ScoreScheme.from_params(p)


def mutate(rng, seq):
    t = bytearray(seq)
    for _ in range(rng.randint(0, 12)):
        if not t:
            break
        op = rng.random()
        pos = rng.randrange(len(t))
        if op < 0.5:
            t[pos] = ord(rng.choice("ACGT"))
        elif op < 0.75:
            del t[pos]
        else:
            t.insert(pos, ord(rng.choice("ACGT")))
    return bytes(t) or b"A"


def random_seq(rng, n, alphabet="ACGT"):
    return "".join(rng.choice(alphabet) for _ in range(n)).encode()


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_device_matches_oracle(seed):
    rng = random.Random(seed)
    scheme = default_scheme()
    ba = BatchAligner(scheme)
    pairs = []
    for _ in range(16):
        q = random_seq(rng, rng.randint(1, 120))
        t = mutate(rng, q) if rng.random() < 0.6 else \
            random_seq(rng, rng.randint(1, 120))
        pairs.append((q, t))
    dev = ba.align_pairs([q for q, _ in pairs], [t for _, t in pairs])
    for (q, t), rd in zip(pairs, dev):
        rh = align_pair_host(scheme, q, t)
        assert (rh.score, rh.cigar, rh.aligned, rh.matches, rh.mismatches,
                rh.gaps) == (rd.score, rd.cigar, rd.aligned, rd.matches,
                             rd.mismatches, rd.gaps), (q, t)


def test_ambiguous_codes():
    rng = random.Random(7)
    scheme = default_scheme()
    ba = BatchAligner(scheme)
    pairs = []
    for _ in range(8):
        q = random_seq(rng, rng.randint(5, 60), "ACGTNRYSWKM")
        t = random_seq(rng, rng.randint(5, 60), "ACGTNRYSWKM")
        pairs.append((q, t))
    dev = ba.align_pairs([q for q, _ in pairs], [t for _, t in pairs])
    for (q, t), rd in zip(pairs, dev):
        rh = align_pair_host(scheme, q, t)
        assert (rh.score, rh.cigar) == (rd.score, rd.cigar)


def test_linmem_score_agrees_with_dp():
    """The Hirschberg fallback's score must equal the full-DP optimum."""
    rng = random.Random(11)
    scheme = default_scheme()
    for _ in range(10):
        q = random_seq(rng, rng.randint(2, 80))
        t = mutate(rng, q)
        full = align_pair_host(scheme, q, t)
        lin = linmem_align(scheme, q, t)
        assert lin.score == full.score, (q, t, lin, full)


def test_empty_query_sentinel():
    scheme = default_scheme()
    res = align_pair_host(scheme, b"", b"ACGT")
    assert res.cigar == "4I"
    assert res.aligned == 4 and res.gaps == 4
