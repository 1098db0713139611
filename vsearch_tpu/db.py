"""In-memory sequence database.

Mirrors reference src/core/db.{cpp,hpp}: per-sequence header/sequence/quality
plus abundance, with min/max length filters at load and stable sorts by
length/abundance.  Sequences are kept both as Python ``bytes`` (for host-side
formatting and hashing) and lazily as padded numpy/JAX arrays for the device
kernels (see index.py / ops/).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from .params import Parameters
from .io import fastx
from .utils import maps


@dataclasses.dataclass
class DbEntry:
    header: bytes
    sequence: bytearray  # mutable: DUST masking rewrites case in place
    quality: Optional[bytes]
    abundance: int


class Database:
    """reference: src/core/db.hpp:69-214 (Database struct)."""

    def __init__(self) -> None:
        self.entries: List[DbEntry] = []
        self.fastq_format = False
        self._encoded_cache = None

    # -- loading ----------------------------------------------------------

    def read(self, filename: str, params: Parameters, upcase: bool = False,
             quiet: Optional[bool] = None) -> None:
        """reference: db.cpp Database::read (length filters, unoise minsize,
        "Reading file" progress + "nt in" summary narration, :230-400)."""
        from .utils.progress import Progress, message
        discarded_short = 0
        discarded_long = 0
        discarded_unoise = 0
        self.fastq_format = fastx.is_fastq(filename)
        warn_out = []
        with Progress("Reading file %s" % filename, 1, params) as prog:
            for rec in fastx.read_fastx(filename, params, upcase=upcase,
                                        warn_out=warn_out):
                seqlen = len(rec.sequence)
                if (params.opt_minseqlength > 0
                        and seqlen < params.opt_minseqlength):
                    discarded_short += 1
                elif seqlen > params.opt_maxseqlength:
                    discarded_long += 1
                elif (params.opt_cluster_unoise is not None
                      and rec.abundance < params.opt_minsize):
                    discarded_unoise += 1
                else:
                    self.entries.append(
                        DbEntry(rec.header, bytearray(rec.sequence),
                                rec.quality, rec.abundance))
                prog.update()
        for stripped, is_fq in warn_out:
            fastx._warn_stripped(params, stripped, is_fq)
        self.discarded_short = discarded_short
        self.discarded_long = discarded_long
        self.discarded_unoise = discarded_unoise
        self._encoded_cache = None
        if self.seqcount > 0:
            message(params, "%d nt in %d seqs, min %d, max %d, avg %.0f" % (
                self.nucleotidecount, self.seqcount, self.shortest,
                self.longest, self.nucleotidecount / self.seqcount))
        else:
            message(params, "%d nt in %d seqs" % (self.nucleotidecount,
                                                  self.seqcount))
        if discarded_short:
            message(params, "minseqlength %d: %d %s discarded." % (
                params.opt_minseqlength, discarded_short,
                "sequence" if discarded_short == 1 else "sequences"))
        if discarded_long:
            message(params, "maxseqlength %d: %d %s discarded." % (
                params.opt_maxseqlength, discarded_long,
                "sequence" if discarded_long == 1 else "sequences"))
        if discarded_unoise:
            # quirk: the reference writes this one to the log WITHOUT the
            # extra blank line (db.cpp:392-397)
            from .utils.progress import message_both
            message_both(params, "minsize %d: %d %s discarded.\n" % (
                params.opt_minsize, discarded_unoise,
                "sequence" if discarded_unoise == 1 else "sequences"))

    def add(self, header: bytes, sequence: bytes,
            quality: Optional[bytes] = None, abundance: int = 1) -> None:
        self.entries.append(DbEntry(header, bytearray(sequence), quality,
                                    abundance))
        self._encoded_cache = None

    # -- accessors (reference: db.hpp getters) ----------------------------

    @property
    def seqcount(self) -> int:
        return len(self.entries)

    def getsequence(self, seqno: int) -> bytes:
        return bytes(self.entries[seqno].sequence)

    def getsequencelen(self, seqno: int) -> int:
        return len(self.entries[seqno].sequence)

    def getheader(self, seqno: int) -> bytes:
        return self.entries[seqno].header

    def getheaderlen(self, seqno: int) -> int:
        return len(self.entries[seqno].header)

    def getabundance(self, seqno: int) -> int:
        return self.entries[seqno].abundance

    def getquality(self, seqno: int) -> Optional[bytes]:
        return self.entries[seqno].quality

    @property
    def nucleotidecount(self) -> int:
        return sum(len(e.sequence) for e in self.entries)

    @property
    def longest(self) -> int:
        return max((len(e.sequence) for e in self.entries), default=0)

    @property
    def shortest(self) -> int:
        return min((len(e.sequence) for e in self.entries), default=0)

    # -- sorting (reference: db.cpp sortbylength/sortbyabundance; both are
    #    stable by original ordinal) --------------------------------------

    def sortbylength(self, params: Optional[Parameters] = None) -> None:
        """Longest first, then abundance desc, then label asc, then ordinal.

        reference: db.cpp Database::sortbylength (:433-450)."""
        from .utils.progress import phase
        if params is not None:
            phase(params, "Sorting by length")
        order = sorted(range(len(self.entries)),
                       key=lambda i: (-len(self.entries[i].sequence),
                                      -self.entries[i].abundance,
                                      self.entries[i].header, i))
        self.entries = [self.entries[i] for i in order]
        self._encoded_cache = None

    def sortbylength_shortest_first(
            self, params: Optional[Parameters] = None) -> None:
        """reference: db.cpp Database::sortbylength_shortest_first (:452-469)."""
        from .utils.progress import phase
        if params is not None:
            phase(params, "Sorting by length")
        order = sorted(range(len(self.entries)),
                       key=lambda i: (len(self.entries[i].sequence),
                                      -self.entries[i].abundance,
                                      self.entries[i].header, i))
        self.entries = [self.entries[i] for i in order]
        self._encoded_cache = None

    def sortbyabundance(self, params: Optional[Parameters] = None) -> None:
        """Most abundant first, then label asc, then ordinal.

        reference: db.cpp Database::sortbyabundance (:471-486)."""
        from .utils.progress import phase
        if params is not None:
            phase(params, "Sorting by abundance")
        order = sorted(range(len(self.entries)),
                       key=lambda i: (-self.entries[i].abundance,
                                      self.entries[i].header, i))
        self.entries = [self.entries[i] for i in order]
        self._encoded_cache = None

    # -- device encoding --------------------------------------------------

    def encoded(self):
        """Padded encodings shared by the device kernels.

        Returns a dict with:
          seq4:  (N, Lmax) uint8 4-bit codes, 0-padded
          lens:  (N,) int32 sequence lengths
        Cached; invalidated by any mutation.
        """
        if self._encoded_cache is None:
            n = len(self.entries)
            lens = np.array([len(e.sequence) for e in self.entries],
                            dtype=np.int32)
            lmax = int(lens.max()) if n else 0
            seq4 = np.zeros((n, lmax), dtype=np.uint8)
            for i, e in enumerate(self.entries):
                arr = np.frombuffer(bytes(e.sequence), dtype=np.uint8)
                seq4[i, :len(arr)] = maps.CHRMAP_4BIT[arr]
            self._encoded_cache = {"seq4": seq4, "lens": lens}
        return self._encoded_cache
