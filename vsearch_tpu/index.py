"""K-mer database index.

Mirrors the role of reference src/core/dbindex.{cpp,hpp}: map each (indexed)
database sequence's unique k-mer set so that per-query shared-k-mer counts can
be computed.  Two representations are kept:

* a host CSR postings layout (kmer -> sorted list of index positions) used to
  build the device tensors and as the counting fallback, and
* a packed-bit incidence matrix shipped to the device (HBM): shape
  (4^w, ceil(capacity/32)) uint32, where bit n of row k says sequence with
  index position n contains k-mer k.  This is the TPU-native analogue of the
  reference's bitmap/postings split (dbindex.cpp:211-236) — on TPU the packed
  bitmap is used for *every* k-mer, and per-query counts become gathered-row
  popcount accumulation feeding a top-k (see ops/score.py).

Supports incremental add_sequence for the clustering path (dbindex.cpp:121-148):
the host CSR grows per append; device tensors are refreshed in batches by the
cluster driver.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from .params import Masking, Parameters
from .ops import kmer as kmer_ops


class KmerIndex:
    def __init__(self, wordlength: int) -> None:
        self.wordlength = wordlength
        self.hashsize = 1 << (2 * wordlength)
        self.mapping: List[int] = []      # index position -> seqno
        self.lengths: List[int] = []      # index position -> sequence length
        self._kmer_lists: List[np.ndarray] = []  # per index position, sorted u32
        self._csr_dirty = True
        self._csr_indptr: Optional[np.ndarray] = None
        self._csr_postings: Optional[np.ndarray] = None
        # growable per-kmer postings (reference dbindex's incremental
        # structure, dbindex.cpp:121-148): counting stays O(postings)
        # under add_sequence instead of a full CSR rebuild per query
        self._grow_arrays: Optional[List[Optional[np.ndarray]]] = None
        self._grow_sizes: Optional[np.ndarray] = None
        self._grow_upto = 0               # positions absorbed so far
        self._pos_cache = None            # (count, lengths[], mapping[])
        self._native = None               # native.Postings handle
        self._native_ok = True

    @property
    def count(self) -> int:
        return len(self.mapping)

    def add_sequence(self, seqno: int, db, seqmask: Masking) -> None:
        """reference: dbindex.cpp:121-148 (unique kmers of one sequence)."""
        kmers = kmer_ops.unique_kmer_set(db.getsequence(seqno),
                                         self.wordlength, seqmask)
        self.add_sequence_with_kmers(seqno, db.getsequencelen(seqno), kmers)

    def add_sequence_with_kmers(self, seqno: int, length: int,
                                kmers: np.ndarray) -> None:
        """add_sequence with a precomputed unique-kmer set (batch-extracted
        by the round engines — one threaded native call per round).

        The native postings mirror is synced lazily in one bulk call at
        the next query (_native_sync), not per append."""
        self.mapping.append(seqno)
        self.lengths.append(length)
        self._kmer_lists.append(kmers)
        self._csr_dirty = True

    def _native_sync(self) -> None:
        """Bring the native postings mirror up to date with add order."""
        if self._native is None:
            return
        upto = self._native.npos
        if upto < self.count:
            self._native.add_batch(self._kmer_lists[upto:],
                                   self.lengths[upto:],
                                   self.mapping[upto:])

    def candidates_for_query(self, query_kmers: np.ndarray, tophits: int,
                             minmatches: int) -> List:
        """counts_for_query + topscores in one pass (native when available):
        best-first (seqno, count) candidates in minheap_compare order."""
        if self.count == 0 or tophits <= 0:
            return []
        if self._native is None and self._native_ok:
            try:
                from . import native
                p = native.Postings(self.hashsize)
                # UDB bulk loads populate only the CSR; invert it first
                p.add_batch(self.kmer_lists_by_position(), self.lengths,
                            self.mapping)
                self._native = p
            except Exception:
                self._native_ok = False
        if self._native is not None:
            self._native_sync()
            return self._native.topk(query_kmers, tophits, minmatches)
        return self.topscores(self.counts_for_query(query_kmers), tophits,
                              minmatches)

    def candidates_for_query_batch(self, kmer_lists, tophits: int,
                                   minmatches_list, raw=None) -> List[List]:
        """Threaded candidates_for_query over many queries.

        ``raw``: optional (buf, offsets[n+1]) concatenated layout of
        ``kmer_lists`` (unique_kmer_sets_batch_raw wire format) — skips
        re-concatenation on the native path."""
        if self.count == 0 or tophits <= 0:
            return [[] for _ in kmer_lists]
        self.candidates_for_query(np.zeros(0, dtype=np.uint32), 1, 1)
        if self._native is not None:
            self._native_sync()
            if raw is not None:
                return self._native.topk_batch_raw(
                    raw[0], raw[1], tophits, minmatches_list)
            return self._native.topk_batch(kmer_lists, tophits,
                                           minmatches_list)
        return [self.candidates_for_query(k, tophits, mm)
                for k, mm in zip(kmer_lists, minmatches_list)]

    def add_all_sequences(self, db, seqmask: Masking,
                          params: Optional[Parameters] = None) -> None:
        """reference: dbindex.cpp prepare ("Counting k-mers", :185) +
        add_all_sequences ("Creating k-mer index", :154)."""
        if params is not None:
            from .utils.progress import Progress
            with Progress("Counting k-mers", db.seqcount, params) as prog:
                for seqno in range(db.seqcount):
                    self.add_sequence(seqno, db, seqmask)
                    prog.update()
            with Progress("Creating k-mer index", 1, params):
                self._build_csr()
        else:
            for seqno in range(db.seqcount):
                self.add_sequence(seqno, db, seqmask)

    # -- host counting ----------------------------------------------------

    def _build_csr(self) -> None:
        """kmer -> postings of index positions, ordered by add order."""
        if not self._csr_dirty:
            return
        counts = np.zeros(self.hashsize + 1, dtype=np.int64)
        for kmers in self._kmer_lists:
            counts[kmers + 1] += 1
        indptr = np.cumsum(counts)
        postings = np.empty(int(indptr[-1]), dtype=np.int32)
        cursor = indptr[:-1].copy()
        for pos, kmers in enumerate(self._kmer_lists):
            slots = cursor[kmers]
            postings[slots] = pos
            cursor[kmers] += 1
        self._csr_indptr = indptr
        self._csr_postings = postings
        self._csr_dirty = False

    def kmer_lists_by_position(self) -> List[np.ndarray]:
        """Per index position, the sorted unique k-mer ids.

        Normally `_kmer_lists` as built by add_sequence; after a UDB bulk
        load (io/udb.py) only the CSR exists, so invert kmer->positions
        back into position->kmers (udb.cpp loads postings directly too,
        :470-520)."""
        if self._kmer_lists or self.count == 0:
            return self._kmer_lists
        indptr = self._csr_indptr
        postings = self._csr_postings
        kmer_of = np.repeat(
            np.arange(self.hashsize, dtype=np.uint32),
            np.diff(indptr).astype(np.int64))
        order = np.argsort(postings, kind="stable")
        sorted_pos = postings[order]
        sorted_kmer = kmer_of[order]
        bounds = np.searchsorted(sorted_pos, np.arange(self.count + 1))
        self._kmer_lists = [sorted_kmer[bounds[i]:bounds[i + 1]]
                            for i in range(self.count)]
        return self._kmer_lists

    def _grow_absorb(self) -> None:
        """Bring the growable per-kmer postings up to date with add order."""
        if self._grow_arrays is None:
            self._grow_arrays = [None] * self.hashsize
            self._grow_sizes = np.zeros(self.hashsize, dtype=np.int64)
            self._grow_upto = 0
        arrays = self._grow_arrays
        sizes = self._grow_sizes
        for pos in range(self._grow_upto, self.count):
            for k in self._kmer_lists[pos].tolist():
                arr = arrays[k]
                n = sizes[k]
                if arr is None:
                    arrays[k] = arr = np.empty(4, dtype=np.int32)
                elif n == arr.size:
                    arr = np.empty(arr.size * 2, dtype=np.int32)
                    arr[:n] = arrays[k][:n]
                    arrays[k] = arr
                arr[n] = pos
                sizes[k] = n + 1
        self._grow_upto = self.count

    def counts_for_query(self, query_kmers: np.ndarray) -> np.ndarray:
        """Shared-unique-kmer counts per index position (host path).

        Equivalent to search_topscores' counter loop (searchcore.cpp:260-340):
        each unique query k-mer contributes +1 to every DB sequence containing
        it.  Saturation at 32767 cannot trigger for amplicon-scale queries
        (count <= #unique query kmers), so plain int32 is exact.
        """
        if self.count == 0 or query_kmers.size == 0:
            return np.zeros(self.count, dtype=np.int32)
        if self._grow_upto != self.count:
            self._grow_absorb()
        arrays = self._grow_arrays
        sizes = self._grow_sizes
        runs = [arrays[k][:sizes[k]] for k in query_kmers.tolist()
                if sizes[k]]
        if not runs:
            return np.zeros(self.count, dtype=np.int32)
        idx = np.concatenate(runs)
        counts = np.bincount(idx, minlength=self.count)
        return np.minimum(counts, 32767).astype(np.int32)

    # -- top-K with reference tie-break -----------------------------------

    def _pos_arrays(self):
        """(lengths, mapping) as int64 arrays, cached against growth."""
        if self._pos_cache is None or self._pos_cache[0] != self.count:
            self._pos_cache = (self.count,
                               np.asarray(self.lengths, dtype=np.int64),
                               np.asarray(self.mapping, dtype=np.int64))
        return self._pos_cache[1], self._pos_cache[2]

    def topscores(self, counts: np.ndarray, tophits: int,
                  minmatches: int) -> List:
        """Top-``tophits`` candidates ordered best-first.

        Order: count desc, length asc, seqno asc — the total order of
        minheap_compare (minheap.cpp:111-146); only index positions with
        count >= minmatches participate (searchcore.cpp:320-337).

        Returns list of (seqno, count).
        """
        eligible = np.nonzero(counts >= minmatches)[0]
        if eligible.size == 0:
            return []
        all_lengths, all_seqnos = self._pos_arrays()
        lengths = all_lengths[eligible]
        seqnos = all_seqnos[eligible]
        ccounts = counts[eligible]
        # np.lexsort: last key is primary
        order = np.lexsort((seqnos, lengths, -ccounts))
        order = order[:tophits]
        return [(int(seqnos[i]), int(ccounts[i])) for i in order]
