"""ctypes loader for the native host runtime (native/vsearch_tpu_native.c).

Builds the shared library on first use (gcc, ~1s) and caches it next to the
source.  Every entry point has a pure-Python fallback elsewhere in the
package; callers check ``available()``.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO = pathlib.Path(__file__).resolve().parent.parent
_SRC = _REPO / "native" / "vsearch_tpu_native.c"
# VSEARCH_TPU_NATIVE_SO overrides the library path (tools/sanitize_native.sh
# points it at an ASan+UBSan instrumented build)
_SO = pathlib.Path(os.environ.get(
    "VSEARCH_TPU_NATIVE_SO",
    str(_REPO / "native" / "libvsearch_tpu_native.so")))

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["cc", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
             str(_SRC), "-o", str(_SO)],
            check=True, capture_output=True)
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if "VSEARCH_TPU_NATIVE_SO" in os.environ:
            if not _SO.exists():
                return None          # instrumented build must pre-exist
        elif not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError:
            return None
        lib.vstpu_dust.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                   ctypes.c_int, ctypes.c_char_p]
        lib.vstpu_dust_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p]
        lib.vstpu_unique_kmers.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p]
        lib.vstpu_unique_kmers.restype = ctypes.c_int
        lib.vstpu_assemble.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int, ctypes.c_char_p, ctypes.c_void_p]
        lib.vstpu_assemble.restype = ctypes.c_int
        lib.vstpu_pack_bits.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p]
        lib.vstpu_pack_query_bits.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def dust(seq: bytes, hardmask: bool) -> Optional[bytes]:
    lib = _load()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(len(seq))
    lib.vstpu_dust(seq, len(seq), int(hardmask), out)
    return out.raw


def dust_batch(seqs, hardmask: bool):
    """Mask a list of sequences; returns list of masked bytes, or None."""
    lib = _load()
    if lib is None:
        return None
    data = b"".join(seqs)
    offsets = np.zeros(len(seqs) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in seqs], out=offsets[1:])
    out = ctypes.create_string_buffer(len(data))
    lib.vstpu_dust_batch(data, offsets.ctypes.data, len(seqs),
                         int(hardmask), out)
    raw = out.raw
    return [raw[offsets[i]:offsets[i + 1]] for i in range(len(seqs))]


_kmer_scratch = {}


def _concat_kmer_lists(kmer_lists):
    """Concatenate per-item uint32 k-mer lists into (buf, offsets[n+1])."""
    n = len(kmer_lists)
    concat = np.concatenate(
        [np.ascontiguousarray(k, dtype=np.uint32) for k in kmer_lists]) \
        if n else np.zeros(0, dtype=np.uint32)
    off = np.zeros(n + 1, dtype=np.int64)
    if n:
        np.cumsum([k.size for k in kmer_lists], out=off[1:])
    return np.ascontiguousarray(concat, dtype=np.uint32), off


def unique_kmers(seq: bytes, wordlength: int,
                 mask_lowercase: bool) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    key = wordlength
    if key not in _kmer_scratch:
        _kmer_scratch[key] = np.zeros((1 << (2 * wordlength)) // 64 + 1,
                                      dtype=np.uint64)
    bitmap = _kmer_scratch[key]
    out = np.empty(max(len(seq), 1), dtype=np.uint32)
    n = lib.vstpu_unique_kmers(seq, len(seq), wordlength,
                               int(mask_lowercase),
                               out.ctypes.data, bitmap.ctypes.data)
    return out[:n].copy()


def unique_kmers_batch(seqs, wordlength: int, mask_lowercase: bool):
    """Threaded unique-kmer extraction over many sequences.

    Returns (kmers, offsets): concatenated uint32 k-mer lists with
    int64 offsets[n+1], or None when the native library is unavailable.
    Slice ``kmers[offsets[i]:offsets[i+1]]`` for sequence i."""
    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, "_kmer_batch_ready"):
        ct = ctypes
        lib.vstpu_unique_kmers_batch.argtypes = [
            ct.c_char_p, ct.c_void_p, ct.c_int64, ct.c_int, ct.c_int,
            ct.c_void_p, ct.c_void_p]
        lib._kmer_batch_ready = True
    n = len(seqs)
    data = b"".join(seqs)
    off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum([len(s) for s in seqs], out=off[1:])
    out = np.empty(max(len(data), 1), dtype=np.uint32)
    oo = np.zeros(n + 1, dtype=np.int64)
    lib.vstpu_unique_kmers_batch(data, off.ctypes.data, n, wordlength,
                                 int(mask_lowercase), out.ctypes.data,
                                 oo.ctypes.data)
    return out, oo


def pack_bits(all_kmers: np.ndarray, starts: np.ndarray, n_pos: int,
              words: int, bits: np.ndarray) -> bool:
    """Set incidence bits for the device k-mer index in-place.

    all_kmers uint32 (concatenated per-position lists), starts int64
    (n_pos+1 offsets), bits (hashsize+1, words) uint32 zeroed."""
    lib = _load()
    if lib is None:
        return False
    assert all_kmers.dtype == np.uint32 and all_kmers.flags.c_contiguous
    assert starts.dtype == np.int64 and starts.flags.c_contiguous
    assert bits.dtype == np.uint32 and bits.flags.c_contiguous
    lib.vstpu_pack_bits(all_kmers.ctypes.data, starts.ctypes.data,
                        n_pos, words, bits.ctypes.data)
    return True


def pack_query_bits(all_kmers: np.ndarray, starts: np.ndarray,
                    n_queries: int, qwords: int) -> Optional[np.ndarray]:
    """Pack per-query unique-kmer lists into a (n_queries, qwords) uint32
    one-hot bit matrix (the MXU scoring kernel's wire format)."""
    lib = _load()
    if lib is None:
        return None
    assert all_kmers.dtype == np.uint32 and all_kmers.flags.c_contiguous
    assert starts.dtype == np.int64 and starts.flags.c_contiguous
    out = np.zeros((n_queries, qwords), dtype=np.uint32)
    lib.vstpu_pack_query_bits(all_kmers.ctypes.data, starts.ctypes.data,
                              n_queries, qwords, out.ctypes.data)
    return out


def assemble(ops: np.ndarray, qseq: bytes, tseq: bytes,
             n_mismatch: bool):
    """ops int16 end-to-front -> (cigar str, aligned, matches, mism, gaps)."""
    lib = _load()
    if lib is None:
        return None
    ops = np.ascontiguousarray(ops, dtype=np.int16)
    cigar_buf = ctypes.create_string_buffer(12 * max(len(ops), 1) + 16)
    stats = np.zeros(4, dtype=np.int64)
    n = lib.vstpu_assemble(ops.ctypes.data, len(ops), qseq, tseq,
                           int(n_mismatch), cigar_buf, stats.ctypes.data)
    return (cigar_buf.raw[:n].decode(), int(stats[0]), int(stats[1]),
            int(stats[2]), int(stats[3]))


class Postings:
    """Opaque native incremental postings + top-k (the host candidate
    scoring path: growable per-kmer position lists, per-query counting and
    the reference min-heap order in one C call)."""

    def __init__(self, hashsize: int) -> None:
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        if not hasattr(lib, "_postings_ready"):
            ct = ctypes
            lib.vstpu_postings_new.argtypes = [ct.c_int64]
            lib.vstpu_postings_new.restype = ct.c_void_p
            lib.vstpu_postings_free.argtypes = [ct.c_void_p]
            lib.vstpu_postings_add.argtypes = [
                ct.c_void_p, ct.c_void_p, ct.c_int64, ct.c_int64, ct.c_int64]
            lib.vstpu_postings_topk.argtypes = [
                ct.c_void_p, ct.c_void_p, ct.c_int64, ct.c_int64, ct.c_int64,
                ct.c_void_p, ct.c_void_p]
            lib.vstpu_postings_topk.restype = ct.c_int64
            lib._postings_ready = True
        self._lib = lib
        self._h = lib.vstpu_postings_new(hashsize)
        self.npos = 0
        self._topk_fn = lib.vstpu_postings_topk
        self._add_fn = lib.vstpu_postings_add
        self._scratch_s = np.empty(256, dtype=np.int64)
        self._scratch_c = np.empty(256, dtype=np.int64)

    def add(self, kmers: np.ndarray, length: int, seqno: int) -> None:
        kmers = np.ascontiguousarray(kmers, dtype=np.uint32)
        self._lib.vstpu_postings_add(self._h, kmers.ctypes.data, kmers.size,
                                     length, seqno)
        self.npos += 1

    def add_batch(self, kmer_lists, lengths, seqnos) -> None:
        """Bulk add of many entries in one C call."""
        n = len(kmer_lists)
        if n == 0:
            return
        concat, off = _concat_kmer_lists(kmer_lists)
        self.add_batch_raw(concat, off, lengths, seqnos)

    def add_batch_raw(self, concat: np.ndarray, off: np.ndarray,
                      lengths, seqnos) -> None:
        """add_batch over an already-concatenated (buf, offsets) layout —
        the wire format unique_kmers_batch produces (zero-copy path)."""
        lib = self._lib
        if not hasattr(lib, "_postings_addb_ready"):
            ct = ctypes
            lib.vstpu_postings_add_batch.argtypes = [
                ct.c_void_p, ct.c_void_p, ct.c_void_p, ct.c_int64,
                ct.c_void_p, ct.c_void_p]
            lib._postings_addb_ready = True
        n = len(off) - 1
        if n == 0:
            return
        assert concat.dtype == np.uint32 and concat.flags.c_contiguous
        assert off.dtype == np.int64 and off.flags.c_contiguous
        ln = np.asarray(lengths, dtype=np.int64)
        sq = np.asarray(seqnos, dtype=np.int64)
        lib.vstpu_postings_add_batch(
            self._h, concat.ctypes.data if concat.size else None,
            off.ctypes.data, n, ln.ctypes.data, sq.ctypes.data)
        self.npos += n

    def topk_batch(self, qkmer_lists, tophits: int, minmatches_list):
        """Threaded top-k over many queries; returns list of candidate
        lists in heap order."""
        nq = len(qkmer_lists)
        if nq == 0 or tophits <= 0:
            return [[] for _ in range(nq)]
        concat, qoff = _concat_kmer_lists(qkmer_lists)
        return self.topk_batch_raw(concat, qoff, tophits, minmatches_list)

    def topk_batch_raw(self, concat: np.ndarray, qoff: np.ndarray,
                       tophits: int, minmatches_list):
        """topk_batch over the concatenated (buf, offsets) wire format."""
        lib = self._lib
        if not hasattr(lib, "_topk_batch_ready"):
            ct = ctypes
            lib.vstpu_postings_topk_batch.argtypes = [
                ct.c_void_p, ct.c_void_p, ct.c_void_p, ct.c_int64,
                ct.c_int64, ct.c_void_p, ct.c_void_p, ct.c_void_p,
                ct.c_void_p]
            lib._topk_batch_ready = True
        nq = len(qoff) - 1
        if nq == 0 or tophits <= 0:
            return [[] for _ in range(nq)]
        mm = np.asarray(minmatches_list, dtype=np.int64)
        out_s = np.empty((nq, tophits), dtype=np.int64)
        out_c = np.empty((nq, tophits), dtype=np.int64)
        out_n = np.empty(nq, dtype=np.int64)
        lib.vstpu_postings_topk_batch(
            self._h, concat.ctypes.data if concat.size else None,
            qoff.ctypes.data, nq, tophits, mm.ctypes.data,
            out_s.ctypes.data, out_c.ctypes.data, out_n.ctypes.data)
        return [list(zip(out_s[i, :out_n[i]].tolist(),
                         out_c[i, :out_n[i]].tolist()))
                for i in range(nq)]

    def counts(self, qkmers: np.ndarray):
        """(positions, counts) int64 arrays of touched index positions.

        Views into per-handle scratch — consume before the next call."""
        lib = self._lib
        if not hasattr(lib, "_postings_counts_ready"):
            ct = ctypes
            lib.vstpu_postings_counts.argtypes = [
                ct.c_void_p, ct.c_void_p, ct.c_int64, ct.c_void_p,
                ct.c_void_p]
            lib.vstpu_postings_counts.restype = ct.c_int64
            lib._postings_counts_ready = True
        qkmers = np.ascontiguousarray(qkmers, dtype=np.uint32)
        cap = max(self.npos, 1)
        scratch = getattr(self, "_counts_scratch", None)
        if scratch is None or scratch[0].size < cap:
            scratch = (np.empty(2 * cap, dtype=np.int64),
                       np.empty(2 * cap, dtype=np.int64))
            self._counts_scratch = scratch
        out_p, out_c = scratch
        m = lib.vstpu_postings_counts(self._h, qkmers.ctypes.data,
                                      qkmers.size, out_p.ctypes.data,
                                      out_c.ctypes.data)
        return out_p[:m], out_c[:m]

    def counts_batch(self, qkmer_lists):
        """Batched counts: per probe list, touched (positions, counts).

        Returns (out_pos, out_cnt, out_n): int32 (nq, cap) arrays + int64
        lengths; row qi's first out_n[qi] entries are valid."""
        lib = self._lib
        if not hasattr(lib, "_counts_batch_ready"):
            ct = ctypes
            lib.vstpu_postings_counts_batch.argtypes = [
                ct.c_void_p, ct.c_void_p, ct.c_void_p, ct.c_int64,
                ct.c_int64, ct.c_void_p, ct.c_void_p, ct.c_void_p]
            lib._counts_batch_ready = True
        nq = len(qkmer_lists)
        cap = max(self.npos, 1)
        if nq == 0:
            z = np.zeros((0, cap), dtype=np.int32)
            return z, z, np.zeros(0, dtype=np.int64)
        concat, qoff = _concat_kmer_lists(qkmer_lists)
        return self.counts_batch_raw(concat, qoff)

    def counts_batch_raw(self, concat: np.ndarray, qoff: np.ndarray):
        """counts_batch over the concatenated (buf, offsets) wire format."""
        lib = self._lib
        if not hasattr(lib, "_counts_batch_ready"):
            ct = ctypes
            lib.vstpu_postings_counts_batch.argtypes = [
                ct.c_void_p, ct.c_void_p, ct.c_void_p, ct.c_int64,
                ct.c_int64, ct.c_void_p, ct.c_void_p, ct.c_void_p]
            lib._counts_batch_ready = True
        nq = len(qoff) - 1
        cap = max(self.npos, 1)
        out_pos = np.empty((nq, cap), dtype=np.int32)
        out_cnt = np.empty((nq, cap), dtype=np.int32)
        out_n = np.empty(nq, dtype=np.int64)
        lib.vstpu_postings_counts_batch(
            self._h, concat.ctypes.data if concat.size else None,
            qoff.ctypes.data, nq, cap, out_pos.ctypes.data,
            out_cnt.ctypes.data, out_n.ctypes.data)
        return out_pos, out_cnt, out_n

    def topk(self, qkmers: np.ndarray, tophits: int, minmatches: int):
        if qkmers.dtype != np.uint32 or not qkmers.flags.c_contiguous:
            qkmers = np.ascontiguousarray(qkmers, dtype=np.uint32)
        if tophits >= self._scratch_s.size:
            self._scratch_s = np.empty(tophits + 1, dtype=np.int64)
            self._scratch_c = np.empty(tophits + 1, dtype=np.int64)
        out_s = self._scratch_s
        out_c = self._scratch_c
        m = self._topk_fn(self._h, qkmers.ctypes.data,
                          qkmers.size, tophits, minmatches,
                          out_s.ctypes.data, out_c.ctypes.data)
        return list(zip(out_s[:m].tolist(), out_c[:m].tolist()))

    def __del__(self):
        try:
            self._lib.vstpu_postings_free(self._h)
        except Exception:
            pass


def cross_counts(tbuf: np.ndarray, toff: np.ndarray, qbuf: np.ndarray,
                 qoff: np.ndarray, hashsize: int, minm):
    """Shared-kmer counts of every probe list vs every target list,
    thresholded by per-target minm; returns (t_idx, counts, offsets) —
    per probe q the pairs t_idx[offsets[q]:offsets[q+1]] — or None."""
    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, "_cross_ready"):
        ct = ctypes
        lib.vstpu_cross_counts.argtypes = [
            ct.c_void_p, ct.c_void_p, ct.c_int64, ct.c_void_p, ct.c_void_p,
            ct.c_int64, ct.c_int64, ct.c_void_p, ct.c_void_p, ct.c_void_p,
            ct.c_void_p, ct.c_int64]
        lib._cross_ready = True
    nt = len(toff) - 1
    nq = len(qoff) - 1
    assert tbuf.dtype == np.uint32 and qbuf.dtype == np.uint32
    assert toff.dtype == np.int64 and qoff.dtype == np.int64
    mm = np.ascontiguousarray(np.asarray(minm, dtype=np.int64))
    cap = max(nq * nt, 1)
    out_t = np.empty(cap, dtype=np.int32)
    out_c = np.empty(cap, dtype=np.int32)
    out_off = np.empty(nq + 1, dtype=np.int64)
    lib.vstpu_cross_counts(
        tbuf.ctypes.data if tbuf.size else None, toff.ctypes.data, nt,
        qbuf.ctypes.data if qbuf.size else None, qoff.ctypes.data, nq,
        hashsize, mm.ctypes.data, out_t.ctypes.data, out_c.ctypes.data,
        out_off.ctypes.data, cap)
    return out_t, out_c, out_off


def nw_align_batch(qseqs, tseqs, scheme_ints):
    """Threaded scalar NW over (qseq, tseq) pairs — the host tier for
    batches too small to amortize a device dispatch.

    scheme_ints: the 15-int ScoreScheme vector (with n_mismatch last).
    Returns a list of (score, overflow, aligned, matches, mismatches,
    gaps, cigar) or None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, "_nw_ready"):
        ct = ctypes
        lib.vstpu_nw_align_batch.argtypes = [
            ct.c_void_p, ct.c_void_p, ct.c_void_p, ct.c_void_p, ct.c_int64,
            ct.c_void_p, ct.c_void_p, ct.c_int64, ct.c_void_p]
        lib._nw_ready = True
    n = len(qseqs)
    if n == 0:
        return []
    qbuf = b"".join(qseqs)
    tbuf = b"".join(tseqs)
    qoff = np.zeros(n + 1, dtype=np.int64)
    np.cumsum([len(s) for s in qseqs], out=qoff[1:])
    toff = np.zeros(n + 1, dtype=np.int64)
    np.cumsum([len(s) for s in tseqs], out=toff[1:])
    maxlen = int((np.diff(qoff) + np.diff(toff)).max())
    cigar_stride = 12 * maxlen + 16
    cigars = ctypes.create_string_buffer(cigar_stride * n)
    out = np.zeros((n, 7), dtype=np.int64)
    scheme = np.asarray(scheme_ints, dtype=np.int64)
    lib.vstpu_nw_align_batch(qbuf, qoff.ctypes.data, tbuf, toff.ctypes.data,
                             n, scheme.ctypes.data, cigars, cigar_stride,
                             out.ctypes.data)
    raw = cigars.raw
    return [(int(out[p, 0]), bool(out[p, 1]), int(out[p, 2]),
             int(out[p, 3]), int(out[p, 4]), int(out[p, 5]),
             raw[p * cigar_stride:p * cigar_stride + out[p, 6]].decode())
            for p in range(n)]


def filter_analyse(seq_buf, qual_buf, off, n, sizes, iparams, dparams,
                   q2p):
    """Batched filter.cpp-analyse; returns (start, length, ee, flags,
    fatal) arrays or None.  flags bit0 discarded, bit1 truncated; fatal =
    [rec, value, below] with rec == -1 when clean."""
    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, "_filter_ready"):
        ct = ctypes
        lib.vstpu_filter_analyse.argtypes = [
            ct.c_void_p, ct.c_void_p, ct.c_void_p, ct.c_int64, ct.c_void_p,
            ct.c_void_p, ct.c_void_p, ct.c_void_p, ct.c_void_p, ct.c_void_p,
            ct.c_void_p, ct.c_void_p, ct.c_void_p]
        lib._filter_ready = True
    off = np.ascontiguousarray(off[:n + 1], dtype=np.int64)
    sizes = np.ascontiguousarray(sizes[:n], dtype=np.int64)
    ip = np.asarray(iparams, dtype=np.int64)
    dp = np.asarray(dparams, dtype=np.float64)
    q2p = np.ascontiguousarray(q2p, dtype=np.float64)
    out_start = np.empty(max(n, 1), dtype=np.int64)
    out_len = np.empty(max(n, 1), dtype=np.int64)
    out_ee = np.empty(max(n, 1), dtype=np.float64)
    out_flags = np.empty(max(n, 1), dtype=np.uint8)
    fatal = np.empty(3, dtype=np.int64)
    lib.vstpu_filter_analyse(
        seq_buf.ctypes.data, qual_buf.ctypes.data, off.ctypes.data, n,
        sizes.ctypes.data, ip.ctypes.data, dp.ctypes.data, q2p.ctypes.data,
        out_start.ctypes.data, out_len.ctypes.data, out_ee.ctypes.data,
        out_flags.ctypes.data, fatal.ctypes.data)
    return out_start, out_len, out_ee, out_flags, fatal


def _emit_ready(lib) -> None:
    if not hasattr(lib, "_emit_ready"):
        ct = ctypes
        lib.vstpu_emit_fastq.argtypes = [ct.c_void_p] * 7 + [ct.c_void_p,
                                                             ct.c_int64,
                                                             ct.c_void_p]
        lib.vstpu_emit_fastq.restype = ct.c_int64
        lib.vstpu_emit_fasta.argtypes = [ct.c_void_p] * 6 + [
            ct.c_void_p, ct.c_int64, ct.c_int64, ct.c_void_p]
        lib.vstpu_emit_fasta.restype = ct.c_int64
        lib._emit_ready = True


def emit_fastq(head_buf, head_off, head_len, seq_buf, qual_buf,
               rec_start, rec_len, sel) -> Optional[bytes]:
    """Bulk @head/seq/+/qual record emission for selected records."""
    lib = _load()
    if lib is None:
        return None
    _emit_ready(lib)
    n = len(sel)
    if n == 0:
        return b""
    sel = np.ascontiguousarray(sel, dtype=np.int32)
    head_off = np.ascontiguousarray(head_off, dtype=np.int64)
    head_len = np.ascontiguousarray(head_len, dtype=np.int64)
    rec_start = np.ascontiguousarray(rec_start, dtype=np.int64)
    rec_len = np.ascontiguousarray(rec_len, dtype=np.int64)
    cap = int(6 * n + head_len[sel].sum() + 2 * rec_len[sel].sum())
    out = np.empty(max(1, cap), dtype=np.uint8)
    w = lib.vstpu_emit_fastq(
        head_buf.ctypes.data if isinstance(head_buf, np.ndarray) else head_buf,
        head_off.ctypes.data, head_len.ctypes.data,
        seq_buf.ctypes.data, qual_buf.ctypes.data,
        rec_start.ctypes.data, rec_len.ctypes.data,
        sel.ctypes.data, n, out.ctypes.data)
    # memoryview, not tobytes(): callers stream this straight into a
    # file write, and the copy costs ~0.5 s/GB on this host
    return out[:w].data


def emit_fasta(head_buf, head_off, head_len, seq_buf, rec_start, rec_len,
               sel, width: int) -> Optional[bytes]:
    """Bulk >head/seq record emission (fasta_width wrapping)."""
    lib = _load()
    if lib is None:
        return None
    _emit_ready(lib)
    n = len(sel)
    if n == 0:
        return b""
    sel = np.ascontiguousarray(sel, dtype=np.int32)
    head_off = np.ascontiguousarray(head_off, dtype=np.int64)
    head_len = np.ascontiguousarray(head_len, dtype=np.int64)
    rec_start = np.ascontiguousarray(rec_start, dtype=np.int64)
    rec_len = np.ascontiguousarray(rec_len, dtype=np.int64)
    lens = rec_len[sel]
    wraps = (np.maximum(lens - 1, 0) // max(width, 1)) if width > 0 else 0
    cap = int(3 * n + head_len[sel].sum() + lens.sum() + n
              + (wraps.sum() if width > 0 else 0))
    out = np.empty(max(1, cap), dtype=np.uint8)
    w = lib.vstpu_emit_fasta(
        head_buf.ctypes.data if isinstance(head_buf, np.ndarray) else head_buf,
        head_off.ctypes.data, head_len.ctypes.data,
        seq_buf.ctypes.data, rec_start.ctypes.data, rec_len.ctypes.data,
        sel.ctypes.data, n, width, out.ctypes.data)
    return out[:w].data


def assemble_batch(ops_matrix: np.ndarray, cols, qseqs, tseqs,
                   n_mismatch: bool):
    """Threaded assembly of columns of a row-major (S, B) ops matrix.

    cols: per-entry column index; qseqs/tseqs: per-entry sequences.
    Returns a list of (cigar, aligned, matches, mismatches, gaps) or None
    when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, "_asm_batch_ready"):
        ct = ctypes
        lib.vstpu_assemble_batch.argtypes = [
            ct.c_void_p, ct.c_int64, ct.c_int64, ct.c_void_p, ct.c_int64,
            ct.c_void_p, ct.c_void_p, ct.c_void_p, ct.c_void_p, ct.c_int,
            ct.c_void_p, ct.c_void_p, ct.c_void_p]
        lib._asm_batch_ready = True
    ops_matrix = np.ascontiguousarray(ops_matrix, dtype=np.int16)
    S, B = ops_matrix.shape
    n = len(cols)
    if n == 0:
        return []
    cols_a = np.asarray(cols, dtype=np.int32)
    qbuf = b"".join(qseqs)
    tbuf = b"".join(tseqs)
    qoff = np.zeros(n + 1, dtype=np.int64)
    np.cumsum([len(s) for s in qseqs], out=qoff[1:])
    toff = np.zeros(n + 1, dtype=np.int64)
    np.cumsum([len(s) for s in tseqs], out=toff[1:])
    cstride = 12 * S + 16
    cigars = ctypes.create_string_buffer(cstride * n)
    clen = np.zeros(n, dtype=np.int32)
    stats = np.zeros((n, 4), dtype=np.int64)
    lib.vstpu_assemble_batch(
        ops_matrix.ctypes.data, S, B, cols_a.ctypes.data, n,
        qbuf, qoff.ctypes.data, tbuf, toff.ctypes.data, int(n_mismatch),
        cigars, clen.ctypes.data, stats.ctypes.data)
    raw = cigars.raw
    return [(raw[e * cstride:e * cstride + clen[e]].decode(),
             int(stats[e, 0]), int(stats[e, 1]), int(stats[e, 2]),
             int(stats[e, 3])) for e in range(n)]


def scan_fasta(data: bytes, truncateatspace: bool, upcase: bool):
    """Native FASTA scan of an in-memory file image.

    Returns (nrec, seq_out, seq_off, head_off, head_len, sizes, stripped)
    or None when the native library is unavailable or the scan hit an
    error (caller falls back to the Python parser, which raises the
    reference-exact error message)."""
    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, "_scan_ready"):
        import ctypes as ct
        lib.vstpu_scan_fasta.argtypes = [
            ct.c_void_p, ct.c_int64, ct.c_int, ct.c_int, ct.c_void_p,
            ct.c_void_p, ct.c_void_p, ct.c_void_p, ct.c_void_p, ct.c_void_p]
        lib.vstpu_scan_fasta.restype = ct.c_int64
        lib.vstpu_scan_fastq.argtypes = [
            ct.c_void_p, ct.c_int64, ct.c_int, ct.c_int, ct.c_void_p,
            ct.c_void_p, ct.c_void_p, ct.c_void_p, ct.c_void_p, ct.c_void_p,
            ct.c_void_p]
        lib.vstpu_scan_fastq.restype = ct.c_int64
        lib._scan_ready = True
    if isinstance(data, (bytes, bytearray)):
        nmax = data.count(b">") + 1    # single C pass (see scan_fastq)
    else:
        data_view = np.frombuffer(data, dtype=np.uint8)
        nmax = int(np.count_nonzero(data_view == ord(">"))) + 1
    seq_out = np.empty(max(1, len(data)), dtype=np.uint8)
    seq_off = np.zeros(nmax + 1, dtype=np.int64)
    head_off = np.empty(nmax, dtype=np.int64)
    head_len = np.empty(nmax, dtype=np.int64)
    sizes = np.empty(nmax, dtype=np.int64)
    stripped = np.zeros(256, dtype=np.uint64)
    data_arr = np.frombuffer(data, dtype=np.uint8)
    nrec = lib.vstpu_scan_fasta(
        data_arr.ctypes.data if len(data) else None, len(data),
        int(truncateatspace), int(upcase),
        seq_out.ctypes.data, seq_off.ctypes.data, head_off.ctypes.data,
        head_len.ctypes.data, sizes.ctypes.data, stripped.ctypes.data)
    if nrec < 0:
        return None
    return nrec, seq_out, seq_off, head_off, head_len, sizes, stripped


def scan_fastq(data: bytes, truncateatspace: bool, upcase: bool):
    """Native FASTQ scan; like scan_fasta plus a quality buffer aligned
    with seq_out."""
    lib = _load()
    if lib is None:
        return None
    scan_fasta(b"", True, False)  # ensure argtypes registered
    if isinstance(data, (bytes, bytearray)):
        # bytes.count is a single C pass; the numpy expression below
        # allocates three len(data) temporaries and measured 10-100x
        # slower on large inputs
        nmax = data.count(b"\n@") + 2
    else:
        data_view = np.frombuffer(data, dtype=np.uint8)
        nmax = (int(np.count_nonzero((data_view[:-1] == ord("\n"))
                                     & (data_view[1:] == ord("@"))))
                if len(data) > 1 else 0) + 2
    seq_out = np.empty(max(1, len(data)), dtype=np.uint8)
    qual_out = np.empty(max(1, len(data)), dtype=np.uint8)
    seq_off = np.zeros(nmax + 1, dtype=np.int64)
    head_off = np.empty(nmax, dtype=np.int64)
    head_len = np.empty(nmax, dtype=np.int64)
    sizes = np.empty(nmax, dtype=np.int64)
    stripped = np.zeros(256, dtype=np.uint64)
    data_arr = np.frombuffer(data, dtype=np.uint8)
    nrec = lib.vstpu_scan_fastq(
        data_arr.ctypes.data if len(data) else None, len(data),
        int(truncateatspace), int(upcase),
        seq_out.ctypes.data, qual_out.ctypes.data, seq_off.ctypes.data,
        head_off.ctypes.data, head_len.ctypes.data, sizes.ctypes.data,
        stripped.ctypes.data)
    if nrec < 0:
        return None
    return (nrec, seq_out, qual_out, seq_off, head_off, head_len, sizes,
            stripped)


def merge_batch(fwd_seqs, fwd_quals, rev_seqs, rev_quals, iparams, dparams,
                tables):
    """Batched paired-end merge (native core, OpenMP over pairs).

    fwd_seqs/rev_seqs: list of bytes; fwd_quals/rev_quals: list of bytes.
    Returns (out_ints (n,8), out_doubles (n,3), merged seq/qual buffers +
    offsets, mutated fwd/rev quality buffers + offsets) or None."""
    lib = _load()
    if lib is None:
        return None
    import ctypes as ct
    if not hasattr(lib, "_merge_ready"):
        lib.vstpu_merge_batch.argtypes = [ct.c_void_p] * 6 + [ct.c_int64] + \
            [ct.c_void_p] * 15
        lib.vstpu_merge_batch.restype = None
        lib._merge_ready = True
    n = len(fwd_seqs)

    def pack(seqs, quals):
        lens = np.fromiter((len(s) for s in seqs), dtype=np.int64, count=n)
        off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=off[1:])
        buf = np.frombuffer(bytearray(b"".join(seqs)), dtype=np.uint8)
        qbuf = np.frombuffer(bytearray(b"".join(quals)), dtype=np.uint8)
        return off, buf, qbuf

    fwd_off, fwd_buf, fq_buf = pack(fwd_seqs, fwd_quals)
    rev_off, rev_buf, rq_buf = pack(rev_seqs, rev_quals)
    return merge_batch_arrays(fwd_buf, fq_buf, fwd_off, rev_buf, rq_buf,
                              rev_off, n, iparams, dparams, tables)


def merge_batch_arrays(fwd_buf, fq_buf, fwd_off, rev_buf, rq_buf, rev_off,
                       n, iparams, dparams, tables):
    """merge_batch over pre-packed contiguous buffers (e.g. straight from
    the native FASTQ scanner) — no per-record join.  Buffers are mutated
    in place (quality truncation)."""
    lib = _load()
    if lib is None:
        return None
    import ctypes as ct
    if not hasattr(lib, "_merge_ready"):
        lib.vstpu_merge_batch.argtypes = [ct.c_void_p] * 6 + [ct.c_int64] + \
            [ct.c_void_p] * 15
        lib.vstpu_merge_batch.restype = None
        lib._merge_ready = True
    fwd_off = np.ascontiguousarray(fwd_off[:n + 1], dtype=np.int64)
    rev_off = np.ascontiguousarray(rev_off[:n + 1], dtype=np.int64)
    out_off = fwd_off + rev_off
    total_out = int(out_off[-1])
    out_seq = np.empty(max(1, total_out), dtype=np.uint8)
    out_qual = np.empty(max(1, total_out), dtype=np.uint8)
    out_ints = np.zeros((n, 8), dtype=np.int64)
    out_doubles = np.zeros((n, 3), dtype=np.float64)
    from .utils.maps import (CHRMAP_COMPLEMENT, CHRMAP_MASK_AMBIG,
                             CHRMAP_2BIT)
    qs = np.ascontiguousarray(tables.merge_qual_same, dtype=np.uint8)
    qd = np.ascontiguousarray(tables.merge_qual_diff, dtype=np.uint8)
    ms = np.ascontiguousarray(tables.match_score, dtype=np.float64)
    xs = np.ascontiguousarray(tables.mism_score, dtype=np.float64)
    q2p = np.ascontiguousarray(tables.q2p, dtype=np.float64)
    ip = np.asarray(iparams, dtype=np.int64)
    dp = np.asarray(dparams, dtype=np.float64)

    def p(a):
        return a.ctypes.data if a.size else None

    lib.vstpu_merge_batch(
        p(fwd_buf), fwd_off.ctypes.data, p(fq_buf),
        p(rev_buf), rev_off.ctypes.data, p(rq_buf),
        n, ip.ctypes.data, dp.ctypes.data,
        q2p.ctypes.data, qs.ctypes.data, qd.ctypes.data,
        ms.ctypes.data, xs.ctypes.data,
        CHRMAP_COMPLEMENT.ctypes.data, CHRMAP_MASK_AMBIG.ctypes.data,
        CHRMAP_2BIT.ctypes.data,
        p(out_seq), p(out_qual), out_off.ctypes.data,
        out_ints.ctypes.data, out_doubles.ctypes.data)
    return (out_ints, out_doubles, out_seq, out_qual, out_off,
            fwd_buf, fq_buf, fwd_off, rev_buf, rq_buf, rev_off)
