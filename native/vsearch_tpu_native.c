/* Native host runtime for vsearch_tpu.
 *
 * Hot host-side paths that are too slow in Python: DUST masking, backtrack
 * op-array -> CIGAR/statistics assembly, and unique k-mer extraction.
 * Loaded via ctypes (vsearch_tpu/native.py); every routine has a Python
 * fallback with identical semantics.
 *
 * Semantics mirror the reference implementations:
 *   DUST:        src/core/mask.cpp:76-186 (wo() + dust_core)
 *   kmers:       src/core/unique.cpp:155-227 (rolling 2-bit code + bad mask)
 *   stats:       src/core/align_simd.cpp backtrack16 counting (:1132-1235)
 * (Written from the algorithm spec; no code copied.)
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <stdio.h>

/* ---- character maps (mirror utils/maps.cpp tables) ---- */

static unsigned char map4[256];
static unsigned char map2[256];
static unsigned char mask_ambig[256]; /* 1 = masked */
static unsigned char mask_lower[256];
static int maps_ready = 0;

static void init_maps(void) {
    if (maps_ready) return;
    memset(map4, 0, 256);
    const char *codes = "-ACMGRSVTWYHKDBN";
    for (int c = 1; c < 16; c++) {
        map4[(unsigned char)codes[c]] = (unsigned char)c;
        map4[(unsigned char)(codes[c] + 32)] = (unsigned char)c;
    }
    map4['U'] = 8; map4['u'] = 8;
    memset(map2, 0, 256);
    map2['C'] = 1; map2['c'] = 1;
    map2['G'] = 2; map2['g'] = 2;
    map2['T'] = 3; map2['t'] = 3; map2['U'] = 3; map2['u'] = 3;
    memset(mask_ambig, 1, 256);
    const char *plain = "ACGTUacgtu";
    for (const char *p = plain; *p; p++) mask_ambig[(unsigned char)*p] = 0;
    memset(mask_lower, 1, 256);
    const char *upper = "ACGTU";
    for (const char *p = upper; *p; p++) mask_lower[(unsigned char)*p] = 0;
    maps_ready = 1;
}

/* ---- DUST ---- */

#define DUST_WINDOW 64
#define DUST_WORD 3
#define DUST_LEVEL 20
#define DUST_HALF 32

/* Best low-complexity region of one window: maximize v = 10*sum/j over
 * start i and extent j, ties to the first (i, j). */
static int dust_wo(int len, const unsigned char *s, int *beg, int *end) {
    int l1 = len - DUST_WORD + 1 - 5;
    if (l1 < 0) return 0;

    int bestv = 0, besti = 0, bestj = 0;
    int words[DUST_WINDOW];
    unsigned word = 0;
    for (int j = 0; j < len; j++) {
        word = ((word << 2) | map2[s[j]]) & 63u;
        words[j] = (int)word;
    }
    for (int i = 0; i < l1; i++) {
        int counts[64];
        memset(counts, 0, sizeof counts);
        int sum = 0;
        for (int j = DUST_WORD - 1; j < len - i; j++) {
            int w = words[i + j];
            int c = counts[w];
            if (c) {
                sum += c;
                int v = 10 * sum / j;
                if (v > bestv) { bestv = v; besti = i; bestj = j; }
            }
            counts[w]++;
        }
    }
    *beg = besti;
    *end = besti + bestj;
    return bestv;
}

/* In-place-itous DUST of one sequence: writes masked sequence to out. */
void vstpu_dust(const unsigned char *seq, int len, int hardmask,
                unsigned char *out) {
    init_maps();
    if (!hardmask) {
        for (int i = 0; i < len; i++) {
            unsigned char c = seq[i];
            out[i] = (c >= 'a' && c <= 'z') ? (unsigned char)(c - 32) : c;
        }
    } else {
        memcpy(out, seq, (size_t)len);
    }
    int a = 0, b = 0;
    for (int i = 0; i < len; i += DUST_HALF) {
        int l = (len > i + DUST_WINDOW) ? DUST_WINDOW : len - i;
        int v = dust_wo(l, seq + i, &a, &b);
        if (v > DUST_LEVEL) {
            if (hardmask) {
                for (int j = a + i; j <= b + i; j++) out[j] = 'N';
            } else {
                for (int j = a + i; j <= b + i; j++) out[j] = seq[j] | 0x20;
            }
            if (b < DUST_HALF) i += DUST_HALF - b;
        }
    }
}

/* Batch DUST: seqs concatenated, offsets[n+1]. */
void vstpu_dust_batch(const unsigned char *data, const int64_t *offsets,
                      int n, int hardmask, unsigned char *out) {
    init_maps();  /* once, before the parallel region (lazy init races) */
    #pragma omp parallel for schedule(dynamic, 64)
    for (int i = 0; i < n; i++) {
        int64_t start = offsets[i];
        int len = (int)(offsets[i + 1] - start);
        vstpu_dust(data + start, len, hardmask, out + start);
    }
}

/* ---- unique k-mer extraction ----
 * Returns number of unique kmers written to list (first-occurrence order).
 * seqmask: 0 = mask ambiguous only, 1 = mask lowercase too.
 * scratch must hold (1 << (2*wordlength)) / 8 bytes, zeroed by callee. */
int vstpu_unique_kmers(const unsigned char *seq, int len, int wordlength,
                       int seqmask, uint32_t *list, uint64_t *bitmap) {
    init_maps();
    const unsigned char *mm = seqmask ? mask_lower : mask_ambig;
    uint64_t size = 1ull << (2 * wordlength);
    memset(bitmap, 0, size / 8);
    uint64_t bad = 0, kmer = 0;
    uint64_t mask = size - 1;
    int unique = 0;
    int i = 0;
    for (; i < wordlength - 1 && i < len; i++) {
        bad = (bad << 2) | mm[seq[i]];
        kmer = (kmer << 2) | map2[seq[i]];
    }
    for (; i < len; i++) {
        bad = ((bad << 2) | mm[seq[i]]) & mask;
        kmer = ((kmer << 2) | map2[seq[i]]) & mask;
        if (bad == 0) {
            uint64_t x = kmer >> 6, y = 1ull << (kmer & 63);
            if (!(bitmap[x] & y)) {
                list[unique++] = (uint32_t)kmer;
                bitmap[x] |= y;
            }
        }
    }
    return unique;
}

/* ---- backtrack ops -> cigar + statistics ----
 *
 * ops: int8 array in END-TO-FRONT order as produced by the device backtrack
 * (0=none, 1=M, 2=D, 3=I).  Writes the forward cigar string into cigar_out
 * (caller-sized >= 12 * nops) and returns its length; fills
 * stats[0..3] = aligned, matches, mismatches, gaps.
 * q/t are the original sequences (for IUPAC match counting). */
int vstpu_assemble(const int8_t *ops, int nops,
                   const unsigned char *q, const unsigned char *t,
                   int n_mismatch, char *cigar_out, int64_t *stats) {
    init_maps();
    int aligned = 0, matches = 0, mismatches = 0, gaps = 0;
    int qpos = 0, tpos = 0;
    char *out = cigar_out;
    int prev = 0;     /* previous op in forward order */
    int run = 0;

    /* forward order = reverse of ops, skipping 0s */
    int start = nops - 1;
    while (start >= 0 && ops[start] == 0) start--;

    for (int k = start; k >= 0; k--) {
        int op = ops[k];
        if (op == 0) continue;
        aligned++;
        if (op == 1) { /* M */
            int qa = map4[q[qpos]], ta = map4[t[tpos]];
            if ((qa & ta) != 0) {
                if (n_mismatch && (qa == 15 || ta == 15)) mismatches++;
                else matches++;
            } else mismatches++;
            qpos++; tpos++;
        } else if (op == 2) { /* D consumes query */
            if (prev != 2) gaps++;
            qpos++;
        } else { /* I consumes target */
            if (prev != 3) gaps++;
            tpos++;
        }
        if (op == prev) run++;
        else {
            if (run > 0) {
                if (run > 1) out += sprintf(out, "%d", run);
                *out++ = (char)(prev == 1 ? 'M' : prev == 2 ? 'D' : 'I');
            }
            prev = op;
            run = 1;
        }
    }
    if (run > 0) {
        if (run > 1) out += sprintf(out, "%d", run);
        *out++ = (char)(prev == 1 ? 'M' : prev == 2 ? 'D' : 'I');
    }
    *out = 0;
    stats[0] = aligned;
    stats[1] = matches;
    stats[2] = mismatches;
    stats[3] = gaps;
    return (int)(out - cigar_out);
}

/* ---- device index bit packing ----
 * bits: (hashsize + 1) rows x `words` uint32 (row-major, zeroed by caller);
 * bit (p & 31) of word p >> 5 in row k set when index position p contains
 * k-mer k.  This is the packed incidence matrix the TPU scoring kernel
 * gathers (ops/score.py) -- the reference's per-kmer bitmap representation
 * (src/core/dbindex.cpp:211-236) generalized to every k-mer.
 * kmers: concatenated per-position unique-kmer lists; starts: n_pos+1
 * prefix offsets into kmers. */
void vstpu_pack_bits(const uint32_t *kmers, const int64_t *starts,
                     int n_pos, int words, uint32_t *bits) {
    /* chunked by 32-position word groups: two positions in one word would
       race the read-modify-write, but each group owns a disjoint word
       column, so groups parallelize without atomics */
    int n_groups = (n_pos + 31) / 32;
    #pragma omp parallel for schedule(dynamic, 8)
    for (int g = 0; g < n_groups; g++) {
        int p_end = (g + 1) * 32;
        if (p_end > n_pos) p_end = n_pos;
        for (int p = g * 32; p < p_end; p++) {
            uint32_t bit = 1u << (p & 31);
            int64_t w = (int64_t)(p >> 5);
            const int64_t lo = starts[p], hi = starts[p + 1];
            for (int64_t i = lo; i < hi; i++) {
                bits[(int64_t)kmers[i] * (int64_t)words + w] |= bit;
            }
        }
    }
}
