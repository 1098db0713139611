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

#define _GNU_SOURCE /* memmem */
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
    /* Exact O(len) screen: the window can reach v > DUST_LEVEL only if
     * some (i, j) has sum(i, j) > 2j, where sum counts equal-word pairs
     * inside [i+2, i+j] (v = 10*sum/j > 20).  With P[t] = pairs whose
     * later member is at position <= t, any interval's pair count is
     * <= P[b] - P[a-1], so a NECESSARY condition is
     *     exists a <= b:  P[b] - P[a-1] >= 2*(b-a) + 5
     * (j = b - i = b - a + 2; sum >= 2j + 1).  With g[t] = P[t] - 2t this
     * is max_b (g[b] - min_{t<b} g[t]) >= 3 — a running-min scan.  When
     * the screen fails, no interval can score above the mask level and
     * the caller's only use of the return value (compare vs DUST_LEVEL)
     * and of beg/end (consumed only when v > DUST_LEVEL) is unchanged by
     * returning 0, so the O(len^2) exact scan below is skipped with
     * bit-identical behavior (typical ACGT windows skip ~always). */
    {
        int cnt[64];
        memset(cnt, 0, sizeof cnt);
        int P = 0, g_min = 0, hit = 0;
        /* g at "position before the first word" is 0 (P=0, t=0 basis);
         * track g[t] - 2 per word step */
        int g = 0;
        for (int t = DUST_WORD - 1; t < len; t++) {
            P += cnt[words[t]]++;
            g = P - 2 * (t - (DUST_WORD - 1) + 1);
            if (g - g_min >= 3) { hit = 1; break; }
            if (g < g_min) g_min = g;
        }
        if (!hit) return 0;
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
                /* v = 10*sum/j (floor); v > bestv <=> 10*sum >= (bestv+1)*j
                 * — same first-(i,j) tie behavior, no division in the loop */
                if (10 * sum >= (bestv + 1) * j) {
                    bestv = 10 * sum / j; besti = i; bestj = j;
                }
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

/* Batch unique k-mers: sequences concatenated in data with offsets[n+1];
 * per-sequence unique k-mer lists written contiguously into out with
 * out_off[n+1] offsets.  out must hold offsets[n] entries (a sequence has
 * at most len k-mers).  OpenMP with per-thread dedup-bitmap scratch;
 * results first land at each sequence's input offset (disjoint slots),
 * then a serial pass compacts them down (out_off[i] <= offsets[i] always,
 * so the moves never overlap a later block). */
void vstpu_unique_kmers_batch(const unsigned char *data,
                              const int64_t *offsets, int64_t n,
                              int wordlength, int seqmask,
                              uint32_t *out, int64_t *out_off) {
    init_maps();
    uint64_t size = 1ull << (2 * wordlength);
    #pragma omp parallel
    {
        uint64_t *bitmap = (uint64_t *)malloc((size_t)(size / 8));
        #pragma omp for schedule(dynamic, 64)
        for (int64_t i = 0; i < n; i++) {
            int len = (int)(offsets[i + 1] - offsets[i]);
            out_off[i + 1] = vstpu_unique_kmers(
                data + offsets[i], len, wordlength, seqmask,
                out + offsets[i], bitmap);
        }
        free(bitmap);
    }
    out_off[0] = 0;
    for (int64_t i = 0; i < n; i++) {
        int64_t cnt = out_off[i + 1];
        if (out_off[i] != offsets[i] && cnt > 0)
            memmove(out + out_off[i], out + offsets[i],
                    (size_t)cnt * sizeof(uint32_t));
        out_off[i + 1] = out_off[i] + cnt;
    }
}

/* ---- backtrack ops -> cigar + statistics ----
 *
 * ops: int16 array in END-TO-FRONT order as produced by the device
 * backtrack (0=none, 1=M, 2=D, 3=I).  Writes the forward cigar string into cigar_out
 * (caller-sized >= 12 * nops) and returns its length; fills
 * stats[0..3] = aligned, matches, mismatches, gaps.
 * q/t are the original sequences (for IUPAC match counting). */
static int assemble_core(const int16_t *ops, int64_t stride, int nops,
                         const unsigned char *q, const unsigned char *t,
                         int n_mismatch, char *cigar_out, int64_t *stats) {
    int aligned = 0, matches = 0, mismatches = 0, gaps = 0;
    int qpos = 0, tpos = 0;
    char *out = cigar_out;
    int prev = 0;     /* previous op in forward order */
    int run = 0;

    /* forward order = reverse of ops, skipping 0s */
    int start = nops - 1;
    while (start >= 0 && ops[(int64_t)start * stride] == 0) start--;

    for (int k = start; k >= 0; k--) {
        int raw = ops[(int64_t)k * stride];
        if (raw == 0) continue;
        /* run-length encoded entries: op | count << 2 (count 1..4095);
         * the flat format's plain 1..3 values decode as count 1 */
        int op = raw & 3;
        int cnt = (raw >> 2) & 4095;
        if (cnt == 0) cnt = 1;
        aligned += cnt;
        if (op == 1) { /* M */
            for (int c = 0; c < cnt; c++) {
                int qa = map4[q[qpos]], ta = map4[t[tpos]];
                if ((qa & ta) != 0) {
                    if (n_mismatch && (qa == 15 || ta == 15)) mismatches++;
                    else matches++;
                } else mismatches++;
                qpos++; tpos++;
            }
        } else if (op == 2) { /* D consumes query */
            if (prev != 2) gaps++;
            qpos += cnt;
        } else { /* I consumes target */
            if (prev != 3) gaps++;
            tpos += cnt;
        }
        if (op == prev) run += cnt;
        else {
            if (run > 0) {
                if (run > 1) out += sprintf(out, "%d", run);
                *out++ = (char)(prev == 1 ? 'M' : prev == 2 ? 'D' : 'I');
            }
            prev = op;
            run = cnt;
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

int vstpu_assemble(const int16_t *ops, int nops,
                   const unsigned char *q, const unsigned char *t,
                   int n_mismatch, char *cigar_out, int64_t *stats) {
    init_maps();
    return assemble_core(ops, 1, nops, q, t, n_mismatch, cigar_out, stats);
}

/* Batched, threaded assembly over columns of a row-major (S, B) ops
 * matrix (the device backtrack's native output shape — no host
 * transpose/copy needed).  Entry e assembles column cols[e] against
 * query/target slices qbuf[qoff[e]:qoff[e+1]] / tbuf[toff[e]:toff[e+1]];
 * its cigar is written at cigars + e * (12*S + 16) with the length in
 * cigar_len[e], stats in stats[e*4..]. */
void vstpu_assemble_batch(const int16_t *ops, int64_t S, int64_t B,
                          const int32_t *cols, int64_t ncols,
                          const unsigned char *qbuf, const int64_t *qoff,
                          const unsigned char *tbuf, const int64_t *toff,
                          int n_mismatch, char *cigars,
                          int32_t *cigar_len, int64_t *stats) {
    init_maps();
    int64_t cstride = 12 * S + 16;
    #pragma omp parallel for schedule(dynamic, 16)
    for (int64_t e = 0; e < ncols; e++) {
        cigar_len[e] = assemble_core(
            ops + cols[e], B, (int)S,
            qbuf + qoff[e], tbuf + toff[e], n_mismatch,
            cigars + e * cstride, stats + e * 4);
    }
}

/* ---- incremental k-mer postings + top-k (host candidate scoring) ----
 *
 * Growable per-kmer postings lists + per-query shared-kmer counting with
 * the reference's min-heap candidate order (count desc, length asc,
 * seqno asc; src/core/minheap.cpp:111-146, searchcore.cpp:260-340).
 * Opaque handle owned by the Python KmerIndex. */

typedef struct {
    int64_t hashsize;
    int32_t **lists;      /* per kmer: positions */
    int64_t *sizes;       /* per kmer: used */
    int64_t *caps;        /* per kmer: capacity */
    int64_t npos;         /* positions added */
    int64_t *lengths;     /* per position */
    int64_t *seqnos;      /* per position */
    int64_t pos_cap;
    int32_t *counter;     /* per position scratch */
    int32_t *touched;     /* touched positions this query */
} postings_t;

void *vstpu_postings_new(int64_t hashsize) {
    postings_t *h = (postings_t *)calloc(1, sizeof(postings_t));
    h->hashsize = hashsize;
    h->lists = (int32_t **)calloc((size_t)hashsize, sizeof(int32_t *));
    h->sizes = (int64_t *)calloc((size_t)hashsize, sizeof(int64_t));
    h->caps = (int64_t *)calloc((size_t)hashsize, sizeof(int64_t));
    h->pos_cap = 1024;
    h->lengths = (int64_t *)malloc((size_t)h->pos_cap * sizeof(int64_t));
    h->seqnos = (int64_t *)malloc((size_t)h->pos_cap * sizeof(int64_t));
    h->counter = (int32_t *)calloc((size_t)h->pos_cap, sizeof(int32_t));
    h->touched = (int32_t *)malloc((size_t)h->pos_cap * sizeof(int32_t));
    return h;
}

void vstpu_postings_free(void *hp) {
    postings_t *h = (postings_t *)hp;
    if (!h) return;
    for (int64_t k = 0; k < h->hashsize; k++) free(h->lists[k]);
    free(h->lists); free(h->sizes); free(h->caps);
    free(h->lengths); free(h->seqnos); free(h->counter); free(h->touched);
    free(h);
}

void vstpu_postings_add(void *hp, const uint32_t *kmers, int64_t nk,
                        int64_t length, int64_t seqno) {
    postings_t *h = (postings_t *)hp;
    int64_t pos = h->npos;
    if (pos == h->pos_cap) {
        h->pos_cap *= 2;
        h->lengths = (int64_t *)realloc(h->lengths,
                                        (size_t)h->pos_cap * sizeof(int64_t));
        h->seqnos = (int64_t *)realloc(h->seqnos,
                                       (size_t)h->pos_cap * sizeof(int64_t));
        h->counter = (int32_t *)realloc(h->counter,
                                        (size_t)h->pos_cap * sizeof(int32_t));
        memset(h->counter + pos, 0, (size_t)(h->pos_cap - pos)
               * sizeof(int32_t));
        h->touched = (int32_t *)realloc(h->touched,
                                        (size_t)h->pos_cap * sizeof(int32_t));
    }
    h->lengths[pos] = length;
    h->seqnos[pos] = seqno;
    for (int64_t i = 0; i < nk; i++) {
        uint32_t k = kmers[i];
        if (h->sizes[k] == h->caps[k]) {
            h->caps[k] = h->caps[k] ? h->caps[k] * 2 : 4;
            h->lists[k] = (int32_t *)realloc(h->lists[k],
                                             (size_t)h->caps[k]
                                             * sizeof(int32_t));
        }
        h->lists[k][h->sizes[k]++] = (int32_t)pos;
    }
    h->npos = pos + 1;
}

int64_t vstpu_postings_topk(void *hp, const uint32_t *qkmers, int64_t nk,
                            int64_t tophits, int64_t minmatches,
                            int64_t *out_seqno, int64_t *out_count);

/* Bulk add: n entries with concatenated k-mer lists (off[n+1] offsets),
 * lengths/seqnos per entry.  One call replaces n ctypes round-trips;
 * per-kmer lists are pre-reserved to exact size (no doubling churn). */
void vstpu_postings_add_batch(void *hp, const uint32_t *kmers,
                              const int64_t *off, int64_t n,
                              const int64_t *lengths,
                              const int64_t *seqnos) {
    postings_t *h = (postings_t *)hp;
    int64_t total = n ? off[n] - off[0] : 0;
    const uint32_t *base = kmers + (n ? off[0] : 0);
    int32_t *occ = (int32_t *)calloc((size_t)h->hashsize, sizeof(int32_t));
    for (int64_t i = 0; i < total; i++) occ[base[i]]++;
    for (int64_t i = 0; i < total; i++) {
        uint32_t k = base[i];
        if (occ[k]) {
            int64_t need = h->sizes[k] + occ[k];
            if (need > h->caps[k]) {
                h->lists[k] = (int32_t *)realloc(
                    h->lists[k], (size_t)need * sizeof(int32_t));
                h->caps[k] = need;
            }
            occ[k] = 0;
        }
    }
    free(occ);
    for (int64_t i = 0; i < n; i++)
        vstpu_postings_add(hp, kmers + off[i], off[i + 1] - off[i],
                           lengths[i], seqnos[i]);
}

/* batched top-k over many queries (OpenMP, per-thread counter scratch).
 * qkmers: concatenated query k-mer lists with qoff[nq+1] offsets;
 * minmatches per query; outputs (nq, tophits) + per-query counts. */
void vstpu_postings_topk_batch(void *hp, const uint32_t *qkmers,
                               const int64_t *qoff, int64_t nq,
                               int64_t tophits, const int64_t *minmatches,
                               int64_t *out_seqno, int64_t *out_count,
                               int64_t *out_n) {
    postings_t *h = (postings_t *)hp;
    #pragma omp parallel
    {
        /* clone the handle header with private counter/touched scratch */
        postings_t local = *h;
        local.counter = (int32_t *)calloc((size_t)h->pos_cap,
                                          sizeof(int32_t));
        local.touched = (int32_t *)malloc((size_t)h->pos_cap
                                          * sizeof(int32_t));
        #pragma omp for schedule(dynamic, 16)
        for (int64_t qi = 0; qi < nq; qi++) {
            out_n[qi] = vstpu_postings_topk(
                &local, qkmers + qoff[qi], qoff[qi + 1] - qoff[qi],
                tophits, minmatches[qi],
                out_seqno + qi * tophits, out_count + qi * tophits);
        }
        free(local.counter); free(local.touched);
    }
}

/* Batched counts: nq probe k-mer lists (concatenated, qoff[nq+1]) against
 * the postings; per probe the touched positions + counts land at
 * out_pos/out_cnt + qi*cap (cap >= npos), out_n[qi] = touched count.
 * OpenMP with per-thread counter scratch. */
void vstpu_postings_counts_batch(void *hp, const uint32_t *qkmers,
                                 const int64_t *qoff, int64_t nq,
                                 int64_t cap, int32_t *out_pos,
                                 int32_t *out_cnt, int64_t *out_n) {
    postings_t *h = (postings_t *)hp;
    #pragma omp parallel
    {
        int32_t *counter = (int32_t *)calloc((size_t)h->pos_cap,
                                             sizeof(int32_t));
        #pragma omp for schedule(dynamic, 16)
        for (int64_t qi = 0; qi < nq; qi++) {
            const uint32_t *qk = qkmers + qoff[qi];
            int64_t nk = qoff[qi + 1] - qoff[qi];
            int32_t *opos = out_pos + qi * cap;
            int32_t *ocnt = out_cnt + qi * cap;
            int64_t ntouched = 0;
            for (int64_t i = 0; i < nk; i++) {
                uint32_t k = qk[i];
                const int32_t *lst = h->lists[k];
                int64_t sz = h->sizes[k];
                for (int64_t j = 0; j < sz; j++) {
                    int32_t p = lst[j];
                    if (counter[p]++ == 0) opos[ntouched++] = p;
                    if (counter[p] > 32767) counter[p] = 32767;
                }
            }
            for (int64_t t = 0; t < ntouched; t++) {
                ocnt[t] = counter[opos[t]];
                counter[opos[t]] = 0;
            }
            out_n[qi] = ntouched;
        }
        free(counter);
    }
}

/* Fused cross-counts: shared-unique-kmer counts between every probe list
 * and every target list, thresholded per target.  Builds a throwaway
 * arena CSR over the targets (3 linear passes — no per-kmer realloc
 * churn) and probes each query against it.  Outputs, per query q, the
 * (target, count) pairs with count >= minm[target], packed into
 * out_t/out_cnt with out_off[nq+1] offsets (caller sizes cap = nq*nt).
 * Used by the chimera round repair tracker (round parts x round queries;
 * reference count semantics: searchcore.cpp:260-340). */
void vstpu_cross_counts(const uint32_t *tk, const int64_t *toff, int64_t nt,
                        const uint32_t *qk, const int64_t *qoff, int64_t nq,
                        int64_t hashsize, const int64_t *minm,
                        int32_t *out_t, int32_t *out_cnt, int64_t *out_off,
                        int64_t cap) {
    int64_t total = nt ? toff[nt] - toff[0] : 0;
    const uint32_t *tbase = tk + (nt ? toff[0] : 0);
    int32_t *kc = (int32_t *)calloc((size_t)hashsize, sizeof(int32_t));
    for (int64_t i = 0; i < total; i++) kc[tbase[i]]++;
    int64_t *start = (int64_t *)malloc((size_t)(hashsize + 1)
                                       * sizeof(int64_t));
    start[0] = 0;
    for (int64_t k = 0; k < hashsize; k++) start[k + 1] = start[k] + kc[k];
    int32_t *plist = (int32_t *)malloc((size_t)(total ? total : 1)
                                       * sizeof(int32_t));
    memset(kc, 0, (size_t)hashsize * sizeof(int32_t));
    for (int64_t t = 0; t < nt; t++) {
        for (int64_t i = toff[t]; i < toff[t + 1]; i++) {
            uint32_t k = tk[i];
            plist[start[k] + kc[k]++] = (int32_t)t;
        }
    }
    int32_t *counter = (int32_t *)calloc((size_t)(nt ? nt : 1),
                                         sizeof(int32_t));
    int32_t *touched = (int32_t *)malloc((size_t)(nt ? nt : 1)
                                         * sizeof(int32_t));
    int64_t w = 0;
    for (int64_t q = 0; q < nq; q++) {
        out_off[q] = w;
        int64_t ntouch = 0;
        for (int64_t i = qoff[q]; i < qoff[q + 1]; i++) {
            uint32_t k = qk[i];
            for (int64_t j = start[k]; j < start[k] + kc[k]; j++) {
                int32_t t = plist[j];
                if (counter[t]++ == 0) touched[ntouch++] = t;
            }
        }
        for (int64_t x = 0; x < ntouch; x++) {
            int32_t t = touched[x];
            int32_t c = counter[t];
            counter[t] = 0;
            if (c >= minm[t] && w < cap) {
                out_t[w] = t;
                out_cnt[w] = c;
                w++;
            }
        }
    }
    out_off[nq] = w;
    free(kc); free(start); free(plist); free(counter); free(touched);
}

/* touched positions + shared counts only (no heap): the clustering
 * same-round repair needs per-extra shared-kmer counts. */
int64_t vstpu_postings_counts(void *hp, const uint32_t *qkmers, int64_t nk,
                              int64_t *out_pos, int64_t *out_cnt) {
    postings_t *h = (postings_t *)hp;
    int64_t ntouched = 0;
    for (int64_t i = 0; i < nk; i++) {
        uint32_t k = qkmers[i];
        const int32_t *lst = h->lists[k];
        int64_t sz = h->sizes[k];
        for (int64_t j = 0; j < sz; j++) {
            int32_t p = lst[j];
            if (h->counter[p]++ == 0) h->touched[ntouched++] = p;
            if (h->counter[p] > 32767) h->counter[p] = 32767;
        }
    }
    for (int64_t t = 0; t < ntouched; t++) {
        int32_t p = h->touched[t];
        out_pos[t] = p;
        out_cnt[t] = h->counter[p];
        h->counter[p] = 0;
    }
    return ntouched;
}

/* candidate order: count desc, length asc, seqno asc (minheap_compare).
 * Min-heap keeps the WORST candidate at the root. */
static int cand_worse(const postings_t *h, int32_t pa, int32_t ca,
                      int32_t pb, int32_t cb) {
    /* is (pa, ca) worse than (pb, cb)? */
    if (ca != cb) return ca < cb;
    if (h->lengths[pa] != h->lengths[pb])
        return h->lengths[pa] > h->lengths[pb];
    return h->seqnos[pa] > h->seqnos[pb];
}

int64_t vstpu_postings_topk(void *hp, const uint32_t *qkmers, int64_t nk,
                            int64_t tophits, int64_t minmatches,
                            int64_t *out_seqno, int64_t *out_count) {
    postings_t *h = (postings_t *)hp;
    int64_t ntouched = 0;
    if (nk <= 32767) {
        /* counts are bounded by the unique probe-kmer count — the 32767
         * saturation (searchcore.cpp:311) is unreachable, skip the check */
        for (int64_t i = 0; i < nk; i++) {
            uint32_t k = qkmers[i];
            const int32_t *lst = h->lists[k];
            int64_t sz = h->sizes[k];
            for (int64_t j = 0; j < sz; j++) {
                int32_t p = lst[j];
                if (h->counter[p]++ == 0) h->touched[ntouched++] = p;
            }
        }
    } else {
        for (int64_t i = 0; i < nk; i++) {
            uint32_t k = qkmers[i];
            const int32_t *lst = h->lists[k];
            int64_t sz = h->sizes[k];
            for (int64_t j = 0; j < sz; j++) {
                int32_t p = lst[j];
                if (h->counter[p]++ == 0) h->touched[ntouched++] = p;
                if (h->counter[p] > 32767) h->counter[p] = 32767;
            }
        }
    }
    /* heap of (pos, count), capacity tophits, worst at root */
    int32_t *hpos = (int32_t *)malloc((size_t)tophits * sizeof(int32_t));
    int32_t *hcnt = (int32_t *)malloc((size_t)tophits * sizeof(int32_t));
    int64_t hn = 0;
    /* minmatches <= 0 admits zero-count positions (reference scans the
     * whole counter array, searchcore.cpp:320-337): walk every position */
    int64_t scan_all = minmatches <= 0;
    int64_t niter = scan_all ? h->npos : ntouched;
    for (int64_t t = 0; t < niter; t++) {
        int32_t p = scan_all ? (int32_t)t : h->touched[t];
        int32_t c = h->counter[p];
        if (!scan_all) h->counter[p] = 0;
        if (c < minmatches) continue;
        if (hn < tophits) {
            /* sift up */
            int64_t i = hn++;
            hpos[i] = p; hcnt[i] = c;
            while (i > 0) {
                int64_t par = (i - 1) / 2;
                if (cand_worse(h, hpos[i], hcnt[i], hpos[par], hcnt[par])) {
                    int32_t tp = hpos[i], tc = hcnt[i];
                    hpos[i] = hpos[par]; hcnt[i] = hcnt[par];
                    hpos[par] = tp; hcnt[par] = tc;
                    i = par;
                } else break;
            }
        } else if (tophits > 0
                   && cand_worse(h, hpos[0], hcnt[0], p, c)) {
            /* replace root, sift down */
            hpos[0] = p; hcnt[0] = c;
            int64_t i = 0;
            for (;;) {
                int64_t l = 2 * i + 1, r = l + 1, w = i;
                if (l < hn && cand_worse(h, hpos[l], hcnt[l],
                                         hpos[w], hcnt[w])) w = l;
                if (r < hn && cand_worse(h, hpos[r], hcnt[r],
                                         hpos[w], hcnt[w])) w = r;
                if (w == i) break;
                int32_t tp = hpos[i], tc = hcnt[i];
                hpos[i] = hpos[w]; hcnt[i] = hcnt[w];
                hpos[w] = tp; hcnt[w] = tc;
                i = w;
            }
        }
    }
    /* heap -> best-first: repeatedly pop worst to the back */
    int64_t m = hn;
    while (hn > 1) {
        int32_t tp = hpos[0], tc = hcnt[0];
        hn--;
        hpos[0] = hpos[hn]; hcnt[0] = hcnt[hn];
        hpos[hn] = tp; hcnt[hn] = tc;
        int64_t i = 0;
        for (;;) {
            int64_t l = 2 * i + 1, r = l + 1, w = i;
            if (l < hn && cand_worse(h, hpos[l], hcnt[l],
                                     hpos[w], hcnt[w])) w = l;
            if (r < hn && cand_worse(h, hpos[r], hcnt[r],
                                     hpos[w], hcnt[w])) w = r;
            if (w == i) break;
            int32_t tp2 = hpos[i], tc2 = hcnt[i];
            hpos[i] = hpos[w]; hcnt[i] = hcnt[w];
            hpos[w] = tp2; hcnt[w] = tc2;
            i = w;
        }
    }
    for (int64_t i = 0; i < m; i++) {
        out_seqno[i] = h->seqnos[hpos[i]];
        out_count[i] = hcnt[i];
    }
    if (scan_all)  /* counters were not reset during the scan */
        for (int64_t t = 0; t < ntouched; t++)
            h->counter[h->touched[t]] = 0;
    free(hpos); free(hcnt);
    return m;
}

/* ---- scalar Needleman-Wunsch (small-batch host tier) ----
 *
 * Exact mirror of the scalar oracle (vsearch_tpu/ops/nw.py dp_matrix_host /
 * backtrack_ops), itself bit-identical to the reference SIMD engine
 * (src/core/align_simd.cpp onestep/backtrack16): position-class affine
 * gaps, direction-bit priorities, 16-bit overflow detection thresholds.
 * Used for alignment batches too small to amortize a device dispatch
 * (clustering/chimera rounds, search residual walks).
 *
 * scheme: [match, mismatch, go_q_l, go_t_l, go_q_i, go_t_i, go_q_r,
 *          go_t_r, ge_q_l, ge_t_l, ge_q_i, ge_t_i, ge_q_r, ge_t_r,
 *          n_mismatch]
 * out per pair: [score, overflow, aligned, matches, mismatches, gaps,
 *                cigar_len]; cigar written at cigars + p * cigar_stride. */

#define NW_DIR_UP 1
#define NW_DIR_LEFT 2
#define NW_DIR_EXTUP 4
#define NW_DIR_EXTLEFT 8

static void nw_score_matrix(const int64_t *s, int32_t sm[16][16]) {
    static const unsigned char amb[16] =
        {1, 0, 0, 1, 0, 1, 1, 1, 0, 1, 1, 1, 1, 1, 1, 1};
    int32_t match = (int32_t)s[0], mismatch = (int32_t)s[1];
    int n_mismatch = (int)s[14];
    for (int i = 0; i < 16; i++)
        for (int j = 0; j < 16; j++) {
            if (n_mismatch && (i == 15 || j == 15)) sm[i][j] = mismatch;
            else if (amb[i] || amb[j]) sm[i][j] = 0;
            else if (i == j) sm[i][j] = match;
            else sm[i][j] = mismatch;
        }
}

/* one pair; dirs/E/H/ops are caller scratch (dirs m*n bytes, E/H m int64,
 * ops m+n+1 bytes, qc m bytes).  Returns cigar length. */
static int64_t nw_align_one(const unsigned char *q, int64_t m,
                            const unsigned char *t, int64_t n,
                            const int64_t *s, int32_t sm[16][16],
                            unsigned char *restrict dirs,
                            int32_t *restrict E_row,
                            int32_t *restrict H_prev, int16_t *ops,
                            unsigned char *restrict qc,
                            char *cigar, int64_t *out) {
    int64_t go_q_l = s[2], go_t_l = s[3], go_q_i = s[4], go_t_i = s[5],
            go_q_r = s[6], go_t_r = s[7], ge_q_l = s[8], ge_t_l = s[9],
            ge_q_i = s[10], ge_t_i = s[11], ge_q_r = s[12], ge_t_r = s[13];
    int64_t QR_q_i = go_q_i + ge_q_i, QR_q_r = go_q_r + ge_q_r;
    int64_t QR_t_i = go_t_i + ge_t_i, QR_t_r = go_t_r + ge_t_r;
    int64_t gp_max = 0;
    int64_t opens[6] = {go_q_l + ge_q_l, go_q_i + ge_q_i, go_q_r + ge_q_r,
                        go_t_l + ge_t_l, go_t_i + ge_t_i, go_t_r + ge_t_r};
    for (int k = 0; k < 6; k++) if (opens[k] > gp_max) gp_max = opens[k];
    int32_t score_min = (int32_t)(-32768 + gp_max);
    int32_t hmin = 0, hmax = 0;

    for (int64_t i = 0; i < m; i++) { E_row[i] = 0; H_prev[i] = 0; }
    for (int64_t i = 0; i < m; i++) qc[i] = map4[q[i]];

    /* int32 cells: every reachable value is far inside int32 (penalties
     * are clamped to SHRT_MAX/5 and lengths to 65535), and the overflow
     * thresholds fire long before int32 wraps */
    int32_t QRti = (int32_t)QR_t_i, QRtr = (int32_t)QR_t_r;
    int32_t QRqi = (int32_t)QR_q_i, QRqr = (int32_t)QR_q_r;
    int32_t Rti = (int32_t)ge_t_i, Rtr = (int32_t)ge_t_r;
    int32_t Rqi = (int32_t)ge_q_i, Rqr = (int32_t)ge_q_r;
    for (int64_t j = 0; j < n; j++) {
        int right_t = (j == n - 1);
        int32_t QR_t = right_t ? QRtr : QRti;
        int32_t R_t = right_t ? Rtr : Rti;
        int32_t h_boundary_top = (int32_t)(-(go_q_l + (j + 1) * ge_q_l));
        int32_t h_diag = (j > 0) ? (int32_t)(-(go_q_l + j * ge_q_l)) : 0;
        int32_t F = h_boundary_top - QR_t;
        unsigned char *restrict dcol = dirs + j * m;  /* sequential writes */
        const int32_t *restrict smt = sm[map4[t[j]]];
        int64_t i_last = m - 1;
        if (j == 0) {
            for (int64_t i = 0; i < m; i++) {
                int32_t QR_q = (i == i_last) ? QRqr : QRqi;
                int32_t R_q = (i == i_last) ? Rqr : Rqi;
                int32_t E = (int32_t)(-(go_t_l + (i + 1) * ge_t_l)) - QR_q;
                int32_t diag_in = (i > 0)
                    ? (int32_t)(-(go_t_l + i * ge_t_l)) : 0;
                int32_t h = diag_in + smt[qc[i]];
                unsigned d = 0;
                if (F > h) { d |= NW_DIR_UP; h = F; }
                if (E > h) { d |= NW_DIR_LEFT; h = E; }
                if (h < hmin) hmin = h;
                if (h > hmax) hmax = h;
                int32_t HF = h - QR_t, Fx = F - R_t;
                int32_t F_next;
                if (Fx > HF) { d |= NW_DIR_EXTUP; F_next = Fx; }
                else F_next = HF;
                int32_t HE = h - QR_q, Ex = E - R_q;
                if (Ex > HE) { d |= NW_DIR_EXTLEFT; E_row[i] = Ex; }
                else E_row[i] = HE;
                dcol[i] = (unsigned char)d;
                H_prev[i] = h;
                F = F_next;
            }
            continue;
        }
        /* interior rows (i < m-1) in one branch-light pass */
        int32_t h_diag_next;
        for (int64_t i = 0; i < i_last; i++) {
            int32_t E = E_row[i];
            int32_t h = h_diag + smt[qc[i]];
            unsigned d = 0;
            if (F > h) { d |= NW_DIR_UP; h = F; }
            if (E > h) { d |= NW_DIR_LEFT; h = E; }
            if (h < hmin) hmin = h;
            if (h > hmax) hmax = h;
            int32_t HF = h - QR_t, Fx = F - R_t;
            if (Fx > HF) { d |= NW_DIR_EXTUP; F = Fx; }
            else F = HF;
            int32_t HE = h - QRqi, Ex = E - Rqi;
            if (Ex > HE) { d |= NW_DIR_EXTLEFT; E_row[i] = Ex; }
            else E_row[i] = HE;
            dcol[i] = (unsigned char)d;
            h_diag = H_prev[i];
            H_prev[i] = h;
        }
        {   /* last row: right-class query penalties */
            int64_t i = i_last;
            int32_t E = E_row[i];
            int32_t h = h_diag + smt[qc[i]];
            unsigned d = 0;
            if (F > h) { d |= NW_DIR_UP; h = F; }
            if (E > h) { d |= NW_DIR_LEFT; h = E; }
            if (h < hmin) hmin = h;
            if (h > hmax) hmax = h;
            int32_t HF = h - QR_t, Fx = F - R_t;
            if (Fx > HF) { d |= NW_DIR_EXTUP; F = Fx; }
            else F = HF;
            int32_t HE = h - QRqr, Ex = E - Rqr;
            if (Ex > HE) { d |= NW_DIR_EXTLEFT; E_row[i] = Ex; }
            else E_row[i] = HE;
            dcol[i] = (unsigned char)d;
            H_prev[i] = h;
        }
        (void)h_diag_next;
    }
    int64_t score = H_prev[m - 1];
    if (hmin <= score_min || hmax >= 32767) {
        out[0] = 32767; out[1] = 1; out[2] = 0; out[3] = 0; out[4] = 0;
        out[5] = 0; out[6] = 0;
        return 0;
    }
    /* backtrack -> end-to-front op codes (0 none, 1 M, 2 D, 3 I) */
    int64_t i = m - 1, j = n - 1, k = 0;
    int prev = 0;
    while (i >= 0 && j >= 0) {
        unsigned d = dirs[j * m + i];
        int op;
        if (prev == 3 && (d & NW_DIR_EXTLEFT)) { op = 3; j--; }
        else if (prev == 2 && (d & NW_DIR_EXTUP)) { op = 2; i--; }
        else if (d & NW_DIR_LEFT) { op = 3; j--; }
        else if (d & NW_DIR_UP) { op = 2; i--; }
        else { op = 1; i--; j--; }
        ops[k++] = (int16_t)op;
        prev = op;
    }
    while (i >= 0) { ops[k++] = 2; i--; }
    while (j >= 0) { ops[k++] = 3; j--; }
    /* ops are front-to-back along the backtrack == END-TO-FRONT order */
    int64_t stats[4];
    int64_t clen = assemble_core(ops, 1, (int)k, q, t, (int)s[14],
                                 cigar, stats);
    out[0] = score; out[1] = 0;
    out[2] = stats[0]; out[3] = stats[1]; out[4] = stats[2];
    out[5] = stats[3]; out[6] = clen;
    return clen;
}

#ifdef __AVX2__
#include <immintrin.h>

/* Inter-pair SIMD forward: 8 pairs advance per 256-bit int32 vector, one
 * lane per pair (the reference's channel scheme, align_simd.cpp:86-87, at
 * 8 x int32 instead of 8 x int16 — no saturation needed, the overflow
 * thresholds are checked per lane).  Lanes beyond a pair's (m, n) compute
 * garbage that provably never feeds a valid cell (the F chain only flows
 * down rows, E only along columns); per-lane boundary penalty classes are
 * selected by comparing i/j against the lane's limits.  Direction bytes
 * are stored lane-interleaved: dirs[(j*max_m + i)*8 + lane]. */
static void nw_forward_x8(const unsigned char *qc8, /* (max_m, 8) codes */
                          const unsigned char *tc8, /* (max_n, 8) codes */
                          const int32_t *mlen, const int32_t *nlen,
                          int64_t max_m, int64_t max_n,
                          const int64_t *s, const int32_t *sm_flat,
                          unsigned char *dirs8, int32_t *E8, int32_t *H8,
                          int32_t *score, int32_t *over) {
    __m256i m_v = _mm256_loadu_si256((const __m256i *)mlen);
    __m256i n_v = _mm256_loadu_si256((const __m256i *)nlen);
    __m256i ilast_v = _mm256_sub_epi32(m_v, _mm256_set1_epi32(1));
    __m256i jlast_v = _mm256_sub_epi32(n_v, _mm256_set1_epi32(1));
    int32_t go_q_l = (int32_t)s[2], go_t_l = (int32_t)s[3];
    int32_t ge_q_l = (int32_t)s[8], ge_t_l = (int32_t)s[9];
    __m256i QRqi = _mm256_set1_epi32((int32_t)(s[4] + s[10]));
    __m256i QRqr = _mm256_set1_epi32((int32_t)(s[6] + s[12]));
    __m256i QRti = _mm256_set1_epi32((int32_t)(s[5] + s[11]));
    __m256i QRtr = _mm256_set1_epi32((int32_t)(s[7] + s[13]));
    __m256i Rqi = _mm256_set1_epi32((int32_t)s[10]);
    __m256i Rqr = _mm256_set1_epi32((int32_t)s[12]);
    __m256i Rti = _mm256_set1_epi32((int32_t)s[11]);
    __m256i Rtr = _mm256_set1_epi32((int32_t)s[13]);
    __m256i hmin = _mm256_setzero_si256();
    __m256i hmax = _mm256_setzero_si256();
    __m256i score_v = _mm256_setzero_si256();

    for (int64_t i = 0; i < max_m; i++) {
        _mm256_storeu_si256((__m256i *)(E8 + i * 8), _mm256_setzero_si256());
        _mm256_storeu_si256((__m256i *)(H8 + i * 8), _mm256_setzero_si256());
    }

    for (int64_t j = 0; j < max_n; j++) {
        __m256i j_v = _mm256_set1_epi32((int32_t)j);
        __m256i right_t = _mm256_cmpeq_epi32(j_v, jlast_v);
        __m256i QR_t = _mm256_blendv_epi8(QRti, QRtr, right_t);
        __m256i R_t = _mm256_blendv_epi8(Rti, Rtr, right_t);
        __m256i valid_j = _mm256_cmpgt_epi32(n_v, j_v);
        /* boundary above: H[-1][j] and H[-1][j-1] */
        __m256i top = _mm256_set1_epi32(
            (int32_t)(-(go_q_l + (j + 1) * ge_q_l)));
        __m256i hdiag = _mm256_set1_epi32(
            j > 0 ? (int32_t)(-(go_q_l + (int32_t)j * ge_q_l)) : 0);
        __m256i F = _mm256_sub_epi32(top, QR_t);
        /* target codes for this column, per lane */
        __m256i tcode = _mm256_cvtepu8_epi32(
            _mm_loadl_epi64((const __m128i *)(tc8 + j * 8)));
        __m256i tbase = _mm256_slli_epi32(tcode, 4);
        unsigned char *dcol = dirs8 + (size_t)j * max_m * 8;
        int j0 = (j == 0);
        for (int64_t i = 0; i < max_m; i++) {
            __m256i i_v = _mm256_set1_epi32((int32_t)i);
            __m256i right_q = _mm256_cmpeq_epi32(i_v, ilast_v);
            __m256i QR_q = _mm256_blendv_epi8(QRqi, QRqr, right_q);
            __m256i R_q = _mm256_blendv_epi8(Rqi, Rqr, right_q);
            __m256i E, diag_in;
            if (j0) {
                E = _mm256_sub_epi32(_mm256_set1_epi32(
                    (int32_t)(-(go_t_l + (i + 1) * ge_t_l))), QR_q);
                diag_in = _mm256_set1_epi32(
                    i > 0 ? (int32_t)(-(go_t_l + (int32_t)i * ge_t_l)) : 0);
            } else {
                E = _mm256_loadu_si256((const __m256i *)(E8 + i * 8));
                diag_in = hdiag;
            }
            __m256i qcode = _mm256_cvtepu8_epi32(
                _mm_loadl_epi64((const __m128i *)(qc8 + i * 8)));
            __m256i smi = _mm256_or_si256(tbase, qcode);
            __m256i V = _mm256_i32gather_epi32(sm_flat, smi, 4);
            __m256i h = _mm256_add_epi32(diag_in, V);
            __m256i dup = _mm256_cmpgt_epi32(F, h);
            h = _mm256_max_epi32(h, F);
            __m256i dleft = _mm256_cmpgt_epi32(E, h);
            h = _mm256_max_epi32(h, E);
            /* track hmin/hmax only for valid cells */
            __m256i valid = _mm256_and_si256(
                valid_j, _mm256_cmpgt_epi32(m_v, i_v));
            __m256i hv = _mm256_and_si256(h, valid);
            hmin = _mm256_min_epi32(hmin, hv);
            hmax = _mm256_max_epi32(hmax, hv);
            __m256i HF = _mm256_sub_epi32(h, QR_t);
            __m256i Fx = _mm256_sub_epi32(F, R_t);
            __m256i dextup = _mm256_cmpgt_epi32(Fx, HF);
            F = _mm256_max_epi32(Fx, HF);
            __m256i HE = _mm256_sub_epi32(h, QR_q);
            __m256i Ex = _mm256_sub_epi32(E, R_q);
            __m256i dextleft = _mm256_cmpgt_epi32(Ex, HE);
            _mm256_storeu_si256((__m256i *)(E8 + i * 8),
                                _mm256_max_epi32(Ex, HE));
            /* direction bits 1/2/4/8 from the four masks */
            __m256i d = _mm256_and_si256(dup, _mm256_set1_epi32(1));
            d = _mm256_or_si256(d, _mm256_and_si256(
                dleft, _mm256_set1_epi32(2)));
            d = _mm256_or_si256(d, _mm256_and_si256(
                dextup, _mm256_set1_epi32(4)));
            d = _mm256_or_si256(d, _mm256_and_si256(
                dextleft, _mm256_set1_epi32(8)));
            /* pack 8 x int32 -> 8 bytes (values < 16) */
            __m256i shuf = _mm256_shuffle_epi8(d, _mm256_setr_epi8(
                0, 4, 8, 12, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1,
                0, 4, 8, 12, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1));
            __m128i lo = _mm256_castsi256_si128(shuf);
            __m128i hi = _mm256_extracti128_si256(shuf, 1);
            __m128i packed = _mm_unpacklo_epi32(lo, hi);
            _mm_storel_epi64((__m128i *)(dcol + i * 8), packed);
            /* capture the final score at (m-1, n-1) per lane */
            __m256i at_end = _mm256_and_si256(right_q, right_t);
            score_v = _mm256_blendv_epi8(score_v, h, at_end);
            hdiag = _mm256_loadu_si256((const __m256i *)(H8 + i * 8));
            _mm256_storeu_si256((__m256i *)(H8 + i * 8), h);
        }
    }
    _mm256_storeu_si256((__m256i *)score, score_v);
    int32_t hmin_a[8], hmax_a[8];
    _mm256_storeu_si256((__m256i *)hmin_a, hmin);
    _mm256_storeu_si256((__m256i *)hmax_a, hmax);
    int64_t gp_max = 0;
    int64_t opens[6] = {s[2] + s[8], s[4] + s[10], s[6] + s[12],
                        s[3] + s[9], s[5] + s[11], s[7] + s[13]};
    for (int k = 0; k < 6; k++) if (opens[k] > gp_max) gp_max = opens[k];
    int32_t score_min = (int32_t)(-32768 + gp_max);
    for (int l = 0; l < 8; l++)
        over[l] = (hmin_a[l] <= score_min) || (hmax_a[l] >= 32767);
}

#if defined(__AVX512F__) && defined(__AVX512BW__)
/* 16 pairs per 512-bit vector; same per-lane semantics as nw_forward_x8.
 * dirs16[(j*max_m + i)*16 + lane]. */
static void nw_forward_x16(const unsigned char *qc16,
                           const unsigned char *tc16,
                           const int32_t *mlen, const int32_t *nlen,
                           int64_t max_m, int64_t max_n,
                           const int64_t *s, const int32_t *sm_flat,
                           unsigned char *dirs16, int32_t *E16,
                           int32_t *H16, int32_t *score, int32_t *over) {
    __m512i m_v = _mm512_loadu_si512((const void *)mlen);
    __m512i n_v = _mm512_loadu_si512((const void *)nlen);
    __m512i one = _mm512_set1_epi32(1);
    __m512i ilast_v = _mm512_sub_epi32(m_v, one);
    __m512i jlast_v = _mm512_sub_epi32(n_v, one);
    int32_t go_q_l = (int32_t)s[2], go_t_l = (int32_t)s[3];
    int32_t ge_q_l = (int32_t)s[8], ge_t_l = (int32_t)s[9];
    __m512i QRqi = _mm512_set1_epi32((int32_t)(s[4] + s[10]));
    __m512i QRqr = _mm512_set1_epi32((int32_t)(s[6] + s[12]));
    __m512i QRti = _mm512_set1_epi32((int32_t)(s[5] + s[11]));
    __m512i QRtr = _mm512_set1_epi32((int32_t)(s[7] + s[13]));
    __m512i Rqi = _mm512_set1_epi32((int32_t)s[10]);
    __m512i Rqr = _mm512_set1_epi32((int32_t)s[12]);
    __m512i Rti = _mm512_set1_epi32((int32_t)s[11]);
    __m512i Rtr = _mm512_set1_epi32((int32_t)s[13]);
    __m512i hmin = _mm512_setzero_si512();
    __m512i hmax = _mm512_setzero_si512();
    __m512i score_v = _mm512_setzero_si512();

    for (int64_t i = 0; i < max_m; i++) {
        _mm512_storeu_si512((void *)(E16 + i * 16), _mm512_setzero_si512());
        _mm512_storeu_si512((void *)(H16 + i * 16), _mm512_setzero_si512());
    }

    for (int64_t j = 0; j < max_n; j++) {
        __m512i j_v = _mm512_set1_epi32((int32_t)j);
        __mmask16 right_t = _mm512_cmpeq_epi32_mask(j_v, jlast_v);
        __m512i QR_t = _mm512_mask_blend_epi32(right_t, QRti, QRtr);
        __m512i R_t = _mm512_mask_blend_epi32(right_t, Rti, Rtr);
        __mmask16 valid_j = _mm512_cmpgt_epi32_mask(n_v, j_v);
        __m512i top = _mm512_set1_epi32(
            (int32_t)(-(go_q_l + (j + 1) * ge_q_l)));
        __m512i hdiag = _mm512_set1_epi32(
            j > 0 ? (int32_t)(-(go_q_l + (int32_t)j * ge_q_l)) : 0);
        __m512i F = _mm512_sub_epi32(top, QR_t);
        __m512i tcode = _mm512_cvtepu8_epi32(
            _mm_loadu_si128((const __m128i *)(tc16 + j * 16)));
        __m512i tbase = _mm512_slli_epi32(tcode, 4);
        unsigned char *dcol = dirs16 + (size_t)j * max_m * 16;
        int j0 = (j == 0);
        for (int64_t i = 0; i < max_m; i++) {
            __m512i i_v = _mm512_set1_epi32((int32_t)i);
            __mmask16 right_q = _mm512_cmpeq_epi32_mask(i_v, ilast_v);
            __m512i QR_q = _mm512_mask_blend_epi32(right_q, QRqi, QRqr);
            __m512i R_q = _mm512_mask_blend_epi32(right_q, Rqi, Rqr);
            __m512i E, diag_in;
            if (j0) {
                E = _mm512_sub_epi32(_mm512_set1_epi32(
                    (int32_t)(-(go_t_l + (i + 1) * ge_t_l))), QR_q);
                diag_in = _mm512_set1_epi32(
                    i > 0 ? (int32_t)(-(go_t_l + (int32_t)i * ge_t_l)) : 0);
            } else {
                E = _mm512_loadu_si512((const void *)(E16 + i * 16));
                diag_in = hdiag;
            }
            __m512i qcode = _mm512_cvtepu8_epi32(
                _mm_loadu_si128((const __m128i *)(qc16 + i * 16)));
            __m512i smi = _mm512_or_si512(tbase, qcode);
            __m512i V = _mm512_i32gather_epi32(smi, sm_flat, 4);
            __m512i h = _mm512_add_epi32(diag_in, V);
            __mmask16 dup = _mm512_cmpgt_epi32_mask(F, h);
            h = _mm512_max_epi32(h, F);
            __mmask16 dleft = _mm512_cmpgt_epi32_mask(E, h);
            h = _mm512_max_epi32(h, E);
            __mmask16 valid = valid_j & _mm512_cmpgt_epi32_mask(m_v, i_v);
            __m512i hv = _mm512_maskz_mov_epi32(valid, h);
            hmin = _mm512_min_epi32(hmin, hv);
            hmax = _mm512_max_epi32(hmax, hv);
            __m512i HF = _mm512_sub_epi32(h, QR_t);
            __m512i Fx = _mm512_sub_epi32(F, R_t);
            __mmask16 dextup = _mm512_cmpgt_epi32_mask(Fx, HF);
            F = _mm512_max_epi32(Fx, HF);
            __m512i HE = _mm512_sub_epi32(h, QR_q);
            __m512i Ex = _mm512_sub_epi32(E, R_q);
            __mmask16 dextleft = _mm512_cmpgt_epi32_mask(Ex, HE);
            _mm512_storeu_si512((void *)(E16 + i * 16),
                                _mm512_max_epi32(Ex, HE));
            __m512i d = _mm512_maskz_set1_epi32(dup, 1);
            d = _mm512_or_si512(d, _mm512_maskz_set1_epi32(dleft, 2));
            d = _mm512_or_si512(d, _mm512_maskz_set1_epi32(dextup, 4));
            d = _mm512_or_si512(d, _mm512_maskz_set1_epi32(dextleft, 8));
            _mm_storeu_si128((__m128i *)(dcol + i * 16),
                             _mm512_cvtepi32_epi8(d));
            __mmask16 at_end = right_q & right_t;
            score_v = _mm512_mask_blend_epi32(at_end, score_v, h);
            hdiag = _mm512_loadu_si512((const void *)(H16 + i * 16));
            _mm512_storeu_si512((void *)(H16 + i * 16), h);
        }
    }
    _mm512_storeu_si512((void *)score, score_v);
    int32_t hmin_a[16], hmax_a[16];
    _mm512_storeu_si512((void *)hmin_a, hmin);
    _mm512_storeu_si512((void *)hmax_a, hmax);
    int64_t gp_max = 0;
    int64_t opens[6] = {s[2] + s[8], s[4] + s[10], s[6] + s[12],
                        s[3] + s[9], s[5] + s[11], s[7] + s[13]};
    for (int k = 0; k < 6; k++) if (opens[k] > gp_max) gp_max = opens[k];
    int32_t score_min = (int32_t)(-32768 + gp_max);
    for (int l = 0; l < 16; l++)
        over[l] = (hmin_a[l] <= score_min) || (hmax_a[l] >= 32767);
}
#endif /* __AVX512F__ && __AVX512BW__ */

/* backtrack one lane from the interleaved dirs (lane stride = width) */
static int64_t nw_backtrack_lane_w(const unsigned char *dirsw,
                                   int64_t max_m, int width, int lane,
                                   int64_t m, int64_t n, int16_t *ops) {
    int64_t i = m - 1, j = n - 1, k = 0;
    int prev = 0;
    while (i >= 0 && j >= 0) {
        unsigned d = dirsw[((size_t)j * max_m + i) * width + lane];
        int op;
        if (prev == 3 && (d & NW_DIR_EXTLEFT)) { op = 3; j--; }
        else if (prev == 2 && (d & NW_DIR_EXTUP)) { op = 2; i--; }
        else if (d & NW_DIR_LEFT) { op = 3; j--; }
        else if (d & NW_DIR_UP) { op = 2; i--; }
        else { op = 1; i--; j--; }
        ops[k++] = (int16_t)op;
        prev = op;
    }
    while (i >= 0) { ops[k++] = 2; i--; }
    while (j >= 0) { ops[k++] = 3; j--; }
    return k;
}

/* backtrack one lane from the interleaved dirs */
static int64_t nw_backtrack_lane(const unsigned char *dirs8, int64_t max_m,
                                 int lane, int64_t m, int64_t n,
                                 int16_t *ops) {
    int64_t i = m - 1, j = n - 1, k = 0;
    int prev = 0;
    while (i >= 0 && j >= 0) {
        unsigned d = dirs8[((size_t)j * max_m + i) * 8 + lane];
        int op;
        if (prev == 3 && (d & NW_DIR_EXTLEFT)) { op = 3; j--; }
        else if (prev == 2 && (d & NW_DIR_EXTUP)) { op = 2; i--; }
        else if (d & NW_DIR_LEFT) { op = 3; j--; }
        else if (d & NW_DIR_UP) { op = 2; i--; }
        else { op = 1; i--; j--; }
        ops[k++] = (int16_t)op;
        prev = op;
    }
    while (i >= 0) { ops[k++] = 2; i--; }
    while (j >= 0) { ops[k++] = 3; j--; }
    return k;
}
#endif /* __AVX2__ */

static int pair_cmp_ctx_m(const void *a, const void *b, void *ctx) {
    const int64_t *key = (const int64_t *)ctx;
    int64_t ka = key[*(const int32_t *)a], kb = key[*(const int32_t *)b];
    if (ka != kb) return ka < kb ? -1 : 1;
    return (*(const int32_t *)a < *(const int32_t *)b) ? -1 : 1;
}

#define NW_X8_MAX_CELLS (4 * 1024 * 1024)  /* dirs <= width*4M per group */

#if defined(__AVX512F__) && defined(__AVX512BW__)
#define NW_GW 16
#elif defined(__AVX2__)
#define NW_GW 8
#else
#define NW_GW 8   /* group size still used for scheduling; scalar inside */
#endif

void vstpu_nw_align_batch(const unsigned char *qbuf, const int64_t *qoff,
                          const unsigned char *tbuf, const int64_t *toff,
                          int64_t npairs, const int64_t *scheme,
                          char *cigars, int64_t cigar_stride,
                          int64_t *out /* npairs x 7 */) {
    init_maps();
    int32_t sm[16][16];
    nw_score_matrix(scheme, sm);

    if (npairs > 0 && npairs < NW_GW) {
        /* tiny batch (walk-repair singletons etc.): the OpenMP region +
         * size sort cost ~1.4 ms — more than the DP itself — so run a
         * bare serial loop */
        int64_t cap_dirs = 0, cap_m = 0, cap_ops = 0;
        unsigned char *dirs = NULL, *qc = NULL;
        int32_t *E_row = NULL, *H_prev = NULL;
        int16_t *ops = NULL;
        for (int64_t p = 0; p < npairs; p++) {
            int64_t m = qoff[p + 1] - qoff[p];
            int64_t n = toff[p + 1] - toff[p];
            int64_t *o = out + p * 7;
            if (m <= 0 || n <= 0 || m + n > 65535 || m * n > 25000000) {
                o[0] = 32767; o[1] = 1;
                o[2] = o[3] = o[4] = o[5] = o[6] = 0;
                continue;
            }
            if (m * n > cap_dirs) {
                cap_dirs = m * n * 2;
                dirs = (unsigned char *)realloc(dirs, (size_t)cap_dirs);
            }
            if (m > cap_m) {
                cap_m = m * 2;
                E_row = (int32_t *)realloc(E_row,
                                           (size_t)cap_m * sizeof(int32_t));
                H_prev = (int32_t *)realloc(H_prev,
                                            (size_t)cap_m * sizeof(int32_t));
                qc = (unsigned char *)realloc(qc, (size_t)cap_m);
            }
            if (m + n + 1 > cap_ops) {
                cap_ops = (m + n + 1) * 2;
                ops = (int16_t *)realloc(
                    ops, (size_t)cap_ops * sizeof(int16_t));
            }
            nw_align_one(qbuf + qoff[p], m, tbuf + toff[p], n, scheme,
                         sm, dirs, E_row, H_prev, ops, qc,
                         cigars + p * cigar_stride, o);
        }
        free(dirs); free(E_row); free(H_prev); free(ops); free(qc);
        return;
    }

    /* order pairs by size so SIMD groups of 8 have similar dimensions
     * (lane padding is wasted work); results land at original indices */
    int32_t *order = (int32_t *)malloc((size_t)npairs * sizeof(int32_t));
    int64_t *sizekey = (int64_t *)malloc((size_t)npairs * sizeof(int64_t));
    for (int64_t p = 0; p < npairs; p++) {
        order[p] = (int32_t)p;
        int64_t m = qoff[p + 1] - qoff[p], n = toff[p + 1] - toff[p];
        sizekey[p] = (m > n ? m : n) * 65536 + (m < n ? m : n);
    }
    qsort_r(order, (size_t)npairs, sizeof(int32_t), pair_cmp_ctx_m, sizekey);

    #pragma omp parallel
    {
        int64_t cap_dirs = 0, cap_m = 0, cap_ops = 0;
        unsigned char *dirs = NULL, *qc = NULL;
        int32_t *E_row = NULL, *H_prev = NULL;
        int16_t *ops = NULL;
#ifdef __AVX2__
        int64_t cap8_mn = 0, cap8_m = 0;
        unsigned char *qc8 = NULL, *tc8 = NULL, *dirs8 = NULL;
        int32_t *E8 = NULL, *H8 = NULL;
#endif
        #pragma omp for schedule(dynamic, 1)
        for (int64_t g = 0; g < (npairs + NW_GW - 1) / NW_GW; g++) {
            int64_t lo = g * NW_GW;
            int64_t hi = lo + NW_GW < npairs ? lo + NW_GW : npairs;
            int64_t max_m = 0, max_n = 0;
            int ok[NW_GW];
            for (int64_t e = lo; e < hi; e++) {
                int64_t p = order[e];
                int64_t m = qoff[p + 1] - qoff[p];
                int64_t n = toff[p + 1] - toff[p];
                int64_t *o = out + p * 7;
                ok[e - lo] = 1;
                if (m <= 0 || n <= 0 || m + n > 65535
                        || m * n > 25000000) {
                    o[0] = 32767; o[1] = 1;
                    o[2] = o[3] = o[4] = o[5] = o[6] = 0;
                    ok[e - lo] = 0;
                    continue;
                }
                if (m > max_m) max_m = m;
                if (n > max_n) max_n = n;
            }
            if (max_m == 0) continue;
            int64_t nmemb = hi - lo;

#ifdef __AVX2__
            if (nmemb == NW_GW && max_m * max_n <= NW_X8_MAX_CELLS) {
                int allok = 1;
                for (int l = 0; l < NW_GW; l++) allok &= ok[l];
                if (allok) {
                    const int W = NW_GW;
                    if (max_m * max_n > cap8_mn) {
                        cap8_mn = max_m * max_n * 2;
                        dirs8 = (unsigned char *)realloc(
                            dirs8, (size_t)cap8_mn * W);
                    }
                    int64_t mx = max_m > max_n ? max_m : max_n;
                    if (mx > cap8_m) {
                        cap8_m = mx * 2;
                        qc8 = (unsigned char *)realloc(qc8,
                                                       (size_t)cap8_m * W);
                        tc8 = (unsigned char *)realloc(tc8,
                                                       (size_t)cap8_m * W);
                        E8 = (int32_t *)realloc(
                            E8, (size_t)cap8_m * W * sizeof(int32_t));
                        H8 = (int32_t *)realloc(
                            H8, (size_t)cap8_m * W * sizeof(int32_t));
                    }
                    if (max_m + max_n + 1 > cap_ops) {
                        cap_ops = (max_m + max_n + 1) * 2;
                        ops = (int16_t *)realloc(
                    ops, (size_t)cap_ops * sizeof(int16_t));
                    }
                    int32_t mlen[NW_GW], nlen[NW_GW];
                    memset(qc8, 0, (size_t)max_m * W);
                    memset(tc8, 0, (size_t)max_n * W);
                    for (int l = 0; l < W; l++) {
                        int64_t p = order[lo + l];
                        int64_t m = qoff[p + 1] - qoff[p];
                        int64_t n = toff[p + 1] - toff[p];
                        mlen[l] = (int32_t)m; nlen[l] = (int32_t)n;
                        const unsigned char *q = qbuf + qoff[p];
                        const unsigned char *t = tbuf + toff[p];
                        for (int64_t i = 0; i < m; i++)
                            qc8[i * W + l] = map4[q[i]];
                        for (int64_t jj = 0; jj < n; jj++)
                            tc8[jj * W + l] = map4[t[jj]];
                    }
                    int32_t score8[NW_GW], over8[NW_GW];
#if defined(__AVX512F__) && defined(__AVX512BW__)
                    nw_forward_x16(qc8, tc8, mlen, nlen, max_m, max_n,
                                   scheme, &sm[0][0], dirs8, E8, H8,
                                   score8, over8);
#else
                    nw_forward_x8(qc8, tc8, mlen, nlen, max_m, max_n,
                                  scheme, &sm[0][0], dirs8, E8, H8,
                                  score8, over8);
#endif
                    for (int l = 0; l < W; l++) {
                        int64_t p = order[lo + l];
                        int64_t *o = out + p * 7;
                        if (over8[l]) {
                            o[0] = 32767; o[1] = 1;
                            o[2] = o[3] = o[4] = o[5] = o[6] = 0;
                            continue;
                        }
                        int64_t k = nw_backtrack_lane_w(
                            dirs8, max_m, W, l, mlen[l], nlen[l], ops);
                        int64_t stats[4];
                        int64_t clen = assemble_core(
                            ops, 1, (int)k, qbuf + qoff[p], tbuf + toff[p],
                            (int)scheme[14], cigars + p * cigar_stride,
                            stats);
                        o[0] = score8[l]; o[1] = 0;
                        o[2] = stats[0]; o[3] = stats[1]; o[4] = stats[2];
                        o[5] = stats[3]; o[6] = clen;
                    }
                    continue;
                }
            }
#endif
            for (int64_t e = lo; e < hi; e++) {
                if (!ok[e - lo]) continue;
                int64_t p = order[e];
                int64_t m = qoff[p + 1] - qoff[p];
                int64_t n = toff[p + 1] - toff[p];
                int64_t *o = out + p * 7;
                if (m * n > cap_dirs) {
                    cap_dirs = m * n * 2;
                    dirs = (unsigned char *)realloc(dirs, (size_t)cap_dirs);
                }
                if (m > cap_m) {
                    cap_m = m * 2;
                    E_row = (int32_t *)realloc(
                        E_row, (size_t)cap_m * sizeof(int32_t));
                    H_prev = (int32_t *)realloc(
                        H_prev, (size_t)cap_m * sizeof(int32_t));
                    qc = (unsigned char *)realloc(qc, (size_t)cap_m);
                }
                if (m + n + 1 > cap_ops) {
                    cap_ops = (m + n + 1) * 2;
                    ops = (int16_t *)realloc(
                    ops, (size_t)cap_ops * sizeof(int16_t));
                }
                nw_align_one(qbuf + qoff[p], m, tbuf + toff[p], n, scheme,
                             sm, dirs, E_row, H_prev, ops, qc,
                             cigars + p * cigar_stride, o);
            }
        }
        free(dirs); free(E_row); free(H_prev); free(ops); free(qc);
#ifdef __AVX2__
        free(qc8); free(tc8); free(dirs8); free(E8); free(H8);
#endif
    }
    free(order); free(sizekey);
}

/* ---- read filter analysis (filter.cpp analyse) ----
 *
 * Batched strip/truncate/quality analysis; float accumulation is
 * left-to-right per read, bit-exact to the reference's per-base loop.
 * ip: [stripleft, stripright, trunclen, trunclen_keep, truncqual, maxns,
 *      minlen, maxlen, ascii, qmin, qmax, minqual, is_fastq, minsize,
 *      maxsize]
 * dp: [truncee, truncee_rate, maxee, maxee_rate]
 * out_flags: bit0 = discarded, bit1 = truncated
 * fatal: [rec, value, below] — rec = -1 when no quality-range violation;
 * the lowest record index wins (input order). */
void vstpu_filter_analyse(const unsigned char *seq,
                          const unsigned char *qual, const int64_t *off,
                          int64_t n, const int64_t *sizes,
                          const int64_t *ip, const double *dp,
                          const double *q2p, int64_t *out_start,
                          int64_t *out_len, double *out_ee,
                          uint8_t *out_flags, int64_t *fatal) {
    int64_t stripleft = ip[0], stripright = ip[1], trunclen = ip[2],
            trunclen_keep = ip[3], truncqual = ip[4], maxns = ip[5],
            minlen = ip[6], maxlen = ip[7], ascii = ip[8], qmin = ip[9],
            qmax = ip[10], minqual = ip[11], is_fastq = ip[12],
            minsize = ip[13], maxsize = ip[14];
    double truncee = dp[0], truncee_rate = dp[1], maxee = dp[2],
           maxee_rate = dp[3];
    fatal[0] = -1;
    #pragma omp parallel for schedule(dynamic, 256)
    for (int64_t r = 0; r < n; r++) {
        int64_t base = off[r];
        int64_t L0 = off[r + 1] - base;
        int64_t start = 0, len = L0;
        int discarded = 0;
        double ee = -1.0;
        if (stripleft < len) { start += stripleft; len -= stripleft; }
        else { start = len; len = 0; }
        if (stripright < len) len -= stripright;
        else len = 0;
        if (trunclen >= 0 && len > trunclen) len = trunclen;
        if (trunclen_keep >= 0 && len > trunclen_keep) len = trunclen_keep;

        if (is_fastq) {
            ee = 0.0;
            const unsigned char *qw = qual + base + start;
            /* quality-range fatal scan covers the whole analysis window */
            for (int64_t i = 0; i < len; i++) {
                int64_t q = (int64_t)qw[i] - ascii;
                if (q < qmin || q > qmax) {
                    #pragma omp critical
                    if (fatal[0] < 0 || r < fatal[0]) {
                        fatal[0] = r; fatal[1] = q; fatal[2] = q < qmin;
                    }
                    break;
                }
            }
            for (int64_t i = 0; i < len; i++) {
                int64_t q = (int64_t)qw[i] - ascii;
                double e = q2p[qw[i]];
                ee += e;
                if (q <= truncqual || ee > truncee
                        || ee > truncee_rate * (double)(i + 1)) {
                    ee -= e;
                    len = i;
                    break;
                }
                if (q < minqual) discarded = 1;
            }
            if (ee > maxee) discarded = 1;
            if (len > 0 && ee / (double)len > maxee_rate) discarded = 1;
        }
        if (trunclen >= 0 && len < trunclen) discarded = 1;
        if (len < minlen) discarded = 1;
        if (len > maxlen) discarded = 1;
        int64_t ncount = 0;
        const unsigned char *sw = seq + base + start;
        for (int64_t i = 0; i < len; i++)
            if (sw[i] == 'N' || sw[i] == 'n') ncount++;
        if (ncount > maxns) discarded = 1;
        if (sizes[r] < minsize || sizes[r] > maxsize) discarded = 1;
        out_start[r] = start;
        out_len[r] = len;
        out_ee[r] = ee;
        out_flags[r] = (uint8_t)((discarded ? 1 : 0)
                                 | (len < L0 ? 2 : 0));
    }
}

/* ---- bulk record emitters ----
 *
 * Fast-path output writers for the unannotated case (no relabel/sizeout/
 * eeout/...): record e of the selection is header head_buf[head_off[p] ..
 * +head_len[p]] with sequence/quality rec_len[p] bytes at rec_start[p].
 * Returns bytes written into out (caller-sized). */

int64_t vstpu_emit_fastq(const unsigned char *head_buf,
                         const int64_t *head_off, const int64_t *head_len,
                         const unsigned char *seq_buf,
                         const unsigned char *qual_buf,
                         const int64_t *rec_start, const int64_t *rec_len,
                         const int32_t *sel, int64_t nsel,
                         unsigned char *out) {
    unsigned char *o = out;
    for (int64_t e = 0; e < nsel; e++) {
        int32_t p = sel[e];
        *o++ = '@';
        memcpy(o, head_buf + head_off[p], head_len[p]); o += head_len[p];
        *o++ = '\n';
        int64_t L = rec_len[p];
        memcpy(o, seq_buf + rec_start[p], L); o += L;
        *o++ = '\n'; *o++ = '+'; *o++ = '\n';
        memcpy(o, qual_buf + rec_start[p], L); o += L;
        *o++ = '\n';
    }
    return (int64_t)(o - out);
}

int64_t vstpu_emit_fasta(const unsigned char *head_buf,
                         const int64_t *head_off, const int64_t *head_len,
                         const unsigned char *seq_buf,
                         const int64_t *rec_start, const int64_t *rec_len,
                         const int32_t *sel, int64_t nsel, int64_t width,
                         unsigned char *out) {
    unsigned char *o = out;
    for (int64_t e = 0; e < nsel; e++) {
        int32_t p = sel[e];
        *o++ = '>';
        memcpy(o, head_buf + head_off[p], head_len[p]); o += head_len[p];
        *o++ = '\n';
        int64_t L = rec_len[p];
        const unsigned char *s = seq_buf + rec_start[p];
        if (width <= 0 || L <= width) {
            memcpy(o, s, L); o += L;
            *o++ = '\n';
        } else {
            for (int64_t q = 0; q < L; q += width) {
                int64_t w = L - q < width ? L - q : width;
                memcpy(o, s + q, w); o += w;
                *o++ = '\n';
            }
        }
    }
    return (int64_t)(o - out);
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

/* ---- query one-hot bit packing ----
 * out: n_queries rows x qwords uint32 (row-major, zeroed by caller); bit
 * (k & 31) of word k >> 5 in row q set when query q's unique-kmer list
 * contains k-mer k.  This is the wire format of the MXU scoring kernel's
 * one-hot operand (ops/score_mxu.py): 8x narrower than int8 over the
 * tunneled host->device link; the device unpacks it once per chunk. */
void vstpu_pack_query_bits(const uint32_t *kmers, const int64_t *starts,
                           int n_queries, int qwords, uint32_t *out) {
    #pragma omp parallel for schedule(static)
    for (int q = 0; q < n_queries; q++) {
        uint32_t *row = out + (int64_t)q * qwords;
        const int64_t lo = starts[q], hi = starts[q + 1];
        for (int64_t i = lo; i < hi; i++) {
            uint32_t k = kmers[i];
            /* defensive contract for the exported symbol: skip ids past
             * the row width instead of corrupting adjacent heap rows */
            if ((int64_t)(k >> 5) < qwords)
                row[k >> 5] |= 1u << (k & 31);
        }
    }
}

/* ---- FASTA/FASTQ record scanners ------------------------------------
 *
 * Single-pass scanners over an in-memory file image; they replace the
 * per-record Python parsing loop (vsearch_tpu/io/fastx.py read_fasta /
 * read_fastq) on the streaming-command hot path.  Semantics mirror the
 * reference readers (src/core/fasta.cpp / fastq.cpp): per-character
 * actions (accept / strip-with-warning / fatal / silent-skip), header
 * truncation at whitespace, ;size= abundance parsing
 * (src/core/attributes.cpp header_find_attribute), and dropping quality
 * symbols in sync with stripped sequence symbols.
 *
 * Error returns: -1 fatal sequence char, -2 zero ;size= annotation,
 * -3 malformed input.
 */

static unsigned char seq_action[256]; /* 0 strip,1 accept,2 fatal,4 skip */
static unsigned char upcase_map[256];
static int scan_ready = 0;

static void init_scan(void) {
    if (scan_ready) return;
    int i;
    for (i = 0; i < 256; i++) {
        seq_action[i] = 0;
        upcase_map[i] = (unsigned char)i;
    }
    for (i = 0; i < 32; i++) seq_action[i] = 2;      /* control: fatal */
    seq_action[9] = seq_action[11] = seq_action[12] = seq_action[13] = 4;
    seq_action[10] = 4;                               /* newline: skip  */
    seq_action['-'] = 2;
    seq_action['.'] = 2;
    const char *ok = "ABCDGHKMNRSTUVWYabcdghkmnrstuvwy";
    for (const char *p = ok; *p; p++) seq_action[(unsigned char)*p] = 1;
    for (i = 'a'; i <= 'z'; i++) upcase_map[i] = (unsigned char)(i - 32);
    scan_ready = 1;
}

/* clean = every byte is an accepted sequence letter (seq_action == 1).
 * Clean lines take a memcpy/AND fast path instead of the per-byte
 * action-map loop (the scan's dominant cost on large inputs); any other
 * byte falls back to the exact per-byte path for that line/region. */
static int region_clean(const uint8_t *p, int64_t len) {
    int64_t j = 0;
    unsigned acc = 0;
#ifdef __AVX2__
    if (len >= 32) {
        /* nibble-LUT classifier: accept set is upper/lower
         * ABCDGHKMNRSTUVWY (hi nibble 4/6 with lo in {1,2,3,4,7,8,B,D,E},
         * hi 5/7 with lo in {2,3,4,5,6,7,9}) */
        const __m256i lo_lut = _mm256_setr_epi8(
            0, 1, 3, 3, 3, 2, 2, 3, 1, 2, 0, 1, 0, 1, 1, 0,
            0, 1, 3, 3, 3, 2, 2, 3, 1, 2, 0, 1, 0, 1, 1, 0);
        const __m256i hi_lut = _mm256_setr_epi8(
            0, 0, 0, 0, 1, 2, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0,
            0, 0, 0, 0, 1, 2, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0);
        const __m256i m0f = _mm256_set1_epi8(0x0F);
        const __m256i zero = _mm256_setzero_si256();
        __m256i bad = zero;
        for (; j + 32 <= len; j += 32) {
            __m256i v = _mm256_loadu_si256((const __m256i *)(p + j));
            __m256i lo = _mm256_and_si256(v, m0f);
            __m256i hi = _mm256_and_si256(_mm256_srli_epi16(v, 4), m0f);
            __m256i m = _mm256_and_si256(
                _mm256_shuffle_epi8(lo_lut, lo),
                _mm256_shuffle_epi8(hi_lut, hi));
            bad = _mm256_or_si256(bad, _mm256_cmpeq_epi8(m, zero));
        }
        if (!_mm256_testz_si256(bad, bad)) return 0;
    }
#endif
    for (; j + 8 <= len; j += 8) {
        acc |= (unsigned)(seq_action[p[j]] ^ 1)
             | (unsigned)(seq_action[p[j + 1]] ^ 1)
             | (unsigned)(seq_action[p[j + 2]] ^ 1)
             | (unsigned)(seq_action[p[j + 3]] ^ 1)
             | (unsigned)(seq_action[p[j + 4]] ^ 1)
             | (unsigned)(seq_action[p[j + 5]] ^ 1)
             | (unsigned)(seq_action[p[j + 6]] ^ 1)
             | (unsigned)(seq_action[p[j + 7]] ^ 1);
        if (acc) return 0;
    }
    for (; j < len; j++) acc |= (unsigned)(seq_action[p[j]] ^ 1);
    return acc == 0;
}

/* copy a clean region, optionally upcasing: every accepted letter maps
 * lower->upper by clearing bit 5 (0x20), so the upcase is a vectorizable
 * AND instead of a LUT */
static void copy_clean(uint8_t *dst, const uint8_t *src, int64_t len,
                       int upcase) {
    if (!upcase) {
        memcpy(dst, src, (size_t)len);
        return;
    }
    for (int64_t j = 0; j < len; j++)
        dst[j] = (uint8_t)(src[j] & 0xDF);
}

/* (^|;)size=<digits>(;|$) -> value, 1 if absent, -2 on zero value
 * mirrors attributes.cpp header_find_attribute + header_get_size */
static int64_t parse_size(const uint8_t *h, int64_t n) {
    int64_t off = 0;
    while (off + 5 < n) {
        const uint8_t *hit = (const uint8_t *)memmem(h + off,
                                                     (size_t)(n - off),
                                                     "size=", 5);
        if (!hit) break;
        int64_t pos = hit - h;
        if (pos > 0 && h[pos - 1] != ';') { off = pos + 6; continue; }
        int64_t i = pos + 5, digits = 0;
        while (i < n && h[i] >= '0' && h[i] <= '9') { digits++; i++; }
        if (digits == 0) { off = pos + 6; continue; }
        if (i < n && h[i] != ';') { off = i + 2; continue; }
        int64_t v = 0;
        for (int64_t j = pos + 5; j < i; j++) {
            v = v * 10 + (h[j] - '0');
            if (v > (int64_t)1 << 62) break;
        }
        if (v == 0) return -2;
        return v;
    }
    return 1;
}

static int64_t truncate_header(const uint8_t *h, int64_t n, int at_space) {
    for (int64_t i = 0; i < n; i++) {
        uint8_t c = h[i];
        if (c == 0 || c == '\r' || c == '\n') return i;
        if (at_space && (c == ' ' || c == '\t')) return i;
    }
    return n;
}

int64_t vstpu_scan_fasta(const uint8_t *buf, int64_t n, int truncateatspace,
                         int upcase, uint8_t *seq_out, int64_t *seq_off,
                         int64_t *head_off, int64_t *head_len,
                         int64_t *sizes, uint64_t *stripped) {
    init_scan();
    int64_t nrec = 0, w = 0, i = 0;
    while (i < n) {
        /* find line end */
        const uint8_t *nl = memchr(buf + i, '\n', (size_t)(n - i));
        int64_t lend = nl ? (nl - buf) : n;
        if (buf[i] == '>') {
            if (nrec > 0) seq_off[nrec] = w;
            head_off[nrec] = i + 1;
            head_len[nrec] = truncate_header(buf + i + 1, lend - i - 1,
                                             truncateatspace);
            int64_t sz = parse_size(buf + i + 1, head_len[nrec]);
            if (sz == -2) return -2;
            sizes[nrec] = sz;
            if (nrec == 0) seq_off[0] = 0;
            nrec++;
        } else if (nrec == 0) {
            /* content before the first header: blank lines allowed */
            for (int64_t j = i; j < lend; j++)
                if (buf[j] != ' ' && buf[j] != '\t' && buf[j] != '\r')
                    return -3;
        } else if (region_clean(buf + i, lend - i)) {
            copy_clean(seq_out + w, buf + i, lend - i, upcase);
            w += lend - i;
        } else {
            for (int64_t j = i; j < lend; j++) {
                uint8_t c = buf[j];
                unsigned char a = seq_action[c];
                if (a == 1) {
                    seq_out[w++] = upcase ? upcase_map[c] : c;
                } else if (a == 0) {
                    stripped[c]++;
                } else if (a == 2 && c != '\r') {
                    return -1;
                }
            }
        }
        i = lend + 1;
    }
    if (nrec > 0) seq_off[nrec] = w;
    return nrec;
}

int64_t vstpu_scan_fastq(const uint8_t *buf, int64_t n, int truncateatspace,
                         int upcase, uint8_t *seq_out, uint8_t *qual_out,
                         int64_t *seq_off, int64_t *head_off,
                         int64_t *head_len, int64_t *sizes,
                         uint64_t *stripped) {
    init_scan();
    int64_t nrec = 0, w = 0, i = 0;
    seq_off[0] = 0;
    while (i < n) {
        if (buf[i] != '@') return -3;
        const uint8_t *nl = memchr(buf + i, '\n', (size_t)(n - i));
        if (!nl) return -3;
        int64_t lend = nl - buf;
        head_off[nrec] = i + 1;
        head_len[nrec] = truncate_header(buf + i + 1, lend - i - 1,
                                         truncateatspace);
        int64_t sz = parse_size(buf + i + 1, head_len[nrec]);
        if (sz == -2) return -2;
        sizes[nrec] = sz;
        i = lend + 1;
        /* raw sequence lines until '+' */
        int64_t raw_start = w;
        while (i < n && buf[i] != '+') {
            nl = memchr(buf + i, '\n', (size_t)(n - i));
            lend = nl ? (nl - buf) : n;
            int64_t stop = lend;
            while (stop > i && (buf[stop - 1] == '\r')) stop--;
            memcpy(seq_out + w, buf + i, (size_t)(stop - i));
            w += stop - i;
            i = lend + 1;
        }
        if (i >= n) return -3;                 /* missing '+' line */
        nl = memchr(buf + i, '\n', (size_t)(n - i));
        lend = nl ? (nl - buf) : n;
        i = lend + 1;                          /* skip '+' line */
        /* quality lines until length matches the raw sequence */
        int64_t raw_len = w - raw_start, q = 0;
        while (q < raw_len) {
            if (i >= n) return -3;             /* truncated quality */
            nl = memchr(buf + i, '\n', (size_t)(n - i));
            lend = nl ? (nl - buf) : n;
            int64_t stop = lend;
            while (stop > i && (buf[stop - 1] == '\r')) stop--;
            if (q + (stop - i) > raw_len) return -3;
            memcpy(qual_out + raw_start + q, buf + i, (size_t)(stop - i));
            q += stop - i;
            i = lend + 1;
        }
        /* compact seq+qual in place through the action map; a clean
         * region (every byte an accepted letter) needs no compaction —
         * only the optional in-place upcase AND */
        if (region_clean(seq_out + raw_start, raw_len)) {
            if (upcase)
                for (int64_t j = raw_start; j < raw_start + raw_len; j++)
                    seq_out[j] = (uint8_t)(seq_out[j] & 0xDF);
            w = raw_start + raw_len;
        } else {
            int64_t w2 = raw_start;
            for (int64_t j = raw_start; j < raw_start + raw_len; j++) {
                uint8_t c = seq_out[j];
                unsigned char a = seq_action[c];
                if (a == 1) {
                    seq_out[w2] = upcase ? upcase_map[c] : c;
                    qual_out[w2] = qual_out[j];
                    w2++;
                } else if (a == 0) {
                    stripped[c]++;
                } else if (a == 2) {
                    return -1;
                }
            }
            w = w2;
        }
        nrec++;
        seq_off[nrec] = w;
    }
    return nrec;
}

/* ---- dereplication core ---------------------------------------------
 *
 * Exact-duplicate clustering of pre-parsed records: normalize (upcase,
 * U->T; src/utils/string_normalize.cpp), hash, open-addressing probe with
 * full-sequence confirm, optional minus-strand second probe
 * (src/core/derep.cpp:253-533 semantics).  Returns per-record cluster
 * ordinal (first-seen order) and matched strand (0 plus / 1 minus).
 */

static unsigned char norm_map[256];
static unsigned char comp_map[256];
static int derep_ready = 0;

static void init_derep(void) {
    if (derep_ready) return;
    int i;
    for (i = 0; i < 256; i++) norm_map[i] = (unsigned char)i;
    for (i = 'a'; i <= 'z'; i++) norm_map[i] = (unsigned char)(i - 32);
    norm_map['u'] = 'T'; norm_map['U'] = 'T';
    /* complement of the normalized alphabet (maps.cpp chrmap_complement) */
    const char *fr = "ABCDGHKMNRSTUVWY";
    const char *to = "TVGHCDMKNYSAABWR";
    for (i = 0; i < 256; i++) comp_map[i] = 'N';
    for (i = 0; fr[i]; i++) comp_map[(unsigned char)fr[i]] =
        (unsigned char)to[i];
    derep_ready = 1;
}

static uint64_t hash_bytes(const uint8_t *p, int64_t n) {
    /* FNV-1a 64 with a finalizer mix */
    uint64_t h = 1469598103934665603ULL;
    for (int64_t i = 0; i < n; i++) {
        h ^= p[i];
        h *= 1099511628211ULL;
    }
    h ^= h >> 33; h *= 0xff51afd7ed558ccdULL; h ^= h >> 33;
    return h;
}

int64_t vstpu_derep_assign(const uint8_t *seq, const int64_t *off, int64_t n,
                           int use_rc, int64_t *cluster_of,
                           uint8_t *strand_of) {
    init_derep();
    /* normalized copy of the packed buffer (parallel: pure per-byte map) */
    int64_t total = off[n];
    uint8_t *norm = (uint8_t *)malloc((size_t)total);
    if (!norm) return -1;
    #pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < total; i++) norm[i] = norm_map[seq[i]];

    /* per-record hashes (parallel: the serial probe below then touches
     * each record's bytes only on hash collision) */
    uint64_t *hashes = (uint64_t *)malloc((size_t)n * sizeof(uint64_t));
    if (!hashes) { free(norm); return -1; }
    #pragma omp parallel for schedule(static)
    for (int64_t r = 0; r < n; r++)
        hashes[r] = hash_bytes(norm + off[r], off[r + 1] - off[r]);

    uint64_t cap = 1;
    while (cap < (uint64_t)n * 2 + 8) cap <<= 1;
    int64_t *slot_rec = (int64_t *)malloc(cap * sizeof(int64_t));
    uint64_t *slot_hash = (uint64_t *)malloc(cap * sizeof(uint64_t));
    if (!slot_rec || !slot_hash) { free(norm); free(hashes); free(slot_rec);
                                   free(slot_hash); return -1; }
    for (uint64_t i = 0; i < cap; i++) slot_rec[i] = -1;

    uint8_t *rcbuf = NULL;
    int64_t rccap = 0;
    int64_t nclusters = 0;

    for (int64_t r = 0; r < n; r++) {
        const uint8_t *s = norm + off[r];
        int64_t len = off[r + 1] - off[r];
        uint64_t h = hashes[r];
        int64_t found = -1;
        uint64_t j = h & (cap - 1);
        while (slot_rec[j] >= 0) {
            int64_t other = slot_rec[j];
            if (slot_hash[j] == h
                    && off[other + 1] - off[other] == len
                    && memcmp(norm + off[other], s, (size_t)len) == 0) {
                found = other;
                break;
            }
            j = (j + 1) & (cap - 1);
        }
        uint8_t strand = 0;
        if (found < 0 && use_rc) {
            if (len > rccap) {
                free(rcbuf);
                rccap = len * 2 + 64;
                rcbuf = (uint8_t *)malloc((size_t)rccap);
                if (!rcbuf) { free(norm); free(hashes); free(slot_rec);
                              free(slot_hash); return -1; }
            }
            for (int64_t k = 0; k < len; k++)
                rcbuf[k] = comp_map[s[len - 1 - k]];
            uint64_t h2 = hash_bytes(rcbuf, len);
            uint64_t j2 = h2 & (cap - 1);
            while (slot_rec[j2] >= 0) {
                int64_t other = slot_rec[j2];
                if (slot_hash[j2] == h2
                        && off[other + 1] - off[other] == len
                        && memcmp(norm + off[other], rcbuf,
                                  (size_t)len) == 0) {
                    found = other;
                    strand = 1;
                    break;
                }
                j2 = (j2 + 1) & (cap - 1);
            }
        }
        if (found >= 0) {
            cluster_of[r] = cluster_of[found];
            strand_of[r] = strand;
        } else {
            slot_rec[j] = r;
            slot_hash[j] = h;
            cluster_of[r] = nclusters++;
            strand_of[r] = 0;
        }
    }
    free(rcbuf);
    free(hashes);
    free(norm);
    free(slot_rec);
    free(slot_hash);
    return nclusters;
}

/* ---- paired-end merge core -------------------------------------------
 *
 * Batched port of the vsearch_tpu Python merge core
 * (vsearch_tpu/core/mergepairs.py process/optimize/merge), which mirrors
 * src/core/mergepairs.cpp semantics: per-read truncation and N handling,
 * 5-mer diagonal voting overlap detection, per-diagonal log-odds scan
 * with drop-max rejection, Edgar-Flyvbjerg posterior-quality consensus.
 * Character maps and the 94x94 quality tables are passed in from Python
 * so the two implementations share one source of truth.
 *
 * Per pair outputs (int64 x8): reason, offset, merged_len, fwd_errors,
 * rev_errors, fwd_trunc, rev_trunc, fatal_q; (double x3): ee_merged,
 * ee_fwd, ee_rev.  Merged seq/qual written at out_off[pair].
 * Reasons use the Python Reason enum values.  fatal_q: -1 ok, else the
 * offending quality value (reason distinguishes below/above via sign of
 * offset slot: offset=-1 below qmin, -2 above qmax).
 */

#define MR_UNDEFINED 0
#define MR_OK 1
#define MR_MINLEN 2
#define MR_MAXLEN 3
#define MR_MAXNS 4
#define MR_MINOVLEN 5
#define MR_MAXDIFFS 6
#define MR_MAXDIFFPCT 7
#define MR_STAGGERED 8
#define MR_REPEAT 10
#define MR_MINMERGELEN 11
#define MR_MAXMERGELEN 12
#define MR_MAXEE 13
#define MR_MINSCORE 14
#define MR_NOKMERS 15

#define MERGE_K 5
#define MERGE_KMERS 1024
#define MERGE_DROPMAX_C 16.0

typedef struct {
    int64_t minlen, maxlen, ascii_off, qmin, qmax, truncqual, maxns,
            minovlen, maxdiffs, minmergelen, maxmergelen;
    double maxdiffpct, maxee;
    int allowstagger;
} merge_params_t;

typedef struct {
    const double *q2p;            /* [128] */
    const uint8_t *qual_same;     /* [128*128] */
    const uint8_t *qual_diff;     /* [128*128] */
    const double *match_score;    /* [128*128] */
    const double *mism_score;     /* [128*128] */
    const uint8_t *comp;          /* [256] */
    const uint8_t *ambig;         /* [256] 1=ambiguous */
    const uint8_t *two_bit;       /* [256] */
} merge_tables_t;

typedef struct {
    int32_t first[MERGE_KMERS];
    int32_t *next;      /* per fwd position chain */
    int32_t *poslist;   /* 1-based fwd kmer positions */
    int64_t *diags;
    int64_t cap;
} merge_scratch_t;

static void merge_one(const uint8_t *fwd, int64_t fwd_len, uint8_t *fq,
                      const uint8_t *rev, int64_t rev_len, uint8_t *rq,
                      const merge_params_t *P, const merge_tables_t *T,
                      merge_scratch_t *S, uint8_t *oseq, uint8_t *oqual,
                      int64_t *oi, double *od) {
    int64_t reason = MR_UNDEFINED, offset = 0, merged_len = 0;
    int64_t fwd_errors = 0, rev_errors = 0, fatal_q = -1;
    double ee_merged = 0, ee_fwd = 0, ee_rev = 0;
    int skip = 0;

    if (fwd_len < P->minlen || rev_len < P->minlen) {
        reason = MR_MINLEN; skip = 1;
    }
    if (fwd_len > P->maxlen || rev_len > P->maxlen) {
        reason = MR_MAXLEN; skip = 1;
    }

    int64_t ft = fwd_len, rt = rev_len;
    if (!skip) {
        for (int64_t i = 0; i < fwd_len; i++) {
            int64_t q = (int64_t)fq[i] - P->ascii_off;
            if (q < P->qmin) { fatal_q = q; offset = -1; goto out; }
            if (q > P->qmax) { fatal_q = q; offset = -2; goto out; }
            if (q <= P->truncqual) { ft = i; break; }
        }
        if (ft < P->minlen) { reason = MR_MINLEN; skip = 1; }
    }
    if (!skip) {
        for (int64_t i = 0; i < rev_len; i++) {
            int64_t q = (int64_t)rq[i] - P->ascii_off;
            if (q < P->qmin) { fatal_q = q; offset = -1; goto out; }
            if (q > P->qmax) { fatal_q = q; offset = -2; goto out; }
            if (q <= P->truncqual) { rt = i; break; }
        }
        if (rt < P->minlen) { reason = MR_MINLEN; skip = 1; }
    }
    if (!skip) {
        int64_t nc = 0;
        for (int64_t i = 0; i < ft; i++)
            if (fwd[i] == 'N') { fq[i] = (uint8_t)P->ascii_off; nc++; }
        if (nc > P->maxns) { reason = MR_MAXNS; skip = 1; }
    }
    if (!skip) {
        int64_t nc = 0;
        for (int64_t i = 0; i < rt; i++)
            if (rev[i] == 'N') { rq[i] = (uint8_t)P->ascii_off; nc++; }
        if (nc > P->maxns) { reason = MR_MAXNS; skip = 1; }
    }

    if (!skip) {
        /* ---- optimize: 5-mer diagonal voting + score scan ---- */
        int64_t mindiag, i;
        double minscore;
        if (P->minovlen < 9) {
            mindiag = P->minovlen - 4;
            minscore = 1.6 * (double)P->minovlen;
        } else { mindiag = 4; minscore = 16.0; }

        if (ft + rt > S->cap) {
            free(S->next); free(S->poslist); free(S->diags);
            S->cap = (ft + rt) * 2 + 64;
            S->next = (int32_t *)malloc((size_t)S->cap * 4);
            S->poslist = (int32_t *)malloc((size_t)S->cap * 4);
            S->diags = (int64_t *)malloc((size_t)S->cap * 8);
        }
        memset(S->first, -1, sizeof(S->first));
        memset(S->diags, 0, (size_t)(ft + rt) * 8);

        uint32_t kmer = 0, bad = MERGE_KMERS - 1;
        int32_t npos = 0;
        for (i = 0; i < ft; i++) {
            uint8_t c = fwd[i];
            bad = ((bad << 2) | T->ambig[c]) & (MERGE_KMERS - 1);
            kmer = ((kmer << 2) | T->two_bit[c]) & (MERGE_KMERS - 1);
            if (bad == 0) {
                /* chain in reverse build order; walk order must match the
                   Python append order, so record and reverse below */
                S->poslist[npos] = (int32_t)(i - MERGE_K + 1 + 1);
                S->next[npos] = S->first[kmer];
                S->first[kmer] = npos;
                npos++;
            }
        }
        kmer = 0; bad = MERGE_KMERS - 1;
        for (i = 0; i < rt; i++) {
            uint8_t c = rev[rt - 1 - i];
            bad = ((bad << 2) | T->ambig[c]) & (MERGE_KMERS - 1);
            kmer = ((kmer << 2) | T->two_bit[T->comp[c]]) & (MERGE_KMERS - 1);
            if (bad == 0) {
                for (int32_t p = S->first[kmer]; p >= 0; p = S->next[p]) {
                    int64_t diag = rt + (S->poslist[p] - 1) - (i - MERGE_K + 1);
                    if (diag >= 0) S->diags[diag]++;
                }
            }
        }

        double best_score = 0.0;
        int64_t best_i = 0, best_diffs = 0, hits = 0, kmers_seen = 0;
        for (i = 1; i < ft + rt; i++) {
            if (S->diags[rt + ft - i] < mindiag) continue;
            kmers_seen = 1;
            int64_t fwd_3p = i > rt ? i - rt : 0;
            int64_t rev_3p = i > ft ? i - ft : 0;
            int64_t overlap = i - fwd_3p - rev_3p;
            int64_t fwd_pos = ft - fwd_3p - 1;
            int64_t rev_pos = rt - rev_3p - overlap;
            double score = 0.0, score_high = 0.0, dropmax = 0.0;
            int64_t diffs = 0;
            for (int64_t k = 0; k < overlap; k++) {
                uint8_t fs = fwd[fwd_pos], rs = T->comp[rev[rev_pos]];
                uint8_t fqs = fq[fwd_pos], rqs = rq[rev_pos];
                fwd_pos--; rev_pos++;
                if (fs == rs) {
                    score += T->match_score[(size_t)fqs * 128 + rqs];
                    if (score > score_high) score_high = score;
                } else {
                    score += T->mism_score[(size_t)fqs * 128 + rqs];
                    diffs++;
                    if (score < score_high - dropmax)
                        dropmax = score_high - score;
                }
            }
            if (dropmax >= MERGE_DROPMAX_C) score = 0.0;
            if (score >= minscore) hits++;
            if (score > best_score) {
                best_score = score; best_i = i; best_diffs = diffs;
            }
        }

        if (hits > 1) reason = MR_REPEAT;
        else if (!P->allowstagger && best_i > ft) reason = MR_STAGGERED;
        else if (best_diffs > P->maxdiffs) reason = MR_MAXDIFFS;
        else if (best_i > 0
                 && 100.0 * (double)best_diffs / (double)best_i
                    > P->maxdiffpct) reason = MR_MAXDIFFPCT;
        else if (kmers_seen == 0) reason = MR_NOKMERS;
        else if (best_score < minscore) reason = MR_MINSCORE;
        else if (best_i < P->minovlen) reason = MR_MINOVLEN;
        else if (ft + rt - best_i < P->minmergelen) reason = MR_MINMERGELEN;
        else if (ft + rt - best_i > P->maxmergelen) reason = MR_MAXMERGELEN;
        else offset = best_i;
    }

    if (offset > 0) {
        /* ---- merge ---- */
        int64_t fwd_5p = ft > offset ? ft - offset : 0;
        int64_t w = 0;
        int64_t fwd_pos = 0;
        while (fwd_pos < fwd_5p) {
            uint8_t q = fq[fwd_pos];
            oseq[w] = fwd[fwd_pos]; oqual[w] = q; w++;
            double e = T->q2p[q];
            ee_merged += e; ee_fwd += e;
            fwd_pos++;
        }
        int64_t rev_3p = offset > ft ? offset - ft : 0;
        int64_t rev_pos = rt - 1 - rev_3p;
        while (fwd_pos < ft && rev_pos >= 0) {
            uint8_t fs = fwd[fwd_pos], rs = T->comp[rev[rev_pos]];
            uint8_t fqs = fq[fwd_pos], rqs = rq[rev_pos];
            uint8_t f_sym = fqs < 2 ? 'N' : fs;
            uint8_t r_sym = rqs < 2 ? 'N' : rs;
            uint8_t sym, q;
            if (r_sym == 'N') { sym = f_sym; q = fqs; }
            else if (f_sym == 'N') { sym = r_sym; q = rqs; }
            else if (f_sym == r_sym) {
                sym = f_sym;
                q = T->qual_same[(size_t)fqs * 128 + rqs];
            } else if (fqs > rqs) {
                sym = f_sym;
                q = T->qual_diff[(size_t)fqs * 128 + rqs];
            } else {
                sym = r_sym;
                q = T->qual_diff[(size_t)rqs * 128 + fqs];
            }
            if (sym != fs) fwd_errors++;
            if (sym != rs) rev_errors++;
            oseq[w] = sym; oqual[w] = q; w++;
            ee_merged += T->q2p[q];
            ee_fwd += T->q2p[fqs];
            ee_rev += T->q2p[rqs];
            fwd_pos++; rev_pos--;
        }
        while (rev_pos >= 0) {
            uint8_t q = rq[rev_pos];
            oseq[w] = T->comp[rev[rev_pos]]; oqual[w] = q; w++;
            double e = T->q2p[q];
            ee_merged += e; ee_rev += e;
            rev_pos--;
        }
        merged_len = w;
        reason = (ee_merged <= P->maxee) ? MR_OK : MR_MAXEE;
    }

out:
    oi[0] = reason; oi[1] = offset; oi[2] = merged_len;
    oi[3] = fwd_errors; oi[4] = rev_errors; oi[5] = ft; oi[6] = rt;
    oi[7] = fatal_q;
    od[0] = ee_merged; od[1] = ee_fwd; od[2] = ee_rev;
}

void vstpu_merge_batch(
        uint8_t *fwd_buf, const int64_t *fwd_off,
        uint8_t *fq_buf,
        uint8_t *rev_buf, const int64_t *rev_off,
        uint8_t *rq_buf,
        int64_t npairs,
        const int64_t *iparams,   /* 11 ints + allowstagger as [13] */
        const double *dparams,    /* maxdiffpct, maxee */
        const double *q2p, const uint8_t *qual_same, const uint8_t *qual_diff,
        const double *match_score, const double *mism_score,
        const uint8_t *comp, const uint8_t *ambig, const uint8_t *two_bit,
        uint8_t *out_seq, uint8_t *out_qual, const int64_t *out_off,
        int64_t *out_ints /* npairs*8 */, double *out_doubles /* npairs*3 */) {
    merge_params_t P;
    P.minlen = iparams[0]; P.maxlen = iparams[1]; P.ascii_off = iparams[2];
    P.qmin = iparams[3]; P.qmax = iparams[4]; P.truncqual = iparams[5];
    P.maxns = iparams[6]; P.minovlen = iparams[7]; P.maxdiffs = iparams[8];
    P.minmergelen = iparams[9]; P.maxmergelen = iparams[10];
    P.allowstagger = (int)iparams[11];
    P.maxdiffpct = dparams[0]; P.maxee = dparams[1];
    merge_tables_t T = { q2p, qual_same, qual_diff, match_score, mism_score,
                         comp, ambig, two_bit };
    #pragma omp parallel
    {
        merge_scratch_t S;
        memset(&S, 0, sizeof(S));
        #pragma omp for schedule(dynamic, 64)
        for (int64_t p = 0; p < npairs; p++) {
            merge_one(fwd_buf + fwd_off[p], fwd_off[p + 1] - fwd_off[p],
                      fq_buf + fwd_off[p],
                      rev_buf + rev_off[p], rev_off[p + 1] - rev_off[p],
                      rq_buf + rev_off[p],
                      &P, &T, &S,
                      out_seq + out_off[p], out_qual + out_off[p],
                      out_ints + p * 8, out_doubles + p * 3);
        }
        free(S.next); free(S.poslist); free(S.diags);
    }
}
