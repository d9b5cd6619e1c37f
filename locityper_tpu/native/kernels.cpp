// Native host kernels for locityper-tpu.
//
// The reference implements its host runtime in Rust (seq/kmers.rs scalar
// rolling loops, fastx readers over htslib); this library provides the
// C++ equivalents behind a C ABI consumed via ctypes
// (locityper_tpu/native/__init__.py), with identical semantics to the numpy
// fallbacks in seq/kmers.py — parity is enforced by tests/test_native.py.
//
// Build: make -C locityper_tpu/native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------------
// DNA encoding: byte -> code (A=0 C=1 G=2 T=3, other=4).
// ---------------------------------------------------------------------------
static int8_t ENC[256];
static bool enc_init = false;

static void init_enc() {
    if (enc_init) return;
    memset(ENC, 4, sizeof(ENC));
    ENC[(unsigned char)'A'] = 0; ENC[(unsigned char)'a'] = 0;
    ENC[(unsigned char)'C'] = 1; ENC[(unsigned char)'c'] = 1;
    ENC[(unsigned char)'G'] = 2; ENC[(unsigned char)'g'] = 2;
    ENC[(unsigned char)'T'] = 3; ENC[(unsigned char)'t'] = 3;
    enc_init = true;
}

void encode_dna(const uint8_t* seq, int64_t n, int8_t* out) {
    init_enc();
    for (int64_t i = 0; i < n; i++) out[i] = ENC[seq[i]];
}

// ---------------------------------------------------------------------------
// Canonical k-mers (seq/kmers.py canonical_kmers): out_kmer[i] = canonical
// 2-bit packed k-mer at position i (UINT64_MAX when any base invalid),
// out_valid[i] in {0,1}.  k <= 31.
// ---------------------------------------------------------------------------
void canonical_kmers(const int8_t* codes, int64_t n, int32_t k,
                     uint64_t* out_kmer, uint8_t* out_valid) {
    const uint64_t UNDEF = ~0ULL;
    const int64_t m = n - k + 1;
    if (m <= 0) return;
    const uint64_t mask = (k == 32) ? ~0ULL : ((1ULL << (2 * k)) - 1);
    const int rv_shift = 2 * (k - 1);
    uint64_t fw = 0, rv = 0;
    int64_t since_invalid = 0;  // consecutive valid bases ending at i
    for (int64_t i = 0; i < n; i++) {
        int8_t c = codes[i];
        if (c < 4) {
            fw = ((fw << 2) | (uint64_t)c) & mask;
            rv = (rv >> 2) | ((uint64_t)(3 - c) << rv_shift);
            since_invalid++;
        } else {
            fw = 0; rv = 0; since_invalid = 0;
        }
        int64_t pos = i - k + 1;
        if (pos >= 0) {
            if (since_invalid >= k) {
                out_kmer[pos] = fw <= rv ? fw : rv;
                out_valid[pos] = 1;
            } else {
                out_kmer[pos] = UNDEF;
                out_valid[pos] = 0;
            }
        }
    }
}

// ---------------------------------------------------------------------------
// 32-bit minimizers (seq/kmers.py minimizers32): canonical k-mer (k <= 16)
// -> murmur3 mix -> first-argmin per w-window, deduplicated by position.
// Returns the number of minimizers written.
// ---------------------------------------------------------------------------
static inline uint32_t murmur3_mix32(uint32_t x) {
    x = ~x;
    x ^= x >> 16;
    x *= 0x85EBCA6Bu;
    x ^= x >> 13;
    return x;
}

int64_t minimizers32(const int8_t* codes, int64_t n, int32_t k, int32_t w,
                     int64_t* out_pos, uint32_t* out_hash, uint8_t* out_fwd) {
    const uint32_t UNDEF = 0xFFFFFFFFu;
    const int64_t m = n - k + 1;
    if (m < w) return 0;

    // Rolling hash buffer (ring of size >= w).
    const int64_t RING = 64;  // w < 64 always
    uint32_t hash_ring[RING];
    uint8_t fwd_ring[RING];

    const uint32_t mask = (uint32_t)((1ULL << (2 * k)) - 1);
    const int rv_shift = 2 * (k - 1);
    uint32_t fw = 0, rv = 0;
    int64_t since_invalid = 0;
    int64_t count = 0;
    int64_t last_out = -1;

    // Fill hashes incrementally; emit window results once i >= k-1+w-1.
    for (int64_t i = 0; i < n; i++) {
        int8_t c = codes[i];
        if (c < 4) {
            fw = ((fw << 2) | (uint32_t)c) & mask;
            rv = (rv >> 2) | ((uint32_t)(3 - c) << rv_shift);
            since_invalid++;
        } else {
            fw = 0; rv = 0; since_invalid = 0;
        }
        int64_t pos = i - k + 1;
        if (pos < 0) continue;
        bool valid = since_invalid >= k;
        bool is_fw = fw <= rv;
        uint32_t kmer = is_fw ? fw : rv;
        hash_ring[pos % RING] = valid ? murmur3_mix32(kmer) : UNDEF;
        fwd_ring[pos % RING] = is_fw ? 1 : 0;

        int64_t win_start = pos - w + 1;
        if (win_start < 0) continue;
        // First-argmin over [win_start, pos].
        uint32_t best = UNDEF;
        int64_t best_p = -1;
        for (int64_t p = win_start; p <= pos; p++) {
            uint32_t h = hash_ring[p % RING];
            if (h < best) { best = h; best_p = p; }
        }
        if (best == UNDEF) continue;
        if (best_p > last_out) {
            out_pos[count] = best_p;
            out_hash[count] = best;
            out_fwd[count] = fwd_ring[best_p % RING];
            count++;
            last_out = best_p;
        }
    }
    return count;
}

// ---------------------------------------------------------------------------
// FASTQ chunk parser: splits a decompressed FASTQ text buffer into encoded
// reads.  Records must be complete 4-line records.  Returns #reads parsed;
// out_codes is a flat buffer (each read padded to max_len with 4s),
// out_lens the true lengths, out_name_off/out_name_len index into buf.
// ---------------------------------------------------------------------------
int64_t parse_fastq(const uint8_t* buf, int64_t n, int32_t max_len,
                    int64_t max_reads, int8_t* out_codes, int32_t* out_lens,
                    int64_t* out_name_off, int32_t* out_name_len,
                    int64_t* consumed_out) {
    init_enc();
    int64_t i = 0, r = 0;
    if (consumed_out) *consumed_out = 0;
    while (i < n && r < max_reads) {
        int64_t rec_start = i;
        (void)rec_start;
        if (buf[i] != '@') break;
        int64_t name_start = i + 1;
        while (i < n && buf[i] != '\n') i++;
        if (i >= n) break;
        int64_t name_end = name_start;
        while (name_end < n && buf[name_end] != ' ' && buf[name_end] != '\n'
               && buf[name_end] != '\t') name_end++;
        i++;  // skip newline
        int64_t seq_start = i;
        while (i < n && buf[i] != '\n') i++;
        if (i >= n) break;
        int64_t seq_len = i - seq_start;
        i++;
        if (i >= n || buf[i] != '+') break;
        while (i < n && buf[i] != '\n') i++;
        if (i >= n) break;
        i++;
        int64_t qual_start = i;
        while (i < n && buf[i] != '\n') i++;
        if (i - qual_start != seq_len) break;  // malformed
        if (i < n) i++;

        int32_t L = seq_len < max_len ? (int32_t)seq_len : max_len;
        int8_t* dst = out_codes + r * (int64_t)max_len;
        for (int32_t j = 0; j < L; j++) dst[j] = ENC[buf[seq_start + j]];
        for (int32_t j = L; j < max_len; j++) dst[j] = 4;
        out_lens[r] = L;
        out_name_off[r] = name_start;
        out_name_len[r] = (int32_t)(name_end - name_start);
        r++;
        if (consumed_out) *consumed_out = i;
    }
    return r;
}

// ---------------------------------------------------------------------------
// Batched minimizers: one call for a whole read batch (concatenated codes +
// offsets), emitting (read_ix, pos, hash, fwd) tuples.  Avoids per-read FFI
// overhead in the candidate generator (model/locs.py candidates_batch).
// ---------------------------------------------------------------------------
int64_t minimizers32_batch(const int8_t* codes, const int64_t* offsets,
                           int64_t n_reads, int32_t k, int32_t w,
                           int64_t* out_read, int64_t* out_pos,
                           uint32_t* out_hash, uint8_t* out_fwd,
                           int64_t cap) {
    int64_t total = 0;
    for (int64_t r = 0; r < n_reads; r++) {
        const int8_t* seq = codes + offsets[r];
        int64_t n = offsets[r + 1] - offsets[r];
        if (total + (n > 0 ? n : 0) > cap) return -1;   // minimizers <= n
        int64_t cnt = minimizers32(seq, n, k, w, out_pos + total,
                                   out_hash + total, out_fwd + total);
        for (int64_t j = 0; j < cnt; j++) out_read[total + j] = r;
        total += cnt;
    }
    return total;
}

// ---------------------------------------------------------------------------
// Non-overlapping unique-k-mer count (model/locs.rs:958-992 / UniqueKmers
// .count_read): rolling canonical k-mers, membership in a sorted unique
// table, greedy k-step skip after each hit.
// ---------------------------------------------------------------------------
int64_t count_unique_nonoverlap(const int8_t* codes, int64_t n, int32_t k,
                                const uint64_t* uniq, int64_t m) {
    if (n < k || m == 0) return 0;
    const int64_t n_kmers = n - k + 1;
    // Compute canonical kmers into a small stack/heap buffer.
    uint64_t* km = new uint64_t[n_kmers];
    uint8_t* ok = new uint8_t[n_kmers];
    canonical_kmers(codes, n, k, km, ok);
    int64_t count = 0;
    for (int64_t t = 0; t < n_kmers; ) {
        bool hit = false;
        if (ok[t]) {
            // Binary search in uniq.
            int64_t lo = 0, hi = m;
            while (lo < hi) {
                int64_t mid = (lo + hi) >> 1;
                if (uniq[mid] < km[t]) lo = mid + 1;
                else hi = mid;
            }
            hit = lo < m && uniq[lo] == km[t];
        }
        if (hit) { count++; t += k; }
        else t++;
    }
    delete[] km; delete[] ok;
    return count;
}

// Batched variant: one call for a whole read set (flat codes + offsets),
// amortizing the Python/ctypes boundary over the batch.
void count_unique_nonoverlap_batch(const int8_t* codes, const int64_t* offsets,
                                   int64_t n_reads, int32_t k,
                                   const uint64_t* uniq, int64_t m,
                                   int64_t* out) {
    for (int64_t r = 0; r < n_reads; r++) {
        out[r] = count_unique_nonoverlap(codes + offsets[r],
                                         offsets[r + 1] - offsets[r], k,
                                         uniq, m);
    }
}

// ---------------------------------------------------------------------------
// Banded ML alignment WITH traceback (host twin of ops/align.py _align_one;
// reference role: WFA2-lib seq/wfa.rs + cigar.rs — CIGAR production for
// PAF/SAM output).  Same recurrence and tie-breaking as the device kernel:
//   band offset j in [0, band): read prefix i consumed -> target prefix i+j
//   row 0 free (glocal start), moves diag/ins/clip-start, then a within-row
//   deletion pass; end folds (qlen-i)*clip tail soft-clip.
// Tie-breaking parity: diag > ins > clip (strict > to replace); deletion
// taken only when strictly better than the local base (no_del restore).
//
// Outputs extended-CIGAR ops (0 '=', 1 'X', 2 'I', 3 'D', 4 'S') and the
// same payload vector as the device kernel.  Returns #ops, or -1 when the
// DP exceeds max_cells / op buffer.
// ---------------------------------------------------------------------------
static const float NEG_SCORE = -1e30f;

int64_t banded_align_cigar(const int8_t* query, int64_t qlen,
                           const int8_t* twin, int64_t wlen,
                           int32_t band, const float* sc,
                           int64_t max_cells,
                           int32_t* out_ops, int32_t* out_lens,
                           int64_t max_ops,
                           int32_t* out_info, float* out_score) {
    if (qlen <= 0 || band <= 0 || wlen < qlen + band) return -1;
    if ((qlen + 1) * (int64_t)band > max_cells) return -1;
    const float m_sc = sc[0], x_sc = sc[1], i_sc = sc[2], d_sc = sc[3],
                c_sc = sc[4];

    float* prev = new float[band];
    float* cur = new float[band];
    // Per-cell backpointers: base move (2 bits) | del jump << 2.
    uint16_t* bp = new uint16_t[(qlen + 1) * (int64_t)band];
    for (int32_t j = 0; j < band; j++) prev[j] = 0.0f;

    float best_score = NEG_SCORE;
    int64_t best_i = 0;
    int32_t best_j = 0;

    for (int64_t i = 1; i <= qlen; i++) {
        int8_t r_c = query[i - 1];
        uint16_t* brow = bp + i * (int64_t)band;
        const float clip_s = c_sc * (float)i;
        for (int32_t j = 0; j < band; j++) {
            int8_t h_c = twin[i - 1 + j];
            float sub = (h_c < 4 && r_c < 4)
                            ? (r_c == h_c ? m_sc : x_sc) : NEG_SCORE;
            float s = prev[j] + sub;           // diag
            uint16_t mv = 0;
            float ins_s = (j + 1 < band ? prev[j + 1] : NEG_SCORE) + i_sc;
            if (ins_s > s) { s = ins_s; mv = 1; }
            if (clip_s > s) { s = clip_s; mv = 2; }
            cur[j] = s;
            brow[j] = mv;
        }
        // Within-row deletion pass (max-plus prefix scan, ties keep base).
        float run = cur[0] - 0.0f;  // adjusted[0]
        int32_t origin = 0;
        for (int32_t j = 1; j < band; j++) {
            float adj = cur[j] - (float)j * d_sc;
            if (adj >= run) { run = adj; origin = j; }
            else {
                int32_t dj = j - origin;
                cur[j] = run + (float)j * d_sc;
                brow[j] = (uint16_t)(brow[origin] | ((uint32_t)dj << 2));
            }
        }
        // Fold tail clip.
        const float end_bonus = c_sc * (float)(qlen - i);
        for (int32_t j = 0; j < band; j++) {
            float cand = cur[j] + end_bonus;
            if (cand > best_score) { best_score = cand; best_i = i; best_j = j; }
        }
        float* t = prev; prev = cur; cur = t;
    }

    // Traceback from (best_i, best_j); ops emitted reversed, RLE on the fly.
    int64_t n_ops = 0;
    int32_t n_mism = 0, n_ins = 0, n_del = 0, n_clip = 0;
    int32_t start_p = 0, end_p = (int32_t)(best_i + best_j);
    bool fail = best_score <= NEG_SCORE / 2;

    // push-front helper (we reverse at the end).
    #define PUSH(op, len) do { \
        if (n_ops > 0 && out_ops[n_ops - 1] == (op)) out_lens[n_ops - 1] += (len); \
        else if (n_ops < max_ops) { out_ops[n_ops] = (op); out_lens[n_ops] = (len); n_ops++; } \
        else { fail = true; } \
    } while (0)

    if (!fail) {
        if (best_i < qlen) { PUSH(4, (int32_t)(qlen - best_i)); n_clip += (int32_t)(qlen - best_i); }
        int64_t i = best_i;
        int32_t j = best_j;
        while (i > 0 && !fail) {
            uint16_t cell = bp[i * (int64_t)band + j];
            int32_t dj = cell >> 2;
            if (dj > 0) { PUSH(3, dj); n_del += dj; j -= dj; cell = bp[i * (int64_t)band + j]; }
            uint16_t mv = cell & 3;
            if (mv == 0) {
                bool mism = query[i - 1] != twin[i - 1 + j];
                PUSH(mism ? 1 : 0, 1);
                if (mism) n_mism++;
                i--;
            } else if (mv == 1) {
                PUSH(2, 1); n_ins++;
                i--; j++;
            } else {  // clip-start: first i bases of the read soft-clipped
                PUSH(4, (int32_t)i); n_clip += (int32_t)i;
                start_p = (int32_t)(i + j);
                i = 0; j = -1;  // j unused past here
            }
        }
        if (j >= 0) start_p = j;
    }
    #undef PUSH

    delete[] prev; delete[] cur; delete[] bp;
    if (fail) return -1;
    // Reverse the op list in place.
    for (int64_t a = 0, b = n_ops - 1; a < b; a++, b--) {
        int32_t t1 = out_ops[a]; out_ops[a] = out_ops[b]; out_ops[b] = t1;
        int32_t t2 = out_lens[a]; out_lens[a] = out_lens[b]; out_lens[b] = t2;
    }
    out_info[0] = start_p; out_info[1] = end_p;
    out_info[2] = n_mism; out_info[3] = n_ins;
    out_info[4] = n_del; out_info[5] = n_clip;
    *out_score = best_score;
    return n_ops;
}

// ---------------------------------------------------------------------------
// Anchor voting (host twin of model/locs.py candidates_batch_flat, numpy
// fallback path; reference role: strobealign seeding inside recruit/locs).
// For each read's minimizers: binary-search the panel index, expand matching
// entries to (hap, orient, diagonal) anchors, vote per (hap, orient,
// diagonal-bucket), keep buckets with >= min_votes, and emit the top
// max_per_hap buckets per (hap, orient) by votes (ties: bucket ascending) —
// bit-identical ordering and rounding to the numpy path
// (tests/test_model_units.py parity).
// Returns rows written, or -1 if cap would be exceeded.
// ---------------------------------------------------------------------------

}  // extern "C" (pause: C++ internals below)

#include <algorithm>
#include <cmath>
#include <thread>
#include <vector>

namespace {

struct Anchor {
    uint64_t key;    // (hap << 33) | (orient << 32) | biased bucket
    int64_t diag;
};

static inline int64_t floordiv64(int64_t a, int64_t b) {
    int64_t q = a / b, r = a % b;
    return (r != 0 && ((r < 0) != (b < 0))) ? q - 1 : q;
}

struct Group {
    int64_t hap;
    int64_t orient;
    int64_t votes;
    int64_t diag;
};

static void anchor_votes_range(
    int64_t r_lo, int64_t r_hi, const int64_t* rstart,
    const int64_t* mpos, const uint32_t* mhash, const uint8_t* mfwd,
    const int64_t* rlens,
    const uint32_t* keys, const int32_t* ihap, const int32_t* ipos,
    const uint8_t* ifwd, int64_t n_idx,
    int32_t k, int32_t bstep, int32_t min_votes, int32_t max_per_hap,
    std::vector<int64_t>& out) {
    std::vector<Anchor> anchors;
    std::vector<Group> groups;
    for (int64_t r = r_lo; r < r_hi; r++) {
        anchors.clear();
        groups.clear();
        const int64_t rlen = rlens[r];
        for (int64_t t = rstart[r]; t < rstart[r + 1]; t++) {
            const uint32_t h = mhash[t];
            // lower_bound / upper_bound over the sorted key table.
            int64_t lo = std::lower_bound(keys, keys + n_idx, h) - keys;
            for (int64_t e = lo; e < n_idx && keys[e] == h; e++) {
                const bool same = (ifwd[e] != 0) == (mfwd[t] != 0);
                int64_t diag;
                int64_t orient;
                if (same) {
                    orient = 0;
                    diag = (int64_t)ipos[e] - mpos[t];
                } else {
                    orient = 1;
                    diag = (int64_t)ipos[e] - (rlen - k - mpos[t]);
                }
                const int64_t bucket = floordiv64(diag, bstep);
                const uint64_t key = ((uint64_t)ihap[e] << 33)
                    | ((uint64_t)orient << 32)
                    | (uint32_t)((int32_t)bucket ^ (int32_t)0x80000000);
                anchors.push_back({key, diag});
            }
        }
        if (anchors.empty()) continue;
        std::sort(anchors.begin(), anchors.end(),
                  [](const Anchor& a, const Anchor& b) {
                      return a.key < b.key;
                  });
        // Run-length vote per (hap, orient, bucket).
        for (size_t s = 0; s < anchors.size();) {
            size_t e = s;
            int64_t dsum = 0;
            while (e < anchors.size() && anchors[e].key == anchors[s].key) {
                dsum += anchors[e].diag;
                e++;
            }
            const int64_t votes = (int64_t)(e - s);
            if (votes >= min_votes) {
                const int64_t hap = (int64_t)(anchors[s].key >> 33);
                const int64_t orient = (anchors[s].key >> 32) & 1;
                // round-half-even, matching np.round(dsum / votes).
                const int64_t diag = (int64_t)std::nearbyint(
                    (double)dsum / (double)votes);
                groups.push_back({hap, orient, votes, diag});
            }
            s = e;
        }
        // Top max_per_hap per (hap, orient) by votes desc; stable sort keeps
        // bucket-ascending order among equal-vote groups.
        std::stable_sort(groups.begin(), groups.end(),
                         [](const Group& a, const Group& b) {
                             if (a.hap != b.hap) return a.hap < b.hap;
                             if (a.orient != b.orient)
                                 return a.orient < b.orient;
                             return a.votes > b.votes;
                         });
        int64_t prev_hap = -1, prev_or = -1, taken = 0;
        for (const Group& g : groups) {
            if (g.hap != prev_hap || g.orient != prev_or) {
                prev_hap = g.hap;
                prev_or = g.orient;
                taken = 0;
            }
            if (taken < max_per_hap) {
                out.push_back(r);
                out.push_back(g.hap);
                out.push_back(g.orient);
                out.push_back(g.diag);
                taken++;
            }
        }
    }
}

}  // namespace

extern "C" {

int64_t anchor_votes(const int64_t* mread, const int64_t* mpos,
                     const uint32_t* mhash, const uint8_t* mfwd, int64_t T,
                     const int64_t* rlens, int64_t n_reads,
                     const uint32_t* keys, const int32_t* ihap,
                     const int32_t* ipos, const uint8_t* ifwd, int64_t n_idx,
                     int32_t k, int32_t bstep, int32_t min_votes,
                     int32_t max_per_hap,
                     int64_t* out_read, int64_t* out_hap, int64_t* out_orient,
                     int64_t* out_diag, int64_t cap) {
    // Per-read minimizer spans (mread is sorted ascending).
    std::vector<int64_t> rstart(n_reads + 1, 0);
    for (int64_t t = 0; t < T; t++) rstart[mread[t] + 1]++;
    for (int64_t r = 0; r < n_reads; r++) rstart[r + 1] += rstart[r];

    int n_threads = (int)std::thread::hardware_concurrency();
    if (n_threads < 1) n_threads = 1;
    if (n_threads > 8) n_threads = 8;
    if (n_reads < 256) n_threads = 1;
    std::vector<std::vector<int64_t>> parts(n_threads);
    std::vector<std::thread> threads;
    const int64_t chunk = (n_reads + n_threads - 1) / n_threads;
    for (int i = 0; i < n_threads; i++) {
        const int64_t lo = i * chunk;
        const int64_t hi = std::min(n_reads, lo + chunk);
        if (lo >= hi) continue;
        threads.emplace_back(anchor_votes_range, lo, hi, rstart.data(),
                             mpos, mhash, mfwd, rlens, keys, ihap, ipos,
                             ifwd, n_idx, k, bstep, min_votes, max_per_hap,
                             std::ref(parts[i]));
    }
    for (auto& th : threads) th.join();
    int64_t total = 0;
    for (auto& p : parts) total += (int64_t)(p.size() / 4);
    if (total > cap) return -1;
    int64_t w = 0;
    for (auto& p : parts) {
        for (size_t s = 0; s < p.size(); s += 4) {
            out_read[w] = p[s];
            out_hap[w] = p[s + 1];
            out_orient[w] = p[s + 2];
            out_diag[w] = p[s + 3];
            w++;
        }
    }
    return total;
}

// Bytes consumed by complete FASTQ records within buf[0..n) (for chunked IO).
int64_t fastq_complete_prefix(const uint8_t* buf, int64_t n) {
    int64_t i = 0, last_complete = 0;
    while (i < n) {
        int64_t start = i;
        int nl = 0;
        while (i < n && nl < 4) {
            if (buf[i] == '\n') nl++;
            i++;
        }
        if (nl == 4) last_complete = i;
        else { i = start; break; }
    }
    return last_complete;
}

}  // extern "C"
