// Native host kernel: batched trace-block realignment position maps.
//
// The C++-grade host implementation mandated for the reference's native
// runtime parts (SURVEY §2.2: libmaus2 lcs/NP slice).  Computes, for each
// padded problem (A[0..la) vs B[0..lb)), the pinned A->B map of ALGORITHM §1:
//
//   bpos[x] = min { j : Dfwd(x, j) + Dbwd(x, j) = dist }
//
// evaluated only at the requested positions X (window-boundary lattice).
// Dfwd/Dbwd fills are Myers/Hyyro BIT-PARALLEL (~64 cells per word op,
// exact at any distance); rows needed at lattice positions are captured on
// the fly from the within-row delta bit vectors.  Threaded over problems.
//
// Build: g++ -O3 -shared -fPIC -o librealign.so realign.cpp -lpthread
// ABI consumed via ctypes (built by daccord_tpu/native/build.py,
// bound in daccord_tpu/align/editdp.py).

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>
#include <thread>

namespace {

inline int32_t min3(int32_t a, int32_t b, int32_t c) {
    return std::min(a, std::min(b, c));
}

// Myers/Hyyro bit-parallel Levenshtein fill (multi-word), capturing
// requested rows FULL-WIDTH and exactly (no band): per text row the
// within-row deltas D[i][j] - D[i][j-1] live in the VP/VN bit vectors
// (bit j-1), updated with ~15 word ops; captured rows reconstruct values
// by a running bit scan.  The (HP << 1) | 1 carry-in pins the D[i][0] = i
// boundary (global Levenshtein, not approximate matching).  ~64 DP cells
// per word op vs 1 for the scalar fill.  Reference shape: libmaus2
// lcs/NP-class O(nd) realign (SURVEY §2.2) — here O(n*m/64) exact.
void myers_capture_rows(const uint8_t* a, int64_t la, const uint8_t* b,
                        int64_t lb, const int64_t* rows, int64_t nrows,
                        int32_t* cap, std::vector<uint64_t>& scratch) {
    const int64_t nw = (lb + 63) >> 6;
    scratch.assign(6 * nw, 0);                 // PEq[0..3], VP, VN
    uint64_t* PEq = scratch.data();
    uint64_t* VP = PEq + 4 * nw;
    uint64_t* VN = VP + nw;
    for (int64_t j = 0; j < lb; ++j)
        PEq[(b[j] & 3) * nw + (j >> 6)] |= 1ull << (j & 63);
    for (int64_t w = 0; w < nw; ++w) VP[w] = ~0ull;

    int64_t ri = 0;
    while (ri < nrows && rows[ri] == 0) {
        int32_t* dst = cap + ri * (lb + 1);
        for (int64_t j = 0; j <= lb; ++j) dst[j] = (int32_t)j;
        ++ri;
    }
    for (int64_t i = 1; i <= la && ri < nrows; ++i) {
        const uint64_t* Eq = PEq + (a[i - 1] & 3) * nw;
        uint64_t carry = 0;                    // addition carry
        uint64_t hp_in = 1, hn_in = 0;         // shift carry-ins (|1 = the
        for (int64_t w = 0; w < nw; ++w) {     //  D[i][0] boundary delta)
            const uint64_t vp = VP[w], vn = VN[w], eq = Eq[w];
            const uint64_t x = eq & vp;
            uint64_t sum = x + vp;
            uint64_t c1 = sum < x;
            sum += carry;
            carry = c1 | (sum < carry);
            const uint64_t d0 = (sum ^ vp) | eq | vn;
            const uint64_t hp = vn | ~(d0 | vp);
            const uint64_t hn = vp & d0;
            const uint64_t hps = (hp << 1) | hp_in;
            const uint64_t hns = (hn << 1) | hn_in;
            hp_in = hp >> 63;
            hn_in = hn >> 63;
            VP[w] = hns | ~(d0 | hps);
            VN[w] = hps & d0;
        }
        while (ri < nrows && rows[ri] == i) {
            int32_t* dst = cap + ri * (lb + 1);
            int32_t val = (int32_t)i;
            dst[0] = val;
            for (int64_t j = 1; j <= lb; ++j) {
                const int64_t w = (j - 1) >> 6, bit = (j - 1) & 63;
                val += (int32_t)((VP[w] >> bit) & 1)
                       - (int32_t)((VN[w] >> bit) & 1);
                dst[j] = val;
            }
            ++ri;
        }
    }
}

struct BposScratch {
    std::vector<int64_t> xs, order, rows_f, rows_b;
    std::vector<int32_t> capf, capb;
    std::vector<uint8_t> ar, br;
    std::vector<uint64_t> bits;
};

void one_problem(const uint8_t* A, const uint8_t* B, int64_t la, int64_t lb,
                 int64_t LB, const int64_t* X, int64_t PX, int64_t* out,
                 int64_t band, BposScratch& S) {
    // sort/unique requested positions, remembering mapping
    auto& xs = S.xs;
    xs.assign(X, X + PX);
    for (auto& x : xs) x = std::min(std::max<int64_t>(x, 0), la);
    auto& order = S.order;
    order.resize(PX);
    for (int64_t p = 0; p < PX; ++p) order[p] = p;
    std::sort(order.begin(), order.end(),
              [&](int64_t u, int64_t v) { return xs[u] < xs[v]; });
    auto& rows_f = S.rows_f;
    auto& rows_b = S.rows_b;
    rows_f.clear();
    rows_b.clear();
    for (int64_t p = 0; p < PX; ++p) rows_f.push_back(xs[order[p]]);
    // backward rows needed: la - x, ascending
    for (int64_t p = PX - 1; p >= 0; --p) rows_b.push_back(la - rows_f[p]);

    auto& capf = S.capf;
    auto& capb = S.capb;
    auto& ar = S.ar;
    auto& br = S.br;
    capf.resize(PX * (lb + 1));
    capb.resize(PX * (lb + 1));
    ar.resize(la);
    br.resize(lb);
    for (int64_t i = 0; i < la; ++i) ar[i] = A[la - 1 - i];
    for (int64_t j = 0; j < lb; ++j) br[j] = B[lb - 1 - j];

    // bit-parallel exact full-width fills (band is unnecessary: the Myers
    // kernel is exact at any distance and ~64 cells/word-op; the parameter
    // is kept in the ABI as a no-op hint for compatibility)
    (void)band;
    myers_capture_rows(A, la, B, lb, rows_f.data(), PX, capf.data(),
                       S.bits);
    myers_capture_rows(ar.data(), la, br.data(), lb, rows_b.data(), PX,
                       capb.data(), S.bits);

    for (int64_t p = 0; p < PX; ++p) {
        const int32_t* rf = capf.data() + p * (lb + 1);
        // backward row for x = rows_f[p] is at capb index (PX-1-p)
        const int32_t* rb = capb.data() + (PX - 1 - p) * (lb + 1);
        // Dbwd(x, j) = Drev(la - x, lb - j) = rb[lb - j]
        int32_t best = INT32_MAX;
        int64_t bestj = 0;
        for (int64_t j = 0; j <= lb; ++j) {
            const int32_t v = rf[j] + rb[lb - j];
            if (v < best) { best = v; bestj = j; }
        }
        out[order[p]] = bestj;
    }
}

// Full DP table + pinned traceback op counts (ALGORITHM §1 preference
// D > U > L) for one problem; counts = (match, mismatch, U, L).
void one_ops(const uint8_t* a, int64_t la, const uint8_t* b, int64_t lb,
             int64_t* cnt, std::vector<int32_t>& D) {
    const int64_t W = lb + 1;
    D.resize((la + 1) * W);
    for (int64_t j = 0; j <= lb; ++j) D[j] = (int32_t)j;
    for (int64_t i = 1; i <= la; ++i) {
        int32_t* row = D.data() + i * W;
        const int32_t* prev = D.data() + (i - 1) * W;
        row[0] = (int32_t)i;
        const uint8_t ai = a[i - 1];
        for (int64_t j = 1; j <= lb; ++j)
            row[j] = min3(prev[j - 1] + (ai != b[j - 1]), prev[j] + 1,
                          row[j - 1] + 1);
    }
    int64_t i = la, j = lb;
    while (i > 0 || j > 0) {
        const int32_t cur = D[i * W + j];
        if (i > 0 && j > 0 &&
            cur == D[(i - 1) * W + (j - 1)] + (a[i - 1] != b[j - 1])) {
            cnt[a[i - 1] == b[j - 1] ? 0 : 1]++;
            --i; --j;
        } else if (i > 0 && cur == D[(i - 1) * W + j] + 1) {
            cnt[2]++; --i;
        } else {
            cnt[3]++; --j;
        }
    }
}

}  // namespace

extern "C" {

// Summed traceback op counts over a padded batch -> out[4]
// (match, mismatch, A-only 'U', B-only 'L'); threaded over problems.
void ops_count_batch(const uint8_t* A, const int64_t* la, const uint8_t* B,
                     const int64_t* lb, int64_t N, int64_t LA, int64_t LB,
                     int64_t* out, int64_t nthreads) {
    if (nthreads < 1) nthreads = 1;
    std::vector<int64_t> partial(nthreads * 4, 0);
    auto worker = [&](int64_t t) {
        std::vector<int32_t> scratch;
        for (int64_t n = t; n < N; n += nthreads)
            one_ops(A + n * LA, la[n], B + n * LB, lb[n],
                    partial.data() + t * 4, scratch);
    };
    if (nthreads == 1) {
        worker(0);
    } else {
        std::vector<std::thread> ts;
        for (int64_t t = 0; t < nthreads; ++t) ts.emplace_back(worker, t);
        for (auto& th : ts) th.join();
    }
    for (int64_t q = 0; q < 4; ++q) {
        out[q] = 0;
        for (int64_t t = 0; t < nthreads; ++t) out[q] += partial[t * 4 + q];
    }
}

// Per-problem traceback op counts -> out[N][4] (match, mismatch, U, L);
// threaded over problems (positional error-profile estimation, ALGORITHM
// §7 v2: the caller bins rows by read position).
void ops_count_rows(const uint8_t* A, const int64_t* la, const uint8_t* B,
                    const int64_t* lb, int64_t N, int64_t LA, int64_t LB,
                    int64_t* out, int64_t nthreads) {
    if (nthreads < 1) nthreads = 1;
    std::memset(out, 0, N * 4 * sizeof(int64_t));
    auto worker = [&](int64_t t) {
        std::vector<int32_t> scratch;
        for (int64_t n = t; n < N; n += nthreads)
            one_ops(A + n * LA, la[n], B + n * LB, lb[n], out + n * 4,
                    scratch);
    };
    if (nthreads == 1) {
        worker(0);
    } else {
        std::vector<std::thread> ts;
        for (int64_t t = 0; t < nthreads; ++t) ts.emplace_back(worker, t);
        for (auto& th : ts) th.join();
    }
}

// Window-stitch merge positions (ALGORITHM §5): for each run of adjacent
// window consensi, walk the merges sequentially: jstar = first argmin_j
// D[lt][j] (j <= lq) of the edit DP of the lp-suffix `tail` vs the next
// winner q, then tail <- suffix_lp(tail + q[jstar:]).  Emits jstar per
// window (first window of a run: 0).  Bit-identical to the pinned numpy
// lockstep (stitcher._batched_merge_jstar); threaded over runs.
void stitch_jstar_runs(const uint8_t* Q, const int64_t* qlen,
                       const int64_t* run_off, int64_t nruns, int64_t LQ,
                       int64_t lp, int64_t* jstar, int64_t nthreads) {
    if (nthreads < 1) nthreads = 1;
    auto worker = [&](int64_t t) {
        std::vector<uint8_t> tail(lp), cat(2 * lp + LQ);
        std::vector<int32_t> r0(LQ + 1), r1(LQ + 1);
        for (int64_t r = t; r < nruns; r += nthreads) {
            const int64_t w0 = run_off[r], w1 = run_off[r + 1];
            int64_t lt = std::min(qlen[w0], lp);
            std::memcpy(tail.data(), Q + w0 * LQ + (qlen[w0] - lt), lt);
            jstar[w0] = 0;
            for (int64_t w = w0 + 1; w < w1; ++w) {
                const uint8_t* q = Q + w * LQ;
                const int64_t lq = qlen[w];
                // row DP to row lt over columns 0..lq
                for (int64_t j = 0; j <= lq; ++j) r0[j] = (int32_t)j;
                for (int64_t i = 1; i <= lt; ++i) {
                    r1[0] = (int32_t)i;
                    const uint8_t pi = tail[i - 1];
                    for (int64_t j = 1; j <= lq; ++j)
                        r1[j] = min3(r0[j - 1] + (pi != q[j - 1]),
                                     r0[j] + 1, r1[j - 1] + 1);
                    std::swap(r0, r1);
                }
                int32_t best = INT32_MAX;
                int64_t bj = 0;
                for (int64_t j = 0; j <= lq; ++j)
                    if (r0[j] < best) { best = r0[j]; bj = j; }
                jstar[w] = bj;
                // tail <- last lp of (tail + q[bj:])
                const int64_t np_ = lq - bj;
                std::memcpy(cat.data(), tail.data(), lt);
                std::memcpy(cat.data() + lt, q + bj, np_);
                const int64_t lc = lt + np_;
                lt = std::min(lc, lp);
                std::memcpy(tail.data(), cat.data() + (lc - lt), lt);
            }
        }
    };
    if (nthreads == 1) {
        worker(0);
    } else {
        std::vector<std::thread> ts;
        for (int64_t t = 0; t < nthreads; ++t) ts.emplace_back(worker, t);
        for (auto& th : ts) th.join();
    }
}

// band: per-problem diagonal half-width (banded O(n*d) fill with full-DP
// fallback when the band saturates — results bit-identical), or NULL for
// full DP on every problem.  Callers derive the band from the trace-block
// diff counts d_j, which upper-bound the true edit distance (the producing
// aligner found an alignment with d_j differences).
void bpos_at_batch(const uint8_t* A, const int64_t* la, const uint8_t* B,
                   const int64_t* lb, const int64_t* X, int64_t PX,
                   int64_t N, int64_t LA, int64_t LB, int64_t* out,
                   int64_t nthreads, const int64_t* band) {
    if (nthreads < 1) nthreads = 1;
    auto worker = [&](int64_t t) {
        BposScratch S;
        for (int64_t n = t; n < N; n += nthreads) {
            one_problem(A + n * LA, B + n * LB, la[n], lb[n], LB,
                        X + n * PX, PX, out + n * PX,
                        band ? band[n] : -1, S);
        }
    };
    if (nthreads == 1) {
        worker(0);
    } else {
        std::vector<std::thread> ts;
        for (int64_t t = 0; t < nthreads; ++t) ts.emplace_back(worker, t);
        for (auto& th : ts) th.join();
    }
}

// Ragged row gather for device-batch packing (pipeline/rows.py
// pack_rows_batch): copy nrows variable-length byte rows from a flat pool
// into fixed-stride batch rows.  The numpy fancy-index equivalent builds
// ~2 int64 index arrays over every element (~100MB of temporaries per
// 256x65-window batch at 60x coverage); here it is one memcpy per row.
// Reference role: libmaus2 buffered pile assembly (SURVEY §2.2 trace
// containers / buffered IO rows).
void ragged_gather_rows(uint8_t* dstS, const uint8_t* pool,
                        const int64_t* dst_row, const int64_t* src_start,
                        const int32_t* lens, int64_t nrows, int64_t Wp) {
    for (int64_t r = 0; r < nrows; ++r) {
        std::memcpy(dstS + dst_row[r] * Wp, pool + src_start[r],
                    (size_t)lens[r]);
    }
}

}  // extern "C"
