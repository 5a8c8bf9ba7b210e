// Native host kernel: batched trace-block realignment position maps.
//
// The C++-grade host implementation mandated for the reference's native
// runtime parts (SURVEY §2.2: libmaus2 lcs/NP slice).  Computes, for each
// padded problem (A[0..la) vs B[0..lb)), the pinned A->B map of ALGORITHM §1:
//
//   bpos[x] = min { j : Dfwd(x, j) + Dbwd(x, j) = dist }
//
// evaluated only at the requested positions X (window-boundary lattice).
// Dfwd rows are computed streaming (two rolling rows); the rows needed at
// lattice positions are captured on the fly, and likewise for the backward
// DP on the reversed strings.  ~3 ops/cell scalar; threaded over problems.
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

constexpr int32_t BANDBIG = 1 << 28;   // out-of-band sentinel (sum-safe)

// Fill forward DP over (a[0..la) x b[0..lb)), capturing rows listed in
// rows_sorted (ascending, unique, values in [0, la]) into cap (each lb+1).
void dp_capture_rows(const uint8_t* a, int64_t la, const uint8_t* b,
                     int64_t lb, const int64_t* rows, int64_t nrows,
                     int32_t* cap /* [nrows][lb+1] */, int32_t* r0,
                     int32_t* r1) {
    for (int64_t j = 0; j <= lb; ++j) r0[j] = (int32_t)j;
    int64_t ri = 0;
    while (ri < nrows && rows[ri] == 0) {
        std::memcpy(cap + ri * (lb + 1), r0, (lb + 1) * sizeof(int32_t));
        ++ri;
    }
    for (int64_t i = 1; i <= la; ++i) {
        r1[0] = (int32_t)i;
        const uint8_t ai = a[i - 1];
        for (int64_t j = 1; j <= lb; ++j) {
            const int32_t sub = r0[j - 1] + (ai != b[j - 1]);
            r1[j] = min3(sub, r0[j] + 1, r1[j - 1] + 1);
        }
        std::swap(r0, r1);
        while (ri < nrows && rows[ri] == i) {
            std::memcpy(cap + ri * (lb + 1), r0, (lb + 1) * sizeof(int32_t));
            ++ri;
        }
    }
}

// Banded forward fill (diagonal band |j - i| <= s), capturing requested rows
// FULL-WIDTH with BANDBIG outside the band.  Exact for all cells on any
// optimal path when the true distance <= s (every optimal path's |#ins -
// #del| prefix imbalance is bounded by the distance) — the libmaus2
// lcs/NP-class O(n*d) shape (SURVEY §2.2; VERDICT r2 item 5).
void dp_capture_rows_banded(const uint8_t* a, int64_t la, const uint8_t* b,
                            int64_t lb, const int64_t* rows, int64_t nrows,
                            int32_t* cap, int32_t* r0, int32_t* r1,
                            int64_t s) {
    for (int64_t j = 0; j <= lb; ++j) r0[j] = j <= s ? (int32_t)j : BANDBIG;
    int64_t ri = 0;
    while (ri < nrows && rows[ri] == 0) {
        std::memcpy(cap + ri * (lb + 1), r0, (lb + 1) * sizeof(int32_t));
        ++ri;
    }
    for (int64_t i = 1; i <= la; ++i) {
        const int64_t jlo = std::max<int64_t>(1, i - s);
        const int64_t jhi = std::min(lb, i + s);
        // cells outside [jlo, jhi] are out of band this row; the boundary
        // cell jlo-1 must read as the true column-0 value (i, when in band)
        // or BANDBIG for the left-neighbor dependency
        if (jlo - 1 <= lb)
            r1[jlo - 1] = (i <= s && jlo == 1) ? (int32_t)i : BANDBIG;
        const uint8_t ai = a[i - 1];
        for (int64_t j = jlo; j <= jhi; ++j) {
            const int32_t sub = r0[j - 1] + (ai != b[j - 1]);
            r1[j] = min3(sub, r0[j] + 1, r1[j - 1] + 1);
        }
        if (jhi + 1 <= lb) r1[jhi + 1] = BANDBIG;  // right fringe for row i+1
        std::swap(r0, r1);
        while (ri < nrows && rows[ri] == i) {
            // full-width capture: fill out-of-band cells with BANDBIG;
            // lo/hi clamp also covers rows entirely out of band (la >> lb
            // with a tiny band), where nothing valid exists to copy
            int32_t* dst = cap + ri * (lb + 1);
            const int64_t lo = std::min(std::max<int64_t>(jlo - 1, 0),
                                        lb + 1);
            const int64_t hi = std::min(jhi, lb);
            for (int64_t j = 0; j < lo; ++j) dst[j] = BANDBIG;
            if (hi >= lo)
                std::memcpy(dst + lo, r0 + lo,
                            (hi - lo + 1) * sizeof(int32_t));
            for (int64_t j = std::max(hi + 1, lo); j <= lb; ++j)
                dst[j] = BANDBIG;
            ++ri;
        }
    }
}

struct BposScratch {
    std::vector<int64_t> xs, order, rows_f, rows_b;
    std::vector<int32_t> capf, capb, r0, r1;
    std::vector<uint8_t> ar, br;
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
    auto& r0 = S.r0;
    auto& r1 = S.r1;
    auto& ar = S.ar;
    auto& br = S.br;
    capf.resize(PX * (lb + 1));
    capb.resize(PX * (lb + 1));
    r0.resize(lb + 1);
    r1.resize(lb + 1);
    ar.resize(la);
    br.resize(lb);
    for (int64_t i = 0; i < la; ++i) ar[i] = A[la - 1 - i];
    for (int64_t j = 0; j < lb; ++j) br[j] = B[lb - 1 - j];

    if (band >= 0) {
        dp_capture_rows_banded(A, la, B, lb, rows_f.data(), PX, capf.data(),
                               r0.data(), r1.data(), band);
        dp_capture_rows_banded(ar.data(), la, br.data(), lb, rows_b.data(),
                               PX, capb.data(), r0.data(), r1.data(), band);
    } else {
        dp_capture_rows(A, la, B, lb, rows_f.data(), PX, capf.data(),
                        r0.data(), r1.data());
        dp_capture_rows(ar.data(), la, br.data(), lb, rows_b.data(), PX,
                        capb.data(), r0.data(), r1.data());
    }

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
        if (band >= 0 && best > band) {
            // band saturated (the min over j at any row equals the true
            // distance when <= band): exactness fallback to the full DP
            one_problem(A, B, la, lb, LB, X, PX, out, -1, S);
            return;
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

}  // extern "C"
