// Native CPU window consensus: the honest C++ baseline (VERDICT r2 item 3).
//
// A C++ implementation of the pinned consensus algorithm (ALGORITHM §4, §6)
// in the REFERENCE'S OWN architecture (gt1/daccord `src/daccord.cpp`
// `DebruijnGraph` per-window sparse traversal + `libmaus2::lcs` O(nd)-class
// candidate scoring; SURVEY §3.4): sparse sorted k-mer node tables, per-edge
// max-plus relaxation with backpointers, Landau-Vishkin (exact unit-cost
// O(n·d)) candidate scoring.  Bit-identical to the NumPy oracle
// (daccord_tpu/oracle/dbg.py window_consensus_adaptive) — asserted by
// tests/test_cpu_consensus.py — so bench.py can measure a *real C++ CPU
// reads/s* denominator for the ≥10×-CPU north star instead of the
// NumPy-oracle proxy (BASELINE.md measurement plan (a)).
//
// Built into librealign.so (native/build.py); ctypes ABI below.

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>
#include <thread>

namespace {

constexpr int64_t NEG = -(int64_t(1) << 29);
constexpr int64_t NEG_HALF = -(int64_t(1) << 28);
constexpr int32_t PBW_CLAMP = 16383;   // ALGORITHM §4 saturation bound

// Exact unit-cost Levenshtein via Landau-Vishkin furthest-reaching diagonals
// (O(n·d), the libmaus2::lcs::NP-class algorithm; SURVEY §2.2).  Equals the
// full-table DP of ALGORITHM §1 exactly (same metric, any exact algorithm).
int32_t lv_edit_distance(const uint8_t* a, int64_t n, const uint8_t* b,
                         int64_t m, std::vector<int32_t>& V) {
    const int64_t dmax = n + m;
    if (dmax == 0) return 0;
    // Vprev/Vcur: furthest a-prefix x with edit distance d on diagonal
    // kd = x - y (y = matched b-prefix length); INT32_MIN = unreachable.
    // Two rows so every read is a (d-1)-value.
    V.assign(2 * (2 * dmax + 3), INT32_MIN);
    int32_t* Vprev = V.data();
    int32_t* Vcur = V.data() + (2 * dmax + 3);
    const int64_t off = dmax + 1;
    {
        int64_t x = 0;
        while (x < n && x < m && a[x] == b[x]) ++x;
        if (x == n && x == m) return 0;             // implies n == m
        Vprev[off] = (int32_t)x;
    }
    for (int64_t d = 1; d <= dmax; ++d) {
        const int64_t klo = std::max(-d, -m), khi = std::min(d, n);
        for (int64_t kd = klo; kd <= khi; ++kd) {
            // predecessors at d-1: substitution (same diag, x+1 y+1),
            // a-deletion (diag kd-1, x+1 same y), b-insertion (diag kd+1,
            // same x, y+1); each candidate must stay inside [0,n]x[0,m]
            int64_t x = INT64_MIN;
            const int32_t vs = Vprev[off + kd];
            if (vs != INT32_MIN && vs + 1 <= n && vs + 1 - kd <= m)
                x = vs + 1;
            const int32_t vd = Vprev[off + kd - 1];
            if (vd != INT32_MIN && vd + 1 <= n && vd + 1 > x) x = vd + 1;
            const int32_t vi = Vprev[off + kd + 1];
            if (vi != INT32_MIN && vi - kd <= m && vi > x) x = vi;
            if (x == INT64_MIN) { Vcur[off + kd] = INT32_MIN; continue; }
            int64_t y = x - kd;
            while (x < n && y < m && a[x] == b[y]) { ++x; ++y; }
            Vcur[off + kd] = (int32_t)x;
        }
        if (n - m >= klo && n - m <= khi && Vcur[off + (n - m)] >= n)
            return (int32_t)d;
        std::swap(Vprev, Vcur);
        // no clearing needed: diagonal ranges grow monotonically with d, so
        // any slot outside a row's written range was never written by any
        // earlier row of that buffer and still holds the INT32_MIN init
    }
    return (int32_t)dmax;
}

struct Scratch {
    std::vector<int64_t> kcode;     // (code) per k-mer occurrence
    std::vector<int32_t> kpos;
    std::vector<int64_t> epair;     // packed (ecode, pos) for sorting
    std::vector<int64_t> nodes;     // sorted unique k-mer codes
    std::vector<int64_t> src, snk;  // per-node Q16 scores
    std::vector<int64_t> ecu;       // sorted unique (k+1)-mer codes
    std::vector<int32_t> wbins;     // [ne][ncols] weighted counts
    std::vector<int32_t> eui, evi;  // edge endpoint node indices
    std::vector<int64_t> score, nscore;
    std::vector<int32_t> bp;        // [(t_hi+1)][nn] backpointer edge ids
    std::vector<int32_t> endn;      // end node per T slot (-1 = none)
    std::vector<uint8_t> cand;      // [nc][LC] candidate bases
    std::vector<int32_t> clen;
    std::vector<int32_t> lvV;       // Landau-Vishkin diag table
};

// One window at one k.  rows: [nr] (start, len) into pool.  plq: [Wp][w+1]
// row-major int32.  pbw: [NB][NB] or null.  Returns winner length (0 = fail)
// and writes bases to out (caller-sized >= LC).
int32_t window_consensus_k(
    const uint8_t* pool, const int64_t* rstart, const int32_t* rlen,
    int64_t nr, const int32_t* plq, int64_t plq_stride,
    const int32_t* pbw, int64_t NB,
    int64_t k, int64_t w, int64_t path_delta, int64_t g, int64_t e_q6,
    uint8_t* out, Scratch& S) {
    if (w - k < 0) return 0;
    const int64_t maskk = (int64_t(1) << (2 * k)) - 1;

    // ---- k-mer and (k+1)-mer occurrence lists (ALGORITHM §4) ----
    S.kcode.clear(); S.kpos.clear(); S.epair.clear();
    for (int64_t r = 0; r < nr; ++r) {
        const uint8_t* s = pool + rstart[r];
        const int64_t n = rlen[r];
        if (n >= k) {
            int64_t code = 0;
            for (int64_t i = 0; i < k; ++i) code = code * 4 + s[i];
            S.kcode.push_back(code); S.kpos.push_back(0);
            for (int64_t p = 1; p + k <= n; ++p) {
                code = ((code & (maskk >> 2)) << 2) | s[p + k - 1];
                S.kcode.push_back(code); S.kpos.push_back((int32_t)p);
            }
        }
        if (n >= k + 1) {
            int64_t code = 0;
            for (int64_t i = 0; i < k + 1; ++i) code = code * 4 + s[i];
            // pack (ecode, pos): ecode < 4^13 = 2^26, pos < 2^16
            S.epair.push_back((code << 16) | 0);
            for (int64_t p = 1; p + k + 1 <= n; ++p) {
                code = ((code & maskk) << 2) | s[p + k];
                S.epair.push_back((code << 16) | p);
            }
        }
    }
    if (S.kcode.empty() || S.epair.empty()) return 0;

    // ---- sorted unique nodes + SRC/SNK Q16 scores ----
    S.nodes.assign(S.kcode.begin(), S.kcode.end());
    std::sort(S.nodes.begin(), S.nodes.end());
    S.nodes.erase(std::unique(S.nodes.begin(), S.nodes.end()), S.nodes.end());
    const int64_t nn = (int64_t)S.nodes.size();
    S.src.assign(nn, 0); S.snk.assign(nn, 0);
    for (size_t i = 0; i < S.kcode.size(); ++i) {
        const int64_t ni = std::lower_bound(S.nodes.begin(), S.nodes.end(),
                                            S.kcode[i]) - S.nodes.begin();
        const int32_t* pr = plq + S.kpos[i] * plq_stride;
        S.src[ni] += pr[0];
        S.snk[ni] += pr[w - k];
    }
    int64_t source = -1, best_src = 0;
    for (int64_t i = 0; i < nn; ++i)
        if (S.src[i] > best_src) { best_src = S.src[i]; source = i; }
    if (source < 0) return 0;                       // SRC all <= 0

    const int64_t t_exp = w - k;
    const int64_t t_lo = std::max<int64_t>(0, t_exp - path_delta);
    const int64_t t_hi = t_exp + path_delta;

    // ---- unique edges with per-step-bin weighted counts ----
    std::sort(S.epair.begin(), S.epair.end());     // by (ecode, pos)
    const int64_t ncols = pbw ? NB : 1;
    const int64_t g_step = pbw ? g : std::max<int64_t>(t_hi, 1);
    S.ecu.clear(); S.wbins.clear();
    {
        size_t i = 0;
        while (i < S.epair.size()) {
            const int64_t ec = S.epair[i] >> 16;
            S.ecu.push_back(ec);
            const size_t base = S.wbins.size();
            S.wbins.resize(base + ncols, 0);
            while (i < S.epair.size() && (S.epair[i] >> 16) == ec) {
                if (pbw) {
                    const int64_t row = std::min<int64_t>(
                        (S.epair[i] & 0xffff) / g, NB - 1);
                    const int32_t* pr = pbw + row * NB;
                    for (int64_t j = 0; j < ncols; ++j) {
                        int64_t v = (int64_t)S.wbins[base + j] + pr[j];
                        S.wbins[base + j] =
                            (int32_t)std::min<int64_t>(v, PBW_CLAMP);
                    }
                } else {
                    S.wbins[base]++;        // raw counts (oracle v1 path)
                }
                ++i;
            }
        }
    }
    // NOTE: the oracle clamps AFTER full accumulation; clamping during
    // accumulation of non-negative terms is identical (monotone saturation).
    const int64_t ne = (int64_t)S.ecu.size();
    S.eui.resize(ne); S.evi.resize(ne);
    for (int64_t e2 = 0; e2 < ne; ++e2) {
        // endpoints of a (k+1)-mer are themselves observed k-mers of the
        // same string, so lower_bound always hits (oracle's isin is a no-op)
        S.eui[e2] = (int32_t)(std::lower_bound(S.nodes.begin(), S.nodes.end(),
                              S.ecu[e2] >> 2) - S.nodes.begin());
        S.evi[e2] = (int32_t)(std::lower_bound(S.nodes.begin(), S.nodes.end(),
                              S.ecu[e2] & maskk) - S.nodes.begin());
    }

    // ---- max-plus DP with backpointers (ALGORITHM §4) ----
    // Tie rule: per target, max cand; among equal cands the first edge in
    // ascending-ecu order wins == smallest predecessor u == the oracle's
    // lexsort((e_c, -cand, evi)) pick (e_c is monotone in u for fixed v).
    S.score.assign(nn, NEG);
    S.score[source] = 0;
    S.bp.assign((t_hi + 1) * nn, -1);
    S.endn.assign(t_hi - t_lo + 1, -1);
    auto pick_end = [&](std::vector<int64_t>& sc) -> int32_t {
        int64_t best = NEG; int32_t bi = -1;
        for (int64_t i = 0; i < nn; ++i)
            if (S.snk[i] > 0 && sc[i] > NEG_HALF && sc[i] > best) {
                best = sc[i]; bi = (int32_t)i;
            }
        return bi;
    };
    if (t_lo == 0) S.endn[0] = pick_end(S.score);
    for (int64_t t = 1; t <= t_hi; ++t) {
        const int64_t col = std::min<int64_t>((t - 1) / g_step, ncols - 1);
        S.nscore.assign(nn, NEG);
        int32_t* bpt = S.bp.data() + t * nn;
        for (int64_t e2 = 0; e2 < ne; ++e2) {
            const int32_t wt = S.wbins[e2 * ncols + col];
            if (wt <= 0) continue;
            const int64_t sc = S.score[S.eui[e2]];
            if (sc <= NEG_HALF) continue;
            const int64_t cand = sc + wt;
            if (cand > S.nscore[S.evi[e2]]) {
                S.nscore[S.evi[e2]] = cand;
                bpt[S.evi[e2]] = (int32_t)e2;
            }
        }
        S.score.swap(S.nscore);
        if (t >= t_lo) S.endn[t - t_lo] = pick_end(S.score);
    }

    // ---- decode candidates in increasing-T order ----
    const int64_t LC = w + path_delta;             // max k + t_hi
    S.cand.clear(); S.clen.clear();
    std::vector<uint8_t> rev;
    for (int64_t s2 = 0; s2 < (int64_t)S.endn.size(); ++s2) {
        const int64_t T = t_lo + s2;
        int32_t cur = S.endn[s2];
        if (cur < 0) continue;
        rev.clear();
        bool ok = true;
        for (int64_t t = T; t >= 1; --t) {
            const int32_t e2 = S.bp[t * nn + cur];
            if (e2 < 0) { ok = false; break; }
            rev.push_back((uint8_t)(S.nodes[cur] & 3));
            cur = S.eui[e2];
        }
        if (!ok || cur != source) continue;
        const size_t base = S.cand.size();
        S.cand.resize(base + LC, 0);
        int64_t code = S.nodes[cur];
        for (int64_t i = k - 1; i >= 0; --i) {
            S.cand[base + i] = (uint8_t)(code & 3); code >>= 2;
        }
        for (int64_t i = 0; i < T; ++i)
            S.cand[base + k + i] = rev[T - 1 - i];
        S.clen.push_back((int32_t)(k + T));
    }
    if (S.clen.empty()) return 0;

    // ---- score candidates vs the pile; first-min wins ----
    const int64_t nc = (int64_t)S.clen.size();
    int64_t best_cost = INT64_MAX; int64_t win = -1;
    for (int64_t c = 0; c < nc; ++c) {
        int64_t cost = 0;
        const uint8_t* cb = S.cand.data() + c * LC;
        for (int64_t r = 0; r < nr; ++r)
            cost += lv_edit_distance(cb, S.clen[c], pool + rstart[r],
                                     rlen[r], S.lvV);
        if (cost < best_cost) { best_cost = cost; win = c; }
    }
    // -e max window error (ALGORITHM §4, integer-exact)
    if (e_q6 < 1000000 && best_cost * 1000000 > e_q6 * nr * w) return 0;
    std::memcpy(out, S.cand.data() + win * LC, S.clen[win]);
    return S.clen[win];
}

}  // namespace

extern "C" {

// Batched adaptive window consensus (k then k2; ALGORITHM §6), threaded over
// windows.  Layouts:
//   pool/row_start/row_len: flat string rows; win_ptr [NW+1] CSR into rows
//   win_tab [NW]: positional-eprof table index (ALGORITHM §7 v2)
//   plq [T][Wp][w+1] int32; pbw [T][NB][NB] int32 or null
//   out_bases [NW][LC], out_len [NW] (0 = failed), out_kused [NW]
void cpu_consensus_batch(
    const uint8_t* pool, const int64_t* row_start, const int32_t* row_len,
    const int64_t* win_ptr, const int32_t* win_tab,
    const int32_t* plq, const int32_t* pbw,
    int64_t NW, int64_t T, int64_t Wp, int64_t w, int64_t NB,
    int64_t k, int64_t k2, int64_t path_delta, int64_t g, int64_t e_q6,
    int64_t LC, uint8_t* out_bases, int32_t* out_len, int32_t* out_kused,
    int64_t nthreads) {
    (void)T;
    if (nthreads < 1) nthreads = 1;
    const int64_t plq_stride = w + 1;
    auto worker = [&](int64_t tid) {
        Scratch S;
        std::vector<int64_t> rstart;
        std::vector<int32_t> rl;
        for (int64_t wi = tid; wi < NW; wi += nthreads) {
            const int64_t r0 = win_ptr[wi], r1 = win_ptr[wi + 1];
            rstart.assign(row_start + r0, row_start + r1);
            rl.assign(row_len + r0, row_len + r1);
            const int32_t* plq_t = plq + win_tab[wi] * Wp * plq_stride;
            const int32_t* pbw_t = pbw ? pbw + win_tab[wi] * NB * NB : nullptr;
            int32_t len = window_consensus_k(
                pool, rstart.data(), rl.data(), r1 - r0, plq_t, plq_stride,
                pbw_t, NB, k, w, path_delta, g, e_q6,
                out_bases + wi * LC, S);
            int32_t kused = (int32_t)k;
            if (len == 0) {                         // adaptive k2 retry
                len = window_consensus_k(
                    pool, rstart.data(), rl.data(), r1 - r0, plq_t,
                    plq_stride, pbw_t, NB, k2, w, path_delta, g, e_q6,
                    out_bases + wi * LC, S);
                kused = len ? (int32_t)k2 : 0;
            }
            out_len[wi] = len;
            out_kused[wi] = kused;
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
