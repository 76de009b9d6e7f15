// Native host kernels for the MSA and clustering hot paths.
//
// TPU-native framework layout: device kernels (JAX/Pallas) do the DP volume;
// these C++ routines cover the sequential host-side graph work the reference
// also kept native (SeqAn's T-Coffee internals, src/cluster_umis.cpp):
//
//   * triplet consistency extension over per-group pairwise libraries
//     (the O(G^3 * L) step of T-Coffee library construction)
//   * the greedy UMI clusterer (cluster_umis.cpp:7-112 semantics, including
//     the ties-to-highest-index rule)
//   * merge-cost accumulation (library-sum column scores for a profile
//     merge, the np.add.at hot loop)
//
// Compiled on demand by build.py into libsarlacc_host.so and called through
// ctypes; the Python implementations remain as fallback and as the parity
// oracles.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Banded doubled-cost masked-Levenshtein accept test (see verify_pairs_lev2
// below for the exactness argument).
inline bool lev2_banded_ok(
    const int8_t* a, int32_t la, const int8_t* b, int32_t lb,
    int32_t limit, int32_t thr, int32_t* prev, int32_t* cur)
{
    const int B = 2 * limit + 1;
    const int32_t BIG = 1 << 28;
    if (la - lb > limit || lb - la > limit) return false;
    for (int k = 0; k < B; ++k) {
        const int32_t j = k - limit;
        prev[k] = (j >= 0 && j <= lb) ? 2 * j : BIG;
    }
    for (int32_t i = 1; i <= la; ++i) {
        const int8_t ai = a[i - 1];
        int32_t rowmin = BIG;
        for (int k = 0; k < B; ++k) {
            const int32_t j = i - limit + k;
            if (j < 0 || j > lb) { cur[k] = BIG; continue; }
            int32_t best = (k + 1 < B) ? prev[k + 1] + 2 : BIG;
            if (k > 0 && cur[k - 1] + 2 < best) best = cur[k - 1] + 2;
            if (j > 0) {
                const int8_t bj = b[j - 1];
                const int32_t ms =
                    (ai == 4 || bj == 4) ? 1 : (ai == bj ? 0 : 2);
                if (prev[k] + ms < best) best = prev[k] + ms;
            }
            cur[k] = best;
            if (best < rowmin) rowmin = best;
        }
        if (rowmin > thr) return false;
        std::swap(prev, cur);
    }
    const int kfin = lb - la + limit;
    return kfin >= 0 && kfin < B && prev[kfin] <= thr;
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Greedy clustering (src/cluster_umis.cpp semantics).
//
// storage: concatenated neighbour lists; offsets[n+1].
// out_members / out_offsets must hold n ints / n+1 ints.
// Returns the number of clusters, or -1 (zero-length group) / -2 (bad solo).
// ---------------------------------------------------------------------------
int64_t greedy_cluster(
    const int32_t* storage, const int64_t* offsets, int64_t n,
    int32_t* out_members, int64_t* out_offsets)
{
    std::vector<int64_t> remaining(n);
    std::vector<int32_t> candidates;
    candidates.reserve(n);

    int64_t ncl = 0;
    int64_t at = 0;
    out_offsets[0] = 0;

    for (int64_t a = 0; a < n; ++a) {
        int64_t size = offsets[a + 1] - offsets[a];
        remaining[a] = size;
        if (size > 1) {
            candidates.push_back((int32_t)a);
        } else if (size == 1) {
            if (storage[offsets[a]] != a) return -2;
            out_members[at++] = (int32_t)a;
            out_offsets[++ncl] = at;
        } else {
            return -1;
        }
    }

    while (!candidates.empty()) {
        // Compact dead candidates.
        size_t keep = 0;
        for (size_t i = 0; i < candidates.size(); ++i) {
            if (remaining[candidates[i]] > 0) candidates[keep++] = candidates[i];
        }
        candidates.resize(keep);
        if (candidates.empty()) break;

        // Max remaining, ties to the highest index (cluster_umis.cpp:62-69).
        int32_t best = candidates[0];
        for (size_t i = 1; i < candidates.size(); ++i) {
            int32_t c = candidates[i];
            if (remaining[c] >= remaining[best]) best = c;
        }
        candidates.erase(std::find(candidates.begin(), candidates.end(), best));

        for (int64_t p = offsets[best]; p < offsets[best + 1]; ++p) {
            int32_t nb = storage[p];
            if (remaining[nb] == 0) continue;
            out_members[at++] = nb;
            remaining[nb] = 0;
            for (int64_t q = offsets[nb]; q < offsets[nb + 1]; ++q) {
                int32_t nxt = storage[q];
                if (remaining[nxt] > 0) --remaining[nxt];
            }
        }
        out_offsets[++ncl] = at;
    }
    return ncl;
}

// ---------------------------------------------------------------------------
// Triplet consistency extension for one group.
//
// Library input (pairs x < y, any order):
//   px[np], py[np]: pair endpoints; off[np+1]: entry offsets;
//   pa[tot], pb[tot] (positions on x / y, 1-based), w[tot].
// Output: merged (base + extension) entries per pair, aggregated by
// position pair and emitted with pairs sorted by (x, y) and entries sorted
// by (pa, pb).  Caller passes output buffers of capacity cap; returns the
// total entry count or -(needed) if cap is too small.
// ---------------------------------------------------------------------------
int64_t triplet_extend(
    int32_t g,
    const int32_t* px, const int32_t* py, int64_t npairs,
    const int64_t* off, const int32_t* pa, const int32_t* pb, const float* w,
    int32_t* out_px, int32_t* out_py, int64_t* out_off,
    int32_t* out_pa, int32_t* out_pb, float* out_w, int64_t cap)
{
    // Pairwise alignment paths are monotone 1:1 maps, so the consistency
    // composition x~z~y is a direct two-step array lookup — no sorted joins
    // or hash maps.  Dense ordered-pair base maps:
    //   mpos[(x*g+z)*stride + a] = position on z aligned to position a on x
    //   mwt [(x*g+z)*stride + a] = that entry's weight
    int32_t maxpos = 1;
    for (int64_t t = 0; t < off[npairs]; ++t) {
        if (pa[t] > maxpos) maxpos = pa[t];
        if (pb[t] > maxpos) maxpos = pb[t];
    }
    const int64_t stride = (int64_t)maxpos + 1;

    std::vector<int32_t> mpos((size_t)g * g * stride, 0);
    std::vector<float> mwt((size_t)g * g * stride, 0.f);
    auto base_of = [&](int32_t a, int32_t b) -> int64_t {
        return ((int64_t)a * g + b) * stride;
    };
    for (int64_t p = 0; p < npairs; ++p) {
        const int64_t bx = base_of(px[p], py[p]);
        const int64_t by = base_of(py[p], px[p]);
        for (int64_t t = off[p]; t < off[p + 1]; ++t) {
            mpos[bx + pa[t]] = pb[t]; mwt[bx + pa[t]] = w[t];
            mpos[by + pb[t]] = pa[t]; mwt[by + pb[t]] = w[t];
        }
    }

    // Per pair (x < y), per position a on x: the candidates are the base
    // entry plus one composed b per middle z (<= g-1 total) — dedup-sum and
    // emit each tiny per-a bucket directly, in (a, b) order.  Sorting these
    // <=g-element buckets beats one big per-pair sort (fewer comparisons,
    // cache-resident, no large scratch).
    int64_t at = 0, pr = 0, needed = 0;
    bool overflow = false;
    std::vector<std::pair<const int32_t*, const float*>> xzm, zym;
    std::vector<std::pair<int32_t, float>> cand;
    xzm.reserve(g); zym.reserve(g); cand.reserve((size_t)g + 1);
    for (int32_t x = 0; x < g; ++x) {
        for (int32_t y = x + 1; y < g; ++y) {
            const int32_t* bp = &mpos[base_of(x, y)];
            const float* bw = &mwt[base_of(x, y)];
            xzm.clear(); zym.clear();
            for (int32_t z = 0; z < g; ++z) {
                if (z == x || z == y) continue;
                xzm.emplace_back(&mpos[base_of(x, z)], &mwt[base_of(x, z)]);
                zym.emplace_back(&mpos[base_of(z, y)], &mwt[base_of(z, y)]);
            }
            const size_t nz = xzm.size();
            const int64_t pair_start = at;
            bool any = false;
            for (int64_t a = 1; a < stride; ++a) {
                cand.clear();
                if (bp[a]) cand.emplace_back(bp[a], bw[a]);
                for (size_t zi = 0; zi < nz; ++zi) {
                    const int32_t k = xzm[zi].first[a];
                    if (!k) continue;
                    const int32_t b = zym[zi].first[k];
                    if (!b) continue;
                    cand.emplace_back(
                        b, std::min(xzm[zi].second[a], zym[zi].second[k]));
                }
                if (cand.empty()) continue;
                if (!any) {
                    any = true;
                    if (!overflow) {
                        out_px[pr] = x;
                        out_py[pr] = y;
                        out_off[pr] = pair_start;
                    }
                }
                std::sort(cand.begin(), cand.end(),
                          [](const std::pair<int32_t, float>& l,
                             const std::pair<int32_t, float>& r) {
                              return l.first < r.first;
                          });
                size_t i = 0;
                while (i < cand.size()) {
                    const int32_t b = cand[i].first;
                    double ww = 0.0;
                    while (i < cand.size() && cand[i].first == b) {
                        ww += cand[i].second;
                        ++i;
                    }
                    ++needed;
                    if (at >= cap) { overflow = true; continue; }
                    out_pa[at] = (int32_t)a;
                    out_pb[at] = b;
                    out_w[at] = (float)ww;
                    ++at;
                }
            }
            if (any && !overflow) ++pr;
        }
    }
    if (overflow) return -needed;
    out_off[pr] = at;
    // Return (pair count << 40) | entry count; entry counts stay far below
    // 2^40 here.
    return ((int64_t)pr << 40) | at;
}

// ---------------------------------------------------------------------------
// Merge-cost accumulation: cost[ci-1, k] += w for k = cj - ci - lo in range.
// ci/cj are 1-based profile columns already mapped by the caller.
// ---------------------------------------------------------------------------
void accumulate_cost(
    const int32_t* ci, const int32_t* cj, const float* w, int64_t n,
    int32_t lo, int32_t la, int32_t width, float* cost /* la*width */)
{
    for (int64_t t = 0; t < n; ++t) {
        int32_t c = ci[t];
        if (c < 1) continue;
        int64_t k = (int64_t)cj[t] - c - lo;
        if (k < 0 || k >= width) continue;
        cost[(int64_t)(c - 1) * width + k] += w[t];
    }
}

// ---------------------------------------------------------------------------
// Symmetric-delete candidate pairing for the thresholded Levenshtein search
// (the host half of the sorted_trie.cpp replacement; the device DP verifies
// every candidate so only completeness matters here).
//
// Entries are (variant hash, owner string id).  Sorts by (hash, owner),
// drops duplicate (hash, owner) rows, and for every run of equal hashes
// emits each unordered owner pair once as (lo << 32) | hi, then globally
// sorts + uniques the pair keys.  Returns the number of unique pairs, or
// -needed if cap was too small (caller retries with a bigger buffer).
// ---------------------------------------------------------------------------
// ---------------------------------------------------------------------------
// Banded doubled-cost masked-Levenshtein verification for candidate pairs
// (sorted_trie.cpp:13-21 cost model: match 0, N-vs-anything 1, mismatch and
// indel 2).  Any path cell (i, j) costs >= 2*|i-j|, so restricting the DP to
// the |i-j| <= limit band is EXACT for the "d2 <= thr = 2*limit" decision;
// pairs with |la-lb| > limit reject immediately.  codes: int8 [n, W]
// (A=0..N=4, pad anything); out[p] = 1 iff d2(pair p) <= thr.
// ---------------------------------------------------------------------------
void verify_pairs_lev2(
    const int8_t* codes, const int32_t* lens, int32_t W,
    const int64_t* ua, const int64_t* ub, int64_t npairs,
    int32_t limit, int32_t thr, uint8_t* out)
{
    const int B = 2 * limit + 1;
    std::vector<int32_t> prev(B), cur(B);
    for (int64_t p = 0; p < npairs; ++p) {
        out[p] = lev2_banded_ok(
            codes + ua[p] * (int64_t)W, lens[ua[p]],
            codes + ub[p] * (int64_t)W, lens[ub[p]],
            limit, thr, prev.data(), cur.data()) ? 1 : 0;
    }
}

// ---------------------------------------------------------------------------
// Fused symmetric-delete candidate generation + banded verification: walks
// shared-variant runs and verifies each raw pair inline, so the (heavily
// duplicated) raw pair stream is never materialized or globally sorted —
// only SURVIVING pair keys are appended, then sorted + deduped (a true pair
// appears once per shared variant, but survivors are few).  Two threads
// split the run list (runs never straddle the split).  Returns the number
// of unique surviving keys, or -needed if cap was too small.
// ---------------------------------------------------------------------------
int64_t candidate_verify_pairs(
    const uint64_t* h, const int32_t* owner, int64_t n,
    const int8_t* codes, const int32_t* lens, int32_t W,
    int32_t limit, int32_t thr, uint64_t* out, int64_t cap,
    int64_t raw_cap)
{
    std::vector<std::pair<uint64_t, int32_t>> e(n);
    for (int64_t i = 0; i < n; ++i) e[i] = {h[i], owner[i]};
    std::sort(e.begin(), e.end());
    e.erase(std::unique(e.begin(), e.end()), e.end());
    const int64_t ne = (int64_t)e.size();

    std::vector<int64_t> run_starts;
    for (int64_t s = 0; s < ne;) {
        int64_t t = s + 1;
        while (t < ne && e[t].first == e[s].first) ++t;
        if (t - s > 1) run_starts.push_back(s);
        s = t;
    }
    run_starts.push_back(ne);  // sentinel

    const int nruns = (int64_t)run_starts.size() - 1;
    const int nthreads = nruns > 1024 ? 2 : 1;
    std::vector<std::vector<uint64_t>> found(nthreads);
    std::vector<int64_t> raw(nthreads, 0);
    volatile bool abort_flag = false;  // low-complexity blowup guard

    auto work = [&](int tid) {
        const int B = 2 * limit + 1;
        std::vector<int32_t> prev(B), cur(B);
        auto& mine = found[tid];
        for (int64_t ri = tid; ri < nruns; ri += nthreads) {
            if (abort_flag) return;
            if (raw[tid] > raw_cap) { abort_flag = true; return; }
            const int64_t s = run_starts[ri];
            int64_t t = s + 1;
            while (t < ne && e[t].first == e[s].first) ++t;
            for (int64_t i = s; i < t; ++i) {
                const int32_t oa = e[i].second;
                const int8_t* a = codes + (int64_t)oa * W;
                const int32_t la = lens[oa];
                for (int64_t j = i + 1; j < t; ++j) {
                    const int32_t ob = e[j].second;
                    if (ob == oa) continue;
                    ++raw[tid];
                    if (lev2_banded_ok(a, la, codes + (int64_t)ob * W,
                                       lens[ob], limit, thr,
                                       prev.data(), cur.data())) {
                        const uint32_t lo = oa < ob ? oa : ob;
                        const uint32_t hi = oa < ob ? ob : oa;
                        mine.push_back(((uint64_t)lo << 32) | hi);
                    }
                }
            }
        }
    };
    if (nthreads == 1) {
        work(0);
    } else {
        std::thread th(work, 1);
        work(0);
        th.join();
    }
    if (abort_flag) return INT64_MIN;

    int64_t m = 0;
    for (auto& v : found) m += (int64_t)v.size();
    if (m > cap) return -m;
    int64_t at = 0;
    for (auto& v : found) {
        std::memcpy(out + at, v.data(), v.size() * sizeof(uint64_t));
        at += (int64_t)v.size();
    }
    std::sort(out, out + m);
    return (int64_t)(std::unique(out, out + m) - out);
}

int64_t candidate_pairs(
    const uint64_t* h, const int32_t* owner, int64_t n,
    uint64_t* out, int64_t cap)
{
    std::vector<std::pair<uint64_t, int32_t>> e(n);
    for (int64_t i = 0; i < n; ++i) e[i] = {h[i], owner[i]};
    std::sort(e.begin(), e.end());
    e.erase(std::unique(e.begin(), e.end()), e.end());

    int64_t m = 0;
    const int64_t ne = (int64_t)e.size();
    for (int64_t s = 0; s < ne;) {
        int64_t t = s + 1;
        while (t < ne && e[t].first == e[s].first) ++t;
        for (int64_t i = s; i < t; ++i) {
            const uint64_t lo = (uint64_t)(uint32_t)e[i].second << 32;
            for (int64_t j = i + 1; j < t; ++j) {
                if (m < cap) out[m] = lo | (uint32_t)e[j].second;
                ++m;
            }
        }
        s = t;
    }
    if (m > cap) return -m;
    std::sort(out, out + m);
    return (int64_t)(std::unique(out, out + m) - out);
}

}  // extern "C"
