// Native host chain tail: backtracking + chain compaction.
//
// The device kernel fills per-anchor (f, p) score/predecessor arrays
// (chain/device.py); this extension runs the inherently sequential tail the
// host owns: candidate walk with touched-claiming and max_drop
// (reference: mg_chain_backtrack, lchain.c:95-194) and chain compaction +
// target-position sort (reference: compact_a, lchain.c:214-281).
// Semantics match chain/host.py::chain_backtrack/compact_chains exactly;
// tests assert equality against the python oracle.
//
// Built on demand with g++ (see _native/__init__.py); plain C ABI via ctypes.

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

extern "C" {

// Returns number of chains (n_u). Outputs:
//   u_out[2*c], u_out[2*c+1] : score, anchor-count per chain (target-sorted)
//   bx/by  : compacted anchors, chain-major, chains sorted by first-anchor x
//   px/py  : pre-sort chain anchors (carried to the next chunk)
//   n_v_out: total anchors across chains
int32_t rh_chain_tail(
    const int32_t* f, const int32_t* p, int32_t n,
    int32_t min_cnt, int32_t min_sc, int32_t max_drop,
    const uint64_t* ax, const uint64_t* ay,
    int64_t* u_out, uint64_t* bx, uint64_t* by,
    uint64_t* px, uint64_t* py, int32_t* n_v_out)
{
    *n_v_out = 0;
    if (n <= 0) return 0;

    // candidates with acceptable score, sorted by (f, index) ascending
    std::vector<std::pair<int32_t, int32_t>> z;
    z.reserve(64);
    for (int32_t i = 0; i < n; ++i)
        if (f[i] >= min_sc) z.emplace_back(f[i], i);
    if (z.empty()) return 0;
    std::stable_sort(z.begin(), z.end(),
                     [](const auto& a, const auto& b) { return a.first < b.first; });

    std::vector<int8_t> t(n, 0);
    std::vector<int32_t> v;
    v.reserve(z.size() * 4);
    std::vector<std::pair<int64_t, int64_t>> u;  // (score, cnt) discovery order

    for (int64_t k = (int64_t)z.size() - 1; k >= 0; --k) {
        int32_t zi = z[k].second;
        if (t[zi] != 0) continue;
        // find the chain start (mg_chain_bk_end, lchain.c:47-75)
        int64_t i = zi, end_i = -1, max_i = i;
        int32_t max_s = 0;
        for (;;) {
            t[i] = 2;
            end_i = i = (i >= 0 ? p[i] : -1);
            int32_t s = (i < 0) ? z[k].first : z[k].first - f[i];
            if (s > max_s) { max_s = s; max_i = i; }
            else if (max_s - s > max_drop) break;
            if (!(i >= 0 && t[i] == 0)) break;
        }
        for (int64_t j = zi; j >= 0 && j != end_i; j = p[j]) t[j] = 0;
        end_i = max_i;

        size_t n_v0 = v.size();
        int64_t walk = zi;
        while (walk != end_i) {
            v.push_back((int32_t)walk);
            t[walk] = 1;
            walk = p[walk];
        }
        int32_t sc = (walk < 0) ? z[k].first : z[k].first - f[walk];
        if (sc >= min_sc && v.size() > n_v0 &&
            (int64_t)(v.size() - n_v0) >= min_cnt) {
            u.emplace_back(sc, (int64_t)(v.size() - n_v0));
        } else {
            v.resize(n_v0);
        }
    }

    int32_t n_u = (int32_t)u.size();
    int32_t n_v = (int32_t)v.size();
    *n_v_out = n_v;
    if (n_u == 0) return 0;

    // chain anchors in increasing order (v runs are end->start)
    std::vector<int64_t> starts(n_u);
    int64_t off = 0;
    for (int32_t c = 0; c < n_u; ++c) { starts[c] = off; off += u[c].second; }
    {
        int64_t w = 0;
        for (int32_t c = 0; c < n_u; ++c) {
            int64_t cnt = u[c].second;
            for (int64_t j = 0; j < cnt; ++j) {
                int32_t idx = v[starts[c] + cnt - 1 - j];
                px[w] = ax[idx];
                py[w] = ay[idx];
                ++w;
            }
        }
    }
    // sort chains by first-anchor x (stable)
    std::vector<int32_t> order(n_u);
    for (int32_t c = 0; c < n_u; ++c) order[c] = c;
    std::stable_sort(order.begin(), order.end(), [&](int32_t a, int32_t b) {
        return px[starts[a]] < px[starts[b]];
    });
    int64_t w = 0;
    for (int32_t oi = 0; oi < n_u; ++oi) {
        int32_t c = order[oi];
        u_out[2 * oi] = u[c].first;
        u_out[2 * oi + 1] = u[c].second;
        std::memcpy(bx + w, px + starts[c], u[c].second * sizeof(uint64_t));
        std::memcpy(by + w, py + starts[c], u[c].second * sizeof(uint64_t));
        w += u[c].second;
    }
    return n_u;
}

}  // extern "C"
