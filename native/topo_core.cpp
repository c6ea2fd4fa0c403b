// Native host-side hot paths for the topological mapper and metrics.
//
// The reference leans on C++ inside its dependencies (networkx is pure
// python, but habitat-sim / fastdtw are native; SURVEY.md §2 native list).
// Here the per-rollout-step host work that sits between device dispatches
// runs natively:
//   - apsp_relax_edge: incremental all-pairs shortest-path relaxation
//     (replaces per-step full Dijkstra recomputes, graph_utils.py:256-257)
//   - pairwise_assemble: anchored pairwise distance matrix emission
//     (ss_trainer_ETP.py:371-387)
//   - dtw: exact dynamic-time-warping distance (replaces fastdtw,
//     habitat_extensions/measures.py:266-336)
//
// Build: g++ -O3 -march=native -shared -fPIC topo_core.cpp -o libtopo_core.so
// Loaded via ctypes (etpnav_tpu/native.py); numpy fallbacks exist for all
// entry points.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Relax the APSP matrices through a new/updated undirected edge (u, v, w).
// D: n*n row-major double distances; H: n*n int32 hop counts;
// Nx: n*n int32 next-hop pointers. Mirrors TopoMap.add_edge semantics.
void apsp_relax_edge(double* D, int32_t* H, int32_t* Nx, int64_t n,
                     int64_t u, int64_t v, double w) {
    if (w >= D[u * n + v]) return;
    const int64_t dirs[2][2] = {{u, v}, {v, u}};
    std::vector<double> da(n), db(n);
    std::vector<int32_t> ha(n), hb(n), nxa(n);
    for (int d = 0; d < 2; ++d) {
        const int64_t a = dirs[d][0], b = dirs[d][1];
        for (int64_t i = 0; i < n; ++i) {
            da[i] = D[i * n + a];
            ha[i] = H[i * n + a];
            nxa[i] = Nx[i * n + a];
        }
        for (int64_t j = 0; j < n; ++j) {
            db[j] = D[b * n + j];
            hb[j] = H[b * n + j];
        }
        for (int64_t i = 0; i < n; ++i) {
            const double base = da[i] + w;
            if (base >= 1e17) continue;
            double* Drow = D + i * n;
            int32_t* Hrow = H + i * n;
            int32_t* Nrow = Nx + i * n;
            const int32_t nh = (i == a) ? (int32_t)b : nxa[i];
            for (int64_t j = 0; j < n; ++j) {
                const double cand = base + db[j];
                if (cand < Drow[j] - 1e-12) {
                    Drow[j] = cand;
                    Hrow[j] = ha[i] + 1 + hb[j];
                    Nrow[j] = nh;
                }
            }
        }
    }
}

// out[m*m] = (offsets[i] + D[anchors[i]*n + anchors[j]] + offsets[j]) / scale
// with zero diagonal; anchors index into the n-node APSP matrix.
void pairwise_assemble(const double* D, int64_t n, const int64_t* anchors,
                       const double* offsets, int64_t m, double scale,
                       double* out) {
    for (int64_t i = 0; i < m; ++i) {
        const double oi = offsets[i];
        const double* Drow = D + anchors[i] * n;
        for (int64_t j = 0; j < m; ++j) {
            out[i * m + j] = (i == j) ? 0.0
                : (oi + Drow[anchors[j]] + offsets[j]) / scale;
        }
    }
}

// Exact DTW with Euclidean point distance over 3-d trajectories.
double dtw(const double* a, int64_t n, const double* b, int64_t m) {
    std::vector<double> prev(m + 1, 1e18), cur(m + 1, 1e18);
    prev[0] = 0.0;
    for (int64_t i = 1; i <= n; ++i) {
        cur[0] = 1e18;
        const double ax = a[(i - 1) * 3], ay = a[(i - 1) * 3 + 1],
                     az = a[(i - 1) * 3 + 2];
        for (int64_t j = 1; j <= m; ++j) {
            const double dx = ax - b[(j - 1) * 3];
            const double dy = ay - b[(j - 1) * 3 + 1];
            const double dz = az - b[(j - 1) * 3 + 2];
            const double d = std::sqrt(dx * dx + dy * dy + dz * dz);
            cur[j] = d + std::min({prev[j], prev[j - 1], cur[j - 1]});
        }
        std::swap(prev, cur);
    }
    return prev[m];
}

}  // extern "C"
