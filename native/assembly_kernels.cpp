// Host-side assembly kernels for dynadjust_tpu.
//
// The TPU owns the factorizations; the host owns topology-driven scatter
// assembly and sparse residual work.  These kernels are the native
// counterpart of the reference's C++ normals-assembly inner loops
// (UpdateNormals_* / UpdateAtVinv), restructured as flat scatters over
// precomputed index plans so they parallelise trivially with OpenMP-style
// threading (plain std::thread here — no extra deps).
//
// Exposed via a C ABI for ctypes binding (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// out[idx[m*3+k]] += sign * w[m] * mmc[m*3+k]  for idx >= 0
// (the per-iteration rhs scatter: AtW * measured-minus-computed)
void scatter_rhs(const int64_t* idx, const double* w, const double* mmc,
                 double sign, int64_t n_msr, double* out) {
    for (int64_t m = 0; m < n_msr; ++m) {
        const double wm = w[m] * sign;
        for (int k = 0; k < 3; ++k) {
            const int64_t j = idx[m * 3 + k];
            if (j >= 0) out[j] += wm * mmc[m * 3 + k];
        }
    }
}

// GPS baseline residuals: mmc[m] = obs[m] - (x[j] - x[i])
void baseline_residuals(const int64_t* pairs, const double* obs,
                        const double* x, int64_t n_msr, double* mmc) {
    const int hw = (int)std::thread::hardware_concurrency();
    const int nt = hw > 1 ? (hw > 16 ? 16 : hw) : 1;
    auto worker = [&](int64_t lo, int64_t hi) {
        for (int64_t m = lo; m < hi; ++m) {
            const int64_t i = pairs[m * 2] * 3;
            const int64_t j = pairs[m * 2 + 1] * 3;
            for (int k = 0; k < 3; ++k)
                mmc[m * 3 + k] = obs[m * 3 + k] - (x[j + k] - x[i + k]);
        }
    };
    if (n_msr < 1 << 15 || nt == 1) {
        worker(0, n_msr);
        return;
    }
    std::vector<std::thread> ts;
    const int64_t chunk = (n_msr + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
        const int64_t lo = t * chunk;
        const int64_t hi = lo + chunk < n_msr ? lo + chunk : n_msr;
        if (lo < hi) ts.emplace_back(worker, lo, hi);
    }
    for (auto& t : ts) t.join();
}

// Blocked symmetric matvec for iterative refinement:
//   yi[b] = Nii[b] xi[b] + Nij[b] xj_b[b]
//   yj_b[b] = Nij[b]^T xi[b] + Njj[b] xj_b[b]
// shapes: Nii (B,ni,ni), Nij (B,ni,nj), Njj (B,nj,nj)
void block_matvec(const double* Nii, const double* Nij, const double* Njj,
                  const double* xi, const double* xj_b,
                  int64_t B, int64_t ni, int64_t nj,
                  double* yi, double* yj_b) {
    const int hw = (int)std::thread::hardware_concurrency();
    const int nt = hw > 1 ? (hw > 16 ? 16 : hw) : 1;
    auto worker = [&](int64_t blo, int64_t bhi) {
        for (int64_t b = blo; b < bhi; ++b) {
            const double* A = Nii + b * ni * ni;
            const double* C = Nij + b * ni * nj;
            const double* D = Njj + b * nj * nj;
            const double* vi = xi + b * ni;
            const double* vj = xj_b + b * nj;
            double* oi = yi + b * ni;
            double* oj = yj_b + b * nj;
            for (int64_t r = 0; r < ni; ++r) {
                double acc = 0.0;
                const double* Ar = A + r * ni;
                for (int64_t c = 0; c < ni; ++c) acc += Ar[c] * vi[c];
                const double* Cr = C + r * nj;
                for (int64_t c = 0; c < nj; ++c) acc += Cr[c] * vj[c];
                oi[r] = acc;
            }
            for (int64_t r = 0; r < nj; ++r) {
                double acc = 0.0;
                for (int64_t c = 0; c < ni; ++c)
                    acc += C[c * nj + r] * vi[c];
                const double* Dr = D + r * nj;
                for (int64_t c = 0; c < nj; ++c) acc += Dr[c] * vj[c];
                oj[r] = acc;
            }
        }
    };
    if (B < 2 || nt == 1) {
        worker(0, B);
        return;
    }
    std::vector<std::thread> ts;
    const int64_t chunk = (B + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
        const int64_t lo = t * chunk;
        const int64_t hi = lo + chunk < B ? lo + chunk : B;
        if (lo < hi) ts.emplace_back(worker, lo, hi);
    }
    for (auto& t : ts) t.join();
}

}   // extern "C"
