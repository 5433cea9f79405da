// Reference-equivalent phased adjustment baseline.
//
// The actual DynAdjust binaries cannot be built in this environment (no
// boost / Xerces-C / XSD headers, no network), so this harness replays the
// reference's per-iteration linear algebra exactly as AdjustPhased runs it
// (dnaadjust.cpp:2579: AdjustPhasedForward :2756, AdjustPhasedReverse-
// Combine :3461, junction carries CarryStnEstimatesandVariances* :998/1133,
// Solve :6586 = cholesky_inverse, i.e. LAPACK dpotrf+dpotri,
// dnamatrix_contiguous.cpp:963-1006) against the same OpenBLAS the
// reference's Linux CI links. Block normals / rhs / junction index lists
// arrive pre-assembled from scripts/export_phased_blocks.py, so the
// measured time EXCLUDES the reference's per-measurement assembly cost —
// the baseline is therefore a lower bound (favourable to the reference).
//
// Per iteration, per block (as the reference does with COMPUTE_INVERSE):
//   forward:  N_w = N + carried junction weights; dpotrf+dpotri(N_w);
//             dx = Ninv·rhs (dsymv); invert the JSL variance sub-block
//             (dpotrf+dpotri, j x j); add into next block's normals + rhs
//   reverse:  the same sweep in descending block order
//   combine:  intermediate blocks get one more inverse+solve
//
// Output: one JSON line with per-iteration wall seconds.
//
// Build: make -C native ref_baseline
// Run:   native/ref_baseline blocks.blk [iters] [threads]

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <chrono>
#include <string>
#include <vector>

extern "C" {
void scipy_dpotrf_(const char *uplo, const int *n, double *a,
                   const int *lda, int *info);
void scipy_dpotri_(const char *uplo, const int *n, double *a,
                   const int *lda, int *info);
void scipy_dsymv_(const char *uplo, const int *n, const double *alpha,
                  const double *a, const int *lda, const double *x,
                  const int *incx, const double *beta, double *y,
                  const int *incy);
void scipy_openblas_set_num_threads(int n);
}

struct CW { int64_t l; double W[9]; };

struct Blk {
    int64_t k, j;
    std::vector<int64_t> jsl_cur, jsl_next;
    std::vector<CW> cwf, cwr;       // per-direction constraint weights
    std::vector<double> N, rhs;
};

// add first-appearance 3x3 constraint weight blocks for one sweep
// direction (AddConstraintStationstoNormals*, dnaadjust.cpp:1884)
static void add_constraints(std::vector<double> &N, int64_t k,
                            const std::vector<CW> &cw) {
    for (const auto &c : cw)
        for (int r = 0; r < 3; ++r)
            for (int q = 0; q < 3; ++q)
                N[(size_t)(c.l + r) * k + c.l + q] += c.W[3 * r + q];
}

static void sym_fill(std::vector<double> &a, int n) {
    // dpotri fills one triangle; mirror it (column-major lower 'L')
    for (int c = 0; c < n; ++c)
        for (int r = c + 1; r < n; ++r)
            a[(size_t)r * n + c] = a[(size_t)c * n + r];
}

static int chol_inverse(std::vector<double> &a, int n) {
    int info = 0;
    scipy_dpotrf_("L", &n, a.data(), &n, &info);
    if (info) return info;
    scipy_dpotri_("L", &n, a.data(), &n, &info);
    if (info) return info;
    sym_fill(a, n);
    return 0;
}

// one block solve: invert (copy of) N_w, dx = Ninv rhs; returns Ninv
static void block_solve(const Blk &b, const std::vector<double> &Nw,
                        const std::vector<double> &rhs,
                        std::vector<double> &Ninv,
                        std::vector<double> &dx) {
    int n = (int)b.k;
    Ninv = Nw;
    if (chol_inverse(Ninv, n)) {
        std::fprintf(stderr, "dpotrf/dpotri failed (k=%d)\n", n);
        std::exit(2);
    }
    dx.assign(n, 0.0);
    const double one = 1.0, zero = 0.0;
    const int inc = 1;
    scipy_dsymv_("L", &n, &one, Ninv.data(), &n, rhs.data(), &inc, &zero,
                 dx.data(), &inc);
}

// junction carry b -> b2: invert JSL variance sub-block of Ninv, add as
// pseudo-measurement weights into N2/rhs2 (CarryStnEstimates..., :1048-1126)
static void carry(const Blk &b, const std::vector<double> &Ninv,
                  const std::vector<double> &dx,
                  const std::vector<int64_t> &idx_cur,
                  const std::vector<int64_t> &idx_next,
                  std::vector<double> &N2, std::vector<double> &rhs2,
                  int64_t k2) {
    int j = (int)idx_cur.size();
    if (!j) return;
    std::vector<double> Vj((size_t)j * j);
    for (int r = 0; r < j; ++r)
        for (int c = 0; c < j; ++c)
            Vj[(size_t)r * j + c] =
                Ninv[(size_t)idx_cur[r] * b.k + idx_cur[c]];
    if (chol_inverse(Vj, j)) {
        std::fprintf(stderr, "junction inverse failed (j=%d)\n", j);
        std::exit(2);
    }
    std::vector<double> w(j);
    for (int r = 0; r < j; ++r) {
        double s = 0.0;
        for (int c = 0; c < j; ++c) s += Vj[(size_t)r * j + c] * dx[idx_cur[c]];
        w[r] = s;
    }
    for (int r = 0; r < j; ++r) {
        rhs2[idx_next[r]] += w[r];
        for (int c = 0; c < j; ++c)
            N2[(size_t)idx_next[r] * k2 + idx_next[c]] +=
                Vj[(size_t)r * j + c];
    }
}

int main(int argc, char **argv) {
    if (argc < 2) {
        std::fprintf(stderr,
                     "usage: ref_baseline blocks.blk [iters] [threads] "
                     "[--dump-dx out.bin]\n");
        return 1;
    }
    // --dump-dx: write iteration-1 per-block corrections (forward,
    // reverse, combine sweeps) for arithmetic side-by-side with the
    // Python phased path (PARITY.md: the urban V-row investigation)
    const char *dump_path = nullptr;
    for (int a = 1; a + 1 < argc; ++a)
        if (!std::strcmp(argv[a], "--dump-dx")) dump_path = argv[a + 1];
    int iters = (argc > 2 && argv[2][0] != '-') ? std::atoi(argv[2]) : 5;
    int threads = (argc > 3 && argv[3][0] != '-') ? std::atoi(argv[3]) : 2;
    scipy_openblas_set_num_threads(threads);

    FILE *f = std::fopen(argv[1], "rb");
    if (!f) { std::perror("open"); return 1; }
    int64_t B = 0;
    if (std::fread(&B, 8, 1, f) != 1) return 1;
    std::vector<Blk> blocks((size_t)B);
    for (auto &b : blocks) {
        int64_t nf = 0, nr = 0;
        if (std::fread(&b.k, 8, 1, f) != 1) return 1;
        if (std::fread(&b.j, 8, 1, f) != 1) return 1;
        if (std::fread(&nf, 8, 1, f) != 1) return 1;
        if (std::fread(&nr, 8, 1, f) != 1) return 1;
        b.jsl_cur.resize(b.j);
        b.jsl_next.resize(b.j);
        if (b.j) {
            if (std::fread(b.jsl_cur.data(), 8, b.j, f) != (size_t)b.j)
                return 1;
            if (std::fread(b.jsl_next.data(), 8, b.j, f) != (size_t)b.j)
                return 1;
        }
        b.cwf.resize(nf);
        b.cwr.resize(nr);
        for (auto &c : b.cwf) {
            if (std::fread(&c.l, 8, 1, f) != 1) return 1;
            if (std::fread(c.W, 8, 9, f) != 9) return 1;
        }
        for (auto &c : b.cwr) {
            if (std::fread(&c.l, 8, 1, f) != 1) return 1;
            if (std::fread(c.W, 8, 9, f) != 9) return 1;
        }
        b.N.resize((size_t)b.k * b.k);
        b.rhs.resize(b.k);
        if (std::fread(b.N.data(), 8, b.N.size(), f) != b.N.size())
            return 1;
        if (std::fread(b.rhs.data(), 8, b.rhs.size(), f) != b.rhs.size())
            return 1;
    }
    std::fclose(f);

    double total = 0.0, best = 1e30;
    double fwd_s = 0.0, rev_s = 0.0, comb_s = 0.0;
    std::vector<double> Ninv, dx;
    std::vector<std::vector<double>> dxf((size_t)B), dxr((size_t)B),
        dxc((size_t)B);
    for (int it = 0; it < iters; ++it) {
        auto t0 = std::chrono::steady_clock::now();
        // working copies: the reference rebuilds/restores normals per pass
        std::vector<std::vector<double>> Nw((size_t)B), rw((size_t)B);
        for (int64_t b = 0; b < B; ++b) {
            Nw[b] = blocks[b].N; rw[b] = blocks[b].rhs;
            add_constraints(Nw[b], blocks[b].k, blocks[b].cwf);
        }

        // forward
        for (int64_t b = 0; b < B; ++b) {
            block_solve(blocks[b], Nw[b], rw[b], Ninv, dx);
            if (it == 0 && dump_path) dxf[b] = dx;
            if (b + 1 < B)
                carry(blocks[b], Ninv, dx, blocks[b].jsl_cur,
                      blocks[b].jsl_next, Nw[b + 1], rw[b + 1],
                      blocks[b + 1].k);
        }
        auto t1 = std::chrono::steady_clock::now();
        // reverse (fresh restore, junction carried b -> b-1 over the same
        // JSL lists of block b-1)
        std::vector<std::vector<double>> Nr((size_t)B), rr((size_t)B);
        for (int64_t b = 0; b < B; ++b) {
            Nr[b] = blocks[b].N; rr[b] = blocks[b].rhs;
            add_constraints(Nr[b], blocks[b].k, blocks[b].cwr);
        }
        for (int64_t b = B - 1; b >= 0; --b) {
            block_solve(blocks[b], Nr[b], rr[b], Ninv, dx);
            if (it == 0 && dump_path) dxr[b] = dx;
            if (b > 0)
                carry(blocks[b], Ninv, dx, blocks[b - 1].jsl_next,
                      blocks[b - 1].jsl_cur, Nr[b - 1], rr[b - 1],
                      blocks[b - 1].k);
        }
        auto t2 = std::chrono::steady_clock::now();
        // combine: intermediate blocks, fwd+rev carries applied, one more
        // inverse+solve each (PrepareAdjustmentCombine :3336)
        for (int64_t b = 1; b + 1 < B; ++b) {
            std::vector<double> Nc = Nw[b], rc = rw[b];
            // add the reverse carry contribution accumulated in Nr/rr
            for (size_t i = 0; i < Nc.size(); ++i)
                Nc[i] += Nr[b][i] - blocks[b].N[i];
            for (size_t i = 0; i < rc.size(); ++i)
                rc[i] += rr[b][i] - blocks[b].rhs[i];
            block_solve(blocks[b], Nc, rc, Ninv, dx);
            if (it == 0 && dump_path) dxc[b] = dx;
        }
        auto t3 = std::chrono::steady_clock::now();
        double dt = std::chrono::duration<double>(t3 - t0).count();
        fwd_s += std::chrono::duration<double>(t1 - t0).count();
        rev_s += std::chrono::duration<double>(t2 - t1).count();
        comb_s += std::chrono::duration<double>(t3 - t2).count();
        total += dt;
        if (dt < best) best = dt;
    }
    if (dump_path) {
        FILE *g = std::fopen(dump_path, "wb");
        if (!g) { std::perror("dump"); return 1; }
        std::fwrite(&B, 8, 1, g);
        for (int64_t b = 0; b < B; ++b) {
            std::fwrite(&blocks[b].k, 8, 1, g);
            if (dxc[b].empty()) dxc[b].assign((size_t)blocks[b].k, 0.0);
            std::fwrite(dxf[b].data(), 8, blocks[b].k, g);
            std::fwrite(dxr[b].data(), 8, blocks[b].k, g);
            std::fwrite(dxc[b].data(), 8, blocks[b].k, g);
        }
        std::fclose(g);
    }
    std::printf("{\"blocks\": %lld, \"iters\": %d, \"threads\": %d, "
                "\"mean_iter_s\": %.4f, \"best_iter_s\": %.4f, "
                "\"fwd_s\": %.4f, \"rev_s\": %.4f, \"combine_s\": %.4f}\n",
                (long long)B, iters, threads, total / iters, best,
                fwd_s / iters, rev_s / iters, comb_s / iters);
    return 0;
}
