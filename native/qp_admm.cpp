// Native host QP solver for the 1 kHz inverse-dynamics loop.
//
// Role parity with the reference's ProxQP-inside-TSID (kinodynamics-id.hpp:84):
// on a real robot the low-level loop runs on the host CPU next to the motor
// drivers, so the framework ships a native implementation of the same
// OSQP-form ADMM scheme as simple_mpc_tpu/id/qp.py (one Cholesky
// factorization, fixed iteration count, per-row rho with stiffer equalities).
// The JAX kernel remains the batched/simulation path; this library is the
// deployment path.  Plain C++17, no external linear-algebra deps (problem
// sizes are tens of variables; hand-rolled dense Cholesky is enough).
//
//   min 0.5 z'Hz + g'z   s.t.  l <= Az <= u
//
// C API (ctypes): qp_solve(n, m, H, g, A, l, u, iters, rho, sigma, alpha,
//                          z, y, work) -> 0 on success.
// z/y are warm-start in, solution out.  work must hold >= n*n + 3*m + 2*n
// doubles.

#include <cmath>
#include <cstring>

namespace {

// in-place lower Cholesky of K (n x n, row-major); returns 0 on success
int cholesky(double* K, int n) {
  for (int j = 0; j < n; ++j) {
    double d = K[j * n + j];
    for (int k = 0; k < j; ++k) d -= K[j * n + k] * K[j * n + k];
    if (d <= 0.0) return 1;
    d = std::sqrt(d);
    K[j * n + j] = d;
    for (int i = j + 1; i < n; ++i) {
      double s = K[i * n + j];
      for (int k = 0; k < j; ++k) s -= K[i * n + k] * K[j * n + k];
      K[i * n + j] = s / d;
    }
  }
  return 0;
}

// solve L L' x = b with L lower (row-major), x := solution
void cho_solve(const double* L, int n, const double* b, double* x) {
  for (int i = 0; i < n; ++i) {
    double s = b[i];
    for (int k = 0; k < i; ++k) s -= L[i * n + k] * x[k];
    x[i] = s / L[i * n + i];
  }
  for (int i = n - 1; i >= 0; --i) {
    double s = x[i];
    for (int k = i + 1; k < n; ++k) s -= L[k * n + i] * x[k];
    x[i] = s / L[i * n + i];
  }
}

inline double clampd(double v, double lo, double hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

}  // namespace

extern "C" {

int qp_solve(int n, int m, const double* H, const double* g, const double* A,
             const double* l, const double* u, int iters, double rho,
             double sigma, double alpha, double* z, double* y, double* work) {
  double* K = work;            // n*n
  double* rho_vec = K + n * n; // m
  double* zc = rho_vec + m;    // m  (projected Az)
  double* Ax = zc + m;         // m
  double* rhs = Ax + m;        // n
  double* xnew = rhs + n;      // n

  for (int i = 0; i < m; ++i)
    rho_vec[i] = (std::fabs(u[i] - l[i]) < 1e-12) ? 1e3 * rho : rho;

  // K = H + sigma I + A' diag(rho) A
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < n; ++j) K[i * n + j] = H[i * n + j];
  for (int i = 0; i < n; ++i) K[i * n + i] += sigma;
  for (int r = 0; r < m; ++r) {
    const double* Ar = A + r * n;
    const double w = rho_vec[r];
    for (int i = 0; i < n; ++i) {
      const double wi = w * Ar[i];
      if (wi == 0.0) continue;
      for (int j = 0; j < n; ++j) K[i * n + j] += wi * Ar[j];
    }
  }
  if (cholesky(K, n)) return 1;

  // zc = A z (warm start)
  for (int r = 0; r < m; ++r) {
    const double* Ar = A + r * n;
    double s = 0.0;
    for (int i = 0; i < n; ++i) s += Ar[i] * z[i];
    zc[r] = s;
  }

  for (int it = 0; it < iters; ++it) {
    // rhs = sigma z - g + A'(rho.*zc - y)
    for (int i = 0; i < n; ++i) rhs[i] = sigma * z[i] - g[i];
    for (int r = 0; r < m; ++r) {
      const double c = rho_vec[r] * zc[r] - y[r];
      const double* Ar = A + r * n;
      for (int i = 0; i < n; ++i) rhs[i] += Ar[i] * c;
    }
    cho_solve(K, n, rhs, xnew);
    for (int r = 0; r < m; ++r) {
      const double* Ar = A + r * n;
      double s = 0.0;
      for (int i = 0; i < n; ++i) s += Ar[i] * xnew[i];
      Ax[r] = s;
    }
    for (int r = 0; r < m; ++r) {
      const double ax_rel = alpha * Ax[r] + (1.0 - alpha) * zc[r];
      const double znew = clampd(ax_rel + y[r] / rho_vec[r], l[r], u[r]);
      y[r] += rho_vec[r] * (ax_rel - znew);
      zc[r] = znew;
    }
    std::memcpy(z, xnew, sizeof(double) * static_cast<size_t>(n));
  }
  return 0;
}

// residuals for diagnostics: prim = max |Az - clamp(Az)|, dual = max |Hz+g+A'y|
void qp_residuals(int n, int m, const double* H, const double* g,
                  const double* A, const double* l, const double* u,
                  const double* z, const double* y, double* prim,
                  double* dual) {
  double p = 0.0;
  for (int r = 0; r < m; ++r) {
    const double* Ar = A + r * n;
    double s = 0.0;
    for (int i = 0; i < n; ++i) s += Ar[i] * z[i];
    const double v = s - clampd(s, l[r], u[r]);
    p = std::max(p, std::fabs(v));
  }
  double d = 0.0;
  for (int i = 0; i < n; ++i) {
    double s = g[i];
    for (int j = 0; j < n; ++j) s += H[i * n + j] * z[j];
    for (int r = 0; r < m; ++r) s += A[r * n + i] * y[r];
    d = std::max(d, std::fabs(s));
  }
  *prim = p;
  *dual = d;
}

}  // extern "C"
