// Native 1 kHz inner-loop executor.
//
// The reference runs its low-level loop on the host CPU: per 1 ms substep,
// interpolate targets, assemble the TSID QP, ProxQP-solve, add friction
// compensation, send torques (examples/go2_kinodynamics.py:275-295,
// src/friction-compensation.cpp:6-31).  The TPU-first split implemented
// here: the DEVICE assembles the QP structure (H, A, M, h, Jc^T) once per
// MPC tick (100 Hz); this executor runs the 10 substeps of the tick at
// 1 kHz against that frozen structure with per-substep linear data
// (gradients g_k and bound updates), a SINGLE Cholesky factorization
// reused across all substeps, warm-started ADMM (identical scheme to
// qp_admm.cpp / id/qp.py), torque recovery tau = (M ddq + h - Jc^T f)[6:],
// and dry+viscous friction compensation.
//
// C API (ctypes):
//   smt_executor_run(n, m, nv, nu, H, A,
//                    gs (n_sub*n), ls (n_sub*m), us (n_sub*m),
//                    M (nv*nv), h (nv), JcT (nv*nf), nf,
//                    fric_dry (nu|NULL), fric_visc (nu|NULL),
//                    vjs (n_sub*nu|NULL),
//                    n_sub, iters, rho, sigma, alpha,
//                    z (n, in/out), y (m, in/out),
//                    taus_out (n_sub*nu), work) -> 0 on success
// work must hold >= n*n + 3*m + 2*n doubles.

#include <cmath>
#include <cstring>

namespace {

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

inline double signd(double v) { return v > 0.0 ? 1.0 : (v < 0.0 ? -1.0 : 0.0); }

}  // namespace

extern "C" {

int smt_executor_run(int n, int m, int nv, int nu, const double* H,
                     const double* A, const double* gs, const double* ls,
                     const double* us, const double* M, const double* h,
                     const double* JcT, int nf, const double* fric_dry,
                     const double* fric_visc, const double* vjs, int n_sub,
                     int iters, double rho, double sigma, double alpha,
                     double* z, double* y, double* taus_out, double* work) {
  double* K = work;             // n*n
  double* rho_vec = K + n * n;  // m
  double* zc = rho_vec + m;     // m
  double* Ax = zc + m;          // m
  double* rhs = Ax + m;         // n
  double* xnew = rhs + n;       // n

  // per-row rho from the FIRST substep's bounds (equality rows keep l==u
  // across substeps — the dynamics/contact equalities are structural)
  for (int i = 0; i < m; ++i)
    rho_vec[i] = (std::fabs(us[i] - ls[i]) < 1e-12) ? 1e3 * rho : rho;

  // K = H + sigma I + A' diag(rho) A, factored ONCE for the whole tick
  for (int i = 0; i < n * n; ++i) K[i] = H[i];
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

  for (int k = 0; k < n_sub; ++k) {
    const double* g = gs + k * n;
    const double* l = ls + k * m;
    const double* u = us + k * m;

    // zc = A z (same warm-start convention as qp_solve)
    for (int r = 0; r < m; ++r) {
      const double* Ar = A + r * n;
      double s = 0.0;
      for (int i = 0; i < n; ++i) s += Ar[i] * z[i];
      zc[r] = s;
    }
    for (int it = 0; it < iters; ++it) {
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

    // torque recovery: tau = (M ddq + h - Jc^T f)[6:]
    double* tau = taus_out + k * nu;
    for (int i = 0; i < nu; ++i) {
      const int row = 6 + i;
      double s = h[row];
      const double* Mr = M + row * nv;
      for (int j = 0; j < nv; ++j) s += Mr[j] * z[j];
      const double* Jr = JcT + row * nf;
      for (int j = 0; j < nf; ++j) s -= Jr[j] * z[nv + j];
      tau[i] = s;
    }
    // friction compensation (friction-compensation.cpp:6-31)
    if (fric_dry && fric_visc && vjs) {
      const double* vj = vjs + k * nu;
      for (int i = 0; i < nu; ++i)
        tau[i] += fric_visc[i] * vj[i] + fric_dry[i] * signd(vj[i]);
    }
  }
  return 0;
}

}  // extern "C"
