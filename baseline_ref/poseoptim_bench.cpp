// Measured stand-in for the reference's PER-FRAME pose-optimization cost
// (VERDICT r4 next #3: the missing piece of a reference FULL-PIPELINE
// wall-clock number).
//
// The reference runs PoseOptim every frame (src/tracking.cc:447):
// PyrPoseOptim, coarse-to-fine levels 2,1,0, its=10 per level
// (src/optimizer.cc:135-195, 1060-1327), with
//   - 2-dim scene reprojection residuals over q4,t3 of the CURRENT pose
//     only (auto_PoseOptimScene, include/auto_PoseOptimScene.h:22-93) —
//     ceres autodiff = forward-mode Jet<7>;
//   - 8-dim photometric text residuals over the same 7 params, CENTRAL
//     numeric diff = 1 + 2*7 = 15 cost evaluations per residual per
//     Jacobian (nume_PoseOptimText, include/nume_PoseOptimText.h:22-84),
//     each evaluation bilinearly sampling 8 pattern pixels
//     (ModelTool.hpp:233-329);
//   - after each level, problem.Evaluate for outlier gating — one extra
//     residual-only pass (src/optimizer.cc:1238-1303).
//
// Residual counts are the knob. Defaults model a text-rich steady-state
// frame: 300 matched scene points and 6 visible GOOD text objects with
// the reference's per-level pyramid feature thinning (GetPyramidPts keeps
// ALL in-box features at level 0, max-gradient-per-grid-cell above,
// src/tool.cc:564-984): 600/240/120 text rows at levels 0/1/2. These are
// estimates of the reference's operating point (its datasets are not
// available here); override via argv: poseoptim_bench [nscene ntext0].
// Costs EXCLUDED (all favor the reference): SearchFrom3D matching (in the
// front-end bench), TrackNewTextFeat KLT, ThetaOptimMultiFs for immature
// objects, TextUpdate gates, per-level problem construction overhead.
//
// Output: one JSON line -> measured_poseoptim.json, composed with
// measured_frontend.json and measured.json into the reference
// full-pipeline frames/s in BASELINE.md.
//
// Build: g++ -O3 -march=native -std=c++17 -o poseoptim_bench poseoptim_bench.cpp

#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

#include "replica_common.h"

static constexpr int IMH = 480, IMW = 640;
static constexpr double FX = 420.0, FYC = 420.0, CX = 320.0, CY = 240.0;

struct SceneObs {
  double xyz_w[3];  // landmark baked at its current estimate (host Trw and
                    // ray/rho folded in, as auto_PoseOptimScene does)
  double uv[2];
};
struct TextObs {
  double rays_w[8][3];  // pattern points in world (theta+host baked)
  double ref[8];
};

template <typename T>
inline void PoseSceneResidual(const T q[4], const T t[3], const SceneObs& o,
                              T r[2]) {
  T p_w[3] = {T(o.xyz_w[0]), T(o.xyz_w[1]), T(o.xyz_w[2])};
  T p_c[3];
  QuatRotate(q, p_w, p_c);
  p_c[0] = p_c[0] + t[0];
  p_c[1] = p_c[1] + t[1];
  p_c[2] = p_c[2] + t[2];
  T u = FX * (p_c[0] / p_c[2]) + T(CX);
  T v = FYC * (p_c[1] / p_c[2]) + T(CY);
  const double w = 1.0 / 1.2;  // weight_S (src/optimizer.cc:1087)
  r[0] = w * (u - T(o.uv[0]));
  r[1] = w * (v - T(o.uv[1]));
}

static inline void PoseTextResidual(const double q[4], const double t[3],
                                    const TextObs& o, const float* img,
                                    int scale, double r[8]) {
  for (int k = 0; k < 8; k++) {
    double p_c[3];
    QuatRotate(q, o.rays_w[k], p_c);
    p_c[0] += t[0];
    p_c[1] += t[1];
    p_c[2] += t[2];
    double u = (FX * (p_c[0] / p_c[2]) + CX) / scale;
    double v = (FYC * (p_c[1] / p_c[2]) + CY) / scale;
    const int w = IMW / scale, h = IMH / scale;
    if (u < 1) u = 1;
    if (u > w - 2) u = w - 2;
    if (v < 1) v = 1;
    if (v > h - 2) v = h - 2;
    const int x0 = (int)u, y0 = (int)v;
    const double ax = u - x0, ay = v - y0;
    const float* p00 = img + y0 * w + x0;
    const double I = (1 - ax) * (1 - ay) * p00[0] + ax * (1 - ay) * p00[1] +
                     (1 - ax) * ay * p00[w] + ax * ay * p00[w + 1];
    const double wgt = 1.0 / 0.2;  // weight_T (src/optimizer.cc:1088)
    r[k] = wgt * ((I - 128.0) / 40.0 - o.ref[k]);
  }
}

int main(int argc, char** argv) {
  const int NSCENE = argc > 1 ? atoi(argv[1]) : 300;
  const int NTEXT0 = argc > 2 ? atoi(argv[2]) : 600;
  // per-level text rows: level 0 keeps all, coarser levels thinned
  // (GetPyramidPts grid thinning)
  const int ntext[3] = {NTEXT0, (int)(NTEXT0 * 0.4), (int)(NTEXT0 * 0.2)};

  std::mt19937 rng(0);
  std::uniform_real_distribution<double> U(0.0, 1.0);

  double q[4] = {1, 0, 0, 0}, t[3] = {0.01, -0.02, 0.005};
  std::vector<SceneObs> sobs(NSCENE);
  for (auto& o : sobs) {
    o.xyz_w[0] = (40 + 560 * U(rng) - CX) / FX * 4.0;
    o.xyz_w[1] = (40 + 400 * U(rng) - CY) / FYC * 4.0;
    o.xyz_w[2] = 2.0 + 6.0 * U(rng);
    o.uv[0] = 40 + 560 * U(rng);
    o.uv[1] = 40 + 400 * U(rng);
  }
  static const double offs[8][2] = {{0, 0}, {2, 0}, {-2, 0}, {0, 2},
                                    {0, -2}, {1, -1}, {-1, 1}, {-1, -1}};
  std::vector<TextObs> tobs(ntext[0]);
  for (auto& o : tobs) {
    const double u0 = 20 + (IMW - 40) * U(rng), v0 = 20 + (IMH - 40) * U(rng);
    const double z = 2.0 + 4.0 * U(rng);
    for (int k = 0; k < 8; k++) {
      o.rays_w[k][0] = (u0 + offs[k][0] - CX) / FX * z;
      o.rays_w[k][1] = (v0 + offs[k][1] - CY) / FYC * z;
      o.rays_w[k][2] = z;
      o.ref[k] = U(rng) - 0.5;
    }
  }
  // pyramid level images (x2)
  std::vector<std::vector<float>> imgs;
  for (int s : {1, 2, 4}) {
    std::vector<float> im((IMH / s) * (IMW / s));
    for (auto& p : im) p = 255.0f * (float)U(rng);
    imgs.push_back(std::move(im));
  }

  auto frame = [&]() {
    double sink = 0;
    // PyrPoseOptim: levels 2,1,0 (src/optimizer.cc:1095), its=10 each
    for (int li = 2; li >= 0; li--) {
      const int scale = 1 << li;
      const float* img = imgs[li].data();
      const int nt = ntext[li];
      for (int it = 0; it < 10; it++) {
        double H[36] = {0}, b[6] = {0}, cost = 0;
        // scene: autodiff Jet<7> (q4,t3)
        for (const auto& o : sobs) {
          using J = Jet<7>;
          J qj[4], tj[3];
          for (int i = 0; i < 4; i++) qj[i] = J::var(q[i], i);
          for (int i = 0; i < 3; i++) tj[i] = J::var(t[i], 4 + i);
          J r[2];
          PoseSceneResidual(qj, tj, o, r);
          cost += r[0].a * r[0].a + r[1].a * r[1].a;
          double Jl[2][6];
          for (int rr = 0; rr < 2; rr++) {
            for (int i = 0; i < 3; i++) {
              Jl[rr][i] = r[rr].v[1 + i];  // quat local tangent
              Jl[rr][3 + i] = r[rr].v[4 + i];
            }
          }
          for (int i = 0; i < 6; i++) {
            for (int j = 0; j < 6; j++)
              H[i * 6 + j] += Jl[0][i] * Jl[0][j] + Jl[1][i] * Jl[1][j];
            b[i] += Jl[0][i] * r[0].a + Jl[1][i] * r[1].a;
          }
        }
        // text: CENTRAL numeric diff over 7 params = 15 evals x 8 samples
        const double step = 1e-6;
        for (int oi = 0; oi < nt; oi++) {
          const auto& o = tobs[oi];
          double params[7];
          memcpy(params, q, 4 * sizeof(double));
          memcpy(params + 4, t, 3 * sizeof(double));
          double r0[8];
          PoseTextResidual(params, params + 4, o, img, scale, r0);
          for (int k = 0; k < 8; k++) cost += r0[k] * r0[k];
          double Jrow[7][8];
          for (int p = 0; p < 7; p++) {
            double rp[8], rm[8];
            const double save = params[p];
            params[p] = save + step;
            PoseTextResidual(params, params + 4, o, img, scale, rp);
            params[p] = save - step;
            PoseTextResidual(params, params + 4, o, img, scale, rm);
            params[p] = save;
            for (int k = 0; k < 8; k++) Jrow[p][k] = (rp[k] - rm[k]) / (2 * step);
          }
          double Jl[8][6];
          for (int k = 0; k < 8; k++)
            for (int i = 0; i < 3; i++) {
              Jl[k][i] = Jrow[1 + i][k];
              Jl[k][3 + i] = Jrow[4 + i][k];
            }
          for (int i = 0; i < 6; i++) {
            for (int j = 0; j < 6; j++) {
              double s = 0;
              for (int k = 0; k < 8; k++) s += Jl[k][i] * Jl[k][j];
              H[i * 6 + j] += s;
            }
            double s = 0;
            for (int k = 0; k < 8; k++) s += Jl[k][i] * r0[k];
            b[i] += s;
          }
        }
        // 6x6 damped Cholesky solve + candidate-cost re-evaluation
        for (int i = 0; i < 6; i++) H[i * 6 + i] += 1e-3 + 1.0;
        double L[36] = {0};
        for (int j = 0; j < 6; j++) {
          double d = H[j * 6 + j];
          for (int k = 0; k < j; k++) d -= L[j * 6 + k] * L[j * 6 + k];
          d = std::sqrt(std::max(d, 1e-12));
          L[j * 6 + j] = d;
          for (int i = j + 1; i < 6; i++) {
            double s = H[i * 6 + j];
            for (int k = 0; k < j; k++) s -= L[i * 6 + k] * L[j * 6 + k];
            L[i * 6 + j] = s / d;
          }
        }
        double cost2 = 0;
        for (const auto& o : sobs) {
          double r[2];
          PoseSceneResidual(q, t, o, r);
          cost2 += r[0] * r[0] + r[1] * r[1];
        }
        for (int oi = 0; oi < nt; oi++) {
          double r0[8];
          PoseTextResidual(q, t, tobs[oi], img, scale, r0);
          for (int k = 0; k < 8; k++) cost2 += r0[k] * r0[k];
        }
        sink += cost + cost2 * 1e-300 + L[35] * 1e-300;
      }
      // post-level outlier gating: one problem.Evaluate residual pass
      double cg = 0;
      for (const auto& o : sobs) {
        double r[2];
        PoseSceneResidual(q, t, o, r);
        cg += r[0] * r[0] + r[1] * r[1];
      }
      for (int oi = 0; oi < nt; oi++) {
        double r0[8];
        PoseTextResidual(q, t, tobs[oi], img, scale, r0);
        for (int k = 0; k < 8; k++) cg += r0[k] * r0[k];
      }
      sink += cg * 1e-300;
    }
    return sink;
  };

  volatile double sink = frame();  // warmup
  const int reps = 20;
  auto t0 = std::chrono::steady_clock::now();
  for (int i = 0; i < reps; i++) sink += frame();
  auto t1 = std::chrono::steady_clock::now();
  const double ms = 1e3 * std::chrono::duration<double>(t1 - t0).count() / reps;
  printf(
      "{\"metric\": \"ref_poseoptim_ms_per_frame\", \"value\": %.2f, "
      "\"unit\": \"ms/frame, single-thread C++ replica of reference "
      "PyrPoseOptim (levels 2..0 x 10 its; %d autodiff scene rows + "
      "%d/%d/%d central-numeric-diff text rows at levels 0/1/2; per-level "
      "gating pass)\", \"sink\": %.1e}\n",
      ms, NSCENE, ntext[0], ntext[1], ntext[2], (double)sink);
  return 0;
}
