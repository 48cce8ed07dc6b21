// Measured stand-in for the reference's SearchFrom3D per-frame matching cost
// (src/tracking.cc:1124-1273): project ALL map points under the pose guess,
// look up frame keypoints in a radius-18 window of the 64x48 feature grid
// (src/frame.h:26-27, GetFeaturesInArea src/frame.cc:415-468), and Hamming-
// match the point's 256-bit descriptor against every candidate (TH_HIGH=100).
// Single thread, -O3 — the reference's own execution model.
//
// Output: {"search3d_ms": X} for N points / K keypoints at the bench shape.
// Build: g++ -O3 -march=native -std=c++17 -o search3d_bench search3d_bench.cpp

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <chrono>
#include <random>
#include <vector>

static const int W = 640, H = 480, CELL = 10;
static const int GW = W / CELL, GH = H / CELL;

int main(int argc, char** argv) {
  int n_pts = argc > 1 ? atoi(argv[1]) : 2000;
  int n_kp = argc > 2 ? atoi(argv[2]) : 1000;
  int n_frames = argc > 3 ? atoi(argv[3]) : 50;
  std::mt19937 rng(0);
  std::uniform_real_distribution<float> ux(-2, 2), uy(-1.5, 1.5), uz(1, 6);
  std::uniform_int_distribution<uint32_t> ud;

  std::vector<float> px(n_pts), py(n_pts), pz(n_pts);
  std::vector<uint64_t> pdesc(n_pts * 4), kdesc(n_kp * 4);
  for (int i = 0; i < n_pts; i++) {
    px[i] = ux(rng); py[i] = uy(rng); pz[i] = uz(rng);
    for (int w = 0; w < 4; w++)
      pdesc[i * 4 + w] = (uint64_t(ud(rng)) << 32) | ud(rng);
  }
  std::vector<float> ku(n_kp), kv(n_kp);
  std::uniform_real_distribution<float> uu(0, W), uv(0, H);
  for (int j = 0; j < n_kp; j++) {
    ku[j] = uu(rng); kv[j] = uv(rng);
    for (int w = 0; w < 4; w++)
      kdesc[j * 4 + w] = (uint64_t(ud(rng)) << 32) | ud(rng);
  }
  // feature grid (AssignFeaturesToGrid, built once per frame in the frame
  // ctor; its build cost belongs to this phase)
  const float fx = 420.f, fy = 420.f, cx = W / 2.f, cy = H / 2.f;
  const float radius = 18.f;

  volatile long sink = 0;
  auto t0 = std::chrono::steady_clock::now();
  for (int f = 0; f < n_frames; f++) {
    std::vector<std::vector<int>> grid(GW * GH);
    for (int j = 0; j < n_kp; j++) {
      int gx = int(ku[j]) / CELL, gy = int(kv[j]) / CELL;
      if (gx >= 0 && gx < GW && gy >= 0 && gy < GH)
        grid[gy * GW + gx].push_back(j);
    }
    int n_match = 0;
    for (int i = 0; i < n_pts; i++) {
      float z = pz[i];
      if (z < 0.05f) continue;
      float u = fx * px[i] / z + cx, v = fy * py[i] / z + cy;
      if (u < 0 || u >= W || v < 0 || v >= H) continue;
      int gx0 = std::max(int((u - radius) / CELL), 0);
      int gx1 = std::min(int((u + radius) / CELL), GW - 1);
      int gy0 = std::max(int((v - radius) / CELL), 0);
      int gy1 = std::min(int((v + radius) / CELL), GH - 1);
      int best = 257, best_j = -1;
      for (int gy = gy0; gy <= gy1; gy++)
        for (int gx = gx0; gx <= gx1; gx++)
          for (int j : grid[gy * GW + gx]) {
            float du = ku[j] - u, dv = kv[j] - v;
            if (du * du + dv * dv > radius * radius) continue;
            int d = 0;
            for (int w = 0; w < 4; w++)
              d += __builtin_popcountll(pdesc[i * 4 + w] ^ kdesc[j * 4 + w]);
            if (d < best) { best = d; best_j = j; }
          }
      if (best <= 100) n_match++;
    }
    sink += n_match;
  }
  auto t1 = std::chrono::steady_clock::now();
  double ms = std::chrono::duration<double, std::milli>(t1 - t0).count() / n_frames;
  printf("{\"search3d_ms\": %.3f, \"sink\": %ld}\n", ms, (long)sink);
  return 0;
}
