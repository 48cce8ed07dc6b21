// Shared machinery for the reference-cost replicas (ceres_like_bench.cpp,
// poseoptim_bench.cpp): a minimal forward-mode Jet (the mechanism
// ceres::AutoDiffCostFunction uses) and the templated quaternion rotation
// (include/rotation.h in the reference vendors Ceres' identical routine).
// Original code written for measurement; no reference source is copied.
#pragma once

#include <cmath>
#include <cstring>

// ---------------------------------------------------------------- Jet<N> ---
template <int N>
struct Jet {
  double a;
  double v[N];
  Jet() : a(0) { memset(v, 0, sizeof(v)); }
  Jet(double x) : a(x) { memset(v, 0, sizeof(v)); }
  static Jet var(double x, int i) {
    Jet j(x);
    j.v[i] = 1.0;
    return j;
  }
};

template <int N>
inline Jet<N> operator+(const Jet<N>& x, const Jet<N>& y) {
  Jet<N> r;
  r.a = x.a + y.a;
  for (int i = 0; i < N; i++) r.v[i] = x.v[i] + y.v[i];
  return r;
}
template <int N>
inline Jet<N> operator-(const Jet<N>& x, const Jet<N>& y) {
  Jet<N> r;
  r.a = x.a - y.a;
  for (int i = 0; i < N; i++) r.v[i] = x.v[i] - y.v[i];
  return r;
}
template <int N>
inline Jet<N> operator*(const Jet<N>& x, const Jet<N>& y) {
  Jet<N> r;
  r.a = x.a * y.a;
  for (int i = 0; i < N; i++) r.v[i] = x.a * y.v[i] + x.v[i] * y.a;
  return r;
}
template <int N>
inline Jet<N> operator/(const Jet<N>& x, const Jet<N>& y) {
  Jet<N> r;
  const double inv = 1.0 / y.a;
  r.a = x.a * inv;
  for (int i = 0; i < N; i++) r.v[i] = (x.v[i] - r.a * y.v[i]) * inv;
  return r;
}
template <int N>
inline Jet<N> operator*(double s, const Jet<N>& x) {
  Jet<N> r;
  r.a = s * x.a;
  for (int i = 0; i < N; i++) r.v[i] = s * x.v[i];
  return r;
}
template <int N>
inline Jet<N> operator-(const Jet<N>& x) {
  return -1.0 * x;
}

// ------------------------------------------------------------ quaternion ---
template <typename T>
inline void QuatRotate(const T q[4], const T p[3], T out[3]) {
  const T t2 = q[0] * q[1];
  const T t3 = q[0] * q[2];
  const T t4 = q[0] * q[3];
  const T t5 = -(q[1] * q[1]);
  const T t6 = q[1] * q[2];
  const T t7 = q[1] * q[3];
  const T t8 = -(q[2] * q[2]);
  const T t9 = q[2] * q[3];
  const T t1 = -(q[3] * q[3]);
  out[0] = 2.0 * ((t8 + t1) * p[0] + (t6 - t4) * p[1] + (t3 + t7) * p[2]) + p[0];
  out[1] = 2.0 * ((t4 + t6) * p[0] + (t5 + t1) * p[1] + (t9 - t2) * p[2]) + p[1];
  out[2] = 2.0 * ((t7 - t3) * p[0] + (t2 + t9) * p[1] + (t5 + t8) * p[2]) + p[2];
}
template <typename T>
inline void QuatConj(const T q[4], T out[4]) {
  out[0] = q[0];
  out[1] = -q[1];
  out[2] = -q[2];
  out[3] = -q[3];
}
