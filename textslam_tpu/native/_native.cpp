// Native host-side runtime for textslam_tpu.
//
// The reference implements its whole runtime in C++ (SURVEY.md §2: 100% C++).
// In the TPU-native re-design the compute path lives on-device (JAX/XLA), and
// this module provides native equivalents of the *host* runtime pieces that
// would otherwise throttle the device:
//
//  - levenshtein_batch: threaded all-pairs edit distance on codepoint arrays
//    (host fallback / arbitrary-length path for loop detection; the device
//    path is ops/levenshtein.py). Reference: src/tool.cc:264-299.
//  - covis_product: threaded incidence-matrix product K x K from a [K, P]
//    uint8 incidence — the covisibility matrices M1/M2/M3 (src/map.cc
//    UpdateCovMap_*).
//  - Prefetcher: background file reader with a bounded ring of buffers — the
//    data-loader IO stage (reference: sequential imread in main.cpp:64).
//
// Built with setuptools (build_native.py); pure CPython C API, no pybind11.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <fstream>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

// ---------------------------------------------------------------------------
// helpers: tiny numpy-free buffer exchange. Inputs/outputs are python
// bytes-like objects wrapped by the python shim (avoids a compile-time numpy
// header dependency).

static bool get_contig(PyObject* obj, Py_buffer* view, const char* name) {
  if (PyObject_GetBuffer(obj, view, PyBUF_C_CONTIGUOUS | PyBUF_SIMPLE) != 0) {
    PyErr_Format(PyExc_TypeError, "%s must be a C-contiguous buffer", name);
    return false;
  }
  return true;
}

// ---------------------------------------------------------------------------
// levenshtein_batch(a_codes, alen, b_codes, blen, Q, T, L) -> bytes [Q*T int32]

static void lev_rows(const int32_t* a, const int32_t* alen, const int32_t* b,
                     const int32_t* blen, int64_t T, int64_t L, int32_t* out,
                     int64_t q0, int64_t q1) {
  std::vector<int32_t> dp(static_cast<size_t>(L) + 1);
  for (int64_t q = q0; q < q1; ++q) {
    const int32_t* aw = a + q * L;
    const int32_t la = alen[q];
    for (int64_t t = 0; t < T; ++t) {
      const int32_t* bw = b + t * L;
      const int32_t lb = blen[t];
      for (int32_t j = 0; j <= lb; ++j) dp[j] = j;
      for (int32_t i = 1; i <= la; ++i) {
        int32_t prev = dp[0];
        dp[0] = i;
        for (int32_t j = 1; j <= lb; ++j) {
          int32_t cur = dp[j];
          int32_t sub = prev + (aw[i - 1] != bw[j - 1]);
          int32_t del = dp[j] + 1;
          int32_t ins = dp[j - 1] + 1;
          dp[j] = std::min(sub, std::min(del, ins));
          prev = cur;
        }
      }
      out[q * T + t] = dp[lb];
    }
  }
}

static PyObject* levenshtein_batch(PyObject*, PyObject* args) {
  PyObject *a_o, *alen_o, *b_o, *blen_o;
  Py_ssize_t Q, T, L;
  if (!PyArg_ParseTuple(args, "OOOOnnn", &a_o, &alen_o, &b_o, &blen_o, &Q, &T, &L))
    return nullptr;
  Py_buffer a_v, alen_v, b_v, blen_v;
  if (!get_contig(a_o, &a_v, "a")) return nullptr;
  if (!get_contig(alen_o, &alen_v, "alen")) { PyBuffer_Release(&a_v); return nullptr; }
  if (!get_contig(b_o, &b_v, "b")) { PyBuffer_Release(&a_v); PyBuffer_Release(&alen_v); return nullptr; }
  if (!get_contig(blen_o, &blen_v, "blen")) {
    PyBuffer_Release(&a_v); PyBuffer_Release(&alen_v); PyBuffer_Release(&b_v);
    return nullptr;
  }
  PyObject* out_bytes = PyBytes_FromStringAndSize(nullptr, Q * T * sizeof(int32_t));
  if (out_bytes) {
    int32_t* out = reinterpret_cast<int32_t*>(PyBytes_AS_STRING(out_bytes));
    const int32_t* a = static_cast<const int32_t*>(a_v.buf);
    const int32_t* alen = static_cast<const int32_t*>(alen_v.buf);
    const int32_t* b = static_cast<const int32_t*>(b_v.buf);
    const int32_t* blen = static_cast<const int32_t*>(blen_v.buf);
    Py_BEGIN_ALLOW_THREADS;
    unsigned nt = std::max(1u, std::min(std::thread::hardware_concurrency(),
                                        static_cast<unsigned>(Q)));
    std::vector<std::thread> threads;
    int64_t chunk = (Q + nt - 1) / nt;
    for (unsigned k = 0; k < nt; ++k) {
      int64_t q0 = k * chunk;
      int64_t q1 = std::min<int64_t>(Q, q0 + chunk);
      if (q0 >= q1) break;
      threads.emplace_back(lev_rows, a, alen, b, blen, T, L, out, q0, q1);
    }
    for (auto& th : threads) th.join();
    Py_END_ALLOW_THREADS;
  }
  PyBuffer_Release(&a_v); PyBuffer_Release(&alen_v);
  PyBuffer_Release(&b_v); PyBuffer_Release(&blen_v);
  return out_bytes;
}

// ---------------------------------------------------------------------------
// covis_product(inc_bytes, K, P) -> bytes [K*K int32]; inc is [K, P] uint8

static void covis_rows(const uint8_t* inc, int64_t K, int64_t P, int32_t* out,
                       int64_t a0, int64_t a1) {
  for (int64_t a = a0; a < a1; ++a) {
    const uint8_t* ra = inc + a * P;
    for (int64_t b = a + 1; b < K; ++b) {
      const uint8_t* rb = inc + b * P;
      int32_t s = 0;
      for (int64_t p = 0; p < P; ++p) s += ra[p] & rb[p];
      out[a * K + b] = s;
      out[b * K + a] = s;
    }
  }
}

static PyObject* covis_product(PyObject*, PyObject* args) {
  PyObject* inc_o;
  Py_ssize_t K, P;
  if (!PyArg_ParseTuple(args, "Onn", &inc_o, &K, &P)) return nullptr;
  Py_buffer inc_v;
  if (!get_contig(inc_o, &inc_v, "inc")) return nullptr;
  PyObject* out_bytes = PyBytes_FromStringAndSize(nullptr, K * K * sizeof(int32_t));
  if (out_bytes) {
    int32_t* out = reinterpret_cast<int32_t*>(PyBytes_AS_STRING(out_bytes));
    std::memset(out, 0, K * K * sizeof(int32_t));
    const uint8_t* inc = static_cast<const uint8_t*>(inc_v.buf);
    Py_BEGIN_ALLOW_THREADS;
    unsigned nt = std::max(1u, std::min(std::thread::hardware_concurrency(),
                                        static_cast<unsigned>(K)));
    std::vector<std::thread> threads;
    int64_t chunk = (K + nt - 1) / nt;
    for (unsigned k = 0; k < nt; ++k) {
      int64_t a0 = k * chunk;
      int64_t a1 = std::min<int64_t>(K, a0 + chunk);
      if (a0 >= a1) break;
      threads.emplace_back(covis_rows, inc, K, P, out, a0, a1);
    }
    for (auto& th : threads) th.join();
    Py_END_ALLOW_THREADS;
  }
  PyBuffer_Release(&inc_v);
  return out_bytes;
}

// ---------------------------------------------------------------------------
// Prefetcher: background file reads with a bounded lookahead window.

struct Prefetcher {
  PyObject_HEAD;
  std::vector<std::string>* paths;
  std::vector<PyObject*>* cache;  // bytes objects or nullptr
  std::mutex* mu;
  std::condition_variable* cv;
  std::thread* worker;
  std::atomic<int64_t>* cursor;  // consumer position
  std::atomic<bool>* stop;
  int64_t lookahead;
};

static void prefetch_loop(Prefetcher* self) {
  const int64_t n = static_cast<int64_t>(self->paths->size());
  for (int64_t i = 0; i < n && !self->stop->load(); ++i) {
    // bound the lookahead window
    {
      std::unique_lock<std::mutex> lk(*self->mu);
      self->cv->wait(lk, [&] {
        return self->stop->load() || i < self->cursor->load() + self->lookahead;
      });
    }
    if (self->stop->load()) break;
    std::ifstream f((*self->paths)[i], std::ios::binary | std::ios::ate);
    std::string data;
    if (f) {
      auto sz = f.tellg();
      data.resize(static_cast<size_t>(sz));
      f.seekg(0);
      f.read(&data[0], sz);
    }
    {
      // bytes creation requires the GIL
      PyGILState_STATE g = PyGILState_Ensure();
      PyObject* b = PyBytes_FromStringAndSize(data.data(), data.size());
      std::lock_guard<std::mutex> lk(*self->mu);
      (*self->cache)[i] = b;
      PyGILState_Release(g);
    }
    self->cv->notify_all();
  }
}

static int prefetcher_init(PyObject* self_o, PyObject* args, PyObject*) {
  Prefetcher* self = reinterpret_cast<Prefetcher*>(self_o);
  PyObject* list;
  Py_ssize_t lookahead = 8;
  if (!PyArg_ParseTuple(args, "O|n", &list, &lookahead)) return -1;
  self->paths = new std::vector<std::string>();
  self->cache = new std::vector<PyObject*>();
  self->mu = new std::mutex();
  self->cv = new std::condition_variable();
  self->cursor = new std::atomic<int64_t>(0);
  self->stop = new std::atomic<bool>(false);
  self->lookahead = lookahead;
  Py_ssize_t n = PySequence_Length(list);
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject* it = PySequence_GetItem(list, i);
    const char* s = PyUnicode_AsUTF8(it);
    if (!s) { Py_XDECREF(it); return -1; }
    self->paths->push_back(s);
    self->cache->push_back(nullptr);
    Py_DECREF(it);
  }
  self->worker = new std::thread(prefetch_loop, self);
  return 0;
}

static PyObject* prefetcher_get(PyObject* self_o, PyObject* args) {
  Prefetcher* self = reinterpret_cast<Prefetcher*>(self_o);
  Py_ssize_t i;
  if (!PyArg_ParseTuple(args, "n", &i)) return nullptr;
  if (i < 0 || static_cast<size_t>(i) >= self->paths->size()) {
    PyErr_SetString(PyExc_IndexError, "prefetcher index out of range");
    return nullptr;
  }
  self->cursor->store(std::max<int64_t>(self->cursor->load(), i));
  self->cv->notify_all();
  PyObject* out = nullptr;
  while (true) {
    {
      std::lock_guard<std::mutex> lk(*self->mu);
      out = (*self->cache)[i];
    }
    if (out) break;
    Py_BEGIN_ALLOW_THREADS;
    std::this_thread::sleep_for(std::chrono::microseconds(200));
    Py_END_ALLOW_THREADS;
  }
  Py_INCREF(out);
  return out;
}

static void prefetcher_dealloc(PyObject* self_o) {
  Prefetcher* self = reinterpret_cast<Prefetcher*>(self_o);
  self->stop->store(true);
  self->cv->notify_all();
  if (self->worker) {
    Py_BEGIN_ALLOW_THREADS;
    self->worker->join();
    Py_END_ALLOW_THREADS;
    delete self->worker;
  }
  for (PyObject* b : *self->cache) Py_XDECREF(b);
  delete self->paths;
  delete self->cache;
  delete self->mu;
  delete self->cv;
  delete self->cursor;
  delete self->stop;
  Py_TYPE(self_o)->tp_free(self_o);
}

static PyMethodDef prefetcher_methods[] = {
    {"get", prefetcher_get, METH_VARARGS, "blocking fetch of file i's bytes"},
    {nullptr, nullptr, 0, nullptr},
};

static PyTypeObject PrefetcherType = []() {
  PyTypeObject t = {PyVarObject_HEAD_INIT(nullptr, 0)};
  t.tp_name = "textslam_native.Prefetcher";
  t.tp_basicsize = sizeof(Prefetcher);
  t.tp_flags = Py_TPFLAGS_DEFAULT;
  t.tp_doc = "background file prefetcher";
  t.tp_new = PyType_GenericNew;
  t.tp_init = prefetcher_init;
  t.tp_dealloc = prefetcher_dealloc;
  t.tp_methods = prefetcher_methods;
  return t;
}();

// ---------------------------------------------------------------------------

static PyMethodDef methods[] = {
    {"levenshtein_batch", levenshtein_batch, METH_VARARGS,
     "all-pairs edit distance over codepoint buffers"},
    {"covis_product", covis_product, METH_VARARGS,
     "incidence covisibility product"},
    {nullptr, nullptr, 0, nullptr},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_native", "textslam native runtime", -1, methods,
};

PyMODINIT_FUNC PyInit__native(void) {
  PyObject* m = PyModule_Create(&moduledef);
  if (!m) return nullptr;
  if (PyType_Ready(&PrefetcherType) < 0) return nullptr;
  Py_INCREF(&PrefetcherType);
  PyModule_AddObject(m, "Prefetcher", reinterpret_cast<PyObject*>(&PrefetcherType));
  return m;
}
