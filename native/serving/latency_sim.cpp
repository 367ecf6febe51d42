// Serving-latency simulator for the DeepLight / DeepFwFM model family.
//
// Native counterpart of the reference's latency/criteo_latency.cpp (311 LoC):
// hand-rolled single-example CPU inference for LR / FM / FwFM / DeepFwFM with
// dense, CSR-sparse and (extension) int8-quantized deep towers, timed over a
// sparsity sweep. Written from scratch: our own CSR kernel (the reference
// pulls in the external uestla/Sparse-Matrix library), our own timing harness,
// plus a batched-inference mode and a C API for Python ctypes bindings.
//
// Model dimensions default to the paper's Criteo setting: 39 fields,
// 13 numeric, embedding dim 10, deep tower 400x400x400 -> 1.
//
// Build:  make          (in native/serving; produces latency_sim + liblatency_sim.so)
// Run:    ./latency_sim [iters]

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

namespace {

constexpr int kFields = 39;
constexpr int kNumeric = 13;
constexpr int kEmbed = 10;
constexpr int kNodes = 400;
constexpr int kLayers = 3;
constexpr int kDeepIn = kFields * kEmbed;  // 390

using Clock = std::chrono::steady_clock;

double ms_since(Clock::time_point t0) {
  return std::chrono::duration<double, std::milli>(Clock::now() - t0).count();
}

std::mt19937 g_rng(42);

std::vector<float> randn(size_t n, float scale = 1.0f) {
  std::normal_distribution<float> d(0.0f, 1.0f);
  std::vector<float> v(n);
  for (auto& x : v) x = d(g_rng) * scale;
  return v;
}

// Zero out all but `density` fraction of entries (magnitude-agnostic random
// pattern, as the reference's random sparse generator).
void sparsify(std::vector<float>& w, double density) {
  std::uniform_real_distribution<double> u(0.0, 1.0);
  for (auto& x : w) {
    if (u(g_rng) >= density) x = 0.0f;
  }
}

// ---------------------------------------------------------------------------
// CSR sparse matrix (own implementation; replaces the reference's external
// uestla/Sparse-Matrix dependency).
// ---------------------------------------------------------------------------
struct Csr {
  int rows = 0, cols = 0;
  std::vector<int> row_ptr;   // rows+1
  std::vector<int> col_idx;   // nnz
  std::vector<float> vals;    // nnz

  static Csr from_dense(const std::vector<float>& w, int rows, int cols) {
    Csr m;
    m.rows = rows;
    m.cols = cols;
    m.row_ptr.assign(rows + 1, 0);
    for (int r = 0; r < rows; ++r) {
      for (int c = 0; c < cols; ++c) {
        float v = w[size_t(r) * cols + c];
        if (v != 0.0f) {
          m.col_idx.push_back(c);
          m.vals.push_back(v);
        }
      }
      m.row_ptr[r + 1] = int(m.col_idx.size());
    }
    return m;
  }

  // y = W x (+ bias), W row-major (rows x cols)
  void spmv(const float* x, const float* bias, float* y) const {
    for (int r = 0; r < rows; ++r) {
      float acc = bias ? bias[r] : 0.0f;
      for (int i = row_ptr[r]; i < row_ptr[r + 1]; ++i) {
        acc += vals[i] * x[col_idx[i]];
      }
      y[r] = acc;
    }
  }
};

// ---------------------------------------------------------------------------
// Int8 weights with per-row scales (weight-only quantization).
// ---------------------------------------------------------------------------
struct Int8Mat {
  int rows = 0, cols = 0;
  std::vector<int8_t> q;      // rows*cols
  std::vector<float> scale;   // rows

  static Int8Mat from_dense(const std::vector<float>& w, int rows, int cols) {
    Int8Mat m;
    m.rows = rows;
    m.cols = cols;
    m.q.resize(size_t(rows) * cols);
    m.scale.resize(rows);
    for (int r = 0; r < rows; ++r) {
      float amax = 1e-12f;
      for (int c = 0; c < cols; ++c)
        amax = std::max(amax, std::fabs(w[size_t(r) * cols + c]));
      float s = amax / 127.0f;
      m.scale[r] = s;
      for (int c = 0; c < cols; ++c) {
        float v = w[size_t(r) * cols + c] / s;
        m.q[size_t(r) * cols + c] = int8_t(std::lround(std::clamp(v, -127.0f, 127.0f)));
      }
    }
    return m;
  }

  // y = W x with int8 weights, f32 activations (weight-only dequant-on-use)
  void matvec(const float* x, const float* bias, float* y) const {
    for (int r = 0; r < rows; ++r) {
      const int8_t* wr = &q[size_t(r) * cols];
      float acc = 0.0f;
      for (int c = 0; c < cols; ++c) acc += float(wr[c]) * x[c];
      y[r] = acc * scale[r] + (bias ? bias[r] : 0.0f);
    }
  }
};

// ---------------------------------------------------------------------------
// Model parameters (randomly initialized; latency depends only on structure).
// ---------------------------------------------------------------------------
struct Params {
  std::vector<float> w1;                    // (kFields) 1st-order weights
  std::vector<float> emb;                   // (kFields * kEmbed) one row per field
  std::vector<float> r_mat;                 // (kFields * kFields) field matrix R
  std::vector<std::vector<float>> deep_w;   // layer weights (out x in), row-major
  std::vector<std::vector<float>> deep_b;
  std::vector<float> fc_w;                  // (kNodes)
  float bias = 0.01f;
};

Params make_params() {
  Params p;
  p.w1 = randn(kFields);
  p.emb = randn(size_t(kFields) * kEmbed, 0.01f);
  p.r_mat = randn(size_t(kFields) * kFields, 0.2f);
  int in_dim = kDeepIn;
  for (int l = 0; l < kLayers; ++l) {
    p.deep_w.push_back(randn(size_t(kNodes) * in_dim,
                             std::sqrt(2.0f / float(kNodes + in_dim))));
    p.deep_b.push_back(randn(kNodes, 0.01f));
    in_dim = kNodes;
  }
  p.fc_w = randn(kNodes, std::sqrt(2.0f / float(kNodes + 1)));
  return p;
}

// Per-example feature embedding: field f uses its embedding row scaled by the
// (random) feature value — structurally identical to the packed-table lookup.
void example_embedding(const Params& p, const float* xv, float* out /*kDeepIn*/) {
  for (int f = 0; f < kFields; ++f) {
    for (int e = 0; e < kEmbed; ++e) {
      out[f * kEmbed + e] = p.emb[size_t(f) * kEmbed + e] * xv[f];
    }
  }
}

// --- model forward passes (single example) ---------------------------------

float lr_forward(const Params& p, const float* xv) {  // O(F)
  float acc = p.bias;
  for (int f = 0; f < kFields; ++f) acc += p.w1[f] * xv[f];
  return acc;
}

float fm_forward(const Params& p, const float* xv) {  // O(F*E) sum-of-squares
  float acc = lr_forward(p, xv);
  for (int e = 0; e < kEmbed; ++e) {
    float s = 0.0f, sq = 0.0f;
    for (int f = 0; f < kFields; ++f) {
      float v = p.emb[size_t(f) * kEmbed + e] * xv[f];
      s += v;
      sq += v * v;
    }
    acc += 0.5f * (s * s - sq);
  }
  return acc;
}

float fwfm_forward(const Params& p, const float* xv) {  // O(F^2*E)
  float acc = lr_forward(p, xv);
  for (int i = 0; i < kFields; ++i) {
    for (int j = i + 1; j < kFields; ++j) {
      float rij = 0.5f * (p.r_mat[size_t(i) * kFields + j] +
                          p.r_mat[size_t(j) * kFields + i]);
      float dot = 0.0f;
      for (int e = 0; e < kEmbed; ++e) {
        dot += p.emb[size_t(i) * kEmbed + e] * p.emb[size_t(j) * kEmbed + e];
      }
      acc += rij * dot * xv[i] * xv[j];
    }
  }
  return acc;
}

float dense_dnn_forward(const Params& p, const float* x0) {
  float buf_a[kDeepIn > kNodes ? kDeepIn : kNodes];
  float buf_b[kNodes];
  std::memcpy(buf_a, x0, sizeof(float) * kDeepIn);
  int in_dim = kDeepIn;
  const float* x = buf_a;
  float* y = buf_b;
  for (int l = 0; l < kLayers; ++l) {
    const auto& w = p.deep_w[l];
    const auto& b = p.deep_b[l];
    for (int r = 0; r < kNodes; ++r) {
      const float* wr = &w[size_t(r) * in_dim];
      float acc = b[r];
      for (int c = 0; c < in_dim; ++c) acc += wr[c] * x[c];
      y[r] = acc > 0.0f ? acc : 0.0f;
    }
    std::swap(const_cast<float*&>(x), y);
    in_dim = kNodes;
  }
  float acc = 0.0f;
  for (int r = 0; r < kNodes; ++r) acc += p.fc_w[r] * x[r];
  return acc;
}

float sparse_dnn_forward(const std::vector<Csr>& layers,
                         const std::vector<std::vector<float>>& biases,
                         const float* fc_w, const float* x0) {
  std::vector<float> a(kDeepIn), b(kNodes);
  std::copy(x0, x0 + kDeepIn, a.begin());
  const float* x = a.data();
  for (int l = 0; l < kLayers; ++l) {
    layers[l].spmv(x, biases[l].data(), b.data());
    for (auto& v : b) v = v > 0.0f ? v : 0.0f;
    a.assign(b.begin(), b.end());
    x = a.data();
  }
  float acc = 0.0f;
  for (int r = 0; r < kNodes; ++r) acc += fc_w[r] * x[r];
  return acc;
}

float int8_dnn_forward(const std::vector<Int8Mat>& layers,
                       const std::vector<std::vector<float>>& biases,
                       const float* fc_w, const float* x0) {
  std::vector<float> a(kDeepIn), b(kNodes);
  std::copy(x0, x0 + kDeepIn, a.begin());
  const float* x = a.data();
  for (int l = 0; l < kLayers; ++l) {
    layers[l].matvec(x, biases[l].data(), b.data());
    for (auto& v : b) v = v > 0.0f ? v : 0.0f;
    a.assign(b.begin(), b.end());
    x = a.data();
  }
  float acc = 0.0f;
  for (int r = 0; r < kNodes; ++r) acc += fc_w[r] * x[r];
  return acc;
}

volatile float g_sink = 0.0f;  // defeat dead-code elimination

}  // namespace

// ---------------------------------------------------------------------------
// C API (ctypes): returns mean ms per single-example forward.
//   model: 0=LR 1=FM 2=FwFM 3=DeepFwFM-dense 4=DeepFwFM-sparse 5=DeepFwFM-int8
// ---------------------------------------------------------------------------
extern "C" double latency_ms(int model, double density, int iters) {
  Params p = make_params();
  std::vector<float> xv = randn(kFields, 1.0f);
  std::vector<float> x0(kDeepIn);
  example_embedding(p, xv.data(), x0.data());

  std::vector<Csr> sparse_layers;
  std::vector<Int8Mat> int8_layers;
  if (model == 4) {
    for (auto w : p.deep_w) {  // copy, then sparsify
      sparsify(w, density);
      sparse_layers.push_back(Csr::from_dense(
          w, kNodes, int(w.size()) / kNodes));
    }
  } else if (model == 5) {
    for (const auto& w : p.deep_w) {
      int8_layers.push_back(Int8Mat::from_dense(w, kNodes, int(w.size()) / kNodes));
    }
  }

  auto t0 = Clock::now();
  float acc = 0.0f;
  for (int i = 0; i < iters; ++i) {
    switch (model) {
      case 0: acc += lr_forward(p, xv.data()); break;
      case 1: acc += fm_forward(p, xv.data()); break;
      case 2: acc += fwfm_forward(p, xv.data()); break;
      case 3:
        acc += fwfm_forward(p, xv.data()) + dense_dnn_forward(p, x0.data());
        break;
      case 4:
        acc += fwfm_forward(p, xv.data()) +
               sparse_dnn_forward(sparse_layers, p.deep_b, p.fc_w.data(), x0.data());
        break;
      case 5:
        acc += fwfm_forward(p, xv.data()) +
               int8_dnn_forward(int8_layers, p.deep_b, p.fc_w.data(), x0.data());
        break;
    }
  }
  g_sink = acc;
  return ms_since(t0) / iters;
}

// Batched dense DeepFwFM inference: returns examples/s.
extern "C" double batched_throughput(int batch, int iters) {
  Params p = make_params();
  std::vector<float> xv = randn(size_t(batch) * kFields, 1.0f);
  std::vector<float> x0(kDeepIn);
  auto t0 = Clock::now();
  float acc = 0.0f;
  for (int i = 0; i < iters; ++i) {
    for (int b = 0; b < batch; ++b) {
      const float* row = &xv[size_t(b) * kFields];
      example_embedding(p, row, x0.data());
      acc += fwfm_forward(p, row) + dense_dnn_forward(p, x0.data());
    }
  }
  g_sink = acc;
  double total_s = ms_since(t0) / 1e3;
  return double(batch) * iters / total_s;
}

// Multi-threaded batched inference: the reference's run_benchmark times the
// 8192-batch forward at torch.set_num_threads(1) AND (4)
// (model/DeepFMs.py:982-997). Here the batch is split across `threads`
// workers sharing the read-only params; returns examples/s.
extern "C" double batched_throughput_mt(int batch, int iters, int threads) {
  if (threads <= 1) return batched_throughput(batch, iters);
  Params p = make_params();
  std::vector<float> xv = randn(size_t(batch) * kFields, 1.0f);
  std::vector<float> sinks(threads, 0.0f);
  auto t0 = Clock::now();
  for (int i = 0; i < iters; ++i) {
    std::vector<std::thread> pool;
    pool.reserve(threads);
    for (int t = 0; t < threads; ++t) {
      pool.emplace_back([&, t]() {
        int lo = int(size_t(batch) * t / threads);
        int hi = int(size_t(batch) * (t + 1) / threads);
        float x0[kDeepIn];
        float acc = 0.0f;
        for (int b = lo; b < hi; ++b) {
          const float* row = &xv[size_t(b) * kFields];
          example_embedding(p, row, x0);
          acc += fwfm_forward(p, row) + dense_dnn_forward(p, x0);
        }
        sinks[t] += acc;
      });
    }
    for (auto& th : pool) th.join();
  }
  float acc = 0.0f;
  for (float s : sinks) acc += s;
  g_sink = acc;
  double total_s = ms_since(t0) / 1e3;
  return double(batch) * iters / total_s;
}

#ifndef LATENCY_SIM_NO_MAIN
int main(int argc, char** argv) {
  int iters = argc > 1 ? std::atoi(argv[1]) : 1000;
  std::printf("single-example latency (mean over %d iters)\n", iters);
  std::printf("  LR:            %.6f ms\n", latency_ms(0, 1.0, iters));
  std::printf("  FM:            %.6f ms\n", latency_ms(1, 1.0, iters));
  std::printf("  FwFM:          %.6f ms\n", latency_ms(2, 1.0, iters));
  std::printf("  DeepFwFM:      %.6f ms (dense)\n", latency_ms(3, 1.0, iters));
  std::printf("  DeepFwFM int8: %.6f ms\n", latency_ms(5, 1.0, iters));
  // sparsity sweep, density = fraction of nonzeros kept
  const double sweep[] = {0.2, 0.1, 0.05, 0.02, 0.01, 0.005, 0.001};
  for (double d : sweep) {
    std::printf("  DeepFwFM CSR @ %.1f%% dense: %.6f ms\n", d * 100,
                latency_ms(4, d, iters));
  }
  std::printf("batched dense DeepFwFM: %.0f examples/s (batch 2048)\n",
              batched_throughput(2048, std::max(1, iters / 200)));
  // reference benchmark table rows: 8192-batch at 1 and 4 threads
  // (model/DeepFMs.py:982-997)
  for (int threads : {1, 4}) {
    double eps = batched_throughput_mt(8192, std::max(1, iters / 200), threads);
    std::printf("batched dense DeepFwFM: %.0f examples/s "
                "(batch 8192, %d thread%s, %.3f ms/batch)\n",
                eps, threads, threads > 1 ? "s" : "", 8192.0 / eps * 1e3);
  }
  return 0;
}
#endif
