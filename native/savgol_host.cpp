// savgol_host.cpp — native host runtime for savgol_tpu.
//
// The TPU path (JAX/Pallas) owns batch throughput; this C++ engine owns the
// host-side latency domain the reference library targets (embedded,
// sample-by-sample real-time — /root/reference is a pure-C library): a
// microsecond-latency streaming filter and a fast CPU batch path, exposed
// through a C ABI consumed by savgol_tpu.native via ctypes.
//
// Written from scratch against the published Savitzky-Golay math (same
// formulas the Python generator uses — Gram three-term recurrence + falling
// factorials, see savgol_tpu/ops/weights.py). All weight computation is in
// double precision (the reference computes its recurrence in float —
// src/savgolFilter.c:236-303 — so this engine is strictly more accurate).
// Leading-edge odd derivatives default to the mathematically correct sign;
// the reference's reversed-data sign flip is available via a flag.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC savgol_host.cpp -o libsavgolhost.so

#include <algorithm>
#include <cmath>
#include <cstddef>
#include <cstdint>
#include <cstring>
#include <new>
#include <thread>
#include <type_traits>
#include <vector>

namespace sgh {

constexpr int kMaxHalfWindow = 32;
constexpr int kMaxPolyOrder = 10;
constexpr int kMaxDerivative = 4;

enum Boundary : int32_t {
  kPolynomial = 0,
  kReflect = 1,
  kPeriodic = 2,
  kConstant = 3,
};

// Gram polynomial table F_k^{(d)}(i) for all k <= m, d' <= d, i in [-n, n],
// filled by running the three-term recurrence over the whole point vector
// at once (one pass per k, not one call per (k, d, i)).
class GramTable {
 public:
  GramTable(int n, int m, int dmax)
      : n_(n), m_(m), dmax_(dmax), width_(2 * n + 1),
        data_((m + 1) * (dmax + 1) * width_, 0.0) {
    std::vector<double> pts(width_);
    for (int i = 0; i < width_; ++i) pts[i] = i - n;
    // k = 0: F_0^{(0)} = 1, higher derivatives 0.
    for (int i = 0; i < width_; ++i) at(0, 0, i) = 1.0;
    if (m >= 1) {
      const double inv_n = 1.0 / n;
      for (int i = 0; i < width_; ++i) at(1, 0, i) = inv_n * pts[i];
      for (int d = 1; d <= dmax; ++d)
        for (int i = 0; i < width_; ++i)
          at(1, d, i) = inv_n * (pts[i] * at(0, d, i) + d * at(0, d - 1, i));
    }
    for (int k = 2; k <= m; ++k) {
      const double denom = static_cast<double>(k) * (2.0 * n - k + 1.0);
      const double alpha = (4.0 * k - 2.0) / denom;
      const double gamma = ((k - 1.0) * (2.0 * n + k)) / denom;
      for (int d = 0; d <= dmax; ++d) {
        for (int i = 0; i < width_; ++i) {
          double term = pts[i] * at(k - 1, d, i);
          if (d > 0) term += d * at(k - 1, d - 1, i);
          at(k, d, i) = alpha * term - gamma * at(k - 2, d, i);
        }
      }
    }
  }

  double operator()(int k, int d, int point) const {  // point in [-n, n]
    return data_[(static_cast<size_t>(k) * (dmax_ + 1) + d) * width_ +
                 (point + n_)];
  }

 private:
  double& at(int k, int d, int idx) {
    return data_[(static_cast<size_t>(k) * (dmax_ + 1) + d) * width_ + idx];
  }
  int n_, m_, dmax_, width_;
  std::vector<double> data_;
};

inline double falling_factorial(int a, int b) {
  double p = 1.0;
  for (int j = a - b + 1; j <= a; ++j) p *= j;
  return b > a ? 0.0 : p;
}

struct Filter {
  int n = 0, m = 0, d = 0;
  int width = 0;                 // 2n + 1
  Boundary boundary = kPolynomial;
  double dt_inv = 1.0;
  // weights[t][i]: t = 0 is the centered stencil; t = 1..n are the edge
  // rows for target n - (t - 1). f64 masters (export/oracle accuracy) +
  // f32 copies for the SIMD hot loops (the reference also convolves in
  // f32, so accuracy parity is preserved).
  std::vector<double> center;             // width
  std::vector<double> edge;               // n * width (row e: target n - e)
  std::vector<float> center_f;            // width
  std::vector<float> edge_f;              // n * width
  std::vector<float> edge_rev_f;          // n * width, columns reversed

  Filter(int half_window, int poly_order, int deriv, double time_step,
         Boundary b)
      : n(half_window), m(poly_order), d(deriv), width(2 * half_window + 1),
        boundary(b) {
    const double scale = std::pow(time_step, deriv);
    dt_inv = scale != 0.0 ? 1.0 / scale : 1.0;
    GramTable g(n, m, d);
    std::vector<double> factor(m + 1);
    for (int k = 0; k <= m; ++k)
      factor[k] = (2.0 * k + 1.0) * falling_factorial(2 * n, k) /
                  falling_factorial(2 * n + k + 1, k + 1);
    center.resize(width);
    edge.resize(static_cast<size_t>(n) * width);
    for (int i = -n; i <= n; ++i) {
      double wc = 0.0;
      for (int k = 0; k <= m; ++k) wc += factor[k] * g(k, 0, i) * g(k, d, 0);
      center[i + n] = wc;
      for (int e = 0; e < n; ++e) {
        const int target = n - e;
        double we = 0.0;
        for (int k = 0; k <= m; ++k)
          we += factor[k] * g(k, 0, i) * g(k, d, target);
        edge[static_cast<size_t>(e) * width + (i + n)] = we;
      }
    }
    center_f.assign(center.begin(), center.end());
    edge_f.assign(edge.begin(), edge.end());
    edge_rev_f.resize(edge.size());
    for (int e = 0; e < n; ++e)
      for (int i = 0; i < width; ++i)
        edge_rev_f[static_cast<size_t>(e) * width + i] =
            static_cast<float>(edge[static_cast<size_t>(e) * width +
                                    (width - 1 - i)]);
  }

  // SIMD-friendly f32 dot: 8 independent accumulator lanes (SLP-
  // vectorizes under -O3 -march=native without -ffast-math), pairwise
  // final reduction.
  static float dot_f(const float* w, const float* x, int len) {
    float acc[8] = {0, 0, 0, 0, 0, 0, 0, 0};
    int i = 0;
    for (; i + 8 <= len; i += 8)
      for (int j = 0; j < 8; ++j) acc[j] += w[i + j] * x[i + j];
    float tail = 0.0f;
    for (; i < len; ++i) tail += w[i] * x[i];
    return ((acc[0] + acc[1]) + (acc[2] + acc[3])) +
           ((acc[4] + acc[5]) + (acc[6] + acc[7])) + tail;
  }

  double dot_center(const float* x) const {
    return dot_f(center_f.data(), x, width);
  }
  double dot_edge(int e, const float* x) const {
    return dot_f(edge_f.data() + static_cast<size_t>(e) * width, x, width);
  }
  double dot_edge_rev(int e, const float* x_last) const {
    // reversed traversal = forward dot against column-reversed weights
    return dot_f(edge_rev_f.data() + static_cast<size_t>(e) * width,
                 x_last - width + 1, width);
  }
};

inline float boundary_sample(const float* x, int64_t len, int64_t idx,
                             Boundary b) {
  if (idx >= 0 && idx < len) return x[idx];
  switch (b) {
    case kReflect: {  // edge sample duplicated (numpy 'symmetric')
      int64_t i = idx < 0 ? -idx - 1 : 2 * len - idx - 1;
      if (i < 0) i = 0;
      if (i >= len) i = len - 1;
      return x[i];
    }
    case kPeriodic: {
      int64_t i = ((idx % len) + len) % len;
      return x[i];
    }
    case kConstant:
      return idx < 0 ? x[0] : x[len - 1];
    default:
      return 0.0f;
  }
}

// Interior-only apply over out[j0, j1) (global output coordinates within
// [n, len - n)). Vectorizes ACROSS outputs (64-wide blocks; each tap is
// one broadcast-FMA over the block — no horizontal reductions, no tails
// in the hot loop; the per-output dot form leaves half the SIMD width
// idle on a 25-tap window). Also the per-thread body of the threaded
// paths: reads `in` shared read-only, writes a disjoint output range.
void apply_interior_range(const Filter& f, const float* in, float* out,
                          int64_t j0, int64_t j1) {
  const int n = f.n;
  const float dtf = static_cast<float>(f.dt_inv);
  constexpr int kBlock = 64;
  const float* wf = f.center_f.data();
  auto run_block = [&](int64_t j) {
    float acc[kBlock] = {0};
    const float* base = in + (j - n);
    for (int k = 0; k < f.width; ++k) {
      const float wk = wf[k];
      const float* xk = base + k;
      for (int t = 0; t < kBlock; ++t) acc[t] += wk * xk[t];
    }
    for (int t = 0; t < kBlock; ++t) out[j + t] = acc[t] * dtf;
  };
  int64_t j = j0;
  for (; j + kBlock <= j1; j += kBlock) run_block(j);
  if (j < j1) {
    if (j1 - j0 >= kBlock) {
      // Shift the final block back so it ends exactly at j1: per-output
      // tap order is block-alignment-independent, so the overlapping
      // rewrite is value-identical and the whole range stays vectorized
      // (also keeps the threaded split bit-identical — the last thread
      // produces the same overlap block the single-thread pass does).
      run_block(j1 - kBlock);
    } else {
      for (; j < j1; ++j)
        out[j] = static_cast<float>(f.dot_center(in + j - n) * f.dt_inv);
    }
  }
}

// Boundary regions (first and last n outputs), shared by the plain and
// threaded applies so the two can never diverge.
void apply_edges(const Filter& f, const float* in, float* out, int64_t len,
                 bool reference_edge_sign) {
  const int n = f.n;
  const double dt = f.dt_inv;
  if (f.boundary == kPolynomial) {
    const double lead_sign =
        (!reference_edge_sign && (f.d & 1)) ? -1.0 : 1.0;
    for (int e = 0; e < n; ++e) {
      out[e] = static_cast<float>(
          f.dot_edge_rev(e, in + f.width - 1) * dt * lead_sign);
      out[len - 1 - e] =
          static_cast<float>(f.dot_edge(e, in + len - f.width) * dt);
    }
  } else {
    // stack buffer: width <= 2*kMaxHalfWindow+1; a heap allocation here
    // would tax the repeated-small-apply (embedded) pattern
    float window[2 * kMaxHalfWindow + 1];
    for (int64_t j : {int64_t(0), len - n}) {
      const int64_t hi = (j == 0) ? n : len;
      for (int64_t c = j; c < hi; ++c) {
        for (int i = 0; i < f.width; ++i)
          window[i] = boundary_sample(in, len, c - n + i, f.boundary);
        out[c] = static_cast<float>(f.dot_center(window) * dt);
      }
    }
  }
}

// Full-length apply. `reference_edge_sign` reproduces the reference's
// reversed-data leading edge (odd derivatives come out negated there).
int apply(const Filter& f, const float* in, float* out, int64_t len,
          bool reference_edge_sign) {
  if (len < f.width) return -1;
  apply_interior_range(f, in, out, f.n, len - f.n);
  apply_edges(f, in, out, len, reference_edge_sign);
  return 0;
}

// Strided apply for struct-of-arrays / interleaved embedded layouts
// (reference: savgol_apply_strided, src/savgolFilter.c:877-934). The
// reference copies a window per OUTPUT (O(len*width) strided reads); here
// the strided field is gathered ONCE into a contiguous scratch, run
// through the same SIMD `apply`, and scattered back — O(len) strided
// touches total, and bit-identical to the contiguous path by
// construction (same code operates on the gathered buffer). Sibling
// bytes in the output elements are untouched (only the addressed float
// is written), matching the reference's contract
// (test/iterative/test_savgol.c:245-294).
int apply_strided(const Filter& f, const void* in, int64_t in_stride,
                  int64_t in_offset, void* out, int64_t out_stride,
                  int64_t out_offset, int64_t count,
                  bool reference_edge_sign) {
  if (count < f.width) return -1;
  if (in_stride <= 0 || out_stride <= 0) return -1;
  std::vector<float> x(static_cast<size_t>(count));
  std::vector<float> y(static_cast<size_t>(count));
  const char* ip = static_cast<const char*>(in) + in_offset;
  for (int64_t i = 0; i < count; ++i)
    std::memcpy(&x[static_cast<size_t>(i)], ip + i * in_stride,
                sizeof(float));
  const int rc = apply(f, x.data(), y.data(), count, reference_edge_sign);
  if (rc != 0) return rc;
  char* op = static_cast<char*>(out) + out_offset;
  for (int64_t i = 0; i < count; ++i)
    std::memcpy(op + i * out_stride, &y[static_cast<size_t>(i)],
                sizeof(float));
  return 0;
}

// Threaded full-length apply: overlap-save over host threads — the same
// decomposition the TPU path uses over chips (parallel/sharded.py), but
// in shared memory no halo exchange is needed at all: each thread reads
// the (immutable) input directly and writes a disjoint output span.
// The reference's CMake exposes an OpenMP option wired to no pragmas
// (CMakeLists.txt:16, vestigial); this is that feature, implemented.
int apply_threaded(const Filter& f, const float* in, float* out,
                   int64_t len, bool reference_edge_sign, int n_threads) {
  if (len < f.width) return -1;
  const int n = f.n;
  const int64_t interior = len - 2 * n;
  if (n_threads <= 0) {
    // cached: glibc's hardware_concurrency reads sysfs per call (~us),
    // which would dominate small-N dispatches
    static const unsigned hc = std::thread::hardware_concurrency();
    n_threads = hc ? static_cast<int>(hc) : 1;
  }
  // below ~1M interior samples the spawn cost beats the speedup
  const int64_t kMinPerThread = 1 << 18;
  n_threads = static_cast<int>(std::max<int64_t>(
      1, std::min<int64_t>(n_threads, interior / kMinPerThread)));
  if (n_threads <= 1) return apply(f, in, out, len, reference_edge_sign);

  std::vector<std::thread> pool;
  pool.reserve(n_threads - 1);
  // Split points are multiples of the 64-wide SIMD block from j = n, so
  // every output falls into the same blocked-vs-remainder class as in
  // the single-thread pass — the threaded result is BIT-identical.
  const int64_t per = ((interior / n_threads) / 64) * 64;
  for (int t = 1; t < n_threads; ++t) {
    const int64_t j0 = n + t * per;
    const int64_t j1 = (t == n_threads - 1) ? (len - n) : (j0 + per);
    pool.emplace_back(apply_interior_range, std::cref(f), in, out, j0, j1);
  }
  apply_interior_range(f, in, out, n, n + per);
  for (auto& th : pool) th.join();

  // boundary regions (2n outputs) on the calling thread
  apply_edges(f, in, out, len, reference_edge_sign);
  return 0;
}

// Threaded batch apply: B independent rows partitioned across threads
// (each row runs the full single-sequence apply, edges included).
int apply_batch(const Filter& f, const float* in, float* out, int64_t batch,
                int64_t len, bool reference_edge_sign, int n_threads) {
  if (len < f.width || batch < 0) return -1;
  if (batch == 0) return 0;
  if (n_threads <= 0) {
    // cached: glibc's hardware_concurrency reads sysfs per call (~us),
    // which would dominate small-N dispatches
    static const unsigned hc = std::thread::hardware_concurrency();
    n_threads = hc ? static_cast<int>(hc) : 1;
  }
  n_threads = static_cast<int>(std::max<int64_t>(
      1, std::min<int64_t>(n_threads, batch)));
  if (n_threads == 1) {
    for (int64_t b = 0; b < batch; ++b)
      if (apply(f, in + b * len, out + b * len, len, reference_edge_sign))
        return -1;
    return 0;
  }
  std::vector<std::thread> pool;
  pool.reserve(n_threads - 1);
  auto worker = [&](int64_t b0, int64_t b1) {
    for (int64_t b = b0; b < b1; ++b)
      apply(f, in + b * len, out + b * len, len, reference_edge_sign);
  };
  const int64_t per = batch / n_threads;
  const int64_t extra = batch % n_threads;
  int64_t b0 = 0;
  std::vector<std::pair<int64_t, int64_t>> spans;
  for (int t = 0; t < n_threads; ++t) {
    const int64_t cnt = per + (t < extra ? 1 : 0);
    spans.emplace_back(b0, b0 + cnt);
    b0 += cnt;
  }
  for (size_t t = 1; t < spans.size(); ++t)
    pool.emplace_back(worker, spans[t].first, spans[t].second);
  worker(spans[0].first, spans[0].second);
  for (auto& th : pool) th.join();
  return 0;
}

int64_t apply_valid(const Filter& f, const float* in, int64_t len,
                    float* out) {
  if (len < f.width) return 0;
  const int64_t out_len = len - 2 * f.n;
  const float dtf = static_cast<float>(f.dt_inv);
  constexpr int kBlock = 64;
  const float* wf = f.center_f.data();
  auto run_block = [&](int64_t j) {
    float acc[kBlock] = {0};
    for (int k = 0; k < f.width; ++k) {
      const float wk = wf[k];
      const float* xk = in + j + k;
      for (int t = 0; t < kBlock; ++t) acc[t] += wk * xk[t];
    }
    for (int t = 0; t < kBlock; ++t) out[j + t] = acc[t] * dtf;
  };
  int64_t j = 0;
  for (; j + kBlock <= out_len; j += kBlock) run_block(j);
  if (j < out_len) {
    if (out_len >= kBlock) {
      run_block(out_len - kBlock);  // overlapping final block (see
                                    // apply_interior_range)
    } else {
      for (; j < out_len; ++j)
        out[j] = static_cast<float>(f.dot_center(in + j) * f.dt_inv);
    }
  }
  return out_len;
}

// Streaming: ring buffer of width samples, fixed latency n. The ring is
// a fixed inline array (width <= 2*kMaxHalfWindow+1 = 65), so a Stream
// is a single flat block: heap-create OR placement-init into
// caller-provided storage, both with zero per-push allocation — the
// reference's static-init story (/root/reference/src/savgol_stream.c:
// 108-120: heap create or user storage with a non-owning filter ref).
struct Stream {
  const Filter* filter;      // non-owning (matches the reference)
  bool owns_filter;
  float ring[2 * kMaxHalfWindow + 1];
  int write_pos = 0;
  uint64_t received = 0;
  uint64_t emitted = 0;
  bool reference_edge_sign = false;

  explicit Stream(const Filter* f, bool owns)
      : filter(f), owns_filter(owns) {
    std::fill(ring, ring + filter->width, 0.0f);
  }

  void reset() {
    std::fill(ring, ring + filter->width, 0.0f);
    write_pos = 0;
    received = 0;
    emitted = 0;
  }

  void write(float v) {
    ring[write_pos] = v;
    write_pos = (write_pos + 1) % filter->width;
    ++received;
  }

  bool ready() const {
    return received >= static_cast<uint64_t>(filter->width);
  }

  // Ring sample i steps from the oldest.
  float aligned(int i) const {
    return ring[(write_pos + i) % filter->width];
  }

  double center_out() const {
    double s = 0.0;
    for (int i = 0; i < filter->width; ++i)
      s += filter->center[i] * aligned(i);
    return s * filter->dt_inv;
  }
  double lead_out(int e) const {
    const double sign =
        (!reference_edge_sign && (filter->d & 1)) ? -1.0 : 1.0;
    const double* w = filter->edge.data() +
                      static_cast<size_t>(e) * filter->width;
    double s = 0.0;
    for (int i = 0; i < filter->width; ++i)
      s += w[i] * aligned(filter->width - 1 - i);
    return s * filter->dt_inv * sign;
  }
  double trail_out(int e) const {
    const double* w = filter->edge.data() +
                      static_cast<size_t>(e) * filter->width;
    double s = 0.0;
    for (int i = 0; i < filter->width; ++i) s += w[i] * aligned(i);
    return s * filter->dt_inv;
  }
};

}  // namespace sgh

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

void* sgh_create(int half_window, int poly_order, int derivative,
                 float time_step, int boundary) {
  if (half_window < 1 || half_window > sgh::kMaxHalfWindow) return nullptr;
  if (poly_order < 0 || poly_order >= 2 * half_window + 1 ||
      poly_order > sgh::kMaxPolyOrder)
    return nullptr;
  if (derivative < 0 || derivative > sgh::kMaxDerivative ||
      derivative > poly_order)
    return nullptr;
  if (!(time_step > 0.0f)) return nullptr;
  if (boundary < 0 || boundary > 3) return nullptr;  // see sgh::Boundary
  return new sgh::Filter(half_window, poly_order, derivative, time_step,
                         static_cast<sgh::Boundary>(boundary));
}

void sgh_destroy(void* h) { delete static_cast<sgh::Filter*>(h); }

int sgh_apply(const void* h, const float* in, float* out, int64_t len,
              int reference_edge_sign) {
  if (!h || !in || !out) return -1;
  return sgh::apply(*static_cast<const sgh::Filter*>(h), in, out, len,
                    reference_edge_sign != 0);
}

// Strided apply: byte strides/offsets address one float field inside
// interleaved or struct-of-arrays element layouts (reference parity:
// savgol_apply_strided). Sibling bytes of output elements are untouched.
int sgh_apply_strided(const void* h, const void* in, int64_t in_stride,
                      int64_t in_offset, void* out, int64_t out_stride,
                      int64_t out_offset, int64_t count,
                      int reference_edge_sign) {
  if (!h || !in || !out) return -1;
  return sgh::apply_strided(*static_cast<const sgh::Filter*>(h), in,
                            in_stride, in_offset, out, out_stride,
                            out_offset, count, reference_edge_sign != 0);
}

int64_t sgh_apply_valid(const void* h, const float* in, int64_t len,
                        float* out) {
  if (!h || !in || !out) return 0;
  return sgh::apply_valid(*static_cast<const sgh::Filter*>(h), in, len, out);
}

// Threaded overlap-save apply of one long sequence. n_threads <= 0 means
// hardware concurrency; short inputs silently run single-threaded.
int sgh_apply_threaded(const void* h, const float* in, float* out,
                       int64_t len, int reference_edge_sign,
                       int n_threads) {
  if (!h || !in || !out) return -1;
  return sgh::apply_threaded(*static_cast<const sgh::Filter*>(h), in, out,
                             len, reference_edge_sign != 0, n_threads);
}

// Threaded batch apply: `batch` contiguous rows of `len` samples.
int sgh_apply_batch(const void* h, const float* in, float* out,
                    int64_t batch, int64_t len, int reference_edge_sign,
                    int n_threads) {
  if (!h || !in || !out) return -1;
  return sgh::apply_batch(*static_cast<const sgh::Filter*>(h), in, out,
                          batch, len, reference_edge_sign != 0, n_threads);
}

// Copy weights out (f64): center -> width, edges -> n * width (row-major).
int sgh_weights(const void* h, double* center, double* edge) {
  if (!h) return -1;
  const auto& f = *static_cast<const sgh::Filter*>(h);
  if (center) std::memcpy(center, f.center.data(), f.width * sizeof(double));
  if (edge)
    std::memcpy(edge, f.edge.data(),
                static_cast<size_t>(f.n) * f.width * sizeof(double));
  return 0;
}

void* sgh_stream_create(const void* filter_handle) {
  if (!filter_handle) return nullptr;
  return new sgh::Stream(static_cast<const sgh::Filter*>(filter_handle),
                         false);
}

// Static/user-storage init (the reference's no-malloc path,
// src/savgol_stream.c:108-120): the caller supplies at least
// sgh_stream_sizeof() bytes aligned to sgh_stream_alignof(); the stream
// keeps a NON-owning filter ref and needs no destroy (trivially
// destructible) — just stop using the storage. Do NOT pass it to
// sgh_stream_destroy.
static_assert(std::is_trivially_destructible<sgh::Stream>::value,
              "user-storage streams must need no deinit");

int64_t sgh_stream_sizeof() { return sizeof(sgh::Stream); }

int64_t sgh_stream_alignof() { return alignof(sgh::Stream); }

void* sgh_stream_init(void* storage, const void* filter_handle) {
  if (!storage || !filter_handle) return nullptr;
  if (reinterpret_cast<uintptr_t>(storage) % alignof(sgh::Stream) != 0)
    return nullptr;
  return new (storage) sgh::Stream(
      static_cast<const sgh::Filter*>(filter_handle), false);
}

void sgh_stream_destroy(void* s) { delete static_cast<sgh::Stream*>(s); }

void sgh_stream_reset(void* s) { static_cast<sgh::Stream*>(s)->reset(); }

int sgh_stream_ready(const void* s) {
  return static_cast<const sgh::Stream*>(s)->ready() ? 1 : 0;
}

uint64_t sgh_stream_received(const void* s) {
  return static_cast<const sgh::Stream*>(s)->received;
}

uint64_t sgh_stream_emitted(const void* s) {
  return static_cast<const sgh::Stream*>(s)->emitted;
}

// Simple push: one centered output once the ring is full.
float sgh_stream_push(void* sp, float sample, int* valid) {
  auto* s = static_cast<sgh::Stream*>(sp);
  s->write(sample);
  if (!s->ready()) {
    if (valid) *valid = 0;
    return 0.0f;
  }
  if (valid) *valid = 1;
  ++s->emitted;
  return static_cast<float>(s->center_out());
}

// Push with edge handling: emits n leading + 1 center on the filling push,
// 1 center afterwards. Returns count written to out (cap max_outputs).
int sgh_stream_push_full(void* sp, float sample, float* out,
                         int max_outputs) {
  auto* s = static_cast<sgh::Stream*>(sp);
  if (!out || max_outputs <= 0) return 0;
  const bool was_filling = !s->ready();
  s->write(sample);
  if (!s->ready()) return 0;
  int count = 0;
  if (was_filling) {
    const int n = s->filter->n;
    for (int e = 0; e < n && count < max_outputs; ++e) {
      out[count++] = static_cast<float>(s->lead_out(e));
      ++s->emitted;
    }
  }
  if (count < max_outputs) {
    out[count++] = static_cast<float>(s->center_out());
    ++s->emitted;
  }
  return count;
}

// Trailing-edge flush: up to n outputs with edge index n-1-i.
int sgh_stream_flush(void* sp, float* out, int max_count) {
  auto* s = static_cast<sgh::Stream*>(sp);
  if (!out || max_count <= 0) return 0;
  if (!s->ready()) return 0;
  const int n = s->filter->n;
  const int count = max_count < n ? max_count : n;
  for (int i = 0; i < count; ++i) {
    out[i] = static_cast<float>(s->trail_out(n - 1 - i));
    ++s->emitted;
  }
  return count;
}

int sgh_stream_flush_leading(void* sp, float* out, int max_count) {
  auto* s = static_cast<sgh::Stream*>(sp);
  if (!out || max_count <= 0) return 0;
  if (!s->ready()) return 0;
  const int n = s->filter->n;
  const int count = max_count < n ? max_count : n;
  for (int i = 0; i < count; ++i) {
    out[i] = static_cast<float>(s->lead_out(i));
    ++s->emitted;
  }
  return count;
}

void sgh_stream_set_reference_edge_sign(void* sp, int flag) {
  static_cast<sgh::Stream*>(sp)->reference_edge_sign = flag != 0;
}

}  // extern "C"
