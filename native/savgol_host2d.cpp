// savgol_host2d.cpp — native 2D Savitzky-Golay for the host runtime.
//
// Weight construction mirrors savgol_tpu/ops/weights.py: build the design
// matrix over the window (monomials x^i y^j, i+j <= order, degree-major
// ordering), solve the normal equations by Cholesky in double, scale the
// selected pseudo-inverse row by dx!*dy!. Application supports VALID /
// CONSTANT / REFLECT like the reference (/root/reference/src/savgol2d.c),
// plus PERIODIC wrap (the 1D rule src/savgolFilter.c:465-467 per axis),
// implemented fresh.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace sgh2 {

constexpr int kMaxHalfWindow = 16;
constexpr int kMaxPolyOrder = 6;

enum Boundary : int32_t {
  kValid = 0,
  kConstant = 1,
  kReflect = 2,
  kPeriodic = 3,  // per-axis wrap, the 1D rule ((i mod n)+n) mod n
                  // (/root/reference/src/savgolFilter.c:465-467) applied
                  // to each axis independently
};

inline int monomial_index(int i, int j) {
  const int total = i + j;
  return total * (total + 1) / 2 + j;
}

inline double factorial(int v) {
  double r = 1.0;
  for (int i = 2; i <= v; ++i) r *= i;
  return r;
}

// Cholesky solve of (SPD) A x = b, in place on a copy.
bool spd_solve(std::vector<double> A, std::vector<double> b, int n,
               std::vector<double>* x) {
  for (int i = 0; i < n; ++i) {
    for (int j = 0; j <= i; ++j) {
      double s = A[i * n + j];
      for (int k = 0; k < j; ++k) s -= A[i * n + k] * A[j * n + k];
      if (i == j) {
        if (s <= 0.0) return false;
        A[i * n + i] = std::sqrt(s);
      } else {
        A[i * n + j] = s / A[j * n + j];
      }
    }
  }
  for (int i = 0; i < n; ++i) {           // L y = b
    double s = b[i];
    for (int j = 0; j < i; ++j) s -= A[i * n + j] * b[j];
    b[i] = s / A[i * n + i];
  }
  x->assign(n, 0.0);
  for (int i = n - 1; i >= 0; --i) {      // L^T x = y
    double s = b[i];
    for (int j = i + 1; j < n; ++j) s -= A[j * n + i] * (*x)[j];
    (*x)[i] = s / A[i * n + i];
  }
  return true;
}

struct Filter2D {
  int nx, ny, order, dx, dy;
  int width, height;
  double scale;
  std::vector<double> weights;   // height * width, row-major

  bool init() {
    width = 2 * nx + 1;
    height = 2 * ny + 1;
    const int area = width * height;
    const int terms = (order + 1) * (order + 2) / 2;
    if (area < terms) return false;
    std::vector<double> A(static_cast<size_t>(area) * terms);
    int row = 0;
    for (int yi = -ny; yi <= ny; ++yi) {
      for (int xi = -nx; xi <= nx; ++xi, ++row) {
        for (int tot = 0; tot <= order; ++tot) {
          for (int j = 0; j <= tot; ++j) {
            const int i = tot - j;
            A[static_cast<size_t>(row) * terms + monomial_index(i, j)] =
                std::pow(double(xi), i) * std::pow(double(yi), j);
          }
        }
      }
    }
    std::vector<double> ata(static_cast<size_t>(terms) * terms, 0.0);
    for (int i = 0; i < terms; ++i)
      for (int j = 0; j < terms; ++j) {
        double s = 0.0;
        for (int r = 0; r < area; ++r)
          s += A[static_cast<size_t>(r) * terms + i] *
               A[static_cast<size_t>(r) * terms + j];
        ata[static_cast<size_t>(i) * terms + j] = s;
      }
    const int k = monomial_index(dx, dy);
    std::vector<double> e(terms, 0.0);
    e[k] = 1.0;
    std::vector<double> c;
    if (!spd_solve(ata, e, terms, &c)) {
      // Singular normal matrix (coincident monomial columns, e.g.
      // half_window=1 with order 3: x^3 == x on {-1,0,1}). The FILTER can
      // still be well-defined: weights A c are invariant across the
      // solution family of a consistent system. Retry on the
      // column-NORMALIZED system with a tiny ridge (unit diagonal, so the
      // ridge is scale-free); the verification below decides whether the
      // target coefficient was actually identifiable.
      std::vector<double> norms(terms);
      for (int i = 0; i < terms; ++i)
        norms[i] = std::sqrt(ata[static_cast<size_t>(i) * terms + i]);
      std::vector<double> atan(static_cast<size_t>(terms) * terms);
      for (int i = 0; i < terms; ++i)
        for (int j = 0; j < terms; ++j)
          atan[static_cast<size_t>(i) * terms + j] =
              ata[static_cast<size_t>(i) * terms + j] / (norms[i] * norms[j]);
      for (int i = 0; i < terms; ++i)
        atan[static_cast<size_t>(i) * terms + i] += 1e-10;
      std::vector<double> en(terms, 0.0);
      en[k] = 1.0 / norms[k];
      if (!spd_solve(atan, en, terms, &c)) return false;
      for (int i = 0; i < terms; ++i) c[i] /= norms[i];
    }
    const double dscale = factorial(dx) * factorial(dy);
    weights.resize(area);
    for (int r = 0; r < area; ++r) {
      double s = 0.0;
      for (int i = 0; i < terms; ++i)
        s += A[static_cast<size_t>(r) * terms + i] * c[i];
      weights[r] = s * dscale;
    }
    // Verify the defining property A^T w == dscale * e_k (exact monomial-
    // derivative reproduction). A lucky Cholesky factorization of a
    // singular system can return garbage when the target coefficient is
    // not identifiable (observed: half_window_y=1 order 3 d/dy weights off
    // by 10x with a tiny unnormalized residual) — this check rejects those
    // regardless of how the solve got here, while exact-rational-consistent
    // solutions pass at rounding level.
    double wnorm = 0.0;
    for (int r = 0; r < area; ++r) wnorm += weights[r] * weights[r];
    wnorm = std::sqrt(wnorm);
    for (int i = 0; i < terms; ++i) {
      double dot = 0.0, anorm = 0.0;
      for (int r = 0; r < area; ++r) {
        const double a = A[static_cast<size_t>(r) * terms + i];
        dot += a * weights[r];
        anorm += a * a;
      }
      const double want = (i == k) ? dscale : 0.0;
      const double tol = 1e-7 * (std::sqrt(anorm) * wnorm + dscale);
      if (std::abs(dot - want) > tol) return false;
    }
    return true;
  }
};

inline int64_t clampi(int64_t v, int64_t lo, int64_t hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

constexpr int kBlock = 64;

// Remap an out-of-range index into [0, n) by edge-clamp (CONSTANT),
// symmetric reflection with the reference's double-reflection clamp
// (src/savgol2d.c:428-441), or periodic wrap (the 1D rule
// src/savgolFilter.c:465-467, applied per axis).
inline int64_t remap_index(int64_t i, int64_t n, Boundary b) {
  if (b == kReflect) {
    if (i < 0) i = -i - 1;
    else if (i >= n) i = 2 * n - i - 1;
  } else if (b == kPeriodic) {
    i %= n;
    if (i < 0) i += n;
    return i;
  }
  return clampi(i, 0, n - 1);
}

// Synthesize the (rows+2ny, cols+2nx) boundary-padded image (CONSTANT
// clamp, REFLECT, or PERIODIC wrap). Shared by the single-thread and
// threaded paths so their padded reductions stay bit-identical by
// construction.
void pad_boundary(const float* in, int64_t rows, int64_t cols,
                  int64_t stride, int nx, int ny, Boundary b,
                  std::vector<float>* pad) {
  const int64_t prow = rows + 2 * ny, pcol = cols + 2 * nx;
  pad->resize(static_cast<size_t>(prow) * pcol);
  for (int64_t py = 0; py < prow; ++py) {
    const float* src = in + remap_index(py - ny, rows, b) * stride;
    float* dst = pad->data() + py * pcol;
    for (int64_t px = 0; px < nx; ++px)
      dst[px] = src[remap_index(px - nx, cols, b)];
    std::memcpy(dst + nx, src, static_cast<size_t>(cols) * sizeof(float));
    for (int64_t px = nx + cols; px < pcol; ++px)
      dst[px] = src[remap_index(px - nx, cols, b)];
  }
}

void apply(const Filter2D& f, const float* in, int64_t rows, int64_t cols,
           int64_t stride, float* out, int64_t out_stride, Boundary b) {
  const int nx = f.nx, ny = f.ny;
  if (b == kValid) {
    // f32 weights + output-blocked inner loop (vectorizes across columns)
    std::vector<float> wf(f.weights.begin(), f.weights.end());
    const float sc = static_cast<float>(f.scale);
    const int64_t out_cols = cols - 2 * nx;
    auto run_block = [&](int64_t oy, int64_t ox) {
      float acc[kBlock] = {0};
      const float* wp = wf.data();
      for (int wy = 0; wy < f.height; ++wy) {
        const float* r = in + (oy + wy) * stride + ox;
        for (int wx = 0; wx < f.width; ++wx) {
          const float wk = *wp++;
          for (int t = 0; t < kBlock; ++t) acc[t] += wk * r[wx + t];
        }
      }
      float* o = out + oy * out_stride + ox;
      for (int t = 0; t < kBlock; ++t) o[t] = acc[t] * sc;
    };
    for (int64_t oy = 0; oy + 2 * ny < rows; ++oy) {
      int64_t ox = 0;
      for (; ox + kBlock <= out_cols; ox += kBlock) run_block(oy, ox);
      if (ox < out_cols) {
        if (out_cols >= kBlock) {
          // Shift the final block back so it ends exactly at out_cols.
          // The overlap rewrites identical values (per-output tap order
          // is position-independent), keeping the whole row vectorized.
          run_block(oy, out_cols - kBlock);
        } else {
          for (; ox < out_cols; ++ox) {
            double s = 0.0;
            const double* w = f.weights.data();
            for (int wy = 0; wy < f.height; ++wy) {
              const float* r = in + (oy + wy) * stride + ox;
              for (int wx = 0; wx < f.width; ++wx) s += *w++ * r[wx];
            }
            out[oy * out_stride + ox] = static_cast<float>(s * f.scale);
          }
        }
      }
    }
    return;
  }
  // Wide images: synthesize the (rows+2ny, cols+2nx) boundary-padded
  // image once and run the blocked VALID kernel over it — every output
  // pixel (border ring included) then takes the vector path instead of
  // the per-tap index-remap loop below. Gated on kBlock so narrow
  // images (and the small-image parity tests) keep the f64 scalar path.
  if (cols >= kBlock && rows > 0) {
    std::vector<float> pad;
    pad_boundary(in, rows, cols, stride, nx, ny, b, &pad);
    apply(f, pad.data(), rows + 2 * ny, cols + 2 * nx, cols + 2 * nx, out,
          out_stride, kValid);
    return;
  }
  // Full-size output: interior pixels are a plain VALID stencil — reuse the
  // blocked fast path for them; only the border ring needs per-tap index
  // remapping.
  if (rows > 2 * ny && cols > 2 * nx) {
    apply(f, in, rows, cols, stride, out + ny * out_stride + nx,
          out_stride, kValid);
  }
  for (int64_t oy = 0; oy < rows; ++oy) {
    const bool row_interior = (oy >= ny && oy < rows - ny);
    for (int64_t ox = 0; ox < cols; ++ox) {
      if (row_interior && ox == nx && cols > 2 * nx) {
        ox = cols - nx - 1;       // skip the interior span (already done)
        continue;
      }
      double s = 0.0;
      const double* w = f.weights.data();
      for (int wy = -ny; wy <= ny; ++wy) {
        for (int wx = -nx; wx <= nx; ++wx) {
          const int64_t iy = remap_index(oy + wy, rows, b);
          const int64_t ix = remap_index(ox + wx, cols, b);
          s += *w++ * in[iy * stride + ix];
        }
      }
      out[oy * out_stride + ox] = static_cast<float>(s * f.scale);
    }
  }
}

// Threaded apply: output rows are independent (input is read-only), so
// partitioning them across threads is bit-identical to the single-thread
// pass. Boundary modes pad once on the calling thread, then the threads
// each run the blocked VALID kernel on a disjoint output-row span.
// n_threads <= 0 means hardware concurrency; small images run inline.
int apply_threaded(const Filter2D& f, const float* in, int64_t rows,
                   int64_t cols, int64_t stride, float* out,
                   int64_t out_stride, Boundary b, int n_threads) {
  const int nx = f.nx, ny = f.ny;
  if (n_threads <= 0) {
    // cached: glibc's hardware_concurrency reads sysfs per call (~us)
    static const unsigned hc = std::thread::hardware_concurrency();
    n_threads = hc ? static_cast<int>(hc) : 1;
  }
  const int64_t out_rows = b == kValid ? rows - 2 * ny : rows;
  if (out_rows <= 0 || cols - (b == kValid ? 2 * nx : 0) <= 0) return -1;
  // below ~256k output pixels per thread the spawn cost beats the win
  const int64_t out_cols_n = b == kValid ? cols - 2 * nx : cols;
  const int64_t kMinPixPerThread = 1 << 18;
  n_threads = static_cast<int>(std::max<int64_t>(
      1, std::min<int64_t>(n_threads,
                           out_rows * out_cols_n / kMinPixPerThread)));
  // narrow boundary-mode images take the f64 scalar border path in the
  // single-thread engine; keep them there so threading stays
  // bit-identical
  if (b != kValid && cols < kBlock) n_threads = 1;
  if (n_threads <= 1) {
    apply(f, in, rows, cols, stride, out, out_stride, b);
    return 0;
  }
  // Reduce boundary modes to VALID over a padded image (same reduction
  // the single-thread path uses for wide images).
  std::vector<float> pad;
  const float* vin = in;
  int64_t vcols = cols, vstride = stride;
  if (b != kValid) {
    pad_boundary(in, rows, cols, stride, nx, ny, b, &pad);
    vin = pad.data();
    vcols = cols + 2 * nx;
    vstride = vcols;
  }
  // Each thread gets a contiguous span of output rows; its VALID call
  // sees the input rows that feed exactly that span.
  const int64_t per = (out_rows + n_threads - 1) / n_threads;
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) {
    const int64_t r0 = t * per;
    const int64_t r1 = std::min<int64_t>(out_rows, r0 + per);
    if (r0 >= r1) break;
    pool.emplace_back([&, r0, r1]() {
      apply(f, vin + r0 * vstride, (r1 - r0) + 2 * ny, vcols, vstride,
            out + r0 * out_stride, out_stride, kValid);
    });
  }
  for (auto& th : pool) th.join();
  return 0;
}

}  // namespace sgh2

extern "C" {

void* sgh2_create(int half_window_x, int half_window_y, int poly_order,
                  int deriv_x, int deriv_y, float delta_x, float delta_y) {
  using namespace sgh2;
  if (half_window_x < 1 || half_window_x > kMaxHalfWindow) return nullptr;
  if (half_window_y < 1 || half_window_y > kMaxHalfWindow) return nullptr;
  if (poly_order < 0 || poly_order > kMaxPolyOrder) return nullptr;
  if (deriv_x < 0 || deriv_y < 0 || deriv_x + deriv_y > poly_order)
    return nullptr;
  if (!(delta_x > 0.0f) || !(delta_y > 0.0f)) return nullptr;
  auto* f = new Filter2D{half_window_x, half_window_y, poly_order,
                         deriv_x,       deriv_y,       0,
                         0,             1.0,           {}};
  f->scale = 1.0 / (std::pow(double(delta_x), deriv_x) *
                    std::pow(double(delta_y), deriv_y));
  if (!f->init()) {
    delete f;
    return nullptr;
  }
  return f;
}

void sgh2_destroy(void* h) { delete static_cast<sgh2::Filter2D*>(h); }

int sgh2_apply(const void* h, const float* in, int64_t rows, int64_t cols,
               int64_t stride, float* out, int64_t out_stride,
               int boundary) {
  if (!h || !in || !out || rows <= 0 || cols <= 0) return -1;
  sgh2::apply(*static_cast<const sgh2::Filter2D*>(h), in, rows, cols,
              stride, out, out_stride,
              static_cast<sgh2::Boundary>(boundary));
  return 0;
}

int sgh2_apply_threaded(const void* h, const float* in, int64_t rows,
                        int64_t cols, int64_t stride, float* out,
                        int64_t out_stride, int boundary, int n_threads) {
  if (!h || !in || !out || rows <= 0 || cols <= 0) return -1;
  return sgh2::apply_threaded(*static_cast<const sgh2::Filter2D*>(h), in,
                              rows, cols, stride, out, out_stride,
                              static_cast<sgh2::Boundary>(boundary),
                              n_threads);
}

int sgh2_weights(const void* h, double* out) {
  if (!h || !out) return -1;
  const auto& f = *static_cast<const sgh2::Filter2D*>(h);
  std::memcpy(out, f.weights.data(), f.weights.size() * sizeof(double));
  return 0;
}

namespace {

// One derivative stencil built + applied over the shared machinery.
// NULL out skips that component (the reference's contract,
// /root/reference/src/savgol2d.c:468,483). n_threads < 0 = single
// thread, 0 = hardware concurrency.
int run_deriv(int hx, int hy, int order, int dx, int dy, float delta_x,
              float delta_y, const float* in, int64_t rows, int64_t cols,
              int64_t stride, float* out, int64_t out_stride, int boundary,
              int n_threads) {
  if (!out) return 0;
  void* f = sgh2_create(hx, hy, order, dx, dy, delta_x, delta_y);
  if (!f) return -1;
  int rc;
  if (n_threads < 0)
    rc = sgh2_apply(f, in, rows, cols, stride, out, out_stride, boundary);
  else
    rc = sgh2_apply_threaded(f, in, rows, cols, stride, out, out_stride,
                             boundary, n_threads);
  sgh2_destroy(f);
  return rc;
}

}  // namespace

// Convenience derivative fields, mirroring the reference API
// (/root/reference/src/savgol2d.c:462-499 gradient, :501-558 hessian,
// :560-618 laplacian) over this engine's blocked/threaded applies.
// VALID boundary emits compact (rows-2hy, cols-2hx) outputs like
// sgh2_apply. Returns 0 on success.

int sgh2_gradient(int hx, int hy, int order, float delta_x, float delta_y,
                  const float* in, int64_t rows, int64_t cols,
                  int64_t stride, float* grad_x, float* grad_y,
                  int64_t out_stride, int boundary, int n_threads) {
  if (!in || rows <= 0 || cols <= 0) return -1;
  int rc = run_deriv(hx, hy, order, 1, 0, delta_x, delta_y, in, rows, cols,
                     stride, grad_x, out_stride, boundary, n_threads);
  if (rc != 0) return rc;
  return run_deriv(hx, hy, order, 0, 1, delta_x, delta_y, in, rows, cols,
                   stride, grad_y, out_stride, boundary, n_threads);
}

int sgh2_hessian(int hx, int hy, int order, float delta_x, float delta_y,
                 const float* in, int64_t rows, int64_t cols,
                 int64_t stride, float* h_xx, float* h_xy, float* h_yy,
                 int64_t out_stride, int boundary, int n_threads) {
  if (!in || rows <= 0 || cols <= 0) return -1;
  int rc = run_deriv(hx, hy, order, 2, 0, delta_x, delta_y, in, rows, cols,
                     stride, h_xx, out_stride, boundary, n_threads);
  if (rc != 0) return rc;
  rc = run_deriv(hx, hy, order, 1, 1, delta_x, delta_y, in, rows, cols,
                 stride, h_xy, out_stride, boundary, n_threads);
  if (rc != 0) return rc;
  return run_deriv(hx, hy, order, 0, 2, delta_x, delta_y, in, rows, cols,
                   stride, h_yy, out_stride, boundary, n_threads);
}

int sgh2_laplacian(int hx, int hy, int order, float delta_x, float delta_y,
                   const float* in, int64_t rows, int64_t cols,
                   int64_t stride, float* out, int64_t out_stride,
                   int boundary, int n_threads) {
  if (!in || !out || rows <= 0 || cols <= 0) return -1;
  const int64_t out_rows = boundary == sgh2::kValid ? rows - 2 * hy : rows;
  const int64_t out_cols = boundary == sgh2::kValid ? cols - 2 * hx : cols;
  if (out_rows <= 0 || out_cols <= 0) return -1;
  int rc = run_deriv(hx, hy, order, 2, 0, delta_x, delta_y, in, rows, cols,
                     stride, out, out_stride, boundary, n_threads);
  if (rc != 0) return rc;
  // d2/dy2 into a temp, then add — the reference's temp-buffer scheme
  // (src/savgol2d.c:585-607)
  std::vector<float> tmp(static_cast<size_t>(out_rows) * out_cols);
  rc = run_deriv(hx, hy, order, 0, 2, delta_x, delta_y, in, rows, cols,
                 stride, tmp.data(), out_cols, boundary, n_threads);
  if (rc != 0) return rc;
  for (int64_t r = 0; r < out_rows; ++r)
    for (int64_t c = 0; c < out_cols; ++c)
      out[r * out_stride + c] += tmp[static_cast<size_t>(r) * out_cols + c];
  return 0;
}

}  // extern "C"
