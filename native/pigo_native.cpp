// pigo_tpu native engine: C++ host runtime for the PICO detection stack.
//
// This is the framework's native-boundary component — the counterpart of the
// reference's cgo c-shared bridges (/root/reference/examples/*/[a-z]*.go,
// built with `go build -buildmode=c-shared`) and its unsafe byte-level
// cascade deserialization (/root/reference/core/pigo.go:51-110,
// /root/reference/core/puploc.go:38-103). It provides:
//
//   * binary-exact cascade parsers for the three frozen model formats,
//   * a scalar/threaded CPU implementation of the full PICO semantics
//     (face cascade, rotated path, IoU clustering, pupil regression walks,
//     perturbation ensemble + median vote, landmark anchors), used as the
//     host fallback engine and as a second independent parity oracle,
//   * fast host-side ops for the TPU pipeline (grayscale conversion,
//     detection clustering),
//   * a C ABI consumed from Python via ctypes (pigo_tpu/native/__init__.py)
//     and from any C program, mirroring the reference's FindFaces export
//     shape (count header + flattened rows).
//
// Semantics are an independent re-implementation of the behaviors documented
// in SURVEY.md section 2.1 and validated against the NumPy oracle
// (pigo_tpu/oracle/*.py); float32 accumulation orders match the reference
// exactly (compile with -ffp-contract=off: no FMA contraction).
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC -ffp-contract=off).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Model containers (SoA, same layouts as pigo_tpu/cascade/format.py)
// ---------------------------------------------------------------------------

struct FaceForest {
  int depth = 0;
  int num_trees = 0;
  int leaves = 0;                // 2^depth; also node-slot count (slot 0 pad)
  std::vector<int8_t> codes;     // [T, L, 4], node 0 zeroed
  std::vector<float> preds;      // [T, L]
  std::vector<float> thresh;     // [T]
};

struct PupilForest {
  int stages = 0;
  float scale_mult = 0.f;
  int trees = 0;
  int depth = 0;
  int leaves = 0;                // 2^depth
  std::vector<int8_t> codes;     // [S, T, L, 4]; slots [0, L-1) real
  std::vector<float> preds;      // [S, T, L, 2]
};

struct Detection {
  int row, col, scale;
  float q;
};

uint32_t read_u32le(const uint8_t* p) {
  return uint32_t(p[0]) | (uint32_t(p[1]) << 8) | (uint32_t(p[2]) << 16) |
         (uint32_t(p[3]) << 24);
}

float read_f32le(const uint8_t* p) {
  uint32_t u = read_u32le(p);
  float f;
  std::memcpy(&f, &u, 4);
  return f;
}

// Face cascade binary: 8-byte header skip, u32 depth, u32 tree count, then
// per tree 4*2^d-4 int8 codes + 2^d f32 leaf preds + 1 f32 threshold
// (reference layout: core/pigo.go:51-110).
bool parse_face(const uint8_t* data, int64_t len, FaceForest* out,
                std::string* err) {
  if (len < 16) {
    *err = "face cascade truncated: header";
    return false;
  }
  int depth = int(read_u32le(data + 8));
  int num_trees = int(read_u32le(data + 12));
  if (depth < 1 || depth > 16 || num_trees < 1 || num_trees > 1000000) {
    *err = "invalid face cascade header: depth=" + std::to_string(depth) +
           " trees=" + std::to_string(num_trees);
    return false;
  }
  int64_t leaves = int64_t(1) << depth;
  int64_t code_bytes = 4 * leaves - 4;
  int64_t rec_bytes = code_bytes + 4 * leaves + 4;
  if (len < 16 + num_trees * rec_bytes) {
    *err = "face cascade truncated: need " +
           std::to_string(16 + num_trees * rec_bytes) + " bytes";
    return false;
  }
  out->depth = depth;
  out->num_trees = num_trees;
  out->leaves = int(leaves);
  out->codes.assign(size_t(num_trees) * leaves * 4, 0);
  out->preds.resize(size_t(num_trees) * leaves);
  out->thresh.resize(num_trees);
  const uint8_t* p = data + 16;
  for (int t = 0; t < num_trees; ++t) {
    // node slot 0 stays zero; slots [1, L) hold the packed codes
    std::memcpy(&out->codes[(size_t(t) * leaves + 1) * 4], p, code_bytes);
    p += code_bytes;
    for (int64_t l = 0; l < leaves; ++l, p += 4)
      out->preds[size_t(t) * leaves + l] = read_f32le(p);
    out->thresh[t] = read_f32le(p);
    p += 4;
  }
  return true;
}

// Pupil/landmark binary: u32 stages, f32 scale_mult, u32 trees, u32 depth,
// then per (stage, tree) 4*2^d-4 int8 codes + 2^d (dr, dc) f32 pairs
// (reference layout: core/puploc.go:38-103).
bool parse_pupil(const uint8_t* data, int64_t len, PupilForest* out,
                 std::string* err) {
  if (len < 16) {
    *err = "pupil cascade truncated: header";
    return false;
  }
  int stages = int(read_u32le(data));
  float scale_mult = read_f32le(data + 4);
  int trees = int(read_u32le(data + 8));
  int depth = int(read_u32le(data + 12));
  if (stages < 1 || stages > 64 || trees < 1 || trees > 4096 || depth < 1 ||
      depth > 16) {
    *err = "invalid pupil cascade header: stages=" + std::to_string(stages) +
           " trees=" + std::to_string(trees) +
           " depth=" + std::to_string(depth);
    return false;
  }
  int64_t leaves = int64_t(1) << depth;
  int64_t code_bytes = 4 * leaves - 4;
  int64_t rec_bytes = code_bytes + 8 * leaves;
  int64_t total = int64_t(stages) * trees;
  if (len < 16 + total * rec_bytes) {
    *err = "pupil cascade truncated: need " +
           std::to_string(16 + total * rec_bytes) + " bytes";
    return false;
  }
  out->stages = stages;
  out->scale_mult = scale_mult;
  out->trees = trees;
  out->depth = depth;
  out->leaves = int(leaves);
  out->codes.assign(size_t(total) * leaves * 4, 0);
  out->preds.resize(size_t(total) * leaves * 2);
  const uint8_t* p = data + 16;
  for (int64_t k = 0; k < total; ++k) {
    // node slots [0, L-1) are real; slot L-1 stays zero (uniform indexing pad)
    std::memcpy(&out->codes[size_t(k) * leaves * 4], p, code_bytes);
    p += code_bytes;
    for (int64_t l = 0; l < 2 * leaves; ++l, p += 4)
      out->preds[size_t(k) * leaves * 2 + l] = read_f32le(p);
  }
  return true;
}

// ---------------------------------------------------------------------------
// Face cascade classifiers (semantics: SURVEY.md 2.1, core/pigo.go:113-191)
// ---------------------------------------------------------------------------

// Quantized 256-scaled cos/sin, indexed by int(32*angle), angle in [0, 1]
// as a fraction of 2*pi (reference core/pigo.go:156-157).
const int kQCos[33] = {256,  251,  236,  212,  181,  142,  97,   49,  0,
                       -49,  -97,  -142, -181, -212, -236, -251, -256, -251,
                       -236, -212, -181, -142, -97,  -49,  0,    49,  97,
                       142,  181,  212,  236,  251,  256};
const int kQSin[33] = {0,    49,   97,   142,  181,  212,  236,  251, 256,
                       251,  236,  212,  181,  142,  97,   49,   0,   -49,
                       -97,  -142, -181, -212, -236, -251, -256, -251, -236,
                       -212, -181, -142, -97,  -49,  0};

// Upright window classifier: depth-d walk per tree with 8.8 fixed-point
// window math, bintest px1 <= px2 -> right child, strict f32 accumulation,
// soft-cascade early exit, final score = sum - last threshold.
float classify_region(const FaceForest& f, int r, int c, int s,
                      const uint8_t* pix, int dim) {
  const int64_t r256 = int64_t(r) * 256;
  const int64_t c256 = int64_t(c) * 256;
  const int L = f.leaves;
  float out = 0.f;
  for (int t = 0; t < f.num_trees; ++t) {
    const int8_t* codes = &f.codes[size_t(t) * L * 4];
    int idx = 1;
    for (int d = 0; d < f.depth; ++d) {
      const int8_t* n = codes + 4 * idx;
      int64_t x1 = ((r256 + int64_t(n[0]) * s) >> 8) * dim +
                   ((c256 + int64_t(n[1]) * s) >> 8);
      int64_t x2 = ((r256 + int64_t(n[2]) * s) >> 8) * dim +
                   ((c256 + int64_t(n[3]) * s) >> 8);
      idx = 2 * idx + (pix[x1] <= pix[x2] ? 1 : 0);
    }
    out += f.preds[size_t(t) * L + (idx - L)];
    if (out <= f.thresh[t]) return -1.0f;
  }
  return out - f.thresh[f.num_trees - 1];
}

// Rotated classifier: 16.16 fixed point with the quantized tables; preserves
// the reference quirks (both axes clamped with nrows-1; max(0,.) before the
// >>16 shift; abs() after) — see core/pigo.go:150-191.
float classify_rotated_region(const FaceForest& f, int r, int c, int s,
                              double a, int nrows, const uint8_t* pix,
                              int dim) {
  const int ti = int(32.0 * a);
  const int64_t qsin = int64_t(s) * kQSin[ti];
  const int64_t qcos = int64_t(s) * kQCos[ti];
  const int64_t r65536 = int64_t(r) * 65536;
  const int64_t c65536 = int64_t(c) * 65536;
  const int64_t hi = nrows - 1;
  const int L = f.leaves;
  auto rot = [&](int64_t base_r, int64_t base_c, int64_t cr,
                 int64_t cc) -> int64_t {
    int64_t rr = std::abs(
        std::min(hi, std::max(int64_t(0), base_r + qcos * cr - qsin * cc) >> 16));
    int64_t col = std::abs(
        std::min(hi, std::max(int64_t(0), base_c + qsin * cr + qcos * cc) >> 16));
    return rr * dim + col;
  };
  float out = 0.f;
  for (int t = 0; t < f.num_trees; ++t) {
    const int8_t* codes = &f.codes[size_t(t) * L * 4];
    int idx = 1;
    for (int d = 0; d < f.depth; ++d) {
      const int8_t* n = codes + 4 * idx;
      int64_t x1 = rot(r65536, c65536, n[0], n[1]);
      int64_t x2 = rot(r65536, c65536, n[2], n[3]);
      idx = 2 * idx + (pix[x1] <= pix[x2] ? 1 : 0);
    }
    out += f.preds[size_t(t) * L + (idx - L)];
    if (out <= f.thresh[t]) return -1.0f;
  }
  return out - f.thresh[f.num_trees - 1];
}

int env_threads() {
  const char* v = std::getenv("PIGO_NATIVE_THREADS");
  if (v != nullptr) {
    int n = std::atoi(v);
    if (n > 0) return n;
  }
  unsigned hc = std::thread::hardware_concurrency();
  return hc == 0 ? 1 : int(std::min(hc, 16u));
}

// Multi-scale sliding-window driver (reference loop bounds core/pigo.go:
// 212-258: step = max(shift*scale, 1), offset = scale/2+1, scale update
// scale += max(2, scale*scale_factor - scale), angle clamped to <= 1).
// Scan order (scale-major, then row, then col) is preserved; rows of a scale
// are split across a thread pool.
std::vector<Detection> run_cascade(const FaceForest& f, const uint8_t* pix,
                                   int rows, int cols, int dim, int min_size,
                                   int max_size, double shift, double scale_f,
                                   double angle) {
  std::vector<Detection> dets;
  if (angle > 1.0) angle = 1.0;
  const int nthreads = env_threads();
  for (int scale = min_size; scale <= max_size;
       scale += std::max(2, int(double(scale) * scale_f) - scale)) {
    int step = std::max(int(shift * scale), 1);
    int offset = (scale >> 1) + 1;
    int nrow = (rows - 2 * offset) / step + 1;
    if (nrow < 1 || offset > cols - offset) {
      if (rows - offset < offset) continue;
    }
    std::vector<int> row_vals;
    for (int r = offset; r <= rows - offset; r += step) row_vals.push_back(r);
    if (row_vals.empty()) continue;
    std::vector<std::vector<Detection>> per_row(row_vals.size());
    std::atomic<size_t> next{0};
    auto work = [&]() {
      for (;;) {
        size_t i = next.fetch_add(1);
        if (i >= row_vals.size()) break;
        int r = row_vals[i];
        auto& local = per_row[i];
        for (int c = offset; c <= cols - offset; c += step) {
          float q = (angle > 0.0)
                        ? classify_rotated_region(f, r, c, scale, angle, rows,
                                                  pix, dim)
                        : classify_region(f, r, c, scale, pix, dim);
          if (q > 0.f) local.push_back({r, c, scale, q});
        }
      }
    };
    int nt = std::min<int>(nthreads, int(row_vals.size()));
    if (nt <= 1) {
      work();
    } else {
      std::vector<std::thread> pool;
      pool.reserve(nt);
      for (int i = 0; i < nt; ++i) pool.emplace_back(work);
      for (auto& th : pool) th.join();
    }
    for (auto& local : per_row)
      dets.insert(dets.end(), local.begin(), local.end());
  }
  return dets;
}

// ---------------------------------------------------------------------------
// IoU clustering (reference core/pigo.go:262-308; see oracle/cluster.py)
// ---------------------------------------------------------------------------

// Sort ascending by q (stable), then for each unvisited detection union every
// detection with IoU > threshold into an averaged cluster: integer-truncated
// mean (row, col, scale), f32-summed q. IoU treats detections as square boxes
// with union s1^2 + s2^2 - inter.
std::vector<Detection> cluster_detections(std::vector<Detection> d,
                                          double iou_threshold) {
  const size_t n = d.size();
  std::stable_sort(d.begin(), d.end(),
                   [](const Detection& a, const Detection& b) {
                     return a.q < b.q;
                   });
  std::vector<bool> assigned(n, false);
  std::vector<Detection> clusters;
  for (size_t i = 0; i < n; ++i) {
    if (assigned[i]) continue;
    int64_t sr = 0, sc = 0, ss = 0;
    int64_t cnt = 0;
    float sq = 0.f;
    for (size_t j = 0; j < n; ++j) {
      double s1 = d[i].scale, s2 = d[j].scale;
      double over_row = std::max(
          0.0, std::min(d[i].row + s1 / 2, d[j].row + s2 / 2) -
                   std::max(d[i].row - s1 / 2, d[j].row - s2 / 2));
      double over_col = std::max(
          0.0, std::min(d[i].col + s1 / 2, d[j].col + s2 / 2) -
                   std::max(d[i].col - s1 / 2, d[j].col - s2 / 2));
      double inter = over_row * over_col;
      double iou = inter / (s1 * s1 + s2 * s2 - inter);
      if (iou > iou_threshold) {
        assigned[j] = true;
        sr += d[j].row;
        sc += d[j].col;
        ss += d[j].scale;
        sq += d[j].q;  // f32 accumulation in ascending-q order
        ++cnt;
      }
    }
    if (cnt > 0)
      clusters.push_back(
          {int(sr / cnt), int(sc / cnt), int(ss / cnt), sq});
  }
  return clusters;
}

// ---------------------------------------------------------------------------
// Pupil / landmark regression walks (core/puploc.go:106-284, flploc.go:36-56)
// ---------------------------------------------------------------------------

// Go math.Round semantics: round half away from zero.
int64_t round_away(double x) {
  return int64_t(x >= 0 ? std::floor(x + 0.5) : std::ceil(x - 0.5));
}

// Upright regression walk. Per stage: sum (dr, dc) over all trees (bintest
// polarity p1 > p2 -> right here), then r += dr*s, c += dc*s, s *= mult, all
// in f32. flipV negates column codes and dc (mirror trick for right-side
// landmarks). Per-axis clamps: rows by nrows-1, cols by ncols-1.
void pupil_walk(const PupilForest& f, float* r, float* c, float* s, int nrows,
                int ncols, const uint8_t* pix, int dim, bool flip_v) {
  const int L = f.leaves;
  const int col_sign = flip_v ? -1 : 1;
  for (int i = 0; i < f.stages; ++i) {
    int64_t ri = 256 * int64_t(*r);  // float->int truncation toward zero
    int64_t ci = 256 * int64_t(*c);
    int64_t si = round_away(double(*s));
    float dr = 0.f, dc = 0.f;
    for (int j = 0; j < f.trees; ++j) {
      const size_t base = (size_t(i) * f.trees + j) * L;
      const int8_t* codes = &f.codes[base * 4];
      int64_t idx = 0;
      for (int d = 0; d < f.depth; ++d) {
        const int8_t* n = codes + 4 * idx;
        int64_t r1 = std::min<int64_t>(
            nrows - 1, std::max<int64_t>(0, (ri + int64_t(n[0]) * si) >> 8));
        int64_t c1 = std::min<int64_t>(
            ncols - 1,
            std::max<int64_t>(0, (ci + col_sign * int64_t(n[1]) * si) >> 8));
        int64_t r2 = std::min<int64_t>(
            nrows - 1, std::max<int64_t>(0, (ri + int64_t(n[2]) * si) >> 8));
        int64_t c2 = std::min<int64_t>(
            ncols - 1,
            std::max<int64_t>(0, (ci + col_sign * int64_t(n[3]) * si) >> 8));
        idx = 2 * idx + 1 + (pix[r1 * dim + c1] > pix[r2 * dim + c2] ? 1 : 0);
      }
      int64_t leaf = idx - (L - 1);
      dr += f.preds[(base + leaf) * 2 + 0];
      dc += float(col_sign) * f.preds[(base + leaf) * 2 + 1];
    }
    *r += dr * *s;
    *c += dc * *s;
    *s *= f.scale_mult;
  }
}

// Rotated regression walk. NOTE the bintest polarity here is px1 <= px2 ->
// right — the opposite of the upright pupil walk; this internal inconsistency
// exists in the reference (core/puploc.go:193-199) and is preserved.
void pupil_rotated_walk(const PupilForest& f, float* r, float* c, float* s,
                        double angle, int nrows, int ncols, const uint8_t* pix,
                        int dim, bool flip_v) {
  const int L = f.leaves;
  const int col_sign = flip_v ? -1 : 1;
  const int ti = int(32.0 * angle);
  for (int i = 0; i < f.stages; ++i) {
    int64_t qsin = int64_t(*s * float(kQSin[ti]));  // f32 product, truncated
    int64_t qcos = int64_t(*s * float(kQCos[ti]));
    int64_t ri = 65536 * int64_t(*r);
    int64_t ci = 65536 * int64_t(*c);
    float dr = 0.f, dc = 0.f;
    for (int j = 0; j < f.trees; ++j) {
      const size_t base = (size_t(i) * f.trees + j) * L;
      const int8_t* codes = &f.codes[base * 4];
      int64_t idx = 0;
      for (int d = 0; d < f.depth; ++d) {
        const int8_t* n = codes + 4 * idx;
        int64_t row1 = n[0], row2 = n[2];
        int64_t col1 = col_sign * int64_t(n[1]);
        int64_t col2 = col_sign * int64_t(n[3]);
        int64_t r1 = std::min<int64_t>(
            nrows - 1,
            std::max<int64_t>(0, ri + qcos * row1 - qsin * col1) >> 16);
        int64_t c1 = std::min<int64_t>(
            ncols - 1,
            std::max<int64_t>(0, ci + qsin * row1 + qcos * col1) >> 16);
        int64_t r2 = std::min<int64_t>(
            nrows - 1,
            std::max<int64_t>(0, ri + qcos * row2 - qsin * col2) >> 16);
        int64_t c2 = std::min<int64_t>(
            ncols - 1,
            std::max<int64_t>(0, ci + qsin * row2 + qcos * col2) >> 16);
        idx =
            2 * idx + 1 + (pix[r1 * dim + c1] <= pix[r2 * dim + c2] ? 1 : 0);
      }
      int64_t leaf = idx - (L - 1);
      dr += f.preds[(base + leaf) * 2 + 0];
      dc += float(col_sign) * f.preds[(base + leaf) * 2 + 1];
    }
    *r += dr * *s;
    *c += dc * *s;
    *s *= f.scale_mult;
  }
}

// Perturbation ensemble + per-axis median vote (core/puploc.go:239-277):
// run the walk from each jittered start, sort each axis, take element
// round(P/2) (clamped to P-1).
void run_detector(const PupilForest& f, const float* starts, int64_t p,
                  const uint8_t* pix, int nrows, int ncols, int dim,
                  double angle, bool flip_v, double* out3) {
  std::vector<float> rs(p), cs(p), ss(p);
  if (angle > 1.0) angle = 1.0;
  for (int64_t i = 0; i < p; ++i) {
    float r = starts[3 * i], c = starts[3 * i + 1], s = starts[3 * i + 2];
    if (angle > 0.0)
      pupil_rotated_walk(f, &r, &c, &s, angle, nrows, ncols, pix, dim, flip_v);
    else
      pupil_walk(f, &r, &c, &s, nrows, ncols, pix, dim, flip_v);
    rs[i] = r;
    cs[i] = c;
    ss[i] = s;
  }
  std::sort(rs.begin(), rs.end());
  std::sort(cs.begin(), cs.end());
  std::sort(ss.begin(), ss.end());
  int64_t mid = std::min<int64_t>(round_away(double(p) / 2.0), p - 1);
  out3[0] = double(int64_t(rs[mid]));  // reference returns int row/col
  out3[1] = double(int64_t(cs[mid]));
  out3[2] = double(ss[mid]);
}

// splitmix64: deterministic counter-based PRNG for the perturbation jitter
// (replaces the reference's global math/rand, which is nondeterministic).
uint64_t splitmix64(uint64_t* state) {
  uint64_t z = (*state += 0x9E3779B97F4A7C15ull);
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
  return z ^ (z >> 31);
}

float uniform01(uint64_t* state) {
  return float((splitmix64(state) >> 40) * (1.0 / 16777216.0));
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

// ---- face cascade ----------------------------------------------------------

// Parse a face cascade binary. Returns an opaque handle, or null (with a
// message in err) on malformed bytes.
void* pigo_face_new(const uint8_t* data, int64_t len, char* err,
                    int64_t err_cap) {
  auto* f = new FaceForest();
  std::string msg;
  if (!parse_face(data, len, f, &msg)) {
    delete f;
    if (err != nullptr && err_cap > 0)
      std::snprintf(err, size_t(err_cap), "%s", msg.c_str());
    return nullptr;
  }
  return f;
}

void pigo_face_free(void* h) { delete static_cast<FaceForest*>(h); }

int pigo_face_depth(void* h) { return static_cast<FaceForest*>(h)->depth; }
int pigo_face_trees(void* h) { return static_cast<FaceForest*>(h)->num_trees; }

// Score one window (upright when angle <= 0, rotated otherwise).
float pigo_classify_region(void* h, int row, int col, int scale,
                           const uint8_t* pixels, int nrows, int dim,
                           double angle) {
  const auto& f = *static_cast<FaceForest*>(h);
  if (angle > 0.0)
    return classify_rotated_region(f, row, col, scale,
                                   angle > 1.0 ? 1.0 : angle, nrows, pixels,
                                   dim);
  return classify_region(f, row, col, scale, pixels, dim);
}

// Full multi-scale pass. Writes up to cap detections as (row, col, scale, q)
// doubles into out; returns the total number found (callers grow the buffer
// and retry when the return value exceeds cap).
int64_t pigo_face_run(void* h, const uint8_t* pixels, int rows, int cols,
                      int dim, int min_size, int max_size, double shift,
                      double scale_f, double angle, double* out, int64_t cap) {
  const auto& f = *static_cast<FaceForest*>(h);
  auto dets =
      run_cascade(f, pixels, rows, cols, dim, min_size, max_size, shift,
                  scale_f, angle);
  int64_t n = int64_t(dets.size());
  int64_t m = std::min(n, cap);
  for (int64_t i = 0; i < m; ++i) {
    out[4 * i + 0] = dets[i].row;
    out[4 * i + 1] = dets[i].col;
    out[4 * i + 2] = dets[i].scale;
    out[4 * i + 3] = dets[i].q;
  }
  return n;
}

// Scan an explicit list of pyramid scales (same loop bounds as
// pigo_face_run). Used by the TPU pipeline to route sparse tail scales
// (few windows, poor tile utilization on the device) to the host engine,
// overlapped with the device computation.
int64_t pigo_face_run_scales(void* h, const uint8_t* pixels, int rows,
                             int cols, int dim, const int32_t* scales,
                             int64_t n_scales, double shift, double angle,
                             double* out, int64_t cap) {
  const auto& f = *static_cast<FaceForest*>(h);
  if (angle > 1.0) angle = 1.0;
  std::vector<Detection> dets;
  const int nthreads = env_threads();
  for (int64_t si = 0; si < n_scales; ++si) {
    int scale = scales[si];
    int step = std::max(int(shift * scale), 1);
    int offset = (scale >> 1) + 1;
    std::vector<int> row_vals;
    for (int r = offset; r <= rows - offset; r += step) row_vals.push_back(r);
    if (row_vals.empty()) continue;
    std::vector<std::vector<Detection>> per_row(row_vals.size());
    std::atomic<size_t> next{0};
    auto work = [&]() {
      for (;;) {
        size_t i = next.fetch_add(1);
        if (i >= row_vals.size()) break;
        int r = row_vals[i];
        for (int c = offset; c <= cols - offset; c += step) {
          float q = (angle > 0.0)
                        ? classify_rotated_region(f, r, c, scale, angle,
                                                  rows, pixels, dim)
                        : classify_region(f, r, c, scale, pixels, dim);
          if (q > 0.f) per_row[i].push_back({r, c, scale, q});
        }
      }
    };
    int nt = std::min<int>(nthreads, int(row_vals.size()));
    if (nt <= 1) {
      work();
    } else {
      std::vector<std::thread> pool;
      pool.reserve(nt);
      for (int i = 0; i < nt; ++i) pool.emplace_back(work);
      for (auto& th : pool) th.join();
    }
    for (auto& local : per_row)
      dets.insert(dets.end(), local.begin(), local.end());
  }
  int64_t n = int64_t(dets.size());
  int64_t m = std::min(n, cap);
  for (int64_t i = 0; i < m; ++i) {
    out[4 * i + 0] = dets[i].row;
    out[4 * i + 1] = dets[i].col;
    out[4 * i + 2] = dets[i].scale;
    out[4 * i + 3] = dets[i].q;
  }
  return n;
}

// Exact scores for an explicit window list (int32 [n, 3] = row, col,
// scale). Used to finish the few windows the device's tree-prefix pass
// left undecided (ops/face_pallas.PREFIX_TREES survivors).
void pigo_classify_batch(void* h, const uint8_t* pixels, int nrows, int dim,
                         const int32_t* windows, int64_t n, double angle,
                         float* out) {
  const auto& f = *static_cast<FaceForest*>(h);
  if (angle > 1.0) angle = 1.0;
  for (int64_t i = 0; i < n; ++i) {
    const int32_t* w = windows + 3 * i;
    out[i] = (angle > 0.0)
                 ? classify_rotated_region(f, w[0], w[1], w[2], angle, nrows,
                                           pixels, dim)
                 : classify_region(f, w[0], w[1], w[2], pixels, dim);
  }
}

// Border-band scan for the rotated dense plan: for each band row
// (scale, r_lo, r_hi, c_lo, c_hi), scan the scale's full reference grid
// EXCLUDING the inclusive interior rectangle [r_lo..r_hi]x[c_lo..c_hi] of
// window centers (those windows never hit the rotated clamps and run on
// the device). Same loop bounds as pigo_face_run (core/pigo.go:226-250).
int64_t pigo_face_run_band(void* h, const uint8_t* pixels, int rows,
                           int cols, int dim, const int32_t* bands,
                           int64_t n_bands, double shift, double angle,
                           double* out, int64_t cap) {
  const auto& f = *static_cast<FaceForest*>(h);
  if (angle > 1.0) angle = 1.0;
  std::vector<Detection> dets;
  for (int64_t bi = 0; bi < n_bands; ++bi) {
    const int32_t* b = bands + 5 * bi;
    int scale = b[0], r_lo = b[1], r_hi = b[2], c_lo = b[3], c_hi = b[4];
    int step = std::max(int(shift * scale), 1);
    int offset = (scale >> 1) + 1;
    for (int r = offset; r <= rows - offset; r += step) {
      bool r_in = r >= r_lo && r <= r_hi;
      for (int c = offset; c <= cols - offset; c += step) {
        if (r_in && c >= c_lo && c <= c_hi) continue;  // device's interior
        float q = (angle > 0.0)
                      ? classify_rotated_region(f, r, c, scale, angle, rows,
                                                pixels, dim)
                      : classify_region(f, r, c, scale, pixels, dim);
        if (q > 0.f) dets.push_back({r, c, scale, q});
      }
    }
  }
  int64_t n = int64_t(dets.size());
  int64_t m = std::min(n, cap);
  for (int64_t i = 0; i < m; ++i) {
    out[4 * i + 0] = dets[i].row;
    out[4 * i + 1] = dets[i].col;
    out[4 * i + 2] = dets[i].scale;
    out[4 * i + 3] = dets[i].q;
  }
  return n;
}

// IoU clustering over (row, col, scale, q) rows. Returns cluster count,
// writing up to cap clusters into out.
int64_t pigo_cluster(const double* dets, int64_t n, double iou_threshold,
                     double* out, int64_t cap) {
  std::vector<Detection> d(n);
  for (int64_t i = 0; i < n; ++i)
    d[size_t(i)] = {int(dets[4 * i]), int(dets[4 * i + 1]),
                    int(dets[4 * i + 2]), float(dets[4 * i + 3])};
  auto clusters = cluster_detections(std::move(d), iou_threshold);
  int64_t m = std::min<int64_t>(int64_t(clusters.size()), cap);
  for (int64_t i = 0; i < m; ++i) {
    out[4 * i + 0] = clusters[i].row;
    out[4 * i + 1] = clusters[i].col;
    out[4 * i + 2] = clusters[i].scale;
    out[4 * i + 3] = clusters[i].q;
  }
  return int64_t(clusters.size());
}

// One-call detect pipeline with the cgo-bridge result shape
// (reference examples/facedet/pigo.go:23-98): out[0] = count N, then N rows
// of (row, col, scale) int64. q-filtered at q_thresh after clustering.
int64_t pigo_find_faces(void* h, const uint8_t* pixels, int rows, int cols,
                        int min_size, int max_size, double shift,
                        double scale_f, double angle, double iou_threshold,
                        double q_thresh, int64_t* out, int64_t cap) {
  const auto& f = *static_cast<FaceForest*>(h);
  auto dets = run_cascade(f, pixels, rows, cols, cols, min_size, max_size,
                          shift, scale_f, angle);
  auto clusters = cluster_detections(std::move(dets), iou_threshold);
  int64_t n = 0;
  for (const auto& cl : clusters) {
    if (cl.q <= q_thresh) continue;
    if (1 + 3 * (n + 1) <= cap) {
      out[1 + 3 * n + 0] = cl.row;
      out[1 + 3 * n + 1] = cl.col;
      out[1 + 3 * n + 2] = cl.scale;
    }
    ++n;
  }
  out[0] = n;
  return n;
}

// ---- pupil / landmark cascades ---------------------------------------------

void* pigo_pupil_new(const uint8_t* data, int64_t len, char* err,
                     int64_t err_cap) {
  auto* f = new PupilForest();
  std::string msg;
  if (!parse_pupil(data, len, f, &msg)) {
    delete f;
    if (err != nullptr && err_cap > 0)
      std::snprintf(err, size_t(err_cap), "%s", msg.c_str());
    return nullptr;
  }
  return f;
}

void pigo_pupil_free(void* h) { delete static_cast<PupilForest*>(h); }

int pigo_pupil_stages(void* h) { return static_cast<PupilForest*>(h)->stages; }

// Deterministic jitter triples for the perturbation ensemble
// (formula: core/puploc.go:248-250; RNG: splitmix64(seed), not math/rand).
void pigo_pupil_jitter(double row, double col, double scale, int perturbs,
                       uint64_t seed, float* starts_out) {
  uint64_t st = seed;
  for (int i = 0; i < perturbs; ++i) {
    float u1 = uniform01(&st), u2 = uniform01(&st), u3 = uniform01(&st);
    starts_out[3 * i + 0] =
        float(row) + float(scale) * 0.15f * (0.5f - u1);
    starts_out[3 * i + 1] =
        float(col) + float(scale) * 0.15f * (0.5f - u2);
    starts_out[3 * i + 2] = float(scale) * (0.925f + 0.15f * u3);
  }
}

// Ensemble walk + median vote from explicit start triples [p, 3].
// out3 = (row, col, scale).
void pigo_pupil_run(void* h, const float* starts, int64_t p,
                    const uint8_t* pixels, int nrows, int ncols, int dim,
                    double angle, int flip_v, double* out3) {
  const auto& f = *static_cast<PupilForest*>(h);
  run_detector(f, starts, p, pixels, nrows, ncols, dim, angle, flip_v != 0,
               out3);
}

// Landmark anchor geometry from the two pupils + delegate to the ensemble
// (reference core/flploc.go:36-56): dist = ||eyeL - eyeR||,
// row = avg_row + 0.25*dist, col = avg_col + 0.15*dist, scale = 3*dist.
void pigo_landmark_run(void* h, double left_row, double left_col,
                       double right_row, double right_col, int perturbs,
                       uint64_t seed, const uint8_t* pixels, int nrows,
                       int ncols, int dim, double angle, int flip_v,
                       double* out3) {
  double drow = left_row - right_row;
  double dcol = left_col - right_col;
  double dist = std::sqrt(drow * drow + dcol * dcol);
  double row = (left_row + right_row) / 2.0 + 0.25 * dist;
  double col = (left_col + right_col) / 2.0 + 0.15 * dist;
  double scale = 3.0 * dist;
  std::vector<float> starts(size_t(perturbs) * 3);
  pigo_pupil_jitter(row, col, scale, perturbs, seed, starts.data());
  pigo_pupil_run(h, starts.data(), perturbs, pixels, nrows, ncols, dim, angle,
                 flip_v, out3);
}

// ---- image ops --------------------------------------------------------------

// Exact reference grayscale (core/grayscale.go:8-23): channels are widened to
// 16 bits (v*257; alpha-premultiplied for transparent pixels), then
// (0.299R + 0.587G + 0.114B)/256 truncated to uint8.
void pigo_grayscale(const uint8_t* img, int64_t npix, int channels,
                    uint8_t* out) {
  if (channels < 3) {
    // 1-channel (grayscale) and 2-channel (gray+alpha) inputs: the single
    // luma channel passes through (alpha-premultiplied like NRGBA.RGBA()
    // with r=g=b). Reading p[1]/p[2] here would run past the buffer.
    for (int64_t i = 0; i < npix; ++i) {
      const uint8_t* p = img + i * channels;
      int64_t v = int64_t(p[0]) * 257;
      if (channels == 2 && p[1] != 255) v = v * p[1] / 255;
      out[i] = uint8_t(double(v) / 256.0);
    }
    return;
  }
  for (int64_t i = 0; i < npix; ++i) {
    const uint8_t* p = img + i * channels;
    int64_t r = int64_t(p[0]) * 257;
    int64_t g = int64_t(p[1]) * 257;
    int64_t b = int64_t(p[2]) * 257;
    if (channels == 4 && p[3] != 255) {
      int64_t a = p[3];
      r = r * a / 255;
      g = g * a / 255;
      b = b * a / 255;
    }
    double lum = (0.299 * double(r) + 0.587 * double(g) + 0.114 * double(b)) /
                 256.0;
    out[i] = uint8_t(lum);
  }
}

const char* pigo_version() { return "pigo-tpu-native 0.1.0"; }

}  // extern "C"
