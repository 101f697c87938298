// pbd_native: C++/OpenMP implementation of the mixtures-of-parts detection
// pipeline with the same algorithmic structure and parallelization sites as
// the reference C++/OpenCV implementation (wg-perception/
// PartsBasedDetector), but self-contained (no OpenCV):
//
//   * bilinear resize + 5-tap pyrDown ladder   (ref: src/HOGFeatures.cpp:
//     111-127; OpenMP over sub-octave indices)
//   * Felzenszwalb HOG per level               (ref: src/HOGFeatures.cpp:
//     167-341; OpenMP over levels)
//   * multi-channel spatial correlation, zero-pad channels 0..C-2 and
//     one-pad channel C-1                      (ref: src/
//     SpatialConvolutionEngine.cpp:70-157; OpenMP over filters)
//   * generalized distance transform (O(N) lower envelope) and min-sum DP
//     over the part tree                       (ref: include/
//     DistanceTransform.hpp:152-244, src/DynamicProgram.cpp:66-173;
//     OpenMP over scales x components)
//
// Dual purpose:
//   1. measured OpenMP CPU baseline for BASELINE.md (the reference
//      publishes no numbers; SURVEY.md §6);
//   2. native CPU runtime engine, exposed through a C ABI (pbd_c_api.h)
//      for ctypes binding and cross-checking against the JAX path.
//
// This file re-implements the algorithms from their definitions; no code
// is copied from the reference.

#include <algorithm>
#include <cassert>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace pbd {

using std::size_t;

struct Image {            // HWC float32
  int h = 0, w = 0, c = 0;
  std::vector<float> data;
  Image() {}
  Image(int h_, int w_, int c_) : h(h_), w(w_), c(c_), data((size_t)h_ * w_ * c_, 0.f) {}
  float* row(int y) { return data.data() + (size_t)y * w * c; }
  const float* row(int y) const { return data.data() + (size_t)y * w * c; }
  float& at(int y, int x, int ch) { return data[((size_t)y * w + x) * c + ch]; }
  float at(int y, int x, int ch) const { return data[((size_t)y * w + x) * c + ch]; }
};

struct Plane {            // HW float32
  int h = 0, w = 0;
  std::vector<float> data;
  Plane() {}
  Plane(int h_, int w_) : h(h_), w(w_), data((size_t)h_ * w_, 0.f) {}
  float* row(int y) { return data.data() + (size_t)y * w; }
  const float* row(int y) const { return data.data() + (size_t)y * w; }
};

// ---------------------------------------------------------------- resize

static inline int round_half_even(double v) { return (int)std::nearbyint(v); }

Image resize_linear(const Image& im, int oh, int ow) {
  Image out(oh, ow, im.c);
  const double sy = (double)im.h / oh, sx = (double)im.w / ow;
  std::vector<int> x0(ow), x1(ow);
  std::vector<float> fx(ow);
  for (int x = 0; x < ow; ++x) {
    double f = (x + 0.5) * sx - 0.5;
    int i0 = (int)std::floor(f);
    double fr = f - i0;
    if (i0 < 0) { i0 = 0; fr = 0.0; }
    if (i0 >= im.w - 1) { i0 = im.w - 1; fr = 0.0; }
    x0[x] = i0; x1[x] = std::min(i0 + 1, im.w - 1); fx[x] = (float)fr;
  }
  for (int y = 0; y < oh; ++y) {
    double f = (y + 0.5) * sy - 0.5;
    int i0 = (int)std::floor(f);
    double fr = f - i0;
    if (i0 < 0) { i0 = 0; fr = 0.0; }
    if (i0 >= im.h - 1) { i0 = im.h - 1; fr = 0.0; }
    int i1 = std::min(i0 + 1, im.h - 1);
    const float* r0 = im.row(i0);
    const float* r1 = im.row(i1);
    float* dst = out.row(y);
    for (int x = 0; x < ow; ++x) {
      for (int ch = 0; ch < im.c; ++ch) {
        float top = r0[x0[x] * im.c + ch] * (1.f - fx[x]) + r0[x1[x] * im.c + ch] * fx[x];
        float bot = r1[x0[x] * im.c + ch] * (1.f - fx[x]) + r1[x1[x] * im.c + ch] * fx[x];
        dst[x * im.c + ch] = top * (1.f - (float)fr) + bot * (float)fr;
      }
    }
  }
  return out;
}

static inline int reflect101(int i, int n) {
  if (n == 1) return 0;
  const int period = 2 * (n - 1);
  i = std::abs(i) % period;
  return i >= n ? period - i : i;
}

Image pyr_down(const Image& im) {
  static const float k[5] = {1.f / 16, 4.f / 16, 6.f / 16, 4.f / 16, 1.f / 16};
  const int oh = (im.h + 1) / 2, ow = (im.w + 1) / 2;
  Image tmp(oh, im.w, im.c);
  for (int y = 0; y < oh; ++y)
    for (int t = 0; t < 5; ++t) {
      const float* src = im.row(reflect101(2 * y + t - 2, im.h));
      float* dst = tmp.row(y);
      const size_t n = (size_t)im.w * im.c;
      for (size_t i = 0; i < n; ++i) dst[i] += k[t] * src[i];
    }
  Image out(oh, ow, im.c);
  for (int y = 0; y < oh; ++y) {
    const float* src = tmp.row(y);
    float* dst = out.row(y);
    for (int x = 0; x < ow; ++x)
      for (int t = 0; t < 5; ++t) {
        int sx = reflect101(2 * x + t - 2, im.w);
        for (int ch = 0; ch < im.c; ++ch)
          dst[x * im.c + ch] += k[t] * src[sx * im.c + ch];
      }
  }
  return out;
}

// ---------------------------------------------------------------- HOG

// 18-orientation snapped HOG, 3*norient/2 + 5 channels
// (ref: src/HOGFeatures.cpp:167-341)
Image hog(const Image& im, int binsize, int norient) {
  const int half = norient / 2;
  const int flen = 3 * half + 5;
  static const float uu9[9] = {1.000f, 0.9397f, 0.7660f, 0.5000f, 0.1736f,
                               -0.1736f, -0.5000f, -0.7660f, -0.9397f};
  static const float vv9[9] = {0.000f, 0.3420f, 0.6428f, 0.8660f, 0.9848f,
                               0.9848f, 0.8660f, 0.6428f, 0.3420f};
  const int bw = (int)std::floor((double)im.w / binsize + 0.5);
  const int bh = (int)std::floor((double)im.h / binsize + 0.5);
  const int ow = std::max(bw - 2, 0), oh = std::max(bh - 2, 0);
  const int visw = bw * binsize, vish = bh * binsize;

  Plane histp(bh, bw * norient);
  Plane normp(bh, bw);
  Image feat(oh, ow, flen);
  if (oh == 0 || ow == 0) return feat;

  for (int y = 1; y < vish - 1; ++y) {
    const int sy = std::min(y, im.h - 2);
    for (int x = 1; x < visw - 1; ++x) {
      const int sx = std::min(x, im.w - 2);
      float dx = 0, dy = 0, v = 0;
      if (im.c == 1) {
        dy = im.at(sy + 1, sx, 0) - im.at(sy - 1, sx, 0);
        dx = im.at(sy, sx + 1, 0) - im.at(sy, sx - 1, 0);
        v = dx * dx + dy * dy;
      } else {
        // strongest channel, strict > updates (tie prefers channel 2)
        v = -1.f;
        for (int ch = im.c - 1; ch >= 0; --ch) {
          float dyc = im.at(sy + 1, sx, ch) - im.at(sy - 1, sx, ch);
          float dxc = im.at(sy, sx + 1, ch) - im.at(sy, sx - 1, ch);
          float vc = dxc * dxc + dyc * dyc;
          if (vc > v) { v = vc; dx = dxc; dy = dyc; }
        }
      }
      float best = 0.f;
      int besto = 0;
      for (int o = 0; o < half; ++o) {
        float dot = uu9[o] * dx + vv9[o] * dy;
        if (dot > best) { best = dot; besto = o; }
        else if (-dot > best) { best = -dot; besto = o + half; }
      }
      float mag = std::sqrt(v);
      float yp = ((float)y + 0.5f) / binsize - 0.5f;
      float xp = ((float)x + 0.5f) / binsize - 0.5f;
      int iyp = (int)std::floor(yp), ixp = (int)std::floor(xp);
      float vy0 = yp - iyp, vx0 = xp - ixp;
      float vy1 = 1.f - vy0, vx1 = 1.f - vx0;
      float* hp = histp.data.data();
      const int hs = histp.w;
      if (iyp >= 0 && ixp >= 0) hp[iyp * hs + ixp * norient + besto] += vy1 * vx1 * mag;
      if (iyp >= 0 && ixp + 1 < bw) hp[iyp * hs + (ixp + 1) * norient + besto] += vy1 * vx0 * mag;
      if (iyp + 1 < bh && ixp >= 0) hp[(iyp + 1) * hs + ixp * norient + besto] += vy0 * vx1 * mag;
      if (iyp + 1 < bh && ixp + 1 < bw) hp[(iyp + 1) * hs + (ixp + 1) * norient + besto] += vy0 * vx0 * mag;
    }
  }

  for (int y = 0; y < bh; ++y)
    for (int x = 0; x < bw; ++x) {
      float s = 0;
      const float* hp = histp.row(y) + x * norient;
      for (int o = 0; o < half; ++o) { float t = hp[o] + hp[o + half]; s += t * t; }
      normp.row(y)[x] = s;
    }

  const float eps = 0.0001f;
  for (int y = 0; y < oh; ++y)
    for (int x = 0; x < ow; ++x) {
      float* dst = feat.row(y) + x * flen;
      auto nsum = [&](int yy, int xx) {
        return normp.row(yy)[xx] + normp.row(yy)[xx + 1] +
               normp.row(yy + 1)[xx] + normp.row(yy + 1)[xx + 1];
      };
      float n1 = 1.f / std::sqrt(nsum(y + 1, x + 1) + eps);
      float n2 = 1.f / std::sqrt(nsum(y, x + 1) + eps);
      float n3 = 1.f / std::sqrt(nsum(y + 1, x) + eps);
      float n4 = 1.f / std::sqrt(nsum(y, x) + eps);
      const float* src = histp.row(y + 1) + (x + 1) * norient;
      float t1 = 0, t2 = 0, t3 = 0, t4 = 0;
      for (int o = 0; o < norient; ++o) {
        float val = src[o];
        float h1 = std::min(val * n1, 0.2f), h2 = std::min(val * n2, 0.2f);
        float h3 = std::min(val * n3, 0.2f), h4 = std::min(val * n4, 0.2f);
        dst[o] = 0.5f * (h1 + h2 + h3 + h4);
        t1 += h1; t2 += h2; t3 += h3; t4 += h4;
      }
      for (int o = 0; o < half; ++o) {
        float sum = src[o] + src[o + half];
        float h1 = std::min(sum * n1, 0.2f), h2 = std::min(sum * n2, 0.2f);
        float h3 = std::min(sum * n3, 0.2f), h4 = std::min(sum * n4, 0.2f);
        dst[norient + o] = 0.5f * (h1 + h2 + h3 + h4);
      }
      dst[norient + half + 0] = 0.2357f * t1;
      dst[norient + half + 1] = 0.2357f * t2;
      dst[norient + half + 2] = 0.2357f * t3;
      dst[norient + half + 3] = 0.2357f * t4;
      dst[norient + half + 4] = 0.f;
    }
  return feat;
}

// ---------------------------------------------------------------- conv

// same-size multi-channel correlation, centered anchor, zero padding for
// channels 0..C-2 and one-padding for C-1
// (ref: src/SpatialConvolutionEngine.cpp:70-157)
Plane correlate(const Image& feat, const float* filt, int kh, int kw) {
  const int H = feat.h, W = feat.w, C = feat.c;
  const int ay = kh / 2, ax = kw / 2;
  Plane out(H, W);
  // sum of truncation-channel filter weights for out-of-image taps is
  // handled per-pixel below
  for (int y = 0; y < H; ++y) {
    float* orow = out.row(y);
    for (int i = 0; i < kh; ++i) {
      const int sy = y + i - ay;
      const bool yin = (sy >= 0 && sy < H);
      const float* frow = yin ? feat.row(sy) : nullptr;
      const float* krow = filt + (size_t)i * kw * C;
      for (int j = 0; j < kw; ++j) {
        const float* kk = krow + (size_t)j * C;
        const int off = j - ax;
        if (yin) {
          const int x0 = std::max(0, -off), x1 = W - std::max(0, off);
          // interior: full channel dot product
          for (int x = x0; x < x1; ++x) {
            const float* fv = frow + (size_t)(x + off) * C;
            float acc = 0.f;
            for (int ch = 0; ch < C; ++ch) acc += kk[ch] * fv[ch];
            orow[x] += acc;
          }
          // out-of-row-bounds taps: occlusion channel contributes 1
          for (int x = 0; x < x0; ++x) orow[x] += kk[C - 1];
          for (int x = x1; x < W; ++x) orow[x] += kk[C - 1];
        } else {
          for (int x = 0; x < W; ++x) orow[x] += kk[C - 1];
        }
      }
    }
  }
  return out;
}

// ---------------------------------------------------------------- DT

// O(N) generalized DT row pass: dst[q] = max_x a d^2 + b d + src[x],
// d = q + os - x, via the lower-envelope algorithm (a < 0)
// (ref: include/DistanceTransform.hpp:152-182)
static void dt_row(const float* src, float* dst, int32_t* ptr, int n,
                   double a, double b, int os, int* v, double* z) {
  int k = 0;
  v[0] = 0;
  z[0] = -std::numeric_limits<double>::infinity();
  z[1] = +std::numeric_limits<double>::infinity();
  auto intersect = [&](int x0, int x1) {
    return ((double)src[x1] - src[x0] - b * (x1 - x0) +
            a * ((double)x1 * x1 - (double)x0 * x0)) / (2.0 * a * (x1 - x0));
  };
  for (int q = 1; q < n; ++q) {
    double s = intersect(v[k], q);
    while (s <= z[k] && k > 0) { --k; s = intersect(v[k], q); }
    ++k;
    v[k] = q;
    z[k] = s;
    z[k + 1] = +std::numeric_limits<double>::infinity();
  }
  k = 0;
  for (int q = 0; q < n; ++q) {
    while (z[k + 1] < os) ++k;
    const int d = os - v[k];
    dst[q] = (float)(a * d * d + b * d) + src[v[k]];
    ptr[q] = v[k];
    ++os;
  }
}

// full 2-D DT with reference argmin composition
// (ref: include/DistanceTransform.hpp:203-245)
void dt2d(const Plane& score, const float w[4], int ax, int ay,
          Plane& out, std::vector<int32_t>& Ix, std::vector<int32_t>& Iy) {
  const int M = score.h, N = score.w;
  out = Plane(M, N);
  Ix.assign((size_t)M * N, 0);
  Iy.assign((size_t)M * N, 0);
  std::vector<float> tmp((size_t)M * N);
  std::vector<int> vbuf(std::max(M, N));
  std::vector<double> zbuf(std::max(M, N) + 1);
  for (int m = 0; m < M; ++m)
    dt_row(score.row(m), tmp.data() + (size_t)m * N, Ix.data() + (size_t)m * N,
           N, -w[0], -w[1], ax, vbuf.data(), zbuf.data());
  // column pass on transposed data
  std::vector<float> colin(M), colout(M);
  std::vector<int32_t> coliy(M);
  std::vector<int32_t> IyCol((size_t)M * N);
  for (int n = 0; n < N; ++n) {
    for (int m = 0; m < M; ++m) colin[m] = tmp[(size_t)m * N + n];
    dt_row(colin.data(), colout.data(), coliy.data(), M, -w[2], -w[3], ay,
           vbuf.data(), zbuf.data());
    for (int m = 0; m < M; ++m) {
      out.row(m)[n] = colout[m];
      IyCol[(size_t)m * N + n] = coliy[m];
    }
  }
  // reference compose: Iy[m][n] = IyCol[m][Ix[m][n]]
  for (int m = 0; m < M; ++m)
    for (int n = 0; n < N; ++n)
      Iy[(size_t)m * N + n] = IyCol[(size_t)m * N + Ix[(size_t)m * N + n]];
}

// ---------------------------------------------------------------- model

struct NativeModel {
  int nparts = 0, nmix = 0, fsize = 5, flen = 32, norient = 18;
  int binsize = 4, interval = 10;
  float thresh = 0.f;
  std::vector<int> parent;            // (P)
  std::vector<float> filters;         // (P*M, kh, kw, C) row-major
  std::vector<float> defw;            // (P*M, 4)
  std::vector<int> anchor;            // (P*M, 2)
  std::vector<float> bias;            // (P, M, M) child x parent
  float root_bias = 0.f;
  std::vector<float> root_bias_v;     // optional per-root-mixture bias
  // optional filter-id map (P*M): the reference keys its accumulated
  // DP scores BY FILTER ID (ncscores via ComponentPart::score,
  // ref include/Parts.hpp:165-168), so (part, mixture) slots sharing
  // an id ALIAS their accumulation buffers.  Empty -> identity
  // (p*nmix+m), the no-sharing case.
  std::vector<int> fid;

  int score_id(int p, int m) const {
    return fid.empty() ? p * nmix + m : fid[(size_t)p * nmix + m];
  }
  const float* filter(int p, int m) const {
    return filters.data() + ((size_t)p * nmix + m) * fsize * fsize * flen;
  }
  // the reference adds the FIRST root mixture's bias to every root
  // mixture (src/DynamicProgram.cpp:163-170: `T bias = root.bias(0)[0]`)
  // — a quirk kept for parity, so the mixture index is ignored
  float rbias(int) const {
    return root_bias_v.empty() ? root_bias : root_bias_v[0];
  }
};

NativeModel make_synthetic_model(int nparts, int nmix, int fsize, int flen,
                                 int norient, int binsize, int interval,
                                 uint64_t seed) {
  NativeModel md;
  md.nparts = nparts; md.nmix = nmix; md.fsize = fsize; md.flen = flen;
  md.norient = norient; md.binsize = binsize; md.interval = interval;
  md.parent.resize(nparts);
  md.parent[0] = 0;
  uint64_t s = seed ? seed : 0x9e3779b97f4a7c15ull;
  auto rnd = [&]() {
    s ^= s << 13; s ^= s >> 7; s ^= s << 17;
    return (float)((double)(s >> 11) / (double)(1ull << 53)) - 0.5f;
  };
  for (int p = 1; p < nparts; ++p) md.parent[p] = p - 1;
  md.filters.resize((size_t)nparts * nmix * fsize * fsize * flen);
  for (auto& x : md.filters) x = rnd() * 0.1f;
  md.defw.resize((size_t)nparts * nmix * 4);
  md.anchor.resize((size_t)nparts * nmix * 2);
  for (int i = 0; i < nparts * nmix; ++i) {
    md.defw[i * 4 + 0] = 0.05f + 0.05f * std::abs(rnd());
    md.defw[i * 4 + 1] = rnd() * 0.05f;
    md.defw[i * 4 + 2] = 0.05f + 0.05f * std::abs(rnd());
    md.defw[i * 4 + 3] = rnd() * 0.05f;
    md.anchor[i * 2 + 0] = (int)(rnd() * 8);
    md.anchor[i * 2 + 1] = (int)(rnd() * 8);
  }
  md.bias.resize((size_t)nparts * nmix * nmix);
  for (auto& x : md.bias) x = rnd() * 0.4f;
  md.root_bias = rnd() * 0.4f;
  return md;
}

// ---------------------------------------------------------------- detect

struct DetectStats {
  int nscales = 0;
  int ncandidates = 0;
  double best = -1e30;
};

// full pipeline for one image; OpenMP sites mirror the reference
DetectStats detect(const NativeModel& md, const Image& im) {
  DetectStats st;
  const double sfactor = std::pow(2.0, 1.0 / md.interval);
  const int nscales =
      1 + (int)std::floor(std::log(std::min(im.h, im.w) / (5.0 * md.binsize)) /
                          std::log(sfactor));
  st.nscales = nscales;

  // ---- pyramid ladder (ref: src/HOGFeatures.cpp:111-127, OMP site 1)
  std::vector<Image> levels(nscales);
  std::vector<float> scales(nscales);
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int i = 0; i < std::min(md.interval, nscales); ++i) {
    double s = 1.0 / std::pow(sfactor, i);
    // target sizes in f32, matching cv::Size_<float> -> Size conversion
    // (and infer/pyramid_plan._cv_round_f32)
    Image cur = resize_linear(
        im, (int)std::nearbyintf((float)im.h * (float)s),
        (int)std::nearbyintf((float)im.w * (float)s));
    levels[i] = cur;
    scales[i] = (float)(std::pow(sfactor, i) * md.binsize);
    for (int j = i + md.interval; j < nscales; j += md.interval) {
      cur = pyr_down(cur);
      levels[j] = cur;
      scales[j] = 2.f * scales[j - md.interval];
    }
  }

  // ---- HOG (ref: src/HOGFeatures.cpp:130-150, OMP site 2)
  std::vector<Image> feats(nscales);
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int n = 0; n < nscales; ++n) feats[n] = hog(levels[n], md.binsize, md.norient);

  // ---- conv (ref: src/SpatialConvolutionEngine.cpp:106-124, OMP site 3)
  const int F = md.nparts * md.nmix;
  std::vector<std::vector<Plane>> pdfs(nscales, std::vector<Plane>(F));
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int f = 0; f < F; ++f)
    for (int n = 0; n < nscales; ++n)
      pdfs[n][f] = correlate(feats[n], md.filters.data() +
                                 (size_t)f * md.fsize * md.fsize * md.flen,
                             md.fsize, md.fsize);

  // ---- DP (ref: src/DynamicProgram.cpp:66-173, OMP site 4)
  int total_cand = 0;
  double best = -1e30;
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic) reduction(+ : total_cand) reduction(max : best)
#endif
  for (int n = 0; n < nscales; ++n) {
    const int H = feats[n].h, W = feats[n].w;
    if (H == 0 || W == 0) continue;
    std::vector<std::vector<Plane>> acc(md.nparts);  // per part per mixture
    for (int p = md.nparts - 1; p > 0; --p) {
      std::vector<Plane> sdt(md.nmix);
      std::vector<std::vector<int32_t>> ix(md.nmix), iy(md.nmix);
      for (int m = 0; m < md.nmix; ++m) {
        const Plane& sin = acc[p].empty() ? pdfs[n][p * md.nmix + m]
                                          : acc[p][m];
        const float* w = md.defw.data() + ((size_t)p * md.nmix + m) * 4;
        const int* an = md.anchor.data() + ((size_t)p * md.nmix + m) * 2;
        dt2d(sin, w, an[0], an[1], sdt[m], ix[m], iy[m]);
      }
      const int par = md.parent[p];
      if (acc[par].empty()) {
        acc[par].resize(md.nmix);
        for (int m = 0; m < md.nmix; ++m) acc[par][m] = pdfs[n][par * md.nmix + m];
      }
      for (int mp = 0; mp < md.nmix; ++mp) {
        Plane& dst = acc[par][mp];
        for (int i = 0; i < H * W; ++i) {
          float bv = -1e30f;
          for (int mc = 0; mc < md.nmix; ++mc) {
            float v = sdt[mc].data[i] +
                      md.bias[((size_t)p * md.nmix + mc) * md.nmix + mp];
            if (v > bv) bv = v;
          }
          dst.data[i] += bv;
        }
      }
    }
    // root reduction + threshold count
    for (int i = 0; i < H * W; ++i) {
      float bv = -1e30f;
      for (int m = 0; m < md.nmix; ++m) {
        const Plane& pm = acc[0].empty() ? pdfs[n][m] : acc[0][m];
        float v = pm.data[i] + md.rbias(m);
        if (v > bv) bv = v;
      }
      if (bv > md.thresh) ++total_cand;
      if (bv > best) best = bv;
    }
  }
  st.ncandidates = total_cand;
  st.best = best;
  return st;
}

// ------------------------------------------------- candidate extraction

// One detection candidate: root score, pyramid level, and per-part
// (x, y, mixture) feature-grid locations (the reference's Candidate
// content before box conversion, src/DynamicProgram.cpp:213-251).
struct NativeCandidate {
  float score = 0.f;
  int level = 0;
  std::vector<int32_t> loc;   // (P, 3): x, y, m
};

// Full pipeline for one image, RECORDING the DP argmax tables and
// backtracking the top-k root locations per scale — the reference's
// DynamicProgram::min + argmin pair (src/DynamicProgram.cpp:66-255),
// used for ctypes cross-checking against the JAX detector.
void detect_candidates(const NativeModel& md, const Image& im,
                       int k_per_level,
                       std::vector<NativeCandidate>& out) {
  const double sfactor = std::pow(2.0, 1.0 / md.interval);
  const int nscales =
      1 + (int)std::floor(std::log(std::min(im.h, im.w) / (5.0 * md.binsize)) /
                          std::log(sfactor));

  // ---- pyramid ladder + HOG + conv (identical to detect())
  std::vector<Image> levels(nscales);
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int i = 0; i < std::min(md.interval, nscales); ++i) {
    double s = 1.0 / std::pow(sfactor, i);
    Image cur = resize_linear(
        im, (int)std::nearbyintf((float)im.h * (float)s),
        (int)std::nearbyintf((float)im.w * (float)s));
    levels[i] = cur;
    for (int j = i + md.interval; j < nscales; j += md.interval) {
      cur = pyr_down(cur);
      levels[j] = cur;
    }
  }
  std::vector<Image> feats(nscales);
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int n = 0; n < nscales; ++n)
    feats[n] = hog(levels[n], md.binsize, md.norient);

  // conv once per unique SCORE ID: shared-filter slots have identical
  // filter content, so their responses are computed once, like the
  // reference's responses-by-filter-id (include/Parts.hpp:165-168)
  const int F = md.nparts * md.nmix;
  std::vector<int> rep(F, -1);        // id -> representative slot
  for (int s = 0; s < F; ++s) {
    const int id = md.score_id(s / md.nmix, s % md.nmix);
    if (rep[id] < 0) rep[id] = s;
  }
  std::vector<std::vector<Plane>> pdfs(nscales, std::vector<Plane>(F));
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int f = 0; f < F; ++f) {
    if (rep[f] < 0) continue;
    for (int n = 0; n < nscales; ++n)
      pdfs[n][f] = correlate(feats[n],
                             md.filters.data() + (size_t)rep[f] *
                                 md.fsize * md.fsize * md.flen,
                             md.fsize, md.fsize);
  }

  // ---- DP with stored Ix/Iy/Ik tables + per-scale top-k backtracking
  // (ref: src/DynamicProgram.cpp:80-87 OMP over scales; tables at
  // :110-151; argmin walk at :208-251)
  std::vector<std::vector<NativeCandidate>> per_scale(nscales);
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int n = 0; n < nscales; ++n) {
    const int H = feats[n].h, W = feats[n].w;
    if (H == 0 || W == 0) continue;
    const int HW = H * W;
    const int P = md.nparts, M = md.nmix;
    // accumulated scores keyed by SCORE ID — the filter id when the
    // model shares filters (ref ncscores, include/Parts.hpp:165-168
    // via src/DynamicProgram.cpp:115-155), else (p, m).  Reads at a
    // part's visit see whatever earlier parts accumulated into the
    // shared buffer, exactly like the reference.
    std::vector<Plane> accv((size_t)P * M);
    std::vector<char> accset((size_t)P * M, 0);
    const bool aliased = !md.fid.empty();
    auto read_score = [&](int p, int mc) -> const Plane& {
      const int id = md.score_id(p, mc);
      return accset[id] ? accv[id] : pdfs[n][id];
    };
    // tables[p][mp]: child location/mixture chosen at each parent cell
    std::vector<std::vector<std::vector<int32_t>>> Ix(P), Iy(P), Ik(P);
    for (int p = P - 1; p > 0; --p) {
      std::vector<Plane> sdt(M);
      std::vector<std::vector<int32_t>> ix(M), iy(M);
      for (int mc = 0; mc < M; ++mc) {
        const Plane& sin = read_score(p, mc);
        const float* w = md.defw.data() + ((size_t)p * M + mc) * 4;
        const int* an = md.anchor.data() + ((size_t)p * M + mc) * 2;
        dt2d(sin, w, an[0], an[1], sdt[mc], ix[mc], iy[mc]);
      }
      const int par = md.parent[p];
      Ix[p].assign(M, std::vector<int32_t>(HW));
      Iy[p].assign(M, std::vector<int32_t>(HW));
      Ik[p].assign(M, std::vector<int32_t>(HW));
      for (int mp = 0; mp < M; ++mp) {
        const int id = md.score_id(par, mp);
        if (!accset[id]) {
          accv[id] = pdfs[n][id];
          accset[id] = 1;
        }
        Plane& dst = accv[id];
        for (int i = 0; i < HW; ++i) {
          float bv = -1e30f;
          int bk = 0;
          for (int mc = 0; mc < M; ++mc) {
            float v = sdt[mc].data[i] +
                      md.bias[((size_t)p * M + mc) * M + mp];
            if (v > bv) { bv = v; bk = mc; }
          }
          dst.data[i] += bv;
          Ik[p][mp][i] = bk;
          Ix[p][mp][i] = ix[bk][i];
          Iy[p][mp][i] = iy[bk][i];
        }
      }
      if (!aliased) {
        // without sharing, a part's buffer is never read again after
        // its own visit — free early (memory); with sharing it may be
        for (int mc = 0; mc < M; ++mc) {
          const int id = md.score_id(p, mc);
          if (accset[id]) {
            accv[id] = Plane();
            accset[id] = 0;
          }
        }
      }
    }
    // root reduction (ref: src/DynamicProgram.cpp:162-171)
    std::vector<float> rootv(HW);
    std::vector<int32_t> rooti(HW);
    for (int i = 0; i < HW; ++i) {
      float bv = -1e30f;
      int bm = 0;
      for (int m = 0; m < M; ++m) {
        const Plane& pm = read_score(0, m);
        float v = pm.data[i] + md.rbias(m);
        if (v > bv) { bv = v; bm = m; }
      }
      rootv[i] = bv;
      rooti[i] = bm;
    }
    // top-k cells by (score desc, index asc) — deterministic, the same
    // order lax.top_k produces
    std::vector<int> order(HW);
    for (int i = 0; i < HW; ++i) order[i] = i;
    const int k = std::min(k_per_level, HW);
    std::partial_sort(order.begin(), order.begin() + k, order.end(),
                      [&](int a, int b) {
                        if (rootv[a] != rootv[b]) return rootv[a] > rootv[b];
                        return a < b;
                      });
    for (int r = 0; r < k; ++r) {
      const int i0 = order[r];
      if (!(rootv[i0] > md.thresh)) break;  // sorted: rest are below too
      NativeCandidate cand;
      cand.score = rootv[i0];
      cand.level = n;
      cand.loc.assign((size_t)P * 3, 0);
      cand.loc[0] = i0 % W;
      cand.loc[1] = i0 / W;
      cand.loc[2] = rooti[i0];
      // root -> leaf walk: parts are topologically ordered, so the
      // parent is always resolved first (ref: src/DynamicProgram.cpp:
      // 219-235)
      for (int p = 1; p < P; ++p) {
        const int par = md.parent[p];
        const int px = cand.loc[(size_t)par * 3 + 0];
        const int py = cand.loc[(size_t)par * 3 + 1];
        const int mp = cand.loc[(size_t)par * 3 + 2];
        const int idx = py * W + px;
        cand.loc[(size_t)p * 3 + 0] = Ix[p][mp][idx];
        cand.loc[(size_t)p * 3 + 1] = Iy[p][mp][idx];
        cand.loc[(size_t)p * 3 + 2] = Ik[p][mp][idx];
      }
      per_scale[n].push_back(std::move(cand));
    }
  }
  out.clear();
  for (int n = 0; n < nscales; ++n)
    for (auto& c : per_scale[n]) out.push_back(std::move(c));
}

}  // namespace pbd

// ---------------------------------------------------------------- C ABI

extern "C" {

// benchmark entry: run `frames` detections of a synthetic model on a
// synthetic image; returns seconds per frame (best of runs)
double pbd_benchmark(int img_h, int img_w, int nparts, int nmix, int fsize,
                     int flen, int norient, int binsize, int interval,
                     int frames, int* nscales_out, double* best_out) {
  pbd::NativeModel md = pbd::make_synthetic_model(
      nparts, nmix, fsize, flen, norient, binsize, interval, 1234);
  md.thresh = 1e9f;
  pbd::Image im(img_h, img_w, 3);
  uint64_t s = 42;
  for (auto& x : im.data) {
    s ^= s << 13; s ^= s >> 7; s ^= s << 17;
    x = (float)((s >> 11) % 256);
  }
  double best_t = 1e30;
  pbd::DetectStats st;
  for (int f = 0; f < frames; ++f) {
#ifdef _OPENMP
    double t0 = omp_get_wtime();
#else
    double t0 = (double)clock() / CLOCKS_PER_SEC;
#endif
    st = pbd::detect(md, im);
#ifdef _OPENMP
    double t1 = omp_get_wtime();
#else
    double t1 = (double)clock() / CLOCKS_PER_SEC;
#endif
    best_t = std::min(best_t, t1 - t0);
  }
  if (nscales_out) *nscales_out = st.nscales;
  if (best_out) *best_out = st.best;
  return best_t;
}

// single-image detection on user data (for ctypes cross-checking):
// image HWC float32; returns number of above-threshold root cells and
// writes the best score
int pbd_detect_stats(const float* image, int h, int w, int c,
                     /* model arrays */
                     int nparts, int nmix, int fsize, int flen, int norient,
                     int binsize, int interval, float thresh,
                     const int* parent, const float* filters,
                     const float* defw, const int* anchor, const float* bias,
                     float root_bias, double* best_out) {
  pbd::NativeModel md;
  md.nparts = nparts; md.nmix = nmix; md.fsize = fsize; md.flen = flen;
  md.norient = norient; md.binsize = binsize; md.interval = interval;
  md.thresh = thresh;
  md.parent.assign(parent, parent + nparts);
  md.filters.assign(filters,
                    filters + (size_t)nparts * nmix * fsize * fsize * flen);
  md.defw.assign(defw, defw + (size_t)nparts * nmix * 4);
  md.anchor.assign(anchor, anchor + (size_t)nparts * nmix * 2);
  md.bias.assign(bias, bias + (size_t)nparts * nmix * nmix);
  md.root_bias = root_bias;
  pbd::Image im(h, w, c);
  std::memcpy(im.data.data(), image, sizeof(float) * (size_t)h * w * c);
  pbd::DetectStats st = pbd::detect(md, im);
  if (best_out) *best_out = st.best;
  return st.ncandidates;
}

// number of pyramid levels for an image/model combination
// (ref: src/HOGFeatures.cpp:98-99)
int pbd_nscales(int h, int w, int binsize, int interval) {
  const double sfactor = std::pow(2.0, 1.0 / interval);
  return 1 + (int)std::floor(std::log(std::min(h, w) / (5.0 * binsize)) /
                             std::log(sfactor));
}

// full detection with candidate extraction (for ctypes cross-checking
// against the JAX detector).  image: HWC float32.  Model arrays as in
// pbd_detect_stats plus a per-root-mixture bias vector.  fid: optional
// (nparts*nmix) filter-id map — non-null keys the accumulated DP
// scores by filter id, reproducing the reference's buffer ALIASING for
// models with shared filters (include/Parts.hpp:165-168); null = no
// sharing.  Writes up to `cap` candidates (scores desc within each
// level, levels ascending):
//   out_score[i], out_level[i], out_loc[i*P*3 + p*3 + {0,1,2}] = x, y, m
// Returns the number written, or -1 on error.
int pbd_detect_candidates(const float* image, int h, int w, int c,
                          int nparts, int nmix, int fsize, int flen,
                          int norient, int binsize, int interval,
                          float thresh, const int* parent,
                          const float* filters, const float* defw,
                          const int* anchor, const float* bias,
                          const float* root_bias, const int* fid,
                          int k_per_level,
                          float* out_score, int32_t* out_level,
                          int32_t* out_loc, int cap) {
  if (!image || !parent || !filters || !defw || !anchor || !bias ||
      !root_bias || cap <= 0)
    return -1;
  pbd::NativeModel md;
  md.nparts = nparts; md.nmix = nmix; md.fsize = fsize; md.flen = flen;
  md.norient = norient; md.binsize = binsize; md.interval = interval;
  md.thresh = thresh;
  md.parent.assign(parent, parent + nparts);
  md.filters.assign(filters,
                    filters + (size_t)nparts * nmix * fsize * fsize * flen);
  md.defw.assign(defw, defw + (size_t)nparts * nmix * 4);
  md.anchor.assign(anchor, anchor + (size_t)nparts * nmix * 2);
  md.bias.assign(bias, bias + (size_t)nparts * nmix * nmix);
  md.root_bias_v.assign(root_bias, root_bias + nmix);
  if (fid) {
    // ids must be compact (< nparts*nmix): the Python binding remaps
    // global filter ids to a local dense space before the call
    for (size_t i = 0; i < (size_t)nparts * nmix; ++i)
      if (fid[i] < 0 || fid[i] >= nparts * nmix) return -1;
    md.fid.assign(fid, fid + (size_t)nparts * nmix);
  }
  pbd::Image im(h, w, c);
  std::memcpy(im.data.data(), image, sizeof(float) * (size_t)h * w * c);
  std::vector<pbd::NativeCandidate> cands;
  pbd::detect_candidates(md, im, k_per_level, cands);
  const int nout = std::min((int)cands.size(), cap);
  for (int i = 0; i < nout; ++i) {
    out_score[i] = cands[i].score;
    out_level[i] = cands[i].level;
    std::memcpy(out_loc + (size_t)i * nparts * 3, cands[i].loc.data(),
                sizeof(int32_t) * (size_t)nparts * 3);
  }
  return nout;
}

}  // extern "C"

#ifdef PBD_MAIN
int main(int argc, char** argv) {
  int h = argc > 1 ? atoi(argv[1]) : 480;
  int w = argc > 2 ? atoi(argv[2]) : 640;
  int frames = argc > 3 ? atoi(argv[3]) : 3;
  int nscales = 0;
  double best = 0;
  double t = pbd_benchmark(h, w, 26, 4, 5, 32, 18, 4, 10, frames, &nscales, &best);
  printf("{\"sec_per_frame\": %.4f, \"fps\": %.4f, \"nscales\": %d, "
         "\"img\": [%d, %d], \"best\": %.4f}\n",
         t, 1.0 / t, nscales, h, w, best);
  return 0;
}
#endif
