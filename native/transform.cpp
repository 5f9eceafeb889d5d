// Native host-side image batch assembly for the data pipeline.
//
// The reference's input pipeline is torch DataLoader workers running
// PIL transforms (Face-DeId/core/data_loader.py:113-124).  Here the
// hot host-side work — crop + antialiased bilinear resize + horizontal
// flip + [0,1] normalization + batch stacking — is a C++ library
// driven from Python via ctypes (ppvision_tpu/data/native.py), with a
// thread pool across the batch.
//
// The resize replicates PIL's BILINEAR filter exactly (triangle filter
// with support scaled by the downsampling ratio, separable passes,
// per-axis precomputed coefficient tables), so the native path is
// numerically interchangeable with the PIL path.
//
// JPEG decode (libjpeg / libjpeg-turbo — the same decoder PIL links, so
// pixel output is identical to ``PIL.Image.open(...).convert("RGB")``)
// is compiled in when <jpeglib.h> is available (PPV_HAS_JPEG), making
// the pool a complete bytes->float-batch pipeline: the PIL decode path
// was the last single-threaded host bottleneck (~900 img/s on one core
// vs a ~5,200 img/s chip — PERF.md "Host input pipeline").
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -pthread -DPPV_HAS_JPEG \
//            transform.cpp -ljpeg -o libppv_transform.so
// (without libjpeg: drop -DPPV_HAS_JPEG/-ljpeg; decode entry points
// then return an error and Python falls back to PIL decode.)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#ifdef PPV_HAS_JPEG
#include <csetjmp>
#include <cstdio>
#include <jpeglib.h>
#endif

namespace {

struct Coeffs {
  std::vector<int> bounds;     // (xmin, xsize) per output pixel
  std::vector<double> weights; // ksize weights per output pixel
  int ksize = 0;
};

// PIL triangle (bilinear) filter: f(x) = 1-|x| on [-1, 1].
static inline double triangle(double x) {
  if (x < 0.0) x = -x;
  return x < 1.0 ? 1.0 - x : 0.0;
}

// Port of PIL's precompute_coeffs (antialiased when downscaling).
Coeffs precompute(int in_size, double in0, double in1, int out_size) {
  Coeffs c;
  double scale = (in1 - in0) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = filterscale;  // bilinear support = 1.0 * filterscale
  int ksize = (int)std::ceil(support) * 2 + 1;
  c.ksize = ksize;
  c.bounds.resize(out_size * 2);
  c.weights.resize((size_t)out_size * ksize, 0.0);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = in0 + (xx + 0.5) * scale;
    double ww = 0.0;
    double ss = 1.0 / filterscale;
    int xmin = (int)(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = (int)(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double* k = &c.weights[(size_t)xx * ksize];
    int x = 0;
    for (; x < xmax; ++x) {
      double w = triangle((x + xmin - center + 0.5) * ss);
      k[x] = w;
      ww += w;
    }
    for (x = 0; x < xmax; ++x) {
      if (ww != 0.0) k[x] /= ww;
    }
    for (; x < ksize; ++x) k[x] = 0.0;
    c.bounds[xx * 2] = xmin;
    c.bounds[xx * 2 + 1] = xmax;
  }
  return c;
}

// PIL 8-bit fixed-point machinery (Resample.c): int coefficients at
// PRECISION_BITS, uint8 intermediate between the two passes.
constexpr int kPrecisionBits = 32 - 8 - 2;

static inline uint8_t clip8(int v) {
  v >>= kPrecisionBits;
  return (uint8_t)(v < 0 ? 0 : (v > 255 ? 255 : v));
}

std::vector<int> to_fixed(const Coeffs& c, int out_size) {
  std::vector<int> kk((size_t)out_size * c.ksize);
  for (size_t i = 0; i < kk.size(); ++i) {
    double w = c.weights[i];
    kk[i] = (int)(w < 0 ? w * (1 << kPrecisionBits) - 0.5
                        : w * (1 << kPrecisionBits) + 0.5);
  }
  return kk;
}

// One image: crop from u8 HWC(3), PIL-bit-exact bilinear to (dh, dw),
// optional hflip, write float32 /255 (optionally (x-mean)/std).
void transform_one(const uint8_t* src, int sh, int sw,
                   int cy, int cx, int ch, int cw,
                   float* dst, int dh, int dw, int flip,
                   const float* mean, const float* stdv) {
  (void)sh;
  Coeffs hc = precompute(cw, 0.0, cw, dw);
  Coeffs vc = precompute(ch, 0.0, ch, dh);
  std::vector<int> hk = to_fixed(hc, dw);
  std::vector<int> vk = to_fixed(vc, dh);

  // Horizontal pass -> uint8 intermediate (as PIL does).
  std::vector<uint8_t> tmp((size_t)ch * dw * 3);
  for (int y = 0; y < ch; ++y) {
    const uint8_t* row = src + ((size_t)(cy + y) * sw + cx) * 3;
    for (int x = 0; x < dw; ++x) {
      int xmin = hc.bounds[x * 2], xmax = hc.bounds[x * 2 + 1];
      const int* k = &hk[(size_t)x * hc.ksize];
      int acc0 = 1 << (kPrecisionBits - 1);
      int acc1 = acc0, acc2 = acc0;
      for (int i = 0; i < xmax; ++i) {
        const uint8_t* p = row + (size_t)(xmin + i) * 3;
        acc0 += p[0] * k[i];
        acc1 += p[1] * k[i];
        acc2 += p[2] * k[i];
      }
      uint8_t* q = &tmp[((size_t)y * dw + x) * 3];
      q[0] = clip8(acc0);
      q[1] = clip8(acc1);
      q[2] = clip8(acc2);
    }
  }
  // Vertical pass + flip + normalize.
  for (int y = 0; y < dh; ++y) {
    int ymin = vc.bounds[y * 2], ymax = vc.bounds[y * 2 + 1];
    const int* k = &vk[(size_t)y * vc.ksize];
    for (int x = 0; x < dw; ++x) {
      int acc0 = 1 << (kPrecisionBits - 1);
      int acc1 = acc0, acc2 = acc0;
      for (int i = 0; i < ymax; ++i) {
        const uint8_t* p = &tmp[(((size_t)(ymin + i)) * dw + x) * 3];
        acc0 += p[0] * k[i];
        acc1 += p[1] * k[i];
        acc2 += p[2] * k[i];
      }
      int ox = flip ? (dw - 1 - x) : x;
      float* q = dst + ((size_t)y * dw + ox) * 3;
      int acc[3] = {acc0, acc1, acc2};
      for (int cch = 0; cch < 3; ++cch) {
        float v = clip8(acc[cch]) / 255.0f;
        if (mean && stdv) v = (v - mean[cch]) / stdv[cch];
        q[cch] = v;
      }
    }
  }
}

#ifdef PPV_HAS_JPEG

// libjpeg's default error handler calls exit(); longjmp back instead so
// a corrupt image is a recoverable per-image error, not a process kill.
struct JerrJmp {
  jpeg_error_mgr pub;
  std::jmp_buf jmp;
};

void jerr_exit(j_common_ptr cinfo) {
  JerrJmp* j = reinterpret_cast<JerrJmp*>(cinfo->err);
  std::longjmp(j->jmp, 1);
}

// Decode JPEG bytes to tightly-packed RGB u8.  Returns 0 on success.
// out may be null to query dimensions only (*h, *w always written on
// success).  out_cap guards against dimension races between the query
// and decode calls.
int decode_jpeg_rgb(const uint8_t* data, size_t len, uint8_t* out,
                    size_t out_cap, int* h, int* w) {
  jpeg_decompress_struct cinfo;
  JerrJmp jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jerr_exit;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, (unsigned long)len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;  // grayscale/YCbCr/CMYK all -> RGB
  jpeg_start_decompress(&cinfo);
  *h = (int)cinfo.output_height;
  *w = (int)cinfo.output_width;
  if (out == nullptr) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  size_t stride = (size_t)cinfo.output_width * 3;
  if (out_cap < stride * cinfo.output_height) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out + (size_t)cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

#endif  // PPV_HAS_JPEG

}  // namespace

extern "C" {

#ifdef PPV_HAS_JPEG

int ppv_has_jpeg(void) { return 1; }

// Dimensions of a JPEG byte stream (header parse only).  Returns 0 ok.
int ppv_jpeg_dims(const uint8_t* data, size_t len, int* h, int* w) {
  return decode_jpeg_rgb(data, len, nullptr, 0, h, w);
}

// Full decode into caller buffer of capacity out_cap bytes.
int ppv_decode_jpeg(const uint8_t* data, size_t len, uint8_t* out,
                    size_t out_cap, int* h, int* w) {
  return decode_jpeg_rgb(data, len, out, out_cap, h, w);
}

// Bytes -> float batch: decode + center/random-crop + PIL-bilinear
// resize + flip + normalize, one thread-pool pass, no Python in the
// loop.  crops use the SAME geometry contract as ppv_batch_transform
// but relative to the DECODED image; cy/cx < 0 request a centered crop
// of (ch, cw) clamped to the image (the eval-loader default).  Returns
// the number of images that failed to decode (their dst slots are
// zero-filled and ok[i] = 0).
int ppv_batch_decode_transform(const uint8_t** datas, const size_t* lens,
                               const int* cy, const int* cx, const int* ch,
                               const int* cw, const int* flip, float* dst,
                               int dh, int dw, int n, const float* mean,
                               const float* stdv, int* ok, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> pool;
  std::size_t per = (size_t)dh * dw * 3;
  std::vector<int> fails(n_threads, 0);
  auto work = [&](int t) {
    std::vector<uint8_t> scratch;
    for (int i = t; i < n; i += n_threads) {
      int h = 0, w = 0;
      if (decode_jpeg_rgb(datas[i], lens[i], nullptr, 0, &h, &w) != 0 ||
          h <= 0 || w <= 0) {
        std::memset(dst + (size_t)i * per, 0, per * sizeof(float));
        ok[i] = 0;
        ++fails[t];
        continue;
      }
      scratch.resize((size_t)h * w * 3);
      if (decode_jpeg_rgb(datas[i], lens[i], scratch.data(), scratch.size(),
                          &h, &w) != 0) {
        std::memset(dst + (size_t)i * per, 0, per * sizeof(float));
        ok[i] = 0;
        ++fails[t];
        continue;
      }
      int cyy = cy[i], cxx = cx[i], chh = ch[i], cww = cw[i];
      if (chh <= 0 || chh > h) chh = h;
      if (cww <= 0 || cww > w) cww = w;
      if (cyy < 0) cyy = (h - chh) / 2;
      if (cxx < 0) cxx = (w - cww) / 2;
      if (cyy + chh > h) cyy = h - chh;
      if (cxx + cww > w) cxx = w - cww;
      transform_one(scratch.data(), h, w, cyy, cxx, chh, cww,
                    dst + (size_t)i * per, dh, dw, flip[i], mean, stdv);
      ok[i] = 1;
    }
  };
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(work, t);
  for (auto& th : pool) th.join();
  int total = 0;
  for (int f : fails) total += f;
  return total;
}

#else  // !PPV_HAS_JPEG

int ppv_has_jpeg(void) { return 0; }
int ppv_jpeg_dims(const uint8_t*, size_t, int*, int*) { return -1; }
int ppv_decode_jpeg(const uint8_t*, size_t, uint8_t*, size_t, int*, int*) {
  return -1;
}
int ppv_batch_decode_transform(const uint8_t**, const size_t*, const int*,
                               const int*, const int*, const int*, const int*,
                               float*, int, int, int, const float*,
                               const float*, int*, int) {
  return -1;
}

#endif  // PPV_HAS_JPEG

// Batched transform with a thread pool.
// srcs: array of pointers to u8 HWC images; per-image geometry arrays.
void ppv_batch_transform(const uint8_t** srcs, const int* sh, const int* sw,
                         const int* cy, const int* cx, const int* ch,
                         const int* cw, const int* flip, float* dst, int dh,
                         int dw, int n, const float* mean, const float* stdv,
                         int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> pool;
  std::size_t per = (size_t)dh * dw * 3;
  auto work = [&](int t) {
    for (int i = t; i < n; i += n_threads) {
      transform_one(srcs[i], sh[i], sw[i], cy[i], cx[i], ch[i], cw[i],
                    dst + (size_t)i * per, dh, dw, flip[i], mean, stdv);
    }
  };
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(work, t);
  for (auto& th : pool) th.join();
}

// Single-image entry (testing / small paths).
void ppv_transform_one(const uint8_t* src, int sh, int sw, int cy, int cx,
                       int ch, int cw, float* dst, int dh, int dw, int flip) {
  transform_one(src, sh, sw, cy, cx, ch, cw, dst, dh, dw, flip, nullptr,
                nullptr);
}
}
