// sdbc_tpu native data-loader core.
//
// Replaces the torch DataLoader's C++ worker path (reference utils.py:173-174,
// SURVEY.md E11) with a small self-contained library: threaded JPEG decode
// (libjpeg) + separable cubic-convolution resize with PIL-style adaptive
// support on downscale + [-1,1] float normalisation, writing straight into a
// caller-provided NHWC float buffer (zero Python-side copies).
//
// C ABI (ctypes-friendly):
//   sdbc_decode_batch(paths, n, size, out, threads) -> #failures
//   sdbc_decode_probe(path, &w, &h)                 -> 0 ok / -1 bad
//
// Build: make -C native   (g++ -O3 -shared -fPIC loader.cc -ljpeg)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode a JPEG file to 8-bit RGB. Returns false on any decode error.
bool decode_jpeg(const char* path, std::vector<unsigned char>* rgb, int* w,
                 int* h) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  // declared BEFORE setjmp: a longjmp from a mid-decode error must not
  // skip the vector's destructor (UB + per-corrupt-image heap leak)
  std::vector<unsigned char*> rows;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  rgb->resize(size_t(*w) * (*h) * 3);
  rows.resize(*h);
  for (int y = 0; y < *h; ++y) rows[y] = rgb->data() + size_t(y) * (*w) * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    jpeg_read_scanlines(&cinfo, rows.data() + cinfo.output_scanline,
                        cinfo.output_height - cinfo.output_scanline);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// Keys cubic convolution kernel, a = -0.5 (PIL BICUBIC).
inline double cubic(double x) {
  constexpr double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

// One resample axis: precomputed contribution lists (PIL-style adaptive
// support: kernel stretched by the scale factor when downscaling).
struct Contribs {
  std::vector<int> start;          // first source index per output pixel
  std::vector<int> count;          // taps per output pixel
  std::vector<float> weights;      // flattened [out][tap]
  int max_taps = 0;
};

Contribs build_contribs(int in_size, int out_size) {
  Contribs c;
  double scale = double(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = 2.0 * filterscale;  // cubic support = 2
  c.max_taps = int(std::ceil(support)) * 2 + 1;
  c.start.resize(out_size);
  c.count.resize(out_size);
  c.weights.resize(size_t(out_size) * c.max_taps);
  for (int i = 0; i < out_size; ++i) {
    double center = (i + 0.5) * scale;
    int lo = std::max(int(center - support + 0.5), 0);
    int hi = std::min(int(center + support + 0.5), in_size);
    double wsum = 0.0;
    int n = hi - lo;
    for (int j = 0; j < n; ++j) {
      double w = cubic((lo + j + 0.5 - center) / filterscale);
      c.weights[size_t(i) * c.max_taps + j] = float(w);
      wsum += w;
    }
    if (wsum != 0.0)
      for (int j = 0; j < n; ++j)
        c.weights[size_t(i) * c.max_taps + j] =
            float(c.weights[size_t(i) * c.max_taps + j] / wsum);
    c.start[i] = lo;
    c.count[i] = n;
  }
  return c;
}

// Separable resize uint8 RGB (h,w) -> float32 [-1,1] (size,size) NHWC slice.
void resize_normalize(const unsigned char* src, int w, int h, int size,
                      float* out) {
  Contribs cx = build_contribs(w, size);
  Contribs cy = build_contribs(h, size);
  // horizontal pass: (h, w, 3) -> (h, size, 3) floats
  std::vector<float> tmp(size_t(h) * size * 3);
  for (int y = 0; y < h; ++y) {
    const unsigned char* row = src + size_t(y) * w * 3;
    float* trow = tmp.data() + size_t(y) * size * 3;
    for (int x = 0; x < size; ++x) {
      float acc0 = 0, acc1 = 0, acc2 = 0;
      int s = cx.start[x], n = cx.count[x];
      const float* wts = cx.weights.data() + size_t(x) * cx.max_taps;
      const unsigned char* px = row + size_t(s) * 3;
      for (int j = 0; j < n; ++j, px += 3) {
        acc0 += wts[j] * px[0];
        acc1 += wts[j] * px[1];
        acc2 += wts[j] * px[2];
      }
      trow[size_t(x) * 3 + 0] = acc0;
      trow[size_t(x) * 3 + 1] = acc1;
      trow[size_t(x) * 3 + 2] = acc2;
    }
  }
  // vertical pass + clamp + normalize to [-1, 1]; taps outer so the inner
  // loop over the full row auto-vectorizes
  int row_elems = size * 3;
  std::vector<float> acc(row_elems);
  for (int y = 0; y < size; ++y) {
    int s = cy.start[y], n = cy.count[y];
    const float* wts = cy.weights.data() + size_t(y) * cy.max_taps;
    std::fill(acc.begin(), acc.end(), 0.0f);
    for (int j = 0; j < n; ++j) {
      const float* trow = tmp.data() + size_t(s + j) * row_elems;
      float wj = wts[j];
      for (int x = 0; x < row_elems; ++x) acc[x] += wj * trow[x];
    }
    float* orow = out + size_t(y) * row_elems;
    for (int x = 0; x < row_elems; ++x) {
      float v = std::min(std::max(acc[x], 0.0f), 255.0f);
      orow[x] = v * (1.0f / 127.5f) - 1.0f;
    }
  }
}

}  // namespace

extern "C" {

// Decode+resize+normalize n JPEGs into out (n*size*size*3 float32, NHWC).
// Failed images are zero-filled. Returns the number of failures.
int sdbc_decode_batch(const char** paths, int n, int size, float* out,
                      int threads) {
  std::atomic<int> next(0), failures(0);
  threads = std::max(1, std::min(threads, n));
  auto worker = [&]() {
    std::vector<unsigned char> rgb;
    int w, h;
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      float* dst = out + size_t(i) * size * size * 3;
      if (decode_jpeg(paths[i], &rgb, &w, &h)) {
        resize_normalize(rgb.data(), w, h, size, dst);
      } else {
        std::memset(dst, 0, size_t(size) * size * 3 * sizeof(float));
        failures.fetch_add(1);
      }
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

// Readability probe (notebook cell 3/17 integrity checks). 0 = ok.
int sdbc_decode_probe(const char* path, int* w, int* h) {
  std::vector<unsigned char> rgb;
  return decode_jpeg(path, &rgb, w, h) ? 0 : -1;
}

}  // extern "C"
