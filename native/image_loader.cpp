// Native input-pipeline hot path: thread-pooled JPEG/PNG decode with the
// dataset transforms fused in (resize / center-crop / D2C crop), writing
// uint8 NHWC batches directly into a caller-provided buffer.
//
// This replaces the per-image Python/PIL decode in the host loader for
// image-folder datasets (CelebA ~200k JPEGs; SURVEY.md §7 lists the
// CelebA input pipeline as a hard part). Transform semantics follow the
// reference's torchvision chain (reference: data.py:149-186):
//   center_crop: resize smaller edge -> size (bilinear), center crop
//   d2c:         128x128 crop at (cx=89, cy=121), then resize
//   else:        direct resize to (size, size)
//
// C ABI for ctypes. Build: see infodiffusion_tpu/data/native.py.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int w = 0, h = 0;
  std::vector<uint8_t> rgb;  // h*w*3
};

// ---------------------------------------------------------------- JPEG

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

bool decode_jpeg(const uint8_t* buf, size_t len, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), len);
  jpeg_read_header(&cinfo, TRUE);
  if (cinfo.jpeg_color_space == JCS_CMYK ||
      cinfo.jpeg_color_space == JCS_YCCK) {
    // JCS_RGB conversion from CMYK is a fatal libjpeg error; fail the
    // slot so the Python side retries it through PIL (which converts)
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->rgb.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->rgb.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  // libjpeg reports truncated streams as WARNINGS (it inserts a fake
  // EOI and fills with garbage) — error_exit never fires. Treat any
  // corrupt-data warning as a failed decode like PIL does.
  bool clean = cinfo.err->num_warnings == 0;
  jpeg_destroy_decompress(&cinfo);
  return clean;
}

// ----------------------------------------------------------------- PNG

bool decode_png(const uint8_t* buf, size_t len, Image* out) {
  png_image img;
  std::memset(&img, 0, sizeof(img));
  img.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&img, buf, len)) return false;
  // read RGBA and DROP the alpha channel, like PIL's convert('RGB') —
  // asking libpng for PNG_FORMAT_RGB would composite RGBA pixels onto
  // a background instead, diverging from the PIL fallback path
  img.format = PNG_FORMAT_RGBA;
  out->w = img.width;
  out->h = img.height;
  std::vector<uint8_t> rgba(PNG_IMAGE_SIZE(img));
  if (!png_image_finish_read(&img, nullptr, rgba.data(), 0, nullptr)) {
    png_image_free(&img);
    return false;
  }
  size_t n = size_t(out->w) * out->h;
  out->rgb.resize(n * 3);
  for (size_t i = 0; i < n; ++i) {
    out->rgb[i * 3 + 0] = rgba[i * 4 + 0];
    out->rgb[i * 3 + 1] = rgba[i * 4 + 1];
    out->rgb[i * 3 + 2] = rgba[i * 4 + 2];
  }
  return true;
}

bool decode_any(const std::string& path, Image* out) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(n > 0 ? size_t(n) : 0);
  size_t got = buf.empty() ? 0 : std::fread(buf.data(), 1, buf.size(), f);
  std::fclose(f);
  if (got < 4) return false;
  if (buf[0] == 0xFF && buf[1] == 0xD8) return decode_jpeg(buf.data(), got, out);
  if (buf[0] == 0x89 && buf[1] == 0x50) return decode_png(buf.data(), got, out);
  // try jpeg as a fallback sniff
  return decode_jpeg(buf.data(), got, out);
}

// ------------------------------------------------------------- resample

// Antialiased bilinear (triangle-filter) resampling, PIL-compatible:
// filter support scales with the downscale ratio, separable two-pass.
// This matches torchvision's default Resize semantics (antialias on),
// which the reference's transform chains rely on (data.py:124,157-162).

struct FilterTaps {
  std::vector<int> start;       // first source index per output coord
  std::vector<int> count;       // taps per output coord
  std::vector<float> weights;   // flattened [out][count]
  int max_count = 0;
};

FilterTaps build_taps(int src_n, int dst_n) {
  FilterTaps t;
  double scale = double(src_n) / dst_n;
  double support = scale < 1.0 ? 1.0 : scale;  // triangle radius
  t.start.resize(dst_n);
  t.count.resize(dst_n);
  std::vector<std::vector<float>> rows(dst_n);
  for (int o = 0; o < dst_n; ++o) {
    double center = (o + 0.5) * scale;
    int lo = int(std::floor(center - support));
    int hi = int(std::ceil(center + support));
    if (lo < 0) lo = 0;
    if (hi > src_n) hi = src_n;
    double norm = 0.0;
    std::vector<float> w;
    for (int i = lo; i < hi; ++i) {
      double d = (i + 0.5 - center) / (scale < 1.0 ? 1.0 : scale);
      double v = d < 0 ? 1.0 + d : 1.0 - d;  // triangle
      if (v < 0) v = 0;
      w.push_back(float(v));
      norm += v;
    }
    if (norm <= 0) {  // degenerate: nearest
      lo = int(center);
      if (lo >= src_n) lo = src_n - 1;
      hi = lo + 1;
      w.assign(1, 1.0f);
      norm = 1.0;
    }
    for (auto& v : w) v = float(v / norm);
    t.start[o] = lo;
    t.count[o] = int(w.size());
    if (t.count[o] > t.max_count) t.max_count = t.count[o];
    rows[o] = std::move(w);
  }
  for (auto& r : rows)
    t.weights.insert(t.weights.end(), r.begin(), r.end());
  return t;
}

void resize_bilinear(const Image& src, int dw, int dh, uint8_t* dst) {
  FilterTaps tx = build_taps(src.w, dw);
  FilterTaps ty = build_taps(src.h, dh);
  // horizontal pass: [src.h, dw, 3] float
  std::vector<float> mid(size_t(src.h) * dw * 3);
  for (int y = 0; y < src.h; ++y) {
    const uint8_t* row = src.rgb.data() + size_t(y) * src.w * 3;
    float* mrow = mid.data() + size_t(y) * dw * 3;
    const float* wbase = tx.weights.data();
    size_t woff = 0;
    for (int x = 0; x < dw; ++x) {
      float acc0 = 0, acc1 = 0, acc2 = 0;
      int s = tx.start[x], c = tx.count[x];
      for (int k = 0; k < c; ++k) {
        float w = wbase[woff + k];
        const uint8_t* p = row + size_t(s + k) * 3;
        acc0 += w * p[0];
        acc1 += w * p[1];
        acc2 += w * p[2];
      }
      woff += c;
      mrow[x * 3 + 0] = acc0;
      mrow[x * 3 + 1] = acc1;
      mrow[x * 3 + 2] = acc2;
    }
  }
  // vertical pass
  size_t woff = 0;
  for (int y = 0; y < dh; ++y) {
    int s = ty.start[y], c = ty.count[y];
    uint8_t* drow = dst + size_t(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      float acc0 = 0, acc1 = 0, acc2 = 0;
      for (int k = 0; k < c; ++k) {
        float w = ty.weights[woff + k];
        const float* p = mid.data() + (size_t(s + k) * dw + x) * 3;
        acc0 += w * p[0];
        acc1 += w * p[1];
        acc2 += w * p[2];
      }
      drow[x * 3 + 0] = uint8_t(acc0 < 0 ? 0 : (acc0 > 255 ? 255 : acc0 + 0.5f));
      drow[x * 3 + 1] = uint8_t(acc1 < 0 ? 0 : (acc1 > 255 ? 255 : acc1 + 0.5f));
      drow[x * 3 + 2] = uint8_t(acc2 < 0 ? 0 : (acc2 > 255 ? 255 : acc2 + 0.5f));
    }
    woff += c;
  }
}

// crop the (x0, y0, w, h) window into dst (w*h*3, zero-padded outside
// the source bounds) — writing straight into the caller's buffer so the
// center-crop hot path (CelebA, ~200k images/epoch) skips a copy
void crop_into(const Image& src, int x0, int y0, int w, int h,
               uint8_t* dst) {
  std::memset(dst, 0, size_t(w) * h * 3);
  for (int y = 0; y < h; ++y) {
    int sy = y0 + y;
    if (sy < 0 || sy >= src.h) continue;
    int xs = x0 < 0 ? -x0 : 0;
    int xe = (x0 + w > src.w) ? src.w - x0 : w;
    if (xe <= xs) continue;
    std::memcpy(dst + (size_t(y) * w + xs) * 3,
                src.rgb.data() + (size_t(sy) * src.w + x0 + xs) * 3,
                size_t(xe - xs) * 3);
  }
}

void crop(const Image& src, int x0, int y0, int w, int h, Image* out) {
  out->w = w;
  out->h = h;
  out->rgb.resize(size_t(w) * h * 3);
  crop_into(src, x0, y0, w, h, out->rgb.data());
}

struct Loader {
  std::vector<std::string> paths;
  int size;
  int center_crop;
  int d2c;
  int threads;
};

bool transform_one(const Loader& L, const std::string& path, uint8_t* out) {
  Image img;
  if (!decode_any(path, &img)) return false;
  const int S = L.size;
  if (L.d2c) {
    // D2C 128px window at (cx=89, cy=121) (reference: data.py:24-32)
    Image c;
    crop(img, 89 - 64, 121 - 64, 128, 128, &c);
    resize_bilinear(c, S, S, out);
  } else if (L.center_crop) {
    // double + nearbyint (round-half-even) to match the PIL fallback's
    // Python round() exactly at .5 scale boundaries (datasets.py:121)
    double scale = double(S) / (img.w < img.h ? img.w : img.h);
    int nw = int(std::nearbyint(img.w * scale));
    int nh = int(std::nearbyint(img.h * scale));
    std::vector<uint8_t> tmp(size_t(nw) * nh * 3);
    resize_bilinear(img, nw, nh, tmp.data());
    Image r;
    r.w = nw;
    r.h = nh;
    r.rgb = std::move(tmp);
    crop_into(r, (nw - S) / 2, (nh - S) / 2, S, S, out);
  } else {
    resize_bilinear(img, S, S, out);
  }
  return true;
}

}  // namespace

extern "C" {

void* idl_create(const char** paths, int n, int size, int center_crop,
                 int d2c, int threads) {
  auto* L = new Loader;
  L->paths.reserve(n);
  for (int i = 0; i < n; ++i) L->paths.emplace_back(paths[i]);
  L->size = size;
  L->center_crop = center_crop;
  L->d2c = d2c;
  L->threads = threads > 0 ? threads : int(std::thread::hardware_concurrency());
  return L;
}

void idl_destroy(void* h) { delete static_cast<Loader*>(h); }

// decode batch of dataset indices into out [b, size, size, 3] uint8;
// returns number of failures. Failed slots are zero-filled and marked
// 1 in the caller's `failed` mask (length b, may be NULL) so the
// Python side can retry exactly those files through PIL (which handles
// color spaces libjpeg conversion rejects, e.g. CMYK).
int idl_decode_batch(void* h, const int* idx, int b, uint8_t* out,
                     uint8_t* failed) {
  auto* L = static_cast<Loader*>(h);
  const size_t stride = size_t(L->size) * L->size * 3;
  if (failed) std::memset(failed, 0, size_t(b));
  std::atomic<int> next(0), fails(0);
  int nthreads = L->threads < b ? L->threads : b;
  if (nthreads < 1) nthreads = 1;
  std::vector<std::thread> ts;
  ts.reserve(nthreads);
  for (int t = 0; t < nthreads; ++t) {
    ts.emplace_back([&]() {
      for (int i = next.fetch_add(1); i < b; i = next.fetch_add(1)) {
        uint8_t* dst = out + stride * i;
        int j = idx[i];
        if (j < 0 || j >= int(L->paths.size()) ||
            !transform_one(*L, L->paths[j], dst)) {
          std::memset(dst, 0, stride);
          if (failed) failed[i] = 1;
          fails.fetch_add(1);
        }
      }
    });
  }
  for (auto& th : ts) th.join();
  return fails.load();
}

}  // extern "C"

// ------------------------------------------------------------ PNG writer
//
// Thread-pooled batch PNG writer for eval_fid's 10k-image dumps
// (reference writes one PIL PNG at a time, run.py:289-295).

extern "C" {

// data: [b, h, w, c] uint8 (c == 1 or 3); returns number of failures
int idl_write_png_batch(const char** paths, const uint8_t* data, int b,
                        int h, int w, int c, int threads) {
  if (c != 1 && c != 3) return b;
  const size_t stride = size_t(h) * w * c;
  std::atomic<int> next(0), fails(0);
  int nthreads = threads > 0 ? threads
                             : int(std::thread::hardware_concurrency());
  if (nthreads > b) nthreads = b;
  if (nthreads < 1) nthreads = 1;
  std::vector<std::thread> ts;
  ts.reserve(nthreads);
  for (int t = 0; t < nthreads; ++t) {
    ts.emplace_back([&]() {
      for (int i = next.fetch_add(1); i < b; i = next.fetch_add(1)) {
        png_image img;
        std::memset(&img, 0, sizeof(img));
        img.version = PNG_IMAGE_VERSION;
        img.width = w;
        img.height = h;
        img.format = (c == 3) ? PNG_FORMAT_RGB : PNG_FORMAT_GRAY;
        if (!png_image_write_to_file(&img, paths[i], 0,
                                     data + stride * i, 0, nullptr)) {
          fails.fetch_add(1);
        }
        png_image_free(&img);
      }
    });
  }
  for (auto& th : ts) th.join();
  return fails.load();
}

}  // extern "C"
