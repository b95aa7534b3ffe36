// Native batch loader: JPEG decode + affine crop + batch assembly.
//
// The reference feeds its GPU from 14 Python DataLoader workers doing
// cv2.imread + cv2.warpAffine per item (ContextPose/train.py:49-120,
// mvn/datasets/human36m.py:569-571). Here the whole per-item pipeline runs in
// C++ behind one ctypes call that releases the GIL: read file -> libjpeg
// decode (BGR, matching cv2's channel order) -> bilinear warpAffine into a
// preallocated uint8 batch buffer, fanned out over a std::thread pool.
//
// Exposed C ABI (ctypes; see contextaware_poseformer_tpu/data/native_loader.py):
//   fl_load_crop_batch(paths, n, trans, out, in_precropped, out_h, out_w,
//                      n_threads) -> 0 on success, else 1-based index of the
//                      first failed item (negated).
//
// Build: g++ -O3 -fPIC -shared -o libfastloader.so fastloader.cpp -ljpeg -lpthread

#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG file to tightly-packed BGR uint8. Returns false on failure.
bool decode_jpeg_bgr(const char* path, std::vector<uint8_t>& out, int* h,
                     int* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  cinfo.dct_method = JDCT_ISLOW;  // accuracy over speed; matches cv2 defaults
  jpeg_start_decompress(&cinfo);

  *w = static_cast<int>(cinfo.output_width);
  *h = static_cast<int>(cinfo.output_height);
  out.resize(static_cast<size_t>(*h) * *w * 3);
  std::vector<uint8_t> row(static_cast<size_t>(*w) * 3);
  JSAMPROW rowptr = row.data();
  for (int y = 0; y < *h; ++y) {
    jpeg_read_scanlines(&cinfo, &rowptr, 1);
    uint8_t* dst = out.data() + static_cast<size_t>(y) * *w * 3;
    for (int x = 0; x < *w; ++x) {  // RGB -> BGR (cv2 convention)
      dst[3 * x + 0] = row[3 * x + 2];
      dst[3 * x + 1] = row[3 * x + 1];
      dst[3 * x + 2] = row[3 * x + 0];
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// Bilinear warpAffine with zero border (cv2 INTER_LINEAR semantics in float).
// trans is the FORWARD 2x3 src->dst map (utils/geometry.get_affine_transform);
// we invert it here.
void warp_affine(const uint8_t* src, int sh, int sw, const double* trans,
                 uint8_t* dst, int dh, int dw) {
  const double a = trans[0], b = trans[1], c = trans[2];
  const double d = trans[3], e = trans[4], f = trans[5];
  const double det = a * e - b * d;
  const double ia = e / det, ib = -b / det;
  const double id = -d / det, ie = a / det;
  const double ic = -(ia * c + ib * f);
  const double if_ = -(id * c + ie * f);

  for (int y = 0; y < dh; ++y) {
    for (int x = 0; x < dw; ++x) {
      const double sx = ia * x + ib * y + ic;
      const double sy = id * x + ie * y + if_;
      const int x0 = static_cast<int>(std::floor(sx));
      const int y0 = static_cast<int>(std::floor(sy));
      const double wx = sx - x0, wy = sy - y0;
      uint8_t* out = dst + (static_cast<size_t>(y) * dw + x) * 3;
      for (int ch = 0; ch < 3; ++ch) {
        double acc = 0.0;
        for (int dy = 0; dy < 2; ++dy) {
          for (int dx = 0; dx < 2; ++dx) {
            const int yy = y0 + dy, xx = x0 + dx;
            if (yy < 0 || yy >= sh || xx < 0 || xx >= sw) continue;
            const double wgt = (dy ? wy : 1.0 - wy) * (dx ? wx : 1.0 - wx);
            acc += wgt * src[(static_cast<size_t>(yy) * sw + xx) * 3 + ch];
          }
        }
        double v = std::nearbyint(acc);
        out[ch] = static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
      }
    }
  }
}

}  // namespace

extern "C" {

// paths: n zero-terminated strings, concatenated with '\0' separators
// trans: n x 6 doubles (forward 2x3 affines); ignored when precropped != 0
// out: n * out_h * out_w * 3 uint8
int fl_load_crop_batch(const char* paths_blob, const int* path_offsets, int n,
                       const double* trans, uint8_t* out, int precropped,
                       int out_h, int out_w, int n_threads) {
  std::atomic<int> next(0);
  std::atomic<int> failed(0);
  const size_t item_bytes = static_cast<size_t>(out_h) * out_w * 3;

  auto worker = [&]() {
    std::vector<uint8_t> img;
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n || failed.load() != 0) return;
      const char* path = paths_blob + path_offsets[i];
      int h = 0, w = 0;
      if (!decode_jpeg_bgr(path, img, &h, &w)) {
        int expect = 0;
        failed.compare_exchange_strong(expect, i + 1);
        return;
      }
      uint8_t* slot = out + item_bytes * i;
      if (precropped && h == out_h && w == out_w) {
        std::memcpy(slot, img.data(), item_bytes);
      } else {
        warp_affine(img.data(), h, w, trans + 6 * i, slot, out_h, out_w);
      }
    }
  };

  int threads = n_threads > 0 ? n_threads : 1;
  if (threads > n) threads = n;
  std::vector<std::thread> pool;
  pool.reserve(threads);
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return -failed.load();
}

// single-image decode helper (testing / tooling)
int fl_decode_jpeg(const char* path, uint8_t* out, int max_bytes, int* h,
                   int* w) {
  std::vector<uint8_t> img;
  if (!decode_jpeg_bgr(path, img, h, w)) return -1;
  if (static_cast<int>(img.size()) > max_bytes) return -2;
  std::memcpy(out, img.data(), img.size());
  return static_cast<int>(img.size());
}

}  // extern "C"
