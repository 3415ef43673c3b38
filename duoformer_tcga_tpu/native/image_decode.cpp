// Native threaded JPEG/PNG batch decode + bilinear resize.
//
// Host-side decode is the throughput ceiling of the image-folder
// ingestion path (data/folder.py): at 2000+ tiles/sec/chip the Python/PIL
// single-image loop cannot keep a chip fed. This decodes a whole batch of
// files in parallel on C++ threads (libjpeg + libpng, both system libs),
// resizing each image to a fixed square during decode so the output is
// one contiguous [n, size, size, 3] uint8 buffer ready to device_put.
// The reference has no data path at all (its dataset module is missing,
// main_toy.py:11); this is new capability.
//
// Build: g++ -O3 -shared -fPIC -o libimage_decode.so image_decode.cpp
//        -ljpeg -lpng -lz -lpthread
// (driven by data/native_decode.py at import time; PIL fallback otherwise.)

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

bool decode_jpeg(const uint8_t* data, size_t len, std::vector<uint8_t>& rgb,
                 int& W, int& H) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;  // grayscale/YCbCr -> RGB in-library
  jpeg_start_decompress(&cinfo);
  W = static_cast<int>(cinfo.output_width);
  H = static_cast<int>(cinfo.output_height);
  if (W <= 0 || H <= 0 ||
      static_cast<int64_t>(W) * H > 64LL * 1024 * 1024) {
    jpeg_destroy_decompress(&cinfo);  // hostile/corrupt header dimensions
    return false;
  }
  rgb.resize(static_cast<size_t>(W) * H * 3);
  const int stride = W * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = rgb.data() + static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_png(const uint8_t* data, size_t len, std::vector<uint8_t>& rgb,
                int& W, int& H) {
  png_image im;
  std::memset(&im, 0, sizeof(im));
  im.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&im, data, len)) return false;
  im.format = PNG_FORMAT_RGB;  // expands gray/palette, strips alpha/16-bit
  W = static_cast<int>(im.width);
  H = static_cast<int>(im.height);
  if (W <= 0 || H <= 0 ||
      static_cast<int64_t>(W) * H > 64LL * 1024 * 1024) {
    png_image_free(&im);  // hostile/corrupt header dimensions
    return false;
  }
  rgb.resize(PNG_IMAGE_SIZE(im));
  if (!png_image_finish_read(&im, nullptr, rgb.data(), 0, nullptr)) {
    png_image_free(&im);
    return false;
  }
  return true;
}

// PIL-convention bilinear (align_corners=False): sample centers at
// (i + 0.5) * scale - 0.5, edge-clamped.
void resize_bilinear(const uint8_t* src, int W, int H, uint8_t* dst, int S) {
  if (W == S && H == S) {
    std::memcpy(dst, src, static_cast<size_t>(S) * S * 3);
    return;
  }
  const float sx = static_cast<float>(W) / S;
  const float sy = static_cast<float>(H) / S;
  for (int oy = 0; oy < S; ++oy) {
    float fy = (oy + 0.5f) * sy - 0.5f;
    if (fy < 0) fy = 0;
    int y0 = static_cast<int>(fy);
    int y1 = y0 + 1 < H ? y0 + 1 : H - 1;
    const float wy = fy - y0;
    for (int ox = 0; ox < S; ++ox) {
      float fx = (ox + 0.5f) * sx - 0.5f;
      if (fx < 0) fx = 0;
      int x0 = static_cast<int>(fx);
      int x1 = x0 + 1 < W ? x0 + 1 : W - 1;
      const float wx = fx - x0;
      const uint8_t* p00 = src + (static_cast<size_t>(y0) * W + x0) * 3;
      const uint8_t* p01 = src + (static_cast<size_t>(y0) * W + x1) * 3;
      const uint8_t* p10 = src + (static_cast<size_t>(y1) * W + x0) * 3;
      const uint8_t* p11 = src + (static_cast<size_t>(y1) * W + x1) * 3;
      uint8_t* o = dst + (static_cast<size_t>(oy) * S + ox) * 3;
      for (int c = 0; c < 3; ++c) {
        const float top = p00[c] + (p01[c] - p00[c]) * wx;
        const float bot = p10[c] + (p11[c] - p10[c]) * wx;
        const float v = top + (bot - top) * wy;
        o[c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

bool read_file(const char* path, std::vector<uint8_t>& buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  const long len = std::ftell(f);
  if (len <= 0) {
    std::fclose(f);
    return false;
  }
  std::fseek(f, 0, SEEK_SET);
  buf.resize(static_cast<size_t>(len));
  const size_t got = std::fread(buf.data(), 1, buf.size(), f);
  std::fclose(f);
  return got == buf.size();
}

// Reject dimensions a crafted/corrupt header could claim (e.g. a PNG
// declaring 100000x100000 would make rgb.resize() throw bad_alloc inside a
// worker thread -> std::terminate kills the whole process). 64 MP is far
// above any real tile.
constexpr int64_t kMaxPixels = 64LL * 1024 * 1024;

bool decode_one(const char* path, int64_t size, uint8_t* out) {
  // Any C++ exception (bad_alloc from a hostile header, etc.) degrades to
  // status 0 — the Python caller substitutes/filters and the PIL fallback
  // takes over — instead of terminating the serving/training process.
  try {
    std::vector<uint8_t> file;
    if (!read_file(path, file) || file.size() < 8) return false;
    std::vector<uint8_t> rgb;
    int W = 0, H = 0;
    bool ok = false;
    if (file[0] == 0xFF && file[1] == 0xD8) {
      ok = decode_jpeg(file.data(), file.size(), rgb, W, H);
    } else if (file[0] == 0x89 && file[1] == 'P' && file[2] == 'N'
               && file[3] == 'G') {
      ok = decode_png(file.data(), file.size(), rgb, W, H);
    }
    if (!ok || W <= 0 || H <= 0) return false;
    if (static_cast<int64_t>(W) * H > kMaxPixels) return false;
    resize_bilinear(rgb.data(), W, H, out, static_cast<int>(size));
    return true;
  } catch (...) {
    return false;
  }
}

}  // namespace

extern "C" {

// paths: n C strings; out: [n, size, size, 3] uint8; status: [n] int32
// (1 = decoded, 0 = failed — caller substitutes/filters).
void decode_resize_batch(const char** paths, int64_t n, int64_t size,
                         uint8_t* out, int32_t* status,
                         int64_t num_threads) {
  const int64_t img_bytes = size * size * 3;
  auto work = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      status[i] = decode_one(paths[i], size, out + i * img_bytes) ? 1 : 0;
    }
  };
  if (num_threads <= 1 || n < 2) {
    work(0, n);
    return;
  }
  std::vector<std::thread> workers;
  const int64_t chunk = (n + num_threads - 1) / num_threads;
  for (int64_t t = 0; t < num_threads && t * chunk < n; ++t) {
    const int64_t lo = t * chunk;
    const int64_t hi = lo + chunk < n ? lo + chunk : n;
    workers.emplace_back(work, lo, hi);
  }
  for (auto& w : workers) w.join();
}

}  // extern "C"
