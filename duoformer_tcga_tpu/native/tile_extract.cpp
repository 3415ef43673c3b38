// Native tile extraction for the WSI streaming path.
//
// Hot host-side loop of the "streamed WSI tile workload": gathers batches
// of [tile, tile, 3] uint8 tiles from a (possibly memory-mapped) decoded
// WSI plane into a contiguous batch buffer the JAX pipeline device_puts.
// Row-wise memcpy per tile; threaded across tiles when cores allow.
// The reference has no data path at all (its dataset module is missing,
// main_toy.py:11); this is new capability.
//
// Build: g++ -O3 -shared -fPIC -o libtile_extract.so tile_extract.cpp -lpthread
// (driven by data/wsi.py at import time; pure-numpy fallback otherwise).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// plane: [H, W, C] uint8, row-major. coords: n pairs (y, x) of tile
// origins. out: [n, tile, tile, C].
void extract_tiles(const uint8_t* plane, int64_t H, int64_t W, int64_t C,
                   const int64_t* coords, int64_t n, int64_t tile,
                   uint8_t* out, int64_t num_threads) {
  const int64_t row_bytes = tile * C;
  const int64_t tile_bytes = tile * row_bytes;

  auto copy_range = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      const int64_t y = coords[2 * i], x = coords[2 * i + 1];
      const uint8_t* src = plane + (y * W + x) * C;
      uint8_t* dst = out + i * tile_bytes;
      for (int64_t r = 0; r < tile; ++r) {
        std::memcpy(dst + r * row_bytes, src + r * W * C, row_bytes);
      }
    }
  };

  if (num_threads <= 1 || n < 4) {
    copy_range(0, n);
    return;
  }
  std::vector<std::thread> workers;
  const int64_t chunk = (n + num_threads - 1) / num_threads;
  for (int64_t t = 0; t < num_threads && t * chunk < n; ++t) {
    const int64_t lo = t * chunk;
    const int64_t hi = lo + chunk < n ? lo + chunk : n;
    workers.emplace_back(copy_range, lo, hi);
  }
  for (auto& w : workers) w.join();
}

// 2x2 box-filter downsample (uint8), for pyramid level synthesis on host.
void downsample2x(const uint8_t* plane, int64_t H, int64_t W, int64_t C,
                  uint8_t* out) {
  const int64_t OH = H / 2, OW = W / 2;
  for (int64_t y = 0; y < OH; ++y) {
    for (int64_t x = 0; x < OW; ++x) {
      for (int64_t c = 0; c < C; ++c) {
        const int64_t a = plane[((2 * y) * W + 2 * x) * C + c];
        const int64_t b = plane[((2 * y) * W + 2 * x + 1) * C + c];
        const int64_t d = plane[((2 * y + 1) * W + 2 * x) * C + c];
        const int64_t e = plane[((2 * y + 1) * W + 2 * x + 1) * C + c];
        out[(y * OW + x) * C + c] = static_cast<uint8_t>((a + b + d + e + 2) / 4);
      }
    }
  }
}

}  // extern "C"
