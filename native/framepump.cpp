// Native host runtime: frame decode + crop/grayscale pump.
//
// The reference's host-side hot path lives inside OpenCV C++ (VideoCapture,
// imdecode, cvtColor — SURVEY.md §2.2). This is the rebuild's first-party
// equivalent: a small C++ library, driven from Python via ctypes, that
// decodes HDF5-stored JPEG frames and produces cropped fixed-point grayscale
// window batches with a std::thread worker pool — the exact bytes the TPU
// consumes, prepared off the GIL.
//
// Grayscale matches OpenCV (and ops/color.py) bit-exactly:
//     y = (r*9798 + g*19235 + b*3735 + (1 << 14)) >> 15
//
// Build: g++ -O3 -march=native -shared -fPIC framepump.cpp -o libframepump.so -ljpeg -lpthread

#include <cstdint>
#include <cstring>
#include <csetjmp>
#include <cstdio>
#include <thread>
#include <vector>

#include <jpeglib.h>

extern "C" {

// ---------------------------------------------------------------------------
// Fixed-point BGR -> grayscale with crop, batched + threaded.
// frames: n contiguous (H, W, 3) uint8 BGR images.
// out:    n contiguous (y2-y1, x2-x1) uint8 grayscale crops.
// ---------------------------------------------------------------------------
static void gray_crop_one(const uint8_t* frame, int H, int W, int y1, int y2,
                          int x1, int x2, uint8_t* out) {
  const int cw = x2 - x1;
  for (int y = y1; y < y2; ++y) {
    const uint8_t* row = frame + (static_cast<size_t>(y) * W + x1) * 3;
    uint8_t* orow = out + static_cast<size_t>(y - y1) * cw;
    for (int x = 0; x < cw; ++x) {
      const int b = row[3 * x + 0];
      const int g = row[3 * x + 1];
      const int r = row[3 * x + 2];
      orow[x] = static_cast<uint8_t>((r * 9798 + g * 19235 + b * 3735 + (1 << 14)) >> 15);
    }
  }
}

void swt_gray_crop_batch(const uint8_t* frames, int n, int H, int W, int y1,
                         int y2, int x1, int x2, uint8_t* out, int n_threads) {
  const size_t fstride = static_cast<size_t>(H) * W * 3;
  const size_t ostride = static_cast<size_t>(y2 - y1) * (x2 - x1);
  if (n_threads <= 1 || n == 1) {
    for (int i = 0; i < n; ++i)
      gray_crop_one(frames + i * fstride, H, W, y1, y2, x1, x2, out + i * ostride);
    return;
  }
  std::vector<std::thread> pool;
  const int per = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int lo = t * per, hi = std::min(n, lo + per);
    if (lo >= hi) break;
    pool.emplace_back([=]() {
      for (int i = lo; i < hi; ++i)
        gray_crop_one(frames + i * fstride, H, W, y1, y2, x1, x2, out + i * ostride);
    });
  }
  for (auto& th : pool) th.join();
}

// ---------------------------------------------------------------------------
// JPEG decode (libjpeg) to BGR, matching cv2.imdecode channel order.
// Returns 0 on success; fills *h/*w. Fails (-1) on decode error or if the
// image exceeds max_h x max_w.
// ---------------------------------------------------------------------------
struct swt_jpeg_err {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void swt_jpeg_fail(j_common_ptr cinfo) {
  swt_jpeg_err* e = reinterpret_cast<swt_jpeg_err*>(cinfo->err);
  longjmp(e->jb, 1);
}

int swt_decode_jpeg_bgr(const uint8_t* data, size_t len, uint8_t* out,
                        int max_h, int max_w, int* h, int* w) {
  jpeg_decompress_struct cinfo;
  swt_jpeg_err jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = swt_jpeg_fail;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_EXT_BGR;
  jpeg_start_decompress(&cinfo);
  const int H = cinfo.output_height, W = cinfo.output_width;
  if (H > max_h || W > max_w || cinfo.output_components != 3) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + static_cast<size_t>(cinfo.output_scanline) * W * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *h = H;
  *w = W;
  return 0;
}

// ---------------------------------------------------------------------------
// Window pump: decode n JPEG buffers and emit cropped grayscale directly,
// threaded (the HDF5 -> TPU-bytes hot path, one call per window batch).
// bufs: concatenated encoded bytes; offsets[i]..offsets[i+1] delimit frame i.
// Returns the number of successfully decoded frames (failures leave zeros).
// ---------------------------------------------------------------------------
int swt_decode_window_gray(const uint8_t* bufs, const int64_t* offsets, int n,
                           int H, int W, int y1, int y2, int x1, int x2,
                           uint8_t* gray_out, uint8_t* ok_out, int n_threads) {
  const size_t ostride = static_cast<size_t>(y2 - y1) * (x2 - x1);
  std::vector<int> ok(n, 0);
  auto work = [&](int lo, int hi) {
    std::vector<uint8_t> bgr(static_cast<size_t>(H) * W * 3);
    for (int i = lo; i < hi; ++i) {
      int dh = 0, dw = 0;
      const uint8_t* p = bufs + offsets[i];
      const size_t len = static_cast<size_t>(offsets[i + 1] - offsets[i]);
      if (swt_decode_jpeg_bgr(p, len, bgr.data(), H, W, &dh, &dw) == 0 &&
          dh == H && dw == W) {
        gray_crop_one(bgr.data(), H, W, y1, y2, x1, x2, gray_out + i * ostride);
        ok[i] = 1;
      } else {
        std::memset(gray_out + i * ostride, 0, ostride);
      }
    }
  };
  if (n_threads <= 1 || n == 1) {
    work(0, n);
  } else {
    std::vector<std::thread> pool;
    const int per = (n + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
      const int lo = t * per, hi = std::min(n, lo + per);
      if (lo >= hi) break;
      pool.emplace_back(work, lo, hi);
    }
    for (auto& th : pool) th.join();
  }
  int total = 0;
  for (int i = 0; i < n; ++i) {
    if (ok_out) ok_out[i] = static_cast<uint8_t>(ok[i]);
    total += ok[i];
  }
  return total;
}

}  // extern "C"
