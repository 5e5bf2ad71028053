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
#include <algorithm>
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


// ---------------------------------------------------------------------------
// AVI / MJPEG container parser: first-party replacement for
// cv2.VideoCapture on the reference's own capture format (MJPG-in-AVI is
// what OpenCV's VideoWriter produces and what surveillance rigs emit).
// Strictly sequential, mirroring io_video.py:142-163 semantics: open scans
// the movi list once to build the frame table; each read decodes the next
// chunk or reports a decode error / end of stream.  Non-MJPG AVIs fail
// open() and the Python caller falls back to cv2.
// ---------------------------------------------------------------------------
struct SwtAvi {
  FILE* f = nullptr;
  std::vector<int64_t> offs;    // data offset of each video chunk
  std::vector<uint32_t> sizes;  // payload size of each video chunk
  size_t pos = 0;               // next frame index
  int width = 0, height = 0, total_header = 0;
  int video_stream = -1;        // strl index of the vids stream (chunk ids
                                // are "##dc"/"##db" with ## = that index —
                                // audio-first AVIs put video at stream 01)
  double fps = 0.0;
};

static bool rd(FILE* f, void* p, size_t n) { return fread(p, 1, n, f) == n; }

static bool rd_u32(FILE* f, uint32_t* v) { return rd(f, v, 4); }

static bool tag_eq(const char t[4], const char* s) {
  return std::memcmp(t, s, 4) == 0;
}

// Scan the chunks of a list that ends at byte `end`; record the video
// stream's data chunks ("##dc"/"##db" where ## is the stream's strl index)
// and recurse into "rec " lists.
static void scan_movi(SwtAvi* a, int64_t end, int64_t file_size) {
  const int vs = a->video_stream < 0 ? 0 : a->video_stream;
  const char c0 = static_cast<char>('0' + vs / 10);
  const char c1 = static_cast<char>('0' + vs % 10);
  while (true) {
    int64_t at = ftell(a->f);
    if (at < 0 || at + 8 > end) break;
    char tag[4];
    uint32_t sz;
    if (!rd(a->f, tag, 4) || !rd_u32(a->f, &sz)) break;
    int64_t data_at = at + 8;
    if (tag_eq(tag, "LIST")) {
      char kind[4];
      if (!rd(a->f, kind, 4)) break;
      if (tag_eq(kind, "rec ")) {
        scan_movi(a, data_at + sz, file_size);
      }
      fseek(a->f, data_at + sz + (sz & 1), SEEK_SET);
      continue;
    }
    if ((tag[2] == 'd' && (tag[3] == 'c' || tag[3] == 'b')) && tag[0] == c0 &&
        tag[1] == c1 && sz > 0) {
      // a chunk cut off by file truncation is CLAMPED, not dropped:
      // libjpeg (like FFmpeg in cv2) salvages the partial scan data, so
      // the error accounting matches the cv2 path frame for frame
      int64_t avail = file_size - data_at;
      if (avail > 0) {
        a->offs.push_back(data_at);
        a->sizes.push_back(static_cast<uint32_t>(
            std::min<int64_t>(sz, avail)));
      }
    }
    fseek(a->f, data_at + sz + (sz & 1), SEEK_SET);
  }
  fseek(a->f, end, SEEK_SET);
}

void* swt_avi_open(const char* path, int* n_frames, double* fps, int* width,
                   int* height) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  fseek(f, 0, SEEK_END);
  const int64_t file_size = ftell(f);
  fseek(f, 0, SEEK_SET);

  char tag[4], kind[4];
  uint32_t sz;
  if (!rd(f, tag, 4) || !tag_eq(tag, "RIFF") || !rd_u32(f, &sz) ||
      !rd(f, kind, 4) || !tag_eq(kind, "AVI ")) {
    fclose(f);
    return nullptr;
  }

  SwtAvi* a = new SwtAvi();
  a->f = f;
  bool mjpg = false;
  uint32_t us_per_frame = 0, scale = 0, rate = 0;

  // top-level walk
  while (true) {
    int64_t at = ftell(f);
    if (at < 0 || at + 8 > file_size) break;
    if (!rd(f, tag, 4) || !rd_u32(f, &sz)) break;
    int64_t data_at = at + 8;
    if (tag_eq(tag, "LIST")) {
      if (!rd(f, kind, 4)) break;
      int64_t list_end = data_at + sz;
      if (tag_eq(kind, "hdrl")) {
        // walk hdrl: avih + per-stream strl lists (in stream-index order)
        int strl_index = -1;
        while (true) {
          int64_t hat = ftell(f);
          if (hat + 8 > list_end) break;
          char t2[4];
          uint32_t s2;
          if (!rd(f, t2, 4) || !rd_u32(f, &s2)) break;
          int64_t d2 = hat + 8;
          if (tag_eq(t2, "avih") && s2 >= 40) {
            uint32_t v[10];
            if (rd(f, v, 40)) {
              us_per_frame = v[0];
              a->total_header = static_cast<int>(v[4]);
              a->width = static_cast<int>(v[8]);
              a->height = static_cast<int>(v[9]);
            }
          } else if (tag_eq(t2, "LIST")) {
            char k2[4];
            if (!rd(f, k2, 4)) break;
            if (tag_eq(k2, "strl")) {
              strl_index += 1;
              int64_t strl_end = d2 + s2;
              bool vids = false;
              while (true) {
                int64_t sat = ftell(f);
                if (sat + 8 > strl_end) break;
                char t3[4];
                uint32_t s3;
                if (!rd(f, t3, 4) || !rd_u32(f, &s3)) break;
                int64_t d3 = sat + 8;
                if (tag_eq(t3, "strh") && s3 >= 32) {
                  char fcc[8];
                  uint32_t v3[6];
                  if (rd(f, fcc, 8) && rd(f, v3, 24)) {
                    vids = std::memcmp(fcc, "vids", 4) == 0;
                    if (vids) {
                      if (a->video_stream < 0) a->video_stream = strl_index;
                      if (std::memcmp(fcc + 4, "MJPG", 4) == 0 ||
                          std::memcmp(fcc + 4, "mjpg", 4) == 0)
                        mjpg = true;
                      // AVISTREAMHEADER: dwFlags, wPriority|wLanguage,
                      // dwInitialFrames, dwScale, dwRate, dwStart
                      scale = v3[3];
                      rate = v3[4];
                    }
                  }
                } else if (tag_eq(t3, "strf") && vids && s3 >= 20) {
                  uint8_t bih[20];
                  if (rd(f, bih, 20) && std::memcmp(bih + 16, "MJPG", 4) == 0)
                    mjpg = true;
                }
                fseek(f, d3 + s3 + (s3 & 1), SEEK_SET);
              }
              fseek(f, strl_end + (s2 & 1), SEEK_SET);
              continue;
            }
          }
          fseek(f, d2 + s2 + (s2 & 1), SEEK_SET);
        }
        fseek(f, list_end + (sz & 1), SEEK_SET);
        continue;
      }
      if (tag_eq(kind, "movi")) {
        scan_movi(a, list_end, file_size);
        fseek(f, list_end + (sz & 1), SEEK_SET);
        continue;
      }
      fseek(f, list_end + (sz & 1), SEEK_SET);
      continue;
    }
    fseek(f, data_at + sz + (sz & 1), SEEK_SET);
  }

  if (!mjpg || a->offs.empty()) {
    fclose(f);
    delete a;
    return nullptr;
  }
  if (rate > 0 && scale > 0)
    a->fps = static_cast<double>(rate) / scale;
  else if (us_per_frame > 0)
    a->fps = 1e6 / us_per_frame;
  if (a->total_header <= 0) a->total_header = static_cast<int>(a->offs.size());
  *n_frames = a->total_header;
  *fps = a->fps;
  *width = a->width;
  *height = a->height;
  return a;
}

// Decode the next frame.  Returns 0 on success (fills out/h/w), -1 on a
// decode error (stream still advances, like a failed cv2 retrieve), -2 at
// end of stream.
int swt_avi_read_bgr(void* handle, uint8_t* out, int max_h, int max_w,
                     int* h, int* w) {
  SwtAvi* a = static_cast<SwtAvi*>(handle);
  if (a->pos >= a->offs.size()) return -2;
  const int64_t off = a->offs[a->pos];
  const uint32_t sz = a->sizes[a->pos];
  a->pos += 1;
  std::vector<uint8_t> buf(sz);
  if (fseek(a->f, off, SEEK_SET) != 0 || !rd(a->f, buf.data(), sz)) return -1;
  return swt_decode_jpeg_bgr(buf.data(), sz, out, max_h, max_w, h, w);
}

void swt_avi_close(void* handle) {
  SwtAvi* a = static_cast<SwtAvi*>(handle);
  if (a->f) fclose(a->f);
  delete a;
}

// ---------------------------------------------------------------------------
// delta4 wire-codec encoder (io/wirecodec.py's hot loop, off the GIL).
//
// gray: (n, p) uint8 frames, flattened window batch.  Residual stream is
// r[f] = gray[f + p] - gray[f] (uint8 wraparound) for f in [0, (n-1)*p);
// nibble = min((r + 7) mod 256, 15), escapes (nibble 15) carry r in a sparse
// (index, value) side stream.  Byte k of `packed` holds nibbles 2k | 2k+1<<4
// — bit-identical to the numpy encoder, threads partitioned on byte ranges
// so frame boundaries need no alignment.
// Returns the escape count, or -1 when it exceeds escape_cap (caller ships
// the batch raw).  esc_idx is padded with m = (n-1)*p (out-of-range =>
// dropped by the device scatter).
// ---------------------------------------------------------------------------
int64_t swt_encode_delta4(const uint8_t* gray, int64_t n, int64_t p,
                          uint8_t* packed, int32_t* esc_idx, uint8_t* esc_val,
                          int64_t escape_cap, int n_threads) {
  const int64_t m = (n - 1) * p;          // residual count
  if (m <= 0) return -1;
  const int64_t n_bytes = (m + 1) / 2;
  n_threads = std::max(1, std::min<int>(n_threads, 16));
  const int64_t per = (n_bytes + n_threads - 1) / n_threads;

  std::vector<std::vector<int32_t>> t_idx(n_threads);
  std::vector<std::vector<uint8_t>> t_val(n_threads);
  auto work = [&](int t) {
    const int64_t lo = t * per, hi = std::min(n_bytes, lo + per);
    auto& idx = t_idx[t];
    auto& val = t_val[t];
    for (int64_t k = lo; k < hi; ++k) {
      uint8_t nib[2] = {0, 0};
      for (int half = 0; half < 2; ++half) {
        const int64_t f = 2 * k + half;
        if (f >= m) break;                 // odd-m pad nibble stays 0
        const uint8_t r =
            static_cast<uint8_t>(gray[f + p] - gray[f]);  // wraparound
        const uint8_t biased = static_cast<uint8_t>(r + 7);
        if (biased > 14) {
          nib[half] = 15;
          idx.push_back(static_cast<int32_t>(f));
          val.push_back(r);
        } else {
          nib[half] = biased;
        }
      }
      packed[k] = static_cast<uint8_t>(nib[0] | (nib[1] << 4));
    }
  };
  if (n_threads == 1) {
    work(0);
  } else {
    std::vector<std::thread> pool;
    for (int t = 0; t < n_threads; ++t) pool.emplace_back(work, t);
    for (auto& th : pool) th.join();
  }

  int64_t total = 0;
  for (auto& v : t_idx) total += static_cast<int64_t>(v.size());
  if (total > escape_cap) return -1;
  int64_t at = 0;                          // threads cover ascending ranges,
  for (int t = 0; t < n_threads; ++t) {    // so concatenation keeps the
    for (size_t i = 0; i < t_idx[t].size(); ++i) {  // numpy row-major order
      esc_idx[at] = t_idx[t][i];
      esc_val[at] = t_val[t][i];
      ++at;
    }
  }
  for (int64_t i = total; i < escape_cap; ++i) {
    esc_idx[i] = static_cast<int32_t>(m);
    esc_val[i] = 0;
  }
  return total;
}

// ---------------------------------------------------------------------------
// delta6 encoder (wire codec v2) — threaded C twin of
// swiftwatcher_tpu/io/wirecodec.py:encode_delta6, bit-identical.
//
// gray: n contiguous frames of p uint8 pixels.  Chooses the cheaper of two
// predictors unless force_mode >= 0 (0 = per-pixel rounded batch mean,
// 1 = previous frame), emits 3 base-6 digits per level-1 byte (escape = 5),
// a dense nibble stream for escaped residuals in [-7, 7] (nibble 15 =
// level-3 escape), and a sparse (flat index, byte) level-3 stream.
// Returns 0 on success; -1 on level-3 overflow (caller ships raw);
// -2 when (n1+1)/2 exceeds lvl2_cap.  n1/n3 counts come back via out-params.
int swt_encode_delta6(const uint8_t* gray, int64_t n, int64_t p,
                      int force_mode, uint8_t* mode_out, uint8_t* bg,
                      uint8_t* lvl1, uint8_t* lvl2, int64_t lvl2_cap,
                      int64_t* n1_out, int32_t* esc_idx, uint8_t* esc_val,
                      int64_t escape_cap, int64_t* n3_out, int n_threads) {
  if (n <= 0 || p <= 0) return -1;
  const int64_t m = n * p;
  const int64_t pp3 = (p + 2) / 3;
  n_threads = std::max(1, std::min<int>(n_threads, 16));

  // Phase 1 (pixel stripes): batch-mean background + per-mode escape-byte
  // costs (cost = n1 + 10*n3, the numpy twin's formula).
  const int64_t stripe = (p + n_threads - 1) / n_threads;
  std::vector<int64_t> c_mean(n_threads, 0), c_prev(n_threads, 0);
  auto phase1 = [&](int t) {
    const int64_t lo = t * stripe, hi = std::min(p, lo + stripe);
    if (lo >= hi) return;
    std::vector<uint32_t> acc(hi - lo, 0);
    for (int64_t f = 0; f < n; ++f) {
      const uint8_t* x = gray + f * p;
      for (int64_t i = lo; i < hi; ++i) acc[i - lo] += x[i];
    }
    for (int64_t i = lo; i < hi; ++i)
      bg[i] = static_cast<uint8_t>((acc[i - lo] + n / 2) / n);
    int64_t cm = 0, cp = 0;
    for (int64_t f = 0; f < n; ++f) {
      const uint8_t* x = gray + f * p;
      const uint8_t* xm1 = x - p;
      for (int64_t i = lo; i < hi; ++i) {
        const uint8_t rm = static_cast<uint8_t>(x[i] - bg[i]);
        if (static_cast<uint8_t>(rm + 2) > 4) {
          cm += (static_cast<uint8_t>(rm + 7) > 14) ? 11 : 1;
        }
        if (f > 0) {
          const uint8_t rp = static_cast<uint8_t>(x[i] - xm1[i]);
          if (static_cast<uint8_t>(rp + 2) > 4) {
            cp += (static_cast<uint8_t>(rp + 7) > 14) ? 11 : 1;
          }
        }
      }
    }
    c_mean[t] = cm;
    c_prev[t] = cp;
  };
  {
    std::vector<std::thread> pool;
    for (int t = 0; t < n_threads; ++t) pool.emplace_back(phase1, t);
    for (auto& th : pool) th.join();
  }
  int64_t cost_mean = 0, cost_prev = 0;
  for (int t = 0; t < n_threads; ++t) {
    cost_mean += c_mean[t];
    cost_prev += c_prev[t];
  }
  const int mode =
      force_mode >= 0 ? force_mode : (cost_mean <= cost_prev ? 0 : 1);
  *mode_out = static_cast<uint8_t>(mode);
  if (mode == 1) std::memcpy(bg, gray, p);  // predictor base = frame 0

  // Phase 2 (frame stripes): level-1 bytes + per-frame escape vectors.
  std::vector<std::vector<uint8_t>> t_nib(n);
  std::vector<std::vector<int64_t>> t_bigidx(n);
  std::vector<std::vector<uint8_t>> t_bigval(n);
  const int64_t fper = (n + n_threads - 1) / n_threads;
  auto phase2 = [&](int t) {
    const int64_t flo = t * fper, fhi = std::min(n, flo + fper);
    for (int64_t f = flo; f < fhi; ++f) {
      const uint8_t* x = gray + f * p;
      const uint8_t* pred = (mode == 1) ? (f ? x - p : nullptr) : bg;
      uint8_t* out = lvl1 + f * pp3;
      auto& nib = t_nib[f];
      auto& bidx = t_bigidx[f];
      auto& bval = t_bigval[f];
      for (int64_t i = 0; i < pp3; ++i) {
        uint8_t d[3] = {0, 0, 0};
        const int64_t base = 3 * i;
        const int64_t jmax = std::min<int64_t>(3, p - base);
        for (int64_t j = 0; j < jmax; ++j) {
          const int64_t px = base + j;
          const uint8_t r =
              pred ? static_cast<uint8_t>(x[px] - pred[px]) : 0;
          const uint8_t tt = static_cast<uint8_t>(r + 2);
          if (tt <= 4) {
            d[j] = tt;
          } else {
            d[j] = 5;
            const uint8_t u = static_cast<uint8_t>(r + 7);
            if (u <= 14) {
              nib.push_back(u);
            } else {
              nib.push_back(15);
              bidx.push_back(f * p + px);
              bval.push_back(r);
            }
          }
        }
        out[i] = static_cast<uint8_t>(d[0] + 6 * d[1] + 36 * d[2]);
      }
    }
  };
  {
    std::vector<std::thread> pool;
    for (int t = 0; t < n_threads; ++t) pool.emplace_back(phase2, t);
    for (auto& th : pool) th.join();
  }

  // Serial merge in frame order == the numpy twin's flattened stream order.
  int64_t n1 = 0, n3 = 0;
  for (int64_t f = 0; f < n; ++f) {
    n1 += static_cast<int64_t>(t_nib[f].size());
    n3 += static_cast<int64_t>(t_bigidx[f].size());
  }
  if (n3 > escape_cap) return -1;
  if ((n1 + 1) / 2 > lvl2_cap) return -2;
  int64_t k = 0;
  uint8_t pending = 0;
  for (int64_t f = 0; f < n; ++f) {
    for (uint8_t u : t_nib[f]) {
      if (k % 2 == 0) {
        pending = u;
      } else {
        lvl2[k / 2] = static_cast<uint8_t>(pending | (u << 4));
      }
      ++k;
    }
  }
  if (k % 2) lvl2[k / 2] = pending;  // odd-count pad nibble stays 0
  int64_t at = 0;
  for (int64_t f = 0; f < n; ++f) {
    for (size_t i = 0; i < t_bigidx[f].size(); ++i) {
      esc_idx[at] = static_cast<int32_t>(t_bigidx[f][i]);
      esc_val[at] = t_bigval[f][i];
      ++at;
    }
  }
  for (int64_t i = n3; i < escape_cap; ++i) {
    esc_idx[i] = static_cast<int32_t>(m);
    esc_val[i] = 0;
  }
  *n1_out = n1;
  *n3_out = n3;
  return 0;
}

}  // extern "C"
