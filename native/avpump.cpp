// Sequential container decoder over the system FFmpeg libraries
// (libavformat/libavcodec/libswscale) with in-process FRAME THREADING.
//
// First-party high-rate decode path for the reference's real input format
// (H.264/MPEG-4 in MP4 — /root/reference/swiftwatcher/io_video.py:137-165
// decodes it strictly sequentially on one core through cv2.VideoCapture).
// Unlike io/parallel_decode.py (chunk-claiming cv2 worker PROCESSES, which
// needs frame-accurate seeking), libavcodec's frame threading parallelizes
// the decode itself inside one process and works on any container.
//
// Parity: H.264/MPEG-4 decode is conformance-exact (every compliant decoder
// emits identical YUV), and the YUV->BGR24 step goes through libswscale
// exactly as cv2's FFmpeg backend does.  cv2 wheels bundle their own FFmpeg
// (possibly a different swscale major), so the Python caller PROBES the
// first frames for byte equality against cv2 before engaging this backend
// (io/readers.py), mirroring parallel_decode's probe-gating.
//
// Build: g++ -O3 -shared -fPIC avpump.cpp -lavformat -lavcodec -lswscale -lavutil

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/pixdesc.h>
#include <libswscale/swscale.h>
}

namespace {

struct AvPump {
  AVFormatContext *fmt = nullptr;
  AVCodecContext *dec = nullptr;
  SwsContext *sws = nullptr;        // full-frame -> BGR24
  SwsContext *sws_slice = nullptr;  // crop-rows slice -> BGR24
  int sws_slice_h = 0;
  AVPacket *pkt = nullptr;
  AVFrame *frame = nullptr;
  std::vector<uint8_t> slice_bgr;   // scratch for gray-crop reads
  std::vector<uint8_t> pad_bgr;     // scratch for padded-width full reads
  int stream_index = -1;
  int width = 0, height = 0;
  int sws_w = 0;                    // conversion width the contexts use
  int slice_sws_w = 0;
  AVPixelFormat sws_src_fmt = AV_PIX_FMT_NONE;
  AVPixelFormat slice_src_fmt = AV_PIX_FMT_NONE;
  AVRational fps_q = {0, 1};
  int64_t start_ts = 0;             // stream start time (stream time_base)
  bool draining = false;  // EOF reached on the demuxer; flushing the decoder
  bool pending = false;   // p->frame holds a decoded frame not yet consumed
};

// swscale's unscaled yuv->bgr24 converters are only well-behaved for widths
// divisible by 16 (measured on the system build, lavs 6/ffmpeg 5.1): at
// w=852/854 they leave the last 4/6 pixels of EVERY row unwritten (the
// caller's buffer garbage shows through), and at w=856/860 they write up to
// 24 bytes PAST the last row's end (heap overrun on an exact-size buffer).
// Every conversion therefore runs at pad16(w) — decoder frames carry
// MB-aligned coded data, so the padded columns read real pixels and the
// unscaled converter is pointwise (pixel i's bytes do not depend on the
// conversion width), leaving bytes 0..w*3-1 of each row byte-identical to
// an exact-width conversion while making every byte deterministic and
// in-bounds.  Rows are then copied out at the display width.
int pad16_width(const AVFrame *frame) {
  int w = frame->width;
  int pw = (w + 15) & ~15;
  // never read past the allocation: rows are linesize bytes long
  if (pw > frame->linesize[0]) pw = w;
  const AVPixFmtDescriptor *d = av_pix_fmt_desc_get((AVPixelFormat)frame->format);
  if (d && frame->data[1]) {
    const int cw = pw >> d->log2_chroma_w;
    if (frame->linesize[1] && cw > frame->linesize[1]) pw = w;
    if (frame->linesize[2] && cw > frame->linesize[2]) pw = w;
  }
  return pw;
}

void pump_free(AvPump *p) {
  if (!p) return;
  if (p->sws) sws_freeContext(p->sws);
  if (p->sws_slice) sws_freeContext(p->sws_slice);
  if (p->frame) av_frame_free(&p->frame);
  if (p->pkt) av_packet_free(&p->pkt);
  if (p->dec) avcodec_free_context(&p->dec);
  if (p->fmt) avformat_close_input(&p->fmt);
  delete p;
}

// Advance to the next decoded frame in p->frame (not yet converted).
// Returns 0 on success, 1 at end of stream, -1 on decode error.
int decode_next(AvPump *p) {
  while (true) {
    int rc = avcodec_receive_frame(p->dec, p->frame);
    if (rc == 0) return 0;
    if (rc == AVERROR_EOF) return 1;
    if (rc != AVERROR(EAGAIN)) return -1;
    if (p->draining) return 1;
    // need more input
    while (true) {
      rc = av_read_frame(p->fmt, p->pkt);
      if (rc < 0) {
        p->draining = true;
        avcodec_send_packet(p->dec, nullptr);  // flush delayed frames
        break;
      }
      if (p->pkt->stream_index != p->stream_index) {
        av_packet_unref(p->pkt);
        continue;
      }
      rc = avcodec_send_packet(p->dec, p->pkt);
      av_packet_unref(p->pkt);
      if (rc < 0 && rc != AVERROR(EAGAIN)) return -1;
      break;
    }
  }
}

// Display index of the frame currently held in p->frame, from its
// best-effort timestamp at the container's constant frame rate (the same
// constant-fps assumption the reference's timestamping makes,
// io_video.py:74-82).  Returns -1 when the stream carries no timestamps.
int64_t frame_index(const AvPump *p) {
  int64_t ts = p->frame->best_effort_timestamp;
  if (ts == AV_NOPTS_VALUE || p->fps_q.num <= 0) return -1;
  AVRational tb = p->fmt->streams[p->stream_index]->time_base;
  return av_rescale_q_rnd(ts - p->start_ts, tb, av_inv_q(p->fps_q),
                          AV_ROUND_NEAR_INF);
}

// cv2-matching BGR -> gray (shift-15 fixed point), one row segment.
// Identical constants to framepump.cpp's gray_crop_one (bit-exact twin of
// ops/color.py / cv2.cvtColor BGR2GRAY).
inline void gray_row(const uint8_t *bgr, int n, uint8_t *out) {
  for (int x = 0; x < n; ++x) {
    const int b = bgr[3 * x], g = bgr[3 * x + 1], r = bgr[3 * x + 2];
    out[x] = (uint8_t)((r * 9798 + g * 19235 + b * 3735 + (1 << 14)) >> 15);
  }
}

// cv2's CvCapture_FFMPEG::get_fps(): avg_frame_rate, falling back to
// av_guess_frame_rate when the container does not record an average.
AVRational stream_fps_q(AVFormatContext *fmt, AVStream *st) {
  AVRational q = st->avg_frame_rate;
  if (q.num <= 0 || q.den <= 0) q = av_guess_frame_rate(fmt, st, nullptr);
  if (q.num <= 0 || q.den <= 0) q = {0, 1};
  return q;
}

double stream_fps(AVFormatContext *fmt, AVStream *st) {
  AVRational q = stream_fps_q(fmt, st);
  double fps = q.num > 0 ? av_q2d(q) : 0.0;
  if (!(fps > 0.0) || !std::isfinite(fps)) fps = 0.0;
  return fps;
}

// cv2's get_total_frames(): nb_frames when the container indexes it (MP4
// stts does), else round(duration_sec * fps).
int64_t stream_nframes(AVFormatContext *fmt, AVStream *st, double fps) {
  int64_t n = st->nb_frames;
  if (n > 0) return n;
  double sec = 0.0;
  if (fmt->duration != AV_NOPTS_VALUE)
    sec = (double)fmt->duration / AV_TIME_BASE;
  else if (st->duration != AV_NOPTS_VALUE)
    sec = st->duration * av_q2d(st->time_base);
  return (int64_t)std::floor(sec * fps + 0.5);
}

}  // namespace

extern "C" {

// Open `path` for sequential decode.  Outputs container metadata exactly as
// cv2 reports it (fps, frame count, coded dimensions) and returns an opaque
// handle, or nullptr on any failure (caller falls back to cv2).
void *swt_av_open(const char *path, int *n_frames, double *fps, int *width,
                  int *height, int n_threads) {
  AvPump *p = new AvPump();
  if (avformat_open_input(&p->fmt, path, nullptr, nullptr) < 0) {
    pump_free(p);
    return nullptr;
  }
  if (avformat_find_stream_info(p->fmt, nullptr) < 0) {
    pump_free(p);
    return nullptr;
  }
  const AVCodec *codec = nullptr;
  p->stream_index =
      av_find_best_stream(p->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &codec, 0);
  if (p->stream_index < 0 || !codec) {
    pump_free(p);
    return nullptr;
  }
  AVStream *st = p->fmt->streams[p->stream_index];
  p->dec = avcodec_alloc_context3(codec);
  if (!p->dec ||
      avcodec_parameters_to_context(p->dec, st->codecpar) < 0) {
    pump_free(p);
    return nullptr;
  }
  // In-process parallel decode: frame threading overlaps whole-picture
  // decodes across cores; slice threading splits one picture.  Decode
  // output order is unchanged (send/receive reorders internally).
  p->dec->thread_count = n_threads > 0 ? n_threads : 0;  // 0 = auto
  p->dec->thread_type = FF_THREAD_FRAME | FF_THREAD_SLICE;
  if (avcodec_open2(p->dec, codec, nullptr) < 0) {
    pump_free(p);
    return nullptr;
  }
  p->pkt = av_packet_alloc();
  p->frame = av_frame_alloc();
  if (!p->pkt || !p->frame) {
    pump_free(p);
    return nullptr;
  }
  p->width = st->codecpar->width;
  p->height = st->codecpar->height;
  p->fps_q = stream_fps_q(p->fmt, st);
  p->start_ts = st->start_time == AV_NOPTS_VALUE ? 0 : st->start_time;
  double f = stream_fps(p->fmt, st);
  *fps = f;
  *n_frames = (int)stream_nframes(p->fmt, st, f);
  *width = p->width;
  *height = p->height;
  if (p->width <= 0 || p->height <= 0) {
    pump_free(p);
    return nullptr;
  }
  return p;
}

// Decode the next frame and DISCARD it: no pixel conversion, no copy-out.
// Profiling hook only (tools/decode_floor.py): the rate of a read_null
// loop is this host's libavcodec decode floor for the stream — the part
// of the ingest budget no conversion tuning can recover.  Same advance/
// return contract as swt_av_read_bgr.
int swt_av_read_null(void *handle) {
  AvPump *p = (AvPump *)handle;
  if (!p) return 1;
  if (!p->pending) {
    int rc = decode_next(p);
    if (rc != 0) return rc;
  }
  p->pending = false;
  return 0;
}

// Decode the next frame into `out` as tightly-packed BGR24 (h*w*3 bytes).
// Returns 0 on success, 1 at end of stream, -1 on decode error (the stream
// position still advances — same contract as a failed cv2 retrieve, so the
// caller's last-good-frame substitution applies, io_video.py:51-53).
int swt_av_read_bgr(void *handle, uint8_t *out, int max_h, int max_w,
                    int *out_h, int *out_w) {
  AvPump *p = (AvPump *)handle;
  if (!p) return 1;
  if (!p->pending) {
    int rc = decode_next(p);
    if (rc != 0) return rc;
  }
  p->pending = false;
  int w = p->frame->width, h = p->frame->height;
  if (w > max_w || h > max_h) {
    av_frame_unref(p->frame);
    return -1;
  }
  AVPixelFormat src_fmt = (AVPixelFormat)p->frame->format;
  const int pw = pad16_width(p->frame);  // see pad16_width: edge safety
  if (!p->sws || p->sws_src_fmt != src_fmt || p->sws_w != pw) {
    // same flags family as cv2's FFmpeg capture (SWS_BICUBIC); for the
    // unscaled same-geometry conversion swscale dispatches its exact
    // fixed-point yuv2rgb converters, so flags do not perturb output
    if (p->sws) sws_freeContext(p->sws);
    p->sws = sws_getContext(pw, h, src_fmt, pw, h, AV_PIX_FMT_BGR24,
                            SWS_BICUBIC, nullptr, nullptr, nullptr);
    p->sws_src_fmt = src_fmt;
    p->sws_w = pw;
    if (!p->sws) {
      av_frame_unref(p->frame);
      return -1;
    }
  }
  if (pw == w) {
    uint8_t *dst_data[4] = {out, nullptr, nullptr, nullptr};
    int dst_stride[4] = {w * 3, 0, 0, 0};
    sws_scale(p->sws, p->frame->data, p->frame->linesize, 0, h, dst_data,
              dst_stride);
  } else {
    // padded-width conversion into the scratch (every byte written,
    // nothing past the end), then crop rows to the display width
    p->pad_bgr.resize((size_t)(h + 1) * pw * 3);
    uint8_t *dst_data[4] = {p->pad_bgr.data(), nullptr, nullptr, nullptr};
    int dst_stride[4] = {pw * 3, 0, 0, 0};
    sws_scale(p->sws, p->frame->data, p->frame->linesize, 0, h, dst_data,
              dst_stride);
    for (int y = 0; y < h; ++y)
      memcpy(out + (size_t)y * w * 3, p->pad_bgr.data() + (size_t)y * pw * 3,
             (size_t)w * 3);
  }
  av_frame_unref(p->frame);
  *out_h = h;
  *out_w = w;
  return 0;
}

void swt_av_close(void *handle) { pump_free((AvPump *)handle); }

// Frame indices of the stream's keyframes, from the container's index
// (MP4 sample tables are parsed at open — this costs no decode; formats
// without an upfront index report 0 and callers keep fixed chunking).
// Chunk-parallel decode aligns its chunks to these so every worker seek
// lands exactly on its chunk start instead of decoding forward through
// up to a whole GOP of discarded frames (the reference decodes strictly
// sequentially, io_video.py:137-165, so it never faced this).  Writes at
// most max_n strictly-increasing indices; returns the count, or -1 on a
// bad handle.
int swt_av_keyframes(void *handle, int64_t *out, int max_n) {
  AvPump *p = (AvPump *)handle;
  if (!p || max_n <= 0) return -1;
  if (p->fps_q.num <= 0) return 0;  // no timestamp basis -> no index
  AVStream *st = p->fmt->streams[p->stream_index];
  const int n = avformat_index_get_entries_count(st);
  AVRational tb = st->time_base;
  int written = 0;
  int64_t last = -1;
  for (int i = 0; i < n && written < max_n; ++i) {
    const AVIndexEntry *e = avformat_index_get_entry(st, i);
    if (!e || !(e->flags & AVINDEX_KEYFRAME)) continue;
    int64_t idx = av_rescale_q_rnd(e->timestamp - p->start_ts, tb,
                                   av_inv_q(p->fps_q), AV_ROUND_NEAR_INF);
    if (idx < 0 || idx <= last) continue;
    out[written++] = idx;
    last = idx;
  }
  return written;
}

// Position the stream so the NEXT read returns display frame `target`
// (0-based).  Keyframe-seek + decode-forward: av_seek_frame lands on the
// preceding keyframe and frames are decoded (not emitted) until the target,
// so the emitted frame is byte-identical to a sequential decode — the same
// mechanism cv2's CAP_PROP_POS_FRAMES uses, here timestamp-verified per
// frame.  Returns 0 on success, 1 when target is at/past end of stream,
// -1 when the stream's timestamps are unusable (caller keeps the backend
// sequential-only).
int swt_av_seek(void *handle, int64_t target) {
  AvPump *p = (AvPump *)handle;
  if (!p || p->fps_q.num <= 0) return -1;
  if (target < 0) return -1;
  AVStream *st = p->fmt->streams[p->stream_index];
  int64_t want_ts =
      p->start_ts +
      av_rescale_q_rnd(target, av_inv_q(p->fps_q), st->time_base,
                       AV_ROUND_NEAR_INF);
  // Growing back-off margins: an imprecise container index may land the
  // "BACKWARD" seek after the target; retry from earlier, ending with a
  // full rewind (always correct, possibly slow).
  const double margins_sec[] = {0.0, 1.0, 4.0, 16.0, -1.0};
  for (double m : margins_sec) {
    int64_t ts = want_ts;
    if (m < 0.0) {
      ts = p->start_ts == AV_NOPTS_VALUE ? 0 : p->start_ts;
    } else if (m > 0.0) {
      ts -= (int64_t)(m / av_q2d(st->time_base));
      if (p->start_ts != AV_NOPTS_VALUE && ts < p->start_ts) ts = p->start_ts;
    }
    if (av_seek_frame(p->fmt, p->stream_index, ts, AVSEEK_FLAG_BACKWARD) < 0)
      continue;
    avcodec_flush_buffers(p->dec);
    p->draining = false;
    if (p->pending) {
      av_frame_unref(p->frame);
      p->pending = false;
    }
    bool overshoot = false;
    while (true) {
      int rc = decode_next(p);
      if (rc == 1) return 1;   // target at/past end of stream
      if (rc == -1) return -1;
      int64_t idx = frame_index(p);
      if (idx < 0) {
        av_frame_unref(p->frame);
        return -1;             // no usable timestamps
      }
      if (idx == target) {
        p->pending = true;     // hold for the next read
        return 0;
      }
      av_frame_unref(p->frame);
      if (idx > target) {      // landed past it: widen the margin
        overshoot = true;
        break;
      }
    }
    if (!overshoot) return -1;
  }
  return -1;
}

// Decode the next frame straight to a cropped grayscale patch: YUV->BGR
// conversion runs only over the crop's rows (chroma-aligned slice) and the
// shift-15 gray only over the crop's columns, skipping the full-frame BGR
// materialization entirely — the host-side analogue of keeping only the
// chimney crop resident on device.  out receives (y2-y1, x2-x1) uint8,
// bit-identical to gray(full BGR read)[y1:y2, x1:x2] (the caller PROBES
// that equality per file before engaging).  Same 0/1/-1 contract as
// swt_av_read_bgr.
int swt_av_read_gray_crop(void *handle, int y1, int y2, int x1, int x2,
                          uint8_t *out) {
  AvPump *p = (AvPump *)handle;
  if (!p) return 1;
  if (!p->pending) {
    int rc = decode_next(p);
    if (rc != 0) return rc;
  }
  p->pending = false;
  int w = p->frame->width, h = p->frame->height;
  AVPixelFormat src_fmt = (AVPixelFormat)p->frame->format;
  const AVPixFmtDescriptor *desc = av_pix_fmt_desc_get(src_fmt);
  if (!desc || y1 < 0 || y2 > h || x1 < 0 || x2 > w || y1 >= y2 || x1 >= x2) {
    av_frame_unref(p->frame);
    return -1;
  }
  // Align the slice start DOWN and the end UP to chroma row boundaries so
  // subsampled planes slice cleanly (e.g. yuv420p: even rows) AND the slice
  // height stays chroma-even: an odd-height context falls off swscale's
  // unscaled fast path into the scaler (bilinear chroma), which is not
  // byte-identical to the full-frame conversion (measured: every odd-hs
  // crop diverged, every even-hs crop matched).
  const int align = 1 << desc->log2_chroma_h;
  const int y1e = y1 & ~(align - 1);
  const int y2e = h < ((y2 + align - 1) & ~(align - 1))
                      ? h
                      : ((y2 + align - 1) & ~(align - 1));
  const int hs = y2e - y1e;
  const int pw = pad16_width(p->frame);  // see pad16_width: edge safety
  if (!p->sws_slice || p->slice_src_fmt != src_fmt || p->sws_slice_h != hs ||
      p->slice_sws_w != pw) {
    if (p->sws_slice) sws_freeContext(p->sws_slice);
    p->sws_slice = sws_getContext(pw, hs, src_fmt, pw, hs, AV_PIX_FMT_BGR24,
                                  SWS_BICUBIC, nullptr, nullptr, nullptr);
    p->slice_src_fmt = src_fmt;
    p->sws_slice_h = hs;
    p->slice_sws_w = pw;
    if (!p->sws_slice) {
      av_frame_unref(p->frame);
      return -1;
    }
  }
  // Offset each plane's pointer to the slice start; planes 1/2 are the
  // (vertically subsampled) chroma planes, everything else is full height.
  const uint8_t *src_data[4] = {nullptr, nullptr, nullptr, nullptr};
  for (int i = 0; i < 4 && p->frame->data[i]; ++i) {
    const int shift = (i == 1 || i == 2) ? desc->log2_chroma_h : 0;
    src_data[i] = p->frame->data[i] +
                  (ptrdiff_t)(y1e >> shift) * p->frame->linesize[i];
  }
  p->slice_bgr.resize((size_t)(hs + 1) * pw * 3);
  uint8_t *dst_data[4] = {p->slice_bgr.data(), nullptr, nullptr, nullptr};
  int dst_stride[4] = {pw * 3, 0, 0, 0};
  sws_scale(p->sws_slice, src_data, p->frame->linesize, 0, hs, dst_data,
            dst_stride);
  av_frame_unref(p->frame);
  const int cw = x2 - x1;
  for (int y = y1; y < y2; ++y)
    gray_row(p->slice_bgr.data() + ((size_t)(y - y1e) * pw + x1) * 3, cw,
             out + (size_t)(y - y1) * cw);
  return 0;
}

// Encode `n` packed-BGR24 frames into an MP4 at `path` using the named
// system encoder ("libx264", "mpeg4", ...).  Fixture generator for parity
// tests on the reference's real capture format (H.264 MP4): the cv2 wheel's
// bundled FFmpeg ships no H.264 ENCODER, so test H.264 streams must be
// fabricated through the system libavcodec.  Returns 0 on success.
// Shared encode body for the CFR and VFR test-fixture writers.  pts_arr ==
// nullptr means constant frame rate (pts = i, one tick per frame); a
// non-null pts_arr (n strictly-ascending stamps in `tb` units) produces a
// genuinely variable-frame-rate stream: per-packet durations are the pts
// deltas, and the stream framerate is left unspecified so the container
// derives only an AVERAGE rate — what real VFR captures look like.
static int write_test_impl(const char *path, const uint8_t *bgr, int n, int h,
                           int w, AVRational tb, const int64_t *pts_arr,
                           const char *codec_name) {
  const AVCodec *codec = avcodec_find_encoder_by_name(codec_name);
  if (!codec) return -1;
  AVFormatContext *fmt = nullptr;
  if (avformat_alloc_output_context2(&fmt, nullptr, nullptr, path) < 0 || !fmt)
    return -1;
  int rc = -1;
  AVCodecContext *enc = nullptr;
  SwsContext *sws = nullptr;
  AVFrame *frame = nullptr;
  AVPacket *pkt = nullptr;
  AVStream *st = avformat_new_stream(fmt, codec);
  do {
    if (!st) break;
    enc = avcodec_alloc_context3(codec);
    if (!enc) break;
    enc->width = w;
    enc->height = h;
    enc->time_base = tb;
    if (!pts_arr) enc->framerate = av_inv_q(tb);  // VFR: leave unspecified
    enc->pix_fmt = AV_PIX_FMT_YUV420P;
    enc->gop_size = 12;
    // no B-frames: with reordering, the mp4 edit-list/dts-shift interplay
    // makes decoders (cv2's AND this one, identically) surface one frame
    // fewer than nb_frames; fixtures should have count == decodable frames
    enc->max_b_frames = 0;
    if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
      enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    if (avcodec_open2(enc, codec, nullptr) < 0) break;
    if (avcodec_parameters_from_context(st->codecpar, enc) < 0) break;
    st->time_base = tb;
    if (!(fmt->oformat->flags & AVFMT_NOFILE) &&
        avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0)
      break;
    if (avformat_write_header(fmt, nullptr) < 0) break;
    frame = av_frame_alloc();
    pkt = av_packet_alloc();
    if (!frame || !pkt) break;
    frame->format = AV_PIX_FMT_YUV420P;
    frame->width = w;
    frame->height = h;
    if (av_frame_get_buffer(frame, 0) < 0) break;
    // Convert at a 16-aligned padded width (see pad16_width): swscale's
    // packed converters overread/underwrite row tails at other widths —
    // overreading the caller's exact-size BGR buffer and leaving the YUV
    // edge uninitialized.  The source is staged row-by-row into a padded
    // scratch (edge pixel replicated); the padded YUV columns land in the
    // frame's allocator padding, which the encoder ignores.
    int pw = (w + 15) & ~15;
    if (pw > frame->linesize[0] || pw / 2 > frame->linesize[1]) pw = w;
    sws = sws_getContext(pw, h, AV_PIX_FMT_BGR24, pw, h, AV_PIX_FMT_YUV420P,
                         SWS_BICUBIC, nullptr, nullptr, nullptr);
    if (!sws) break;
    std::vector<uint8_t> src_pad;
    if (pw != w) src_pad.resize((size_t)h * pw * 3);
    bool failed = false;
    for (int i = 0; i <= n && !failed; i++) {
      AVFrame *send = nullptr;
      if (i < n) {
        const uint8_t *src = bgr + (size_t)i * h * w * 3;
        int src_stride[4] = {pw * 3, 0, 0, 0};
        if (pw != w) {
          for (int y = 0; y < h; ++y) {
            uint8_t *row = src_pad.data() + (size_t)y * pw * 3;
            memcpy(row, src + (size_t)y * w * 3, (size_t)w * 3);
            for (int x = w; x < pw; ++x)  // replicate the edge pixel
              memcpy(row + (size_t)x * 3, row + (size_t)(w - 1) * 3, 3);
          }
          src = src_pad.data();
        } else {
          src_stride[0] = w * 3;
        }
        const uint8_t *src_data[4] = {src, nullptr, nullptr, nullptr};
        if (av_frame_make_writable(frame) < 0) { failed = true; break; }
        sws_scale(sws, src_data, src_stride, 0, h, frame->data,
                  frame->linesize);
        frame->pts = pts_arr ? pts_arr[i] : i;
        send = frame;
      }
      if (avcodec_send_frame(enc, send) < 0) { failed = true; break; }
      while (true) {
        int r = avcodec_receive_packet(enc, pkt);
        if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) break;
        if (r < 0) { failed = true; break; }
        if (pkt->duration == 0) {
          // without a duration the mp4 muxer records a 0-length final
          // sample and the container's duration/avg_frame_rate come out
          // short by one frame
          if (!pts_arr) {
            pkt->duration = 1;  // CFR: one frame in enc tb
          } else {
            // VFR: the packet's duration is ITS frame's pts delta (no
            // B-frames, so pkt->pts is one of our ascending stamps)
            const int64_t *e =
                std::lower_bound(pts_arr, pts_arr + n, pkt->pts);
            int idx = (int)(e - pts_arr);
            if (idx + 1 < n)
              pkt->duration = pts_arr[idx + 1] - pts_arr[idx];
            else
              pkt->duration =
                  (n >= 2) ? pts_arr[n - 1] - pts_arr[n - 2] : 1;
          }
        }
        av_packet_rescale_ts(pkt, enc->time_base, st->time_base);
        pkt->stream_index = st->index;
        if (av_interleaved_write_frame(fmt, pkt) < 0) { failed = true; break; }
      }
    }
    if (failed) break;
    if (av_write_trailer(fmt) < 0) break;
    rc = 0;
  } while (false);
  if (sws) sws_freeContext(sws);
  if (frame) av_frame_free(&frame);
  if (pkt) av_packet_free(&pkt);
  if (enc) avcodec_free_context(&enc);
  if (fmt) {
    if (!(fmt->oformat->flags & AVFMT_NOFILE) && fmt->pb) avio_closep(&fmt->pb);
    avformat_free_context(fmt);
  }
  return rc;
}

int swt_av_write_test(const char *path, const uint8_t *bgr, int n, int h,
                      int w, double fps, const char *codec_name) {
  // timebase = 1/fps with fps as an exact rational (1/fps through av_d2q
  // picks an inexact denominator that skews duration and drops the final
  // delayed frame at decode)
  AVRational tb = av_inv_q(av_d2q(fps, 1 << 16));
  return write_test_impl(path, bgr, n, h, w, tb, nullptr, codec_name);
}

// Variable-frame-rate fixture writer: pts (n strictly-ascending stamps in
// units of 1/tb_den seconds) times each frame individually.  No reference
// counterpart — real chimney captures are VFR-prone (auto-exposure cameras
// drop/stretch frames) and the reference's CAP_PROP_FPS timestamping sees
// only the container's average rate (io_video.py:137-165); this writer
// fabricates such streams for the accuracy corpus and reader tests.
int swt_av_write_test_pts(const char *path, const uint8_t *bgr, int n, int h,
                          int w, int tb_den, const int64_t *pts,
                          const char *codec_name) {
  if (!pts || tb_den <= 0) return -1;
  AVRational tb = {1, tb_den};
  return write_test_impl(path, bgr, n, h, w, tb, pts, codec_name);
}

}  // extern "C"
