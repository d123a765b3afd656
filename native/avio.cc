// Native FFmpeg media IO for acav100m_tpu.
//
// The reference decodes mp4 clips with PyAV inside torch DataLoader
// workers (feature_extraction/code/data/video.py:69-163) and drives an
// ffmpeg *binary* for scene-boundary detection and stream-copy clip
// extraction (clip_segmentation/code/extract_clips.py:54-94). Neither
// PyAV nor the binary exists in this image, but the FFmpeg *libraries*
// (libavformat/libavcodec/libavutil/libswresample/libswscale 5.1) do.
// This file is the TPU-host-native equivalent: one shared library,
// loaded via ctypes (acav100m_tpu/data/native_av.py), that
//
//   * demuxes + decodes video AND audio from a file or an in-memory
//     buffer (tar members never touch disk),
//   * scales short-side-to-`size` + center-crops frames to RGB24
//     (static device shapes), resamples audio to mono float at a target
//     rate (VGGish 16 kHz / eval 44.1 kHz),
//   * computes per-frame scdet-equivalent scene-change scores on the
//     decoded YUV planes (mafd/diff clipped to [0,100], the math of
//     ffmpeg's vf_scdet) so stage-3 SBD runs natively in-process,
//   * stream-copies a [start, start+dur) clip into a new mp4
//     (`ffmpeg -ss .. -c copy` equivalent, keyframe-snapped), and
//   * encodes mpeg4+AAC mp4s from raw arrays so tests can generate REAL
//     compressed audio+video fixtures without egress.
//
// Build: g++ -O2 -shared -fPIC avio.cc -o libavio.so \
//          -lavformat -lavcodec -lavutil -lswresample -lswscale

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/channel_layout.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
#include <libswscale/swscale.h>
}

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct MemReader {
  const uint8_t* data;
  int64_t size;
  int64_t pos;
};

int mem_read(void* opaque, uint8_t* buf, int buf_size) {
  MemReader* r = static_cast<MemReader*>(opaque);
  int64_t left = r->size - r->pos;
  if (left <= 0) return AVERROR_EOF;
  int n = static_cast<int>(std::min<int64_t>(buf_size, left));
  memcpy(buf, r->data + r->pos, n);
  r->pos += n;
  return n;
}

int64_t mem_seek(void* opaque, int64_t offset, int whence) {
  MemReader* r = static_cast<MemReader*>(opaque);
  if (whence == AVSEEK_SIZE) return r->size;
  whence &= ~AVSEEK_FORCE;
  int64_t pos = offset;
  if (whence == SEEK_CUR) pos += r->pos;
  if (whence == SEEK_END) pos += r->size;
  if (pos < 0 || pos > r->size) return AVERROR(EINVAL);
  r->pos = pos;
  return pos;
}

void set_err(char* err, const char* msg, int code = 0) {
  if (!err) return;
  if (code) {
    char buf[128];
    av_strerror(code, buf, sizeof(buf));
    snprintf(err, 256, "%s: %s", msg, buf);
  } else {
    snprintf(err, 256, "%s", msg);
  }
}

// Sum-of-absolute-differences between two frames' data planes —
// the per-frame cost inside ffmpeg's vf_scdet (scene score =
// clip(min(mafd, |mafd - prev_mafd|), 0, 100), mafd = 100*sad/npixels
// at 8-bit depth).
double frame_sad(const AVFrame* a, const AVFrame* b,
                 const AVPixFmtDescriptor* desc, uint64_t* count) {
  uint64_t sad = 0;
  uint64_t n = 0;
  int planes = av_pix_fmt_count_planes(static_cast<AVPixelFormat>(a->format));
  for (int p = 0; p < planes; p++) {
    int shift_w = (p == 1 || p == 2) ? desc->log2_chroma_w : 0;
    int shift_h = (p == 1 || p == 2) ? desc->log2_chroma_h : 0;
    int w = AV_CEIL_RSHIFT(a->width, shift_w);
    int h = AV_CEIL_RSHIFT(a->height, shift_h);
    for (int y = 0; y < h; y++) {
      const uint8_t* pa = a->data[p] + y * a->linesize[p];
      const uint8_t* pb = b->data[p] + y * b->linesize[p];
      for (int x = 0; x < w; x++) sad += std::abs(int(pa[x]) - int(pb[x]));
    }
    n += uint64_t(w) * h;
  }
  *count = n;
  return static_cast<double>(sad);
}

struct Decoder {
  AVFormatContext* fmt = nullptr;
  AVIOContext* avio = nullptr;
  MemReader reader{};
  AVCodecContext* vctx = nullptr;
  AVCodecContext* actx = nullptr;
  int vstream = -1;
  int astream = -1;
  SwsContext* sws = nullptr;
  SwrContext* swr = nullptr;
  AVFrame* prev = nullptr;  // for scene scores

  ~Decoder() {
    if (prev) av_frame_free(&prev);
    if (sws) sws_freeContext(sws);
    if (swr) swr_free(&swr);
    if (vctx) avcodec_free_context(&vctx);
    if (actx) avcodec_free_context(&actx);
    if (fmt) avformat_close_input(&fmt);
    if (avio) {
      av_freep(&avio->buffer);
      avio_context_free(&avio);
    }
  }
};

int open_input(Decoder* d, const char* path, const uint8_t* data,
               int64_t len, int want_audio, char* err, int threads = 1) {
  int rc;
  if (data != nullptr) {
    d->reader = {data, len, 0};
    constexpr int kBuf = 1 << 16;
    uint8_t* buf = static_cast<uint8_t*>(av_malloc(kBuf));
    d->avio = avio_alloc_context(buf, kBuf, 0, &d->reader, mem_read, nullptr,
                                 mem_seek);
    d->fmt = avformat_alloc_context();
    d->fmt->pb = d->avio;
    rc = avformat_open_input(&d->fmt, nullptr, nullptr, nullptr);
  } else {
    rc = avformat_open_input(&d->fmt, path, nullptr, nullptr);
  }
  if (rc < 0) {
    set_err(err, "open_input", rc);
    return rc;
  }
  rc = avformat_find_stream_info(d->fmt, nullptr);
  if (rc < 0) {
    set_err(err, "find_stream_info", rc);
    return rc;
  }
  d->vstream = av_find_best_stream(d->fmt, AVMEDIA_TYPE_VIDEO, -1, -1,
                                   nullptr, 0);
  if (want_audio)
    d->astream = av_find_best_stream(d->fmt, AVMEDIA_TYPE_AUDIO, -1, -1,
                                     nullptr, 0);
  for (int which = 0; which < 2; which++) {
    int idx = which == 0 ? d->vstream : d->astream;
    if (idx < 0) continue;
    AVStream* st = d->fmt->streams[idx];
    const AVCodec* codec = avcodec_find_decoder(st->codecpar->codec_id);
    if (!codec) {
      if (which == 0) d->vstream = -1;
      else d->astream = -1;
      continue;
    }
    AVCodecContext* ctx = avcodec_alloc_context3(codec);
    avcodec_parameters_to_context(ctx, st->codecpar);
    ctx->pkt_timebase = st->time_base;
    // frame-threaded decode for multi-core hosts; worker pools pin 1
    if (which == 0 && threads != 1) ctx->thread_count = threads;
    rc = avcodec_open2(ctx, codec, nullptr);
    if (rc < 0) {
      avcodec_free_context(&ctx);
      if (which == 0) d->vstream = -1;
      else d->astream = -1;
      continue;
    }
    if (which == 0) d->vctx = ctx;
    else d->actx = ctx;
  }
  if (d->vstream < 0 && d->astream < 0) {
    set_err(err, "no decodable streams");
    return -1;
  }
  return 0;
}

}  // namespace

extern "C" {

typedef struct {
  uint8_t* frames;       // n_frames * size * size * 3 RGB24 (or w*h*3 if size==0)
  int64_t n_frames;
  int32_t width, height;
  double fps;
  double* frame_times;   // n_frames, seconds (pts)
  double* scene_scores;  // n_frames, scdet score vs previous frame (0 for first)
  float* audio;          // n_samples mono float32 at sample_rate
  int64_t n_samples;
  int32_t sample_rate;
  double duration;       // container duration, seconds (0 if unknown)
  double audio_start;    // first audio sample's pts, seconds (>=0; pre-0
                         // samples are trimmed per the reference's
                         // _align_audio_frames, video.py:152-163)
  char err[256];
} AvDecoded;

void av_decoded_free(AvDecoded* out) {
  if (!out) return;
  free(out->frames);
  free(out->frame_times);
  free(out->scene_scores);
  free(out->audio);
  out->frames = nullptr;
  out->frame_times = nullptr;
  out->scene_scores = nullptr;
  out->audio = nullptr;
}

// Decode media. Exactly one of (path) or (data,len) must be set.
//   size       0 = native frame size, else short-side scale + center crop
//   target_sr  0 = skip audio, else mono float at this rate
//   max_frames 0 = all, else stop video after this many decoded frames
//   with_scores1 = fill scene_scores (costs one extra frame ref + SAD pass)
//   sample_frames 0 = keep all frames; else uniformly sample this many by
//              the floor-linspace rule of temporal_sampling (reference
//              video.py:53-57: linspace(0, T-1, n).astype(int64)) using
//              the container's frame count — every frame still runs
//              through the decoder (reference chains), but only sampled
//              frames pay sws_scale + RGB storage. Ignored when the frame
//              count is unknown or with_scores is set (SBD needs every
//              frame's score).
// Returns 0 on success.
//   threads    video decoder thread count (1 = default; 0 = auto-detect)
int av_decode(const char* path, const uint8_t* data, int64_t len,
              int32_t size, int32_t target_sr, int64_t max_frames,
              int32_t with_scores, int64_t sample_frames, int32_t threads,
              AvDecoded* out) {
  memset(out, 0, sizeof(*out));
  Decoder d;
  int rc = open_input(&d, path, data, len, target_sr > 0, out->err, threads);
  if (rc < 0) return -1;

  if (d.fmt->duration > 0)
    out->duration = d.fmt->duration / double(AV_TIME_BASE);

  double fps = 0.0;
  AVRational vtb{};
  const AVPixFmtDescriptor* pixdesc = nullptr;
  int out_w = 0, out_h = 0;     // sws output (before crop)
  int crop_x = 0, crop_y = 0;   // top-left of center crop
  int fin_w = 0, fin_h = 0;     // final stored frame dims
  if (d.vstream >= 0) {
    AVStream* st = d.fmt->streams[d.vstream];
    vtb = st->time_base;
    AVRational r = st->avg_frame_rate.num ? st->avg_frame_rate
                                          : st->r_frame_rate;
    if (r.den) fps = av_q2d(r);
    int w = d.vctx->width, h = d.vctx->height;
    if (size > 0) {
      double scale = double(size) / std::min(w, h);
      out_w = std::max<int>(int(std::lround(w * scale)), size);
      out_h = std::max<int>(int(std::lround(h * scale)), size);
      fin_w = fin_h = size;
      crop_x = (out_w - size) / 2;
      crop_y = (out_h - size) / 2;
    } else {
      out_w = fin_w = w;
      out_h = fin_h = h;
    }
    d.sws = sws_getContext(w, h, d.vctx->pix_fmt, out_w, out_h,
                           AV_PIX_FMT_RGB24, SWS_AREA, nullptr, nullptr,
                           nullptr);
    pixdesc = av_pix_fmt_desc_get(d.vctx->pix_fmt);
  }

  AVRational atb{};
  if (d.astream >= 0 && target_sr > 0) {
    atb = d.fmt->streams[d.astream]->time_base;
    AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
    AVChannelLayout in_layout;
    if (d.actx->ch_layout.nb_channels > 0) {
      av_channel_layout_copy(&in_layout, &d.actx->ch_layout);
    } else {
      av_channel_layout_default(&in_layout, 2);
    }
    rc = swr_alloc_set_opts2(&d.swr, &mono, AV_SAMPLE_FMT_FLT, target_sr,
                             &in_layout, d.actx->sample_fmt,
                             d.actx->sample_rate, 0, nullptr);
    av_channel_layout_uninit(&in_layout);
    if (rc < 0 || swr_init(d.swr) < 0) {
      set_err(out->err, "swr_init", rc);
      swr_free(&d.swr);
      d.astream = -1;
    }
  } else {
    d.astream = -1;
  }

  // uniform frame sampling plan (only when the container knows its count)
  std::vector<bool> selected;
  if (sample_frames > 0 && !with_scores && d.vstream >= 0) {
    int64_t est = d.fmt->streams[d.vstream]->nb_frames;
    if (est <= 0 && out->duration > 0 && fps > 0)
      est = int64_t(std::lround(out->duration * fps));
    if (est > sample_frames) {
      selected.assign(size_t(est), false);
      for (int64_t i = 0; i < sample_frames; i++) {
        // floor-linspace: trunc(i * (T-1) / (n-1)), n==1 -> frame 0
        int64_t idx = sample_frames > 1
                          ? int64_t(double(i) * double(est - 1) /
                                    double(sample_frames - 1))
                          : 0;
        selected[size_t(std::min(idx, est - 1))] = true;
      }
    }
  }

  std::vector<uint8_t> frames;
  std::vector<double> times;
  std::vector<double> scores;
  std::vector<float> audio;
  double prev_mafd = 0.0;
  int64_t vidx = 0;  // decoded-frame index (independent of stored count)

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  std::vector<uint8_t> rgb(size_t(out_w) * out_h * 3);
  std::vector<float> abuf;

  // geometry the sws context (and the scdet SAD) were configured for —
  // frames that switch resolution/pix_fmt mid-stream (malformed or
  // variable containers) must not be fed into a mismatched scaler
  const int cfg_w = d.vctx ? d.vctx->width : 0;
  const int cfg_h = d.vctx ? d.vctx->height : 0;
  const int cfg_fmt = d.vctx ? d.vctx->pix_fmt : -1;

  auto take_video = [&](AVFrame* f) {
    if (f->width != cfg_w || f->height != cfg_h || f->format != cfg_fmt)
      return;  // skip-and-continue, the pipeline's data-error policy
    int64_t this_idx = vidx++;
    if (!selected.empty() &&
        (this_idx >= int64_t(selected.size()) || !selected[size_t(this_idx)]))
      return;
    if (max_frames > 0 && int64_t(times.size()) >= max_frames) return;
    if (with_scores && pixdesc) {
      if (d.prev && d.prev->width == f->width && d.prev->height == f->height) {
        uint64_t count = 0;
        double sad = frame_sad(f, d.prev, pixdesc, &count);
        // vf_scdet: mafd = sad * 100 / count / (1 << bitdepth), bitdepth 8.
        double mafd = count ? sad * 100.0 / count / 256.0 : 0.0;
        double diff = std::fabs(mafd - prev_mafd);
        scores.push_back(std::clamp(std::min(mafd, diff), 0.0, 100.0));
        prev_mafd = mafd;
      } else {
        scores.push_back(0.0);
        prev_mafd = 0.0;
      }
      if (!d.prev) d.prev = av_frame_alloc();
      av_frame_unref(d.prev);
      av_frame_ref(d.prev, f);
    }
    uint8_t* dst[1] = {rgb.data()};
    int dst_stride[1] = {out_w * 3};
    sws_scale(d.sws, f->data, f->linesize, 0, f->height, dst, dst_stride);
    size_t base = frames.size();
    frames.resize(base + size_t(fin_w) * fin_h * 3);
    for (int y = 0; y < fin_h; y++) {
      memcpy(frames.data() + base + size_t(y) * fin_w * 3,
             rgb.data() + (size_t(y + crop_y) * out_w + crop_x) * 3,
             size_t(fin_w) * 3);
    }
    int64_t pts = f->pts != AV_NOPTS_VALUE ? f->pts : f->best_effort_timestamp;
    times.push_back(pts != AV_NOPTS_VALUE ? pts * av_q2d(vtb) : -1.0);
  };

  double audio_first_pts = 0.0;
  bool audio_pts_seen = false;
  auto take_audio = [&](AVFrame* f) {
    if (!audio_pts_seen && f->pts != AV_NOPTS_VALUE) {
      audio_first_pts = f->pts * av_q2d(atb);
      audio_pts_seen = true;
    }
    int max_out = swr_get_out_samples(d.swr, f->nb_samples);
    abuf.resize(std::max(max_out, 256));
    uint8_t* outp[1] = {reinterpret_cast<uint8_t*>(abuf.data())};
    int got = swr_convert(d.swr, outp, int(abuf.size()),
                          const_cast<const uint8_t**>(f->extended_data),
                          f->nb_samples);
    if (got > 0) audio.insert(audio.end(), abuf.data(), abuf.data() + got);
  };

  auto drain = [&](AVCodecContext* ctx, bool is_video) {
    while (true) {
      int r = avcodec_receive_frame(ctx, frame);
      if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) break;
      if (r < 0) break;
      if (is_video) take_video(frame);
      else take_audio(frame);
      av_frame_unref(frame);
    }
  };

  bool video_done = d.vstream < 0;
  while (av_read_frame(d.fmt, pkt) >= 0) {
    if (pkt->stream_index == d.vstream && d.vctx && !video_done) {
      if (avcodec_send_packet(d.vctx, pkt) >= 0) drain(d.vctx, true);
      if (max_frames > 0 && int64_t(times.size()) >= max_frames &&
          d.astream < 0) {
        av_packet_unref(pkt);
        break;
      }
    } else if (pkt->stream_index == d.astream && d.actx) {
      if (avcodec_send_packet(d.actx, pkt) >= 0) drain(d.actx, false);
    }
    av_packet_unref(pkt);
  }
  // flush decoders
  if (d.vctx && !video_done) {
    avcodec_send_packet(d.vctx, nullptr);
    drain(d.vctx, true);
  }
  if (d.actx && d.astream >= 0) {
    avcodec_send_packet(d.actx, nullptr);
    drain(d.actx, false);
    // flush the resampler
    abuf.resize(4096);
    while (true) {
      uint8_t* outp[1] = {reinterpret_cast<uint8_t*>(abuf.data())};
      int got = swr_convert(d.swr, outp, int(abuf.size()), nullptr, 0);
      if (got <= 0) break;
      audio.insert(audio.end(), abuf.data(), abuf.data() + got);
    }
  }
  av_frame_free(&frame);
  av_packet_free(&pkt);

  out->n_frames = int64_t(times.size());
  out->width = fin_w;
  out->height = fin_h;
  out->fps = fps;
  if (!frames.empty()) {
    out->frames = static_cast<uint8_t*>(malloc(frames.size()));
    memcpy(out->frames, frames.data(), frames.size());
    out->frame_times = static_cast<double*>(malloc(times.size() * 8));
    memcpy(out->frame_times, times.data(), times.size() * 8);
    if (with_scores) {
      scores.resize(times.size(), 0.0);
      out->scene_scores = static_cast<double*>(malloc(scores.size() * 8));
      memcpy(out->scene_scores, scores.data(), scores.size() * 8);
    }
  }
  // audio alignment, the reference's _align_audio_frames ref_start rule
  // (feature_extraction/code/data/video.py:152-163): samples before the
  // requested window start (pts < 0, e.g. shifted stream copies) are
  // trimmed; a late audio start is reported, not padded (also reference
  // behavior).
  if (audio_pts_seen && audio_first_pts < 0.0 && !audio.empty()) {
    size_t lead = size_t(std::min<double>(
        std::lround(-audio_first_pts * target_sr), double(audio.size())));
    audio.erase(audio.begin(), audio.begin() + lead);
    audio_first_pts = 0.0;
  }
  out->audio_start = audio_pts_seen ? audio_first_pts : 0.0;
  out->n_samples = int64_t(audio.size());
  out->sample_rate = target_sr;
  if (!audio.empty()) {
    out->audio = static_cast<float*>(malloc(audio.size() * 4));
    memcpy(out->audio, audio.data(), audio.size() * 4);
  }
  if (out->duration <= 0 && fps > 0 && out->n_frames > 0)
    out->duration = out->n_frames / fps;
  return (out->n_frames > 0 || out->n_samples > 0) ? 0 : -1;
}

// `ffmpeg -ss start -i in -t dur -c copy out` equivalent: keyframe-snapped
// stream copy of every stream into a new container.
int av_remux_clip(const char* in_path, const char* out_path, double start,
                  double dur, char* err) {
  AVFormatContext* in = nullptr;
  AVFormatContext* outf = nullptr;
  int rc = avformat_open_input(&in, in_path, nullptr, nullptr);
  if (rc < 0) {
    set_err(err, "open_input", rc);
    return -1;
  }
  rc = avformat_find_stream_info(in, nullptr);
  if (rc < 0) {
    avformat_close_input(&in);
    set_err(err, "find_stream_info", rc);
    return -1;
  }
  avformat_alloc_output_context2(&outf, nullptr, nullptr, out_path);
  if (!outf) {
    avformat_close_input(&in);
    set_err(err, "alloc_output");
    return -1;
  }
  std::vector<int> map(in->nb_streams, -1);
  for (unsigned i = 0; i < in->nb_streams; i++) {
    AVCodecParameters* par = in->streams[i]->codecpar;
    if (par->codec_type != AVMEDIA_TYPE_VIDEO &&
        par->codec_type != AVMEDIA_TYPE_AUDIO)
      continue;
    AVStream* st = avformat_new_stream(outf, nullptr);
    avcodec_parameters_copy(st->codecpar, par);
    st->codecpar->codec_tag = 0;
    st->time_base = in->streams[i]->time_base;
    map[i] = st->index;
  }
  if (!(outf->oformat->flags & AVFMT_NOFILE)) {
    rc = avio_open(&outf->pb, out_path, AVIO_FLAG_WRITE);
    if (rc < 0) {
      set_err(err, "avio_open", rc);
      avformat_close_input(&in);
      avformat_free_context(outf);
      return -1;
    }
  }
  rc = avformat_write_header(outf, nullptr);
  if (rc < 0) {
    set_err(err, "write_header", rc);
    avformat_close_input(&in);
    if (outf->pb) avio_closep(&outf->pb);
    avformat_free_context(outf);
    return -1;
  }
  int64_t seek_ts = int64_t(start * AV_TIME_BASE);
  av_seek_frame(in, -1, seek_ts, AVSEEK_FLAG_BACKWARD);
  AVPacket* pkt = av_packet_alloc();
  // pass 1: ONE shared timestamp origin = min first dts across mapped
  // streams (ffmpeg's `-avoid_negative_ts 1` rebases all streams by one
  // global shift, extract_clips.py:88-94 — per-stream rebasing would skew
  // audio vs video by up to a GOP on keyframe-snapped cuts)
  int64_t base_us = INT64_MAX;
  {
    unsigned want = 0;
    for (unsigned i = 0; i < in->nb_streams; i++)
      if (i < map.size() && map[i] >= 0) want++;
    std::vector<bool> got(in->nb_streams, false);
    unsigned seen = 0;
    while (seen < want && av_read_frame(in, pkt) >= 0) {
      int si = pkt->stream_index;
      AVRational itb = in->streams[si]->time_base;
      if (si < int(map.size()) && map[si] >= 0 && !got[size_t(si)]) {
        int64_t b = pkt->dts != AV_NOPTS_VALUE ? pkt->dts : pkt->pts;
        if (b != AV_NOPTS_VALUE) {
          base_us = std::min(base_us, av_rescale_q(b, itb, AV_TIME_BASE_Q));
          got[size_t(si)] = true;
          seen++;
        }
      }
      double t = pkt->pts != AV_NOPTS_VALUE ? pkt->pts * av_q2d(itb)
               : pkt->dts != AV_NOPTS_VALUE ? pkt->dts * av_q2d(itb) : 0.0;
      av_packet_unref(pkt);
      // a stream may have no packets inside the cut: stop scanning past it
      if (dur > 0 && t >= start + dur) break;
    }
    if (base_us == INT64_MAX) base_us = 0;
    av_seek_frame(in, -1, seek_ts, AVSEEK_FLAG_BACKWARD);
  }
  while (av_read_frame(in, pkt) >= 0) {
    int oi = pkt->stream_index < int(map.size()) ? map[pkt->stream_index] : -1;
    if (oi < 0) {
      av_packet_unref(pkt);
      continue;
    }
    AVRational itb = in->streams[pkt->stream_index]->time_base;
    double t = pkt->pts != AV_NOPTS_VALUE ? pkt->pts * av_q2d(itb)
                                          : (pkt->dts * av_q2d(itb));
    if (dur > 0 && t >= start + dur) {
      // ffmpeg -t also hard-cuts at the first past-the-end packet
      av_packet_unref(pkt);
      break;
    }
    AVRational otb = outf->streams[oi]->time_base;
    int64_t shift = av_rescale_q(base_us, AV_TIME_BASE_Q, itb);
    if (pkt->pts != AV_NOPTS_VALUE)
      pkt->pts = av_rescale_q(pkt->pts - shift, itb, otb);
    if (pkt->dts != AV_NOPTS_VALUE)
      pkt->dts = av_rescale_q(pkt->dts - shift, itb, otb);
    pkt->duration = av_rescale_q(pkt->duration, itb, otb);
    pkt->pos = -1;
    pkt->stream_index = oi;
    av_interleaved_write_frame(outf, pkt);
    av_packet_unref(pkt);
  }
  av_packet_free(&pkt);
  av_write_trailer(outf);
  avformat_close_input(&in);
  if (outf->pb) avio_closep(&outf->pb);
  avformat_free_context(outf);
  return 0;
}

// Encode raw arrays into an mp4 with mpeg4 video + AAC audio (both native
// libavcodec encoders — no external encoder deps). Fixture generator for
// tests: lets the suite exercise the REAL compressed-media contract
// (demux, AAC decode, resample) without network access.
int av_encode_mp4(const char* path, const uint8_t* frames, int64_t n_frames,
                  int32_t w, int32_t h, double fps, const float* audio,
                  int64_t n_samples, int32_t sr, char* err) {
  AVFormatContext* fmt = nullptr;
  avformat_alloc_output_context2(&fmt, nullptr, "mp4", path);
  if (!fmt) {
    set_err(err, "alloc_output");
    return -1;
  }
  int rc = 0;
  AVCodecContext* vctx = nullptr;
  AVCodecContext* actx = nullptr;
  AVStream* vst = nullptr;
  AVStream* ast = nullptr;
  SwsContext* sws = nullptr;
  SwrContext* swr = nullptr;

  if (n_frames > 0) {
    const AVCodec* vcodec = avcodec_find_encoder(AV_CODEC_ID_MPEG4);
    vst = avformat_new_stream(fmt, nullptr);
    vctx = avcodec_alloc_context3(vcodec);
    vctx->width = w;
    vctx->height = h;
    vctx->pix_fmt = AV_PIX_FMT_YUV420P;
    vctx->time_base = av_d2q(1.0 / fps, 100000);
    vctx->gop_size = 12;
    vctx->bit_rate = int64_t(w) * h * 4;
    if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
      vctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    rc = avcodec_open2(vctx, vcodec, nullptr);
    if (rc < 0) {
      set_err(err, "open mpeg4", rc);
      goto fail;
    }
    avcodec_parameters_from_context(vst->codecpar, vctx);
    vst->time_base = vctx->time_base;
    sws = sws_getContext(w, h, AV_PIX_FMT_RGB24, w, h, AV_PIX_FMT_YUV420P,
                         SWS_BILINEAR, nullptr, nullptr, nullptr);
  }
  if (n_samples > 0) {
    const AVCodec* acodec = avcodec_find_encoder(AV_CODEC_ID_AAC);
    ast = avformat_new_stream(fmt, nullptr);
    actx = avcodec_alloc_context3(acodec);
    actx->sample_fmt = AV_SAMPLE_FMT_FLTP;
    actx->sample_rate = sr;
    AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
    av_channel_layout_copy(&actx->ch_layout, &mono);
    actx->time_base = AVRational{1, sr};
    actx->bit_rate = 64000;
    if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
      actx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    rc = avcodec_open2(actx, acodec, nullptr);
    if (rc < 0) {
      set_err(err, "open aac", rc);
      goto fail;
    }
    avcodec_parameters_from_context(ast->codecpar, actx);
    ast->time_base = actx->time_base;
  }
  if (!(fmt->oformat->flags & AVFMT_NOFILE)) {
    rc = avio_open(&fmt->pb, path, AVIO_FLAG_WRITE);
    if (rc < 0) {
      set_err(err, "avio_open", rc);
      goto fail;
    }
  }
  rc = avformat_write_header(fmt, nullptr);
  if (rc < 0) {
    set_err(err, "write_header", rc);
    goto fail;
  }

  {
    AVPacket* pkt = av_packet_alloc();
    auto write_packets = [&](AVCodecContext* ctx, AVStream* st) {
      while (true) {
        int r = avcodec_receive_packet(ctx, pkt);
        if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) break;
        if (r < 0) break;
        if (pkt->duration == 0) {
          // mpeg4 leaves duration unset; a zero-duration final mp4
          // sample is dropped by demuxers (stts tail (1, 0))
          pkt->duration =
              ctx->codec_type == AVMEDIA_TYPE_AUDIO && ctx->frame_size > 0
                  ? ctx->frame_size
                  : 1;
        }
        av_packet_rescale_ts(pkt, ctx->time_base, st->time_base);
        pkt->stream_index = st->index;
        av_interleaved_write_frame(fmt, pkt);
        av_packet_unref(pkt);
      }
    };

    auto send_frame = [&](AVCodecContext* ctx, AVStream* st, AVFrame* f) {
      // drain-and-retry on EAGAIN so a full encoder queue never drops
      // a frame
      while (true) {
        int r = avcodec_send_frame(ctx, f);
        if (r != AVERROR(EAGAIN)) return;
        write_packets(ctx, st);
      }
    };

    if (vctx) {
      AVFrame* yuv = av_frame_alloc();
      yuv->format = AV_PIX_FMT_YUV420P;
      yuv->width = w;
      yuv->height = h;
      av_frame_get_buffer(yuv, 0);
      for (int64_t i = 0; i < n_frames; i++) {
        const uint8_t* src[1] = {frames + i * int64_t(w) * h * 3};
        int src_stride[1] = {w * 3};
        av_frame_make_writable(yuv);
        sws_scale(sws, src, src_stride, 0, h, yuv->data, yuv->linesize);
        yuv->pts = i;
        send_frame(vctx, vst, yuv);
        write_packets(vctx, vst);
      }
      avcodec_send_frame(vctx, nullptr);
      write_packets(vctx, vst);
      av_frame_free(&yuv);
    }
    if (actx) {
      int fsz = actx->frame_size > 0 ? actx->frame_size : 1024;
      AVFrame* af = av_frame_alloc();
      af->format = AV_SAMPLE_FMT_FLTP;
      af->sample_rate = sr;
      AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
      av_channel_layout_copy(&af->ch_layout, &mono);
      af->nb_samples = fsz;
      av_frame_get_buffer(af, 0);
      int64_t pos = 0;
      while (pos < n_samples) {
        int chunk = int(std::min<int64_t>(fsz, n_samples - pos));
        av_frame_make_writable(af);
        float* dst = reinterpret_cast<float*>(af->data[0]);
        memcpy(dst, audio + pos, size_t(chunk) * 4);
        if (chunk < fsz) memset(dst + chunk, 0, size_t(fsz - chunk) * 4);
        af->pts = pos;
        pos += chunk;
        send_frame(actx, ast, af);
        write_packets(actx, ast);
      }
      avcodec_send_frame(actx, nullptr);
      write_packets(actx, ast);
      av_frame_free(&af);
    }
    av_packet_free(&pkt);
  }

  av_write_trailer(fmt);
  if (sws) sws_freeContext(sws);
  if (swr) swr_free(&swr);
  if (vctx) avcodec_free_context(&vctx);
  if (actx) avcodec_free_context(&actx);
  if (fmt->pb) avio_closep(&fmt->pb);
  avformat_free_context(fmt);
  return 0;

fail:
  if (sws) sws_freeContext(sws);
  if (swr) swr_free(&swr);
  if (vctx) avcodec_free_context(&vctx);
  if (actx) avcodec_free_context(&actx);
  if (fmt && fmt->pb) avio_closep(&fmt->pb);
  if (fmt) avformat_free_context(fmt);
  return -1;
}

// Library/ABI sanity probe: returns the linked libavformat version int.
unsigned av_probe_version(void) { return avformat_version(); }

}  // extern "C"
