// Native compressed-video codec shim (C ABI, loaded via ctypes).
//
// Counterpart of the reference's ffmpeg decoder core
// (csrc/io/decoder/decoder.cpp:699, csrc/io/video_reader/video_reader.cpp:669)
// re-designed for the TPU build: decode happens on the host through the
// system libavformat/libavcodec/libswscale, producing contiguous THWC RGB
// uint8 buffers that feed straight into device transfers.  No torch, no
// dispatcher — a flat C ABI over four calls:
//
//   cvt_video_decode     — demux+decode+scale a [start,end] window to RGB24
//   cvt_video_timestamps — demux-only pts scan (no pixel decode)
//   cvt_video_encode     — mux+encode THWC uint8 (libx264 / mpeg4 / mjpeg)
//   cvt_audio_decode     — best-audio-stream decode to float32 planar
//
// All buffers returned through out-params are malloc'd here and released
// with cvt_video_free.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
#include <libswscale/swscale.h>
}

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

// encoders (x264 especially) chat on stderr at INFO level; callers want a
// quiet library (override with cvt_set_log_level for debugging)
struct LogQuiet {
  LogQuiet() { av_log_set_level(AV_LOG_ERROR); }
} log_quiet_init;

struct InputCtx {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* dec = nullptr;
  int stream_index = -1;

  ~InputCtx() {
    if (dec) avcodec_free_context(&dec);
    if (fmt) avformat_close_input(&fmt);
  }
};

// Open `path` and set up a decoder for the best stream of `type`.
int open_input(const char* path, AVMediaType type, InputCtx& in) {
  if (avformat_open_input(&in.fmt, path, nullptr, nullptr) < 0) return -1;
  if (avformat_find_stream_info(in.fmt, nullptr) < 0) return -2;
  const AVCodec* codec = nullptr;
  in.stream_index = av_find_best_stream(in.fmt, type, -1, -1, &codec, 0);
  if (in.stream_index < 0 || !codec) return -3;
  in.dec = avcodec_alloc_context3(codec);
  if (!in.dec) return -4;
  AVStream* st = in.fmt->streams[in.stream_index];
  if (avcodec_parameters_to_context(in.dec, st->codecpar) < 0) return -5;
  in.dec->thread_count = 0;  // auto
  if (avcodec_open2(in.dec, codec, nullptr) < 0) return -6;
  return 0;
}

double stream_fps(const AVFormatContext* fmt, int idx) {
  AVStream* st = fmt->streams[idx];
  AVRational r = st->avg_frame_rate;
  if (r.num <= 0 || r.den <= 0) r = st->r_frame_rate;
  return (r.num > 0 && r.den > 0) ? av_q2d(r) : 0.0;
}

}  // namespace

extern "C" {

void cvt_video_free(void* p) { free(p); }

void cvt_set_log_level(int level) { av_log_set_level(level); }

// Decode video frames with pts in [start_sec, end_sec] (end_sec < 0 = all)
// to an RGB24 THWC buffer.  Returns 0 on success.
int cvt_video_decode(const char* path, double start_sec, double end_sec,
                     uint8_t** out, int* t, int* h, int* w, double* fps,
                     double** pts_out) {
  InputCtx in;
  int rc = open_input(path, AVMEDIA_TYPE_VIDEO, in);
  if (rc != 0) return rc;
  AVStream* st = in.fmt->streams[in.stream_index];
  const double tb = av_q2d(st->time_base);

  if (start_sec > 0) {
    int64_t ts = (int64_t)(start_sec / tb);
    av_seek_frame(in.fmt, in.stream_index, ts, AVSEEK_FLAG_BACKWARD);
  }

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  AVFrame* rgb = av_frame_alloc();
  SwsContext* sws = nullptr;
  std::vector<uint8_t> pixels;
  std::vector<double> ptss;
  int W = 0, H = 0;
  bool done = false;

  auto drain = [&](bool flushing) -> int {
    while (!done) {
      int r = avcodec_receive_frame(in.dec, frame);
      if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) return 0;
      if (r < 0) return -7;
      int64_t bpts = frame->best_effort_timestamp;
      double sec = (bpts == AV_NOPTS_VALUE) ? ptss.size() / 30.0 : bpts * tb;
      if (end_sec >= 0 && sec > end_sec + 1e-9) {
        done = true;
        av_frame_unref(frame);
        return 0;
      }
      if (sec + 1e-9 >= start_sec) {
        if (!sws) {
          W = frame->width;
          H = frame->height;
          sws = sws_getContext(W, H, (AVPixelFormat)frame->format, W, H,
                               AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr,
                               nullptr, nullptr);
          if (!sws) return -8;
          // honor full-range (JPEG-range) sources — MJPEG, and stills like
          // AVIF — or the RGB conversion is ~7 LSB dark across the board
          if (frame->color_range == AVCOL_RANGE_JPEG) {
            int* inv_table;
            int* table;
            int src_range, dst_range, brightness, contrast, saturation;
            if (sws_getColorspaceDetails(sws, &inv_table, &src_range, &table,
                                         &dst_range, &brightness, &contrast,
                                         &saturation) >= 0)
              sws_setColorspaceDetails(sws, inv_table, 1, table, dst_range,
                                       brightness, contrast, saturation);
          }
          rgb->format = AV_PIX_FMT_RGB24;
          rgb->width = W;
          rgb->height = H;
          if (av_frame_get_buffer(rgb, 1) < 0) return -9;
        }
        sws_scale(sws, frame->data, frame->linesize, 0, H, rgb->data,
                  rgb->linesize);
        size_t off = pixels.size();
        pixels.resize(off + (size_t)H * W * 3);
        // rgb->linesize may exceed W*3; copy row-wise into the packed buffer
        for (int y = 0; y < H; ++y)
          memcpy(pixels.data() + off + (size_t)y * W * 3,
                 rgb->data[0] + (size_t)y * rgb->linesize[0], (size_t)W * 3);
        ptss.push_back(sec);
      }
      av_frame_unref(frame);
    }
    (void)flushing;
    return 0;
  };

  int err = 0;
  while (!done && av_read_frame(in.fmt, pkt) >= 0) {
    if (pkt->stream_index == in.stream_index) {
      int s;
      while ((s = avcodec_send_packet(in.dec, pkt)) == AVERROR(EAGAIN)) {
        err = drain(false);  // make room, then resend the same packet
        if (err || done) break;
      }
      if (!err && !done && s == 0) err = drain(false);
      if (err) break;
    }
    av_packet_unref(pkt);
  }
  av_packet_unref(pkt);
  if (!err && !done) {
    avcodec_send_packet(in.dec, nullptr);  // flush
    err = drain(true);
  }

  if (sws) sws_freeContext(sws);
  av_frame_free(&rgb);
  av_frame_free(&frame);
  av_packet_free(&pkt);
  if (err) return err;
  if (ptss.empty()) return -10;

  *t = (int)ptss.size();
  *h = H;
  *w = W;
  *fps = stream_fps(in.fmt, in.stream_index);
  *out = (uint8_t*)malloc(pixels.size());
  if (!*out) return -11;
  memcpy(*out, pixels.data(), pixels.size());
  if (pts_out) {
    *pts_out = (double*)malloc(ptss.size() * sizeof(double));
    if (!*pts_out) {
      free(*out);
      return -11;
    }
    memcpy(*pts_out, ptss.data(), ptss.size() * sizeof(double));
  }
  return 0;
}

// Demux-only pts scan of the best video stream (counterpart of the
// reference's read_video_timestamps fast path, video_reader.cpp probe).
int cvt_video_timestamps(const char* path, double** pts_out, int* n,
                         double* fps) {
  InputCtx in;
  int rc = open_input(path, AVMEDIA_TYPE_VIDEO, in);
  if (rc != 0) return rc;
  AVStream* st = in.fmt->streams[in.stream_index];
  const double tb = av_q2d(st->time_base);
  AVPacket* pkt = av_packet_alloc();
  std::vector<double> ptss;
  while (av_read_frame(in.fmt, pkt) >= 0) {
    if (pkt->stream_index == in.stream_index) {
      int64_t p = (pkt->pts == AV_NOPTS_VALUE) ? pkt->dts : pkt->pts;
      ptss.push_back(p == AV_NOPTS_VALUE ? 0.0 : p * tb);
    }
    av_packet_unref(pkt);
  }
  av_packet_free(&pkt);
  std::sort(ptss.begin(), ptss.end());
  *n = (int)ptss.size();
  *fps = stream_fps(in.fmt, in.stream_index);
  *pts_out = (double*)malloc(ptss.size() * sizeof(double));
  if (!*pts_out) return -11;
  memcpy(*pts_out, ptss.data(), ptss.size() * sizeof(double));
  return 0;
}

// Encode THWC uint8 RGB frames into `path` (container from extension).
// codec_name: "libx264" | "mpeg4" | "mjpeg"; crf used for libx264 (mapped
// to a bitrate heuristic for the others).
int cvt_video_encode(const char* path, const uint8_t* thwc, int t, int h,
                     int w, double fps, const char* codec_name, int crf) {
  if (t <= 0 || h <= 0 || w <= 0) return -1;
  AVFormatContext* oc = nullptr;
  if (avformat_alloc_output_context2(&oc, nullptr, nullptr, path) < 0 || !oc)
    return -2;

  const AVCodec* codec = avcodec_find_encoder_by_name(codec_name);
  if (!codec && std::string(codec_name) == "libx264")
    codec = avcodec_find_encoder(AV_CODEC_ID_H264);
  if (!codec) {
    avformat_free_context(oc);
    return -3;
  }

  AVCodecContext* enc = avcodec_alloc_context3(codec);
  AVStream* st = avformat_new_stream(oc, nullptr);
  if (!enc || !st) {
    if (enc) avcodec_free_context(&enc);
    avformat_free_context(oc);
    return -4;
  }
  AVRational rate = av_d2q(fps, 1000000);
  enc->width = w;
  enc->height = h;
  enc->time_base = av_inv_q(rate);
  enc->framerate = rate;
  enc->pix_fmt = (codec->id == AV_CODEC_ID_MJPEG) ? AV_PIX_FMT_YUVJ420P
                                                  : AV_PIX_FMT_YUV420P;
  enc->gop_size = 12;
  if (codec->id == AV_CODEC_ID_MJPEG) {
    // mjpeg quality rides the qscale knobs, not crf
    enc->flags |= AV_CODEC_FLAG_QSCALE;
    enc->global_quality = FF_QP2LAMBDA * 3;
  } else if (codec->id == AV_CODEC_ID_H264) {
    char buf[8];
    snprintf(buf, sizeof buf, "%d", crf < 0 ? 23 : crf);
    av_opt_set(enc->priv_data, "crf", buf, 0);
    av_opt_set(enc->priv_data, "preset", "fast", 0);
  } else {
    enc->bit_rate = (int64_t)w * h * (int64_t)(fps + 0.5);  // ~1 bit/px/frame
  }
  if (oc->oformat->flags & AVFMT_GLOBALHEADER)
    enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;

  int rc = 0;
  AVPacket* pkt = nullptr;
  AVFrame* yuv = nullptr;
  SwsContext* sws = nullptr;

  auto write_packets = [&]() -> int {
    while (true) {
      int r = avcodec_receive_packet(enc, pkt);
      if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) return 0;
      if (r < 0) return -8;
      av_packet_rescale_ts(pkt, enc->time_base, st->time_base);
      // without a duration the mp4 muxer ends the stream at the last pts,
      // and demuxers then flag the final packet AV_PKT_FLAG_DISCARD
      if (pkt->duration == 0)
        pkt->duration = av_rescale_q(1, enc->time_base, st->time_base);
      pkt->stream_index = st->index;
      if (av_interleaved_write_frame(oc, pkt) < 0) return -9;
    }
  };

  do {
    if (avcodec_open2(enc, codec, nullptr) < 0) { rc = -5; break; }
    if (avcodec_parameters_from_context(st->codecpar, enc) < 0) { rc = -5; break; }
    st->time_base = enc->time_base;
    if (!(oc->oformat->flags & AVFMT_NOFILE) &&
        avio_open(&oc->pb, path, AVIO_FLAG_WRITE) < 0) { rc = -6; break; }
    if (avformat_write_header(oc, nullptr) < 0) { rc = -6; break; }

    pkt = av_packet_alloc();
    yuv = av_frame_alloc();
    yuv->format = enc->pix_fmt;
    yuv->width = w;
    yuv->height = h;
    if (av_frame_get_buffer(yuv, 1) < 0) { rc = -7; break; }
    sws = sws_getContext(w, h, AV_PIX_FMT_RGB24, w, h, enc->pix_fmt,
                         SWS_BILINEAR, nullptr, nullptr, nullptr);
    if (!sws) { rc = -7; break; }

    for (int i = 0; i < t && rc == 0; ++i) {
      const uint8_t* src[1] = {thwc + (size_t)i * h * w * 3};
      const int stride[1] = {w * 3};
      av_frame_make_writable(yuv);
      sws_scale(sws, src, stride, 0, h, yuv->data, yuv->linesize);
      yuv->pts = i;
      if (enc->flags & AV_CODEC_FLAG_QSCALE)
        yuv->quality = enc->global_quality;
      if (avcodec_send_frame(enc, yuv) < 0) { rc = -8; break; }
      rc = write_packets();
    }
    if (rc == 0) {
      avcodec_send_frame(enc, nullptr);  // flush
      rc = write_packets();
    }
    if (rc == 0 && av_write_trailer(oc) < 0) rc = -9;
  } while (false);

  if (sws) sws_freeContext(sws);
  if (yuv) av_frame_free(&yuv);
  if (pkt) av_packet_free(&pkt);
  avcodec_free_context(&enc);
  if (oc->pb && !(oc->oformat->flags & AVFMT_NOFILE)) avio_closep(&oc->pb);
  avformat_free_context(oc);
  return rc;
}

// Mux interleaved float32 PCM (samples x channels) as an audio stream into
// an ALREADY-ENCODED video file is awkward with one pass, so audio+video
// muxing is a single call: encode THWC video AND float audio together
// (reference write_video's audio_array path, io/video.py:48-129).
int cvt_video_encode_av(const char* path, const uint8_t* thwc, int t, int h,
                        int w, double fps, const char* codec_name, int crf,
                        const float* audio, long long n_samples, int channels,
                        int sample_rate) {
  if (!audio || n_samples <= 0)
    return cvt_video_encode(path, thwc, t, h, w, fps,
                            codec_name ? codec_name : "libx264", crf);
  // Keep the implementation simple and robust: write video first via the
  // single-stream encoder into a temp file, then remux + encode audio.
  // (ffmpeg's API cost of interleaving two encoders in one pass is high;
  // for the library's contract — a file with both streams — this is
  // equivalent.)  Temp file shares the container format of `path`.
  // tmp must keep the extension: the muxer picks the container from it
  std::string spath(path);
  size_t dot = spath.find_last_of('.');
  std::string ext = dot == std::string::npos ? "mp4" : spath.substr(dot + 1);
  std::string tmp = spath + ".videotmp." + ext;
  int rc = cvt_video_encode(tmp.c_str(), thwc, t, h, w, fps,
                            codec_name ? codec_name : "libx264", crf);
  if (rc != 0) { remove(tmp.c_str()); return rc; }

  AVFormatContext* in_fmt = nullptr;
  AVFormatContext* oc = nullptr;
  AVCodecContext* aenc = nullptr;
  SwrContext* swr = nullptr;
  AVPacket* pkt = av_packet_alloc();
  AVFrame* af = nullptr;
  rc = 0;
  do {
    if (avformat_open_input(&in_fmt, tmp.c_str(), nullptr, nullptr) < 0 ||
        avformat_find_stream_info(in_fmt, nullptr) < 0) { rc = -20; break; }
    if (avformat_alloc_output_context2(&oc, nullptr, nullptr, path) < 0) {
      rc = -21; break;
    }
    // copy the video stream
    AVStream* vin = in_fmt->streams[0];
    AVStream* vout = avformat_new_stream(oc, nullptr);
    if (!vout || avcodec_parameters_copy(vout->codecpar, vin->codecpar) < 0) {
      rc = -22; break;
    }
    vout->time_base = vin->time_base;
    // aac audio stream
    const AVCodec* acodec = avcodec_find_encoder(AV_CODEC_ID_AAC);
    AVStream* aout = avformat_new_stream(oc, nullptr);
    if (!acodec || !aout) { rc = -23; break; }
    aenc = avcodec_alloc_context3(acodec);
    av_channel_layout_default(&aenc->ch_layout, channels);
    aenc->sample_rate = sample_rate;
    aenc->sample_fmt = AV_SAMPLE_FMT_FLTP;
    aenc->bit_rate = 128000;
    aenc->time_base = AVRational{1, sample_rate};
    if (oc->oformat->flags & AVFMT_GLOBALHEADER)
      aenc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    if (avcodec_open2(aenc, acodec, nullptr) < 0) { rc = -24; break; }
    if (avcodec_parameters_from_context(aout->codecpar, aenc) < 0) {
      rc = -24; break;
    }
    aout->time_base = aenc->time_base;
    if (!(oc->oformat->flags & AVFMT_NOFILE) &&
        avio_open(&oc->pb, path, AVIO_FLAG_WRITE) < 0) { rc = -25; break; }
    if (avformat_write_header(oc, nullptr) < 0) { rc = -25; break; }

    // interleave: remux all video packets, then encoded audio (muxer
    // interleaves by dts)
    while (av_read_frame(in_fmt, pkt) >= 0) {
      if (pkt->stream_index == 0) {
        av_packet_rescale_ts(pkt, vin->time_base, vout->time_base);
        pkt->stream_index = vout->index;
        if (av_interleaved_write_frame(oc, pkt) < 0) { rc = -26; break; }
      }
      av_packet_unref(pkt);
    }
    if (rc) break;

    // float32 interleaved -> planar frames of aenc->frame_size
    AVChannelLayout in_layout;
    av_channel_layout_default(&in_layout, channels);
    if (swr_alloc_set_opts2(&swr, &aenc->ch_layout, AV_SAMPLE_FMT_FLTP,
                            sample_rate, &in_layout, AV_SAMPLE_FMT_FLT,
                            sample_rate, 0, nullptr) < 0 ||
        swr_init(swr) < 0) { rc = -27; break; }
    const int fsz = aenc->frame_size > 0 ? aenc->frame_size : 1024;
    af = av_frame_alloc();
    af->format = AV_SAMPLE_FMT_FLTP;
    av_channel_layout_copy(&af->ch_layout, &aenc->ch_layout);
    af->sample_rate = sample_rate;
    long long pos = 0;
    int64_t apts = 0;
    auto drain_audio = [&](bool flush) -> int {
      while (true) {
        int r = avcodec_receive_packet(aenc, pkt);
        if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) return 0;
        if (r < 0) return -28;
        av_packet_rescale_ts(pkt, aenc->time_base, aout->time_base);
        pkt->stream_index = aout->index;
        if (av_interleaved_write_frame(oc, pkt) < 0) return -29;
      }
      (void)flush;
    };
    while (pos < n_samples && rc == 0) {
      const int n = (int)((n_samples - pos) < fsz ? (n_samples - pos) : fsz);
      af->nb_samples = n;
      if (av_frame_get_buffer(af, 0) < 0) { rc = -27; break; }
      const uint8_t* src[1] = {(const uint8_t*)(audio + pos * channels)};
      if (swr_convert(swr, af->data, n, src, n) < 0) { rc = -27; break; }
      af->pts = apts;
      apts += n;
      pos += n;
      if (avcodec_send_frame(aenc, af) < 0) { rc = -28; break; }
      rc = drain_audio(false);
      av_frame_unref(af);
      af->format = AV_SAMPLE_FMT_FLTP;
      av_channel_layout_copy(&af->ch_layout, &aenc->ch_layout);
      af->sample_rate = sample_rate;
    }
    if (rc == 0) {
      avcodec_send_frame(aenc, nullptr);
      rc = drain_audio(true);
    }
    if (rc == 0 && av_write_trailer(oc) < 0) rc = -29;
  } while (false);

  if (af) av_frame_free(&af);
  if (pkt) av_packet_free(&pkt);
  if (swr) swr_free(&swr);
  if (aenc) avcodec_free_context(&aenc);
  if (oc) {
    if (oc->pb && !(oc->oformat->flags & AVFMT_NOFILE)) avio_closep(&oc->pb);
    avformat_free_context(oc);
  }
  if (in_fmt) avformat_close_input(&in_fmt);
  remove(tmp.c_str());
  return rc;
}

// Decode the best audio stream to interleaved float32 (samples, channels),
// resampled to its native rate (reference read_video returns aframes for
// containers with audio; io/video.py:236).
int cvt_audio_decode(const char* path, float** out, int* channels,
                     long long* n_samples, int* sample_rate) {
  InputCtx in;
  int rc = open_input(path, AVMEDIA_TYPE_AUDIO, in);
  if (rc != 0) return rc;

  SwrContext* swr = nullptr;
  AVChannelLayout out_layout;
  av_channel_layout_copy(&out_layout, &in.dec->ch_layout);
  if (swr_alloc_set_opts2(&swr, &out_layout, AV_SAMPLE_FMT_FLT,
                          in.dec->sample_rate, &in.dec->ch_layout,
                          in.dec->sample_fmt, in.dec->sample_rate, 0,
                          nullptr) < 0 ||
      swr_init(swr) < 0) {
    if (swr) swr_free(&swr);
    return -7;
  }
  const int nch = out_layout.nb_channels;

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  std::vector<float> samples;
  std::vector<float> tmp;

  auto drain = [&]() -> int {
    while (true) {
      int r = avcodec_receive_frame(in.dec, frame);
      if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) return 0;
      if (r < 0) return -8;
      int max_out = swr_get_out_samples(swr, frame->nb_samples);
      tmp.resize((size_t)max_out * nch);
      uint8_t* outp = (uint8_t*)tmp.data();
      int got = swr_convert(swr, &outp, max_out,
                            (const uint8_t**)frame->extended_data,
                            frame->nb_samples);
      if (got < 0) return -8;
      samples.insert(samples.end(), tmp.data(), tmp.data() + (size_t)got * nch);
      av_frame_unref(frame);
    }
  };

  int err = 0;
  while (av_read_frame(in.fmt, pkt) >= 0) {
    if (pkt->stream_index == in.stream_index) {
      int s;
      while ((s = avcodec_send_packet(in.dec, pkt)) == AVERROR(EAGAIN)) {
        err = drain();  // make room, then resend the same packet
        if (err) break;
      }
      if (!err && s == 0) err = drain();
      if (err) break;
    }
    av_packet_unref(pkt);
  }
  if (!err) {
    avcodec_send_packet(in.dec, nullptr);
    err = drain();
  }
  av_packet_free(&pkt);
  av_frame_free(&frame);
  int rate = in.dec->sample_rate;
  swr_free(&swr);
  av_channel_layout_uninit(&out_layout);
  if (err) return err;

  *channels = nch;
  *n_samples = (long long)(samples.size() / (size_t)nch);
  *sample_rate = rate;
  *out = (float*)malloc(samples.size() * sizeof(float));
  if (!*out) return -11;
  memcpy(*out, samples.data(), samples.size() * sizeof(float));
  return 0;
}

}  // extern "C"
