// Native video decoder on FFmpeg (libavformat/avcodec/swscale).
//
// Replaces the reference's decord dependency (vision_process.py:228-256,
// SpaceR-Eval/util.py:182-215) with an in-tree C++ library: probe returns
// frame count / fps / dimensions, read_frames does one sequential decode
// pass emitting only the requested frame indices as packed RGB24.
// Exposed as a C ABI for ctypes (no pybind11 in the build image).
//
// Build: make -C native  ->  libspacer_video.so

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Demux {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  int stream_index = -1;

  ~Demux() {
    if (codec) avcodec_free_context(&codec);
    if (fmt) avformat_close_input(&fmt);
  }

  int open(const char* path) {
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
    if (avformat_find_stream_info(fmt, nullptr) < 0) return -2;
    stream_index =
        av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
    if (stream_index < 0) return -3;
    AVStream* st = fmt->streams[stream_index];
    const AVCodec* dec = avcodec_find_decoder(st->codecpar->codec_id);
    if (!dec) return -4;
    codec = avcodec_alloc_context3(dec);
    if (!codec) return -5;
    if (avcodec_parameters_to_context(codec, st->codecpar) < 0) return -6;
    codec->thread_count = 0;  // auto
    if (avcodec_open2(codec, dec, nullptr) < 0) return -7;
    return 0;
  }

  AVStream* stream() const { return fmt->streams[stream_index]; }
};

double stream_fps(const AVStream* st) {
  AVRational r = st->avg_frame_rate;
  if (r.num <= 0 || r.den <= 0) r = st->r_frame_rate;
  if (r.num <= 0 || r.den <= 0) return 30.0;
  return av_q2d(r);
}

int64_t stream_frames(const AVFormatContext* fmt, const AVStream* st,
                      double fps) {
  if (st->nb_frames > 0) return st->nb_frames;
  // estimate from duration (same contract as cv2 CAP_PROP_FRAME_COUNT)
  double seconds = 0.0;
  if (st->duration > 0) {
    seconds = st->duration * av_q2d(st->time_base);
  } else if (fmt->duration > 0) {
    seconds = static_cast<double>(fmt->duration) / AV_TIME_BASE;
  }
  return static_cast<int64_t>(seconds * fps + 0.5);
}

}  // namespace

extern "C" {

typedef struct {
  int64_t total_frames;
  double fps;
  int width;
  int height;
} vd_info;

// Returns 0 on success, negative error code otherwise.
int vd_probe(const char* path, vd_info* info) {
  Demux d;
  int rc = d.open(path);
  if (rc != 0) return rc;
  AVStream* st = d.stream();
  info->fps = stream_fps(st);
  info->total_frames = stream_frames(d.fmt, st, info->fps);
  info->width = d.codec->width;
  info->height = d.codec->height;
  return 0;
}

// Decode the frames at `indices` (ascending, de-duplicated by the caller)
// into `out` as packed RGB24 (n * height * width * 3 bytes).  One
// sequential decode pass; frames past EOF repeat the last decoded frame.
// Returns the number of distinct frames actually decoded, or negative on
// error.
int vd_read_frames(const char* path, const int64_t* indices, int n,
                   uint8_t* out, int width, int height) {
  if (n <= 0) return 0;
  Demux d;
  int rc = d.open(path);
  if (rc != 0) return rc;

  SwsContext* sws = nullptr;
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  const size_t frame_bytes = static_cast<size_t>(width) * height * 3;

  int64_t pos = 0;      // index of the next decoded frame
  int want = 0;         // next entry in `indices` we are waiting for
  int decoded_any = 0;
  uint8_t* last = nullptr;  // last written output slot (for EOF backfill)

  auto emit = [&](AVFrame* f) {
    while (want < n && indices[want] == pos) {
      uint8_t* dst = out + static_cast<size_t>(want) * frame_bytes;
      if (!sws) {
        sws = sws_getContext(f->width, f->height,
                             static_cast<AVPixelFormat>(f->format), width,
                             height, AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr,
                             nullptr, nullptr);
      }
      uint8_t* planes[1] = {dst};
      int strides[1] = {width * 3};
      sws_scale(sws, f->data, f->linesize, 0, f->height, planes, strides);
      last = dst;
      decoded_any = 1;
      ++want;
    }
    ++pos;
  };

  int err = 0;
  while (want < n && err >= 0) {
    err = av_read_frame(d.fmt, pkt);
    if (err < 0) {
      // flush the decoder at EOF
      avcodec_send_packet(d.codec, nullptr);
      while (want < n &&
             avcodec_receive_frame(d.codec, frame) == 0) {
        emit(frame);
      }
      break;
    }
    if (pkt->stream_index != d.stream_index) {
      av_packet_unref(pkt);
      continue;
    }
    if (avcodec_send_packet(d.codec, pkt) == 0) {
      while (avcodec_receive_frame(d.codec, frame) == 0) {
        emit(frame);
        if (want >= n) break;
      }
    }
    av_packet_unref(pkt);
  }

  // backfill any remaining slots (indices past the real stream end) with
  // the last decoded frame
  while (want < n && last != nullptr) {
    std::memcpy(out + static_cast<size_t>(want) * frame_bytes, last,
                frame_bytes);
    ++want;
  }

  if (sws) sws_freeContext(sws);
  av_packet_free(&pkt);
  av_frame_free(&frame);
  return decoded_any ? want : -100;
}

}  // extern "C"
