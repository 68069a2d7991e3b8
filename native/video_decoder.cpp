// Native video decoder for cut_detection_tpu (libavformat/libavcodec).
//
// The reference's decode stage is OpenCV's VideoCapture (frameID/
// data.py:13-31, 213) — itself an ffmpeg wrapper.  This is the
// first-party equivalent (SURVEY.md §2.2: "host-side decode stage"):
// demux + decode + yuv->BGR24 conversion with a C ABI for ctypes, private
// per-handle state so N handles can decode N seek-separated chunks in
// parallel (the ParallelVideoReader pattern).
//
// Output format matches cv2: BGR24 interleaved HWC uint8 frames, so the
// downstream resize/normalize path is byte-compatible with the OpenCV
// backend.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

#include <cstdint>
#include <cstring>
#include <new>

namespace {

struct Decoder {
    AVFormatContext* fmt = nullptr;
    AVCodecContext* codec = nullptr;
    SwsContext* sws = nullptr;
    AVPacket* pkt = nullptr;
    AVFrame* frame = nullptr;
    int stream_index = -1;
    int width = 0;
    int height = 0;
    double fps = 0.0;
    int64_t nb_frames = 0;
    int64_t next_frame = 0;  // index of the next frame vd_read will return
    bool draining = false;

    ~Decoder() {
        if (sws) sws_freeContext(sws);
        if (codec) avcodec_free_context(&codec);
        if (fmt) avformat_close_input(&fmt);
        if (pkt) av_packet_free(&pkt);
        if (frame) av_frame_free(&frame);
    }
};

// Decode one frame into dec->frame.  Returns 1 on success, 0 on EOF/error.
int decode_next(Decoder* d) {
    while (true) {
        int ret = avcodec_receive_frame(d->codec, d->frame);
        if (ret == 0) return 1;
        if (ret == AVERROR_EOF) return 0;
        if (ret != AVERROR(EAGAIN)) return 0;
        if (d->draining) return 0;
        // Feed more packets.
        while (true) {
            ret = av_read_frame(d->fmt, d->pkt);
            if (ret < 0) {
                // Flush the decoder.
                avcodec_send_packet(d->codec, nullptr);
                d->draining = true;
                break;
            }
            if (d->pkt->stream_index == d->stream_index) {
                ret = avcodec_send_packet(d->codec, d->pkt);
                av_packet_unref(d->pkt);
                if (ret < 0 && ret != AVERROR(EAGAIN)) return 0;
                break;
            }
            av_packet_unref(d->pkt);
        }
    }
}

}  // namespace

extern "C" {

void* vd_open(const char* path) {
    auto* d = new (std::nothrow) Decoder();
    if (!d) return nullptr;
    if (avformat_open_input(&d->fmt, path, nullptr, nullptr) < 0 ||
        avformat_find_stream_info(d->fmt, nullptr) < 0) {
        delete d;
        return nullptr;
    }
    d->stream_index = av_find_best_stream(d->fmt, AVMEDIA_TYPE_VIDEO, -1, -1,
                                          nullptr, 0);
    if (d->stream_index < 0) {
        delete d;
        return nullptr;
    }
    AVStream* st = d->fmt->streams[d->stream_index];
    const AVCodec* dec = avcodec_find_decoder(st->codecpar->codec_id);
    if (!dec) {
        delete d;
        return nullptr;
    }
    d->codec = avcodec_alloc_context3(dec);
    if (!d->codec ||
        avcodec_parameters_to_context(d->codec, st->codecpar) < 0) {
        delete d;
        return nullptr;
    }
    // Auto frame/slice threading (what cv2's ffmpeg backend enables too).
    d->codec->thread_count = 0;
    d->codec->thread_type = FF_THREAD_FRAME | FF_THREAD_SLICE;
    if (avcodec_open2(d->codec, dec, nullptr) < 0) {
        delete d;
        return nullptr;
    }
    d->pkt = av_packet_alloc();
    d->frame = av_frame_alloc();
    if (!d->pkt || !d->frame) {  // OOM: fail vd_open, not decode_next
        delete d;
        return nullptr;
    }
    d->width = st->codecpar->width;
    d->height = st->codecpar->height;
    AVRational fr = st->avg_frame_rate.num ? st->avg_frame_rate
                                           : st->r_frame_rate;
    d->fps = fr.den ? av_q2d(fr) : 0.0;
    d->nb_frames = st->nb_frames;
    if (d->nb_frames <= 0 && d->fps > 0 && d->fmt->duration > 0) {
        d->nb_frames = static_cast<int64_t>(
            d->fmt->duration / static_cast<double>(AV_TIME_BASE) * d->fps +
            0.5);
    }
    return d;
}

int vd_info(void* h, int* width, int* height, double* fps,
            int64_t* nb_frames) {
    auto* d = static_cast<Decoder*>(h);
    if (!d) return 0;
    *width = d->width;
    *height = d->height;
    *fps = d->fps;
    *nb_frames = d->nb_frames;
    return 1;
}

// Convert the currently-held decoded frame to BGR24 into out_bgr and
// release it (shared by vd_read_frame and vd_read_stashed).
static int convert_held_frame(Decoder* d, uint8_t* out_bgr) {
    d->sws = sws_getCachedContext(
        d->sws, d->frame->width, d->frame->height,
        static_cast<AVPixelFormat>(d->frame->format), d->width, d->height,
        AV_PIX_FMT_BGR24, SWS_BILINEAR, nullptr, nullptr, nullptr);
    if (!d->sws) return 0;
    uint8_t* dst_data[4] = {out_bgr, nullptr, nullptr, nullptr};
    int dst_linesize[4] = {3 * d->width, 0, 0, 0};
    sws_scale(d->sws, d->frame->data, d->frame->linesize, 0,
              d->frame->height, dst_data, dst_linesize);
    av_frame_unref(d->frame);
    d->next_frame++;
    return 1;
}

// Decode the next frame into out_bgr ([height, width, 3] uint8, BGR24).
int vd_read_frame(void* h, uint8_t* out_bgr) {
    auto* d = static_cast<Decoder*>(h);
    if (!d) return 0;
    if (!decode_next(d)) return 0;
    return convert_held_frame(d, out_bgr);
}

// Seek so the next read returns frame `index`, starting the keyframe
// seek from `anchor`'s timestamp (anchor <= index; an earlier anchor
// gives the decoder more run-up when the pts->index mapping is uneven).
// Returns: 2 = positioned exactly, target frame stashed (use
// vd_read_stashed); 1 = positioned exactly, next decode is `index`;
// 3 = OVERSHOT (the first frame at/after the seek point maps past
// `index` — retry with an earlier anchor); 0 = hard failure.
int vd_seek_frame_from(void* h, int64_t index, int64_t anchor) {
    auto* d = static_cast<Decoder*>(h);
    if (!d || d->fps <= 0) return 0;
    AVStream* st = d->fmt->streams[d->stream_index];
    // Streams can start at a nonzero timestamp (MPEG-TS commonly ~1.4s):
    // both the anchor's target timestamp and the pts->frame-index mapping
    // must be relative to start_time, or every seek lands start_time*fps
    // frames early while REPORTING exact positioning (cv2's ffmpeg
    // backend applies the same correction).
    const int64_t st0 =
        (st->start_time == AV_NOPTS_VALUE) ? 0 : st->start_time;
    int64_t ts = st0 + av_rescale_q(
        static_cast<int64_t>(anchor / d->fps * AV_TIME_BASE),
        AVRational{1, AV_TIME_BASE}, st->time_base);
    if (av_seek_frame(d->fmt, d->stream_index, ts,
                      AVSEEK_FLAG_BACKWARD) < 0) {
        return 0;
    }
    avcodec_flush_buffers(d->codec);
    d->draining = false;
    // Decode forward until the frame whose timestamp maps to `index`.
    while (true) {
        if (!decode_next(d)) return 0;
        int64_t pts = d->frame->best_effort_timestamp;
        if (pts == AV_NOPTS_VALUE) {
            // No timestamp -> no way to know which frame this is.  A
            // guess could silently return the wrong frame (the one
            // unacceptable outcome); fail the seek loudly — callers
            // fall back to sequential decode, which needs no mapping.
            av_frame_unref(d->frame);
            return 0;
        }
        int64_t cur = static_cast<int64_t>(
            av_q2d(st->time_base) * (pts - st0) * d->fps + 0.5);
        if (cur == index) {
            // Stash: keep the decoded frame so the next read emits it
            // (see vd_read_stashed).
            d->next_frame = cur;
            return 2;
        }
        if (cur > index) {
            // Overshot: the mapping jumped past `index` (VFR/NTSC
            // rounding).  Silently returning the wrong frame is the one
            // unacceptable outcome — drop the held frame and tell the
            // caller to retry from an earlier anchor.
            av_frame_unref(d->frame);
            d->next_frame = cur + 1;
            return 3;
        }
        av_frame_unref(d->frame);
    }
}

// Back-compat entry (older callers): anchor == index.  Overshoot maps
// to HARD FAILURE, not the historical "positioned" code — a stale
// binding that can't handle 3 must get a loud error rather than
// silently read a later frame than it seeked to.
int vd_seek_frame(void* h, int64_t index) {
    int ret = vd_seek_frame_from(h, index, index);
    return ret == 3 ? 0 : ret;
}

// After vd_seek_frame returned 2, fetch the already-decoded target frame.
int vd_read_stashed(void* h, uint8_t* out_bgr) {
    auto* d = static_cast<Decoder*>(h);
    if (!d) return 0;
    return convert_held_frame(d, out_bgr);
}

// ---- planar-YUV420 output mode (half the bytes of BGR24) -------------
//
// The TPU pipeline's host->device transfer carries 3 B/px as BGR24; the
// codec's native 4:2:0 representation is 1.5 B/px.  These entry points
// scale the decoded frame to the TARGET size in YUV space (one sws pass,
// cheaper than BGR convert + separate resize) and hand back packed
// planar YUV420 (Y plane, then U, then V, chroma ceil(w/2) x ceil(h/2)).
// The YUV->BGR conversion then runs ON DEVICE (ops/yuv.py), emulating
// swscale's same-size converter exactly — vd_yuv420_to_bgr24 below is
// the oracle it is derived from and tested against.

static int convert_held_frame_yuv(Decoder* d, uint8_t* out_yuv, int out_w,
                                  int out_h) {
    d->sws = sws_getCachedContext(
        d->sws, d->frame->width, d->frame->height,
        static_cast<AVPixelFormat>(d->frame->format), out_w, out_h,
        AV_PIX_FMT_YUV420P, SWS_BILINEAR, nullptr, nullptr, nullptr);
    if (!d->sws) return 0;
    const int cw = (out_w + 1) / 2;
    const int ch = (out_h + 1) / 2;
    // swscale's SIMD paths write past unaligned row ends — scale into an
    // av_image_alloc'd (aligned, padded) buffer, then pack the tight
    // planes out (a ~tens-of-KB memcpy, negligible next to the scale).
    uint8_t* data[4];
    int linesize[4];
    if (av_image_alloc(data, linesize, out_w, out_h, AV_PIX_FMT_YUV420P,
                       64) < 0) {
        return 0;
    }
    sws_scale(d->sws, d->frame->data, d->frame->linesize, 0,
              d->frame->height, data, linesize);
    uint8_t* dst = out_yuv;
    for (int r = 0; r < out_h; r++, dst += out_w)
        std::memcpy(dst, data[0] + r * linesize[0], out_w);
    for (int p = 1; p <= 2; p++)
        for (int r = 0; r < ch; r++, dst += cw)
            std::memcpy(dst, data[p] + r * linesize[p], cw);
    av_freep(&data[0]);
    av_frame_unref(d->frame);
    d->next_frame++;
    return 1;
}

// Decode the next frame scaled to (out_w, out_h) planar YUV420 into
// out_yuv (size out_w*out_h + 2*ceil(out_w/2)*ceil(out_h/2) bytes).
int vd_read_frame_yuv(void* h, uint8_t* out_yuv, int out_w, int out_h) {
    auto* d = static_cast<Decoder*>(h);
    if (!d) return 0;
    if (!decode_next(d)) return 0;
    return convert_held_frame_yuv(d, out_yuv, out_w, out_h);
}

// After vd_seek_frame returned 2, fetch the stashed frame in YUV mode.
int vd_read_stashed_yuv(void* h, uint8_t* out_yuv, int out_w, int out_h) {
    auto* d = static_cast<Decoder*>(h);
    if (!d) return 0;
    return convert_held_frame_yuv(d, out_yuv, out_w, out_h);
}

// Same-size planar yuv420p -> BGR24 through swscale itself: the oracle
// for the on-device conversion (ops/yuv.py derives its integer tables
// from this function and tests pin exact equality).  Standalone context
// per call (probe/test path, not the decode hot loop).
int vd_yuv420_to_bgr24(const uint8_t* y, const uint8_t* u, const uint8_t* v,
                       int w, int h, uint8_t* out_bgr) {
    SwsContext* sws = sws_getContext(w, h, AV_PIX_FMT_YUV420P, w, h,
                                     AV_PIX_FMT_BGR24, SWS_BILINEAR,
                                     nullptr, nullptr, nullptr);
    if (!sws) return 0;
    const int cw = (w + 1) / 2;
    const int ch = (h + 1) / 2;
    // Copy through aligned, padded buffers on BOTH sides: swscale's SIMD
    // reads/writes past unaligned row ends (observed heap corruption on
    // tiny probe widths).
    uint8_t* src[4];
    int src_ls[4];
    uint8_t* dst[4];
    int dst_ls[4];
    if (av_image_alloc(src, src_ls, w, h, AV_PIX_FMT_YUV420P, 64) < 0) {
        sws_freeContext(sws);
        return 0;
    }
    if (av_image_alloc(dst, dst_ls, w, h, AV_PIX_FMT_BGR24, 64) < 0) {
        av_freep(&src[0]);
        sws_freeContext(sws);
        return 0;
    }
    for (int r = 0; r < h; r++)
        std::memcpy(src[0] + r * src_ls[0], y + r * w, w);
    for (int r = 0; r < ch; r++) {
        std::memcpy(src[1] + r * src_ls[1], u + r * cw, cw);
        std::memcpy(src[2] + r * src_ls[2], v + r * cw, cw);
    }
    sws_scale(sws, src, src_ls, 0, h, dst, dst_ls);
    for (int r = 0; r < h; r++)
        std::memcpy(out_bgr + r * 3 * w, dst[0] + r * dst_ls[0], 3 * w);
    av_freep(&src[0]);
    av_freep(&dst[0]);
    sws_freeContext(sws);
    return 1;
}

void vd_close(void* h) {
    delete static_cast<Decoder*>(h);
}

}  // extern "C"
