// wacodec.cpp — compressed-audio decode host for webaudio_tpu.
//
// The reference implementation delegates compressed codecs (mp3, ogg/vorbis,
// aac/m4a, alac, webm/opus, ...) to the symphonia crate
// (/root/reference/src/decoding.rs:15-54).  This is the native C++
// equivalent: a thin decode host over the system FFmpeg libraries
// (libavformat demux + libavcodec decode + libswresample to f32), exposing
// one C ABI entry point consumed via ctypes from media/decoding.py.
//
// Everything runs from an in-memory buffer (custom AVIO) — no filesystem
// dependency — and the output is planar f32 at the stream's native rate;
// sample-rate conversion to the context rate stays in the engine (the same
// split the reference makes: symphonia decodes, the engine resamples).
//
// Build: g++ -O2 -shared -fPIC wacodec.cpp -o libwacodec.so \
//            -lavformat -lavcodec -lavutil -lswresample

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
}

namespace {

struct MemReader {
    const uint8_t* data;
    int64_t size;
    int64_t pos;
};

int mem_read(void* opaque, uint8_t* buf, int buf_size) {
    MemReader* r = static_cast<MemReader*>(opaque);
    int64_t remaining = r->size - r->pos;
    if (remaining <= 0) return AVERROR_EOF;
    int n = static_cast<int>(remaining < buf_size ? remaining : buf_size);
    memcpy(buf, r->data + r->pos, n);
    r->pos += n;
    return n;
}

int64_t mem_seek(void* opaque, int64_t offset, int whence) {
    MemReader* r = static_cast<MemReader*>(opaque);
    if (whence == AVSEEK_SIZE) return r->size;
    whence &= ~AVSEEK_FORCE;
    int64_t target;
    switch (whence) {
        case SEEK_SET: target = offset; break;
        case SEEK_CUR: target = r->pos + offset; break;
        case SEEK_END: target = r->size + offset; break;
        default: return -1;
    }
    if (target < 0 || target > r->size) return -1;
    r->pos = target;
    return target;
}

void set_err(char* errbuf, int errlen, const char* msg, int averr = 0) {
    if (!errbuf || errlen <= 0) return;
    if (averr != 0) {
        char avmsg[128];
        av_strerror(averr, avmsg, sizeof(avmsg));
        snprintf(errbuf, errlen, "%s: %s", msg, avmsg);
    } else {
        snprintf(errbuf, errlen, "%s", msg);
    }
}

struct DecodeCtx {
    AVIOContext* avio = nullptr;
    AVFormatContext* fmt = nullptr;
    AVCodecContext* codec = nullptr;
    SwrContext* swr = nullptr;
    AVFrame* frame = nullptr;
    AVPacket* pkt = nullptr;
    uint8_t** sw_data = nullptr;   // av_samples_alloc'd planar f32 planes
    int sw_capacity = 0;

    ~DecodeCtx() {
        if (sw_data) {
            av_freep(&sw_data[0]);
            av_freep(&sw_data);
        }
        if (pkt) av_packet_free(&pkt);
        if (frame) av_frame_free(&frame);
        if (swr) swr_free(&swr);
        if (codec) avcodec_free_context(&codec);
        if (fmt) avformat_close_input(&fmt);
        if (avio) {
            av_freep(&avio->buffer);
            avio_context_free(&avio);
        }
    }
};

}  // namespace

extern "C" {

// Decode a whole compressed stream from memory.
//   out      <- malloc'd planar f32 block, channels*frames floats
//               (channel-major, contiguous); caller frees with wac_free
//   channels <- stream channel count (clamped to 32)
//   rate     <- stream sample rate
//   frames   <- decoded frame count
// Returns 0 on success, nonzero on failure (message in errbuf).
int wac_decode(const uint8_t* data, uint64_t size, float** out,
               uint32_t* channels, uint32_t* rate, uint64_t* frames,
               char* errbuf, int errlen) {
    *out = nullptr;
    *channels = 0;
    *rate = 0;
    *frames = 0;
    av_log_set_level(AV_LOG_FATAL);  // errors surface via errbuf instead

    DecodeCtx c;
    MemReader reader{data, static_cast<int64_t>(size), 0};

    constexpr int kIoBuf = 1 << 16;
    uint8_t* iobuf = static_cast<uint8_t*>(av_malloc(kIoBuf));
    if (!iobuf) { set_err(errbuf, errlen, "oom"); return 1; }
    c.avio = avio_alloc_context(iobuf, kIoBuf, 0, &reader, mem_read,
                                nullptr, mem_seek);
    if (!c.avio) { av_free(iobuf); set_err(errbuf, errlen, "oom"); return 1; }

    c.fmt = avformat_alloc_context();
    if (!c.fmt) { set_err(errbuf, errlen, "oom"); return 1; }
    c.fmt->pb = c.avio;
    c.fmt->flags |= AVFMT_FLAG_CUSTOM_IO;

    int ret = avformat_open_input(&c.fmt, nullptr, nullptr, nullptr);
    if (ret < 0) { set_err(errbuf, errlen, "open_input", ret); return 2; }
    ret = avformat_find_stream_info(c.fmt, nullptr);
    if (ret < 0) { set_err(errbuf, errlen, "stream_info", ret); return 2; }

    const AVCodec* dec = nullptr;
    int stream_idx =
        av_find_best_stream(c.fmt, AVMEDIA_TYPE_AUDIO, -1, -1, &dec, 0);
    if (stream_idx < 0 || !dec) {
        set_err(errbuf, errlen, "no audio stream", stream_idx);
        return 3;
    }
    AVStream* stream = c.fmt->streams[stream_idx];

    c.codec = avcodec_alloc_context3(dec);
    if (!c.codec) { set_err(errbuf, errlen, "oom"); return 1; }
    ret = avcodec_parameters_to_context(c.codec, stream->codecpar);
    if (ret < 0) { set_err(errbuf, errlen, "codec params", ret); return 3; }
    ret = avcodec_open2(c.codec, dec, nullptr);
    if (ret < 0) { set_err(errbuf, errlen, "codec open", ret); return 3; }

    int nch = c.codec->ch_layout.nb_channels;
    int sr = c.codec->sample_rate;
    if (nch <= 0 || nch > 32 || sr <= 0) {
        set_err(errbuf, errlen, "bad channel count / sample rate");
        return 3;
    }

    // resampler: any input layout/format -> planar f32, same rate
    AVChannelLayout out_layout;
    av_channel_layout_copy(&out_layout, &c.codec->ch_layout);
    ret = swr_alloc_set_opts2(&c.swr, &out_layout, AV_SAMPLE_FMT_FLTP, sr,
                              &c.codec->ch_layout, c.codec->sample_fmt, sr,
                              0, nullptr);
    av_channel_layout_uninit(&out_layout);
    if (ret < 0 || !c.swr || swr_init(c.swr) < 0) {
        set_err(errbuf, errlen, "swr init", ret);
        return 4;
    }

    c.frame = av_frame_alloc();
    c.pkt = av_packet_alloc();
    if (!c.frame || !c.pkt) { set_err(errbuf, errlen, "oom"); return 1; }

    std::vector<std::vector<float>> pcm(nch);
    int64_t est = stream->duration > 0
        ? av_rescale_q(stream->duration, stream->time_base, {1, sr})
        : 0;
    if (est > 0 && est < (int64_t{1} << 32)) {
        for (auto& v : pcm) v.reserve(static_cast<size_t>(est));
    }

    auto drain_frame = [&](AVFrame* f) -> int {
        int max_out = swr_get_out_samples(c.swr, f ? f->nb_samples : 0);
        if (max_out <= 0) return 0;
        // output planes must be av_samples_alloc'd: swresample writes in
        // SIMD-sized blocks and assumes ffmpeg's buffer padding/alignment
        if (max_out > c.sw_capacity) {
            if (c.sw_data) {
                av_freep(&c.sw_data[0]);
                av_freep(&c.sw_data);
            }
            int linesize = 0;
            int cap = max_out * 2 + 1024;
            if (av_samples_alloc_array_and_samples(
                    &c.sw_data, &linesize, nch, cap,
                    AV_SAMPLE_FMT_FLTP, 0) < 0) {
                c.sw_data = nullptr;
                c.sw_capacity = 0;
                return AVERROR(ENOMEM);
            }
            c.sw_capacity = cap;
        }
        int got = swr_convert(
            c.swr, c.sw_data, c.sw_capacity,
            f ? const_cast<const uint8_t**>(
                    reinterpret_cast<uint8_t**>(f->extended_data))
              : nullptr,
            f ? f->nb_samples : 0);
        if (got < 0) return got;
        for (int ch = 0; ch < nch; ++ch) {
            const float* p = reinterpret_cast<const float*>(c.sw_data[ch]);
            pcm[ch].insert(pcm[ch].end(), p, p + got);
        }
        return got;
    };

    bool eof = false;
    while (!eof) {
        ret = av_read_frame(c.fmt, c.pkt);
        if (ret == AVERROR_EOF) {
            eof = true;
        } else if (ret < 0) {
            set_err(errbuf, errlen, "read_frame", ret);
            return 5;
        } else if (c.pkt->stream_index != stream_idx) {
            av_packet_unref(c.pkt);
            continue;
        }
        ret = avcodec_send_packet(c.codec, eof ? nullptr : c.pkt);
        if (!eof) av_packet_unref(c.pkt);
        if (ret < 0 && ret != AVERROR(EAGAIN) && ret != AVERROR_EOF) {
            set_err(errbuf, errlen, "send_packet", ret);
            return 5;
        }
        while (true) {
            ret = avcodec_receive_frame(c.codec, c.frame);
            if (ret == AVERROR(EAGAIN) || ret == AVERROR_EOF) break;
            if (ret < 0) { set_err(errbuf, errlen, "decode", ret); return 5; }
            if (drain_frame(c.frame) < 0) {
                set_err(errbuf, errlen, "resample");
                return 5;
            }
            av_frame_unref(c.frame);
        }
    }
    // flush the resampler's internal delay
    if (drain_frame(nullptr) < 0) { set_err(errbuf, errlen, "flush"); return 5; }

    uint64_t n = pcm[0].size();
    if (n == 0) { set_err(errbuf, errlen, "no audio frames decoded"); return 6; }

    float* block = static_cast<float*>(
        malloc(sizeof(float) * n * static_cast<uint64_t>(nch)));
    if (!block) { set_err(errbuf, errlen, "oom"); return 1; }
    for (int ch = 0; ch < nch; ++ch)
        memcpy(block + static_cast<uint64_t>(ch) * n, pcm[ch].data(),
               sizeof(float) * n);

    *out = block;
    *channels = static_cast<uint32_t>(nch);
    *rate = static_cast<uint32_t>(sr);
    *frames = n;
    return 0;
}

void wac_free(float* p) { free(p); }

// Library smoke probe: returns the linked libavformat major version.
int wac_version(void) { return LIBAVFORMAT_VERSION_MAJOR; }

}  // extern "C"
