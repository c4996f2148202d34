// wahost: native host-side audio runtime for webaudio_tpu.
//
// The TPU-native equivalent of the reference's host-side Rust crates that
// do real work outside the DSP graph: symphonia's WAV decode path
// (reference: src/decoding.rs), hound's WAV encode
// (media_recorder/mod.rs:40-48), the AudioBuffer linear resampler
// (buffer.rs:311-363), and dasp's sample conversion (render/thread.rs:12).
// Compiled to a shared library, bound via ctypes (webaudio_tpu/native);
// the pure-numpy implementations remain as fallback and as the format
// reference.
//
// Build: g++ -O3 -march=native -shared -fPIC wahost.cpp -o libwahost.so

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <cmath>

extern "C" {

// ---------------------------------------------------------------------------
// WAV (RIFF) decoding: PCM u8/i16/i24/i32 and float32/64.
// Two-phase: probe the header, then decode into caller-allocated planar f32.
// ---------------------------------------------------------------------------

struct WavInfo {
    uint32_t channels;
    uint32_t frames;
    double sample_rate;
    uint16_t format;      // 1 = int PCM, 3 = IEEE float
    uint16_t bits;
    uint64_t data_offset; // payload position in the byte stream
};

static int wav_parse(const uint8_t* data, uint64_t len, WavInfo* info) {
    if (len < 12 || memcmp(data, "RIFF", 4) != 0 || memcmp(data + 8, "WAVE", 4) != 0)
        return -1;
    uint64_t pos = 12;
    bool have_fmt = false, have_data = false;
    uint16_t block_align = 0;
    while (pos + 8 <= len) {
        const uint8_t* cid = data + pos;
        uint32_t size;
        memcpy(&size, data + pos + 4, 4);
        uint64_t body = pos + 8;
        if (body + size > len) size = (uint32_t)(len - body);
        if (memcmp(cid, "fmt ", 4) == 0 && size >= 16) {
            uint16_t fmt_tag, channels, ba, bits;
            uint32_t rate;
            memcpy(&fmt_tag, data + body, 2);
            memcpy(&channels, data + body + 2, 2);
            memcpy(&rate, data + body + 4, 4);
            memcpy(&ba, data + body + 12, 2);
            memcpy(&bits, data + body + 14, 2);
            if (fmt_tag == 0xFFFE && size >= 40)  // WAVE_FORMAT_EXTENSIBLE
                memcpy(&fmt_tag, data + body + 24, 2);
            info->format = fmt_tag;
            info->channels = channels;
            info->sample_rate = (double)rate;
            info->bits = bits;
            block_align = ba;
            have_fmt = true;
        } else if (memcmp(cid, "data", 4) == 0) {
            info->data_offset = body;
            info->frames = block_align ? size / block_align : 0;
            have_data = true;
            if (have_fmt && block_align)
                info->frames = size / block_align;
        }
        pos = body + size + (size & 1);
    }
    if (!have_fmt || !have_data || info->channels == 0) return -2;
    if (block_align == 0) return -3;
    // recompute frames with final block_align (data may precede fmt)
    return 0;
}

int wah_wav_probe(const uint8_t* data, uint64_t len, uint32_t* channels,
                  uint32_t* frames, double* sample_rate) {
    WavInfo info{};
    int rc = wav_parse(data, len, &info);
    if (rc != 0) return rc;
    *channels = info.channels;
    *frames = info.frames;
    *sample_rate = info.sample_rate;
    return 0;
}

// out: planar (channels, frames) f32
int wah_wav_decode(const uint8_t* data, uint64_t len, float* out) {
    WavInfo info{};
    int rc = wav_parse(data, len, &info);
    if (rc != 0) return rc;
    const uint8_t* p = data + info.data_offset;
    const uint32_t C = info.channels;
    const uint64_t N = info.frames;

    if (info.format == 1 && info.bits == 16) {
        for (uint64_t i = 0; i < N; ++i)
            for (uint32_t c = 0; c < C; ++c) {
                int16_t v;
                memcpy(&v, p + (i * C + c) * 2, 2);
                out[c * N + i] = (float)v / 32768.0f;
            }
    } else if (info.format == 3 && info.bits == 32) {
        for (uint64_t i = 0; i < N; ++i)
            for (uint32_t c = 0; c < C; ++c)
                memcpy(&out[c * N + i], p + (i * C + c) * 4, 4);
    } else if (info.format == 1 && info.bits == 24) {
        for (uint64_t i = 0; i < N; ++i)
            for (uint32_t c = 0; c < C; ++c) {
                const uint8_t* s = p + (i * C + c) * 3;
                int32_t v = (int32_t)s[0] | ((int32_t)s[1] << 8) | ((int32_t)s[2] << 16);
                if (v >= (1 << 23)) v -= (1 << 24);
                out[c * N + i] = (float)v / 8388608.0f;
            }
    } else if (info.format == 1 && info.bits == 32) {
        for (uint64_t i = 0; i < N; ++i)
            for (uint32_t c = 0; c < C; ++c) {
                int32_t v;
                memcpy(&v, p + (i * C + c) * 4, 4);
                out[c * N + i] = (float)((double)v / 2147483648.0);
            }
    } else if (info.format == 1 && info.bits == 8) {
        for (uint64_t i = 0; i < N; ++i)
            for (uint32_t c = 0; c < C; ++c)
                out[c * N + i] = ((float)p[i * C + c] - 128.0f) / 128.0f;
    } else if (info.format == 3 && info.bits == 64) {
        for (uint64_t i = 0; i < N; ++i)
            for (uint32_t c = 0; c < C; ++c) {
                double v;
                memcpy(&v, p + (i * C + c) * 8, 8);
                out[c * N + i] = (float)v;
            }
    } else {
        return -4;
    }
    return 0;
}

// ---------------------------------------------------------------------------
// Linear-interpolation resampling, planar (reference: buffer.rs:311-363)
// ---------------------------------------------------------------------------

void wah_resample_linear(const float* in, uint32_t channels,
                         uint64_t in_frames, float* out,
                         uint64_t out_frames, double ratio /* out/in rate */) {
    for (uint32_t c = 0; c < channels; ++c) {
        const float* src = in + c * in_frames;
        float* dst = out + c * out_frames;
        for (uint64_t i = 0; i < out_frames; ++i) {
            double pos = (double)i / ratio;
            uint64_t k = (uint64_t)pos;
            if (k >= in_frames - 1) {
                dst[i] = src[in_frames - 1];
                continue;
            }
            float frac = (float)(pos - (double)k);
            dst[i] = src[k] * (1.0f - frac) + src[k + 1] * frac;
        }
    }
}

// ---------------------------------------------------------------------------
// Sample conversion + interleaving (reference: render/thread.rs:12,513-520)
// ---------------------------------------------------------------------------

void wah_interleave_f32_to_i16(const float* planar, uint32_t channels,
                               uint64_t frames, int16_t* interleaved) {
    for (uint64_t i = 0; i < frames; ++i)
        for (uint32_t c = 0; c < channels; ++c) {
            float v = planar[c * frames + i];
            if (v > 1.0f) v = 1.0f;
            if (v < -1.0f) v = -1.0f;
            interleaved[i * channels + c] = (int16_t)lrintf(v * 32767.0f);
        }
}

void wah_interleave_f32(const float* planar, uint32_t channels,
                        uint64_t frames, float* interleaved) {
    for (uint64_t i = 0; i < frames; ++i)
        for (uint32_t c = 0; c < channels; ++c)
            interleaved[i * channels + c] = planar[c * frames + i];
}

void wah_deinterleave_f32(const float* interleaved, uint32_t channels,
                          uint64_t frames, float* planar) {
    for (uint64_t i = 0; i < frames; ++i)
        for (uint32_t c = 0; c < channels; ++c)
            planar[c * frames + i] = interleaved[i * channels + c];
}

}  // extern "C"
