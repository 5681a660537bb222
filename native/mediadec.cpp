// Native compressed-audio decode (mp3 / m4a / ogg / flac ...) for dataset
// preparation and librosa.load parity.
//
// The reference decodes via librosa.load -> audioread, which walks the
// system's codec backends (ffmpeg / mad / gstreamer) — reference:
// audiodiffusion/mel.py:100 and the .mp3/.wav/.m4a dataset walk at
// scripts/audio_to_images.py:30. This module is the same architecture done
// natively: demux + decode + mono-downmix + resample through the system
// libavformat/libavcodec/libswresample, compiled as its own shared library
// so environments without the codec stack degrade gracefully (the Python
// loader falls back and warns; see ops/audio_io.py).
//
// Output contract matches librosa.load(sr=target_sr, mono=True): float32
// mono in [-1, 1] at target_sr.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
}

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

void set_err(char* errbuf, int cap, const char* fmt, int averr = 0) {
    if (!errbuf || cap <= 0) return;
    if (averr != 0) {
        char avmsg[128] = {0};
        av_strerror(averr, avmsg, sizeof(avmsg));
        snprintf(errbuf, cap, "%s: %s", fmt, avmsg);
    } else {
        snprintf(errbuf, cap, "%s", fmt);
    }
}

struct DecodeState {
    AVFormatContext* fmt = nullptr;
    AVCodecContext* dec = nullptr;
    SwrContext* swr = nullptr;
    AVPacket* pkt = nullptr;
    AVFrame* frame = nullptr;

    ~DecodeState() {
        if (swr) swr_free(&swr);
        if (dec) avcodec_free_context(&dec);
        if (fmt) avformat_close_input(&fmt);
        if (pkt) av_packet_free(&pkt);
        if (frame) av_frame_free(&frame);
    }
};

// Convert one decoded frame (or flush when frame == nullptr) through swr into
// the output vector. Returns libav error code or 0.
int drain_swr(DecodeState& s, const AVFrame* frame, int target_sr, std::vector<float>& out) {
    const uint8_t** in_data = frame ? const_cast<const uint8_t**>(frame->extended_data) : nullptr;
    int in_samples = frame ? frame->nb_samples : 0;
    int max_out = swr_get_out_samples(s.swr, in_samples);
    if (max_out <= 0) max_out = in_samples > 0 ? in_samples * 4 + 256 : 4096;
    size_t old = out.size();
    out.resize(old + (size_t)max_out);
    uint8_t* out_plane = reinterpret_cast<uint8_t*>(out.data() + old);
    int got = swr_convert(s.swr, &out_plane, max_out, in_data, in_samples);
    if (got < 0) {
        out.resize(old);
        return got;
    }
    out.resize(old + (size_t)got);
    return 0;
}

}  // namespace

extern "C" int adt_decode_media(const char* path, int target_sr, float** out_data,
                                int64_t* out_len, char* errbuf, int errbuf_cap) {
    *out_data = nullptr;
    *out_len = 0;
    DecodeState s;

    int err = avformat_open_input(&s.fmt, path, nullptr, nullptr);
    if (err < 0) {
        set_err(errbuf, errbuf_cap, "avformat_open_input failed", err);
        return 1;
    }
    err = avformat_find_stream_info(s.fmt, nullptr);
    if (err < 0) {
        set_err(errbuf, errbuf_cap, "avformat_find_stream_info failed", err);
        return 1;
    }
    const AVCodec* codec = nullptr;
    int stream_idx = av_find_best_stream(s.fmt, AVMEDIA_TYPE_AUDIO, -1, -1, &codec, 0);
    if (stream_idx < 0 || !codec) {
        set_err(errbuf, errbuf_cap, "no decodable audio stream", stream_idx);
        return 1;
    }
    AVStream* stream = s.fmt->streams[stream_idx];

    s.dec = avcodec_alloc_context3(codec);
    if (!s.dec || avcodec_parameters_to_context(s.dec, stream->codecpar) < 0) {
        set_err(errbuf, errbuf_cap, "decoder context setup failed");
        return 1;
    }
    err = avcodec_open2(s.dec, codec, nullptr);
    if (err < 0) {
        set_err(errbuf, errbuf_cap, "avcodec_open2 failed", err);
        return 1;
    }
    if (s.dec->sample_rate <= 0) {
        set_err(errbuf, errbuf_cap, "decoder reported no sample rate");
        return 1;
    }

    AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
    AVChannelLayout in_layout;
    if (s.dec->ch_layout.nb_channels > 0) {
        av_channel_layout_copy(&in_layout, &s.dec->ch_layout);
    } else {
        av_channel_layout_default(&in_layout, 1);
    }
    err = swr_alloc_set_opts2(&s.swr, &mono, AV_SAMPLE_FMT_FLT, target_sr, &in_layout,
                              s.dec->sample_fmt, s.dec->sample_rate, 0, nullptr);
    av_channel_layout_uninit(&in_layout);
    if (err < 0 || !s.swr || (err = swr_init(s.swr)) < 0) {
        set_err(errbuf, errbuf_cap, "resampler setup failed", err);
        return 1;
    }

    s.pkt = av_packet_alloc();
    s.frame = av_frame_alloc();
    std::vector<float> out;
    out.reserve(1 << 20);

    bool eof = false;
    while (!eof) {
        err = av_read_frame(s.fmt, s.pkt);
        if (err == AVERROR_EOF) {
            eof = true;
        } else if (err < 0) {
            set_err(errbuf, errbuf_cap, "av_read_frame failed", err);
            return 1;
        }
        if (!eof && s.pkt->stream_index != stream_idx) {
            av_packet_unref(s.pkt);
            continue;
        }
        err = avcodec_send_packet(s.dec, eof ? nullptr : s.pkt);
        if (!eof) av_packet_unref(s.pkt);
        if (err < 0 && err != AVERROR(EAGAIN) && err != AVERROR_EOF) {
            // Corrupt packets happen in the wild (and in truncated files);
            // skip them like audioread does rather than failing the file.
            continue;
        }
        while (true) {
            err = avcodec_receive_frame(s.dec, s.frame);
            if (err == AVERROR(EAGAIN) || err == AVERROR_EOF) break;
            if (err < 0) {
                set_err(errbuf, errbuf_cap, "avcodec_receive_frame failed", err);
                return 1;
            }
            err = drain_swr(s, s.frame, target_sr, out);
            av_frame_unref(s.frame);
            if (err < 0) {
                set_err(errbuf, errbuf_cap, "swr_convert failed", err);
                return 1;
            }
        }
    }
    // Flush the resampler's tail.
    err = drain_swr(s, nullptr, target_sr, out);
    if (err < 0) {
        set_err(errbuf, errbuf_cap, "swr flush failed", err);
        return 1;
    }

    if (out.empty()) {
        set_err(errbuf, errbuf_cap, "decoded zero samples");
        return 1;
    }
    float* buf = static_cast<float*>(malloc(out.size() * sizeof(float)));
    if (!buf) {
        set_err(errbuf, errbuf_cap, "out of memory");
        return 1;
    }
    memcpy(buf, out.data(), out.size() * sizeof(float));
    *out_data = buf;
    *out_len = static_cast<int64_t>(out.size());
    return 0;
}

extern "C" void adt_media_free(float* p) { free(p); }

// ---------------------------------------------------------------------------
// Encode mono float PCM to a compressed file (container from the extension,
// codec by name: "aac" for .m4a, "libmp3lame" for .mp3). Primary use is
// generating test fixtures and roundtrip gates for the decoder — the
// reference has no encode path (it only reads datasets), so this is a
// test/tooling surface, not a pipeline feature.
extern "C" int adt_encode_media(const char* path, const float* pcm, int64_t n_samples,
                                int sample_rate, const char* codec_name,
                                char* errbuf, int errbuf_cap) {
    AVFormatContext* fmt = nullptr;
    int err = avformat_alloc_output_context2(&fmt, nullptr, nullptr, path);
    if (err < 0 || !fmt) {
        set_err(errbuf, errbuf_cap, "cannot allocate output context", err);
        return 1;
    }
    const AVCodec* codec = avcodec_find_encoder_by_name(codec_name);
    if (!codec) {
        set_err(errbuf, errbuf_cap, "encoder not available");
        avformat_free_context(fmt);
        return 1;
    }
    AVCodecContext* enc = avcodec_alloc_context3(codec);
    AVStream* stream = avformat_new_stream(fmt, nullptr);
    AVPacket* pkt = av_packet_alloc();
    AVFrame* frame = av_frame_alloc();
    auto cleanup = [&]() {
        if (enc) avcodec_free_context(&enc);
        if (pkt) av_packet_free(&pkt);
        if (frame) av_frame_free(&frame);
        if (fmt) {
            if (fmt->pb) avio_closep(&fmt->pb);
            avformat_free_context(fmt);
        }
    };
    if (!enc || !stream || !pkt || !frame) {
        set_err(errbuf, errbuf_cap, "allocation failed");
        cleanup();
        return 1;
    }
    enc->sample_rate = sample_rate;
    av_channel_layout_default(&enc->ch_layout, 1);
    // Negotiate the sample format: planar float where supported (aac,
    // libmp3lame), otherwise the codec's first offering (flac: s16/s32).
    enc->sample_fmt = AV_SAMPLE_FMT_FLTP;
    if (codec->sample_fmts) {
        bool has_fltp = false;
        for (const enum AVSampleFormat* f = codec->sample_fmts; *f != AV_SAMPLE_FMT_NONE; ++f)
            if (*f == AV_SAMPLE_FMT_FLTP) has_fltp = true;
        if (!has_fltp) enc->sample_fmt = codec->sample_fmts[0];
    }
    enc->bit_rate = 128000;
    enc->time_base = {1, sample_rate};
    if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
        enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    if ((err = avcodec_open2(enc, codec, nullptr)) < 0 ||
        (err = avcodec_parameters_from_context(stream->codecpar, enc)) < 0) {
        set_err(errbuf, errbuf_cap, "encoder open failed", err);
        cleanup();
        return 1;
    }
    stream->time_base = enc->time_base;
    if ((err = avio_open(&fmt->pb, path, AVIO_FLAG_WRITE)) < 0 ||
        (err = avformat_write_header(fmt, nullptr)) < 0) {
        set_err(errbuf, errbuf_cap, "cannot write header", err);
        cleanup();
        return 1;
    }

    auto write_packets = [&](AVFrame* f) -> int {
        int e = avcodec_send_frame(enc, f);
        if (e < 0 && e != AVERROR_EOF) return e;
        while (true) {
            e = avcodec_receive_packet(enc, pkt);
            if (e == AVERROR(EAGAIN) || e == AVERROR_EOF) return 0;
            if (e < 0) return e;
            av_packet_rescale_ts(pkt, enc->time_base, stream->time_base);
            pkt->stream_index = stream->index;
            e = av_interleaved_write_frame(fmt, pkt);
            if (e < 0) return e;
        }
    };

    const int frame_size = enc->frame_size > 0 ? enc->frame_size : 1024;
    int64_t pos = 0, pts = 0;
    while (pos < n_samples) {
        frame->nb_samples = static_cast<int>(std::min<int64_t>(frame_size, n_samples - pos));
        frame->format = enc->sample_fmt;
        av_channel_layout_default(&frame->ch_layout, 1);
        frame->sample_rate = sample_rate;
        if ((err = av_frame_get_buffer(frame, 0)) < 0) {
            set_err(errbuf, errbuf_cap, "frame buffer alloc failed", err);
            cleanup();
            return 1;
        }
        switch (enc->sample_fmt) {
            case AV_SAMPLE_FMT_FLTP:
            case AV_SAMPLE_FMT_FLT:  // mono: planar == interleaved
                memcpy(frame->data[0], pcm + pos, frame->nb_samples * sizeof(float));
                break;
            case AV_SAMPLE_FMT_S16P:
            case AV_SAMPLE_FMT_S16: {
                int16_t* d = reinterpret_cast<int16_t*>(frame->data[0]);
                for (int i = 0; i < frame->nb_samples; ++i) {
                    float v = pcm[pos + i] * 32767.0f;
                    d[i] = static_cast<int16_t>(std::max(-32768.0f, std::min(32767.0f, v)));
                }
                break;
            }
            case AV_SAMPLE_FMT_S32P:
            case AV_SAMPLE_FMT_S32: {
                int32_t* d = reinterpret_cast<int32_t*>(frame->data[0]);
                for (int i = 0; i < frame->nb_samples; ++i) {
                    double v = static_cast<double>(pcm[pos + i]) * 2147483647.0;
                    d[i] = static_cast<int32_t>(std::max(-2147483648.0, std::min(2147483647.0, v)));
                }
                break;
            }
            default:
                set_err(errbuf, errbuf_cap, "unsupported negotiated sample format");
                cleanup();
                return 1;
        }
        frame->pts = pts;
        pts += frame->nb_samples;
        pos += frame->nb_samples;
        if ((err = write_packets(frame)) < 0) {
            set_err(errbuf, errbuf_cap, "encode failed", err);
            cleanup();
            return 1;
        }
        av_frame_unref(frame);
    }
    if ((err = write_packets(nullptr)) < 0 || (err = av_write_trailer(fmt)) < 0) {
        set_err(errbuf, errbuf_cap, "finalize failed", err);
        cleanup();
        return 1;
    }
    cleanup();
    return 0;
}
