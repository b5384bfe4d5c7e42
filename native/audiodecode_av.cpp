// First-party audio decode shim over the system FFmpeg libraries
// (libavformat/libavcodec/libswresample), replacing the reference's
// torchcodec dependency (reference data/load_audio.py:36-37: decode
// mp3/ogg/opus/... -> mono PCM at the model rate).
//
// Built as its own shared object (libosudreamer_av.so) so the core
// libosudreamer.so stays free of external link dependencies; the python
// side (osu_dreamer_tpu/native/__init__.py) loads it opportunistically and
// audio/decode.py falls back to the ffmpeg-binary pipe or pure-python WAV
// paths when it is absent.
//
// Also exposes a small ENCODER helper used only by tests to synthesize
// compressed fixtures offline (FLAC is lossless -> exact round-trip
// checks; the native aac/vorbis/opus decoders cover the HF corpus's
// formats).

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/channel_layout.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
}

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct DecodeCtx {
    AVFormatContext* fmt = nullptr;
    AVCodecContext* dec = nullptr;
    SwrContext* swr = nullptr;
    AVPacket* pkt = nullptr;
    AVFrame* frame = nullptr;

    ~DecodeCtx() {
        if (frame) av_frame_free(&frame);
        if (pkt) av_packet_free(&pkt);
        if (swr) swr_free(&swr);
        if (dec) avcodec_free_context(&dec);
        if (fmt) avformat_close_input(&fmt);
    }
};

int convert_frame(SwrContext* swr, const AVFrame* frame, int target_sr,
                  std::vector<float>& out) {
    // worst-case output sample count for this input burst
    const int64_t in_count = frame ? frame->nb_samples : 0;
    const int64_t cap =
        swr_get_out_samples(swr, static_cast<int>(in_count));
    if (cap <= 0 && frame) return 0;
    std::vector<float> buf(static_cast<size_t>(cap > 0 ? cap : 4096));
    uint8_t* planes[1] = {reinterpret_cast<uint8_t*>(buf.data())};
    const uint8_t** in_data =
        frame ? const_cast<const uint8_t**>(frame->extended_data) : nullptr;
    const int got = swr_convert(swr, planes, static_cast<int>(buf.size()),
                                in_data, static_cast<int>(in_count));
    if (got < 0) return got;
    out.insert(out.end(), buf.begin(), buf.begin() + got);
    return 0;
}

}  // namespace

extern "C" {

// Decode any libav-supported audio file to mono float32 at target_sr.
// Returns the number of samples (>= 0) with *out_ptr set to a malloc'd
// buffer the caller frees via odn_av_free, or a negative error code.
int64_t odn_av_decode(const char* path, int32_t target_sr, float** out_ptr) {
    av_log_set_level(AV_LOG_ERROR);
    DecodeCtx c;

    if (avformat_open_input(&c.fmt, path, nullptr, nullptr) < 0) return -1;
    if (avformat_find_stream_info(c.fmt, nullptr) < 0) return -2;

    const AVCodec* codec = nullptr;
    const int stream_idx =
        av_find_best_stream(c.fmt, AVMEDIA_TYPE_AUDIO, -1, -1, &codec, 0);
    if (stream_idx < 0 || !codec) return -3;
    AVStream* stream = c.fmt->streams[stream_idx];

    c.dec = avcodec_alloc_context3(codec);
    if (!c.dec) return -4;
    if (avcodec_parameters_to_context(c.dec, stream->codecpar) < 0) return -5;
    if (avcodec_open2(c.dec, codec, nullptr) < 0) return -6;
    if (c.dec->ch_layout.nb_channels <= 0)
        av_channel_layout_default(&c.dec->ch_layout, 1);

    AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
    if (swr_alloc_set_opts2(&c.swr, &mono, AV_SAMPLE_FMT_FLT, target_sr,
                            &c.dec->ch_layout, c.dec->sample_fmt,
                            c.dec->sample_rate, 0, nullptr) < 0)
        return -7;
    if (swr_init(c.swr) < 0) return -8;

    c.pkt = av_packet_alloc();
    c.frame = av_frame_alloc();
    if (!c.pkt || !c.frame) return -9;

    std::vector<float> out;
    while (av_read_frame(c.fmt, c.pkt) >= 0) {
        if (c.pkt->stream_index == stream_idx) {
            if (avcodec_send_packet(c.dec, c.pkt) == 0) {
                while (avcodec_receive_frame(c.dec, c.frame) == 0) {
                    if (convert_frame(c.swr, c.frame, target_sr, out) < 0)
                        return -10;
                }
            }
        }
        av_packet_unref(c.pkt);
    }
    // flush decoder, then the resampler's tail
    avcodec_send_packet(c.dec, nullptr);
    while (avcodec_receive_frame(c.dec, c.frame) == 0) {
        if (convert_frame(c.swr, c.frame, target_sr, out) < 0) return -10;
    }
    if (convert_frame(c.swr, nullptr, target_sr, out) < 0) return -10;

    float* buf = static_cast<float*>(malloc(out.size() * sizeof(float)));
    if (!buf && !out.empty()) return -11;
    std::memcpy(buf, out.data(), out.size() * sizeof(float));
    *out_ptr = buf;
    return static_cast<int64_t>(out.size());
}

void odn_av_free(float* p) { free(p); }

// Read container metadata tags (title/artist — ID3, Vorbis comments, MP4
// atoms, ... whatever the demuxer exposes) into caller buffers. Returns 0
// on success; empty strings for absent tags.
int32_t odn_av_tags(const char* path, char* title, char* artist, int32_t cap) {
    av_log_set_level(AV_LOG_ERROR);
    AVFormatContext* fmt = nullptr;
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
    title[0] = artist[0] = '\0';
    auto grab = [&](const char* key, char* dst) {
        const AVDictionaryEntry* e = av_dict_get(fmt->metadata, key, nullptr, 0);
        if (!e && fmt->nb_streams > 0)
            e = av_dict_get(fmt->streams[0]->metadata, key, nullptr, 0);
        if (e && e->value) {
            std::strncpy(dst, e->value, cap - 1);
            dst[cap - 1] = '\0';
        }
    };
    grab("title", title);
    grab("artist", artist);
    avformat_close_input(&fmt);
    return 0;
}

// TEST-ONLY helper: encode a mono float32 wave into `path` with the named
// codec (e.g. "flac", "aac", "libvorbis"/"vorbis"); container inferred from
// the path suffix. Returns 0 on success.
int32_t odn_av_encode(const char* path, const char* codec_name,
                      const float* wave, int64_t n, int32_t sr,
                      const char* title, const char* artist) {
    av_log_set_level(AV_LOG_ERROR);
    AVFormatContext* fmt = nullptr;
    if (avformat_alloc_output_context2(&fmt, nullptr, nullptr, path) < 0 || !fmt)
        return -1;

    const AVCodec* codec = avcodec_find_encoder_by_name(codec_name);
    if (!codec) { avformat_free_context(fmt); return -2; }

    AVStream* stream = avformat_new_stream(fmt, nullptr);
    AVCodecContext* enc = avcodec_alloc_context3(codec);
    if (!stream || !enc) { avformat_free_context(fmt); return -3; }

    enc->sample_rate = sr;
    av_channel_layout_default(&enc->ch_layout, 1);
    enc->sample_fmt = codec->sample_fmts ? codec->sample_fmts[0] : AV_SAMPLE_FMT_FLTP;
    enc->time_base = AVRational{1, sr};
    enc->strict_std_compliance = FF_COMPLIANCE_EXPERIMENTAL;
    if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
        enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    if (avcodec_open2(enc, codec, nullptr) < 0) {
        avcodec_free_context(&enc); avformat_free_context(fmt); return -4;
    }
    avcodec_parameters_from_context(stream->codecpar, enc);
    stream->time_base = enc->time_base;

    SwrContext* swr = nullptr;
    AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
    if (swr_alloc_set_opts2(&swr, &enc->ch_layout, enc->sample_fmt, sr, &mono,
                            AV_SAMPLE_FMT_FLT, sr, 0, nullptr) < 0 ||
        swr_init(swr) < 0) {
        avcodec_free_context(&enc); avformat_free_context(fmt); return -5;
    }

    if (title && title[0]) av_dict_set(&fmt->metadata, "title", title, 0);
    if (artist && artist[0]) av_dict_set(&fmt->metadata, "artist", artist, 0);

    int rc = 0;
    if (!(fmt->oformat->flags & AVFMT_NOFILE))
        if (avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0) rc = -6;
    if (rc == 0 && avformat_write_header(fmt, nullptr) < 0) rc = -7;

    AVPacket* pkt = av_packet_alloc();
    AVFrame* frame = av_frame_alloc();
    const int frame_len = enc->frame_size > 0 ? enc->frame_size : 1024;
    int64_t pos = 0, pts = 0;

    auto drain = [&](bool flush) {
        if (avcodec_send_frame(enc, flush ? nullptr : frame) < 0 && !flush)
            return -8;
        while (avcodec_receive_packet(enc, pkt) == 0) {
            av_packet_rescale_ts(pkt, enc->time_base, stream->time_base);
            pkt->stream_index = stream->index;
            if (av_interleaved_write_frame(fmt, pkt) < 0) return -9;
        }
        return 0;
    };

    while (rc == 0 && pos < n) {
        const int this_len = static_cast<int>(n - pos < frame_len ? n - pos : frame_len);
        frame->nb_samples = this_len;
        frame->format = enc->sample_fmt;
        av_channel_layout_copy(&frame->ch_layout, &enc->ch_layout);
        frame->sample_rate = sr;
        if (av_frame_get_buffer(frame, 0) < 0) { rc = -10; break; }
        const uint8_t* in[1] = {reinterpret_cast<const uint8_t*>(wave + pos)};
        if (swr_convert(swr, frame->extended_data, this_len, in, this_len) < 0) {
            rc = -11; break;
        }
        frame->pts = pts;
        pts += this_len;
        rc = drain(false);
        av_frame_unref(frame);
        pos += this_len;
    }
    if (rc == 0) rc = drain(true);
    if (rc == 0 && av_write_trailer(fmt) < 0) rc = -12;

    av_frame_free(&frame);
    av_packet_free(&pkt);
    swr_free(&swr);
    avcodec_free_context(&enc);
    if (!(fmt->oformat->flags & AVFMT_NOFILE) && fmt->pb) avio_closep(&fmt->pb);
    avformat_free_context(fmt);
    return rc;
}

}  // extern "C"
