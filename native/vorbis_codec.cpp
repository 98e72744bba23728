// vorbis_codec — OGG/Vorbis decode + encode over the system libraries.
//
// The reference reads arbitrary formats through torchaudio's ffmpeg/
// libsndfile backends (reference datasets.py:25 via aeiou.load_audio). This
// image has no dev headers, but ships libvorbisfile.so.3 / libvorbis.so.0 /
// libvorbisenc.so.2 / libogg.so.0 — bound here at runtime via dlopen, the
// same pattern as the mpg123 binding in audio_codec.cpp.
//
// C ABI (contract of aa_read_wav):
//   int64 aa_decode_ogg(path, float** out, int* channels, int* rate)
//   int   aa_encode_ogg(path, const float* interleaved, int64 frames,
//                       int channels, int rate, float quality[-0.1..1])
//
// Only the handful of libogg/libvorbis structs we must field-access are
// declared (their layouts are 20-years-stable public ABI); every opaque
// state struct (OggVorbis_File, vorbis_dsp_state, vorbis_block,
// ogg_stream_state) is an oversized zeroed allocation that only the
// libraries themselves touch.
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cstdint>
#include <dlfcn.h>
#include <vector>

namespace {

// ---- minimal public-ABI struct declarations ----
struct vorbis_info {
    int version;
    int channels;
    long rate;
    long bitrate_upper, bitrate_nominal, bitrate_lower, bitrate_window;
    void* codec_setup;
};
struct ogg_packet {
    unsigned char* packet;
    long bytes;
    long b_o_s, e_o_s;
    int64_t granulepos;
    int64_t packetno;
};
struct ogg_page {
    unsigned char* header;
    long header_len;
    unsigned char* body;
    long body_len;
};
struct vorbis_comment {
    char** user_comments;
    int* comment_lengths;
    int comments;
    char* vendor;
};

// generously-sized opaque state (real sizes: OggVorbis_File ~944,
// vorbis_dsp_state ~160, vorbis_block ~192, ogg_stream_state ~408)
constexpr size_t kOpaque = 8192;

struct VorbisLibs {
    // vorbisfile (decode)
    int (*ov_fopen)(const char*, void*);
    vorbis_info* (*ov_info)(void*, int);
    long (*ov_read_float)(void*, float***, int, int*);
    int (*ov_clear)(void*);
    // vorbis + vorbisenc (encode)
    void (*vorbis_info_init)(vorbis_info*);
    void (*vorbis_info_clear)(vorbis_info*);
    int (*vorbis_encode_init_vbr)(vorbis_info*, long, long, float);
    void (*vorbis_comment_init)(vorbis_comment*);
    void (*vorbis_comment_clear)(vorbis_comment*);
    int (*vorbis_analysis_init)(void*, vorbis_info*);
    int (*vorbis_block_init)(void*, void*);
    int (*vorbis_analysis_headerout)(void*, vorbis_comment*, ogg_packet*,
                                     ogg_packet*, ogg_packet*);
    float** (*vorbis_analysis_buffer)(void*, int);
    int (*vorbis_analysis_wrote)(void*, int);
    int (*vorbis_analysis_blockout)(void*, void*);
    int (*vorbis_analysis)(void*, ogg_packet*);
    int (*vorbis_bitrate_addblock)(void*);
    int (*vorbis_bitrate_flushpacket)(void*, ogg_packet*);
    int (*vorbis_block_clear)(void*);
    void (*vorbis_dsp_clear)(void*);
    // ogg (encode-side packetisation)
    int (*ogg_stream_init)(void*, int);
    int (*ogg_stream_packetin)(void*, ogg_packet*);
    int (*ogg_stream_flush)(void*, ogg_page*);
    int (*ogg_stream_pageout)(void*, ogg_page*);
    int (*ogg_stream_clear)(void*);
    bool decode_ok = false, encode_ok = false;
};

VorbisLibs libs_load() {
    VorbisLibs L{};    // value-init: all function pointers null
    // RTLD_GLOBAL so libvorbisfile/libvorbisenc resolve their libvorbis /
    // libogg dependencies through the already-loaded sonames
    void* ogg = dlopen("libogg.so.0", RTLD_NOW | RTLD_GLOBAL);
    void* vor = dlopen("libvorbis.so.0", RTLD_NOW | RTLD_GLOBAL);
    void* vf = dlopen("libvorbisfile.so.3", RTLD_NOW | RTLD_GLOBAL);
    void* ve = dlopen("libvorbisenc.so.2", RTLD_NOW | RTLD_GLOBAL);
    if (vf) {
        L.ov_fopen = (int(*)(const char*, void*))dlsym(vf, "ov_fopen");
        L.ov_info = (vorbis_info*(*)(void*, int))dlsym(vf, "ov_info");
        L.ov_read_float =
            (long(*)(void*, float***, int, int*))dlsym(vf, "ov_read_float");
        L.ov_clear = (int(*)(void*))dlsym(vf, "ov_clear");
        L.decode_ok = L.ov_fopen && L.ov_info && L.ov_read_float && L.ov_clear;
    }
    if (vor && ve && ogg) {
        L.vorbis_info_init = (void(*)(vorbis_info*))dlsym(vor, "vorbis_info_init");
        L.vorbis_info_clear = (void(*)(vorbis_info*))dlsym(vor, "vorbis_info_clear");
        L.vorbis_encode_init_vbr =
            (int(*)(vorbis_info*, long, long, float))dlsym(ve, "vorbis_encode_init_vbr");
        L.vorbis_comment_init = (void(*)(vorbis_comment*))dlsym(vor, "vorbis_comment_init");
        L.vorbis_comment_clear = (void(*)(vorbis_comment*))dlsym(vor, "vorbis_comment_clear");
        L.vorbis_analysis_init = (int(*)(void*, vorbis_info*))dlsym(vor, "vorbis_analysis_init");
        L.vorbis_block_init = (int(*)(void*, void*))dlsym(vor, "vorbis_block_init");
        L.vorbis_analysis_headerout =
            (int(*)(void*, vorbis_comment*, ogg_packet*, ogg_packet*, ogg_packet*))
                dlsym(vor, "vorbis_analysis_headerout");
        L.vorbis_analysis_buffer = (float**(*)(void*, int))dlsym(vor, "vorbis_analysis_buffer");
        L.vorbis_analysis_wrote = (int(*)(void*, int))dlsym(vor, "vorbis_analysis_wrote");
        L.vorbis_analysis_blockout = (int(*)(void*, void*))dlsym(vor, "vorbis_analysis_blockout");
        L.vorbis_analysis = (int(*)(void*, ogg_packet*))dlsym(vor, "vorbis_analysis");
        L.vorbis_bitrate_addblock = (int(*)(void*))dlsym(vor, "vorbis_bitrate_addblock");
        L.vorbis_bitrate_flushpacket =
            (int(*)(void*, ogg_packet*))dlsym(vor, "vorbis_bitrate_flushpacket");
        L.vorbis_block_clear = (int(*)(void*))dlsym(vor, "vorbis_block_clear");
        L.vorbis_dsp_clear = (void(*)(void*))dlsym(vor, "vorbis_dsp_clear");
        L.ogg_stream_init = (int(*)(void*, int))dlsym(ogg, "ogg_stream_init");
        L.ogg_stream_packetin = (int(*)(void*, ogg_packet*))dlsym(ogg, "ogg_stream_packetin");
        L.ogg_stream_flush = (int(*)(void*, ogg_page*))dlsym(ogg, "ogg_stream_flush");
        L.ogg_stream_pageout = (int(*)(void*, ogg_page*))dlsym(ogg, "ogg_stream_pageout");
        L.ogg_stream_clear = (int(*)(void*))dlsym(ogg, "ogg_stream_clear");
        L.encode_ok = L.vorbis_info_init && L.vorbis_encode_init_vbr &&
                      L.vorbis_analysis_init && L.vorbis_analysis_headerout &&
                      L.vorbis_analysis_buffer && L.vorbis_analysis_blockout &&
                      L.vorbis_bitrate_flushpacket && L.ogg_stream_init &&
                      L.ogg_stream_packetin && L.ogg_stream_flush &&
                      L.ogg_stream_pageout;
    }
    return L;
}

VorbisLibs& libs() {
    static VorbisLibs L = libs_load();   // thread-safe one-time init
    return L;
}

long long decode_ogg_impl(const char* path, float** out,
                          int* channels, int* rate) {
    VorbisLibs& L = libs();
    if (!L.decode_ok) return -1;
    std::vector<uint8_t> vfbuf(kOpaque, 0);
    if (L.ov_fopen(path, vfbuf.data()) != 0) return -3;
    struct Guard {
        VorbisLibs& L; void* vf;
        ~Guard() { L.ov_clear(vf); }
    } guard{L, vfbuf.data()};
    vorbis_info* vi = L.ov_info(vfbuf.data(), -1);
    if (!vi || vi->channels <= 0 || vi->rate <= 0) return -4;
    int ch = vi->channels;
    std::vector<float> pcm;
    pcm.reserve(1 << 20);
    int bitstream = 0;
    while (true) {
        float** chans = nullptr;
        long n = L.ov_read_float(vfbuf.data(), &chans, 4096, &bitstream);
        if (n == 0) break;                       // EOF
        if (n < 0) continue;                     // hole in stream: skip
        size_t base = pcm.size();
        pcm.resize(base + (size_t)n * ch);
        for (long i = 0; i < n; ++i)
            for (int c = 0; c < ch; ++c)
                pcm[base + (size_t)i * ch + c] = chans[c][i];
    }
    if (pcm.empty()) return -5;
    float* data = (float*)malloc(sizeof(float) * pcm.size());
    if (!data) return -6;
    memcpy(data, pcm.data(), sizeof(float) * pcm.size());
    *out = data; *channels = ch; *rate = (int)vi->rate;
    return (long long)(pcm.size() / (size_t)ch);
}

int encode_ogg_impl(const char* path, const float* interleaved,
                    long long frames, int channels, int rate, float quality) {
    VorbisLibs& L = libs();
    if (!L.encode_ok) return -1;
    if (channels <= 0 || rate <= 0 || frames <= 0) return -2;

    vorbis_info vi;
    L.vorbis_info_init(&vi);
    if (L.vorbis_encode_init_vbr(&vi, channels, rate, quality) != 0) {
        L.vorbis_info_clear(&vi);
        return -3;
    }
    vorbis_comment vc;
    L.vorbis_comment_init(&vc);
    std::vector<uint8_t> vd(kOpaque, 0), vb(kOpaque, 0), os(kOpaque, 0);
    L.vorbis_analysis_init(vd.data(), &vi);
    L.vorbis_block_init(vd.data(), vb.data());
    L.ogg_stream_init(os.data(), 0x41414131);    // fixed serial: deterministic

    FILE* f = fopen(path, "wb");
    int rc = 0;
    if (!f) rc = -4;

    auto write_page = [&](ogg_page& og) {
        if (f) {
            fwrite(og.header, 1, (size_t)og.header_len, f);
            fwrite(og.body, 1, (size_t)og.body_len, f);
        }
    };

    if (rc == 0) {
        ogg_packet h, hc, hcode;
        L.vorbis_analysis_headerout(vd.data(), &vc, &h, &hc, &hcode);
        L.ogg_stream_packetin(os.data(), &h);
        L.ogg_stream_packetin(os.data(), &hc);
        L.ogg_stream_packetin(os.data(), &hcode);
        ogg_page og;
        while (L.ogg_stream_flush(os.data(), &og) != 0) write_page(og);

        const long long kChunk = 4096;
        long long done = 0;
        bool eos_sent = false;
        while (rc == 0 && (!eos_sent)) {
            long long n = frames - done;
            if (n > kChunk) n = kChunk;
            if (n > 0) {
                float** buf = L.vorbis_analysis_buffer(vd.data(), (int)n);
                for (long long i = 0; i < n; ++i)
                    for (int c = 0; c < channels; ++c)
                        buf[c][i] = interleaved[(done + i) * channels + c];
                L.vorbis_analysis_wrote(vd.data(), (int)n);
                done += n;
            } else {
                L.vorbis_analysis_wrote(vd.data(), 0);   // signal EOS
                eos_sent = true;
            }
            while (L.vorbis_analysis_blockout(vd.data(), vb.data()) == 1) {
                L.vorbis_analysis(vb.data(), nullptr);
                L.vorbis_bitrate_addblock(vb.data());
                ogg_packet op;
                while (L.vorbis_bitrate_flushpacket(vd.data(), &op) != 0) {
                    L.ogg_stream_packetin(os.data(), &op);
                    while (L.ogg_stream_pageout(os.data(), &og) != 0)
                        write_page(og);
                }
            }
        }
        while (L.ogg_stream_flush(os.data(), &og) != 0) write_page(og);
    }

    if (f) fclose(f);
    L.ogg_stream_clear(os.data());
    if (L.vorbis_block_clear) L.vorbis_block_clear(vb.data());
    if (L.vorbis_dsp_clear) L.vorbis_dsp_clear(vd.data());
    if (L.vorbis_comment_clear) L.vorbis_comment_clear(&vc);
    L.vorbis_info_clear(&vi);
    return rc;
}

}  // namespace

extern "C" long long aa_decode_ogg(const char* path, float** out,
                                   int* channels, int* rate) {
    *out = nullptr; *channels = 0; *rate = 0;
    try {
        return decode_ogg_impl(path, out, channels, rate);
    } catch (...) {
        *out = nullptr;
        return -7;
    }
}

extern "C" int aa_encode_ogg(const char* path, const float* interleaved,
                             long long frames, int channels, int rate,
                             float quality) {
    try {
        return encode_ogg_impl(path, interleaved, frames, channels, rate,
                               quality);
    } catch (...) {
        return -7;
    }
}
