// audio_codec — native IO layer for audio_algebra_tpu.
//
// The reference delegated decode to torchaudio's C++ backends (ffmpeg/
// libsndfile, reference datasets.py:17 via aeiou.load_audio). This image
// ships neither, but libmpg123.so.0 is present; this library binds it at
// runtime (dlopen — no dev headers in the image) and exposes a minimal C ABI
// consumed from Python over ctypes (audio_algebra_tpu/utils/audio_io.py):
//
//   int64 aa_decode_mp3(path, float** out, int* channels, int* rate)
//       -> frames (interleaved float32 in [-1,1]), caller frees via aa_free
//   int64 aa_read_wav(path, float** out, int* channels, int* rate)
//       -> native WAV reader (PCM 8/16/24/32 + float32), same contract
//   void  aa_free(float*)
//
// Build: make -C native   (g++ -O2 -shared -fPIC -ldl)
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cstdint>
#include <dlfcn.h>
#include <vector>

// ---------------------------------------------------------------- mpg123 ---
// Minimal subset of the stable mpg123 C ABI.
typedef void mpg123_handle;
struct Mpg123 {
    int   (*init)(void);
    mpg123_handle* (*make)(const char*, int*);
    int   (*open)(mpg123_handle*, const char*);
    int   (*getformat)(mpg123_handle*, long*, int*, int*);
    int   (*format_none)(mpg123_handle*);
    int   (*format)(mpg123_handle*, long, int, int);
    int   (*read)(mpg123_handle*, unsigned char*, size_t, size_t*);
    int   (*close)(mpg123_handle*);
    void  (*del)(mpg123_handle*);
    void* lib = nullptr;
    bool  ok = false;
};

static Mpg123 mpg_load() {
    Mpg123 m;
    m.lib = dlopen("libmpg123.so.0", RTLD_NOW | RTLD_GLOBAL);
    if (!m.lib) { m.ok = false; return m; }
    m.init        = (int(*)(void))dlsym(m.lib, "mpg123_init");
    m.make        = (mpg123_handle*(*)(const char*, int*))dlsym(m.lib, "mpg123_new");
    m.open        = (int(*)(mpg123_handle*, const char*))dlsym(m.lib, "mpg123_open");
    m.getformat   = (int(*)(mpg123_handle*, long*, int*, int*))dlsym(m.lib, "mpg123_getformat");
    m.format_none = (int(*)(mpg123_handle*))dlsym(m.lib, "mpg123_format_none");
    m.format      = (int(*)(mpg123_handle*, long, int, int))dlsym(m.lib, "mpg123_format");
    m.read        = (int(*)(mpg123_handle*, unsigned char*, size_t, size_t*))dlsym(m.lib, "mpg123_read");
    m.close       = (int(*)(mpg123_handle*))dlsym(m.lib, "mpg123_close");
    m.del         = (void(*)(mpg123_handle*))dlsym(m.lib, "mpg123_delete");
    m.ok = m.init && m.make && m.open && m.getformat && m.read && m.close && m.del;
    if (m.ok && m.init() != 0) m.ok = false;
    return m;
}

static Mpg123& mpg() {
    // C++11 magic static: thread-safe one-time init. The previous
    // `if (m.lib) return m;` lazy guard raced when aa_decode_batch's
    // thread pool hit the first mp3s concurrently (half-initialised
    // function pointers / m.ok false negatives).
    static Mpg123 m = mpg_load();
    return m;
}

static const int AA_MPG123_OK = 0;
static const int AA_MPG123_DONE = -12;
static const int AA_ENC_SIGNED_16 = 0xD0;   // MPG123_ENC_SIGNED_16

static long long aa_decode_mp3_impl(const char* path, float** out,
                                    int* channels, int* rate) {
    Mpg123& m = mpg();
    if (!m.ok) return -1;            // library unavailable
    int err = 0;
    mpg123_handle* h = m.make(nullptr, &err);
    if (!h) return -2;
    struct Guard {                   // close+delete even if a vector throws
        Mpg123& m; mpg123_handle* h; bool opened = false;
        ~Guard() { if (opened) m.close(h); m.del(h); }
    } guard{m, h};
    if (m.open(h, path) != AA_MPG123_OK) return -3;
    guard.opened = true;
    long r = 0; int ch = 0, enc = 0;
    if (m.getformat(h, &r, &ch, &enc) != AA_MPG123_OK || ch <= 0 || r <= 0) {
        return -4;
    }
    // force s16 output at the native rate/channels so the read loop is fixed-format
    if (m.format_none && m.format) {
        m.format_none(h);
        m.format(h, r, ch, AA_ENC_SIGNED_16);
    }
    std::vector<int16_t> pcm;
    pcm.reserve(1 << 20);
    std::vector<unsigned char> buf(1 << 16);
    while (true) {
        size_t done = 0;
        int rc = m.read(h, buf.data(), buf.size(), &done);
        if (done > 0) {
            const int16_t* s = reinterpret_cast<const int16_t*>(buf.data());
            pcm.insert(pcm.end(), s, s + done / 2);
        }
        if (rc == AA_MPG123_DONE) break;
        if (rc != AA_MPG123_OK && done == 0) break;
    }
    if (pcm.empty()) return -5;
    long long frames = (long long)(pcm.size() / ch);
    float* data = (float*)malloc(sizeof(float) * pcm.size());
    if (!data) return -6;
    for (size_t i = 0; i < pcm.size(); ++i) data[i] = pcm[i] / 32768.0f;
    *out = data; *channels = ch; *rate = (int)r;
    return frames;
}

extern "C" long long aa_decode_mp3(const char* path, float** out,
                                   int* channels, int* rate) {
    *out = nullptr; *channels = 0; *rate = 0;
    try {
        return aa_decode_mp3_impl(path, out, channels, rate);
    } catch (...) {
        *out = nullptr;
        return -7;
    }
}

// ------------------------------------------------------------------- WAV ---
static uint32_t rd_u32(const unsigned char* p) {
    return p[0] | (p[1] << 8) | (p[2] << 16) | ((uint32_t)p[3] << 24);
}
static uint16_t rd_u16(const unsigned char* p) { return p[0] | (p[1] << 8); }

static long long aa_read_wav_impl(const char* path, float** out,
                                  int* channels, int* rate) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    struct Closer { FILE* f; ~Closer() { fclose(f); } } closer{f};
    // file size bounds every chunk-size field: a corrupt 32-bit size
    // (~0xFFFFFFFF) must fail cleanly, not attempt a 4 GB resize
    fseek(f, 0, SEEK_END);
    long fsize = ftell(f);
    fseek(f, 0, SEEK_SET);
    unsigned char hdr[12];
    if (fread(hdr, 1, 12, f) != 12 || memcmp(hdr, "RIFF", 4) || memcmp(hdr + 8, "WAVE", 4)) {
        return -2;
    }
    uint16_t fmt = 0, ch = 0, bits = 0;
    uint32_t sr = 0;
    std::vector<unsigned char> data;
    unsigned char chdr[8];
    while (fread(chdr, 1, 8, f) == 8) {
        uint32_t size = rd_u32(chdr + 4);
        if ((long)size > fsize) return -3;            // corrupt size field
        if (!memcmp(chdr, "fmt ", 4)) {
            if (size < 16) return -3;                 // malformed fmt chunk
            std::vector<unsigned char> p(size);
            if (fread(p.data(), 1, size, f) != size) return -3;
            fmt = rd_u16(&p[0]); ch = rd_u16(&p[2]); sr = rd_u32(&p[4]);
            bits = rd_u16(&p[14]);
            // WAVE_FORMAT_EXTENSIBLE: subformat tag lives at offset 24;
            // only read it when the chunk actually extends that far
            if (fmt == 0xFFFE && size >= 26) fmt = rd_u16(&p[24]);
            fseek(f, size & 1, SEEK_CUR);             // RIFF pad byte
        } else if (!memcmp(chdr, "data", 4)) {
            data.resize(size);
            if (fread(data.data(), 1, size, f) != size) return -3;
            fseek(f, size & 1, SEEK_CUR);             // RIFF pad byte
        } else {
            fseek(f, size + (size & 1), SEEK_CUR);
        }
    }
    if (!ch || data.empty()) return -4;
    size_t n = 0;
    float* dst = nullptr;
    if (fmt == 3 && bits == 32) {
        n = data.size() / 4;
        dst = (float*)malloc(sizeof(float) * n);
        memcpy(dst, data.data(), n * 4);  // n*4, not data.size(): a truncated
                                          // data chunk must not overflow dst
    } else if (fmt == 1 && bits == 16) {
        n = data.size() / 2;
        dst = (float*)malloc(sizeof(float) * n);
        const int16_t* s = reinterpret_cast<const int16_t*>(data.data());
        for (size_t i = 0; i < n; ++i) dst[i] = s[i] / 32768.0f;
    } else if (fmt == 1 && bits == 24) {
        n = data.size() / 3;
        dst = (float*)malloc(sizeof(float) * n);
        for (size_t i = 0; i < n; ++i) {
            int32_t v = data[3*i] | (data[3*i+1] << 8) | (data[3*i+2] << 16);
            if (v & 0x800000) v -= 0x1000000;
            dst[i] = v / 8388608.0f;
        }
    } else if (fmt == 1 && bits == 32) {
        n = data.size() / 4;
        dst = (float*)malloc(sizeof(float) * n);
        const int32_t* s = reinterpret_cast<const int32_t*>(data.data());
        for (size_t i = 0; i < n; ++i) dst[i] = s[i] / 2147483648.0f;
    } else if (fmt == 1 && bits == 8) {
        n = data.size();
        dst = (float*)malloc(sizeof(float) * n);
        for (size_t i = 0; i < n; ++i) dst[i] = (data[i] - 128) / 128.0f;
    } else {
        return -5;
    }
    *out = dst; *channels = ch; *rate = (int)sr;
    return (long long)(n / ch);
}

extern "C" long long aa_read_wav(const char* path, float** out,
                                 int* channels, int* rate) {
    *out = nullptr; *channels = 0; *rate = 0;
    // exceptions (bad_alloc from a hostile chunk size under memory
    // pressure) must not cross the extern "C"/ctypes boundary or escape a
    // decode_batch worker thread (std::terminate would kill the process)
    try {
        return aa_read_wav_impl(path, out, channels, rate);
    } catch (...) {
        *out = nullptr;
        return -7;
    }
}

extern "C" void aa_free(float* p) { free(p); }

// ---------------------------------------------------------- batch decode ---
// Multithreaded batch decode: the native data-loader primitive. The
// reference fed training from torch DataLoader worker *processes*; here a
// single ctypes call decodes a whole batch on a C++ thread pool (the GIL
// is released for the entire batch, not per file). Dispatch is by file
// magic: RIFF -> WAV, fLaC -> native FLAC (flac_decoder.cpp), OggS ->
// vorbisfile (vorbis_codec.cpp), else mpg123.
#include <thread>
#include <atomic>

extern "C" long long aa_read_flac(const char*, float**, int*, int*);
extern "C" long long aa_decode_ogg(const char*, float**, int*, int*);

static long long decode_any(const char* path, float** out, int* ch, int* rate) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    unsigned char magic[4] = {0};
    size_t got = fread(magic, 1, 4, f);
    fclose(f);
    if (got == 4 && !memcmp(magic, "RIFF", 4))
        return aa_read_wav(path, out, ch, rate);
    if (got == 4 && !memcmp(magic, "fLaC", 4))
        return aa_read_flac(path, out, ch, rate);
    if (got == 4 && !memcmp(magic, "OggS", 4))
        return aa_decode_ogg(path, out, ch, rate);
    return aa_decode_mp3(path, out, ch, rate);
}

extern "C" long long aa_decode_any(const char* path, float** out,
                                   int* ch, int* rate) {
    return decode_any(path, out, ch, rate);
}

extern "C" int aa_decode_batch(const char** paths, int n, int n_threads,
                               float** outs, long long* frames,
                               int* channels, int* rates) {
    // outs/frames/channels/rates: caller-allocated arrays of length n.
    // Per-file failures leave outs[i]=nullptr, frames[i]=error code.
    if (n <= 0) return 0;
    if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
    if (n_threads > n) n_threads = n;
    std::atomic<int> next(0), ok(0);
    auto worker = [&]() {
        while (true) {
            int i = next.fetch_add(1);
            if (i >= n) return;
            outs[i] = nullptr;
            frames[i] = decode_any(paths[i], &outs[i], &channels[i], &rates[i]);
            if (frames[i] > 0) ok.fetch_add(1);
        }
    };
    std::vector<std::thread> pool;
    for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
    for (auto& t : pool) t.join();
    return ok.load();
}
