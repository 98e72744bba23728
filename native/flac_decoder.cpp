// flac_decoder — from-scratch native FLAC decoder.
//
// The reference reads FLAC corpora through torchaudio/libsndfile (reference
// datasets.py:25 via aeiou.load_audio); this image ships no libFLAC or
// libsndfile, so the format is implemented directly from the FLAC bitstream
// spec (frames of CONSTANT / VERBATIM / FIXED / LPC subframes with
// Rice-coded residuals, stereo decorrelation, wasted bits).
//
// Exposed C ABI (same contract as aa_read_wav in audio_codec.cpp):
//   int64 aa_read_flac(path, float** out, int* channels, int* rate)
//       -> frames (interleaved float32 in [-1,1]), caller frees via aa_free
//
// Scope: the full decode path for streams libFLAC emits (bps 8/12/16/20/24/32,
// 1-8 channels, all four subframe types, RICE and RICE2 residuals, escape
// partitions, all stereo decorrelation modes, fixed + variable blocksize).
// Frame CRC-8/CRC-16 and the STREAMINFO MD5 are parsed but NOT verified —
// corrupt-stream detection is out of scope for a trusted local corpus.
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cstdint>
#include <vector>

namespace {

struct BitReader {
    const uint8_t* data;
    size_t size;
    size_t byte = 0;
    int bit = 0;          // 0..7, MSB-first within the byte
    bool fail = false;

    BitReader(const uint8_t* d, size_t n) : data(d), size(n) {}

    bool eof() const { return byte >= size; }

    uint32_t read_bit() {
        if (byte >= size) { fail = true; return 0; }
        uint32_t v = (data[byte] >> (7 - bit)) & 1u;
        if (++bit == 8) { bit = 0; ++byte; }
        return v;
    }

    uint64_t read_bits64(int n) {
        uint64_t v = 0;
        while (n > 0 && !fail) {
            if (byte >= size) { fail = true; break; }
            int avail = 8 - bit;
            int take = n < avail ? n : avail;
            uint32_t chunk = (data[byte] >> (avail - take)) & ((1u << take) - 1u);
            v = (v << take) | chunk;
            bit += take;
            if (bit == 8) { bit = 0; ++byte; }
            n -= take;
        }
        return v;
    }

    uint32_t read_bits(int n) { return (uint32_t)read_bits64(n); }

    int64_t read_signed(int n) {
        if (n == 0) return 0;
        uint64_t v = read_bits64(n);
        if (v & (1ull << (n - 1))) v -= (1ull << n);
        return (int64_t)v;
    }

    // count 0 bits up to the terminating 1 bit
    uint32_t read_unary() {
        uint32_t q = 0;
        while (!fail) {
            if (read_bit()) return q;
            ++q;
            if (q > (1u << 24)) { fail = true; break; }  // corrupt stream guard
        }
        return 0;
    }

    void align() { if (bit) { bit = 0; ++byte; } }
};

// FLAC's UTF-8-style coded number (frame/sample index; up to 36 bits)
uint64_t read_utf8_coded(BitReader& br) {
    uint32_t b0 = br.read_bits(8);
    if (b0 < 0x80) return b0;
    int n = 0;
    for (uint32_t m = 0x80; b0 & m; m >>= 1) ++n;   // count leading 1s
    if (n < 2 || n > 7) { br.fail = true; return 0; }
    uint64_t v = b0 & (0x7Fu >> n);
    for (int i = 1; i < n; ++i) {
        uint32_t bi = br.read_bits(8);
        if ((bi & 0xC0) != 0x80) { br.fail = true; return 0; }
        v = (v << 6) | (bi & 0x3F);
    }
    return v;
}

bool read_residual(BitReader& br, int blocksize, int order,
                   std::vector<int64_t>& out) {
    uint32_t method = br.read_bits(2);
    if (method > 1 || br.fail) return false;
    int pbits = method == 0 ? 4 : 5;            // RICE vs RICE2 parameter width
    uint32_t escape = method == 0 ? 0xF : 0x1F;
    uint32_t porder = br.read_bits(4);
    uint32_t parts = 1u << porder;
    if (blocksize % parts != 0) return false;
    int idx = order;
    for (uint32_t p = 0; p < parts; ++p) {
        int count = (int)(blocksize >> porder) - (p == 0 ? order : 0);
        if (count < 0) return false;
        uint32_t param = br.read_bits(pbits);
        if (param == escape) {
            uint32_t raw = br.read_bits(5);
            for (int i = 0; i < count; ++i)
                out[idx++] = raw ? br.read_signed(raw) : 0;
        } else {
            for (int i = 0; i < count; ++i) {
                uint32_t q = br.read_unary();
                uint64_t u = ((uint64_t)q << param) | br.read_bits64(param);
                out[idx++] = (int64_t)(u >> 1) ^ -(int64_t)(u & 1);   // zigzag
            }
        }
        if (br.fail) return false;
    }
    return true;
}

bool decode_subframe(BitReader& br, int blocksize, int bps,
                     std::vector<int64_t>& s) {
    if (br.read_bit() != 0) return false;       // mandatory zero pad bit
    uint32_t type = br.read_bits(6);
    int wasted = 0;
    if (br.read_bit()) wasted = (int)br.read_unary() + 1;
    bps -= wasted;
    if (bps <= 0 || bps > 33 || br.fail) return false;

    s.assign(blocksize, 0);
    if (type == 0) {                            // CONSTANT
        int64_t v = br.read_signed(bps);
        for (int i = 0; i < blocksize; ++i) s[i] = v;
    } else if (type == 1) {                     // VERBATIM
        for (int i = 0; i < blocksize; ++i) s[i] = br.read_signed(bps);
    } else if ((type & 0x38) == 0x08 && (type & 0x07) <= 4) {   // FIXED 0-4
        int order = type & 0x07;
        if (order > blocksize) return false;
        for (int i = 0; i < order; ++i) s[i] = br.read_signed(bps);
        if (!read_residual(br, blocksize, order, s)) return false;
        switch (order) {
        case 0:
            break;
        case 1:
            for (int i = 1; i < blocksize; ++i) s[i] += s[i-1];
            break;
        case 2:
            for (int i = 2; i < blocksize; ++i) s[i] += 2*s[i-1] - s[i-2];
            break;
        case 3:
            for (int i = 3; i < blocksize; ++i)
                s[i] += 3*s[i-1] - 3*s[i-2] + s[i-3];
            break;
        case 4:
            for (int i = 4; i < blocksize; ++i)
                s[i] += 4*s[i-1] - 6*s[i-2] + 4*s[i-3] - s[i-4];
            break;
        }
    } else if (type & 0x20) {                   // LPC, order 1-32
        int order = (int)(type & 0x1F) + 1;
        if (order > blocksize) return false;
        for (int i = 0; i < order; ++i) s[i] = br.read_signed(bps);
        uint32_t prec = br.read_bits(4);
        if (prec == 0xF) return false;          // invalid per spec
        int precision = (int)prec + 1;
        int shift = (int)br.read_signed(5);
        if (shift < 0) return false;            // negative shift is reserved
        int64_t coef[32];
        for (int i = 0; i < order; ++i) coef[i] = br.read_signed(precision);
        if (!read_residual(br, blocksize, order, s)) return false;
        for (int i = order; i < blocksize; ++i) {
            int64_t acc = 0;                    // 64-bit accumulator: 33-bit
            for (int j = 0; j < order; ++j)     // samples x 15-bit coefs x 32
                acc += coef[j] * s[i - 1 - j];
            s[i] += acc >> shift;
        }
    } else {
        return false;                           // reserved subframe type
    }
    if (wasted)
        for (int i = 0; i < blocksize; ++i) s[i] <<= wasted;
    return !br.fail;
}

const int kBlockSizes[16] = {0, 192, 576, 1152, 2304, 4608, -1, -2,
                             256, 512, 1024, 2048, 4096, 8192, 16384, 32768};
const int kRates[16] = {0, 88200, 176400, 192000, 8000, 16000, 22050, 24000,
                        32000, 44100, 48000, 96000, -1, -2, -3, 0};
const int kBps[8] = {0, 8, 12, -1, 16, 20, 24, 32};

long long read_flac_impl(const char* path, float** out,
                         int* channels, int* rate) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    fseek(f, 0, SEEK_END);
    long fsize = ftell(f);
    fseek(f, 0, SEEK_SET);
    if (fsize < 42) { fclose(f); return -2; }   // marker + streaminfo minimum
    std::vector<uint8_t> buf((size_t)fsize);
    size_t got = fread(buf.data(), 1, (size_t)fsize, f);
    fclose(f);
    if (got != (size_t)fsize) return -2;
    if (memcmp(buf.data(), "fLaC", 4)) return -2;

    BitReader br(buf.data(), buf.size());
    br.byte = 4;

    // ---- metadata blocks; STREAMINFO is mandatory and first ----
    int si_rate = 0, si_channels = 0, si_bps = 0;
    uint64_t si_total = 0;
    bool have_si = false, last = false;
    while (!last && !br.fail) {
        uint32_t hdr = br.read_bits(8);
        last = (hdr & 0x80) != 0;
        uint32_t type = hdr & 0x7F;
        uint32_t len = br.read_bits(24);
        if (type == 0 && len >= 34) {
            br.read_bits(16); br.read_bits(16);           // min/max blocksize
            br.read_bits(24); br.read_bits(24);           // min/max framesize
            si_rate = (int)br.read_bits(20);
            si_channels = (int)br.read_bits(3) + 1;
            si_bps = (int)br.read_bits(5) + 1;
            si_total = br.read_bits64(36);
            br.byte += 16;                                // md5 (unverified)
            if (len > 34) br.byte += len - 34;
            have_si = true;
        } else {
            br.byte += len;                               // skip block
        }
        br.bit = 0;
        if (br.byte > buf.size()) return -2;
    }
    if (!have_si || si_rate <= 0 || br.fail) return -2;

    std::vector<std::vector<int64_t>> ch(8);
    std::vector<int64_t> mono;
    std::vector<float> pcm;
    if (si_total) pcm.reserve((size_t)si_total * si_channels);
    long long frames_total = 0;

    // ---- audio frames ----
    while (br.byte + 2 <= buf.size()) {
        // sync scan: 0xFF 0b111110xx
        if (buf[br.byte] != 0xFF || (buf[br.byte + 1] & 0xFC) != 0xF8) break;
        br.bit = 0;
        br.read_bits(14);                                 // sync code
        br.read_bit();                                    // reserved
        br.read_bit();                                    // blocking strategy
        uint32_t bs_code = br.read_bits(4);
        uint32_t sr_code = br.read_bits(4);
        uint32_t chan_code = br.read_bits(4);
        uint32_t bps_code = br.read_bits(3);
        br.read_bit();                                    // reserved
        read_utf8_coded(br);                              // frame/sample index

        int blocksize;
        if (bs_code == 6) blocksize = (int)br.read_bits(8) + 1;
        else if (bs_code == 7) blocksize = (int)br.read_bits(16) + 1;
        else blocksize = kBlockSizes[bs_code];
        if (blocksize <= 0) return -3;

        int frate = kRates[sr_code];
        if (frate == -1) frate = (int)br.read_bits(8) * 1000;
        else if (frate == -2) frate = (int)br.read_bits(16);
        else if (frate == -3) frate = (int)br.read_bits(16) * 10;
        else if (frate == 0) frate = si_rate;             // code 0 / invalid 15

        int bps = bps_code == 0 ? si_bps : kBps[bps_code];
        if (bps <= 0) return -3;
        br.read_bits(8);                                  // CRC-8 (unverified)
        if (br.fail) return -3;

        int nch;                                          // 8/9/10 = stereo
        if (chan_code <= 7) nch = (int)chan_code + 1;     // decorrelation
        else if (chan_code <= 10) nch = 2;
        else return -3;
        if (chan_code <= 7 && nch != si_channels) return -3;
        if (chan_code >= 8 && si_channels != 2) return -3;

        for (int c = 0; c < nch; ++c) {
            int sub_bps = bps;
            if ((chan_code == 8 && c == 1) ||             // left/side
                (chan_code == 9 && c == 0) ||             // side/right
                (chan_code == 10 && c == 1))              // mid/side
                sub_bps += 1;
            if (!decode_subframe(br, blocksize, sub_bps, ch[c])) return -4;
        }
        br.align();
        br.read_bits(16);                                 // CRC-16 (unverified)
        if (br.fail) return -4;

        // stereo decorrelation back to L/R
        if (chan_code == 8) {                             // left, side
            for (int i = 0; i < blocksize; ++i) ch[1][i] = ch[0][i] - ch[1][i];
        } else if (chan_code == 9) {                      // side, right
            for (int i = 0; i < blocksize; ++i) ch[0][i] = ch[0][i] + ch[1][i];
        } else if (chan_code == 10) {                     // mid, side
            for (int i = 0; i < blocksize; ++i) {
                int64_t side = ch[1][i];
                int64_t m2 = (ch[0][i] << 1) | (side & 1);
                ch[0][i] = (m2 + side) >> 1;
                ch[1][i] = (m2 - side) >> 1;
            }
        }

        float scale = 1.0f / (float)(1ull << (bps - 1));
        size_t base = pcm.size();
        pcm.resize(base + (size_t)blocksize * nch);
        for (int i = 0; i < blocksize; ++i)
            for (int c = 0; c < nch; ++c)
                pcm[base + (size_t)i * nch + c] = (float)ch[c][i] * scale;
        frames_total += blocksize;
        if (si_total && (uint64_t)frames_total >= si_total) {
            // drop padding samples of the final short block, if any
            if ((uint64_t)frames_total > si_total)
                pcm.resize((size_t)si_total * nch);
            frames_total = (long long)si_total;
            break;
        }
    }
    if (pcm.empty()) return -5;

    int nch_out = si_channels;
    float* data = (float*)malloc(sizeof(float) * pcm.size());
    if (!data) return -6;
    memcpy(data, pcm.data(), sizeof(float) * pcm.size());
    *out = data;
    *channels = nch_out;
    *rate = si_rate;
    return (long long)(pcm.size() / (size_t)nch_out);
}

}  // namespace

extern "C" long long aa_read_flac(const char* path, float** out,
                                  int* channels, int* rate) {
    *out = nullptr; *channels = 0; *rate = 0;
    try {
        return read_flac_impl(path, out, channels, rate);
    } catch (...) {
        *out = nullptr;
        return -7;
    }
}
