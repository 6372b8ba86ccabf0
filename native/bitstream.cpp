// Native bitstream codec for vcs_h264_tpu.
//
// The reference has no entropy coding or on-disk bitstream at all — encoded
// frames live as Python objects (InterframeCompression/frame.py:1-8). This
// library provides the missing layer: zero-run + signed exp-Golomb coding of
// quantized DCT coefficients and motion vectors, the format used by
// io/bitstream.py for the .vcs container (a pure-Python fallback with the
// identical format lives there too).
//
// Codes (H.264-style):
//   ue(v):  exp-Golomb unsigned   1 -> "1"; v>0 -> [zeros]=floor(log2(v+1)),
//           binary of v+1
//   se(v):  signed mapping v -> (v<=0 ? -2v : 2v-1) then ue
//   stream: tokens (zero_run:ue, value:se) per nonzero; a trailing
//           (remaining_run:ue) flushes the tail; bit-packed MSB-first.
//
// Build: g++ -O3 -shared -fPIC -o libvcsbits.so bitstream.cpp

#include <cstdint>
#include <cstring>

namespace {

struct BitWriter {
    uint8_t* buf;
    int64_t cap;
    int64_t byte_pos = 0;
    int bit_pos = 0;   // next bit within buf[byte_pos], MSB first
    bool overflow = false;

    void put_bit(int b) {
        if (byte_pos >= cap) { overflow = true; return; }
        if (bit_pos == 0) buf[byte_pos] = 0;
        if (b) buf[byte_pos] |= (uint8_t)(0x80u >> bit_pos);
        if (++bit_pos == 8) { bit_pos = 0; ++byte_pos; }
    }

    void put_ue(uint32_t v) {
        uint64_t x = (uint64_t)v + 1;
        int nbits = 0;
        for (uint64_t t = x; t > 1; t >>= 1) ++nbits;
        for (int i = 0; i < nbits; ++i) put_bit(0);
        for (int i = nbits; i >= 0; --i) put_bit((x >> i) & 1);
    }

    void put_se(int32_t v) {
        uint32_t m = v <= 0 ? (uint32_t)(-2 * (int64_t)v)
                            : (uint32_t)(2 * (int64_t)v - 1);
        put_ue(m);
    }

    int64_t flush() {
        if (overflow) return -1;
        return byte_pos + (bit_pos ? 1 : 0);
    }
};

struct BitReader {
    const uint8_t* buf;
    int64_t nbytes;
    int64_t byte_pos = 0;
    int bit_pos = 0;
    bool error = false;

    int get_bit() {
        if (byte_pos >= nbytes) { error = true; return 0; }
        int b = (buf[byte_pos] >> (7 - bit_pos)) & 1;
        if (++bit_pos == 8) { bit_pos = 0; ++byte_pos; }
        return b;
    }

    uint32_t get_ue() {
        int zeros = 0;
        while (!error && get_bit() == 0) {
            if (++zeros > 40) { error = true; return 0; }
        }
        uint64_t x = 1;
        for (int i = 0; i < zeros; ++i) x = (x << 1) | (uint32_t)get_bit();
        return (uint32_t)(x - 1);
    }

    int32_t get_se() {
        uint32_t m = get_ue();
        return (m & 1) ? (int32_t)((m + 1) / 2) : -(int32_t)(m / 2);
    }
};

}  // namespace

extern "C" {

// Encode n int16 samples; returns bytes written, or -1 on overflow.
int64_t vcs_rle_encode_i16(const int16_t* data, int64_t n,
                           uint8_t* out, int64_t out_cap) {
    BitWriter w{out, out_cap};
    int64_t i = 0;
    while (i < n) {
        int64_t run = 0;
        while (i + run < n && data[i + run] == 0) ++run;
        if (i + run >= n) {            // tail of zeros
            w.put_ue((uint32_t)run);
            break;
        }
        w.put_ue((uint32_t)run);
        w.put_se(data[i + run]);
        i += run + 1;
        if (i >= n) w.put_ue(0);       // explicit empty tail
    }
    if (n == 0) w.put_ue(0);
    return w.flush();
}

// Decode exactly n_out samples; returns samples decoded, or -1 on error.
int64_t vcs_rle_decode_i16(const uint8_t* in, int64_t nbytes,
                           int16_t* out, int64_t n_out) {
    BitReader r{in, nbytes};
    int64_t i = 0;
    while (i < n_out) {
        uint32_t run = r.get_ue();
        if (r.error) return -1;
        for (uint32_t k = 0; k < run && i < n_out; ++k) out[i++] = 0;
        if (i >= n_out) break;
        int32_t v = r.get_se();
        if (r.error) return -1;
        out[i++] = (int16_t)v;
    }
    return i;
}

// Worst-case output bound for n samples (every sample nonzero + large).
int64_t vcs_rle_bound(int64_t n) { return 8 * n + 16; }

}  // extern "C"
