/* Assemble the device-packed H.264 slot windows into one RBSP payload.
 *
 * Input: per-macroblock bit windows (big-endian u32 words, MSB-first bits)
 * plus bit counts — the same slot layout the JPEG assembler consumes
 * (native/jpeg_assemble.c), but with H.264 semantics: plain bit
 * concatenation (no byte stuffing), RBSP stop-bit + zero padding, then
 * emulation-prevention 0x03 insertion.  Host-side twin of the device
 * encoder in ultragrid_tpu/ops/h264_tpu.py; role of the bitstream muxer in
 * the reference's codec wrappers (src/video_compress/libavcodec.cpp).
 */
#include <stdint.h>
#include <stddef.h>
#include <string.h>

/* Concatenate nmb windows of (slots[i*wwords..], bits[i]) MSB-first,
 * append the RBSP stop bit, byte-align with zeros, then insert emulation
 * prevention bytes.  Returns output length in bytes, or a negative value
 * if cap is too small.  slots words hold bits left-aligned (bit 31 first).
 */
long h264_assemble(const uint32_t *slots, const int32_t *bits, long nmb,
                   long wwords, uint8_t *out, long cap)
{
    uint64_t acc = 0;   /* bit accumulator, MSB-first in the low `n` bits */
    int n = 0;
    long raw_len = 0;
    /* first pass: raw RBSP into out (no emulation prevention yet) */
    for (long mb = 0; mb < nmb; mb++) {
        const uint32_t *w = slots + mb * wwords;
        long nb = bits[mb];
        long wi = 0;
        while (nb > 0) {
            int take = nb >= 32 ? 32 : (int)nb;
            uint32_t word = w[wi++];
            acc = (acc << take) | (word >> (32 - take));
            n += take;
            nb -= take;
            while (n >= 8) {
                if (raw_len >= cap)
                    return -1;
                out[raw_len++] = (uint8_t)(acc >> (n - 8));
                n -= 8;
            }
        }
    }
    /* rbsp stop bit + byte align */
    acc = (acc << 1) | 1;
    n += 1;
    if (n & 7) {
        acc <<= (8 - (n & 7));
        n += 8 - (n & 7);
    }
    while (n >= 8) {
        if (raw_len >= cap)
            return -1;
        out[raw_len++] = (uint8_t)(acc >> (n - 8));
        n -= 8;
    }
    /* second pass: emulation prevention, in place from the end.
     * Count insertions first. */
    long ins = 0;
    int zeros = 0;
    for (long i = 0; i < raw_len; i++) {
        if (zeros >= 2 && out[i] <= 3) {
            ins++;
            zeros = 0;
        }
        zeros = out[i] == 0 ? zeros + 1 : 0;
    }
    if (raw_len + ins > cap)
        return -2;
    if (ins == 0)
        return raw_len;
    /* shift the raw RBSP into the buffer's slack, then stream it forward
     * re-inserting the 0x03 bytes */
    memmove(out + ins, out, (size_t)raw_len);
    long wpos = 0;
    zeros = 0;
    for (long k = 0; k < raw_len; k++) {
        uint8_t b = out[ins + k];
        if (zeros >= 2 && b <= 3) {
            out[wpos++] = 3;
            zeros = 0;
        }
        out[wpos++] = b;
        zeros = b == 0 ? zeros + 1 : 0;
    }
    return wpos;
}
