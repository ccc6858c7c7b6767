/* JPEG entropy-stream assembly: merge per-block bit slots produced by the TPU
 * into a byte-stuffed scan with restart markers.
 *
 * The device encoder (ultragrid_tpu/ops/jpeg.py) emits, per 8x8 block, a
 * fixed-size slot of 32-bit words holding the block's Huffman bits MSB-first
 * (bit 0 of the stream = MSB of word 0) plus the bit count.  This routine
 * concatenates the blocks, byte-aligns each restart segment with 1-bits,
 * inserts RST0..7 markers, and performs 0xFF 0x00 byte stuffing — the
 * host-side half of the split entropy coder (the reference's GPUJPEG does the
 * same final copy on host, src/video_compress/gpujpeg.cpp).
 *
 * Two-pass parallel-friendly layout: segments are independent, so this can be
 * parallelized per segment; the single-thread version is bandwidth-bound and
 * already fast enough for 4K60 (~2 MB/frame output).
 */

#include <stdint.h>
#include <string.h>

typedef struct {
    uint64_t bitbuf;
    int bitcnt;
    uint8_t *out;
    int64_t pos;
    int64_t cap;
} writer_t;

static inline void put_byte(writer_t *w, uint8_t b)
{
    if (w->pos < w->cap) {
        w->out[w->pos] = b;
    }
    w->pos++;
    if (b == 0xFF) {
        if (w->pos < w->cap) {
            w->out[w->pos] = 0x00;
        }
        w->pos++;
    }
}

static inline void flush_bytes(writer_t *w)
{
    while (w->bitcnt >= 8) {
        uint8_t b = (uint8_t)(w->bitbuf >> (w->bitcnt - 8));
        w->bitcnt -= 8;
        put_byte(w, b);
    }
}

static inline void append_bits(writer_t *w, uint32_t value, int nbits)
{
    /* nbits <= 32; value holds the bits in the TOP nbits of the word */
    if (nbits == 0) {
        return;
    }
    w->bitbuf = (w->bitbuf << nbits) | (value >> (32 - nbits));
    w->bitcnt += nbits;
    flush_bytes(w);
}

static inline void align_segment(writer_t *w)
{
    int pad = (8 - (w->bitcnt & 7)) & 7;
    if (pad) {
        w->bitbuf = (w->bitbuf << pad) | ((1u << pad) - 1);
        w->bitcnt += pad;
    }
    flush_bytes(w);
}

static inline void append_block(writer_t *w, const uint32_t *slot, int remaining)
{
    int i = 0;
    while (remaining >= 32) {
        append_bits(w, slot[i++], 32);
        remaining -= 32;
    }
    if (remaining > 0) {
        append_bits(w, slot[i], remaining);
    }
}

/* Returns total output length (may exceed out_cap, in which case the output
 * is truncated and the caller should retry with a larger buffer). */
int64_t jpeg_assemble(const uint32_t *slots, const int32_t *bits,
                      int64_t nblocks, int32_t wwords,
                      int64_t blocks_per_seg, uint8_t *out, int64_t out_cap)
{
    writer_t w = {0, 0, out, 0, out_cap};
    int rst = 0;
    for (int64_t b = 0; b < nblocks; b++) {
        if (b > 0 && blocks_per_seg > 0 && b % blocks_per_seg == 0) {
            align_segment(&w);
            /* RST markers are not subject to stuffing */
            if (w.pos < w.cap) out[w.pos] = 0xFF;
            w.pos++;
            if (w.pos < w.cap) out[w.pos] = (uint8_t)(0xD0 + (rst & 7));
            w.pos++;
            rst++;
        }
        append_block(&w, slots + (size_t)b * wwords, bits[b]);
    }
    align_segment(&w);
    return w.pos;
}

/* Three-component interleaved variant: per MCU, ky luma blocks then one Cb
 * and one Cr block, read from separate per-component slot arrays (this is
 * the layout the TPU encoder produces without any device-side interleave). */
int64_t jpeg_assemble_3c(const uint32_t *ys, const int32_t *yb,
                         const uint32_t *us, const int32_t *ub,
                         const uint32_t *vs, const int32_t *vb,
                         int64_t nmcu, int32_t ky, int32_t wwords,
                         int64_t mcus_per_seg, uint8_t *out, int64_t out_cap)
{
    writer_t w = {0, 0, out, 0, out_cap};
    int rst = 0;
    for (int64_t m = 0; m < nmcu; m++) {
        if (m > 0 && mcus_per_seg > 0 && m % mcus_per_seg == 0) {
            align_segment(&w);
            if (w.pos < w.cap) out[w.pos] = 0xFF;
            w.pos++;
            if (w.pos < w.cap) out[w.pos] = (uint8_t)(0xD0 + (rst & 7));
            w.pos++;
            rst++;
        }
        for (int32_t k = 0; k < ky; k++) {
            int64_t b = m * ky + k;
            append_block(&w, ys + (size_t)b * wwords, yb[b]);
        }
        append_block(&w, us + (size_t)m * wwords, ub[m]);
        append_block(&w, vs + (size_t)m * wwords, vb[m]);
    }
    align_segment(&w);
    return w.pos;
}

/* Sum of bits, for diagnostics. */
int64_t jpeg_total_bits(const int32_t *bits, int64_t nblocks)
{
    int64_t t = 0;
    for (int64_t b = 0; b < nblocks; b++) t += bits[b];
    return t;
}

/* Strided variant: slot word i of block b lives at slots[i*word_stride + b]
 * (word-major [W][nb] layout, what the transposed TPU packer emits). */
static inline void append_block_strided(writer_t *w, const uint32_t *slot_base,
                                        int64_t word_stride, int remaining)
{
    int i = 0;
    while (remaining >= 32) {
        append_bits(w, slot_base[(int64_t)i * word_stride], 32);
        i++;
        remaining -= 32;
    }
    if (remaining > 0) {
        append_bits(w, slot_base[(int64_t)i * word_stride], remaining);
    }
}

int64_t jpeg_assemble_3c_strided(
    const uint32_t *ys, const int32_t *yb, int64_t y_stride,
    const uint32_t *us, const int32_t *ub, int64_t u_stride,
    const uint32_t *vs, const int32_t *vb, int64_t v_stride,
    int64_t nmcu, int32_t ky, int32_t wwords,
    int64_t mcus_per_seg, uint8_t *out, int64_t out_cap)
{
    (void)wwords;
    writer_t w = {0, 0, out, 0, out_cap};
    int rst = 0;
    for (int64_t m = 0; m < nmcu; m++) {
        if (m > 0 && mcus_per_seg > 0 && m % mcus_per_seg == 0) {
            align_segment(&w);
            if (w.pos < w.cap) out[w.pos] = 0xFF;
            w.pos++;
            if (w.pos < w.cap) out[w.pos] = (uint8_t)(0xD0 + (rst & 7));
            w.pos++;
            rst++;
        }
        for (int32_t k = 0; k < ky; k++) {
            int64_t b = m * ky + k;
            append_block_strided(&w, ys + b, y_stride, yb[b]);
        }
        append_block_strided(&w, us + m, u_stride, ub[m]);
        append_block_strided(&w, vs + m, v_stride, vb[m]);
    }
    align_segment(&w);
    return w.pos;
}
