/* Baseline JPEG scan decoder: entropy-decode a scan into quantized zigzag
 * coefficients.  The host half of the split JPEG decoder — dequantization,
 * inverse DCT and pixel packing run on the TPU (ops/jpeg.py), mirroring the
 * encoder split.  (The reference decodes JPEG with CUDA GPUJPEG,
 * src/video_decompress/gpujpeg.c; entropy decode is inherently sequential
 * per restart segment, so it lives here in C.)
 *
 * Supports: baseline DCT, interleaved scan, 1-4 components, restart markers.
 */

#include <stdint.h>
#include <string.h>

typedef struct {
    /* canonical Huffman decode tables (libjpeg style) */
    int32_t mincode[17];
    int32_t maxcode[18]; /* maxcode[17] sentinel */
    int32_t valptr[17];
    uint8_t huffval[256];
} htab_t;

typedef struct {
    const uint8_t *data;
    int64_t pos;
    int64_t size;
    uint32_t bitbuf;
    int bitcnt;
    int marker_hit;
} reader_t;

static void build_htab(htab_t *t, const uint8_t bits[16], const uint8_t *vals, int nvals)
{
    memcpy(t->huffval, vals, (size_t)nvals);
    int code = 0, k = 0;
    for (int l = 1; l <= 16; l++) {
        t->valptr[l] = k;
        t->mincode[l] = code;
        code += bits[l - 1];
        k += bits[l - 1];
        t->maxcode[l] = code - 1;
        if (bits[l - 1] == 0) t->maxcode[l] = -1;
        code <<= 1;
    }
    t->maxcode[17] = 0x7FFFFFFF;
}

static int read_bit(reader_t *r)
{
    if (r->bitcnt == 0) {
        if (r->pos >= r->size) { r->marker_hit = 1; return 0; }
        uint8_t b = r->data[r->pos++];
        if (b == 0xFF) {
            if (r->pos < r->size && r->data[r->pos] == 0x00) {
                r->pos++;
            } else {
                /* marker: back off and report */
                r->pos--;
                r->marker_hit = 1;
                return 0;
            }
        }
        r->bitbuf = b;
        r->bitcnt = 8;
    }
    r->bitcnt--;
    return (r->bitbuf >> r->bitcnt) & 1;
}

static int huff_decode(reader_t *r, const htab_t *t)
{
    int code = read_bit(r);
    int l = 1;
    while (code > t->maxcode[l]) {
        code = (code << 1) | read_bit(r);
        l++;
        if (l > 16) return -1;
    }
    return t->huffval[t->valptr[l] + code - t->mincode[l]];
}

static int receive_extend(reader_t *r, int s)
{
    if (s == 0) return 0;
    int v = 0;
    for (int i = 0; i < s; i++) v = (v << 1) | read_bit(r);
    if (v < (1 << (s - 1))) v -= (1 << s) - 1;
    return v;
}

/* Decode an interleaved baseline scan.
 *
 * tables: 4 x (16 bits counts + 256 vals) flattened = per slot 272 bytes,
 *         slots: 0 = DC0, 1 = AC0, 2 = DC1, 3 = AC1.
 * comp_ntab[c]  : table pair (0 or 1) per component
 * comp_nblocks[c]: blocks per MCU for component c
 * out[c]: int16 buffer [total_blocks_c * 64], zigzag order
 * Returns number of MCUs decoded (== nmcu on success). */
int64_t jpeg_scan_decode(
    const uint8_t *data, int64_t size,
    const uint8_t *tables,
    int ncomp, const int32_t *comp_ntab, const int32_t *comp_nblocks,
    int64_t nmcu, int32_t restart_interval,
    int16_t **out)
{
    htab_t ht[4];
    for (int i = 0; i < 4; i++) {
        build_htab(&ht[i], tables + i * 272, tables + i * 272 + 16, 256);
    }
    reader_t r = {data, 0, size, 0, 0, 0};
    int32_t pred[4] = {0, 0, 0, 0};
    int64_t blk_idx[4] = {0, 0, 0, 0};

    for (int64_t m = 0; m < nmcu; m++) {
        if (restart_interval && m && m % restart_interval == 0) {
            /* skip to RST marker */
            r.bitcnt = 0;
            r.marker_hit = 0;
            while (r.pos + 1 < r.size &&
                   !(r.data[r.pos] == 0xFF && r.data[r.pos + 1] >= 0xD0 &&
                     r.data[r.pos + 1] <= 0xD7)) {
                r.pos++;
            }
            if (r.pos + 1 >= r.size) return m;
            r.pos += 2;
            pred[0] = pred[1] = pred[2] = pred[3] = 0;
        }
        for (int c = 0; c < ncomp; c++) {
            const htab_t *dc = &ht[comp_ntab[c] * 2];
            const htab_t *ac = &ht[comp_ntab[c] * 2 + 1];
            for (int b = 0; b < comp_nblocks[c]; b++) {
                int16_t *coef = out[c] + blk_idx[c] * 64;
                blk_idx[c]++;
                memset(coef, 0, 64 * sizeof(int16_t));
                int s = huff_decode(&r, dc);
                if (s < 0 || r.marker_hit) return m;
                pred[c] += receive_extend(&r, s);
                coef[0] = (int16_t)pred[c];
                int k = 1;
                while (k < 64) {
                    int rs = huff_decode(&r, ac);
                    if (rs < 0 || r.marker_hit) return m;
                    int rr = rs >> 4, ss = rs & 0xF;
                    if (ss == 0) {
                        if (rr == 15) { k += 16; continue; }
                        break; /* EOB */
                    }
                    k += rr;
                    if (k > 63) return m;
                    coef[k] = (int16_t)receive_extend(&r, ss);
                    k++;
                }
            }
        }
    }
    return nmcu;
}
