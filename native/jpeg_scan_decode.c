/* Baseline JPEG scan decoder: entropy-decode a scan into quantized zigzag
 * coefficients.  The host half of the split JPEG decoder — dequantization,
 * inverse DCT and pixel packing run on the TPU (ops/jpeg.py), mirroring the
 * encoder split.  (The reference decodes JPEG with CUDA GPUJPEG,
 * src/video_decompress/gpujpeg.c; entropy decode is inherently sequential
 * per restart segment, so it lives here in C.)
 *
 * Supports: baseline DCT, interleaved scan, 1-4 components, restart markers.
 *
 * Fast path layout (round 4, for the 4K60 receive budget): each restart
 * segment is first UNSTUFFED (FF00 -> FF) into a scratch buffer in one
 * branch-light pass, so the hot bit reader never checks for markers — it
 * just shifts bytes in.  Symbols resolve through a 10-bit lookahead LUT
 * (one refill covers DC/AC code + value bits: <= 31 bits per symbol pair
 * against a 64-bit window).
 */

#include <pthread.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define LUT_BITS 10
#define LUT_SIZE (1 << LUT_BITS)

typedef struct {
    /* canonical Huffman decode tables (libjpeg style) + lookahead LUT:
     * lut[look] = (symbol << 8) | code_len for codes of <= LUT_BITS bits */
    int32_t mincode[17];
    int32_t maxcode[18]; /* maxcode[17] sentinel */
    int32_t valptr[17];
    uint8_t huffval[256];
    uint16_t lut[LUT_SIZE];
} htab_t;

typedef struct {
    /* bit reader over UNSTUFFED entropy data: no marker logic at all */
    const uint8_t *data;
    int64_t pos;
    int64_t size;
    uint64_t bitbuf;
    int bitcnt;
    int starved; /* ran past the end of the segment */
} reader_t;

static void build_htab(htab_t *t, const uint8_t bits[16], const uint8_t *vals, int nvals)
{
    memcpy(t->huffval, vals, (size_t)nvals);
    memset(t->lut, 0, sizeof t->lut);
    int code = 0, k = 0;
    for (int l = 1; l <= 16; l++) {
        t->valptr[l] = k;
        t->mincode[l] = code;
        for (int i = 0; i < bits[l - 1]; i++) {
            if (l <= LUT_BITS) {
                int base = (code + i) << (LUT_BITS - l);
                for (int f = 0; f < (1 << (LUT_BITS - l)); f++) {
                    t->lut[base + f] = (uint16_t)((vals[k + i] << 8) | l);
                }
            }
        }
        code += bits[l - 1];
        k += bits[l - 1];
        t->maxcode[l] = code - 1;
        if (bits[l - 1] == 0) t->maxcode[l] = -1;
        code <<= 1;
    }
    t->maxcode[17] = 0x7FFFFFFF;
}

static inline void refill(reader_t *r)
{
    /* top the 64-bit window up to > 56 bits; unstuffed data, no checks */
    if (r->pos + 8 <= r->size) {
        int take = (63 - r->bitcnt) >> 3;
        if (take == 0) return;
        uint64_t chunk;
        memcpy(&chunk, r->data + r->pos, 8);
        chunk = __builtin_bswap64(chunk);
        r->bitbuf = (r->bitbuf << (take * 8)) | (chunk >> (64 - take * 8));
        r->pos += take;
        r->bitcnt += take * 8;
        return;
    }
    while (r->bitcnt <= 56 && r->pos < r->size) {
        r->bitbuf = (r->bitbuf << 8) | r->data[r->pos++];
        r->bitcnt += 8;
    }
}

static inline int huff_decode(reader_t *r, const htab_t *t)
{
    /* caller guarantees a recent refill; codes are <= 16 bits */
    if (r->bitcnt >= LUT_BITS) {
        int look = (int)((r->bitbuf >> (r->bitcnt - LUT_BITS)) & (LUT_SIZE - 1));
        uint16_t e = t->lut[look];
        if (e) {
            r->bitcnt -= e & 0xFF;
            return e >> 8;
        }
    }
    /* long (or tail-of-segment) codes: canonical walk */
    int code = 0, l = 0;
    while (l < 16) {
        if (r->bitcnt == 0) {
            refill(r);
            if (r->bitcnt == 0) { r->starved = 1; return -1; }
        }
        r->bitcnt--;
        code = (code << 1) | (int)((r->bitbuf >> r->bitcnt) & 1);
        l++;
        if (code <= t->maxcode[l]) {
            return t->huffval[t->valptr[l] + code - t->mincode[l]];
        }
    }
    return -1;
}

static inline int receive_extend(reader_t *r, int s)
{
    if (s == 0) return 0;
    if (r->bitcnt < s) {
        refill(r);
        if (r->bitcnt < s) { r->starved = 1; return 0; }
    }
    r->bitcnt -= s;
    int v = (int)((r->bitbuf >> r->bitcnt) & ((1u << s) - 1));
    if (v < (1 << (s - 1))) v -= (1 << s) - 1;
    return v;
}

/* Unstuff entropy bytes [data, data+size) into dst until a marker (FF xx
 * with xx != 00) or the end.  Returns the unstuffed length; *consumed gets
 * the number of source bytes eaten (marker itself not consumed).  The
 * inner loop runs memchr-speed between FF bytes. */
static int64_t unstuff(const uint8_t *data, int64_t size, uint8_t *dst,
                       int64_t *consumed)
{
    int64_t n = 0, pos = 0;
    while (pos < size) {
        const uint8_t *ff = (const uint8_t *)memchr(data + pos, 0xFF, (size_t)(size - pos));
        if (!ff) {
            memcpy(dst + n, data + pos, (size_t)(size - pos));
            n += size - pos;
            pos = size;
            break;
        }
        int64_t run = ff - (data + pos);
        memcpy(dst + n, data + pos, (size_t)run);
        n += run;
        pos += run;
        if (pos + 1 < size && data[pos + 1] == 0x00) {
            dst[n++] = 0xFF;
            pos += 2;
        } else {
            break; /* marker (or trailing FF): stop before it */
        }
    }
    if (consumed) *consumed = pos;
    return n;
}

/* Decode MCUs [m0, m1) of one restart segment from UNSTUFFED entropy
 * data.  DC predictors start at 0 (a segment boundary resets them).
 * Returns MCUs decoded. */
static int64_t decode_segment(
    const uint8_t *data, int64_t size, const htab_t ht[4],
    int ncomp, const int32_t *comp_ntab, const int32_t *comp_nblocks,
    int64_t m0, int64_t m1, int16_t **out)
{
    reader_t r = {data, 0, size, 0, 0, 0};
    int32_t pred[4] = {0, 0, 0, 0};

    for (int64_t m = m0; m < m1; m++) {
        for (int c = 0; c < ncomp; c++) {
            const htab_t *dc = &ht[comp_ntab[c] * 2];
            const htab_t *ac = &ht[comp_ntab[c] * 2 + 1];
            for (int b = 0; b < comp_nblocks[c]; b++) {
                int16_t *coef = out[c] + (m * comp_nblocks[c] + b) * 64;
                memset(coef, 0, 64 * sizeof(int16_t));
                refill(&r);
                int s = huff_decode(&r, dc);
                if (s < 0 || r.starved) return m - m0;
                pred[c] += receive_extend(&r, s);
                coef[0] = (int16_t)pred[c];
                int k = 1;
                while (k < 64) {
                    /* fast path: with >= 32 buffered bits, one LUT-hit AC
                     * symbol (<= 10 code + <= 15 value bits) decodes with
                     * no further checks */
                    if (r.bitcnt < 32) refill(&r);
                    if (r.bitcnt >= 32) {
                        uint16_t e = ac->lut[(r.bitbuf >> (r.bitcnt - LUT_BITS)) & (LUT_SIZE - 1)];
                        if (e) {
                            int rs = e >> 8, len = e & 0xFF;
                            int rr = rs >> 4, ss = rs & 0xF;
                            if (ss == 0) {
                                r.bitcnt -= len;
                                if (rr == 15) { k += 16; continue; }
                                break; /* EOB */
                            }
                            k += rr;
                            if (k > 63) return m - m0;
                            r.bitcnt -= len + ss;
                            int v = (int)((r.bitbuf >> r.bitcnt) & ((1u << ss) - 1));
                            if (v < (1 << (ss - 1))) v -= (1 << ss) - 1;
                            coef[k++] = (int16_t)v;
                            continue;
                        }
                    }
                    int rs = huff_decode(&r, ac);
                    if (rs < 0 || r.starved) return m - m0;
                    int rr = rs >> 4, ss = rs & 0xF;
                    if (ss == 0) {
                        if (rr == 15) { k += 16; continue; }
                        break; /* EOB */
                    }
                    k += rr;
                    if (k > 63) return m - m0;
                    coef[k] = (int16_t)receive_extend(&r, ss);
                    k++;
                }
            }
        }
    }
    return m1 - m0;
}

/* Decode MCUs [m0, m1) walking restart segments from `data` (stuffed,
 * segment-head-aligned).  `scratch` must hold >= size bytes. */
static int64_t decode_mcu_range(
    const uint8_t *data, int64_t size, const htab_t ht[4],
    int ncomp, const int32_t *comp_ntab, const int32_t *comp_nblocks,
    int64_t m0, int64_t m1, int32_t restart_interval, int16_t **out,
    uint8_t *scratch)
{
    int64_t pos = 0, done = 0;
    int64_t m = m0;
    while (m < m1) {
        int64_t seg_end = restart_interval
            ? m - (m % restart_interval) + restart_interval : m1;
        if (seg_end > m1) seg_end = m1;
        int64_t consumed = 0;
        int64_t un = unstuff(data + pos, size - pos, scratch, &consumed);
        int64_t got = decode_segment(scratch, un, ht, ncomp, comp_ntab,
                                     comp_nblocks, m, seg_end, out);
        done += got;
        if (got < seg_end - m) return done; /* truncated / corrupt */
        m = seg_end;
        pos += consumed;
        /* step over the RST marker to the next segment head */
        if (m < m1) {
            while (pos + 1 < size &&
                   !(data[pos] == 0xFF && data[pos + 1] >= 0xD0 &&
                     data[pos + 1] <= 0xD7)) {
                pos++;
            }
            if (pos + 1 >= size) return done;
            pos += 2;
        }
    }
    return done;
}

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
    uint8_t *scratch = (uint8_t *)malloc((size_t)size + 16);
    if (!scratch) return 0;
    int64_t done = decode_mcu_range(data, size, ht, ncomp, comp_ntab,
                                    comp_nblocks, 0, nmcu, restart_interval,
                                    out, scratch);
    free(scratch);
    return done;
}

/* ------------------------------------------------------------------ */
/* Multi-threaded variant: restart segments are independent, so split  */
/* the scan at RST markers and decode ranges of segments in parallel   */
/* (the same trick the encoder exploits; GPUJPEG's CUDA decoder does   */
/* the equivalent with one thread block per segment).                  */

typedef struct {
    const uint8_t *data;
    int64_t size;
    const htab_t *ht;
    int ncomp;
    const int32_t *comp_ntab;
    const int32_t *comp_nblocks;
    int64_t m0, m1;
    int32_t restart_interval;
    int16_t **out;
    int64_t done;
} mt_job_t;

static void *mt_worker(void *arg)
{
    mt_job_t *j = (mt_job_t *)arg;
    uint8_t *scratch = (uint8_t *)malloc((size_t)j->size + 16);
    if (!scratch) { j->done = 0; return 0; }
    j->done = decode_mcu_range(j->data, j->size, j->ht, j->ncomp,
                               j->comp_ntab, j->comp_nblocks, j->m0, j->m1,
                               j->restart_interval, j->out, scratch);
    free(scratch);
    return 0;
}

/* ------------------------------------------------------------------ */
/* Packed variant: emit the device-upload layout directly — int8 ACs   */
/* (flat, components concatenated, zigzag), an int16 DC column, and a  */
/* bounded (flat index, delta) exception list for ACs that do not fit  */
/* int8 (delta = v - (int8)v, a multiple of 256, losslessly re-added   */
/* on device).  This replaces a ~25 ms/4K-frame numpy packing pass and */
/* halves the coefficient output traffic (ops/jpeg.py decode_to_uyvy). */

typedef struct {
    int8_t *lo;              /* flat [sum_c nblocks_c * 64] */
    int16_t *dc;             /* flat [sum_c nblocks_c] */
    const int64_t *lo_off;   /* per comp: offset into lo (elements) */
    const int64_t *dc_off;   /* per comp: offset into dc */
    int32_t *exc_idx;
    int32_t *exc_delta;
    int64_t exc_cap;
    int64_t exc_n;
    int overflow;
} packed_out_t;

static int64_t decode_segment_packed(
    const uint8_t *data, int64_t size, const htab_t ht[4],
    int ncomp, const int32_t *comp_ntab, const int32_t *comp_nblocks,
    int64_t m0, int64_t m1, packed_out_t *po)
{
    reader_t r = {data, 0, size, 0, 0, 0};
    int32_t pred[4] = {0, 0, 0, 0};

    for (int64_t m = m0; m < m1; m++) {
        for (int c = 0; c < ncomp; c++) {
            const htab_t *dc = &ht[comp_ntab[c] * 2];
            const htab_t *ac = &ht[comp_ntab[c] * 2 + 1];
            for (int b = 0; b < comp_nblocks[c]; b++) {
                int64_t g = m * comp_nblocks[c] + b;
                int8_t *lo = po->lo + po->lo_off[c] + g * 64;
                memset(lo, 0, 64);
                refill(&r);
                int s = huff_decode(&r, dc);
                if (s < 0 || r.starved) return m - m0;
                pred[c] += receive_extend(&r, s);
                po->dc[po->dc_off[c] + g] = (int16_t)pred[c];
                /* lo[0] stays 0: the device fn overwrites the DC column */
                int k = 1;
                while (k < 64) {
                    int v;
                    if (r.bitcnt < 32) refill(&r);
                    if (r.bitcnt >= 32) {
                        uint16_t e = ac->lut[(r.bitbuf >> (r.bitcnt - LUT_BITS)) & (LUT_SIZE - 1)];
                        if (e) {
                            int rs = e >> 8, len = e & 0xFF;
                            int rr = rs >> 4, ss = rs & 0xF;
                            if (ss == 0) {
                                r.bitcnt -= len;
                                if (rr == 15) { k += 16; continue; }
                                break; /* EOB */
                            }
                            k += rr;
                            if (k > 63) return m - m0;
                            r.bitcnt -= len + ss;
                            v = (int)((r.bitbuf >> r.bitcnt) & ((1u << ss) - 1));
                            if (v < (1 << (ss - 1))) v -= (1 << ss) - 1;
                            goto store;
                        }
                    }
                    {
                        int rs = huff_decode(&r, ac);
                        if (rs < 0 || r.starved) return m - m0;
                        int rr = rs >> 4, ss = rs & 0xF;
                        if (ss == 0) {
                            if (rr == 15) { k += 16; continue; }
                            break; /* EOB */
                        }
                        k += rr;
                        if (k > 63) return m - m0;
                        v = receive_extend(&r, ss);
                    }
                store:
                    lo[k] = (int8_t)v;
                    if (v != (int)(int8_t)v) {
                        if (po->exc_n < po->exc_cap) {
                            po->exc_idx[po->exc_n] =
                                (int32_t)(po->lo_off[c] + g * 64 + k);
                            po->exc_delta[po->exc_n] = v - (int)(int8_t)v;
                            po->exc_n++;
                        } else {
                            po->overflow = 1;
                        }
                    }
                    k++;
                }
            }
        }
    }
    return m1 - m0;
}

static int64_t decode_mcu_range_packed(
    const uint8_t *data, int64_t size, const htab_t ht[4],
    int ncomp, const int32_t *comp_ntab, const int32_t *comp_nblocks,
    int64_t m0, int64_t m1, int32_t restart_interval, packed_out_t *po,
    uint8_t *scratch)
{
    int64_t pos = 0, done = 0;
    int64_t m = m0;
    while (m < m1) {
        int64_t seg_end = restart_interval
            ? m - (m % restart_interval) + restart_interval : m1;
        if (seg_end > m1) seg_end = m1;
        int64_t consumed = 0;
        int64_t un = unstuff(data + pos, size - pos, scratch, &consumed);
        int64_t got = decode_segment_packed(scratch, un, ht, ncomp,
                                            comp_ntab, comp_nblocks, m,
                                            seg_end, po);
        done += got;
        if (got < seg_end - m) return done;
        m = seg_end;
        pos += consumed;
        if (m < m1) {
            while (pos + 1 < size &&
                   !(data[pos] == 0xFF && data[pos + 1] >= 0xD0 &&
                     data[pos + 1] <= 0xD7)) {
                pos++;
            }
            if (pos + 1 >= size) return done;
            pos += 2;
        }
    }
    return done;
}

typedef struct {
    const uint8_t *data;
    int64_t size;
    const htab_t *ht;
    int ncomp;
    const int32_t *comp_ntab;
    const int32_t *comp_nblocks;
    int64_t m0, m1;
    int32_t restart_interval;
    packed_out_t po;
    int64_t done;
} mt_pjob_t;

static void *mt_pworker(void *arg)
{
    mt_pjob_t *j = (mt_pjob_t *)arg;
    uint8_t *scratch = (uint8_t *)malloc((size_t)j->size + 16);
    if (!scratch) { j->done = 0; return 0; }
    j->done = decode_mcu_range_packed(j->data, j->size, j->ht, j->ncomp,
                                      j->comp_ntab, j->comp_nblocks, j->m0,
                                      j->m1, j->restart_interval, &j->po,
                                      scratch);
    free(scratch);
    return 0;
}

/* Returns MCUs decoded.  *exc_count gets the number of exceptions, or -1
 * when any range overflowed exc_cap (caller falls back to the int16
 * path).  exc_idx/exc_delta must hold nthreads * exc_cap entries; the
 * final list is compacted into the prefix. */
int64_t jpeg_scan_decode_packed_mt(
    const uint8_t *data, int64_t size,
    const uint8_t *tables,
    int ncomp, const int32_t *comp_ntab, const int32_t *comp_nblocks,
    int64_t nmcu, int32_t restart_interval,
    int8_t *lo, int16_t *dcs,
    int32_t *exc_idx, int32_t *exc_delta, int64_t exc_cap,
    int64_t *exc_count, int nthreads)
{
    htab_t ht[4];
    for (int i = 0; i < 4; i++) {
        build_htab(&ht[i], tables + i * 272, tables + i * 272 + 16, 256);
    }
    int64_t lo_off[4] = {0, 0, 0, 0}, dc_off[4] = {0, 0, 0, 0};
    for (int c = 1; c < ncomp; c++) {
        dc_off[c] = dc_off[c - 1] + nmcu * comp_nblocks[c - 1];
        lo_off[c] = dc_off[c] * 64;
    }

    if (restart_interval <= 0 || nthreads <= 1) {
        uint8_t *scratch = (uint8_t *)malloc((size_t)size + 16);
        if (!scratch) { *exc_count = -1; return 0; }
        packed_out_t po = {lo, dcs, lo_off, dc_off,
                           exc_idx, exc_delta, exc_cap, 0, 0};
        int64_t done = decode_mcu_range_packed(
            data, size, ht, ncomp, comp_ntab, comp_nblocks, 0, nmcu,
            restart_interval, &po, scratch);
        free(scratch);
        *exc_count = po.overflow ? -1 : po.exc_n;
        return done;
    }

    int64_t nseg = (nmcu + restart_interval - 1) / restart_interval;
    int64_t *seg_off = (int64_t *)malloc((size_t)nseg * sizeof(int64_t));
    if (!seg_off) { *exc_count = -1; return 0; }
    seg_off[0] = 0;
    int64_t seg = 1, pos = 0;
    while (seg < nseg && pos + 1 < size) {
        const uint8_t *ff = (const uint8_t *)memchr(data + pos, 0xFF, (size_t)(size - pos - 1));
        if (!ff) break;
        pos = ff - data;
        if (data[pos + 1] >= 0xD0 && data[pos + 1] <= 0xD7) {
            seg_off[seg++] = pos + 2;
        }
        pos += (data[pos + 1] == 0x00 || (data[pos + 1] >= 0xD0 && data[pos + 1] <= 0xD7)) ? 2 : 1;
    }
    if (seg < nseg) { /* truncated: serial fallback */
        free(seg_off);
        return jpeg_scan_decode_packed_mt(data, size, tables, ncomp,
                                          comp_ntab, comp_nblocks, nmcu,
                                          restart_interval, lo, dcs, exc_idx,
                                          exc_delta, exc_cap, exc_count, 1);
    }
    if (nthreads > 64) nthreads = 64;
    if ((int64_t)nthreads > nseg) nthreads = (int)nseg;
    pthread_t tid[64];
    mt_pjob_t jobs[64];
    int64_t per = (nseg + nthreads - 1) / nthreads;
    int nt = 0;
    for (int t = 0; t < nthreads; t++) {
        int64_t s0 = t * per, s1 = s0 + per;
        if (s0 >= nseg) break;
        if (s1 > nseg) s1 = nseg;
        int64_t m0 = s0 * restart_interval;
        int64_t m1 = s1 * restart_interval;
        if (m1 > nmcu) m1 = nmcu;
        int64_t off = seg_off[s0];
        jobs[t] = (mt_pjob_t){data + off, size - off, ht, ncomp, comp_ntab,
                              comp_nblocks, m0, m1, restart_interval,
                              {lo, dcs, lo_off, dc_off,
                               exc_idx + t * exc_cap, exc_delta + t * exc_cap,
                               exc_cap, 0, 0},
                              0};
        pthread_create(&tid[t], 0, mt_pworker, &jobs[t]);
        nt++;
    }
    int64_t total = 0, nexc = 0;
    int overflow = 0;
    for (int t = 0; t < nt; t++) {
        pthread_join(tid[t], 0);
        total += jobs[t].done;
        overflow |= jobs[t].po.overflow;
    }
    /* compact per-thread exception regions into the prefix */
    for (int t = 0; t < nt && !overflow; t++) {
        int64_t n = jobs[t].po.exc_n;
        if (n && (exc_idx + nexc) != jobs[t].po.exc_idx) {
            memmove(exc_idx + nexc, jobs[t].po.exc_idx,
                    (size_t)n * sizeof(int32_t));
            memmove(exc_delta + nexc, jobs[t].po.exc_delta,
                    (size_t)n * sizeof(int32_t));
        }
        nexc += n;
    }
    free(seg_off);
    *exc_count = overflow ? -1 : nexc;
    return total;
}

int64_t jpeg_scan_decode_mt(
    const uint8_t *data, int64_t size,
    const uint8_t *tables,
    int ncomp, const int32_t *comp_ntab, const int32_t *comp_nblocks,
    int64_t nmcu, int32_t restart_interval,
    int16_t **out, int nthreads)
{
    if (restart_interval <= 0 || nthreads <= 1) {
        return jpeg_scan_decode(data, size, tables, ncomp, comp_ntab,
                                comp_nblocks, nmcu, restart_interval, out);
    }
    htab_t ht[4];
    for (int i = 0; i < 4; i++) {
        build_htab(&ht[i], tables + i * 272, tables + i * 272 + 16, 256);
    }
    int64_t nseg = (nmcu + restart_interval - 1) / restart_interval;
    /* segment start offsets: seg 0 at 0, then after each RST marker
     * (0xFF 0xD0-0xD7 cannot appear inside stuffed entropy data) */
    int64_t *seg_off = (int64_t *)malloc((size_t)nseg * sizeof(int64_t));
    if (!seg_off) return 0;
    seg_off[0] = 0;
    int64_t seg = 1, pos = 0;
    while (seg < nseg && pos + 1 < size) {
        const uint8_t *ff = (const uint8_t *)memchr(data + pos, 0xFF, (size_t)(size - pos - 1));
        if (!ff) break;
        pos = ff - data;
        if (data[pos + 1] >= 0xD0 && data[pos + 1] <= 0xD7) {
            seg_off[seg++] = pos + 2;
        }
        pos += (data[pos + 1] == 0x00 || (data[pos + 1] >= 0xD0 && data[pos + 1] <= 0xD7)) ? 2 : 1;
    }
    if (seg < nseg) { /* truncated stream: fall back to serial */
        free(seg_off);
        return jpeg_scan_decode(data, size, tables, ncomp, comp_ntab,
                                comp_nblocks, nmcu, restart_interval, out);
    }
    if (nthreads > 64) nthreads = 64;
    if ((int64_t)nthreads > nseg) nthreads = (int)nseg;
    pthread_t tid[64];
    mt_job_t jobs[64];
    int64_t per = (nseg + nthreads - 1) / nthreads;
    int nt = 0;
    for (int t = 0; t < nthreads; t++) {
        int64_t s0 = t * per, s1 = s0 + per;
        if (s0 >= nseg) break;
        if (s1 > nseg) s1 = nseg;
        int64_t m0 = s0 * restart_interval;
        int64_t m1 = s1 * restart_interval;
        if (m1 > nmcu) m1 = nmcu;
        int64_t off = seg_off[s0];
        /* MCU indices stay absolute (they address the output); the reader
         * starts at its segment head and resynchronizes at each further
         * RST boundary within the range */
        jobs[t] = (mt_job_t){data + off, size - off, ht, ncomp, comp_ntab,
                             comp_nblocks, m0, m1, restart_interval, out, 0};
        pthread_create(&tid[t], 0, mt_worker, &jobs[t]);
        nt++;
    }
    int64_t total = 0;
    for (int t = 0; t < nt; t++) {
        pthread_join(tid[t], 0);
        total += jobs[t].done;
    }
    free(seg_off);
    return total;
}
