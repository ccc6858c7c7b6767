/* JPEG 2000 EBCOT Tier-1 block encoder (MQ arithmetic coder + the three
 * coding passes), from the ITU-T T.800 algorithm description.
 *
 * Role: the entropy half of the own J2K encoder (ops/j2k.py) — the
 * reference reaches JPEG 2000 through the proprietary Comprimato SDK
 * (/root/reference/src/video_compress/cmpto_j2k.cpp); this is a
 * from-scratch implementation of the standard itself.  Host C because
 * EBCOT is bit-serial with data-dependent state (same split as the JPEG
 * encoder's host assembly stage: device transform, host entropy tail).
 *
 * Conformance is pinned by tests decoding our streams with OpenJPEG
 * (via Pillow) — byte-level interop with an independent decoder.
 */

#include <stdint.h>
#include <string.h>

/* ---------------- MQ coder (T.800 Annex C) ---------------- */

static const uint16_t QE[47] = {
    0x5601,0x3401,0x1801,0x0AC1,0x0521,0x0221,0x5601,0x5401,0x4801,0x3801,
    0x3001,0x2401,0x1C01,0x1601,0x5601,0x5401,0x5101,0x4801,0x3801,0x3401,
    0x3001,0x2801,0x2401,0x2201,0x1C01,0x1801,0x1601,0x1401,0x1201,0x1101,
    0x0AC1,0x09C1,0x08A1,0x0521,0x0441,0x02A1,0x0221,0x0141,0x0111,0x0085,
    0x0049,0x0025,0x0015,0x0009,0x0005,0x0001,0x5601};
static const uint8_t NMPS[47] = {
    1,2,3,4,5,38,7,8,9,10,11,12,13,29,15,16,17,18,19,20,21,22,23,24,25,26,
    27,28,29,30,31,32,33,34,35,36,37,38,39,40,41,42,43,44,45,45,46};
static const uint8_t NLPS[47] = {
    1,6,9,12,29,33,6,14,14,14,17,18,20,21,14,14,15,16,17,18,19,19,20,21,22,
    23,24,25,26,27,28,29,30,31,32,33,34,35,36,37,38,39,40,41,42,43,46};
static const uint8_t SWITCH[47] = {
    1,0,0,0,0,0,1,0,0,0,0,0,0,0,1,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,
    0,0,0,0,0,0,0,0,0,0,0,0};

#define NCTX 19
#define CTX_UNI 18
#define CTX_RL 17

typedef struct {
    uint32_t c, a;
    int ct;
    long bp;        /* index of last written byte; buf[0] is a scratch 0 */
    uint8_t *buf;
    long cap;
    int ovf;
    uint8_t idx[NCTX], mps[NCTX];
} mq_t;

static void mq_init(mq_t *q, uint8_t *buf, long cap) {
    q->a = 0x8000; q->c = 0; q->ct = 12; q->ovf = 0;
    q->buf = buf; q->cap = cap; q->bp = 0; buf[0] = 0;
    memset(q->idx, 0, sizeof q->idx);
    memset(q->mps, 0, sizeof q->mps);
    q->idx[0] = 4;          /* all-zero-neighbourhood ZC context */
    q->idx[CTX_RL] = 3;
    q->idx[CTX_UNI] = 46;
}

static void mq_byteout(mq_t *q) {
    if (q->bp + 1 >= q->cap) { q->ct = 8; q->ovf = 1; return; }
    if (q->buf[q->bp] == 0xff) {
        q->bp++; q->buf[q->bp] = (uint8_t)(q->c >> 20); q->c &= 0xfffff; q->ct = 7;
    } else if ((q->c & 0x8000000u) == 0) {
        q->bp++; q->buf[q->bp] = (uint8_t)(q->c >> 19); q->c &= 0x7ffff; q->ct = 8;
    } else {
        q->buf[q->bp]++;
        if (q->buf[q->bp] == 0xff) {
            q->c &= 0x7ffffff;
            q->bp++; q->buf[q->bp] = (uint8_t)(q->c >> 20); q->c &= 0xfffff; q->ct = 7;
        } else {
            q->bp++; q->buf[q->bp] = (uint8_t)(q->c >> 19); q->c &= 0x7ffff; q->ct = 8;
        }
    }
}

static void mq_renorm(mq_t *q) {
    do {
        q->a <<= 1; q->c <<= 1;
        if (--q->ct == 0) mq_byteout(q);
    } while (q->a < 0x8000);
}

static void mq_encode(mq_t *q, int ctx, int d) {
    uint32_t qe = QE[q->idx[ctx]];
    if (d == q->mps[ctx]) {
        q->a -= qe;
        if ((q->a & 0x8000) == 0) {
            if (q->a < qe) q->a = qe; else q->c += qe;
            q->idx[ctx] = NMPS[q->idx[ctx]];
            mq_renorm(q);
        } else {
            q->c += qe;
        }
    } else {
        q->a -= qe;
        if (q->a < qe) q->c += qe; else q->a = qe;
        if (SWITCH[q->idx[ctx]]) q->mps[ctx] ^= 1;
        q->idx[ctx] = NLPS[q->idx[ctx]];
        mq_renorm(q);
    }
}

/* FLUSH (T.800 C.2.9): returns number of codestream bytes (from buf[1]) */
static long mq_flush(mq_t *q) {
    uint32_t tempc = q->c + q->a;
    q->c |= 0xffff;
    if (q->c >= tempc) q->c -= 0x8000;
    q->c <<= q->ct; mq_byteout(q);
    q->c <<= q->ct; mq_byteout(q);
    if (q->buf[q->bp] != 0xff) q->bp++;
    return q->bp - 1;       /* bytes buf[1..bp-1]; trailing 0xff dropped */
}

/* ---------------- Tier-1 coding passes (T.800 Annex D) ---------------- */

/* zero-coding context from neighbour significance counts.
 * orient: 0=LL, 1=HL (high-pass in x), 2=LH (high-pass in y), 3=HH.
 * HL swaps the roles of H and V (Table D.1). */
static int zc_ctx(int orient, int h, int v, int d) {
    if (orient == 1) { int t = h; h = v; v = t; }
    if (orient == 3) {
        if (d >= 3) return 8;
        if (d == 2) return (h + v >= 1) ? 7 : 6;
        if (d == 1) { int hv = h + v; return hv >= 2 ? 5 : (hv == 1 ? 4 : 3); }
        { int hv = h + v; return hv >= 2 ? 2 : (hv == 1 ? 1 : 0); }
    }
    if (h == 2) return 8;
    if (h == 1) return v >= 1 ? 7 : (d >= 1 ? 6 : 5);
    if (v == 2) return 4;
    if (v == 1) return 3;
    return d >= 2 ? 2 : (d == 1 ? 1 : 0);
}

/* sign-coding context + XOR bit (Tables D.2/D.3).  hc/vc in {-1,0,1}. */
static int sc_ctx(int hc, int vc, int *xorbit) {
    if (hc == 1)  { *xorbit = 0; return vc == 1 ? 13 : (vc == 0 ? 12 : 11); }
    if (hc == 0)  { *xorbit = vc == -1; return vc == 0 ? 9 : 10; }
    *xorbit = 1;  return vc == 1 ? 11 : (vc == 0 ? 12 : 13);
}

/* per-sample state, padded grid (w+2)x(h+2) */
#define F_SIG 1
#define F_VIS 2
#define F_REF 4
#define F_NEG 8

typedef struct {
    const int32_t *coef;
    uint8_t *st;            /* padded flags */
    int w, h, sw;           /* sw = w+2 padded stride */
    int orient;
    mq_t mq;
} t1_t;

static inline int sig(t1_t *t, int x, int y) {   /* x,y in unpadded coords */
    return t->st[(y + 1) * t->sw + (x + 1)] & F_SIG;
}
static inline uint8_t *stp(t1_t *t, int x, int y) {
    return &t->st[(y + 1) * t->sw + (x + 1)];
}

static void neigh_counts(t1_t *t, int x, int y, int *h, int *v, int *d) {
    uint8_t *p = stp(t, x, y);
    int s = t->sw;
    *h = !!(p[-1] & F_SIG) + !!(p[1] & F_SIG);
    *v = !!(p[-s] & F_SIG) + !!(p[s] & F_SIG);
    *d = !!(p[-s - 1] & F_SIG) + !!(p[-s + 1] & F_SIG) +
         !!(p[s - 1] & F_SIG) + !!(p[s + 1] & F_SIG);
}

static void code_sign(t1_t *t, int x, int y, int negative) {
    uint8_t *p = stp(t, x, y);
    int s = t->sw;
    int hc = 0, vc = 0, xorbit, ctx;
    int l = (p[-1] & F_SIG) ? ((p[-1] & F_NEG) ? -1 : 1) : 0;
    int r = (p[1] & F_SIG) ? ((p[1] & F_NEG) ? -1 : 1) : 0;
    int u = (p[-s] & F_SIG) ? ((p[-s] & F_NEG) ? -1 : 1) : 0;
    int dn = (p[s] & F_SIG) ? ((p[s] & F_NEG) ? -1 : 1) : 0;
    hc = l + r; if (hc > 1) hc = 1; if (hc < -1) hc = -1;
    vc = u + dn; if (vc > 1) vc = 1; if (vc < -1) vc = -1;
    ctx = sc_ctx(hc, vc, &xorbit);
    mq_encode(&t->mq, ctx, negative ^ xorbit);
}

static void spp(t1_t *t, int plane) {
    int w = t->w, h = t->h;
    for (int y0 = 0; y0 < h; y0 += 4)
        for (int x = 0; x < w; x++)
            for (int y = y0; y < y0 + 4 && y < h; y++) {
                uint8_t *p = stp(t, x, y);
                if (*p & F_SIG) continue;
                int hn, vn, dn;
                neigh_counts(t, x, y, &hn, &vn, &dn);
                if (hn + vn + dn == 0) continue;
                int32_t c = t->coef[y * w + x];
                int bit = (int)(((uint32_t)(c < 0 ? -c : c) >> plane) & 1);
                mq_encode(&t->mq, zc_ctx(t->orient, hn, vn, dn), bit);
                if (bit) {
                    code_sign(t, x, y, c < 0);
                    *p |= F_SIG | (c < 0 ? F_NEG : 0);
                }
                *p |= F_VIS;
            }
}

static void mrp(t1_t *t, int plane) {
    int w = t->w, h = t->h;
    for (int y0 = 0; y0 < h; y0 += 4)
        for (int x = 0; x < w; x++)
            for (int y = y0; y < y0 + 4 && y < h; y++) {
                uint8_t *p = stp(t, x, y);
                if (!(*p & F_SIG) || (*p & F_VIS)) continue;
                int ctx;
                if (*p & F_REF) ctx = 16;
                else {
                    int hn, vn, dn;
                    neigh_counts(t, x, y, &hn, &vn, &dn);
                    ctx = (hn + vn + dn > 0) ? 15 : 14;
                }
                int32_t c = t->coef[y * w + x];
                int bit = (int)(((uint32_t)(c < 0 ? -c : c) >> plane) & 1);
                mq_encode(&t->mq, ctx, bit);
                *p |= F_REF;
            }
}

static void cup(t1_t *t, int plane) {
    int w = t->w, h = t->h;
    for (int y0 = 0; y0 < h; y0 += 4)
        for (int x = 0; x < w; x++) {
            int y = y0;
            /* run-length mode: full stripe column, all 4 insignificant,
             * unvisited, and with all-zero neighbourhoods */
            if (y0 + 3 < h) {
                int rl = 1;
                for (int k = 0; k < 4 && rl; k++) {
                    uint8_t *p = stp(t, x, y0 + k);
                    if (*p & (F_SIG | F_VIS)) { rl = 0; break; }
                    int hn, vn, dn;
                    neigh_counts(t, x, y0 + k, &hn, &vn, &dn);
                    if (hn + vn + dn) rl = 0;
                }
                if (rl) {
                    int first = -1;
                    for (int k = 0; k < 4; k++) {
                        int32_t c = t->coef[(y0 + k) * w + x];
                        if (((uint32_t)(c < 0 ? -c : c) >> plane) & 1) { first = k; break; }
                    }
                    if (first < 0) {
                        mq_encode(&t->mq, CTX_RL, 0);
                        continue;       /* whole column stays zero */
                    }
                    mq_encode(&t->mq, CTX_RL, 1);
                    mq_encode(&t->mq, CTX_UNI, (first >> 1) & 1);
                    mq_encode(&t->mq, CTX_UNI, first & 1);
                    int32_t c = t->coef[(y0 + first) * w + x];
                    code_sign(t, x, y0 + first, c < 0);
                    *stp(t, x, y0 + first) |= F_SIG | (c < 0 ? F_NEG : 0);
                    y = y0 + first + 1; /* rest of column coded normally */
                }
            }
            for (; y < y0 + 4 && y < h; y++) {
                uint8_t *p = stp(t, x, y);
                if (*p & (F_SIG | F_VIS)) continue;
                int hn, vn, dn;
                neigh_counts(t, x, y, &hn, &vn, &dn);
                int32_t c = t->coef[y * w + x];
                int bit = (int)(((uint32_t)(c < 0 ? -c : c) >> plane) & 1);
                mq_encode(&t->mq, zc_ctx(t->orient, hn, vn, dn), bit);
                if (bit) {
                    code_sign(t, x, y, c < 0);
                    *p |= F_SIG | (c < 0 ? F_NEG : 0);
                }
            }
        }
    /* clear per-plane visited flags */
    for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++)
            *stp(t, x, y) &= (uint8_t)~F_VIS;
}

/* Encode one codeblock.  coef: w*h row-major signed coefficients.
 * drop: number of least-significant bitplanes NOT to code (rate control
 * by pass truncation).  info[0]=numbps (MSB position count of the block),
 * info[1]=npasses.  Returns codestream byte length, or -1 on overflow.
 * Scratch `state` must hold (w+2)*(h+2) bytes, zeroed by this function. */
long j2k_t1_encode_cblk(const int32_t *coef, int w, int h, int orient,
                        int drop, uint8_t *out, long cap,
                        uint8_t *state, int32_t *info) {
    uint32_t maxmag = 0;
    for (long i = 0; i < (long)w * h; i++) {
        int32_t c = coef[i];
        uint32_t m = (uint32_t)(c < 0 ? -c : c);
        if (m > maxmag) maxmag = m;
    }
    int numbps = 0;
    while (maxmag >> numbps) numbps++;
    info[0] = numbps;
    int planes = numbps - drop;
    if (planes <= 0) { info[0] = numbps; info[1] = 0; return 0; }
    info[1] = 3 * planes - 2;

    t1_t t;
    t.coef = coef; t.w = w; t.h = h; t.sw = w + 2; t.orient = orient;
    t.st = state;
    memset(state, 0, (size_t)(w + 2) * (h + 2));
    mq_init(&t.mq, out, cap);

    cup(&t, numbps - 1);
    for (int p = numbps - 2; p >= drop; p--) {
        spp(&t, p);
        mrp(&t, p);
        cup(&t, p);
    }
    long n = mq_flush(&t.mq);
    if (t.mq.ovf || out[0] != 0) return -1;
    memmove(out, out + 1, (size_t)n);
    return n;
}

/* ---------------- MQ decoder + Tier-1 decode (T.800 C.3 / D) ---------------- */

typedef struct {
    uint32_t c, a;
    int ct;
    const uint8_t *buf;
    long bp, len;
    uint8_t idx[NCTX], mps[NCTX];
} mqd_t;

static void mqd_bytein(mqd_t *q) {
    if (q->bp < q->len && q->buf[q->bp] == 0xff) {
        if (q->bp + 1 >= q->len || q->buf[q->bp + 1] > 0x8f) {
            q->c += 0xff00; q->ct = 8;          /* marker / end: feed 1s */
        } else {
            q->bp++; q->c += (uint32_t)q->buf[q->bp] << 9; q->ct = 7;
        }
    } else {
        q->bp++;
        q->c += (q->bp < q->len ? (uint32_t)q->buf[q->bp] : 0xff) << 8;
        q->ct = 8;
    }
}

static void mqd_init(mqd_t *q, const uint8_t *buf, long len) {
    q->buf = buf; q->len = len; q->bp = 0;
    q->c = (uint32_t)(len > 0 ? buf[0] : 0xff) << 16;
    mqd_bytein(q);
    q->c <<= 7; q->ct -= 7;
    q->a = 0x8000;
    memset(q->idx, 0, sizeof q->idx);
    memset(q->mps, 0, sizeof q->mps);
    q->idx[0] = 4; q->idx[CTX_RL] = 3; q->idx[CTX_UNI] = 46;
}

static int mqd_decode(mqd_t *q, int ctx) {
    uint32_t qe = QE[q->idx[ctx]];
    int d;
    q->a -= qe;
    if ((q->c >> 16) < qe) {
        /* LPS exchange path */
        if (q->a < qe) { d = q->mps[ctx]; q->idx[ctx] = NMPS[q->idx[ctx]]; }
        else {
            d = 1 - q->mps[ctx];
            if (SWITCH[q->idx[ctx]]) q->mps[ctx] ^= 1;
            q->idx[ctx] = NLPS[q->idx[ctx]];
        }
        q->a = qe;
        do {
            if (q->ct == 0) mqd_bytein(q);
            q->a <<= 1; q->c <<= 1; q->ct--;
        } while ((q->a & 0x8000) == 0);
    } else {
        q->c -= qe << 16;
        if ((q->a & 0x8000) == 0) {
            if (q->a < qe) {
                d = 1 - q->mps[ctx];
                if (SWITCH[q->idx[ctx]]) q->mps[ctx] ^= 1;
                q->idx[ctx] = NLPS[q->idx[ctx]];
            } else { d = q->mps[ctx]; q->idx[ctx] = NMPS[q->idx[ctx]]; }
            do {
                if (q->ct == 0) mqd_bytein(q);
                q->a <<= 1; q->c <<= 1; q->ct--;
            } while ((q->a & 0x8000) == 0);
        } else d = q->mps[ctx];
    }
    return d;
}

typedef struct {
    int32_t *mag;           /* decoded magnitudes (w*h) */
    uint8_t *st;
    int w, h, sw, orient;
    mqd_t mq;
} t1d_t;

static inline uint8_t *dstp(t1d_t *t, int x, int y) {
    return &t->st[(y + 1) * t->sw + (x + 1)];
}

static void dneigh(t1d_t *t, int x, int y, int *h, int *v, int *d) {
    uint8_t *p = dstp(t, x, y);
    int s = t->sw;
    *h = !!(p[-1] & F_SIG) + !!(p[1] & F_SIG);
    *v = !!(p[-s] & F_SIG) + !!(p[s] & F_SIG);
    *d = !!(p[-s - 1] & F_SIG) + !!(p[-s + 1] & F_SIG) +
         !!(p[s - 1] & F_SIG) + !!(p[s + 1] & F_SIG);
}

static int dec_sign(t1d_t *t, int x, int y) {
    uint8_t *p = dstp(t, x, y);
    int s = t->sw;
    int l = (p[-1] & F_SIG) ? ((p[-1] & F_NEG) ? -1 : 1) : 0;
    int r = (p[1] & F_SIG) ? ((p[1] & F_NEG) ? -1 : 1) : 0;
    int u = (p[-s] & F_SIG) ? ((p[-s] & F_NEG) ? -1 : 1) : 0;
    int dn = (p[s] & F_SIG) ? ((p[s] & F_NEG) ? -1 : 1) : 0;
    int hc = l + r, vc = u + dn, xorbit, ctx;
    if (hc > 1) hc = 1; if (hc < -1) hc = -1;
    if (vc > 1) vc = 1; if (vc < -1) vc = -1;
    ctx = sc_ctx(hc, vc, &xorbit);
    return mqd_decode(&t->mq, ctx) ^ xorbit;   /* 1 = negative */
}

static void d_spp(t1d_t *t, int plane) {
    int w = t->w, h = t->h;
    for (int y0 = 0; y0 < h; y0 += 4)
        for (int x = 0; x < w; x++)
            for (int y = y0; y < y0 + 4 && y < h; y++) {
                uint8_t *p = dstp(t, x, y);
                if (*p & F_SIG) continue;
                int hn, vn, dn;
                dneigh(t, x, y, &hn, &vn, &dn);
                if (hn + vn + dn == 0) continue;
                if (mqd_decode(&t->mq, zc_ctx(t->orient, hn, vn, dn))) {
                    int neg = dec_sign(t, x, y);
                    t->mag[y * w + x] |= 1 << plane;
                    *p |= F_SIG | (neg ? F_NEG : 0);
                }
                *p |= F_VIS;
            }
}

static void d_mrp(t1d_t *t, int plane) {
    int w = t->w, h = t->h;
    for (int y0 = 0; y0 < h; y0 += 4)
        for (int x = 0; x < w; x++)
            for (int y = y0; y < y0 + 4 && y < h; y++) {
                uint8_t *p = dstp(t, x, y);
                if (!(*p & F_SIG) || (*p & F_VIS)) continue;
                int ctx;
                if (*p & F_REF) ctx = 16;
                else {
                    int hn, vn, dn;
                    dneigh(t, x, y, &hn, &vn, &dn);
                    ctx = (hn + vn + dn > 0) ? 15 : 14;
                }
                if (mqd_decode(&t->mq, ctx)) t->mag[y * w + x] |= 1 << plane;
                *p |= F_REF;
            }
}

static void d_cup(t1d_t *t, int plane) {
    int w = t->w, h = t->h;
    for (int y0 = 0; y0 < h; y0 += 4)
        for (int x = 0; x < w; x++) {
            int y = y0;
            if (y0 + 3 < h) {
                int rl = 1;
                for (int k = 0; k < 4 && rl; k++) {
                    uint8_t *p = dstp(t, x, y0 + k);
                    if (*p & (F_SIG | F_VIS)) { rl = 0; break; }
                    int hn, vn, dn;
                    dneigh(t, x, y0 + k, &hn, &vn, &dn);
                    if (hn + vn + dn) rl = 0;
                }
                if (rl) {
                    if (!mqd_decode(&t->mq, CTX_RL)) continue;
                    int first = (mqd_decode(&t->mq, CTX_UNI) << 1)
                              | mqd_decode(&t->mq, CTX_UNI);
                    int neg = dec_sign(t, x, y0 + first);
                    t->mag[(y0 + first) * w + x] |= 1 << plane;
                    *dstp(t, x, y0 + first) |= F_SIG | (neg ? F_NEG : 0);
                    y = y0 + first + 1;
                }
            }
            for (; y < y0 + 4 && y < h; y++) {
                uint8_t *p = dstp(t, x, y);
                if (*p & (F_SIG | F_VIS)) continue;
                int hn, vn, dn;
                dneigh(t, x, y, &hn, &vn, &dn);
                if (mqd_decode(&t->mq, zc_ctx(t->orient, hn, vn, dn))) {
                    int neg = dec_sign(t, x, y);
                    t->mag[y * w + x] |= 1 << plane;
                    *p |= F_SIG | (neg ? F_NEG : 0);
                }
            }
        }
    for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++)
            *dstp(t, x, y) &= (uint8_t)~F_VIS;
}

/* Decode one codeblock codeword segment.  numbps = Mb - zbp (from packet
 * header), npasses as signalled.  Writes signed coefficients to coef
 * (magnitudes shifted back up for truncated planes with half-bit
 * reconstruction).  Scratch state: (w+2)*(h+2) bytes. */
long j2k_t1_decode_cblk(const uint8_t *data, long len, int w, int h,
                        int orient, int numbps, int npasses,
                        int32_t *coef, uint8_t *state) {
    t1d_t t;
    t.w = w; t.h = h; t.sw = w + 2; t.orient = orient;
    t.st = state;
    memset(state, 0, (size_t)(w + 2) * (h + 2));
    memset(coef, 0, sizeof(int32_t) * (size_t)w * h);
    t.mag = coef;
    mqd_init(&t.mq, data, len);

    int planes_total = numbps;
    int planes = (npasses + 2) / 3;
    if (planes > planes_total) planes = planes_total;
    int pass = 0;
    int plane = planes_total - 1;
    if (plane >= 0 && pass < npasses) { d_cup(&t, plane); pass++; plane--; }
    while (plane >= 0 && pass < npasses) {
        if (pass < npasses) { d_spp(&t, plane); pass++; }
        if (pass < npasses) { d_mrp(&t, plane); pass++; }
        if (pass < npasses) { d_cup(&t, plane); pass++; }
        plane--;
    }
    int low = plane + 1;    /* lowest decoded plane */
    if (low > 0) {
        int half = 1 << (low - 1);
        for (long i = 0; i < (long)w * h; i++)
            if (coef[i]) coef[i] += half;    /* mid-point reconstruction */
    }
    for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++)
            if (state[(y + 1) * (w + 2) + (x + 1)] & F_NEG)
                coef[y * w + x] = -coef[y * w + x];
    return 0;
}
