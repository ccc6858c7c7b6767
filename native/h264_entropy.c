/* h264_entropy.c — real-time own-H.264 decoder: C entropy stage (CAVLC +
 * CABAC) plus reconstruction, a port of the framework's own Python decoder
 * (ultragrid_tpu/ops/h264_dec.py, h264_cabac.py, h264_deblock.py) into one
 * host TU so live sessions can decode H.264 without FFmpeg in real time.
 *
 * Mirrors the JPEG receive split (native/jpeg_scan_decode.c): the
 * sequential bit-level work runs here at C speed; the scalar Python
 * decoder stays as the readable reference implementation and every stream
 * this TU accepts must decode SAMPLE-EXACTLY equal to it (gated in
 * tests/test_h264_fast.py over the same conformance matrix that pins the
 * Python decoder to libavcodec).
 *
 * Envelope (return -1 = UnsupportedStream outside it): progressive
 * baseline/main/high 4:2:0 8-bit streams with I/P slices, CAVLC and CABAC,
 * multi-reference P, all partition sizes down to 4x4, quarter-pel motion,
 * the High-profile 8x8 transform (Intra_8x8 + inter 8x8 residuals, both
 * entropy coders), explicit weighted P prediction + ref-list
 * modification (incl. x264 weightp=2 duplicate refs), B slices (spatial
 * direct with 8x8 inference, every partition mode, implicit/explicit
 * weighted bipred, b-pyramid via MMCO op 1, POC type 0 display
 * reordering bounded by the VUI), in-loop deblocking; no temporal
 * direct, no interlace/MBAFF, no slice groups, no scaling lists.
 *
 * Reference role: the decode half of
 * /root/reference/src/video_decompress/libavcodec.c:1-1876 (the reference
 * reaches H.264 decode through FFmpeg; this is the from-scratch native
 * equivalent).
 *
 * Spec-constant tables (CAVLC code tables, CABAC context init, rangeTabLPS)
 * are NOT transcribed here: the Python side serializes the already-
 * validated tables from ops/h264.py / ops/h264_cabac_tables.py and passes
 * them to h264fast_create(), so there is exactly one copy of every ISO
 * constant in the repo.
 */

#include <setjmp.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#define PAD 32          /* MC edge padding, = ops/h264_dec.py MC_PAD */
#define MAX_REFS 16
#define MAX_L0 48       /* bound on num_ref_idx_l0_active (list may hold
                           duplicates via ref-list modification) */

/* ------------------------------------------------------------------ */
/* error handling: UnsupportedStream == longjmp out of the decode call  */
/* ------------------------------------------------------------------ */

typedef struct H264Dec H264Dec;

static void dec_fail(H264Dec *d, const char *msg) __attribute__((noreturn));

/* ------------------------------------------------------------------ */
/* bit reader (MSB first)                                               */
/* ------------------------------------------------------------------ */

typedef struct {
    const uint8_t *data;
    long size;     /* bytes */
    long pos;      /* bit position */
    H264Dec *d;    /* for error escape */
} BitReader;

static inline int br_bit(BitReader *r)
{
    long p = r->pos++;
    long bi = p >> 3;
    if (bi >= r->size)
        return 0; /* matches the Python CABAC reader; ue/se guard length */
    return (r->data[bi] >> (7 - (p & 7))) & 1;
}

static inline uint32_t br_u(BitReader *r, int n)
{
    uint32_t v = 0;
    for (int i = 0; i < n; i++) {
        long p = r->pos++;
        long bi = p >> 3;
        int b = (bi < r->size) ? ((r->data[bi] >> (7 - (p & 7))) & 1) : 0;
        v = (v << 1) | (uint32_t)b;
    }
    return v;
}

static uint32_t br_ue(BitReader *r)
{
    int zeros = 0;
    while (br_bit(r) == 0) {
        if (++zeros > 32)
            dec_fail(r->d, "bad exp-golomb");
    }
    uint32_t v = (1u << zeros) - 1;
    if (zeros)
        v += br_u(r, zeros);
    return v;
}

static int32_t br_se(BitReader *r)
{
    uint32_t k = br_ue(r);
    return (k & 1) ? (int32_t)((k + 1) >> 1) : -(int32_t)(k >> 1);
}

static void br_align(BitReader *r) { r->pos = (r->pos + 7) & ~7L; }

/* rbsp stop-bit position (bit index of the stop one-bit) */
static long rbsp_stop_pos(const uint8_t *p, long n)
{
    long last = n - 1;
    while (last >= 0 && p[last] == 0)
        last--;
    if (last < 0)
        return 0;
    int b = p[last];
    int lsb = 0;
    while (!((b >> lsb) & 1))
        lsb++;
    return last * 8 + (7 - lsb);
}

static int br_more_rbsp(BitReader *r)
{
    return r->pos < rbsp_stop_pos(r->data, r->size);
}

/* ------------------------------------------------------------------ */
/* VLC decode tables (built from blobs serialized by the Python side)   */
/* ------------------------------------------------------------------ */

/* table ids in the blob:
 *  0..3   coeff_token for nC<2, nC<4, nC<8, chroma-DC
 *  4..18  total_zeros, total_coeff = 1..15
 *  19..21 chroma-DC total_zeros, total_coeff = 1..3
 *  22..28 run_before, zeros_left = 1..7
 */
#define N_VLC_TABLES 29

typedef struct {
    int max_len;
    int32_t *lut;      /* 1<<max_len entries: (a<<16)|(b<<8)|len, or -1 */
} VlcTable;

static int build_vlc_tables(VlcTable *tabs, const uint8_t *blob, long len)
{
    long off = 0;
    for (int t = 0; t < N_VLC_TABLES; t++) {
        if (off + 4 > len)
            return -1;
        int id = blob[off] | (blob[off + 1] << 8);
        int n = blob[off + 2] | (blob[off + 3] << 8);
        off += 4;
        if (id != t)
            return -1;
        int max_len = 0;
        for (int i = 0; i < n; i++) {
            int l = blob[off + 5 * i];
            if (l > max_len)
                max_len = l;
        }
        VlcTable *tab = &tabs[t];
        tab->max_len = max_len;
        long sz = 1L << max_len;
        tab->lut = malloc(sz * sizeof(int32_t));
        if (!tab->lut)
            return -1;
        for (long i = 0; i < sz; i++)
            tab->lut[i] = -1;
        for (int i = 0; i < n; i++) {
            int l = blob[off + 5 * i];
            int code = blob[off + 5 * i + 1] | (blob[off + 5 * i + 2] << 8);
            int a = (int8_t)blob[off + 5 * i + 3];
            int b = (int8_t)blob[off + 5 * i + 4];
            /* fill all LUT slots whose top-l bits equal the code */
            long lo = (long)code << (max_len - l);
            long hi = lo + (1L << (max_len - l));
            int32_t v = ((a & 0xFF) << 16) | ((b & 0xFF) << 8) | l;
            for (long s = lo; s < hi; s++)
                tab->lut[s] = v;
        }
        off += 5L * n;
    }
    return 0;
}

/* read one VLC symbol: peek max_len bits, LUT, advance by len */
static void vlc_read(BitReader *r, const VlcTable *tab, int *a, int *b)
{
    int ml = tab->max_len;
    uint32_t peek = 0;
    long p = r->pos;
    for (int i = 0; i < ml; i++) {
        long bi = (p + i) >> 3;
        int bit = (bi < r->size) ? ((r->data[bi] >> (7 - ((p + i) & 7))) & 1) : 0;
        peek = (peek << 1) | (uint32_t)bit;
    }
    int32_t v = tab->lut[peek];
    if (v < 0)
        dec_fail(r->d, "vlc decode failed");
    r->pos = p + (v & 0xFF);
    *a = (int8_t)((v >> 16) & 0xFF);
    *b = (int8_t)((v >> 8) & 0xFF);
}

/* ------------------------------------------------------------------ */
/* sequence / picture parameter sets (subset, = Python _parse_sps/_pps) */
/* ------------------------------------------------------------------ */

typedef struct {
    int valid;
    int mb_w, mb_h, log2_mfn, max_refs, poc_type, log2_poc, width, height;
    int direct_8x8;   /* direct_8x8_inference_flag */
    int reorder;      /* VUI max_num_reorder_frames, -1 = absent */
} SPS;

typedef struct {
    int valid;
    int init_qp, chroma_off, dbf_ctrl, l0_default, cabac, weighted_pred;
    int l1_default, weighted_bipred;
    int transform_8x8;
} PPS;

/* ------------------------------------------------------------------ */
/* reference picture (padded planes + lazy half-pel planes)             */
/* ------------------------------------------------------------------ */

typedef struct {
    uint8_t *y, *cb, *cr;          /* padded planes */
    uint8_t *hb, *hh, *hj;         /* luma half-pel planes (lazy) */
    int have_half;
    /* colocated motion for B spatial direct (8.4.1.2.2): per 4x4,
       slot-A = L0 if present else L1 */
    int16_t *mvcol;                /* [g4][2] */
    int8_t *refcol;                /* [g4] refidx, -1 intra */
} RefPic;

/* ------------------------------------------------------------------ */
/* decoder state                                                        */
/* ------------------------------------------------------------------ */

struct H264Dec {
    jmp_buf jb;
    char err[128];

    VlcTable vlc[N_VLC_TABLES];
    /* CABAC spec tables (from Python, already binary-validated) */
    int8_t ctx_init[4][1024][2];
    int32_t range_tab[64][4];
    int32_t trans_lps[64];
    /* Table 9-43 8x8 significance/last ctxIdxInc maps (trained constants,
       serialized from ops/h264_8x8.py — single source of truth) */
    int32_t sig8[63];
    int32_t last8[63];

    SPS sps;
    PPS pps;

    /* geometry-dependent buffers (allocated on SPS activation) */
    int mbw, mbh;
    long pw, ph;        /* padded luma plane dims */
    long cpw, cph;      /* padded chroma plane dims */
    uint8_t *cur_y, *cur_cb, *cur_cr;   /* current picture, padded */
    int32_t *tmp_b1;    /* half-pel intermediate, pw*ph int32 */

    /* DPB, most recent first; fn = frame_num (PicNum math for ref-list
       modification), pid = unique picture id (deblock bS compares
       reference PICTURES, not indices — a modified list may alias one
       picture under two indices) */
    RefPic dpb[MAX_REFS];
    int dpb_fn[MAX_REFS];
    int dpb_pid[MAX_REFS];
    long dpb_poc[MAX_REFS];
    int pic_seq;
    int cur_frame_num;
    int cur_poc_lsb;
    long cur_pic_poc;
    int dpb_n;
    /* POC type 0 tracking (8.2.1.1) + global display key */
    long poc_msb, poc_lsb_prev, poc_base, gop_max_poc;
    int mmco_drop[16];   /* pids to unmark at storage time (8.2.5.4) */
    int mmco_n;
    /* display reorder queue: cropped owned frames, key = poc_base + poc */
    struct OutSlot {
        long key, seq;
        uint8_t *y, *cb, *cr;
        int used;
    } outq[MAX_REFS + 2];
    long out_seq;
    uint8_t *out_y, *out_cb, *out_cr;  /* popped frame served to the API */
    int out_ready;
    RefPic spare[MAX_REFS + 1]; /* buffer pool */
    int spare_n;

    /* per-picture deblock context (= DeblockCtx) */
    uint8_t *db_intra, *db_ipcm, *db_decoded, *db_t8x8;
    int32_t *db_qp, *db_slice, *db_idc, *db_offa, *db_offb;
    int32_t *nnz_l;               /* 4x4 luma nnz grid, frame-wide */
    int32_t *mv4;                 /* [mbh*4][mbw*4][2] L0 mv (pred+deblock) */
    int32_t *ref4;                /* [mbh*4][mbw*4] L0 ref INDEX (MV pred) */
    int32_t *pid4;                /* [mbh*4][mbw*4] L0 ref picture id */
    int32_t *mv4b;                /* L1 twins (B slices) */
    int32_t *ref4b;
    int32_t *pid4b;

    /* per-slice grids */
    uint8_t *dec4, *rd4, *rd4b, *dir4, *done4, *avail4;
    int32_t *i4mode;
    int32_t *nnz_c[2];            /* chroma nnz, per slice semantics */

    /* CABAC per-picture neighbour grids (= CabacPictureCtx) */
    uint8_t *c_skip, *c_i16, *c_intra, *c_pcm;
    int32_t *c_chroma_mode, *c_cbp_l, *c_cbp_c, *c_cbf_ldc;
    int32_t *c_cbf_l4, *c_cbf_cdc, *c_cbf_c4, *c_absmvd4, *c_absmvd4b;
    uint8_t *c_bdirect;   /* per-MB: B_Skip / B_Direct_16x16 */
    int cabac_pic_live;

    /* scratch for NAL unescape */
    uint8_t *rbsp_buf;
    long rbsp_cap;

    int out_w, out_h;
    int have_pic;
};

static void dec_fail(H264Dec *d, const char *msg)
{
    snprintf(d->err, sizeof(d->err), "%s", msg);
    longjmp(d->jb, 1);
}

static long poc_preview(const H264Dec *d);
struct Slice;
static void parse_inter_header(H264Dec *d, struct Slice *s,
                               BitReader *r, int ref_idc);

static void *xalloc(H264Dec *d, long n)
{
    void *p = calloc(1, (size_t)n);
    if (!p)
        dec_fail(d, "out of memory");
    return p;
}

/* ------------------------------------------------------------------ */
/* spec constant tables that are pure arithmetic (not trained data)     */
/* ------------------------------------------------------------------ */

/* dequant V (spec 8.5.9), rows qp%6, cols position class */
static const int V_TAB[6][3] = {
    {10, 16, 13}, {11, 18, 14}, {13, 20, 16},
    {14, 23, 18}, {16, 25, 20}, {18, 29, 23},
};
/* 4x4 position class (ops/h264.py _POSCLASS) */
static const int POSCLASS[4][4] = {
    {0, 2, 0, 2}, {2, 1, 2, 1}, {0, 2, 0, 2}, {2, 1, 2, 1},
};
/* zig-zag (dezigzag: out[ZZ[i]] = zz[i]) */
static const int ZZ_IDX[16] = {0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15};
/* residual block order within an MB (ops/h264.py _BLK_ORDER, (bx,by)) */
static const int BLK_ORDER[16][2] = {
    {0, 0}, {1, 0}, {0, 1}, {1, 1}, {2, 0}, {3, 0}, {2, 1}, {3, 1},
    {0, 2}, {1, 2}, {0, 3}, {1, 3}, {2, 2}, {3, 2}, {2, 3}, {3, 3},
};
/* chroma QP map (Table 8-15) for qp >= 30 */
static const int CHROMA_QP30[22] = {
    29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36,
    36, 37, 37, 37, 38, 38, 38, 39, 39, 39, 39,
};
static inline int chroma_qp(int qp) { return qp < 30 ? qp : CHROMA_QP30[qp - 30]; }

/* coded_block_pattern me(v) mapping (spec Table 9-4) */
static const int CBP_INTRA[48] = {
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
    16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
    8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41,
};
static const int CBP_INTER[48] = {
    0, 16, 1, 2, 4, 8, 32, 3, 5, 10, 12, 15, 47, 7, 11, 13,
    14, 6, 9, 31, 35, 37, 42, 44, 33, 34, 36, 40, 39, 43, 45, 46,
    17, 18, 20, 24, 19, 21, 26, 28, 23, 27, 29, 30, 22, 25, 38, 41,
};

/* deblock alpha/beta/tc0 (Tables 8-16/8-17) */
static const int DB_ALPHA[52] = {
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28, 32, 36,
    40, 45, 50, 56, 63, 71, 80, 90, 101, 113, 127, 144, 162, 182, 203,
    226, 255, 255,
};
static const int DB_BETA[52] = {
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8, 9, 9, 10, 10, 11,
    11, 12, 12, 13, 13, 14, 14, 15, 15, 16, 16, 17, 17, 18, 18,
};
/* byte-verified against libx264 rodata (see tests' drift check): bS=1
 * first becomes nonzero at indexA 23, bS=3 at 17 */
static const int DB_TC0[3][52] = {
    {0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
     0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2,
     3, 3, 3, 4, 4, 4, 5, 6, 6, 7, 8, 9, 10, 11, 13},
    {0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
     0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3,
     3, 4, 4, 5, 5, 6, 7, 8, 8, 10, 11, 12, 13, 15, 17},
    {0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
     0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 4, 4, 4,
     5, 6, 6, 7, 8, 9, 10, 11, 13, 14, 16, 18, 20, 23, 25},
};

/* ------------------------------------------------------------------ */
/* NAL handling                                                         */
/* ------------------------------------------------------------------ */

/* remove emulation-prevention bytes into d->rbsp_buf; returns length */
static long unepb(H264Dec *d, const uint8_t *p, long n, long *out_off)
{
    if (d->rbsp_cap < n + 16) {
        free(d->rbsp_buf);
        d->rbsp_cap = n + 4096;
        d->rbsp_buf = malloc((size_t)d->rbsp_cap);
        if (!d->rbsp_buf)
            dec_fail(d, "out of memory");
    }
    uint8_t *out = d->rbsp_buf;
    long o = 0;
    int zeros = 0;
    for (long i = 0; i < n; i++) {
        uint8_t b = p[i];
        if (zeros >= 2 && b == 3 && i + 1 < n && p[i + 1] <= 3) {
            zeros = 0;
            continue;
        }
        out[o++] = b;
        zeros = (b == 0) ? zeros + 1 : 0;
    }
    (void)out_off;
    return o;
}

/* ------------------------------------------------------------------ */
/* dequant + inverse transforms (spec 8.5)                              */
/* ------------------------------------------------------------------ */

typedef int64_t i64;

static void vmat(int qp, i64 v[4][4])
{
    const int *vr = V_TAB[qp % 6];
    for (int r = 0; r < 4; r++)
        for (int c = 0; c < 4; c++)
            v[r][c] = vr[POSCLASS[r][c]];
}

/* inverse core transform WITHOUT the final >>6 (rows then cols) */
static void itransform4(i64 d[4][4], i64 out[4][4])
{
    i64 h[4][4];
    /* horizontal pass over each row */
    for (int r = 0; r < 4; r++) {
        i64 x0 = d[r][0], x1 = d[r][1], x2 = d[r][2], x3 = d[r][3];
        i64 e0 = x0 + x2, e1 = x0 - x2;
        i64 e2 = (x1 >> 1) - x3, e3 = x1 + (x3 >> 1);
        h[r][0] = e0 + e3; h[r][1] = e1 + e2;
        h[r][2] = e1 - e2; h[r][3] = e0 - e3;
    }
    /* vertical pass over each column */
    for (int c = 0; c < 4; c++) {
        i64 x0 = h[0][c], x1 = h[1][c], x2 = h[2][c], x3 = h[3][c];
        i64 e0 = x0 + x2, e1 = x0 - x2;
        i64 e2 = (x1 >> 1) - x3, e3 = x1 + (x3 >> 1);
        out[0][c] = e0 + e3; out[1][c] = e1 + e2;
        out[2][c] = e1 - e2; out[3][c] = e0 - e3;
    }
}

static void ihadamard4(const i64 f[4][4], i64 out[4][4])
{
    i64 t[4][4];
    for (int c = 0; c < 4; c++) {
        i64 a = f[0][c], b = f[1][c], cc = f[2][c], dd = f[3][c];
        t[0][c] = a + b + cc + dd;
        t[1][c] = a + b - cc - dd;
        t[2][c] = a - b - cc + dd;
        t[3][c] = a - b + cc - dd;
    }
    for (int r = 0; r < 4; r++) {
        i64 a = t[r][0], b = t[r][1], cc = t[r][2], dd = t[r][3];
        out[r][0] = a + b + cc + dd;
        out[r][1] = a + b - cc - dd;
        out[r][2] = a - b - cc + dd;
        out[r][3] = a - b + cc - dd;
    }
}

static void dezigzag16(const i64 *zz, i64 out[4][4])
{
    i64 flat[16] = {0};
    for (int i = 0; i < 16; i++)
        flat[ZZ_IDX[i]] = zz[i];
    for (int r = 0; r < 4; r++)
        for (int c = 0; c < 4; c++)
            out[r][c] = flat[r * 4 + c];
}

static inline uint8_t clip255(i64 v)
{
    return (uint8_t)(v < 0 ? 0 : (v > 255 ? 255 : v));
}

/* ------------------------------------------------------------------ */
/* CAVLC residual block (= decode_cavlc_block)                          */
/* ------------------------------------------------------------------ */

/* nC -> coeff_token table index: -1 chroma; <2; <4; <8; >=8 is FLC */
static void cavlc_block(H264Dec *d, BitReader *r, int nC, int max_coeffs,
                        i64 *coeffs /* max_coeffs, zigzag order */)
{
    memset(coeffs, 0, sizeof(i64) * (size_t)max_coeffs);
    int t1, total;
    if (nC == -1) {
        vlc_read(r, &d->vlc[3], &t1, &total);
    } else if (nC < 2) {
        vlc_read(r, &d->vlc[0], &t1, &total);
    } else if (nC < 4) {
        vlc_read(r, &d->vlc[1], &t1, &total);
    } else if (nC < 8) {
        vlc_read(r, &d->vlc[2], &t1, &total);
    } else {
        uint32_t v = br_u(r, 6);
        if (v == 3) {
            t1 = 0; total = 0;
        } else {
            t1 = (int)(v & 3); total = (int)(v >> 2) + 1;
        }
    }
    if (total == 0)
        return;
    i64 levels[16];
    int nl = 0;
    for (int i = 0; i < t1; i++)
        levels[nl++] = br_bit(r) ? -1 : 1;
    int suffix_len = (total > 10 && t1 < 3) ? 1 : 0;
    int first = 1;
    for (int i = 0; i < total - t1; i++) {
        int prefix = 0;
        while (br_bit(r) == 0) {
            if (++prefix > 16)
                dec_fail(d, "bad level prefix");
        }
        i64 code;
        if (suffix_len == 0) {
            if (prefix < 14)
                code = prefix;
            else if (prefix == 14)
                code = 14 + (i64)br_u(r, 4);
            else
                code = 30 + (i64)br_u(r, 12);
        } else {
            if (prefix < 15)
                code = ((i64)prefix << suffix_len) | br_u(r, suffix_len);
            else
                code = ((i64)15 << suffix_len) + br_u(r, 12);
        }
        if (first && t1 < 3)
            code += 2;
        first = 0;
        i64 level = (code % 2 == 0) ? (code + 2) / 2 : -((code + 1) / 2);
        levels[nl++] = level;
        if (suffix_len == 0)
            suffix_len = 1;
        i64 al = level < 0 ? -level : level;
        if (al > ((i64)3 << (suffix_len - 1)) && suffix_len < 6)
            suffix_len++;
    }
    int zeros = 0;
    if (total < max_coeffs) {
        int a, b;
        if (nC == -1)
            vlc_read(r, &d->vlc[19 + total - 1], &a, &b);
        else
            vlc_read(r, &d->vlc[4 + total - 1], &a, &b);
        zeros = a;
        (void)b;
    }
    int runs[16];
    int zeros_left = zeros;
    for (int i = 0; i < total - 1; i++) {
        if (zeros_left > 0) {
            int zl = zeros_left < 7 ? zeros_left : 7;
            int a, b;
            vlc_read(r, &d->vlc[22 + zl - 1], &a, &b);
            runs[i] = a;
            (void)b;
            zeros_left -= runs[i];
        } else {
            runs[i] = 0;
        }
    }
    runs[total - 1] = zeros_left;
    int pos = total - 1 + zeros;
    for (int i = 0; i < total; i++) {
        if (pos < 0 || pos >= max_coeffs)
            dec_fail(d, "cavlc position out of range");
        coeffs[pos] = levels[i];
        if (i < total - 1)
            pos -= 1 + runs[i];
    }
}

/* ------------------------------------------------------------------ */
/* intra prediction (spec 8.3) — ports of _pred4x4/_pred16_plane/...    */
/* ------------------------------------------------------------------ */

/* t: 8 top samples (or NULL), l: 4 left (or NULL), tl: -1 if absent */
static void pred4x4(H264Dec *d, int mode, const i64 *t, const i64 *l,
                    int tl, i64 p[4][4])
{
    switch (mode) {
    case 0: /* Vertical */
        for (int y = 0; y < 4; y++)
            for (int x = 0; x < 4; x++)
                p[y][x] = t[x];
        break;
    case 1: /* Horizontal */
        for (int y = 0; y < 4; y++)
            for (int x = 0; x < 4; x++)
                p[y][x] = l[y];
        break;
    case 2: { /* DC */
        i64 v;
        if (t && l) {
            i64 s = t[0] + t[1] + t[2] + t[3] + l[0] + l[1] + l[2] + l[3];
            v = (s + 4) >> 3;
        } else if (t) {
            v = (t[0] + t[1] + t[2] + t[3] + 2) >> 2;
        } else if (l) {
            v = (l[0] + l[1] + l[2] + l[3] + 2) >> 2;
        } else {
            v = 128;
        }
        for (int y = 0; y < 4; y++)
            for (int x = 0; x < 4; x++)
                p[y][x] = v;
        break;
    }
    case 3: /* Diagonal-Down-Left */
        for (int y = 0; y < 4; y++)
            for (int x = 0; x < 4; x++) {
                if (x == 3 && y == 3)
                    p[y][x] = (t[6] + 3 * t[7] + 2) >> 2;
                else
                    p[y][x] = (t[x + y] + 2 * t[x + y + 1] + t[x + y + 2] + 2) >> 2;
            }
        break;
    case 4: { /* Diagonal-Down-Right */
        i64 ext[9] = {l[3], l[2], l[1], l[0], tl, t[0], t[1], t[2], t[3]};
        i64 f[9] = {0};
        for (int k = 1; k < 8; k++)
            f[k] = (ext[k - 1] + 2 * ext[k] + ext[k + 1] + 2) >> 2;
        for (int y = 0; y < 4; y++)
            for (int x = 0; x < 4; x++)
                p[y][x] = f[(x - y) + 4];
        break;
    }
    case 5: /* Vertical-Right */
        for (int y = 0; y < 4; y++)
            for (int x = 0; x < 4; x++) {
                int z = 2 * x - y;
                if (z >= 0 && z % 2 == 0) {
                    int xa = x - (y >> 1) - 1, xb = x - (y >> 1);
                    i64 va = (xa == -1) ? tl : t[xa];
                    i64 vb = (xb == -1) ? tl : t[xb];
                    p[y][x] = (va + vb + 1) >> 1;
                } else if (z >= 0) {
                    int xa = x - (y >> 1) - 2, xb = x - (y >> 1) - 1,
                        xc = x - (y >> 1);
                    i64 va = (xa == -1) ? tl : t[xa];
                    i64 vb = (xb == -1) ? tl : t[xb];
                    i64 vc = (xc == -1) ? tl : t[xc];
                    p[y][x] = (va + 2 * vb + vc + 2) >> 2;
                } else if (z == -1) {
                    p[y][x] = (l[0] + 2 * tl + t[0] + 2) >> 2;
                } else {
                    int ia = y - 1, ib = y - 2, ic = y - 3;
                    i64 va = (ia == -1) ? tl : l[ia];
                    i64 vb = (ib == -1) ? tl : l[ib];
                    i64 vc = (ic == -1) ? tl : l[ic];
                    p[y][x] = (va + 2 * vb + vc + 2) >> 2;
                }
            }
        break;
    case 6: /* Horizontal-Down */
        for (int y = 0; y < 4; y++)
            for (int x = 0; x < 4; x++) {
                int z = 2 * y - x;
                if (z >= 0 && z % 2 == 0) {
                    int ya = y - (x >> 1) - 1, yb = y - (x >> 1);
                    i64 va = (ya == -1) ? tl : l[ya];
                    i64 vb = (yb == -1) ? tl : l[yb];
                    p[y][x] = (va + vb + 1) >> 1;
                } else if (z >= 0) {
                    int ya = y - (x >> 1) - 2, yb = y - (x >> 1) - 1,
                        yc = y - (x >> 1);
                    i64 va = (ya == -1) ? tl : l[ya];
                    i64 vb = (yb == -1) ? tl : l[yb];
                    i64 vc = (yc == -1) ? tl : l[yc];
                    p[y][x] = (va + 2 * vb + vc + 2) >> 2;
                } else if (z == -1) {
                    p[y][x] = (l[0] + 2 * tl + t[0] + 2) >> 2;
                } else {
                    int xa = x - 1, xb = x - 2, xc = x - 3;
                    i64 va = (xa == -1) ? tl : t[xa];
                    i64 vb = (xb == -1) ? tl : t[xb];
                    i64 vc = (xc == -1) ? tl : t[xc];
                    p[y][x] = (va + 2 * vb + vc + 2) >> 2;
                }
            }
        break;
    case 7: /* Vertical-Left */
        for (int y = 0; y < 4; y++)
            for (int x = 0; x < 4; x++) {
                if (y % 2 == 0)
                    p[y][x] = (t[x + (y >> 1)] + t[x + (y >> 1) + 1] + 1) >> 1;
                else
                    p[y][x] = (t[x + (y >> 1)] + 2 * t[x + (y >> 1) + 1]
                               + t[x + (y >> 1) + 2] + 2) >> 2;
            }
        break;
    case 8: /* Horizontal-Up */
        for (int y = 0; y < 4; y++)
            for (int x = 0; x < 4; x++) {
                int z = x + 2 * y;
                if (z == 0 || z == 2 || z == 4)
                    p[y][x] = (l[y + (x >> 1)] + l[y + (x >> 1) + 1] + 1) >> 1;
                else if (z == 1 || z == 3)
                    p[y][x] = (l[y + (x >> 1)] + 2 * l[y + (x >> 1) + 1]
                               + l[y + (x >> 1) + 2] + 2) >> 2;
                else if (z == 5)
                    p[y][x] = (l[2] + 3 * l[3] + 2) >> 2;
                else
                    p[y][x] = l[3];
            }
        break;
    default:
        dec_fail(d, "intra4x4 mode");
    }
}

/* I_16x16 plane prediction (spec 8.3.3.4): t/l are 16 samples, tl corner */
static void pred16_plane(const i64 *t, const i64 *l, i64 tl, i64 p[16][16])
{
    i64 pft[17], pfl[17];
    pft[0] = tl; pfl[0] = tl;
    for (int i = 0; i < 16; i++) {
        pft[i + 1] = t[i];
        pfl[i + 1] = l[i];
    }
    i64 Hs = 0, Vs = 0;
    for (int x = 0; x < 8; x++)
        Hs += (i64)(x + 1) * (pft[9 + x] - pft[7 - x]);
    for (int y = 0; y < 8; y++)
        Vs += (i64)(y + 1) * (pfl[9 + y] - pfl[7 - y]);
    i64 a = 16 * (l[15] + t[15]);
    i64 b = (5 * Hs + 32) >> 6;
    i64 c = (5 * Vs + 32) >> 6;
    for (int y = 0; y < 16; y++)
        for (int x = 0; x < 16; x++) {
            i64 v = (a + b * (x - 7) + c * (y - 7) + 16) >> 5;
            p[y][x] = v < 0 ? 0 : (v > 255 ? 255 : v);
        }
}

/* chroma 8x8 plane prediction (spec 8.3.4.4) */
static void pred8_chroma_plane(const i64 *t, const i64 *l, i64 tl, i64 p[8][8])
{
    i64 pft[9], pfl[9];
    pft[0] = tl; pfl[0] = tl;
    for (int i = 0; i < 8; i++) {
        pft[i + 1] = t[i];
        pfl[i + 1] = l[i];
    }
    i64 Hs = 0, Vs = 0;
    for (int x = 0; x < 4; x++)
        Hs += (i64)(x + 1) * (pft[5 + x] - pft[3 - x]);
    for (int y = 0; y < 4; y++)
        Vs += (i64)(y + 1) * (pfl[5 + y] - pfl[3 - y]);
    i64 a = 16 * (l[7] + t[7]);
    i64 b = (34 * Hs + 32) >> 6;
    i64 c = (34 * Vs + 32) >> 6;
    for (int y = 0; y < 8; y++)
        for (int x = 0; x < 8; x++) {
            i64 v = (a + b * (x - 3) + c * (y - 3) + 16) >> 5;
            p[y][x] = v < 0 ? 0 : (v > 255 ? 255 : v);
        }
}

/* ------------------------------------------------------------------ */
/* reference management + motion compensation (spec 8.4.2.2)           */
/* ------------------------------------------------------------------ */

/* replicate the picture into the PAD border of a padded plane */
static void pad_edges(uint8_t *p, long w, long h, long pw)
{
    /* p points at the padded buffer; picture occupies [PAD..PAD+h) rows,
     * [PAD..PAD+w) cols, row stride pw */
    for (long y = 0; y < h; y++) {
        uint8_t *row = p + (PAD + y) * pw;
        memset(row, row[PAD], PAD);
        memset(row + PAD + w, row[PAD + w - 1], PAD);
    }
    uint8_t *first = p + PAD * pw;
    uint8_t *last = p + (PAD + h - 1) * pw;
    for (long y = 0; y < PAD; y++) {
        memcpy(p + y * pw, first, (size_t)pw);
        memcpy(p + (PAD + h + y) * pw, last, (size_t)pw);
    }
}

/* compute luma half-pel planes for a ref (lazy, = half_planes()) */
static void make_half_planes(H264Dec *d, RefPic *ref)
{
    long pw = d->pw, ph = d->ph;
    const uint8_t *r = ref->y;
    if (!ref->hb) {
        ref->hb = xalloc(d, pw * ph);
        ref->hh = xalloc(d, pw * ph);
        ref->hj = xalloc(d, pw * ph);
    }
    int32_t *b1 = d->tmp_b1;  /* b1[y*pw+x] = unclipped half right of (y,x) */
    for (long y = 0; y < ph; y++) {
        const uint8_t *row = r + y * pw;
        int32_t *brow = b1 + y * pw;
        uint8_t *hbrow = ref->hb + y * pw;
        for (long x = 2; x < pw - 3; x++) {
            int32_t v = row[x - 2] - 5 * row[x - 1] + 20 * row[x]
                      + 20 * row[x + 1] - 5 * row[x + 2] + row[x + 3];
            brow[x] = v;
            int32_t c = (v + 16) >> 5;
            hbrow[x] = (uint8_t)(c < 0 ? 0 : (c > 255 ? 255 : c));
        }
        brow[0] = brow[1] = brow[2];
        brow[pw - 3] = brow[pw - 2] = brow[pw - 1] = brow[pw - 4];
    }
    for (long y = 2; y < ph - 3; y++) {
        const uint8_t *rm2 = r + (y - 2) * pw, *rm1 = r + (y - 1) * pw;
        const uint8_t *r0 = r + y * pw, *rp1 = r + (y + 1) * pw;
        const uint8_t *rp2 = r + (y + 2) * pw, *rp3 = r + (y + 3) * pw;
        uint8_t *hhrow = ref->hh + y * pw;
        for (long x = 0; x < pw; x++) {
            int32_t v = rm2[x] - 5 * rm1[x] + 20 * r0[x]
                      + 20 * rp1[x] - 5 * rp2[x] + rp3[x];
            int32_t c = (v + 16) >> 5;
            hhrow[x] = (uint8_t)(c < 0 ? 0 : (c > 255 ? 255 : c));
        }
        const int32_t *bm2 = b1 + (y - 2) * pw, *bm1 = b1 + (y - 1) * pw;
        const int32_t *b0 = b1 + y * pw, *bp1 = b1 + (y + 1) * pw;
        const int32_t *bp2 = b1 + (y + 2) * pw, *bp3 = b1 + (y + 3) * pw;
        uint8_t *hjrow = ref->hj + y * pw;
        for (long x = 2; x < pw - 3; x++) {
            int64_t v = (int64_t)bm2[x] - 5 * bm1[x] + 20 * b0[x]
                      + 20 * bp1[x] - 5 * bp2[x] + bp3[x];
            int64_t c = (v + 512) >> 10;
            hjrow[x] = (uint8_t)(c < 0 ? 0 : (c > 255 ? 255 : c));
        }
    }
    ref->have_half = 1;
}

/* quarter-position constituent table (= _QTAB): for (fx,fy) with an odd
 * component, the two (cfx, cfy, dy, dx) constituents */
static const int8_t QTAB[4][4][2][4] = {
    /* [fy][fx][k] = {cfx, cfy, dy, dx} */
    [0][1] = {{0, 0, 0, 0}, {2, 0, 0, 0}},
    [0][3] = {{2, 0, 0, 0}, {0, 0, 0, 1}},
    [1][0] = {{0, 0, 0, 0}, {0, 2, 0, 0}},
    [3][0] = {{0, 2, 0, 0}, {0, 0, 1, 0}},
    [1][1] = {{2, 0, 0, 0}, {0, 2, 0, 0}},
    [1][3] = {{2, 0, 0, 0}, {0, 2, 0, 1}},
    [3][1] = {{0, 2, 0, 0}, {2, 0, 1, 0}},
    [3][3] = {{2, 0, 1, 0}, {0, 2, 0, 1}},
    [1][2] = {{2, 0, 0, 0}, {2, 2, 0, 0}},
    [3][2] = {{2, 2, 0, 0}, {2, 0, 1, 0}},
    [2][1] = {{0, 2, 0, 0}, {2, 2, 0, 0}},
    [2][3] = {{2, 2, 0, 0}, {0, 2, 0, 1}},
};

static inline const uint8_t *mc_plane(const H264Dec *d, const RefPic *ref,
                                      int cfx, int cfy)
{
    (void)d;
    if (cfx == 0 && cfy == 0)
        return ref->y;
    if (cfx == 2 && cfy == 0)
        return ref->hb;
    if (cfx == 0 && cfy == 2)
        return ref->hh;
    return ref->hj;
}

/* luma MC of a w x h block at pixel (px,py), mv in quarter-pel, into
 * out[ldst] rows.  Block-origin clamp to the padded window == infinite
 * edge extension (pad is edge-replicated, see file header). */
static void mc_luma_c(H264Dec *d, RefPic *ref, int px, int py,
                      int mvx, int mvy, int w, int h,
                      i64 *out, int ldst)
{
    long pw = d->pw, ph = d->ph;
    int fx = mvx & 3, fy = mvy & 3;
    long x0 = px + (mvx >> 2) + PAD;
    long y0 = py + (mvy >> 2) + PAD;
    if (x0 < 3) x0 = 3;
    if (y0 < 3) y0 = 3;
    if (x0 > pw - w - 3) x0 = pw - w - 3;
    if (y0 > ph - h - 3) y0 = ph - h - 3;
    if (!fx && !fy) {
        const uint8_t *src = ref->y + y0 * pw + x0;
        for (int yy = 0; yy < h; yy++)
            for (int xx = 0; xx < w; xx++)
                out[yy * ldst + xx] = src[yy * pw + xx];
        return;
    }
    if (!ref->have_half)
        make_half_planes(d, ref);
    if ((fx & 1) || (fy & 1)) {
        const int8_t *ca = QTAB[fy][fx][0];
        const int8_t *cb = QTAB[fy][fx][1];
        const uint8_t *pa = mc_plane(d, ref, ca[0], ca[1]);
        const uint8_t *pb = mc_plane(d, ref, cb[0], cb[1]);
        const uint8_t *sa = pa + (y0 + ca[2]) * pw + (x0 + ca[3]);
        const uint8_t *sb = pb + (y0 + cb[2]) * pw + (x0 + cb[3]);
        for (int yy = 0; yy < h; yy++)
            for (int xx = 0; xx < w; xx++)
                out[yy * ldst + xx] =
                    ((i64)sa[yy * pw + xx] + sb[yy * pw + xx] + 1) >> 1;
        return;
    }
    const uint8_t *p = mc_plane(d, ref, fx, fy);
    const uint8_t *src = p + y0 * pw + x0;
    for (int yy = 0; yy < h; yy++)
        for (int xx = 0; xx < w; xx++)
            out[yy * ldst + xx] = src[yy * pw + xx];
}

/* chroma MC (spec 8.4.2.2.2 eighth-sample bilinear) */
static void mc_chroma_c(H264Dec *d, const uint8_t *refc, int px, int py,
                        int mvx, int mvy, int w, int h, i64 *out, int ldst)
{
    long cpw = d->cpw, cph = d->cph;
    int xf = mvx & 7, yf = mvy & 7;
    long x0 = px + (mvx >> 3) + PAD;
    long y0 = py + (mvy >> 3) + PAD;
    if (x0 < 1) x0 = 1;
    if (y0 < 1) y0 = 1;
    if (x0 > cpw - w - 2) x0 = cpw - w - 2;
    if (y0 > cph - h - 2) y0 = cph - h - 2;
    const uint8_t *s = refc + y0 * cpw + x0;
    if (!xf && !yf) {
        for (int yy = 0; yy < h; yy++)
            for (int xx = 0; xx < w; xx++)
                out[yy * ldst + xx] = s[yy * cpw + xx];
        return;
    }
    for (int yy = 0; yy < h; yy++)
        for (int xx = 0; xx < w; xx++) {
            i64 a = s[yy * cpw + xx];
            i64 b = s[yy * cpw + xx + 1];
            i64 c = s[(yy + 1) * cpw + xx];
            i64 dd = s[(yy + 1) * cpw + xx + 1];
            out[yy * ldst + xx] =
                ((8 - xf) * (8 - yf) * a + xf * (8 - yf) * b
                 + (8 - xf) * yf * c + xf * yf * dd + 32) >> 6;
        }
}

/* ------------------------------------------------------------------ */
/* motion vector prediction (spec 8.4.1; = mv_pred4/skip_mv4)           */
/* ------------------------------------------------------------------ */

/* neighbour fetch on the 4x4 grid; returns 0 if unavailable */
static int fetch4g(const H264Dec *d, const uint8_t *dec4,
                   const int32_t *mvg, const int32_t *rg,
                   int gy, int gx, int my0, int *mvx, int *mvy, int *ri)
{
    int g4w = d->mbw * 4;
    if (gx < 0 || gy < my0 * 4 || gx >= g4w)
        return 0;
    long idx = (long)gy * g4w + gx;
    if (!dec4[idx])
        return 0;
    *mvx = mvg[idx * 2];
    *mvy = mvg[idx * 2 + 1];
    *ri = rg[idx];
    return 1;
}

static int fetch4(const H264Dec *d, const uint8_t *dec4, int gy, int gx,
                  int my0, int *mvx, int *mvy, int *ri)
{
    return fetch4g(d, dec4, d->mv4, d->ref4, gy, gx, my0, mvx, mvy, ri);
}

/* shape codes for the directional 16x8/8x16 rules */
enum { SH_NONE = 0, SH_16x8_0, SH_16x8_1, SH_8x16_0, SH_8x16_1 };

static void mv_pred4_g(const H264Dec *d, const uint8_t *dec4,
                       const int32_t *mvg, const int32_t *rg,
                       int gy, int gx, int pw4, int refidx, int my0,
                       int shape, int *pmx, int *pmy)
{
    int ax = 0, ay = 0, ar = 0, bx = 0, by = 0, brr = 0, cx = 0, cy = 0, cr = 0;
    int has_a = fetch4g(d, dec4, mvg, rg, gy, gx - 1, my0, &ax, &ay, &ar);
    int has_b = fetch4g(d, dec4, mvg, rg, gy - 1, gx, my0, &bx, &by, &brr);
    int has_c = fetch4g(d, dec4, mvg, rg, gy - 1, gx + pw4, my0, &cx, &cy, &cr);
    if (!has_c)
        has_c = fetch4g(d, dec4, mvg, rg, gy - 1, gx - 1, my0, &cx, &cy, &cr);
    if (shape == SH_16x8_0 && has_b && brr == refidx) {
        *pmx = bx; *pmy = by; return;
    }
    if ((shape == SH_16x8_1 || shape == SH_8x16_0) && has_a && ar == refidx) {
        *pmx = ax; *pmy = ay; return;
    }
    if (shape == SH_8x16_1 && has_c && cr == refidx) {
        *pmx = cx; *pmy = cy; return;
    }
    int vax = has_a ? ax : 0, vay = has_a ? ay : 0, var = has_a ? ar : -1;
    int vbx = has_b ? bx : 0, vby = has_b ? by : 0, vbr = has_b ? brr : -1;
    int vcx = has_c ? cx : 0, vcy = has_c ? cy : 0, vcr = has_c ? cr : -1;
    if (!has_b && !has_c && has_a) {
        *pmx = vax; *pmy = vay; return;
    }
    int nm = (var == refidx) + (vbr == refidx) + (vcr == refidx);
    if (nm == 1) {
        if (var == refidx) { *pmx = vax; *pmy = vay; }
        else if (vbr == refidx) { *pmx = vbx; *pmy = vby; }
        else { *pmx = vcx; *pmy = vcy; }
        return;
    }
    /* median of three */
#define MED3(a, b, c) ((a) + (b) + (c) \
    - ((a) < (b) ? ((a) < (c) ? (a) : (c)) : ((b) < (c) ? (b) : (c))) \
    - ((a) > (b) ? ((a) > (c) ? (a) : (c)) : ((b) > (c) ? (b) : (c))))
    *pmx = MED3(vax, vbx, vcx);
    *pmy = MED3(vay, vby, vcy);
#undef MED3
}

static void mv_pred4_c(const H264Dec *d, const uint8_t *dec4, int gy, int gx,
                       int pw4, int refidx, int my0, int shape,
                       int *pmx, int *pmy)
{
    mv_pred4_g(d, dec4, d->mv4, d->ref4, gy, gx, pw4, refidx, my0, shape,
               pmx, pmy);
}

static void mv_pred4_b(const H264Dec *d, const uint8_t *dec4, int gy, int gx,
                       int pw4, int refidx, int my0, int shape,
                       int *pmx, int *pmy)
{
    mv_pred4_g(d, dec4, d->mv4b, d->ref4b, gy, gx, pw4, refidx, my0, shape,
               pmx, pmy);
}

static void skip_mv4_c(const H264Dec *d, const uint8_t *dec4, int mx, int my,
                       int my0, int *mvx, int *mvy)
{
    int ax = 0, ay = 0, ar = 0, bx = 0, by = 0, brr = 0;
    int has_a = fetch4(d, dec4, my * 4, mx * 4 - 1, my0, &ax, &ay, &ar);
    int has_b = fetch4(d, dec4, my * 4 - 1, mx * 4, my0, &bx, &by, &brr);
    if (!has_a || !has_b) {
        *mvx = 0; *mvy = 0; return;
    }
    if ((ar == 0 && ax == 0 && ay == 0) || (brr == 0 && bx == 0 && by == 0)) {
        *mvx = 0; *mvy = 0; return;
    }
    mv_pred4_c(d, dec4, my * 4, mx * 4, 4, 0, my0, SH_NONE, mvx, mvy);
}

/* P sub-macroblock geometry (= _SUB_PARTS): (dy, dx, pw, ph) per part */
static const int SUB_PARTS[4][4][4] = {
    {{0, 0, 2, 2}, {0}, {0}, {0}},
    {{0, 0, 2, 1}, {1, 0, 2, 1}, {0}, {0}},
    {{0, 0, 1, 2}, {0, 1, 1, 2}, {0}, {0}},
    {{0, 0, 1, 1}, {0, 1, 1, 1}, {1, 0, 1, 1}, {1, 1, 1, 1}},
};
static const int SUB_NPARTS[4] = {1, 2, 2, 4};

/* ------------------------------------------------------------------ */
/* in-loop deblocking (spec 8.7) — port of h264_deblock.deblock_frame   */
/* ------------------------------------------------------------------ */

/* filter one edge segment: rows of [p3 p2 p1 p0 q0 q1 q2 q3] gathered
 * through a stride (vert edges: stride 1; horiz edges: plane stride) */
static void filter_edge_line(uint8_t *base, long step, long nstride, int n,
                             const int *bs, int index_a, int index_b,
                             int chroma)
{
    int alpha = DB_ALPHA[index_a];
    int beta = DB_BETA[index_b];
    for (int i = 0; i < n; i++) {
        uint8_t *px = base + i * nstride;
        int p3 = px[-4 * step], p2 = px[-3 * step], p1 = px[-2 * step],
            p0 = px[-1 * step];
        int q0 = px[0], q1 = px[1 * step], q2 = px[2 * step],
            q3 = px[3 * step];
        int s = bs[i];
        if (s <= 0)
            continue;
        int d0 = p0 - q0;
        if ((d0 < 0 ? -d0 : d0) >= alpha)
            continue;
        int d1 = p1 - p0, d2 = q1 - q0;
        if ((d1 < 0 ? -d1 : d1) >= beta || (d2 < 0 ? -d2 : d2) >= beta)
            continue;
        int dap = p2 - p0, daq = q2 - q0;
        int ap = (dap < 0 ? -dap : dap) < beta;
        int aq = (daq < 0 ? -daq : daq) < beta;
        if (s == 4) {
            if (chroma) {
                px[-1 * step] = (uint8_t)((2 * p1 + p0 + q1 + 2) >> 2);
                px[0] = (uint8_t)((2 * q1 + q0 + p1 + 2) >> 2);
            } else {
                int small = (d0 < 0 ? -d0 : d0) < ((alpha >> 2) + 2);
                if (small && ap) {
                    px[-1 * step] = (uint8_t)((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3);
                    px[-2 * step] = (uint8_t)((p2 + p1 + p0 + q0 + 2) >> 2);
                    px[-3 * step] = (uint8_t)((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3);
                } else {
                    px[-1 * step] = (uint8_t)((2 * p1 + p0 + q1 + 2) >> 2);
                }
                if (small && aq) {
                    px[0] = (uint8_t)((q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3);
                    px[1 * step] = (uint8_t)((q2 + q1 + q0 + p0 + 2) >> 2);
                    px[2 * step] = (uint8_t)((2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3);
                } else {
                    px[0] = (uint8_t)((2 * q1 + q0 + p1 + 2) >> 2);
                }
            }
        } else {
            int tc0 = DB_TC0[(s < 1 ? 1 : (s > 3 ? 3 : s)) - 1][index_a];
            int tc = chroma ? tc0 + 1 : tc0 + ap + aq;
            int delta = (((q0 - p0) * 4) + (p1 - q1) + 4) >> 3;
            if (delta < -tc) delta = -tc;
            if (delta > tc) delta = tc;
            int p0n = p0 + delta, q0n = q0 - delta;
            px[-1 * step] = clip255(p0n);
            px[0] = clip255(q0n);
            if (!chroma) {
                if (ap) {
                    int dd = (p2 + ((p0 + q0 + 1) >> 1) - (p1 << 1)) >> 1;
                    if (dd < -tc0) dd = -tc0;
                    if (dd > tc0) dd = tc0;
                    px[-2 * step] = (uint8_t)(p1 + dd);
                }
                if (aq) {
                    int dd = (q2 + ((p0 + q0 + 1) >> 1) - (q1 << 1)) >> 1;
                    if (dd < -tc0) dd = -tc0;
                    if (dd > tc0) dd = tc0;
                    px[1 * step] = (uint8_t)(q1 + dd);
                }
            }
        }
    }
}

/* bS for the 4 4x4 groups along one edge (= _bs_edge) */
/* 8.7.2.1 motion rules over the per-block SETS of (picture, mv) pairs:
 * a B block can carry two, and when both predictions come from ONE
 * picture bS stays 0 only if SOME assignment keeps every diff small */
static int mvfar(const H264Dec *d, const int32_t *ma, long ia,
                 const int32_t *mb, long ib)
{
    int dx = ma[ia * 2] - mb[ib * 2];
    int dy = ma[ia * 2 + 1] - mb[ib * 2 + 1];
    return (dx < 0 ? -dx : dx) >= 4 || (dy < 0 ? -dy : dy) >= 4;
}

static int motion_differs_c(const H264Dec *d, long pi, long qi)
{
    int p0 = d->pid4[pi] >= 0, p1 = d->pid4b[pi] >= 0;
    int q0 = d->pid4[qi] >= 0, q1 = d->pid4b[qi] >= 0;
    int np = p0 + p1, nq = q0 + q1;
    if (np != nq)
        return 1;                      /* different number of MVs */
    if (np == 0)
        return 0;
    if (np == 1) {
        const int32_t *pm = p0 ? d->mv4 : d->mv4b;
        long ppid = p0 ? d->pid4[pi] : d->pid4b[pi];
        const int32_t *qm = q0 ? d->mv4 : d->mv4b;
        long qpid = q0 ? d->pid4[qi] : d->pid4b[qi];
        return ppid != qpid || mvfar(d, pm, pi, qm, qi);
    }
    /* two MVs each: compare reference-picture sets */
    long pa = d->pid4[pi], pb = d->pid4b[pi];
    long qa = d->pid4[qi], qb = d->pid4b[qi];
    long pl = pa < pb ? pa : pb, ph = pa < pb ? pb : pa;
    long ql = qa < qb ? qa : qb, qh = qa < qb ? qb : qa;
    if (pl != ql || ph != qh)
        return 1;                      /* different reference pictures */
    if (pa != pb) {
        /* two distinct pictures: align the comparison by picture */
        if (pa == qa)
            return mvfar(d, d->mv4, pi, d->mv4, qi)
                   || mvfar(d, d->mv4b, pi, d->mv4b, qi);
        return mvfar(d, d->mv4, pi, d->mv4b, qi)
               || mvfar(d, d->mv4b, pi, d->mv4, qi);
    }
    /* both predictions from ONE picture: either assignment may pass */
    int straight = !mvfar(d, d->mv4, pi, d->mv4, qi)
                   && !mvfar(d, d->mv4b, pi, d->mv4b, qi);
    int crossed = !mvfar(d, d->mv4, pi, d->mv4b, qi)
                  && !mvfar(d, d->mv4b, pi, d->mv4, qi);
    return !(straight || crossed);
}

static void bs_edge(const H264Dec *d, int pmy, int pmx, int qmy, int qmx,
                    const int (*pblocks)[2], const int (*qblocks)[2],
                    int mb_edge, int *bs4)
{
    int mbw = d->mbw;
    int g4w = mbw * 4;
    if (d->db_intra[pmy * mbw + pmx] || d->db_intra[qmy * mbw + qmx]) {
        int v = mb_edge ? 4 : 3;
        bs4[0] = bs4[1] = bs4[2] = bs4[3] = v;
        return;
    }
    /* with the 8x8 transform the "contains nonzero coefficients" test
       applies to the containing 8x8 transform block (8.7.2.1) */
    int pt8 = d->db_t8x8[(long)pmy * mbw + pmx];
    int qt8 = d->db_t8x8[(long)qmy * mbw + qmx];
    for (int i = 0; i < 4; i++) {
        long pi = (long)pblocks[i][0] * g4w + pblocks[i][1];
        long qi = (long)qblocks[i][0] * g4w + qblocks[i][1];
        int pcoded, qcoded;
        if (pt8) {
            long gy0 = pblocks[i][0] & ~1, gx0 = pblocks[i][1] & ~1;
            pcoded = d->nnz_l[gy0 * g4w + gx0]
                     || d->nnz_l[gy0 * g4w + gx0 + 1]
                     || d->nnz_l[(gy0 + 1) * g4w + gx0]
                     || d->nnz_l[(gy0 + 1) * g4w + gx0 + 1];
        } else {
            pcoded = d->nnz_l[pi] != 0;
        }
        if (qt8) {
            long gy0 = qblocks[i][0] & ~1, gx0 = qblocks[i][1] & ~1;
            qcoded = d->nnz_l[gy0 * g4w + gx0]
                     || d->nnz_l[gy0 * g4w + gx0 + 1]
                     || d->nnz_l[(gy0 + 1) * g4w + gx0]
                     || d->nnz_l[(gy0 + 1) * g4w + gx0 + 1];
        } else {
            qcoded = d->nnz_l[qi] != 0;
        }
        if (pcoded || qcoded) {
            bs4[i] = 2;
        } else {
            bs4[i] = motion_differs_c(d, pi, qi);
        }
    }
}

static void deblock_frame_c(H264Dec *d)
{
    int mbw = d->mbw, mbh = d->mbh;
    long pw = d->pw, cpw = d->cpw;
    uint8_t *Y = d->cur_y + PAD * pw + PAD;
    uint8_t *CB = d->cur_cb + PAD * cpw + PAD;
    uint8_t *CR = d->cur_cr + PAD * cpw + PAD;

    for (int my = 0; my < mbh; my++) {
        for (int mx = 0; mx < mbw; mx++) {
            long mi = (long)my * mbw + mx;
            if (!d->db_decoded[mi] || d->db_idc[mi] == 1)
                continue;
            int offa = d->db_offa[mi], offb = d->db_offb[mi];
            int sid = d->db_slice[mi];
            int qp_cur = d->db_ipcm[mi] ? 0 : d->db_qp[mi];
            int bs4[4], groups_p[4][2], groups_q[4][2];

#define MB_EDGE_OK(pmy, pmx) \
    (d->db_decoded[(long)(pmy) * mbw + (pmx)] \
     && !(d->db_idc[mi] == 2 && d->db_slice[(long)(pmy) * mbw + (pmx)] != sid))
#define QP_OF(pmy, pmx) \
    (d->db_ipcm[(long)(pmy) * mbw + (pmx)] ? 0 : d->db_qp[(long)(pmy) * mbw + (pmx)])
#define QPC_OF(qpv) chroma_qp((qpv) + d->pps.chroma_off < 0 ? 0 : \
    ((qpv) + d->pps.chroma_off > 51 ? 51 : (qpv) + d->pps.chroma_off))

            /* ---- vertical luma edges ---- */
            /* transform_size_8x8_flag removes internal edges at 4, 12 */
            for (int ex = 0; ex <= 12; ex += 4) {
                if (d->db_t8x8[mi] && (ex == 4 || ex == 12))
                    continue;
                int x = mx * 16 + ex;
                int gx = x / 4;
                for (int i = 0; i < 4; i++) {
                    groups_q[i][0] = my * 4 + i; groups_q[i][1] = gx;
                    groups_p[i][0] = my * 4 + i; groups_p[i][1] = gx - 1;
                }
                int ia, ib;
                if (ex == 0) {
                    if (mx == 0 || !MB_EDGE_OK(my, mx - 1))
                        continue;
                    bs_edge(d, my, mx - 1, my, mx, groups_p, groups_q, 1, bs4);
                    int qpav = (QP_OF(my, mx - 1) + qp_cur + 1) >> 1;
                    ia = qpav + offa; ib = qpav + offb;
                } else {
                    bs_edge(d, my, mx, my, mx, groups_p, groups_q, 0, bs4);
                    ia = qp_cur + offa; ib = qp_cur + offb;
                }
                ia = ia < 0 ? 0 : (ia > 51 ? 51 : ia);
                ib = ib < 0 ? 0 : (ib > 51 ? 51 : ib);
                if (!(bs4[0] | bs4[1] | bs4[2] | bs4[3]))
                    continue;
                int bs16[16];
                for (int i = 0; i < 16; i++)
                    bs16[i] = bs4[i / 4];
                filter_edge_line(Y + (long)my * 16 * pw + x, 1, pw, 16,
                                 bs16, ia, ib, 0);
            }

            /* ---- vertical chroma edges (luma x = 0, 8) ---- */
            for (int k = 0; k < 2; k++) {
                int lex = k * 8;
                int xc = mx * 8 + k * 4;
                int ia, ib;
                if (lex == 0) {
                    if (mx == 0 || !MB_EDGE_OK(my, mx - 1))
                        continue;
                    for (int i = 0; i < 4; i++) {
                        groups_p[i][0] = my * 4 + i; groups_p[i][1] = mx * 4 - 1;
                        groups_q[i][0] = my * 4 + i; groups_q[i][1] = mx * 4;
                    }
                    bs_edge(d, my, mx - 1, my, mx, groups_p, groups_q, 1, bs4);
                    int qa = QPC_OF(QP_OF(my, mx - 1));
                    int qb = QPC_OF(qp_cur);
                    int qpav = (qa + qb + 1) >> 1;
                    ia = qpav + offa; ib = qpav + offb;
                } else {
                    int gx = mx * 4 + 2;
                    for (int i = 0; i < 4; i++) {
                        groups_p[i][0] = my * 4 + i; groups_p[i][1] = gx - 1;
                        groups_q[i][0] = my * 4 + i; groups_q[i][1] = gx;
                    }
                    bs_edge(d, my, mx, my, mx, groups_p, groups_q, 0, bs4);
                    int q = QPC_OF(qp_cur);
                    ia = q + offa; ib = q + offb;
                }
                ia = ia < 0 ? 0 : (ia > 51 ? 51 : ia);
                ib = ib < 0 ? 0 : (ib > 51 ? 51 : ib);
                if (!(bs4[0] | bs4[1] | bs4[2] | bs4[3]))
                    continue;
                int bs8[8];
                for (int i = 0; i < 8; i++)
                    bs8[i] = bs4[i / 2];
                filter_edge_line(CB + (long)my * 8 * cpw + xc, 1, cpw, 8,
                                 bs8, ia, ib, 1);
                filter_edge_line(CR + (long)my * 8 * cpw + xc, 1, cpw, 8,
                                 bs8, ia, ib, 1);
            }

            /* ---- horizontal luma edges ---- */
            for (int ey = 0; ey <= 12; ey += 4) {
                if (d->db_t8x8[mi] && (ey == 4 || ey == 12))
                    continue;
                int yy = my * 16 + ey;
                int gy = yy / 4;
                for (int i = 0; i < 4; i++) {
                    groups_q[i][0] = gy; groups_q[i][1] = mx * 4 + i;
                    groups_p[i][0] = gy - 1; groups_p[i][1] = mx * 4 + i;
                }
                int ia, ib;
                if (ey == 0) {
                    if (my == 0 || !MB_EDGE_OK(my - 1, mx))
                        continue;
                    bs_edge(d, my - 1, mx, my, mx, groups_p, groups_q, 1, bs4);
                    int qpav = (QP_OF(my - 1, mx) + qp_cur + 1) >> 1;
                    ia = qpav + offa; ib = qpav + offb;
                } else {
                    bs_edge(d, my, mx, my, mx, groups_p, groups_q, 0, bs4);
                    ia = qp_cur + offa; ib = qp_cur + offb;
                }
                ia = ia < 0 ? 0 : (ia > 51 ? 51 : ia);
                ib = ib < 0 ? 0 : (ib > 51 ? 51 : ib);
                if (!(bs4[0] | bs4[1] | bs4[2] | bs4[3]))
                    continue;
                int bs16[16];
                for (int i = 0; i < 16; i++)
                    bs16[i] = bs4[i / 4];
                filter_edge_line(Y + (long)yy * pw + mx * 16, pw, 1, 16,
                                 bs16, ia, ib, 0);
            }

            /* ---- horizontal chroma edges ---- */
            for (int k = 0; k < 2; k++) {
                int ley = k * 8;
                int yc = my * 8 + k * 4;
                int ia, ib;
                if (ley == 0) {
                    if (my == 0 || !MB_EDGE_OK(my - 1, mx))
                        continue;
                    for (int i = 0; i < 4; i++) {
                        groups_p[i][0] = my * 4 - 1; groups_p[i][1] = mx * 4 + i;
                        groups_q[i][0] = my * 4; groups_q[i][1] = mx * 4 + i;
                    }
                    bs_edge(d, my - 1, mx, my, mx, groups_p, groups_q, 1, bs4);
                    int qa = QPC_OF(QP_OF(my - 1, mx));
                    int qb = QPC_OF(qp_cur);
                    int qpav = (qa + qb + 1) >> 1;
                    ia = qpav + offa; ib = qpav + offb;
                } else {
                    int gy = my * 4 + 2;
                    for (int i = 0; i < 4; i++) {
                        groups_p[i][0] = gy - 1; groups_p[i][1] = mx * 4 + i;
                        groups_q[i][0] = gy; groups_q[i][1] = mx * 4 + i;
                    }
                    bs_edge(d, my, mx, my, mx, groups_p, groups_q, 0, bs4);
                    int q = QPC_OF(qp_cur);
                    ia = q + offa; ib = q + offb;
                }
                ia = ia < 0 ? 0 : (ia > 51 ? 51 : ia);
                ib = ib < 0 ? 0 : (ib > 51 ? 51 : ib);
                if (!(bs4[0] | bs4[1] | bs4[2] | bs4[3]))
                    continue;
                int bs8[8];
                for (int i = 0; i < 8; i++)
                    bs8[i] = bs4[i / 2];
                filter_edge_line(CB + (long)yc * cpw + mx * 8, cpw, 1, 8,
                                 bs8, ia, ib, 1);
                filter_edge_line(CR + (long)yc * cpw + mx * 8, cpw, 1, 8,
                                 bs8, ia, ib, 1);
            }
#undef MB_EDGE_OK
#undef QP_OF
#undef QPC_OF
        }
    }
}

/* ------------------------------------------------------------------ */
/* slice decode shared machinery                                       */
/* ------------------------------------------------------------------ */

/* pixel accessors into the padded current planes */
#define YP(d) ((d)->cur_y + PAD * (d)->pw + PAD)
#define CBP(d) ((d)->cur_cb + PAD * (d)->cpw + PAD)
#define CRP(d) ((d)->cur_cr + PAD * (d)->cpw + PAD)

typedef struct Slice {
    H264Dec *d;
    int my0;            /* first MB row of the slice */
    int qp;             /* running slice QP */
    int slice_id;
    int dbf_idc, dbf_offa, dbf_offb;
    int l0_active, l1_active;
    int is_p, is_b;
    long cur_poc;
    int wbidc;              /* weighted_bipred_idc for B */
    /* ref lists: ref_idx -> DPB index (identity unless modified) */
    int l0map[MAX_L0];
    int l1map[MAX_L0];
    /* explicit weighted prediction (pred_weight_table, 7.3.3.2) */
    int wp_on, wp_ld, wp_cd;
    int wl[MAX_L0], wo[MAX_L0];
    int wcw[MAX_L0][2], wco[MAX_L0][2];
    int wl1[MAX_L0], wo1[MAX_L0];
    int wcw1[MAX_L0][2], wco1[MAX_L0][2];
    /* colocated picture (RefPicList1[0]) for spatial direct */
    RefPic *colpic;
} Slice;

static void record_mb(Slice *s, int my, int mx, int intra, int ipcm)
{
    H264Dec *d = s->d;
    long mi = (long)my * d->mbw + mx;
    d->db_decoded[mi] = 1;
    d->db_intra[mi] = (uint8_t)intra;
    d->db_ipcm[mi] = (uint8_t)ipcm;
    d->db_qp[mi] = s->qp;
    d->db_slice[mi] = s->slice_id;
    d->db_idc[mi] = s->dbf_idc;
    d->db_offa[mi] = s->dbf_offa;
    d->db_offb[mi] = s->dbf_offb;
}

/* nC predictor (= nc_of) over an nnz grid with row width gw */
static int nc_of(const int32_t *nn, int gw, int gx, int gy, int gy_min)
{
    int has_a = gx > 0;
    int has_b = gy > gy_min;
    if (has_a && has_b)
        return (nn[(long)gy * gw + gx - 1] + nn[(long)(gy - 1) * gw + gx] + 1) >> 1;
    if (has_a)
        return nn[(long)gy * gw + gx - 1];
    if (has_b)
        return nn[(long)(gy - 1) * gw + gx];
    return 0;
}

/* luma 4x4 intra neighbour samples (= luma_neighbors) */
static void luma_neighbors(Slice *s, int px, int py, int need_tr,
                           i64 *t8, int *has_t, i64 *l4, int *has_l, int *tl)
{
    H264Dec *d = s->d;
    uint8_t *Y = YP(d);
    long pw = d->pw;
    int gx = px / 4, gy = py / 4;
    int g4w = d->mbw * 4;
    *has_t = 0;
    *has_l = 0;
    *tl = -1;
    if (py > s->my0 * 16 && d->done4[(long)(gy - 1) * g4w + gx]) {
        for (int i = 0; i < 4; i++)
            t8[i] = Y[(long)(py - 1) * pw + px + i];
        if (need_tr && gx + 1 < g4w && d->done4[(long)(gy - 1) * g4w + gx + 1]) {
            for (int i = 0; i < 4; i++)
                t8[4 + i] = Y[(long)(py - 1) * pw + px + 4 + i];
        } else {
            for (int i = 0; i < 4; i++)
                t8[4 + i] = Y[(long)(py - 1) * pw + px + 3];
        }
        *has_t = 1;
    }
    if (px > 0 && d->done4[(long)gy * g4w + gx - 1]) {
        for (int i = 0; i < 4; i++)
            l4[i] = Y[(long)(py + i) * pw + px - 1];
        *has_l = 1;
    }
    if (*has_t && *has_l && px > 0 && py > s->my0 * 16)
        *tl = Y[(long)(py - 1) * pw + px - 1];
}

/* chroma prediction block (= chroma_pred_block); plane = CBP/CRP base */
static void chroma_pred_c(Slice *s, uint8_t *plane, int mx, int my, int mode,
                          i64 pred[8][8])
{
    H264Dec *d = s->d;
    long cpw = d->cpw;
    int x0 = mx * 8, y0 = my * 8;
    i64 lcol[8] = {0}, trow[8] = {0};
    int has_l = mx > 0, has_t = my > s->my0;
    if (has_l)
        for (int i = 0; i < 8; i++)
            lcol[i] = plane[(long)(y0 + i) * cpw + x0 - 1];
    if (has_t)
        for (int i = 0; i < 8; i++)
            trow[i] = plane[(long)(y0 - 1) * cpw + x0 + i];
    if (mode == 0) {
        for (int by = 0; by < 2; by++)
            for (int bx = 0; bx < 2; bx++) {
                int use_l = has_l, use_t = has_t;
                if (bx == 1 && by == 0 && has_t)
                    use_l = 0;
                if (bx == 0 && by == 1 && has_l)
                    use_t = 0;
                i64 v;
                if (use_l && use_t) {
                    i64 sl = lcol[by * 4] + lcol[by * 4 + 1] + lcol[by * 4 + 2] + lcol[by * 4 + 3];
                    i64 st = trow[bx * 4] + trow[bx * 4 + 1] + trow[bx * 4 + 2] + trow[bx * 4 + 3];
                    v = (sl + st + 4) >> 3;
                } else if (use_l) {
                    i64 sl = lcol[by * 4] + lcol[by * 4 + 1] + lcol[by * 4 + 2] + lcol[by * 4 + 3];
                    v = (sl + 2) >> 2;
                } else if (use_t) {
                    i64 st = trow[bx * 4] + trow[bx * 4 + 1] + trow[bx * 4 + 2] + trow[bx * 4 + 3];
                    v = (st + 2) >> 2;
                } else {
                    v = 128;
                }
                for (int yy = 0; yy < 4; yy++)
                    for (int xx = 0; xx < 4; xx++)
                        pred[by * 4 + yy][bx * 4 + xx] = v;
            }
        return;
    }
    if (mode == 1) {
        if (!has_l)
            dec_fail(d, "chroma horizontal without left");
        for (int yy = 0; yy < 8; yy++)
            for (int xx = 0; xx < 8; xx++)
                pred[yy][xx] = lcol[yy];
        return;
    }
    if (mode == 2) {
        if (!has_t)
            dec_fail(d, "chroma vertical without top");
        for (int yy = 0; yy < 8; yy++)
            for (int xx = 0; xx < 8; xx++)
                pred[yy][xx] = trow[xx];
        return;
    }
    if (mode == 3) {
        if (!has_l || !has_t)
            dec_fail(d, "chroma plane without neighbours");
        i64 tl = plane[(long)(y0 - 1) * cpw + x0 - 1];
        pred8_chroma_plane(trow, lcol, tl, pred);
        return;
    }
    dec_fail(d, "chroma pred mode");
}

/* finish a luma AC/DC 4x4: dequant + IDCT with optional DC substitute */
static void finish_block4(const i64 *zz16, const i64 v[4][4], int qp,
                          int have_dc, i64 dc, i64 res[4][4])
{
    i64 dmat[4][4];
    dezigzag16(zz16, dmat);
    int sh = qp / 6;
    for (int r = 0; r < 4; r++)
        for (int c = 0; c < 4; c++)
            dmat[r][c] = (dmat[r][c] * v[r][c]) << sh;
    if (have_dc)
        dmat[0][0] = dc;
    i64 t[4][4];
    itransform4(dmat, t);
    for (int r = 0; r < 4; r++)
        for (int c = 0; c < 4; c++)
            res[r][c] = (t[r][c] + 32) >> 6;
}

/* luma DC scaling for I_16x16 (spec 8.5.10) */
static void i16_dc_scale(const i64 dc_zz[16], const i64 vy[4][4], int qp,
                         i64 dcs[4][4])
{
    i64 dz[4][4], f[4][4];
    dezigzag16(dc_zz, dz);
    ihadamard4((const i64(*)[4])dz, f);
    i64 v00 = vy[0][0];
    for (int r = 0; r < 4; r++)
        for (int c = 0; c < 4; c++) {
            if (qp >= 12)
                dcs[r][c] = (f[r][c] * v00) << (qp / 6 - 2);
            else
                dcs[r][c] = (f[r][c] * v00 + ((i64)1 << (1 - qp / 6))) >> (2 - qp / 6);
        }
}

/* chroma DC scale + per-block residual (shared CAVLC/CABAC finish) */
static void chroma_finish(const i64 cdc[2][4], const i64 cac[2][2][2][16],
                          const i64 vc[4][4], int qpc, i64 res[2][8][8])
{
    for (int ci = 0; ci < 2; ci++) {
        /* fdc = H2 @ [[c0,c1],[c2,c3]] @ H2 */
        i64 a = cdc[ci][0], b = cdc[ci][1], c = cdc[ci][2], dd = cdc[ci][3];
        i64 f00 = a + b + c + dd, f01 = a - b + c - dd;
        i64 f10 = a + b - c - dd, f11 = a - b - c + dd;
        i64 v00c = vc[0][0];
        int sh = qpc / 6;
        i64 dcs[2][2] = {
            {((f00 * v00c) << sh) >> 1, ((f01 * v00c) << sh) >> 1},
            {((f10 * v00c) << sh) >> 1, ((f11 * v00c) << sh) >> 1},
        };
        for (int by = 0; by < 2; by++)
            for (int bx = 0; bx < 2; bx++) {
                i64 blk[4][4];
                dezigzag16(cac[ci][by][bx], blk);
                for (int r = 0; r < 4; r++)
                    for (int cc = 0; cc < 4; cc++)
                        blk[r][cc] = (blk[r][cc] * vc[r][cc]) << sh;
                blk[0][0] = dcs[by][bx];
                i64 t[4][4];
                itransform4(blk, t);
                for (int r = 0; r < 4; r++)
                    for (int cc = 0; cc < 4; cc++)
                        res[ci][by * 4 + r][bx * 4 + cc] = (t[r][cc] + 32) >> 6;
            }
    }
}

/* CAVLC chroma residual syntax (= chroma_residuals / chroma_residuals_p) */
/* ------------------------------------------------------------------ */
/* High-profile 8x8 transform + Intra_8x8 (= ops/h264_8x8.py)           */
/* ------------------------------------------------------------------ */

/* 8x8 zig-zag (Table 8-8, frame): scan position -> raster index */
static const int ZZ8[64] = {
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
};

/* dequant norm-adjust (8.5.13.1), rows qp%6, cols position class */
static const int V8_TAB[6][6] = {
    {20, 18, 32, 19, 25, 24}, {22, 19, 35, 21, 28, 26},
    {26, 23, 42, 24, 33, 31}, {28, 25, 45, 26, 35, 33},
    {32, 28, 51, 30, 40, 38}, {36, 32, 58, 34, 46, 43},
};

static int v8_class(int i, int j)
{
    if (i % 4 == 0 && j % 4 == 0) return 0;
    if (i % 2 == 1 && j % 2 == 1) return 1;
    if (i % 4 == 2 && j % 4 == 2) return 2;
    if ((i % 4 == 0 && j % 2 == 1) || (i % 2 == 1 && j % 4 == 0)) return 3;
    if ((i % 4 == 0 && j % 4 == 2) || (i % 4 == 2 && j % 4 == 0)) return 4;
    return 5;
}

/* zz64 (scan order) -> dequantized raster 8x8 (flat weightScale = 16) */
static void dequant8_c(const i64 *zz64, int qp, i64 out[8][8])
{
    i64 m[8][8];
    memset(m, 0, sizeof(m));
    for (int s2 = 0; s2 < 64; s2++)
        m[ZZ8[s2] / 8][ZZ8[s2] % 8] = zz64[s2];
    int sh = qp / 6;
    for (int r = 0; r < 8; r++)
        for (int c = 0; c < 8; c++) {
            i64 v = (i64)V8_TAB[qp % 6][v8_class(r, c)] << 4;
            if (qp >= 36)
                out[r][c] = (m[r][c] * v) << (sh - 6);
            else
                out[r][c] = (m[r][c] * v + ((i64)1 << (5 - sh))) >> (6 - sh);
        }
}

/* one butterfly of the 8.5.13.2 inverse transform over x[0..7] */
static void it8_butterfly(const i64 x[8], i64 o[8])
{
    i64 e[8], f[8];
    e[0] = x[0] + x[4];
    e[1] = -x[3] + x[5] - x[7] - (x[7] >> 1);
    e[2] = x[0] - x[4];
    e[3] = x[1] + x[7] - x[3] - (x[3] >> 1);
    e[4] = (x[2] >> 1) - x[6];
    e[5] = -x[1] + x[7] + x[5] + (x[5] >> 1);
    e[6] = x[2] + (x[6] >> 1);
    e[7] = x[3] + x[5] + x[1] + (x[1] >> 1);
    f[0] = e[0] + e[6];
    f[1] = e[1] + (e[7] >> 2);
    f[2] = e[2] + e[4];
    f[3] = e[3] + (e[5] >> 2);
    f[4] = e[2] - e[4];
    f[5] = (e[3] >> 2) - e[5];
    f[6] = e[0] - e[6];
    f[7] = e[7] - (e[1] >> 2);
    o[0] = f[0] + f[7];
    o[1] = f[2] + f[5];
    o[2] = f[4] + f[3];
    o[3] = f[6] + f[1];
    o[4] = f[6] - f[1];
    o[5] = f[4] - f[3];
    o[6] = f[2] - f[5];
    o[7] = f[0] - f[7];
}

/* scan-order coefficients -> spatial residual (= recon_res8) */
static void recon_res8_c(const i64 *zz64, int qp, i64 res[8][8])
{
    i64 dq[8][8], h[8][8];
    dequant8_c(zz64, qp, dq);
    for (int r = 0; r < 8; r++) {   /* horizontal pass (rows first) */
        i64 o[8];
        it8_butterfly(dq[r], o);
        for (int c = 0; c < 8; c++)
            h[r][c] = o[c];
    }
    for (int c = 0; c < 8; c++) {   /* vertical pass */
        i64 x[8], o[8];
        for (int r = 0; r < 8; r++)
            x[r] = h[r][c];
        it8_butterfly(x, o);
        for (int r = 0; r < 8; r++)
            res[r][c] = (o[r] + 32) >> 6;
    }
}

/* reference-sample low-pass filter for Intra_8x8 (8.3.2.2.1);
   t16/l8 in-out, has_tl with tl value; (= filter_refs8) */
static void filter_refs8_c(i64 *t16, int has_t, i64 *l8, int has_l,
                           i64 *tl, int has_tl)
{
    i64 ft[16], fl[8], ftl = 0;
    if (has_t) {
        if (has_tl)
            ft[0] = (*tl + 2 * t16[0] + t16[1] + 2) >> 2;
        else
            ft[0] = (3 * t16[0] + t16[1] + 2) >> 2;
        for (int i = 1; i < 15; i++)
            ft[i] = (t16[i - 1] + 2 * t16[i] + t16[i + 1] + 2) >> 2;
        ft[15] = (t16[14] + 3 * t16[15] + 2) >> 2;
    }
    if (has_l) {
        if (has_tl)
            fl[0] = (*tl + 2 * l8[0] + l8[1] + 2) >> 2;
        else
            fl[0] = (3 * l8[0] + l8[1] + 2) >> 2;
        for (int i = 1; i < 7; i++)
            fl[i] = (l8[i - 1] + 2 * l8[i] + l8[i + 1] + 2) >> 2;
        fl[7] = (l8[6] + 3 * l8[7] + 2) >> 2;
    }
    if (has_tl) {
        if (has_t && has_l)
            ftl = (t16[0] + 2 * *tl + l8[0] + 2) >> 2;
        else if (has_t)
            ftl = (3 * *tl + t16[0] + 2) >> 2;
        else if (has_l)
            ftl = (3 * *tl + l8[0] + 2) >> 2;
        else
            ftl = *tl;
    }
    if (has_t)
        memcpy(t16, ft, sizeof(ft));
    if (has_l)
        memcpy(l8, fl, sizeof(fl));
    if (has_tl)
        *tl = ftl;
}

/* Intra_8x8 prediction from FILTERED references (= pred8x8) */
static void pred8x8_c(H264Dec *d, int mode, const i64 *t, int has_t,
                      const i64 *l, int has_l, i64 tl, int has_tl,
                      i64 p[8][8])
{
#define T4(i) ((i) == -1 ? tl : t[i])
#define L4(i) ((i) == -1 ? tl : l[i])
    switch (mode) {
    case 0:  /* Vertical */
        if (!has_t) dec_fail(d, "intra8x8 vertical without top");
        for (int y = 0; y < 8; y++)
            for (int x = 0; x < 8; x++)
                p[y][x] = t[x];
        break;
    case 1:  /* Horizontal */
        if (!has_l) dec_fail(d, "intra8x8 horizontal without left");
        for (int y = 0; y < 8; y++)
            for (int x = 0; x < 8; x++)
                p[y][x] = l[y];
        break;
    case 2: {  /* DC */
        i64 v;
        if (has_t && has_l) {
            i64 st = 0, sl = 0;
            for (int i = 0; i < 8; i++) { st += t[i]; sl += l[i]; }
            v = (st + sl + 8) >> 4;
        } else if (has_t) {
            i64 st = 0;
            for (int i = 0; i < 8; i++) st += t[i];
            v = (st + 4) >> 3;
        } else if (has_l) {
            i64 sl = 0;
            for (int i = 0; i < 8; i++) sl += l[i];
            v = (sl + 4) >> 3;
        } else {
            v = 128;
        }
        for (int y = 0; y < 8; y++)
            for (int x = 0; x < 8; x++)
                p[y][x] = v;
        break;
    }
    case 3:  /* Diagonal-Down-Left */
        if (!has_t) dec_fail(d, "intra8x8 ddl without top");
        for (int y = 0; y < 8; y++)
            for (int x = 0; x < 8; x++) {
                if (x == 7 && y == 7)
                    p[y][x] = (t[14] + 3 * t[15] + 2) >> 2;
                else
                    p[y][x] = (t[x + y] + 2 * t[x + y + 1] + t[x + y + 2] + 2) >> 2;
            }
        break;
    case 4:  /* Diagonal-Down-Right */
        if (!has_t || !has_l || !has_tl)
            dec_fail(d, "intra8x8 ddr without refs");
        for (int y = 0; y < 8; y++)
            for (int x = 0; x < 8; x++) {
                if (x > y)
                    p[y][x] = (T4(x - y - 2) + 2 * T4(x - y - 1) + t[x - y] + 2) >> 2;
                else if (x < y)
                    p[y][x] = (L4(y - x - 2) + 2 * L4(y - x - 1) + l[y - x] + 2) >> 2;
                else
                    p[y][x] = (t[0] + 2 * tl + l[0] + 2) >> 2;
            }
        break;
    case 5:  /* Vertical-Right */
        if (!has_t || !has_l || !has_tl)
            dec_fail(d, "intra8x8 vr without refs");
        for (int y = 0; y < 8; y++)
            for (int x = 0; x < 8; x++) {
                int z = 2 * x - y;
                if (z >= 0 && z % 2 == 0)
                    p[y][x] = (T4(x - (y >> 1) - 1) + T4(x - (y >> 1)) + 1) >> 1;
                else if (z >= 0)
                    p[y][x] = (T4(x - (y >> 1) - 2) + 2 * T4(x - (y >> 1) - 1)
                               + T4(x - (y >> 1)) + 2) >> 2;
                else if (z == -1)
                    p[y][x] = (l[0] + 2 * tl + t[0] + 2) >> 2;
                else
                    p[y][x] = (L4(y - 2 * x - 1) + 2 * L4(y - 2 * x - 2)
                               + L4(y - 2 * x - 3) + 2) >> 2;
            }
        break;
    case 6:  /* Horizontal-Down */
        if (!has_t || !has_l || !has_tl)
            dec_fail(d, "intra8x8 hd without refs");
        for (int y = 0; y < 8; y++)
            for (int x = 0; x < 8; x++) {
                int z = 2 * y - x;
                if (z >= 0 && z % 2 == 0)
                    p[y][x] = (L4(y - (x >> 1) - 1) + L4(y - (x >> 1)) + 1) >> 1;
                else if (z >= 0)
                    p[y][x] = (L4(y - (x >> 1) - 2) + 2 * L4(y - (x >> 1) - 1)
                               + L4(y - (x >> 1)) + 2) >> 2;
                else if (z == -1)
                    p[y][x] = (l[0] + 2 * tl + t[0] + 2) >> 2;
                else
                    p[y][x] = (T4(x - 2 * y - 1) + 2 * T4(x - 2 * y - 2)
                               + T4(x - 2 * y - 3) + 2) >> 2;
            }
        break;
    case 7:  /* Vertical-Left */
        if (!has_t) dec_fail(d, "intra8x8 vl without top");
        for (int y = 0; y < 8; y++)
            for (int x = 0; x < 8; x++) {
                if (y % 2 == 0)
                    p[y][x] = (t[x + (y >> 1)] + t[x + (y >> 1) + 1] + 1) >> 1;
                else
                    p[y][x] = (t[x + (y >> 1)] + 2 * t[x + (y >> 1) + 1]
                               + t[x + (y >> 1) + 2] + 2) >> 2;
            }
        break;
    case 8:  /* Horizontal-Up */
        if (!has_l) dec_fail(d, "intra8x8 hu without left");
        for (int y = 0; y < 8; y++)
            for (int x = 0; x < 8; x++) {
                int z = x + 2 * y;
                if (z < 13 && z % 2 == 0)
                    p[y][x] = (l[y + (x >> 1)] + l[y + (x >> 1) + 1] + 1) >> 1;
                else if (z < 13)
                    p[y][x] = (l[y + (x >> 1)] + 2 * l[y + (x >> 1) + 1]
                               + l[y + (x >> 1) + 2] + 2) >> 2;
                else if (z == 13)
                    p[y][x] = (l[6] + 3 * l[7] + 2) >> 2;
                else
                    p[y][x] = l[7];
            }
        break;
    default:
        dec_fail(d, "intra8x8 mode");
    }
#undef T4
#undef L4
}

/* UNFILTERED reference samples for the 8x8 block at (px, py), with
   top-right replication (= luma_neighbors8) */
static void luma_neighbors8_c(Slice *s, int px, int py, i64 *t16, int *has_t,
                              i64 *l8, int *has_l, i64 *tl, int *has_tl)
{
    H264Dec *d = s->d;
    uint8_t *Y = YP(d);
    long pw = d->pw;
    int gx = px / 4, gy = py / 4;
    int g4w = d->mbw * 4;
    *has_t = 0;
    *has_l = 0;
    *has_tl = 0;
    if (py > s->my0 * 16 && d->done4[(long)(gy - 1) * g4w + gx]
        && d->done4[(long)(gy - 1) * g4w + gx + 1]) {
        for (int i = 0; i < 8; i++)
            t16[i] = Y[(long)(py - 1) * pw + px + i];
        if (gx + 2 < g4w && d->done4[(long)(gy - 1) * g4w + gx + 2]) {
            for (int i = 0; i < 8; i++)
                t16[8 + i] = Y[(long)(py - 1) * pw + px + 8 + i];
        } else {
            for (int i = 0; i < 8; i++)
                t16[8 + i] = Y[(long)(py - 1) * pw + px + 7];
        }
        *has_t = 1;
    }
    if (px > 0 && d->done4[(long)gy * g4w + gx - 1]
        && d->done4[(long)(gy + 1) * g4w + gx - 1]) {
        for (int i = 0; i < 8; i++)
            l8[i] = Y[(long)(py + i) * pw + px - 1];
        *has_l = 1;
    }
    if (*has_t && *has_l) {
        *tl = Y[(long)(py - 1) * pw + px - 1];
        *has_tl = 1;
    }
}

/* the four prev/rem Intra_8x8 prediction modes, CAVLC bits
   (= read_intra8x8_modes_cavlc) */
static void read_intra8x8_modes_cavlc_c(Slice *s, BitReader *r, int mx,
                                        int my, int *modes)
{
    H264Dec *d = s->d;
    int g4w = d->mbw * 4;
    for (int b = 0; b < 4; b++) {
        int gx = mx * 4 + (b % 2) * 2;
        int gy = my * 4 + (b / 2) * 2;
        int ma = (gx > 0 && d->avail4[(long)gy * g4w + gx - 1])
                     ? (int)d->i4mode[(long)gy * g4w + gx - 1] : -1;
        int mb_ = (gy > s->my0 * 4 && d->avail4[(long)(gy - 1) * g4w + gx])
                      ? (int)d->i4mode[(long)(gy - 1) * g4w + gx] : -1;
        int pm = (ma >= 0 ? ma : 2) < (mb_ >= 0 ? mb_ : 2)
                     ? (ma >= 0 ? ma : 2) : (mb_ >= 0 ? mb_ : 2);
        if (ma < 0 || mb_ < 0)
            pm = 2;
        if (br_bit(r)) {
            modes[b] = pm;
        } else {
            int rem = (int)br_u(r, 3);
            modes[b] = rem < pm ? rem : rem + 1;
        }
        for (int dy = 0; dy < 2; dy++)
            for (int dx = 0; dx < 2; dx++) {
                long gi = (long)(gy + dy) * g4w + gx + dx;
                d->i4mode[gi] = modes[b];
                d->avail4[gi] = 1;
            }
    }
}

/* one 8x8 luma residual in CAVLC: four interleaved 4x4 blocks (7.3.5.3.2
   — coeff i of sub-block k -> scan position 4*i + k); per-cell nnz
   (= decode_luma8x8_block_cavlc) */
static void decode_luma8x8_block_cavlc_c(Slice *s, BitReader *r, int b,
                                         int mx, int my, int has, i64 *zz64)
{
    H264Dec *d = s->d;
    int g4w = d->mbw * 4;
    memset(zz64, 0, sizeof(i64) * 64);
    for (int k = 0; k < 4; k++) {
        int bx = BLK_ORDER[b * 4 + k][0], by = BLK_ORDER[b * 4 + k][1];
        int gx = mx * 4 + bx, gy = my * 4 + by;
        if (!has) {
            d->nnz_l[(long)gy * g4w + gx] = 0;
            continue;
        }
        int nc = nc_of(d->nnz_l, g4w, gx, gy, s->my0 * 4);
        i64 zz[16];
        cavlc_block(d, r, nc, 16, zz);
        int nz = 0;
        for (int i = 0; i < 16; i++) {
            zz64[k + 4 * i] = zz[i];
            nz += zz[i] != 0;
        }
        d->nnz_l[(long)gy * g4w + gx] = nz;
    }
}

/* reconstruct the four 8x8 luma blocks in decode order
   (= recon_intra8x8_luma); have[b] = block b carried residuals */
static void recon_intra8x8_luma_c(Slice *s, int mx, int my, const int *modes,
                                  const i64 zz64s[4][64], const int *have,
                                  int qp)
{
    H264Dec *d = s->d;
    uint8_t *Y = YP(d);
    long pw = d->pw;
    int g4w = d->mbw * 4;
    for (int b = 0; b < 4; b++) {
        int gx = mx * 4 + (b % 2) * 2;
        int gy = my * 4 + (b / 2) * 2;
        int px = gx * 4, py = gy * 4;
        i64 t16[16], l8[8], tl = 0;
        int has_t, has_l, has_tl;
        luma_neighbors8_c(s, px, py, t16, &has_t, l8, &has_l, &tl, &has_tl);
        filter_refs8_c(t16, has_t, l8, has_l, &tl, has_tl);
        i64 pred[8][8];
        pred8x8_c(d, modes[b], t16, has_t, l8, has_l, tl, has_tl, pred);
        i64 res[8][8];
        memset(res, 0, sizeof(res));
        if (have[b])
            recon_res8_c(zz64s[b], qp, res);
        for (int rr2 = 0; rr2 < 8; rr2++)
            for (int cc = 0; cc < 8; cc++)
                Y[(long)(py + rr2) * pw + px + cc] =
                    clip255(pred[rr2][cc] + res[rr2][cc]);
        for (int dy = 0; dy < 2; dy++)
            for (int dx = 0; dx < 2; dx++)
                d->done4[(long)(gy + dy) * g4w + gx + dx] = 1;
    }
}

static void chroma_residuals_cavlc(Slice *s, BitReader *r, int cbp_chroma,
                                   int mx, int my, const i64 vc[4][4],
                                   int qpc, i64 res[2][8][8])
{
    H264Dec *d = s->d;
    int g2w = d->mbw * 2;
    i64 cdc[2][4];
    i64 cac[2][2][2][16];
    memset(cdc, 0, sizeof(cdc));
    memset(cac, 0, sizeof(cac));
    if (cbp_chroma) {
        for (int ci = 0; ci < 2; ci++) {
            i64 zz[4];
            cavlc_block(d, r, -1, 4, zz);
            for (int i = 0; i < 4; i++)
                cdc[ci][i] = zz[i];
        }
    }
    if (cbp_chroma == 2) {
        static const int CBO[4][2] = {{0, 0}, {1, 0}, {0, 1}, {1, 1}};
        for (int ci = 0; ci < 2; ci++) {
            for (int k = 0; k < 4; k++) {
                int bx = CBO[k][0], by = CBO[k][1];
                int gx = mx * 2 + bx, gy = my * 2 + by;
                int nc = nc_of(d->nnz_c[ci], g2w, gx, gy, s->my0 * 2);
                i64 zz[15];
                cavlc_block(d, r, nc, 15, zz);
                int nz = 0;
                for (int i = 0; i < 15; i++) {
                    cac[ci][by][bx][1 + i] = zz[i];
                    nz += zz[i] != 0;
                }
                d->nnz_c[ci][(long)gy * g2w + gx] = nz;
            }
        }
    } else {
        for (int ci = 0; ci < 2; ci++)
            for (int by = 0; by < 2; by++)
                for (int bx = 0; bx < 2; bx++)
                    d->nnz_c[ci][(long)(my * 2 + by) * g2w + mx * 2 + bx] = 0;
    }
    chroma_finish((const i64(*)[4])cdc, (const i64(*)[2][2][16])cac, vc, qpc, res);
}

/* dezigzag helper for 15-coeff AC blocks into a 16-slot zz with zz[0]=0 */
/* (callers build the full 16-entry zz themselves) */

/* I_16x16 luma prediction selector (modes 0..3) */
static void pred16_select(Slice *s, int mx, int my, int pred_mode,
                          i64 pred[16][16])
{
    H264Dec *d = s->d;
    uint8_t *Y = YP(d);
    long pw = d->pw;
    int has_l = mx > 0, has_t = my > s->my0;
    i64 left[16], top[16];
    if (has_l)
        for (int i = 0; i < 16; i++)
            left[i] = Y[(long)(my * 16 + i) * pw + mx * 16 - 1];
    if (has_t)
        for (int i = 0; i < 16; i++)
            top[i] = Y[(long)(my * 16 - 1) * pw + mx * 16 + i];
    if (pred_mode == 0) {
        if (!has_t)
            dec_fail(d, "I16 vertical without top");
        for (int yy = 0; yy < 16; yy++)
            for (int xx = 0; xx < 16; xx++)
                pred[yy][xx] = top[xx];
    } else if (pred_mode == 1) {
        if (!has_l)
            dec_fail(d, "I16 horizontal without left");
        for (int yy = 0; yy < 16; yy++)
            for (int xx = 0; xx < 16; xx++)
                pred[yy][xx] = left[yy];
    } else if (pred_mode == 2) {
        i64 v;
        if (has_l && has_t) {
            i64 sl = 0, st = 0;
            for (int i = 0; i < 16; i++) {
                sl += left[i];
                st += top[i];
            }
            v = (sl + st + 16) >> 5;
        } else if (has_l) {
            i64 sl = 0;
            for (int i = 0; i < 16; i++)
                sl += left[i];
            v = (sl + 8) >> 4;
        } else if (has_t) {
            i64 st = 0;
            for (int i = 0; i < 16; i++)
                st += top[i];
            v = (st + 8) >> 4;
        } else {
            v = 128;
        }
        for (int yy = 0; yy < 16; yy++)
            for (int xx = 0; xx < 16; xx++)
                pred[yy][xx] = v;
    } else {
        if (!has_l || !has_t)
            dec_fail(d, "I16 plane without neighbours");
        i64 tl = Y[(long)(my * 16 - 1) * pw + mx * 16 - 1];
        pred16_plane(top, left, tl, pred);
    }
}

/* write an I_16x16 MB reconstruction given prediction + residual syntax */
static void recon_i16_luma(Slice *s, int mx, int my, const i64 pred[16][16],
                           const i64 dc_zz[16], const i64 ac[4][4][16],
                           const i64 vy[4][4], int qp)
{
    H264Dec *d = s->d;
    uint8_t *Y = YP(d);
    long pw = d->pw;
    i64 dcs[4][4];
    i16_dc_scale(dc_zz, vy, qp, dcs);
    for (int by = 0; by < 4; by++)
        for (int bx = 0; bx < 4; bx++) {
            i64 res[4][4];
            finish_block4(ac[by][bx], vy, qp, 1, dcs[by][bx], res);
            for (int r = 0; r < 4; r++)
                for (int c = 0; c < 4; c++)
                    Y[(long)(my * 16 + by * 4 + r) * pw + mx * 16 + bx * 4 + c] =
                        clip255(pred[by * 4 + r][bx * 4 + c] + res[r][c]);
        }
}

static void recon_chroma(Slice *s, int mx, int my, int chroma_mode,
                         const i64 cres[2][8][8])
{
    H264Dec *d = s->d;
    long cpw = d->cpw;
    uint8_t *planes[2] = {CBP(d), CRP(d)};
    for (int ci = 0; ci < 2; ci++) {
        i64 pred[8][8];
        chroma_pred_c(s, planes[ci], mx, my, chroma_mode, pred);
        for (int r = 0; r < 8; r++)
            for (int c = 0; c < 8; c++)
                planes[ci][(long)(my * 8 + r) * cpw + mx * 8 + c] =
                    clip255(pred[r][c] + cres[ci][r][c]);
    }
}

/* full Intra_4x4 macroblock, CAVLC — shared by I slices and intra-in-P
   (= the I-slice inline branch / _decode_intra4x4_cavlc) */
static void decode_intra4x4_cavlc_c(Slice *s, BitReader *r, int mx, int my)
{
    H264Dec *d = s->d;
    int g4w = d->mbw * 4;
    uint8_t *Y = YP(d);
    long pw = d->pw;
    int modes[16];
    for (int bi = 0; bi < 16; bi++) {
        int bx = BLK_ORDER[bi][0], by = BLK_ORDER[bi][1];
        int gx = mx * 4 + bx, gy = my * 4 + by;
        int ma = (gx > 0 && d->avail4[(long)gy * g4w + gx - 1])
                     ? (int)d->i4mode[(long)gy * g4w + gx - 1] : -1;
        int mb_ = (gy > s->my0 * 4 && d->avail4[(long)(gy - 1) * g4w + gx])
                      ? (int)d->i4mode[(long)(gy - 1) * g4w + gx] : -1;
        int pm = (ma >= 0 ? ma : 2) < (mb_ >= 0 ? mb_ : 2)
                     ? (ma >= 0 ? ma : 2) : (mb_ >= 0 ? mb_ : 2);
        if (ma < 0 || mb_ < 0)
            pm = 2;
        if (br_bit(r)) {
            modes[bi] = pm;
        } else {
            int rem = (int)br_u(r, 3);
            modes[bi] = rem < pm ? rem : rem + 1;
        }
        d->i4mode[(long)gy * g4w + gx] = modes[bi];
        d->avail4[(long)gy * g4w + gx] = 1;
    }
    int chroma_mode = (int)br_ue(r);
    int cbp_code = (int)br_ue(r);
    if (cbp_code >= 48)
        dec_fail(d, "bad coded_block_pattern");
    int cbp = CBP_INTRA[cbp_code];
    int cbp_luma = cbp & 15, cbp_chroma = cbp >> 4;
    if (cbp_chroma == 3)
        dec_fail(d, "bad chroma cbp");
    if (cbp)
        s->qp += br_se(r);
    int qpc = chroma_qp((s->qp + d->pps.chroma_off) < 0 ? 0 :
                        ((s->qp + d->pps.chroma_off) > 51 ? 51 : s->qp + d->pps.chroma_off));
    i64 vy[4][4], vc[4][4];
    vmat(s->qp, vy);
    vmat(qpc, vc);
    for (int bi = 0; bi < 16; bi++) {
        int bx = BLK_ORDER[bi][0], by = BLK_ORDER[bi][1];
        int gx = mx * 4 + bx, gy = my * 4 + by;
        int px = gx * 4, py = gy * 4;
        int mode = modes[bi];
        int need_tr = mode == 3 || mode == 7;
        i64 t8[8], l4[4];
        int has_t, has_l, tl;
        luma_neighbors(s, px, py, need_tr, t8, &has_t, l4, &has_l, &tl);
        i64 pred[4][4];
        pred4x4(d, mode, has_t ? t8 : NULL, has_l ? l4 : NULL, tl, pred);
        int has = (cbp_luma >> (bi / 4)) & 1;
        i64 res[4][4] = {{0}};
        if (has) {
            int nc = nc_of(d->nnz_l, g4w, gx, gy, s->my0 * 4);
            i64 zz[16];
            cavlc_block(d, r, nc, 16, zz);
            int nz = 0;
            for (int i = 0; i < 16; i++)
                nz += zz[i] != 0;
            d->nnz_l[(long)gy * g4w + gx] = nz;
            finish_block4(zz, (const i64(*)[4])vy, s->qp, 0, 0, res);
        } else {
            d->nnz_l[(long)gy * g4w + gx] = 0;
        }
        for (int rr2 = 0; rr2 < 4; rr2++)
            for (int cc = 0; cc < 4; cc++)
                Y[(long)(py + rr2) * pw + px + cc] =
                    clip255(pred[rr2][cc] + res[rr2][cc]);
        d->done4[(long)gy * g4w + gx] = 1;
    }
    i64 cres[2][8][8];
    chroma_residuals_cavlc(s, r, cbp_chroma, mx, my, (const i64(*)[4])vc,
                           qpc, cres);
    recon_chroma(s, mx, my, chroma_mode, (const i64(*)[8][8])cres);
}

/* full Intra_8x8 macroblock, CAVLC — shared by I slices and intra-in-P
   (= _decode_intra8x8_cavlc); the transform_size_8x8_flag bit was
   already consumed by the caller */
static void decode_intra8x8_cavlc_c(Slice *s, BitReader *r, int mx, int my)
{
    H264Dec *d = s->d;
    int modes[4];
    read_intra8x8_modes_cavlc_c(s, r, mx, my, modes);
    int chroma_mode = (int)br_ue(r);
    int cbp_code = (int)br_ue(r);
    if (cbp_code >= 48)
        dec_fail(d, "bad coded_block_pattern");
    int cbp = CBP_INTRA[cbp_code];
    int cbp_luma = cbp & 15, cbp_chroma = cbp >> 4;
    if (cbp_chroma == 3)
        dec_fail(d, "bad chroma cbp");
    if (cbp)
        s->qp += br_se(r);
    int qpc = chroma_qp((s->qp + d->pps.chroma_off) < 0 ? 0 :
                        ((s->qp + d->pps.chroma_off) > 51 ? 51 : s->qp + d->pps.chroma_off));
    i64 vc[4][4];
    vmat(qpc, vc);
    i64 zz64s[4][64];
    int have[4];
    for (int b = 0; b < 4; b++) {
        have[b] = (cbp_luma >> b) & 1;
        decode_luma8x8_block_cavlc_c(s, r, b, mx, my, have[b], zz64s[b]);
    }
    recon_intra8x8_luma_c(s, mx, my, modes, (const i64(*)[64])zz64s, have,
                          s->qp);
    i64 cres[2][8][8];
    chroma_residuals_cavlc(s, r, cbp_chroma, mx, my, (const i64(*)[4])vc,
                           qpc, cres);
    recon_chroma(s, mx, my, chroma_mode, (const i64(*)[8][8])cres);
    d->db_t8x8[(long)my * d->mbw + mx] = 1;
}

/* ------------------------------------------------------------------ */
/* CAVLC I slice (= IntraDecoder._decode_slice)                        */
/* ------------------------------------------------------------------ */

static void parse_dbf(H264Dec *d, BitReader *r, int *idc, int *offa, int *offb)
{
    *idc = 0; *offa = 0; *offb = 0;
    if (d->pps.dbf_ctrl) {
        *idc = (int)br_ue(r);
        if (*idc > 2)
            dec_fail(d, "deblock idc");
        if (*idc != 1) {
            *offa = br_se(r) * 2;
            *offb = br_se(r) * 2;
        }
    }
}

static void reset_slice_grids(H264Dec *d)
{
    long g4 = (long)d->mbh * 4 * d->mbw * 4;
    long g2 = (long)d->mbh * 2 * d->mbw * 2;
    memset(d->dec4, 0, (size_t)g4);
    memset(d->rd4, 0, (size_t)g4);
    memset(d->rd4b, 0, (size_t)g4);
    memset(d->dir4, 0, (size_t)g4);
    memset(d->done4, 0, (size_t)g4);
    memset(d->avail4, 0, (size_t)g4);
    for (long i = 0; i < g4; i++)
        d->i4mode[i] = 2;
    memset(d->nnz_c[0], 0, (size_t)g2 * 4);
    memset(d->nnz_c[1], 0, (size_t)g2 * 4);
}

static void decode_slice_cavlc_i(H264Dec *d, const uint8_t *rbsp, long rlen,
                                 int slice_id)
{
    BitReader rr = {rbsp, rlen, 0, d};
    BitReader *r = &rr;
    Slice sl = {0};
    Slice *s = &sl;
    s->d = d;
    s->slice_id = slice_id;
    int first_mb = (int)br_ue(r);
    int st = (int)br_ue(r);
    if (st % 5 != 2)
        dec_fail(d, "not an I slice");
    br_ue(r);                       /* pps id */
    br_u(r, d->sps.log2_mfn);       /* frame_num */
    br_ue(r);                       /* idr_pic_id */
    if (d->sps.poc_type == 0)
        br_u(r, d->sps.log2_poc);
    br_u(r, 1); br_u(r, 1);         /* dec_ref_pic_marking */
    s->qp = d->pps.init_qp + br_se(r);
    parse_dbf(d, r, &s->dbf_idc, &s->dbf_offa, &s->dbf_offb);
    int mbw = d->mbw, mbh = d->mbh;
    if (first_mb % mbw)
        dec_fail(d, "slices must start at an MB row");
    s->my0 = first_mb / mbw;
    reset_slice_grids(d);
    long stop_pos = rbsp_stop_pos(rbsp, rlen);
    int g4w = mbw * 4;
    uint8_t *Y = YP(d);
    long pw = d->pw, cpw = d->cpw;

    long n_mbs = (long)mbw * mbh;
    long mb_addr = first_mb;
    while (r->pos < stop_pos) {
        if (mb_addr >= n_mbs)
            dec_fail(d, "mb address out of range");
        int my = (int)(mb_addr / mbw), mx = (int)(mb_addr % mbw);
        mb_addr++;
        int qpc = chroma_qp((s->qp + d->pps.chroma_off) < 0 ? 0 :
                            ((s->qp + d->pps.chroma_off) > 51 ? 51 : s->qp + d->pps.chroma_off));
        i64 vy[4][4], vc[4][4];
        vmat(s->qp, vy);
        vmat(qpc, vc);
        int mb_type = (int)br_ue(r);
        if (mb_type == 25) { /* I_PCM */
            br_align(r);
            for (int i = 0; i < 16; i++)
                for (int j = 0; j < 16; j++)
                    Y[(long)(my * 16 + i) * pw + mx * 16 + j] = (uint8_t)br_u(r, 8);
            uint8_t *planes[2] = {CBP(d), CRP(d)};
            for (int ci = 0; ci < 2; ci++)
                for (int i = 0; i < 8; i++)
                    for (int j = 0; j < 8; j++)
                        planes[ci][(long)(my * 8 + i) * cpw + mx * 8 + j] =
                            (uint8_t)br_u(r, 8);
            for (int by = 0; by < 4; by++)
                for (int bx = 0; bx < 4; bx++) {
                    long gi = (long)(my * 4 + by) * g4w + mx * 4 + bx;
                    d->nnz_l[gi] = 16;
                    d->done4[gi] = 1;
                    d->avail4[gi] = 1;
                    d->i4mode[gi] = 2;
                }
            int g2w = mbw * 2;
            for (int ci = 0; ci < 2; ci++)
                for (int by = 0; by < 2; by++)
                    for (int bx = 0; bx < 2; bx++)
                        d->nnz_c[ci][(long)(my * 2 + by) * g2w + mx * 2 + bx] = 16;
            record_mb(s, my, mx, 1, 1);
            continue;
        }

        if (mb_type == 0 && d->pps.transform_8x8 && br_bit(r)) {
            /* I_NxN with transform_size_8x8_flag == 1 (Intra_8x8) */
            decode_intra8x8_cavlc_c(s, r, mx, my);
            record_mb(s, my, mx, 1, 0);
            continue;
        }

        if (mb_type == 0) { /* I_4x4 */
            decode_intra4x4_cavlc_c(s, r, mx, my);
            record_mb(s, my, mx, 1, 0);
            continue;
        }

        if (mb_type < 1 || mb_type > 24)
            dec_fail(d, "mb_type");
        int t = mb_type - 1;
        int pred_mode = t % 4;
        int cbp_chroma = (t / 4) % 3;
        int cbp_luma = t >= 12 ? 15 : 0;
        int chroma_mode = (int)br_ue(r);
        s->qp += br_se(r);
        qpc = chroma_qp((s->qp + d->pps.chroma_off) < 0 ? 0 :
                        ((s->qp + d->pps.chroma_off) > 51 ? 51 : s->qp + d->pps.chroma_off));
        vmat(s->qp, vy);
        vmat(qpc, vc);
        for (int by = 0; by < 4; by++)
            for (int bx = 0; bx < 4; bx++) {
                long gi = (long)(my * 4 + by) * g4w + mx * 4 + bx;
                d->i4mode[gi] = 2;
                d->avail4[gi] = 1;
            }
        int nc0 = nc_of(d->nnz_l, g4w, mx * 4, my * 4, s->my0 * 4);
        i64 dc_zz[16];
        cavlc_block(d, r, nc0, 16, dc_zz);
        i64 ac[4][4][16];
        memset(ac, 0, sizeof(ac));
        if (cbp_luma) {
            for (int bi = 0; bi < 16; bi++) {
                int bx = BLK_ORDER[bi][0], by = BLK_ORDER[bi][1];
                int gx = mx * 4 + bx, gy = my * 4 + by;
                int nc = nc_of(d->nnz_l, g4w, gx, gy, s->my0 * 4);
                i64 zz[15];
                cavlc_block(d, r, nc, 15, zz);
                int nz = 0;
                for (int i = 0; i < 15; i++) {
                    ac[by][bx][1 + i] = zz[i];
                    nz += zz[i] != 0;
                }
                d->nnz_l[(long)gy * g4w + gx] = nz;
            }
        } else {
            for (int by = 0; by < 4; by++)
                for (int bx = 0; bx < 4; bx++)
                    d->nnz_l[(long)(my * 4 + by) * g4w + mx * 4 + bx] = 0;
        }
        i64 pred16[16][16];
        pred16_select(s, mx, my, pred_mode, pred16);
        recon_i16_luma(s, mx, my, (const i64(*)[16])pred16, dc_zz,
                       (const i64(*)[4][16])ac, (const i64(*)[4])vy, s->qp);
        for (int by = 0; by < 4; by++)
            for (int bx = 0; bx < 4; bx++)
                d->done4[(long)(my * 4 + by) * g4w + mx * 4 + bx] = 1;
        i64 cres[2][8][8];
        chroma_residuals_cavlc(s, r, cbp_chroma, mx, my, (const i64(*)[4])vc,
                               qpc, cres);
        recon_chroma(s, mx, my, chroma_mode, (const i64(*)[8][8])cres);
        record_mb(s, my, mx, 1, 0);
    }
}

/* ------------------------------------------------------------------ */
/* CAVLC P slice (= StreamDecoder._decode_slice_p)                     */
/* ------------------------------------------------------------------ */

/* ref_pic_list_modification (7.3.3.1 + 8.2.4.3.1) + pred_weight_table
 * (7.3.3.2) -> s->l0map / s->w*.  The insert-and-compact process keeps
 * earlier duplicates, which is how x264's weightp=2 binds two weight
 * sets to one reference picture. */
static void parse_ref_mod_list(H264Dec *d, BitReader *r, int active,
                               const int *init, int init_n, int *out)
{
    if (active > MAX_L0)
        dec_fail(d, "lX_active too large");
    int nrefs = d->dpb_n;
    int lst[MAX_REFS + MAX_L0];
    int lst_n = init_n;
    for (int i = 0; i < init_n; i++)
        lst[i] = init[i];
    int max_fn = 1 << d->sps.log2_mfn;
    int cur_fn = d->cur_frame_num;
    if (br_bit(r)) {                /* ref_pic_list_modification_flag_l0 */
        int pred = cur_fn, refidx = 0;
        for (;;) {
            long idc = br_ue(r);
            if (idc == 3)
                break;
            if (idc > 1)
                dec_fail(d, "long-term ref modification");
            int ad = (int)br_ue(r) + 1;
            int nowrap = idc == 0 ? pred - ad : pred + ad;
            if (nowrap < 0)
                nowrap += max_fn;
            else if (nowrap >= max_fn)
                nowrap -= max_fn;
            pred = nowrap;
            int pn = nowrap - (nowrap > cur_fn ? max_fn : 0);
            int tgt = -1;
            for (int i = 0; i < nrefs; i++) {
                int fn = d->dpb_fn[i];
                if ((fn > cur_fn ? fn - max_fn : fn) == pn) {
                    tgt = i;
                    break;
                }
            }
            if (tgt < 0)
                dec_fail(d, "ref modification PicNum not in DPB");
            int out[MAX_REFS + MAX_L0];
            int on = 0;
            for (int i = 0; i < refidx && i < lst_n; i++)
                out[on++] = lst[i];
            out[on++] = tgt;
            for (int i = refidx; i < lst_n; i++) {
                int fn = d->dpb_fn[lst[i]];
                if ((fn > cur_fn ? fn - max_fn : fn) != pn
                        && on < MAX_REFS + MAX_L0)
                    out[on++] = lst[i];
            }
            memcpy(lst, out, (size_t)on * sizeof(int));
            lst_n = on;
            if (++refidx > MAX_L0)
                dec_fail(d, "too many ref modifications");
        }
        if (active > lst_n)
            dec_fail(d, "modified ref list too short");
    } else if (active > init_n) {
        dec_fail(d, "active refs > decoded");
    }
    for (int i = 0; i < active; i++)
        out[i] = lst[i];
}

static void parse_weight_entries(H264Dec *d, BitReader *r, int n,
                                 int ld, int cd, int *wl, int *wo,
                                 int wcw[][2], int wco[][2])
{
    for (int i = 0; i < n; i++) {
        if (br_bit(r)) {
            wl[i] = (int)br_se(r);
            wo[i] = (int)br_se(r);
        } else {
            wl[i] = 1 << ld;
            wo[i] = 0;
        }
        if (br_bit(r)) {
            for (int j = 0; j < 2; j++) {
                wcw[i][j] = (int)br_se(r);
                wco[i][j] = (int)br_se(r);
            }
        } else {
            for (int j = 0; j < 2; j++) {
                wcw[i][j] = 1 << cd;
                wco[i][j] = 0;
            }
        }
    }
}

/* B list initialization: POC-sorted short-term refs (8.2.4.2.3) */
static void b_list_init_c(H264Dec *d, long cur_poc,
                          int *i0, int *n0, int *i1, int *n1)
{
    int before[MAX_REFS], after[MAX_REFS];
    int nb = 0, na = 0;
    /* before: poc < cur, descending; after: poc > cur, ascending */
    int order[MAX_REFS];
    for (int i = 0; i < d->dpb_n; i++)
        order[i] = i;
    /* simple selection sorts (dpb_n <= 16) */
    for (int i = 0; i < d->dpb_n; i++)
        if (d->dpb_poc[i] < cur_poc)
            before[nb++] = i;
    for (int i = 0; i < nb; i++)
        for (int j = i + 1; j < nb; j++)
            if (d->dpb_poc[before[j]] > d->dpb_poc[before[i]]) {
                int t = before[i]; before[i] = before[j]; before[j] = t;
            }
    for (int i = 0; i < d->dpb_n; i++)
        if (d->dpb_poc[i] > cur_poc)
            after[na++] = i;
    for (int i = 0; i < na; i++)
        for (int j = i + 1; j < na; j++)
            if (d->dpb_poc[after[j]] < d->dpb_poc[after[i]]) {
                int t = after[i]; after[i] = after[j]; after[j] = t;
            }
    (void)order;
    *n0 = *n1 = nb + na;
    for (int i = 0; i < nb; i++)
        i0[i] = before[i];
    for (int i = 0; i < na; i++)
        i0[nb + i] = after[i];
    for (int i = 0; i < na; i++)
        i1[i] = after[i];
    for (int i = 0; i < nb; i++)
        i1[na + i] = before[i];
    if (*n1 >= 2) {
        int same = 1;
        for (int i = 0; i < *n0; i++)
            if (i0[i] != i1[i])
                same = 0;
        if (same) {
            int t = i1[0];
            i1[0] = i1[1];
            i1[1] = t;
        }
    }
}

/* shared P/B slice-header tail: lists, weights, dec_ref_pic_marking */
static void parse_inter_header(H264Dec *d, struct Slice *s, BitReader *r,
                               int ref_idc)
{
    int l0_active = d->pps.l0_default;
    int l1_active = s->is_b ? d->pps.l1_default : 0;
    if (br_bit(r)) {
        l0_active = (int)br_ue(r) + 1;
        if (s->is_b)
            l1_active = (int)br_ue(r) + 1;
    }
    int ident[MAX_REFS];
    for (int i = 0; i < d->dpb_n; i++)
        ident[i] = i;
    if (s->is_b) {
        int i0[MAX_REFS], i1[MAX_REFS], n0, n1;
        b_list_init_c(d, s->cur_poc, i0, &n0, i1, &n1);
        parse_ref_mod_list(d, r, l0_active, i0, n0, s->l0map);
        parse_ref_mod_list(d, r, l1_active, i1, n1, s->l1map);
    } else {
        parse_ref_mod_list(d, r, l0_active, ident, d->dpb_n, s->l0map);
    }
    s->l0_active = l0_active;
    s->l1_active = l1_active;
    s->wbidc = s->is_b ? d->pps.weighted_bipred : 0;
    s->wp_on = 0;
    if (!s->is_b && d->pps.weighted_pred) {
        s->wp_on = 1;
        int ld = (int)br_ue(r), cd = (int)br_ue(r);
        if (ld > 7 || cd > 7)
            dec_fail(d, "weight denom > 7");
        s->wp_ld = ld;
        s->wp_cd = cd;
        parse_weight_entries(d, r, l0_active, ld, cd, s->wl, s->wo,
                             s->wcw, s->wco);
    } else if (s->is_b && s->wbidc == 1) {
        s->wp_on = 1;
        int ld = (int)br_ue(r), cd = (int)br_ue(r);
        if (ld > 7 || cd > 7)
            dec_fail(d, "weight denom > 7");
        s->wp_ld = ld;
        s->wp_cd = cd;
        parse_weight_entries(d, r, l0_active, ld, cd, s->wl, s->wo,
                             s->wcw, s->wco);
        parse_weight_entries(d, r, l1_active, ld, cd, s->wl1, s->wo1,
                             s->wcw1, s->wco1);
    }
    if (ref_idc) {  /* dec_ref_pic_marking only on reference pictures */
        if (br_bit(r)) {
            /* MMCO (8.2.5.4): op 1 drops one short-term ref NOW (the
               spec applies marking at storage time; x264's b-pyramid
               commands never name a ref the CURRENT slice still uses
               after this point in our decode order, and the current
               picture is not in the DPB yet) */
            for (;;) {
                long op = br_ue(r);
                if (op == 0)
                    break;
                if (op != 1)
                    dec_fail(d, "MMCO op");
                int diff = (int)br_ue(r) + 1;
                int max_fn = 1 << d->sps.log2_mfn;
                int pnx = d->cur_frame_num - diff;
                for (int i = 0; i < d->dpb_n; i++) {
                    int fn = d->dpb_fn[i];
                    int pn = fn > d->cur_frame_num ? fn - max_fn : fn;
                    if (pn == pnx) {
                        d->mmco_drop[d->mmco_n++ & 15] = d->dpb_pid[i];
                        break;
                    }
                }
            }
        }
    }
    s->colpic = (s->is_b && l1_active > 0) ? &d->dpb[s->l1map[0]] : NULL;
}

/* explicit weighted sample prediction, one list (8.4.2.3.2) */
static inline i64 wsample(i64 v, int w, int o, int ld)
{
    i64 p = ld ? ((v * w + ((i64)1 << (ld - 1))) >> ld) : v * w;
    p += o;
    return p < 0 ? 0 : (p > 255 ? 255 : p);
}

static int read_refidx_cavlc(H264Dec *d, BitReader *r, int l0_active)
{
    if (l0_active <= 1)
        return 0;
    int ri = (l0_active == 2) ? (1 - (int)br_u(r, 1)) : (int)br_ue(r);
    if (ri >= l0_active)
        dec_fail(d, "ref_idx out of range");
    return ri;
}

/* MC one partition into the MB-local prediction buffers */
static void part_pred_c(Slice *s, int mx, int my, int gy, int gx,
                        int pw4, int ph4, int mvx, int mvy, int ri,
                        i64 pred16[16][16], i64 predc[2][8][8])
{
    H264Dec *d = s->d;
    if (ri < 0 || ri >= s->l0_active)
        dec_fail(d, "ref_idx beyond list");
    int di = s->l0map[ri];
    if (di < 0 || di >= d->dpb_n)
        dec_fail(d, "ref_idx beyond DPB");
    RefPic *ref = &d->dpb[di];
    int ly = (gy - my * 4) * 4, lx = (gx - mx * 4) * 4;
    mc_luma_c(d, ref, gx * 4, gy * 4, mvx, mvy, pw4 * 4, ph4 * 4,
              &pred16[ly][lx], 16);
    int cy2 = ly / 2, cx2 = lx / 2;
    mc_chroma_c(d, ref->cb, gx * 2, gy * 2, mvx, mvy, pw4 * 2, ph4 * 2,
                &predc[0][cy2][cx2], 8);
    mc_chroma_c(d, ref->cr, gx * 2, gy * 2, mvx, mvy, pw4 * 2, ph4 * 2,
                &predc[1][cy2][cx2], 8);
    if (s->wp_on) {
        int w = s->wl[ri], o = s->wo[ri], ld = s->wp_ld;
        for (int yy = 0; yy < ph4 * 4; yy++)
            for (int xx = 0; xx < pw4 * 4; xx++)
                pred16[ly + yy][lx + xx] =
                    wsample(pred16[ly + yy][lx + xx], w, o, ld);
        for (int ci = 0; ci < 2; ci++) {
            int wc = s->wcw[ri][ci], oc = s->wco[ri][ci], cdn = s->wp_cd;
            for (int yy = 0; yy < ph4 * 2; yy++)
                for (int xx = 0; xx < pw4 * 2; xx++)
                    predc[ci][cy2 + yy][cx2 + xx] =
                        wsample(predc[ci][cy2 + yy][cx2 + xx], wc, oc, cdn);
        }
    }
}

static void fill4_c(Slice *s, int gy, int gx, int pw4, int ph4,
                    int mvx, int mvy, int ri)
{
    H264Dec *d = s->d;
    int g4w = d->mbw * 4;
    int pid = d->dpb_pid[s->l0map[ri]];
    for (int yy = 0; yy < ph4; yy++)
        for (int xx = 0; xx < pw4; xx++) {
            long gi = (long)(gy + yy) * g4w + gx + xx;
            d->mv4[gi * 2] = mvx;
            d->mv4[gi * 2 + 1] = mvy;
            d->ref4[gi] = ri;
            d->pid4[gi] = pid;
            d->dec4[gi] = 1;
        }
}

static void recon_p_mb(Slice *s, int mx, int my, const i64 pred16[16][16],
                       const i64 predc[2][8][8], const i64 lres[16][16],
                       const i64 cres[2][8][8])
{
    H264Dec *d = s->d;
    uint8_t *Y = YP(d);
    long pw = d->pw, cpw = d->cpw;
    for (int r = 0; r < 16; r++)
        for (int c = 0; c < 16; c++)
            Y[(long)(my * 16 + r) * pw + mx * 16 + c] =
                clip255(pred16[r][c] + lres[r][c]);
    uint8_t *planes[2] = {CBP(d), CRP(d)};
    for (int ci = 0; ci < 2; ci++)
        for (int r = 0; r < 8; r++)
            for (int c = 0; c < 8; c++)
                planes[ci][(long)(my * 8 + r) * cpw + mx * 8 + c] =
                    clip255(predc[ci][r][c] + cres[ci][r][c]);
}

/* I_16x16 inside a P slice (= _decode_i16_in_p) */
static void decode_i16_in_p_cavlc(Slice *s, BitReader *r, int t_code,
                                  int mx, int my)
{
    H264Dec *d = s->d;
    int g4w = d->mbw * 4;
    int t = t_code - 1;
    int pred_mode = t % 4;
    int cbp_chroma = (t / 4) % 3;
    int cbp_luma = t >= 12 ? 15 : 0;
    int chroma_mode = (int)br_ue(r);
    s->qp += br_se(r);
    int qpc = chroma_qp((s->qp + d->pps.chroma_off) < 0 ? 0 :
                        ((s->qp + d->pps.chroma_off) > 51 ? 51 : s->qp + d->pps.chroma_off));
    i64 vy[4][4], vc[4][4];
    vmat(s->qp, vy);
    vmat(qpc, vc);
    int nc0 = nc_of(d->nnz_l, g4w, mx * 4, my * 4, s->my0 * 4);
    i64 dc_zz[16];
    cavlc_block(d, r, nc0, 16, dc_zz);
    i64 ac[4][4][16];
    memset(ac, 0, sizeof(ac));
    if (cbp_luma) {
        for (int bi = 0; bi < 16; bi++) {
            int bx = BLK_ORDER[bi][0], by = BLK_ORDER[bi][1];
            int gx = mx * 4 + bx, gy = my * 4 + by;
            int nc = nc_of(d->nnz_l, g4w, gx, gy, s->my0 * 4);
            i64 zz[15];
            cavlc_block(d, r, nc, 15, zz);
            int nz = 0;
            for (int i = 0; i < 15; i++) {
                ac[by][bx][1 + i] = zz[i];
                nz += zz[i] != 0;
            }
            d->nnz_l[(long)gy * g4w + gx] = nz;
        }
    } else {
        for (int by = 0; by < 4; by++)
            for (int bx = 0; bx < 4; bx++)
                d->nnz_l[(long)(my * 4 + by) * g4w + mx * 4 + bx] = 0;
    }
    i64 pred16[16][16];
    pred16_select(s, mx, my, pred_mode, pred16);
    recon_i16_luma(s, mx, my, (const i64(*)[16])pred16, dc_zz,
                   (const i64(*)[4][16])ac, (const i64(*)[4])vy, s->qp);
    i64 cres[2][8][8];
    chroma_residuals_cavlc(s, r, cbp_chroma, mx, my, (const i64(*)[4])vc,
                           qpc, cres);
    recon_chroma(s, mx, my, chroma_mode, (const i64(*)[8][8])cres);
}

/* ------------------------------------------------------------------ */
/* B-slice machinery (spatial direct, bipred, per-list fills)           */
/* ------------------------------------------------------------------ */

/* spec '/': truncation toward zero */
static inline long cdiv_c(long a, long b)
{
    long q = (a < 0 ? -a : a) / (b < 0 ? -b : b);
    return ((a < 0) == (b < 0)) ? q : -q;
}

/* implicit bipred weights (8.4.2.3.1), logWD = 5 */
static void implicit_w_c(long cur, long p0, long p1, int *w0, int *w1)
{
    if (p0 == p1) {
        *w0 = *w1 = 32;
        return;
    }
    long tb = cur - p0;
    if (tb < -128) tb = -128; else if (tb > 127) tb = 127;
    long td = p1 - p0;
    if (td < -128) td = -128; else if (td > 127) td = 127;
    long tx = cdiv_c(16384 + (td < 0 ? -(td / 2) : td / 2), td);
    long dsf = (tb * tx + 32) >> 6;
    if (dsf < -1024) dsf = -1024; else if (dsf > 1023) dsf = 1023;
    long w1v = dsf >> 2;
    if (w1v < -64 || w1v > 128) {
        *w0 = *w1 = 32;
        return;
    }
    *w1 = (int)w1v;
    *w0 = (int)(64 - w1v);
}

/* one list's clipped prediction for a partition, explicit weights
 * applied, written into temp MB-shaped buffers at the partition slot */
static void mc_list_c(Slice *s, int lst, int mx, int my, int gy, int gx,
                      int pw4, int ph4, int mvx, int mvy, int ri,
                      int weighted, i64 lum[16][16], i64 chr[2][8][8])
{
    H264Dec *d = s->d;
    const int *lmap = lst ? s->l1map : s->l0map;
    int act = lst ? s->l1_active : s->l0_active;
    if (ri < 0 || ri >= act)
        dec_fail(d, "ref_idx beyond list");
    int di = lmap[ri];
    if (di < 0 || di >= d->dpb_n)
        dec_fail(d, "ref_idx beyond DPB");
    RefPic *ref = &d->dpb[di];
    int ly = (gy - my * 4) * 4, lx = (gx - mx * 4) * 4;
    mc_luma_c(d, ref, gx * 4, gy * 4, mvx, mvy, pw4 * 4, ph4 * 4,
              &lum[ly][lx], 16);
    int cy2 = ly / 2, cx2 = lx / 2;
    mc_chroma_c(d, ref->cb, gx * 2, gy * 2, mvx, mvy, pw4 * 2, ph4 * 2,
                &chr[0][cy2][cx2], 8);
    mc_chroma_c(d, ref->cr, gx * 2, gy * 2, mvx, mvy, pw4 * 2, ph4 * 2,
                &chr[1][cy2][cx2], 8);
    if (weighted && s->wp_on) {
        int w = lst ? s->wl1[ri] : s->wl[ri];
        int o = lst ? s->wo1[ri] : s->wo[ri];
        int ld = s->wp_ld;
        for (int yy = 0; yy < ph4 * 4; yy++)
            for (int xx = 0; xx < pw4 * 4; xx++)
                lum[ly + yy][lx + xx] =
                    wsample(lum[ly + yy][lx + xx], w, o, ld);
        for (int ci = 0; ci < 2; ci++) {
            int wc = lst ? s->wcw1[ri][ci] : s->wcw[ri][ci];
            int oc = lst ? s->wco1[ri][ci] : s->wco[ri][ci];
            int cd = s->wp_cd;
            for (int yy = 0; yy < ph4 * 2; yy++)
                for (int xx = 0; xx < pw4 * 2; xx++)
                    chr[ci][cy2 + yy][cx2 + xx] =
                        wsample(chr[ci][cy2 + yy][cx2 + xx], wc, oc, cd);
        }
    }
}

static inline i64 clip255_c(i64 v)
{
    return v < 0 ? 0 : (v > 255 ? 255 : v);
}

/* B partition prediction into the MB buffers: mono L0/L1 or bipred
 * combined per weighted_bipred_idc (8.4.2.3) */
static void part_pred_b_c(Slice *s, int mx, int my, int gy, int gx,
                          int pw4, int ph4, int m0x, int m0y,
                          int m1x, int m1y, int ri0, int ri1,
                          i64 pred16[16][16], i64 predc[2][8][8])
{
    H264Dec *d = s->d;
    int ly = (gy - my * 4) * 4, lx = (gx - mx * 4) * 4;
    int cy2 = ly / 2, cx2 = lx / 2;
    if (ri1 < 0) {
        mc_list_c(s, 0, mx, my, gy, gx, pw4, ph4, m0x, m0y, ri0, 1,
                  pred16, predc);
        return;
    }
    if (ri0 < 0) {
        mc_list_c(s, 1, mx, my, gy, gx, pw4, ph4, m1x, m1y, ri1, 1,
                  pred16, predc);
        return;
    }
    i64 l1l[16][16], l1c[2][8][8];
    mc_list_c(s, 0, mx, my, gy, gx, pw4, ph4, m0x, m0y, ri0, 0,
              pred16, predc);
    mc_list_c(s, 1, mx, my, gy, gx, pw4, ph4, m1x, m1y, ri1, 0, l1l, l1c);
    if (s->wbidc == 2) {
        int w0, w1;
        implicit_w_c(s->cur_poc, d->dpb_poc[s->l0map[ri0]],
                     d->dpb_poc[s->l1map[ri1]], &w0, &w1);
        for (int yy = 0; yy < ph4 * 4; yy++)
            for (int xx = 0; xx < pw4 * 4; xx++)
                pred16[ly + yy][lx + xx] = clip255_c(
                    (pred16[ly + yy][lx + xx] * w0
                     + l1l[ly + yy][lx + xx] * w1 + 32) >> 6);
        for (int ci = 0; ci < 2; ci++)
            for (int yy = 0; yy < ph4 * 2; yy++)
                for (int xx = 0; xx < pw4 * 2; xx++)
                    predc[ci][cy2 + yy][cx2 + xx] = clip255_c(
                        (predc[ci][cy2 + yy][cx2 + xx] * w0
                         + l1c[ci][cy2 + yy][cx2 + xx] * w1 + 32) >> 6);
    } else if (s->wbidc == 1 && s->wp_on) {
        int ld = s->wp_ld, cd = s->wp_cd;
        int wl0 = s->wl[ri0], ol0 = s->wo[ri0];
        int wl1 = s->wl1[ri1], ol1 = s->wo1[ri1];
        for (int yy = 0; yy < ph4 * 4; yy++)
            for (int xx = 0; xx < pw4 * 4; xx++)
                pred16[ly + yy][lx + xx] = clip255_c(
                    ((pred16[ly + yy][lx + xx] * wl0
                      + l1l[ly + yy][lx + xx] * wl1
                      + ((i64)1 << ld)) >> (ld + 1))
                    + ((ol0 + ol1 + 1) >> 1));
        for (int ci = 0; ci < 2; ci++) {
            int wc0 = s->wcw[ri0][ci], oc0 = s->wco[ri0][ci];
            int wc1 = s->wcw1[ri1][ci], oc1 = s->wco1[ri1][ci];
            for (int yy = 0; yy < ph4 * 2; yy++)
                for (int xx = 0; xx < pw4 * 2; xx++)
                    predc[ci][cy2 + yy][cx2 + xx] = clip255_c(
                        ((predc[ci][cy2 + yy][cx2 + xx] * wc0
                          + l1c[ci][cy2 + yy][cx2 + xx] * wc1
                          + ((i64)1 << cd)) >> (cd + 1))
                        + ((oc0 + oc1 + 1) >> 1));
        }
    } else {
        for (int yy = 0; yy < ph4 * 4; yy++)
            for (int xx = 0; xx < pw4 * 4; xx++)
                pred16[ly + yy][lx + xx] =
                    (pred16[ly + yy][lx + xx]
                     + l1l[ly + yy][lx + xx] + 1) >> 1;
        for (int ci = 0; ci < 2; ci++)
            for (int yy = 0; yy < ph4 * 2; yy++)
                for (int xx = 0; xx < pw4 * 2; xx++)
                    predc[ci][cy2 + yy][cx2 + xx] =
                        (predc[ci][cy2 + yy][cx2 + xx]
                         + l1c[ci][cy2 + yy][cx2 + xx] + 1) >> 1;
    }
}

/* one list's motion grids for a partition (-1 ri = unused) */
static void fill_list_c(Slice *s, int gy, int gx, int pw4, int ph4,
                        int mvx, int mvy, int ri, int lst, int direct)
{
    H264Dec *d = s->d;
    int g4w = d->mbw * 4;
    int32_t *mg = lst ? d->mv4b : d->mv4;
    int32_t *rg = lst ? d->ref4b : d->ref4;
    int32_t *pg = lst ? d->pid4b : d->pid4;
    uint8_t *rdg = lst ? d->rd4b : d->rd4;
    const int *lmap = lst ? s->l1map : s->l0map;
    int pid = ri >= 0 ? d->dpb_pid[lmap[ri]] : -1;
    for (int yy = 0; yy < ph4; yy++)
        for (int xx = 0; xx < pw4; xx++) {
            long gi = (long)(gy + yy) * g4w + gx + xx;
            mg[gi * 2] = ri >= 0 ? mvx : 0;
            mg[gi * 2 + 1] = ri >= 0 ? mvy : 0;
            rg[gi] = ri;
            pg[gi] = pid;
            rdg[gi] = 1;
            d->dir4[gi] = (uint8_t)direct;
            d->dec4[gi] = 1;
        }
}

/* spatial direct MB-level parameters (8.4.1.2.2/.3) */
static void direct_params_c(Slice *s, int gy0, int gx0, int *ri0, int *ri1,
                            int *m0x, int *m0y, int *m1x, int *m1y,
                            int *zero_pred)
{
    H264Dec *d = s->d;
    int g4w = d->mbw * 4;
    int has_a = gx0 > 0;
    int has_b = gy0 > s->my0 * 4;
    int cx = gx0 + 4;
    int cyy = gy0 - 1, cxx = -1;
    if (has_b && cx < g4w)
        cxx = cx;
    else if (has_b && has_a)
        cxx = gx0 - 1;
    int r0 = -1, r1 = -1;
    for (int lst = 0; lst < 2; lst++) {
        const int32_t *rg = lst ? d->ref4b : d->ref4;
        int ra = (has_a && d->dec4[(long)gy0 * g4w + gx0 - 1])
                 ? (int)rg[(long)gy0 * g4w + gx0 - 1] : -1;
        int rb = (has_b && d->dec4[(long)(gy0 - 1) * g4w + gx0])
                 ? (int)rg[(long)(gy0 - 1) * g4w + gx0] : -1;
        int rc = (cxx >= 0 && d->dec4[(long)cyy * g4w + cxx])
                 ? (int)rg[(long)cyy * g4w + cxx] : -1;
        int m = (rb >= 0 && rc >= 0) ? (rb < rc ? rb : rc)
                                     : (rb > rc ? rb : rc);
        int v = (ra >= 0 && m >= 0) ? (ra < m ? ra : m)
                                    : (ra > m ? ra : m);
        if (lst == 0)
            r0 = v;
        else
            r1 = v;
    }
    *zero_pred = 0;
    if (r0 < 0 && r1 < 0) {
        *zero_pred = 1;
        *ri0 = *ri1 = 0;
        *m0x = *m0y = *m1x = *m1y = 0;
        return;
    }
    *ri0 = r0;
    *ri1 = r1;
    *m0x = *m0y = *m1x = *m1y = 0;
    if (r0 >= 0)
        mv_pred4_c(d, d->dec4, gy0, gx0, 4, r0, s->my0, SH_NONE, m0x, m0y);
    if (r1 >= 0)
        mv_pred4_b(d, d->dec4, gy0, gx0, 4, r1, s->my0, SH_NONE, m1x, m1y);
}

/* colZeroFlag for the quadrant corner 4x4 (8.4.1.2.2, 8x8 inference) */
static int col_zero_c(Slice *s, int gy0, int gx0, int q)
{
    RefPic *col = s->colpic;
    if (!col || !col->refcol)
        return 0;
    H264Dec *d = s->d;
    int g4w = d->mbw * 4;
    int cy = gy0 + (q < 2 ? 0 : 3);
    int cx = gx0 + (q % 2 == 0 ? 0 : 3);
    long gi = (long)cy * g4w + cx;
    if (col->refcol[gi] != 0)
        return 0;
    int mx = col->mvcol[gi * 2], my = col->mvcol[gi * 2 + 1];
    return mx >= -1 && mx <= 1 && my >= -1 && my <= 1;
}

/* B_Skip / B_Direct_16x16: derive, predict, fill (returns into bufs) */
static void direct_block_c(Slice *s, int mx, int my,
                           i64 pred16[16][16], i64 predc[2][8][8])
{
    int gy0 = my * 4, gx0 = mx * 4;
    int ri0, ri1, m0x, m0y, m1x, m1y, zp;
    direct_params_c(s, gy0, gx0, &ri0, &ri1, &m0x, &m0y, &m1x, &m1y, &zp);
    for (int q = 0; q < 4; q++) {
        int qy = gy0 + (q / 2) * 2, qx = gx0 + (q % 2) * 2;
        int cz = !zp && col_zero_c(s, gy0, gx0, q);
        int a0x = (zp || (cz && ri0 == 0)) ? 0 : m0x;
        int a0y = (zp || (cz && ri0 == 0)) ? 0 : m0y;
        int a1x = (zp || (cz && ri1 == 0)) ? 0 : m1x;
        int a1y = (zp || (cz && ri1 == 0)) ? 0 : m1y;
        part_pred_b_c(s, mx, my, qy, qx, 2, 2, a0x, a0y, a1x, a1y,
                      ri0, ri1, pred16, predc);
        fill_list_c(s, qy, qx, 2, 2, a0x, a0y, ri0, 0, 1);
        fill_list_c(s, qy, qx, 2, 2, a1x, a1y, ri1, 1, 1);
    }
}

/* B two-partition mode pairs (Table 7-14): 0 = L0, 1 = L1, 2 = Bi */
static const int B_PAIR[9][2] = {
    {0, 0}, {1, 1}, {0, 1}, {1, 0}, {0, 2}, {1, 2}, {2, 0}, {2, 1}, {2, 2},
};
/* B sub_mb_type (Table 7-18): {SUB_PARTS shape, mode}; 0 = direct */
static const int B_SUB[13][2] = {
    {0, 0}, {0, 0}, {0, 1}, {0, 2}, {1, 0}, {2, 0}, {1, 1}, {2, 1},
    {1, 2}, {2, 2}, {3, 0}, {3, 1}, {3, 2},
};

/* cbp -> t8 flag -> dqp -> residuals -> recon, shared by P and B
 * CAVLC inter MBs */
static void cavlc_inter_tail(Slice *s, BitReader *r, int mx, int my,
                             int small_parts,
                             i64 pred16[16][16], i64 predc[2][8][8])
{
    H264Dec *d = s->d;
    int g4w = d->mbw * 4, g2w = d->mbw * 2, mbw = d->mbw;
    int cbp_code = (int)br_ue(r);
    if (cbp_code >= 48)
        dec_fail(d, "bad inter cbp");
    int cbp = CBP_INTER[cbp_code];
    int cbp_luma = cbp & 15, cbp_chroma = cbp >> 4;
    if (cbp_chroma == 3)
        dec_fail(d, "bad chroma cbp");
    int t8 = 0;
    if (cbp_luma && d->pps.transform_8x8 && !small_parts)
        t8 = br_bit(r);
    i64 lres[16][16];
    i64 cres[2][8][8];
    memset(lres, 0, sizeof(lres));
    memset(cres, 0, sizeof(cres));
    int qpc;
    i64 vy[4][4], vc[4][4];
    if (cbp)
        s->qp += br_se(r);
    qpc = chroma_qp((s->qp + d->pps.chroma_off) < 0 ? 0 :
                    ((s->qp + d->pps.chroma_off) > 51 ? 51 : s->qp + d->pps.chroma_off));
    vmat(s->qp, vy);
    vmat(qpc, vc);
    if (cbp_luma || cbp_chroma) {
        if (t8) {
            for (int b = 0; b < 4; b++) {
                int has = (cbp_luma >> b) & 1;
                i64 zz64[64];
                decode_luma8x8_block_cavlc_c(s, r, b, mx, my, has, zz64);
                if (has) {
                    i64 res[8][8];
                    recon_res8_c(zz64, s->qp, res);
                    int py8 = (b / 2) * 8, px8 = (b % 2) * 8;
                    for (int rr2 = 0; rr2 < 8; rr2++)
                        for (int cc = 0; cc < 8; cc++)
                            lres[py8 + rr2][px8 + cc] = res[rr2][cc];
                }
            }
        } else {
            for (int bi = 0; bi < 16; bi++) {
                int bx = BLK_ORDER[bi][0], by = BLK_ORDER[bi][1];
                int gx = mx * 4 + bx, gy = my * 4 + by;
                if ((cbp_luma >> (bi / 4)) & 1) {
                    int nc = nc_of(d->nnz_l, g4w, gx, gy, s->my0 * 4);
                    i64 zz[16];
                    cavlc_block(d, r, nc, 16, zz);
                    int nz = 0;
                    for (int i = 0; i < 16; i++)
                        nz += zz[i] != 0;
                    d->nnz_l[(long)gy * g4w + gx] = nz;
                    i64 res[4][4];
                    finish_block4(zz, (const i64(*)[4])vy, s->qp, 0, 0, res);
                    for (int rr2 = 0; rr2 < 4; rr2++)
                        for (int cc = 0; cc < 4; cc++)
                            lres[by * 4 + rr2][bx * 4 + cc] = res[rr2][cc];
                } else {
                    d->nnz_l[(long)gy * g4w + gx] = 0;
                }
            }
        }
        chroma_residuals_cavlc(s, r, cbp_chroma, mx, my,
                               (const i64(*)[4])vc, qpc, cres);
    } else {
        for (int by = 0; by < 4; by++)
            for (int bx = 0; bx < 4; bx++)
                d->nnz_l[(long)(my * 4 + by) * g4w + mx * 4 + bx] = 0;
        for (int ci = 0; ci < 2; ci++)
            for (int by = 0; by < 2; by++)
                for (int bx = 0; bx < 2; bx++)
                    d->nnz_c[ci][(long)(my * 2 + by) * g2w + mx * 2 + bx] = 0;
    }
    recon_p_mb(s, mx, my, (const i64(*)[16])pred16,
               (const i64(*)[8][8])predc, (const i64(*)[16])lres,
               (const i64(*)[8][8])cres);
    for (int by = 0; by < 4; by++)
        for (int bx = 0; bx < 4; bx++) {
            long gi = (long)(my * 4 + by) * g4w + mx * 4 + bx;
            d->done4[gi] = 1;
            d->avail4[gi] = 1;
            d->i4mode[gi] = 2;
        }
    record_mb(s, my, mx, 0, 0);
    if (t8)
        d->db_t8x8[(long)my * mbw + mx] = 1;
}

/* B inter MB, CAVLC (7.3.5.1/.2 + Tables 7-14/7-18) */
static void decode_b_mb_cavlc(Slice *s, BitReader *r, int mx, int my,
                              int mb_type)
{
    H264Dec *d = s->d;
    int g4w = d->mbw * 4;
    int gy0 = my * 4, gx0 = mx * 4;
    i64 pred16[16][16], predc[2][8][8];
    memset(pred16, 0, sizeof(pred16));
    memset(predc, 0, sizeof(predc));
    for (int by = 0; by < 4; by++)
        for (int bx = 0; bx < 4; bx++) {
            long gi = (long)(gy0 + by) * g4w + gx0 + bx;
            d->i4mode[gi] = 2;
            d->avail4[gi] = 1;
        }
    int small_parts = 0;
    if (mb_type == 0) {              /* B_Direct_16x16 */
        direct_block_c(s, mx, my, pred16, predc);
    } else if (mb_type <= 3) {       /* 16x16: 1 L0, 2 L1, 3 Bi */
        int use0 = mb_type == 1 || mb_type == 3;
        int use1 = mb_type == 2 || mb_type == 3;
        int ri0 = use0 ? read_refidx_cavlc(d, r, s->l0_active) : -1;
        int ri1 = use1 ? read_refidx_cavlc(d, r, s->l1_active) : -1;
        int m0x = 0, m0y = 0, m1x = 0, m1y = 0;
        if (use0) {
            int pmx, pmy;
            mv_pred4_c(d, d->dec4, gy0, gx0, 4, ri0, s->my0, SH_NONE,
                       &pmx, &pmy);
            m0x = pmx + br_se(r);
            m0y = pmy + br_se(r);
        }
        if (use1) {
            int pmx, pmy;
            mv_pred4_b(d, d->dec4, gy0, gx0, 4, ri1, s->my0, SH_NONE,
                       &pmx, &pmy);
            m1x = pmx + br_se(r);
            m1y = pmy + br_se(r);
        }
        part_pred_b_c(s, mx, my, gy0, gx0, 4, 4, m0x, m0y, m1x, m1y,
                      ri0, ri1, pred16, predc);
        fill_list_c(s, gy0, gx0, 4, 4, m0x, m0y, ri0, 0, 0);
        fill_list_c(s, gy0, gx0, 4, 4, m1x, m1y, ri1, 1, 0);
    } else if (mb_type <= 21) {      /* two-partition types */
        const int *pair = B_PAIR[(mb_type - 4) / 2];
        int geo[2][5];
        if ((mb_type - 4) % 2 == 0) {
            int g0[5] = {gy0, gx0, 4, 2, SH_16x8_0};
            int g1[5] = {gy0 + 2, gx0, 4, 2, SH_16x8_1};
            memcpy(geo[0], g0, sizeof(g0));
            memcpy(geo[1], g1, sizeof(g1));
        } else {
            int g0[5] = {gy0, gx0, 2, 4, SH_8x16_0};
            int g1[5] = {gy0, gx0 + 2, 2, 4, SH_8x16_1};
            memcpy(geo[0], g0, sizeof(g0));
            memcpy(geo[1], g1, sizeof(g1));
        }
        int use0[2], use1[2], ri0[2], ri1[2];
        int md0[2][2], md1[2][2];
        for (int p = 0; p < 2; p++) {
            use0[p] = pair[p] == 0 || pair[p] == 2;
            use1[p] = pair[p] == 1 || pair[p] == 2;
        }
        for (int p = 0; p < 2; p++)
            ri0[p] = use0[p] ? read_refidx_cavlc(d, r, s->l0_active) : -1;
        for (int p = 0; p < 2; p++)
            ri1[p] = use1[p] ? read_refidx_cavlc(d, r, s->l1_active) : -1;
        for (int p = 0; p < 2; p++) {
            md0[p][0] = use0[p] ? br_se(r) : 0;
            md0[p][1] = use0[p] ? br_se(r) : 0;
        }
        for (int p = 0; p < 2; p++) {
            md1[p][0] = use1[p] ? br_se(r) : 0;
            md1[p][1] = use1[p] ? br_se(r) : 0;
        }
        int mv0[2][2], mv1[2][2];
        for (int p = 0; p < 2; p++) {
            int gy = geo[p][0], gx = geo[p][1];
            int pw4 = geo[p][2], shape = geo[p][4];
            mv0[p][0] = mv0[p][1] = 0;
            if (use0[p]) {
                int pmx, pmy;
                mv_pred4_c(d, d->dec4, gy, gx, pw4, ri0[p], s->my0,
                           shape, &pmx, &pmy);
                mv0[p][0] = pmx + md0[p][0];
                mv0[p][1] = pmy + md0[p][1];
            }
            fill_list_c(s, gy, gx, geo[p][2], geo[p][3],
                        mv0[p][0], mv0[p][1], ri0[p], 0, 0);
        }
        for (int p = 0; p < 2; p++) {
            int gy = geo[p][0], gx = geo[p][1];
            int pw4 = geo[p][2], shape = geo[p][4];
            mv1[p][0] = mv1[p][1] = 0;
            if (use1[p]) {
                int pmx, pmy;
                mv_pred4_b(d, d->dec4, gy, gx, pw4, ri1[p], s->my0,
                           shape, &pmx, &pmy);
                mv1[p][0] = pmx + md1[p][0];
                mv1[p][1] = pmy + md1[p][1];
            }
            fill_list_c(s, gy, gx, geo[p][2], geo[p][3],
                        mv1[p][0], mv1[p][1], ri1[p], 1, 0);
        }
        for (int p = 0; p < 2; p++)
            part_pred_b_c(s, mx, my, geo[p][0], geo[p][1], geo[p][2],
                          geo[p][3], mv0[p][0], mv0[p][1],
                          mv1[p][0], mv1[p][1], ri0[p], ri1[p],
                          pred16, predc);
    } else {                          /* B_8x8 */
        int subs[4], su0[4], su1[4], ri0[4], ri1[4];
        for (int b = 0; b < 4; b++) {
            subs[b] = (int)br_ue(r);
            if (subs[b] > 12)
                dec_fail(d, "B sub_mb_type");
            su0[b] = subs[b] && (B_SUB[subs[b]][1] == 0
                                 || B_SUB[subs[b]][1] == 2);
            su1[b] = subs[b] && (B_SUB[subs[b]][1] == 1
                                 || B_SUB[subs[b]][1] == 2);
        }
        for (int b = 0; b < 4; b++)
            ri0[b] = su0[b] ? read_refidx_cavlc(d, r, s->l0_active) : -1;
        for (int b = 0; b < 4; b++)
            ri1[b] = su1[b] ? read_refidx_cavlc(d, r, s->l1_active) : -1;
        int md0[4][4][2], md1[4][4][2];
        for (int b = 0; b < 4; b++)
            if (su0[b])
                for (int p = 0; p < SUB_NPARTS[B_SUB[subs[b]][0]]; p++) {
                    md0[b][p][0] = br_se(r);
                    md0[b][p][1] = br_se(r);
                }
        for (int b = 0; b < 4; b++)
            if (su1[b])
                for (int p = 0; p < SUB_NPARTS[B_SUB[subs[b]][0]]; p++) {
                    md1[b][p][0] = br_se(r);
                    md1[b][p][1] = br_se(r);
                }
        /* shared direct parameters for any B_Direct_8x8 blocks */
        int dri0, dri1, dm0x, dm0y, dm1x, dm1y, dzero;
        direct_params_c(s, gy0, gx0, &dri0, &dri1, &dm0x, &dm0y,
                        &dm1x, &dm1y, &dzero);
        /* L0 reconstruction pass in block order, then L1, then MC */
        int pm0[4][4][2], pm1[4][4][2];
        for (int b = 0; b < 4; b++) {
            int by = gy0 + (b / 2) * 2, bx = gx0 + (b % 2) * 2;
            if (subs[b] == 0) {
                int cz = !dzero && col_zero_c(s, gy0, gx0, b);
                int a0x = (dzero || (cz && dri0 == 0)) ? 0 : dm0x;
                int a0y = (dzero || (cz && dri0 == 0)) ? 0 : dm0y;
                int a1x = (dzero || (cz && dri1 == 0)) ? 0 : dm1x;
                int a1y = (dzero || (cz && dri1 == 0)) ? 0 : dm1y;
                pm0[b][0][0] = a0x; pm0[b][0][1] = a0y;
                pm1[b][0][0] = a1x; pm1[b][0][1] = a1y;
                fill_list_c(s, by, bx, 2, 2, a0x, a0y, dri0, 0, 1);
                fill_list_c(s, by, bx, 2, 2, a1x, a1y, dri1, 1, 1);
                continue;
            }
            int shp = B_SUB[subs[b]][0];
            for (int p = 0; p < SUB_NPARTS[shp]; p++) {
                int dy = SUB_PARTS[shp][p][0], dx = SUB_PARTS[shp][p][1];
                int pw4 = SUB_PARTS[shp][p][2], ph4 = SUB_PARTS[shp][p][3];
                int gy = by + dy, gx = bx + dx;
                pm0[b][p][0] = pm0[b][p][1] = 0;
                if (su0[b]) {
                    int pmx, pmy;
                    mv_pred4_c(d, d->dec4, gy, gx, pw4, ri0[b], s->my0,
                               SH_NONE, &pmx, &pmy);
                    pm0[b][p][0] = pmx + md0[b][p][0];
                    pm0[b][p][1] = pmy + md0[b][p][1];
                }
                fill_list_c(s, gy, gx, pw4, ph4, pm0[b][p][0],
                            pm0[b][p][1], su0[b] ? ri0[b] : -1, 0, 0);
                if (shp != 0)
                    small_parts = 1;
            }
        }
        for (int b = 0; b < 4; b++) {
            if (subs[b] == 0)
                continue;
            int by = gy0 + (b / 2) * 2, bx = gx0 + (b % 2) * 2;
            int shp = B_SUB[subs[b]][0];
            for (int p = 0; p < SUB_NPARTS[shp]; p++) {
                int dy = SUB_PARTS[shp][p][0], dx = SUB_PARTS[shp][p][1];
                int pw4 = SUB_PARTS[shp][p][2], ph4 = SUB_PARTS[shp][p][3];
                int gy = by + dy, gx = bx + dx;
                pm1[b][p][0] = pm1[b][p][1] = 0;
                if (su1[b]) {
                    int pmx, pmy;
                    mv_pred4_b(d, d->dec4, gy, gx, pw4, ri1[b], s->my0,
                               SH_NONE, &pmx, &pmy);
                    pm1[b][p][0] = pmx + md1[b][p][0];
                    pm1[b][p][1] = pmy + md1[b][p][1];
                }
                fill_list_c(s, gy, gx, pw4, ph4, pm1[b][p][0],
                            pm1[b][p][1], su1[b] ? ri1[b] : -1, 1, 0);
            }
        }
        for (int b = 0; b < 4; b++) {
            int by = gy0 + (b / 2) * 2, bx = gx0 + (b % 2) * 2;
            if (subs[b] == 0) {
                part_pred_b_c(s, mx, my, by, bx, 2, 2, pm0[b][0][0],
                              pm0[b][0][1], pm1[b][0][0], pm1[b][0][1],
                              dri0, dri1, pred16, predc);
                continue;
            }
            int shp = B_SUB[subs[b]][0];
            for (int p = 0; p < SUB_NPARTS[shp]; p++) {
                int dy = SUB_PARTS[shp][p][0], dx = SUB_PARTS[shp][p][1];
                int pw4 = SUB_PARTS[shp][p][2], ph4 = SUB_PARTS[shp][p][3];
                part_pred_b_c(s, mx, my, by + dy, bx + dx, pw4, ph4,
                              pm0[b][p][0], pm0[b][p][1],
                              pm1[b][p][0], pm1[b][p][1],
                              su0[b] ? ri0[b] : -1, su1[b] ? ri1[b] : -1,
                              pred16, predc);
            }
        }
    }
    cavlc_inter_tail(s, r, mx, my, small_parts, pred16, predc);
}

static void decode_slice_cavlc_p(H264Dec *d, const uint8_t *rbsp, long rlen,
                                 int slice_id, int ref_idc, int is_b)
{
    BitReader rr = {rbsp, rlen, 0, d};
    BitReader *r = &rr;
    Slice sl = {0};
    Slice *s = &sl;
    s->d = d;
    s->slice_id = slice_id;
    s->is_p = !is_b;
    s->is_b = is_b;
    int first_mb = (int)br_ue(r);
    br_ue(r);                       /* slice_type (known P/B) */
    br_ue(r);                       /* pps id */
    int fnum = (int)br_u(r, d->sps.log2_mfn);
    d->cur_frame_num = fnum;
    if (d->sps.poc_type == 0)
        d->cur_poc_lsb = (int)br_u(r, d->sps.log2_poc);
    s->cur_poc = poc_preview(d);
    if (is_b) {
        if (!br_bit(r))             /* direct_spatial_mv_pred_flag */
            dec_fail(d, "temporal direct");
        if (!d->sps.direct_8x8)
            dec_fail(d, "direct_8x8_inference_flag=0");
    }
    parse_inter_header(d, s, r, ref_idc);
    int l0_active = s->l0_active;
    (void)l0_active;
    s->qp = d->pps.init_qp + br_se(r);
    parse_dbf(d, r, &s->dbf_idc, &s->dbf_offa, &s->dbf_offb);
    int mbw = d->mbw, mbh = d->mbh;
    if (first_mb % mbw)
        dec_fail(d, "slices must start at an MB row");
    s->my0 = first_mb / mbw;
    reset_slice_grids(d);
    long stop_pos = rbsp_stop_pos(rbsp, rlen);
    int g4w = mbw * 4;
    int g2w = mbw * 2;

    static const i64 zero16[16][16];
    static const i64 zero8[2][8][8];

    long n_mbs = (long)mbw * mbh;
    long mb_addr = first_mb;
    while (mb_addr < n_mbs && r->pos < stop_pos) {
        long skip_run = br_ue(r);
        for (long k = 0; k < skip_run; k++) {
            if (mb_addr >= n_mbs)
                dec_fail(d, "skip run past frame end");
            int my = (int)(mb_addr / mbw), mx = (int)(mb_addr % mbw);
            i64 pred16[16][16], predc[2][8][8];
            if (is_b) {  /* B_Skip = spatial direct, no residual */
                memset(pred16, 0, sizeof(pred16));
                memset(predc, 0, sizeof(predc));
                direct_block_c(s, mx, my, pred16, predc);
            } else {
                int mvx, mvy;
                skip_mv4_c(d, d->dec4, mx, my, s->my0, &mvx, &mvy);
                part_pred_c(s, mx, my, my * 4, mx * 4, 4, 4, mvx, mvy, 0,
                            pred16, predc);
                fill4_c(s, my * 4, mx * 4, 4, 4, mvx, mvy, 0);
            }
            recon_p_mb(s, mx, my, (const i64(*)[16])pred16,
                       (const i64(*)[8][8])predc, zero16, zero8);
            for (int by = 0; by < 4; by++)
                for (int bx = 0; bx < 4; bx++) {
                    long gi = (long)(my * 4 + by) * g4w + mx * 4 + bx;
                    d->nnz_l[gi] = 0;
                    d->done4[gi] = 1;
                    d->avail4[gi] = 1;
                    d->i4mode[gi] = 2;
                }
            record_mb(s, my, mx, 0, 0);
            mb_addr++;
        }
        if (mb_addr >= n_mbs || r->pos >= stop_pos)
            break;
        int my = (int)(mb_addr / mbw), mx = (int)(mb_addr % mbw);
        mb_addr++;
        int mb_type = (int)br_ue(r);
        if (is_b && mb_type < 23) { /* B inter MB (Table 7-14) */
            decode_b_mb_cavlc(s, r, mx, my, mb_type);
            continue;
        }
        if (is_b)
            mb_type -= 18;  /* intra-in-B offset 23 -> shared path's 5 */
        if (!is_b && mb_type <= 4) { /* inter MB */
            int gy0 = my * 4, gx0 = mx * 4;
            int all_sub8 = 1;   /* no P_8x8 partition below 8x8 */
            i64 pred16[16][16], predc[2][8][8];
            memset(pred16, 0, sizeof(pred16));
            memset(predc, 0, sizeof(predc));
            if (mb_type == 0) { /* P_L0_16x16 */
                int ri = read_refidx_cavlc(d, r, l0_active);
                int pmx, pmy;
                mv_pred4_c(d, d->dec4, gy0, gx0, 4, ri, s->my0, SH_NONE,
                           &pmx, &pmy);
                int mvx = pmx + br_se(r), mvy = pmy + br_se(r);
                part_pred_c(s, mx, my, gy0, gx0, 4, 4, mvx, mvy, ri,
                            pred16, predc);
                fill4_c(s, gy0, gx0, 4, 4, mvx, mvy, ri);
            } else if (mb_type == 1 || mb_type == 2) {
                int geo[2][5]; /* gy, gx, pw4, ph4, shape */
                if (mb_type == 1) {
                    int g0[5] = {gy0, gx0, 4, 2, SH_16x8_0};
                    int g1[5] = {gy0 + 2, gx0, 4, 2, SH_16x8_1};
                    memcpy(geo[0], g0, sizeof(g0));
                    memcpy(geo[1], g1, sizeof(g1));
                } else {
                    int g0[5] = {gy0, gx0, 2, 4, SH_8x16_0};
                    int g1[5] = {gy0, gx0 + 2, 2, 4, SH_8x16_1};
                    memcpy(geo[0], g0, sizeof(g0));
                    memcpy(geo[1], g1, sizeof(g1));
                }
                int ris[2];
                for (int p = 0; p < 2; p++)
                    ris[p] = read_refidx_cavlc(d, r, l0_active);
                for (int p = 0; p < 2; p++) {
                    int gy = geo[p][0], gx = geo[p][1];
                    int pw4 = geo[p][2], ph4 = geo[p][3], shape = geo[p][4];
                    int pmx, pmy;
                    mv_pred4_c(d, d->dec4, gy, gx, pw4, ris[p], s->my0,
                               shape, &pmx, &pmy);
                    int mvx = pmx + br_se(r), mvy = pmy + br_se(r);
                    part_pred_c(s, mx, my, gy, gx, pw4, ph4, mvx, mvy,
                                ris[p], pred16, predc);
                    fill4_c(s, gy, gx, pw4, ph4, mvx, mvy, ris[p]);
                }
            } else { /* P_8x8 (3) / P_8x8ref0 (4) */
                int subs[4];
                for (int b = 0; b < 4; b++) {
                    subs[b] = (int)br_ue(r);
                    if (subs[b] > 3)
                        dec_fail(d, "sub_mb_type");
                    if (subs[b] != 0)
                        all_sub8 = 0;
                }
                int ris[4] = {0, 0, 0, 0};
                if (mb_type == 3)
                    for (int b = 0; b < 4; b++)
                        ris[b] = read_refidx_cavlc(d, r, l0_active);
                for (int b = 0; b < 4; b++) {
                    int by = gy0 + (b / 2) * 2, bx = gx0 + (b % 2) * 2;
                    for (int p = 0; p < SUB_NPARTS[subs[b]]; p++) {
                        int dy = SUB_PARTS[subs[b]][p][0];
                        int dx = SUB_PARTS[subs[b]][p][1];
                        int pw4 = SUB_PARTS[subs[b]][p][2];
                        int ph4 = SUB_PARTS[subs[b]][p][3];
                        int gy = by + dy, gx = bx + dx;
                        int pmx, pmy;
                        mv_pred4_c(d, d->dec4, gy, gx, pw4, ris[b], s->my0,
                                   SH_NONE, &pmx, &pmy);
                        int mvx = pmx + br_se(r), mvy = pmy + br_se(r);
                        part_pred_c(s, mx, my, gy, gx, pw4, ph4, mvx, mvy,
                                    ris[b], pred16, predc);
                        fill4_c(s, gy, gx, pw4, ph4, mvx, mvy, ris[b]);
                    }
                }
            }
            cavlc_inter_tail(s, r, mx, my, !(mb_type <= 2 || all_sub8),
                             pred16, predc);
            continue;
        }
        int it = mb_type - 5;
        for (int by = 0; by < 4; by++)
            for (int bx = 0; bx < 4; bx++) {
                long gi = (long)(my * 4 + by) * g4w + mx * 4 + bx;
                d->ref4[gi] = -1;
                d->pid4[gi] = -1;
                d->mv4[gi * 2] = 0;
                d->mv4[gi * 2 + 1] = 0;
                d->ref4b[gi] = -1;
                d->pid4b[gi] = -1;
                d->mv4b[gi * 2] = 0;
                d->mv4b[gi * 2 + 1] = 0;
                d->dir4[gi] = 0;
                d->dec4[gi] = 1;
            }
        if (it == 25)
            dec_fail(d, "I_PCM in P not supported");
        if (it == 0) { /* I_NxN in P */
            if (d->pps.transform_8x8 && br_bit(r))
                decode_intra8x8_cavlc_c(s, r, mx, my);
            else
                decode_intra4x4_cavlc_c(s, r, mx, my);
            record_mb(s, my, mx, 1, 0);
            continue;
        }
        if (it < 1 || it > 24)
            dec_fail(d, "intra-in-P mb_type");
        decode_i16_in_p_cavlc(s, r, it, mx, my);
        for (int by = 0; by < 4; by++)
            for (int bx = 0; bx < 4; bx++) {
                long gi = (long)(my * 4 + by) * g4w + mx * 4 + bx;
                d->done4[gi] = 1;
                d->avail4[gi] = 1;
                d->i4mode[gi] = 2;
            }
        record_mb(s, my, mx, 1, 0);
    }
}

/* ------------------------------------------------------------------ */
/* CABAC engine (spec 9.3.3.2) — port of h264_cabac.CabacEngine          */
/* ------------------------------------------------------------------ */

typedef struct {
    const uint8_t *data;
    long size;
    long pos;          /* bit position */
    int range, offset;
    uint8_t pstate[1024];
    uint8_t mps[1024];
    H264Dec *d;
} Cab;

static inline int cab_bit(Cab *e)
{
    long p = e->pos++;
    long bi = p >> 3;
    if (bi >= e->size)
        return 0;
    return (e->data[bi] >> (7 - (p & 7))) & 1;
}

static void cab_init(Cab *e, H264Dec *d, const uint8_t *data, long size,
                     long pos, int table_idx, int slice_qp)
{
    e->data = data;
    e->size = size;
    e->pos = pos;
    e->d = d;
    int qp = slice_qp < 0 ? 0 : (slice_qp > 51 ? 51 : slice_qp);
    for (int i = 0; i < 1024; i++) {
        int m = d->ctx_init[table_idx][i][0];
        int n = d->ctx_init[table_idx][i][1];
        int pre = ((m * qp) >> 4) + n;
        if (pre < 1) pre = 1;
        if (pre > 126) pre = 126;
        e->mps[i] = pre > 63;
        e->pstate[i] = (uint8_t)(pre <= 63 ? 63 - pre : pre - 64);
    }
    e->range = 510;
    e->offset = 0;
    for (int i = 0; i < 9; i++)
        e->offset = (e->offset << 1) | cab_bit(e);
    if (e->offset >= 510)
        dec_fail(d, "CABAC init offset out of range");
}

static int cab_decision(Cab *e, int ctx)
{
    int st = e->pstate[ctx];
    int lps = e->d->range_tab[st][(e->range >> 6) & 3];
    e->range -= lps;
    int b;
    if (e->offset >= e->range) {
        b = 1 - e->mps[ctx];
        e->offset -= e->range;
        e->range = lps;
        if (st == 0)
            e->mps[ctx] ^= 1;
        e->pstate[ctx] = (uint8_t)e->d->trans_lps[st];
    } else {
        b = e->mps[ctx];
        if (st < 62)
            e->pstate[ctx] = (uint8_t)(st + 1);
    }
    while (e->range < 256) {
        e->range <<= 1;
        e->offset = (e->offset << 1) | cab_bit(e);
    }
    return b;
}

static int cab_bypass(Cab *e)
{
    e->offset = (e->offset << 1) | cab_bit(e);
    if (e->offset >= e->range) {
        e->offset -= e->range;
        return 1;
    }
    return 0;
}

static int cab_terminate(Cab *e)
{
    e->range -= 2;
    if (e->offset >= e->range)
        return 1;
    while (e->range < 256) {
        e->range <<= 1;
        e->offset = (e->offset << 1) | cab_bit(e);
    }
    return 0;
}

/* per-category offsets into the sig/last/level context banks (9.3.3.1.3) */
static const int SIG_OFF[5] = {0, 15, 29, 44, 47};
static const int LVL_OFF[5] = {0, 10, 20, 30, 39};

/* coeff_abs_level_minus1 + sign for a decoded significance map, shared
   by all ctxBlockCats incl. cat 5 (= _levels_from_sig; UEG0 escape) */
static void levels_from_sig(Cab *e, const uint8_t *sig, int n_coeffs,
                            int lvl_base, int cap, i64 *out)
{
    memset(out, 0, sizeof(i64) * (size_t)n_coeffs);
    int num_eq1 = 0, num_gt1 = 0;
    for (int pos = n_coeffs - 1; pos >= 0; pos--) {
        if (!sig[pos])
            continue;
        int inc0 = num_gt1 ? 0 : (1 + num_eq1 < 4 ? 1 + num_eq1 : 4);
        i64 level;
        if (cab_decision(e, lvl_base + inc0) == 0) {
            level = 1;
            num_eq1++;
        } else {
            int incn = 5 + (num_gt1 < cap ? num_gt1 : cap);
            level = 2;
            while (level < 15 && cab_decision(e, lvl_base + incn))
                level++;
            if (level == 15) {
                int j = 0;
                while (cab_bypass(e) && j < 30)
                    j++;
                i64 val = 1;
                for (int k = 0; k < j; k++)
                    val = (val << 1) | cab_bypass(e);
                level = 14 + val;
            }
            num_gt1++;
        }
        if (cab_bypass(e))
            level = -level;
        out[pos] = level;
    }
}

/* decode one residual block; returns 0 when coded_block_flag == 0 */
static int residual_cabac(H264Dec *d, Cab *e, int cat, int n_coeffs,
                          int cbf_inc, i64 *out /* n_coeffs, zigzag */)
{
    (void)d;
    if (!cab_decision(e, 85 + 4 * cat + cbf_inc))
        return 0;
    int sig_base = 105 + SIG_OFF[cat];
    int last_base = 166 + SIG_OFF[cat];
    int lvl_base = 227 + LVL_OFF[cat];
    uint8_t sig[64] = {0};
    int i = 0, ended = 0;
    while (i < n_coeffs - 1) {
        if (cab_decision(e, sig_base + i)) {
            sig[i] = 1;
            if (cab_decision(e, last_base + i)) {
                ended = 1;
                break;
            }
        }
        i++;
    }
    if (!ended)
        sig[n_coeffs - 1] = 1;
    levels_from_sig(e, sig, n_coeffs, lvl_base, 4 - (cat == 3 ? 1 : 0), out);
    return 1;
}

/* ctxBlockCat 5 (luma 8x8, frame-coded): 64-coefficient significance map
   with the Table 9-43 maps; no coded_block_flag — the CBP bit implies
   coded (9.3.3.1.1.9).  (= _residual_cabac8) */
static void residual_cabac8(H264Dec *d, Cab *e, i64 *out /* 64, scan */)
{
    uint8_t sig[64] = {0};
    int i = 0, ended = 0;
    while (i < 63) {
        if (cab_decision(e, 402 + d->sig8[i])) {
            sig[i] = 1;
            if (cab_decision(e, 417 + d->last8[i])) {
                ended = 1;
                break;
            }
        }
        i++;
    }
    if (!ended)
        sig[63] = 1;
    levels_from_sig(e, sig, 64, 426, 4, out);
}

/* mvd component (UEG3, ctx 9.3.3.1.1.7) */
static int read_mvd_c(H264Dec *d, Cab *e, int base, int amvd)
{
    int inc = (amvd > 2 ? 1 : 0) + (amvd > 32 ? 1 : 0);
    if (!cab_decision(e, base + inc))
        return 0;
    int mvd = 1, ctx = 3;
    while (mvd < 9 && cab_decision(e, base + ctx)) {
        if (ctx < 6)
            ctx++;
        mvd++;
    }
    if (mvd >= 9) {
        int k = 3;
        while (cab_bypass(e)) {
            mvd += 1 << k;
            k++;
            if (k > 24)
                dec_fail(d, "mvd escape overflow");
        }
        while (k) {
            k--;
            mvd += cab_bypass(e) << k;
        }
    }
    return cab_bypass(e) ? -mvd : mvd;
}

/* mb_qp_delta (9.3.2.7 + ctx 60-63) */
static int read_dqp_c(H264Dec *d, Cab *e, int last_dqp)
{
    int ctx = last_dqp ? 1 : 0;
    int val = 0;
    while (cab_decision(e, 60 + ctx)) {
        ctx = val == 0 ? 2 : 3;
        val++;
        if (val > 104)
            dec_fail(d, "mb_qp_delta runaway");
    }
    return (val & 1) ? (val + 1) >> 1 : -(val >> 1);
}

/* I-MB mb_type suffix (9.3.2.5) */
static int intra_mb_type_c(Cab *e, int base, int intra_slice, int inc0)
{
    int sbase;
    if (intra_slice) {
        if (cab_decision(e, base + inc0) == 0)
            return 0;
        sbase = base + 2;
    } else {
        if (cab_decision(e, base) == 0)
            return 0;
        sbase = base;
    }
    if (cab_terminate(e))
        return 25;
    int mb_type = 1;
    mb_type += 12 * cab_decision(e, sbase + 1);
    if (cab_decision(e, sbase + 2))
        mb_type += 4 + 4 * cab_decision(e, sbase + 2 + (intra_slice ? 1 : 0));
    int off = 3 + (intra_slice ? 1 : 0);
    mb_type += 2 * cab_decision(e, sbase + off);
    mb_type += cab_decision(e, sbase + 3 + (intra_slice ? 2 : 0));
    return mb_type;
}

/* ------------------------------------------------------------------ */
/* CABAC slice decoder (= h264_cabac.decode_slice_cabac)                */
/* ------------------------------------------------------------------ */

/* contested neighbour-availability conventions (see h264_cabac.py) */
#define CBF_UNAVAIL_INTRA 1

typedef struct {
    Slice s;
    Cab e;
    int last_dqp;
    int cur_intra;
} CabSlice;

static void clear_mb_ctx_c(H264Dec *d, int mx, int my, int intra, int skip)
{
    int mbw = d->mbw;
    long mi = (long)my * mbw + mx;
    d->c_skip[mi] = (uint8_t)skip;
    d->c_intra[mi] = (uint8_t)intra;
    d->c_pcm[mi] = 0;
    d->db_t8x8[mi] = 0;
    d->c_i16[mi] = 0;
    d->c_chroma_mode[mi] = 0;
    d->c_cbp_l[mi] = 0;
    d->c_cbp_c[mi] = 0;
    d->c_cbf_ldc[mi] = 0;
    d->c_cbf_cdc[mi] = 0;
    d->c_cbf_cdc[(long)d->mbh * mbw + mi] = 0;
    int g4w = mbw * 4, g2w = mbw * 2;
    for (int by = 0; by < 4; by++)
        for (int bx = 0; bx < 4; bx++) {
            long gi = (long)(my * 4 + by) * g4w + mx * 4 + bx;
            d->c_cbf_l4[gi] = 0;
            d->c_absmvd4[gi * 2] = 0;
            d->c_absmvd4[gi * 2 + 1] = 0;
            d->c_absmvd4b[gi * 2] = 0;
            d->c_absmvd4b[gi * 2 + 1] = 0;
        }
    d->c_bdirect[mi] = 0;
    for (int ci = 0; ci < 2; ci++)
        for (int by = 0; by < 2; by++)
            for (int bx = 0; bx < 2; bx++)
                d->c_cbf_c4[(long)ci * d->mbh * 2 * g2w
                            + (long)(my * 2 + by) * g2w + mx * 2 + bx] = 0;
}

static int cbf_inc_mb_c(H264Dec *d, CabSlice *cs, const int32_t *grid,
                        int mx, int my, const uint8_t *exists_i16,
                        const int32_t *exists_cbpc)
{
    int mbw = d->mbw;
    int my0 = cs->s.my0;
    int ca, cb;
    if (mx > 0) {
        long ni = (long)my * mbw + mx - 1;
        int ex = exists_i16 ? exists_i16[ni] : (exists_cbpc[ni] > 0);
        ca = ex ? (int)grid[ni] : 0;
        if (d->c_pcm[ni])
            ca = 1;
    } else {
        ca = cs->cur_intra ? CBF_UNAVAIL_INTRA : 0;
    }
    if (my > my0) {
        long ni = (long)(my - 1) * mbw + mx;
        int ex = exists_i16 ? exists_i16[ni] : (exists_cbpc[ni] > 0);
        cb = ex ? (int)grid[ni] : 0;
        if (d->c_pcm[ni])
            cb = 1;
    } else {
        cb = cs->cur_intra ? CBF_UNAVAIL_INTRA : 0;
    }
    return ca + 2 * cb;
}

static int cbf_inc_blk_c(CabSlice *cs, const int32_t *grid, int gw,
                         int gy, int gx, int gy_min)
{
    int ca = (gx > 0) ? (int)grid[(long)gy * gw + gx - 1]
                      : (cs->cur_intra ? CBF_UNAVAIL_INTRA : 0);
    int cb = (gy > gy_min) ? (int)grid[(long)(gy - 1) * gw + gx]
                           : (cs->cur_intra ? CBF_UNAVAIL_INTRA : 0);
    return ca + 2 * cb;
}

static int read_chroma_mode_c(H264Dec *d, CabSlice *cs, int mx, int my)
{
    int mbw = d->mbw;
    int my0 = cs->s.my0;
    int inc = 0;
    if (mx > 0 && d->c_intra[(long)my * mbw + mx - 1]
        && d->c_chroma_mode[(long)my * mbw + mx - 1])
        inc++;
    if (my > my0 && d->c_intra[(long)(my - 1) * mbw + mx]
        && d->c_chroma_mode[(long)(my - 1) * mbw + mx])
        inc++;
    if (!cab_decision(&cs->e, 64 + inc))
        return 0;
    if (!cab_decision(&cs->e, 67))
        return 1;
    if (!cab_decision(&cs->e, 67))
        return 2;
    return 3;
}

static void read_cbp_c(H264Dec *d, CabSlice *cs, int mx, int my,
                       int *cbp_luma, int *cbp_chroma)
{
    Cab *e = &cs->e;
    int mbw = d->mbw;
    int my0 = cs->s.my0;
    int la = -1, lb = -1;
    if (mx > 0) {
        la = (int)d->c_cbp_l[(long)my * mbw + mx - 1];
        if (d->c_pcm[(long)my * mbw + mx - 1])
            la = 0xF;
    }
    if (my > my0) {
        lb = (int)d->c_cbp_l[(long)(my - 1) * mbw + mx];
        if (d->c_pcm[(long)(my - 1) * mbw + mx])
            lb = 0xF;
    }
    int cbp = 0;
    int ca_ = (la >= 0) ? (!(la & 0x2) ? 1 : 0) : 0;
    int cb_ = (lb >= 0) ? (!(lb & 0x4) ? 1 : 0) : 0;
    cbp |= cab_decision(e, 73 + ca_ + 2 * cb_);
    cb_ = (lb >= 0) ? (!(lb & 0x8) ? 1 : 0) : 0;
    cbp |= cab_decision(e, 73 + (!(cbp & 0x1) ? 1 : 0) + 2 * cb_) << 1;
    ca_ = (la >= 0) ? (!(la & 0x8) ? 1 : 0) : 0;
    cbp |= cab_decision(e, 73 + ca_ + 2 * (!(cbp & 0x1) ? 1 : 0)) << 2;
    int ctx = (!(cbp & 0x4) ? 1 : 0) + (!(cbp & 0x2) ? 2 : 0);
    cbp |= cab_decision(e, 73 + ctx) << 3;
    int ca = 0, cb = 0;
    if (mx > 0) {
        ca = (int)d->c_cbp_c[(long)my * mbw + mx - 1];
        if (d->c_pcm[(long)my * mbw + mx - 1])
            ca = 2;
    }
    if (my > my0) {
        cb = (int)d->c_cbp_c[(long)(my - 1) * mbw + mx];
        if (d->c_pcm[(long)(my - 1) * mbw + mx])
            cb = 2;
    }
    int cc = 0;
    if (cab_decision(e, 77 + (ca ? 1 : 0) + (cb ? 2 : 0)))
        cc = 1 + cab_decision(e, 81 + (ca == 2 ? 1 : 0) + (cb == 2 ? 2 : 0));
    *cbp_luma = cbp;
    *cbp_chroma = cc;
}

/* transform_size_8x8_flag (9.3.3.1.1.10): ctx 399 + condA + condB */
static int read_t8_flag_cab(H264Dec *d, CabSlice *cs, int mx, int my)
{
    int mbw = d->mbw;
    int inc = 0;
    if (mx > 0 && d->db_t8x8[(long)my * mbw + mx - 1])
        inc++;
    if (my > cs->s.my0 && d->db_t8x8[(long)(my - 1) * mbw + mx])
        inc++;
    return cab_decision(&cs->e, 399 + inc);
}

/* the four 8x8 luma residual blocks (cat 5) -> 16x16 spatial residual;
   cbf cells carry the CBP bit (what 4x4 neighbours see, 9.3.3.1.1.9),
   nnz cells carry the interleaved sub-block counts
   (= decode_luma8x8_cabac) */
static void decode_luma8x8_cab(H264Dec *d, CabSlice *cs, int mx, int my,
                               int cbp_luma_mb, int qp, i64 lres[16][16])
{
    int g4w = d->mbw * 4;
    for (int b = 0; b < 4; b++) {
        int has = (cbp_luma_mb >> b) & 1;
        i64 zz64[64];
        if (has)
            residual_cabac8(d, &cs->e, zz64);
        for (int k = 0; k < 4; k++) {
            int bx = BLK_ORDER[b * 4 + k][0], by = BLK_ORDER[b * 4 + k][1];
            long gi = (long)(my * 4 + by) * g4w + mx * 4 + bx;
            d->c_cbf_l4[gi] = has ? 1 : 0;
            int nz = 0;
            if (has)
                for (int i = 0; i < 16; i++)
                    nz += zz64[k + 4 * i] != 0;
            d->nnz_l[gi] = nz;
        }
        if (has) {
            i64 res[8][8];
            recon_res8_c(zz64, qp, res);
            int py8 = (b / 2) * 8, px8 = (b % 2) * 8;
            for (int rr2 = 0; rr2 < 8; rr2++)
                for (int cc = 0; cc < 8; cc++)
                    lres[py8 + rr2][px8 + cc] = res[rr2][cc];
        }
    }
}

static int read_ref_idx_cab_g(H264Dec *d, CabSlice *cs, int gy, int gx,
                              int lst)
{
    int act = lst ? cs->s.l1_active : cs->s.l0_active;
    if (act <= 1)
        return 0;
    int g4w = d->mbw * 4;
    int my0 = cs->s.my0;
    const int32_t *rg = lst ? d->ref4b : d->ref4;
    const uint8_t *rdg = lst ? d->rd4b : d->rd4;
    /* 9.3.3.1.1.6: a DIRECT neighbour never counts, even with a nonzero
       derived index (mirrors lavc's direct_cache gating) */
    int ca = (gx > 0 && rdg[(long)gy * g4w + gx - 1]
              && rg[(long)gy * g4w + gx - 1] > 0
              && !d->dir4[(long)gy * g4w + gx - 1]) ? 1 : 0;
    int cb = (gy > my0 * 4 && rdg[(long)(gy - 1) * g4w + gx]
              && rg[(long)(gy - 1) * g4w + gx] > 0
              && !d->dir4[(long)(gy - 1) * g4w + gx]) ? 1 : 0;
    if (!cab_decision(&cs->e, 54 + ca + 2 * cb))
        return 0;
    if (!cab_decision(&cs->e, 58))
        return 1;
    int ref = 2;
    while (cab_decision(&cs->e, 59)) {
        ref++;
        if (ref > 32)
            dec_fail(d, "ref_idx runaway");
    }
    if (ref >= act)
        dec_fail(d, "ref_idx out of range");
    return ref;
}

static int read_ref_idx_cab(H264Dec *d, CabSlice *cs, int gy, int gx)
{
    return read_ref_idx_cab_g(d, cs, gy, gx, 0);
}

static int note_ref_g(H264Dec *d, int gy, int gx, int pw4, int ph4,
                      int ri, int lst)
{
    int g4w = d->mbw * 4;
    int32_t *rg = lst ? d->ref4b : d->ref4;
    uint8_t *rdg = lst ? d->rd4b : d->rd4;
    for (int yy = 0; yy < ph4; yy++)
        for (int xx = 0; xx < pw4; xx++) {
            long gi = (long)(gy + yy) * g4w + gx + xx;
            rg[gi] = ri;
            rdg[gi] = 1;
        }
    return ri;
}

static int note_ref_c(H264Dec *d, int gy, int gx, int pw4, int ph4, int ri)
{
    return note_ref_g(d, gy, gx, pw4, ph4, ri, 0);
}

static void read_mvd_pair_g(H264Dec *d, CabSlice *cs, int gy, int gx,
                            int lst, int *mdx, int *mdy)
{
    int g4w = d->mbw * 4;
    int my0 = cs->s.my0;
    const int32_t *am = lst ? d->c_absmvd4b : d->c_absmvd4;
    int ax = 0, ay = 0;
    if (gx > 0 && d->dec4[(long)gy * g4w + gx - 1]) {
        ax += am[((long)gy * g4w + gx - 1) * 2];
        ay += am[((long)gy * g4w + gx - 1) * 2 + 1];
    }
    if (gy > my0 * 4 && d->dec4[(long)(gy - 1) * g4w + gx]) {
        ax += am[((long)(gy - 1) * g4w + gx) * 2];
        ay += am[((long)(gy - 1) * g4w + gx) * 2 + 1];
    }
    *mdx = read_mvd_c(d, &cs->e, 40, ax);
    *mdy = read_mvd_c(d, &cs->e, 47, ay);
}

static void read_mvd_pair_c(H264Dec *d, CabSlice *cs, int gy, int gx,
                            int *mdx, int *mdy)
{
    read_mvd_pair_g(d, cs, gy, gx, 0, mdx, mdy);
}

/* one list's motion + ctx grids for a B partition (-1 ri = unused) */
static void fill_list_cab(Slice *s, int gy, int gx, int pw4, int ph4,
                          int mvx, int mvy, int ri, int amx, int amy,
                          int lst, int direct)
{
    H264Dec *d = s->d;
    int g4w = d->mbw * 4;
    int32_t *mg = lst ? d->mv4b : d->mv4;
    int32_t *rg = lst ? d->ref4b : d->ref4;
    int32_t *pg = lst ? d->pid4b : d->pid4;
    uint8_t *rdg = lst ? d->rd4b : d->rd4;
    int32_t *am = lst ? d->c_absmvd4b : d->c_absmvd4;
    const int *lmap = lst ? s->l1map : s->l0map;
    int pid = ri >= 0 ? d->dpb_pid[lmap[ri]] : -1;
    for (int yy = 0; yy < ph4; yy++)
        for (int xx = 0; xx < pw4; xx++) {
            long gi = (long)(gy + yy) * g4w + gx + xx;
            mg[gi * 2] = ri >= 0 ? mvx : 0;
            mg[gi * 2 + 1] = ri >= 0 ? mvy : 0;
            rg[gi] = ri;
            pg[gi] = pid;
            rdg[gi] = 1;
            am[gi * 2] = amx;
            am[gi * 2 + 1] = amy;
            d->dir4[gi] = (uint8_t)direct;
            d->dec4[gi] = 1;
        }
}

static void fill4_cab(Slice *s, int gy, int gx, int pw4, int ph4,
                      int mvx, int mvy, int ri, int amx, int amy)
{
    H264Dec *d = s->d;
    int g4w = d->mbw * 4;
    int pid = d->dpb_pid[s->l0map[ri]];
    for (int yy = 0; yy < ph4; yy++)
        for (int xx = 0; xx < pw4; xx++) {
            long gi = (long)(gy + yy) * g4w + gx + xx;
            d->mv4[gi * 2] = mvx;
            d->mv4[gi * 2 + 1] = mvy;
            d->ref4[gi] = ri;
            d->pid4[gi] = pid;
            d->dec4[gi] = 1;
            d->rd4[gi] = 1;
            d->c_absmvd4[gi * 2] = amx;
            d->c_absmvd4[gi * 2 + 1] = amy;
        }
}

/* CABAC chroma residuals (= chroma_residuals_cabac) */
static void chroma_residuals_cab(H264Dec *d, CabSlice *cs, int cbp_chroma,
                                 int mx, int my, const i64 vc[4][4], int qpc,
                                 i64 res[2][8][8])
{
    int mbw = d->mbw, mbh = d->mbh;
    int g2w = mbw * 2;
    i64 cdc[2][4];
    i64 cac[2][2][2][16];
    memset(cdc, 0, sizeof(cdc));
    memset(cac, 0, sizeof(cac));
    if (cbp_chroma) {
        for (int ci = 0; ci < 2; ci++) {
            const int32_t *grid = d->c_cbf_cdc + (long)ci * mbh * mbw;
            int inc = cbf_inc_mb_c(d, cs, grid, mx, my, NULL, d->c_cbp_c);
            i64 zz[4];
            if (residual_cabac(d, &cs->e, 3, 4, inc, zz)) {
                for (int i = 0; i < 4; i++)
                    cdc[ci][i] = zz[i];
                d->c_cbf_cdc[(long)ci * mbh * mbw + (long)my * mbw + mx] = 1;
            }
        }
    }
    if (cbp_chroma == 2) {
        static const int CBO[4][2] = {{0, 0}, {1, 0}, {0, 1}, {1, 1}};
        for (int ci = 0; ci < 2; ci++) {
            int32_t *grid = d->c_cbf_c4 + (long)ci * mbh * 2 * g2w;
            for (int k = 0; k < 4; k++) {
                int bx = CBO[k][0], by = CBO[k][1];
                int gx = mx * 2 + bx, gy = my * 2 + by;
                int inc = cbf_inc_blk_c(cs, grid, g2w, gy, gx, cs->s.my0 * 2);
                i64 zz[15];
                if (residual_cabac(d, &cs->e, 4, 15, inc, zz)) {
                    int nz = 0;
                    for (int i = 0; i < 15; i++) {
                        cac[ci][by][bx][1 + i] = zz[i];
                        nz += zz[i] != 0;
                    }
                    grid[(long)gy * g2w + gx] = 1;
                    d->nnz_c[ci][(long)gy * g2w + gx] = nz;
                } else {
                    d->nnz_c[ci][(long)gy * g2w + gx] = 0;
                }
            }
        }
    } else {
        for (int ci = 0; ci < 2; ci++)
            for (int by = 0; by < 2; by++)
                for (int bx = 0; bx < 2; bx++)
                    d->nnz_c[ci][(long)(my * 2 + by) * g2w + mx * 2 + bx] = 0;
    }
    chroma_finish((const i64(*)[4])cdc, (const i64(*)[2][2][16])cac, vc, qpc, res);
}

/* intra MB in a CABAC slice (I_NxN / I_16x16) */
static void decode_intra_mb_cab(H264Dec *d, CabSlice *cs, int mx, int my,
                                int mb_type)
{
    Slice *s = &cs->s;
    Cab *e = &cs->e;
    int mbw = d->mbw;
    int g4w = mbw * 4;
    long mi = (long)my * mbw + mx;
    uint8_t *Y = YP(d);
    long pw = d->pw;
    if (mb_type == 25)
        dec_fail(d, "I_PCM in CABAC stream");
    if (mb_type == 0 && d->pps.transform_8x8
        && read_t8_flag_cab(d, cs, mx, my)) {
        /* ---- Intra_8x8 (High profile) ---- */
        int modes8[4];
        for (int b = 0; b < 4; b++) {
            int gx = mx * 4 + (b % 2) * 2;
            int gy = my * 4 + (b / 2) * 2;
            int ma = (gx > 0 && d->avail4[(long)gy * g4w + gx - 1])
                         ? (int)d->i4mode[(long)gy * g4w + gx - 1] : -1;
            int mb_ = (gy > s->my0 * 4 && d->avail4[(long)(gy - 1) * g4w + gx])
                          ? (int)d->i4mode[(long)(gy - 1) * g4w + gx] : -1;
            int pm = (ma >= 0 ? ma : 2) < (mb_ >= 0 ? mb_ : 2)
                         ? (ma >= 0 ? ma : 2) : (mb_ >= 0 ? mb_ : 2);
            if (ma < 0 || mb_ < 0)
                pm = 2;
            if (cab_decision(e, 68)) {
                modes8[b] = pm;
            } else {
                int rem = cab_decision(e, 69);
                rem += 2 * cab_decision(e, 69);
                rem += 4 * cab_decision(e, 69);
                modes8[b] = rem < pm ? rem : rem + 1;
            }
            for (int dy = 0; dy < 2; dy++)
                for (int dx = 0; dx < 2; dx++) {
                    long gi = (long)(gy + dy) * g4w + gx + dx;
                    d->i4mode[gi] = modes8[b];
                    d->avail4[gi] = 1;
                }
        }
        int chroma_mode8 = read_chroma_mode_c(d, cs, mx, my);
        int cbp_l8, cbp_c8;
        read_cbp_c(d, cs, mx, my, &cbp_l8, &cbp_c8);
        d->c_intra[mi] = 1;
        d->c_i16[mi] = 0;
        d->db_t8x8[mi] = 1;
        d->c_chroma_mode[mi] = chroma_mode8;
        d->c_cbp_l[mi] = cbp_l8;
        d->c_cbp_c[mi] = cbp_c8;
        if (cbp_l8 || cbp_c8) {
            int dqp = read_dqp_c(d, e, cs->last_dqp);
            cs->last_dqp = dqp;
            s->qp += dqp;
        } else {
            cs->last_dqp = 0;
        }
        int qpc8 = chroma_qp((s->qp + d->pps.chroma_off) < 0 ? 0 :
                             ((s->qp + d->pps.chroma_off) > 51 ? 51 : s->qp + d->pps.chroma_off));
        i64 vc8[4][4];
        vmat(qpc8, vc8);
        i64 lres8[16][16];
        memset(lres8, 0, sizeof(lres8));
        decode_luma8x8_cab(d, cs, mx, my, cbp_l8, s->qp, lres8);
        for (int b = 0; b < 4; b++) {
            int gx = mx * 4 + (b % 2) * 2;
            int gy = my * 4 + (b / 2) * 2;
            int px = gx * 4, py = gy * 4;
            i64 t16[16], l8[8], tl = 0;
            int has_t, has_l, has_tl;
            luma_neighbors8_c(s, px, py, t16, &has_t, l8, &has_l, &tl,
                              &has_tl);
            filter_refs8_c(t16, has_t, l8, has_l, &tl, has_tl);
            i64 pred[8][8];
            pred8x8_c(d, modes8[b], t16, has_t, l8, has_l, tl, has_tl, pred);
            int py8 = (b / 2) * 8, px8 = (b % 2) * 8;
            for (int rr2 = 0; rr2 < 8; rr2++)
                for (int cc = 0; cc < 8; cc++)
                    Y[(long)(py + rr2) * pw + px + cc] = clip255(
                        pred[rr2][cc] + lres8[py8 + rr2][px8 + cc]);
            for (int dy = 0; dy < 2; dy++)
                for (int dx = 0; dx < 2; dx++)
                    d->done4[(long)(gy + dy) * g4w + gx + dx] = 1;
        }
        i64 cres8[2][8][8];
        chroma_residuals_cab(d, cs, cbp_c8, mx, my, (const i64(*)[4])vc8,
                             qpc8, cres8);
        recon_chroma(s, mx, my, chroma_mode8, (const i64(*)[8][8])cres8);
        record_mb(s, my, mx, 1, 0);
        d->db_t8x8[mi] = 1;
        return;
    }
    int modes[16];
    int chroma_mode, cbp_luma_mb, cbp_chroma;
    if (mb_type == 0) {
        for (int bi = 0; bi < 16; bi++) {
            int bx = BLK_ORDER[bi][0], by = BLK_ORDER[bi][1];
            int gx = mx * 4 + bx, gy = my * 4 + by;
            int ma = (gx > 0 && d->avail4[(long)gy * g4w + gx - 1])
                         ? (int)d->i4mode[(long)gy * g4w + gx - 1] : -1;
            int mb_ = (gy > s->my0 * 4 && d->avail4[(long)(gy - 1) * g4w + gx])
                          ? (int)d->i4mode[(long)(gy - 1) * g4w + gx] : -1;
            int pm = (ma >= 0 ? ma : 2) < (mb_ >= 0 ? mb_ : 2)
                         ? (ma >= 0 ? ma : 2) : (mb_ >= 0 ? mb_ : 2);
            if (ma < 0 || mb_ < 0)
                pm = 2;
            if (cab_decision(e, 68)) {
                modes[bi] = pm;
            } else {
                int rem = cab_decision(e, 69);
                rem += 2 * cab_decision(e, 69);
                rem += 4 * cab_decision(e, 69);
                modes[bi] = rem < pm ? rem : rem + 1;
            }
            d->i4mode[(long)gy * g4w + gx] = modes[bi];
            d->avail4[(long)gy * g4w + gx] = 1;
        }
        chroma_mode = read_chroma_mode_c(d, cs, mx, my);
        read_cbp_c(d, cs, mx, my, &cbp_luma_mb, &cbp_chroma);
    } else {
        int t = mb_type - 1;
        cbp_chroma = (t / 4) % 3;
        cbp_luma_mb = t >= 12 ? 15 : 0;
        chroma_mode = read_chroma_mode_c(d, cs, mx, my);
        for (int by = 0; by < 4; by++)
            for (int bx = 0; bx < 4; bx++) {
                long gi = (long)(my * 4 + by) * g4w + mx * 4 + bx;
                d->i4mode[gi] = 2;
                d->avail4[gi] = 1;
            }
    }
    d->c_intra[mi] = 1;
    d->c_i16[mi] = mb_type != 0;
    d->c_chroma_mode[mi] = chroma_mode;
    d->c_cbp_l[mi] = cbp_luma_mb;
    d->c_cbp_c[mi] = cbp_chroma;

    if (mb_type == 0) {
        if (cbp_luma_mb || cbp_chroma) {
            int dqp = read_dqp_c(d, e, cs->last_dqp);
            cs->last_dqp = dqp;
            s->qp += dqp;
        } else {
            cs->last_dqp = 0;
        }
        int qpc = chroma_qp((s->qp + d->pps.chroma_off) < 0 ? 0 :
                            ((s->qp + d->pps.chroma_off) > 51 ? 51 : s->qp + d->pps.chroma_off));
        i64 vy[4][4], vc[4][4];
        vmat(s->qp, vy);
        vmat(qpc, vc);
        for (int bi = 0; bi < 16; bi++) {
            int bx = BLK_ORDER[bi][0], by = BLK_ORDER[bi][1];
            int gx = mx * 4 + bx, gy = my * 4 + by;
            int px = gx * 4, py = gy * 4;
            int mode = modes[bi];
            int need_tr = mode == 3 || mode == 7;
            i64 t8[8], l4[4];
            int has_t, has_l, tl;
            luma_neighbors(s, px, py, need_tr, t8, &has_t, l4, &has_l, &tl);
            i64 pred[4][4];
            pred4x4(d, mode, has_t ? t8 : NULL, has_l ? l4 : NULL, tl, pred);
            int has = (cbp_luma_mb >> (bi / 4)) & 1;
            i64 res[4][4] = {{0}};
            long gi = (long)gy * g4w + gx;
            if (has) {
                int inc = cbf_inc_blk_c(cs, d->c_cbf_l4, g4w, gy, gx,
                                        s->my0 * 4);
                i64 zz[16];
                if (residual_cabac(d, e, 2, 16, inc, zz)) {
                    d->c_cbf_l4[gi] = 1;
                    int nz = 0;
                    for (int i = 0; i < 16; i++)
                        nz += zz[i] != 0;
                    d->nnz_l[gi] = nz;
                    finish_block4(zz, (const i64(*)[4])vy, s->qp, 0, 0, res);
                } else {
                    d->c_cbf_l4[gi] = 0;
                    d->nnz_l[gi] = 0;
                }
            } else {
                d->c_cbf_l4[gi] = 0;
                d->nnz_l[gi] = 0;
            }
            for (int rr2 = 0; rr2 < 4; rr2++)
                for (int cc = 0; cc < 4; cc++)
                    Y[(long)(py + rr2) * pw + px + cc] =
                        clip255(pred[rr2][cc] + res[rr2][cc]);
            d->done4[gi] = 1;
        }
        i64 cres[2][8][8];
        chroma_residuals_cab(d, cs, cbp_chroma, mx, my, (const i64(*)[4])vc,
                             qpc, cres);
        recon_chroma(s, mx, my, chroma_mode, (const i64(*)[8][8])cres);
        record_mb(s, my, mx, 1, 0);
        return;
    }

    /* ---- I_16x16 ---- */
    int pred_mode16 = (mb_type - 1) % 4;
    int dqp = read_dqp_c(d, e, cs->last_dqp);
    cs->last_dqp = dqp;
    s->qp += dqp;
    int qpc = chroma_qp((s->qp + d->pps.chroma_off) < 0 ? 0 :
                        ((s->qp + d->pps.chroma_off) > 51 ? 51 : s->qp + d->pps.chroma_off));
    i64 vy[4][4], vc[4][4];
    vmat(s->qp, vy);
    vmat(qpc, vc);
    int inc = cbf_inc_mb_c(d, cs, d->c_cbf_ldc, mx, my, d->c_i16, NULL);
    i64 dc_zz[16];
    memset(dc_zz, 0, sizeof(dc_zz));
    if (residual_cabac(d, e, 0, 16, inc, dc_zz))
        d->c_cbf_ldc[mi] = 1;
    i64 ac[4][4][16];
    memset(ac, 0, sizeof(ac));
    if (cbp_luma_mb) {
        for (int bi = 0; bi < 16; bi++) {
            int bx = BLK_ORDER[bi][0], by = BLK_ORDER[bi][1];
            int gx = mx * 4 + bx, gy = my * 4 + by;
            long gi = (long)gy * g4w + gx;
            int binc = cbf_inc_blk_c(cs, d->c_cbf_l4, g4w, gy, gx, s->my0 * 4);
            i64 zz[15];
            if (residual_cabac(d, e, 1, 15, binc, zz)) {
                int nz = 0;
                for (int i = 0; i < 15; i++) {
                    ac[by][bx][1 + i] = zz[i];
                    nz += zz[i] != 0;
                }
                d->c_cbf_l4[gi] = 1;
                d->nnz_l[gi] = nz;
            } else {
                d->nnz_l[gi] = 0;
            }
        }
    } else {
        for (int by = 0; by < 4; by++)
            for (int bx = 0; bx < 4; bx++)
                d->nnz_l[(long)(my * 4 + by) * g4w + mx * 4 + bx] = 0;
    }
    i64 pred16[16][16];
    pred16_select(s, mx, my, pred_mode16, pred16);
    recon_i16_luma(s, mx, my, (const i64(*)[16])pred16, dc_zz,
                   (const i64(*)[4][16])ac, (const i64(*)[4])vy, s->qp);
    for (int by = 0; by < 4; by++)
        for (int bx = 0; bx < 4; bx++)
            d->done4[(long)(my * 4 + by) * g4w + mx * 4 + bx] = 1;
    i64 cres[2][8][8];
    chroma_residuals_cab(d, cs, cbp_chroma, mx, my, (const i64(*)[4])vc,
                         qpc, cres);
    recon_chroma(s, mx, my, chroma_mode, (const i64(*)[8][8])cres);
    record_mb(s, my, mx, 1, 0);
}

/* P skip / P inter MB in a CABAC slice */
static void decode_p_skip_cab(H264Dec *d, CabSlice *cs, int mx, int my)
{
    Slice *s = &cs->s;
    int g4w = d->mbw * 4;
    int mvx, mvy;
    skip_mv4_c(d, d->dec4, mx, my, s->my0, &mvx, &mvy);
    i64 pred16[16][16], predc[2][8][8];
    static const i64 zero16[16][16];
    static const i64 zero8[2][8][8];
    part_pred_c(s, mx, my, my * 4, mx * 4, 4, 4, mvx, mvy, 0, pred16, predc);
    recon_p_mb(s, mx, my, (const i64(*)[16])pred16,
               (const i64(*)[8][8])predc, zero16, zero8);
    fill4_cab(s, my * 4, mx * 4, 4, 4, mvx, mvy, 0, 0, 0);
    for (int by = 0; by < 4; by++)
        for (int bx = 0; bx < 4; bx++) {
            long gi = (long)(my * 4 + by) * g4w + mx * 4 + bx;
            d->nnz_l[gi] = 0;
            d->done4[gi] = 1;
            d->i4mode[gi] = 2;
            d->avail4[gi] = 1;
        }
    record_mb(s, my, mx, 0, 0);
}

static void cab_inter_tail(H264Dec *d, CabSlice *cs, int mx, int my,
                           int small_parts,
                           i64 pred16[16][16], i64 predc[2][8][8]);

static void decode_p_mb_cab(H264Dec *d, CabSlice *cs, int mx, int my,
                            int mb_type)
{
    Slice *s = &cs->s;
    Cab *e = &cs->e;
    int g4w = d->mbw * 4, g2w = d->mbw * 2;
    int gy0 = my * 4, gx0 = mx * 4;
    int all_sub8 = 1;   /* no P_8x8 partition below 8x8 */
    i64 pred16[16][16], predc[2][8][8];
    memset(pred16, 0, sizeof(pred16));
    memset(predc, 0, sizeof(predc));
    for (int by = 0; by < 4; by++)
        for (int bx = 0; bx < 4; bx++) {
            long gi = (long)(gy0 + by) * g4w + gx0 + bx;
            d->i4mode[gi] = 2;
            d->avail4[gi] = 1;
        }
    if (mb_type == 0) {
        int ri = note_ref_c(d, gy0, gx0, 4, 4, read_ref_idx_cab(d, cs, gy0, gx0));
        int mdx, mdy;
        read_mvd_pair_c(d, cs, gy0, gx0, &mdx, &mdy);
        int pmx, pmy;
        mv_pred4_c(d, d->dec4, gy0, gx0, 4, ri, s->my0, SH_NONE, &pmx, &pmy);
        int mvx = pmx + mdx, mvy = pmy + mdy;
        part_pred_c(s, mx, my, gy0, gx0, 4, 4, mvx, mvy, ri, pred16, predc);
        fill4_cab(s, gy0, gx0, 4, 4, mvx, mvy, ri,
                  mdx < 0 ? -mdx : mdx, mdy < 0 ? -mdy : mdy);
    } else if (mb_type == 1 || mb_type == 2) {
        int geo[2][5];
        if (mb_type == 1) {
            int g0[5] = {gy0, gx0, 4, 2, SH_16x8_0};
            int g1[5] = {gy0 + 2, gx0, 4, 2, SH_16x8_1};
            memcpy(geo[0], g0, sizeof(g0));
            memcpy(geo[1], g1, sizeof(g1));
        } else {
            int g0[5] = {gy0, gx0, 2, 4, SH_8x16_0};
            int g1[5] = {gy0, gx0 + 2, 2, 4, SH_8x16_1};
            memcpy(geo[0], g0, sizeof(g0));
            memcpy(geo[1], g1, sizeof(g1));
        }
        int ris[2];
        for (int p = 0; p < 2; p++)
            ris[p] = note_ref_c(d, geo[p][0], geo[p][1], geo[p][2], geo[p][3],
                                read_ref_idx_cab(d, cs, geo[p][0], geo[p][1]));
        for (int p = 0; p < 2; p++) {
            int gy = geo[p][0], gx = geo[p][1];
            int pw4 = geo[p][2], ph4 = geo[p][3], shape = geo[p][4];
            int mdx, mdy;
            read_mvd_pair_c(d, cs, gy, gx, &mdx, &mdy);
            int pmx, pmy;
            mv_pred4_c(d, d->dec4, gy, gx, pw4, ris[p], s->my0, shape,
                       &pmx, &pmy);
            int mvx = pmx + mdx, mvy = pmy + mdy;
            part_pred_c(s, mx, my, gy, gx, pw4, ph4, mvx, mvy, ris[p],
                        pred16, predc);
            fill4_cab(s, gy, gx, pw4, ph4, mvx, mvy, ris[p],
                      mdx < 0 ? -mdx : mdx, mdy < 0 ? -mdy : mdy);
        }
    } else { /* P_8x8 */
        int subs[4];
        for (int b = 0; b < 4; b++) {
            if (cab_decision(e, 21))
                subs[b] = 0;
            else if (!cab_decision(e, 22))
                subs[b] = 1;
            else if (cab_decision(e, 23))
                subs[b] = 2;
            else
                subs[b] = 3;
            if (subs[b] != 0)
                all_sub8 = 0;
        }
        int ris[4];
        for (int b = 0; b < 4; b++) {
            int by = gy0 + (b / 2) * 2, bx = gx0 + (b % 2) * 2;
            ris[b] = note_ref_c(d, by, bx, 2, 2,
                                read_ref_idx_cab(d, cs, by, bx));
        }
        for (int b = 0; b < 4; b++) {
            int by = gy0 + (b / 2) * 2, bx = gx0 + (b % 2) * 2;
            for (int p = 0; p < SUB_NPARTS[subs[b]]; p++) {
                int dy = SUB_PARTS[subs[b]][p][0];
                int dx = SUB_PARTS[subs[b]][p][1];
                int pw4 = SUB_PARTS[subs[b]][p][2];
                int ph4 = SUB_PARTS[subs[b]][p][3];
                int gy = by + dy, gx = bx + dx;
                int mdx, mdy;
                read_mvd_pair_c(d, cs, gy, gx, &mdx, &mdy);
                int pmx, pmy;
                mv_pred4_c(d, d->dec4, gy, gx, pw4, ris[b], s->my0, SH_NONE,
                           &pmx, &pmy);
                int mvx = pmx + mdx, mvy = pmy + mdy;
                part_pred_c(s, mx, my, gy, gx, pw4, ph4, mvx, mvy, ris[b],
                            pred16, predc);
                fill4_cab(s, gy, gx, pw4, ph4, mvx, mvy, ris[b],
                          mdx < 0 ? -mdx : mdx, mdy < 0 ? -mdy : mdy);
            }
        }
    }
    cab_inter_tail(d, cs, mx, my, !(mb_type <= 2 || all_sub8),
                   pred16, predc);
}

/* cbp -> t8 flag -> dqp -> residuals -> recon, shared by P and B
 * CABAC inter MBs */
static void cab_inter_tail(H264Dec *d, CabSlice *cs, int mx, int my,
                           int small_parts,
                           i64 pred16[16][16], i64 predc[2][8][8])
{
    Slice *s = &cs->s;
    Cab *e = &cs->e;
    int g4w = d->mbw * 4, g2w = d->mbw * 2;
    int gy0 = my * 4, gx0 = mx * 4;
    (void)e;
    int cbp_luma_mb, cbp_chroma;
    read_cbp_c(d, cs, mx, my, &cbp_luma_mb, &cbp_chroma);
    long mi = (long)my * d->mbw + mx;
    d->c_cbp_l[mi] = cbp_luma_mb;
    d->c_cbp_c[mi] = cbp_chroma;
    int t8 = 0;
    if (cbp_luma_mb && d->pps.transform_8x8 && !small_parts) {
        t8 = read_t8_flag_cab(d, cs, mx, my);
        d->db_t8x8[mi] = (uint8_t)t8;
    }
    i64 lres[16][16];
    i64 cres[2][8][8];
    memset(lres, 0, sizeof(lres));
    memset(cres, 0, sizeof(cres));
    if (cbp_luma_mb || cbp_chroma) {
        int dqp = read_dqp_c(d, e, cs->last_dqp);
        cs->last_dqp = dqp;
        s->qp += dqp;
        int qpc = chroma_qp((s->qp + d->pps.chroma_off) < 0 ? 0 :
                            ((s->qp + d->pps.chroma_off) > 51 ? 51 : s->qp + d->pps.chroma_off));
        i64 vy[4][4], vc[4][4];
        vmat(s->qp, vy);
        vmat(qpc, vc);
        if (t8) {
            decode_luma8x8_cab(d, cs, mx, my, cbp_luma_mb, s->qp, lres);
        } else
        for (int bi = 0; bi < 16; bi++) {
            int bx = BLK_ORDER[bi][0], by = BLK_ORDER[bi][1];
            int gx = mx * 4 + bx, gy = my * 4 + by;
            long gi = (long)gy * g4w + gx;
            int has = (cbp_luma_mb >> (bi / 4)) & 1;
            if (has) {
                int inc = cbf_inc_blk_c(cs, d->c_cbf_l4, g4w, gy, gx,
                                        s->my0 * 4);
                i64 zz[16];
                if (residual_cabac(d, e, 2, 16, inc, zz)) {
                    d->c_cbf_l4[gi] = 1;
                    int nz = 0;
                    for (int i = 0; i < 16; i++)
                        nz += zz[i] != 0;
                    d->nnz_l[gi] = nz;
                    i64 res[4][4];
                    finish_block4(zz, (const i64(*)[4])vy, s->qp, 0, 0, res);
                    for (int rr2 = 0; rr2 < 4; rr2++)
                        for (int cc = 0; cc < 4; cc++)
                            lres[by * 4 + rr2][bx * 4 + cc] = res[rr2][cc];
                } else {
                    d->c_cbf_l4[gi] = 0;
                    d->nnz_l[gi] = 0;
                }
            } else {
                d->c_cbf_l4[gi] = 0;
                d->nnz_l[gi] = 0;
            }
        }
        chroma_residuals_cab(d, cs, cbp_chroma, mx, my, (const i64(*)[4])vc,
                             qpc, cres);
    } else {
        cs->last_dqp = 0;
        for (int by = 0; by < 4; by++)
            for (int bx = 0; bx < 4; bx++)
                d->nnz_l[(long)(gy0 + by) * g4w + gx0 + bx] = 0;
        for (int ci = 0; ci < 2; ci++)
            for (int by = 0; by < 2; by++)
                for (int bx = 0; bx < 2; bx++)
                    d->nnz_c[ci][(long)(my * 2 + by) * g2w + mx * 2 + bx] = 0;
    }
    recon_p_mb(s, mx, my, (const i64(*)[16])pred16,
               (const i64(*)[8][8])predc, (const i64(*)[16])lres,
               (const i64(*)[8][8])cres);
    for (int by = 0; by < 4; by++)
        for (int bx = 0; bx < 4; bx++)
            d->done4[(long)(gy0 + by) * g4w + gx0 + bx] = 1;
    record_mb(s, my, mx, 0, 0);
}

/* B_Skip / B_Direct_16x16 for CABAC slices (absmvd ctx grids zeroed) */
static void direct_block_cab(Slice *s, int mx, int my,
                             i64 pred16[16][16], i64 predc[2][8][8])
{
    int gy0 = my * 4, gx0 = mx * 4;
    int ri0, ri1, m0x, m0y, m1x, m1y, zp;
    direct_params_c(s, gy0, gx0, &ri0, &ri1, &m0x, &m0y, &m1x, &m1y, &zp);
    for (int q = 0; q < 4; q++) {
        int qy = gy0 + (q / 2) * 2, qx = gx0 + (q % 2) * 2;
        int cz = !zp && col_zero_c(s, gy0, gx0, q);
        int a0x = (zp || (cz && ri0 == 0)) ? 0 : m0x;
        int a0y = (zp || (cz && ri0 == 0)) ? 0 : m0y;
        int a1x = (zp || (cz && ri1 == 0)) ? 0 : m1x;
        int a1y = (zp || (cz && ri1 == 0)) ? 0 : m1y;
        part_pred_b_c(s, mx, my, qy, qx, 2, 2, a0x, a0y, a1x, a1y,
                      ri0, ri1, pred16, predc);
        fill_list_cab(s, qy, qx, 2, 2, a0x, a0y, ri0, 0, 0, 0, 1);
        fill_list_cab(s, qy, qx, 2, 2, a1x, a1y, ri1, 0, 0, 1, 1);
    }
}

/* B mb_type binarization (Table 9-37, ctx 27..31); >= 23 = intra esc */
static int read_b_mb_type_cab(H264Dec *d, CabSlice *cs, int mx, int my)
{
    Cab *e = &cs->e;
    int mbw = d->mbw;
    int my0 = cs->s.my0;
    int inc = 0;
    if (mx > 0 && !d->c_bdirect[(long)my * mbw + mx - 1])
        inc++;
    if (my > my0 && !d->c_bdirect[(long)(my - 1) * mbw + mx])
        inc++;
    if (!cab_decision(e, 27 + inc))
        return 0;                    /* B_Direct_16x16 */
    if (!cab_decision(e, 27 + 3))
        return 1 + cab_decision(e, 27 + 5);
    int bits = cab_decision(e, 27 + 4) << 3;
    bits |= cab_decision(e, 27 + 5) << 2;
    bits |= cab_decision(e, 27 + 5) << 1;
    bits |= cab_decision(e, 27 + 5);
    if (bits < 8)
        return bits + 3;
    if (bits == 13)
        return 23 + intra_mb_type_c(e, 32, 0, 0);
    if (bits == 14)
        return 11;
    if (bits == 15)
        return 22;
    bits = (bits << 1) | cab_decision(e, 27 + 5);
    return bits - 4;
}

/* B sub_mb_type binarization (Table 9-38, ctx 36..39) */
static int read_b_sub_type_cab(CabSlice *cs)
{
    Cab *e = &cs->e;
    if (!cab_decision(e, 36))
        return 0;
    if (!cab_decision(e, 37))
        return 1 + cab_decision(e, 39);
    int t = 3;
    if (cab_decision(e, 38)) {
        if (cab_decision(e, 39))
            return 11 + cab_decision(e, 39);
        t += 4;
    }
    t += 2 * cab_decision(e, 39);
    t += cab_decision(e, 39);
    return t;
}

static void decode_b_skip_cab(H264Dec *d, CabSlice *cs, int mx, int my)
{
    Slice *s = &cs->s;
    int g4w = d->mbw * 4;
    i64 pred16[16][16], predc[2][8][8];
    memset(pred16, 0, sizeof(pred16));
    memset(predc, 0, sizeof(predc));
    direct_block_cab(s, mx, my, pred16, predc);
    static const i64 zero16[16][16];
    static const i64 zero8[2][8][8];
    recon_p_mb(s, mx, my, (const i64(*)[16])pred16,
               (const i64(*)[8][8])predc, zero16, zero8);
    for (int by = 0; by < 4; by++)
        for (int bx = 0; bx < 4; bx++) {
            long gi = (long)(my * 4 + by) * g4w + mx * 4 + bx;
            d->nnz_l[gi] = 0;
            d->done4[gi] = 1;
            d->avail4[gi] = 1;
            d->i4mode[gi] = 2;
        }
    record_mb(s, my, mx, 0, 0);
}

static void decode_b_mb_cab(H264Dec *d, CabSlice *cs, int mx, int my,
                            int mb_type)
{
    Slice *s = &cs->s;
    int g4w = d->mbw * 4;
    int gy0 = my * 4, gx0 = mx * 4;
    i64 pred16[16][16], predc[2][8][8];
    memset(pred16, 0, sizeof(pred16));
    memset(predc, 0, sizeof(predc));
    for (int by = 0; by < 4; by++)
        for (int bx = 0; bx < 4; bx++) {
            long gi = (long)(gy0 + by) * g4w + gx0 + bx;
            d->i4mode[gi] = 2;
            d->avail4[gi] = 1;
        }
    int small_parts = 0;
    if (mb_type == 0) {
        direct_block_cab(s, mx, my, pred16, predc);
    } else if (mb_type <= 3) {
        int use0 = mb_type == 1 || mb_type == 3;
        int use1 = mb_type == 2 || mb_type == 3;
        int ri0 = use0 ? note_ref_g(d, gy0, gx0, 4, 4,
                                    read_ref_idx_cab_g(d, cs, gy0, gx0, 0),
                                    0) : -1;
        int ri1 = use1 ? note_ref_g(d, gy0, gx0, 4, 4,
                                    read_ref_idx_cab_g(d, cs, gy0, gx0, 1),
                                    1) : -1;
        int m0x = 0, m0y = 0, m1x = 0, m1y = 0;
        if (use0) {
            int mdx, mdy, pmx, pmy;
            read_mvd_pair_g(d, cs, gy0, gx0, 0, &mdx, &mdy);
            mv_pred4_c(d, d->dec4, gy0, gx0, 4, ri0, s->my0, SH_NONE,
                       &pmx, &pmy);
            m0x = pmx + mdx;
            m0y = pmy + mdy;
            fill_list_cab(s, gy0, gx0, 4, 4, m0x, m0y, ri0,
                          mdx < 0 ? -mdx : mdx, mdy < 0 ? -mdy : mdy, 0, 0);
        } else {
            fill_list_cab(s, gy0, gx0, 4, 4, 0, 0, -1, 0, 0, 0, 0);
        }
        if (use1) {
            int mdx, mdy, pmx, pmy;
            read_mvd_pair_g(d, cs, gy0, gx0, 1, &mdx, &mdy);
            mv_pred4_b(d, d->dec4, gy0, gx0, 4, ri1, s->my0, SH_NONE,
                       &pmx, &pmy);
            m1x = pmx + mdx;
            m1y = pmy + mdy;
            fill_list_cab(s, gy0, gx0, 4, 4, m1x, m1y, ri1,
                          mdx < 0 ? -mdx : mdx, mdy < 0 ? -mdy : mdy, 1, 0);
        } else {
            fill_list_cab(s, gy0, gx0, 4, 4, 0, 0, -1, 0, 0, 1, 0);
        }
        part_pred_b_c(s, mx, my, gy0, gx0, 4, 4, m0x, m0y, m1x, m1y,
                      ri0, ri1, pred16, predc);
    } else if (mb_type <= 21) {
        const int *pair = B_PAIR[(mb_type - 4) / 2];
        int geo[2][5];
        if ((mb_type - 4) % 2 == 0) {
            int g0[5] = {gy0, gx0, 4, 2, SH_16x8_0};
            int g1[5] = {gy0 + 2, gx0, 4, 2, SH_16x8_1};
            memcpy(geo[0], g0, sizeof(g0));
            memcpy(geo[1], g1, sizeof(g1));
        } else {
            int g0[5] = {gy0, gx0, 2, 4, SH_8x16_0};
            int g1[5] = {gy0, gx0 + 2, 2, 4, SH_8x16_1};
            memcpy(geo[0], g0, sizeof(g0));
            memcpy(geo[1], g1, sizeof(g1));
        }
        int use0[2], use1[2], ri0[2], ri1[2];
        for (int p = 0; p < 2; p++) {
            use0[p] = pair[p] == 0 || pair[p] == 2;
            use1[p] = pair[p] == 1 || pair[p] == 2;
        }
        for (int p = 0; p < 2; p++)
            ri0[p] = use0[p]
                ? note_ref_g(d, geo[p][0], geo[p][1], geo[p][2], geo[p][3],
                             read_ref_idx_cab_g(d, cs, geo[p][0],
                                                geo[p][1], 0), 0)
                : -1;
        for (int p = 0; p < 2; p++)
            ri1[p] = use1[p]
                ? note_ref_g(d, geo[p][0], geo[p][1], geo[p][2], geo[p][3],
                             read_ref_idx_cab_g(d, cs, geo[p][0],
                                                geo[p][1], 1), 1)
                : -1;
        int mv0[2][2], mv1[2][2];
        for (int p = 0; p < 2; p++) {
            int gy = geo[p][0], gx = geo[p][1];
            int pw4 = geo[p][2], ph4 = geo[p][3], shape = geo[p][4];
            mv0[p][0] = mv0[p][1] = 0;
            if (use0[p]) {
                int mdx, mdy, pmx, pmy;
                read_mvd_pair_g(d, cs, gy, gx, 0, &mdx, &mdy);
                mv_pred4_c(d, d->dec4, gy, gx, pw4, ri0[p], s->my0, shape,
                           &pmx, &pmy);
                mv0[p][0] = pmx + mdx;
                mv0[p][1] = pmy + mdy;
                fill_list_cab(s, gy, gx, pw4, ph4, mv0[p][0], mv0[p][1],
                              ri0[p], mdx < 0 ? -mdx : mdx,
                              mdy < 0 ? -mdy : mdy, 0, 0);
            } else {
                fill_list_cab(s, gy, gx, pw4, ph4, 0, 0, -1, 0, 0, 0, 0);
            }
        }
        for (int p = 0; p < 2; p++) {
            int gy = geo[p][0], gx = geo[p][1];
            int pw4 = geo[p][2], ph4 = geo[p][3], shape = geo[p][4];
            mv1[p][0] = mv1[p][1] = 0;
            if (use1[p]) {
                int mdx, mdy, pmx, pmy;
                read_mvd_pair_g(d, cs, gy, gx, 1, &mdx, &mdy);
                mv_pred4_b(d, d->dec4, gy, gx, pw4, ri1[p], s->my0, shape,
                           &pmx, &pmy);
                mv1[p][0] = pmx + mdx;
                mv1[p][1] = pmy + mdy;
                fill_list_cab(s, gy, gx, pw4, ph4, mv1[p][0], mv1[p][1],
                              ri1[p], mdx < 0 ? -mdx : mdx,
                              mdy < 0 ? -mdy : mdy, 1, 0);
            } else {
                fill_list_cab(s, gy, gx, pw4, ph4, 0, 0, -1, 0, 0, 1, 0);
            }
        }
        for (int p = 0; p < 2; p++)
            part_pred_b_c(s, mx, my, geo[p][0], geo[p][1], geo[p][2],
                          geo[p][3], mv0[p][0], mv0[p][1], mv1[p][0],
                          mv1[p][1], ri0[p], ri1[p], pred16, predc);
    } else {                          /* B_8x8 */
        int subs[4], su0[4], su1[4], ri0[4], ri1[4];
        for (int b = 0; b < 4; b++) {
            subs[b] = read_b_sub_type_cab(cs);
            su0[b] = subs[b] && (B_SUB[subs[b]][1] == 0
                                 || B_SUB[subs[b]][1] == 2);
            su1[b] = subs[b] && (B_SUB[subs[b]][1] == 1
                                 || B_SUB[subs[b]][1] == 2);
        }
        for (int b = 0; b < 4; b++) {
            int by = gy0 + (b / 2) * 2, bx = gx0 + (b % 2) * 2;
            ri0[b] = su0[b]
                ? note_ref_g(d, by, bx, 2, 2,
                             read_ref_idx_cab_g(d, cs, by, bx, 0), 0)
                : -1;
        }
        for (int b = 0; b < 4; b++) {
            int by = gy0 + (b / 2) * 2, bx = gx0 + (b % 2) * 2;
            ri1[b] = su1[b]
                ? note_ref_g(d, by, bx, 2, 2,
                             read_ref_idx_cab_g(d, cs, by, bx, 1), 1)
                : -1;
        }
        int dri0, dri1, dm0x, dm0y, dm1x, dm1y, dzero;
        direct_params_c(s, gy0, gx0, &dri0, &dri1, &dm0x, &dm0y,
                        &dm1x, &dm1y, &dzero);
        int pm0[4][4][2], pm1[4][4][2];
        for (int b = 0; b < 4; b++) {
            int by = gy0 + (b / 2) * 2, bx = gx0 + (b % 2) * 2;
            if (subs[b] == 0) {
                int cz = !dzero && col_zero_c(s, gy0, gx0, b);
                int a0x = (dzero || (cz && dri0 == 0)) ? 0 : dm0x;
                int a0y = (dzero || (cz && dri0 == 0)) ? 0 : dm0y;
                int a1x = (dzero || (cz && dri1 == 0)) ? 0 : dm1x;
                int a1y = (dzero || (cz && dri1 == 0)) ? 0 : dm1y;
                pm0[b][0][0] = a0x; pm0[b][0][1] = a0y;
                pm1[b][0][0] = a1x; pm1[b][0][1] = a1y;
                fill_list_cab(s, by, bx, 2, 2, a0x, a0y, dri0, 0, 0, 0, 1);
                fill_list_cab(s, by, bx, 2, 2, a1x, a1y, dri1, 0, 0, 1, 1);
                continue;
            }
            int shp = B_SUB[subs[b]][0];
            if (shp != 0)
                small_parts = 1;
            for (int p = 0; p < SUB_NPARTS[shp]; p++) {
                int dy = SUB_PARTS[shp][p][0], dx = SUB_PARTS[shp][p][1];
                int pw4 = SUB_PARTS[shp][p][2], ph4 = SUB_PARTS[shp][p][3];
                int gy = by + dy, gx = bx + dx;
                pm0[b][p][0] = pm0[b][p][1] = 0;
                if (su0[b]) {
                    int mdx, mdy, pmx, pmy;
                    read_mvd_pair_g(d, cs, gy, gx, 0, &mdx, &mdy);
                    mv_pred4_c(d, d->dec4, gy, gx, pw4, ri0[b], s->my0,
                               SH_NONE, &pmx, &pmy);
                    pm0[b][p][0] = pmx + mdx;
                    pm0[b][p][1] = pmy + mdy;
                    fill_list_cab(s, gy, gx, pw4, ph4, pm0[b][p][0],
                                  pm0[b][p][1], ri0[b],
                                  mdx < 0 ? -mdx : mdx,
                                  mdy < 0 ? -mdy : mdy, 0, 0);
                } else {
                    fill_list_cab(s, gy, gx, pw4, ph4, 0, 0, -1, 0, 0,
                                  0, 0);
                }
            }
        }
        for (int b = 0; b < 4; b++) {
            if (subs[b] == 0)
                continue;
            int by = gy0 + (b / 2) * 2, bx = gx0 + (b % 2) * 2;
            int shp = B_SUB[subs[b]][0];
            for (int p = 0; p < SUB_NPARTS[shp]; p++) {
                int dy = SUB_PARTS[shp][p][0], dx = SUB_PARTS[shp][p][1];
                int pw4 = SUB_PARTS[shp][p][2], ph4 = SUB_PARTS[shp][p][3];
                int gy = by + dy, gx = bx + dx;
                pm1[b][p][0] = pm1[b][p][1] = 0;
                if (su1[b]) {
                    int mdx, mdy, pmx, pmy;
                    read_mvd_pair_g(d, cs, gy, gx, 1, &mdx, &mdy);
                    mv_pred4_b(d, d->dec4, gy, gx, pw4, ri1[b], s->my0,
                               SH_NONE, &pmx, &pmy);
                    pm1[b][p][0] = pmx + mdx;
                    pm1[b][p][1] = pmy + mdy;
                    fill_list_cab(s, gy, gx, pw4, ph4, pm1[b][p][0],
                                  pm1[b][p][1], ri1[b],
                                  mdx < 0 ? -mdx : mdx,
                                  mdy < 0 ? -mdy : mdy, 1, 0);
                } else {
                    fill_list_cab(s, gy, gx, pw4, ph4, 0, 0, -1, 0, 0,
                                  1, 0);
                }
            }
        }
        for (int b = 0; b < 4; b++) {
            int by = gy0 + (b / 2) * 2, bx = gx0 + (b % 2) * 2;
            if (subs[b] == 0) {
                part_pred_b_c(s, mx, my, by, bx, 2, 2, pm0[b][0][0],
                              pm0[b][0][1], pm1[b][0][0], pm1[b][0][1],
                              dri0, dri1, pred16, predc);
                continue;
            }
            int shp = B_SUB[subs[b]][0];
            for (int p = 0; p < SUB_NPARTS[shp]; p++) {
                int dy = SUB_PARTS[shp][p][0], dx = SUB_PARTS[shp][p][1];
                int pw4 = SUB_PARTS[shp][p][2], ph4 = SUB_PARTS[shp][p][3];
                part_pred_b_c(s, mx, my, by + dy, bx + dx, pw4, ph4,
                              pm0[b][p][0], pm0[b][p][1],
                              pm1[b][p][0], pm1[b][p][1],
                              su0[b] ? ri0[b] : -1, su1[b] ? ri1[b] : -1,
                              pred16, predc);
            }
        }
    }
    cab_inter_tail(d, cs, mx, my, small_parts, pred16, predc);
}

static void decode_slice_cabac_c(H264Dec *d, const uint8_t *rbsp, long rlen,
                                 int nal_type, int slice_id, int ref_idc)
{
    BitReader rr = {rbsp, rlen, 0, d};
    BitReader *r = &rr;
    CabSlice csl = {0};
    CabSlice *cs = &csl;
    Slice *s = &cs->s;
    s->d = d;
    s->slice_id = slice_id;
    int first_mb = (int)br_ue(r);
    int slice_type = (int)(br_ue(r) % 5);
    if (slice_type != 0 && slice_type != 1 && slice_type != 2)
        dec_fail(d, "CABAC slice type");
    int is_p = slice_type == 0;
    int is_b = slice_type == 1;
    s->is_p = is_p;
    s->is_b = is_b;
    br_ue(r);                       /* pps id */
    int fnum = (int)br_u(r, d->sps.log2_mfn);
    d->cur_frame_num = fnum;
    if (nal_type == 5)
        br_ue(r);                   /* idr_pic_id */
    if (d->sps.poc_type == 0)
        d->cur_poc_lsb = (int)br_u(r, d->sps.log2_poc);
    s->cur_poc = poc_preview(d);
    if (is_b) {
        if (!br_bit(r))             /* direct_spatial_mv_pred_flag */
            dec_fail(d, "temporal direct");
        if (!d->sps.direct_8x8)
            dec_fail(d, "direct_8x8_inference_flag=0");
    }
    if (is_p || is_b) {
        parse_inter_header(d, s, r, nal_type == 5 ? 0 : ref_idc);
    } else if (nal_type != 5 && ref_idc) {
        if (br_bit(r))
            dec_fail(d, "adaptive ref pic marking (I)");
    }
    if (nal_type == 5) {
        br_u(r, 1);
        br_u(r, 1);
    }
    int cabac_init_idc = (is_p || is_b) ? (int)br_ue(r) : -1;
    if (cabac_init_idc > 2)
        dec_fail(d, "cabac_init_idc");
    s->qp = d->pps.init_qp + br_se(r);
    parse_dbf(d, r, &s->dbf_idc, &s->dbf_offa, &s->dbf_offb);
    while (r->pos % 8) {
        if (br_bit(r) != 1)
            dec_fail(d, "bad cabac alignment bit");
    }
    cab_init(&cs->e, d, rbsp, rlen, r->pos,
             (is_p || is_b) ? 1 + cabac_init_idc : 0, s->qp);
    int l0_active = s->l0_active;
    (void)l0_active;
    int mbw = d->mbw, mbh = d->mbh;
    if (first_mb % mbw)
        dec_fail(d, "slices must start at an MB row");
    s->my0 = first_mb / mbw;
    reset_slice_grids(d);
    if (is_p || is_b) {
        /* P recon does not gate on done4 rows above the slice */
        int g4w = mbw * 4;
        for (long i = 0; i < (long)s->my0 * 4 * g4w; i++)
            d->done4[i] = 1;
    }

    cs->last_dqp = 0;
    cs->cur_intra = 0;
    long n_mbs = (long)mbw * mbh;
    long mb_addr = first_mb;
    while (mb_addr < n_mbs) {
        int my = (int)(mb_addr / mbw), mx = (int)(mb_addr % mbw);
        mb_addr++;
        if (is_b) {
            int inc = 0;
            if (mx > 0 && !d->c_skip[(long)my * mbw + mx - 1])
                inc++;
            if (my > s->my0 && !d->c_skip[(long)(my - 1) * mbw + mx])
                inc++;
            if (cab_decision(&cs->e, 24 + inc)) {  /* B mb_skip_flag */
                clear_mb_ctx_c(d, mx, my, 0, 1);
                d->c_bdirect[(long)my * mbw + mx] = 1;
                decode_b_skip_cab(d, cs, mx, my);
                cs->last_dqp = 0;
                if (cab_terminate(&cs->e))
                    break;
                continue;
            }
            clear_mb_ctx_c(d, mx, my, 0, 0);
            int mb_type = read_b_mb_type_cab(d, cs, mx, my);
            d->c_bdirect[(long)my * mbw + mx] = mb_type == 0;
            if (mb_type >= 23) {
                int it = mb_type - 23;
                cs->cur_intra = 1;
                int g4w = mbw * 4;
                for (int by = 0; by < 4; by++)
                    for (int bx = 0; bx < 4; bx++) {
                        long gi = (long)(my * 4 + by) * g4w + mx * 4 + bx;
                        d->ref4[gi] = -1;
                        d->pid4[gi] = -1;
                        d->mv4[gi * 2] = 0;
                        d->mv4[gi * 2 + 1] = 0;
                        d->ref4b[gi] = -1;
                        d->pid4b[gi] = -1;
                        d->mv4b[gi * 2] = 0;
                        d->mv4b[gi * 2 + 1] = 0;
                        d->dir4[gi] = 0;
                        d->dec4[gi] = 1;
                        d->rd4[gi] = 1;
                        d->rd4b[gi] = 1;
                    }
                decode_intra_mb_cab(d, cs, mx, my, it);
            } else {
                cs->cur_intra = 0;
                decode_b_mb_cab(d, cs, mx, my, mb_type);
            }
        } else if (is_p) {
            int inc = 0;
            if (mx > 0 && !d->c_skip[(long)my * mbw + mx - 1])
                inc++;
            if (my > s->my0 && !d->c_skip[(long)(my - 1) * mbw + mx])
                inc++;
            int skip = cab_decision(&cs->e, 11 + inc);
            if (skip) {
                clear_mb_ctx_c(d, mx, my, 0, 1);
                decode_p_skip_cab(d, cs, mx, my);
                cs->last_dqp = 0;
                if (cab_terminate(&cs->e))
                    break;
                continue;
            }
            clear_mb_ctx_c(d, mx, my, 0, 0);
            if (cab_decision(&cs->e, 14) == 0) {
                int mb_type;
                if (cab_decision(&cs->e, 15) == 0)
                    mb_type = 3 * cab_decision(&cs->e, 16);
                else
                    mb_type = 2 - cab_decision(&cs->e, 17);
                cs->cur_intra = 0;
                decode_p_mb_cab(d, cs, mx, my, mb_type);
            } else {
                int it = intra_mb_type_c(&cs->e, 17, 0, 0);
                cs->cur_intra = 1;
                int g4w = mbw * 4;
                for (int by = 0; by < 4; by++)
                    for (int bx = 0; bx < 4; bx++) {
                        long gi = (long)(my * 4 + by) * g4w + mx * 4 + bx;
                        d->ref4[gi] = -1;
                        d->pid4[gi] = -1;
                        d->mv4[gi * 2] = 0;
                        d->mv4[gi * 2 + 1] = 0;
                        d->dec4[gi] = 1;
                        d->rd4[gi] = 1;
                    }
                decode_intra_mb_cab(d, cs, mx, my, it);
            }
        } else {
            clear_mb_ctx_c(d, mx, my, 1, 0);
            int inc = 0;
            if (mx > 0 && d->c_i16[(long)my * mbw + mx - 1])
                inc++;
            if (my > s->my0 && d->c_i16[(long)(my - 1) * mbw + mx])
                inc++;
            cs->cur_intra = 1;
            int mb_type = intra_mb_type_c(&cs->e, 3, 1, inc);
            decode_intra_mb_cab(d, cs, mx, my, mb_type);
        }
        if (cab_terminate(&cs->e))
            break;
    }
}

/* ------------------------------------------------------------------ */
/* parameter set parsing (= _parse_sps / _parse_pps)                    */
/* ------------------------------------------------------------------ */

static void skip_hrd(H264Dec *d, BitReader *r)
{
    long cnt = br_ue(r) + 1;
    if (cnt > 32)
        dec_fail(d, "hrd cpb_cnt");
    br_u(r, 4);
    br_u(r, 4);
    for (long i = 0; i < cnt; i++) {
        br_ue(r);
        br_ue(r);
        br_u(r, 1);
    }
    br_u(r, 5);
    br_u(r, 5);
    br_u(r, 5);
    br_u(r, 5);
}

static void parse_sps(H264Dec *d, const uint8_t *rbsp, long rlen, SPS *sps)
{
    BitReader rr = {rbsp, rlen, 0, d};
    BitReader *r = &rr;
    int profile = (int)br_u(r, 8);
    br_u(r, 8);
    br_u(r, 8);
    if (br_ue(r) != 0)
        dec_fail(d, "sps_id != 0");
    if (profile != 66 && profile != 77 && profile != 88 && profile != 100)
        dec_fail(d, "profile");
    if (profile == 100) {
        if (br_ue(r) != 1)
            dec_fail(d, "chroma_format_idc != 4:2:0");
        if (br_ue(r) != 0 || br_ue(r) != 0)
            dec_fail(d, "bit depth > 8");
        br_u(r, 1);
        if (br_bit(r))
            dec_fail(d, "seq scaling matrices");
    }
    sps->log2_mfn = (int)br_ue(r) + 4;
    sps->poc_type = (int)br_ue(r);
    sps->log2_poc = 0;
    if (sps->poc_type == 0)
        sps->log2_poc = (int)br_ue(r) + 4;
    else if (sps->poc_type == 1)
        dec_fail(d, "poc type 1");
    int max_refs = (int)br_ue(r);
    sps->max_refs = max_refs > 1 ? max_refs : 1;
    if (sps->max_refs > MAX_REFS)
        dec_fail(d, "too many reference frames");
    br_u(r, 1);
    sps->mb_w = (int)br_ue(r) + 1;
    sps->mb_h = (int)br_ue(r) + 1;
    if (br_u(r, 1) != 1)
        dec_fail(d, "interlaced");
    sps->direct_8x8 = (int)br_u(r, 1);
    int crop = (int)br_u(r, 1);
    int cl = 0, cr2 = 0, ct = 0, cb2 = 0;
    if (crop) {
        cl = (int)br_ue(r);
        cr2 = (int)br_ue(r);
        ct = (int)br_ue(r);
        cb2 = (int)br_ue(r);
    }
    sps->width = sps->mb_w * 16 - 2 * (cl + cr2);
    sps->height = sps->mb_h * 16 - 2 * (ct + cb2);
    if (sps->width <= 0 || sps->height <= 0
        || sps->mb_w <= 0 || sps->mb_h <= 0
        || (long)sps->mb_w * sps->mb_h > (1L << 22))
        dec_fail(d, "bad sps geometry");
    /* minimal VUI walk (E.1.1/E.1.2) for bitstream_restriction's
       max_num_reorder_frames — the B display-reorder bound */
    sps->reorder = -1;
    if (r->pos < rlen * 8 && br_u(r, 1)) {
        if (br_bit(r)) {                      /* aspect_ratio_info */
            if (br_u(r, 8) == 255) {
                br_u(r, 16);
                br_u(r, 16);
            }
        }
        if (br_bit(r))
            br_u(r, 1);                       /* overscan */
        if (br_bit(r)) {                      /* video_signal_type */
            br_u(r, 3);
            br_u(r, 1);
            if (br_bit(r)) {
                br_u(r, 8);
                br_u(r, 8);
                br_u(r, 8);
            }
        }
        if (br_bit(r)) {                      /* chroma_loc */
            br_ue(r);
            br_ue(r);
        }
        if (br_bit(r)) {                      /* timing_info */
            br_u(r, 32);
            br_u(r, 32);
            br_u(r, 1);
        }
        int nal_hrd = (int)br_bit(r);
        if (nal_hrd)
            skip_hrd(d, r);
        int vcl_hrd = (int)br_bit(r);
        if (vcl_hrd)
            skip_hrd(d, r);
        if (nal_hrd || vcl_hrd)
            br_u(r, 1);                       /* low_delay_hrd */
        br_u(r, 1);                           /* pic_struct_present */
        if (br_bit(r)) {                      /* bitstream_restriction */
            br_u(r, 1);     /* motion_vectors_over_pic_boundaries */
            br_ue(r);       /* max_bytes_per_pic_denom */
            br_ue(r);       /* max_bits_per_mb_denom */
            br_ue(r);       /* log2_max_mv_length_horizontal */
            br_ue(r);       /* log2_max_mv_length_vertical */
            sps->reorder = (int)br_ue(r);     /* max_num_reorder_frames */
            br_ue(r);       /* max_dec_frame_buffering */
        }
    }
    sps->valid = 1;
}

static void parse_pps(H264Dec *d, const uint8_t *rbsp, long rlen, PPS *pps)
{
    BitReader rr = {rbsp, rlen, 0, d};
    BitReader *r = &rr;
    if (br_ue(r) != 0 || br_ue(r) != 0)
        dec_fail(d, "pps/sps id");
    pps->cabac = (int)br_u(r, 1);
    br_u(r, 1);
    if (br_ue(r) != 0)
        dec_fail(d, "slice groups");
    pps->l0_default = (int)br_ue(r) + 1;
    pps->l1_default = (int)br_ue(r) + 1;
    pps->weighted_pred = (int)br_u(r, 1);
    pps->weighted_bipred = (int)br_u(r, 2);
    pps->init_qp = 26 + br_se(r);
    br_se(r);
    pps->chroma_off = br_se(r);
    pps->dbf_ctrl = (int)br_u(r, 1);
    br_u(r, 1);
    br_u(r, 1);
    pps->transform_8x8 = 0;
    if (br_more_rbsp(r)) {
        pps->transform_8x8 = (int)br_u(r, 1);
        if (br_bit(r))
            dec_fail(d, "pic scaling matrices");
        br_se(r);
    }
    pps->valid = 1;
}

/* ------------------------------------------------------------------ */
/* geometry allocation + per-picture reset                              */
/* ------------------------------------------------------------------ */

static void free_colmo(RefPic *p)
{
    free(p->mvcol);
    free(p->refcol);
    p->mvcol = NULL;
    p->refcol = NULL;
}

static void free_refpic(RefPic *p)
{
    free_colmo(p);
    free(p->y); free(p->cb); free(p->cr);
    free(p->hb); free(p->hh); free(p->hj);
    memset(p, 0, sizeof(*p));
}

static void free_geometry(H264Dec *d)
{
    free(d->cur_y); free(d->cur_cb); free(d->cur_cr);
    d->cur_y = d->cur_cb = d->cur_cr = NULL;
    free(d->tmp_b1);
    d->tmp_b1 = NULL;
    for (int i = 0; i < d->dpb_n; i++)
        free_refpic(&d->dpb[i]);
    d->dpb_n = 0;
    for (int i = 0; i < d->spare_n; i++)
        free_refpic(&d->spare[i]);
    d->spare_n = 0;
    free(d->db_intra); free(d->db_ipcm); free(d->db_decoded);
    free(d->db_t8x8);
    d->db_t8x8 = NULL;
    free(d->db_qp); free(d->db_slice); free(d->db_idc);
    free(d->db_offa); free(d->db_offb);
    free(d->nnz_l); free(d->mv4); free(d->ref4); free(d->pid4);
    free(d->mv4b); free(d->ref4b); free(d->pid4b);
    d->pid4 = d->mv4b = d->ref4b = d->pid4b = NULL;
    free(d->dec4); free(d->rd4); free(d->rd4b); free(d->dir4);
    free(d->done4); free(d->avail4);
    free(d->i4mode); free(d->nnz_c[0]); free(d->nnz_c[1]);
    free(d->c_skip); free(d->c_i16); free(d->c_intra); free(d->c_pcm);
    free(d->c_chroma_mode); free(d->c_cbp_l); free(d->c_cbp_c);
    free(d->c_cbf_ldc); free(d->c_cbf_l4); free(d->c_cbf_cdc);
    free(d->c_cbf_c4); free(d->c_absmvd4); free(d->c_absmvd4b);
    free(d->c_bdirect);
    for (int i = 0; i < MAX_REFS + 2; i++) {
        free(d->outq[i].y); free(d->outq[i].cb); free(d->outq[i].cr);
        d->outq[i].y = d->outq[i].cb = d->outq[i].cr = NULL;
        d->outq[i].used = 0;
    }
    free(d->out_y); free(d->out_cb); free(d->out_cr);
    d->out_y = d->out_cb = d->out_cr = NULL;
    d->out_ready = 0;
    d->db_intra = NULL; /* mark unallocated */
    d->mbw = d->mbh = 0;
    d->have_pic = 0;
}

static void alloc_geometry(H264Dec *d)
{
    int mbw = d->sps.mb_w, mbh = d->sps.mb_h;
    if (d->mbw == mbw && d->mbh == mbh && d->db_intra)
        return;
    free_geometry(d);
    d->mbw = mbw;
    d->mbh = mbh;
    d->pw = (long)mbw * 16 + 2 * PAD;
    d->ph = (long)mbh * 16 + 2 * PAD;
    d->cpw = (long)mbw * 8 + 2 * PAD;
    d->cph = (long)mbh * 8 + 2 * PAD;
    d->cur_y = xalloc(d, d->pw * d->ph);
    d->cur_cb = xalloc(d, d->cpw * d->cph);
    d->cur_cr = xalloc(d, d->cpw * d->cph);
    d->tmp_b1 = xalloc(d, d->pw * d->ph * (long)sizeof(int32_t));
    long nmb = (long)mbw * mbh;
    long g4 = nmb * 16, g2 = nmb * 4;
    d->db_intra = xalloc(d, nmb);
    d->db_ipcm = xalloc(d, nmb);
    d->db_decoded = xalloc(d, nmb);
    d->db_t8x8 = xalloc(d, nmb);
    d->db_qp = xalloc(d, nmb * 4);
    d->db_slice = xalloc(d, nmb * 4);
    d->db_idc = xalloc(d, nmb * 4);
    d->db_offa = xalloc(d, nmb * 4);
    d->db_offb = xalloc(d, nmb * 4);
    d->nnz_l = xalloc(d, g4 * 4);
    d->mv4 = xalloc(d, g4 * 8);
    d->ref4 = xalloc(d, g4 * 4);
    d->pid4 = xalloc(d, g4 * 4);
    d->mv4b = xalloc(d, g4 * 8);
    d->ref4b = xalloc(d, g4 * 4);
    d->pid4b = xalloc(d, g4 * 4);
    d->dec4 = xalloc(d, g4);
    d->rd4 = xalloc(d, g4);
    d->rd4b = xalloc(d, g4);
    d->dir4 = xalloc(d, g4);
    d->done4 = xalloc(d, g4);
    d->avail4 = xalloc(d, g4);
    d->i4mode = xalloc(d, g4 * 4);
    d->nnz_c[0] = xalloc(d, g2 * 4);
    d->nnz_c[1] = xalloc(d, g2 * 4);
    d->c_skip = xalloc(d, nmb);
    d->c_i16 = xalloc(d, nmb);
    d->c_intra = xalloc(d, nmb);
    d->c_pcm = xalloc(d, nmb);
    d->c_chroma_mode = xalloc(d, nmb * 4);
    d->c_cbp_l = xalloc(d, nmb * 4);
    d->c_cbp_c = xalloc(d, nmb * 4);
    d->c_cbf_ldc = xalloc(d, nmb * 4);
    d->c_cbf_l4 = xalloc(d, g4 * 4);
    d->c_cbf_cdc = xalloc(d, nmb * 2 * 4);
    d->c_cbf_c4 = xalloc(d, g2 * 2 * 4);
    d->c_absmvd4 = xalloc(d, g4 * 8);
    d->c_absmvd4b = xalloc(d, g4 * 8);
    d->c_bdirect = xalloc(d, nmb);
}

static void reset_picture(H264Dec *d)
{
    d->mmco_n = 0;
    memset(d->cur_y, 0, (size_t)(d->pw * d->ph));
    memset(d->cur_cb, 0, (size_t)(d->cpw * d->cph));
    memset(d->cur_cr, 0, (size_t)(d->cpw * d->cph));
    long nmb = (long)d->mbw * d->mbh;
    long g4 = nmb * 16, g2 = nmb * 4;
    memset(d->db_intra, 0, (size_t)nmb);
    memset(d->db_ipcm, 0, (size_t)nmb);
    memset(d->db_decoded, 0, (size_t)nmb);
    memset(d->db_t8x8, 0, (size_t)nmb);
    memset(d->db_qp, 0, (size_t)nmb * 4);
    for (long i = 0; i < nmb; i++) {
        d->db_slice[i] = -1;
        d->db_idc[i] = 1;
    }
    memset(d->db_offa, 0, (size_t)nmb * 4);
    memset(d->db_offb, 0, (size_t)nmb * 4);
    memset(d->nnz_l, 0, (size_t)g4 * 4);
    memset(d->mv4, 0, (size_t)g4 * 8);
    for (long i = 0; i < g4; i++) {
        d->ref4[i] = -1;
        d->pid4[i] = -1;
        d->ref4b[i] = -1;
        d->pid4b[i] = -1;
    }
    memset(d->mv4b, 0, (size_t)g4 * 8);
    memset(d->c_skip, 0, (size_t)nmb);
    memset(d->c_i16, 0, (size_t)nmb);
    memset(d->c_intra, 0, (size_t)nmb);
    memset(d->c_pcm, 0, (size_t)nmb);
    memset(d->c_chroma_mode, 0, (size_t)nmb * 4);
    memset(d->c_cbp_l, 0, (size_t)nmb * 4);
    memset(d->c_cbp_c, 0, (size_t)nmb * 4);
    memset(d->c_cbf_ldc, 0, (size_t)nmb * 4);
    memset(d->c_cbf_l4, 0, (size_t)g4 * 4);
    memset(d->c_cbf_cdc, 0, (size_t)nmb * 2 * 4);
    memset(d->c_cbf_c4, 0, (size_t)g2 * 2 * 4);
    memset(d->c_absmvd4, 0, (size_t)g4 * 8);
    memset(d->c_absmvd4b, 0, (size_t)g4 * 8);
    memset(d->c_bdirect, 0, (size_t)nmb);
}

static long poc_preview(const H264Dec *d)
{
    if (d->sps.poc_type != 0)
        return (long)d->pic_seq * 2;
    long lsb = d->cur_poc_lsb;
    long max_lsb = 1L << d->sps.log2_poc;
    long pm = d->poc_msb, pl = d->poc_lsb_prev;
    long msb;
    if (lsb < pl && pl - lsb >= max_lsb / 2)
        msb = pm + max_lsb;
    else if (lsb > pl && lsb - pl > max_lsb / 2)
        msb = pm - max_lsb;
    else
        msb = pm;
    return msb + lsb;
}

static long compute_poc(H264Dec *d, int is_idr, int is_ref)
{
    if (d->sps.poc_type != 0)
        return (long)d->pic_seq * 2;
    long lsb = d->cur_poc_lsb;
    long max_lsb = 1L << d->sps.log2_poc;
    long msb;
    if (is_idr) {
        d->poc_msb = 0;
        d->poc_lsb_prev = 0;
        msb = 0;
    } else {
        long pm = d->poc_msb, pl = d->poc_lsb_prev;
        if (lsb < pl && pl - lsb >= max_lsb / 2)
            msb = pm + max_lsb;
        else if (lsb > pl && lsb - pl > max_lsb / 2)
            msb = pm - max_lsb;
        else
            msb = pm;
    }
    if (is_ref) {
        d->poc_msb = msb;
        d->poc_lsb_prev = lsb;
    }
    return msb + lsb;
}

static int reorder_delay(const H264Dec *d)
{
    if (d->sps.poc_type != 0)
        return 0;
    if (d->sps.reorder >= 0)
        return d->sps.reorder;
    return d->sps.max_refs;
}

/* copy the current (cropped) picture into a free reorder slot */
static void outq_push(H264Dec *d, long key)
{
    int w = d->sps.width, hh = d->sps.height;
    int cw = (w + 1) / 2, ch = (hh + 1) / 2;
    struct OutSlot *s = NULL;
    for (int i = 0; i < MAX_REFS + 2; i++)
        if (!d->outq[i].used) {
            s = &d->outq[i];
            break;
        }
    if (!s)
        dec_fail(d, "reorder queue overflow");
    if (!s->y) {
        s->y = xalloc(d, (long)w * hh);
        s->cb = xalloc(d, (long)cw * ch);
        s->cr = xalloc(d, (long)cw * ch);
    }
    for (int r = 0; r < hh; r++)
        memcpy(s->y + (long)r * w,
               d->cur_y + (long)(PAD + r) * d->pw + PAD, (size_t)w);
    for (int r = 0; r < ch; r++) {
        memcpy(s->cb + (long)r * cw,
               d->cur_cb + (long)(PAD + r) * d->cpw + PAD, (size_t)cw);
        memcpy(s->cr + (long)r * cw,
               d->cur_cr + (long)(PAD + r) * d->cpw + PAD, (size_t)cw);
    }
    s->key = key;
    s->seq = d->out_seq++;
    s->used = 1;
}

/* pop the minimum-key slot into out_y/out_cb/out_cr; 1 if popped */
static int outq_pop(H264Dec *d)
{
    int best = -1;
    for (int i = 0; i < MAX_REFS + 2; i++)
        if (d->outq[i].used
                && (best < 0 || d->outq[i].key < d->outq[best].key
                    || (d->outq[i].key == d->outq[best].key
                        && d->outq[i].seq < d->outq[best].seq)))
            best = i;
    if (best < 0)
        return 0;
    int w = d->sps.width, hh = d->sps.height;
    int cw = (w + 1) / 2, ch = (hh + 1) / 2;
    if (!d->out_y) {
        d->out_y = xalloc(d, (long)w * hh);
        d->out_cb = xalloc(d, (long)cw * ch);
        d->out_cr = xalloc(d, (long)cw * ch);
    }
    memcpy(d->out_y, d->outq[best].y, (size_t)w * hh);
    memcpy(d->out_cb, d->outq[best].cb, (size_t)cw * ch);
    memcpy(d->out_cr, d->outq[best].cr, (size_t)cw * ch);
    d->outq[best].used = 0;
    d->out_ready = 1;
    return 1;
}

static int outq_count(const H264Dec *d)
{
    int n = 0;
    for (int i = 0; i < MAX_REFS + 2; i++)
        n += d->outq[i].used;
    return n;
}

/* move the current picture into the DPB front (after deblock) */
static void dpb_insert(H264Dec *d, int is_idr_like)
{
    if (is_idr_like) {
        /* IDR resets the DPB (8.2.5.1): recycle everything */
        while (d->dpb_n > 0) {
            d->dpb_n--;
            if (d->spare_n < MAX_REFS + 1)
                d->spare[d->spare_n++] = d->dpb[d->dpb_n];
            else
                free_refpic(&d->dpb[d->dpb_n]);
        }
    }
    /* pad-replicate picture edges so this frame can serve as a reference */
    pad_edges(d->cur_y, (long)d->mbw * 16, (long)d->mbh * 16, d->pw);
    pad_edges(d->cur_cb, (long)d->mbw * 8, (long)d->mbh * 8, d->cpw);
    pad_edges(d->cur_cr, (long)d->mbw * 8, (long)d->mbh * 8, d->cpw);
    RefPic np = {0};
    np.y = d->cur_y;
    np.cb = d->cur_cb;
    np.cr = d->cur_cr;
    if (d->spare_n > 0) {
        RefPic sp = d->spare[--d->spare_n];
        d->cur_y = sp.y;
        d->cur_cb = sp.cb;
        d->cur_cr = sp.cr;
        np.hb = sp.hb;   /* reuse half-plane buffers, content invalid */
        np.hh = sp.hh;
        np.hj = sp.hj;
        np.have_half = 0;
        np.mvcol = sp.mvcol;   /* reuse colocated buffers too */
        np.refcol = sp.refcol;
    } else {
        d->cur_y = xalloc(d, d->pw * d->ph);
        d->cur_cb = xalloc(d, d->cpw * d->cph);
        d->cur_cr = xalloc(d, d->cpw * d->cph);
    }
    /* adaptive marking: drop the named refs instead of sliding (8.2.5.4) */
    for (int k = 0; k < d->mmco_n && k < 16; k++) {
        for (int i = 0; i < d->dpb_n; i++)
            if (d->dpb_pid[i] == d->mmco_drop[k]) {
                if (d->spare_n < MAX_REFS + 1)
                    d->spare[d->spare_n++] = d->dpb[i];
                else
                    free_refpic(&d->dpb[i]);
                for (int j = i; j < d->dpb_n - 1; j++) {
                    d->dpb[j] = d->dpb[j + 1];
                    d->dpb_fn[j] = d->dpb_fn[j + 1];
                    d->dpb_pid[j] = d->dpb_pid[j + 1];
                    d->dpb_poc[j] = d->dpb_poc[j + 1];
                }
                d->dpb_n--;
                break;
            }
    }
    /* colocated motion snapshot (slot-A = L0 else L1) for B direct */
    long g4 = (long)d->mbw * 4 * d->mbh * 4;
    if (!np.mvcol) {
        np.mvcol = calloc((size_t)g4 * 2, sizeof(int16_t));
        np.refcol = calloc((size_t)g4, 1);
        if (!np.mvcol || !np.refcol)
            dec_fail(d, "out of memory");
    }
    for (long i = 0; i < g4; i++) {
        if (d->ref4[i] >= 0) {
            np.refcol[i] = (int8_t)d->ref4[i];
            np.mvcol[i * 2] = (int16_t)d->mv4[i * 2];
            np.mvcol[i * 2 + 1] = (int16_t)d->mv4[i * 2 + 1];
        } else if (d->ref4b[i] >= 0) {
            np.refcol[i] = (int8_t)d->ref4b[i];
            np.mvcol[i * 2] = (int16_t)d->mv4b[i * 2];
            np.mvcol[i * 2 + 1] = (int16_t)d->mv4b[i * 2 + 1];
        } else {
            np.refcol[i] = -1;
            np.mvcol[i * 2] = np.mvcol[i * 2 + 1] = 0;
        }
    }
    for (int i = d->dpb_n; i > 0; i--) {
        d->dpb[i] = d->dpb[i - 1];
        d->dpb_fn[i] = d->dpb_fn[i - 1];
        d->dpb_pid[i] = d->dpb_pid[i - 1];
        d->dpb_poc[i] = d->dpb_poc[i - 1];
    }
    d->dpb[0] = np;
    d->dpb_fn[0] = is_idr_like ? 0 : d->cur_frame_num;
    d->dpb_pid[0] = d->pic_seq;
    d->dpb_poc[0] = d->cur_pic_poc;
    d->dpb_n++;
    /* sliding window only when no adaptive marking ran (8.2.5.3/.4) */
    while (d->mmco_n == 0 && d->dpb_n > d->sps.max_refs) {
        d->dpb_n--;
        if (d->spare_n < MAX_REFS + 1)
            d->spare[d->spare_n++] = d->dpb[d->dpb_n];
        else
            free_refpic(&d->dpb[d->dpb_n]);
    }
}

/* ------------------------------------------------------------------ */
/* access-unit driver (= StreamDecoder._decode_units)                   */
/* ------------------------------------------------------------------ */

static int decode_au_inner(H264Dec *d, const uint8_t *au, long size)
{
    /* split NALs (= split_nals) */
    long i = 0;
    int kind = 0; /* 0 none, 1 I, 2 P, 3 B */
    int pic_ref_idc = 1;
    int started_pic = 0;
    int slice_id = -1;
    /* collect start positions first */
    long nstart = 0;
    long *starts = NULL;
    long cap = 16;
    starts = malloc((size_t)cap * sizeof(long));
    if (!starts)
        dec_fail(d, "out of memory");
    while (i < size - 3) {
        if (au[i] == 0 && au[i + 1] == 0
            && (au[i + 2] == 1
                || (au[i + 2] == 0 && i + 3 < size && au[i + 3] == 1))) {
            int skip = au[i + 2] == 1 ? 3 : 4;
            if (nstart == cap) {
                cap *= 2;
                long *ns = realloc(starts, (size_t)cap * sizeof(long));
                if (!ns) {
                    free(starts);
                    dec_fail(d, "out of memory");
                }
                starts = ns;
            }
            starts[nstart++] = i + skip;
            i += skip;
        } else {
            i++;
        }
    }
    for (long k = 0; k < nstart; k++) {
        long sstart = starts[k];
        long e = (k + 1 < nstart) ? starts[k + 1] - 3 : size;
        while (e > sstart && au[e - 1] == 0 && k + 1 < nstart)
            e--;
        int nal_type = au[sstart] & 0x1F;
        int ref_idc = (au[sstart] >> 5) & 3;
        long rlen = unepb(d, au + sstart + 1, e - sstart - 1, NULL);
        const uint8_t *rbsp = d->rbsp_buf;
        if (nal_type == 7) {
            SPS nsps = {0};
            parse_sps(d, rbsp, rlen, &nsps);
            int geom_changed = d->sps.valid
                && (d->sps.mb_w != nsps.mb_w || d->sps.mb_h != nsps.mb_h);
            d->sps = nsps;
            alloc_geometry(d);
            if (geom_changed)
                d->dpb_n = 0; /* old-geometry refs freed by alloc_geometry */
        } else if (nal_type == 8) {
            parse_pps(d, rbsp, rlen, &d->pps);
        } else if (nal_type == 1 || nal_type == 5) {
            if (!d->sps.valid || !d->pps.valid)
                dec_fail(d, "slice before parameter sets");
            alloc_geometry(d);
            if (!started_pic) {
                reset_picture(d);
                started_pic = 1;
            }
            slice_id++;
            pic_ref_idc = ref_idc;
            /* peek slice type */
            BitReader pk = {rbsp, rlen, 0, d};
            br_ue(&pk);
            int slice_type = (int)(br_ue(&pk) % 5);
            if (d->pps.cabac) {
                if (slice_type != 0 && slice_type != 1 && slice_type != 2)
                    dec_fail(d, "slice type");
                if (slice_type != 2 && d->dpb_n == 0)
                    dec_fail(d, "inter slice without a reference");
                kind = slice_type == 2 ? 1 : (slice_type == 1 ? 3 : 2);
                decode_slice_cabac_c(d, rbsp, rlen, nal_type, slice_id,
                                     ref_idc);
            } else if (slice_type == 2) {
                if (nal_type != 5)
                    dec_fail(d, "non-IDR I slice");
                kind = 1;
                decode_slice_cavlc_i(d, rbsp, rlen, slice_id);
            } else if (slice_type == 0 || slice_type == 1) {
                if (d->dpb_n == 0)
                    dec_fail(d, "inter slice without a reference");
                kind = slice_type == 1 ? 3 : 2;
                decode_slice_cavlc_p(d, rbsp, rlen, slice_id, ref_idc,
                                     slice_type == 1);
            } else {
                dec_fail(d, "slice type");
            }
        }
    }
    free(starts);
    if (kind == 0)
        dec_fail(d, "no slice in access unit");
    /* deblock if any MB enabled it */
    long nmb = (long)d->mbw * d->mbh;
    int any = 0;
    for (long m = 0; m < nmb; m++)
        if (d->db_decoded[m] && d->db_idc[m] != 1) {
            any = 1;
            break;
        }
    if (any)
        deblock_frame_c(d);
    int is_ref = pic_ref_idc != 0;
    if (kind == 1) {
        /* IDR: reset POC state, keep the display key monotonic */
        d->cur_frame_num = 0;
        d->cur_poc_lsb = 0;
        d->poc_base += d->gop_max_poc + 2;
        d->gop_max_poc = 0;
    }
    long poc = compute_poc(d, kind == 1, is_ref);
    if (poc > d->gop_max_poc)
        d->gop_max_poc = poc;
    d->cur_pic_poc = poc;
    outq_push(d, d->poc_base + poc);
    if (is_ref)
        dpb_insert(d, kind == 1);
    d->pic_seq++;
    d->out_w = d->sps.width;
    d->out_h = d->sps.height;
    if (outq_count(d) > reorder_delay(d)) {
        outq_pop(d);
        d->have_pic = 1;
        return 0;
    }
    d->have_pic = 0;
    return 1;  /* reorder queue priming: no display frame yet */
}

/* ================================================================== */
/* CAVLC -> CABAC slice transcoder (own-encoder envelope)               */
/*                                                                      */
/* The TPU device encoder emits CAVLC bitstreams (ops/h264_tpu.py);     */
/* CAVLC doubles as the symbol-transport format and this host stage     */
/* re-encodes the identical syntax elements with CABAC for ~10-15%      */
/* smaller streams (the entropy backend choice the reference reaches    */
/* through libx264's cabac flag, src/video_compress/libavcodec.cpp).    */
/* Pure syntax: no pixel reconstruction — every CABAC context depends   */
/* only on parsed syntax values (neighbour |mvd|, cbf grids, modes).    */
/* Context derivations mirror ops/h264_cabac.py (the decode direction,  */
/* pinned sample-exact against libavcodec); the arithmetic encoder is   */
/* spec 9.3.4.                                                          */
/* ================================================================== */

typedef struct {
    uint8_t *out;
    long cap, bytes;
    int bitn;           /* bits filled in cur */
    uint8_t cur;
    uint32_t low;
    int range;
    long outstanding;
    int first;
    uint8_t pstate[1024], mps[1024];
    H264Dec *d;
} CabEnc;

static void ce_putraw(CabEnc *e, int b)
{
    e->cur = (uint8_t)((e->cur << 1) | b);
    if (++e->bitn == 8) {
        if (e->bytes >= e->cap)
            dec_fail(e->d, "transcode output overflow");
        e->out[e->bytes++] = e->cur;
        e->cur = 0;
        e->bitn = 0;
    }
}

static void ce_putbit(CabEnc *e, int b)
{
    if (e->first)
        e->first = 0;           /* leading bit is not written (9.3.4.4) */
    else
        ce_putraw(e, b);
    while (e->outstanding > 0) {
        ce_putraw(e, 1 - b);
        e->outstanding--;
    }
}

static void ce_renorm(CabEnc *e)
{
    while (e->range < 256) {
        if (e->low < 256) {
            ce_putbit(e, 0);
        } else if (e->low >= 512) {
            e->low -= 512;
            ce_putbit(e, 1);
        } else {
            e->low -= 256;
            e->outstanding++;
        }
        e->range <<= 1;
        e->low <<= 1;
    }
}

static void ce_init(CabEnc *e, H264Dec *d, uint8_t *out, long cap,
                    int table_idx, int slice_qp)
{
    e->out = out;
    e->cap = cap;
    e->bytes = 0;
    e->bitn = 0;
    e->cur = 0;
    e->low = 0;
    e->range = 510;
    e->outstanding = 0;
    e->first = 1;
    e->d = d;
    int qp = slice_qp < 0 ? 0 : (slice_qp > 51 ? 51 : slice_qp);
    for (int i = 0; i < 1024; i++) {
        int m = d->ctx_init[table_idx][i][0];
        int n = d->ctx_init[table_idx][i][1];
        int pre = ((m * qp) >> 4) + n;
        if (pre < 1) pre = 1;
        if (pre > 126) pre = 126;
        e->mps[i] = pre > 63;
        e->pstate[i] = (uint8_t)(pre <= 63 ? 63 - pre : pre - 64);
    }
}

static void ce_decision(CabEnc *e, int ctx, int bin)
{
    int st = e->pstate[ctx];
    int lps = e->d->range_tab[st][(e->range >> 6) & 3];
    e->range -= lps;
    if (bin != e->mps[ctx]) {
        e->low += (uint32_t)e->range;
        e->range = lps;
        if (st == 0)
            e->mps[ctx] ^= 1;
        e->pstate[ctx] = (uint8_t)e->d->trans_lps[st];
    } else {
        if (st < 62)
            e->pstate[ctx] = (uint8_t)(st + 1);
    }
    ce_renorm(e);
}

static void ce_bypass(CabEnc *e, int bin)
{
    e->low <<= 1;
    if (bin)
        e->low += (uint32_t)e->range;
    if (e->low >= 1024) {
        ce_putbit(e, 1);
        e->low -= 1024;
    } else if (e->low < 512) {
        ce_putbit(e, 0);
    } else {
        e->low -= 512;
        e->outstanding++;
    }
}

static void ce_terminate(CabEnc *e, int bin)
{
    e->range -= 2;
    if (bin) {
        e->low += (uint32_t)e->range;
        /* EncodeFlush (9.3.4.6): last two written bits include the
           rbsp_stop_one_bit */
        e->range = 2;
        ce_renorm(e);
        ce_putbit(e, (e->low >> 9) & 1);
        ce_putraw(e, (e->low >> 8) & 1);
        ce_putraw(e, 1);
        while (e->bitn)         /* byte-align with zero bits */
            ce_putraw(e, 0);
    } else {
        ce_renorm(e);
    }
}

/* --------------- transcode state ---------------------------------- */

typedef struct {
    H264Dec *d;
    BitReader r;
    CabEnc e;
    int mbw, mbh, my0;
    int is_p;
    int qp, last_dqp;
    int l0_active;
    /* per-MB grids */
    uint8_t *skip, *intra, *i16, *cbf_ldc;
    uint8_t *cbp_l, *cbp_c, *chroma_mode, *cbf_cdc[2];
    /* 4x4 grids */
    uint8_t *cbf_l4, *nnz_l, *avail4, *dec4;
    int8_t *i4mode;
    int16_t *amvd;      /* [g4][2] */
    /* 2x2 chroma grids */
    uint8_t *cbf_c4[2], *nnz_c[2];
    void *arena;
} Tc;

static int tc_avail_a(Tc *t, int mx) { return mx > 0; }
static int tc_avail_b(Tc *t, int my) { return my > t->my0; }

/* CAVLC nC predictor over a u8 nnz grid */
static int tc_nc(Tc *t, const uint8_t *nn, int gw, int gx, int gy, int gy_min)
{
    int la = gx > 0, ta = gy > gy_min;
    if (la && ta)
        return (nn[gy * gw + gx - 1] + nn[(gy - 1) * gw + gx] + 1) >> 1;
    if (la)
        return nn[gy * gw + gx - 1];
    if (ta)
        return nn[(gy - 1) * gw + gx];
    return 0;
}

/* ---- CABAC syntax emitters (ctx derivations = ops/h264_cabac.py) --- */

static void tc_emit_residual(Tc *t, int cat, int n_coeffs, int cbf_inc,
                             const i64 *zz, int has_cbf_bit)
{
    static const int SIG_OFF_T[5] = {0, 15, 29, 44, 47};
    static const int LVL_OFF_T[5] = {0, 10, 20, 30, 39};
    CabEnc *e = &t->e;
    int nz = 0;
    for (int i = 0; i < n_coeffs; i++)
        if (zz[i])
            nz++;
    if (has_cbf_bit) {
        ce_decision(e, 85 + 4 * cat + cbf_inc, nz != 0);
        if (!nz)
            return;
    } else if (!nz) {
        dec_fail(t->d, "transcode: empty residual without cbf");
    }
    int sig_base = 105 + SIG_OFF_T[cat];
    int last_base = 166 + SIG_OFF_T[cat];
    int lvl_base = 227 + LVL_OFF_T[cat];
    int last_nz = n_coeffs - 1;
    while (!zz[last_nz])
        last_nz--;
    for (int i = 0; i < n_coeffs - 1; i++) {
        ce_decision(e, sig_base + i, zz[i] != 0);
        if (zz[i]) {
            ce_decision(e, last_base + i, i == last_nz);
            if (i == last_nz)
                break;
        }
    }
    /* levels, highest frequency first */
    int cap = 4 - (cat == 3 ? 1 : 0);
    int num_eq1 = 0, num_gt1 = 0;
    for (int pos = last_nz; pos >= 0; pos--) {
        if (!zz[pos])
            continue;
        i64 v = zz[pos];
        i64 a = v < 0 ? -v : v;
        int inc0 = num_gt1 ? 0 : (1 + num_eq1 < 4 ? 1 + num_eq1 : 4);
        if (a == 1) {
            ce_decision(e, lvl_base + inc0, 0);
            num_eq1++;
        } else {
            ce_decision(e, lvl_base + inc0, 1);
            int incn = 5 + (num_gt1 < cap ? num_gt1 : cap);
            if (a < 15) {
                for (i64 k = 2; k < a; k++)
                    ce_decision(e, lvl_base + incn, 1);
                ce_decision(e, lvl_base + incn, 0);
            } else {
                for (int k = 2; k < 15; k++)
                    ce_decision(e, lvl_base + incn, 1);
                /* UEG0 suffix, uCoff 14: val = a - 14 >= 1 */
                i64 val = a - 14;
                int j = 0;
                while ((val >> (j + 1)) > 0)
                    j++;
                for (int k = 0; k < j; k++)
                    ce_bypass(e, 1);
                ce_bypass(e, 0);
                for (int k = j - 1; k >= 0; k--)
                    ce_bypass(e, (int)((val >> k) & 1));
            }
            num_gt1++;
        }
        ce_bypass(e, v < 0);
    }
}

static void tc_emit_mvd(Tc *t, int base, int amvd_sum, int mvd)
{
    CabEnc *e = &t->e;
    int inc = (amvd_sum > 2) + (amvd_sum > 32);
    if (mvd == 0) {
        ce_decision(e, base + inc, 0);
        return;
    }
    ce_decision(e, base + inc, 1);
    int a = mvd < 0 ? -mvd : mvd;
    /* unary part: bins 2..8 at ctx base+3..base+6 (capped) */
    int ctx = 3;
    int u = a < 9 ? a : 9;
    for (int k = 1; k < u; k++) {
        ce_decision(e, base + ctx, 1);
        if (ctx < 6)
            ctx++;
    }
    if (a < 9) {
        ce_decision(e, base + ctx, 0);
    } else {
        /* EG3 suffix, bypass */
        int rem = a - 9;
        int k = 3, nones = 0;
        while (rem >= (1 << k)) {
            rem -= 1 << k;
            k++;
            nones++;
        }
        for (int i = 0; i < nones; i++)
            ce_bypass(e, 1);
        ce_bypass(e, 0);
        for (int i = k - 1; i >= 0; i--)
            ce_bypass(e, (rem >> i) & 1);
    }
    ce_bypass(e, mvd < 0);
}

static void tc_emit_dqp(Tc *t, int dqp)
{
    CabEnc *e = &t->e;
    int val = dqp > 0 ? 2 * dqp - 1 : -2 * dqp;
    int ctx = t->last_dqp ? 1 : 0;
    for (int i = 0; i < val; i++) {
        ce_decision(e, 60 + ctx, 1);
        ctx = i == 0 ? 2 : 3;
    }
    ce_decision(e, 60 + ctx, 0);
}

static void tc_emit_chroma_mode(Tc *t, int mx, int my, int mode)
{
    CabEnc *e = &t->e;
    int w = t->mbw;
    int inc = 0;
    if (tc_avail_a(t, mx) && t->intra[my * w + mx - 1]
            && t->chroma_mode[my * w + mx - 1])
        inc++;
    if (tc_avail_b(t, my) && t->intra[(my - 1) * w + mx]
            && t->chroma_mode[(my - 1) * w + mx])
        inc++;
    ce_decision(e, 64 + inc, mode > 0);
    if (mode > 0) {
        ce_decision(e, 67, mode > 1);
        if (mode > 1)
            ce_decision(e, 67, mode > 2);
    }
}

static void tc_emit_cbp(Tc *t, int mx, int my, int cbp_luma, int cbp_chroma)
{
    CabEnc *e = &t->e;
    int w = t->mbw;
    /* luma (9.3.3.1.1.4): cond = neighbour 8x8 bit CLEAR; unavailable
       neighbours contribute 0 (no PCM in the transcode envelope) */
    int la = tc_avail_a(t, mx) ? t->cbp_l[my * w + mx - 1] : -1;
    int lb = tc_avail_b(t, my) ? t->cbp_l[(my - 1) * w + mx] : -1;
    int cbp = 0;
    int ca_ = la >= 0 ? !(la & 0x2) : 0;
    int cb_ = lb >= 0 ? !(lb & 0x4) : 0;
    ce_decision(e, 73 + ca_ + 2 * cb_, cbp_luma & 1);
    cbp |= cbp_luma & 1;
    cb_ = lb >= 0 ? !(lb & 0x8) : 0;
    ce_decision(e, 73 + !(cbp & 0x1) + 2 * cb_, (cbp_luma >> 1) & 1);
    cbp |= cbp_luma & 2;
    ca_ = la >= 0 ? !(la & 0x8) : 0;
    ce_decision(e, 73 + ca_ + 2 * !(cbp & 0x1), (cbp_luma >> 2) & 1);
    cbp |= cbp_luma & 4;
    int ctx = !(cbp & 0x4) + 2 * !(cbp & 0x2);
    ce_decision(e, 73 + ctx, (cbp_luma >> 3) & 1);
    /* chroma */
    int ca = tc_avail_a(t, mx) ? t->cbp_c[my * w + mx - 1] : 0;
    int cb = tc_avail_b(t, my) ? t->cbp_c[(my - 1) * w + mx] : 0;
    ce_decision(e, 77 + (ca != 0) + 2 * (cb != 0), cbp_chroma != 0);
    if (cbp_chroma)
        ce_decision(e, 81 + (ca == 2) + 2 * (cb == 2), cbp_chroma == 2);
}

/* I-MB mb_type suffix (mirror of _intra_mb_type): emit the bins that
   decode to mb_type (1..24; I_NxN/PCM handled by callers) */
static void tc_emit_i16_suffix(Tc *t, int s, int intra_slice, int mb_type)
{
    CabEnc *e = &t->e;
    ce_terminate(e, 0);                 /* not I_PCM */
    int tt = mb_type - 1;
    int pred = tt % 4;
    int cc = (tt / 4) % 3;
    int cl = tt >= 12;
    ce_decision(e, s + 1, cl);
    ce_decision(e, s + 2, cc != 0);
    if (cc)
        ce_decision(e, s + 2 + (intra_slice ? 1 : 0), cc == 2);
    int off = 3 + (intra_slice ? 1 : 0);
    ce_decision(e, s + off, (pred >> 1) & 1);
    ce_decision(e, s + 3 + (intra_slice ? 2 : 0), pred & 1);
}

/* cbf_inc for MB-granular grids (luma DC / chroma DC) */
static int tc_cbf_inc_mb(Tc *t, const uint8_t *grid, const uint8_t *exists,
                         int mx, int my, int cur_intra)
{
    int w = t->mbw;
    int ca, cb;
    if (tc_avail_a(t, mx))
        ca = exists[my * w + mx - 1] ? grid[my * w + mx - 1] : 0;
    else
        ca = cur_intra ? 1 : 0;
    if (tc_avail_b(t, my))
        cb = exists[(my - 1) * w + mx] ? grid[(my - 1) * w + mx] : 0;
    else
        cb = cur_intra ? 1 : 0;
    return ca + 2 * cb;
}

/* cbf_inc for block-granular grids */
static int tc_cbf_inc_blk(Tc *t, const uint8_t *grid, int gw, int gy, int gx,
                          int gy_min, int cur_intra)
{
    int ca = gx > 0 ? grid[gy * gw + gx - 1] : (cur_intra ? 1 : 0);
    int cb = gy > gy_min ? grid[(gy - 1) * gw + gx] : (cur_intra ? 1 : 0);
    return ca + 2 * cb;
}

/* --------------- per-MB transcode --------------------------------- */

static void tc_clear_mb(Tc *t, int mx, int my, int intra, int skipped)
{
    int w = t->mbw, g4w = w * 4, g2w = w * 2;
    t->skip[my * w + mx] = (uint8_t)skipped;
    t->intra[my * w + mx] = (uint8_t)intra;
    t->i16[my * w + mx] = 0;
    t->chroma_mode[my * w + mx] = 0;
    t->cbp_l[my * w + mx] = 0;
    t->cbp_c[my * w + mx] = 0;
    t->cbf_ldc[my * w + mx] = 0;
    for (int ci = 0; ci < 2; ci++)
        t->cbf_cdc[ci][my * w + mx] = 0;
    for (int yy = 0; yy < 4; yy++)
        for (int xx = 0; xx < 4; xx++) {
            t->cbf_l4[(my * 4 + yy) * g4w + mx * 4 + xx] = 0;
            t->amvd[((my * 4 + yy) * (long)g4w + mx * 4 + xx) * 2 + 0] = 0;
            t->amvd[((my * 4 + yy) * (long)g4w + mx * 4 + xx) * 2 + 1] = 0;
        }
    for (int ci = 0; ci < 2; ci++)
        for (int yy = 0; yy < 2; yy++)
            for (int xx = 0; xx < 2; xx++)
                t->cbf_c4[ci][(my * 2 + yy) * g2w + mx * 2 + xx] = 0;
}

/* parse CAVLC chroma residuals + emit CABAC twins (shared by all MB
   kinds with residuals); also maintains nnz_c for later CAVLC nC */
static void tc_chroma_residuals(Tc *t, int mx, int my, int cbp_chroma,
                                int cur_intra)
{
    int w = t->mbw, g2w = w * 2;
    i64 zz[16];
    if (cbp_chroma) {
        for (int ci = 0; ci < 2; ci++) {
            cavlc_block(t->d, &t->r, -1, 4, zz);
            /* cbf ctx over cbf_cdc, exists-fn = neighbour cbp_c > 0 */
            int ca, cb;
            if (tc_avail_a(t, mx))
                ca = t->cbp_c[my * w + mx - 1] > 0
                     ? t->cbf_cdc[ci][my * w + mx - 1] : 0;
            else
                ca = cur_intra ? 1 : 0;
            if (tc_avail_b(t, my))
                cb = t->cbp_c[(my - 1) * w + mx] > 0
                     ? t->cbf_cdc[ci][(my - 1) * w + mx] : 0;
            else
                cb = cur_intra ? 1 : 0;
            tc_emit_residual(t, 3, 4, ca + 2 * cb, zz, 1);
            int nz = 0;
            for (int i = 0; i < 4; i++)
                if (zz[i])
                    nz = 1;
            t->cbf_cdc[ci][my * w + mx] = (uint8_t)nz;
        }
    }
    if (cbp_chroma == 2) {
        static const int CO[4][2] = {{0, 0}, {1, 0}, {0, 1}, {1, 1}};
        for (int ci = 0; ci < 2; ci++) {
            for (int k = 0; k < 4; k++) {
                int bx = CO[k][0], by = CO[k][1];
                int gx = mx * 2 + bx, gy = my * 2 + by;
                int la = (gx % 2 > 0) || tc_avail_a(t, mx);
                int ta = (gy % 2 > 0) || tc_avail_b(t, my);
                int nc = 0;
                {
                    int has_l = la && gx > 0, has_t = ta && gy > t->my0 * 2;
                    if (has_l && has_t)
                        nc = (t->nnz_c[ci][gy * g2w + gx - 1]
                              + t->nnz_c[ci][(gy - 1) * g2w + gx] + 1) >> 1;
                    else if (has_l)
                        nc = t->nnz_c[ci][gy * g2w + gx - 1];
                    else if (has_t)
                        nc = t->nnz_c[ci][(gy - 1) * g2w + gx];
                }
                cavlc_block(t->d, &t->r, nc, 15, zz);
                int inc = tc_cbf_inc_blk(t, t->cbf_c4[ci], g2w, gy, gx,
                                         t->my0 * 2, cur_intra);
                tc_emit_residual(t, 4, 15, inc, zz, 1);
                int nz = 0;
                for (int i = 0; i < 15; i++)
                    if (zz[i])
                        nz++;
                t->cbf_c4[ci][gy * g2w + gx] = (uint8_t)(nz != 0);
                t->nnz_c[ci][gy * g2w + gx] = (uint8_t)nz;
            }
        }
    } else {
        for (int ci = 0; ci < 2; ci++)
            for (int yy = 0; yy < 2; yy++)
                for (int xx = 0; xx < 2; xx++)
                    t->nnz_c[ci][(my * 2 + yy) * g2w + mx * 2 + xx] = 0;
    }
}

/* I_16x16 MB: parse CAVLC body (after mb_type), emit CABAC body */
static void tc_i16_body(Tc *t, int mx, int my, int mb_type)
{
    int w = t->mbw, g4w = w * 4;
    int tt = mb_type - 1;
    int cbp_chroma = (tt / 4) % 3;
    int cbp_luma = tt >= 12 ? 15 : 0;
    int chroma_mode = (int)br_ue(&t->r);
    if (chroma_mode > 3)
        dec_fail(t->d, "transcode: bad chroma mode");
    tc_emit_chroma_mode(t, mx, my, chroma_mode);
    int dqp = (int)br_se(&t->r);
    tc_emit_dqp(t, dqp);
    t->last_dqp = dqp;
    t->qp += dqp;

    t->intra[my * w + mx] = 1;
    t->i16[my * w + mx] = 1;
    t->chroma_mode[my * w + mx] = (uint8_t)chroma_mode;
    t->cbp_l[my * w + mx] = (uint8_t)cbp_luma;
    t->cbp_c[my * w + mx] = (uint8_t)cbp_chroma;
    for (int yy = 0; yy < 4; yy++)
        for (int xx = 0; xx < 4; xx++) {
            t->i4mode[(my * 4 + yy) * g4w + mx * 4 + xx] = 2;
            t->avail4[(my * 4 + yy) * g4w + mx * 4 + xx] = 1;
        }

    i64 zz[16];
    /* luma DC */
    int nc = tc_nc(t, t->nnz_l, g4w, mx * 4, my * 4, t->my0 * 4);
    cavlc_block(t->d, &t->r, nc, 16, zz);
    {
        /* cbf_inc over cbf_ldc, exists = neighbour is I16 */
        int ca, cb;
        if (tc_avail_a(t, mx))
            ca = t->i16[my * w + mx - 1] ? t->cbf_ldc[my * w + mx - 1] : 0;
        else
            ca = 1;
        if (tc_avail_b(t, my))
            cb = t->i16[(my - 1) * w + mx] ? t->cbf_ldc[(my - 1) * w + mx] : 0;
        else
            cb = 1;
        tc_emit_residual(t, 0, 16, ca + 2 * cb, zz, 1);
    }
    int dcnz = 0;
    for (int i = 0; i < 16; i++)
        if (zz[i])
            dcnz = 1;
    t->cbf_ldc[my * w + mx] = (uint8_t)dcnz;
    /* luma AC */
    if (cbp_luma) {
        for (int bi = 0; bi < 16; bi++) {
            int bx = BLK_ORDER[bi][0], by = BLK_ORDER[bi][1];
            int gx = mx * 4 + bx, gy = my * 4 + by;
            nc = tc_nc(t, t->nnz_l, g4w, gx, gy, t->my0 * 4);
            cavlc_block(t->d, &t->r, nc, 15, zz);
            int inc = tc_cbf_inc_blk(t, t->cbf_l4, g4w, gy, gx,
                                     t->my0 * 4, 1);
            tc_emit_residual(t, 1, 15, inc, zz, 1);
            int nz = 0;
            for (int i = 0; i < 15; i++)
                if (zz[i])
                    nz++;
            t->cbf_l4[gy * g4w + gx] = (uint8_t)(nz != 0);
            t->nnz_l[gy * g4w + gx] = (uint8_t)nz;
        }
    } else {
        for (int yy = 0; yy < 4; yy++)
            for (int xx = 0; xx < 4; xx++)
                t->nnz_l[(my * 4 + yy) * g4w + mx * 4 + xx] = 0;
    }
    tc_chroma_residuals(t, mx, my, cbp_chroma, 1);
}

/* I_NxN (intra 4x4) MB: parse + emit */
static void tc_i4_body(Tc *t, int mx, int my)
{
    int w = t->mbw, g4w = w * 4;
    CabEnc *e = &t->e;
    int modes[16];
    for (int bi = 0; bi < 16; bi++) {
        int bx = BLK_ORDER[bi][0], by = BLK_ORDER[bi][1];
        int gx = mx * 4 + bx, gy = my * 4 + by;
        int ma = (gx > 0 && t->avail4[gy * g4w + gx - 1])
                 ? t->i4mode[gy * g4w + gx - 1] : -1;
        int mb_ = (gy > t->my0 * 4 && t->avail4[(gy - 1) * g4w + gx])
                  ? t->i4mode[(gy - 1) * g4w + gx] : -1;
        int pm = (ma < 0 || mb_ < 0) ? 2
                 : (ma < mb_ ? ma : mb_);
        int m;
        if (br_bit(&t->r)) {
            m = pm;
            ce_decision(e, 68, 1);
        } else {
            int rem = (int)br_u(&t->r, 3);
            m = rem < pm ? rem : rem + 1;
            ce_decision(e, 68, 0);
            ce_decision(e, 69, rem & 1);
            ce_decision(e, 69, (rem >> 1) & 1);
            ce_decision(e, 69, (rem >> 2) & 1);
        }
        modes[bi] = m;
        t->i4mode[gy * g4w + gx] = (int8_t)m;
        t->avail4[gy * g4w + gx] = 1;
    }
    (void)modes;
    int chroma_mode = (int)br_ue(&t->r);
    if (chroma_mode > 3)
        dec_fail(t->d, "transcode: bad chroma mode");
    tc_emit_chroma_mode(t, mx, my, chroma_mode);
    long cbp_code = br_ue(&t->r);
    if (cbp_code > 47)
        dec_fail(t->d, "transcode: bad cbp");
    int cbp = CBP_INTRA[cbp_code];
    int cbp_luma = cbp & 15, cbp_chroma = cbp >> 4;
    tc_emit_cbp(t, mx, my, cbp_luma, cbp_chroma);
    t->intra[my * w + mx] = 1;
    t->chroma_mode[my * w + mx] = (uint8_t)chroma_mode;
    t->cbp_l[my * w + mx] = (uint8_t)cbp_luma;
    t->cbp_c[my * w + mx] = (uint8_t)cbp_chroma;
    if (cbp_luma || cbp_chroma) {
        int dqp = (int)br_se(&t->r);
        tc_emit_dqp(t, dqp);
        t->last_dqp = dqp;
        t->qp += dqp;
    } else {
        t->last_dqp = 0;
    }
    i64 zz[16];
    for (int bi = 0; bi < 16; bi++) {
        int bx = BLK_ORDER[bi][0], by = BLK_ORDER[bi][1];
        int gx = mx * 4 + bx, gy = my * 4 + by;
        if (cbp_luma & (1 << (bi / 4))) {
            int nc = tc_nc(t, t->nnz_l, g4w, gx, gy, t->my0 * 4);
            cavlc_block(t->d, &t->r, nc, 16, zz);
            int inc = tc_cbf_inc_blk(t, t->cbf_l4, g4w, gy, gx,
                                     t->my0 * 4, 1);
            tc_emit_residual(t, 2, 16, inc, zz, 1);
            int nz = 0;
            for (int i = 0; i < 16; i++)
                if (zz[i])
                    nz++;
            t->cbf_l4[gy * g4w + gx] = (uint8_t)(nz != 0);
            t->nnz_l[gy * g4w + gx] = (uint8_t)nz;
        } else {
            t->cbf_l4[gy * g4w + gx] = 0;
            t->nnz_l[gy * g4w + gx] = 0;
        }
    }
    tc_chroma_residuals(t, mx, my, cbp_chroma, 1);
}

/* P_L0_16x16 / P_L0_L0_16x8 / P_L0_L0_8x16 */
static void tc_p_body(Tc *t, int mx, int my, int mb_type)
{
    int w = t->mbw, g4w = w * 4;
    CabEnc *e = &t->e;
    int gy0 = my * 4, gx0 = mx * 4;
    struct { int gy, gx, pw, ph; } parts[2];
    int np;
    if (mb_type == 0) {
        parts[0].gy = gy0; parts[0].gx = gx0;
        parts[0].pw = 4; parts[0].ph = 4;
        np = 1;
    } else if (mb_type == 1) {  /* 16x8 */
        parts[0].gy = gy0; parts[0].gx = gx0; parts[0].pw = 4; parts[0].ph = 2;
        parts[1].gy = gy0 + 2; parts[1].gx = gx0;
        parts[1].pw = 4; parts[1].ph = 2;
        np = 2;
    } else {                    /* 8x16 */
        parts[0].gy = gy0; parts[0].gx = gx0; parts[0].pw = 2; parts[0].ph = 4;
        parts[1].gy = gy0; parts[1].gx = gx0 + 2;
        parts[1].pw = 2; parts[1].ph = 4;
        np = 2;
    }
    /* ref_idx: absent when l0_active == 1 (the own-encoder envelope;
       multi-ref P would need the ref-known ctx grid from the decoder) */
    if (t->l0_active > 1)
        dec_fail(t->d, "transcode: l0_active > 1 unsupported");
    for (int p = 0; p < np; p++) {
        int gy = parts[p].gy, gx = parts[p].gx;
        int mdx = (int)br_se(&t->r);
        int mdy = (int)br_se(&t->r);
        int ax = 0, ay = 0;
        if (gx > 0 && t->dec4[gy * g4w + gx - 1]) {
            ax += t->amvd[((long)gy * g4w + gx - 1) * 2 + 0];
            ay += t->amvd[((long)gy * g4w + gx - 1) * 2 + 1];
        }
        if (gy > t->my0 * 4 && t->dec4[(gy - 1) * g4w + gx]) {
            ax += t->amvd[((long)(gy - 1) * g4w + gx) * 2 + 0];
            ay += t->amvd[((long)(gy - 1) * g4w + gx) * 2 + 1];
        }
        tc_emit_mvd(t, 40, ax, mdx);
        tc_emit_mvd(t, 47, ay, mdy);
        int adx = mdx < 0 ? -mdx : mdx, ady = mdy < 0 ? -mdy : mdy;
        for (int yy = 0; yy < parts[p].ph; yy++)
            for (int xx = 0; xx < parts[p].pw; xx++) {
                long ii = ((long)(gy + yy) * g4w + gx + xx) * 2;
                t->amvd[ii + 0] = (int16_t)adx;
                t->amvd[ii + 1] = (int16_t)ady;
                t->dec4[(gy + yy) * g4w + gx + xx] = 1;
            }
    }
    for (int yy = 0; yy < 4; yy++)
        for (int xx = 0; xx < 4; xx++) {
            t->i4mode[(gy0 + yy) * g4w + gx0 + xx] = 2;
            t->avail4[(gy0 + yy) * g4w + gx0 + xx] = 1;
        }
    /* cbp -> dqp -> residuals */
    long cbp_code = br_ue(&t->r);
    if (cbp_code > 47)
        dec_fail(t->d, "transcode: bad cbp");
    int cbp = CBP_INTER[cbp_code];
    int cbp_luma = cbp & 15, cbp_chroma = cbp >> 4;
    tc_emit_cbp(t, mx, my, cbp_luma, cbp_chroma);
    t->cbp_l[my * w + mx] = (uint8_t)cbp_luma;
    t->cbp_c[my * w + mx] = (uint8_t)cbp_chroma;
    i64 zz[16];
    if (cbp_luma || cbp_chroma) {
        int dqp = (int)br_se(&t->r);
        tc_emit_dqp(t, dqp);
        t->last_dqp = dqp;
        t->qp += dqp;
        for (int bi = 0; bi < 16; bi++) {
            int bx = BLK_ORDER[bi][0], by = BLK_ORDER[bi][1];
            int gx = mx * 4 + bx, gy = my * 4 + by;
            if (cbp_luma & (1 << (bi / 4))) {
                int nc = tc_nc(t, t->nnz_l, g4w, gx, gy, t->my0 * 4);
                cavlc_block(t->d, &t->r, nc, 16, zz);
                int inc = tc_cbf_inc_blk(t, t->cbf_l4, g4w, gy, gx,
                                         t->my0 * 4, 0);
                tc_emit_residual(t, 2, 16, inc, zz, 1);
                int nz = 0;
                for (int i = 0; i < 16; i++)
                    if (zz[i])
                        nz++;
                t->cbf_l4[gy * g4w + gx] = (uint8_t)(nz != 0);
                t->nnz_l[gy * g4w + gx] = (uint8_t)nz;
            } else {
                t->cbf_l4[gy * g4w + gx] = 0;
                t->nnz_l[gy * g4w + gx] = 0;
            }
        }
        tc_chroma_residuals(t, mx, my, cbp_chroma, 0);
    } else {
        t->last_dqp = 0;
        for (int yy = 0; yy < 4; yy++)
            for (int xx = 0; xx < 4; xx++)
                t->nnz_l[(my * 4 + yy) * g4w + mx * 4 + xx] = 0;
        for (int ci = 0; ci < 2; ci++)
            for (int yy = 0; yy < 2; yy++)
                for (int xx = 0; xx < 2; xx++)
                    t->nnz_c[ci][(my * 2 + yy) * (w * 2) + mx * 2 + xx] = 0;
    }
    (void)e;
}

/* skipped P MB bookkeeping (CAVLC mb_skip_run member) */
static void tc_p_skip_mb(Tc *t, int mx, int my)
{
    int w = t->mbw, g4w = w * 4;
    CabEnc *e = &t->e;
    int inc = 0;
    if (tc_avail_a(t, mx) && !t->skip[my * w + mx - 1])
        inc++;
    if (tc_avail_b(t, my) && !t->skip[(my - 1) * w + mx])
        inc++;
    tc_clear_mb(t, mx, my, 0, 1);
    ce_decision(e, 11 + inc, 1);
    t->last_dqp = 0;
    for (int yy = 0; yy < 4; yy++)
        for (int xx = 0; xx < 4; xx++) {
            t->dec4[(my * 4 + yy) * g4w + mx * 4 + xx] = 1;
            t->i4mode[(my * 4 + yy) * g4w + mx * 4 + xx] = 2;
            t->avail4[(my * 4 + yy) * g4w + mx * 4 + xx] = 1;
            t->nnz_l[(my * 4 + yy) * g4w + mx * 4 + xx] = 0;
        }
    for (int ci = 0; ci < 2; ci++)
        for (int yy = 0; yy < 2; yy++)
            for (int xx = 0; xx < 2; xx++)
                t->nnz_c[ci][(my * 2 + yy) * (w * 2) + mx * 2 + xx] = 0;
}

/* --------------- slice transcode entry ----------------------------- */

long h264fast_transcode_slice(void *h, const uint8_t *rbsp, long rbsp_len,
                              long bit_off, int slice_type, int slice_qp,
                              int first_mb, int mbw, int mbh, int l0_active,
                              int table_idx, uint8_t *out, long out_cap)
{
    H264Dec *d = (H264Dec *)h;
    Tc t;
    memset(&t, 0, sizeof(t));
    if (setjmp(d->jb)) {
        free(t.arena);
        return -1;
    }
    if (first_mb % mbw != 0)
        dec_fail(d, "transcode: slice not row-aligned");
    if (slice_type != 0 && slice_type != 2)
        dec_fail(d, "transcode: only I/P slices");
    t.d = d;
    t.r.data = rbsp;
    t.r.size = rbsp_len;
    t.r.pos = bit_off;
    t.r.d = d;
    t.mbw = mbw;
    t.mbh = mbh;
    t.my0 = first_mb / mbw;
    t.is_p = slice_type == 0;
    t.qp = slice_qp;
    t.last_dqp = 0;
    t.l0_active = l0_active;
    long nmb = (long)mbw * mbh, g4 = nmb * 16, g2 = nmb * 4;
    long need = nmb * 10 + g4 * 4 + g2 * 4 + g4 * 2 * 2 + g4;
    uint8_t *a = calloc(1, (size_t)need);
    if (!a)
        dec_fail(d, "transcode: out of memory");
    t.arena = a;
    t.skip = a; a += nmb;
    t.intra = a; a += nmb;
    t.i16 = a; a += nmb;
    t.cbf_ldc = a; a += nmb;
    t.cbp_l = a; a += nmb;
    t.cbp_c = a; a += nmb;
    t.chroma_mode = a; a += nmb;
    t.cbf_cdc[0] = a; a += nmb;
    t.cbf_cdc[1] = a; a += nmb;
    a += nmb;  /* pad */
    t.cbf_l4 = a; a += g4;
    t.nnz_l = a; a += g4;
    t.avail4 = a; a += g4;
    t.dec4 = a; a += g4;
    t.i4mode = (int8_t *)a; a += g4;
    t.cbf_c4[0] = a; a += g2;
    t.cbf_c4[1] = a; a += g2;
    t.nnz_c[0] = a; a += g2;
    t.nnz_c[1] = a; a += g2;
    t.amvd = (int16_t *)(void *)a;

    ce_init(&t.e, d, out, out_cap, table_idx, slice_qp);

    long n_mbs = nmb;
    long mb_addr = first_mb;
    int emitted_any = 0;
    while (mb_addr < n_mbs) {
        if (!br_more_rbsp(&t.r))
            break;
        if (emitted_any)
            ce_terminate(&t.e, 0);      /* end_of_slice_flag = 0 */
        long run = 0;
        if (t.is_p) {
            run = br_ue(&t.r);
            while (run-- > 0) {
                if (mb_addr >= n_mbs)
                    dec_fail(d, "transcode: skip run overflow");
                int my = (int)(mb_addr / mbw), mx = (int)(mb_addr % mbw);
                tc_p_skip_mb(&t, mx, my);
                mb_addr++;
                emitted_any = 1;
                if (mb_addr >= n_mbs || !br_more_rbsp(&t.r))
                    goto done;
                ce_terminate(&t.e, 0);
            }
            if (!br_more_rbsp(&t.r))
                break;
        }
        int my = (int)(mb_addr / mbw), mx = (int)(mb_addr % mbw);
        if (t.is_p) {
            /* non-skipped MB after the run */
            int inc = 0;
            if (tc_avail_a(&t, mx) && !t.skip[my * mbw + mx - 1])
                inc++;
            if (tc_avail_b(&t, my) && !t.skip[(my - 1) * mbw + mx])
                inc++;
            ce_decision(&t.e, 11 + inc, 0);     /* mb_skip_flag = 0 */
            tc_clear_mb(&t, mx, my, 0, 0);
            long mt = br_ue(&t.r);
            if (mt <= 2) {
                /* P mb_type prefix: ctx 14/15/16/17 */
                ce_decision(&t.e, 14, 0);
                if (mt == 0) {
                    ce_decision(&t.e, 15, 0);
                    ce_decision(&t.e, 16, 0);
                } else if (mt == 1) {
                    ce_decision(&t.e, 15, 1);
                    ce_decision(&t.e, 17, 1);
                } else {
                    ce_decision(&t.e, 15, 1);
                    ce_decision(&t.e, 17, 0);
                }
                tc_p_body(&t, mx, my, (int)mt);
            } else if (mt == 3 || mt == 4) {
                dec_fail(d, "transcode: P_8x8 unsupported");
            } else {
                long it = mt - 5;
                t.intra[my * mbw + mx] = 1;
                for (int yy = 0; yy < 4; yy++)
                    for (int xx = 0; xx < 4; xx++)
                        t.dec4[(my * 4 + yy) * (mbw * 4) + mx * 4 + xx] = 1;
                ce_decision(&t.e, 14, 1);
                if (it == 0) {
                    ce_decision(&t.e, 17, 0);
                    tc_i4_body(&t, mx, my);
                } else if (it >= 1 && it <= 24) {
                    ce_decision(&t.e, 17, 1);
                    tc_emit_i16_suffix(&t, 17, 0, (int)it);
                    tc_i16_body(&t, mx, my, (int)it);
                } else {
                    dec_fail(d, "transcode: I_PCM unsupported");
                }
            }
        } else {
            tc_clear_mb(&t, mx, my, 1, 0);
            long mt = br_ue(&t.r);
            int inc = 0;
            if (tc_avail_a(&t, mx) && t.i16[my * mbw + mx - 1])
                inc++;
            if (tc_avail_b(&t, my) && t.i16[(my - 1) * mbw + mx])
                inc++;
            if (mt == 0) {
                ce_decision(&t.e, 3 + inc, 0);
                tc_i4_body(&t, mx, my);
            } else if (mt >= 1 && mt <= 24) {
                ce_decision(&t.e, 3 + inc, 1);
                tc_emit_i16_suffix(&t, 5, 1, (int)mt);
                tc_i16_body(&t, mx, my, (int)mt);
            } else {
                dec_fail(d, "transcode: I_PCM unsupported");
            }
        }
        mb_addr++;
        emitted_any = 1;
    }
done:
    if (!emitted_any)
        dec_fail(d, "transcode: empty slice");
    ce_terminate(&t.e, 1);              /* end_of_slice_flag = 1 + flush */
    free(t.arena);
    return t.e.bytes;
}

/* ------------------------------------------------------------------ */
/* public API (ctypes)                                                  */
/* ------------------------------------------------------------------ */

void *h264fast_create(const uint8_t *vlc_blob, long vlc_len,
                      const int8_t *ctx_init, const int32_t *range_tab,
                      const int32_t *trans_lps, const int32_t *sig8,
                      const int32_t *last8)
{
    H264Dec *d = calloc(1, sizeof(H264Dec));
    if (!d)
        return NULL;
    if (build_vlc_tables(d->vlc, vlc_blob, vlc_len) != 0) {
        free(d);
        return NULL;
    }
    memcpy(d->ctx_init, ctx_init, sizeof(d->ctx_init));
    memcpy(d->range_tab, range_tab, sizeof(d->range_tab));
    memcpy(d->trans_lps, trans_lps, sizeof(d->trans_lps));
    memcpy(d->sig8, sig8, sizeof(d->sig8));
    memcpy(d->last8, last8, sizeof(d->last8));
    return d;
}

int h264fast_decode_au(void *h, const uint8_t *au, long size)
{
    H264Dec *d = h;
    d->err[0] = 0;
    if (setjmp(d->jb))
        return -1;
    return decode_au_inner(d, au, size);
}

int h264fast_dims(void *h, int *w, int *hh)
{
    H264Dec *d = h;
    if (!d->have_pic)
        return -1;
    *w = d->out_w;
    *hh = d->out_h;
    return 0;
}

/* copy the next display-order (cropped) picture out; strides = widths */
void h264fast_get_planes(void *h, uint8_t *y, uint8_t *cb, uint8_t *cr)
{
    H264Dec *d = h;
    if (!d->have_pic || !d->out_ready)
        return;
    int w = d->out_w, hh = d->out_h;
    int cw = (w + 1) / 2, ch = (hh + 1) / 2;
    memcpy(y, d->out_y, (size_t)w * hh);
    memcpy(cb, d->out_cb, (size_t)cw * ch);
    memcpy(cr, d->out_cr, (size_t)cw * ch);
}

/* drain one frame from the reorder queue (end of stream); 1 if a frame
 * is now readable via h264fast_get_planes */
int h264fast_flush_frame(void *h)
{
    H264Dec *d = h;
    d->err[0] = 0;
    if (setjmp(d->jb))
        return -1;
    if (!outq_pop(d))
        return 0;
    d->have_pic = 1;
    return 1;
}

const char *h264fast_error(void *h)
{
    return ((H264Dec *)h)->err;
}

void h264fast_destroy(void *h)
{
    H264Dec *d = h;
    if (!d)
        return;
    free_geometry(d);
    for (int t = 0; t < N_VLC_TABLES; t++)
        free(d->vlc[t].lut);
    free(d->rbsp_buf);
    free(d);
}
