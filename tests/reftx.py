"""Build & wrap the REFERENCE packetizer (src/transmit.c) for golden-packet
interop tests.

Compiles the reference's actual transmit.c (symbol-aligned splitting,
video/FEC payload header formatting, mult duplication) together with
video_frame.c/video_codec.c/tv.c, stubbing the RTP session layer with a
capture shim: every rtp_send_data_hdr() call records (pt, marker,
payload-header bytes, data length, data bytes).  Tests then assert our
net/transmit.py produces byte-identical packet sequences for the same
frame + MTU + FEC parameters.

Mirrored reference flow: tx_send -> tx_send_base (src/transmit.c:443-478,
:699-818): get_packet_sizes symbol-aligned splitting (:589-623),
format_video_header (:482-496), FEC hdr (:727-740), packet duplication
(mult, :755-776).

Stub fidelity notes:
- fec_pt_from_fec_type is reimplemented in the stub as the same switch
  over the reference's own PT_* enum values (src/rtp/fec.cpp:182-204) —
  fec.cpp itself pulls in the whole LDGM/RS stack.
- ug_rand -> 0 so the initial buffer id is deterministic.
- encryption/control/module/message layers are no-ops (unused paths here).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from functools import lru_cache

import numpy as np

REF = "/root/reference"
BUILD_DIR = "/tmp/ugtpu_reftx"

_STUBS = r"""
#include <stdarg.h>
#include <stdbool.h>
#include <stddef.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#include "rtp/rtp.h"
#include "rtp/rtp_types.h"
#include "transmit.h"
#include "types.h"

/* ---- logging / params / control / module / messaging no-ops ---- */
int log_level = 5;
void log_msg(int level, const char *format, ...) { (void)level; (void)format; }
void log_msg_once(int level, unsigned int id, const char *format, ...) { (void)level;(void)id;(void)format; }
const char *get_commandline_param(const char *x){(void)x;return 0;}
void register_param(const char *a, const char *b){(void)a;(void)b;}
int get_log_output(void){return 0;}
void color_printf(const char *format, ...){(void)format;}
void exit_uv(int status){(void)status;}
void control_report_stats(void *cs, const char *report){(void)cs;(void)report;}
int control_stats_enabled(void *cs){(void)cs;return 0;}
void *get_control_state(void *mod){(void)mod;return 0;}
void *get_parent_module(void *mod){(void)mod;return 0;}
const void *load_library(const char *name, int cls, int abi){(void)name;(void)cls;(void)abi;return 0;}
void module_init_default(void *m){memset(m, 0, 8);}
void module_register(void *m, void *p){(void)m;(void)p;}
void module_done(void *m){(void)m;}
void *check_message(void *m){(void)m;return 0;}
void free_message(void *m, void *r){(void)m;(void)r;}
void *new_response(int status, const char *text){(void)status;(void)text;return 0;}
void free_response(void *r){(void)r;}
void *new_message(size_t len){return calloc(1, len < 4096 ? 4096 : len);}
void send_message_to_receiver(void *m, void *msg){(void)m;free(msg);}
uint32_t ug_rand(void){return 0;}
long long unit_evaluate(const char *str, const char **endptr){(void)str;(void)endptr;return 0;}
int rtpenc_get_next_nal(const unsigned char *start, long len, const unsigned char **endptr){(void)start;(void)len;(void)endptr;return 0;}
int jpeg_get_rtp_hdr_data(const char *data, int len, void *hdr){(void)data;(void)len;(void)hdr;return 0;}
void remux_channel(char *out, const char *in, int bps, int in_len, int in_stream_channels, int out_stream_channels, int pos_in_stream, int pos_out_stream){(void)out;(void)in;(void)bps;(void)in_len;(void)in_stream_channels;(void)out_stream_channels;(void)pos_in_stream;(void)pos_out_stream;}
const char *get_audio_codec_name(int c){(void)c;return "";}
uint32_t get_audio_tag(int c){(void)c;return 0;}
bool pam_write(const char *filename, unsigned int width, unsigned int height, int depth, int maxval, const unsigned char *data, bool pnm){(void)filename;(void)width;(void)height;(void)depth;(void)maxval;(void)data;(void)pnm;return false;}
bool y4m_write(const char *filename, const void *info, const unsigned char *data){(void)filename;(void)info;(void)data;return false;}
bool rtp_is_ipv6(struct rtp *session){(void)session;return false;}
void *aligned_malloc(size_t size, size_t alignment){void *p=0;if(posix_memalign(&p,alignment,size))return 0;return p;}

/* audio_frame2 accessors (audio tx unused) */
int audio_frame2_get_bps(const void *f){(void)f;return 0;}
int audio_frame2_get_channel_count(const void *f){(void)f;return 0;}
int audio_frame2_get_codec(const void *f){(void)f;return 0;}
const char *audio_frame2_get_data_c(const void *f, int c){(void)f;(void)c;return 0;}
size_t audio_frame2_get_data_len(const void *f){(void)f;return 0;}
double audio_frame2_get_duration(const void *f){(void)f;return 0;}
struct fec_desc audio_frame2_get_fec_params(const void *f){(void)f;struct fec_desc d;memset(&d,0,sizeof d);return d;}
int audio_frame2_get_sample_rate(const void *f){(void)f;return 0;}
int64_t audio_frame2_get_timestamp(const void *f){(void)f;return -1;}

/* PT mapping: same switch over the reference's own PT_* enum values
 * (src/rtp/fec.cpp:182-204; fec.cpp itself needs the LDGM/RS stack) */
int fec_pt_from_fec_type(enum tx_media_type media_type, enum fec_type fec_type, int encrypted)
{
        if (media_type == TX_MEDIA_VIDEO) {
                switch (fec_type) {
                case FEC_NONE: return encrypted ? PT_ENCRYPT_VIDEO : PT_VIDEO;
                case FEC_LDGM: return encrypted ? PT_ENCRYPT_VIDEO_LDGM : PT_VIDEO_LDGM;
                case FEC_RS:   return encrypted ? PT_ENCRYPT_VIDEO_RS : PT_VIDEO_RS;
                default: break;
                }
        } else {
                switch (fec_type) {
                case FEC_NONE: return encrypted ? PT_ENCRYPT_AUDIO : PT_AUDIO;
                case FEC_RS:   return encrypted ? PT_ENCRYPT_AUDIO_RS : PT_AUDIO_RS;
                default: break;
                }
        }
        return -1;
}

/* ---- RTP capture shim ---- */
#define CAP_MAX_PKTS 8192
#define CAP_MAX_BYTES (256*1024*1024)
static unsigned char *cap_buf;
static size_t cap_used;
static int cap_npkts;
static int cap_hdr_len[CAP_MAX_PKTS];
static int cap_data_len[CAP_MAX_PKTS];
static int cap_pt[CAP_MAX_PKTS];
static int cap_m[CAP_MAX_PKTS];

void ref_cap_reset(void)
{
        if (!cap_buf) cap_buf = malloc(CAP_MAX_BYTES);
        cap_used = 0;
        cap_npkts = 0;
}
int ref_cap_count(void){return cap_npkts;}
int ref_cap_pkt(int i, unsigned char *out, int *hdr_len, int *data_len, int *pt, int *m)
{
        size_t off = 0;
        for (int j = 0; j < i; ++j) off += cap_hdr_len[j] + cap_data_len[j];
        memcpy(out, cap_buf + off, cap_hdr_len[i] + cap_data_len[i]);
        *hdr_len = cap_hdr_len[i];
        *data_len = cap_data_len[i];
        *pt = cap_pt[i];
        *m = cap_m[i];
        return cap_hdr_len[i] + cap_data_len[i];
}

uint32_t rtp_my_ssrc(struct rtp *session){(void)session;return 0x11223344u;}
bool rtp_has_receiver(struct rtp *session){(void)session;return true;}
void rtp_async_start(struct rtp *session, int nr_packets){(void)session;(void)nr_packets;}
void rtp_async_wait(struct rtp *session){(void)session;}
void rtp_send_ctrl(struct rtp *session, uint32_t ts, rtcp_app_callback cb, time_ns_t t){(void)session;(void)ts;(void)cb;(void)t;}
int rtp_send_data(struct rtp *session, uint32_t rtp_ts, char pt, int m, int cc,
                  const uint32_t *csrc, char *data, int data_len,
                  char *extn, uint16_t extn_len, uint16_t extn_type)
{
        (void)session;(void)rtp_ts;(void)cc;(void)csrc;(void)extn;(void)extn_len;(void)extn_type;
        if (cap_npkts >= CAP_MAX_PKTS) return -1;
        memcpy(cap_buf + cap_used, data, data_len);
        cap_hdr_len[cap_npkts] = 0;
        cap_data_len[cap_npkts] = data_len;
        cap_pt[cap_npkts] = pt; cap_m[cap_npkts] = m;
        cap_used += data_len; cap_npkts++;
        return data_len;
}
int rtp_send_data_hdr(struct rtp *session, uint32_t rtp_ts, char pt, int m, int cc,
                      const uint32_t *csrc, char *phdr, int phdr_len,
                      char *data, int data_len,
                      char *extn, uint16_t extn_len, uint16_t extn_type)
{
        (void)session;(void)rtp_ts;(void)cc;(void)csrc;(void)extn;(void)extn_len;(void)extn_type;
        if (cap_npkts >= CAP_MAX_PKTS) return -1;
        memcpy(cap_buf + cap_used, phdr, phdr_len);
        memcpy(cap_buf + cap_used + phdr_len, data, data_len);
        cap_hdr_len[cap_npkts] = phdr_len;
        cap_data_len[cap_npkts] = data_len;
        cap_pt[cap_npkts] = pt; cap_m[cap_npkts] = m;
        cap_used += phdr_len + data_len; cap_npkts++;
        return phdr_len + data_len;
}

/* ---- driver: one tx_send of a synthetic frame ---- */
#include "video_frame.h"

int ref_tx_send_video(unsigned mtu, const char *fec_cfg, long long bitrate,
                      int width, int height, uint32_t codec, double fps,
                      int interlacing, char *data, unsigned data_len,
                      int fec_type, unsigned k, unsigned m, unsigned c,
                      unsigned seed, unsigned symbol_size)
{
        struct tx *tx = tx_init(0, mtu, TX_MEDIA_VIDEO, fec_cfg, 0, bitrate);
        if (!tx) return -1;
        struct video_desc desc;
        memset(&desc, 0, sizeof desc);
        desc.width = width; desc.height = height;
        desc.color_spec = (codec_t) codec;
        desc.fps = fps;
        desc.interlacing = (enum interlacing_t) interlacing;
        desc.tile_count = 1;
        struct video_frame *f = vf_alloc_desc(desc);
        f->tiles[0].data = data;
        f->tiles[0].data_len = data_len;
        f->fec_params.type = (enum fec_type) fec_type;
        f->fec_params.k = k; f->fec_params.m = m; f->fec_params.c = c;
        f->fec_params.seed = seed; f->fec_params.symbol_size = symbol_size;
        ref_cap_reset();
        tx_send(tx, f, (struct rtp *) 0x1);
        vf_free(f);
        tx_done(tx);
        return cap_npkts;
}
"""

_SOURCES = [
    "src/transmit.c",
    "src/video_frame.c",
    "src/video_codec.c",
    "src/pixfmt_conv.c",
    "src/color_space.c",
    "src/tv.c",
]


def available() -> bool:
    return os.path.isdir(REF) and os.path.exists(os.path.join(REF, "src/transmit.c"))


@lru_cache(maxsize=1)
def _lib() -> ctypes.CDLL:
    os.makedirs(BUILD_DIR, exist_ok=True)
    stub_path = os.path.join(BUILD_DIR, "txstubs.c")
    with open(stub_path, "w") as f:
        f.write(_STUBS)
    so_path = os.path.join(BUILD_DIR, "reftx_full.so")
    srcs = [os.path.join(REF, s) for s in _SOURCES] + [stub_path]
    stamp = os.path.join(BUILD_DIR, "stamp")
    key = hashlib.sha256()
    for s in srcs:
        key.update(open(s, "rb").read())
    digest = key.hexdigest()
    if not (os.path.exists(so_path) and os.path.exists(stamp)
            and open(stamp).read() == digest):
        cmd = [
            "gcc", "-O2", "-fPIC", "-shared", "-D_GNU_SOURCE",
            f"-I{REF}/src", f"-I{REF}",
            "-o", so_path, *srcs, "-lm",
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        with open(stamp, "w") as f:
            f.write(digest)
    lib = ctypes.CDLL(so_path, mode=ctypes.RTLD_LOCAL)
    lib.ref_tx_send_video.restype = ctypes.c_int
    lib.ref_tx_send_video.argtypes = [
        ctypes.c_uint, ctypes.c_char_p, ctypes.c_longlong,
        ctypes.c_int, ctypes.c_int, ctypes.c_uint32, ctypes.c_double,
        ctypes.c_int, ctypes.c_char_p, ctypes.c_uint,
        ctypes.c_int, ctypes.c_uint, ctypes.c_uint, ctypes.c_uint,
        ctypes.c_uint, ctypes.c_uint]
    lib.ref_cap_pkt.restype = ctypes.c_int
    lib.ref_cap_pkt.argtypes = [
        ctypes.c_int, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    return lib


FEC_NONE, FEC_MULT, FEC_LDGM, FEC_RS = 0, 1, 2, 3


def tx_send_video(mtu: int, data: bytes, width: int, height: int,
                  codec: int, fps: float, interlacing: int = 0,
                  fec_type: int = FEC_NONE, k: int = 0, m: int = 0,
                  c: int = 0, seed: int = 0, symbol_size: int = 0,
                  fec_cfg: bytes | None = None, bitrate: int = 0):
    """Run the reference tx_send on one frame; returns a list of packets
    [(pt, marker, hdr bytes, payload bytes)] in send order."""
    lib = _lib()
    n = lib.ref_tx_send_video(mtu, fec_cfg, bitrate, width, height, codec,
                              fps, interlacing, data, len(data),
                              fec_type, k, m, c, seed, symbol_size)
    if n < 0:
        raise RuntimeError("reference tx_send failed")
    pkts = []
    buf = ctypes.create_string_buffer(mtu + 256)
    for i in range(n):
        hl = ctypes.c_int(0)
        dl = ctypes.c_int(0)
        pt = ctypes.c_int(0)
        mk = ctypes.c_int(0)
        tot = lib.ref_cap_pkt(i, buf, ctypes.byref(hl), ctypes.byref(dl),
                              ctypes.byref(pt), ctypes.byref(mk))
        raw = buf.raw[:tot]
        pkts.append((pt.value, mk.value, raw[:hl.value], raw[hl.value:]))
    return pkts
