"""convert: pixel-format conversion CLI (ref: tools/convert.c).

Usage: ``python -m ultragrid_tpu.tools.convert WxH IN_CODEC in.raw OUT_CODEC out.raw``
"""

from __future__ import annotations

import sys

import numpy as np

from ultragrid_tpu.ops import pixfmt
from ultragrid_tpu.types import Codec, get_codec_from_name, vc_get_linesize


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 5:
        print(__doc__, file=sys.stderr)
        return 1
    size, in_name, in_path, out_name, out_path = argv
    w, _, h = size.partition("x")
    width, height = int(w), int(h)
    in_codec = get_codec_from_name(in_name)
    out_codec = get_codec_from_name(out_name)
    if Codec.NONE in (in_codec, out_codec):
        print("unknown codec", file=sys.stderr)
        return 1
    ls = vc_get_linesize(width, in_codec)
    data = np.fromfile(in_path, dtype=np.uint8)
    frames = data.size // (ls * height)
    if frames == 0:
        print("input too small", file=sys.stderr)
        return 1
    out_ls = vc_get_linesize(width, out_codec)
    with open(out_path, "wb") as f:
        for i in range(frames):
            frame = data[i * ls * height : (i + 1) * ls * height].reshape(height, ls)
            out = np.asarray(pixfmt.convert_frame(frame, width, in_codec, out_codec))
            f.write(out.tobytes())
    print(f"converted {frames} frame(s) {in_name} -> {out_name} ({out_ls * height} B/frame)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
