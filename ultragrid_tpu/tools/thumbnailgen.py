"""thumbnailgen: JPEG thumbnails from an ipc_frame preview socket.

Counterpart of the reference's ``tools/thumbnailgen.cpp``: connects to the
``preview``/``unix_sock`` display's ipc_frame socket, receives RGB frames
(the preview display already pixel-count-downscales them), and writes JPEG
thumbnails.  Where the reference uses libjpeg, the frames here go through
this framework's own JPEG encoder (4:4:4 for RGB input, matching
gpujpeg's RGB policy).

Usage:
    python -m ultragrid_tpu.tools.thumbnailgen [socket_path] -o DIR [-n N]

then start a sender with ``-d preview`` (or ``-d unix_socket:path=...``).
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

import numpy as np


def write_thumbnail(w: int, h: int, rgb: bytes, path: str, quality: int = 75) -> None:
    """RGB24 bytes -> JPEG file via the framework encoder (PIL fallback)."""
    # the JPEG encoder needs width % 16 / height % 8; pad with edge pixels
    img = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
    pw = (w + 15) & ~15
    ph = (h + 7) & ~7
    if (pw, ph) != (w, h):
        img = np.pad(img, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    try:
        from ultragrid_tpu.ops.jpeg import JpegEncoder
        from ultragrid_tpu.types import Codec

        enc = JpegEncoder(pw, ph, in_codec=Codec.RGB, quality=quality)
        data = enc.encode(img.reshape(ph, pw * 3))
        with open(path, "wb") as f:
            f.write(bytes(data))
    except Exception:  # pragma: no cover - tiny geometries, no jax, ...
        from PIL import Image

        Image.frombytes("RGB", (w, h), rgb).save(path, quality=quality)


def main(argv=None) -> int:
    # host-side tool: thumbnails are tiny, and grabbing the (single-client)
    # TPU tunnel here would stall the sender feeding us — force CPU
    try:
        import jax

        jax.config.update("jax_platforms", os.environ.get("UGTPU_PLATFORM", "cpu"))
    except Exception:
        pass
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("path", nargs="?", default=os.path.join(
        tempfile.gettempdir(), "ug_preview_disp_unix"))
    p.add_argument("-o", "--out", default=".", help="output directory")
    p.add_argument("-n", type=int, default=1, help="thumbnails to write (0 = forever)")
    p.add_argument("-q", "--quality", type=int, default=75)
    args = p.parse_args(argv)

    from ultragrid_tpu.modules.ipc_display import IpcFrameReader
    from ultragrid_tpu.types import Codec

    os.makedirs(args.out, exist_ok=True)
    reader = IpcFrameReader(args.path)
    print(f"listening on {args.path} ...", file=sys.stderr)
    written = 0
    try:
        reader.accept(timeout=3600.0)
        while True:
            got = reader.read_frame(timeout=3600.0)
            if got is None:
                break
            w, h, color, data = got
            if color != Codec.RGB:
                print(f"skipping non-RGB frame ({color.name})", file=sys.stderr)
                continue
            fn = os.path.join(args.out, f"thumb_{written:06d}.jpg")
            write_thumbnail(w, h, data, fn, args.quality)
            print(fn)
            written += 1
            if args.n and written >= args.n:
                break
    finally:
        reader.close()
    return 0 if written else 1


if __name__ == "__main__":
    sys.exit(main())
