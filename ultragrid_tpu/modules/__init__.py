"""Pluggable module runtime: registry, module tree, messaging.

TPU-native analogue of the reference's lib_common/module/messaging layer
(ref: src/lib_common.{h,cpp}, src/module.{h,c}, src/messaging.{h,cpp}).
"""

from ultragrid_tpu.modules.registry import (  # noqa: F401
    LibraryClass,
    register_module,
    load_library,
    list_modules,
)

# import built-in modules so they self-register (ref: constructor-time
# REGISTER_MODULE, src/lib_common.h:124-143)
import ultragrid_tpu.modules.video_capture  # noqa: E402,F401
import ultragrid_tpu.modules.video_display  # noqa: E402,F401
import ultragrid_tpu.modules.video_compress  # noqa: E402,F401
import ultragrid_tpu.modules.video_decompress  # noqa: E402,F401
import ultragrid_tpu.modules.file_io  # noqa: E402,F401
import ultragrid_tpu.modules.filters  # noqa: E402,F401
import ultragrid_tpu.modules.lavc  # noqa: E402,F401
import ultragrid_tpu.modules.rtsp_capture  # noqa: E402,F401
import ultragrid_tpu.modules.ipc_display  # noqa: E402,F401
import ultragrid_tpu.modules.v4l2_capture  # noqa: E402,F401
import ultragrid_tpu.modules.screen_capture  # noqa: E402,F401
import ultragrid_tpu.modules.x11_display  # noqa: E402,F401
import ultragrid_tpu.modules.gl_display  # noqa: E402,F401
import ultragrid_tpu.modules.drm_display  # noqa: E402,F401
import ultragrid_tpu.modules.hw_stubs  # noqa: E402,F401
import ultragrid_tpu.modules.extra_displays  # noqa: E402,F401
import ultragrid_tpu.modules.ug_input  # noqa: E402,F401
import ultragrid_tpu.modules.stitch  # noqa: E402,F401
import ultragrid_tpu.utils.export  # noqa: E402,F401  (registers the 'import' capture device)
# audio devices register too, so --list-modules / --capabilities see them.
# Guarded: when python's entry import IS ultragrid_tpu.audio.capture, that
# module triggers this package __init__ mid-definition (registry import) and
# these would cycle; audio/capture.py end-imports its siblings instead.
try:
    import ultragrid_tpu.audio.capture  # noqa: E402,F401
    import ultragrid_tpu.audio.playback  # noqa: E402,F401
    import ultragrid_tpu.audio.aes67  # noqa: E402,F401
except ImportError:  # circular entry via audio.capture; see above
    pass
