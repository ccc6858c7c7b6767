"""--capabilities: machine-readable module/device inventory.

ref: src/host.cpp capabilities printing — the Qt GUI spawns ``uv
--capabilities`` and parses the JSON to populate its device/codec pickers.
"""

from __future__ import annotations

import json
from typing import Any, Dict

from ultragrid_tpu.modules.registry import LibraryClass, list_modules


def get_capabilities() -> Dict[str, Any]:
    import ultragrid_tpu
    from ultragrid_tpu.types import CODEC_INFO, Codec

    caps: Dict[str, Any] = {
        "version": ultragrid_tpu.__version__,
        "backend": "jax-tpu",
    }
    for cls in LibraryClass:
        mods = list_modules(cls)
        if mods:
            caps[cls.value] = mods
    caps["codecs"] = [
        info.name for c, info in CODEC_INFO.items() if c != Codec.NONE
    ]
    from ultragrid_tpu.ops.pixfmt import conversion_pairs

    caps["conversions"] = [
        f"{a.name}->{b.name}" for a, b in conversion_pairs()
    ]
    try:
        import jax

        caps["devices"] = [str(d) for d in jax.devices()]
    except Exception:  # noqa: BLE001
        caps["devices"] = []
    return caps


def print_capabilities() -> None:
    print(json.dumps(get_capabilities(), indent=2))
