"""Audio subsystem: frames, codecs, capture/playback, resampling, filters.

Host-side analogue of the reference's src/audio/ (22.7 kLoC): audio rates are
tiny next to video, so numpy on host is the right tool — the structure
(codecs keyed by wire tags, per-channel frames, filter chains) mirrors the
reference for interoperability.
"""

from ultragrid_tpu.audio.types import AudioDesc, AudioFrame  # noqa: F401
