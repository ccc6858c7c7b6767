"""Host-side utilities: logging, params, pattern generation, sync primitives."""
