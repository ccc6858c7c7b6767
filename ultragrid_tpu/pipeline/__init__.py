"""Pipeline orchestration: capture loop, compress driver, send/receive paths."""
