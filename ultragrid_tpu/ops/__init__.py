"""On-device compute ops: pixel formats, color space, compression, FEC.

These are the TPU-native replacements for the reference's native/GPU layers
(pixfmt_conv.c, color_space.c, to/from_planar.c, cuda_dxt, GPUJPEG-style JPEG,
ldgm/, rs.cpp).  Everything here is pure-functional JAX, jit-friendly, and
operates on whole frames (arrays), not lines.
"""
