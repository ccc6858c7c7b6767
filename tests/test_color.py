"""Color-space coefficient tests.

Golden values were dumped from the reference's compute_color_coeffs()
(src/color_space.c) compiled directly; they lock bit-exactness without
requiring the reference tree at test time.
"""

import dataclasses

from ultragrid_tpu.ops.color import (
    KB_601,
    KB_709,
    KR_601,
    KR_709,
    Colorspace,
    compute_color_coeffs,
    get_color_coeffs,
    limit_hi_cbcr,
    limit_hi_y,
    limit_lo,
)
from ultragrid_tpu.ops.color import COMP_BASE

GOLDEN = {
    ("601", 0): (4899, 9617, 1868, -2765, -5427, 8192, 8191, -6860, -1331, 16384, 22970, -5638, -11700, 29032),
    ("601", 8): (4207, 8260, 1604, -2428, -4768, 7196, 7195, -6026, -1169, 19077, 26149, -6419, -13320, 33050),
    ("601", 10): (4195, 8235, 1599, -2421, -4754, 7175, 7174, -6008, -1166, 19133, 26226, -6438, -13359, 33148),
    ("601", 12): (4192, 8229, 1598, -2420, -4750, 7170, 7169, -6004, -1165, 19147, 26245, -6442, -13369, 33172),
    ("601", 16): (4191, 8228, 1598, -2419, -4749, 7168, 7167, -6002, -1165, 19152, 26251, -6444, -13372, 33179),
    ("709", 0): (3484, 11717, 1183, -1877, -6315, 8192, 8191, -7441, -750, 16384, 25800, -3069, -7671, 30402),
    ("709", 8): (2992, 10063, 1016, -1649, -5547, 7196, 7195, -6536, -659, 19077, 29371, -3494, -8733, 34610),
    ("709", 10): (2983, 10034, 1013, -1644, -5531, 7175, 7174, -6517, -657, 19133, 29457, -3504, -8758, 34712),
    ("709", 12): (2981, 10026, 1012, -1643, -5527, 7170, 7169, -6512, -656, 19147, 29479, -3507, -8765, 34737),
    ("709", 16): (2980, 10024, 1012, -1643, -5525, 7168, 7167, -6511, -656, 19152, 29486, -3507, -8767, 34745),
}


def test_coefficients_golden():
    for (cs, d), vals in GOLDEN.items():
        kr, kb = (KR_601, KB_601) if cs == "601" else (KR_709, KB_709)
        c = compute_color_coeffs(kr, kb, d)
        assert tuple(dataclasses.astuple(c)) == vals, (cs, d)


def test_default_is_709():
    assert get_color_coeffs(Colorspace.DFL, 8) == compute_color_coeffs(KR_709, KB_709, 8)


def test_color_coeff_range():
    """Mirror of the reference's misc_test_color_coeff_range (test/misc_test.c:47)."""
    for d in (8, 10, 12, 16):
        d_max = (1 << d) - 1
        max_diff = 1 << (d - 8)
        c = get_color_coeffs(Colorspace.DFL, d)

        def rgb_to_y(r, g, b):
            return r * c.y_r + g * c.y_g + b * c.y_b

        def rgb_to_cb(r, g, b):
            return r * c.cb_r + g * c.cb_g + b * c.cb_b

        def rgb_to_cr(r, g, b):
            return r * c.cr_r + g * c.cr_g + b * c.cr_b

        assert abs((rgb_to_y(0, 0, 0) >> COMP_BASE) + limit_lo(d)) - limit_lo(d) <= max_diff
        assert abs((rgb_to_y(d_max, d_max, d_max) >> COMP_BASE) + limit_lo(d) - limit_hi_y(d)) <= max_diff
        assert abs((rgb_to_cb(d_max, d_max, 0) >> COMP_BASE) + (1 << (d - 1)) - limit_lo(d)) <= max_diff
        assert abs((rgb_to_cb(0, 0, d_max) >> COMP_BASE) + (1 << (d - 1)) - limit_hi_cbcr(d)) <= max_diff
        assert abs((rgb_to_cr(0, d_max, d_max) >> COMP_BASE) + (1 << (d - 1)) - limit_lo(d)) <= max_diff
        assert abs((rgb_to_cr(d_max, 0, 0) >> COMP_BASE) + (1 << (d - 1)) - limit_hi_cbcr(d)) <= max_diff
