"""Property-based tiling invariants (hypothesis).

The tiling math is the framework's highest-fidelity-risk pure code
(SURVEY.md §8 step 1); the example-based tests in test_tiling.py pin the
reference's exact behaviors, these pin the *invariants* over the whole
input space (for stride <= crop, the only regime the configs use —
stride > crop leaves inter-tile gaps by construction, in the reference
too, datasets/utils.py:86-212):

- exact: full coverage, no overrun past the scene bounds;
- under: fixed-size tiles only, no overrun;
- over: full coverage with fixed-size tiles (overrun allowed).
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from floodplanet_code_tpu.data.tiling import get_crop_slices

import pytest
pytestmark = pytest.mark.smoke  # sub-minute tier: pure functions, no jit-heavy fits


@st.composite
def scenes(draw):
    height = draw(st.integers(1, 120))
    width = draw(st.integers(1, 120))
    crop_h = draw(st.integers(1, 50))
    crop_w = draw(st.integers(1, 50))
    stride = draw(
        st.integers(1, max(1, min(crop_h, crop_w, height, width)))
    )
    return height, width, crop_h, crop_w, stride


def coverage(height, width, slices, clip=False):
    hit = np.zeros((height, width), bool)
    for h0, w0, h, w in slices:
        hE, wE = h0 + h, w0 + w
        if clip:
            hE, wE = min(hE, height), min(wE, width)
        hit[h0:hE, w0:wE] = True
    return hit


@given(scenes())
@settings(max_examples=200, deadline=None)
def test_exact_full_coverage_no_overrun(params):
    height, width, ch, cw, stride = params
    slices = get_crop_slices(height, width, ch, cw, stride, mode="exact")
    assert all(h0 + h <= height and w0 + w <= width for h0, w0, h, w in slices)
    assert coverage(height, width, slices).all()
    # Every tile is at most crop-size and non-empty.
    assert all(0 < h <= ch and 0 < w <= cw for _, _, h, w in slices)


@given(scenes())
@settings(max_examples=200, deadline=None)
def test_under_fixed_size_inside(params):
    height, width, ch, cw, stride = params
    slices = get_crop_slices(height, width, ch, cw, stride, mode="under")
    assert all((h, w) == (ch, cw) for _, _, h, w in slices)
    assert all(h0 + h <= height and w0 + w <= width for h0, w0, h, w in slices)


@given(scenes())
@settings(max_examples=200, deadline=None)
def test_over_fixed_size_covers(params):
    height, width, ch, cw, stride = params
    slices = get_crop_slices(height, width, ch, cw, stride, mode="over")
    assert all((h, w) == (ch, cw) for _, _, h, w in slices)
    assert coverage(height, width, slices, clip=True).all()
