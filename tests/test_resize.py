"""Golden tests: resize ops must match torch F.interpolate exactly.

The reference quantizer pipeline depends on torch's 'area' (downsample to
scale pn), 'bicubic' (upsample code maps), and 'nearest' (CNN decoder x2)
semantics; parity here is a precondition for bit-identical code indices."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from imagefolder_tpu.ops import resize

# (in_size, out_size) pairs exercised by v_patch_nums [1,1,2,3,3,4,5,6,8,11] & [1..16]
SIZES = [(16, 1), (16, 2), (16, 5), (16, 13), (16, 16), (11, 1), (11, 3),
         (11, 8), (1, 16), (2, 16), (3, 11), (5, 11), (8, 11), (13, 16), (8, 16)]


def _torch_resize(x_nchw, size, mode):
    return F.interpolate(torch.from_numpy(x_nchw), size=size, mode=mode).numpy()


@pytest.mark.parametrize("in_s,out_s", SIZES)
@pytest.mark.parametrize("mode", ["area", "bicubic"])
def test_matches_torch(in_s, out_s, mode):
    if mode == "area" and out_s > in_s:
        return  # torch area upsample degenerates; reference never does this
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 7, in_s, in_s)).astype(np.float32)  # NCHW
    want = _torch_resize(x, (out_s, out_s), mode)
    got = np.asarray(resize(x.transpose(0, 2, 3, 1), (out_s, out_s), mode))
    # torch computes its interpolation weights in fp32 (with op-order noise
    # ~1e-6); we compute them in float64 then cast. atol=1e-5 is far below any
    # codebook-distance gap, preserving argmin/index parity.
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("in_s,out_s", [(8, 16), (16, 32), (5, 10)])
def test_nearest_matches_torch(in_s, out_s):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, in_s, in_s)).astype(np.float32)
    want = _torch_resize(x, (out_s, out_s), "nearest")
    got = np.asarray(resize(x.transpose(0, 2, 3, 1), (out_s, out_s), "nearest"))
    np.testing.assert_array_equal(got.transpose(0, 3, 1, 2), want)


def test_identity_shortcircuit():
    x = np.ones((1, 4, 4, 2), np.float32)
    assert resize(x, (4, 4), "bicubic") is x


def test_rectangular():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 5, 9, 11, 4)).astype(np.float32)  # extra leading dim
    want = _torch_resize(
        x.reshape(5, 9, 11, 4).transpose(0, 3, 1, 2), (6, 7), "bicubic"
    )
    got = np.asarray(resize(x, (6, 7), "bicubic")).reshape(5, 6, 7, 4)
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, rtol=2e-6, atol=2e-6)
