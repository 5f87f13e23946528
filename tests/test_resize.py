"""Resize parity vs torch F.interpolate(mode='bilinear') — the exact op the
reference uses to downsample 256x256 maps to 64x64 (train_diffusion_paper.py:262)."""

import numpy as np
import pytest

from camels_diffusion_model_tpu.ops.resize import bilinear_resize
from camels_diffusion_model_tpu.data.pipeline import resize_maps_np

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((256, 256), (64, 64)), ((32, 32), (64, 64)), ((40, 24), (16, 16))],
)
def test_bilinear_matches_torch(in_hw, out_hw):
    rs = np.random.RandomState(0)
    x = rs.randn(3, *in_hw).astype(np.float32)
    want = (
        F.interpolate(
            torch.from_numpy(x).unsqueeze(1), size=out_hw, mode="bilinear"
        )
        .squeeze(1)
        .numpy()
    )
    got = np.asarray(bilinear_resize(x, *out_hw))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    got_np = resize_maps_np(x, out_hw[0]) if out_hw[0] == out_hw[1] else None
    if got_np is not None:
        np.testing.assert_allclose(got_np, want, rtol=1e-4, atol=1e-5)
