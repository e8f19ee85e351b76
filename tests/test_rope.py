"""RoPE: golden parity of the rotary math vs the reference helpers (pure
torch, importable offline) + the rope decoder path end-to-end."""

import math

import numpy as np
import torch

from tests.ref_utils import ref_path, stub_heavy_modules, t2n

ref_path()
stub_heavy_modules()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from imagefolder_tpu.models.vit import LatentDecoder  # noqa: E402
from imagefolder_tpu.ops import rope as R  # noqa: E402


def _ref_helpers():
    # exec only the rope helper functions from the vendored file (its module
    # imports pull timm.data etc., unavailable offline)
    src = open("/root/reference/tokenizer/tokenizer_image/dino_enc/"
               "vision_transformer.py").read()
    start = src.index("def init_1d_freqs")
    end = src.index("class Attention")
    ns = {"torch": torch, "math": math}
    exec(compile(src[start:end], "ref_rope", "exec"), ns)
    return ns


def test_rotary_math_matches_reference():
    ns = _ref_helpers()
    dim, end = 16, 9
    want_1d = ns["init_1d_freqs"](dim, end)
    got_1d = R.init_1d_freqs(dim, end)
    np.testing.assert_allclose(got_1d[..., 0], t2n(want_1d.real), rtol=1e-5)
    np.testing.assert_allclose(got_1d[..., 1], t2n(want_1d.imag), rtol=1e-5)

    tx_w, ty_w = ns["init_t_xy"](4, 4)
    tx, ty = R.init_t_xy(4, 4)
    np.testing.assert_array_equal(tx, t2n(tx_w))
    np.testing.assert_array_equal(ty, t2n(ty_w))

    # mixed cis + apply_rotary vs reference (freqs fixed, rotate=False)
    h, hd = 2, 16
    freqs_ref = ns["init_2d_freqs"](hd, h, theta=10.0, rotate=False)
    cis_ref = ns["compute_mixed_cis"](freqs_ref.view(2, -1),
                                      tx_w, ty_w, num_heads=h)
    cis = R.compute_mixed_cis(jnp.asarray(t2n(freqs_ref)), jnp.asarray(tx),
                              jnp.asarray(ty))
    np.testing.assert_allclose(np.asarray(cis[..., 0]), t2n(cis_ref.real),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cis[..., 1]), t2n(cis_ref.imag),
                               rtol=1e-5, atol=1e-6)

    xq = torch.randn(2, h, 16, hd, generator=torch.Generator().manual_seed(0))
    xk = torch.randn(2, h, 16, hd, generator=torch.Generator().manual_seed(1))
    oq, ok = ns["apply_rotary_emb"](xq.clone(), xk.clone(), freqs_cis=cis_ref)
    # mine takes (B, N, H, hd)
    gq = R.apply_rotary(jnp.asarray(t2n(xq.permute(0, 2, 1, 3))), cis)
    np.testing.assert_allclose(np.asarray(gq).transpose(0, 2, 1, 3), t2n(oq),
                               rtol=1e-4, atol=1e-5)


def test_rope_decoder_forward():
    dec = LatentDecoder(
        model_name="vit_small_patch14_dinov2.lvd142m", img_size=32,
        patch_size=16, num_latent_tokens=9, use_rope=True,
        abs_pos_embed=False)
    key = jax.random.PRNGKey(0)
    z = jax.random.normal(key, (2, 9, 384))
    variables = dec.init(key, z)
    out = dec.apply(variables, z)
    assert out.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()
    # rope params present, no latent pos-embed params
    p = variables["params"]
    assert "freqs" in p["model"]["block_0"]["attn"]
    assert "latent_pos_embed" not in p
