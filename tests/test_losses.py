"""Losses stack: golden parity where the reference is importable offline
(PatchGAN, GAN objectives), structural/behavioral tests elsewhere."""

import numpy as np
import pytest
import torch

from tests.ref_utils import conv_to_flax, nchw, nhwc, ref_path, t2n

ref_path()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from imagefolder_tpu.losses.diffaug import diff_aug  # noqa: E402
from imagefolder_tpu.losses.discriminators import (  # noqa: E402
    BatchNormLocal,
    DinoDisc,
    PatchGANDiscriminator,
    StyleGANDiscriminator,
)
from imagefolder_tpu.losses.gan import (  # noqa: E402
    LeCamState,
    adopt_weight,
    hinge_d_loss,
    hinge_gen_loss,
    lecam_reg,
    lecam_update,
    vanilla_d_loss,
)
from imagefolder_tpu.losses.lpips import LPIPS, convert_lpips_checkpoint  # noqa: E402


def test_gan_losses_match_reference_formulas():
    rr = torch.randn(16, generator=torch.Generator().manual_seed(0))
    ff = torch.randn(16, generator=torch.Generator().manual_seed(1))
    want_h = 0.5 * (torch.relu(1 - rr).mean() + torch.relu(1 + ff).mean())
    got_h = hinge_d_loss(jnp.asarray(rr.numpy()), jnp.asarray(ff.numpy()))
    np.testing.assert_allclose(float(got_h), float(want_h), rtol=1e-5)
    want_v = 0.5 * (torch.nn.functional.softplus(-rr).mean()
                    + torch.nn.functional.softplus(ff).mean())
    got_v = vanilla_d_loss(jnp.asarray(rr.numpy()), jnp.asarray(ff.numpy()))
    np.testing.assert_allclose(float(got_v), float(want_v), rtol=1e-5)
    np.testing.assert_allclose(
        float(hinge_gen_loss(jnp.asarray(ff.numpy()))), float(-ff.mean()), rtol=1e-5)


def test_adopt_weight_and_lecam():
    assert float(adopt_weight(0.5, 10, threshold=20)) == 0.0
    assert float(adopt_weight(0.5, 30, threshold=20)) == 0.5
    st = LeCamState.init()
    r = jnp.asarray([1.0, 2.0])
    f = jnp.asarray([-1.0, 0.0])
    st2 = lecam_update(st, r, f)
    np.testing.assert_allclose(float(st2.logits_real_ema), 1.5e-3, rtol=1e-5)
    assert float(lecam_reg(r, f, st2)) > 0


def test_patchgan_matches_reference():
    from tokenizer.tokenizer_image.discriminator_patchgan import (
        NLayerDiscriminator,
    )
    torch.manual_seed(0)
    ref = NLayerDiscriminator(input_nc=3, ndf=16, n_layers=3)
    ref.eval()
    sd = ref.state_dict()
    mine = PatchGANDiscriminator(ndf=16, n_layers=3)
    # reference sequence: conv0, lrelu, (conv,bn,lrelu)x3, conv_out
    # main indices: 0 conv, 2/5/8 convs, 3/6/9 bns, 11 conv_out
    params = {
        "conv0": conv_to_flax(ref.main[0]),
        "conv1": {"kernel": t2n(ref.main[2].weight).transpose(2, 3, 1, 0)},
        "bn1": {"scale": t2n(ref.main[3].weight), "bias": t2n(ref.main[3].bias)},
        "conv2": {"kernel": t2n(ref.main[5].weight).transpose(2, 3, 1, 0)},
        "bn2": {"scale": t2n(ref.main[6].weight), "bias": t2n(ref.main[6].bias)},
        "conv3": {"kernel": t2n(ref.main[8].weight).transpose(2, 3, 1, 0)},
        "bn3": {"scale": t2n(ref.main[9].weight), "bias": t2n(ref.main[9].bias)},
        "conv_out": conv_to_flax(ref.main[11]),
    }
    batch_stats = {
        f"bn{i}": {"mean": t2n(ref.main[j].running_mean),
                   "var": t2n(ref.main[j].running_var)}
        for i, j in ((1, 3), (2, 6), (3, 9))
    }
    x = torch.randn(2, 3, 64, 64, generator=torch.Generator().manual_seed(2))
    with torch.no_grad():
        want = ref(x)
    got = mine.apply({"params": params, "batch_stats": batch_stats},
                     jnp.asarray(nhwc(x.numpy())), train=False)
    np.testing.assert_allclose(nchw(got), t2n(want), rtol=1e-3, atol=1e-4)


def test_batchnorm_local_matches_reference():
    # reference BatchNormLocal (discriminator_dino.py:127-154) recomputed
    # manually in torch (the module itself imports torchvision — unavailable):
    # view(G, -1, C, L); normalize by mean/var over dims (1, 3); affine.
    x = torch.randn(8, 8, 10, generator=torch.Generator().manual_seed(3))  # (B,C,L)
    g = 2  # ceil(8/4)
    xg = x.view(g, -1, 8, 10)
    mean = xg.mean([1, 3], keepdim=True)
    var = xg.var([1, 3], keepdim=True, unbiased=False)
    w = torch.randn(8, generator=torch.Generator().manual_seed(4))
    b = torch.randn(8, generator=torch.Generator().manual_seed(5))
    want = (((xg - mean) / torch.sqrt(var + 1e-6)) * w[None, :, None]
            + b[None, :, None]).view(8, 8, 10)
    mine = BatchNormLocal(virtual_bs=4)
    got = mine.apply(
        {"params": {"scale": t2n(w), "bias": t2n(b)}},
        jnp.asarray(x.numpy().transpose(0, 2, 1)),  # (B,L,C)
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 2, 1), t2n(want), rtol=1e-4, atol=1e-5)


def test_dino_disc_shapes_and_grad():
    disc = DinoDisc(depth=2, key_depths=(0, 1))
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 224, 224, 3))
    variables = disc.init(key, x, train=False)
    assert "spectral" in variables
    logits, new_vars = disc.apply(variables, x, train=True, rng=key,
                                  mutable=["spectral"])
    assert logits.shape == (2, 3 * 196)
    # spectral u vectors updated
    leaves_before = jax.tree.leaves(variables["spectral"])
    leaves_after = jax.tree.leaves(new_vars["spectral"])
    assert any(not np.allclose(a, b) for a, b in zip(leaves_before, leaves_after))
    # generator-side gradient flows to the input image through frozen trunk
    g = jax.grad(lambda xx: jnp.mean(disc.apply(
        variables, xx, train=False, mutable=["spectral"])[0]))(x)
    assert float(jnp.max(jnp.abs(g))) > 0


def test_stylegan_disc_shape():
    disc = StyleGANDiscriminator(image_size=64)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 64, 64, 3))
    variables = disc.init(key, x)
    assert disc.apply(variables, x).shape == (2, 1)


def test_diffaug_properties():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, 32, 32, 3))
    y = diff_aug(x, key, prob=1.0, cutout=0.2)
    assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()
    y0 = diff_aug(x, key, prob=0.0)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(x))
    yb = diff_aug(x, key, prob=0.0, blur_schedule=0.5)
    assert not np.allclose(np.asarray(yb), np.asarray(x))


def test_lpips_basic_properties_and_converter():
    lp = LPIPS()
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 64, 64, 3)) * 0.1
    y = x + 0.05 * jax.random.normal(jax.random.PRNGKey(1), x.shape)
    variables = lp.init(key, x, y)
    d_same = lp.apply(variables, x, x)
    d_diff = lp.apply(variables, x, y)
    assert float(jnp.max(jnp.abs(d_same))) < 1e-6
    assert float(jnp.mean(d_diff)) != 0
    # converter: fabricate a taming-style sd and check shapes land
    import numpy as _np
    sd = {"net.slice1.0.weight": _np.zeros((64, 3, 3, 3), _np.float32),
          "net.slice1.0.bias": _np.zeros((64,), _np.float32),
          "lin0.model.1.weight": _np.ones((1, 64, 1, 1), _np.float32)}
    p = convert_lpips_checkpoint(sd)
    assert p["conv_0"]["kernel"].shape == (3, 3, 3, 64)
    assert p["lin_0"]["kernel"].shape == (1, 1, 64, 1)


def test_lpips_bf16_compute_close_to_fp32():
    """loss_dtype='bfloat16' (reference --mixed-precision default,
    xqgan_train.py:118,449) keeps the metric close to fp32: the VGG convs
    run bf16, the normalize/diff/head tail stays fp32."""
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (2, 64, 64, 3), minval=-1, maxval=1)
    y = jnp.clip(x + 0.1 * jax.random.normal(jax.random.PRNGKey(1), x.shape),
                 -1, 1)
    variables = LPIPS().init(key, x, y)
    d32 = np.asarray(LPIPS().apply(variables, x, y))
    d16 = np.asarray(LPIPS(dtype=jnp.bfloat16).apply(variables, x, y))
    assert d16.dtype == np.float32  # fp32 tail
    # random-init lin heads leave distances at the ~1e-5 scale where bf16
    # conv rounding dominates a pure relative check (observed rel ~0.2 at
    # |d32|~7e-6): gate with an abs+rel mix sized to that scale instead
    # (converted VGG weights would put distances at O(1), unavailable here)
    err = np.abs(d16 - d32)
    assert (err < 5e-6 + 0.05 * np.abs(d32)).all(), (d16, d32)
    # identical-pair still ~0 (normalized features cancel exactly)
    same = np.asarray(LPIPS(dtype=jnp.bfloat16).apply(variables, x, x))
    assert np.abs(same).max() < 1e-4


def test_dinodisc_bf16_trunk_close_to_fp32():
    from imagefolder_tpu.losses.discriminators import DinoDisc

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (2, 32, 32, 3), minval=-1, maxval=1)
    variables = DinoDisc(depth=2).init(key, x, train=False)
    l32 = np.asarray(DinoDisc(depth=2).apply(variables, x, train=False))
    l16 = np.asarray(
        DinoDisc(depth=2, dtype=jnp.bfloat16).apply(variables, x, train=False))
    assert l16.dtype == np.float32
    # same param tree (dtype is compute-only), logits close
    scale = np.abs(l32).mean() + 1e-6
    assert (np.abs(l16 - l32) / scale).mean() < 0.1


def test_diffaug_golden_vs_reference():
    """Translation/color/cutout math vs the reference DiffAug.aug
    (diffaug.py:69-121) with shared uniforms, and the warm-up blur
    (diffaug.py:46-67) which is deterministic."""
    from tokenizer.tokenizer_image.diffaug import DiffAug

    from imagefolder_tpu.losses.diffaug import (
        color_with_u,
        cutout_with_u,
        translate_with_u,
        warmup_blur,
    )

    rng = np.random.default_rng(0)
    B, H, W = 4, 32, 32
    x = rng.standard_normal((B, 3, H, W)).astype(np.float32)
    rand01 = rng.random((7, B, 1, 1)).astype(np.float32)

    # feed the reference the exact switch + rand01 draws
    draws = [torch.zeros(3), torch.from_numpy(rand01)]
    orig_rand = torch.rand

    def fake_rand(*shape, **kw):
        return draws.pop(0)

    aug = DiffAug(prob=1.0, cutout=0.2)
    torch.rand = fake_rand
    try:
        ref_out = aug.aug(torch.from_numpy(x.copy()))
    finally:
        torch.rand = orig_rand
    ref_out = nhwc(t2n(ref_out))

    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    u = jnp.asarray(rand01)
    y = translate_with_u(xj, u[0], u[1])
    y = color_with_u(y, u[2][..., None], u[3][..., None], u[4][..., None])
    y = cutout_with_u(y, u[5], u[6])
    np.testing.assert_allclose(np.asarray(y), ref_out, atol=1e-5)

    # warm-up blur (deterministic given the schedule)
    aug2 = DiffAug(prob=0.0)
    ref_blur = nhwc(t2n(aug2.aug(torch.from_numpy(x.copy()),
                                 warmup_blur_schedule=0.5)))
    ours_blur = np.asarray(warmup_blur(xj, 0.5))
    np.testing.assert_allclose(ours_blur, ref_blur, atol=1e-5)


def test_clip_loss_golden():
    """clip_loss / siglip_loss vs reference cliploss.ClipLoss/SigLipLoss
    (world_size=1: the grad-carrying all_gather is the identity; under pjit
    the global batch IS the gathered batch)."""
    import torch

    from tests.ref_utils import ref_path

    ref_path()
    from tokenizer.tokenizer_image.cliploss import ClipLoss as RefClip
    from tokenizer.tokenizer_image.cliploss import SigLipLoss as RefSigLip

    from imagefolder_tpu.losses.clip_loss import clip_loss, siglip_loss

    g = torch.Generator().manual_seed(0)
    a = torch.nn.functional.normalize(torch.randn(6, 16, generator=g), dim=-1)
    b = torch.nn.functional.normalize(torch.randn(6, 16, generator=g), dim=-1)
    scale = 31.7

    want = float(RefClip()(a, b, torch.tensor(scale)))
    got = float(clip_loss(jnp.asarray(a.numpy()), jnp.asarray(b.numpy()),
                          scale))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    want_s = float(RefSigLip()(a, b, torch.tensor(scale),
                               torch.tensor(-5.0)))
    got_s = float(siglip_loss(jnp.asarray(a.numpy()), jnp.asarray(b.numpy()),
                              scale, logit_bias=-5.0))
    np.testing.assert_allclose(got_s, want_s, rtol=1e-5)
