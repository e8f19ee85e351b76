"""End-to-end tokenizer assembly tests (shapes, jit-ability, API contracts).

Numerical parity of the inner pieces is covered by test_quantize/test_cnn;
here we exercise the composed VQModel on small configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagefolder_tpu.models.tokenizer import ModelArgs, VQModel

CNN_ARGS = dict(
    codebook_size=64,
    codebook_embed_dim=8,
    encoder_ch_mult=(1, 2),
    decoder_ch_mult=(1, 2),
    z_channels=32,
    enc_type="cnn",
    dec_type="cnn",
    semantic_guide="none",
    detail_guide="none",
    num_latent_tokens=256,  # 32px/f2 -> 16x16 grid
    image_size=32,
)

VIT_ARGS = dict(
    codebook_size=64,
    codebook_embed_dim=8,
    enc_type="dinov2",
    dec_type="dinov2",
    encoder_model="vit_small_patch14_dinov2.lvd142m",
    decoder_model="vit_small_patch14_dinov2.lvd142m",
    semantic_guide="none",
    detail_guide="none",
    num_latent_tokens=9,
    abs_pos_embed=True,
    image_size=32,  # 2x2 patches @ p16
)


def _build(args, pns, **extra):
    cfg = ModelArgs(v_patch_nums=pns, **{**args, **extra})
    model = VQModel(cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, cfg.image_size, cfg.image_size, 3))
    variables = model.init(key, x, train=False)
    return model, variables, x


def test_cnn_singlescale_forward_and_apis():
    model, variables, x = _build(CNN_ARGS, (16,))
    out = jax.jit(lambda v, xx: model.apply(v, xx, train=False))(variables, x)
    assert out.dec.shape == x.shape
    assert out.hits_PSV.shape == (1, 1, 64)
    rec = model.apply(variables, x, method=VQModel.img_to_reconstructed_img)
    assert rec.shape == x.shape and float(jnp.max(jnp.abs(rec))) <= 1.0
    toks = model.apply(variables, x, method=VQModel.encode_to_tokens)
    assert toks.shape == (2, 256)
    img = model.apply(variables, toks, method=VQModel.decode_tokens)
    assert img.shape == x.shape


def test_cnn_multiscale_var_pipeline():
    pns = (1, 2, 3, 4, 8, 16)
    model, variables, x = _build(CNN_ARGS, pns)
    idx = model.apply(variables, x, method=VQModel.img_to_idxBl)
    assert len(idx) == 1 and [i.shape[1] for i in idx[0]] == [p * p for p in pns]
    var_in = model.apply(variables, idx, method=VQModel.idxBl_to_var_input)
    L = sum(p * p for p in pns)
    assert var_in.shape == (2, L - 1, 8)
    # AR stage roundtrip equals greedy encode
    f_hat = jnp.zeros((2, 16, 16, 8))
    for si, pn in enumerate(pns):
        h = model.apply(variables, 0, idx[0][si],
                        method=VQModel.embed_branch).reshape(2, pn, pn, 8)
        f_hat, _ = model.apply(variables, si, len(pns), f_hat, h,
                               method=VQModel.get_next_autoregressive_input)
    img = model.apply(variables, f_hat, method=VQModel.fhat_to_img)
    want = model.apply(variables, x, method=VQModel.img_to_reconstructed_img)
    np.testing.assert_allclose(np.asarray(img), np.asarray(want), atol=2e-5)


def test_vit_pq2_forward():
    model, variables, x = _build(VIT_ARGS, (1, 2, 3), product_quant=2,
                                 codebook_drop=0.5, start_drop=1)
    rng = jax.random.PRNGKey(1)
    out = jax.jit(
        lambda v, xx, r: model.apply(v, xx, train=True, rng=r, epoch=3)
    )(variables, x, rng)
    assert out.dec.shape == x.shape
    assert out.hits_PSV.shape == (2, 3, 64)
    assert np.isfinite(float(out.vq_loss + out.commit_loss + out.dependency_loss))
    idx = model.apply(variables, x, method=VQModel.img_to_idxBl)
    assert len(idx) == 2
    var_in = model.apply(variables, idx, method=VQModel.idxBl_to_var_input)
    assert var_in.shape == (2, 1 + 4 + 9 - 1, 16)


def test_robusttok_perturbation_changes_only_first_samples():
    model, variables, x = _build(CNN_ARGS, (16,), perturb_delta_max=8)
    rng = jax.random.PRNGKey(2)
    out_p = model.apply(variables, x, train=True, rng=rng, alpha=1.0, beta=0.5)
    out_np = model.apply(variables, x, train=True, rng=rng, alpha=0.0, beta=0.0)
    # batch half 2: beta=0.5 of B=2 -> first 1 sample perturbed
    d0 = np.abs(np.asarray(out_p.dec[0] - out_np.dec[0])).max()
    d1 = np.abs(np.asarray(out_p.dec[1] - out_np.dec[1])).max()
    assert d1 < 1e-5  # untouched sample identical
    # losses identical (perturbation applied after vq/commit)
    np.testing.assert_allclose(float(out_p.vq_loss), float(out_np.vq_loss), rtol=1e-6)


def test_lfq_tokenizer_builds():
    model, variables, x = _build(CNN_ARGS, (1, 2, 16), lfq=True,
                                 codebook_embed_dim=6, codebook_size=64,
                                 entropy_loss_ratio=0.1)
    out = model.apply(variables, x, train=False)
    assert np.isfinite(float(out.entropy_loss))
