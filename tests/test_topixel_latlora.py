"""Goldens for the non-linear ToPixel heads (dino_enc/to_pixel.py:36-94) and
behavioral tests for lat_lora tuning (dinov2.py:68-79 — the upstream
LatentLoRALinear module is missing from the reference tree, so the latent-only
LoRA semantics are locked by behavior, and the forced attention mask by the
reference's mask construction)."""

import numpy as np
import torch

from tests.ref_utils import ref_path, t2n

ref_path()

# dino_enc/__init__ pulls timm; load to_pixel.py directly (pure torch+einops)
import importlib.util  # noqa: E402

_spec = importlib.util.spec_from_file_location(
    "ref_to_pixel",
    "/root/reference/tokenizer/tokenizer_image/dino_enc/to_pixel.py")
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
RefToPixel = _mod.ToPixel

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from imagefolder_tpu.models.vit import LatentEncoder, ToPixel  # noqa: E402

B, L, D, P, IMG, C = 2, 16, 24, 8, 32, 3  # 4x4 patches of 8px = 32px


def _forward(mode, params, x):
    head = ToPixel(img_size=IMG, patch_size=P, channels=C, mode=mode)
    return np.asarray(head.apply({"params": params}, jnp.asarray(x)))


def test_topixel_conv_golden():
    torch.manual_seed(0)
    ref = RefToPixel("conv", img_size=IMG, in_channels=C, in_dim=D, patch_size=P)
    x = np.random.default_rng(0).standard_normal((B, L, D)).astype(np.float32)
    ref_out = t2n(ref(torch.from_numpy(x)))  # NCHW
    params = {"deconv": {"kernel": jnp.asarray(t2n(ref.model[1].weight)),
                         "bias": jnp.asarray(t2n(ref.model[1].bias))}}
    ours = _forward("conv", params, x)
    np.testing.assert_allclose(ours, np.transpose(ref_out, (0, 2, 3, 1)),
                               atol=1e-5)


def test_topixel_siren_golden():
    # the reference's raw view(B, C, S, S) is only shape-consistent when
    # patch_size**2 == img_size (true for the shipped 256px/16 geometry);
    # use p=4, img=16 here
    p, img = 4, 16
    torch.manual_seed(0)
    ref = RefToPixel("siren", img_size=img, in_channels=C, in_dim=D, patch_size=p)
    x = np.random.default_rng(1).standard_normal(
        (B, (img // p) ** 2, D)).astype(np.float32)
    ref_out = t2n(ref(torch.from_numpy(x)))
    params = {
        "sine1": {"kernel": jnp.asarray(t2n(ref.model[0].linear.weight)).T,
                  "bias": jnp.asarray(t2n(ref.model[0].linear.bias))},
        "sine2": {"kernel": jnp.asarray(t2n(ref.model[1].linear.weight)).T,
                  "bias": jnp.asarray(t2n(ref.model[1].linear.bias))},
    }
    head = ToPixel(img_size=img, patch_size=p, channels=C, mode="siren")
    ours = np.asarray(head.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(ours, np.transpose(ref_out, (0, 2, 3, 1)),
                               atol=1e-5)


def test_topixel_linear_golden_and_identity():
    torch.manual_seed(0)
    ref = RefToPixel("linear", img_size=IMG, in_channels=C, in_dim=D, patch_size=P)
    x = np.random.default_rng(2).standard_normal((B, L, D)).astype(np.float32)
    ref_out = t2n(ref(torch.from_numpy(x)))
    params = {"proj": {"kernel": jnp.asarray(t2n(ref.model.weight)).T,
                       "bias": jnp.asarray(t2n(ref.model.bias))}}
    ours = _forward("linear", params, x)
    np.testing.assert_allclose(ours, np.transpose(ref_out, (0, 2, 3, 1)),
                               atol=1e-5)
    ours_id = _forward("identity", {}, x)
    np.testing.assert_allclose(ours_id, x)


def _tiny_encoder(**kw):
    return LatentEncoder(
        model_name="vit_small_patch14_dinov2.lvd142m", img_size=28,
        patch_size=14, num_latent_tokens=4, product_quant=1,
        abs_pos_embed=False, **kw)


def test_attn_mask_blocks_latent_leak_to_image_stream():
    """With use_attn_mask (dinov2.py:105-112), prefix+image tokens must not
    attend to latents: perturbing the latent-token embeddings cannot change
    anything upstream of the latent rows — so the latent outputs of layer-1+
    change ONLY through their own stream. Cross-check: without the mask,
    image rows see latents, so the full forward differs in image positions;
    with the mask the image-position hidden states are bit-identical."""
    enc = _tiny_encoder(use_attn_mask=True)
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (2, 28, 28, 3))
    variables = enc.init(key, img)

    def img_stream(latent_tokens_value, use_mask):
        e = _tiny_encoder(use_attn_mask=use_mask)
        v = jax.tree.map(lambda a: a, variables)
        v = {"params": dict(v["params"])}
        v["params"]["latent_tokens"] = latent_tokens_value
        # probe the full block-stack output at the image positions
        m = e.bind(v)
        x = m.model.patchify(img)
        x = m.model.pos_embed_tokens(x)
        z = jnp.broadcast_to(v["params"]["latent_tokens"], (2, 4, enc.embed_dim))
        z = z + v["params"]["latent_pos_embed"]
        seq = jnp.concatenate([x, z], axis=1)
        mask = None
        if use_mask:
            total = seq.shape[1]
            row = jnp.arange(total)[:, None]
            col = jnp.arange(total)[None, :]
            mask = jnp.where((row < total - 4) & (col >= total - 4),
                             -jnp.inf, 0.0)[None, None]
        out = m.model.run_blocks(seq, mask)
        return np.asarray(out[:, :-4])  # image+prefix positions

    z0 = variables["params"]["latent_tokens"]
    z1 = z0 + 1.0
    masked_a, masked_b = img_stream(z0, True), img_stream(z1, True)
    np.testing.assert_array_equal(masked_a, masked_b)
    unmasked_a, unmasked_b = img_stream(z0, False), img_stream(z1, False)
    # LayerScale init (1e-5) damps the leak, but unmasked it must be nonzero
    assert np.abs(unmasked_a - unmasked_b).max() > 0.0


def test_lat_lora_latent_only_delta():
    """lat_lora adapters: zero-init (lora_b=0) keeps the forward identical to
    'full'; a nonzero lora_b changes ONLY the latent outputs' dependence —
    image-token rows of every Dense get no delta (LatentLoRALinear
    semantics), and the optimizer trains only adapters + final norm."""
    from imagefolder_tpu.models.vit import LoRADense

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 10, 8))
    lora = LoRADense(12, lora_rank=2, latent_tokens=3)
    v = lora.init(key, x)
    base_only = LoRADense(12, lora_rank=0).apply(
        {"params": {"base": v["params"]["base"]}}, x)
    with_zero_b = lora.apply(v, x)
    np.testing.assert_allclose(np.asarray(with_zero_b), np.asarray(base_only),
                               atol=1e-6)
    v2 = jax.tree.map(lambda a: a, v)
    v2 = {"params": dict(v2["params"])}
    v2["params"]["lora_b"] = {"kernel": jnp.ones_like(
        v["params"]["lora_b"]["kernel"])}
    out = np.asarray(lora.apply(v2, x))
    base = np.asarray(base_only)
    assert np.abs(out[:, :7] - base[:, :7]).max() < 1e-6  # image rows: no delta
    assert np.abs(out[:, 7:] - base[:, 7:]).max() > 1e-3  # latent rows: delta

    # encoder-level: lat_lora forces the attention mask and builds adapters
    enc = _tiny_encoder(tuning_method="lat_lora", lora_rank=2)
    img = jax.random.uniform(key, (2, 28, 28, 3))
    variables = enc.init(key, img)
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    paths = {"/".join(str(getattr(k, "key", k)) for k, *_ in
                      [(p,) for p in path]) for path, _ in flat}
    assert any("lora_a" in p for p in paths)
    out = enc.apply(variables, img)
    assert out.shape == (2, 4, enc.embed_dim)

    # optimizer freezing: only adapters, final norm, and non-trunk params train
    from imagefolder_tpu.train.optim import tokenizer_frozen_predicate

    class Cfg:
        enc_tuning_method = "lat_lora"
        dec_tuning_method = "full"

    frozen = tokenizer_frozen_predicate(Cfg)
    assert not frozen("encoder/model/block_0/attn/qkv/lora_a/kernel")
    assert frozen("encoder/model/block_0/attn/qkv/base/kernel")
    assert not frozen("encoder/model/norm/scale")
    assert not frozen("encoder/latent_tokens")
