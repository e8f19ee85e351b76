"""UViTBert MaskGIT variant: golden parity with the reference
(``RAR/maskgit.py:209-287``) + train/generate behavior."""

import importlib.util
import sys
import types

import numpy as np
import torch

from tests.ref_utils import make_stub, ref_path, t2n

ref_path()


def _load_ref_uvitbert():
    """Import the real reference UViTBert with its ``modeling.*`` imports
    and the absent ``omegaconf`` stubbed (config objects pass through)."""
    spec = importlib.util.spec_from_file_location(
        "ref_blocks", "/root/reference/RAR/modules/blocks.py")
    blocks = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(blocks)

    modeling = make_stub("modeling")
    modules = make_stub("modeling.modules")
    base = make_stub("modeling.modules.base_model",
                     BaseModel=torch.nn.Module)
    bm = make_stub("modeling.modules.blocks", UViTBlock=blocks.UViTBlock)
    sys.modules.update({
        "modeling": modeling, "modeling.modules": modules,
        "modeling.modules.base_model": base, "modeling.modules.blocks": bm,
    })
    if "omegaconf" not in sys.modules:
        oc = make_stub("omegaconf")

        class OmegaConf:  # config passthrough; reference only .create()s it
            @staticmethod
            def create(x):
                return x

            @staticmethod
            def to_container(x):
                return dict(x)

        oc.OmegaConf = OmegaConf
        sys.modules["omegaconf"] = oc
    spec = importlib.util.spec_from_file_location(
        "ref_maskgit", "/root/reference/RAR/maskgit.py")
    mg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mg)
    return mg.UViTBert


class _NS(dict):
    """Attribute-style config namespace the reference indexes into."""

    __getattr__ = dict.__getitem__

    def get(self, k, default=None):
        return dict.get(self, k, default)


HIDDEN, DEPTH, HEADS, INTER = 64, 4, 2, 256
SEQ, CODEBOOK, NCLASS = 16, 32, 10


def _ref_config():
    return _NS(model=_NS(
        vq_model=_NS(codebook_size=CODEBOOK),
        generator=_NS(condition_num_classes=NCLASS, image_seq_len=SEQ,
                      hidden_size=HIDDEN, num_hidden_layers=DEPTH,
                      num_attention_heads=HEADS, intermediate_size=INTER,
                      dropout=0.0, attn_drop=0.0)))


def test_uvit_maskgit_golden():
    UViTBert = _load_ref_uvitbert()
    torch.manual_seed(0)
    ref = UViTBert(_ref_config()).eval()

    import jax
    import jax.numpy as jnp

    from imagefolder_tpu.models.maskgit import MaskGIT, MaskGITConfig
    from imagefolder_tpu.utils.convert_torch import convert_maskgit_uvit

    cfg = MaskGITConfig(embed_dim=HIDDEN, depth=DEPTH, num_heads=HEADS,
                        mlp_ratio=INTER / HIDDEN, image_seq_len=SEQ,
                        codebook_size=CODEBOOK, condition_num_classes=NCLASS,
                        arch="uvit")
    mine = MaskGIT(cfg)
    params = convert_maskgit_uvit(ref.state_dict(), DEPTH)

    rng = np.random.default_rng(0)
    toks = rng.integers(0, CODEBOOK, (3, SEQ))
    # leave a few mask tokens in like training does
    toks[:, ::5] = CODEBOOK
    cond = rng.integers(0, NCLASS, (3,))

    with torch.no_grad():
        want = t2n(ref(torch.from_numpy(toks), torch.from_numpy(cond),
                       cond_drop_prob=0.0))
    got = jax.jit(lambda p, t, c: mine.apply(
        {"params": p}, t, c, cond_drop_prob=0.0))(
        params, jnp.asarray(toks), jnp.asarray(cond))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-3)


def test_uvit_maskgit_train_and_generate():
    """The uvit arch slots into the existing mask/loss/generate machinery."""
    import jax
    import jax.numpy as jnp
    import optax

    from imagefolder_tpu.models.maskgit import (
        MaskGIT, MaskGITConfig, mask_input_tokens, maskgit_generate, mlm_loss)

    cfg = MaskGITConfig(embed_dim=32, depth=2, num_heads=2, mlp_ratio=2.0,
                        image_seq_len=8, codebook_size=16,
                        condition_num_classes=4, arch="uvit")
    m = MaskGIT(cfg)
    key = jax.random.PRNGKey(0)
    toks = jax.random.randint(key, (4, 8), 0, 16)
    cond = jnp.arange(4) % 4
    params = m.init({"params": key}, toks, cond, rng=key)["params"]

    def loss_fn(p, k):
        masked, masks = mask_input_tokens(toks, k, cfg.mask_token_id)
        logits = m.apply({"params": p}, masked, cond, cond_drop_prob=0.1,
                         rng=k)
        return mlm_loss(logits, toks, masks)[0]

    tx = optax.adam(1e-3)
    opt = tx.init(params)
    l0 = None
    for i in range(10):
        k = jax.random.fold_in(key, i)
        l, g = jax.jit(jax.value_and_grad(loss_fn))(params, k)
        upd, opt = tx.update(g, opt, params)
        params = optax.apply_updates(params, upd)
        l0 = l0 if l0 is not None else l
    assert float(l) < float(l0)  # learning
    ids = maskgit_generate(m, params, cond, key, guidance_scale=2.0,
                           num_sample_steps=3)
    assert ids.shape == (4, 8)
    assert int(ids.max()) < 16 and int(ids.min()) >= 0
