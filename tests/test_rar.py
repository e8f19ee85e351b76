"""RAR generator: golden parity with the reference + KV-cache decode
consistency + generation."""

import sys
import types

import numpy as np
import torch
import torch.nn as tnn

from tests.ref_utils import make_stub, ref_path, t2n

ref_path()


def _stub_rar_deps():
    class TorchMlp(tnn.Module):
        """timm.layers.Mlp equivalent (fc1 -> GELU -> drop -> fc2 -> drop)."""

        def __init__(self, in_features, hidden_features, act_layer=tnn.GELU,
                     drop=0.0):
            super().__init__()
            self.fc1 = tnn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.drop1 = tnn.Dropout(drop)
            self.fc2 = tnn.Linear(hidden_features, in_features)
            self.drop2 = tnn.Dropout(drop)

        def forward(self, x):
            return self.drop2(self.fc2(self.drop1(self.act(self.fc1(x)))))

    make_stub("timm")
    m = make_stub("timm.layers", Mlp=TorchMlp)
    sys.modules["timm.layers"] = m
    rm = make_stub("RAR.modules", BaseModel=tnn.Module)
    sys.modules["RAR.modules"] = rm


_stub_rar_deps()

from RAR.rar import RAR as RefRAR  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from imagefolder_tpu.models.rar import (  # noqa: E402
    RAR,
    RARConfig,
    ar_loss,
    rar_generate,
)
from imagefolder_tpu.utils.convert_torch import convert_rar  # noqa: E402


class _NS(dict):
    __getattr__ = dict.__getitem__

    def get(self, k, default=None):
        return dict.get(self, k, default)


def _ref_config(d=64, depth=2, heads=2, seq=16, vocab=32, nclass=10):
    return _NS(model=_NS(
        generator=_NS(hidden_size=d, num_hidden_layers=depth,
                      num_attention_heads=heads, intermediate_size=d * 4,
                      image_seq_len=seq, condition_num_classes=nclass,
                      dropout=0.0, attn_drop=0.0),
        vq_model=_NS(codebook_size=vocab),
    ))


def _models(seq=16):
    torch.manual_seed(0)
    ref = RefRAR(_ref_config(seq=seq))
    ref.eval()
    cfg = RARConfig(embed_dim=64, depth=2, num_heads=2, mlp_ratio=4.0,
                    image_seq_len=seq, codebook_size=32,
                    condition_num_classes=10, dropout=0.0, attn_dropout=0.0)
    mine = RAR(cfg)
    params = convert_rar(ref.state_dict(), depth=2)
    return ref, mine, params, cfg


def test_rar_forward_matches_reference():
    ref, mine, params, cfg = _models()
    ids = torch.randint(0, 32, (2, 16), generator=torch.Generator().manual_seed(1))
    cond = torch.tensor([3, 7]) + 32 + 1  # preprocessed condition ids
    with torch.no_grad():
        want, want_labels = ref.forward_fn(ids.clone(), cond,
                                           return_labels=True, orders=None)
    got, labels = mine.apply({"params": params}, jnp.asarray(ids.numpy()),
                             jnp.asarray(cond.numpy()))
    np.testing.assert_array_equal(np.asarray(labels), t2n(want_labels))
    np.testing.assert_allclose(np.asarray(got), t2n(want), rtol=2e-4, atol=2e-4)


def test_rar_shuffled_orders_match_reference():
    ref, mine, params, cfg = _models()
    ids = torch.randint(0, 32, (2, 16), generator=torch.Generator().manual_seed(2))
    cond = torch.tensor([1, 2]) + 33
    orders = torch.stack([torch.randperm(16, generator=torch.Generator().manual_seed(5)),
                          torch.arange(16)])
    with torch.no_grad():
        want, want_labels = ref.forward_fn(ids.clone(), cond, True,
                                           orders=orders.clone())
    got, labels = mine.apply({"params": params}, jnp.asarray(ids.numpy()),
                             jnp.asarray(cond.numpy()),
                             orders=jnp.asarray(orders.numpy()))
    np.testing.assert_array_equal(np.asarray(labels), t2n(want_labels))
    np.testing.assert_allclose(np.asarray(got), t2n(want), rtol=2e-4, atol=2e-4)


def test_rar_kv_decode_matches_training_forward():
    """Cached decode logits at each step must equal the training-forward
    logits at the same position (raster order)."""
    _, mine, params, cfg = _models(seq=8)
    key = jax.random.PRNGKey(0)
    ids = jax.random.randint(key, (2, 8), 0, 32)
    cond = jnp.asarray([34, 40])
    full, _ = mine.apply({"params": params}, ids, cond)

    lmax = 10
    hd = cfg.embed_dim // cfg.num_heads
    caches = [(jnp.zeros((2, lmax, cfg.num_heads, hd)),
               jnp.zeros((2, lmax, cfg.num_heads, hd))) for _ in range(2)]
    x0, ct0 = mine.apply({"params": params}, cond, method=RAR.embed_prefill)
    logits, caches = mine.apply({"params": params}, x0, ct0, caches, 0,
                                method=RAR.decode_step)
    outs = [logits[:, -1:]]
    for i in range(7):
        x = mine.apply({"params": params}, ids[:, i], i,
                       method=RAR.embed_decode_token)
        ct = mine.apply({"params": params}, cond, i,
                        method=RAR.decode_cond_token)
        logits, caches = mine.apply({"params": params}, x, ct, caches, i + 2,
                                    method=RAR.decode_step)
        outs.append(logits)
    staged = jnp.concatenate(outs, axis=1)  # positions [cond, tok_0..tok_6]
    np.testing.assert_allclose(np.asarray(staged), np.asarray(full[:, :8]),
                               rtol=2e-4, atol=2e-4)


def test_rar_generate_and_loss():
    _, mine, params, cfg = _models(seq=8)
    cond = jnp.asarray([0, 5])
    ids = rar_generate(mine, params, cond, jax.random.PRNGKey(0),
                       guidance_scale=4.0, randomize_temperature=1.0,
                       guidance_scale_pow=2.5)
    assert ids.shape == (2, 8)
    assert int(ids.min()) >= 0 and int(ids.max()) < 32
    # no-CFG path
    ids2 = rar_generate(mine, params, cond, jax.random.PRNGKey(1),
                        guidance_scale=0.0, randomize_temperature=1.0,
                        guidance_scale_pow=1.0)
    assert ids2.shape == (2, 8)
    logits, labels = mine.apply(
        {"params": params}, ids, cond + 33)
    loss, acc = ar_loss(logits, labels)
    assert np.isfinite(float(loss)) and 0 <= float(acc) <= 1


def test_rar_generate_chunked_cache_invariant():
    """Chunked KV-cache growth (decode_chunk) is exact: -inf-masked padded
    positions contribute nothing, so the decode trajectory matches the
    single full-length-cache loop. Near-argmax temperature makes the
    token stream deterministic for the comparison."""
    _, mine, params, cfg = _models(seq=8)
    cond = jnp.asarray([0, 5])
    kw = dict(guidance_scale=4.0, randomize_temperature=1e-4,
              guidance_scale_pow=2.5)
    ids_full = rar_generate(mine, params, cond, jax.random.PRNGKey(0),
                            decode_chunk=None, **kw)
    ids_chunk = rar_generate(mine, params, cond, jax.random.PRNGKey(0),
                             decode_chunk=4, **kw)
    np.testing.assert_array_equal(np.asarray(ids_full),
                                  np.asarray(ids_chunk))


def test_ema_decay_schedule_golden():
    """Decay trajectory + EMA values vs the reference open-muse EMAModel
    (RAR/modules/ema_model.py:18-126), both the default (1+s)/(10+s) ramp
    and the power-law warmup, including update_after_step gating."""
    # RAR.modules is stubbed above (its __init__ pulls heavy deps); load the
    # pure-torch ema_model.py directly from the reference tree
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_ema_model", "/root/reference/RAR/modules/ema_model.py")
    ref_ema_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_ema_mod)
    RefEMA = ref_ema_mod.EMAModel

    from imagefolder_tpu.train.optim import ema_decay_schedule, ema_update

    for kwargs in (
        dict(decay=0.999),
        dict(decay=0.9999, update_after_step=5),
        dict(decay=0.999, use_ema_warmup=True, inv_gamma=1.0, power=2.0 / 3.0),
        dict(decay=0.9999, use_ema_warmup=True, inv_gamma=3.0, power=0.75,
             min_decay=0.1),
    ):
        p = torch.nn.Parameter(torch.ones(4))
        ref = RefEMA([p], **kwargs)
        ours_ema = jnp.ones((4,))
        for t in range(40):
            with torch.no_grad():
                p.copy_(torch.full((4,), float(t)))
            ref.step([p])  # increments optimization_step to t+1 internally
            ref_decay = ref.cur_decay_value
            our_decay = float(ema_decay_schedule(
                jnp.asarray(t + 1),
                decay=kwargs.get("decay", 0.9999),
                min_decay=kwargs.get("min_decay", 0.0),
                update_after_step=kwargs.get("update_after_step", 0),
                use_ema_warmup=kwargs.get("use_ema_warmup", False),
                inv_gamma=kwargs.get("inv_gamma", 1.0),
                power=kwargs.get("power", 2.0 / 3.0)))
            assert abs(ref_decay - our_decay) < 1e-6, (kwargs, t, ref_decay,
                                                       our_decay)
            ours_ema = ema_update(ours_ema, jnp.full((4,), float(t)),
                                  our_decay)
        np.testing.assert_allclose(np.asarray(ours_ema),
                                   t2n(ref.shadow_params[0]), rtol=1e-5)
