"""VAR generator: golden parity with the reference transformer + KV-cache
consistency + end-to-end sampling."""

import numpy as np
import torch

from tests.ref_utils import ref_path, stub_heavy_modules, t2n

ref_path()
stub_heavy_modules()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from imagefolder_tpu.models.tokenizer import ModelArgs, VQModel  # noqa: E402
from imagefolder_tpu.models.var import VAR, VARConfig  # noqa: E402
from imagefolder_tpu.train.var_train import (  # noqa: E402
    VARTrainConfig,
    VARTrainer,
    build_vae_var,
    var_sample,
)
from imagefolder_tpu.utils.convert_torch import convert_var  # noqa: E402

PNS = (1, 2, 3)


class _FakeVae:
    """Minimal vae_local for reference VAR construction."""

    def __init__(self, vocab, cvae):
        self.vocab_size, self.Cvae = vocab, cvae
        self.quantizes = []
        self.product_quant = 1


def _ref_var(depth=2, c=64, heads=2, vocab=32, cvae=8, l2=False):
    from models.var import VAR as RefVAR
    torch.manual_seed(0)
    return RefVAR(
        _FakeVae(vocab, cvae), num_classes=10, depth=depth, embed_dim=c,
        num_heads=heads, patch_nums=PNS, attn_l2_norm=l2,
        flash_if_available=False, fused_if_available=False, p_drop=0.0,
        drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0,
        cond_drop_rate=0.0,
    )


def test_var_forward_matches_reference():
    ref = _ref_var(l2=True)
    ref.eval()
    cfg = VARConfig(vocab_size=32, Cvae=8, num_classes=10, depth=2,
                    embed_dim=64, num_heads=2, patch_nums=PNS,
                    attn_l2_norm=True, cond_drop_rate=0.0, p_drop=0.0)
    mine = VAR(cfg)
    params = convert_var(ref.state_dict(), depth=2, attn_l2_norm=True, mlm=False)
    label = torch.tensor([1, 7])
    x_in = torch.randn(2, cfg.L - 1, 8, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        want = ref(label, x_in)
    got = mine.apply({"params": params}, jnp.asarray(label.numpy()),
                     jnp.asarray(x_in.numpy()))
    np.testing.assert_allclose(np.asarray(got), t2n(want), rtol=2e-4, atol=2e-4)


def test_kv_cache_decode_equals_blockcausal_forward():
    """Per-stage cached decode must reproduce training-forward logits: the
    block-causal bias is exactly prefix attention."""
    cfg = VARConfig(vocab_size=32, Cvae=8, num_classes=10, depth=3,
                    embed_dim=64, num_heads=4, patch_nums=PNS,
                    cond_drop_rate=0.0, p_drop=0.0)
    var = VAR(cfg)
    key = jax.random.PRNGKey(0)
    label = jnp.asarray([3, 5])
    x_in = jax.random.normal(key, (2, cfg.L - cfg.first_l, 8))
    params = var.init({"params": key}, label, x_in)["params"]
    full = var.apply({"params": params}, label, x_in)

    # staged: rebuild the same input embeddings per stage and decode w/ cache
    cond = jnp.take(params["class_emb"], label, axis=0)
    sos = jnp.broadcast_to(cond[:, None], (2, cfg.first_l, 64)) + params["pos_start"]
    we_k, we_b = params["word_embed"]["kernel"], params["word_embed"]["bias"]
    x_all = jnp.concatenate([sos, x_in @ we_k + we_b], axis=1)
    import numpy as _np
    lvl = _np.concatenate([_np.full((p * p,), i) for i, p in enumerate(PNS)])
    x_all = x_all + jnp.take(params["lvl_embed"], jnp.asarray(lvl), axis=0)[None] \
        + params["pos_1LC"]

    caches = [(None, None)] * cfg.depth
    outs = []
    cur = 0
    for pn in PNS:
        seg = x_all[:, cur:cur + pn * pn]
        logits, caches = var.apply({"params": params}, seg, cond, caches,
                                   method=VAR.decode_stage)
        outs.append(logits)
        cur += pn * pn
    staged = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(staged), np.asarray(full),
                               rtol=2e-4, atol=2e-4)


def _tiny_models(product_quant=1):
    margs = ModelArgs(
        codebook_size=32, codebook_embed_dim=8,
        encoder_ch_mult=(1, 2), decoder_ch_mult=(1, 2), z_channels=32,
        enc_type="cnn", dec_type="cnn", semantic_guide="none",
        detail_guide="none", num_latent_tokens=9, image_size=32,
        v_patch_nums=PNS, product_quant=product_quant,
    )
    # cnn at 32px/f2 gives 16x16 grid; we need 3x3 -> use image_size 6? keep
    # it simple: cnn f2 of 6px -> 3x3
    margs.image_size = 6
    vae = VQModel(margs)
    var = VAR(VARConfig(
        vocab_size=margs.codebook_size * product_quant,
        Cvae=margs.codebook_embed_dim * product_quant,
        product_quant=product_quant, num_classes=10, depth=2, embed_dim=64,
        num_heads=2, patch_nums=PNS, drop_path_rate=0.0))
    return margs, vae, var


def test_var_train_step_and_sampling():
    margs, vae, var = _tiny_models()
    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (2, 6, 6, 3), minval=-1, maxval=1)
    vae_params = vae.init(key, imgs, train=False)["params"]
    tr = VARTrainer(vae, var, VARTrainConfig(total_steps=10, warmup_steps=2))
    state = tr.init(key, vae_params, imgs)
    labels = jnp.asarray([1, 2])
    params0 = jax.device_get(state.params)  # train_step donates state
    s1, m1 = tr.train_step(state, imgs, labels, jax.random.PRNGKey(1))
    s2, m2 = tr.train_step(s1, imgs, labels, jax.random.PRNGKey(2))
    assert np.isfinite(float(m2["loss"]))
    assert 0.0 <= float(m2["acc_mean"]) <= 100.0
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                     params0, jax.device_get(s2.params))
    assert max(jax.tree.leaves(d)) > 0

    # vae_params was captured into the (donated) state — use the live copy
    img = var_sample(var, s2.params, vae, s2.vae_params,
                     jnp.asarray([0, 1]), jax.random.PRNGKey(3),
                     cfg_scale=1.5, top_k=8, top_p=0.9)
    assert img.shape == (2, 6, 6, 3)
    a = np.asarray(img)
    assert np.isfinite(a).all() and a.min() >= 0.0 and a.max() <= 1.0


def test_var_sampling_pq2_joint():
    margs, vae, var = _tiny_models(product_quant=2)
    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (2, 6, 6, 3), minval=-1, maxval=1)
    # PQ2 vit-less cnn: encode gives (B,1,g,g,C) so product_quant>1 with cnn is
    # not a reference configuration; instead test the joint-sampling math on
    # the var side with a PQ2 vit-free fake: skip if encode path unsupported.
    vae_params = vae.init(key, imgs, train=False)["params"]
    var_params = var.init({"params": key}, jnp.asarray([0, 1]),
                          jnp.zeros((2, var.config.L - 1, var.config.Cvae)))["params"]
    img = var_sample(var, var_params, vae, vae_params, jnp.asarray([0, 1]),
                     jax.random.PRNGKey(1), cfg_scale=2.0, top_k=4,
                     joint_sample=True)
    assert img.shape == (2, 6, 6, 3)


def test_512px_patch_nums_shapes():
    """The 512px recipe (reference arg_util.py:287-291:
    pn='1_2_3_4_6_9_13_18_24_32', L=2240, 32x32 latent) must trace through
    the quantizer chain and VAR without shape errors — checked via
    jax.eval_shape, no heavy compute."""
    from imagefolder_tpu.models.var import VAR, VARConfig
    from imagefolder_tpu.ops.quantize import MultiScaleVQ

    pns = (1, 2, 3, 4, 6, 9, 13, 18, 24, 32)
    L = sum(p * p for p in pns)
    assert L == 2240  # (SURVEY.md's 2280 was a miscount)

    q = MultiScaleVQ(vocab_size=64, Cvae=8, v_patch_nums=pns,
                     num_latent_tokens=32 * 32)
    f = jax.ShapeDtypeStruct((2, 32, 32, 8), jnp.float32)
    vars_shape = jax.eval_shape(q.init, jax.random.PRNGKey(0), f)
    out = jax.eval_shape(
        lambda v, x: q.apply(v, x, train=False), vars_shape, f)
    assert out.f_hat.shape == (2, 32, 32, 8)

    var = VAR(VARConfig(vocab_size=64, Cvae=8, num_classes=10, depth=2,
                        embed_dim=64, num_heads=2, patch_nums=pns,
                        drop_path_rate=0.0, cond_drop_rate=0.0, p_drop=0.0))
    x_in = jax.ShapeDtypeStruct((2, L - 1, 8), jnp.float32)
    lb = jax.ShapeDtypeStruct((2,), jnp.int32)
    pv = jax.eval_shape(
        lambda l, x: var.init({"params": jax.random.PRNGKey(0),
                               "sample": jax.random.PRNGKey(1),
                               "droppath": jax.random.PRNGKey(2)},
                              l, x, train=False), lb, x_in)
    logits = jax.eval_shape(
        lambda v, l, x: var.apply(v, l, x, train=False), pv, lb, x_in)
    assert logits.shape == (2, L, 64)


def test_progressive_loss_matches_reference():
    """Prog-mode loss vs the reference trainer math (trainer.py:119-147):
    truncated forward (var.py:241-248) + begin/end loss weighting
    (trainer.py:138-143), at stages 0, 1 and several warmup factors."""
    ref = _ref_var()
    ref.eval()
    cfg = VARConfig(vocab_size=32, Cvae=8, num_classes=10, depth=2,
                    embed_dim=64, num_heads=2, patch_nums=PNS,
                    cond_drop_rate=0.0, p_drop=0.0)
    mine = VAR(cfg)
    params = convert_var(ref.state_dict(), depth=2, attn_l2_norm=False,
                         mlm=False)
    from imagefolder_tpu.train.var_train import VARTrainer, VARTrainConfig

    class _VaeStub:  # _ce_and_acc touches only var.config / L / last_l
        config = cfg

    tr = VARTrainer.__new__(VARTrainer)
    tr.var, tr.tcfg = mine, VARTrainConfig()
    tr.L = cfg.L
    tr.last_l = PNS[-1] ** 2

    g = torch.Generator().manual_seed(7)
    B, L, V = 2, cfg.L, 32
    label = torch.tensor([1, 7])
    x_full = torch.randn(B, L - 1, 8, generator=g)
    gt_full = torch.randint(0, V, (B, L), generator=g)
    loss_weight = torch.ones(1, L) / L
    ce = torch.nn.CrossEntropyLoss(reduction="none")
    begin_ends = cfg.begin_ends

    for prog_si, prog_wp in [(0, 1.0), (1, 0.35), (1, 1.0)]:
        bg, ed = begin_ends[prog_si]
        ref.prog_si = prog_si
        x_trunc = x_full[:, :ed - 1]
        gt = gt_full[:, :ed]
        with torch.no_grad():
            logits = ref(label, x_trunc)
        assert logits.shape[1] == ed
        loss_t = ce(logits.reshape(-1, V), gt.reshape(-1)).view(B, -1)
        lw = loss_weight[:, :ed].clone()
        lw[:, bg:ed] *= prog_wp
        want = loss_t.mul(lw).sum(dim=-1).mean().item()

        x_j = (None if prog_si == 0
               else jnp.asarray(x_trunc.numpy()))
        logits_j = mine.apply({"params": params}, jnp.asarray(label.numpy()),
                              x_j, prog_si=prog_si)
        got, acc, tail = tr._ce_and_acc(
            logits_j, [jnp.asarray(gt.numpy())], 0.0, prog_si, prog_wp)
        np.testing.assert_allclose(float(got), want, rtol=2e-4,
                                   err_msg=f"prog_si={prog_si} wp={prog_wp}")
        assert float(tail) == -1.0
    ref.prog_si = -1


def test_progressive_train_step_runs():
    """Full jitted train_step at a progressive stage: truncated shapes,
    finite loss, params move."""
    margs, vae, var = _tiny_models()
    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (2, 6, 6, 3), minval=-1, maxval=1)
    vae_params = vae.init(key, imgs, train=False)["params"]
    tr = VARTrainer(vae, var, VARTrainConfig(total_steps=10, warmup_steps=2))
    state = tr.init(key, vae_params, imgs)
    labels = jnp.asarray([1, 2])
    s1, m1 = tr.train_step(state, imgs, labels, jax.random.PRNGKey(1),
                           prog_si=1, prog_wp=0.5)
    assert np.isfinite(float(m1["loss"]))
    assert float(m1["acc_tail"]) == -1.0
    # stage 0: sos-only input
    s2, m2 = tr.train_step(s1, imgs, labels, jax.random.PRNGKey(2),
                           prog_si=0, prog_wp=1.0)
    assert np.isfinite(float(m2["loss"]))


def test_progressive_controller_matches_reference_schedule():
    """ProgressiveController vs the reference inline logic: stage schedule
    (train.py:317-325) and per-stage warmup bookkeeping (trainer.py:105-118),
    with the documented pg=0.8 pg0=1 recipe."""
    from imagefolder_tpu.train.var_train import ProgressiveController

    num_stages, pg, pg0 = len(PNS), 0.8, 1
    wp_it, max_it, prog_wp_it = 10, 100, 4.0
    ctl = ProgressiveController(num_stages, pg=pg, pg0=pg0,
                                prog_wp_it=prog_wp_it)

    # reference transcription
    prog_it, last_prog_si, first_prog = 0, -1, True
    for g_it in range(max_it):
        # train.py:317-325
        if pg:
            if g_it <= wp_it:
                want_si = pg0
            elif g_it >= max_it * pg:
                want_si = num_stages - 1
            else:
                delta = num_stages - 1 - pg0
                progress = min(max((g_it - wp_it) / (max_it * pg - wp_it), 0), 1)
                want_si = pg0 + round(progress * delta)
        else:
            want_si = -1
        got_si = ctl.stage(g_it, wp_it, max_it)
        assert got_si == want_si, g_it
        # trainer.py:109-118
        if last_prog_si != want_si:
            if last_prog_si != -1:
                first_prog = False
            last_prog_si = want_si
            prog_it = 0
        prog_it += 1
        want_wp = max(min(prog_it / prog_wp_it, 1), 0.01)
        if first_prog:
            want_wp = 1
        want_eff = -1 if want_si == num_stages - 1 else want_si
        got_eff, got_wp = ctl.step(got_si)
        assert got_eff == want_eff and abs(got_wp - want_wp) < 1e-12, g_it

    # pg=0 -> always full training
    off = ProgressiveController(num_stages, pg=0.0)
    assert off.stage(5, wp_it, max_it) == -1
    assert off.step(-1) == (-1, 1.0)


def test_progressive_controller_resume_roundtrip():
    """A controller restored from state_dict mid-stage continues the exact
    (prog_si, prog_wp) trajectory of an uninterrupted run — the warmup ramp
    of the in-flight stage must survive a kill/resume (the reference keeps
    prog_it/last_prog_si in trainer.state_dict)."""
    from imagefolder_tpu.train.var_train import ProgressiveController

    def make():
        return ProgressiveController(len(PNS), pg=0.8, pg0=1, prog_wp_it=4.0)

    wp_it, max_it = 10, 100
    ref = make()
    full = [ref.step(ref.stage(g, wp_it, max_it)) for g in range(80)]
    # kill one iter into an active warmup ramp (wp < 1), past the first stage
    kill = next(g for g in range(20, 70) if full[g][1] < 1.0) + 1

    a = make()
    for g in range(kill):
        a.step(a.stage(g, wp_it, max_it))
    blob = a.state_dict()

    b = make()  # fresh process
    b.load_state_dict(blob)
    resumed = [b.step(b.stage(g, wp_it, max_it)) for g in range(kill, 80)]
    assert resumed == full[kill:]

    # without restore, the in-flight stage's ramp is lost (the bug guarded):
    # a fresh controller reports first_prog=True -> wp forced to 1.0
    c = make()
    cold = [c.step(c.stage(g, wp_it, max_it)) for g in range(kill, 80)]
    assert cold != full[kill:]


def test_var_sampling_more_smooth():
    """more_smooth CFG decode (var.py:196-225 recipe): gumbel-smoothed
    code mixtures through soft_embed_branch, full pipeline smoke."""
    margs, vae, var = _tiny_models(product_quant=2)
    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (2, 6, 6, 3), minval=-1, maxval=1)
    vae_params = vae.init(key, imgs, train=False)["params"]
    var_params = var.init({"params": key}, jnp.asarray([0, 1]),
                          jnp.zeros((2, var.config.L - 1, var.config.Cvae)))["params"]
    img = var_sample(var, var_params, vae, vae_params, jnp.asarray([0, 1]),
                     jax.random.PRNGKey(1), cfg_scale=1.5, top_k=4,
                     more_smooth=True)
    assert img.shape == (2, 6, 6, 3)
    a = np.asarray(img)
    assert np.isfinite(a).all() and a.min() >= 0.0 and a.max() <= 1.0
