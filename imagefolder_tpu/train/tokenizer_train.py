"""Tokenizer (XQ-GAN) training: one jitted step = generator + discriminator
updates (reference loop ``xqgan_train.py:439-475`` + ``vq_loss.py:161-261``).

TPU-first:
* Both optimizer passes live in a single compiled step; the discriminator
  sees ``stop_gradient`` reconstructions (the reference's ``.detach()``).
* The adaptive disc weight (grad-norm ratio at the decoder last layer,
  vq_loss.py:153-159) is computed with one ``jax.vjp`` through a
  last-layer-only recompute — no second full decoder backward like torch.
* LeCam EMA, codebook-usage EMA, and SpectralNorm power-iteration vectors are
  explicit state fields (the reference hides them in module attrs/buffers).
* RobustTok annealing (alpha/delta ratio) and epoch are traced scalars — no
  per-epoch recompiles.
* Data parallelism: call ``train_step`` under pjit/jit with the batch sharded
  on the mesh 'data' axis and state replicated; all reductions (losses,
  codebook hit counts) are global-batch semantics already, so XLA inserts the
  ICI collectives (no NCCL-style hand-written allreduce, cf. quant.py:104).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import flax.core
import jax
import jax.numpy as jnp
import optax

from imagefolder_tpu.losses.diffaug import diff_aug
from imagefolder_tpu.losses.discriminators import (
    DinoDisc,
    PatchGANDiscriminator,
    StyleGANDiscriminator,
)
from imagefolder_tpu.losses.gan import (
    D_LOSSES,
    G_LOSSES,
    LeCamState,
    adaptive_disc_weight,
    adopt_weight,
    lecam_reg,
    lecam_update,
)
from imagefolder_tpu.losses.lpips import LPIPS
from imagefolder_tpu.models.tokenizer import ModelArgs, VQModel
from imagefolder_tpu.ops.quantize import update_usage_ema, usage_percent
from imagefolder_tpu.train.optim import (
    adamw_with_freezing,
    cosine_with_warmup,
    disc_frozen_predicate,
    ema_update,
    tokenizer_frozen_predicate,
)

__all__ = ["TokenizerTrainConfig", "TokenizerTrainState", "TokenizerTrainer"]


@dataclasses.dataclass
class TokenizerTrainConfig:
    """Training hyperparameters (reference xqgan_train.py argparse defaults +
    configs/*.yaml keys)."""

    lr: float = 1e-4
    disc_lr: float = 1e-4
    global_batch_size: int = 128
    epochs: int = 40
    steps_per_epoch: int = 1000
    lr_scheduler: str = "cosine"  # 'none' | 'cosine'
    min_lr: float = 5e-5
    beta1: float = 0.9
    beta2: float = 0.95
    weight_decay: float = 5e-2
    disc_weight_decay: float = 5e-2
    max_grad_norm: float = 1.0

    rec_weight: float = 1.0
    rec_loss: str = "l2"
    perceptual_weight: float = 1.0
    codebook_weight: float = 1.0
    disc_weight: float = 0.5
    disc_start: int = 0          # in steps (derived from disc_epoch_start)
    disc_type: str = "dinodisc"
    disc_loss: str = "hinge"
    gen_loss: str = "hinge"
    disc_adaptive_weight: bool = False
    lecam_loss_weight: Optional[float] = None
    aug_prob: float = 1.0
    aug_cutout: float = 0.2
    ema: bool = True
    ema_decay: float = 0.9999
    image_size: int = 256
    dino_depth: int = 12  # DinoDisc trunk depth (reduced in tests)
    grad_accum_steps: int = 1
    # Compute dtype for the loss stack (LPIPS VGG convs + DinoDisc trunk).
    # The reference runs BOTH inside autocast(bf16) by default
    # (xqgan_train.py:118,419,449,467); "float32" here matches its
    # --mixed-precision none and is what the goldens pin; training recipes
    # use "bfloat16" (full-rate MXU, parity with the reference default).
    loss_dtype: str = "float32"


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TokenizerTrainState:
    params: Any
    opt_state: Any
    ema_params: Any
    lpips_params: Any           # frozen
    disc_params: Any
    disc_vars: Any              # spectral-norm u vectors / BN running stats
    disc_opt_state: Any
    lecam: LeCamState
    usage_ema: jnp.ndarray      # (P, S, V)
    record_hit: jnp.ndarray
    step: jnp.ndarray


def _last_layer_apply(model_cfg: ModelArgs, dec_params, pre_last, w_last):
    """Recompute decoder output from pre-last activation with an overridden
    last-layer kernel (for the adaptive-weight vjp)."""
    if model_cfg.dec_type == "cnn":
        b = dec_params["conv_out"]["bias"]
        dn = jax.lax.conv_dimension_numbers(
            pre_last.shape, w_last.shape, ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            pre_last.astype(jnp.float32), w_last.astype(jnp.float32), (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=dn) + b
    # vit: recompute the ToPixel head output with the overridden last kernel
    n = pre_last.shape[0]
    p = 16
    hw = model_cfg.image_size // p
    if model_cfg.to_pixel == "linear":
        b = dec_params["to_pixel"]["proj"]["bias"]
        x = pre_last.astype(jnp.float32) @ w_last + b
        x = x.reshape(n, hw, hw, p, p, 3).transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(n, hw * p, hw * p, 3)
    if model_cfg.to_pixel == "conv":
        b = dec_params["to_pixel"]["deconv"]["bias"]
        x = pre_last.astype(jnp.float32).reshape(n, hw, hw, -1)
        y = jnp.einsum("bhwd,dcij->bhiwjc", x, w_last.astype(jnp.float32))
        return y.reshape(n, hw * p, hw * p, 3) + b
    if model_cfg.to_pixel == "siren":
        tp = dec_params["to_pixel"]
        h = pre_last.astype(jnp.float32) @ tp["sine1"]["kernel"] + tp["sine1"]["bias"]
        h = jnp.sin(30.0 * h)
        y = jnp.sin(30.0 * (h @ w_last + tp["sine2"]["bias"]))
        s = p * hw
        return y.reshape(n, 3, s, s).transpose(0, 2, 3, 1)
    raise NotImplementedError(
        f"adaptive disc weight needs a last layer; to_pixel="
        f"{model_cfg.to_pixel!r} has none (reference get_last_layer -> None)")


def _last_layer_kernel(model_cfg: ModelArgs, dec_params):
    if model_cfg.dec_type == "cnn":
        return dec_params["conv_out"]["kernel"]
    head = {"linear": ("proj", "kernel"), "conv": ("deconv", "kernel"),
            "siren": ("sine2", "kernel")}.get(model_cfg.to_pixel)
    if head is None:
        raise NotImplementedError(
            f"adaptive disc weight needs a last layer; to_pixel="
            f"{model_cfg.to_pixel!r} has none")
    return dec_params["to_pixel"][head[0]][head[1]]


class TokenizerTrainer:
    """Builds models/optimizers and exposes pure init/train_step functions."""

    def __init__(self, model_cfg: ModelArgs, tcfg: TokenizerTrainConfig):
        self.model_cfg = model_cfg
        self.tcfg = tcfg
        self.model = VQModel(model_cfg)
        loss_dtype = jnp.dtype(tcfg.loss_dtype)
        self.lpips = LPIPS(dtype=loss_dtype)
        if tcfg.disc_type == "dinodisc":
            self.disc = DinoDisc(depth=tcfg.dino_depth, dtype=loss_dtype)
        elif tcfg.disc_type == "patchgan":
            self.disc = PatchGANDiscriminator()
        elif tcfg.disc_type == "stylegan":
            self.disc = StyleGANDiscriminator(image_size=tcfg.image_size)
        else:
            raise ValueError(f"unknown disc_type {tcfg.disc_type!r}")

        total = tcfg.epochs * tcfg.steps_per_epoch
        if tcfg.lr_scheduler == "cosine":
            g_sched = cosine_with_warmup(tcfg.lr, tcfg.steps_per_epoch, total, tcfg.min_lr)
            d_sched = cosine_with_warmup(
                tcfg.disc_lr, int(0.02 * tcfg.epochs) * tcfg.steps_per_epoch,
                max(total - tcfg.disc_start, 1), tcfg.min_lr)
        else:
            g_sched, d_sched = (lambda s: tcfg.lr), (lambda s: tcfg.disc_lr)
        self.gen_tx = adamw_with_freezing(
            g_sched, weight_decay=tcfg.weight_decay, b1=tcfg.beta1, b2=tcfg.beta2,
            frozen_fn=tokenizer_frozen_predicate(model_cfg),
            grad_clip=tcfg.max_grad_norm,
            grad_accum_steps=tcfg.grad_accum_steps)
        self.disc_tx = adamw_with_freezing(
            d_sched, weight_decay=tcfg.disc_weight_decay, b1=tcfg.beta1,
            b2=tcfg.beta2, frozen_fn=disc_frozen_predicate,
            grad_clip=tcfg.max_grad_norm,
            grad_accum_steps=tcfg.grad_accum_steps)
        self.d_loss = D_LOSSES[tcfg.disc_loss]
        self.g_loss = G_LOSSES[tcfg.gen_loss]

    # ------------------------------------------------------------------ #
    # jitted: eager flax init dispatches every primitive as its own tiny
    # XLA program (hundreds of compile RPCs); one jitted graph compiles once
    @partial(jax.jit, static_argnums=(0,))
    def init(self, rng, sample_imgs) -> TokenizerTrainState:
        k1, k2, k3 = jax.random.split(rng, 3)
        variables = self.model.init(k1, sample_imgs, train=False)
        params = variables["params"]
        lpips_params = self.lpips.init(k2, sample_imgs, sample_imgs)["params"]
        disc_variables = self.disc.init(k3, sample_imgs, train=False)
        disc_params = disc_variables["params"]
        disc_vars = {k: v for k, v in disc_variables.items() if k != "params"}
        cfg = self.model_cfg
        p = cfg.product_quant
        s = len(cfg.v_patch_nums)
        v = cfg.codebook_size
        return TokenizerTrainState(
            params=params,
            opt_state=self.gen_tx.init(params),
            ema_params=jax.tree.map(jnp.copy, params) if self.tcfg.ema else None,
            lpips_params=lpips_params,
            disc_params=disc_params,
            disc_vars=flax.core.freeze(disc_vars).unfreeze(),
            disc_opt_state=self.disc_tx.init(disc_params),
            lecam=LeCamState.init(),
            usage_ema=jnp.zeros((p, s, v)),
            record_hit=jnp.zeros((), jnp.int32),
            step=jnp.zeros((), jnp.int32),
        )

    def reinit_disc_heads(self, state: TokenizerTrainState, rng,
                          sample_imgs) -> TokenizerTrainState:
        """Periodic discriminator head re-initialization (reference
        DinoDisc.reinit, discriminator_dino.py:219-234 / xqgan_train.py:436):
        fresh head params (frozen trunk kept), fresh disc optimizer state."""
        # jitted for the same reason as init(): one compile, not an eager
        # per-primitive dispatch cascade over a remote-dispatch backend.
        # Cached on self so periodic reinits reuse the compiled program.
        if not hasattr(self, "_jit_disc_init"):
            self._jit_disc_init = jax.jit(self.disc.init,
                                          static_argnames=("train",))
        fresh = self._jit_disc_init(rng, sample_imgs, train=False)
        fresh_params = fresh["params"]
        if isinstance(self.disc, DinoDisc):
            new_disc = dict(state.disc_params)
            for k, v in fresh_params.items():
                if k != "dino":
                    new_disc[k] = v
        else:
            new_disc = fresh_params
        return dataclasses.replace(
            state, disc_params=new_disc,
            disc_opt_state=self.disc_tx.init(new_disc))

    # ------------------------------------------------------------------ #
    def _disc_apply(self, disc_params, disc_vars, imgs, rng, update_stats,
                    train=True):
        """Run the discriminator. ``train`` controls batch-stat semantics
        (the reference keeps the disc module in train mode during BOTH the
        generator and discriminator passes); ``update_stats`` controls
        whether the new spectral-norm/BN state is kept."""
        variables = {"params": disc_params, **disc_vars}
        if isinstance(self.disc, DinoDisc):
            kwargs = dict(rng=rng, train=train)
        else:
            kwargs = dict(train=train)
        if disc_vars:
            out, new_vars = self.disc.apply(
                variables, imgs, mutable=list(disc_vars.keys()), **kwargs)
            return out, (dict(new_vars) if update_stats else disc_vars)
        out = self.disc.apply(variables, imgs, **kwargs)
        return out, disc_vars

    def _aug(self, imgs, key, fade_blur: float):
        if isinstance(self.disc, DinoDisc):
            return diff_aug(imgs, key, self.tcfg.aug_prob, self.tcfg.aug_cutout,
                            fade_blur)
        return imgs

    # the incoming state is donated: params/opt/EMA buffers are updated in
    # place on device, halving train-state HBM (old+new never coexist).
    # Callers must not touch the passed-in state after the call.
    @partial(jax.jit, static_argnums=(0,), static_argnames=("fade_blur",),
             donate_argnums=(1,))
    def train_step(self, state: TokenizerTrainState, imgs, rng, *, epoch=0,
                   alpha=0.0, beta=0.0, delta_ratio=1.0, fade_blur: float = 0.0):
        tcfg = self.tcfg
        mcfg = self.model_cfg
        k_model, k_aug_g, k_aug_f, k_aug_r, k_disc = jax.random.split(rng, 5)
        step = state.step

        disc_w = adopt_weight(tcfg.disc_weight, step + 1, tcfg.disc_start)

        # ---------------- generator ---------------- #
        # static gates: a zero weight removes the network from the compiled
        # graph entirely (a traced 0.0 multiplier would still compute it)
        use_lpips = bool(tcfg.perceptual_weight)
        use_disc = bool(tcfg.disc_weight)

        def gen_loss_fn(params):
            out = self.model.apply(
                {"params": params}, imgs, train=True, rng=k_model, epoch=epoch,
                alpha=alpha, beta=beta, delta_ratio=delta_ratio)
            dec = out.dec.astype(jnp.float32)
            rec = jnp.mean(jnp.square(imgs - dec)) if tcfg.rec_loss == "l2" \
                else jnp.mean(jnp.abs(imgs - dec))
            perc = (jnp.mean(self.lpips.apply(
                {"params": state.lpips_params}, imgs, dec))
                if use_lpips else jnp.zeros(()))
            if use_disc:
                fake_aug = self._aug(dec, k_aug_g, fade_blur)
                logits_fake, _ = self._disc_apply(
                    jax.lax.stop_gradient(state.disc_params), state.disc_vars,
                    fake_aug, k_disc, update_stats=False)
                g_adv = self.g_loss(logits_fake)
            else:
                g_adv = jnp.zeros(())
            nll = tcfg.rec_weight * rec + tcfg.perceptual_weight * perc

            if tcfg.disc_adaptive_weight and use_disc:
                dec_params = jax.lax.stop_gradient(params["decoder"])
                pre_sg = jax.lax.stop_gradient(out.pre_last)

                # Two SEPARATELY-traced heads so each backward is pruned to
                # its own branch: the nll cotangent never touches the disc
                # and the adv cotangent never touches LPIPS — one LPIPS bwd
                # + one disc bwd total. (A tuple-output jacrev batches the
                # two pulls but forces BOTH branches through BOTH cotangent
                # rows — ~2x the transpose FLOPs; measured slower on TPU.)
                # The recomputed last-layer forward is bitwise-identical to
                # out.dec (tests/test_tokenizer_train.py), so XLA CSEs it
                # and the duplicated LPIPS/disc forwards with the main pass.
                def head_nll(w_last):
                    d = _last_layer_apply(mcfg, dec_params, pre_sg, w_last)
                    r = jnp.mean(jnp.square(imgs - d)) if tcfg.rec_loss == "l2" \
                        else jnp.mean(jnp.abs(imgs - d))
                    pl = (jnp.mean(self.lpips.apply(
                        {"params": state.lpips_params}, imgs, d))
                        if use_lpips else jnp.zeros(()))
                    return tcfg.rec_weight * r + tcfg.perceptual_weight * pl

                def head_g(w_last):
                    d = _last_layer_apply(mcfg, dec_params, pre_sg, w_last)
                    lf, _ = self._disc_apply(
                        jax.lax.stop_gradient(state.disc_params), state.disc_vars,
                        self._aug(d, k_aug_g, fade_blur), k_disc, update_stats=False)
                    return self.g_loss(lf)

                w0 = jax.lax.stop_gradient(_last_layer_kernel(mcfg, dec_params))
                g_nll = jax.grad(head_nll)(w0)
                g_g = jax.grad(head_g)(w0)
                d_weight = adaptive_disc_weight(g_nll, g_g)
            else:
                d_weight = jnp.ones(())

            loss = (nll + d_weight * disc_w * g_adv
                    + tcfg.codebook_weight * (out.vq_loss + out.commit_loss
                                              + out.entropy_loss)
                    + out.sem_loss + out.detail_loss + out.dependency_loss)
            aux = dict(rec_loss=rec, perceptual_loss=perc, gen_adv_loss=g_adv,
                       vq_loss=out.vq_loss, commit_loss=out.commit_loss,
                       entropy_loss=out.entropy_loss, sem_loss=out.sem_loss,
                       detail_loss=out.detail_loss,
                       dependency_loss=out.dependency_loss,
                       disc_adaptive_weight=d_weight, hits=out.hits_PSV,
                       dec=jax.lax.stop_gradient(dec))
            return loss, aux

        (gen_loss, aux), grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
            state.params)
        updates, new_opt = self.gen_tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = (ema_update(state.ema_params, new_params, tcfg.ema_decay)
                   if state.ema_params is not None else None)

        # ---------------- discriminator ---------------- #
        dec_sg = aux.pop("dec")

        if not use_disc:
            # disc_weight == 0: pure autoencoder training — no adversarial
            # legs compiled at all (the reference would still train a
            # pointless disc; here the whole pass is statically removed)
            metrics = dict(aux, gen_loss=gen_loss,
                           disc_loss=jnp.zeros(()),
                           logits_real=jnp.zeros(()),
                           logits_fake=jnp.zeros(()), disc_weight=disc_w)
            hits0 = metrics.pop("hits")
            new_usage, new_record = update_usage_ema(
                state.usage_ema, hits0, state.record_hit)
            usage_ps0 = usage_percent(
                new_usage,
                float(imgs.shape[0] * self.model_cfg.num_latent_tokens),
                self.model_cfg.codebook_size)
            metrics["codebook_usage"] = jnp.mean(usage_ps0)
            metrics["codebook_usage_per_scale"] = usage_ps0
            return TokenizerTrainState(
                params=new_params, opt_state=new_opt, ema_params=new_ema,
                lpips_params=state.lpips_params,
                disc_params=state.disc_params, disc_vars=state.disc_vars,
                disc_opt_state=state.disc_opt_state, lecam=state.lecam,
                usage_ema=new_usage, record_hit=new_record,
                step=step + 1), metrics

        def disc_loss_fn(disc_params):
            fake = self._aug(dec_sg, k_aug_f, fade_blur)
            real = self._aug(imgs, k_aug_r, fade_blur)
            logits_fake, dv1 = self._disc_apply(disc_params, state.disc_vars,
                                                fake, k_disc, update_stats=True)
            logits_real, dv2 = self._disc_apply(disc_params, dv1, real, k_disc,
                                                update_stats=True)
            base = self.d_loss(logits_real, logits_fake)
            if tcfg.lecam_loss_weight:
                # reference updates the EMA first, then regularizes against
                # the UPDATED values (vq_loss.py:239-241); the EMA terms are
                # detached there (.item() host floats)
                new_lecam = lecam_update(state.lecam, logits_real, logits_fake)
                reg = lecam_reg(logits_real, logits_fake,
                                jax.lax.stop_gradient(new_lecam))
                d_loss = disc_w * (reg * tcfg.lecam_loss_weight + base)
            else:
                new_lecam = state.lecam
                d_loss = disc_w * base
            return d_loss, (dv2, new_lecam, jnp.mean(logits_real),
                            jnp.mean(logits_fake))

        (d_loss, (new_disc_vars, new_lecam, lr_m, lf_m)), d_grads = \
            jax.value_and_grad(disc_loss_fn, has_aux=True)(state.disc_params)
        d_updates, new_disc_opt = self.disc_tx.update(
            d_grads, state.disc_opt_state, state.disc_params)
        new_disc_params = optax.apply_updates(state.disc_params, d_updates)

        # ---------------- bookkeeping ---------------- #
        hits = aux.pop("hits")  # (P,S,V); global under pjit
        new_usage, new_record = update_usage_ema(
            state.usage_ema, hits, state.record_hit)
        tokens_per_scale = float(
            imgs.shape[0] * self.model_cfg.num_latent_tokens)
        # (P, S) per-branch-per-scale usage%: the reference logs codebook
        # usage per scale as a first-class metric (quant.py:137-143)
        usage_ps = usage_percent(
            new_usage, tokens_per_scale, self.model_cfg.codebook_size)
        usage = jnp.mean(usage_ps)

        metrics = dict(aux, gen_loss=gen_loss, disc_loss=d_loss,
                       logits_real=lr_m, logits_fake=lf_m,
                       codebook_usage=usage,
                       codebook_usage_per_scale=usage_ps,
                       disc_weight=disc_w)

        new_state = TokenizerTrainState(
            params=new_params, opt_state=new_opt, ema_params=new_ema,
            lpips_params=state.lpips_params, disc_params=new_disc_params,
            disc_vars=new_disc_vars, disc_opt_state=new_disc_opt,
            lecam=new_lecam, usage_ema=new_usage, record_hit=new_record,
            step=step + 1)
        return new_state, metrics
