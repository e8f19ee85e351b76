"""VAR training + CFG sampling (reference ``trainer.py``, ``train.py``,
``inference.py``, ``models/__init__.py:build_vae_var``).

Train step: frozen tokenizer encodes the image to per-branch multiscale
indices -> teacher-forcing input -> VAR logits -> per-PQ-branch CE averaged
(trainer.py:122-147). Sampling: 10-stage KV-cached CFG decode fully unrolled
under one jit.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax

# the package-level generator factory lives in models/__init__.py (reference
# models/__init__.py:14-65); re-exported here for the train-module namespace
from imagefolder_tpu.models import build_vae_var
from imagefolder_tpu.models.tokenizer import ModelArgs, VQModel
from imagefolder_tpu.models.var import VAR, VARConfig
from imagefolder_tpu.ops.sampling import gumbel_softmax, sample_with_top_k_top_p
from imagefolder_tpu.train.optim import (
    adamw_with_freezing,
    ema_update,
    lr_wd_annealing,
)

__all__ = ["build_vae_var", "VARTrainConfig", "VARTrainState", "VARTrainer",
           "ProgressiveController", "var_sample"]


@dataclasses.dataclass
class VARTrainConfig:
    """Reference utils/arg_util.py defaults (tblr-scaled lr, AdamW(0.9,0.95),
    cos schedule, grad clip 2)."""

    lr: float = 1e-4
    weight_decay: float = 0.05
    # reference twde (arg_util.py:46,303): 0/None -> constant wd; set to
    # anneal wd -> wd_end cosine over the run (utils/lr_control.py:47-48)
    weight_decay_end: float = 0.0
    beta1: float = 0.9
    beta2: float = 0.95
    grad_clip: float = 2.0
    sched: str = "lin0"
    warmup_steps: int = 1000
    total_steps: int = 100_000
    final_lr_ratio: float = 0.1
    label_smooth: float = 0.0
    p_drop_factor: float = 0.0
    ema: bool = False


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class VARTrainState:
    params: Any
    opt_state: Any
    vae_params: Any   # frozen tokenizer
    ema_params: Any
    step: jnp.ndarray


class ProgressiveController:
    """Progressive-training schedule + per-stage warmup state (reference
    train.py:317-325 stage schedule, trainer.py:105-118 warmup bookkeeping;
    arg_util.py:311-312 additionally couples ``pg>0 -> sche=lin{pg}`` — the
    CLI applies that to the lr schedule).

    Host-side: ``prog_si`` changes the compiled sequence length, so it is a
    static python int (at most one recompile per stage, <= S stages/run).
    """

    def __init__(self, num_stages: int, pg: float = 0.0, pg0: int = 4,
                 prog_wp_it: float = 20.0):
        self.num_stages = num_stages
        self.pg = pg
        # the reference default pg0=4 assumes the 10-scale pyramid; on a
        # shorter one an unclamped pg0 would index past begin_ends (and
        # make the stage schedule walk downward)
        self.pg0 = max(0, min(pg0, num_stages - 1))
        self.prog_wp_it = max(prog_wp_it, 1.0)
        self.prog_it = 0
        self.last_prog_si = -1
        self.first_prog = True

    def stage(self, g_it: int, wp_it: float, max_it: int) -> int:
        """Scheduled raw stage for global iter g_it (train.py:317-325)."""
        if self.pg <= 0:
            return -1
        if g_it <= wp_it:
            return self.pg0
        if g_it >= max_it * self.pg:
            return self.num_stages - 1
        delta = self.num_stages - 1 - self.pg0
        progress = min(max((g_it - wp_it) / (max_it * self.pg - wp_it), 0), 1)
        return self.pg0 + round(progress * delta)

    def step(self, prog_si: int):
        """Per-iteration bookkeeping (trainer.py:109-118) ->
        (effective prog_si, prog_wp)."""
        if self.last_prog_si != prog_si:
            if self.last_prog_si != -1:
                self.first_prog = False
            self.last_prog_si = prog_si
            self.prog_it = 0
        self.prog_it += 1
        prog_wp = max(min(self.prog_it / self.prog_wp_it, 1.0), 0.01)
        if self.first_prog:
            prog_wp = 1.0  # solved by the main warmup already
        if prog_si == self.num_stages - 1:
            prog_si = -1  # max stage == full training
        return prog_si, prog_wp

    def state_dict(self):
        return {"prog_it": self.prog_it, "last_prog_si": self.last_prog_si,
                "first_prog": self.first_prog}

    def load_state_dict(self, d):
        self.prog_it = d["prog_it"]
        self.last_prog_si = d["last_prog_si"]
        self.first_prog = d["first_prog"]


class VARTrainer:
    def __init__(self, vae: VQModel, var: VAR, tcfg: VARTrainConfig):
        self.vae = vae
        self.var = var
        self.tcfg = tcfg
        sched = lr_wd_annealing(tcfg.sched, tcfg.lr, tcfg.warmup_steps,
                                tcfg.total_steps, tcfg.final_lr_ratio)
        self.tx = adamw_with_freezing(
            sched, weight_decay=tcfg.weight_decay, b1=tcfg.beta1, b2=tcfg.beta2,
            grad_clip=tcfg.grad_clip,
            weight_decay_end=(tcfg.weight_decay_end or None),
            total_steps=tcfg.total_steps)
        pns = var.config.patch_nums
        self.L = sum(p * p for p in pns)
        self.last_l = pns[-1] ** 2

    # jitted: one compile instead of an eager per-primitive dispatch cascade
    @partial(jax.jit, static_argnums=(0,))
    def init(self, rng, vae_params, sample_imgs) -> VARTrainState:
        k1, k2 = jax.random.split(rng)
        idx = self.vae.apply({"params": vae_params}, sample_imgs,
                             method=VQModel.img_to_idxBl)
        x_in = self.vae.apply({"params": vae_params}, idx,
                              method=VQModel.idxBl_to_var_input)
        label = jnp.zeros((sample_imgs.shape[0],), jnp.int32)
        params = self.var.init(
            {"params": k1, "sample": k2, "droppath": k2},
            label, x_in, train=False)["params"]
        return VARTrainState(params=params, opt_state=self.tx.init(params),
                             vae_params=vae_params,
                             ema_params=(jax.tree.map(jnp.copy, params)
                                         if self.tcfg.ema else None),
                             step=jnp.zeros((), jnp.int32))

    def _ce_and_acc(self, logits_BLV, gt_BL_list, label_smooth=0.0,
                    prog_si: int = -1, prog_wp=1.0):
        """Per-PQ-branch CE (trainer.py:131-144) + mean/tail token accuracy.

        prog_si >= 0: loss weight covers only the first ed positions (still
        normalized by the FULL L), with the newest stage's span bg:ed scaled
        by the prog_wp warmup factor (trainer.py:137-143). Tail metrics are
        -1 under progressive training (trainer.py:157-158)."""
        p = self.var.config.product_quant
        v = logits_BLV.shape[-1] // p
        loss = 0.0
        accs, tails = [], []
        for i, gt in enumerate(gt_BL_list):
            lg = logits_BLV[..., i * v:(i + 1) * v]
            logp = jax.nn.log_softmax(lg, axis=-1)
            nll = -jnp.take_along_axis(logp, gt[..., None], axis=-1)[..., 0]
            if label_smooth > 0:
                nll = (1 - label_smooth) * nll - label_smooth * jnp.mean(logp, axis=-1)
            loss = loss + nll  # (B, L or ed)
            pred = jnp.argmax(lg, axis=-1)
            correct = (pred == gt).astype(jnp.float32)
            accs.append(jnp.mean(correct) * 100.0)
            tails.append(jnp.mean(correct[:, -self.last_l:]) * 100.0
                         if prog_si < 0 else jnp.float32(-1.0))
        loss = loss / p
        if prog_si >= 0:
            bg, ed = self.var.config.begin_ends[prog_si]
            lw = jnp.full((ed,), 1.0 / self.L)
            lw = lw * jnp.where(jnp.arange(ed) >= bg,
                                jnp.clip(jnp.asarray(prog_wp, jnp.float32),
                                         0.0, 1.0), 1.0)
            loss = jnp.mean(jnp.sum(loss * lw[None], axis=-1))
        else:
            loss = jnp.mean(jnp.sum(loss * (1.0 / self.L), axis=-1))
        return loss, sum(accs) / p, sum(tails) / p

    # state donated: old+new params/opt/EMA never coexist in HBM
    @partial(jax.jit, static_argnums=(0,), static_argnames=("prog_si",),
             donate_argnums=(1,))
    def train_step(self, state: VARTrainState, imgs, labels, rng, *,
                   prog_si: int = -1, prog_wp=1.0):
        """prog_si/prog_wp: progressive training (trainer.py:103-147) — the
        sequence is truncated to stages <= prog_si and the newest stage's
        loss ramps in by prog_wp. prog_si is static (one compile per stage)."""
        idx_P = self.vae.apply({"params": state.vae_params}, imgs,
                               method=VQModel.img_to_idxBl)
        if prog_si >= 0:
            idx_P = [branch[:prog_si + 1] for branch in idx_P]
        gt_BL = [jnp.concatenate(branch, axis=1) for branch in idx_P]
        x_in = self.vae.apply({"params": state.vae_params}, idx_P,
                              method=VQModel.idxBl_to_var_input,
                              prog_si=prog_si)
        if x_in is not None:
            x_in = jax.lax.stop_gradient(x_in)
        k_s, k_dp = jax.random.split(rng)

        def loss_fn(params):
            logits = self.var.apply(
                {"params": params}, labels, x_in,
                p_drop_factor=self.tcfg.p_drop_factor, train=True,
                prog_si=prog_si,
                rngs={"sample": k_s, "droppath": k_dp})
            loss, acc, tail = self._ce_and_acc(logits, gt_BL,
                                               self.tcfg.label_smooth,
                                               prog_si, prog_wp)
            return loss, (acc, tail)

        (loss, (acc, tail_acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        gnorm = optax.global_norm(grads)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = (ema_update(state.ema_params, new_params)
                   if state.ema_params is not None else None)
        metrics = dict(loss=loss, acc_mean=acc, acc_tail=tail_acc,
                       grad_norm=gnorm)
        return VARTrainState(new_params, new_opt, state.vae_params, new_ema,
                             state.step + 1), metrics

    @partial(jax.jit, static_argnums=(0,))
    def eval_step(self, params, vae_params, imgs, labels):
        """Validation step (reference eval_ep body, trainer.py:58-101):
        val CE mean/tail and token-accuracy mean/tail with label_smooth=0,
        averaged over PQ branches — returned as per-sample (B,) vectors so
        the host loop (``eval/validation.var_eval_ep``) can slice padded
        ragged batches exactly before the global average."""
        idx_P = self.vae.apply({"params": vae_params}, imgs,
                               method=VQModel.img_to_idxBl)
        gt_BL = [jnp.concatenate(branch, axis=1) for branch in idx_P]
        x_in = self.vae.apply({"params": vae_params}, idx_P,
                              method=VQModel.idxBl_to_var_input)
        logits = self.var.apply({"params": params}, labels, x_in)
        p = self.var.config.product_quant
        v = logits.shape[-1] // p
        out = {k: 0.0 for k in ("L_mean", "L_tail", "acc_mean", "acc_tail")}
        for i, gt in enumerate(gt_BL):
            lg = logits[..., i * v:(i + 1) * v].astype(jnp.float32)
            logp = jax.nn.log_softmax(lg, axis=-1)
            nll = -jnp.take_along_axis(logp, gt[..., None], axis=-1)[..., 0]
            correct = (jnp.argmax(lg, axis=-1) == gt).astype(jnp.float32)
            out["L_mean"] += jnp.mean(nll, axis=-1)
            out["L_tail"] += jnp.mean(nll[:, -self.last_l:], axis=-1)
            out["acc_mean"] += jnp.mean(correct, axis=-1) * 100.0
            out["acc_tail"] += jnp.mean(correct[:, -self.last_l:],
                                        axis=-1) * 100.0
        return {k: val / p for k, val in out.items()}


def var_sample(var: VAR, var_params, vae: VQModel, vae_params, label_B,
               key, *, cfg_scale: float = 1.5, top_k: int = 0,
               top_p: float = 0.0, joint_sample: bool = False,
               more_smooth: bool = False):
    """CFG multiscale decode (var.py:145-233) -> images in [0, 1], NHWC.
    Jit the whole call; every stage has static shapes.

    ``more_smooth`` (var.py:196-225, flag surfaced at inference.py:32)
    replaces the hard argmax-code embedding with a gumbel-softmax-smoothed
    code mixture per PQ branch: tau = max(0.27*(1-ratio*0.95), 0.005)
    (mask-git schedule), logits scaled by (1+ratio) — the original VAR
    visualization recipe the reference documents."""
    cfg = var.config
    pns = cfg.patch_nums
    s = len(pns)
    p = cfg.product_quant
    b = label_B.shape[0]
    c_br = cfg.Cvae // p

    ntm, cond = var.apply({"params": var_params}, label_B,
                          method=VAR.begin_tokens)
    f_hat = jnp.zeros((b, pns[-1], pns[-1], cfg.Cvae), jnp.float32)
    caches = [(None, None)] * cfg.depth
    cur_l = 0
    for si, pn in enumerate(pns):
        logits, caches = var.apply({"params": var_params}, ntm, cond, caches,
                                   method=VAR.decode_stage)
        cur_l += pn * pn
        ratio = si / max(s - 1, 1)
        t = cfg_scale * ratio
        logits = (1 + t) * logits[:b] - t * logits[b:]
        key, *ks = jax.random.split(key, p + 1)
        if more_smooth:
            # gumbel-smoothed code mixtures instead of hard codes
            gum_t = max(0.27 * (1.0 - ratio * 0.95), 0.005)
            v = logits.shape[-1] // p
            hs = []
            for i in range(p):
                sm = gumbel_softmax(
                    logits[..., i * v:(i + 1) * v] * (1.0 + ratio),
                    ks[i], tau=gum_t)
                h = vae.apply({"params": vae_params}, i, sm,
                              method=VQModel.soft_embed_branch)
                hs.append(h.reshape(b, pn, pn, c_br))
            idx_list = None
        elif joint_sample and p == 2:
            # PQ joint sampling (var.py:196-209): outer product of per-branch
            # filtered distributions, one draw from the joint.
            v = logits.shape[-1] // 2
            p1 = sample_with_top_k_top_p(logits[..., :v], ks[0], top_k, top_p,
                                         return_p=True)
            p2 = sample_with_top_k_top_p(logits[..., v:], ks[0], top_k, top_p,
                                         return_p=True)
            joint = (p1[..., :, None] * p2[..., None, :]).reshape(
                b, pn * pn, v * v)
            idx = jax.random.categorical(ks[1], jnp.log(joint + 1e-20), axis=-1)
            idx_list = [idx // v, idx % v]
        else:
            v = logits.shape[-1] // p
            idx_list = [
                sample_with_top_k_top_p(logits[..., i * v:(i + 1) * v],
                                        ks[i], top_k, top_p)
                for i in range(p)
            ]
        if idx_list is not None:  # hard-code path (more_smooth built hs)
            hs = []
            for i, idx in enumerate(idx_list):
                h = vae.apply({"params": vae_params}, i, idx, si,
                              method=VQModel.embed_branch)
                hs.append(h.reshape(b, pn, pn, c_br))
        h_all = jnp.concatenate(hs, axis=-1)
        f_hat, next_map = vae.apply({"params": vae_params}, si, s, f_hat, h_all,
                                    method=VQModel.get_next_autoregressive_input)
        if si != s - 1:
            ntm = var.apply({"params": var_params}, next_map, cur_l, pns[si + 1],
                            method=VAR.next_stage_input)
    img = vae.apply({"params": vae_params}, f_hat, method=VQModel.fhat_to_img)
    return img * 0.5 + 0.5
