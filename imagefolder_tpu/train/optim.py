"""Optimizers, schedules, and parameter-group labeling.

Covers the reference's three optimizer recipes:
* tokenizer: AdamW + timm cosine schedule w/ warmup + min_lr, lr scaled by
  global_batch/128 (xqgan_train.py:338-373)
* VAR: AdamW(0.9, 0.95) + lr_wd_annealing warmup/{cos,lin,exp} schedules with
  per-group decay filtering (utils/lr_control.py)
* RAR: AdamW + cosine with end_lr (utils/train_utils.py:194-250)

Freezing (teachers, LoRA bases, tuning_method='frozen') is expressed as
optax.multi_transform labels — params stay in the tree (checkpoint-compatible)
but receive zero updates.
"""

from __future__ import annotations

import re
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

__all__ = [
    "cosine_with_warmup",
    "lr_wd_annealing",
    "wd_cosine_anneal",
    "adamw_with_freezing",
    "tokenizer_frozen_predicate",
    "disc_frozen_predicate",
    "no_decay_predicate",
    "ema_update",
    "ema_decay_schedule",
]


def cosine_with_warmup(base_lr: float, warmup_steps: int, total_steps: int,
                       min_lr: float = 5e-5):
    """timm create_scheduler('cosine') parity: linear warmup then cosine to
    min_lr (xqgan_train.py:344-366)."""
    warmup_steps = max(warmup_steps, 1)

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * step / warmup_steps
        prog = jnp.clip((step - warmup_steps) / max(total_steps - warmup_steps, 1), 0, 1)
        cos = min_lr + 0.5 * (base_lr - min_lr) * (1 + jnp.cos(jnp.pi * prog))
        return jnp.where(step < warmup_steps, warm, cos)

    return sched


def lr_wd_annealing(sched_type: str, peak_lr: float, wp_steps: float,
                    max_steps: int, final_lr_ratio: float = 0.0,
                    wp0: float = 0.005):
    """Reference lr_wd_annealing schedule family (utils/lr_control.py:10-68).
    Returns lr(step). Warmup is the reference's wp0 + (1-wp0)*it/wp ramp."""

    def sched(step):
        g = jnp.asarray(step, jnp.float32)
        wp = max(round(wp_steps), 1.0)
        warm = wp0 + (1 - wp0) * g / wp
        pasd = jnp.clip((g - wp) / max(max_steps - 1 - wp, 1), 0.0, 1.0)
        if sched_type == "cos":
            rest = final_lr_ratio + (1 - final_lr_ratio) * (0.5 + 0.5 * jnp.cos(jnp.pi * pasd))
        elif sched_type == "lin":
            t = 0.15
            rest = jnp.where(pasd < t, 1.0,
                             final_lr_ratio + (1 - final_lr_ratio) * (1 - pasd) / (1 - t))
        elif sched_type == "lin0":
            t = 0.05
            rest = jnp.where(pasd < t, 1.0,
                             final_lr_ratio + (1 - final_lr_ratio) * (1 - pasd) / (1 - t))
        elif sched_type == "lin00":
            rest = final_lr_ratio + (1 - final_lr_ratio) * (1 - pasd)
        elif sched_type.startswith("lin"):
            # generic linT: ramp to the midpoint over the first T, then
            # linear to final (lr_control.py:31-36)
            t = float(sched_type[3:])
            wpe_mid = final_lr_ratio + (1 - final_lr_ratio) * (1 - t)
            wpe_mid = (1 + wpe_mid) / 2
            rest = jnp.where(
                pasd < t,
                1 + (wpe_mid - 1) * pasd / t,
                final_lr_ratio + (wpe_mid - final_lr_ratio) * (1 - pasd) / (1 - t))
        elif sched_type == "exp":
            t = 0.15
            w = jnp.clip((pasd - t) / (1 - t), 0.0, 1.0)
            rest = jnp.exp(jnp.log(jnp.maximum(final_lr_ratio, 1e-5)) * w)
        else:  # constant
            rest = jnp.ones(())
        return peak_lr * jnp.where(g < wp, warm, rest)

    return sched


def wd_cosine_anneal(wd: float, wd_end: float, max_steps: int):
    """Reference cosine weight-decay anneal (utils/lr_control.py:47-48):
    ``wd_end + (wd - wd_end) * (0.5 + 0.5*cos(pi * it/(max_it-1)))`` — note
    the anneal spans the FULL run including warmup, unlike the lr leg.
    Reference default is constant (arg_util.py:303: twde==0 -> twde=twd)."""

    def sched(step):
        pasd = jnp.asarray(step, jnp.float32) / max(max_steps - 1, 1)
        return wd_end + (wd - wd_end) * (0.5 + 0.5 * jnp.cos(jnp.pi * pasd))

    return sched


def _scheduled_weight_decay(wd_fn, wd_sc: float = 1.0):
    """Decoupled weight decay whose coefficient follows a schedule (optax
    add_decayed_weights takes only a constant)."""

    def init_fn(params):
        del params
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("scheduled weight decay requires params")
        wd = wd_fn(state.count) * wd_sc
        updates = jax.tree.map(lambda u, p: u + wd * p, updates, params)
        return updates, optax.ScaleByScheduleState(
            count=optax.safe_int32_increment(state.count))

    return optax.GradientTransformation(init_fn, update_fn)


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def tokenizer_frozen_predicate(cfg) -> Callable[[str], bool]:
    """Which generator params get no updates: frozen teachers always; encoder/
    decoder trunks under 'frozen'/'lora' tuning (reference peft freezing,
    dinov2.py:54-79: lora trains only adapters + final norm)."""

    def frozen(path: str) -> bool:
        if path.startswith(("semantic_model/", "detail_model/")):
            return True
        for part, method in (("encoder/", cfg.enc_tuning_method),
                             ("decoder/", cfg.dec_tuning_method)):
            if path.startswith(part):
                if method == "frozen":
                    return True
                if method in ("lora", "lat_lora"):
                    trainable = (
                        "lora_a" in path or "lora_b" in path
                        or re.search(r"/model/norm/", path) is not None
                        or not path.startswith(part + "model/")  # latent tokens etc.
                    )
                    return not trainable
        return False

    return frozen


def disc_frozen_predicate(path: str) -> bool:
    """DinoDisc trunk is frozen (discriminator_dino.py:316-317)."""
    return path.startswith("dino/")


def no_decay_predicate(path: str) -> bool:
    """Reference filter_params (utils/lr_control.py:71-108): no weight decay
    for biases, norms, embeddings/codebooks, tokens, scales."""
    leaf = path.rsplit("/", 1)[-1]
    return (
        leaf in {"bias", "scale", "codebook", "cls_token", "pos_embed",
                 "latent_tokens", "latent_pos_embed", "mask_token", "lvl_embed",
                 "ls1", "ls2", "pos_start", "pos_1LC", "class_emb", "empty_emb",
                 "scale_mul"}
        or "norm" in path.rsplit("/", 2)[-2:][0].lower()
    )


def adamw_with_freezing(
    lr_schedule,
    *,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    frozen_fn: Optional[Callable[[str], bool]] = None,
    grad_clip: float = 0.0,
    eps: float = 1e-8,
    grad_accum_steps: int = 1,
    weight_decay_end: Optional[float] = None,
    total_steps: Optional[int] = None,
    groups=None,
):
    """AdamW where decay skips no-decay groups and frozen params get zero
    updates. Labels are derived from param paths.

    weight_decay_end (+ total_steps): cosine-anneal wd -> wd_end over the run
    (reference utils/lr_control.py:47-48; constant when None/equal, matching
    arg_util.py:303's twde-defaults-to-twd).
    groups: optional ``{name: (predicate(path)->bool, lr_sc, wd_sc)}`` —
    reference per-group scaling (lr_control.py:55-60); predicates are checked
    in insertion order before the default decay/no-decay split.
    grad_clip clips ONE global norm over all trainable params (reference
    utils/amp_sc.py:50-55); frozen leaves are zeroed first so teacher grads
    don't pollute the norm.
    """
    groups = dict(groups or {})
    anneal_wd = (weight_decay_end is not None
                 and weight_decay_end != weight_decay)
    if anneal_wd and not total_steps:
        raise ValueError("weight_decay_end requires total_steps")
    wd_fn = (wd_cosine_anneal(weight_decay, weight_decay_end, total_steps)
             if anneal_wd else None)

    def frozen_path(p: str) -> bool:
        return frozen_fn is not None and frozen_fn(p)

    def label_tree(params):
        def label(path, _):
            p = _path_str(path)
            if frozen_path(p):
                return "frozen"
            for name, (pred, _lr_sc, _wd_sc) in groups.items():
                if pred(p):
                    return name
            return "nodecay" if no_decay_predicate(p) else "default"

        return jax.tree_util.tree_map_with_path(label, params)

    def make(lr_sc, wd_sc):
        chain = [optax.scale_by_adam(b1=b1, b2=b2, eps=eps)]
        if wd_sc:
            if wd_fn is not None:
                chain.append(_scheduled_weight_decay(wd_fn, wd_sc))
            elif weight_decay:
                chain.append(optax.add_decayed_weights(weight_decay * wd_sc))
        if lr_sc == 1.0:
            sched = lr_schedule
        elif callable(lr_schedule):
            sched = lambda s: lr_schedule(s) * lr_sc  # noqa: E731
        else:
            sched = lr_schedule * lr_sc
        chain.append(optax.scale_by_learning_rate(sched))
        return optax.chain(*chain)

    transforms = {"default": make(1.0, 1.0), "nodecay": make(1.0, 0.0),
                  "frozen": optax.set_to_zero()}
    for name, (_pred, lr_sc, wd_sc) in groups.items():
        transforms[name] = make(lr_sc, wd_sc)

    tx = optax.multi_transform(transforms, label_tree)
    if grad_clip > 0:
        def frozen_mask(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: frozen_path(_path_str(path)), params)

        pre = ([optax.masked(optax.set_to_zero(), frozen_mask)]
               if frozen_fn is not None else [])
        tx = optax.chain(*pre, optax.clip_by_global_norm(grad_clip), tx)
    if grad_accum_steps > 1:
        # reference AmpOptimizer grad accumulation (utils/amp_sc.py:39-66)
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_steps)
    return tx


def ema_update(ema_params, params, decay=0.9999):
    """Reference update_ema (utils/ema.py:5-14) over the full param tree.
    decay may be a python float or a traced scalar (schedule below)."""
    return jax.tree.map(lambda e, p: e * decay + p * (1.0 - decay), ema_params, params)


def ema_decay_schedule(optimization_step, *, decay: float = 0.9999,
                       min_decay: float = 0.0, update_after_step: int = 0,
                       use_ema_warmup: bool = False, inv_gamma: float = 1.0,
                       power: float = 2.0 / 3.0):
    """open-muse EMAModel.get_decay (RAR/modules/ema_model.py:95-109).

    ``optimization_step`` is the step counter AFTER the increment performed at
    the top of EMAModel.step() — i.e. pass ``state.step + 1`` from a trainer
    whose state.step is the number of completed updates. Without warmup the
    decay still ramps as (1+s)/(10+s) capped at ``decay``; with warmup it is
    the power-law 1 - (1 + s/inv_gamma)^-power. s <= 0 gives decay 0 (EMA is
    a copy of the params until ``update_after_step`` passes)."""
    s = jnp.maximum(
        0, jnp.asarray(optimization_step) - update_after_step - 1
    ).astype(jnp.float32)
    if use_ema_warmup:
        cur = 1.0 - (1.0 + s / inv_gamma) ** (-power)
    else:
        cur = (1.0 + s) / (10.0 + s)
    cur = jnp.clip(cur, min_decay, decay)
    return jnp.where(s <= 0, 0.0, cur)
