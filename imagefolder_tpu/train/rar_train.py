"""RAR training (reference ``utils/train_utils.py:641`` loop +
``scripts/train_rar.py``): AR loss over randomized-permutation sequences,
EMA, cosine schedule with end_lr, random-ratio annealing."""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax

from imagefolder_tpu.models.rar import RAR, ar_loss
from imagefolder_tpu.train.optim import (
    adamw_with_freezing,
    ema_decay_schedule,
    ema_update,
)

__all__ = ["RARTrainConfig", "RARTrainState", "RARTrainer",
           "get_rar_random_ratio"]


def get_rar_random_ratio(start, end, cur_step):
    """Randomness annealing 1 -> 0 (reference train_utils.py:630-638)."""
    if cur_step < start:
        return 1.0
    if cur_step > end:
        return 0.0
    return 1.0 - (cur_step - start) / max(end - start, 1)


@dataclasses.dataclass
class RARTrainConfig:
    lr: float = 4e-4
    end_lr: float = 1e-5
    weight_decay: float = 0.03
    beta1: float = 0.9
    beta2: float = 0.96
    grad_clip: float = 1.0
    warmup_steps: int = 62_500
    total_steps: int = 250_000
    class_label_dropout: float = 0.1
    # open-muse EMAModel schedule (RAR/modules/ema_model.py:18-109; the RAR
    # recipe instantiates EMAModel(decay=0.999), utils/train_utils.py:144)
    ema_decay: float = 0.999
    ema_min_decay: float = 0.0
    ema_update_after_step: int = 0
    ema_update_every: int = 1
    ema_warmup: bool = False  # power-law warmup instead of (1+s)/(10+s)
    ema_inv_gamma: float = 1.0
    ema_power: float = 2.0 / 3.0
    random_ratio_anneal_start: int = 0
    random_ratio_anneal_end: int = 125_000


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RARTrainState:
    params: Any
    opt_state: Any
    ema_params: Any
    step: jnp.ndarray


class RARTrainer:
    def __init__(self, rar: RAR, tcfg: RARTrainConfig):
        self.rar = rar
        self.tcfg = tcfg
        sched = optax.warmup_cosine_decay_schedule(
            0.0, tcfg.lr, tcfg.warmup_steps, tcfg.total_steps,
            end_value=tcfg.end_lr)
        self.tx = adamw_with_freezing(
            sched, weight_decay=tcfg.weight_decay, b1=tcfg.beta1,
            b2=tcfg.beta2, grad_clip=tcfg.grad_clip)

    # jitted: one compile instead of an eager per-primitive dispatch cascade
    @partial(jax.jit, static_argnums=(0,))
    def init(self, rng, sample_tokens, sample_labels) -> RARTrainState:
        params = self.rar.init(
            {"params": rng}, sample_tokens,
            sample_labels + self.rar.config.codebook_size + 1)["params"]
        return RARTrainState(params=params, opt_state=self.tx.init(params),
                             ema_params=jax.tree.map(jnp.copy, params),
                             step=jnp.zeros((), jnp.int32))

    # state donated: old+new params/opt/EMA never coexist in HBM (RAR-B
    # at B=16 OOM'd a 16GB chip without this)
    @partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
    def train_step(self, state: RARTrainState, tokens, labels, rng,
                   random_ratio):
        cfg = self.rar.config
        k_cond, k_ord = jax.random.split(rng)
        cond = self.rar.apply({"params": state.params}, labels, k_cond,
                              self.tcfg.class_label_dropout,
                              method=RAR.preprocess_condition)
        orders = self.rar.apply({"params": state.params}, k_ord,
                                tokens.shape[0], random_ratio,
                                method=RAR.sample_orders)

        def loss_fn(params):
            logits, shuffled_labels = self.rar.apply(
                {"params": params}, tokens, cond, orders=orders)
            loss, acc = ar_loss(logits, shuffled_labels)
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        gnorm = optax.global_norm(grads)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # EMAModel.step(): the counter increments before get_decay, so the
        # decay at our completed-update count t uses optimization_step = t+1;
        # skipped steps (update_every) keep the shadow params (decay = 1)
        tc = self.tcfg
        decay = ema_decay_schedule(
            state.step + 1, decay=tc.ema_decay, min_decay=tc.ema_min_decay,
            update_after_step=tc.ema_update_after_step,
            use_ema_warmup=tc.ema_warmup, inv_gamma=tc.ema_inv_gamma,
            power=tc.ema_power)
        if tc.ema_update_every > 1:
            decay = jnp.where(state.step % tc.ema_update_every == 0, decay, 1.0)
        new_ema = ema_update(state.ema_params, new_params, decay)
        metrics = dict(loss=loss, correct_tokens=acc, grad_norm=gnorm)
        return RARTrainState(new_params, new_opt, new_ema, state.step + 1), metrics
