"""GAN objectives + regularizers (reference ``vq_loss.py:18-78``).

Pure functions; LeCam EMA state is threaded through the train step (the
reference mutates python floats on the module, ``vq_loss.py:64-78``)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = [
    "hinge_d_loss", "vanilla_d_loss", "non_saturating_d_loss",
    "hinge_gen_loss", "non_saturating_gen_loss", "adopt_weight",
    "LeCamState", "lecam_update", "lecam_reg", "adaptive_disc_weight",
    "D_LOSSES", "G_LOSSES",
]


def hinge_d_loss(logits_real, logits_fake):
    loss_real = jnp.mean(jax.nn.relu(1.0 - logits_real))
    loss_fake = jnp.mean(jax.nn.relu(1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (
        jnp.mean(jax.nn.softplus(-logits_real)) + jnp.mean(jax.nn.softplus(logits_fake))
    )


def _bce_logits(target, logits):
    # F.binary_cross_entropy_with_logits(target, logits) — NOTE the reference
    # passes (ones_like(x), x) i.e. target-first/input-second SWAPPED
    # (vq_loss.py:33-34). torch treats arg0 as input; we replicate the actual
    # computation: bce(input=target_const, target=logits).
    return jnp.mean(
        jnp.clip(target, 0, None) - target * logits + jnp.logaddexp(0.0, -jnp.abs(target))
    )


def non_saturating_d_loss(logits_real, logits_fake):
    loss_real = _bce_logits(jnp.ones_like(logits_real), logits_real)
    loss_fake = _bce_logits(jnp.zeros_like(logits_fake), logits_fake)
    return 0.5 * (loss_real + loss_fake)


def hinge_gen_loss(logits_fake):
    return -jnp.mean(logits_fake)


def non_saturating_gen_loss(logits_fake):
    return _bce_logits(jnp.ones_like(logits_fake), logits_fake)


D_LOSSES = {"hinge": hinge_d_loss, "vanilla": vanilla_d_loss,
            "non-saturating": non_saturating_d_loss}
G_LOSSES = {"hinge": hinge_gen_loss, "non-saturating": non_saturating_gen_loss}


def adopt_weight(weight, global_step, threshold=0, value=0.0):
    """Disc warm start (vq_loss.py:47): weight until step>=threshold else value."""
    return jnp.where(jnp.asarray(global_step) < threshold, value, weight)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LeCamState:
    logits_real_ema: jnp.ndarray
    logits_fake_ema: jnp.ndarray

    @staticmethod
    def init():
        return LeCamState(jnp.zeros(()), jnp.zeros(()))


def lecam_update(state: LeCamState, logits_real, logits_fake, decay=0.999):
    return LeCamState(
        state.logits_real_ema * decay + jnp.mean(logits_real) * (1 - decay),
        state.logits_fake_ema * decay + jnp.mean(logits_fake) * (1 - decay),
    )


def lecam_reg(logits_real, logits_fake, state: LeCamState):
    return jnp.mean(jnp.square(jax.nn.relu(logits_real - state.logits_fake_ema))) + \
        jnp.mean(jnp.square(jax.nn.relu(state.logits_real_ema - logits_fake)))


def adaptive_disc_weight(nll_grad, g_grad, eps=1e-4):
    """Reference calculate_adaptive_weight (vq_loss.py:153-159):
    ||d nll/dW|| / (||d g/dW|| + eps) clamped to [0, 1e4], stop-gradient."""
    w = jnp.linalg.norm(nll_grad.ravel()) / (jnp.linalg.norm(g_grad.ravel()) + eps)
    return jax.lax.stop_gradient(jnp.clip(w, 0.0, 1e4))
