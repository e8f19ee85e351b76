"""Torch-parity parameter initializers for flax modules.

The reference relies on PyTorch's default inits (kaiming-uniform convs/linears,
uniform codebooks); matching them keeps training dynamics comparable."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def conv_kaiming_uniform(key, shape, dtype=jnp.float32):
    """PyTorch nn.Conv2d default weight init for flax NHWC kernels (H, W, Cin, Cout):
    kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    fan_in = int(np.prod(shape[:-1]))
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def conv_bias_uniform(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def linear_kaiming_uniform(key, shape, dtype=jnp.float32):
    """PyTorch nn.Linear default for flax (in, out) kernels."""
    fan_in = shape[0]
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def uniform_range(lo: float, hi: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, lo, hi)

    return init


def trunc_normal(std: float):
    def init(key, shape, dtype=jnp.float32):
        # torch trunc_normal_: truncation at +-2 std
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)

    return init
