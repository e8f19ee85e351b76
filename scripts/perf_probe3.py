"""MLP sub-layer ablations: where does the exact-gelu cost come from?"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BATCH = 64
L = 513
D = 768
HID = 3072
ITERS = 10


def timed_loop(name, step, *args, iters=ITERS):
    def chained(n):
        @jax.jit
        def fn(*a):
            out = jax.lax.fori_loop(
                0, n, lambda i, xx: step(*a[:-1], xx).astype(a[-1].dtype), a[-1])
            return jnp.sum(out.astype(jnp.float32).ravel()[:1])

        return fn

    short, long_ = chained(1), chained(1 + iters)
    float(short(*args))
    float(long_(*args))

    def t(fn):
        t0 = time.time()
        float(fn(*args))
        return time.time() - t0

    t1 = min(t(short) for _ in range(3))
    t2 = min(t(long_) for _ in range(3))
    dt = max(t2 - t1, 1e-9) / iters
    print(f"{name:46s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def mlp12(act, w1, b1, w2, b2, x):
    def body(i, t):
        h = t @ w1 + b1
        h = act(h)
        return (h @ w2 + b2).astype(t.dtype)
    return jax.lax.fori_loop(0, 12, body, x)


def _erf_as(x):
    """Abramowitz&Stegun 7.1.26 erf, |err|<=1.5e-7 (fp32, exp-based)."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_exact(h):  # h fp32
    return h * 0.5 * (1.0 + _erf_as(h * 0.7071067811865476))


# ---- fused pallas MLP: x @ W1 -> gelu -> @ W2, blocked over rows ----
def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[...]
    h = jax.lax.dot_general(x, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1_ref[...]
    h = _gelu_exact(h).astype(x.dtype)
    o = jax.lax.dot_general(h, w2_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[...] = (o + b2_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("blk",))
def fused_mlp(x, w1, b1, w2, b2, blk=1024):
    bn, d = x.shape
    nblk = -(-bn // blk)
    return pl.pallas_call(
        _mlp_kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((blk, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, HID), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((HID,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((HID, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bn, d), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20),
    )(x, w1, b1, w2, b2)


def main():
    key = jax.random.PRNGKey(0)
    x3 = jax.random.normal(key, (BATCH, L, D), jnp.bfloat16)
    x2 = x3.reshape(BATCH * L, D)
    w1 = jax.random.normal(key, (D, HID), jnp.bfloat16) * 0.02
    b1 = jnp.zeros((HID,), jnp.float32)
    w2 = jax.random.normal(key, (HID, D), jnp.bfloat16) * 0.02
    b2 = jnp.zeros((D,), jnp.float32)

    exact = lambda h: jax.nn.gelu(h, approximate=False)
    tanh = lambda h: jax.nn.gelu(h, approximate=True)
    exact32 = lambda h: jax.nn.gelu(h.astype(jnp.float32), approximate=False)

    timed_loop("12x MLP, exact gelu (XLA)", functools.partial(mlp12, exact),
               w1, b1, w2, b2, x3)
    timed_loop("12x MLP, tanh gelu (XLA)", functools.partial(mlp12, tanh),
               w1, b1, w2, b2, x3)
    timed_loop("12x MLP, exact gelu fp32 (XLA)",
               functools.partial(mlp12, exact32), w1, b1, w2, b2, x3)

    def pall12(w1, b1, w2, b2, x, blk):
        def body(i, t):
            return fused_mlp(t, w1, b1, w2, b2, blk=blk).astype(t.dtype)
        return jax.lax.fori_loop(0, 12, body, x)

    for blk in (512, 1024, 2048):
        timed_loop(f"12x MLP, pallas fused exact (blk={blk})",
                   functools.partial(pall12, blk=blk), w1, b1, w2, b2, x2)


if __name__ == "__main__":
    main()
