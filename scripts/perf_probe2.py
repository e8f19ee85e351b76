"""Block-level ablations: where do the 46ms/stack of non-GEMM time go?"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import flax.linen as nn
import jax
import jax.numpy as jnp

BATCH = 64
L = 513
D = 768
H = 12
ITERS = 10


def timed_loop(name, step, *args, iters=ITERS):
    def chained(n):
        @jax.jit
        def fn(*a):
            out = jax.lax.fori_loop(0, n, lambda i, xx: step(*a[:-1], xx), a[-1])
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
    print(f"{name:48s} {dt*1e3:8.2f} ms/iter", flush=True)
    return dt


class BlockVar(nn.Module):
    attn_mode: str = "pallas"  # pallas | xla | none
    gelu_exact: bool = True
    ln: bool = True

    @nn.compact
    def __call__(self, x):
        dt = jnp.bfloat16

        def _ln(name):
            return nn.LayerNorm(epsilon=1e-6, dtype=dt, param_dtype=jnp.float32,
                                name=name)

        c = D
        h = _ln("norm1")(x) if self.ln else x
        qkv = nn.Dense(3 * c, dtype=dt, param_dtype=jnp.float32, name="qkv")(h)
        if self.attn_mode == "none":
            out = qkv[..., :c]
        else:
            b, n, _ = qkv.shape
            qkv4 = qkv.reshape(b, n, 3, H, c // H)
            q, k, v = qkv4[:, :, 0], qkv4[:, :, 1], qkv4[:, :, 2]
            if self.attn_mode == "pallas":
                from imagefolder_tpu.ops.pallas.attention import fused_attention
                out = fused_attention(q, k, v)
            else:
                out = jax.nn.dot_product_attention(q, k, v)
            out = out.reshape(b, n, c)
        out = nn.Dense(c, dtype=dt, param_dtype=jnp.float32, name="proj")(out)
        out = out * self.param("ls1", nn.initializers.constant(1e-5), (c,))
        x = x + out
        h = _ln("norm2")(x) if self.ln else x
        h = nn.Dense(4 * c, dtype=dt, param_dtype=jnp.float32, name="fc1")(h)
        h = nn.gelu(h, approximate=not self.gelu_exact)
        h = nn.Dense(c, dtype=dt, param_dtype=jnp.float32, name="fc2")(h)
        h = h * self.param("ls2", nn.initializers.constant(1e-5), (c,))
        return x + h


def stack12(mod, v, t):
    def body(i, tt):
        return mod.apply(v, tt).astype(jnp.bfloat16)
    return jax.lax.fori_loop(0, 12, body, t)


def main():
    key = jax.random.PRNGKey(0)
    tok = jax.random.normal(key, (BATCH, L, D), jnp.bfloat16)

    for name, kw in [
        ("pallas attn, exact gelu, LN (current)", dict()),
        ("xla attn", dict(attn_mode="xla")),
        ("NO attn", dict(attn_mode="none")),
        ("pallas, tanh gelu", dict(gelu_exact=False)),
        ("pallas, no LN", dict(ln=False)),
        ("NO attn, tanh gelu, no LN", dict(attn_mode="none", gelu_exact=False, ln=False)),
    ]:
        mod = BlockVar(**kw)
        v = jax.jit(mod.init)(key, tok)
        timed_loop("12x block: " + name,
                   functools.partial(stack12, mod), v, tok)


if __name__ == "__main__":
    main()
