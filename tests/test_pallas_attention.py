"""Fused attention kernel: interpret-mode parity with XLA attention
(compiled-TPU exactness is covered by the verify drives)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imagefolder_tpu.ops.pallas.attention import fused_attention


@pytest.mark.parametrize("lq,lk", [(37, 37), (16, 48), (513, 513)])
def test_interpret_matches_xla(lq, lk):
    key = jax.random.PRNGKey(0)
    b, h, hd = 2, 3, 64
    q = jax.random.normal(key, (b, lq, h, hd))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, lk, h, hd))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, lk, h, hd))
    want = jax.nn.dot_product_attention(q, k, v)
    got = fused_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_interpret_with_bias_and_grad():
    key = jax.random.PRNGKey(0)
    b, l, h, hd = 2, 12, 2, 64
    q = jax.random.normal(key, (b, l, h, hd))
    bias = jnp.where(jnp.arange(l)[:, None] >= jnp.arange(l)[None, :],
                     0.0, -jnp.inf)[None, None]
    want = jax.nn.dot_product_attention(q, q, q, bias=bias)
    got = fused_attention(q, q, q, bias=bias, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # the dispatching wrapper is differentiable (XLA-recompute VJP)
    from imagefolder_tpu.ops.pallas.attention import _fused_attention_diff

    def loss(qq):
        return jnp.sum(jax.nn.dot_product_attention(qq, qq, qq) ** 2)

    g_want = jax.grad(loss)(q)
    # on CPU the wrapper routes to XLA; check gradient parity of the custom
    # vjp path directly in interpret-land is covered by the XLA recompute,
    # so just assert finiteness through the public wrapper
    from imagefolder_tpu.ops.pallas.attention import dot_product_attention

    g = jax.grad(lambda qq: jnp.sum(dot_product_attention(qq, qq, qq) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_want), rtol=1e-4,
                               atol=1e-5)


# ---------------------------------------------------------------------------
# Pallas backward kernels: interpret-mode gradient parity vs the XLA VJP.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("use_bias", [False, True])
def test_bnhd_backward_kernel_matches_xla_vjp(use_bias):
    from imagefolder_tpu.ops.pallas.attention import _fused_attention_bwd_impl

    b, l, h, hd = 2, 37, 3, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (b, l, h, hd))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, l, h, hd))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, l, h, hd))
    g = jax.random.normal(jax.random.PRNGKey(3), (b, l, h, hd))
    bias = None
    if use_bias:
        mask = jnp.where(jnp.arange(l)[:, None] >= jnp.arange(l)[None, :],
                         0.0, -1e9)[None, None]
        bias = mask + 0.1 * jax.random.normal(jax.random.PRNGKey(4),
                                              (1, 1, l, l))

    def f(qq, kk, vv, bb):
        return jax.nn.dot_product_attention(qq, kk, vv, bias=bb)

    _, vjp = jax.vjp(f, q, k, v, bias)
    want = vjp(g)
    got = _fused_attention_bwd_impl(q, k, v, bias, g, interpret=True)
    for w, a, name in zip(want, got, ("dq", "dk", "dv", "dbias")):
        if w is None:
            assert a is None
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(w), rtol=1e-4,
                                   atol=1e-4, err_msg=name)


@pytest.mark.parametrize("use_bias", [False, True])
def test_packed_qkv_backward_kernel_matches_xla_vjp(use_bias):
    from imagefolder_tpu.ops.pallas.attention import (
        _attention_qkv_bwd_impl, _qkv_xla)

    b, n, h, hd = 2, 53, 4, 32
    c = h * hd
    qkv = jax.random.normal(jax.random.PRNGKey(0), (b, n, 3 * c))
    g = jax.random.normal(jax.random.PRNGKey(1), (b, n, c))
    bias = None
    if use_bias:
        bias = 0.3 * jax.random.normal(jax.random.PRNGKey(2), (1, 1, n, n))

    _, vjp = jax.vjp(lambda a, bb: _qkv_xla(a, bb, h, None), qkv, bias)
    want = vjp(g)
    got = _attention_qkv_bwd_impl(qkv, bias, g, heads=h, scale=None,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               rtol=1e-4, atol=1e-4, err_msg="dqkv")
    if use_bias:
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                                   rtol=1e-4, atol=1e-4, err_msg="dbias")
    else:
        assert got[1] is None


def test_qblk_interpret_matches_xla():
    """Q-blocked 512px-regime kernels (VERDICT r2 #7): multi-block forward
    and backward vs XLA, with the score budget shrunk so a small L exercises
    real multi-block grids."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagefolder_tpu.ops.pallas import attention as A

    old = A._SCORE_TILE_BUDGET
    A._SCORE_TILE_BUDGET = 96 * 24  # -> 4 q-blocks at L=89
    try:
        key = jax.random.PRNGKey(0)
        b, l, h, hd = 2, 89, 3, 16  # unaligned L: exercises padding
        q, k, v = (jax.random.normal(kk, (b, l, h, hd), jnp.float32)
                   for kk in jax.random.split(key, 3))
        # block-causal-ish shared bias
        bias = jnp.where(
            jnp.tril(jnp.ones((l, l), bool)), 0.0, -jnp.inf
        )[None, None].astype(jnp.float32)

        want = jax.nn.dot_product_attention(q, k, v, bias=bias)
        got = A._fused_attention_qblk_fwd(q, k, v, bias, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
        # no-bias variant
        got2 = A._fused_attention_qblk_fwd(q, k, v, None, interpret=True)
        want2 = jax.nn.dot_product_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                                   rtol=2e-5, atol=2e-5)

        # backward: vs jax.vjp through XLA attention
        g = jax.random.normal(jax.random.PRNGKey(9), (b, l, h, hd))
        _, vjp = jax.vjp(
            lambda qq, kk, vv, bb: jax.nn.dot_product_attention(
                qq, kk, vv, bias=bb), q, k, v, bias)
        dq_w, dk_w, dv_w, db_w = vjp(g)
        dq, dk, dv, db = A._fused_attention_qblk_bwd(q, k, v, bias, g,
                                                     interpret=True)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_w),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_w),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_w),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(db), np.asarray(db_w),
                                   rtol=2e-4, atol=2e-4)
    finally:
        A._SCORE_TILE_BUDGET = old
