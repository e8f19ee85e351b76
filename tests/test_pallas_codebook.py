"""Pallas fused codebook lookup: interpret-mode parity with the XLA path
(compiled-TPU parity is exercised by the verify drive / bench)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagefolder_tpu.ops.pallas.codebook import codebook_argmin


@pytest.mark.parametrize("n,c,v", [(1000, 32, 4096), (257, 8, 100),
                                   (64, 64, 16384), (16, 12, 64)])
def test_interpret_matches_xla(n, c, v):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, c))
    cb = jax.random.normal(jax.random.PRNGKey(1), (v, c))
    d = (jnp.sum(x ** 2, -1, keepdims=True) + jnp.sum(cb ** 2, -1)
         - 2 * x @ cb.T)
    want = jnp.argmin(d, -1)
    got = codebook_argmin(x, cb, interpret=True, tile_n=128, tile_v=512)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_interpret_cosine_and_tie_breaking():
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (100, 16))
    cb = jax.random.normal(jax.random.PRNGKey(3), (128, 16))
    # force exact ties: duplicate the codebook — argmin must pick the FIRST
    cb = jnp.concatenate([cb, cb], axis=0)
    xn = x / jnp.linalg.norm(x, -1, keepdims=True)
    cbn = cb / jnp.linalg.norm(cb, -1, keepdims=True)
    want = jnp.argmax(xn @ cbn.T, -1)
    got = codebook_argmin(xn, cbn, maximize=True, interpret=True,
                          tile_n=64, tile_v=64)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert int(got.max()) < 128  # first duplicate always wins
