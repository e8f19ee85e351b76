"""Fused codebook nearest-neighbour lookup (Pallas TPU kernel).

The quantizer hot op (reference ``quant.py:98-101``): for N latent vectors
and a V-entry codebook, find argmin_v ||x - e_v||^2 (or argmax cosine for
znorm — callers pass pre-normalized inputs and ``maximize=True``).

Why a kernel: the XLA formulation materializes the (N, V) distance matrix in
HBM (e.g. 8192 x 16384 fp32 = 512 MB of write+read traffic per scale); this
kernel streams codebook tiles through VMEM, keeps the running (min, argmin)
in scratch, and writes only the (N,) indices. The distance matmul runs on the
MXU in fp32 (parity with the reference's fp32-fenced quantizer math).

Grid: (N/TN, V/TV), V innermost so scratch carries across codebook tiles.
Tie-breaking matches torch/jnp argmin (first occurrence): within a tile via
argmin, across tiles via strict <.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["codebook_argmin"]


def _kernel(x_ref, cb_ref, e2_ref, idx_ref, min_sc, arg_sc, *, tile_v, n_v):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        min_sc[:] = jnp.full_like(min_sc, jnp.inf)
        arg_sc[:] = jnp.zeros_like(arg_sc)

    x = x_ref[:]          # (TN, C) fp32
    cb = cb_ref[:]        # (TV, C) fp32
    # ||x-e||^2 = |x|^2 + |e|^2 - 2 x.e ; |x|^2 is argmin-invariant, dropped.
    dots = jax.lax.dot_general(
        x, cb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # fp32 operands on the MXU —
    # bf16 default would break argmin parity with the fp32 reference math
    dist = e2_ref[:] - 2.0 * dots  # (TN, TV)

    local_min = jnp.min(dist, axis=-1, keepdims=True)           # (TN, 1)
    local_arg = jnp.argmin(dist, axis=-1).astype(jnp.int32)     # (TN,)
    local_arg = (local_arg + j * tile_v)[:, None]

    better = local_min < min_sc[:]
    min_sc[:] = jnp.where(better, local_min, min_sc[:])
    arg_sc[:] = jnp.where(better, local_arg, arg_sc[:])

    @pl.when(j == n_v - 1)
    def _():
        idx_ref[:] = arg_sc[:]


@functools.partial(jax.jit, static_argnames=("maximize", "tile_n", "tile_v",
                                             "interpret"))
def codebook_argmin(x_NC: jnp.ndarray, codebook_VC: jnp.ndarray,
                    *, maximize: bool = False, tile_n: int = 512,
                    tile_v: int = 2048, interpret: bool = False):
    """Nearest codebook index per row.

    maximize=False: argmin ||x - e||^2. maximize=True: argmax x.e (callers
    normalize for cosine). Returns (N,) int32.
    """
    n, c = x_NC.shape
    v, _ = codebook_VC.shape
    x = x_NC.astype(jnp.float32)
    cb = codebook_VC.astype(jnp.float32)
    if maximize:
        # argmax x.e == argmin(-2 x.e + 0): reuse the kernel with e2=0, cb*1
        e2 = jnp.zeros((v,), jnp.float32)
        cb_eff = cb
    else:
        e2 = jnp.sum(jnp.square(cb), axis=-1)
        cb_eff = cb

    tile_n = min(tile_n, max(8, n))
    tile_v = min(tile_v, v)
    pad_n = (-n) % tile_n
    pad_v = (-v) % tile_v
    if pad_n:
        x = jnp.pad(x, ((0, pad_n), (0, 0)))
    if pad_v:
        cb_eff = jnp.pad(cb_eff, ((0, pad_v), (0, 0)))
        # padded codebook rows must never win
        e2 = jnp.pad(e2, (0, pad_v), constant_values=jnp.inf)
    np_, vp = x.shape[0], cb_eff.shape[0]
    n_v = vp // tile_v

    out = pl.pallas_call(
        functools.partial(_kernel, tile_v=tile_v, n_v=n_v),
        grid=(np_ // tile_n, n_v),
        in_specs=[
            pl.BlockSpec((tile_n, c), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_v, c), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_v), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((tile_n, 1), jnp.float32),
            pltpu.VMEM((tile_n, 1), jnp.int32),
        ],
        interpret=interpret,
    )(x, cb_eff, e2.reshape(1, -1))
    return out[:n, 0]
