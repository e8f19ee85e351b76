"""Fused single-block attention kernel for short sequences (Pallas TPU).

The tokenizer/generator sequences here are short (ViT: 513-770 tokens, VAR:
<=680, RAR: 258) — short enough that one (L, L) score tile fits in VMEM, so a
single-block fused kernel (scores -> softmax -> out, all on-chip) beats both
XLA's transpose-heavy lowering and flash-attention's streaming machinery
(which is built for L >> VMEM).

Grid: one program per (batch*heads). fp32 softmax, bf16 matmul operands.
Supports an optional additive bias (block-causal masks etc.) shared across
batch/heads or per-head.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_attention", "attention_qkv"]

# fp32 score elements (Lq*Lk) that fit a single-block kernel's VMEM tile;
# beyond this the q-blocked kernels (or XLA) take over
_SINGLE_MAX_ELEMS = 1 << 22


def _tpu_backend() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except RuntimeError:
        return False


# ---------------------------------------------------------------------------
# Packed-layout kernel: qkv in the natural Dense-output layout (B, N, 3C).
#
# The BNHD kernel above requires the caller to slice q/k/v out of the fused
# qkv projection and transpose to (B*H, L, hd) — at ViT-B/B=64 those layout
# moves cost ~30 ms per 12-block stack (measured), nearly 2x the attention
# math itself. This kernel instead consumes the qkv tensor exactly as the
# Dense layer produces it and emits (B, N, C) exactly as the out-projection
# consumes it: zero HBM layout traffic. Head-splitting happens in VMEM via
# static lane slices (cheap VPU relayouts).
# ---------------------------------------------------------------------------


def _qkv_kernel_impl(qkv_ref, b_ref, o_ref, *, scale, heads, n):
    slab = qkv_ref[0]  # (Np, 3C) — rows >= n are uninitialized block padding
    np_, c3 = slab.shape
    c = c3 // 3
    hd = c // heads
    row = jax.lax.broadcasted_iota(jnp.int32, (np_, 1), 0)
    # zero padded rows so no NaN/Inf garbage can leak through p @ v
    slab = jnp.where(row < n, slab, 0)
    col_t = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    bias = None if b_ref is None else b_ref[...]  # (Np, Np) fp32, shared
    for h in range(heads):
        q = jax.lax.slice(slab, (0, h * hd), (np_, (h + 1) * hd))
        k = jax.lax.slice(slab, (0, c + h * hd), (np_, c + (h + 1) * hd))
        v = jax.lax.slice(slab, (0, 2 * c + h * hd), (np_, 2 * c + (h + 1) * hd))
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (Np, Np)
        if bias is not None:
            s = s + bias
        s = jnp.where(col_t < n, s, -jnp.inf)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        # normalize the (Np, hd) output instead of the (Np, Np) probabilities
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o = o / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[0, :, h * hd:(h + 1) * hd] = o.astype(o_ref.dtype)


def _qkv_kernel(qkv_ref, o_ref, *, scale, heads, n):
    _qkv_kernel_impl(qkv_ref, None, o_ref, scale=scale, heads=heads, n=n)


def _qkv_bias_kernel(qkv_ref, b_ref, o_ref, *, scale, heads, n):
    _qkv_kernel_impl(qkv_ref, b_ref, o_ref, scale=scale, heads=heads, n=n)


@functools.partial(jax.jit,
                   static_argnames=("heads", "scale", "interpret"))
def _attention_qkv_fwd_impl(qkv, bias, *, heads, scale, interpret=False):
    b, n, c3 = qkv.shape
    c = c3 // 3
    hd = c // heads
    if scale is None:
        scale = 1.0 / math.sqrt(hd)
    np_ = -(-n // 8) * 8  # sublane alignment; Pallas masks the OOB rows
    in_specs = [pl.BlockSpec((1, np_, c3), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [qkv]
    if bias is not None:
        assert bias.shape[0] == 1 and bias.shape[1] == 1, (
            "packed kernel supports batch/head-shared bias only")
        bias_f = _pad_to(_pad_to(bias.astype(jnp.float32)[0, 0], np_, 0),
                         np_, 1)
        in_specs.append(pl.BlockSpec((np_, np_), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias_f)
        kern = functools.partial(_qkv_bias_kernel, scale=scale, heads=heads,
                                 n=n)
    else:
        kern = functools.partial(_qkv_kernel, scale=scale, heads=heads, n=n)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, np_, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
        # v5e has 128MB physical VMEM; the default 16MB scoped limit is too
        # tight for the (Np, 3C) slab + fp32 score tiles at ViT-B sizes
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# Backward kernels.
#
# The (L, L) probability matrix is never written to HBM: the backward kernel
# recomputes scores/softmax in VMEM from the saved q/k/v (flash-attention
# style recompute, but single-block — no streaming needed at these L).
# Per head:  dv = p^T do;  dp = do v^T;  ds = p*(dp - rowsum(p*dp));
# dq = scale * ds k;  dk = scale * ds^T q;  dbias = sum_{b,h} ds.
# dbias is accumulated across the (sequential) TPU grid into one shared
# (Lq, Lk) block when the bias is batch/head-shared.
# ---------------------------------------------------------------------------


def _bwd_head_math(q, k, v, do, bias, *, scale, n):
    """Shared per-head backward math on 2D (Np, hd)/(Np, Np) tiles.

    q/k/v/do: (Np, hd) (any float dtype); bias: (Np, Np) fp32 or None.
    Rows >= n of q/k/v/do must already be zeroed. Returns (dq, dk, dv, ds)
    with dq/dk/dv fp32 and ds fp32 (zero on padded rows/cols).
    """
    np_ = q.shape[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        s = s + bias
    col = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    s = jnp.where(col < n, s, -jnp.inf)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)  # (Np, Np) fp32
    pb = p.astype(v.dtype)
    dv = jax.lax.dot_general(  # p^T @ do -> (Np, hd)
        pb, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(  # do @ v^T -> (Np, Np)
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
    dsb = ds.astype(q.dtype)
    dq = jax.lax.dot_general(  # ds @ k -> (Np, hd)
        dsb, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(  # ds^T @ q -> (Np, hd)
        dsb, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    return dq, dk, dv, ds


def _qkv_bwd_kernel_impl(qkv_ref, g_ref, b_ref, dqkv_ref, db_ref, *,
                         scale, heads, n):
    slab = qkv_ref[0]  # (Np, 3C)
    g = g_ref[0]       # (Np, C) — block-padded rows are uninitialized
    np_, c3 = slab.shape
    c = c3 // 3
    hd = c // heads
    row = jax.lax.broadcasted_iota(jnp.int32, (np_, 1), 0)
    slab = jnp.where(row < n, slab, 0)
    g = jnp.where(row < n, g, 0)
    bias = None if b_ref is None else b_ref[...]
    if db_ref is not None:
        @pl.when(pl.program_id(0) == 0)
        def _init():
            db_ref[...] = jnp.zeros_like(db_ref)
    ds_total = None
    for h in range(heads):
        q = jax.lax.slice(slab, (0, h * hd), (np_, (h + 1) * hd))
        k = jax.lax.slice(slab, (0, c + h * hd), (np_, c + (h + 1) * hd))
        v = jax.lax.slice(slab, (0, 2 * c + h * hd),
                          (np_, 2 * c + (h + 1) * hd))
        do = jax.lax.slice(g, (0, h * hd), (np_, (h + 1) * hd))
        dq, dk, dv, ds = _bwd_head_math(q, k, v, do, bias, scale=scale, n=n)
        dqkv_ref[0, :, h * hd:(h + 1) * hd] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, c + h * hd:c + (h + 1) * hd] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, 2 * c + h * hd:2 * c + (h + 1) * hd] = (
            dv.astype(dqkv_ref.dtype))
        if db_ref is not None:
            ds_total = ds if ds_total is None else ds_total + ds
    if db_ref is not None:
        db_ref[...] += ds_total


def _qkv_bwd_kernel(qkv_ref, g_ref, dqkv_ref, *, scale, heads, n):
    _qkv_bwd_kernel_impl(qkv_ref, g_ref, None, dqkv_ref, None,
                         scale=scale, heads=heads, n=n)


def _qkv_bias_bwd_kernel(qkv_ref, g_ref, b_ref, dqkv_ref, db_ref, *,
                         scale, heads, n):
    _qkv_bwd_kernel_impl(qkv_ref, g_ref, b_ref, dqkv_ref, db_ref,
                         scale=scale, heads=heads, n=n)


@functools.partial(jax.jit, static_argnames=("heads", "scale", "interpret"))
def _attention_qkv_bwd_impl(qkv, bias, g, *, heads, scale, interpret=False):
    """Pallas backward for the packed layout. Returns (dqkv, dbias|None)."""
    b, n, c3 = qkv.shape
    c = c3 // 3
    hd = c // heads
    if scale is None:
        scale = 1.0 / math.sqrt(hd)
    np_ = -(-n // 8) * 8
    in_specs = [pl.BlockSpec((1, np_, c3), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, np_, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [qkv, g]
    out_specs = [pl.BlockSpec((1, np_, c3), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((b, n, c3), qkv.dtype)]
    if bias is not None:
        bias_f = _pad_to(_pad_to(bias.astype(jnp.float32)[0, 0], np_, 0),
                         np_, 1)
        in_specs.append(pl.BlockSpec((np_, np_), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias_f)
        out_specs.append(pl.BlockSpec((np_, np_), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((np_, np_), jnp.float32))
        kern = functools.partial(_qkv_bias_bwd_kernel, scale=scale,
                                 heads=heads, n=n)
    else:
        kern = functools.partial(_qkv_bwd_kernel, scale=scale, heads=heads,
                                 n=n)
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(*args)
    if bias is None:
        return out[0], None
    dbias = out[1][:n, :n][None, None].astype(bias.dtype)
    return out[0], dbias


def _qkv_xla(qkv, bias, heads, scale):
    b, n, c3 = qkv.shape
    c = c3 // 3
    qkv4 = qkv.reshape(b, n, 3, heads, c // heads)
    q, k, v = qkv4[:, :, 0], qkv4[:, :, 1], qkv4[:, :, 2]
    o = jax.nn.dot_product_attention(q, k, v, bias=bias, scale=scale)
    return o.reshape(b, n, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _attention_qkv_diff(qkv, bias, heads, scale):
    return _attention_qkv_fwd_impl(qkv, bias, heads=heads, scale=scale)


def _aq_fwd(qkv, bias, heads, scale):
    return _attention_qkv_fwd_impl(qkv, bias, heads=heads, scale=scale), (qkv, bias)


def _aq_bwd(heads, scale, res, g):
    qkv, bias = res
    dqkv, dbias = _attention_qkv_bwd_impl(qkv, bias, g, heads=heads,
                                          scale=scale)
    return dqkv, dbias


_attention_qkv_diff.defvjp(_aq_fwd, _aq_bwd)


def attention_qkv(qkv, heads: int, bias=None, scale: Optional[float] = None):
    """Attention on the packed qkv projection output.

    qkv: (B, N, 3C) laid out as the fused Dense(3C) produces it — i.e.
    reshape (B, N, 3, H, hd) gives q/k/v at index 0/1/2 of axis 2. Returns
    (B, N, C) ready for the output projection. Uses the packed Pallas kernel
    on TPU-family backends (no HBM layout moves); XLA elsewhere. bias, if
    given, must be (1, 1, Lq, Lk) (shared across batch and heads).
    Differentiable via a native Pallas backward kernel (in-VMEM softmax
    recompute, no (L, L) residuals in HBM).
    """
    b, n, c3 = qkv.shape
    shared = bias is None or (bias.shape[0] == 1 and bias.shape[1] == 1)
    if _tpu_backend() and shared \
            and os.environ.get("IMGF_NO_PALLAS_ATTN") != "1":
        if n * n <= _SINGLE_MAX_ELEMS:
            return _attention_qkv_diff(qkv, bias, heads, scale)
        if n <= _qblk_max_l(bias):
            # 512px tokenizer regime (L=2049): the single-block packed
            # kernel's 12 concurrent per-head score tiles blow VMEM, so pay
            # the BNHD layout moves and use the q-blocked kernels (still
            # ~2.7x over XLA at these L)
            c = c3 // 3
            qkv4 = qkv.reshape(b, n, 3, heads, c // heads)
            o = _fused_attention_qblk_diff(
                qkv4[:, :, 0], qkv4[:, :, 1], qkv4[:, :, 2], bias, scale)
            return o.reshape(b, n, c)
    return _qkv_xla(qkv, bias, heads, scale)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale, lq, lk):
    q = q_ref[0]  # (Lp, hd)
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (Lq, Lk)
    # mask padded key columns
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < lk, s, -jnp.inf)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _kernel_bias(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale, lq, lk):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    s = s + b_ref[0]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < lk, s, -jnp.inf)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _pad_to(x, l, axis):
    pad = l - x.shape[axis]
    if pad <= 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def fused_attention(q, k, v, bias: Optional[jnp.ndarray] = None,
                    scale: Optional[float] = None, interpret: bool = False):
    """q, k, v: (B, L, H, hd) (jax.nn.dot_product_attention layout).
    bias: optional (1|B, 1|H, Lq, Lk) additive. Returns (B, Lq, H, hd)."""
    b, lq, h, hd = q.shape
    lk = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(hd)
    # block second-to-last dims need 8-alignment only; the (Lq, Lk) scores
    # are a VMEM intermediate, not a block, so Lk needs no 128-alignment
    lqp = -(-lq // 8) * 8
    lkp = -(-lk // 8) * 8

    def to_bh(x, lp):
        x = _pad_to(x, lp, 1)
        return x.transpose(0, 2, 1, 3).reshape(b * h, lp, hd)

    qb, kb, vb = to_bh(q, lqp), to_bh(k, lkp), to_bh(v, lkp)
    grid = (b * h,)
    specs = [pl.BlockSpec((1, lqp, hd), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((1, lkp, hd), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((1, lkp, hd), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)]
    args = [qb, kb, vb]
    if bias is not None:
        shared = bias.shape[0] == 1 and bias.shape[1] == 1
        if shared:
            # one (Lq, Lk) mask shared by every (batch, head): keep a single
            # copy in HBM (e.g. VAR's block-causal mask — broadcasting it
            # would materialize B*H*L^2 floats)
            bias_f = _pad_to(_pad_to(bias.astype(jnp.float32), lqp, 2),
                             lkp, 3).reshape(1, lqp, lkp)
            specs.append(pl.BlockSpec((1, lqp, lkp), lambda i: (0, 0, 0),
                                      memory_space=pltpu.VMEM))
        else:
            bias_f = jnp.broadcast_to(bias.astype(jnp.float32), (b, h, lq, lk))
            bias_f = _pad_to(_pad_to(bias_f, lqp, 2), lkp, 3)
            bias_f = bias_f.reshape(b * h, lqp, lkp)
            specs.append(pl.BlockSpec((1, lqp, lkp), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
        args.append(bias_f)
        kern = functools.partial(_kernel_bias, scale=scale, lq=lq, lk=lk)
    else:
        kern = functools.partial(_kernel, scale=scale, lq=lq, lk=lk)

    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=specs,
        out_specs=pl.BlockSpec((1, lqp, hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, lqp, hd), q.dtype),
        interpret=interpret,
    )(*args)
    out = out.reshape(b, h, lqp, hd).transpose(0, 2, 1, 3)
    return out[:, :lq]


def _xla_attention(q, k, v, bias, scale):
    return jax.nn.dot_product_attention(q, k, v, bias=bias, scale=scale)


# ---------------------------------------------------------------------------
# Q-blocked kernels for the 512px regime (2048 < L <= ~2816, e.g. the VAR
# 512px recipe L=2280, arg_util.py:287-291). One (L, L) fp32 score tile no
# longer fits the VMEM budget, but a (L/nq, L) tile does — so the grid gains
# a q-block dimension while k/v stay VMEM-resident across q blocks (their
# index_map ignores j, so the pipeline fetches them once per (batch, head)).
# No online-softmax streaming needed: each q row still sees ALL keys in one
# tile, keeping the math identical to the single-block kernel.
# ---------------------------------------------------------------------------


_SCORE_TILE_BUDGET = 1 << 22  # fp32 score elements per block (tests shrink)


def _qblk_rows(lp: int) -> int:
    """Rows per q block: smallest power split that brings the fp32 score
    tile under the single-block budget."""
    nq = 1
    while (lp // nq) * lp > _SCORE_TILE_BUDGET:
        nq *= 2
    return -(-lp // (8 * nq)) * 8


def _kernel_qblk(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale, lk):
    q = q_ref[0]          # (Qp, hd)
    k = k_ref[0]          # (Lkp, hd)
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (Qp, Lkp)
    if b_ref is not None:
        s = s + b_ref[0]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < lk, s, -jnp.inf)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o = o / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _fused_attention_qblk_fwd(q, k, v, bias, scale=None, interpret=False):
    b, lq, h, hd = q.shape
    lk = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(hd)
    if bias is not None and bias.shape[2:] != (lq, lk):
        raise ValueError(f"bias {bias.shape} does not match (Lq, Lk)="
                         f"({lq}, {lk})")
    lqp = -(-lq // 8) * 8
    lkp = -(-lk // 8) * 8
    qblk = _qblk_rows(lqp)
    nq = -(-lqp // qblk)
    lqp = nq * qblk  # pad q rows to a whole number of blocks

    def to_bh(x, lp):
        x = _pad_to(x, lp, 1)
        return x.transpose(0, 2, 1, 3).reshape(b * h, lp, hd)

    qb, kb, vb = to_bh(q, lqp), to_bh(k, lkp), to_bh(v, lkp)
    specs = [pl.BlockSpec((1, qblk, hd), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((1, lkp, hd), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((1, lkp, hd), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)]
    args = [qb, kb, vb]
    if bias is not None:
        bias_f = _pad_to(_pad_to(bias.astype(jnp.float32), lqp, 2),
                         lkp, 3).reshape(1, lqp, lkp)
        specs.append(pl.BlockSpec((1, qblk, lkp), lambda i, j: (0, j, 0),
                                  memory_space=pltpu.VMEM))
        args.append(bias_f)

        kern = functools.partial(_kernel_qblk, scale=scale, lk=lk)
    else:
        kern = functools.partial(
            lambda qr, kr, vr, orf, **kw: _kernel_qblk(qr, kr, vr, None, orf,
                                                       **kw),
            scale=scale, lk=lk)
    out = pl.pallas_call(
        kern,
        grid=(b * h, nq),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, qblk, hd), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, lqp, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(*args)
    out = out.reshape(b, h, lqp, hd).transpose(0, 2, 1, 3)
    return out[:, :lq]


def _qblk_bwd_kernel_impl(q_ref, k_ref, v_ref, g_ref, b_ref,
                          dq_ref, dk_ref, dv_ref, db_ref, *, scale, n,
                          qblk):
    j = pl.program_id(1)
    np_, hd = k_ref.shape[1], k_ref.shape[2]
    rowk = jax.lax.broadcasted_iota(jnp.int32, (np_, 1), 0)
    k = jnp.where(rowk < n, k_ref[0], 0)
    v = jnp.where(rowk < n, v_ref[0], 0)
    rowq = jax.lax.broadcasted_iota(jnp.int32, (qblk, 1), 0) + j * qblk
    q = jnp.where(rowq < n, q_ref[0], 0)
    do = jnp.where(rowq < n, g_ref[0], 0)
    bias = None if b_ref is None else b_ref[0]  # (qblk, Lkp)

    if db_ref is not None:
        @pl.when((pl.program_id(0) == 0) & (j == 0))
        def _initb():
            db_ref[...] = jnp.zeros_like(db_ref)

    @pl.when(j == 0)
    def _initkv():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (qblk, Lkp)
    if bias is not None:
        s = s + bias
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n, s, -jnp.inf)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    # zero padded q rows so they contribute nothing to dk/dv/db
    p = jnp.where(rowq < n, p, 0.0)
    pb = p.astype(v.dtype)
    dv = jax.lax.dot_general(pb, do, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
    dsb = ds.astype(q.dtype)
    dq = jax.lax.dot_general(dsb, k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(dsb, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] += dk.astype(dk_ref.dtype)
    dv_ref[0] += dv.astype(dv_ref.dtype)
    if db_ref is not None:
        db_ref[pl.dslice(j * qblk, qblk), :] += ds


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _fused_attention_qblk_bwd(q, k, v, bias, g, scale=None, interpret=False):
    """Q-blocked Pallas backward (self-attention, shared bias). dk/dv are
    accumulated in their VMEM-resident blocks across the (sequential) q-block
    grid dimension; dbias accumulates across the whole grid."""
    b, l, h, hd = q.shape
    if bias is not None and bias.shape[2:] != (l, l):
        raise ValueError(f"bias {bias.shape} does not match L={l}")
    if scale is None:
        scale = 1.0 / math.sqrt(hd)
    lkp = -(-l // 8) * 8
    qblk = _qblk_rows(lkp)
    nq = -(-lkp // qblk)
    lqp = nq * qblk

    def to_bh(x, lp):
        return _pad_to(x, lp, 1).transpose(0, 2, 1, 3).reshape(b * h, lp, hd)

    qb, gb = to_bh(q, lqp), to_bh(g, lqp)
    kb, vb = to_bh(k, lkp), to_bh(v, lkp)
    qspec = pl.BlockSpec((1, qblk, hd), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, lkp, hd), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    in_specs = [qspec, kvspec, kvspec, qspec]
    args = [qb, kb, vb, gb]
    out_specs = [qspec, kvspec, kvspec]
    out_shape = [jax.ShapeDtypeStruct((b * h, lqp, hd), q.dtype),
                 jax.ShapeDtypeStruct((b * h, lkp, hd), jnp.float32),
                 jax.ShapeDtypeStruct((b * h, lkp, hd), jnp.float32)]
    if bias is not None:
        bias_f = _pad_to(_pad_to(bias.astype(jnp.float32), lqp, 2),
                         lkp, 3).reshape(1, lqp, lkp)
        in_specs.append(pl.BlockSpec((1, qblk, lkp), lambda i, j: (0, j, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias_f)
        out_specs.append(pl.BlockSpec((lqp, lkp), lambda i, j: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((lqp, lkp), jnp.float32))

        def kern(qr, kr, vr, gr, br, dqr, dkr, dvr, dbr):
            _qblk_bwd_kernel_impl(qr, kr, vr, gr, br, dqr, dkr, dvr, dbr,
                                  scale=scale, n=l, qblk=qblk)
    else:
        def kern(qr, kr, vr, gr, dqr, dkr, dvr):
            _qblk_bwd_kernel_impl(qr, kr, vr, gr, None, dqr, dkr, dvr, None,
                                  scale=scale, n=l, qblk=qblk)
    out = pl.pallas_call(
        kern,
        grid=(b * h, nq),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(*args)

    def from_bh(x, lp):
        return x.reshape(b, h, lp, hd).transpose(0, 2, 1, 3)[:, :l]

    dq = from_bh(out[0], lqp)
    dk = from_bh(out[1], lkp).astype(q.dtype)
    dv = from_bh(out[2], lkp).astype(q.dtype)
    if bias is None:
        return dq, dk, dv, None
    dbias = out[3][:l, :l][None, None].astype(bias.dtype)
    return dq, dk, dv, dbias


# The q-blocked path is exact (each q row sees all keys in one tile). The
# caps keep the *backward* kernel inside the 100MB VMEM budget — bwd is the
# binding constraint because its biased variant holds the full (L,L) fp32
# dbias accumulator resident across the grid on top of the per-block fp32
# score tiles. At L=2304 (qblk=1152): dbias 21.2MB + bias block 10.6MB +
# ~4 live score tiles 42.5MB ~ 75MB. Validated on chip at L=2240 (the 512px
# VAR recipe). No-bias bwd has no dbias matrix; at L=2816 its score tiles
# total ~65MB (covers the 512px tokenizer, L=2049). Beyond the caps the
# routing falls back to XLA (correct, slower).
_QBLK_MAX_L = 2816          # no-bias
_QBLK_MAX_L_BIASED = 2304   # shared-bias (dbias accumulator resident)


def _qblk_max_l(bias) -> int:
    return _QBLK_MAX_L if bias is None else _QBLK_MAX_L_BIASED


def _bnhd_bwd_kernel_impl(q_ref, k_ref, v_ref, g_ref, b_ref,
                          dq_ref, dk_ref, dv_ref, db_ref, *, scale, n):
    np_, hd = q_ref.shape[1], q_ref.shape[2]
    row = jax.lax.broadcasted_iota(jnp.int32, (np_, 1), 0)
    q = jnp.where(row < n, q_ref[0], 0)
    k = jnp.where(row < n, k_ref[0], 0)
    v = jnp.where(row < n, v_ref[0], 0)
    do = jnp.where(row < n, g_ref[0], 0)
    bias = None if b_ref is None else b_ref[0]
    if db_ref is not None:
        @pl.when(pl.program_id(0) == 0)
        def _init():
            db_ref[...] = jnp.zeros_like(db_ref)
    dq, dk, dv, ds = _bwd_head_math(q, k, v, do, bias, scale=scale, n=n)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)
    if db_ref is not None:
        db_ref[...] += ds


def _bnhd_bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, *,
                     scale, n):
    _bnhd_bwd_kernel_impl(q_ref, k_ref, v_ref, g_ref, None,
                          dq_ref, dk_ref, dv_ref, None, scale=scale, n=n)


def _bnhd_bias_bwd_kernel(q_ref, k_ref, v_ref, g_ref, b_ref,
                          dq_ref, dk_ref, dv_ref, db_ref, *, scale, n):
    _bnhd_bwd_kernel_impl(q_ref, k_ref, v_ref, g_ref, b_ref,
                          dq_ref, dk_ref, dv_ref, db_ref, scale=scale, n=n)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _fused_attention_bwd_impl(q, k, v, bias, g, scale=None, interpret=False):
    """Pallas backward for the BNHD layout (self-attention, Lq == Lk,
    bias None or batch/head-shared). Returns (dq, dk, dv, dbias|None)."""
    b, l, h, hd = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(hd)
    lp = -(-l // 8) * 8

    def to_bh(x):
        return _pad_to(x, lp, 1).transpose(0, 2, 1, 3).reshape(b * h, lp, hd)

    qb, kb, vb, gb = to_bh(q), to_bh(k), to_bh(v), to_bh(g)
    bh_spec = pl.BlockSpec((1, lp, hd), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [bh_spec] * 4
    args = [qb, kb, vb, gb]
    out_specs = [bh_spec] * 3
    out_shape = [jax.ShapeDtypeStruct((b * h, lp, hd), q.dtype)] * 3
    if bias is not None:
        bias_f = _pad_to(_pad_to(bias.astype(jnp.float32), lp, 2),
                         lp, 3).reshape(1, lp, lp)
        in_specs.append(pl.BlockSpec((1, lp, lp), lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias_f)
        out_specs.append(pl.BlockSpec((lp, lp), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((lp, lp), jnp.float32))
        kern = functools.partial(_bnhd_bias_bwd_kernel, scale=scale, n=l)
    else:
        kern = functools.partial(_bnhd_bwd_kernel, scale=scale, n=l)
    out = pl.pallas_call(
        kern,
        grid=(b * h,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(*args)

    def from_bh(x):
        return x.reshape(b, h, lp, hd).transpose(0, 2, 1, 3)[:, :l]

    dq, dk, dv = from_bh(out[0]), from_bh(out[1]), from_bh(out[2])
    if bias is None:
        return dq, dk, dv, None
    dbias = out[3][:l, :l][None, None].astype(bias.dtype)
    return dq, dk, dv, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_attention_diff(q, k, v, bias, scale):
    return fused_attention(q, k, v, bias=bias, scale=scale)


def _fad_fwd(q, k, v, bias, scale):
    return fused_attention(q, k, v, bias=bias, scale=scale), (q, k, v, bias)


def _fad_bwd(scale, res, g):
    q, k, v, bias = res
    shared = bias is None or (bias.shape[0] == 1 and bias.shape[1] == 1)
    if q.shape[1] == k.shape[1] and shared:
        dq, dk, dv, dbias = _fused_attention_bwd_impl(q, k, v, bias, g,
                                                      scale=scale)
        return dq, dk, dv, dbias
    # cross-length or per-(batch,head) bias: recompute through XLA
    _, vjp = jax.vjp(lambda qq, kk, vv, bb: _xla_attention(qq, kk, vv, bb, scale),
                     q, k, v, bias)
    return vjp(g)


_fused_attention_diff.defvjp(_fad_fwd, _fad_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_attention_qblk_diff(q, k, v, bias, scale):
    return _fused_attention_qblk_fwd(q, k, v, bias, scale=scale)


def _faq_fwd(q, k, v, bias, scale):
    return (_fused_attention_qblk_fwd(q, k, v, bias, scale=scale),
            (q, k, v, bias))


def _faq_bwd(scale, res, g):
    q, k, v, bias = res
    return _fused_attention_qblk_bwd(q, k, v, bias, g, scale=scale)


_fused_attention_qblk_diff.defvjp(_faq_fwd, _faq_bwd)


def dot_product_attention(q, k, v, bias=None, scale=None):
    """Drop-in for jax.nn.dot_product_attention that uses the fused Pallas
    kernel on TPU-family backends (exact-match verified; differentiable via
    a native Pallas backward kernel for the self-attention/shared-bias case,
    XLA-recompute VJP otherwise) and XLA elsewhere. Sequences past the
    single-block VMEM budget (512px VAR, L=2240) take the q-blocked kernels
    up to the `_QBLK_MAX_L*` caps."""
    if _tpu_backend() and os.environ.get("IMGF_NO_PALLAS_ATTN") != "1":
        if q.shape[1] * k.shape[1] <= _SINGLE_MAX_ELEMS:
            return _fused_attention_diff(q, k, v, bias, scale)
        shared = bias is None or (bias.shape[0] == 1 and bias.shape[1] == 1)
        if (shared and q.shape[1] == k.shape[1]
                and q.shape[1] <= _qblk_max_l(bias)):
            return _fused_attention_qblk_diff(q, k, v, bias, scale)
    return jax.nn.dot_product_attention(q, k, v, bias=bias, scale=scale)
