"""Perf ablation probe for the bench workload (not part of the package API).

Times components of the VQ-4096 ViT-B enc+dec pipeline on the real chip using
the chained-iteration methodology from bench.py (axon RPC ~100ms, fake
block_until_ready).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

BATCH = 64
ITERS = 10


def timed_loop(name, step, *args, iters=ITERS):
    """step: x -> x (same shape/dtype); returns per-iter seconds."""

    def chained(n):
        @jax.jit
        def fn(*a):
            out = jax.lax.fori_loop(0, n, lambda i, xx: step(*a[:-1], xx), a[-1])
            return jnp.sum(out.astype(jnp.float32).ravel()[:1])

        return fn

    short, long_ = chained(1), chained(1 + iters)
    float(short(*args))
    float(long_(*args))
    t1 = min(min(( lambda t0=time.time(): (float(short(*args)), time.time() - t0)[1] )() for _ in range(3)) for _ in range(1))
    t2 = min(( lambda t0=time.time(): (float(long_(*args)), time.time() - t0)[1] )() for _ in range(3))
    dt = max(t2 - t1, 1e-9) / iters
    print(f"{name:45s} {dt*1e3:8.2f} ms/iter   {BATCH/dt:8.1f} img/s")
    return dt


def main():
    from imagefolder_tpu.models.tokenizer import ModelArgs, VQModel
    from imagefolder_tpu.models.vit import ViTBackbone

    key = jax.random.PRNGKey(0)

    # --- 1. full bench recon ---
    margs = ModelArgs(
        codebook_size=4096, codebook_embed_dim=64, v_patch_nums=(16,),
        enc_type="dinov2", dec_type="dinov2",
        encoder_model="vit_base_patch14_dinov2.lvd142m",
        decoder_model="vit_base_patch14_dinov2.lvd142m",
        semantic_guide="none", detail_guide="none",
        num_latent_tokens=256, abs_pos_embed=True, image_size=256,
        dtype_str="bfloat16")
    model = VQModel(margs)
    x = jax.random.uniform(key, (BATCH, 256, 256, 3), minval=-1, maxval=1)
    variables = jax.jit(lambda k, xx: model.init(k, xx, train=False))(key, x)

    def recon(v, xx):
        return model.apply(v, xx, method=VQModel.img_to_reconstructed_img)

    timed_loop("full recon (bench)", recon, variables, x)

    # --- 2. plain ViT-B backbone fwd at L=513 (bf16) ---
    bb = ViTBackbone(img_size=256, patch_size=16, embed_dim=768, depth=12,
                     num_heads=12, dtype=jnp.bfloat16)
    tok = jax.random.normal(key, (BATCH, 513, 768), jnp.bfloat16)
    bbv = jax.jit(bb.init)(key, x)

    def bb_blocks(v, t):
        return bb.apply(v, t, method=ViTBackbone.run_blocks).astype(jnp.bfloat16)

    timed_loop("ViT-B 12-block stack (L=513, bf16)", bb_blocks, bbv, tok)

    # --- 4. matmul speed-of-light: same GEMM shapes as one block x12 ---
    w_qkv = jax.random.normal(key, (768, 2304), jnp.bfloat16)
    w_proj = jax.random.normal(key, (768, 768), jnp.bfloat16)
    w_fc1 = jax.random.normal(key, (768, 3072), jnp.bfloat16)
    w_fc2 = jax.random.normal(key, (3072, 768), jnp.bfloat16)

    def gemms(wq, wp, w1, w2, t):
        def body(i, tt):
            a = tt @ wq
            tt = a[..., :768] + tt
            tt = (tt @ wp) + tt
            h = tt @ w1
            tt = (h @ w2) + tt
            return tt
        return jax.lax.fori_loop(0, 12, body, t)

    timed_loop("GEMM-only 12 blocks (no attn/LN)", gemms, w_qkv, w_proj,
               w_fc1, w_fc2, tok)

    # --- 5. attention alone: fused kernel vs XLA, B=64 H=12 L=513 ---
    from imagefolder_tpu.ops.pallas.attention import fused_attention

    q = jax.random.normal(key, (BATCH, 513, 12, 64), jnp.bfloat16)

    def attn_fused(qq):
        return fused_attention(qq, qq, qq).astype(jnp.bfloat16)

    def attn_xla(qq):
        return jax.nn.dot_product_attention(qq, qq, qq).astype(jnp.bfloat16)

    timed_loop("fused attention x1 (B=64,H=12,L=513)", attn_fused, q)
    timed_loop("XLA attention x1", attn_xla, q)


if __name__ == "__main__":
    main()
