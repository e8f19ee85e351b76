"""Perf profiling tool for the bench workload (consolidates the former
perf_probe{,2,3}.py one-offs; VERDICT r2 weak #8).

Subcommands (``python scripts/perf.py <probe>``):
  pipeline   end-to-end + component split of the VQ-4096 ViT-B bench recon
             (full recon, 12-block stack, GEMM-only floor, attention kernels)
  block      transformer-block ablations (attention impl, gelu, LayerNorm)
  mlp        MLP sub-layer ablations (gelu variants, fused pallas MLP)
  sampling   serving-path decode throughput (VAR 10-stage CFG sampling,
             RAR 256-step KV-cached CFG decode, bf16 cache)

All timings use the chained-iteration methodology from bench.py: N steps
inside one jit via ``lax.fori_loop`` with the output threaded through the
loop (the axon tunnel's block_until_ready is a fake — python-loop timing
measures dispatch, not compute).
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

BATCH = 64
L = 513
D = 768
H = 12
HID = 3072
ITERS = 10


def _walltime(thunk):
    t0 = time.time()
    thunk()
    return time.time() - t0


def timed_loop(name, step, *args, iters=ITERS):
    """step: (*consts, x) -> x-shaped output; returns per-iter seconds.
    Times the (1+iters)-vs-1 chained difference with a scalar readback."""

    def chained(n):
        @jax.jit
        def fn(*a):
            out = jax.lax.fori_loop(
                0, n, lambda i, xx: step(*a[:-1], xx).astype(a[-1].dtype),
                a[-1])
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
    print(f"{name:48s} {dt * 1e3:8.2f} ms/iter   {BATCH / dt:8.1f} img/s",
          flush=True)
    return dt


# --------------------------- pipeline probe --------------------------- #

def probe_pipeline():
    from imagefolder_tpu.models.tokenizer import ModelArgs, VQModel
    from imagefolder_tpu.models.vit import ViTBackbone

    key = jax.random.PRNGKey(0)

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

    bb = ViTBackbone(img_size=256, patch_size=16, embed_dim=768, depth=12,
                     num_heads=12, dtype=jnp.bfloat16)
    tok = jax.random.normal(key, (BATCH, L, D), jnp.bfloat16)
    bbv = jax.jit(bb.init)(key, x)

    def bb_blocks(v, t):
        return bb.apply(v, t, method=ViTBackbone.run_blocks)

    timed_loop("ViT-B 12-block stack (L=513, bf16)", bb_blocks, bbv, tok)

    # GEMM-only speed-of-light floor: same shapes as one block, x12
    w_qkv = jax.random.normal(key, (D, 3 * D), jnp.bfloat16)
    w_proj = jax.random.normal(key, (D, D), jnp.bfloat16)
    w_fc1 = jax.random.normal(key, (D, HID), jnp.bfloat16)
    w_fc2 = jax.random.normal(key, (HID, D), jnp.bfloat16)

    def gemms(wq, wp, w1, w2, t):
        def body(i, tt):
            a = tt @ wq
            tt = a[..., :D] + tt
            tt = (tt @ wp) + tt
            h = tt @ w1
            tt = (h @ w2) + tt
            return tt

        return jax.lax.fori_loop(0, 12, body, t)

    timed_loop("GEMM-only 12 blocks (no attn/LN)", gemms, w_qkv, w_proj,
               w_fc1, w_fc2, tok)

    from imagefolder_tpu.ops.pallas.attention import fused_attention

    q = jax.random.normal(key, (BATCH, L, H, D // H), jnp.bfloat16)

    def attn_fused(qq):
        return fused_attention(qq, qq, qq)

    def attn_xla(qq):
        return jax.nn.dot_product_attention(qq, qq, qq)

    timed_loop("fused attention x1 (B=64,H=12,L=513)", attn_fused, q)
    timed_loop("XLA attention x1", attn_xla, q)


# ---------------------------- block probe ----------------------------- #

def probe_block():
    import flax.linen as nn

    class BlockVar(nn.Module):
        attn_mode: str = "pallas"  # pallas | xla | none
        gelu_exact: bool = True
        ln: bool = True

        @nn.compact
        def __call__(self, x):
            dt = jnp.bfloat16

            def _ln(name):
                return nn.LayerNorm(epsilon=1e-6, dtype=dt,
                                    param_dtype=jnp.float32, name=name)

            c = D
            h = _ln("norm1")(x) if self.ln else x
            qkv = nn.Dense(3 * c, dtype=dt, param_dtype=jnp.float32,
                           name="qkv")(h)
            if self.attn_mode == "none":
                out = qkv[..., :c]
            else:
                b, n, _ = qkv.shape
                qkv4 = qkv.reshape(b, n, 3, H, c // H)
                q, k, v = qkv4[:, :, 0], qkv4[:, :, 1], qkv4[:, :, 2]
                if self.attn_mode == "pallas":
                    from imagefolder_tpu.ops.pallas.attention import (
                        fused_attention,
                    )

                    out = fused_attention(q, k, v)
                else:
                    out = jax.nn.dot_product_attention(q, k, v)
                out = out.reshape(b, n, c)
            out = nn.Dense(c, dtype=dt, param_dtype=jnp.float32,
                           name="proj")(out)
            out = out * self.param("ls1", nn.initializers.constant(1e-5), (c,))
            x = x + out
            h = _ln("norm2")(x) if self.ln else x
            h = nn.Dense(4 * c, dtype=dt, param_dtype=jnp.float32,
                         name="fc1")(h)
            h = nn.gelu(h, approximate=not self.gelu_exact)
            h = nn.Dense(c, dtype=dt, param_dtype=jnp.float32, name="fc2")(h)
            h = h * self.param("ls2", nn.initializers.constant(1e-5), (c,))
            return x + h

    def stack12(mod, v, t):
        def body(i, tt):
            return mod.apply(v, tt).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, 12, body, t)

    key = jax.random.PRNGKey(0)
    tok = jax.random.normal(key, (BATCH, L, D), jnp.bfloat16)
    for name, kw in [
        ("pallas attn, exact gelu, LN (current)", dict()),
        ("xla attn", dict(attn_mode="xla")),
        ("NO attn", dict(attn_mode="none")),
        ("pallas, tanh gelu", dict(gelu_exact=False)),
        ("pallas, no LN", dict(ln=False)),
        ("NO attn, tanh gelu, no LN",
         dict(attn_mode="none", gelu_exact=False, ln=False)),
    ]:
        mod = BlockVar(**kw)
        v = jax.jit(mod.init)(key, tok)
        timed_loop("12x block: " + name, functools.partial(stack12, mod), v,
                   tok)


# ----------------------------- mlp probe ------------------------------ #

def probe_mlp():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

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
                pl.BlockSpec((blk, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, HID), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((HID,), lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((HID, d), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((blk, d), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bn, d), x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2 ** 20),
        )(x, w1, b1, w2, b2)

    key = jax.random.PRNGKey(0)
    x3 = jax.random.normal(key, (BATCH, L, D), jnp.bfloat16)
    x2 = x3.reshape(BATCH * L, D)
    w1 = jax.random.normal(key, (D, HID), jnp.bfloat16) * 0.02
    b1 = jnp.zeros((HID,), jnp.float32)
    w2 = jax.random.normal(key, (HID, D), jnp.bfloat16) * 0.02
    b2 = jnp.zeros((D,), jnp.float32)

    exact = lambda h: jax.nn.gelu(h, approximate=False)  # noqa: E731
    tanh = lambda h: jax.nn.gelu(h, approximate=True)  # noqa: E731
    exact32 = lambda h: jax.nn.gelu(  # noqa: E731
        h.astype(jnp.float32), approximate=False)

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


# --------------------------- sampling probe --------------------------- #

def probe_sampling(part="all", batches=None):
    """Serving-path decode throughput: VAR-d16 PQ2 10-stage CFG sampling to
    images (inference.py:96-116 equivalent) and RAR-B 256-step KV-cached CFG
    decode to tokens (rar.py:408-456 equivalent, bf16 cache).

    Timing method: per-call wall clock on a jitted decode that returns ONE
    scalar (4-byte readback forces device completion on the async tunnel),
    min over repeats, minus the measured RPC floor (dispatch+readback of a
    trivial jitted scalar program). The fori_loop-chained method the train
    probes use is NOT available here: wrapping the 10-stage unrolled decode
    in a chain crashes the tunnel's remote compile server after ~31 min,
    reproduced 4x on 2026-08-19 — while the plain decode jit compiles fine.
    The RPC floor is ~100-200 ms; at B>=32 the decode takes seconds, so the
    adjustment is small and reported. Probe is splittable (``--part var`` /
    ``--part rar``)."""
    key = jax.random.PRNGKey(0)

    def _log(msg):
        print(msg, file=sys.stderr, flush=True)

    # RPC floor: trivial program, same dispatch + 4-byte readback path
    floor_fn = jax.jit(lambda k: jax.random.bits(k, (8,))[0].astype(jnp.int32))
    int(floor_fn(key))  # compile
    rpc_floor = min(
        _walltime(lambda: int(floor_fn(jax.random.fold_in(key, i))))
        for i in range(8))
    _log(f"[sampling] RPC floor {rpc_floor * 1e3:.1f} ms")

    def timed_sampling(name, sample_fn, batch, args=(), reps=5):
        # sample_fn(*args, key) -> array; reduce to one scalar inside the
        # jit so the per-call readback is 4 bytes. Params MUST ride in
        # ``args``, never a closure: a closed-over param tree is baked into
        # the HLO as literal constants — a GB-scale remote-compile request
        # on this tunnel (the very crash the method note above describes)
        # plus whole deterministic stages constant-folded at compile time.
        @jax.jit
        def one(*a):
            out = sample_fn(*a)
            return out.ravel()[0].astype(jnp.int32)

        _log(f"[sampling] compiling {name}")
        int(one(*args, key))
        raw = min(
            _walltime(lambda: int(one(*args, jax.random.fold_in(key, i))))
            for i in range(reps))
        dt = max(raw - rpc_floor, 1e-9)
        # compiler-counted FLOPs -> MFU. AFTER timing on purpose: on the
        # axon tunnel cost_analysis issues an extra remote compile, and a
        # wedged/crashed compile server must not cost us the measurement.
        flops = None
        if os.environ.get("IMGF_PERF_COSTA", "1") != "0":
            try:
                ca = one.lower(*args, key).cost_analysis()
                if ca and ca.get("flops", 0) > 0:
                    flops = float(ca["flops"])
            except Exception:
                pass
        mfu = f"  MFU {flops / dt / V5E_PEAK_BF16:.3f}" if flops else ""
        print(f"{name:52s} {dt * 1e3:8.1f} ms/call {batch / dt:8.1f} img/s"
              f" (raw {raw * 1e3:.1f} ms incl RPC){mfu}", flush=True)

    # ---- VAR-d16 PQ2: flagship ViT-S tokenizer, 10-stage CFG decode ----
    if part in ("all", "var"):
        _probe_sampling_var(key, timed_sampling, _log, batches or (8, 32, 64))
    if part in ("all", "rar"):
        _probe_sampling_rar(key, timed_sampling, _log, batches or (8, 64))


def _probe_sampling_var(key, timed_sampling, _log, batches=(8, 32, 64)):
    from imagefolder_tpu.models.tokenizer import ModelArgs, VQModel
    from imagefolder_tpu.train.var_train import build_vae_var, var_sample

    margs = ModelArgs(
        codebook_size=4096, codebook_embed_dim=32,
        v_patch_nums=(1, 1, 2, 3, 3, 4, 5, 6, 8, 11),
        enc_type="dinov2", dec_type="dinov2",
        encoder_model="vit_small_patch14_dinov2.lvd142m",
        decoder_model="vit_small_patch14_dinov2.lvd142m",
        semantic_guide="none", detail_guide="none",
        num_latent_tokens=121, product_quant=2, abs_pos_embed=True,
        image_size=256, dtype_str="bfloat16")
    vae, var = build_vae_var(margs, depth=16, dtype_str="bfloat16")
    imgs2 = jax.random.uniform(key, (2, 256, 256, 3), minval=-1, maxval=1)
    vae_params = jax.jit(
        lambda k, xx: vae.init(k, xx, train=False)["params"])(key, imgs2)
    _log("[sampling] VAR init (jitted)")

    # model-only init: no optimizer/EMA state (~4x params of transient HBM
    # on the 16GB chip) just to read .params back out
    @jax.jit
    def _var_init(k, vp, xx):
        idx = vae.apply({"params": vp}, xx, method=VQModel.img_to_idxBl)
        x_in = vae.apply({"params": vp}, idx,
                         method=VQModel.idxBl_to_var_input)
        label = jnp.zeros((xx.shape[0],), jnp.int32)
        return var.init({"params": k, "sample": k, "droppath": k},
                        label, x_in, train=False)["params"]

    var_params = _var_init(key, vae_params, imgs2)

    for b in batches:
        labels = jnp.arange(b, dtype=jnp.int32) % 1000
        timed_sampling(
            f"VAR-d16 PQ2 10-stage CFG sampling -> image (B={b})",
            lambda vp, vaep, lb, k: var_sample(
                var, vp, vae, vaep, lb, k,
                cfg_scale=1.5, top_k=900, top_p=0.96) * 255.0,
            b, args=(var_params, vae_params, labels))


def _probe_sampling_rar(key, timed_sampling, _log, batches=(8, 64)):
    from imagefolder_tpu.models.rar import RAR, RARConfig, rar_generate

    rcfg = RARConfig(embed_dim=768, depth=24, num_heads=16, mlp_ratio=4.0,
                     image_seq_len=256, codebook_size=4096,
                     condition_num_classes=1000, dtype_str="bfloat16")
    rar = RAR(rcfg)
    tok2 = jax.random.randint(key, (2, 256), 0, 4096, jnp.int32)
    _log("[sampling] RAR init (jitted)")
    # model-only init (no optimizer/EMA transients); the +codebook+1 label
    # offset matches RARTrainer.init / reference preprocess_condition
    rar_params = jax.jit(lambda k, t, l: rar.init(
        {"params": k}, t, l + rcfg.codebook_size + 1)["params"])(
            key, tok2, jnp.zeros((2,), jnp.int32))

    for b in batches:
        cond = jnp.arange(b, dtype=jnp.int32) % 1000
        timed_sampling(
            f"RAR-B 256-step CFG decode -> tokens (B={b}, bf16 KV)",
            lambda p, c, k: rar_generate(
                rar, p, c, k, guidance_scale=16.0,
                randomize_temperature=1.02, guidance_scale_pow=2.75,
                cache_dtype=rcfg.dtype),
            b, args=(rar_params, cond))


def probe_gan(variants_filter=None):
    """Flagship GAN train-step component split (VERDICT r4 item 3): the
    bench recipe (ViT-B PQ2 + DinoDisc + LPIPS + sem teacher, B=32, remat)
    vs. each leg statically removed, plus batch/remat scaling. Every variant
    is a fresh trainer + chained-timed step; states are dropped between
    variants (16 GB chip)."""
    import gc

    key = jax.random.PRNGKey(0)

    VARIANTS = [
        ("bench recipe (B=32, remat)", 32, dict(), dict(remat=True)),
        ("B=16, no remat", 16, dict(), dict(remat=False)),
        ("B=64, remat", 64, dict(), dict(remat=True)),
        # reference-default autocast(bf16) over the loss stack
        # (LPIPS + disc trunk), xqgan_train.py:118,419,449,467:
        ("B=32 remat, bf16 loss stack", 32, dict(loss_dtype="bfloat16"),
         dict(remat=True)),
        ("B=64 remat, bf16 loss stack", 64, dict(loss_dtype="bfloat16"),
         dict(remat=True)),
        ("B=32 remat, no adaptive weight", 32,
         dict(disc_adaptive_weight=False), dict(remat=True)),
        ("B=32 remat, no LPIPS", 32, dict(perceptual_weight=0.0),
         dict(remat=True)),
        ("B=32 remat, no disc (pure AE)", 32, dict(disc_weight=0.0),
         dict(remat=True)),
        ("B=32 remat, patchgan disc", 32, dict(disc_type="patchgan"),
         dict(remat=True)),
        ("B=32 remat, no EMA", 32, dict(ema=False), dict(remat=True)),
        # quantizer / teacher isolation (round 4 MFU attack):
        ("B=32 remat, no sem teacher", 32, dict(),
         dict(remat=True, semantic_guide="none")),
        ("B=32 remat, P=1 quantizer", 32, dict(),
         dict(remat=True, product_quant=1)),
        ("B=32 remat, 1-scale pyramid", 32, dict(),
         dict(remat=True, v_patch_nums=(11,), codebook_drop=0.0)),
    ]
    iters = 3
    for name, batch, tkw, mkw in VARIANTS:
        if variants_filter and variants_filter not in name:
            continue
        try:
            _gan_variant(name, batch, dict(tkw), dict(mkw), key, iters)
        except Exception as e:  # e.g. B=64 OOMs at compile — keep probing
            print(f"[gan] {name:40s} FAILED: {type(e).__name__}: "
                  f"{(str(e).splitlines() or [''])[0][:120]}", flush=True)
        gc.collect()


def _gan_variant(name, batch, tkw, mkw, key, iters):
    from imagefolder_tpu.train.recipes import (
        chained_gan_step_fns,
        flagship_gan_recipe,
    )
    from imagefolder_tpu.train.tokenizer_train import TokenizerTrainer

    remat = mkw.pop("remat", True)
    margs, tcfg = flagship_gan_recipe(
        batch, remat=remat, margs_overrides=mkw, tcfg_overrides=tkw)
    trainer = TokenizerTrainer(margs, tcfg)
    imgs = jax.random.uniform(key, (batch, 256, 256, 3),
                              minval=-1, maxval=1)
    print(f"[gan] {name}: init", flush=True)
    t_init = time.time()
    state = trainer.init(key, imgs)

    short, long_ = chained_gan_step_fns(trainer, key, iters)

    def run(fn, st):
        t0 = time.time()
        st, sc = fn(st, imgs)
        float(sc)
        return st, time.time() - t0

    print(f"[gan] {name}: init done ({time.time() - t_init:.0f}s), "
          "compiling chains", flush=True)
    t_c = time.time()
    state, _ = run(short, state)   # compile
    state, _ = run(long_, state)   # compile
    print(f"[gan] {name}: chains compiled ({time.time() - t_c:.0f}s)",
          flush=True)
    t1s, t2s = [], []
    for _ in range(3):
        state, t = run(short, state)
        t1s.append(t)
        state, t = run(long_, state)
        t2s.append(t)
    dt = max(min(t2s) - min(t1s), 1e-9) / iters
    print(f"[gan] {name:40s} {dt * 1e3:8.1f} ms/step "
          f"{batch / dt:8.1f} img/s", flush=True)


V5E_PEAK_BF16 = 197e12  # TPU v5e bf16 peak FLOP/s (MFU denominator)


def _chained_train_steps(step_once, iters):
    """(short, long) donated jit chains of 1 and 1+iters train steps.
    ``step_once(state, i, *batch) -> state``; per-step time =
    (long - short)/iters with a scalar readback (chained methodology, see
    module docstring)."""

    def chained(n):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def fn(st, *batch):
            out = jax.lax.fori_loop(
                0, n, lambda i, s: step_once(s, i, *batch), st)
            leaf = jax.tree.leaves(out.params)[0]
            return out, jnp.sum(leaf.astype(jnp.float32).ravel()[:1])

        return fn

    return chained(1), chained(1 + iters)


def _time_train_variant(name, batch_size, step_once, state, batch, iters=6):
    short, long_ = _chained_train_steps(step_once, iters)
    flops = None
    try:  # compiler-counted FLOPs for one step -> MFU
        ca = short.lower(state, *batch).cost_analysis()
        if ca and ca.get("flops", 0) > 0:
            flops = float(ca["flops"])
    except Exception:
        pass

    def run(fn, st):
        t0 = time.time()
        st, sc = fn(st, *batch)
        float(sc)
        return st, time.time() - t0

    print(f"[gentrain] {name}: compiling chains", flush=True)
    t_c = time.time()
    state, _ = run(short, state)
    state, _ = run(long_, state)
    print(f"[gentrain] {name}: compiled ({time.time() - t_c:.0f}s)",
          flush=True)
    t1s, t2s = [], []
    for _ in range(3):
        state, t = run(short, state)
        t1s.append(t)
        state, t = run(long_, state)
        t2s.append(t)
    dt = max(min(t2s) - min(t1s), 1e-9) / iters
    mfu = f"  MFU {flops / dt / V5E_PEAK_BF16:.3f}" if flops else ""
    print(f"[gentrain] {name:44s} {dt * 1e3:8.1f} ms/step "
          f"{batch_size / dt:8.1f} img/s{mfu}", flush=True)


def probe_gentrain(part="all", variants_filter=None):
    """Generator train-step batch/remat ladder (round-4 MFU attack on the
    VAR/RAR rows of the PARITY MFU table): the full jitted optimizer steps
    (VAR: frozen-VAE img_to_idxBl + teacher forcing, trainer.py:103-147;
    RAR: permutation training + EMA, utils/train_utils.py:641-767) at the
    reference-recipe per-device batches. MFU uses compiler-counted FLOPs
    over the v5e bf16 peak."""
    from imagefolder_tpu.models import build_rar, build_vae_var
    from imagefolder_tpu.models.tokenizer import ModelArgs
    from imagefolder_tpu.train.rar_train import RARTrainConfig, RARTrainer
    from imagefolder_tpu.train.var_train import VARTrainConfig, VARTrainer

    key = jax.random.PRNGKey(0)

    if part in ("all", "var"):
        margs = ModelArgs(
            codebook_size=4096, codebook_embed_dim=32,
            v_patch_nums=(1, 1, 2, 3, 3, 4, 5, 6, 8, 11),
            enc_type="dinov2", dec_type="dinov2",
            encoder_model="vit_small_patch14_dinov2.lvd142m",
            decoder_model="vit_small_patch14_dinov2.lvd142m",
            semantic_guide="none", detail_guide="none",
            num_latent_tokens=121, product_quant=2, abs_pos_embed=True,
            image_size=256, dtype_str="bfloat16")
        # (B=8, no remat) is the round-3 PARITY MFU anchor
        for b, remat in ((8, False), (32, False), (64, True), (128, True)):
            name = f"VAR-d16 PQ2 train step (B={b}"
            name += ", remat)" if remat else ")"
            if variants_filter and variants_filter not in name:
                continue
            try:
                vae, var = build_vae_var(margs, depth=16,
                                         dtype_str="bfloat16", remat=remat)
                trainer = VARTrainer(vae, var, VARTrainConfig())
                imgs = jax.random.uniform(key, (b, 256, 256, 3),
                                          minval=-1, maxval=1)
                labels = jnp.arange(b, dtype=jnp.int32) % 1000
                print(f"[gentrain] {name}: init", flush=True)
                vae_params = jax.jit(
                    lambda k, xx: vae.init(k, xx, train=False)["params"])(
                        key, imgs[:2])
                state = trainer.init(key, vae_params, imgs[:2])
                _time_train_variant(
                    name, b,
                    lambda s, i, im, lb: trainer.train_step(
                        s, im, lb, jax.random.fold_in(key, i))[0],
                    state, (imgs, labels))
            except Exception as e:
                print(f"[gentrain] {name} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)

    if part in ("all", "rar"):
        # B=16 is the round-3 anchor; 64/gpu is the reference recipe batch
        # (configs/generator/robustTok-rar.yaml:85-96: 2048 over 32 GPUs)
        for b, remat in ((16, False), (64, False), (256, True)):
            name = f"RAR-B train step (B={b}"
            name += ", remat)" if remat else ")"
            if variants_filter and variants_filter not in name:
                continue
            try:
                rar = build_rar(seq_len=256, codebook_size=4096,
                                dtype_str="bfloat16", remat=remat)
                trainer = RARTrainer(rar, RARTrainConfig())
                tokens = jax.random.randint(key, (b, 256), 0, 4096,
                                            jnp.int32)
                labels = jnp.arange(b, dtype=jnp.int32) % 1000
                print(f"[gentrain] {name}: init", flush=True)
                state = trainer.init(key, tokens[:2], labels[:2])
                _time_train_variant(
                    name, b,
                    lambda s, i, tk, lb: trainer.train_step(
                        s, tk, lb, jax.random.fold_in(key, i),
                        random_ratio=0.5)[0],
                    state, (tokens, labels))
            except Exception as e:
                print(f"[gentrain] {name} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("probe", choices=["pipeline", "block", "mlp", "sampling",
                                      "gan", "gentrain"])
    ap.add_argument("--part", choices=["all", "var", "rar"], default="all",
                    help="sampling/gentrain probes only: run one leg")
    ap.add_argument("--variant", default=None,
                    help="gan/gentrain probes only: substring filter on "
                         "variant names")
    ap.add_argument("--batches", default=None,
                    help="sampling probe only: comma-separated batch sizes "
                         "overriding the study defaults (e.g. 128)")
    args = ap.parse_args()
    if args.batches is not None and args.probe != "sampling":
        ap.error("--batches applies to the 'sampling' probe only")
    if args.part != "all" and args.probe not in ("sampling", "gentrain"):
        ap.error("--part applies to the 'sampling'/'gentrain' probes only")
    if args.variant is not None and args.probe not in ("gan", "gentrain"):
        ap.error("--variant applies to the 'gan'/'gentrain' probes only")
    if args.probe == "sampling":
        batches = (tuple(int(b) for b in args.batches.split(","))
                   if args.batches else None)
        probe_sampling(args.part, batches)
        return
    if args.probe == "gan":
        probe_gan(args.variant)
        return
    if args.probe == "gentrain":
        probe_gentrain(args.part, args.variant)
        return
    {"pipeline": probe_pipeline, "block": probe_block,
     "mlp": probe_mlp}[args.probe]()


if __name__ == "__main__":
    main()
