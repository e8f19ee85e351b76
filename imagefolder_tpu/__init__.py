"""imagefolder_tpu — TPU-native (JAX/XLA/Pallas/pjit) rebuild of the
XQ-GAN / ImageFolder / RobustTok stack (reference: lxa9867/ImageFolder).

Three workload families, same capabilities as the reference, re-designed
TPU-first:

  A. tokenizer   — VQ-GAN-style multi-scale residual + product-quantized
                   image tokenizers (VQ / MSRQ / LFQ / BSQ), GAN training.
  B. var         — VAR next-scale-prediction generator (folded PQ tokens).
  C. rar         — RAR randomized-order next-token generator.

Layout:
  ops/       pure-functional compute primitives (resize, quantizers,
             perturbation, sampling) + Pallas kernels for the hot paths.
  models/    flax.linen model definitions (CNN/ViT tokenizer, VAR, RAR).
  losses/    LPIPS, GAN losses, discriminators, DiffAug, clip alignment.
  parallel/  mesh construction + sharding rules (data/fsdp axes).
  data/      ImageNet-folder input pipeline, host-overlapped prefetch.
  train/     jitted train steps (two-optimizer GAN step, VAR, RAR).
  eval/      FID/IS/precision/recall + PSNR/SSIM.
  utils/     config system (YAML parity with reference configs/*.yaml),
             checkpointing (orbax), EMA, torch->jax weight conversion.
"""

__version__ = "0.1.0"
