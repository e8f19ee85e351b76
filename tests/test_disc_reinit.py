"""Periodic discriminator head re-initialization (reference
``discriminator_dino.py:219-234`` / ``xqgan_train.py:436-438``): fresh head
params + fresh disc optimizer state, generator state untouched."""

import jax
import jax.numpy as jnp


def test_reinit_disc_heads_patchgan():
    from imagefolder_tpu.models.tokenizer import ModelArgs
    from imagefolder_tpu.train.tokenizer_train import (
        TokenizerTrainConfig,
        TokenizerTrainer,
    )

    margs = ModelArgs(
        codebook_size=16, codebook_embed_dim=8,
        encoder_ch_mult=(1, 2), decoder_ch_mult=(1, 2), z_channels=32,
        enc_type="cnn", dec_type="cnn", semantic_guide="none",
        detail_guide="none", num_latent_tokens=256, image_size=32,
        v_patch_nums=(1, 16), start_drop=1,
    )
    tcfg = TokenizerTrainConfig(disc_type="patchgan", epochs=1,
                                steps_per_epoch=3, image_size=32)
    trainer = TokenizerTrainer(margs, tcfg)

    key = jax.random.PRNGKey(0)
    sample = jnp.zeros((2, 32, 32, 3))
    state = trainer.init(key, sample)
    # take one step so the disc optimizer accumulates non-trivial state
    state, _ = trainer.train_step(
        state, jax.random.uniform(key, (2, 32, 32, 3), minval=-1, maxval=1),
        key, epoch=0, alpha=0.0, beta=0.0, delta_ratio=1.0, fade_blur=0.0)

    new = trainer.reinit_disc_heads(state, jax.random.PRNGKey(7), sample)

    # generator untouched (same objects / values)
    assert jax.tree.all(jax.tree.map(
        lambda a, b: jnp.array_equal(a, b), state.params, new.params))
    # disc params re-drawn: same tree/shapes, different values somewhere
    assert (jax.tree.structure(state.disc_params)
            == jax.tree.structure(dict(new.disc_params)))
    diffs = jax.tree.leaves(jax.tree.map(
        lambda a, b: (a.shape == b.shape) and bool(jnp.any(a != b)),
        state.disc_params, dict(new.disc_params)))
    assert any(diffs)
    # fresh optimizer state: momenta zeroed
    mu = jax.tree.leaves(new.disc_opt_state)
    old_mu = jax.tree.leaves(state.disc_opt_state)
    assert any(bool(jnp.any(a != b)) for a, b in zip(old_mu, mu)
               if getattr(a, "shape", None) == getattr(b, "shape", None))
    # reinit'd state still trains
    new, metrics = trainer.train_step(
        new, jax.random.uniform(key, (2, 32, 32, 3), minval=-1, maxval=1),
        jax.random.PRNGKey(3), epoch=0, alpha=0.0, beta=0.0,
        delta_ratio=1.0, fade_blur=0.0)
    assert all(bool(jnp.all(jnp.isfinite(v))) for v in metrics.values())
