"""Additional golden-parity tests: single-scale VectorQuantizer and the
top-k/top-p sampling filter vs the reference."""

import numpy as np
import torch

from tests.ref_utils import nchw, nhwc, ref_path, stub_heavy_modules, t2n

ref_path()
stub_heavy_modules()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from imagefolder_tpu.ops.quantize import SingleVQ  # noqa: E402
from imagefolder_tpu.ops.sampling import top_k_top_p_filter  # noqa: E402


def test_single_vq_matches_reference():
    import tokenizer.tokenizer_image.xqgan_model as ref_xqgan

    torch.manual_seed(0)
    for norm in (True, False):
        ref = ref_xqgan.VectorQuantizer(vocab_size=32, z_channels=8,
                                        codebook_norm=norm)
        # NOTE: the reference's eval path crashes (codebook_usage unbound,
        # xqgan_model.py:801) — golden values come from train mode.
        ref.train()
        mine = SingleVQ(vocab_size=32, z_channels=8, codebook_norm=norm)
        variables = {"params": {"codebook": t2n(ref.embedding.weight)}}
        z = torch.randn(2, 8, 4, 4, generator=torch.Generator().manual_seed(1))
        with torch.no_grad():
            zq_ref, _, vq_ref, commit_ref, _ = ref(z, ret_usages=True)
        out = mine.apply(variables, jnp.asarray(nhwc(z.numpy())))
        np.testing.assert_allclose(nchw(out.f_hat), t2n(zq_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(out.vq_loss), float(vq_ref), rtol=1e-4)
        np.testing.assert_allclose(float(out.commit_loss), float(commit_ref),
                                   rtol=1e-4)
        idx_ref = ref.f_to_idxBl_or_fhat(z, to_fhat=False, v_patch_nums=None)
        idx = mine.apply(variables, jnp.asarray(nhwc(z.numpy())), False,
                         method=SingleVQ.f_to_idxBl_or_fhat)
        np.testing.assert_array_equal(
            np.asarray(idx[0]).ravel(), t2n(idx_ref[0]).ravel())


def test_top_k_top_p_filter_matches_reference():
    from models.helpers import sample_with_top_k_top_p_

    logits = torch.randn(2, 5, 64, generator=torch.Generator().manual_seed(2))
    for top_k, top_p in [(8, 0.0), (0, 0.9), (8, 0.9), (0, 0.0)]:
        want_p = sample_with_top_k_top_p_(logits.clone(), top_k=top_k,
                                          top_p=top_p, return_p=True)
        got = top_k_top_p_filter(jnp.asarray(logits.numpy()), top_k, top_p)
        got_p = jax.nn.softmax(got, axis=-1)
        np.testing.assert_allclose(np.asarray(got_p), t2n(want_p),
                                   rtol=1e-4, atol=1e-6)


def test_top_k_clamps_to_small_vocab():
    """top_k larger than the vocab (the reference CLIs hard-code 900 for
    V=4096, inference.py:32) must degrade to a no-op filter on small
    vocabularies instead of crashing — surfaced by the e2e VAR CFG preview
    at V=256/branch."""
    logits = jnp.asarray(np.random.default_rng(3).normal(size=(2, 4, 16)),
                         jnp.float32)
    got = top_k_top_p_filter(logits, top_k=900, top_p=0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(logits),
                               rtol=0, atol=0)
    # still filters when k < V
    got8 = top_k_top_p_filter(logits, top_k=8, top_p=0.0)
    assert (np.asarray(got8) == -np.inf).sum() == 2 * 4 * 8


def test_gumbel_softmax_more_smooth_matches_reference():
    """The ``more_smooth`` stage math (var.py:196-225 documented recipe:
    gumbel-softmax of (1+ratio)-scaled logits at the mask-git temperature,
    times the codebook) vs the reference ``gumbel_softmax_with_rng``
    (helpers.py:25-40) with shared gumbel noise."""
    from models.helpers import gumbel_softmax_with_rng

    from imagefolder_tpu.ops.sampling import gumbel_softmax

    rng = np.random.default_rng(7)
    logits = rng.normal(size=(2, 9, 32)).astype(np.float32)
    codebook = rng.normal(size=(32, 8)).astype(np.float32)

    for seed, (si, s) in zip((0, 1, 2), ((0, 10), (4, 10), (9, 10))):
        ratio = si / (s - 1)
        gum_t = max(0.27 * (1.0 - ratio * 0.95), 0.005)
        t_logits = torch.tensor(logits) * (1.0 + ratio)

        # reference call, seeded generator
        want_sm = gumbel_softmax_with_rng(
            t_logits.clone(), tau=gum_t, hard=False,
            rng=torch.Generator().manual_seed(seed))
        want = want_sm @ torch.tensor(codebook)

        # replay the exact noise torch drew (-log Exp(1) ~ Gumbel(0,1),
        # helpers.py:29) and inject it into the jax path
        g = -torch.empty_like(t_logits).exponential_(
            generator=torch.Generator().manual_seed(seed)).log()
        sm = gumbel_softmax(jnp.asarray(logits) * (1.0 + ratio), key=None,
                            tau=gum_t, g=jnp.asarray(g.numpy()))
        got = np.asarray(sm) @ codebook
        np.testing.assert_allclose(got, t2n(want), rtol=2e-4, atol=1e-5)
