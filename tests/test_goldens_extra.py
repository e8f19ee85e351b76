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
