"""Gradient-parity goldens: backward of the quantizer losses must match
torch autograd (straight-through, masked per-scale losses, codebook grads)."""

import numpy as np
import torch

from tests.ref_utils import conv_to_flax, nchw, nhwc, ref_path, t2n

ref_path()

from tokenizer.tokenizer_image.quant import VectorQuantizer2  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from imagefolder_tpu.ops.quantize import MultiScaleVQ  # noqa: E402

PNS = (1, 2, 3)


def test_msvq_input_and_codebook_grads_match():
    torch.manual_seed(0)
    ref = VectorQuantizer2(64, 8, using_znorm=False, v_patch_nums=list(PNS),
                           num_latent_tokens=9, share_quant_resi=4,
                           codebook_drop=0.5)
    ref.train()
    mine = MultiScaleVQ(vocab_size=64, Cvae=8, v_patch_nums=PNS,
                        using_znorm=False, num_latent_tokens=9,
                        share_quant_resi=4, codebook_drop=0.5)
    params = {"codebook": t2n(ref.embedding.weight),
              "phi_bank": {f"phi_{i}": {"Conv_0": conv_to_flax(p)}
                           for i, p in enumerate(ref.quant_resi.qresi_ls)}}

    x = torch.randn(4, 8, 3, 3, generator=torch.Generator().manual_seed(1),
                    requires_grad=True)
    dropout = torch.tensor([1, 2, 3, 1])
    f_hat, _, vq, commit, _ = ref(x, ret_usages=False, dropout=dropout)
    # total objective: losses + a downstream consumer of the ST output
    loss_ref = vq + commit + (f_hat * torch.sign(f_hat.detach())).mean()
    loss_ref.backward()
    gx_ref = t2n(x.grad)
    gcb_ref = t2n(ref.embedding.weight.grad)
    gphi_ref = t2n(ref.quant_resi.qresi_ls[0].weight.grad)

    def loss_fn(p, xx):
        out = mine.apply({"params": p}, xx,
                         dropout_n=jnp.asarray(dropout.numpy()), train=True)
        ds = out.f_hat * jnp.sign(jax.lax.stop_gradient(out.f_hat))
        return out.vq_loss + out.commit_loss + jnp.mean(ds)

    gp, gx = jax.grad(loss_fn, argnums=(0, 1))(
        params, jnp.asarray(nhwc(x.detach().numpy())))
    np.testing.assert_allclose(nchw(gx), gx_ref, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp["codebook"]), gcb_ref,
                               rtol=1e-3, atol=1e-5)
    got_phi = np.asarray(gp["phi_bank"]["phi_0"]["Conv_0"]["kernel"])
    np.testing.assert_allclose(got_phi.transpose(3, 2, 0, 1), gphi_ref,
                               rtol=1e-3, atol=1e-5)


def test_straight_through_identity():
    """d f_hat / d f == identity through the ST estimator (downstream-only
    objective; quantizer internals detached)."""
    mine = MultiScaleVQ(vocab_size=16, Cvae=4, v_patch_nums=(1, 2),
                        num_latent_tokens=4, share_quant_resi=2)
    key = jax.random.PRNGKey(0)
    f = jax.random.normal(key, (2, 2, 2, 4))
    params = mine.init(key, f)["params"]
    g = jax.grad(lambda xx: jnp.sum(
        mine.apply({"params": params}, xx).f_hat * 2.0))(f)
    np.testing.assert_allclose(np.asarray(g), 2.0 * np.ones_like(g), rtol=1e-6)
