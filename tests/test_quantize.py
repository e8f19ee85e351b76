"""Golden-parity tests: quantizers vs the upstream reference implementation.

We instantiate the reference torch modules (read-only import), sync weights
into the flax modules, and require matching indices (exact) and features /
losses (fp32 tolerance)."""

import numpy as np
import pytest
import torch

from tests.ref_utils import conv_to_flax, nhwc, nchw, ref_path, t2n

ref_path()

from tokenizer.tokenizer_image.quant import VectorQuantizer2  # noqa: E402
from tokenizer.tokenizer_image.lookup_free_quantize import LFQ  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from imagefolder_tpu.ops.quantize import (  # noqa: E402
    MultiScaleLFQ,
    MultiScaleVQ,
    SingleVQ,
)

PNS = (1, 2, 3)  # small pyramid, final 3x3 grid (num_latent_tokens=9)


def _make_ref_vq2(znorm, vocab=64, c=8, drop=0.5):
    torch.manual_seed(0)
    q = VectorQuantizer2(
        vocab, c, using_znorm=znorm, v_patch_nums=list(PNS),
        num_latent_tokens=9, share_quant_resi=4, codebook_drop=drop,
    )
    return q


def _params_from_ref(q, module_cls=MultiScaleVQ):
    params = {}
    if hasattr(q, "embedding"):
        params["codebook"] = t2n(q.embedding.weight)
    phis = {}
    for i, phi in enumerate(q.quant_resi.qresi_ls):
        phis[f"phi_{i}"] = {"Conv_0": conv_to_flax(phi)}
    params["phi_bank"] = phis
    return {"params": params}


@pytest.mark.parametrize("znorm", [False, True])
def test_msvq_eval_forward_matches(znorm):
    q = _make_ref_vq2(znorm)
    q.eval()
    mine = MultiScaleVQ(
        vocab_size=64, Cvae=8, v_patch_nums=PNS, using_znorm=znorm,
        num_latent_tokens=9, share_quant_resi=4, codebook_drop=0.5,
    )
    variables = _params_from_ref(q)

    x = torch.randn(4, 8, 3, 3, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        f_hat_ref, _, vq_ref, commit_ref, _ = q(x, ret_usages=False)
    out = mine.apply(variables, jnp.asarray(nhwc(x.numpy())), train=False)
    np.testing.assert_allclose(nchw(out.f_hat), t2n(f_hat_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(out.vq_loss), float(vq_ref), rtol=1e-4)
    np.testing.assert_allclose(float(out.commit_loss), float(commit_ref), rtol=1e-4)


@pytest.mark.parametrize("znorm", [False, True])
def test_msvq_train_dropout_matches(znorm):
    q = _make_ref_vq2(znorm)
    q.train()
    mine = MultiScaleVQ(
        vocab_size=64, Cvae=8, v_patch_nums=PNS, using_znorm=znorm,
        num_latent_tokens=9, share_quant_resi=4, codebook_drop=0.5,
    )
    variables = _params_from_ref(q)
    x = torch.randn(4, 8, 3, 3, generator=torch.Generator().manual_seed(2))
    dropout = torch.tensor([1, 2, 3, 1])
    f_hat_ref, _, vq_ref, commit_ref, _ = q(x, ret_usages=False, dropout=dropout)
    out = mine.apply(
        variables, jnp.asarray(nhwc(x.numpy())),
        dropout_n=jnp.asarray(dropout.numpy()), train=True,
    )
    np.testing.assert_allclose(nchw(out.f_hat), t2n(f_hat_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(out.vq_loss), float(vq_ref), rtol=1e-4)
    np.testing.assert_allclose(float(out.commit_loss), float(commit_ref), rtol=1e-4)
    # per-scale hit counts match the reference bincounts
    idx_ref = q.f_to_idxBl_or_fhat(x, to_fhat=False, v_patch_nums=list(PNS))
    hits0 = np.bincount(t2n(idx_ref[0]).ravel(), minlength=64)
    np.testing.assert_array_equal(np.asarray(out.hits_SV[0]), hits0)


@pytest.mark.parametrize("znorm", [False, True])
def test_msvq_f_to_idxBl_matches(znorm):
    q = _make_ref_vq2(znorm)
    q.eval()
    mine = MultiScaleVQ(
        vocab_size=64, Cvae=8, v_patch_nums=PNS, using_znorm=znorm,
        num_latent_tokens=9, share_quant_resi=4,
    )
    variables = _params_from_ref(q)
    x = torch.randn(4, 8, 3, 3, generator=torch.Generator().manual_seed(3))
    with torch.no_grad():
        idx_ref = q.f_to_idxBl_or_fhat(x, to_fhat=False, v_patch_nums=list(PNS))
        fhat_ref = q.f_to_idxBl_or_fhat(x, to_fhat=True, v_patch_nums=list(PNS))
    idx = mine.apply(variables, jnp.asarray(nhwc(x.numpy())), False,
                     method=MultiScaleVQ.f_to_idxBl_or_fhat)
    fhat = mine.apply(variables, jnp.asarray(nhwc(x.numpy())), True,
                      method=MultiScaleVQ.f_to_idxBl_or_fhat)
    for a, b in zip(idx, idx_ref):
        np.testing.assert_array_equal(np.asarray(a), t2n(b))
    for a, b in zip(fhat, fhat_ref):
        np.testing.assert_allclose(nchw(a), t2n(b), rtol=1e-4, atol=1e-5)


def test_msvq_var_input_and_ar_input_match():
    q = _make_ref_vq2(False)
    q.eval()
    mine = MultiScaleVQ(
        vocab_size=64, Cvae=8, v_patch_nums=PNS, using_znorm=False,
        num_latent_tokens=9, share_quant_resi=4,
    )
    variables = _params_from_ref(q)
    x = torch.randn(2, 8, 3, 3, generator=torch.Generator().manual_seed(4))
    with torch.no_grad():
        idx_ref = q.f_to_idxBl_or_fhat(x, to_fhat=False, v_patch_nums=list(PNS))
        var_in_ref = q.idxBl_to_var_input([i.clone() for i in idx_ref])
    idx_j = [jnp.asarray(t2n(i)) for i in idx_ref]
    var_in = mine.apply(variables, idx_j, method=MultiScaleVQ.idxBl_to_var_input)
    np.testing.assert_allclose(np.asarray(var_in), t2n(var_in_ref), rtol=1e-4, atol=1e-5)

    # progressive truncation (quant.py:236-237 break): prog_si=1 keeps only
    # scale 0's teacher-forcing piece; prog_si=0 -> None (sos-only stage)
    q.prog_si = 1
    with torch.no_grad():
        var_in_p1_ref = q.idxBl_to_var_input([i.clone() for i in idx_ref])
    q.prog_si = -1
    var_in_p1 = mine.apply(variables, idx_j, 1,
                           method=MultiScaleVQ.idxBl_to_var_input)
    np.testing.assert_allclose(np.asarray(var_in_p1), t2n(var_in_p1_ref),
                               rtol=1e-4, atol=1e-5)
    assert var_in_p1.shape[1] == PNS[1] ** 2
    assert mine.apply(variables, idx_j, 0,
                      method=MultiScaleVQ.idxBl_to_var_input) is None

    # one AR decode stage
    h = torch.randn(2, 8, 1, 1, generator=torch.Generator().manual_seed(5))
    f_hat0 = torch.zeros(2, 8, 3, 3)
    with torch.no_grad():
        f_ref, nxt_ref = q.get_next_autoregressive_input(0, len(PNS), f_hat0.clone(), h)
    f_j, nxt_j = mine.apply(
        variables, 0, len(PNS), jnp.asarray(nhwc(f_hat0.numpy())),
        jnp.asarray(nhwc(h.numpy())), method=MultiScaleVQ.get_next_autoregressive_input,
    )
    np.testing.assert_allclose(nchw(f_j), t2n(f_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(nchw(nxt_j), t2n(nxt_ref), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("soft", [True, False])
def test_lfq_train_matches(soft):
    torch.manual_seed(0)
    c = 6  # vocab 64
    ref = LFQ(
        64, c, using_znorm=False, v_patch_nums=list(PNS), num_latent_tokens=9,
        share_quant_resi=4, codebook_drop=0.5, scale=0.8,
        entropy_weight=0.1, soft_entropy=soft,
    )
    ref.train()
    mine = MultiScaleLFQ(
        codebook_size=64, Cvae=c, v_patch_nums=PNS, using_znorm=False,
        num_latent_tokens=9, share_quant_resi=4, codebook_drop=0.5,
        scale=0.8, entropy_weight=0.1, soft_entropy=soft,
    )
    phis = {f"phi_{i}": {"Conv_0": conv_to_flax(p)} for i, p in enumerate(ref.quant_resi.qresi_ls)}
    variables = {"params": {"phi_bank": phis}}

    x = torch.randn(4, c, 3, 3, generator=torch.Generator().manual_seed(6))
    dropout = torch.tensor([2, 3, 1, 2])
    f_ref, _, vq_ref, commit_ref, ent_ref = ref(x, ret_usages=False, dropout=dropout)
    out = mine.apply(
        variables, jnp.asarray(nhwc(x.numpy())),
        dropout_n=jnp.asarray(dropout.numpy()), train=True,
    )
    np.testing.assert_allclose(nchw(out.f_hat), t2n(f_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(out.vq_loss), float(vq_ref), rtol=1e-4)
    np.testing.assert_allclose(float(out.commit_loss), float(commit_ref), rtol=1e-4)
    if not soft:
        # soft mode: the reference's z[int_mask] advanced-indexing bug makes
        # its total entropy unintended; per-scale parity with a bool mask is
        # asserted in test_lfq_soft_entropy_bool_mask_parity instead.
        np.testing.assert_allclose(
            float(out.entropy_loss), float(ent_ref), rtol=1e-3, atol=1e-5
        )


def test_lfq_soft_entropy_bool_mask_parity():
    """Per-scale analytical entropy must match the reference when the
    reference gets the *intended* boolean mask."""
    torch.manual_seed(0)
    c = 6
    ref = LFQ(64, c, using_znorm=False, v_patch_nums=list(PNS), num_latent_tokens=9,
              share_quant_resi=4, scale=0.8)
    mine = MultiScaleLFQ(codebook_size=64, Cvae=c, v_patch_nums=PNS,
                         num_latent_tokens=9, share_quant_resi=4, scale=0.8)
    phis = {f"phi_{i}": {"Conv_0": conv_to_flax(p)}
            for i, p in enumerate(ref.quant_resi.qresi_ls)}
    variables = {"params": {"phi_bank": phis}}
    z = torch.randn(4, 9, 1, c, generator=torch.Generator().manual_seed(7))
    mask = torch.tensor([True, True, False, True])
    for si in range(3):
        cb = ref.codebook * ref.scaler[si]
        ps_ref, ce_ref, _ = ref.soft_entropy_loss(z, si, cb, mask)
        ps, ce = mine.apply(
            variables, jnp.asarray(z.numpy()), si, jnp.asarray(t2n(cb)),
            jnp.asarray(mask.numpy()), method=MultiScaleLFQ._soft_entropy_loss,
        )
        np.testing.assert_allclose(float(ps), float(ps_ref), rtol=1e-4)
        np.testing.assert_allclose(float(ce), float(ce_ref), rtol=1e-4)


def test_lfq_idx_roundtrip():
    mine = MultiScaleLFQ(
        codebook_size=64, Cvae=6, v_patch_nums=PNS, num_latent_tokens=9,
        share_quant_resi=4,
    )
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 3, 3, 6))
    variables = mine.init(key, x)
    idx = mine.apply(variables, x, False, method=MultiScaleLFQ.f_to_idxBl_or_fhat)
    assert [i.shape for i in idx] == [(2, 1), (2, 4), (2, 9)]
    assert all(int(i.max()) < 64 and int(i.min()) >= 0 for i in idx)


def test_single_vq_straight_through_and_shapes():
    mine = SingleVQ(vocab_size=32, z_channels=8, codebook_norm=True)
    key = jax.random.PRNGKey(0)
    z = jax.random.normal(key, (2, 4, 4, 8))
    variables = mine.init(key, z)
    out = mine.apply(variables, z, train=True)
    assert out.f_hat.shape == z.shape
    # straight-through: grad wrt input is identity-like (through normalize)
    g = jax.grad(lambda zz: float(0) + mine.apply(variables, zz).f_hat.sum())(z)
    assert np.isfinite(np.asarray(g)).all()
    idx = mine.apply(variables, z, False, method=SingleVQ.f_to_idxBl_or_fhat)
    assert idx[0].shape == (2, 16)
