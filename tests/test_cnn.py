"""Golden-parity: CNN encoder/decoder vs reference xqgan_model Encoder/Decoder.

The reference module imports timm/peft/etc at module scope; we stub those
(they're irrelevant to the pure-torch CNN classes) to obtain golden values."""

import numpy as np
import torch

from tests.ref_utils import nhwc, nchw, ref_path, stub_heavy_modules, t2n

ref_path()


def _import_ref_xqgan():
    # reference's own `datasets` package pulls torchvision (absent here);
    # only Normalize/Denormalize are referenced by xqgan_model
    stub_heavy_modules()
    import tokenizer.tokenizer_image.xqgan_model as ref_xqgan
    return ref_xqgan


ref_xqgan = _import_ref_xqgan()

import jax.numpy as jnp  # noqa: E402

from imagefolder_tpu.models.cnn import Decoder, Encoder  # noqa: E402
from imagefolder_tpu.utils.convert_torch import (  # noqa: E402
    convert_cnn_decoder,
    convert_cnn_encoder,
)

CH_MULT = (1, 2, 4)  # small pyramid for test speed (f4 model)


def test_encoder_matches_reference():
    torch.manual_seed(0)
    ref = ref_xqgan.Encoder(ch=32, ch_mult=list(CH_MULT), z_channels=16)
    ref.eval()
    mine = Encoder(ch=32, ch_mult=CH_MULT, z_channels=16)
    params = convert_cnn_encoder(ref.state_dict(), prefix="", ch_mult=CH_MULT)
    x = torch.randn(2, 3, 32, 32, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        want = ref(x)
    got = mine.apply({"params": params}, jnp.asarray(nhwc(x.numpy())))
    np.testing.assert_allclose(nchw(got), t2n(want), rtol=1e-4, atol=1e-4)


def test_decoder_matches_reference():
    torch.manual_seed(0)
    ref = ref_xqgan.Decoder(ch=32, ch_mult=list(CH_MULT), z_channels=16)
    ref.eval()
    mine = Decoder(ch=32, ch_mult=CH_MULT)
    params = convert_cnn_decoder(ref.state_dict(), prefix="", ch_mult=CH_MULT)
    z = torch.randn(2, 16, 8, 8, generator=torch.Generator().manual_seed(2))
    with torch.no_grad():
        want = ref(z)
    got = mine.apply({"params": params}, jnp.asarray(nhwc(z.numpy())))
    np.testing.assert_allclose(nchw(got), t2n(want), rtol=1e-4, atol=1e-4)


def test_last_layer_path():
    mine = Decoder(ch=32, ch_mult=CH_MULT)
    import jax

    z = jnp.zeros((1, 8, 8, 16))
    variables = mine.init(jax.random.PRNGKey(0), z)
    p = variables["params"]
    for k in Decoder.last_layer_param_path:
        p = p[k]
    assert p.shape == (3, 3, 32, 3)
