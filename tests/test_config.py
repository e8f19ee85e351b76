"""Config system: every zoo YAML must parse into consistent model/train/run
configs (schema parity with the reference configs/)."""

from pathlib import Path

import pytest

from imagefolder_tpu.utils.config import load_tokenizer_config, parse_overrides

CONFIGS = sorted(Path(__file__).parent.parent.glob("configs/*.yaml"))


@pytest.mark.parametrize("path", CONFIGS, ids=lambda p: p.stem)
def test_zoo_config_parses(path):
    margs, tcfg, run = load_tokenizer_config(str(path))
    assert margs.codebook_size > 0
    assert len(margs.v_patch_nums) >= 1
    assert margs.num_latent_tokens == margs.v_patch_nums[-1] ** 2 or \
        margs.enc_type == "dinov2"
    assert tcfg.disc_type in {"dinodisc", "patchgan", "stylegan"}
    assert run.epochs > 0


def test_specific_values():
    margs, tcfg, run = load_tokenizer_config("configs/MSVR10P2-4096.yaml")
    assert margs.product_quant == 2
    assert margs.codebook_embed_dim == 32
    assert tuple(margs.v_patch_nums) == (1, 1, 2, 3, 3, 4, 5, 6, 8, 11)
    assert margs.num_latent_tokens == 121
    assert margs.abs_pos_embed and margs.half_sem
    # lr scaled by global_batch/128 (reference xqgan_train.py:338)
    assert abs(tcfg.lr - 3e-5 * 1024 / 128) < 1e-9
    assert run.disc_epoch_start == 56

    margs, tcfg, run = load_tokenizer_config("configs/RobustTok.yaml")
    assert run.alpha == 1.0 and run.beta == 0.1 and run.delta == 100
    assert margs.perturb_delta_max == 100

    margs, _, _ = load_tokenizer_config("configs/MSBR10P2-4096.yaml")
    assert margs.lfq and margs.codebook_embed_dim == 12
    assert margs.entropy_loss_ratio == 0.1


def test_overrides():
    ov = parse_overrides(["codebook_size=128", "lfq=true", "lr=1e-3"])
    margs, tcfg, _ = load_tokenizer_config("configs/VQ-4096.yaml", ov)
    assert margs.codebook_size == 128 and margs.lfq
