"""Eval subsystem: FID math vs scipy-golden, IS, precision/recall sanity,
PSNR/SSIM vs analytic values, Inception shapes + converter."""

import numpy as np

import jax
import jax.numpy as jnp

from imagefolder_tpu.eval import (
    InceptionV3,
    compute_statistics,
    frechet_distance,
    inception_score,
    precision_recall,
    psnr,
    ssim,
)


def test_frechet_distance_identity_and_shift():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((500, 16)).astype(np.float64)
    s = compute_statistics(x)
    assert abs(s.frechet_distance(s)) < 1e-6
    y = x + 2.0
    s2 = compute_statistics(y)
    # mean shift of 2 in 16 dims -> FID ~ 16 * 4 = 64
    np.testing.assert_allclose(s.frechet_distance(s2), 64.0, rtol=1e-3)


def test_inception_score_bounds():
    # uniform predictions -> IS == 1
    p = np.full((100, 10), 0.1)
    np.testing.assert_allclose(inception_score(p), 1.0, rtol=1e-5)
    # one-hot, balanced classes -> IS == num_classes
    p = np.eye(10)[np.arange(100) % 10] * (1 - 1e-9) + 1e-10
    np.testing.assert_allclose(inception_score(p), 10.0, rtol=1e-3)


def test_precision_recall_sanity():
    rng = np.random.default_rng(1)
    ref = rng.standard_normal((400, 8)).astype(np.float32)
    same = rng.standard_normal((400, 8)).astype(np.float32)
    far = same + 100.0
    p_same, r_same = precision_recall(ref, same)
    p_far, r_far = precision_recall(ref, far)
    assert p_same > 0.8 and r_same > 0.8
    assert p_far < 0.05 and r_far < 0.05


def test_psnr_ssim():
    key = jax.random.PRNGKey(0)
    a = jax.random.uniform(key, (2, 32, 32, 3))
    assert float(jnp.min(psnr(a, a))) > 100
    assert np.allclose(np.asarray(ssim(a, a)), 1.0, atol=1e-5)
    b = jnp.clip(a + 0.1 * jax.random.normal(jax.random.PRNGKey(1), a.shape), 0, 1)
    assert float(jnp.mean(psnr(a, b))) < 30
    assert float(jnp.mean(ssim(a, b))) < 0.99
    # skimage golden (if available in env, else analytic check only)
    try:
        from skimage.metrics import structural_similarity
        want = np.mean([
            structural_similarity(np.asarray(a[0]), np.asarray(b[0]),
                                  channel_axis=2, data_range=1.0,
                                  gaussian_weights=False)
        ])
        got = float(ssim(a[:1], b[:1])[0])
        np.testing.assert_allclose(got, want, atol=5e-3)
    except ImportError:
        pass


def test_inception_shapes_and_converter():
    net = InceptionV3()
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (2, 64, 64, 3))
    variables = net.init(key, x)
    out = net.apply(variables, x)
    assert out["pool3"].shape == (2, 2048)
    assert out["spatial"].shape == (2, 7 * 17 * 17)
    assert out["softmax"].shape == (2, 1008)
    np.testing.assert_allclose(np.asarray(out["softmax"].sum(-1)), 1.0, rtol=1e-4)
    # converter roundtrip on a fabricated torch-style dict
    from imagefolder_tpu.eval import convert_inception_checkpoint
    sd = {
        "Conv2d_1a_3x3.conv.weight": np.zeros((32, 3, 3, 3), np.float32),
        "Conv2d_1a_3x3.bn.weight": np.ones((32,), np.float32),
        "Conv2d_1a_3x3.bn.bias": np.zeros((32,), np.float32),
        "Conv2d_1a_3x3.bn.running_mean": np.zeros((32,), np.float32),
        "Conv2d_1a_3x3.bn.running_var": np.ones((32,), np.float32),
        "Mixed_5b.branch1x1.conv.weight": np.zeros((64, 192, 1, 1), np.float32),
        "fc.weight": np.zeros((1008, 2048), np.float32),
        "fc.bias": np.zeros((1008,), np.float32),
    }
    cv = convert_inception_checkpoint(sd)
    assert cv["params"]["Conv2d_1a_3x3"]["conv"]["kernel"].shape == (3, 3, 3, 32)
    assert cv["batch_stats"]["Conv2d_1a_3x3"]["bn"]["mean"].shape == (32,)
    assert cv["params"]["Mixed_5b"]["branch1x1"]["conv"]["kernel"].shape == (1, 1, 192, 64)
    assert cv["params"]["fc"]["kernel"].shape == (2048, 1008)


def test_evaluator_cli_protocol(tmp_path):
    """End-to-end evaluator.py:27-60 protocol on synthetic npz batches:
    identical ref/sample -> FID ~ 0, precision/recall ~ 1; a stats-carrying
    ref npz (mu/sigma/mu_s/sigma_s) is honored (evaluator.py:174-187)."""
    import sys
    from pathlib import Path

    import numpy as np

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from scripts.evaluate_fid import (
        compute_activations,
        evaluate,
        load_inception,
    )

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (64, 32, 32, 3), dtype=np.uint8)
    ref = tmp_path / "ref.npz"
    smp = tmp_path / "smp.npz"
    np.savez(ref, arr_0=arr)
    np.savez(smp, arr_0=arr)

    feat_fn = load_inception(None)
    m = evaluate(str(ref), str(smp), feat_fn, batch_size=32, verbose=False)
    assert abs(m["fid"]) < 1e-3
    assert abs(m["sfid"]) < 1e-3
    assert m["inception_score"] >= 1.0
    assert m["precision"] == 1.0 and m["recall"] == 1.0

    # stats-carrying ref npz: perturb stats -> nonzero FID even with
    # identical pixel batches, proving the precomputed path is used
    acts = compute_activations(arr, feat_fn, 32, verbose=False)
    from imagefolder_tpu.eval.fid import compute_statistics

    s_pool = compute_statistics(acts[0])
    s_sp = compute_statistics(acts[1])
    ref2 = tmp_path / "ref_stats.npz"
    np.savez(ref2, arr_0=arr, mu=s_pool.mu + 1.0, sigma=s_pool.sigma,
             mu_s=s_sp.mu, sigma_s=s_sp.sigma)
    m2 = evaluate(str(ref2), str(smp), feat_fn, batch_size=32, verbose=False)
    assert m2["fid"] > 100.0  # mu shifted by 1 in every dim -> diff^2 = 2048
    assert abs(m2["sfid"]) < 1e-3


def _fabricate_inception_sd(seed=0):
    from imagefolder_tpu.eval.inception import fabricate_inception_state_dict

    return fabricate_inception_state_dict(seed)


def test_inception_validation_gate(tmp_path, monkeypatch):
    """Real-weight gate (VERDICT r2 #8) driven end-to-end on a fabricated
    full checkpoint: coverage assertions, probe statistics, marker write,
    and the evaluate_fid trust check."""
    import torch

    from imagefolder_tpu.eval.inception import (
        inception_gate_status,
        validate_inception_checkpoint,
    )

    monkeypatch.setenv("IMGF_CACHE", str(tmp_path / "cache"))
    ckpt = tmp_path / "pt_inception_fake.pth"
    sd = _fabricate_inception_sd()
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, ckpt)

    assert inception_gate_status(str(ckpt)) is None  # never validated
    stats = validate_inception_checkpoint(str(ckpt))
    assert stats["n_leaves"] == len(sd)
    assert 0.05 < stats["pool3_zero_frac"] < 0.95
    marker = inception_gate_status(str(ckpt))
    assert marker is not None and marker["sha256"] == stats["sha256"]

    # a different checkpoint is not trusted by the marker
    other = tmp_path / "other.pth"
    other.write_bytes(b"not the same file")
    assert inception_gate_status(str(other)) is None

    # a checkpoint with a dropped tensor fails coverage loudly
    bad = dict(sd)
    bad.pop("fc.bias")
    bad_path = tmp_path / "bad.pth"
    torch.save({k: torch.tensor(v) for k, v in bad.items()}, bad_path)
    import pytest as _pytest

    with _pytest.raises(AssertionError, match="coverage|mismatch|missing"):
        validate_inception_checkpoint(str(bad_path), write_marker=False)
