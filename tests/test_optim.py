"""LR schedule golden parity vs the reference ``utils/lr_control.py``."""

import numpy as np
import pytest

from tests.ref_utils import ref_path

ref_path()

from utils.lr_control import lr_wd_annealing as ref_annealing  # noqa: E402

from imagefolder_tpu.train.optim import lr_wd_annealing  # noqa: E402


class _FakeOpt:
    def __init__(self):
        self.param_groups = [{"params": [], "lr": 0.0, "weight_decay": 0.0}]


@pytest.mark.parametrize("sched", ["cos", "lin", "lin0", "lin00", "lin0.3",
                                   "exp"])
def test_lr_schedule_matches_reference(sched):
    peak, wp_it, max_it, wpe = 3e-4, 50, 1000, 0.01
    mine = lr_wd_annealing(sched, peak, wp_it, max_it, final_lr_ratio=wpe)
    for it in [0, 1, 10, 49, 50, 51, 120, 500, 900, 998]:
        opt = _FakeOpt()
        out = ref_annealing(sched, opt, peak, 0.0, 0.0, it, wp_it, max_it,
                            wpe=wpe)
        # reference returns (min_lr, max_lr, min_wd, max_wd)
        want = out[1]
        got = float(mine(it))
        np.testing.assert_allclose(got, want, rtol=2e-5, err_msg=f"{sched}@{it}")


def test_wd_cosine_anneal_matches_reference():
    """wd leg of lr_wd_annealing (utils/lr_control.py:47-48), incl. per-group
    wd_sc scaling read back from param_groups."""
    from imagefolder_tpu.train.optim import wd_cosine_anneal

    wd, wd_end, max_it = 0.05, 0.01, 1000
    mine = wd_cosine_anneal(wd, wd_end, max_it)
    for it in [0, 1, 17, 250, 500, 750, 998, 999]:
        opt = _FakeOpt()
        opt.param_groups[0]["wd_sc"] = 0.5
        out = ref_annealing("cos", opt, 1e-4, wd, wd_end, it, 50, max_it)
        np.testing.assert_allclose(float(mine(it)) * 0.5, out[3], rtol=1e-6,
                                   err_msg=f"wd@{it}")
        np.testing.assert_allclose(float(mine(it)) * 0.5,
                                   opt.param_groups[0]["weight_decay"],
                                   rtol=1e-6)


def test_adamw_trajectory_matches_torch_reference():
    """End-to-end optimizer parity: our adamw_with_freezing (global grad
    clip, cosine wd anneal, per-group lr_sc/wd_sc, frozen exclusion) vs
    torch AdamW driven by the reference lr_wd_annealing per step — the
    composition VARTrainer uses (train.py:122-139, amp_sc.py:39-66)."""
    import torch

    import jax
    import jax.numpy as jnp
    from imagefolder_tpu.train.optim import adamw_with_freezing

    peak, wp_it, max_it = 1e-2, 2, 12
    wd, wd_end, clip = 0.05, 0.01, 0.25
    lr_sc_g, wd_sc_g = 0.5, 2.0

    rng = np.random.default_rng(0)
    w0 = rng.standard_normal((3, 4)).astype(np.float32)       # default D
    b0 = rng.standard_normal((4,)).astype(np.float32)         # ND (bias)
    s0 = rng.standard_normal((2, 2)).astype(np.float32)       # scaled group
    f0 = rng.standard_normal((2,)).astype(np.float32)         # frozen
    gw = rng.standard_normal((3, 4)).astype(np.float32)
    gb = rng.standard_normal((4,)).astype(np.float32)
    gs = rng.standard_normal((2, 2)).astype(np.float32)
    gf = 100.0 * rng.standard_normal((2,)).astype(np.float32)  # must not leak

    # --- torch side: param groups w/ lr_sc, wd_sc; global clip over
    # trainable params only; per-step lr/wd from the reference annealer
    tw, tb, ts = (torch.nn.Parameter(torch.tensor(x)) for x in (w0, b0, s0))
    opt = torch.optim.AdamW(
        [{"params": [tw], "lr_sc": 1.0, "wd_sc": 1.0},
         {"params": [tb], "lr_sc": 1.0, "wd_sc": 0.0},
         {"params": [ts], "lr_sc": lr_sc_g, "wd_sc": wd_sc_g}],
        lr=peak, betas=(0.9, 0.95), eps=1e-8, weight_decay=wd)
    for it in range(max_it):
        ref_annealing("cos", opt, peak, wd, wd_end, it, wp_it, max_it)
        opt.zero_grad()
        tw.grad, tb.grad, ts.grad = (torch.tensor(g) for g in (gw, gb, gs))
        torch.nn.utils.clip_grad_norm_([tw, tb, ts], clip)
        opt.step()

    # --- our side: same composition through one optax transform
    sched = lr_wd_annealing("cos", peak, wp_it, max_it, final_lr_ratio=0.001)
    tx = adamw_with_freezing(
        sched, weight_decay=wd, weight_decay_end=wd_end, total_steps=max_it,
        b1=0.9, b2=0.95, grad_clip=clip,
        frozen_fn=lambda p: p.startswith("frozen"),
        groups={"scaled": (lambda p: p.startswith("s_"), lr_sc_g, wd_sc_g)})
    params = {"w": jnp.asarray(w0), "bias": jnp.asarray(b0),
              "s_mat": jnp.asarray(s0), "frozen_x": jnp.asarray(f0)}
    grads = {"w": jnp.asarray(gw), "bias": jnp.asarray(gb),
             "s_mat": jnp.asarray(gs), "frozen_x": jnp.asarray(gf)}
    state = tx.init(params)

    @jax.jit
    def step(params, state):
        updates, state = tx.update(grads, state, params)
        import optax

        return optax.apply_updates(params, updates), state

    for _ in range(max_it):
        params, state = step(params, state)

    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["bias"]),
                               tb.detach().numpy(), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["s_mat"]),
                               ts.detach().numpy(), rtol=2e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(params["frozen_x"]), f0)
