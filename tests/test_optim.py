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
