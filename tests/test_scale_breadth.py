"""Scale breadth: x8/x16 model paths and the full (ori_scale, scale) layout
table.

The reference supports scale in {1, 2, 4, 8, 16} via PixelShuffle
(``models/BMCNet.py:119``) and the per-case prefix ladder
(``dataloader/h5dataset.py:32-146``); its shipped recipes only ever run x4,
so these paths have no coverage elsewhere.  ``full_small_x8.npz`` is a torch
golden recorded by tools/make_goldens.py (scale-8 full BMCNet, 2-step
recurrent rollout) — the x8 feedback unshuffle folds the previous HR output
into 128 LR channels, a shape regime the x2/x4 goldens never reach.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bmcnet_esr_tpu.data.h5dataset import resolve_scale_layout
from bmcnet_esr_tpu.models import BMCNet, BMCNetPlain, convert_torch_state_dict

from test_model_parity import jax_rollout_full, load_golden, to_nhwc_seq


class TestScaleLayoutTable:
    """resolve_scale_layout against the reference ladder (h5dataset.py:32-146):
    input at sensor/down, GT events at sensor/(down/scale)."""

    @pytest.mark.parametrize(
        "ori_scale,scale,want_inp,want_gt",
        [
            ("down16", 16, "down16", "ori"),
            ("down16", 8, "down16", "down2"),
            ("down16", 2, "down16", "down8"),
            ("down8", 8, "down8", "ori"),
            ("down8", 2, "down8", "down4"),
            ("down4", 4, "down4", "ori"),
            ("ori", 1, "ori", "ori"),
        ],
    )
    def test_prefix_mapping(self, ori_scale, scale, want_inp, want_gt):
        lay = resolve_scale_layout([640, 640], scale, ori_scale, need_gt_events=True)
        assert lay.inp_prefix == want_inp
        assert lay.gt_prefix == want_gt
        down = {"ori": 1, "down2": 2, "down4": 4, "down8": 8, "down16": 16}
        assert lay.inp_resolution == (640 // down[ori_scale], 640 // down[ori_scale])
        assert lay.gt_resolution == (lay.inp_resolution[0] * scale, lay.inp_resolution[1] * scale)

    def test_scale_larger_than_down_rejected(self):
        # gt would need an upsampled group that multi-scale files don't carry
        with pytest.raises(ValueError, match="unsupported scale"):
            resolve_scale_layout([640, 640], 16, "down8", need_gt_events=True)

    def test_non_power_of_two_rejected(self):
        with pytest.raises(ValueError, match="unsupported scale"):
            resolve_scale_layout([640, 640], 3, "down8", need_gt_events=True)


class TestX8FullGolden:
    def test_rollout_matches_torch(self):
        sd, g = load_golden("full_small_x8.npz")
        scale, n_c, n_b = g["meta"]
        assert int(scale) == 8
        model = BMCNet(scale=int(scale), n_c=int(n_c), n_b=int(n_b))
        variables = convert_torch_state_dict(sd)
        x_seq = jnp.asarray(to_nhwc_seq(g["x"]))
        preds, hs = jax_rollout_full(model, variables, x_seq)
        want_preds = np.transpose(g["preds"], (0, 1, 3, 4, 2))
        want_hs = np.transpose(g["hs"], (0, 1, 3, 4, 2))
        assert preds.shape[-3:-1] == (16 * 8, 8 * 8)
        np.testing.assert_allclose(preds, want_preds, atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(hs, want_hs, atol=2e-5, rtol=1e-5)


class TestX16Forward:
    """No torch golden at x16 (output blows up fixture size) — assert the
    pure-JAX recurrent path is shape-correct and finite through two steps,
    covering the 512-channel feedback unshuffle and x16 shuffle head."""

    @pytest.mark.parametrize("cls,n_state", [(BMCNetPlain, 1), (BMCNet, 3)])
    def test_two_step_rollout(self, cls, n_state):
        model = cls(scale=16, n_c=8, n_b=2)
        b, h, w = 1, 8, 8
        x = jnp.asarray(
            np.random.default_rng(3).normal(size=(2, b, 2, h, w, 2)).astype(np.float32)
        )
        variables = model.init(jax.random.PRNGKey(0), x[0], *model.init_state(b, h, w))
        apply = jax.jit(model.apply)
        carry = model.init_state(b, h, w)
        for step in range(2):
            out = apply(variables, x[step], *carry)
            pred = out[-1]
            assert pred.shape == (b, h * 16, w * 16, 2)
            assert bool(jnp.isfinite(pred).all())
            carry = (*out[:-1], pred)
