"""END-TO-END eval-pipeline parity: our InferenceEngine vs the reference's
inference path (its dataloader + CPU rasterization + released checkpoint +
infer_BMCNet_plain.py metric loop) on the same regenerated fixture.

Goldens from tools/make_infer_goldens.py: per-window esr/bicubic MSE.  The
reference's seql-clip iteration stops ``seql - seqn`` pairs early (it only
consumes ``inputs_seq[0]``, SURVEY.md §8.7); our engine covers every pair,
so the comparison aligns on the reference's prefix.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bmcnet_esr_tpu.data import DatasetConfig
from bmcnet_esr_tpu.data.h5dataset import SequenceConfig
from bmcnet_esr_tpu.data.packager import write_synthetic_fixture
from bmcnet_esr_tpu.inference import InferenceEngine, load_model_for_inference

GOLDENS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")
CKPT = os.path.join(GOLDENS, "plain_nfs_x4_ckpt.npz")


@pytest.fixture(scope="module")
def g():
    return np.load(os.path.join(GOLDENS, "infer_goldens.npz"))


@pytest.fixture(scope="module")
def result(g, tmp_path_factory):
    scale, window, sliding, seqn, seql, step, seed = (int(v) for v in g["meta"])
    h, w = (int(v) for v in g["sensor"])
    path = str(tmp_path_factory.mktemp("parity") / "fixture.h5")
    write_synthetic_fixture(
        path, (h, w), ("ori", "down4"),
        {"ori": int(g["events_ori"]), "down4": int(g["events_down4"])}, seed=seed,
    )
    model, variables = load_model_for_inference(CKPT, scale, variant="plain")
    cfg = DatasetConfig(
        scale=scale, ori_scale="down4", window=window, sliding_window=sliding,
        sequence=SequenceConfig(seql, seqn, step),
    )
    eng = InferenceEngine(model, variables, cfg, chunk_size=16, visualize=False)
    return eng.infer_file(path, return_per_window=True)


class TestEvalPipelineParity:
    def test_per_window_esr_mse_matches_reference(self, g, result):
        ours = result["per_window"]["esr_mse"]
        want = g["esr_mse"]
        # the reference stops seql-seqn pairs early; we cover every pair
        assert len(ours) == len(want) + 2
        np.testing.assert_allclose(ours[: len(want)], want, rtol=1e-4, atol=2e-5)

    def test_per_window_bicubic_mse_matches_reference(self, g, result):
        ours = result["per_window"]["bicubic_mse"]
        want = g["bicubic_mse"]
        np.testing.assert_allclose(ours[: len(want)], want, rtol=1e-4, atol=2e-5)

    def test_values_are_nontrivial(self, g):
        assert len(g["esr_mse"]) >= 10
        assert float(np.std(g["esr_mse"])) > 0  # real per-window variation
        # SR must beat the bicubic baseline on this checkpoint
        assert np.mean(g["esr_mse"]) < np.mean(g["bicubic_mse"])
