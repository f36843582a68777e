"""LPIPS training-machinery parity vs torch oracles.

Covers the DistModel training surface (reference ``dist_model.py:92-98,
124-214,216-288`` + ``networks_basic.py:123-150``): Dist2LogitLayer /
BCERankingLoss forward+grad parity, a full multi-step ``optimize_parameters``
trajectory (Adam(beta1=0.5) + post-step lin clamp) against a torch oracle
built from the same seeded alex fixture backbone, the linear lr decay, and the
2AFC / JND scoring harnesses.

Oracles are re-derived in-test with torch CPU (same convention as
test_flow_losses); parity tests run with dropout off (the reference trains
with Dropout(0.5) — RNG streams differ across frameworks, so the dropout path
gets its own determinism/finiteness checks).
"""

import os
import sys

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from bmcnet_esr_tpu.losses.lpips import (
    LPIPS,
    convert_backbone_state_dict,
    load_lin_weights,
)
from bmcnet_esr_tpu.losses.lpips_train import (
    LPIPSTrainer,
    bce_ranking_loss,
    compute_accuracy,
    dist2logit,
    init_dist2logit,
    score_2afc_dataset,
    score_jnd_dataset,
    voc_ap,
)

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)
import lpips_fixture_nets as nets  # noqa: E402

WEIGHTS = "/root/reference/loss/PerceptualSimilarity/models/weights"

_SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
_SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
_ALEX_SLICES = [(0, 2), (2, 5), (5, 8), (8, 10), (10, 12)]


# -- torch oracles -------------------------------------------------------------


def torch_dist2logit(params, d0, d1, eps=0.1):
    """networks_basic.py:123-138 semantics on jax-exported params."""
    x = torch.cat([d0, d1, d0 - d1, d0 / (d1 + eps), d1 / (d0 + eps)], dim=1)
    for i in range(3):
        w = torch.as_tensor(np.asarray(params[f"w{i}"]))[:, :, None, None]
        b = torch.as_tensor(np.asarray(params[f"b{i}"]))
        x = torch.nn.functional.conv2d(x, w, b)
        if i < 2:
            x = torch.nn.functional.leaky_relu(x, 0.2)
    return torch.sigmoid(x)


class TorchAlexLPIPS(nn.Module):
    """PNetLin(alex, v0.1, scalar, eval-mode) with trainable lin heads."""

    def __init__(self, features, lins):
        super().__init__()
        self.features = features
        for p in self.features.parameters():
            p.requires_grad_(False)
        self.lins = nn.ParameterList(
            [nn.Parameter(torch.as_tensor(np.asarray(w)).clone()) for w in lins]
        )

    def taps(self, x):
        out = []
        for lo, hi in _ALEX_SLICES:
            for i in range(lo, hi):
                x = self.features[i](x)
            out.append(x)
        return out

    def forward(self, in0, in1):
        f0 = self.taps((in0 - _SHIFT) / _SCALE)
        f1 = self.taps((in1 - _SHIFT) / _SCALE)
        val = 0.0
        for k, (a, b) in enumerate(zip(f0, f1)):
            na = a / (torch.sqrt(torch.sum(a**2, dim=1, keepdim=True)) + 1e-10)
            nb = b / (torch.sqrt(torch.sum(b**2, dim=1, keepdim=True)) + 1e-10)
            diff = (na - nb) ** 2
            head = torch.einsum("oc,bchw->bohw", self.lins[k], diff)
            val = val + head.mean(dim=(2, 3), keepdim=True)
        return val


class TorchLogitNet(nn.Module):
    def __init__(self, params):
        super().__init__()
        self.ws = nn.ParameterList(
            [nn.Parameter(torch.as_tensor(np.asarray(params[f"w{i}"])).clone()) for i in range(3)]
        )
        self.bs = nn.ParameterList(
            [nn.Parameter(torch.as_tensor(np.asarray(params[f"b{i}"])).clone()) for i in range(3)]
        )

    def forward(self, d0, d1, eps=0.1):
        x = torch.cat([d0, d1, d0 - d1, d0 / (d1 + eps), d1 / (d0 + eps)], dim=1)
        for i in range(3):
            x = torch.nn.functional.conv2d(x, self.ws[i][:, :, None, None], self.bs[i])
            if i < 2:
                x = torch.nn.functional.leaky_relu(x, 0.2)
        return torch.sigmoid(x)


@pytest.fixture(scope="module")
def alex_setup():
    features = nets.make_alex_features().eval()
    backbone = convert_backbone_state_dict(
        {k: v.numpy() for k, v in features.state_dict().items()}, "alex"
    )
    lins = load_lin_weights(os.path.join(WEIGHTS, "v0.1", "alex.pth"), "alex")
    return features, backbone, lins


def triplets(seed, n=4, hw=64):
    rng = np.random.default_rng(seed)
    ref = rng.uniform(-1, 1, (n, 3, hw, hw)).astype(np.float32)
    p0 = np.clip(ref + rng.normal(0, 0.6, ref.shape), -1, 1).astype(np.float32)
    p1 = np.clip(ref + rng.normal(0, 0.15, ref.shape), -1, 1).astype(np.float32)
    judge = rng.choice([0.0, 0.4, 1.0], n).astype(np.float32)
    return {"ref": ref, "p0": p0, "p1": p1, "judge": judge}


class TestLogitNet:
    def test_forward_matches_torch(self):
        params = init_dist2logit(seed=3)
        rng = np.random.default_rng(0)
        d0 = rng.uniform(0.01, 2.0, (6, 1, 1, 1)).astype(np.float32)
        d1 = rng.uniform(0.01, 2.0, (6, 1, 1, 1)).astype(np.float32)
        ours = np.asarray(dist2logit(params, jnp.asarray(d0), jnp.asarray(d1)))
        want = torch_dist2logit(params, torch.tensor(d0), torch.tensor(d1)).numpy()
        np.testing.assert_allclose(ours, want, rtol=1e-5, atol=1e-6)

    def test_bce_ranking_value_and_grads(self):
        params = init_dist2logit(seed=7)
        rng = np.random.default_rng(1)
        d0 = rng.uniform(0.01, 2.0, (5, 1, 1, 1)).astype(np.float32)
        d1 = rng.uniform(0.01, 2.0, (5, 1, 1, 1)).astype(np.float32)
        judge01 = rng.choice([0.0, 0.3, 1.0], (5, 1, 1, 1)).astype(np.float32)

        loss_fn = lambda dd0, dd1: bce_ranking_loss(
            params, dd0, dd1, jnp.asarray(judge01) * 2.0 - 1.0
        )
        ours = float(loss_fn(jnp.asarray(d0), jnp.asarray(d1)))
        g0, g1 = jax.grad(loss_fn, argnums=(0, 1))(jnp.asarray(d0), jnp.asarray(d1))

        td0 = torch.tensor(d0, requires_grad=True)
        td1 = torch.tensor(d1, requires_grad=True)
        logit = torch_dist2logit(params, td0, td1)
        want = torch.nn.functional.binary_cross_entropy(
            logit, torch.tensor(judge01)
        )
        want.backward()
        np.testing.assert_allclose(ours, float(want), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g0), td0.grad.numpy(), rtol=1e-4, atol=1e-7)
        np.testing.assert_allclose(np.asarray(g1), td1.grad.numpy(), rtol=1e-4, atol=1e-7)

    def test_saturated_sigmoid_grads_stay_finite(self):
        # fp32 sigmoid saturates to exactly 0/1 around |z|~17; a clipped-log
        # BCE has NaN gradients there (0*inf in the backward), poisoning Adam.
        # The from-logits form must stay finite.
        params = init_dist2logit(seed=0)
        params = dict(params, w2=jnp.full_like(params["w2"], 100.0),
                      b2=jnp.full_like(params["b2"], 100.0))
        d0 = jnp.full((3, 1, 1, 1), 2.0)
        d1 = jnp.full((3, 1, 1, 1), 0.01)
        judge = jnp.asarray([1.0, -1.0, 0.0]).reshape(3, 1, 1, 1)
        assert float(jnp.max(dist2logit(params, d0, d1))) == 1.0  # truly saturated
        loss, grads = jax.value_and_grad(
            lambda p: bce_ranking_loss(p, d0, d1, judge)
        )(params)
        assert np.isfinite(float(loss))
        for g in jax.tree.leaves(grads):
            assert np.isfinite(np.asarray(g)).all()

    def test_accuracy_formula(self):
        d0 = jnp.asarray([1.0, 2.0, 3.0]).reshape(3, 1, 1, 1)
        d1 = jnp.asarray([2.0, 1.0, 3.0]).reshape(3, 1, 1, 1)
        judge = jnp.asarray([1.0, 1.0, 0.25])
        # d1<d0: [0,1,0] -> acc = [1-1, 1*1, 1-0.25]
        np.testing.assert_allclose(
            np.asarray(compute_accuracy(d0, d1, judge)), [0.0, 1.0, 0.75]
        )


class TestTrainerParity:
    def test_optimize_parameters_matches_torch(self, alex_setup):
        features, backbone, lins = alex_setup
        lp = LPIPS(backbone, lins, "alex", version="0.1")
        tr = LPIPSTrainer(lp, lr=1e-3, beta1=0.5, seed=11, use_dropout=False)

        model = TorchAlexLPIPS(features, lins)
        logit_net = TorchLogitNet(tr.params["logit"])
        opt = torch.optim.Adam(
            list(model.lins.parameters()) + list(logit_net.parameters()),
            lr=1e-3,
            betas=(0.5, 0.999),
        )

        for step in range(3):
            batch = triplets(seed=100 + step)
            errors = tr.optimize_parameters(batch)

            ref, p0, p1 = (torch.tensor(batch[k]) for k in ("ref", "p0", "p1"))
            judge = torch.tensor(batch["judge"]).view(-1, 1, 1, 1)
            d0 = model(ref, p0)
            d1 = model(ref, p1)
            loss = torch.nn.functional.binary_cross_entropy(
                logit_net(d0, d1), judge
            )
            acc = float(
                torch.mean(
                    (d1 < d0).float().flatten() * judge.flatten()
                    + (d1 >= d0).float().flatten() * (1 - judge.flatten())
                )
            )
            opt.zero_grad()
            loss.backward()
            opt.step()
            with torch.no_grad():
                for w in model.lins:
                    w.clamp_(min=0)

            assert errors["loss_total"] == pytest.approx(float(loss), rel=1e-4)
            assert errors["acc_r"] == pytest.approx(acc, abs=1e-6)

        for ours, want in zip(tr.params["lins"], model.lins):
            np.testing.assert_allclose(
                np.asarray(ours), want.detach().numpy(), rtol=1e-4, atol=1e-7
            )
            assert np.all(np.asarray(ours) >= 0)
        for i in range(3):
            np.testing.assert_allclose(
                np.asarray(tr.params["logit"][f"w{i}"]),
                logit_net.ws[i].detach().numpy(),
                rtol=1e-4,
                atol=1e-7,
            )

    def test_eval_distance_matches_lpips(self, alex_setup):
        _, backbone, lins = alex_setup
        lp = LPIPS(backbone, lins, "alex", version="0.1")
        tr = LPIPSTrainer(lp, use_dropout=False)
        batch = triplets(seed=5)
        want = np.asarray(lp(jnp.asarray(batch["ref"]), jnp.asarray(batch["p0"])))
        np.testing.assert_allclose(
            tr.distance(batch["ref"], batch["p0"]), want.reshape(-1), rtol=1e-6
        )
        # trained heads round-trip into a fresh LPIPS
        tr.optimize_parameters(batch)
        lp2 = LPIPS(backbone, tr.lin_weights(), "alex", version="0.1")
        np.testing.assert_allclose(
            tr.distance(batch["ref"], batch["p1"]),
            np.asarray(lp2(jnp.asarray(batch["ref"]), jnp.asarray(batch["p1"]))).reshape(-1),
            rtol=1e-6,
        )

    def test_loss_decreases_and_lr_decay(self, alex_setup):
        _, backbone, lins = alex_setup
        lp = LPIPS(backbone, lins, "alex", version="0.1")
        tr = LPIPSTrainer(lp, lr=1e-3, seed=2, use_dropout=False)
        batch = triplets(seed=42, n=6, hw=32)
        batch["judge"] = np.ones(6, np.float32)  # humans prefer p1 (less noise)
        first = tr.optimize_parameters(batch)["loss_total"]
        for _ in range(11):
            last = tr.optimize_parameters(batch)["loss_total"]
        assert last < first
        assert tr.get_current_errors()["loss_total"] == last

        # linear decay: lr -= lr0/nepoch_decay per call (dist_model.py:206-214)
        tr.update_learning_rate(5)
        tr.update_learning_rate(5)
        assert tr.lr == pytest.approx(1e-3 - 2 * (1e-3 / 5))

    def test_pnet_tune_trains_backbone(self, alex_setup):
        _, backbone, lins = alex_setup
        lp = LPIPS(backbone, lins, "alex", version="0.1")
        tr = LPIPSTrainer(lp, lr=1e-3, seed=4, use_dropout=False, pnet_tune=True)
        before = np.asarray(tr.params["backbone"]["0.weight"]).copy()
        batch = triplets(seed=21, n=2, hw=32)
        tr.optimize_parameters(batch)
        after = np.asarray(tr.params["backbone"]["0.weight"])
        # backbone received gradient updates (dist_model.py:66 pnet_tune)
        assert not np.allclose(before, after)
        # and the tuned backbone is what distance() evaluates with
        d_tuned = tr.distance(batch["ref"], batch["p0"])
        d_frozen = np.asarray(
            LPIPS(backbone, tr.lin_weights(), "alex", version="0.1")(
                jnp.asarray(batch["ref"]), jnp.asarray(batch["p0"])
            )
        ).reshape(-1)
        assert not np.allclose(d_tuned, d_frozen)

    def test_save_lin_weights_reference_layout_roundtrip(self, alex_setup, tmp_path):
        _, backbone, lins = alex_setup
        lp = LPIPS(backbone, lins, "alex", version="0.1")
        tr = LPIPSTrainer(lp, lr=1e-3, seed=1, use_dropout=False)
        tr.optimize_parameters(triplets(seed=33, n=2, hw=32))
        path = tr.save_lin_weights(str(tmp_path / "alex_trained.pth"))
        # reference-layout keys/shapes...
        sd = torch.load(path, map_location="cpu", weights_only=True)
        assert sorted(sd) == [f"lin{k}.model.1.weight" for k in range(5)]
        assert sd["lin0.model.1.weight"].shape == (1, 64, 1, 1)
        # ...and a bit-exact round trip through the shipped-weights loader
        from bmcnet_esr_tpu.losses.lpips import load_lin_weights as llw

        for got, want in zip(llw(path, "alex"), tr.params["lins"]):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_dropout_path_runs_and_varies(self, alex_setup):
        _, backbone, lins = alex_setup
        lp = LPIPS(backbone, lins, "alex", version="0.1")
        tr = LPIPSTrainer(lp, seed=9, use_dropout=True)
        batch = triplets(seed=8, n=2, hw=32)
        e1 = tr.optimize_parameters(batch)
        e2 = tr.optimize_parameters(batch)
        assert np.isfinite(e1["loss_total"]) and np.isfinite(e2["loss_total"])
        # same batch, fresh dropout masks -> different stochastic losses
        assert e1["loss_total"] != e2["loss_total"]


class TestScoring:
    def test_score_2afc_hand_case(self):
        data = [
            {
                "ref": np.zeros((3, 1)),  # unused by the fake dist_fn
                "p0": np.asarray([0]),
                "p1": np.asarray([1]),
                "judge": np.asarray([0.0, 1.0, 0.5]),
            }
        ]
        dists = {0: np.asarray([1.0, 2.0, 3.0]), 1: np.asarray([2.0, 1.0, 3.0])}
        fn = lambda a, b: dists[int(b[0])]
        score, ret = score_2afc_dataset(data, fn)
        # triplet 1: d0<d1, judge 0 -> 1; triplet 2: d1<d0, judge 1 -> 1;
        # triplet 3: tie -> 0.5
        assert score == pytest.approx((1.0 + 1.0 + 0.5) / 3.0)
        np.testing.assert_allclose(ret["scores"], [1.0, 1.0, 0.5])

    def test_voc_ap_matches_reference_loop(self):
        rng = np.random.default_rng(0)
        for _ in range(5):
            rec = np.sort(rng.uniform(0, 1, 20))
            prec = rng.uniform(0, 1, 20)
            # reference envelope loop (models/__init__.py:139-154)
            mrec = np.concatenate(([0.0], rec, [1.0]))
            mpre = np.concatenate(([0.0], prec, [0.0]))
            for i in range(mpre.size - 1, 0, -1):
                mpre[i - 1] = np.maximum(mpre[i - 1], mpre[i])
            idx = np.where(mrec[1:] != mrec[:-1])[0]
            want = np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1])
            assert voc_ap(rec, prec) == pytest.approx(want)
        # 11-point variant
        assert voc_ap(np.asarray([0.0, 0.5, 1.0]), np.asarray([1.0, 1.0, 1.0]),
                      use_07_metric=True) == pytest.approx(1.0)

    def test_score_jnd_matches_reference_algorithm(self):
        rng = np.random.default_rng(3)
        ds = rng.uniform(0, 1, 40)
        sames = (rng.uniform(0, 1, 40) > 0.5).astype(np.float64)
        data = [{"p0": None, "p1": None, "same": sames}]
        score, ret = score_jnd_dataset(data, lambda a, b: ds)
        # reference cumsum construction (dist_model.py:276-286)
        order = np.argsort(ds)
        ss = sames[order]
        tps, fps = np.cumsum(ss), np.cumsum(1 - ss)
        fns = np.sum(ss) - tps
        want = voc_ap(tps / (tps + fns), tps / (tps + fps))
        assert score == pytest.approx(want)
        np.testing.assert_allclose(ret["ds"], ds)
