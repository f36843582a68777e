"""LPIPS calibration training — the DistModel training machinery, TPU-native.

The inference half of the vendored PerceptualSimilarity stack lives in
``losses/lpips.py``; this module rebuilds the *training* half so the vendored
capability is complete end-to-end:

* ``Dist2LogitLayer`` / ``BCERankingLoss`` — reference
  ``loss/PerceptualSimilarity/models/networks_basic.py:123-150``.
* ``DistModel.optimize_parameters`` (forward_train / backward_train / Adam
  step / weight clamp) — ``models/dist_model.py:124-134,152-167``.
* ``compute_accuracy`` / ``get_current_errors`` — ``dist_model.py:169-182``.
* ``update_learning_rate`` (on-demand linear decay) —
  ``dist_model.py:206-214``.
* ``score_2afc_dataset`` / ``score_jnd_dataset`` / ``voc_ap`` evaluation
  harnesses — ``dist_model.py:216-288``, ``models/__init__.py:124-155``.

Design (TPU-first): the trainable leaves (lin heads + logit net, plus the
backbone when ``pnet_tune``) form one pytree, and ``optimize_parameters`` is
ONE jitted XLA program — two LPIPS forwards, ranking loss, grads, torch-exact
Adam moments, lr scale, lin-weight clamp — with the learning rate passed as a
scalar argument so the reference's on-demand linear decay never recompiles.

Known deviation (intentional, documented): the reference's ``clamp_weights``
clamps every 1x1 conv inside ``self.net`` (``dist_model.py:131-134``) — for
the squeeze backbone that includes the FROZEN Fire squeeze/expand1x1 conv
weights, silently corrupting the feature extractor as training progresses.
Here only the trainable lin heads are clamped; for alex/vgg (no 1x1 backbone
convs) the behavior is identical to the reference.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from bmcnet_esr_tpu.losses.lpips import LPIPS, backbone_features
from bmcnet_esr_tpu.training.optim import scale_by_torch_adam

Array = jax.Array


# -- Dist2LogitLayer / BCERankingLoss (networks_basic.py:123-150) -------------


def init_dist2logit(seed: int = 0, chn_mid: int = 32) -> Dict[str, Array]:
    """torch-default init of the 5->mid->mid->1 stack of 1x1 convs.

    torch ``Conv2d`` resets with ``kaiming_uniform_(a=sqrt(5))``, which for a
    1x1 kernel is U(-1/sqrt(c_in), 1/sqrt(c_in)) for weight and bias alike.
    """
    rng = np.random.default_rng(seed)
    params: Dict[str, Array] = {}
    for i, (cin, cout) in enumerate([(5, chn_mid), (chn_mid, chn_mid), (chn_mid, 1)]):
        bound = 1.0 / math.sqrt(cin)
        params[f"w{i}"] = jnp.asarray(
            rng.uniform(-bound, bound, (cout, cin)), jnp.float32
        )
        params[f"b{i}"] = jnp.asarray(rng.uniform(-bound, bound, (cout,)), jnp.float32)
    return params


def _dist2logit_raw(params: Dict[str, Array], d0: Array, d1: Array, eps: float = 0.1) -> Array:
    """Pre-sigmoid output of the logit net (for a stable from-logits BCE)."""
    x = jnp.concatenate([d0, d1, d0 - d1, d0 / (d1 + eps), d1 / (d0 + eps)], axis=1)
    for i in range(3):
        w, b = params[f"w{i}"], params[f"b{i}"]
        x = jnp.einsum("oc,bchw->bohw", w, x) + b[None, :, None, None]
        if i < 2:
            x = jnp.where(x >= 0, x, 0.2 * x)
    return x


def dist2logit(params: Dict[str, Array], d0: Array, d1: Array, eps: float = 0.1) -> Array:
    """Map two distance maps ``[N,1,H,W]`` to a judgment probability in [0,1].

    Five hand-crafted features ``(d0, d1, d0-d1, d0/(d1+eps), d1/(d0+eps))``
    through 1x1 convs with LeakyReLU(0.2) and a final sigmoid
    (``networks_basic.py:128-138``).
    """
    return jax.nn.sigmoid(_dist2logit_raw(params, d0, d1, eps))


def bce_ranking_loss(
    params: Dict[str, Array], d0: Array, d1: Array, judge: Array, eps: float = 0.1
) -> Array:
    """BCE between the logit net's prediction and the human judgment.

    ``judge`` is in [-1, 1] (``forward_train`` passes ``judge*2-1``,
    ``dist_model.py:162``); ``per = (judge+1)/2`` recovers the [0,1] fraction
    (``networks_basic.py:147-150``).

    Computed FROM LOGITS (``-log sigmoid(z) = softplus(-z)``) rather than by
    clipping ``log(sigmoid(z))``: the clipped form yields NaN *gradients*
    once the sigmoid saturates to exactly 0/1 in fp32 (0·inf in the backward
    chain), which would permanently poison the Adam moments — torch's BCELoss
    stays finite in that state, and so does this.
    """
    per = (judge + 1.0) / 2.0
    z = _dist2logit_raw(params, d0, d1, eps)
    return jnp.mean(per * jax.nn.softplus(-z) + (1.0 - per) * jax.nn.softplus(z))


def compute_accuracy(d0: Array, d1: Array, judge: Array) -> Array:
    """Per-triplet agreement with humans (``dist_model.py:169-173``).

    ``judge`` in [0,1]; returns the per-example array (the reference means it
    in ``get_current_errors``).
    """
    d1_lt_d0 = (d1 < d0).astype(jnp.float32).reshape(-1)
    j = judge.astype(jnp.float32).reshape(-1)
    return d1_lt_d0 * j + (1.0 - d1_lt_d0) * (1.0 - j)


# -- the trainer (dist_model.py:92-98,124-214) --------------------------------


class LPIPSTrainer:
    """Train LPIPS lin heads (optionally the backbone) on 2AFC triplets.

    Mirrors ``DistModel.initialize(is_train=True)``: Adam over
    ``lins + rankLoss.net`` with ``betas=(beta1, 0.999)``
    (``dist_model.py:92-98``), post-step clamp of lin weights to >= 0, and
    the linear ``update_learning_rate`` decay.

    Args:
      lpips_model: a net-lin :class:`LPIPS` supplying backbone + initial lins.
      lr, beta1: Adam hyperparameters (reference defaults 1e-4, 0.5).
      chn_mid: hidden width of the Dist2Logit net.
      pnet_tune: also train the backbone features (``dist_model.py:66``).
      use_dropout: apply Dropout(0.5) to the squared feature diffs before the
        lin heads during training steps, like the reference's
        ``PNetLin(use_dropout=True)`` in train mode (``dist_model.py:66-67``).
        Evaluation (:meth:`distance`) never applies dropout.
    """

    def __init__(
        self,
        lpips_model: LPIPS,
        *,
        lr: float = 1e-4,
        beta1: float = 0.5,
        chn_mid: int = 32,
        seed: int = 0,
        pnet_tune: bool = False,
        use_dropout: bool = True,
    ):
        if not lpips_model.lpips or lpips_model.lins is None:
            raise ValueError("LPIPSTrainer needs a net-lin LPIPS (lpips=True with lins)")
        if lpips_model.spatial:
            raise ValueError("train on scalar distances (spatial=False), like the reference")
        self.net = lpips_model.net
        self.version = lpips_model.version
        self._static_backbone = None if pnet_tune else lpips_model.backbone
        params: Dict = {
            "lins": [jnp.asarray(w, jnp.float32) for w in lpips_model.lins],
            "logit": init_dist2logit(seed, chn_mid),
        }
        if pnet_tune:
            params["backbone"] = jax.tree.map(
                lambda a: jnp.asarray(a, jnp.float32), lpips_model.backbone
            )
        self.params = params
        self.lr0 = float(lr)
        self.lr = float(lr)
        self.use_dropout = bool(use_dropout)
        self._key = jax.random.PRNGKey(seed)
        self._tx = scale_by_torch_adam(b1=beta1, b2=0.999, eps=1e-8)
        self.opt_state = self._tx.init(params)
        self._errors: Dict[str, Array] = {}  # device scalars, resolved lazily
        self._step = jax.jit(self._build_step())
        self._distance_jit = jax.jit(self._distance)

    # distance with the CURRENT (possibly trained) parameters, eval mode
    def _distance(self, params: Dict, in0: Array, in1: Array) -> Array:
        backbone = params.get("backbone", self._static_backbone)
        lp = LPIPS(backbone, params["lins"], self.net, version=self.version, lpips=True)
        return lp(in0, in1)

    def _drop_masks(self, key: Array, diff_shapes: List[Tuple[int, ...]]) -> List[Array]:
        keys = jax.random.split(key, len(diff_shapes))
        return [
            jax.random.bernoulli(k, 0.5, s).astype(jnp.float32) * 2.0
            for k, s in zip(keys, diff_shapes)
        ]

    def _build_step(self) -> Callable:
        def loss_fn(params, key, ref, p0, p1, judge):
            backbone = params.get("backbone", self._static_backbone)
            lp = LPIPS(
                backbone, params["lins"], self.net, version=self.version, lpips=True
            )
            if self.use_dropout:
                # diff tensors have the backbone feature shapes; the probe
                # forward is CSE'd with the distance forwards under jit
                shapes = [
                    f.shape for f in backbone_features(backbone, ref, self.net)
                ]
                k0, k1 = jax.random.split(key)
                m0 = self._drop_masks(k0, shapes)
                m1 = self._drop_masks(k1, shapes)
            else:
                m0 = m1 = None
            d0 = lp(ref, p0, drop_masks=m0)
            d1 = lp(ref, p1, drop_masks=m1)
            j = judge.reshape(d0.shape).astype(d0.dtype)
            loss = bce_ranking_loss(params["logit"], d0, d1, j * 2.0 - 1.0)
            acc = jnp.mean(compute_accuracy(d0, d1, j))
            return loss, acc

        def step(params, opt_state, key, lr, ref, p0, p1, judge):
            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, key, ref, p0, p1, judge
            )
            updates, opt_state = self._tx.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p - lr * u, params, updates)
            # clamp_weights: lin heads stay >= 0 after every step
            # (dist_model.py:129-134; deviation for squeeze noted in the
            # module docstring)
            params["lins"] = [jnp.maximum(w, 0.0) for w in params["lins"]]
            return params, opt_state, loss, acc

        return step

    def optimize_parameters(self, batch: Dict) -> Dict[str, float]:
        """One training step (``dist_model.py:124-129``).

        ``batch``: ``ref``/``p0``/``p1`` as ``[N,3,H,W]`` in [-1,1] and
        ``judge`` of N elements in [0,1] (fraction preferring p1).

        Returns ``{'loss_total', 'acc_r'}`` as device scalars — asynchronous
        futures, so back-to-back steps pipeline without a host sync (the
        reference defers fetching to ``get_current_errors`` too,
        ``dist_model.py:175-182``); call :meth:`get_current_errors` for
        Python floats.
        """
        ref = jnp.asarray(batch["ref"], jnp.float32)
        p0 = jnp.asarray(batch["p0"], jnp.float32)
        p1 = jnp.asarray(batch["p1"], jnp.float32)
        judge = jnp.asarray(batch["judge"], jnp.float32)
        self._key, sub = jax.random.split(self._key)
        self.params, self.opt_state, loss, acc = self._step(
            self.params, self.opt_state, sub, jnp.float32(self.lr), ref, p0, p1, judge
        )
        self._errors = {"loss_total": loss, "acc_r": acc}
        return dict(self._errors)

    def get_current_errors(self) -> Dict[str, float]:
        """Latest ``{'loss_total', 'acc_r'}`` means as Python floats (syncs;
        ``dist_model.py:175-182``)."""
        return {k: float(v) for k, v in self._errors.items()}

    def update_learning_rate(self, nepoch_decay: int) -> float:
        """Linear decay: lr -= lr0 / nepoch_decay (``dist_model.py:206-214``)."""
        self.lr = self.lr - self.lr0 / float(nepoch_decay)
        return self.lr

    def distance(self, in0, in1) -> np.ndarray:
        """Calibrated distances ``[N]`` under the current parameters (jitted —
        the 2AFC/JND scoring loops run one program per batch, not per op)."""
        d = self._distance_jit(
            self.params, jnp.asarray(in0, jnp.float32), jnp.asarray(in1, jnp.float32)
        )
        return np.asarray(d).reshape(-1)

    def lin_weights(self) -> List[np.ndarray]:
        """Trained head weights, loadable back into :class:`LPIPS`."""
        return [np.asarray(w) for w in self.params["lins"]]

    def save_lin_weights(self, path: str) -> str:
        """Export the trained heads in the reference ``.pth`` layout
        (``lin{k}.model.1.weight`` of shape [1, C, 1, 1]) so they load into
        the upstream ``PNetLin`` — and back here via
        :func:`bmcnet_esr_tpu.losses.lpips.load_lin_weights` — exactly like
        the shipped ``weights/v0.1/{net}.pth`` files (the LPIPS counterpart
        of ``models/convert.export_torch_state_dict``)."""
        import torch

        state = {
            f"lin{k}.model.1.weight": torch.from_numpy(
                np.asarray(w, np.float32)[:, :, None, None].copy()
            )
            for k, w in enumerate(self.params["lins"])
        }
        torch.save(state, path)
        return path


# -- evaluation harnesses (dist_model.py:216-288) ------------------------------


def voc_ap(rec: np.ndarray, prec: np.ndarray, use_07_metric: bool = False) -> float:
    """VOC average precision over a PR curve (``models/__init__.py:124-155``)."""
    rec = np.asarray(rec, np.float64)
    prec = np.asarray(prec, np.float64)
    if use_07_metric:
        ap = 0.0
        for t in np.arange(0.0, 1.1, 0.1):
            p = 0.0 if np.sum(rec >= t) == 0 else float(np.max(prec[rec >= t]))
            ap += p / 11.0
        return ap
    mrec = np.concatenate(([0.0], rec, [1.0]))
    mpre = np.concatenate(([0.0], prec, [0.0]))
    mpre = np.maximum.accumulate(mpre[::-1])[::-1]
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def score_2afc_dataset(
    data_iter: Iterable[Dict], dist_fn: Callable[[np.ndarray, np.ndarray], np.ndarray]
) -> Tuple[float, Dict[str, np.ndarray]]:
    """Two-alternative-forced-choice agreement score (``dist_model.py:216-249``).

    ``data_iter`` yields dicts with ``ref``/``p0``/``p1`` image batches and
    ``judge`` in [0,1]; ``dist_fn(in0, in1)`` returns N distances. Ties score
    0.5.
    """
    d0s: List[float] = []
    d1s: List[float] = []
    gts: List[float] = []
    for data in data_iter:
        d0s += np.asarray(dist_fn(data["ref"], data["p0"])).reshape(-1).tolist()
        d1s += np.asarray(dist_fn(data["ref"], data["p1"])).reshape(-1).tolist()
        gts += np.asarray(data["judge"]).reshape(-1).tolist()
    d0a, d1a, gta = np.array(d0s), np.array(d1s), np.array(gts)
    scores = (d0a < d1a) * (1.0 - gta) + (d1a < d0a) * gta + (d1a == d0a) * 0.5
    return float(np.mean(scores)), dict(d0s=d0a, d1s=d1a, gts=gta, scores=scores)


def score_jnd_dataset(
    data_iter: Iterable[Dict], dist_fn: Callable[[np.ndarray, np.ndarray], np.ndarray]
) -> Tuple[float, Dict[str, np.ndarray]]:
    """JND mAP: area under the precision-recall curve obtained by sweeping a
    threshold over distances against human same/different labels
    (``dist_model.py:251-288``).

    Deviation (documented): the denominators carry a 1e-12 guard so an
    all-different label set returns 0.0 instead of the reference's NaN
    (``recs = TPs/(TPs+FNs)`` is 0/0 there).
    """
    ds: List[float] = []
    gts: List[float] = []
    for data in data_iter:
        ds += np.asarray(dist_fn(data["p0"], data["p1"])).reshape(-1).tolist()
        gts += np.asarray(data["same"]).reshape(-1).tolist()
    sames = np.array(gts)
    darr = np.array(ds)
    order = np.argsort(darr)
    sames_sorted = sames[order]
    tps = np.cumsum(sames_sorted)
    fps = np.cumsum(1 - sames_sorted)
    fns = np.sum(sames_sorted) - tps
    precs = tps / np.maximum(tps + fps, 1e-12)
    recs = tps / np.maximum(tps + fns, 1e-12)
    return voc_ap(recs, precs), dict(ds=darr, sames=sames)
