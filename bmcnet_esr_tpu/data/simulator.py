"""TPU-native video -> event-stream simulator.

The reference framework cannot generate its own events: its synthetic
recipes require the EXTERNAL DVS-Voltmeter simulator binary to turn
per-scale video frames into event ``.txt`` dumps, which ``syn_nfs.py`` /
``syn_RGB.py`` then package (``/root/reference/generate_dataset/README.md:7-11``
— "using the DVS-Voltmeter ... to generate simulated events ... Finally run
``syn_nfs.py``").  This module closes that loop: video frames in, the same
multi-scale event h5 files out, with no external tool.

Model
-----
A contrast-threshold DVS pixel model (the standard ESIM/v2e formulation):
per pixel, log intensity is linearly interpolated between frames and an
event fires each time it moves one contrast threshold away from the
reference level set at the previous event.  Supported non-idealities:

* per-pixel threshold mismatch (``threshold_sigma``),
* refractory period — crossings inside it are ABSORBED, not delayed
  (the hardware rate-cap semantics): the reference level still advances
  over them, only the emission is suppressed,
* background shot-noise events (Poisson, intensity-independent),
* hot pixels (a seeded fraction of pixels with ``hot_pixel_gain``× the
  noise rate) — gives the downstream hot-pixel filter machinery
  (``ops/encodings.get_hot_event_mask``) realistic input,
* leak events (the reference level decays at ``leak_rate_hz`` thresholds
  per second, producing spurious ON events on static scenes).

TPU-first shape discipline: the per-interval kernel is fully vectorized
over pixels with a STATIC per-pixel emission cap per interval
(``max_events_per_pixel``), so the whole chunk of frame intervals runs as
one ``lax.scan`` under ``jit`` with fixed shapes; ragged event lists only
materialize host-side when compacting the valid entries.  Crossing
timestamps are computed relative to the interval start in f32 and added to
the f64 frame timestamps on the host, so long videos keep microsecond
precision.

Beyond the event-list path there is a direct count-image fast path
(`simulate_counts`): training consumes 2-channel count images, and the
per-pixel emission counts ARE those images — skipping the event-list
materialization entirely (the video-to-grid shortcut argued by V2V,
"Scaling Event-Based Vision through Efficient Video-to-Voxel Simulation",
arXiv:2505.16797).  Both paths share one kernel, so they agree exactly.

Coordinate convention: ``y`` is the image row index (row 0 = y 0), exactly
what the reference's h5 files store; the count rasterizer applies its
y-flip downstream (``encodings.py:265`` semantics).
"""

from __future__ import annotations

import dataclasses
import os
import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class SimulatorConfig:
    """Knobs of the DVS pixel model (defaults: a clean, noise-free sensor)."""

    contrast_threshold: float = 0.15      # nominal log-intensity step per event
    threshold_sigma: float = 0.0          # per-pixel mismatch, fraction of C
    threshold_min: float = 0.01           # clip for sampled thresholds
    refractory_s: float = 0.0             # absorb crossings closer than this
    max_events_per_pixel: int = 16        # static emission cap per interval
    noise_rate_hz: float = 0.0            # per-pixel background rate (ON+OFF)
    max_noise_per_pixel: int = 4          # static noise cap per interval/polarity
    hot_pixel_fraction: float = 0.0       # fraction of pixels with boosted noise
    hot_pixel_gain: float = 100.0         # their noise-rate multiplier
    leak_rate_hz: float = 0.0             # reference-level decay, thresholds/sec
    log_eps: float = 1e-3                 # I in [0,1] -> log(I + eps)
    chunk: int = 8                        # frame intervals per device dispatch
    seed: int = 0


def _log_intensity(frames: np.ndarray, log_eps: float) -> np.ndarray:
    """uint8 [0,255] or float [0,1] frames -> log intensity, f32."""
    f = np.asarray(frames)
    if f.dtype == np.uint8:
        f = f.astype(np.float32) / 255.0
    f = f.astype(np.float32)
    return np.log(f + np.float32(log_eps))


class EventSimulator:
    """Stateful simulator for one sensor resolution.

    ``simulate(frames, timestamps)`` -> ``[N, 4]`` float64 ``(x, y, t, p)``
    with ``p in {-1, +1}``, globally time-sorted — the same layout
    ``synthesis.read_simulator_txt`` produces from DVS-Voltmeter dumps.
    """

    def __init__(self, resolution: Tuple[int, int], config: SimulatorConfig = SimulatorConfig()):
        self.resolution = (int(resolution[0]), int(resolution[1]))
        self.config = config
        h, w = self.resolution
        c = config
        key = jax.random.key(config.seed)
        k_pos, k_neg, k_hot, self._key = jax.random.split(key, 4)
        base = jnp.float32(c.contrast_threshold)
        sig = base * jnp.float32(c.threshold_sigma)
        self._c_pos = jnp.maximum(
            base + sig * jax.random.normal(k_pos, (h, w)), c.threshold_min
        )
        self._c_neg = jnp.maximum(
            base + sig * jax.random.normal(k_neg, (h, w)), c.threshold_min
        )
        hot = jax.random.uniform(k_hot, (h, w)) < c.hot_pixel_fraction
        self._noise_gain = jnp.where(hot, jnp.float32(c.hot_pixel_gain), 1.0)
        self.hot_pixels = np.asarray(hot)
        self._step = jax.jit(self._chunk_step)

    # -- device kernel ------------------------------------------------------

    def _interval_step(self, state, inputs):
        """One frame interval, vectorized over pixels.  Shapes: [H, W]."""
        c = self.config
        ref, logl_prev, t_last, key = state
        logl1, dt = inputs
        key, k_non, k_noff, k_ton, k_toff = jax.random.split(key, 5)

        # leak: reference decays -> spurious ON events on static scenes
        ref = ref - jnp.float32(c.leak_rate_hz) * self._c_pos * dt

        delta = logl1 - ref
        rising = delta > 0
        cthr = jnp.where(rising, self._c_pos, self._c_neg)
        n_full = jnp.floor(jnp.abs(delta) / cthr)  # uncapped crossing count
        sgn = jnp.where(rising, 1.0, -1.0)

        # crossing times: linear signal from logl_prev to logl1 over dt
        slope = (logl1 - logl_prev) / jnp.maximum(dt, 1e-12)
        ks = jnp.arange(1, c.max_events_per_pixel + 1, dtype=jnp.float32)
        levels = ref[..., None] + (sgn * cthr)[..., None] * ks  # [H, W, M]
        safe = jnp.abs(slope) > 1e-12
        t_rel = jnp.where(
            safe[..., None],
            (levels - logl_prev[..., None]) / jnp.where(safe, slope, 1.0)[..., None],
            0.0,
        )
        t_rel = jnp.clip(t_rel, 0.0, dt)
        cand = ks[None, None, :] <= n_full[..., None]  # [H, W, M]

        # refractory: sequential absorb filter over the (sorted) crossings
        if c.refractory_s > 0.0:
            refr = jnp.float32(c.refractory_s)

            def body(t_prev, km1):
                tk = t_rel[..., km1]
                ok = cand[..., km1] & (tk - t_prev >= refr)
                return jnp.where(ok, tk, t_prev), ok

            # t_last is relative to the previous interval's start; shift it
            # into this interval's frame (it is <= 0 after the shift)
            t_prev0 = t_last
            t_prev, oks = jax.lax.scan(body, t_prev0, jnp.arange(c.max_events_per_pixel))
            keep = jnp.moveaxis(oks, 0, -1)  # [H, W, M]
            t_last_new = jnp.where(
                keep.any(-1), jnp.max(jnp.where(keep, t_rel, -jnp.inf), -1), t_last
            ) - dt  # re-express relative to the NEXT interval's start
        else:
            keep = cand
            t_last_new = t_last  # unused when refractory is off
        # absorb semantics: the reference level consumes ALL crossings
        ref_new = ref + sgn * cthr * n_full

        # background/hot-pixel noise (does not move the reference level)
        if c.noise_rate_hz > 0.0:
            lam = jnp.float32(c.noise_rate_hz) * 0.5 * self._noise_gain * dt
            mn = c.max_noise_per_pixel
            n_on = jnp.minimum(jax.random.poisson(k_non, lam), mn)
            n_off = jnp.minimum(jax.random.poisson(k_noff, lam), mn)
            kn = jnp.arange(mn, dtype=jnp.int32)
            noise_t = jnp.stack(
                [
                    jax.random.uniform(k_ton, lam.shape + (mn,)) * dt,
                    jax.random.uniform(k_toff, lam.shape + (mn,)) * dt,
                ],
                axis=-2,
            )  # [H, W, 2, Mn]
            noise_keep = jnp.stack(
                [kn[None, None] < n_on[..., None], kn[None, None] < n_off[..., None]],
                axis=-2,
            )
        else:
            noise_t = jnp.zeros(ref.shape + (2, 0), jnp.float32)
            noise_keep = jnp.zeros(ref.shape + (2, 0), bool)

        out = (t_rel, keep, sgn, noise_t, noise_keep)
        return (ref_new, logl1, t_last_new, key), out

    def _chunk_step(self, state, logl1s, dts):
        """Scan `_interval_step` over a [K, H, W] chunk of intervals."""
        return jax.lax.scan(self._interval_step, state, (logl1s, dts))

    # -- host drivers -------------------------------------------------------

    def _run(self, frames: np.ndarray, timestamps: np.ndarray):
        """Yield per-interval device outputs (host numpy) chunk by chunk."""
        c = self.config
        h, w = self.resolution
        frames = np.asarray(frames)
        if frames.shape[1:] != (h, w):
            raise ValueError(f"frames {frames.shape[1:]} != resolution {(h, w)}")
        ts = np.asarray(timestamps, np.float64)
        if len(ts) != len(frames):
            raise ValueError("one timestamp per frame required")
        if len(frames) < 2:
            return
        logl = _log_intensity(frames, c.log_eps)
        dts = np.diff(ts).astype(np.float32)
        if (dts < 0).any():
            raise ValueError("timestamps must be non-decreasing")

        state = (
            jnp.asarray(logl[0]),
            jnp.asarray(logl[0]),
            jnp.full((h, w), -jnp.inf),
            self._key,
        )
        n_int = len(frames) - 1
        for start in range(0, n_int, c.chunk):
            stop = min(start + c.chunk, n_int)
            k = stop - start
            pad = c.chunk - k
            chunk_logl = logl[start + 1 : stop + 1]
            chunk_dt = dts[start:stop]
            if pad:  # dt=0 repeats emit nothing (residual < threshold)
                chunk_logl = np.concatenate([chunk_logl, np.repeat(chunk_logl[-1:], pad, 0)])
                chunk_dt = np.concatenate([chunk_dt, np.zeros(pad, np.float32)])
            state, outs = self._step(
                state, jnp.asarray(chunk_logl), jnp.asarray(chunk_dt)
            )
            outs = jax.device_get(outs)
            for i in range(k):
                yield start + i, tuple(o[i] for o in outs)
        self._key = jax.device_get(state[3])

    def simulate(self, frames: np.ndarray, timestamps: np.ndarray) -> np.ndarray:
        """Full event list for a video: ``[N, 4]`` f64 ``(x, y, t, p)``, sorted."""
        h, w = self.resolution
        yy, xx = np.mgrid[0:h, 0:w]
        chunks: List[np.ndarray] = []
        ts = np.asarray(timestamps, np.float64)
        for i, (t_rel, keep, sgn, noise_t, noise_keep) in self._run(frames, timestamps):
            t0 = ts[i]
            recs = []
            if keep.any():
                py, px, _ = np.nonzero(keep)
                tsel = t_rel[keep].astype(np.float64) + t0
                psel = sgn[py, px]
                recs.append(np.stack([px, py, tsel, psel], 1))
            if noise_keep.size and noise_keep.any():
                py, px, pol_i, _ = np.nonzero(noise_keep)
                tsel = noise_t[noise_keep].astype(np.float64) + t0
                psel = np.where(pol_i == 0, 1.0, -1.0)
                recs.append(np.stack([px, py, tsel, psel], 1))
            if recs:
                ev = np.concatenate(recs, 0)
                ev = ev[np.argsort(ev[:, 2], kind="stable")]
                chunks.append(ev)
        if not chunks:
            return np.zeros((0, 4), np.float64)
        return np.concatenate(chunks, 0)

    def simulate_counts(self, frames: np.ndarray, timestamps: np.ndarray) -> np.ndarray:
        """Per-interval 2-channel count images, ``[T-1, 2, H, W]`` f32.

        Channel 0 = positive, 1 = negative (the `events_to_channels` order),
        y NOT flipped (sensor coordinates; the rasterizer flips downstream).
        Exactly consistent with `simulate`: both read the same kept-crossing
        masks from the same kernel.
        """
        h, w = self.resolution
        out = np.zeros((len(frames) - 1, 2, h, w), np.float32)
        for i, (t_rel, keep, sgn, noise_t, noise_keep) in self._run(frames, timestamps):
            n_sig = keep.sum(-1).astype(np.float32)
            pos = np.where(sgn > 0, n_sig, 0.0)
            neg = np.where(sgn < 0, n_sig, 0.0)
            if noise_keep.size:
                pos = pos + noise_keep[..., 0, :].sum(-1)
                neg = neg + noise_keep[..., 1, :].sum(-1)
            out[i, 0], out[i, 1] = pos, neg
        return out


# ---------------------------------------------------------------------------
# multi-scale drivers
# ---------------------------------------------------------------------------


def downscale_frames(frames: np.ndarray, factor: int) -> np.ndarray:
    """Per-scale frame pyramid the way the reference prescribes: cv2.resize
    with its default bilinear interpolation (``generate_dataset/README.md:9``
    "obtain images of different scales using cv2.resize()").  Falls back to
    the equivalent half-pixel bilinear `jax.image.resize` without cv2."""
    if factor == 1:
        return np.asarray(frames)
    h, w = frames.shape[1], frames.shape[2]
    return resize_frames(frames, (h // factor, w // factor))


def resize_frames(frames: np.ndarray, shape: Tuple[int, int]) -> np.ndarray:
    """Bilinear-resize a frame stack to an explicit (H, W) grid (same
    cv2-default semantics as :func:`downscale_frames`)."""
    nh, nw = int(shape[0]), int(shape[1])
    if (frames.shape[1], frames.shape[2]) == (nh, nw):
        return np.asarray(frames)
    try:
        import cv2

        out = np.stack(
            [cv2.resize(f, (nw, nh), interpolation=cv2.INTER_LINEAR) for f in frames]
        )
    except ImportError:
        x = jnp.asarray(frames, jnp.float32)
        out = np.asarray(
            jax.image.resize(x, (len(frames), nh, nw), "linear", antialias=False)
        )
        if frames.dtype == np.uint8:
            out = np.clip(np.round(out), 0, 255).astype(np.uint8)
    return out


def write_voltmeter_txt(events: np.ndarray, path: str) -> str:
    """Write ``(x, y, t, p in {-1,+1})`` events in the DVS-Voltmeter dump
    layout the synthesis scripts parse: one header row, then ``t x y p``
    rows with ``p in {0, 1}`` (``syn_nfs.py:22-25,54-60`` reads with
    ``skiprows=1`` and maps 0 -> -1)."""
    x, y, t, p = events[:, 0], events[:, 1], events[:, 2], events[:, 3]
    p01 = (p > 0).astype(np.int64)
    # one vectorized savetxt, not a per-event f.write loop: NFS-scale
    # sequences carry tens of millions of events per run
    cols = np.column_stack((t, x.astype(np.int64), y.astype(np.int64), p01))
    np.savetxt(path, cols, fmt="%.9f %d %d %d", header="t x y p", comments="# ")
    return path


def simulate_multiscale(
    frames: np.ndarray,
    timestamps: np.ndarray,
    scales: Sequence[int] = (1, 2, 4, 8),
    prefixes: Optional[Sequence[str]] = None,
    config: SimulatorConfig = SimulatorConfig(),
    out_h5: Optional[str] = None,
    txt_dir: Optional[str] = None,
    store_frames: bool = False,
) -> Dict[str, np.ndarray]:
    """Simulate per-scale event streams from one video.

    Mirrors the reference's offline chain (downscale video per scale, run the
    simulator per scale, package): ``scales[i]`` is the downsample factor,
    ``prefixes[i]`` the h5 group prefix it lands in (default
    ``ori, down2, down4, ...`` matching ``SCALE_PREFIXES``).  Each scale gets
    an independent noise stream (seed offset by its index).

    Writes ``out_h5`` via `MultiScaleEventPackager` (with ``ori_images`` +
    per-prefix event-idx attrs when ``store_frames``) and/or DVS-Voltmeter
    ``.txt`` dumps to ``txt_dir`` for the existing `cli.generate` flow.
    """
    from bmcnet_esr_tpu.data.packager import MultiScaleEventPackager

    if prefixes is None:
        prefixes = ["ori" if s == 1 else f"down{s}" for s in scales]
    if len(prefixes) != len(scales):
        raise ValueError("one prefix per scale required")
    streams: Dict[str, np.ndarray] = {}
    for i, (s, prefix) in enumerate(zip(scales, prefixes)):
        fs = downscale_frames(frames, int(s))
        cfg = dataclasses.replace(config, seed=config.seed + i)
        sim = EventSimulator(fs.shape[1:], cfg)
        streams[prefix] = sim.simulate(fs, timestamps)

    if txt_dir is not None:
        os.makedirs(txt_dir, exist_ok=True)
        for prefix, ev in streams.items():
            write_voltmeter_txt(ev, os.path.join(txt_dir, f"{prefix}.txt"))
    if out_h5 is not None:
        # The declared sensor_resolution is the resolution of the grid the
        # `ori` PREFIX was simulated on, not the raw video: prefix
        # relabeling (e.g. --scales 2,4,8,16 --prefixes ori,down2,down4,
        # down8, the reference's directory->prefix quirk) shifts every
        # group down one octave, and the dataset layer derives each
        # prefix's resolution as sensor_resolution / downN
        # (h5dataset.resolve_scale_layout).  Anchor on `ori` when present,
        # else back out the virtual ori grid from the first downN prefix.
        raw_h, raw_w = frames.shape[1], frames.shape[2]
        if "ori" in prefixes:
            anchor = prefixes.index("ori")
            anchor_n = 1
        else:
            anchor = 0
            m = re.fullmatch(r"down(\d+)", prefixes[0])
            if m is None:
                raise ValueError(f"cannot infer sensor resolution from prefix {prefixes[0]!r}")
            anchor_n = int(m.group(1))
        sensor_h = raw_h // int(scales[anchor]) * anchor_n
        sensor_w = raw_w // int(scales[anchor]) * anchor_n
        for s, prefix in zip(scales, prefixes):
            m = re.fullmatch(r"down(\d+)", prefix)
            n = int(m.group(1)) if m else 1
            # The dataset layer derives each prefix grid as round(sensor/n)
            # (h5dataset.resolve_scale_layout) — compare the grid actually
            # simulated (raw // s, floor, matching downscale_frames) against
            # exactly that derivation, so a passing check guarantees the
            # consumer sees the same grid the events were simulated on.
            if (raw_h // int(s), raw_w // int(s)) != (
                round(sensor_h / n), round(sensor_w / n)
            ):
                raise ValueError(
                    f"prefix {prefix!r} at scale {s} is inconsistent with "
                    f"sensor_resolution ({sensor_h}, {sensor_w}); the dataset "
                    "layer derives per-prefix grids as sensor/downN"
                )
        with MultiScaleEventPackager(out_h5) as pk:
            pk.set_sensor_resolution((sensor_h, sensor_w))
            for prefix, ev in streams.items():
                pk.append_events(prefix, ev[:, 0], ev[:, 1], ev[:, 2], ev[:, 3])
            if store_frames:
                # stored ori_images must live on the declared ori grid —
                # resize to it explicitly rather than re-deriving a factor
                # from raw_h // sensor_h (which disagrees for odd raw dims,
                # e.g. raw 33 with declared 32)
                imgs = resize_frames(frames, (sensor_h, sensor_w))
                for img, t in zip(imgs, np.asarray(timestamps, np.float64)):
                    u8 = img if img.dtype == np.uint8 else np.clip(img * 255, 0, 255).astype(np.uint8)
                    pk.append_image("ori", u8, float(t))
                for prefix in prefixes:
                    pk.annotate_image_event_indices("ori", prefix)
    return streams
