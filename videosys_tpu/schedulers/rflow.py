"""Rectified-flow (RFLOW) scheduler — TPU-native functional re-design.

Behavioral reference: `videosys/schedulers/scheduling_rflow_open_sora.py`
(RFLOW.sample :188-257, RFlowScheduler :73-161, timestep_transform :47-70).
The math is reproduced exactly (fp32 bit-parity target per BASELINE.md), but
the structure is jit-first:

* all per-run quantities (the timestep ladder, dt ladder) are computed
  host-side up front as numpy arrays — they are static for a given
  (num_sampling_steps, resolution, frames) so the denoise loop compiles once;
* `step` is a pure function (z, v, dt) -> z used inside the jitted sampler;
* training losses are a pure function of (params, rng, batch).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def timestep_transform(
    t: np.ndarray | float,
    height: float,
    width: float,
    num_frames: int,
    base_resolution: float = 512 * 512,
    base_num_frames: float = 1.0,
    scale: float = 1.0,
    num_timesteps: float = 1.0,
):
    """Resolution/duration-aware timestep warp (scheduling_rflow_open_sora.py:47-70).

    `num_frames` here is the *pixel* frame count; latent frames follow the
    VAE's 17->5 temporal compression, with the single-image special case.
    """
    t = np.asarray(t, dtype=np.float64) / num_timesteps
    ratio_space = np.sqrt(height * width / base_resolution)
    lat_frames = 1.0 if num_frames == 1 else (num_frames // 17) * 5
    ratio_time = np.sqrt(lat_frames / base_num_frames)
    ratio = ratio_space * ratio_time * scale
    new_t = ratio * t / (1 + (ratio - 1) * t)
    return (new_t * num_timesteps).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class RFlowConfig:
    num_sampling_steps: int = 30
    num_timesteps: int = 1000
    cfg_scale: float = 7.0
    use_discrete_timesteps: bool = False
    use_timestep_transform: bool = True
    transform_scale: float = 1.0
    sample_method: str = "uniform"  # or "logit-normal" (training)
    loc: float = 0.0
    scale: float = 1.0


class RFlowScheduler:
    """Functional rectified-flow scheduler."""

    def __init__(self, config: RFlowConfig = RFlowConfig()):
        self.config = config

    # ------------------------------------------------------------------ #
    # Sampling-side (host-static) quantities
    # ------------------------------------------------------------------ #

    def prepare_timesteps(
        self, height: float, width: float, num_frames: int
    ) -> np.ndarray:
        """Timestep ladder t_0 > t_1 > ... (RFLOW.sample :208-213). fp32."""
        c = self.config
        n, t_max = c.num_sampling_steps, c.num_timesteps
        ts = np.array([(1.0 - i / n) * t_max for i in range(n)], dtype=np.float64)
        if c.use_discrete_timesteps:
            ts = np.round(ts)
        if c.use_timestep_transform:
            ts = timestep_transform(
                ts, height, width, num_frames,
                scale=c.transform_scale, num_timesteps=t_max,
            )
        return ts.astype(np.float32)

    def prepare_dts(self, timesteps: np.ndarray) -> np.ndarray:
        """dt_i = (t_i - t_{i+1}) / T, last step integrates to 0 (:250-252)."""
        t = np.asarray(timesteps, dtype=np.float64)
        dts = np.empty_like(t)
        dts[:-1] = t[:-1] - t[1:]
        dts[-1] = t[-1]
        return (dts / self.config.num_timesteps).astype(np.float32)

    # ------------------------------------------------------------------ #
    # Pure per-step math (used inside jit)
    # ------------------------------------------------------------------ #

    @staticmethod
    def apply_cfg(pred_cond: jax.Array, pred_uncond: jax.Array, guidance_scale) -> jax.Array:
        """Classifier-free guidance combine (:246-247)."""
        return pred_uncond + guidance_scale * (pred_cond - pred_uncond)

    @staticmethod
    def step(z: jax.Array, v_pred: jax.Array, dt) -> jax.Array:
        """Euler update z <- z + v * dt (:252)."""
        return z + v_pred * jnp.asarray(dt, dtype=z.dtype)

    # ------------------------------------------------------------------ #
    # Training-side
    # ------------------------------------------------------------------ #

    def add_noise(self, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        """Linear interpolation x_t = tp*x0 + (1-tp)*noise with
        tp = 1 - t/T (RFlowScheduler.add_noise :144-161)."""
        tp = 1.0 - t.astype(jnp.float32) / self.config.num_timesteps
        tp = tp.reshape(tp.shape + (1,) * (x0.ndim - tp.ndim))
        return tp * x0 + (1.0 - tp) * noise

    def sample_t(self, rng: jax.Array, batch: int) -> jax.Array:
        """Draw training timesteps in [0, T) (RFlowScheduler :109-115)."""
        c = self.config
        if c.use_discrete_timesteps:
            return jax.random.randint(rng, (batch,), 0, c.num_timesteps).astype(jnp.float32)
        if c.sample_method == "uniform":
            return jax.random.uniform(rng, (batch,)) * c.num_timesteps
        if c.sample_method == "logit-normal":
            # LogisticNormal(loc, scale): sigmoid of a Normal sample.
            z = jax.random.normal(rng, (batch,)) * c.scale + c.loc
            return jax.nn.sigmoid(z) * c.num_timesteps
        raise ValueError(c.sample_method)

    def transform_training_t(self, t: jax.Array, height: float, width: float,
                             num_frames: int) -> jax.Array:
        """Resolution/duration warp of sampled training timesteps — the
        traced twin of `timestep_transform` (reference applies it to training
        t at :121-122). The bucket dims are static per compiled step so the
        warp ratio is a host-side constant."""
        c = self.config
        ratio_space = float(np.sqrt(height * width / (512.0 * 512.0)))
        lat_frames = 1.0 if num_frames == 1 else (num_frames // 17) * 5
        ratio = ratio_space * float(np.sqrt(lat_frames)) * c.transform_scale
        tn = t / c.num_timesteps
        return ratio * tn / (1.0 + (ratio - 1.0) * tn) * c.num_timesteps

    def training_losses(
        self,
        model_fn: Callable[..., jax.Array],
        rng: jax.Array,
        x0: jax.Array,
        model_kwargs: Optional[dict] = None,
        mask: Optional[jax.Array] = None,
        t: Optional[jax.Array] = None,
        weights: Optional[jax.Array] = None,
        height: Optional[float] = None,
        width: Optional[float] = None,
        num_frames: Optional[int] = None,
    ) -> jax.Array:
        """MSE(v_pred, x0 - noise) with optional frame mask
        (RFlowScheduler.training_losses :103-142). x0: [B, C, T, H, W].

        When ``use_timestep_transform`` is set, the sampled t is warped by the
        bucket's (height, width, num_frames) exactly like the reference
        (:121-122 -> timestep_transform :47-70). The bucket shape is static
        per compiled step, so the warp ratio is a host-side constant; pixel
        dims are required in that case."""
        model_kwargs = dict(model_kwargs or {})
        rng_t, rng_n = jax.random.split(rng)
        if t is None:
            t = self.sample_t(rng_t, x0.shape[0])
            if self.config.use_timestep_transform:
                if height is None or width is None or num_frames is None:
                    raise ValueError(
                        "use_timestep_transform requires height/width/"
                        "num_frames (pixel dims) in training_losses")
                t = self.transform_training_t(t, height, width, num_frames)
        noise = jax.random.normal(rng_n, x0.shape, dtype=x0.dtype)
        x_t = self.add_noise(x0, noise, t)
        if mask is not None:
            x_t0 = self.add_noise(x0, noise, jnp.zeros_like(t))
            x_t = jnp.where(mask[:, None, :, None, None], x_t, x_t0)
        model_out = model_fn(x_t, t, **model_kwargs)
        v_pred = jnp.split(model_out, 2, axis=1)[0]  # drop predicted sigma
        err = (v_pred - (x0 - noise)) ** 2
        if weights is not None:
            w = weights[t.astype(jnp.int32)].astype(err.dtype)
            err = err * w.reshape(w.shape + (1,) * (err.ndim - 1))
        if mask is None:
            return jnp.mean(err, axis=tuple(range(1, err.ndim)))
        # masked mean over frames: err [B, C, T, H, W], mask [B, T]
        err_btc = jnp.reshape(jnp.moveaxis(err, 2, 1), (err.shape[0], err.shape[2], -1))
        denom = jnp.sum(mask, axis=1) * err_btc.shape[-1]
        return jnp.sum(err_btc * mask[:, :, None], axis=(1, 2)) / denom
