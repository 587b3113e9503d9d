"""Euler Ancestral discrete scheduler — functional, host-precomputed sigmas.

Behavioral reference: diffusers `EulerAncestralDiscreteScheduler` as imported
by the Open-Sora-Plan v1.2 pipeline
(`videosys/pipelines/open_sora_plan/pipeline_open_sora_plan.py:24,305-306`).

Same structure as the other schedulers here: `set_timesteps` builds the
static (timestep, sigma) ladder on the host with float64 numpy;
`scale_model_input`/`step` are pure jnp math indexed by the Python step index,
so the whole ladder unrolls trace-compatibly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from videosys_tpu.schedulers.ddim import make_betas


@dataclasses.dataclass(frozen=True)
class EulerAncestralConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.0001
    beta_end: float = 0.02
    beta_schedule: str = "linear"
    prediction_type: str = "epsilon"  # epsilon | v_prediction
    timestep_spacing: str = "linspace"  # linspace | leading | trailing
    steps_offset: int = 0


class EulerAncestralScheduler:
    def __init__(self, config: EulerAncestralConfig = EulerAncestralConfig()):
        self.config = config
        betas = make_betas(config.num_train_timesteps, config.beta_start,
                           config.beta_end, config.beta_schedule)
        self.alphas_cumprod = np.cumprod(1.0 - betas)
        self.sigmas_all = np.sqrt((1 - self.alphas_cumprod) / self.alphas_cumprod)

    # ------------------------------------------------------------------ #
    def set_timesteps(self, num_inference_steps: int) -> np.ndarray:
        c = self.config
        T = c.num_train_timesteps
        if c.timestep_spacing == "linspace":
            ts = np.linspace(0, T - 1, num_inference_steps, dtype=np.float64)[::-1]
        elif c.timestep_spacing == "leading":
            step_ratio = T // num_inference_steps
            ts = (np.arange(num_inference_steps) * step_ratio).round()[::-1]
            ts = ts.astype(np.float64) + c.steps_offset
        elif c.timestep_spacing == "trailing":
            step_ratio = T / num_inference_steps
            ts = np.round(np.arange(T, 0, -step_ratio)).astype(np.float64) - 1
        else:
            raise ValueError(c.timestep_spacing)
        sig = np.interp(ts, np.arange(T), self.sigmas_all)
        self.sigmas = np.concatenate([sig, [0.0]])
        self.timesteps = ts.copy()
        self.num_inference_steps = num_inference_steps
        return self.timesteps

    @property
    def init_noise_sigma(self) -> float:
        if self.config.timestep_spacing in ("linspace", "trailing"):
            return float(self.sigmas.max())
        return float((self.sigmas.max() ** 2 + 1) ** 0.5)

    def scale_model_input(self, sample: jax.Array, step_index: int) -> jax.Array:
        sigma = float(self.sigmas[step_index])
        return sample / ((sigma**2 + 1) ** 0.5)

    # ------------------------------------------------------------------ #
    def step(
        self,
        model_output: jax.Array,
        step_index: int,
        sample: jax.Array,
        noise: Optional[jax.Array] = None,
        key: Optional[jax.Array] = None,
    ) -> jax.Array:
        """One ancestral Euler update; `noise` (or `key` to draw it) feeds the
        stochastic sigma_up term."""
        c = self.config
        sigma = float(self.sigmas[step_index])
        if c.prediction_type == "epsilon":
            x0 = sample - sigma * model_output
        elif c.prediction_type == "v_prediction":
            x0 = model_output * (-sigma / (sigma**2 + 1) ** 0.5) + (
                sample / (sigma**2 + 1))
        else:
            raise ValueError(c.prediction_type)

        s_from = float(self.sigmas[step_index])
        s_to = float(self.sigmas[step_index + 1])
        sigma_up = (s_to**2 * (s_from**2 - s_to**2) / s_from**2) ** 0.5
        sigma_down = (s_to**2 - sigma_up**2) ** 0.5

        derivative = (sample - x0) / sigma
        dt = sigma_down - sigma
        prev = sample + derivative * dt
        if sigma_up > 0:
            if noise is None:
                assert key is not None, "need noise or key for ancestral term"
                noise = jax.random.normal(key, sample.shape, sample.dtype)
            prev = prev + noise * sigma_up
        return prev

    def add_noise(self, x0: jax.Array, noise: jax.Array, step_indices) -> jax.Array:
        sig = jnp.asarray(self.sigmas, jnp.float32)[jnp.asarray(step_indices)]
        sig = sig.reshape(sig.shape + (1,) * (x0.ndim - sig.ndim))
        return x0 + sig * noise
