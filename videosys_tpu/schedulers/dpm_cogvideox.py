"""CogVideoX DPM-solver (SDE multistep) scheduler.

Behavioral reference: `videosys/schedulers/scheduling_dpm_cogvideox.py`
(CogVideoXDPMScheduler :119-483 — get_variables :300-311, get_mult :313-322,
step :324-434). Second-order multistep in lambda space with stochastic noise;
the previous x0 prediction is threaded through the sampling loop
(pipeline_cogvideox.py:711-722).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from videosys_tpu.schedulers.ddim import DDIMConfig, DDIMScheduler


@dataclasses.dataclass(frozen=True)
class CogVideoXDPMConfig(DDIMConfig):
    prediction_type: str = "v_prediction"
    snr_shift_scale: float = 3.0
    rescale_betas_zero_snr: bool = True
    timestep_spacing: str = "trailing"


class CogVideoXDPMScheduler(DDIMScheduler):
    """Shares beta/alpha machinery with DDIMScheduler; overrides step."""

    def __init__(self, config: CogVideoXDPMConfig = CogVideoXDPMConfig()):
        super().__init__(config)

    def _variables(self, a_t: float, a_prev: float, a_back: Optional[float]):
        # IEEE semantics match torch: a=0 (zero-terminal-SNR) -> lambda=-inf,
        # h=+inf, exp(-h)=0 — the step degrades gracefully (reference
        # :300-322 relies on the same behavior).
        a_t, a_prev = np.float64(a_t), np.float64(a_prev)
        with np.errstate(divide="ignore", over="ignore", invalid="ignore"):
            lamb = float(np.log(np.sqrt(a_t / (1 - a_t))))
            lamb_next = float(np.log(np.sqrt(a_prev / (1 - a_prev))))
            h = lamb_next - lamb
            if a_back is not None:
                a_back = np.float64(a_back)
                lamb_prev = float(np.log(np.sqrt(a_back / (1 - a_back))))
                r = (lamb - lamb_prev) / h
                return h, r
        return h, None

    def step(
        self,
        model_output: jax.Array,
        old_pred_x0: Optional[jax.Array],
        timestep: int,
        timestep_back: Optional[int],
        sample: jax.Array,
        rng: jax.Array,
    ) -> Tuple[jax.Array, jax.Array]:
        """Returns (prev_sample, pred_x0). `old_pred_x0` is None on the first
        step (reference :421-433)."""
        T = self.config.num_train_timesteps
        prev_t = timestep - T // self.num_inference_steps
        a_t = float(self.alphas_cumprod[timestep])
        a_prev = float(self.alphas_cumprod[prev_t]) if prev_t >= 0 \
            else self.final_alpha_cumprod
        a_back = float(self.alphas_cumprod[timestep_back]) \
            if timestep_back is not None else None

        x0, _ = self.predict_x0(sample, model_output, a_t)

        h, r = self._variables(a_t, a_prev, a_back)
        mult1 = ((1 - a_prev) / (1 - a_t)) ** 0.5 * float(np.exp(-h))
        mult2 = float(np.expm1(-2 * h)) * a_prev**0.5
        mult_noise = (1 - a_prev) ** 0.5 * (1 - float(np.exp(-2 * h))) ** 0.5

        noise = jax.random.normal(rng, sample.shape, sample.dtype)
        prev_sample = mult1 * sample - mult2 * x0 + mult_noise * noise

        if old_pred_x0 is None or prev_t < 0:
            return prev_sample, x0

        mult3 = 1 + 1 / (2 * r)
        mult4 = 1 / (2 * r)
        denoised_d = mult3 * x0 - mult4 * old_pred_x0
        noise2 = jax.random.normal(jax.random.fold_in(rng, 1),
                                   sample.shape, sample.dtype)
        prev_sample = mult1 * sample - mult2 * denoised_d + mult_noise * noise2
        return prev_sample, x0
