"""RFLOW scheduler parity tests.

BASELINE.md requires the schedulers to match reference latents bit-for-bit at
fp32. We load the reference's standalone scheduler file
(`videosys/schedulers/scheduling_rflow_open_sora.py`) directly via importlib
(it only needs torch/einops/tqdm, not the full videosys package) and compare
numerically against the JAX implementation.
"""

import importlib.util
import pathlib

import numpy as np
import pytest

from videosys_tpu.schedulers.rflow import RFlowConfig, RFlowScheduler, timestep_transform

REF_FILE = pathlib.Path("/root/reference/videosys/schedulers/scheduling_rflow_open_sora.py")


@pytest.fixture(scope="module")
def ref_mod():
    if not REF_FILE.exists():
        pytest.skip("reference tree not mounted")
    torch = pytest.importorskip("torch")  # noqa: F841
    spec = importlib.util.spec_from_file_location("ref_rflow", REF_FILE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _ref_timesteps(ref_mod, n_steps, num_timesteps, height, width, num_frames):
    import torch

    timesteps = [(1.0 - i / n_steps) * num_timesteps for i in range(n_steps)]
    timesteps = [torch.tensor([t]) for t in timesteps]
    model_args = {
        "height": torch.tensor([float(height)]),
        "width": torch.tensor([float(width)]),
        "num_frames": torch.tensor([num_frames]),
    }
    timesteps = [
        ref_mod.timestep_transform(t, model_args, num_timesteps=num_timesteps)
        for t in timesteps
    ]
    return np.array([float(t[0]) for t in timesteps], dtype=np.float32)


@pytest.mark.parametrize(
    "height,width,num_frames",
    [(256, 256, 1), (480, 854, 34), (512, 512, 85), (720, 1280, 51)],
)
def test_timestep_ladder_matches_reference(ref_mod, height, width, num_frames):
    cfg = RFlowConfig(num_sampling_steps=30, num_timesteps=1000, use_timestep_transform=True)
    sched = RFlowScheduler(cfg)
    got = sched.prepare_timesteps(height, width, num_frames)
    want = _ref_timesteps(ref_mod, 30, 1000, height, width, num_frames)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4)


def test_timestep_transform_image_special_case():
    # num_frames == 1 must use latent frame count 1, not 0 (ref :60-63).
    t = timestep_transform(500.0, 256, 256, 1, num_timesteps=1000)
    assert np.isfinite(t) and 0 < t < 1000


def test_add_noise_matches_reference(ref_mod):
    import torch

    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((2, 4, 5, 8, 8)).astype(np.float32)
    noise = rng.standard_normal((2, 4, 5, 8, 8)).astype(np.float32)
    t = np.array([337.2, 912.0], dtype=np.float32)

    ref = ref_mod.RFlowScheduler(num_timesteps=1000, num_sampling_steps=30)
    want = ref.add_noise(torch.from_numpy(x0), torch.from_numpy(noise), torch.from_numpy(t)).numpy()

    import jax.numpy as jnp

    sched = RFlowScheduler(RFlowConfig(num_timesteps=1000))
    got = np.asarray(sched.add_noise(jnp.asarray(x0), jnp.asarray(noise), jnp.asarray(t)))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_euler_sampling_loop_matches_reference_math(ref_mod):
    """Run the full 30-step Euler loop with a mock linear 'model' in both
    frameworks and require fp32 bit-level agreement of the trajectory."""
    import torch

    n_steps, T = 30, 1000
    cfg = RFlowConfig(num_sampling_steps=n_steps, num_timesteps=T,
                      use_timestep_transform=True, cfg_scale=7.0)
    sched = RFlowScheduler(cfg)
    ts = sched.prepare_timesteps(480, 854, 34)
    dts = sched.prepare_dts(ts)

    rng = np.random.default_rng(1)
    z0 = rng.standard_normal((1, 4, 10, 8, 8)).astype(np.float32)

    def fake_v(z, t):  # deterministic mock velocity
        return 0.1 * z + 0.01 * t / T

    # JAX side
    import jax.numpy as jnp

    z = jnp.asarray(z0)
    for i in range(n_steps):
        v_c = fake_v(z, ts[i])
        v_u = 0.5 * v_c
        v = sched.apply_cfg(v_c, v_u, cfg.cfg_scale)
        z = sched.step(z, v, dts[i])
    got = np.asarray(z)

    # Reference-math side (pure torch re-derivation of RFLOW.sample :239-252)
    want_ts = _ref_timesteps(ref_mod, n_steps, T, 480, 854, 34)
    zt = torch.from_numpy(z0)
    for i in range(n_steps):
        v_c = 0.1 * zt + 0.01 * float(want_ts[i]) / T
        v_u = 0.5 * v_c
        v = v_u + cfg.cfg_scale * (v_c - v_u)
        dt = (want_ts[i] - want_ts[i + 1]) if i < n_steps - 1 else want_ts[i]
        zt = zt + v * (float(dt) / T)
    np.testing.assert_allclose(got, np.asarray(zt), rtol=1e-6, atol=1e-5)


def test_training_losses_shape_and_mask():
    import jax

    sched = RFlowScheduler(RFlowConfig())
    x0 = jax.random.normal(jax.random.key(0), (2, 4, 6, 8, 8))

    def model_fn(x_t, t):
        return jnp_concat_double(x_t)

    import jax.numpy as jnp

    def jnp_concat_double(x):
        return jnp.concatenate([x * 0.9, x], axis=1)

    loss = sched.training_losses(model_fn, jax.random.key(1), x0,
                                 height=256.0, width=256.0, num_frames=34)
    assert loss.shape == (2,)
    mask = jnp.array([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1]], dtype=jnp.float32)
    loss_m = sched.training_losses(model_fn, jax.random.key(1), x0, mask=mask,
                                   height=256.0, width=256.0, num_frames=34)
    assert loss_m.shape == (2,)
    assert np.all(np.isfinite(np.asarray(loss_m)))


def test_training_losses_requires_dims_when_transform_enabled():
    """The reference recipe warps training t per bucket (:121-122); silently
    skipping the warp was an advisor-flagged bug. Without dims we raise."""
    import jax
    import jax.numpy as jnp

    sched = RFlowScheduler(RFlowConfig())
    x0 = jax.random.normal(jax.random.key(0), (2, 4, 6, 8, 8))
    with pytest.raises(ValueError, match="use_timestep_transform"):
        sched.training_losses(lambda x, t: jnp.concatenate([x, x], axis=1),
                              jax.random.key(1), x0)


@pytest.mark.parametrize("height,width,num_frames",
                         [(480, 854, 51), (256, 256, 1), (144, 256, 34)])
def test_training_timestep_transform_matches_reference(
        ref_mod, height, width, num_frames):
    """transform_training_t == the reference timestep_transform applied to
    sampled training t (scheduling_rflow_open_sora.py:121-122)."""
    import jax.numpy as jnp
    import torch

    sched = RFlowScheduler(RFlowConfig(use_timestep_transform=True))
    t = np.linspace(1.0, 999.0, 13, dtype=np.float32)
    got = np.asarray(sched.transform_training_t(
        jnp.asarray(t), float(height), float(width), num_frames))
    model_args = {
        "height": torch.full((13,), float(height)),
        "width": torch.full((13,), float(width)),
        "num_frames": torch.full((13,), num_frames, dtype=torch.long),
    }
    want = ref_mod.timestep_transform(
        torch.from_numpy(t), model_args, num_timesteps=1000).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
