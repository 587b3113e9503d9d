"""Latte model + DDIM scheduler + pipeline tests (tiny offline configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videosys_tpu.core.parallel import ParallelConfig, build_mesh, use_mesh
from videosys_tpu.models.transformers.latte import LatteConfig as LatteModelConfig
from videosys_tpu.models.transformers.latte import LatteT2V
from videosys_tpu.schedulers.ddim import DDIMConfig, DDIMScheduler

TINY = LatteModelConfig(num_layers=2, num_heads=2, head_dim=16,
                        caption_channels=16, video_length=4, sample_size=8)


def _inputs(B=2, T=4, H=16, W=16, L=6):
    ks = jax.random.split(jax.random.key(0), 2)
    x = jax.random.normal(ks[0], (B, 4, T, H, W))
    t = jnp.array([500.0] * B)
    y = jax.random.normal(ks[1], (B, L, 16))
    kv_mask = jnp.array([[True] * 4 + [False] * 2] * B)
    return x, t, y, kv_mask


def test_latte_forward_shape():
    model = LatteT2V(TINY)
    x, t, y, kv_mask = _inputs()
    params = model.init(jax.random.key(0), x, t, y, kv_mask=kv_mask)
    out = model.apply(params, x, t, y, kv_mask=kv_mask)
    assert out.shape == (2, 8, 4, 16, 16)
    assert np.all(np.isfinite(np.asarray(out)))


def test_latte_sp_equivalence():
    model = LatteT2V(TINY)
    x, t, y, kv_mask = _inputs(T=8)
    params = model.init(jax.random.key(0), x, t, y, kv_mask=kv_mask)
    fn = jax.jit(lambda p, x, t, y, m: model.apply(p, x, t, y, kv_mask=m))
    ref = fn(params, x, t, y, kv_mask)
    mesh = build_mesh(ParallelConfig(dp_size=1, cp_size=1, sp_size=8))
    with use_mesh(mesh):
        out = fn(params, x, t, y, kv_mask)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=2e-5, rtol=1e-5)


def test_latte_pab_fp8_cache_close_to_dense():
    """fp8 PAB cache (family_bench's benched config) must store float8 slots
    and keep the broadcast output within quantization error of dense."""
    from videosys_tpu.core.pab import PABConfig, PABStepPlan

    pab = PABConfig(
        spatial_broadcast=True, spatial_threshold=(100, 800), spatial_range=2,
        temporal_broadcast=True, temporal_threshold=(100, 800),
        temporal_range=4, cross_broadcast=True, cross_threshold=(100, 800),
        cross_range=6, cache_dtype="float8_e4m3fn")
    x, t, y, kv_mask = _inputs()
    m = LatteT2V(TINY, pab_config=pab)
    S = (16 // TINY.patch_size) ** 2
    cache = m.init_cache(2, 4, S)
    assert {str(a.dtype) for a in jax.tree.leaves(cache)} == {"float8_e4m3fn"}
    p = m.init(jax.random.key(0), x, t, y, kv_mask=kv_mask, pab_cache=cache)
    out_dense, cache = m.apply(p, x, t, y, kv_mask=kv_mask, pab_cache=cache)
    assert {str(a.dtype) for a in jax.tree.leaves(cache)} == {"float8_e4m3fn"}
    m_b = LatteT2V(TINY, pab_config=pab, plan=PABStepPlan(
        spatial=True, temporal=True, cross=True))
    out_bcast, _ = m_b.apply(p, x, t, y, kv_mask=kv_mask, pab_cache=cache)
    assert float(np.abs(np.asarray(out_bcast - out_dense)).max()) < 0.2


# ------------------------- DDIM scheduler ------------------------------- #

def test_ddim_matches_torch_diffusers_math():
    """Cross-check against an independent numpy re-derivation of DDIM
    (eta=0, epsilon prediction) over a full 10-step trajectory."""
    sched = DDIMScheduler(DDIMConfig(beta_start=0.0001, beta_end=0.02,
                                     beta_schedule="linear", clip_sample=False))
    ts = sched.set_timesteps(10)
    assert ts[0] == 900 and ts[-1] == 0 and len(ts) == 10

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 4, 2, 8, 8)).astype(np.float32)
    betas = np.linspace(0.0001, 0.02, 1000)
    ac = np.cumprod(1 - betas)

    xj = jnp.asarray(x)
    xn = x.copy()
    for t in ts:
        eps = 0.1 * xn  # deterministic mock epsilon
        # numpy reference
        a_t = ac[t]
        prev = t - 100
        a_p = ac[prev] if prev >= 0 else 1.0
        x0 = (xn - (1 - a_t) ** 0.5 * eps) / a_t**0.5
        xn = a_p**0.5 * x0 + (1 - a_p) ** 0.5 * eps
        # jax scheduler
        xj = sched.step(jnp.asarray(0.1) * xj, int(t), xj)
    np.testing.assert_allclose(np.asarray(xj), xn, rtol=1e-5, atol=1e-5)


def test_ddim_v_prediction_and_zero_snr():
    sched = DDIMScheduler(DDIMConfig(prediction_type="v_prediction",
                                     rescale_betas_zero_snr=True,
                                     timestep_spacing="trailing"))
    ts = sched.set_timesteps(10)
    assert ts[0] == 999  # trailing starts at T-1
    assert sched.alphas_cumprod[-1] == 0.0  # zero terminal SNR
    x = jnp.ones((1, 4, 2, 4, 4))
    # t=999 has alpha=0 -> x0 = -v; avoid division issues
    out = sched.step(0.5 * x, int(ts[1]), x)
    assert np.all(np.isfinite(np.asarray(out)))


def test_ddim_add_noise_roundtrip():
    sched = DDIMScheduler(DDIMConfig())
    x0 = jnp.ones((2, 3))
    noise = jnp.zeros((2, 3))
    out = sched.add_noise(x0, noise, jnp.array([0, 999]))
    a0 = sched.alphas_cumprod[0] ** 0.5
    np.testing.assert_allclose(out[0], np.full(3, a0), rtol=1e-6)


# ------------------------- pipeline smoke ------------------------------- #

def test_latte_pipeline_generate():
    from videosys_tpu.models.autoencoders.vae2d import AutoencoderKL2D
    from videosys_tpu.pipelines.latte.pipeline_latte import (
        LatteConfig,
        LattePipeline,
    )

    cfg = LatteConfig(model_path=None, dtype="fp32",
                      transformer_config=TINY)
    vae = AutoencoderKL2D(mid_block_add_attention=False,
                        block_out_channels=(8, 16), layers_per_block=1,
                          num_groups=4)
    pipe = LattePipeline(cfg, vae=vae)
    out = pipe.generate("a cat", num_inference_steps=2, video_length=4,
                        height=16, width=16, seed=0)
    assert out.video.shape == (1, 4, 16, 16, 3)
    assert out.video.dtype == np.uint8


def test_latte_text_kv_bucket_is_exact():
    """Static text-KV bucketing must be exact for Latte's masked
    cross-attention (pipelines/common.py: fully-masked tokens underflow to
    0.0 through the fp32 softmax). ±1 uint8 wobble allowed — XLA may
    reassociate the shorter reductions differently."""
    from videosys_tpu.models.autoencoders.vae2d import AutoencoderKL2D
    from videosys_tpu.pipelines.latte.pipeline_latte import (
        LatteConfig,
        LattePipeline,
    )

    cfg = LatteConfig(model_path=None, dtype="fp32", transformer_config=TINY)
    vae = AutoencoderKL2D(mid_block_add_attention=False,
                          block_out_channels=(8, 16), layers_per_block=1,
                          num_groups=4)
    pipe = LattePipeline(cfg, vae=vae)
    kw = dict(num_inference_steps=2, video_length=4, height=16, width=16,
              seed=0)
    a = pipe.generate("a cat", **kw).video
    assert pipe.last_text_kv_len == 64  # 120-token stub -> the 64 bucket
    pipe._config.text_kv_bucket = False
    b = pipe.generate("a cat", **kw).video
    assert pipe.last_text_kv_len == 120
    diff = np.abs(a.astype(np.int16) - b.astype(np.int16))
    assert diff.max() <= 1 and (diff != 0).mean() < 1e-3, (
        diff.max(), (diff != 0).mean())


def test_latte_cpu_offload_matches_dense():
    """Shared low-mem mode (VideoSysPipeline._exec_put): host-committed
    params, per-phase streaming, bit-identical output."""
    import jax

    from videosys_tpu.models.autoencoders.vae2d import AutoencoderKL2D
    from videosys_tpu.pipelines.latte.pipeline_latte import (
        LatteConfig,
        LattePipeline,
    )

    vae = AutoencoderKL2D(mid_block_add_attention=False,
                          block_out_channels=(8, 16), layers_per_block=1,
                          num_groups=4)
    kw = dict(num_inference_steps=2, video_length=4, height=16, width=16,
              seed=0)
    dense = LattePipeline(LatteConfig(model_path=None, dtype="fp32",
                                      transformer_config=TINY), vae=vae)
    v_dense = dense.generate("a cat", **kw).video

    off = LattePipeline(LatteConfig(model_path=None, dtype="fp32",
                                    transformer_config=TINY,
                                    cpu_offload=True),
                        vae=vae, params=dense.params)
    cpu0 = jax.devices("cpu")[0]
    for leaf in jax.tree.leaves(off.params):
        assert leaf.devices() == {cpu0}
    v_off = off.generate("a cat", **kw).video
    np.testing.assert_array_equal(v_dense, v_off)
