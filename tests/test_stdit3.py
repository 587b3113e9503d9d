"""STDiT3 model tests: shapes, determinism, PAB cache plumbing, and
DSP sequence-parallel equivalence on the fake 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videosys_tpu.core.pab import PABConfig, PABStepPlan, build_plans
from videosys_tpu.core.parallel import ParallelConfig, build_mesh, use_mesh
from videosys_tpu.models.transformers.stdit3 import STDiT3, STDiT3Config

TINY = STDiT3Config(
    depth=2, hidden_size=64, num_heads=4, caption_channels=32,
    model_max_length=8, patch_size=(1, 2, 2), in_channels=4,
)


def _inputs(B=2, T=3, H=8, W=8, L=8, key=0):
    ks = jax.random.split(jax.random.key(key), 4)
    x = jax.random.normal(ks[0], (B, 4, T, H, W))
    t = jnp.array([500.0] * B)
    y = jax.random.normal(ks[1], (B, L, 32))
    kv_mask = jnp.array([[True] * 5 + [False] * 3] * B)
    fps = jnp.array([24.0] * B)
    return x, t, y, kv_mask, fps


def test_forward_shape():
    model = STDiT3(TINY)
    x, t, y, kv_mask, fps = _inputs()
    params = model.init(jax.random.key(0), x, t, y, kv_mask=kv_mask, fps=fps,
                        height=256.0, width=256.0)
    out = model.apply(params, x, t, y, kv_mask=kv_mask, fps=fps,
                      height=256.0, width=256.0)
    assert out.shape == (2, 8, 3, 8, 8)  # out_channels = 2*in (pred_sigma)
    assert out.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(out)))


def test_forward_with_x_mask():
    model = STDiT3(TINY)
    x, t, y, kv_mask, fps = _inputs()
    x_mask = jnp.array([[True, True, False], [True, False, False]])
    params = model.init(jax.random.key(0), x, t, y, kv_mask=kv_mask,
                        x_mask=x_mask, fps=fps, height=256.0, width=256.0)
    out = model.apply(params, x, t, y, kv_mask=kv_mask, x_mask=x_mask, fps=fps,
                      height=256.0, width=256.0)
    assert out.shape == (2, 8, 3, 8, 8)
    assert np.all(np.isfinite(np.asarray(out)))


def test_pab_cache_roundtrip():
    pab = PABConfig(
        spatial_broadcast=True, spatial_threshold=(100, 900), spatial_range=2,
        temporal_broadcast=True, temporal_threshold=(100, 900), temporal_range=2,
        cross_broadcast=True, cross_threshold=(100, 900), cross_range=2,
    )
    x, t, y, kv_mask, fps = _inputs()

    # a step followed by a broadcast step carries static save flags
    # (build_plans sets save_* = next step reads; write-only mode)
    compute_model = STDiT3(
        TINY, plan=PABStepPlan(save_spatial=True, save_temporal=True,
                               save_cross=True),
        pab_config=pab)
    params = compute_model.init(jax.random.key(0), x, t, y, kv_mask=kv_mask,
                                fps=fps, height=256.0, width=256.0)
    cache = compute_model.init_cache(B=2, T=3, S=16)
    assert set(cache) == {"spatial", "temporal"}
    assert set(cache["spatial"]) == {"attn", "cross"}

    out1, cache1 = compute_model.apply(params, x, t, y, kv_mask=kv_mask,
                                       fps=fps, height=256.0, width=256.0,
                                       pab_cache=cache)
    # caches must be filled (non-zero) after a compute step
    assert np.abs(np.asarray(cache1["spatial"]["attn"])).sum() > 0

    # broadcast step: all attention reused -> same out as recompute with
    # identical inputs (since t is identical, outputs must match exactly)
    bcast_model = STDiT3(
        TINY, plan=PABStepPlan(spatial=True, temporal=True, cross=True),
        pab_config=pab,
    )
    out2, cache2 = bcast_model.apply(params, x, t, y, kv_mask=kv_mask,
                                     fps=fps, height=256.0, width=256.0,
                                     pab_cache=cache1)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_build_plans_counts():
    pab = PABConfig(spatial_broadcast=True, spatial_threshold=(200, 800),
                    spatial_range=2)
    ts = np.linspace(1000, 33, 30)
    plans = build_plans(pab, ts, depth=2)
    # count % 2 != 0 (odd steps) and 200 < t < 800
    want = [(i % 2 == 1) and (200 < ts[i] < 800) for i in range(30)]
    assert [p.spatial for p in plans] == want


def test_sp8_matches_single_device():
    """DSP sequence parallel must be numerically equivalent to sp=1
    (SURVEY.md §7 gate for step 7)."""
    model = STDiT3(TINY)
    x, t, y, kv_mask, fps = _inputs(B=2, T=4, H=8, W=8)
    params = model.init(jax.random.key(0), x, t, y, kv_mask=kv_mask, fps=fps,
                        height=256.0, width=256.0)

    fn = jax.jit(lambda p, x, t, y, m, f: model.apply(
        p, x, t, y, kv_mask=m, fps=f, height=256.0, width=256.0))
    out_single = fn(params, x, t, y, kv_mask, fps)

    mesh = build_mesh(ParallelConfig(dp_size=1, cp_size=1, sp_size=8))
    with use_mesh(mesh):
        out_sp = fn(params, x, t, y, kv_mask, fps)
    np.testing.assert_allclose(
        np.asarray(out_single), np.asarray(out_sp), atol=2e-5, rtol=1e-5
    )


def test_cp2_sp4_matches_single_device():
    model = STDiT3(TINY)
    x, t, y, kv_mask, fps = _inputs(B=2, T=4, H=8, W=8)
    params = model.init(jax.random.key(0), x, t, y, kv_mask=kv_mask, fps=fps,
                        height=256.0, width=256.0)
    fn = jax.jit(lambda p, x, t, y, m, f: model.apply(
        p, x, t, y, kv_mask=m, fps=f, height=256.0, width=256.0))
    out_single = fn(params, x, t, y, kv_mask, fps)
    mesh = build_mesh(ParallelConfig(dp_size=1, cp_size=2, sp_size=4))
    with use_mesh(mesh):
        out = fn(params, x, t, y, kv_mask, fps)
    np.testing.assert_allclose(
        np.asarray(out_single), np.asarray(out), atol=2e-5, rtol=1e-5
    )


def test_pab_fp8_cache_close_to_dense():
    """float8 PAB cache (PABConfig.cache_dtype) must keep broadcast outputs
    close to the dense pass (quantization error only)."""
    import numpy as np

    from videosys_tpu.core.pab import PABConfig, PABStepPlan

    cfg = STDiT3Config(depth=2, hidden_size=32, num_heads=2,
                       caption_channels=16, model_max_length=8)
    pab = PABConfig(spatial_broadcast=True, spatial_threshold=(450, 930),
                    spatial_range=2, temporal_broadcast=True,
                    temporal_threshold=(450, 930), temporal_range=4,
                    cache_dtype="float8_e4m3fn")
    m = STDiT3(cfg, pab_config=pab,
               plan=PABStepPlan(save_spatial=True, save_temporal=True))
    cache = m.init_cache(2, 2, 16)
    assert str(jax.tree.leaves(cache)[0].dtype) == "float8_e4m3fn"
    x = jnp.ones((2, 4, 2, 8, 8))
    t = jnp.full((2,), 500.0)
    y = jnp.ones((2, 4, 16))
    kw = dict(fps=jnp.full((2,), 24.0), height=64.0, width=64.0)
    p = m.init(jax.random.key(0), x, t, y, pab_cache=cache, **kw)
    out, c2 = m.apply(p, x, t, y, pab_cache=cache, **kw)
    m2 = STDiT3(cfg, pab_config=pab,
                plan=PABStepPlan(spatial=True, temporal=True))
    out2, _ = m2.apply(p, x, t, y, pab_cache=c2, **kw)
    assert float(np.abs(np.asarray(out2 - out)).max()) < 0.2


def test_pab_mlp_skip_exact():
    """The MLP cache path (nn.cond real-skip) must reproduce the dense output
    exactly when the cached step saw identical inputs (fp32 cache)."""
    from videosys_tpu.core.pab import PABConfig, PABStepPlan, mlp_config_blocks

    cfg = STDiT3Config(depth=2, hidden_size=32, num_heads=2,
                       caption_channels=16, model_max_length=8)
    mlp_cfg = {500: {"block": [0], "skip_count": 1}}
    pab = PABConfig(mlp_broadcast=True,
                    mlp_spatial_broadcast_config=mlp_cfg,
                    mlp_temporal_broadcast_config=mlp_cfg)
    assert mlp_config_blocks(pab) == (0,)

    x, t, y, kv_mask, fps = _inputs()
    kw = dict(kv_mask=kv_mask, fps=fps, height=256.0, width=256.0)

    dense = STDiT3(cfg)
    params = dense.init(jax.random.key(0), x, t, y, **kw)
    out_dense = dense.apply(params, x, t, y, **kw)

    save_plan = PABStepPlan(mlp_spatial_save=(True, False),
                            mlp_temporal_save=(True, False),
                            mlp_spatial_use=(False, False),
                            mlp_temporal_use=(False, False))
    use_plan = PABStepPlan(mlp_spatial_save=(False, False),
                           mlp_temporal_save=(False, False),
                           mlp_spatial_use=(True, False),
                           mlp_temporal_use=(False, False))
    m_save = STDiT3(cfg, plan=save_plan, pab_config=pab)
    cache = m_save.init_cache(2, 3, 16)
    assert cache["spatial"]["mlp"].shape[0] == 1  # slim: one configured block
    out_save, cache1 = m_save.apply(params, x, t, y, pab_cache=cache, **kw)
    np.testing.assert_allclose(np.asarray(out_save), np.asarray(out_dense),
                               atol=1e-5)
    assert np.abs(np.asarray(cache1["spatial"]["mlp"])).sum() > 0

    m_use = STDiT3(cfg, plan=use_plan, pab_config=pab)
    out_use, _ = m_use.apply(params, x, t, y, pab_cache=cache1, **kw)
    np.testing.assert_allclose(np.asarray(out_use), np.asarray(out_dense),
                               atol=1e-5)


def test_pab_mlp_range_roundtrip():
    """Range-mode full-depth MLP broadcast (PABConfig.mlp_range extension):
    a save step must equal dense, and a read step with identical inputs must
    reproduce the dense output exactly (fp32 cache)."""
    pab = PABConfig(mlp_broadcast=True, mlp_threshold=(100, 900), mlp_range=2)
    assert pab.mlp_range_mode
    x, t, y, kv_mask, fps = _inputs()
    kw = dict(kv_mask=kv_mask, fps=fps, height=256.0, width=256.0)

    dense = STDiT3(TINY)
    params = dense.init(jax.random.key(0), x, t, y, **kw)
    out_dense = dense.apply(params, x, t, y, **kw)

    m_save = STDiT3(TINY, plan=PABStepPlan(save_mlp=True), pab_config=pab)
    cache = m_save.init_cache(B=2, T=3, S=16)
    # full-depth slot in both branches (not the slim dict rows)
    assert cache["spatial"]["mlp"].shape[0] == TINY.depth
    assert cache["temporal"]["mlp"].shape[0] == TINY.depth
    out_save, cache1 = m_save.apply(params, x, t, y, pab_cache=cache, **kw)
    np.testing.assert_allclose(np.asarray(out_save), np.asarray(out_dense),
                               atol=1e-5)
    assert np.abs(np.asarray(cache1["spatial"]["mlp"])).sum() > 0

    m_read = STDiT3(TINY, plan=PABStepPlan(mlp=True), pab_config=pab)
    out_read, _ = m_read.apply(params, x, t, y, pab_cache=cache1, **kw)
    np.testing.assert_allclose(np.asarray(out_read), np.asarray(out_dense),
                               atol=1e-5)


def test_pab_pair_delta_roundtrip():
    """Pair-delta residual broadcast (PABConfig.pair_broadcast extension):
    a save step equals dense; a read step with identical inputs reproduces
    the dense output exactly (each pair's residual re-applies)."""
    pab = PABConfig(pair_broadcast=True, pair_threshold=(100, 900),
                    pair_range=2)
    x, t, y, kv_mask, fps = _inputs()
    kw = dict(kv_mask=kv_mask, fps=fps, height=256.0, width=256.0)

    dense = STDiT3(TINY)
    params = dense.init(jax.random.key(0), x, t, y, **kw)
    out_dense = dense.apply(params, x, t, y, **kw)

    m_save = STDiT3(TINY, plan=PABStepPlan(save_pair=True), pab_config=pab)
    cache = m_save.init_cache(B=2, T=3, S=16)
    assert set(cache) == {"pair"}
    assert cache["pair"]["delta"].shape[0] == TINY.depth
    out_save, cache1 = m_save.apply(params, x, t, y, pab_cache=cache, **kw)
    np.testing.assert_allclose(np.asarray(out_save), np.asarray(out_dense),
                               atol=1e-5)
    assert np.abs(np.asarray(cache1["pair"]["delta"])).sum() > 0

    m_read = STDiT3(TINY, plan=PABStepPlan(pair=True), pab_config=pab)
    out_read, _ = m_read.apply(params, x, t, y, pab_cache=cache1, **kw)
    np.testing.assert_allclose(np.asarray(out_read), np.asarray(out_dense),
                               atol=1e-5)


def test_build_plans_range_mlp_and_pair():
    from videosys_tpu.core.pab import build_plans

    ts = np.linspace(1000, 33, 30)
    # range-mode MLP: flags follow the counter ladder; dict flags empty
    pab = PABConfig(mlp_broadcast=True, mlp_threshold=(200, 800), mlp_range=3)
    plans = build_plans(pab, ts, depth=2)
    want = [(i % 3 != 0) and (200 < ts[i] < 800) for i in range(30)]
    assert [p.mlp for p in plans] == want
    assert all(not p.any_mlp for p in plans)
    # save = compute step right before a read step
    for i in range(29):
        assert plans[i].save_mlp == ((not want[i]) and want[i + 1])

    # pair mode subsumes everything else
    pab2 = PABConfig(pair_broadcast=True, pair_threshold=(200, 800),
                     pair_range=2, spatial_broadcast=True,
                     spatial_threshold=(200, 800), spatial_range=2)
    plans2 = build_plans(pab2, ts, depth=2)
    want2 = [(i % 2 != 0) and (200 < ts[i] < 800) for i in range(30)]
    assert [p.pair for p in plans2] == want2
    assert all(not (p.spatial or p.temporal or p.cross or p.mlp)
               for p in plans2)
