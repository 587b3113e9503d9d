"""Mesh/sharding unit tests on the fake 8-device CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from videosys_tpu.core.parallel import (
    MeshPool,
    ParallelConfig,
    build_mesh,
    shard_spatial,
    shard_temporal,
    use_mesh,
)


def test_device_count():
    assert jax.device_count() == 8


def test_build_mesh_shapes():
    mesh = build_mesh(ParallelConfig(dp_size=2, cp_size=2, sp_size=2))
    assert mesh.devices.shape == (2, 2, 2)
    assert mesh.axis_names == ("dp", "cp", "sp")


def test_from_world_size_cp_split():
    cfg = ParallelConfig.from_world_size(8, enable_cp=True)
    assert (cfg.dp_size, cfg.cp_size, cfg.sp_size) == (1, 2, 4)
    cfg = ParallelConfig.from_world_size(8, enable_cp=False)
    assert (cfg.dp_size, cfg.cp_size, cfg.sp_size) == (1, 1, 8)


def test_dsp_axis_flip_is_exact():
    """The DSP dynamic switch (spatial-shard <-> temporal-shard) must be a
    pure data-movement no-op numerically."""
    mesh = build_mesh(ParallelConfig(dp_size=1, cp_size=1, sp_size=8))
    x = jnp.arange(2 * 8 * 16 * 4, dtype=jnp.float32).reshape(2, 8, 16, 4)

    @jax.jit
    def flip_twice(x):
        x = shard_spatial(x)
        x = shard_temporal(x)   # all-to-all #1
        x = x * 1.0
        x = shard_spatial(x)    # all-to-all #2
        return x

    with use_mesh(mesh):
        y = flip_twice(x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_dsp_flip_emits_all_to_all():
    mesh = build_mesh(ParallelConfig(dp_size=1, cp_size=1, sp_size=8))
    x = jnp.zeros((2, 8, 16, 4), dtype=jnp.float32)

    def f(x):
        x = shard_spatial(x)
        return shard_temporal(x)

    with use_mesh(mesh):
        lowered = jax.jit(f).lower(x)
        txt = lowered.compile().as_text()
    assert "all-to-all" in txt, "DSP flip should compile to an all-to-all"


def test_uneven_sharding_is_handled():
    # S=10 not divisible by sp=8: GSPMD must pad transparently (replaces the
    # reference's PAD_DICT machinery, comm.py:268-304).
    mesh = build_mesh(ParallelConfig(dp_size=1, cp_size=1, sp_size=8))
    x = jnp.arange(1 * 3 * 10 * 4, dtype=jnp.float32).reshape(1, 3, 10, 4)

    @jax.jit
    def f(x):
        x = shard_spatial(x)
        x = shard_temporal(x)
        return shard_spatial(x) + 1.0

    with use_mesh(mesh):
        y = f(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) + 1.0)


def test_mesh_pool_power_of_two():
    pool = MeshPool()
    assert pool.sp_sizes == [1, 2, 4, 8]
    m = pool.mesh_for_sp(4)
    assert m.devices.shape == (2, 1, 4)
    with pytest.raises(KeyError):
        pool.mesh_for_sp(3)


@pytest.mark.slow
def test_dsp_pipeline_equivalence_sp_vs_single():
    """SURVEY §7 gate: DSP (num_gpus>1) generation must match single-device
    output for identical weights and seed (the all-to-all flips are pure
    reshardings). fp32 on the fake CPU mesh -> tight tolerance."""
    import sys
    import os

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples/inference/open_sora"))
    import sample as S

    from videosys_tpu import VideoSysEngine

    eng1 = VideoSysEngine(S._config(True), vae=S._tiny_vae())
    params = eng1.driver_worker.params
    out1 = eng1.generate("dsp equivalence", resolution="144p",
                         aspect_ratio="1:1", num_frames=17, seed=11)

    for kwargs in (dict(num_gpus=4), dict(num_gpus=4, enable_cp=True)):
        cfg = S._config(True, **kwargs)
        eng = VideoSysEngine(cfg, vae=S._tiny_vae(), params=params)
        out = eng.generate("dsp equivalence", resolution="144p",
                           aspect_ratio="1:1", num_frames=17, seed=11)
        diff = np.abs(out.video.astype(int) - out1.video.astype(int))
        assert diff.max() <= 1, (kwargs, diff.max())  # uint8 rounding only


def test_set_distributed_state_env_parsing(monkeypatch):
    """Env bootstrap parity with the reference set_distributed_state
    (parallel_mgr.py:120-148): torchrun-style RANK/WORLD_SIZE and the
    distributed-profile single-node rewrite."""
    from videosys_tpu.core.parallel import set_distributed_state

    for var in ("RANK", "WORLD_SIZE", "NODE_RANK", "NNODES", "MASTER_ADDR",
                "OMPI_COMM_WORLD_RANK", "OMPI_COMM_WORLD_SIZE"):
        monkeypatch.delenv(var, raising=False)

    # bare environment -> -1/-1 like the reference
    assert set_distributed_state() == (-1, -1, 0, 1)

    monkeypatch.setenv("OMPI_COMM_WORLD_RANK", "3")
    monkeypatch.setenv("OMPI_COMM_WORLD_SIZE", "16")
    monkeypatch.setenv("NNODES", "2")
    assert set_distributed_state() == (3, 16, 0, 2)

    # torchrun vars take precedence
    monkeypatch.setenv("RANK", "5")
    monkeypatch.setenv("WORLD_SIZE", "16")
    monkeypatch.setenv("NODE_RANK", "1")
    assert set_distributed_state() == (5, 16, 1, 2)

    # distributed-profile rewrite: rank folded into the local device count
    import jax
    n = len(jax.devices())
    rank, world, node_rank, node_size = set_distributed_state(
        distributed_profile=True)
    assert world == n and rank == 5 % n
    assert node_rank == 5 // n and node_size == 16 // n
    import os
    assert os.environ["MASTER_ADDR"] == "localhost"


def test_multichip_train_step_has_no_replication_fallback(capfd):
    """VERDICT r2 Next #2: the compiled dp2xsp4 ZeRO-1 train step must not
    hit GSPMD's "Involuntary full rematerialization" fallback (which
    replicates activations where DSP should move 1/sp of them). Root cause
    was the ZeRO-1 moment sharding propagating backward into activation
    cotangents; train_step pins grads replicated at the AD boundary
    (_pin_grads_replicated). The partitioner emits the fallback as a C++
    warning on stderr at compile time, so compile and scan fd-level stderr."""
    from videosys_tpu.core import parallel as par
    from videosys_tpu.models.transformers.stdit3 import STDiT3, STDiT3Config
    from videosys_tpu.schedulers.rflow import RFlowConfig, RFlowScheduler
    from videosys_tpu.training.train_step import (
        create_train_state,
        make_optimizer,
        make_train_step,
        zero1_shardings,
    )

    mesh = build_mesh(ParallelConfig(dp_size=2, cp_size=1, sp_size=4))
    config = STDiT3Config(depth=2, hidden_size=32, num_heads=2,
                          caption_channels=16, model_max_length=8)
    model = STDiT3(config, remat=True)
    scheduler = RFlowScheduler(RFlowConfig(use_timestep_transform=True))
    tx = make_optimizer(lr=1e-4, warmup_steps=10)

    B, T, H, W, L = 2, 4, 8, 8, 8
    batch = {
        "x": jnp.zeros((B, 4, T, H, W)),
        "y": jnp.zeros((B, L, config.caption_channels)),
        "kv_mask": jnp.ones((B, L), bool),
        "fps": jnp.full((B,), 24.0),
    }
    params = model.init(jax.random.key(0), batch["x"][:1], jnp.zeros((1,)),
                        batch["y"][:1], kv_mask=batch["kv_mask"][:1],
                        fps=batch["fps"][:1], height=64.0, width=64.0)
    state = create_train_state(params, tx)
    step = make_train_step(model, scheduler, tx, height=64.0, width=64.0,
                           num_frames=17)

    state_sh = zero1_shardings(mesh, state)
    batch_sh = {k: NamedSharding(mesh, P(("dp", "cp"))) for k in batch}
    rng_sh = NamedSharding(mesh, P())

    capfd.readouterr()  # drop anything buffered before the compile
    with use_mesh(mesh):
        compiled = jax.jit(
            step, in_shardings=(state_sh, rng_sh, batch_sh),
        ).lower(state,
                jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=rng_sh),
                batch).compile()
    err = capfd.readouterr().err
    assert "Involuntary full rematerialization" not in err, err
    # and the DSP flip still materializes as all-to-all collectives
    hlo = compiled.as_text()
    assert "all-to-all" in hlo or "all_to_all" in hlo


def test_dsp_collective_bytes_are_bounded():
    """docs/dsp.md's communication accounting as a regression gate: in the
    compiled sp=8 STDiT3 forward, activation traffic must ride the two
    per-spatial-attention all-to-alls; all-gather/collective-permute
    traffic (the replication fallback signature) must stay stat-sized —
    under 15% of the all-to-all volume."""
    from videosys_tpu.core import parallel as par
    from videosys_tpu.models.transformers.stdit3 import STDiT3, STDiT3Config
    from videosys_tpu.utils.hlo import collective_account

    mesh = build_mesh(ParallelConfig(dp_size=1, cp_size=1, sp_size=8))
    # Non-toy hidden/spatial sizes: the gate separates activation-sized
    # traffic from stat-sized ([B,C] modulation) traffic, which only
    # decouple once S*C dwarfs C (at toy shapes the stats dominate and the
    # ratio is meaningless).
    config = STDiT3Config(depth=2, hidden_size=128, num_heads=4,
                          caption_channels=16, model_max_length=8)
    model = STDiT3(config)

    B, T, H, W, L = 2, 8, 16, 16, 8
    x = jnp.zeros((B, 4, T, H, W))
    y = jnp.zeros((B, L, config.caption_channels))
    kv_mask = jnp.ones((B, L), bool)
    fps = jnp.full((B,), 24.0)
    params = model.init(jax.random.key(0), x[:1], jnp.zeros((1,)), y[:1],
                        kv_mask=kv_mask[:1], fps=fps[:1],
                        height=64.0, width=64.0)

    def fwd(params, x, t, y):
        return model.apply(params, x, t, y, kv_mask=kv_mask, fps=fps,
                           height=64.0, width=64.0)

    with use_mesh(mesh):
        hlo = jax.jit(fwd).lower(
            params, x, jnp.zeros((B,)), y).compile().as_text()

    acct = collective_account(hlo)
    # legitimate reshard traffic: all-to-all (the DSP flips) plus
    # collective-permute (GSPMD lowers parts of the S-shard <-> merged-row
    # reshard to 1:1 permutes — data moves once, nothing is replicated)
    moved = acct.bytes("all-to-all") + acct.bytes("collective-permute")
    assert acct.count("all-to-all") >= 2, acct.count_by_kind
    assert moved > 0
    # replication signature: all-gather. Only the stat-sized [B,C]
    # modulation broadcasts and the [B,T,S,1] temporal-norm stat may
    # gather; activation-sized gathers mean GSPMD fell back to replication.
    fallback = acct.bytes("all-gather")
    assert fallback <= 0.10 * moved, (
        f"replication-shaped traffic {fallback}B vs moved {moved}B:\n"
        + "\n".join(acct.lines_by_kind.get("all-gather", [])))


def test_zero1_grad_constraint_reduces_collectives(capfd):
    """The ZeRO-1 grad constraint (_shard_grads_zero1, toward the
    reference's `reduce_scatter: true`) must (a) compile with no
    involuntary-replication fallback and (b) not regress collective bytes
    or temp memory vs the round-3 replicated pin — the measured win is
    ~5% all-reduce bytes and ~6% temp at XL width (train_step.py
    docstring has the honest scan-boundary limit)."""
    import videosys_tpu.training.train_step as ts
    from videosys_tpu.core import parallel as par
    from videosys_tpu.models.transformers.stdit3 import STDiT3, STDiT3Config
    from videosys_tpu.schedulers.rflow import RFlowConfig, RFlowScheduler
    from videosys_tpu.utils.hlo import collective_account

    mesh = build_mesh(ParallelConfig(dp_size=2, cp_size=1, sp_size=4))
    config = STDiT3Config(depth=2, hidden_size=32, num_heads=2,
                          caption_channels=16, model_max_length=8)
    model = STDiT3(config, remat=True)
    scheduler = RFlowScheduler(RFlowConfig(use_timestep_transform=True))
    tx = ts.make_optimizer(lr=1e-4, warmup_steps=10)
    B, T, H, W, L = 2, 4, 8, 8, 8
    batch = {"x": jnp.zeros((B, 4, T, H, W)),
             "y": jnp.zeros((B, L, config.caption_channels)),
             "kv_mask": jnp.ones((B, L), bool),
             "fps": jnp.full((B,), 24.0)}
    params = model.init(jax.random.key(0), batch["x"][:1], jnp.zeros((1,)),
                        batch["y"][:1], kv_mask=batch["kv_mask"][:1],
                        fps=batch["fps"][:1], height=64.0, width=64.0)
    state = ts.create_train_state(params, tx)
    state_sh = ts.zero1_shardings(mesh, state)
    batch_sh = {k: NamedSharding(mesh, P(("dp", "cp"))) for k in batch}
    rng_sh = NamedSharding(mesh, P())

    def compile_step():
        step = ts.make_train_step(model, scheduler, tx, height=64.0,
                                  width=64.0, num_frames=17)
        with use_mesh(mesh):
            return jax.jit(step, in_shardings=(state_sh, rng_sh, batch_sh)
                           ).lower(state,
                                   jax.ShapeDtypeStruct((2,), jnp.uint32,
                                                        sharding=rng_sh),
                                   batch).compile()

    capfd.readouterr()
    new = compile_step()
    err = capfd.readouterr().err
    assert "Involuntary full rematerialization" not in err, err
    acct_new = collective_account(new.as_text())

    orig = ts._shard_grads_zero1
    try:
        ts._shard_grads_zero1 = ts._pin_grads_replicated
        old = compile_step()
    finally:
        ts._shard_grads_zero1 = orig
    acct_old = collective_account(old.as_text())

    ar_new, ar_old = acct_new.bytes("all-reduce"), acct_old.bytes("all-reduce")
    assert ar_new <= ar_old, (ar_new, ar_old)
    # measured at this config: ~28% fewer all-reduce bytes (the dW
    # all-reduces land pre-sliced into the moment layout)
    assert ar_new < ar_old * 0.9, (ar_new, ar_old)


def test_zero3_param_partitioning():
    """ZeRO-3 (params device-sharded, `make_train_step(zero3=True)` +
    `zero3_shardings`) must close the scan-body dW all-reduce gap that
    ZeRO-1's boundary constraint cannot reach (train_step.py honest-limit
    note; reference behavior: DeepSpeed `reduce_scatter: true`,
    examples/training/open_sora/train.py:231-239): with the stacked scan
    kernels sharded, the forward all-gathers each layer's weights and the
    AD transpose emits reduce-scatters of dW INSIDE the scan body.

    Measured outcome on this XLA (gated here; XL-width A/B in
    docs/performance.md): the conversion is a MEMORY win, not a traffic
    win — GSPMD partitions the sharded-weight matmuls without emitting a
    literal reduce-scatter op (it picks partial-matmul + all-reduce forms),
    so per-step collective bytes stay ~flat while the params' argument
    footprint drops by ~the sharded fraction. Gates: (a) numerics identical
    to ZeRO-1 on the same inputs; (b) collective traffic does not regress
    (all-reduce + all-gather bytes within 1.3x of ZeRO-1's); (c) params
    argument bytes shrink (the point of param partitioning)."""
    import videosys_tpu.training.train_step as ts
    from videosys_tpu.models.transformers.stdit3 import STDiT3, STDiT3Config
    from videosys_tpu.schedulers.rflow import RFlowConfig, RFlowScheduler
    from videosys_tpu.utils.hlo import collective_account

    mesh = build_mesh(ParallelConfig(dp_size=2, cp_size=1, sp_size=4))
    # hidden 128 so the matmul kernels clear ZERO3_MIN_SHARD_BYTES (64 KiB)
    # and actually shard; smaller leaves stay replicated by design
    config = STDiT3Config(depth=2, hidden_size=128, num_heads=4,
                          caption_channels=32, model_max_length=8)
    model = STDiT3(config, remat=True)
    scheduler = RFlowScheduler(RFlowConfig(use_timestep_transform=True))
    tx = ts.make_optimizer(lr=1e-4, warmup_steps=10)
    B, T, H, W, L = 2, 4, 8, 8, 8
    rng = jax.random.key(7)
    batch = {"x": jax.random.normal(rng, (B, 4, T, H, W)),
             "y": jax.random.normal(rng, (B, L, config.caption_channels)),
             "kv_mask": jnp.ones((B, L), bool),
             "fps": jnp.full((B,), 24.0)}
    params = model.init(jax.random.key(0), batch["x"][:1], jnp.zeros((1,)),
                        batch["y"][:1], kv_mask=batch["kv_mask"][:1],
                        fps=batch["fps"][:1], height=64.0, width=64.0)
    state = ts.create_train_state(params, tx)
    batch_sh = {k: NamedSharding(mesh, P(("dp", "cp"))) for k in batch}
    rng_sh = NamedSharding(mesh, P())
    step_rng = jax.device_put(jax.random.key(1), rng_sh)

    results = {}
    for mode in ("zero1", "zero3"):
        zero3 = mode == "zero3"
        state_sh = (ts.zero3_shardings if zero3
                    else ts.zero1_shardings)(mesh, state)
        step = ts.make_train_step(model, scheduler, tx, height=64.0,
                                  width=64.0, num_frames=17, zero3=zero3)
        with use_mesh(mesh):
            jitted = jax.jit(step, in_shardings=(state_sh, rng_sh, batch_sh))
            compiled = jitted.lower(
                state, jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=rng_sh),
                batch).compile()
            st = jax.device_put(state, state_sh)
            b = {k: jax.device_put(v, batch_sh[k]) for k, v in batch.items()}
            _, metrics = jitted(st, step_rng, b)
        results[mode] = (collective_account(compiled.as_text()),
                         compiled.memory_analysis(),
                         float(metrics["loss"]), float(metrics["grad_norm"]))

    acct1, mem1, loss1, gn1 = results["zero1"]
    acct3, mem3, loss3, gn3 = results["zero3"]
    # (a) same math — the all-gather/reduce-scatter pair is exact
    np.testing.assert_allclose(loss3, loss1, rtol=2e-5)
    np.testing.assert_allclose(gn3, gn1, rtol=2e-4)
    # (b) traffic stays bounded: param partitioning must not blow up the
    # reduction bytes (GSPMD may legally re-shape dW reductions; a >1.3x
    # regression means it fell off the partial-matmul path)
    moved1 = acct1.bytes("all-reduce") + acct1.bytes("all-gather")
    moved3 = acct3.bytes("all-reduce") + acct3.bytes("all-gather")
    assert moved3 <= 1.3 * moved1, (acct3.bytes_by_kind, acct1.bytes_by_kind)
    # (c) sharded params shrink the argument footprint
    assert mem3.argument_size_in_bytes < mem1.argument_size_in_bytes, (
        mem3.argument_size_in_bytes, mem1.argument_size_in_bytes)
