"""Checkpoint-conversion tests: tree/shape fidelity against model.init and
numerical parity of the layout conventions vs torch ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videosys_tpu.utils import convert as C


def _rand_sd(shapes, seed=0):
    rng = np.random.default_rng(seed)
    return {k: rng.standard_normal(v).astype(np.float32)
            for k, v in shapes.items()}


def _stdit3_sd(depth=2, hidden=32, heads=2, cap=16, in_ch=4, L=8):
    head_dim = hidden // heads
    shapes = {
        "x_embedder.proj.weight": (hidden, in_ch, 1, 2, 2),
        "x_embedder.proj.bias": (hidden,),
        "t_embedder.mlp.0.weight": (hidden, 256),
        "t_embedder.mlp.0.bias": (hidden,),
        "t_embedder.mlp.2.weight": (hidden, hidden),
        "t_embedder.mlp.2.bias": (hidden,),
        "fps_embedder.mlp.0.weight": (hidden, 256),
        "fps_embedder.mlp.0.bias": (hidden,),
        "fps_embedder.mlp.2.weight": (hidden, hidden),
        "fps_embedder.mlp.2.bias": (hidden,),
        "t_block.1.weight": (6 * hidden, hidden),
        "t_block.1.bias": (6 * hidden,),
        "y_embedder.y_embedding": (L, cap),
        "y_embedder.y_proj.fc1.weight": (hidden, cap),
        "y_embedder.y_proj.fc1.bias": (hidden,),
        "y_embedder.y_proj.fc2.weight": (hidden, hidden),
        "y_embedder.y_proj.fc2.bias": (hidden,),
        "final_layer.linear.weight": (1 * 2 * 2 * 2 * in_ch, hidden),
        "final_layer.linear.bias": (1 * 2 * 2 * 2 * in_ch,),
        "final_layer.scale_shift_table": (2, hidden),
    }
    for i in range(depth):
        for b in (f"spatial_blocks.{i}", f"temporal_blocks.{i}"):
            shapes.update({
                f"{b}.scale_shift_table": (6, hidden),
                f"{b}.attn.qkv.weight": (3 * hidden, hidden),
                f"{b}.attn.qkv.bias": (3 * hidden,),
                f"{b}.attn.proj.weight": (hidden, hidden),
                f"{b}.attn.proj.bias": (hidden,),
                f"{b}.attn.q_norm.weight": (head_dim,),
                f"{b}.attn.k_norm.weight": (head_dim,),
                f"{b}.cross_attn.q_linear.weight": (hidden, hidden),
                f"{b}.cross_attn.q_linear.bias": (hidden,),
                f"{b}.cross_attn.kv_linear.weight": (2 * hidden, hidden),
                f"{b}.cross_attn.kv_linear.bias": (2 * hidden,),
                f"{b}.cross_attn.proj.weight": (hidden, hidden),
                f"{b}.cross_attn.proj.bias": (hidden,),
                f"{b}.mlp.fc1.weight": (4 * hidden, hidden),
                f"{b}.mlp.fc1.bias": (4 * hidden,),
                f"{b}.mlp.fc2.weight": (hidden, 4 * hidden),
                f"{b}.mlp.fc2.bias": (hidden,),
            })
    return _rand_sd(shapes)


def test_convert_stdit3_tree_matches_init():
    from videosys_tpu.models.transformers.stdit3 import STDiT3, STDiT3Config

    cfg = STDiT3Config(depth=2, hidden_size=32, num_heads=2,
                       caption_channels=16, model_max_length=8)
    model = STDiT3(cfg)
    ref = model.init(jax.random.key(0), jnp.zeros((1, 4, 2, 8, 8)),
                     jnp.zeros((1,)), jnp.zeros((1, 4, 16)),
                     fps=jnp.full((1,), 24.0), height=64.0, width=64.0)
    conv = C.convert_stdit3(_stdit3_sd(), depth=2)
    ref_shapes = jax.tree.map(lambda x: x.shape, ref)
    conv_shapes = jax.tree.map(lambda x: tuple(x.shape), conv)
    assert ref_shapes == conv_shapes  # identical structure AND shapes
    # converted params run through the model
    out = model.apply(conv, jnp.ones((1, 4, 2, 8, 8)), jnp.full((1,), 500.0),
                      jnp.ones((1, 4, 16)), fps=jnp.full((1,), 24.0),
                      height=64.0, width=64.0)
    assert np.isfinite(np.asarray(out)).all()


def test_linear_conversion_matches_torch():
    torch = pytest.importorskip("torch")
    import flax.linen as fnn

    lin = torch.nn.Linear(6, 10)
    sd = {f"l.{k}": v for k, v in lin.state_dict().items()}
    params = {"params": C.linear(sd, "l")}
    x = np.random.default_rng(0).standard_normal((3, 6)).astype(np.float32)
    y_t = lin(torch.from_numpy(x)).detach().numpy()
    y_f = fnn.Dense(10).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_f), y_t, atol=1e-5)


def test_conv3d_conversion_matches_torch():
    torch = pytest.importorskip("torch")
    import flax.linen as fnn

    cv = torch.nn.Conv3d(4, 8, kernel_size=(1, 2, 2), stride=(1, 2, 2))
    sd = {f"c.{k}": v for k, v in cv.state_dict().items()}
    params = {"params": C.conv(sd, "c")}
    x = np.random.default_rng(0).standard_normal((1, 4, 2, 8, 8)).astype(np.float32)
    y_t = cv(torch.from_numpy(x)).detach().numpy()  # [1, 8, 2, 4, 4]
    x_f = jnp.transpose(jnp.asarray(x), (0, 2, 3, 4, 1))  # NDHWC
    y_f = fnn.Conv(8, (1, 2, 2), strides=(1, 2, 2), padding="VALID").apply(
        params, x_f)
    np.testing.assert_allclose(np.asarray(jnp.transpose(y_f, (0, 4, 1, 2, 3))),
                               y_t, atol=1e-4)


def test_qkv_row_order_matches_reference_reshape():
    """The fused qkv rows must split as (q, k, v) exactly like the reference's
    reshape (attentions.py:54: .reshape(B, N, 3, H, D))."""
    torch = pytest.importorskip("torch")
    hidden, heads = 8, 2
    lin = torch.nn.Linear(hidden, 3 * hidden)
    x = torch.randn(1, 5, hidden)
    qkv_t = lin(x).reshape(1, 5, 3, heads, hidden // heads)
    q_t = qkv_t[:, :, 0]

    sd = {f"qkv.{k}": v for k, v in lin.state_dict().items()}
    w = C.linear(sd, "qkv")
    xf = jnp.asarray(x.numpy())
    qkv_f = (xf @ w["kernel"] + w["bias"]).reshape(1, 5, 3, heads, hidden // heads)
    np.testing.assert_allclose(np.asarray(qkv_f[:, :, 0]), q_t.detach().numpy(),
                               atol=1e-5)


def test_safetensors_checkpoint_roundtrip(tmp_path):
    """Write a reference-layout safetensors checkpoint; the pipeline loader
    must convert it and produce the exact same params as convert_stdit3."""
    from safetensors.numpy import save_file

    from videosys_tpu.utils.checkpoint import load_stdit3_torch_checkpoint

    sd = _stdit3_sd()
    save_file(sd, str(tmp_path / "model.safetensors"))
    loaded = load_stdit3_torch_checkpoint(str(tmp_path), depth=2)
    direct = C.convert_stdit3(sd, depth=2)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(loaded),
            jax.tree_util.tree_leaves_with_path(direct)):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(a, b)


def _ln_shapes(prefix, dim):
    return {f"{prefix}.weight": (dim,), f"{prefix}.bias": (dim,)}


def test_convert_cogvideox_tree_matches_init():
    from videosys_tpu.models.transformers.cogvideox import (
        CogVideoXConfig,
        CogVideoXTransformer3D,
    )

    depth, hidden, te, text = 2, 32, 512, 16
    shapes = {
        "patch_embed.proj.weight": (hidden, 4, 2, 2),
        "patch_embed.proj.bias": (hidden,),
        "patch_embed.text_proj.weight": (hidden, text),
        "patch_embed.text_proj.bias": (hidden,),
        "time_embedding.linear_1.weight": (te, hidden),
        "time_embedding.linear_1.bias": (te,),
        "time_embedding.linear_2.weight": (te, te),
        "time_embedding.linear_2.bias": (te,),
        "norm_out.linear.weight": (2 * hidden, te),
        "norm_out.linear.bias": (2 * hidden,),
        "proj_out.weight": (2 * 2 * 4, hidden),
        "proj_out.bias": (2 * 2 * 4,),
        **_ln_shapes("norm_final", hidden),
        **_ln_shapes("norm_out.norm", hidden),
    }
    for i in range(depth):
        b = f"transformer_blocks.{i}"
        shapes.update({
            f"{b}.norm1.linear.weight": (6 * hidden, te),
            f"{b}.norm1.linear.bias": (6 * hidden,),
            f"{b}.norm2.linear.weight": (6 * hidden, te),
            f"{b}.norm2.linear.bias": (6 * hidden,),
            f"{b}.ff.net.0.proj.weight": (4 * hidden, hidden),
            f"{b}.ff.net.0.proj.bias": (4 * hidden,),
            f"{b}.ff.net.2.weight": (hidden, 4 * hidden),
            f"{b}.ff.net.2.bias": (hidden,),
            **_ln_shapes(f"{b}.norm1.norm", hidden),
            **_ln_shapes(f"{b}.norm2.norm", hidden),
            **_ln_shapes(f"{b}.attn1.norm_q", 16),
            **_ln_shapes(f"{b}.attn1.norm_k", 16),
        })
        for lp in ("to_q", "to_k", "to_v"):
            shapes[f"{b}.attn1.{lp}.weight"] = (hidden, hidden)
            shapes[f"{b}.attn1.{lp}.bias"] = (hidden,)
        shapes[f"{b}.attn1.to_out.0.weight"] = (hidden, hidden)
        shapes[f"{b}.attn1.to_out.0.bias"] = (hidden,)
    sd = _rand_sd(shapes)

    cfg = CogVideoXConfig(num_layers=depth, num_heads=2, head_dim=16,
                          in_channels=4, out_channels=4, text_embed_dim=text,
                          max_text_seq_length=8, sample_height=8,
                          sample_width=8, sample_frames=9)
    model = CogVideoXTransformer3D(cfg)
    ref = model.init(jax.random.key(0), jnp.zeros((1, 3, 4, 16, 16)),
                     jnp.zeros((1, 8, text)), jnp.zeros((1,)))
    converted = C.convert_cogvideox(sd, depth=depth)
    assert jax.tree.map(lambda x: x.shape, ref) == \
        jax.tree.map(lambda x: tuple(x.shape), converted)
    out = model.apply(converted, jnp.ones((1, 3, 4, 16, 16)),
                      jnp.ones((1, 8, text)), jnp.full((1,), 500.0))
    assert np.isfinite(np.asarray(out)).all()


def test_convert_latte_tree_matches_init():
    from videosys_tpu.models.transformers.latte import LatteConfig, LatteT2V

    depth, hidden, cap = 2, 32, 16
    shapes = {
        "pos_embed.proj.weight": (hidden, 4, 2, 2),
        "pos_embed.proj.bias": (hidden,),
        "adaln_single.emb.timestep_embedder.linear_1.weight": (hidden, 256),
        "adaln_single.emb.timestep_embedder.linear_1.bias": (hidden,),
        "adaln_single.emb.timestep_embedder.linear_2.weight": (hidden, hidden),
        "adaln_single.emb.timestep_embedder.linear_2.bias": (hidden,),
        "adaln_single.linear.weight": (6 * hidden, hidden),
        "adaln_single.linear.bias": (6 * hidden,),
        "caption_projection.linear_1.weight": (hidden, cap),
        "caption_projection.linear_1.bias": (hidden,),
        "caption_projection.linear_2.weight": (hidden, hidden),
        "caption_projection.linear_2.bias": (hidden,),
        "scale_shift_table": (2, hidden),
        "proj_out.weight": (2 * 2 * 8, hidden),
        "proj_out.bias": (2 * 2 * 8,),
    }
    for kind, n in (("transformer_blocks", depth),
                    ("temporal_transformer_blocks", depth)):
        for i in range(n):
            b = f"{kind}.{i}"
            shapes[f"{b}.scale_shift_table"] = (6, hidden)
            for lp in ("to_q", "to_k", "to_v"):
                shapes[f"{b}.attn1.{lp}.weight"] = (hidden, hidden)
                shapes[f"{b}.attn1.{lp}.bias"] = (hidden,)
            shapes[f"{b}.attn1.to_out.0.weight"] = (hidden, hidden)
            shapes[f"{b}.attn1.to_out.0.bias"] = (hidden,)
            # gelu-approximate FF (the Latte-1 checkpoint layout): 4x inner
            shapes[f"{b}.ff.net.0.proj.weight"] = (4 * hidden, hidden)
            shapes[f"{b}.ff.net.0.proj.bias"] = (4 * hidden,)
            shapes[f"{b}.ff.net.2.weight"] = (hidden, 4 * hidden)
            shapes[f"{b}.ff.net.2.bias"] = (hidden,)
            if kind == "transformer_blocks":
                for lp in ("to_q", "to_k", "to_v"):
                    shapes[f"{b}.attn2.{lp}.weight"] = (hidden, hidden)
                    shapes[f"{b}.attn2.{lp}.bias"] = (hidden,)
                shapes[f"{b}.attn2.to_out.0.weight"] = (hidden, hidden)
                shapes[f"{b}.attn2.to_out.0.bias"] = (hidden,)
    sd = _rand_sd(shapes)

    cfg = LatteConfig(num_layers=depth, num_heads=2, head_dim=16,
                      caption_channels=cap, sample_size=16, video_length=2)
    model = LatteT2V(cfg)
    ref = model.init(jax.random.key(0), jnp.zeros((1, 4, 2, 16, 16)),
                     jnp.zeros((1,)), jnp.zeros((1, 8, cap)))
    converted = C.convert_latte(sd, depth=depth)
    assert jax.tree.map(lambda x: x.shape, ref) == \
        jax.tree.map(lambda x: tuple(x.shape), converted)
    out = model.apply(converted, jnp.ones((1, 4, 2, 16, 16)),
                      jnp.full((1,), 500.0), jnp.ones((1, 8, cap)))
    assert np.isfinite(np.asarray(out)).all()


def test_convert_osp_v120_tree_matches_init():
    from videosys_tpu.models.transformers.open_sora_plan_v120 import (
        OpenSoraPlanV120Config,
        OpenSoraPlanV120Transformer,
    )

    depth, hidden, cap = 2, 48, 16
    shapes = {
        "pos_embed.proj.weight": (hidden, 4, 2, 2),
        "pos_embed.proj.bias": (hidden,),
        "adaln_single.emb.timestep_embedder.linear_1.weight": (hidden, 256),
        "adaln_single.emb.timestep_embedder.linear_1.bias": (hidden,),
        "adaln_single.emb.timestep_embedder.linear_2.weight": (hidden, hidden),
        "adaln_single.emb.timestep_embedder.linear_2.bias": (hidden,),
        "adaln_single.linear.weight": (6 * hidden, hidden),
        "adaln_single.linear.bias": (6 * hidden,),
        "caption_projection.linear_1.weight": (hidden, cap),
        "caption_projection.linear_1.bias": (hidden,),
        "caption_projection.linear_2.weight": (hidden, hidden),
        "caption_projection.linear_2.bias": (hidden,),
        "scale_shift_table": (2, hidden),
        "proj_out.weight": (2 * 2 * 4, hidden),
        "proj_out.bias": (2 * 2 * 4,),
    }
    for i in range(depth):
        b = f"transformer_blocks.{i}"
        shapes[f"{b}.scale_shift_table"] = (6, hidden)
        for attn in ("attn1", "attn2"):
            for lp in ("to_q", "to_k", "to_v"):
                shapes[f"{b}.{attn}.{lp}.weight"] = (hidden, hidden)
                shapes[f"{b}.{attn}.{lp}.bias"] = (hidden,)
            shapes[f"{b}.{attn}.to_out.0.weight"] = (hidden, hidden)
            shapes[f"{b}.{attn}.to_out.0.bias"] = (hidden,)
        shapes[f"{b}.ff.net.0.proj.weight"] = (4 * hidden, hidden)
        shapes[f"{b}.ff.net.0.proj.bias"] = (4 * hidden,)
        shapes[f"{b}.ff.net.2.weight"] = (hidden, 4 * hidden)
        shapes[f"{b}.ff.net.2.bias"] = (hidden,)
    sd = _rand_sd(shapes)

    cfg = OpenSoraPlanV120Config(num_layers=depth, num_heads=2, head_dim=24,
                                 caption_channels=cap, sample_size=(8, 8),
                                 sample_size_t=2)
    model = OpenSoraPlanV120Transformer(cfg)
    ref = model.init(jax.random.key(0), jnp.zeros((1, 4, 2, 16, 16)),
                     jnp.zeros((1, 6, cap)), jnp.zeros((1,)))
    converted = C.convert_osp_v120(sd, depth=depth)
    assert jax.tree.map(lambda x: x.shape, ref) == \
        jax.tree.map(lambda x: tuple(x.shape), converted)
    out = model.apply(converted, jnp.ones((1, 4, 2, 16, 16)),
                      jnp.ones((1, 6, cap)), jnp.full((1,), 500.0))
    assert np.isfinite(np.asarray(out)).all()


def test_convert_vchitect_tree_matches_init():
    from videosys_tpu.models.transformers.vchitect import (
        VchitectModelConfig,
        VchitectXLTransformer,
    )

    depth, hidden, joint, pooled = 3, 32, 32, 24
    shapes = {
        "pos_embed.proj.weight": (hidden, 16, 2, 2),
        "pos_embed.proj.bias": (hidden,),
        "time_text_embed.timestep_embedder.linear_1.weight": (hidden, 256),
        "time_text_embed.timestep_embedder.linear_1.bias": (hidden,),
        "time_text_embed.timestep_embedder.linear_2.weight": (hidden, hidden),
        "time_text_embed.timestep_embedder.linear_2.bias": (hidden,),
        "time_text_embed.text_embedder.linear_1.weight": (hidden, pooled),
        "time_text_embed.text_embedder.linear_1.bias": (hidden,),
        "time_text_embed.text_embedder.linear_2.weight": (hidden, hidden),
        "time_text_embed.text_embedder.linear_2.bias": (hidden,),
        "context_embedder.weight": (hidden, joint),
        "context_embedder.bias": (hidden,),
        "norm_out.linear.weight": (2 * hidden, hidden),
        "norm_out.linear.bias": (2 * hidden,),
        "proj_out.weight": (2 * 2 * 16, hidden),
        "proj_out.bias": (2 * 2 * 16,),
    }
    for i in range(depth):
        last = i == depth - 1
        b = f"transformer_blocks.{i}"
        shapes[f"{b}.norm1.linear.weight"] = (6 * hidden, hidden)
        shapes[f"{b}.norm1.linear.bias"] = (6 * hidden,)
        nc = (2 * hidden) if last else (6 * hidden)
        shapes[f"{b}.norm1_context.linear.weight"] = (nc, hidden)
        shapes[f"{b}.norm1_context.linear.bias"] = (nc,)
        for n in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
                  "add_v_proj", "to_q_temp", "to_k_temp", "to_v_temp",
                  "to_q_cross", "to_out_temporal", "to_out_context",
                  "to_add_out_temporal"):
            shapes[f"{b}.attn.{n}.weight"] = (hidden, hidden)
            shapes[f"{b}.attn.{n}.bias"] = (hidden,)
        shapes[f"{b}.attn.to_out.0.weight"] = (hidden, hidden)
        shapes[f"{b}.attn.to_out.0.bias"] = (hidden,)
        if not last:
            shapes[f"{b}.attn.to_add_out.weight"] = (hidden, hidden)
            shapes[f"{b}.attn.to_add_out.bias"] = (hidden,)
            shapes[f"{b}.ff_context.net.0.proj.weight"] = (4 * hidden, hidden)
            shapes[f"{b}.ff_context.net.0.proj.bias"] = (4 * hidden,)
            shapes[f"{b}.ff_context.net.2.weight"] = (hidden, 4 * hidden)
            shapes[f"{b}.ff_context.net.2.bias"] = (hidden,)
        shapes[f"{b}.ff.net.0.proj.weight"] = (4 * hidden, hidden)
        shapes[f"{b}.ff.net.0.proj.bias"] = (4 * hidden,)
        shapes[f"{b}.ff.net.2.weight"] = (hidden, 4 * hidden)
        shapes[f"{b}.ff.net.2.bias"] = (hidden,)
    sd = _rand_sd(shapes)

    cfg = VchitectModelConfig(num_layers=depth, num_heads=2, head_dim=16,
                              joint_attention_dim=joint,
                              pooled_projection_dim=pooled, sample_size=8,
                              pos_embed_max_size=12)
    model = VchitectXLTransformer(cfg)
    ref = model.init(jax.random.key(0), jnp.zeros((1, 2, 16, 16, 16)),
                     jnp.zeros((1, 6, joint)), jnp.zeros((1, pooled)),
                     jnp.zeros((1,)))
    converted = C.convert_vchitect(sd, depth=depth)
    assert jax.tree.map(lambda x: x.shape, ref) == \
        jax.tree.map(lambda x: tuple(x.shape), converted)
    out = model.apply(converted, jnp.ones((1, 2, 16, 16, 16)),
                      jnp.ones((1, 6, joint)), jnp.ones((1, pooled)),
                      jnp.full((1,), 500.0))
    assert np.isfinite(np.asarray(out)).all()
