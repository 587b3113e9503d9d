"""Flash-attention kernel correctness vs the jnp reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videosys_tpu.ops.attention import reference_attention
from videosys_tpu.ops.flash_attention import flash_attention


def _mk(shape, key, dtype=jnp.float32):
    return jax.random.normal(jax.random.key(key), shape, dtype=dtype)


@pytest.mark.parametrize(
    "B,H,Nq,Nk,D",
    [
        (1, 2, 256, 256, 64),     # aligned
        (2, 4, 300, 300, 72),     # STDiT3 head_dim=72, unaligned seq
        (1, 2, 128, 520, 64),     # cross-attn style, Nk != Nq
        (1, 1, 640, 96, 32),      # tiny kv
    ],
)
def test_flash_matches_reference(B, H, Nq, Nk, D):
    q = _mk((B, H, Nq, D), 0)
    k = _mk((B, H, Nk, D), 1)
    v = _mk((B, H, Nk, D), 2)
    want = reference_attention(q, k, v)
    got = flash_attention(q, k, v, interpret=True, block_q=128, block_kv=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_flash_with_kv_mask():
    B, H, Nq, Nk, D = 2, 2, 128, 300, 64
    q, k, v = _mk((B, H, Nq, D), 0), _mk((B, H, Nk, D), 1), _mk((B, H, Nk, D), 2)
    lens = jnp.array([117, 205])
    kv_mask = jnp.arange(Nk)[None, :] < lens[:, None]
    want = reference_attention(q, k, v, kv_mask=kv_mask)
    got = flash_attention(q, k, v, kv_mask=kv_mask, interpret=True,
                          block_q=128, block_kv=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_flash_bf16():
    B, H, N, D = 1, 2, 256, 72
    q, k, v = (_mk((B, H, N, D), i, jnp.bfloat16) for i in range(3))
    want = reference_attention(q, k, v).astype(jnp.float32)
    got = flash_attention(q, k, v, interpret=True).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2, rtol=2e-2)


def test_flash_grad_flows():
    # The kernel has no custom VJP yet; JAX differentiates through pallas in
    # interpret mode — validate gradients against the reference path.
    B, H, N, D = 1, 1, 128, 32
    q, k, v = _mk((B, H, N, D), 0), _mk((B, H, N, D), 1), _mk((B, H, N, D), 2)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, interpret=True,
                                       block_q=128, block_kv=128) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(reference_attention(q, k, v) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=5e-4, rtol=5e-4)


@pytest.mark.parametrize("B,H,Nq,Nk,D", [
    (1, 2, 128, 128, 32),     # aligned
    (2, 2, 150, 150, 24),     # unaligned Nq/Nk/D -> padding paths
    (1, 4, 200, 40, 72),      # short KV (temporal-attention-like)
])
def test_flash_bwd_kernel_grad_parity(B, H, Nq, Nk, D):
    """The Pallas single-pass backward (dq/dk/dv in one kernel, softmax
    stats recomputed from the whole KV row) must match the fp32 reference
    VJP to <=1e-4 (VERDICT r2 Next #3)."""
    q, k, v = _mk((B, H, Nq, D), 3), _mk((B, H, Nk, D), 4), _mk((B, H, Nk, D), 5)
    ct = _mk((B, H, Nq, D), 6)

    def f_flash(q, k, v):
        return jnp.vdot(flash_attention(q, k, v, interpret=True), ct)

    def f_ref(q, k, v):
        return jnp.vdot(reference_attention(q, k, v), ct)

    g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=1e-4, rtol=1e-4)


def test_flash_bwd_kernel_grad_parity_masked():
    """Ragged text mask: gradients must be exactly zero w.r.t. masked k/v
    positions and match the reference elsewhere."""
    B, H, Nq, Nk, D = 2, 2, 130, 96, 32
    q, k, v = _mk((B, H, Nq, D), 7), _mk((B, H, Nk, D), 8), _mk((B, H, Nk, D), 9)
    lens = np.array([50, 96])
    kv_mask = jnp.asarray(np.arange(Nk)[None, :] < lens[:, None])
    ct = _mk((B, H, Nq, D), 10)

    def f_flash(q, k, v):
        return jnp.vdot(flash_attention(q, k, v, kv_mask=kv_mask,
                                        interpret=True), ct)

    def f_ref(q, k, v):
        return jnp.vdot(reference_attention(q, k, v, kv_mask=kv_mask), ct)

    g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=1e-4, rtol=1e-4)
    # masked kv positions get zero gradient
    mask_np = np.asarray(kv_mask)
    for g in (g_flash[1], g_flash[2]):
        assert np.all(np.asarray(g)[~mask_np.astype(bool)[:, None, :, None]
                      .repeat(H, 1).repeat(D, 3)] == 0.0)


def test_self_attention_kv_mask_matches_slicing():
    """SelfAttention with trailing-pad kv_mask == unpadded SelfAttention on
    the real tokens (the mesh-divisibility padding contract, stdit3)."""
    import flax.linen as nn_  # noqa: F401
    from videosys_tpu.models.modules.blocks import SelfAttention

    B, N, C, H = 2, 24, 32, 4
    pad = 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    mask = jnp.asarray(np.arange(N + pad)[None, :].repeat(B, 0) < N)

    attn = SelfAttention(dim=C, num_heads=H)
    params = attn.init(jax.random.key(0), x)
    want = attn.apply(params, x)
    got = attn.apply(params, xp, kv_mask=mask)[:, :N]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_flash_bwd_blocked_grad_parity():
    """KV rows beyond the single-pass VMEM limit (> 4096 tokens) take the
    KV-blocked backward (two kernels, forward-saved lse + the di identity).
    Grad parity vs the reference VJP, including padding tails in both axes."""
    B, H, Nq, Nk, D = 1, 2, 600, 4300, 32   # Nk > SINGLE_PASS_MAX_KV
    q, k, v = _mk((B, H, Nq, D), 11), _mk((B, H, Nk, D), 12), _mk((B, H, Nk, D), 13)
    ct = _mk((B, H, Nq, D), 14)

    def f_flash(q, k, v):
        return jnp.vdot(flash_attention(q, k, v, interpret=True), ct)

    def f_ref(q, k, v):
        return jnp.vdot(reference_attention(q, k, v), ct)

    g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=1e-4, rtol=1e-4)


def test_flash_bwd_blocked_grad_parity_masked():
    """Blocked backward with a ragged KV mask: parity + exact zeros on
    masked positions."""
    B, H, Nq, Nk, D = 2, 1, 560, 4200, 24
    q, k, v = _mk((B, H, Nq, D), 15), _mk((B, H, Nk, D), 16), _mk((B, H, Nk, D), 17)
    lens = np.array([3000, 4200])
    kv_mask = jnp.asarray(np.arange(Nk)[None, :] < lens[:, None])
    ct = _mk((B, H, Nq, D), 18)

    def f_flash(q, k, v):
        return jnp.vdot(flash_attention(q, k, v, kv_mask=kv_mask,
                                        interpret=True), ct)

    def f_ref(q, k, v):
        return jnp.vdot(reference_attention(q, k, v, kv_mask=kv_mask), ct)

    g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=1e-4, rtol=1e-4)
    mask_np = np.asarray(kv_mask)
    for g in (g_flash[1], g_flash[2]):
        assert np.all(np.asarray(g)[~mask_np.astype(bool)[:, None, :, None]
                      .repeat(H, 1).repeat(D, 3)] == 0.0)
