"""Pallas kernel correctness (interpret mode on CPU, compiled on TPU).

Layout is BSHD: [batch, seq, heads, head_dim]."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sprc_tpu.ops.pallas_attention import _xla_ref, flash_attention


@pytest.mark.parametrize("shape", [(2, 257, 2, 64), (1, 100, 3, 88), (2, 128, 1, 128)])
def test_flash_attention_matches_xla(shape, rng):
    B, S, H, D = shape
    q = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
    scale = D**-0.5
    want = _xla_ref(q, k, v, scale)
    got = flash_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_attention_cross_lengths(rng):
    # q and kv lengths differ (cross-attention shape)
    q = jnp.asarray(rng.randn(2, 32, 2, 64).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 257, 2, 64).astype(np.float32))
    v = jnp.asarray(rng.randn(2, 257, 2, 64).astype(np.float32))
    want = _xla_ref(q, k, v, 0.125)
    got = flash_attention(q, k, v, 0.125)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_attention_grad_matches_xla(rng):
    q = jnp.asarray(rng.randn(1, 64, 2, 32).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 64, 2, 32).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 64, 2, 32).astype(np.float32))

    def loss_pallas(q, k, v):
        return jnp.sum(flash_attention(q, k, v, 0.2) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_ref(q, k, v, 0.2) ** 2)

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


@pytest.mark.parametrize("shape", [(4, 10, 3, 16), (130, 300, 32, 256), (1, 1, 2, 8)])
def test_token_max_sim_pallas_matches_xla(shape, rng):
    from sprc_tpu.ops.pallas_sim import token_max_sim_pallas
    from sprc_tpu.ops.sim_kernels import _xla_token_max_sim

    B, N, Q, E = shape
    feats = jnp.asarray(rng.randn(B, E).astype(np.float32))
    targets = jnp.asarray(rng.randn(N, Q, E).astype(np.float32))
    want = _xla_token_max_sim(feats, targets)
    got = token_max_sim_pallas(feats, targets)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
