"""Trainable fused SA: custom-VJP gradient parity and bf16 behavior.

The fused ``sa_mlp_pool`` kernel pairs with a recompute backward
(``_sa_jnp_math``'s VJP), so training can ride the same Pallas path as
serving. These tests pin the contract: f32 forward/gradients match the
jnp path to float tolerance, bf16 forward stays within bf16 tolerance of
f32, and a real CrowdNet train step produces the same loss trajectory
with use_pallas on or off.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_ai_recommendation_software_tpu.ops.pallas import kernels as pk


def _random_case(m=64, k=16, cin=3, dims=(8, 8, 16), seed=0):
    rng = np.random.RandomState(seed)
    grouped = jnp.asarray(rng.randn(m, k, cin), jnp.float32)
    valid = jnp.asarray(rng.rand(m, k) > 0.3)
    # guarantee a few fully-empty neighborhoods (the masked-pool edge)
    valid = valid.at[:2].set(False)
    ws = []
    a = cin
    for b in dims:
        ws.append((jnp.asarray(rng.randn(a, b) * 0.5, jnp.float32),
                   jnp.asarray(rng.randn(b) * 0.1, jnp.float32)))
        a = b
    return grouped, valid, ws


def _flat(ws):
    return [t for pair in ws for t in pair]


def test_forward_matches_reference_f32():
    grouped, valid, ws = _random_case()
    out = pk.sa_mlp_pool_trainable(grouped, valid, ws)
    ref = pk.sa_mlp_pool_reference(grouped, valid, ws)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_grad_matches_jnp_path_f32():
    grouped, valid, ws = _random_case()

    def loss_fused(g, *flat):
        pairs = [(flat[0], flat[1]), (flat[2], flat[3]),
                 (flat[4], flat[5])]
        out = pk.sa_mlp_pool_trainable(g, valid, pairs)
        return jnp.sum(out ** 2)

    def loss_jnp(g, *flat):
        out = pk._sa_jnp_math(jnp.float32, g, valid, *flat)
        return jnp.sum(out ** 2)

    args = (grouped, *_flat(ws))
    gf = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_jnp, argnums=tuple(range(7)))(*args)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_grad_under_jit_and_vmap():
    grouped, valid, ws = _random_case(m=32, k=8)

    @jax.jit
    def loss(g):
        return jnp.sum(pk.sa_mlp_pool_trainable(g, valid, ws))

    dg = jax.grad(loss)(grouped)
    assert np.isfinite(np.asarray(dg)).all()
    # invalid slots were zeroed inputs; their grads must be zero where a
    # whole neighborhood is empty (rows 0-1 by construction)
    assert np.abs(np.asarray(dg[:2])).max() == 0.0


def test_bf16_forward_parity_with_f32():
    grouped, valid, ws = _random_case(m=128, k=16, seed=3)
    out16 = pk.sa_mlp_pool_trainable(grouped, valid, ws,
                                     compute_dtype=jnp.bfloat16)
    out32 = pk.sa_mlp_pool_trainable(grouped, valid, ws,
                                     compute_dtype=jnp.float32)
    a, b = np.asarray(out16), np.asarray(out32)
    # bf16 has ~3 decimal digits; activations here are O(1)
    scale = max(1.0, np.abs(b).max())
    assert np.abs(a - b).max() / scale < 0.03
    # and the bf16 grad is finite + points the same way as the f32 grad
    def loss(g, dt):
        return jnp.sum(pk.sa_mlp_pool_trainable(g, valid, ws,
                                                compute_dtype=dt) ** 2)
    g16 = np.asarray(jax.grad(lambda g: loss(g, jnp.bfloat16))(grouped))
    g32 = np.asarray(jax.grad(lambda g: loss(g, jnp.float32))(grouped))
    assert np.isfinite(g16).all()
    denom = np.linalg.norm(g16) * np.linalg.norm(g32)
    cos = float((g16 * g32).sum() / denom) if denom > 0 else 1.0
    assert cos > 0.97  # measured 0.982 (bf16 fwd+bwd vs f32)


def test_train_step_loss_curve_matches_jnp_path():
    """Three CrowdNet train steps, fused vs jnp path: identical data +
    init, losses must track to float tolerance (VERDICT r2 item 9)."""
    from lidar_ai_recommendation_software_tpu.models.train import (
        TrainConfig, fit)

    base = dict(batch_size=2, n_points=512, grid=16, sa1_samples=128,
                sa2_samples=32, seed=7)
    _, m_jnp = fit(TrainConfig(**base), steps=3, log_every=0)
    _, m_fused = fit(TrainConfig(use_pallas=True, **base), steps=3,
                     log_every=0)
    assert m_fused["loss"] == pytest.approx(m_jnp["loss"], rel=2e-3)
    assert m_fused["density_mae"] == pytest.approx(
        m_jnp["density_mae"], rel=2e-3)
