"""Pallas kernel parity tests (interpret mode on CPU; mirrors the
reference's kernel test strategy, models/ops/test.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from segmentation_factory_tpu.ops.pallas_attention import (
    _forward,
    _reference,
    sra_attention,
)


def make_qkv(b=2, n=1024, m=64, h=2, d=32, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b * h, n, d)), dtype)
    k = jnp.asarray(rng.normal(size=(b * h, m, d)), dtype)
    v = jnp.asarray(rng.normal(size=(b * h, m, d)), dtype)
    return q, k, v


def test_fused_matches_reference_interpret():
    q, k, v = make_qkv()
    scale = 32**-0.5
    want = np.asarray(_reference(q, k, v, scale))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(_forward(q, k, v, scale, tile_q=256))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_handles_ragged_n():
    q, k, v = make_qkv(n=300)  # not a multiple of tile_q
    scale = 32**-0.5
    want = np.asarray(_reference(q, k, v, scale))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(_forward(q, k, v, scale, tile_q=256))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_wrapper_reference_path_multihead():
    # on CPU the wrapper takes the einsum path; checks the head plumbing
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, 64, 4, 16)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 16, 4, 16)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 16, 4, 16)), jnp.float32)
    out = sra_attention(q, k, v, 0.25, use_pallas=False)
    assert out.shape == (2, 64, 4, 16)
    want = jnp.einsum(
        "bnhd,bmhd->bhnm", q, k
    ) * 0.25
    want = jax.nn.softmax(want, axis=-1)
    want = jnp.einsum("bhnm,bmhd->bnhd", want, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_fused_grad_matches_reference_grad():
    q, k, v = make_qkv(n=256, m=32)
    scale = 32**-0.5

    def loss_ref(q, k, v):
        return jnp.sum(_reference(q, k, v, scale) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)

    from segmentation_factory_tpu.ops.pallas_attention import _sra_fused

    with pltpu.force_tpu_interpret_mode():
        def loss_fused(q, k, v):
            return jnp.sum(_sra_fused(q, k, v, scale, 256) ** 2)

        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_fused_grad_ragged_n():
    # padding path: padded rows must not pollute dk/dv accumulation
    q, k, v = make_qkv(n=300, m=32)
    scale = 32**-0.5

    def loss_ref(q, k, v):
        return jnp.sum(_reference(q, k, v, scale) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)

    from segmentation_factory_tpu.ops.pallas_attention import _sra_fused

    with pltpu.force_tpu_interpret_mode():
        def loss_fused(q, k, v):
            return jnp.sum(_sra_fused(q, k, v, scale, 256) ** 2)

        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="compiled-TPU parity needs a TPU backend (tests pin CPU; "
    "run tools/tpu_parity_check.py on hardware — artifact in TPU_PARITY.txt)",
)
def test_fused_compiled_tpu_parity():
    q, k, v = make_qkv()
    scale = 32**-0.5
    want = np.asarray(_reference(q, k, v, scale))
    got = np.asarray(jax.jit(lambda q, k, v: _forward(q, k, v, scale, 256))(q, k, v))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
