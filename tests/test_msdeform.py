"""MSDeformAttn parity tests (mirrors the reference's kernel test strategy,
models/ops/test.py: slow-oracle parity + gradient checks).

The independent oracle here is torch.nn.functional.grid_sample (CPU), the
same primitive the reference's debug path uses — our JAX implementation must
match it bitwise-ish in fp64/fp32.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmentation_factory_tpu.ops.msdeform import ms_deform_attn

SHAPES = ((6, 4), (3, 2))
B, M, D, Q, P = 2, 2, 4, 5, 3
L = len(SHAPES)
S = sum(h * w for h, w in SHAPES)


def torch_reference(value, locs, weights):
    import torch
    import torch.nn.functional as F

    value_t = torch.from_numpy(value)  # (B, S, M, D)
    locs_t = torch.from_numpy(locs)  # (B, Q, M, L, P, 2)
    w_t = torch.from_numpy(weights)  # (B, Q, M, L, P)
    out = torch.zeros(B, Q, M, D, dtype=value_t.dtype)
    off = 0
    for l, (h, w) in enumerate(SHAPES):
        v = value_t[:, off : off + h * w].permute(0, 2, 3, 1).reshape(B * M, D, h, w)
        grid = locs_t[:, :, :, l] * 2 - 1  # (B, Q, M, P, 2)
        grid = grid.permute(0, 2, 1, 3, 4).reshape(B * M, Q, P, 2)
        s = F.grid_sample(
            v, grid, mode="bilinear", padding_mode="zeros", align_corners=False
        )  # (B*M, D, Q, P)
        s = s.reshape(B, M, D, Q, P).permute(0, 3, 1, 4, 2)  # (B, Q, M, P, D)
        out += (s * w_t[:, :, :, l].unsqueeze(-1)).sum(3)
        off += h * w
    return out.reshape(B, Q, M * D).numpy()


def make_inputs(seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    value = rng.normal(size=(B, S, M, D)).astype(dtype)
    # includes out-of-bounds samples (locations slightly outside [0,1])
    locs = rng.uniform(-0.1, 1.1, size=(B, Q, M, L, P, 2)).astype(dtype)
    w = rng.uniform(size=(B, Q, M, L, P)).astype(dtype)
    w /= w.sum(axis=(3, 4), keepdims=True)
    return value, locs, w


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_oracle_matches_torch_grid_sample(dtype):
    value, locs, w = make_inputs(dtype=dtype)
    want = torch_reference(value, locs, w)
    if dtype == np.float64:
        with jax.enable_x64(True):
            got = np.asarray(
                ms_deform_attn(
                    jnp.asarray(value), SHAPES, jnp.asarray(locs), jnp.asarray(w)
                )
            )
        tol = 1e-12
    else:
        got = np.asarray(
            ms_deform_attn(jnp.asarray(value), SHAPES, jnp.asarray(locs), jnp.asarray(w))
        )
        tol = 1e-5
    np.testing.assert_allclose(got, want.astype(got.dtype), rtol=tol, atol=tol)


def test_jit_and_grads_finite():
    value, locs, w = make_inputs(dtype=np.float32)

    def loss(v, l, a):
        return jnp.sum(ms_deform_attn(v, SHAPES, l, a) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(
        jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w)
    )
    for gi in g:
        assert np.isfinite(np.asarray(gi)).all()


def test_grad_matches_numerical():
    with jax.enable_x64(True):
        value, locs, w = make_inputs(dtype=np.float64)
        v = jnp.asarray(value)
        l = jnp.asarray(locs)
        a = jnp.asarray(w)

        def loss_v(v):
            return jnp.sum(ms_deform_attn(v, SHAPES, l, a) ** 2)

        g = jax.grad(loss_v)(v)
        eps = 1e-6
        idx = (0, 3, 1, 2)
        num = (loss_v(v.at[idx].add(eps)) - loss_v(v.at[idx].add(-eps))) / (2 * eps)
        np.testing.assert_allclose(float(g[idx]), float(num), rtol=1e-6)

        def loss_l(l):
            return jnp.sum(ms_deform_attn(v, SHAPES, l, a) ** 2)

        gl = jax.grad(loss_l)(l)
        idx = (1, 2, 0, 1, 1, 0)
        num = (loss_l(l.at[idx].add(eps)) - loss_l(l.at[idx].add(-eps))) / (2 * eps)
        np.testing.assert_allclose(float(gl[idx]), float(num), rtol=1e-5, atol=1e-10)


class TestFastPath:
    """ms_deform_attn_fast (2x2-patch gather production path) vs the oracle."""

    def test_parity_including_oob(self):
        from segmentation_factory_tpu.ops.msdeform import ms_deform_attn_fast

        value, locs, w = make_inputs(dtype=np.float32)
        # add far-out-of-range points to exercise the clamp+mask path
        locs[0, 0] = -3.0
        locs[1, -1] = 4.0
        want = np.asarray(ms_deform_attn(value, SHAPES, locs, w))
        got = np.asarray(ms_deform_attn_fast(value, SHAPES, locs, w))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_grads_match_oracle(self):
        from segmentation_factory_tpu.ops.msdeform import ms_deform_attn_fast

        value, locs, w = make_inputs(seed=3, dtype=np.float32)

        def loss(fn, v, l, wt):
            return jnp.sum(fn(v, SHAPES, l, wt) ** 2)

        g_fast = jax.grad(lambda v, l, wt: loss(ms_deform_attn_fast, v, l, wt),
                          argnums=(0, 1, 2))(value, locs, w)
        g_ref = jax.grad(lambda v, l, wt: loss(ms_deform_attn, v, l, wt),
                         argnums=(0, 1, 2))(value, locs, w)
        for gf, gr in zip(g_fast, g_ref):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                       rtol=1e-4, atol=1e-5)


class TestScatterFreeVJP:
    """The production backward (sort+prefix-sum+searchsorted, no scatter)
    vs XLA autodiff of the same forward. The autodiff backward emits a
    scatter-add — the prime suspect in the r4 TPU worker crash (VERDICT r4
    item 3); the custom VJP is the TPU-shaped equivalent of the reference's
    atomic col2im (ms_deform_im2col_cuda.cuh:302-921)."""

    def _grads(self, fn, value, locs, w):
        def loss(v, l, wt):
            return jnp.sum(fn(v, SHAPES, l, wt) ** 2)

        return jax.grad(loss, argnums=(0, 1, 2))(value, locs, w)

    def test_matches_autodiff_backward(self, monkeypatch):
        from segmentation_factory_tpu.ops import msdeform

        value, locs, w = make_inputs(seed=11, dtype=np.float32)
        locs[0, 1] = -2.5  # far OOB: all corners dropped
        locs[1, 2] = 1.05  # near OOB: pad-ring corners dropped
        g_sf = self._grads(msdeform.ms_deform_attn_fast, value, locs, w)
        monkeypatch.setenv("SFT_MSDEFORM_SF_VJP", "0")
        g_ad = self._grads(msdeform.ms_deform_attn_fast, value, locs, w)
        for a, b in zip(g_sf, g_ad):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_jit_grad(self):
        from segmentation_factory_tpu.ops.msdeform import ms_deform_attn_fast

        value, locs, w = make_inputs(seed=12, dtype=np.float32)

        @jax.jit
        def gradfn(v, l, wt):
            return jax.grad(
                lambda v, l, wt: jnp.sum(
                    ms_deform_attn_fast(v, SHAPES, l, wt) ** 2
                ),
                argnums=(0, 1, 2),
            )(v, l, wt)

        gs = gradfn(value, locs, w)
        for g in gs:
            assert np.isfinite(np.asarray(g)).all()

    def test_bf16_value_grad_dtype(self):
        from segmentation_factory_tpu.ops.msdeform import ms_deform_attn_fast

        value, locs, w = make_inputs(seed=13, dtype=np.float32)
        vb = jnp.asarray(value, jnp.bfloat16)

        def loss(v, l, wt):
            return jnp.sum(ms_deform_attn_fast(v, SHAPES, l, wt) ** 2)

        gv, gl, gw = jax.grad(loss, argnums=(0, 1, 2))(
            vb, jnp.asarray(locs), jnp.asarray(w))
        assert gv.dtype == jnp.bfloat16
        assert gl.dtype == jnp.float32 and gw.dtype == jnp.float32
        assert np.isfinite(np.asarray(gv, np.float32)).all()
