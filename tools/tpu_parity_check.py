"""Compiled-TPU parity check for the Pallas SRA kernels (fwd + bwd).

The pytest suite pins JAX to CPU (8 virtual devices), so Pallas kernels are
only interpret-checked there. This script runs the REAL compiled kernels on
the TPU backend against the XLA einsum reference and writes the error table
to stdout (captured in TPU_PARITY.txt as the round's hardware artifact).
"""

import os
import sys

# repo root on sys.path (PREPEND — replacing PYTHONPATH breaks the axon
# plugin registration, see CLAUDE.md)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from segmentation_factory_tpu.ops.pallas_attention import (
    _forward,
    _reference,
    _sra_fused,
)


def main():
    assert jax.default_backend() != "cpu", "needs a TPU backend"
    print(f"backend: {jax.default_backend()}  device: {jax.devices()[0].device_kind}")
    rng = np.random.default_rng(0)
    for dtype, tol in [(jnp.float32, 2e-4), (jnp.bfloat16, 2e-2)]:
        for n, m, d in [(1024, 64, 32), (4096, 256, 64), (300, 32, 32)]:
            q = jnp.asarray(rng.normal(size=(4, n, d)), dtype)
            k = jnp.asarray(rng.normal(size=(4, m, d)), dtype)
            v = jnp.asarray(rng.normal(size=(4, m, d)), dtype)
            scale = d**-0.5
            want = np.asarray(_reference(q, k, v, scale), np.float32)
            got = np.asarray(
                jax.jit(lambda q, k, v: _forward(q, k, v, scale, 256))(q, k, v),
                np.float32,
            )
            fwd_err = np.abs(got - want).max()

            def loss_f(q, k, v):
                return jnp.sum(_sra_fused(q, k, v, scale, 256).astype(jnp.float32) ** 2)

            def loss_r(q, k, v):
                return jnp.sum(_reference(q, k, v, scale).astype(jnp.float32) ** 2)

            gf = jax.jit(jax.grad(loss_f, argnums=(0, 1, 2)))(q, k, v)
            gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2)))(q, k, v)
            # ground truth: the XLA reference grads computed on CPU in real
            # f32. On TPU, f32 matmuls round through MXU bf16 passes in BOTH
            # implementations; the kernel is correct iff its error vs CPU is
            # the same magnitude as the XLA-on-TPU error vs CPU.
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                qc, kc, vc = (jnp.asarray(np.asarray(t), jnp.float32)
                              for t in (q, k, v))
                gt = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2)))(qc, kc, vc)

            def rel(a, b):
                a = np.asarray(a, np.float32)
                b = np.asarray(b, np.float32)
                return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-9))

            err_fused = max(rel(a, t) for a, t in zip(gf, gt))
            err_xla = max(rel(a, t) for a, t in zip(gr, gt))
            # not more than 4x the rounding error XLA itself accrues on TPU
            status = (
                "OK" if fwd_err < tol * 10 and err_fused < max(4 * err_xla, tol)
                else "FAIL"
            )
            print(
                f"{str(dtype.__name__ if hasattr(dtype, '__name__') else dtype):>9}"
                f" n={n:>5} m={m:>4} d={d:>3}  fwd_max_err={fwd_err:.3e}"
                f"  bwd_vs_cpu: fused={err_fused:.3e} xla={err_xla:.3e}  {status}"
            )


if __name__ == "__main__":
    main()
