"""StableHLO model export — the TPU-native replacement for the reference's
3-stage ONNX pipeline (onnx_export.py / onnx_optimise.py / onnx_validate.py).

- :func:`export_model` — serialize a jitted forward to a portable StableHLO
  artifact (replaces torch.onnx._export, ref onnx_export.py:105-108; dynamic
  batch via a symbolic batch dimension mirrors the dynamic_axes config
  :96-99). "Optimisation" passes are unnecessary: XLA re-optimizes StableHLO
  at load time, which is what onnxoptimizer's fuse-bn/eliminate-nop passes
  approximate by hand (onnx_optimise.py:54-72).
- :func:`validate_export` — numerical parity of the deserialized artifact vs
  the live model (replaces the Caffe2 assert_almost_equal check,
  onnx_export.py:115-124, and onnx_validate.py's metric re-run).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export


def export_model(
    model,
    variables,
    img_size: int,
    out_path: str,
    dynamic_batch: bool = True,
    batch: int = 1,
):
    """Serialize the eval forward to ``out_path`` (.stablehlo bytes).

    Returns the Exported object (whose .mlir_module() is the StableHLO text).
    """

    def forward(images):
        return model.apply(variables, images, train=False)

    fn = jax.jit(forward)
    if dynamic_batch:
        (b,) = jax_export.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((b, img_size, img_size, 3), jnp.float32)
    else:
        spec = jax.ShapeDtypeStruct((batch, img_size, img_size, 3), jnp.float32)
    exported = jax_export.export(fn)(spec)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(exported.serialize())
    return exported


def load_exported(path: str):
    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())


def validate_export(
    model,
    variables,
    path: str,
    img_size: int,
    batch: int = 2,
    atol: float = 2e-3,
    rtol: float = 2e-3,
) -> Tuple[bool, float]:
    """Logit parity: deserialized artifact vs live model on random input.

    Returns (ok, max_abs_diff). Tolerances cover bf16 accumulation-order
    differences between the two compiles (the reference used decimal=5 on a
    fp32 CUDA model, onnx_export.py:123).
    """
    exported = load_exported(path)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, img_size, img_size, 3)),
        jnp.float32,
    )
    live = np.asarray(model.apply(variables, x, train=False), np.float32)
    loaded = np.asarray(exported.call(x), np.float32)
    diff = float(np.max(np.abs(live - loaded)))
    ok = bool(np.allclose(live, loaded, atol=atol, rtol=rtol))
    return ok, diff
