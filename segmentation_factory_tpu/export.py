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


def export_savedmodel(
    model,
    variables,
    img_size: int,
    out_dir: str,
    dynamic_batch: bool = True,
    batch: int = 1,
):
    """TF SavedModel export via jax2tf — a second deployment artifact for
    TF-serving stacks, and the bridge to actual .onnx (offline
    ``python -m tf2onnx.convert --saved-model ...``), completing the
    reference's ONNX pipeline (onnx_export.py) for consumers that need the
    ONNX container rather than StableHLO."""
    import tensorflow as tf
    from jax.experimental import jax2tf

    def forward(images):
        return model.apply(variables, images, train=False)

    poly = f"(b, {img_size}, {img_size}, 3)" if dynamic_batch else None
    tf_fn = tf.function(
        jax2tf.convert(forward, polymorphic_shapes=[poly] if poly else None),
        autograph=False,
        input_signature=[
            tf.TensorSpec(
                [None if dynamic_batch else batch, img_size, img_size, 3],
                tf.float32,
            )
        ],
    )
    module = tf.Module()
    module.serve = tf_fn
    tf.saved_model.save(
        module, out_dir,
        signatures={"serving_default": tf_fn.get_concrete_function()},
    )
    return out_dir


class OnnxToolchainUnavailable(RuntimeError):
    """Raised when the .onnx container step cannot run in this environment.

    The reference's pipeline emits an actual .onnx file
    (onnx_export.py:105-113) and validates it with onnxruntime
    (onnx_validate.py:99-156). On this TPU image neither `onnx`,
    `onnxruntime` nor `tf2onnx` is installed (and installs are
    disallowed), so the supported flow is: export_savedmodel() here, then
    offline `python -m tf2onnx.convert --saved-model <dir> --output m.onnx`
    on any machine with the toolchain. export_onnx() below runs that exact
    conversion whenever tf2onnx IS importable, and the gated test
    tests/test_infer_export.py::test_onnx_roundtrip validates the full
    SavedModel -> .onnx -> onnxruntime logit parity in such environments.
    See PARITY.md "ONNX container" for the documented negative.
    """


def export_onnx(
    model,
    variables,
    img_size: int,
    out_path: str,
    dynamic_batch: bool = True,
    batch: int = 1,
    opset: int = 17,
):
    """SavedModel -> .onnx via tf2onnx (ref onnx_export.py:105-113).

    Completes the reference's ONNX pipeline end-to-end when the toolchain
    is present; raises :class:`OnnxToolchainUnavailable` (with the offline
    recipe) when it is not. The SavedModel signature contract that tf2onnx
    consumes (a `serving_default` with one float32 [None,H,W,3] input) is
    tested unconditionally in test_savedmodel_onnx_signature_contract.
    """
    try:
        from tf2onnx import convert as tf2onnx_convert  # noqa: F401
    except ImportError as e:
        raise OnnxToolchainUnavailable(
            "tf2onnx/onnx are not installed in this environment; export a "
            "SavedModel with export_savedmodel() and convert offline with "
            "`python -m tf2onnx.convert --saved-model <dir> --output "
            f"{out_path}` (opset>={opset})."
        ) from e

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        sm_dir = os.path.join(td, "sm")
        export_savedmodel(model, variables, img_size, sm_dir,
                          dynamic_batch=dynamic_batch, batch=batch)
        from tf2onnx import tf_loader
        graph_def, inputs, outputs = tf_loader.from_saved_model(
            sm_dir, None, None, signatures=["serving_default"])
        import tf2onnx
        model_proto, _ = tf2onnx.convert.from_graph_def(
            graph_def, input_names=inputs, output_names=outputs,
            opset=opset, output_path=out_path)
    return model_proto


def validate_onnx(
    model, variables, onnx_path: str, img_size: int, batch: int = 2,
    atol: float = 5e-2,
) -> Tuple[bool, float]:
    """onnxruntime logit parity vs the live jax model (ref
    onnx_validate.py:99-156's assert_almost_equal, tolerance widened for
    bf16-vs-ORT-fp32 accumulation order)."""
    try:
        import onnxruntime as ort
    except ImportError as e:
        raise OnnxToolchainUnavailable(
            "onnxruntime is not installed; validate offline."
        ) from e

    x = np.random.default_rng(0).normal(
        size=(batch, img_size, img_size, 3)).astype(np.float32)
    live = np.asarray(model.apply(variables, jnp.asarray(x), train=False),
                      np.float32)
    sess = ort.InferenceSession(onnx_path, providers=["CPUExecutionProvider"])
    (in_name,) = [i.name for i in sess.get_inputs()]
    (got,) = sess.run(None, {in_name: x})
    diff = float(np.max(np.abs(live - np.asarray(got, np.float32))))
    return bool(diff <= atol), diff


def validate_savedmodel(
    model, variables, out_dir: str, img_size: int, batch: int = 2,
    atol: float = 5e-2,
) -> Tuple[bool, float]:
    """Logit parity of the reloaded SavedModel vs the live jax model."""
    import tensorflow as tf

    x = np.random.default_rng(0).normal(
        size=(batch, img_size, img_size, 3)).astype(np.float32)
    live = np.asarray(model.apply(variables, jnp.asarray(x), train=False),
                      np.float32)
    loaded = tf.saved_model.load(out_dir)
    got = np.asarray(loaded.serve(tf.constant(x)), np.float32)
    diff = float(np.max(np.abs(live - got)))
    return bool(diff <= atol), diff


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
