"""Inference pipeline + StableHLO export tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmentation_factory_tpu.export import export_model, load_exported, validate_export
from segmentation_factory_tpu.infer import (
    colorize,
    multi_scale_flip_inference,
    overlay,
    postprocess,
    preprocess,
    slide_inference,
)
from segmentation_factory_tpu.models import build_model


@pytest.fixture(scope="module")
def small_model():
    model = build_model("mit_b0", "segformerhead", num_classes=4, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng, "droppath": rng},
        jnp.zeros((1, 64, 64, 3), jnp.float32),
        train=False,
    )
    fwd = jax.jit(lambda x: model.apply(variables, x, train=False))
    return model, variables, fwd


def test_preprocess_shapes():
    img = np.zeros((100, 150, 3), np.uint8)
    batch, orig = preprocess(img, img_size=64)
    assert orig == (100, 150)
    assert batch.shape[1] % 32 == 0 and batch.shape[2] % 32 == 0
    assert min(batch.shape[1], batch.shape[2]) >= 64


def test_postprocess_and_colorize():
    logits = jnp.zeros((1, 8, 8, 3)).at[..., 1].set(5.0)
    seg = postprocess(logits, (16, 16))
    assert seg.shape == (16, 16) and (seg == 1).all()
    pal = np.asarray([[0, 0, 0], [255, 0, 0], [0, 255, 0]], np.uint8)
    rgb = colorize(seg, pal)
    assert (rgb == [255, 0, 0]).all()
    img = np.full((16, 16, 3), 100, np.uint8)
    ov = overlay(img, rgb, alpha=0.5)
    assert ov[0, 0, 0] == np.uint8(0.5 * 100 + 0.5 * 255)


def test_slide_inference_matches_whole_on_uniform(small_model):
    _, _, fwd = small_model
    # uniform image: every window sees identical stats -> slide == whole
    img = jnp.zeros((1, 96, 96, 3), jnp.float32)
    whole = fwd(img)
    slid = slide_inference(fwd, img, num_classes=4, crop=64, stride=32)
    assert slid.shape == (1, 96, 96, 4)
    # averaged overlapping windows of a shift-equivariant-ish model on a
    # constant image: centers agree closely
    np.testing.assert_allclose(
        np.asarray(slid)[0, 40:56, 40:56].argmax(-1),
        np.asarray(whole)[0, 40:56, 40:56].argmax(-1),
    )


def test_slide_inference_sharded_matches_serial(small_model):
    from segmentation_factory_tpu.infer import slide_inference_sharded
    from segmentation_factory_tpu.parallel import make_mesh

    _, _, fwd = small_model
    mesh = make_mesh((8, 1))
    img = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 96, 96, 3)), jnp.float32
    )
    serial = slide_inference(fwd, img, num_classes=4, crop=64, stride=32)
    sharded = slide_inference_sharded(fwd, img, 4, crop=64, mesh=mesh, stride=32)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(serial), rtol=1e-4, atol=1e-4
    )


def test_slide_jit_cache_is_bounded():
    import segmentation_factory_tpu.infer as inf

    inf._SLIDE_JIT_CACHE.clear()

    def fwd(img):
        return jnp.zeros((img.shape[0], img.shape[1], img.shape[2], 2))

    # more distinct (shape, crop) keys than the cap: stale compiled programs
    # (which keep their receivers/params alive) must be evicted, not hoarded
    for size in range(8, 8 + 2 * (inf._SLIDE_JIT_CACHE_MAX + 2), 2):
        slide_inference(fwd, jnp.zeros((1, size, size, 3)), 2, crop=4, stride=2)
    assert len(inf._SLIDE_JIT_CACHE) <= inf._SLIDE_JIT_CACHE_MAX
    inf._SLIDE_JIT_CACHE.clear()


def test_multi_scale_flip_inference(small_model):
    _, _, fwd = small_model
    img = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 64, 64, 3)), jnp.float32
    )
    out = multi_scale_flip_inference(fwd, img, 4, scales=(0.5, 1.0), flip=True)
    assert out.shape == (1, 64, 64, 4)
    s = np.asarray(out).sum(-1)
    np.testing.assert_allclose(s, 1.0, rtol=1e-4)  # averaged softmaxes


def test_export_roundtrip_and_parity(small_model, tmp_path):
    model, variables, _ = small_model
    path = str(tmp_path / "m.stablehlo")
    exported = export_model(model, variables, img_size=64, out_path=path)
    assert "stablehlo" in exported.mlir_module() or "func" in exported.mlir_module()
    ok, diff = validate_export(model, variables, path, img_size=64)
    assert ok, f"parity failed: {diff}"
    # dynamic batch: call with a different batch size
    loaded = load_exported(path)
    out = loaded.call(jnp.zeros((3, 64, 64, 3), jnp.float32))
    assert out.shape == (3, 64, 64, 4)


def test_visualize_helpers(tmp_path):
    from segmentation_factory_tpu.data import Synthetic
    from segmentation_factory_tpu.data.visualize import (
        colorize_mask,
        draw_class_names,
        make_grid,
        visualize_dataset_sample,
    )

    ds = Synthetic(num_classes=4, size=32, length=4)
    grid = visualize_dataset_sample(ds, [0, 1], out_path=str(tmp_path / "g.png"))
    assert grid.ndim == 3 and grid.shape[2] == 3
    assert (tmp_path / "g.png").exists()
    seg = np.zeros((32, 32), np.int32)
    seg[8:24, 8:24] = 1
    rgb = colorize_mask(seg, ds.PALETTE)
    named = draw_class_names(rgb, seg, ds.CLASSES, min_area=10)
    assert named.shape == rgb.shape


def test_savedmodel_export_parity(tmp_path):
    """jax2tf SavedModel round-trip reproduces the live logits (the bridge
    to actual .onnx via offline tf2onnx)."""
    import pytest

    tf = pytest.importorskip("tensorflow")
    del tf

    import jax
    import jax.numpy as jnp

    from segmentation_factory_tpu.export import (
        export_savedmodel,
        validate_savedmodel,
    )
    from segmentation_factory_tpu.models import build_model

    model = build_model("mit_b0", "segformerhead", num_classes=4,
                        dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    v = model.init({"params": rng, "dropout": rng, "droppath": rng},
                   jnp.zeros((1, 32, 32, 3), jnp.float32), train=False)
    out = str(tmp_path / "sm")
    export_savedmodel(model, v, 32, out)
    ok, diff = validate_savedmodel(model, v, out, 32, atol=1e-4)
    assert ok, f"SavedModel logits diverge: {diff}"


def test_savedmodel_onnx_signature_contract(tmp_path):
    """The SavedModel satisfies the exact signature contract tf2onnx's
    --saved-model path consumes (tf_loader.from_saved_model reads the
    `serving_default` signature): one float32 input with a symbolic batch
    dim, one float32 logits output with static spatial dims. This is the
    unconditional half of the ONNX deliverable; the toolchain-gated half is
    test_onnx_roundtrip below (ref onnx_export.py:96-113 dynamic_axes +
    export)."""
    tf = pytest.importorskip("tensorflow")

    from segmentation_factory_tpu.export import export_savedmodel

    model = build_model("mit_b0", "segformerhead", num_classes=4,
                        dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    v = model.init({"params": rng, "dropout": rng, "droppath": rng},
                   jnp.zeros((1, 32, 32, 3), jnp.float32), train=False)
    out = str(tmp_path / "sm")
    export_savedmodel(model, v, 32, out)

    loaded = tf.saved_model.load(out)
    sig = loaded.signatures["serving_default"]
    (inp,) = sig.structured_input_signature[1].values()
    assert inp.dtype == tf.float32
    assert inp.shape.as_list() == [None, 32, 32, 3]  # symbolic batch dim
    (out_spec,) = sig.structured_outputs.values()
    assert out_spec.dtype == tf.float32
    # full-resolution logits with the batch dim still symbolic
    assert out_spec.shape.as_list()[1:] == [32, 32, 4]
    assert out_spec.shape.as_list()[0] is None
    # and the signature is callable through the serving entry point
    got = sig(tf.zeros((2, 32, 32, 3)))
    (val,) = got.values()
    assert val.shape == (2, 32, 32, 4)


def test_onnx_unavailable_raises_with_recipe():
    """Without the toolchain, export_onnx fails loudly with the offline
    conversion recipe (the documented negative, PARITY.md 'ONNX
    container')."""
    pytest.importorskip("tensorflow")
    try:
        import tf2onnx  # noqa: F401
        pytest.skip("tf2onnx present; covered by test_onnx_roundtrip")
    except ImportError:
        pass

    from segmentation_factory_tpu.export import (
        OnnxToolchainUnavailable,
        export_onnx,
    )

    model = build_model("mit_b0", "segformerhead", num_classes=4,
                        dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    v = model.init({"params": rng, "dropout": rng, "droppath": rng},
                   jnp.zeros((1, 32, 32, 3), jnp.float32), train=False)
    with pytest.raises(OnnxToolchainUnavailable, match="tf2onnx.convert"):
        export_onnx(model, v, 32, "/tmp/never_written.onnx")


def test_onnx_roundtrip(tmp_path):
    """Full SavedModel -> .onnx -> onnxruntime logit parity (ref
    onnx_validate.py:99-156). Runs wherever the toolchain exists; this
    image lacks it (see PARITY.md), so it skips here."""
    pytest.importorskip("tensorflow")
    pytest.importorskip("tf2onnx")
    pytest.importorskip("onnxruntime")

    from segmentation_factory_tpu.export import export_onnx, validate_onnx

    model = build_model("mit_b0", "segformerhead", num_classes=4,
                        dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    v = model.init({"params": rng, "dropout": rng, "droppath": rng},
                   jnp.zeros((1, 32, 32, 3), jnp.float32), train=False)
    path = str(tmp_path / "m.onnx")
    export_onnx(model, v, 32, path)
    ok, diff = validate_onnx(model, v, path, 32)
    assert ok, f"onnxruntime logits diverge: {diff}"
