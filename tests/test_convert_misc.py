"""Cross-framework parity for the remaining small reference modules:
MaskRCNNHeads (the head_dict 'MaskRCNNSegmentationHead' target) and the
DETR sine position embedding (pure math, no weights)."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.fixture(scope="module")
def stubs():
    if "tests" not in sys.path:
        sys.path.insert(0, "tests")
    from _ref_stubs import load_ref

    return load_ref


def test_maskrcnn_fcn_torch_parity(stubs):
    import torch

    from segmentation_factory_tpu.convert import convert_maskrcnn_fcn
    from segmentation_factory_tpu.models.detection.roi_heads import MaskRCNNHeads

    from _ref_stubs import preload

    # maskrcnn imports models.heads.faster_rcnn; preload it so the real
    # models/heads/__init__ (-> every head -> timm) never executes
    preload("models.heads.faster_rcnn",
            "/root/reference/models/heads/faster_rcnn.py")
    ref = stubs("ref_maskrcnn", "/root/reference/models/heads/maskrcnn.py")
    torch.manual_seed(0)
    th = ref.MaskRCNNHeads(64, (256, 256, 256, 256), 1).eval()
    sd = {k: v.detach().numpy() for k, v in th.state_dict().items()}
    p = convert_maskrcnn_fcn(sd)

    x = np.random.default_rng(0).normal(size=(1, 14, 14, 64)).astype(np.float32)
    with torch.no_grad():
        want = th(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    jh = MaskRCNNHeads(256, dtype=jnp.float32)
    got = jh.apply({"params": p}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=1e-5, atol=1e-5
    )


def test_sine_position_encoding_torch_parity(stubs):
    import torch

    from segmentation_factory_tpu.models.modules.position_encoding import (
        sine_position_encoding,
    )

    ref = stubs("ref_pe", "/root/reference/models/modules/position_encoding.py")
    pe = ref.PositionEmbeddingSine(num_pos_feats=128, normalize=True)
    mask = torch.zeros(1, 12, 20, dtype=torch.bool)  # no padding
    with torch.no_grad():
        want = pe(mask).numpy()  # (1, 256, H, W)
    got = np.asarray(sine_position_encoding(12, 20, num_pos_feats=128))
    np.testing.assert_allclose(
        got.transpose(2, 0, 1), want[0], rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("pre_norm", [False, True])
def test_detr_encoder_layer_torch_parity(stubs, pre_norm):
    import torch

    from segmentation_factory_tpu.convert import convert_detr_encoder_layer
    from segmentation_factory_tpu.models.modules.transformer import (
        TransformerEncoderLayer,
    )

    ref = stubs("ref_detr", "/root/reference/models/modules/transformer.py")
    torch.manual_seed(0)
    tl = ref.TransformerEncoderLayer(64, 4, 128, dropout=0.0,
                                     normalize_before=pre_norm).eval()
    sd = {k: v.detach().numpy() for k, v in tl.state_dict().items()}
    p = convert_detr_encoder_layer(sd)

    rng = np.random.default_rng(0)
    src = rng.normal(size=(20, 2, 64)).astype(np.float32)  # (seq, batch, E)
    pos = rng.normal(size=(20, 2, 64)).astype(np.float32)
    with torch.no_grad():
        want = tl(torch.from_numpy(src), pos=torch.from_numpy(pos)).numpy()

    jl = TransformerEncoderLayer(64, 4, 128, pre_norm=pre_norm,
                                 dtype=jnp.float32)
    got = jl.apply({"params": p}, jnp.asarray(src.transpose(1, 0, 2)),
                   pos=jnp.asarray(pos.transpose(1, 0, 2)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(1, 0, 2), want, rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("pre_norm", [False, True])
def test_detr_decoder_layer_torch_parity(stubs, pre_norm):
    import torch

    from segmentation_factory_tpu.convert import convert_detr_decoder_layer
    from segmentation_factory_tpu.models.modules.transformer import (
        TransformerDecoderLayer,
    )

    ref = stubs("ref_detr", "/root/reference/models/modules/transformer.py")
    torch.manual_seed(1)
    tl = ref.TransformerDecoderLayer(64, 4, 128, dropout=0.0,
                                     normalize_before=pre_norm).eval()
    sd = {k: v.detach().numpy() for k, v in tl.state_dict().items()}
    p = convert_detr_decoder_layer(sd)

    rng = np.random.default_rng(1)
    tgt = rng.normal(size=(10, 2, 64)).astype(np.float32)
    mem = rng.normal(size=(20, 2, 64)).astype(np.float32)
    qpos = rng.normal(size=(10, 2, 64)).astype(np.float32)
    mpos = rng.normal(size=(20, 2, 64)).astype(np.float32)
    with torch.no_grad():
        want = tl(torch.from_numpy(tgt), torch.from_numpy(mem),
                  pos=torch.from_numpy(mpos),
                  query_pos=torch.from_numpy(qpos)).numpy()

    jl = TransformerDecoderLayer(64, 4, 128, pre_norm=pre_norm,
                                 dtype=jnp.float32)
    got = jl.apply(
        {"params": p},
        jnp.asarray(tgt.transpose(1, 0, 2)), jnp.asarray(mem.transpose(1, 0, 2)),
        query_pos=jnp.asarray(qpos.transpose(1, 0, 2)),
        pos=jnp.asarray(mpos.transpose(1, 0, 2)),
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(1, 0, 2), want, rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("sequential", [False, True])
def test_psa_torch_parity(stubs, sequential):
    import torch

    from segmentation_factory_tpu.convert import convert_psa
    from segmentation_factory_tpu.models.modules.psa import (
        PSAParallel,
        PSASequential,
    )

    ref = stubs("ref_psa", "/root/reference/models/modules/psa.py")
    torch.manual_seed(2)
    cls = ref.PSAS if sequential else ref.PSAP
    tm = cls(64, 64).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    p = convert_psa(sd, sequential=sequential)

    x = np.random.default_rng(2).normal(size=(2, 10, 14, 64)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2).copy())).numpy()
    jm = (PSASequential if sequential else PSAParallel)(dtype=jnp.float32)
    got = jm.apply({"params": p}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=2e-5, atol=2e-5
    )


def test_detection_heads_torch_parity(stubs):
    """RPNHead / TwoMLPHead / FastRCNNPredictor / MaskRCNNPredictor value
    parity vs the live reference modules (rpn_function.py:211-245,
    faster_rcnn.py:123-165, maskrcnn.py:230-240)."""
    import torch

    from _ref_stubs import preload
    from segmentation_factory_tpu.convert import (
        convert_fastrcnn_predictor,
        convert_maskrcnn_predictor,
        convert_rpn_head,
        convert_two_mlp_head,
    )
    from segmentation_factory_tpu.models.detection.roi_heads import (
        FastRCNNPredictor,
        MaskRCNNPredictor,
        TwoMLPHead,
    )
    from segmentation_factory_tpu.models.detection.rpn import RPNHead

    # rpn_function uses relative imports -> import through the real
    # models.modules package (its __init__ is stub-safe)
    import importlib

    from _ref_stubs import install_ref_stubs

    install_ref_stubs()
    rpnmod = importlib.import_module("models.modules.rpn_function")
    preload("models.heads.faster_rcnn",
            "/root/reference/models/heads/faster_rcnn.py")
    frcnn = __import__("sys").modules["models.heads.faster_rcnn"]
    mask = stubs("ref_maskrcnn2", "/root/reference/models/heads/maskrcnn.py")
    rng = np.random.default_rng(3)
    torch.manual_seed(3)

    # RPNHead over one pyramid level
    th = rpnmod.RPNHead(64, 3).eval()
    sd = {k: v.detach().numpy() for k, v in th.state_dict().items()}
    f = rng.normal(size=(1, 16, 16, 64)).astype(np.float32)
    with torch.no_grad():
        wl, wd = th([torch.from_numpy(f.transpose(0, 3, 1, 2).copy())])
    jl, jd = RPNHead(num_anchors=3, dtype=jnp.float32).apply(
        {"params": convert_rpn_head(sd)}, [jnp.asarray(f)]
    )
    np.testing.assert_allclose(np.asarray(jl[0]).transpose(0, 3, 1, 2),
                               wl[0].numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jd[0]).transpose(0, 3, 1, 2),
                               wd[0].numpy(), rtol=1e-5, atol=1e-5)

    # TwoMLPHead (flatten-order permutation) + FastRCNNPredictor
    tm = frcnn.TwoMLPHead(64 * 7 * 7, 128).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    roi = rng.normal(size=(5, 7, 7, 64)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(roi.transpose(0, 3, 1, 2).copy())).numpy()
    got = TwoMLPHead(dim=128, dtype=jnp.float32).apply(
        {"params": convert_two_mlp_head(sd)}, jnp.asarray(roi)
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)

    tp = frcnn.FastRCNNPredictor(128, 5).eval()
    sd = {k: v.detach().numpy() for k, v in tp.state_dict().items()}
    with torch.no_grad():
        ws, wb = tp(torch.from_numpy(want))
    gs, gb = FastRCNNPredictor(num_classes=5, dtype=jnp.float32).apply(
        {"params": convert_fastrcnn_predictor(sd)}, jnp.asarray(want)
    )
    np.testing.assert_allclose(np.asarray(gs), ws.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), wb.numpy(), rtol=1e-5, atol=1e-5)

    # MaskRCNNPredictor (deconv kernel layout)
    mp = mask.MaskRCNNPredictor(64, 32, 5).eval()
    sd = {k: v.detach().numpy() for k, v in mp.state_dict().items()}
    x = rng.normal(size=(2, 14, 14, 64)).astype(np.float32)
    with torch.no_grad():
        want = mp(torch.from_numpy(x.transpose(0, 3, 1, 2).copy())).numpy()
    got = MaskRCNNPredictor(num_classes=5, channels=32, dtype=jnp.float32).apply(
        {"params": convert_maskrcnn_predictor(sd)}, jnp.asarray(x)
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=1e-5, atol=1e-5
    )


def test_resnet50_fpn_torch_parity(stubs):
    """Reference ResNet-50 (resnet.py:54-117) + FeaturePyramidNetwork
    (feature_pyramid_network.py:116-230) value parity."""
    import importlib

    import torch

    from _ref_stubs import install_ref_stubs, preload
    from segmentation_factory_tpu.convert import convert_backbone, convert_fpn
    from segmentation_factory_tpu.models.backbones.resnet import (
        FeaturePyramidNetwork,
    )
    from segmentation_factory_tpu.registry import get_backbone

    install_ref_stubs()
    preload("models.backbones.feature_pyramid_network",
            "/root/reference/models/backbones/feature_pyramid_network.py")
    ref = preload("models.backbones.resnet",
                  "/root/reference/models/backbones/resnet.py")
    fpnmod = importlib.import_module(
        "models.backbones.feature_pyramid_network")

    torch.manual_seed(4)
    tb = ref.ResNet(ref.Bottleneck, [3, 4, 6, 3], include_top=False).eval()
    with torch.no_grad():
        for m in tb.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.9, 1.1)
    sd = {k: v.detach().numpy() for k, v in tb.state_dict().items()}
    tree = convert_backbone(sd, "resnet50")

    jb, ch = get_backbone("resnet50", dtype=jnp.float32)
    x = np.random.default_rng(4).normal(size=(1, 96, 96, 3)).astype(np.float32)
    init = jb.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    assert jax.tree_util.tree_structure(init["params"]) == (
        jax.tree_util.tree_structure(
            jax.tree_util.tree_map(jnp.asarray, tree["params"])
        )
    ), "converted ResNet param-tree structure mismatch"

    with torch.no_grad():
        want = tb(torch.from_numpy(x.transpose(0, 3, 1, 2).copy())).numpy()
    feats = jb.apply(
        {"params": tree["params"], "batch_stats": tree["batch_stats"]},
        jnp.asarray(x), train=False,
    )
    got = np.asarray(feats[-1]).transpose(0, 3, 1, 2)
    scale = float(np.abs(want).std()) or 1.0
    np.testing.assert_allclose(got / scale, want / scale, rtol=0, atol=2e-3)

    # FPN over random pyramid features
    tf = fpnmod.FeaturePyramidNetwork([64, 128, 256], 32,
                                      extra_blocks=fpnmod.LastLevelMaxPool()).eval()
    sd = {k: v.detach().numpy() for k, v in tf.state_dict().items()}
    p = convert_fpn(sd, num_levels=3)
    rng = np.random.default_rng(5)
    fs = [rng.normal(size=(1, 16 // (2 ** i), 16 // (2 ** i), c)).astype(np.float32)
          for i, c in enumerate([64, 128, 256])]
    from collections import OrderedDict
    with torch.no_grad():
        wout = tf(OrderedDict(
            (str(i), torch.from_numpy(f.transpose(0, 3, 1, 2).copy()))
            for i, f in enumerate(fs)
        ))
    wout = list(wout.values())
    jout = FeaturePyramidNetwork(out_channels=32, dtype=jnp.float32).apply(
        {"params": p}, [jnp.asarray(f) for f in fs]
    )
    assert len(jout) == len(wout) == 4  # 3 levels + extra max-pool
    for i, (g, w) in enumerate(zip(jout, wout)):
        np.testing.assert_allclose(
            np.asarray(g).transpose(0, 3, 1, 2), w.numpy(),
            rtol=1e-5, atol=1e-5, err_msg=f"fpn level {i}",
        )


def test_paste_masks_torch_parity(stubs):
    """Mask paste-back parity vs the reference GeneralizedRCNNTransform
    helpers (transform.py:145-232): expand_masks/expand_boxes 1-px halo +
    fp32 bilinear paste into int64-truncated boxes."""
    import importlib

    import torch

    from _ref_stubs import install_ref_stubs
    from segmentation_factory_tpu.models.detection import paste_masks_in_image

    install_ref_stubs()
    tmod = importlib.import_module("models.modules.transform")

    rng = np.random.default_rng(6)
    masks = rng.uniform(0, 1, (4, 14, 14)).astype(np.float32)
    boxes = np.asarray(
        [[3.2, 5.9, 30.7, 41.3],
         [0.0, 0.0, 10.0, 10.0],
         [50.5, 50.5, 63.0, 60.0],
         [-4.0, -2.0, 12.0, 20.0]],  # clipped at the border
        np.float32,
    )
    with torch.no_grad():
        want = tmod.paste_masks_in_image(
            torch.from_numpy(masks)[:, None], torch.from_numpy(boxes), (64, 64)
        ).numpy()
    got = paste_masks_in_image(masks, boxes, (64, 64))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_convert_full_model_generic_wiring(stubs):
    """convert_full_model (the --finetune .pth path) assembles a loadable
    tree for a non-flagship combo: reference MobileNetV2 backbone + FPNHead
    decode head, prefixed as the reference SegmentationModel stores them."""
    import importlib.util

    import torch

    from segmentation_factory_tpu.convert import convert_full_model
    from segmentation_factory_tpu.models.build import build_model

    spec = importlib.util.spec_from_file_location(
        "ref_mnv2_full", "/root/reference/models/backbones/mobilenetv2.py"
    )
    mnv2 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mnv2)
    fpn = stubs("ref_fpn_full", "/root/reference/models/heads/fpn.py")

    torch.manual_seed(5)
    tb = mnv2.MobileNetV2().eval()
    th = fpn.FPNHead([24, 32, 96, 320], channel=128, num_classes=7).eval()
    sd = {f"backbone.{k}": v.detach().numpy() for k, v in tb.state_dict().items()}
    sd.update({f"decode_head.{k}": v.detach().numpy()
               for k, v in th.state_dict().items()})

    tree = convert_full_model(sd, "mobilenetv2", "fpnhead")
    jm = build_model("mobilenetv2", "fpnhead", num_classes=7, embed_dim=128,
                     dtype=jnp.float32)
    init = jm.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    assert jax.tree_util.tree_structure(init["params"]) == (
        jax.tree_util.tree_structure(
            jax.tree_util.tree_map(jnp.asarray, tree["params"])
        )
    ), "convert_full_model tree does not match build_model"
