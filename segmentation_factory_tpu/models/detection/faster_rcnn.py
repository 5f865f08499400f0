"""Faster R-CNN / Mask R-CNN assembled models (fixed-shape TPU formulation).

Parity with /root/reference/models/heads/faster_rcnn.py
(FasterRCNNBase.forward :51-115: transform -> backbone -> RPN -> RoIHeads ->
postprocess; FasterRCNN wiring :172-361) and maskrcnn.py (MaskRCNN :9-199).
Everything runs with constant proposal/detection counts + validity masks so
the whole model jits on TPU.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from segmentation_factory_tpu.models.backbones.resnet import FeaturePyramidNetwork
from segmentation_factory_tpu.models.detection import rpn as rpn_lib
from segmentation_factory_tpu.models.detection.anchors import anchors_for_pyramid
from segmentation_factory_tpu.models.detection.roi_align import multiscale_roi_align
from segmentation_factory_tpu.models.detection.roi_heads import (
    FastRCNNPredictor,
    MaskRCNNHeads,
    MaskRCNNPredictor,
    TwoMLPHead,
    fastrcnn_loss,
    maskrcnn_loss,
    postprocess_detections,
    select_training_samples,
)

Array = jax.Array


class FasterRCNN(nn.Module):
    """Backbone pyramid -> FPN -> RPN -> box head. ``with_mask`` adds the
    Mask R-CNN branch (= reference MaskRCNN(FasterRCNN))."""

    backbone: nn.Module
    num_classes: int = 91
    with_mask: bool = False
    fpn_channels: int = 256
    post_nms_top_n: int = 512
    detections_per_img: int = 100
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        images: Array,  # (B, H, W, 3) normalized, static canvas
        targets: Optional[dict] = None,  # {'boxes'(B,G,4),'labels'(B,G),'valid'(B,G), 'masks'(B,G,H,W)?}
        train: bool = False,
        rng: Optional[Array] = None,
    ):
        b, img_h, img_w, _ = images.shape
        feats = self.backbone(images, train=train)
        feats = FeaturePyramidNetwork(
            self.fpn_channels, dtype=self.dtype, name="fpn"
        )(feats, train=train)
        hws = [(f.shape[1], f.shape[2]) for f in feats]
        anchors_np, level_counts = anchors_for_pyramid(hws, (img_h, img_w))
        anchors = jnp.asarray(anchors_np)
        num_anchors = 3
        logits, deltas = rpn_lib.RPNHead(num_anchors, dtype=self.dtype, name="rpn_head")(feats)
        obj, dlt = rpn_lib.flatten_rpn_outputs(logits, deltas)

        select = lambda o, d: rpn_lib.select_proposals(  # noqa: E731
            o.astype(jnp.float32), d.astype(jnp.float32), anchors,
            (img_h, img_w), level_counts, post_nms_top_n=self.post_nms_top_n,
        )
        proposals, prop_scores, prop_valid = jax.vmap(select)(obj, dlt)

        losses = {}
        sample_w = None
        if train and targets is not None:
            rng = rng if rng is not None else self.make_rng("detection")
            # disjoint key halves: RPN sampling and RoI sampling must not
            # share uniform streams across images
            rngs = jax.random.split(rng, 2 * b)
            obj_l, box_l = jax.vmap(
                lambda r, o, d, gb, gv: rpn_lib.rpn_loss(
                    r, o.astype(jnp.float32), d.astype(jnp.float32), anchors, gb, gv
                )
            )(rngs[:b], obj, dlt, targets["boxes"], targets["valid"])
            losses["loss_objectness"] = obj_l.mean()
            losses["loss_rpn_box_reg"] = box_l.mean()
            # add_gt_proposals (ref roi_head.py:280-333): append the gt boxes
            # so the box/mask heads see guaranteed positives from step 1
            proposals = jnp.concatenate([proposals, targets["boxes"]], axis=1)
            prop_valid = jnp.concatenate(
                [prop_valid, targets["valid"].astype(prop_valid.dtype)], axis=1
            )
            labels, reg_targets, sample_w, matched = jax.vmap(
                lambda r, p, pv, gb, gl, gv: select_training_samples(
                    r, p, pv, gb, gl, gv
                )
            )(rngs[b:], proposals, prop_valid, targets["boxes"],
              targets["labels"], targets["valid"])

        # box head over all proposals
        def align(feat_list, boxes):
            return multiscale_roi_align(feat_list, boxes, (img_h, img_w), 7)

        pooled = jax.vmap(align, in_axes=(0, 0))(feats, proposals)
        p = pooled.shape[1]
        flat = pooled.reshape(b * p, 7, 7, self.fpn_channels)
        rep = TwoMLPHead(dtype=self.dtype, name="box_head")(flat)
        class_logits, box_deltas = FastRCNNPredictor(
            self.num_classes, name="box_predictor"
        )(rep)
        class_logits = class_logits.reshape(b, p, -1)
        box_deltas = box_deltas.reshape(b, p, -1)

        if train and targets is not None:
            cls_l, box_l = jax.vmap(fastrcnn_loss)(
                class_logits, box_deltas, labels, reg_targets, sample_w
            )
            losses["loss_classifier"] = cls_l.mean()
            losses["loss_box_reg"] = box_l.mean()

        if train and targets is not None:
            # detections are discarded in training — the per-class NMS is
            # pure dead compute there (the reference's eager branch skips
            # it the same way, faster_rcnn.py:51-115)
            d = self.detections_per_img
            detections = {
                "boxes": jnp.zeros((b, d, 4), jnp.float32),
                "scores": jnp.zeros((b, d), jnp.float32),
                "labels": jnp.zeros((b, d), jnp.int32),
                "valid": jnp.zeros((b, d), bool),
            }
        else:
            det_boxes, det_scores, det_labels, det_valid = jax.vmap(
                lambda cl, bd, pr, pv: postprocess_detections(
                    cl, bd, pr, pv, (img_h, img_w),
                    detections_per_img=self.detections_per_img,
                )
            )(class_logits, box_deltas, proposals, prop_valid)
            detections = {
                "boxes": det_boxes,
                "scores": det_scores,
                "labels": det_labels,
                "valid": det_valid,
            }

        if self.with_mask:
            mask_boxes = proposals if (train and targets is not None) else det_boxes
            pooled_m = jax.vmap(
                lambda fl, bx: multiscale_roi_align(fl, bx, (img_h, img_w), 14)
            )(feats, mask_boxes)
            pm = pooled_m.shape[1]
            mflat = pooled_m.reshape(b * pm, 14, 14, self.fpn_channels)
            mfeat = MaskRCNNHeads(dtype=self.dtype, name="mask_head")(mflat)
            mlogits = MaskRCNNPredictor(self.num_classes, name="mask_predictor")(mfeat)
            mm = mlogits.shape[1]
            mlogits = mlogits.reshape(b, pm, mm, mm, self.num_classes)
            if train and targets is not None and "masks" in targets:
                def mask_targets_fn(gmasks, matched, boxes):
                    # crop gt masks to proposal boxes at 28x28 via roi_align
                    sel = gmasks[jnp.clip(matched, 0)][..., None].astype(jnp.float32)
                    from segmentation_factory_tpu.models.detection.roi_align import (
                        roi_align,
                    )

                    return jax.vmap(
                        lambda m, bx: roi_align(m, bx[None], 1.0, mm)[0, ..., 0]
                    )(sel, boxes)

                mts = jax.vmap(mask_targets_fn)(
                    targets["masks"], matched, mask_boxes
                )
                ml = jax.vmap(maskrcnn_loss)(
                    mlogits, labels, (mts > 0.5).astype(jnp.float32), sample_w
                )
                losses["loss_mask"] = ml.mean()
            else:
                picked = jnp.take_along_axis(
                    mlogits,
                    det_labels[:, :, None, None, None],
                    axis=-1,
                )[..., 0]
                detections["masks"] = jax.nn.sigmoid(picked)

        if train and targets is not None:
            return losses
        return detections
