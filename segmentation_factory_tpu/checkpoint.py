"""Checkpoint / resume via orbax.

Rebuild of the reference's checkpoint protocol (train_gpu.py:283-307 resume,
:349-365 best-mIoU save; util/utils.py:313-331 surgery + auto-discovery):

- save on metric improvement, keep the best (and latest) checkpoint,
- auto-resume from the save dir if a checkpoint exists,
- finetune loading with classifier-key dropping + optional freeze
  (train_gpu.py:238-261: drops 'linear_pred'/'conv_seg' keys).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

CLASSIFIER_KEYS = ("linear_pred", "conv_seg")  # ref util/utils.py:316-321


class CheckpointManager:
    """Thin orbax wrapper storing {state-tree, metrics metadata}."""

    def __init__(self, directory: str, max_to_keep: int = 2):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                best_fn=lambda m: m.get("mIoU", 0.0),
                best_mode="max",
            ),
        )

    def save(self, step: int, state, metrics: Optional[Dict[str, Any]] = None) -> None:
        tree = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        self.mngr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(tree),
                metrics=ocp.args.JsonSave(metrics or {}),
            ),
            # register with orbax's best_fn tracking too: without this the
            # manager logs 'Requested tracked_metric; did not provide
            # metrics' on every save and best_step() is None in-session
            metrics=metrics or {},
        )

    def wait(self) -> None:
        self.mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.mngr.latest_step()

    def best_step(self) -> Optional[int]:
        return self.mngr.best_step()

    def restore(self, state, step: Optional[int] = None):
        """Restore into an existing TrainState (auto-resume; ref :283-307)."""
        step = step if step is not None else self.mngr.latest_step()
        if step is None:
            return state, {}
        tree = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        restored = self.mngr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(tree),
                metrics=ocp.args.JsonRestore(),
            ),
        )
        tree = restored["state"]
        metrics = restored["metrics"] or {}
        state = state.replace(
            params=tree["params"],
            batch_stats=tree["batch_stats"],
            opt_state=tree["opt_state"],
            step=tree["step"],
        )
        return state, metrics

    def close(self) -> None:
        self.mngr.close()


def load_params_for_finetune(params, ckpt_params, freeze: bool = False):
    """Merge checkpoint params, dropping classifier heads whose shapes are
    task-specific (ref train_gpu.py:238-261 + util/utils.py:313-324).

    Returns (merged_params, trainable_mask) — the mask is for optax
    ``masked`` freezing when ``freeze`` (ref freeze loop :252-257).
    """

    def merge(dst, src, path=()):
        # structural-mismatch tolerant (like torch load_state_dict
        # strict=False): intersecting same-shape non-classifier leaves load;
        # everything else keeps the fresh init. Converted reference
        # checkpoints legitimately lack subtrees the flax model always
        # instantiates (e.g. a DeepLabV3 saved with aux_for_deeplab=False).
        out = {}
        for k, new in dst.items():
            old = src.get(k) if isinstance(src, dict) else None
            if isinstance(new, dict):
                out[k] = merge(new, old if isinstance(old, dict) else {},
                               path + (k,))
                continue
            in_classifier = any(
                any(c in str(p) for c in CLASSIFIER_KEYS) for p in path + (k,)
            )
            if (old is None or in_classifier
                    or tuple(getattr(old, "shape", ())) != tuple(new.shape)):
                out[k] = new
            else:
                out[k] = jax.numpy.asarray(old, new.dtype)
        return out

    merged = merge(params, ckpt_params)

    def trainable(path, x):
        if not freeze:
            return True
        return any(any(k in str(p) for k in CLASSIFIER_KEYS) for p in path)

    mask = jax.tree_util.tree_map_with_path(trainable, merged)
    return merged, mask
