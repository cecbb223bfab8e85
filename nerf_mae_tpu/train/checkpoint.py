"""Checkpointing + cross-task parameter surgery (orbax).

Replaces the reference's torch.save dicts and its MAE->finetune surgery of
deleting decoder attributes from a loaded module
(reference: nerf_mae/run_swin_mae3d.py:471-497;
nerf_rpn/model/feature_extractor.py:1155-1176): here checkpoints are param
pytrees with explicit trunk/decoder namespaces, restore brings back step +
optimizer state by default, and surgery is a pure tree filter.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

# param subtrees that constitute the pretrained trunk (loadable into any
# downstream backbone); everything else is task-specific head/decoder state
TRUNK_KEYS = ("patch_embed", "patch_norm", "encoder")


def _manager(ckpt_dir: str, keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
    )


def save_checkpoint(
    ckpt_dir: str,
    step: int,
    params: Any,
    opt_state: Any = None,
    extra: Optional[Dict] = None,
    keep: int = 3,
) -> None:
    with _manager(ckpt_dir, keep) as mgr:
        payload = {"params": params}
        if opt_state is not None:
            payload["opt_state"] = opt_state
        items = {"state": ocp.args.StandardSave(payload)}
        if extra:
            items["extra"] = ocp.args.JsonSave(extra)
        mgr.save(step, args=ocp.args.Composite(**items))
        mgr.wait_until_finished()


def restore_checkpoint(
    ckpt_dir: str, step: Optional[int] = None, template: Any = None
) -> Dict:
    """Restore {params[, opt_state]} (+ "extra" metrics dict if saved) from
    the latest (or given) step. `template` gives the pytree structure for
    params/opt_state (required to rebuild optax state namedtuples)."""
    with _manager(ckpt_dir) as mgr:
        step = step if step is not None else mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {ckpt_dir}")
        has_extra = "extra" in (mgr.item_metadata(step) or {})
        items = {}
        if template is not None:
            # partial: a caller may want only params from a ckpt that also
            # stores opt_state (e.g. trunk grafting for downstream tasks)
            restore_args = jax.tree.map(
                lambda x: ocp.ArrayRestoreArgs(
                    restore_type=np.ndarray, dtype=getattr(x, "dtype", None)
                ),
                template,
            )
            items["state"] = ocp.args.PyTreeRestore(
                item=template, restore_args=restore_args, partial_restore=True
            )
        else:
            items["state"] = ocp.args.StandardRestore()
        if has_extra:
            items["extra"] = ocp.args.JsonRestore()
        restored = mgr.restore(step, args=ocp.args.Composite(**items))
    out = dict(restored["state"])
    if has_extra:
        out["extra"] = restored["extra"]
    return out


def extract_trunk(params: Any) -> Dict:
    """MAE params -> pretrained trunk subtree (drop decoders/mask token),
    the TPU equivalent of the reference's `del model.decoder4 ...` surgery."""
    return {k: params[k] for k in TRUNK_KEYS if k in params}


def load_trunk_into(params: Any, trunk: Dict) -> Dict:
    """Graft a pretrained trunk into a freshly initialized downstream param
    tree, leaving head params untouched. Shapes are validated leaf-by-leaf."""
    out = dict(params)
    for k, sub in trunk.items():
        if k not in out:
            raise KeyError(f"target params have no trunk subtree '{k}'")
        ref_shapes = jax.tree.map(lambda x: np.shape(x), out[k])
        new_shapes = jax.tree.map(lambda x: np.shape(x), sub)
        if ref_shapes != new_shapes:
            raise ValueError(
                f"trunk subtree '{k}' shape mismatch: {new_shapes} vs {ref_shapes}"
            )
        out[k] = sub
    return out
