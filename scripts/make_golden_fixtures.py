#!/usr/bin/env python
"""Generate golden parity fixtures from the reference PyTorch model.

Runs the *actual* reference SwinTransformer_MAE3D_New
(/root/reference/nerf_mae/model/mae/swin_mae3d.py:1067-1599) on a tiny
deterministic config + input, and saves its state_dict, inputs, the mask it
drew, per-stage encoder features, the reconstruction, and the loss terms to
tests/fixtures/golden_mae_tiny.npz.

tests/test_parity_golden.py then converts the state_dict with
scripts/convert_torch_checkpoint.convert_state_dict, loads it into our
SwinMAE3D, and pins numeric agreement — this is the offline stand-in for
loading the published HuggingFace checkpoint (README.md:127), which is
unreachable from this machine (zero egress). The conversion rules are
identical either way, so golden agreement here transfers to the real
weights.

torchvision is not installed in this env; the three small public modules
the reference imports from it (Permute / MLP / StochasticDepth) are shimmed
below with their documented semantics before the reference import.
"""

from __future__ import annotations

import os
import random
import sys
import types

import numpy as np
import torch
from torch import nn

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
OUT = os.path.join(REPO, "tests", "fixtures", "golden_mae_tiny.npz")

# tiny-but-representative config: 2 blocks/stage (so every stage runs one
# shifted-window block), 4 stages, token grid 16^3 -> 2^3 (stages 2-3
# exercise the window-padding path)
EMBED_DIM = 12
DEPTHS = [2, 2, 2, 2]
NUM_HEADS = [3, 6, 12, 24]
RESOLUTION = 64
MASKING_PROB = 0.75
SEED = 0


def _install_torchvision_shims():
    """Minimal stand-ins for torchvision.ops.{misc.MLP, misc.Permute,
    stochastic_depth.StochasticDepth} with their public semantics."""

    class Permute(nn.Module):
        def __init__(self, dims):
            super().__init__()
            self.dims = list(dims)

        def forward(self, x):
            return torch.permute(x, self.dims)

    class MLP(nn.Sequential):
        def __init__(self, in_channels, hidden_channels, norm_layer=None,
                     activation_layer=nn.ReLU, inplace=None, bias=True,
                     dropout=0.0):
            kw = {} if inplace is None else {"inplace": inplace}
            layers = []
            d = in_channels
            for h in hidden_channels[:-1]:
                layers.append(nn.Linear(d, h, bias=bias))
                if norm_layer is not None:
                    layers.append(norm_layer(h))
                layers.append(activation_layer(**kw))
                layers.append(nn.Dropout(dropout, **kw))
                d = h
            layers.append(nn.Linear(d, hidden_channels[-1], bias=bias))
            layers.append(nn.Dropout(dropout, **kw))
            super().__init__(*layers)

    class StochasticDepth(nn.Module):
        def __init__(self, p: float, mode: str):
            super().__init__()
            self.p, self.mode = p, mode

        def forward(self, x):
            if not self.training or self.p == 0.0:
                return x
            keep = 1.0 - self.p
            size = [x.shape[0]] + [1] * (x.ndim - 1)
            noise = torch.empty(size, dtype=x.dtype, device=x.device)
            return x * noise.bernoulli_(keep).div_(keep)

    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    misc = types.ModuleType("torchvision.ops.misc")
    sd = types.ModuleType("torchvision.ops.stochastic_depth")
    misc.MLP, misc.Permute = MLP, Permute
    sd.StochasticDepth = StochasticDepth
    ops.misc, ops.stochastic_depth = misc, sd
    tv.ops = ops
    for name, mod in [("torchvision", tv), ("torchvision.ops", ops),
                      ("torchvision.ops.misc", misc),
                      ("torchvision.ops.stochastic_depth", sd)]:
        sys.modules.setdefault(name, mod)


def main():
    _install_torchvision_shims()
    # the reference uses the numpy<1.24 `np.float` alias (torch_utils.py:42)
    if not hasattr(np, "float"):
        np.float = float  # type: ignore[attr-defined]
    sys.path.insert(0, REFERENCE)
    from nerf_mae.model.mae.swin_mae3d import SwinTransformer_MAE3D_New

    torch.manual_seed(SEED)
    np.random.seed(SEED)
    random.seed(SEED)

    model = SwinTransformer_MAE3D_New(
        patch_size=[4, 4, 4],
        embed_dim=EMBED_DIM,
        depths=DEPTHS,
        num_heads=NUM_HEADS,
        window_size=[4, 4, 4],
        stochastic_depth_prob=0.1,  # inert in eval mode
        masking_prob=MASKING_PROB,
        resolution=RESOLUTION,
    )
    model.eval()

    rs = np.random.RandomState(1)
    # scene 0 fills the cube; scene 1 is smaller -> exercises pad validity
    g0 = rs.rand(4, 64, 64, 64).astype(np.float32)
    g1 = rs.rand(4, 48, 56, 64).astype(np.float32)
    grids = [torch.tensor(g0), torch.tensor(g1)]

    # capture per-stage encoder outputs via hooks
    stage_feats = []
    for st in model.stages:
        st.register_forward_hook(
            lambda m, i, o: stage_feats.append(o.detach().numpy())
        )

    with torch.no_grad():
        random.seed(SEED + 1)  # the mask draw (window_masking_3d)
        loss, loss_rgb, loss_alpha, pred, _, target = model(grids, is_eval=True)
        # re-draw the same mask standalone to save it (same seed + same
        # random.random() call sequence as inside forward)
        padded, _ = model.transform(grids)
        x = model.patch_partition(torch.cat(padded, dim=0))
        x = x + model.pos_embed.type_as(x)
        random.seed(SEED + 1)
        _, mask = model.window_masking_3d(
            x, p_remove=model.masking_prob, mask_token=model.mask_token
        )

    sd_np = {f"sd.{k}": v.detach().numpy() for k, v in model.state_dict().items()}
    n_params = sum(v.size for v in sd_np.values())
    # the input grids are NOT stored: the test regenerates them with
    # np.random.RandomState(1) in the same call order (guarded by checksums)
    fixtures = {
        **sd_np,
        "grid0_sum": np.float64(g0.sum()),
        "grid1_sum": np.float64(g1.sum()),
        "token_mask": mask.numpy()[..., 0].astype(bool),  # [B, 16, 16, 16]
        "pred": pred.numpy(),  # [B, 16, 16, 16, 64, 4] patchified
        "loss": np.float32(loss.item()),
        "loss_rgb": np.float32(loss_rgb.item()),
        "loss_alpha": np.float32(loss_alpha.item()),
        **{f"stage{i}": f for i, f in enumerate(stage_feats)},
        "meta_embed_dim": np.int32(EMBED_DIM),
        "meta_depths": np.asarray(DEPTHS, np.int32),
        "meta_num_heads": np.asarray(NUM_HEADS, np.int32),
        "meta_resolution": np.int32(RESOLUTION),
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **fixtures)
    mb = os.path.getsize(OUT) / 1e6
    print(f"wrote {OUT}: {n_params} params, {mb:.1f} MB, "
          f"loss={loss.item():.6f} (rgb {loss_rgb.item():.6f} "
          f"alpha {loss_alpha.item():.6f})")


if __name__ == "__main__":
    main()
