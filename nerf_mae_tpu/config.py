"""Typed configuration for all nerf_mae_tpu tasks.

Replaces the reference's per-driver argparse + shell-script config sprawl
(reference: nerf_mae/run_swin_mae3d.py:41-313, nerf_mae/train_mae3d.sh:16-35)
with one dataclass tree shared by every task.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    """3D Swin transformer trunk configuration.

    Named presets mirror the reference's swin_t/s/b/l dicts
    (reference: nerf_mae/run_swin_mae3d.py:378-399).
    """

    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    patch_size: Sequence[int] = (4, 4, 4)
    window_size: Sequence[int] = (4, 4, 4)
    mlp_ratio: float = 4.0
    stochastic_depth_prob: float = 0.1
    expand_dim: bool = True
    norm_eps: float = 1e-5
    # "auto": fused Pallas window attention on TPU, XLA path elsewhere;
    # "pallas" / "xla" to force
    attention_impl: str = "auto"
    # MLP activation: "tanh" (tanh-approximated gelu — what the fused TPU
    # kernels implement) or "erf" (exact, matching torch nn.GELU for
    # weight-parity checks; disables the fused whole-block kernel)
    gelu: str = "tanh"

    def __post_init__(self):
        for dim, heads in zip(self.stage_dims, self.num_heads):
            if dim % heads:
                raise ValueError(
                    f"stage dim {dim} not divisible by num_heads {heads}"
                )

    @property
    def stage_dims(self) -> tuple:
        if self.expand_dim:
            return tuple(self.embed_dim * 2**i for i in range(len(self.depths)))
        return tuple(self.embed_dim for _ in self.depths)


SWIN_PRESETS = {
    # test-scale preset for CPU smoke runs (not in the reference)
    "swin_nano": SwinConfig(
        embed_dim=12, depths=(1, 1, 2, 1), num_heads=(3, 6, 12, 24),
        stochastic_depth_prob=0.0,
    ),
    "swin_t": SwinConfig(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24)),
    "swin_s": SwinConfig(embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24)),
    # NOTE: the reference's swin_b dict pairs embed_dim 128 with heads
    # (3, 6, 12, 24) (run_swin_mae3d.py:389-393), which is unusable — 128 is
    # not divisible by 3, so its qkv reshape would fail at runtime. We use
    # the standard Swin-B head counts instead.
    "swin_b": SwinConfig(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32)),
    "swin_l": SwinConfig(embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48)),
}


@dataclasses.dataclass(frozen=True)
class MAEConfig:
    """Masked-autoencoder pretraining model config.

    Mirrors SwinTransformer_MAE3D_New construction
    (reference: nerf_mae/model/mae/swin_mae3d.py:1088-1304).
    """

    swin: SwinConfig = SWIN_PRESETS["swin_s"]
    resolution: int = 160
    input_channels: int = 4
    out_channels: int = 4
    masking_prob: float = 0.75
    masking_strategy: str = "random"  # "random" | "grid"
    # Mask-block edge in *tokens*; the reference masks 4^3 token blocks
    # (= 16^3 voxels) (reference: swin_mae3d.py:1314-1382, patch_size=(4,4,4)).
    mask_block: int = 4
    # Reference quirk: one mask is sampled per batch and shared by all samples
    # (reference: swin_mae3d.py:1371 writes `mask[:, ...]`). We default to
    # proper per-sample masks; set False for parity runs.
    per_sample_mask: bool = True
    compute_dtype: str = "bfloat16"  # dtype for matmuls/convs; params stay fp32
    remat: bool = True  # jax.checkpoint each Swin stage + decoder block
    # Remat the UNETR decoder blocks too. Off by default: with the subpixel
    # head the decoder activations fit comfortably at batch 8, and the
    # recompute costs a full decoder forward (~26 ms/step on swin_b@160^3).
    # Turn on to trade that time back for HBM (e.g. decoder_type="unetr").
    decoder_remat: bool = False
    # remat policy: "nothing" recomputes everything (min memory);
    # "dots" saves matmul/conv outputs (less recompute, more HBM)
    remat_policy: str = "nothing"
    # Per-encoder-stage remat override (tuple of bools, one per stage), or
    # None = `remat` everywhere. Late stages (10^3/5^3 token grids) have tiny
    # activations — skipping their remat saves a full forward recompute in
    # the backward pass for almost no HBM cost (~29 ms/step on swin_b@160^3;
    # PERF.md). Fused-block stages additionally self-skip remat regardless
    # of this setting (their custom_vjp already recomputes in-kernel).
    remat_stages: Optional[Tuple[bool, ...]] = (True, True, False, False)
    # Final reconstruction stage:
    #   "subpixel" (TPU-native default): heavy convs stay at the token grid
    #     (40^3), voxels emitted via a depth-to-space projection — removes
    #     every [B, 160^3, 64] activation (which tile-pads 2-8x in HBM and
    #     dominates the reference-style decoder's memory AND flops)
    #   "unetr": the reference's ConvTranspose(4x) + full-res res-block
    #     (reference: swin_mae3d.py:1248-1257) for architecture-parity runs
    decoder_type: str = "subpixel"
    # Train-input layout note (no config knob — the model dispatches on
    # input ndim): the host may pre-patchify each batch
    # (ops/patchify.patchify_np) and feed [B, T, T, T, p^3, 4] instead of
    # the voxel grid [B, R, R, R, 4]; the patch embed then runs as one
    # MXU-friendly K=256 matmul instead of a conv over the 4-channel-minor
    # voxel layout (the layout transpose dominates its cost, PERF.md).
    # Same parameter tree either way; transfer bytes unchanged. Default-on
    # since r4 (A/B: 313.7 -> 258.0 ms, +21.6% — PERF.md); opt out with
    # --no-patch_major_input in run_mae_pretrain.py / NERF_MAE_PATCH_MAJOR=0
    # in bench.py. At the jit boundary the batch travels channel-flat
    # [B, T, T, T, p^3*4] by default (shard_batch flatten_patches /
    # NERF_MAE_FLAT_TRANSFER; see ops.maybe_unflatten_patches for why).
    # Composes with --device_data (the HBM corpus is stored flat
    # patch-major) and the [data, space] spatial mesh (first spatial dim
    # stays axis 1).

    def __post_init__(self):
        # The UNETR decoder doubles the token grid at every skip level, so
        # every intermediate stage size must halve exactly: resolution must
        # be divisible by patch * 2^(n_stages - 1) (= 32 for the 4-stage
        # presets; the reference's 160^3 satisfies this). Anything else
        # fails deep in the decoder with a cryptic concat-shape error —
        # surface it at construction instead.
        div = self.swin.patch_size[0] * 2 ** (len(self.swin.depths) - 1)
        if self.resolution % div:
            raise ValueError(
                f"resolution {self.resolution} must be a multiple of {div} "
                f"(patch {self.swin.patch_size[0]} x 2^{len(self.swin.depths) - 1} "
                f"patch-merging levels) for UNETR skip alignment"
            )

    @property
    def token_grid(self) -> int:
        return self.resolution // self.swin.patch_size[0]

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization config (reference: nerf_mae/train_mae3d.sh:16-35,
    run_swin_mae3d.py AdamW+OneCycleLR setup)."""

    batch_size: int = 32
    num_epochs: int = 2000
    lr: float = 1e-4
    weight_decay: float = 1e-3
    clip_grad_norm: float = 0.1
    # Skip (don't apply) updates whose grads contain nan/inf instead of
    # letting the nan poison every parameter through the global-norm clip
    # (the torch reference has no such guard and dies the same way).
    skip_nonfinite_updates: bool = True
    # torch OneCycleLR defaults reproduced by optax.cosine_onecycle_schedule
    onecycle_pct_start: float = 0.3
    onecycle_div_factor: float = 25.0
    onecycle_final_div_factor: float = 1e4
    seed: int = 0
    log_interval: int = 10
    eval_interval: int = 10
    ckpt_interval: int = 20
    ckpt_dir: str = "checkpoints"
    keep_checkpoints: int = 3
