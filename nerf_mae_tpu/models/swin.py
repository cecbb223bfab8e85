"""3D Swin transformer trunk (flax.linen), channel-last, static shapes.

Equivalent capability to the reference's SwinTransformerBlock / PatchMerging /
stage pipeline (reference: nerf_mae/model/mae/swin_mae3d.py:310-414,
1131-1172), re-designed for TPU:

  * channel-last [B, H, W, D, C] end to end (no NCDHW permutes)
  * attention internals in `ops.window_attention` run as batched MXU matmuls
    with static precomputed shift masks
  * params are fp32; compute dtype (bf16 by default) is a module knob
  * optional jax.checkpoint (remat) per stage to trade FLOPs for HBM
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerf_mae_tpu.config import SwinConfig
from nerf_mae_tpu.ops.window_attention import window_attention_3d


def drop_path(
    x: jnp.ndarray, rate: float, deterministic: bool, rng: Optional[jax.Array]
) -> jnp.ndarray:
    """Per-sample stochastic depth ('row' mode, like the reference's
    torchvision StochasticDepth at swin_mae3d.py:350)."""
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, (x.shape[0],) + (1,) * (x.ndim - 1))
    return x * keep.astype(x.dtype) / (1.0 - rate)


class _LNParams(nn.Module):
    """Param holder matching nn.LayerNorm's tree ({scale, bias}) so both the
    fused-block kernel and the manual XLA path read the same parameters."""

    features: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.features,)),
            self.param("bias", nn.initializers.zeros, (self.features,)),
        )


class _DenseParams(nn.Module):
    """Param holder matching nn.Dense's tree ({kernel, bias})."""

    in_features: int
    out_features: int

    @nn.compact
    def __call__(self):
        return (
            self.param(
                "kernel", nn.initializers.xavier_uniform(),
                (self.in_features, self.out_features),
            ),
            self.param(
                "bias", nn.initializers.normal(1e-6), (self.out_features,)
            ),
        )


def layer_norm(x: jnp.ndarray, scale, bias, eps: float) -> jnp.ndarray:
    """f32 LayerNorm with flax's fast-variance formula; returns f32."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    return (xf - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _dense(x: jnp.ndarray, kernel, bias, dtype) -> jnp.ndarray:
    """nn.Dense-equivalent matmul at compute dtype, f32 accumulation."""
    y = jax.lax.dot_general(
        x.astype(dtype), kernel.astype(dtype),
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    return y + bias.astype(dtype)


class SwinBlock3D(nn.Module):
    """One Swin block: LN -> window MSA -> droppath residual -> LN -> MLP.

    (reference: swin_mae3d.py:310-369)

    On TPU the whole block runs as one fused Pallas kernel when the stage
    qualifies (ops/pallas_block.py); otherwise the attention runs fused
    (ops/pallas_attention.py) with LN/MLP left to XLA; off-TPU everything
    is plain XLA. All paths share one param tree and the same math.
    """

    dim: int
    num_heads: int
    window: Tuple[int, int, int]
    shift: Tuple[int, int, int]
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16
    attention_impl: str = "auto"  # auto | pallas | xla
    gelu: str = "tanh"  # tanh (fused-kernel math) | erf (torch parity)

    def _pallas_wanted(self) -> bool:
        if self.attention_impl == "xla":
            return False
        if self.attention_impl == "pallas":
            return True
        return jax.default_backend() == "tpu"

    def _use_fused_block(self, shape) -> bool:
        from nerf_mae_tpu.ops.pallas_block import fused_block_supported

        # the fused kernel hardcodes tanh-gelu
        if self.gelu != "tanh":
            return False
        return self._pallas_wanted() and fused_block_supported(
            shape, self.window, self.num_heads, self.mlp_ratio
        )

    def _use_pallas_attn(self, shape) -> bool:
        from nerf_mae_tpu.ops.pallas_attention import pallas_supported

        return self._pallas_wanted() and pallas_supported(
            shape, self.window, self.shift
        )

    def _droppath_keep(self, batch: int, deterministic: bool) -> jnp.ndarray:
        """Per-sample keep/(1-rate) factor, same draws as drop_path."""
        if deterministic or self.drop_path_rate == 0.0:
            return jnp.ones((batch,), jnp.float32)
        rng = self.make_rng("droppath")
        keep = jax.random.bernoulli(
            rng, 1.0 - self.drop_path_rate, (batch, 1, 1, 1, 1)
        )
        return keep.reshape(batch).astype(jnp.float32) / (
            1.0 - self.drop_path_rate
        )

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        table_size = (
            (2 * self.window[0] - 1)
            * (2 * self.window[1] - 1)
            * (2 * self.window[2] - 1)
        )
        hidden = int(self.dim * self.mlp_ratio)
        qkv_kernel = self.param(
            "qkv_kernel",
            nn.initializers.truncated_normal(0.02),
            (self.dim, 3 * self.dim),
        )
        qkv_bias = self.param("qkv_bias", nn.initializers.zeros, (3 * self.dim,))
        proj_kernel = self.param(
            "proj_kernel",
            nn.initializers.truncated_normal(0.02),
            (self.dim, self.dim),
        )
        proj_bias = self.param("proj_bias", nn.initializers.zeros, (self.dim,))
        bias_table = self.param(
            "rel_pos_bias_table",
            nn.initializers.truncated_normal(0.02),
            (table_size, self.num_heads),
        )
        ln1_scale, ln1_bias = _LNParams(self.dim, name="norm1")()
        ln2_scale, ln2_bias = _LNParams(self.dim, name="norm2")()
        fc1_kernel, fc1_bias = _DenseParams(self.dim, hidden, name="mlp_fc1")()
        fc2_kernel, fc2_bias = _DenseParams(hidden, self.dim, name="mlp_fc2")()

        if self._use_fused_block(x.shape):
            from nerf_mae_tpu.ops.pallas_block import fused_swin_block

            keep_attn = self._droppath_keep(x.shape[0], deterministic)
            keep_mlp = self._droppath_keep(x.shape[0], deterministic)
            return fused_swin_block(
                x.astype(self.dtype),
                ln1_scale, ln1_bias,
                qkv_kernel, qkv_bias,
                proj_kernel, proj_bias,
                ln2_scale, ln2_bias,
                fc1_kernel, fc1_bias,
                fc2_kernel, fc2_bias,
                bias_table,
                keep_attn, keep_mlp,
                tuple(self.window), tuple(self.shift), self.num_heads,
                self.norm_eps,
            ).astype(x.dtype)

        h = layer_norm(x, ln1_scale, ln1_bias, self.norm_eps)
        if self._use_pallas_attn(x.shape):
            from nerf_mae_tpu.ops.pallas_attention import fused_window_attention

            h = fused_window_attention(
                h.astype(self.dtype),
                qkv_kernel.astype(self.dtype),
                qkv_bias,
                proj_kernel.astype(self.dtype),
                proj_bias,
                bias_table,
                tuple(self.window),
                tuple(self.shift),
                self.num_heads,
            )
        else:
            h = window_attention_3d(
                h.astype(self.dtype),
                qkv_kernel.astype(self.dtype),
                qkv_bias,
                proj_kernel.astype(self.dtype),
                proj_bias,
                bias_table,
                self.window,
                self.shift,
                self.num_heads,
            )
        rng = None
        if not deterministic and self.drop_path_rate > 0.0:
            rng = self.make_rng("droppath")
        x = x + drop_path(
            h.astype(x.dtype), self.drop_path_rate, deterministic, rng
        )

        h = layer_norm(x, ln2_scale, ln2_bias, self.norm_eps)
        h = _dense(h, fc1_kernel, fc1_bias, self.dtype)
        h = nn.gelu(h, approximate=self.gelu != "erf")
        h = _dense(h, fc2_kernel, fc2_bias, self.dtype)
        rng = None
        if not deterministic and self.drop_path_rate > 0.0:
            rng = self.make_rng("droppath")
        return x + drop_path(
            h.astype(x.dtype), self.drop_path_rate, deterministic, rng
        )


class PatchMerging3D(nn.Module):
    """8-way 2x2x2 concat -> LayerNorm(8C) -> Dense(2C or C, no bias).

    (reference: swin_mae3d.py:372-414)
    """

    dim: int
    expand_dim: bool = True
    norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, d, c = x.shape
        pads = (h % 2, w % 2, d % 2)
        if any(pads):
            x = jnp.pad(x, ((0, 0), (0, pads[0]), (0, pads[1]), (0, pads[2]), (0, 0)))
        # gather the 8 offsets in the reference's concat order
        # (h-parity fastest: x0..x7 = (0,0,0),(1,0,0),(0,1,0),(1,1,0),
        #  (0,0,1),(1,0,1),(0,1,1),(1,1,1))
        parts = []
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    parts.append(x[:, dx::2, dy::2, dz::2, :])
        x = jnp.concatenate(parts, axis=-1)
        x = nn.LayerNorm(epsilon=self.norm_eps, dtype=jnp.float32, name="norm")(x)
        out_dim = self.dim * 2 if self.expand_dim else self.dim
        return nn.Dense(
            out_dim,
            use_bias=False,
            dtype=self.dtype,
            kernel_init=nn.initializers.truncated_normal(0.02),
            name="reduction",
        )(x.astype(self.dtype))


class SwinEncoder3D(nn.Module):
    """The 4-stage Swin trunk over an already patch-embedded token grid.

    Input [B, T, T, T, embed_dim]; returns the per-stage feature pyramid
    [C@T, 2C@T/2, 4C@T/4, 8C@T/8] (reference: swin_mae3d.py:1131-1172,
    forward loop :1466-1470).
    """

    cfg: SwinConfig
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False
    remat_policy: str = "nothing"
    # Per-stage remat override: remat trades FLOPs for HBM, but late stages
    # have tiny activations (10^3/5^3 token grids) — rematerializing them
    # buys almost no memory while paying a full forward recompute. None =
    # `remat` for every stage.
    remat_stages: Optional[Sequence[bool]] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        cfg = self.cfg
        total_blocks = sum(cfg.depths)
        block_id = 0
        features = []
        policy = (
            jax.checkpoint_policies.dots_saveable
            if self.remat_policy == "dots" else None
        )
        remat_block_cls = nn.remat(SwinBlock3D, static_argnums=(2,),
                                   policy=policy)
        remat_stages = self.remat_stages
        if remat_stages is None:
            remat_stages = tuple(self.remat for _ in cfg.depths)
        from nerf_mae_tpu.ops.pallas_block import fused_block_supported

        for i_stage, depth in enumerate(cfg.depths):
            dim = cfg.stage_dims[i_stage]
            if i_stage > 0:
                x = PatchMerging3D(
                    dim=cfg.stage_dims[i_stage - 1],
                    expand_dim=cfg.expand_dim,
                    norm_eps=cfg.norm_eps,
                    dtype=self.dtype,
                    name=f"merge{i_stage}",
                )(x)
            # The fused whole-block kernel is its own rematerializer: its
            # custom_vjp saves only (x, params) and recomputes the forward
            # inside the backward kernel. Wrapping such a stage in
            # jax.checkpoint saves nothing and costs one extra forward pass
            # per block — skip remat wherever the fused kernel will run.
            stage_fused = (
                cfg.attention_impl != "xla"
                and cfg.gelu == "tanh"
                and jax.default_backend() == "tpu"
                and fused_block_supported(
                    (x.shape[0], x.shape[1], x.shape[2], x.shape[3], dim),
                    tuple(cfg.window_size), cfg.num_heads[i_stage],
                    cfg.mlp_ratio,
                )
            )
            block_cls = (
                remat_block_cls
                if remat_stages[i_stage] and not stage_fused
                else SwinBlock3D
            )
            for i_layer in range(depth):
                sd = cfg.stochastic_depth_prob * block_id / max(total_blocks - 1, 1)
                shift = tuple(
                    0 if i_layer % 2 == 0 else ws // 2 for ws in cfg.window_size
                )
                x = block_cls(
                    dim=dim,
                    num_heads=cfg.num_heads[i_stage],
                    window=tuple(cfg.window_size),
                    shift=shift,
                    mlp_ratio=cfg.mlp_ratio,
                    drop_path_rate=sd,
                    norm_eps=cfg.norm_eps,
                    dtype=self.dtype,
                    attention_impl=cfg.attention_impl,
                    gelu=cfg.gelu,
                    name=f"stage{i_stage}_block{i_layer}",
                )(x, deterministic)
                block_id += 1
            features.append(x)
        return features
