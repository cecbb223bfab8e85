"""Ray generation + volume rendering, pure jittable functions.

(reference: data/scannet/run_nerf.py:782-1180 render_rays / ray batching —
re-expressed as batched static-shape ops: stratified sampling along all rays
at once, alpha compositing via cumulative products.)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def get_rays(
    pose: jnp.ndarray,  # [4, 4] camera-to-world
    h: int,
    w: int,
    focal: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (origins [H, W, 3], directions [H, W, 3]) in world space
    (OpenGL convention: camera looks down -z)."""
    i, j = jnp.meshgrid(jnp.arange(w), jnp.arange(h), indexing="xy")
    dirs = jnp.stack(
        [(i - w * 0.5 + 0.5) / focal, -(j - h * 0.5 + 0.5) / focal,
         -jnp.ones_like(i, jnp.float32)],
        axis=-1,
    )
    rays_d = jnp.einsum("hwc,rc->hwr", dirs, pose[:3, :3])
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)
    return rays_o, rays_d


def _composite(
    t: jnp.ndarray,  # [N, S] sorted sample depths
    rgb_logits: jnp.ndarray,  # [N, S, 3]
    sigma_raw: jnp.ndarray,  # [N, S]
    rays_d: jnp.ndarray,  # [N, 3]
    white_bkgd: bool,
):
    """Alpha compositing (raw2outputs semantics,
    reference: data/scannet/run_nerf.py:664-706)."""
    n = t.shape[0]
    delta = jnp.diff(t, axis=1)
    delta = jnp.concatenate([delta, jnp.full((n, 1), 1e10)], axis=1)
    delta = delta * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma_raw) * delta)
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=1)
    trans = jnp.concatenate([jnp.ones((n, 1)), trans[:, :-1]], axis=1)
    weights = alpha * trans  # [N, S]

    rgb = jax.nn.sigmoid(rgb_logits)
    comp_rgb = (weights[..., None] * rgb).sum(axis=1)
    depth = (weights * t).sum(axis=1)
    acc = weights.sum(axis=1)
    if white_bkgd:
        comp_rgb = comp_rgb + (1.0 - acc[..., None])
    return {"rgb": comp_rgb, "depth": depth, "acc": acc, "weights": weights,
            "z_vals": t}


def _stratified(near, far, n, n_samples, rng):
    t = jnp.linspace(near, far, n_samples)
    t = jnp.broadcast_to(t, (n, n_samples))
    if rng is not None:  # stratified jitter
        mids = (t[:, 1:] + t[:, :-1]) / 2
        lo = jnp.concatenate([t[:, :1], mids], axis=1)
        hi = jnp.concatenate([mids, t[:, -1:]], axis=1)
        t = lo + jax.random.uniform(rng, t.shape) * (hi - lo)
    return t


def sample_pdf(
    bins: jnp.ndarray,  # [N, B+1] bin edges (ascending)
    weights: jnp.ndarray,  # [N, B]
    n_samples: int,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Inverse-CDF sampling of n_samples per ray from a piecewise-constant
    pdf (reference: the dense-depth-priors sample_pdf used at
    data/scannet/run_nerf.py:950-957). Static shapes, vectorized
    searchsorted — jit/grad-safe (samples are treated as constants by the
    caller, matching the reference's .detach())."""
    n, b = weights.shape
    weights = weights + 1e-5
    pdf = weights / weights.sum(axis=1, keepdims=True)
    cdf = jnp.concatenate(
        [jnp.zeros((n, 1)), jnp.cumsum(pdf, axis=1)], axis=1
    )  # [N, B+1]

    if rng is None:  # deterministic: midpoints of uniform strata
        u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples)
        u = jnp.broadcast_to(u, (n, n_samples))
    else:
        u = jax.random.uniform(rng, (n, n_samples))

    idx = jax.vmap(
        lambda c, uu: jnp.searchsorted(c, uu, side="right")
    )(cdf, u)
    lo = jnp.clip(idx - 1, 0, b)
    hi = jnp.clip(idx, 0, b)
    cdf_lo = jnp.take_along_axis(cdf, lo, axis=1)
    cdf_hi = jnp.take_along_axis(cdf, hi, axis=1)
    bin_lo = jnp.take_along_axis(bins, lo, axis=1)
    bin_hi = jnp.take_along_axis(bins, hi, axis=1)
    denom = jnp.where(cdf_hi - cdf_lo < 1e-5, 1.0, cdf_hi - cdf_lo)
    frac = (u - cdf_lo) / denom
    return bin_lo + frac * (bin_hi - bin_lo)


def render_rays(
    params,
    model_apply,
    rays_o: jnp.ndarray,  # [N, 3]
    rays_d: jnp.ndarray,  # [N, 3]
    near: float,
    far: float,
    n_samples: int = 64,
    rng: Optional[jax.Array] = None,
    white_bkgd: bool = False,
):
    """Single-level stratified volume rendering.
    Returns dict {rgb [N, 3], depth [N], acc [N], weights, z_vals}."""
    n = rays_o.shape[0]
    t = _stratified(near, far, n, n_samples, rng)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * t[..., None]  # [N, S, 3]
    viewdir = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rgb_logits, sigma_raw = model_apply(params, pts, viewdir[:, None, :])
    return _composite(t, rgb_logits, sigma_raw, rays_d, white_bkgd)


def render_rays_hierarchical(
    params_coarse,
    params_fine,
    model_apply,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    near: float,
    far: float,
    n_coarse: int = 64,
    n_importance: int = 64,
    rng: Optional[jax.Array] = None,
    white_bkgd: bool = False,
):
    """Two-level (coarse -> importance-sampled fine) rendering, the
    reference's N_importance>0 path (reference:
    data/scannet/run_nerf.py:939-981): fine samples are drawn from the
    coarse weight pdf over z-midpoints, merged + sorted with the coarse
    samples, and evaluated with the fine network. Returns the fine outputs
    plus rgb0/depth0/acc0 from the coarse pass (both losses are trained,
    :1326-1328)."""
    n = rays_o.shape[0]
    rng_c, rng_f = (None, None) if rng is None else jax.random.split(rng)
    t = _stratified(near, far, n, n_coarse, rng_c)
    viewdir = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * t[..., None]
    rgb_logits, sigma_raw = model_apply(params_coarse, pts, viewdir[:, None, :])
    coarse = _composite(t, rgb_logits, sigma_raw, rays_d, white_bkgd)

    t_mid = 0.5 * (t[:, 1:] + t[:, :-1])
    t_fine = sample_pdf(
        t_mid, jax.lax.stop_gradient(coarse["weights"][:, 1:-1]),
        n_importance, rng_f,
    )
    t_all = jnp.sort(jnp.concatenate([t, jax.lax.stop_gradient(t_fine)],
                                     axis=1), axis=1)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * t_all[..., None]
    rgb_logits, sigma_raw = model_apply(params_fine, pts, viewdir[:, None, :])
    out = _composite(t_all, rgb_logits, sigma_raw, rays_d, white_bkgd)
    out["rgb0"] = coarse["rgb"]
    out["depth0"] = coarse["depth"]
    out["acc0"] = coarse["acc"]
    return out


def sample_3sigma(
    low: jnp.ndarray,  # [N] lower 3-sigma bound per ray
    high: jnp.ndarray,  # [N] upper 3-sigma bound per ray
    n_samples: int,
    near: float,
    far: float,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Samples from a truncated Gaussian spanning [low, high] (interpreted
    as +-3 sigma), clamped to [near, far] — the dense-depth-priors
    sample_3sigma (reference: data/scannet/run_nerf.py:708-719): bin edges
    linspace(low, high), Gaussian pdf bin weights rescaled by the
    clamp-compressed bin widths, then inverse-CDF sampling."""
    t_vals = jnp.linspace(0.0, 1.0, n_samples)
    step = (high - low) / (n_samples - 1)  # [N]
    edges = jnp.clip(
        low[:, None] * (1.0 - t_vals) + high[:, None] * t_vals, near, far
    )  # [N, n]
    factor = jnp.diff(edges, axis=1) / jnp.maximum(step[:, None], 1e-10)
    x = jnp.linspace(-3.0, 3.0, n_samples - 1)
    gauss = jnp.exp(-0.5 * x**2) / jnp.sqrt(2.0 * jnp.pi)
    return sample_pdf(edges, factor * gauss, n_samples, rng)


def depth_and_std(
    t: jnp.ndarray, weights: jnp.ndarray  # [N, S] each
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expected depth and std of the ray's weight distribution
    (reference: data/scannet/run_nerf.py:664-668 raw2depth)."""
    depth = (weights * t).sum(axis=1)
    var = ((t - depth[:, None]) ** 2 * weights).sum(axis=1)
    return depth, jnp.sqrt(jnp.maximum(var, 0.0))


def render_rays_depth_guided(
    params,
    model_apply,
    rays_o: jnp.ndarray,  # [N, 3]
    rays_d: jnp.ndarray,  # [N, 3]
    near: float,
    far: float,
    target_depth: jnp.ndarray,  # [N] sensor depth (any value where invalid)
    depth_low: jnp.ndarray,  # [N] lower 3-sigma bound of the sensor depth
    depth_high: jnp.ndarray,  # [N] upper 3-sigma bound
    valid_depth: jnp.ndarray,  # [N] bool: sensor depth usable for this ray
    n_samples: int = 64,
    rng: Optional[jax.Array] = None,
    white_bkgd: bool = False,
):
    """Depth-guided two-pass sampling — the dense-depth-priors train path
    (reference: data/scannet/run_nerf.py:846-902 + compute_samples_around_
    depth :741-749 + forward_with_additonal_samples :752-781):

      1. first n/2 samples uniformly along the whole ray -> coarse raw
      2. second n/2 samples concentrated in a 3-sigma band: around the
         *sensor* depth where it is valid, else around the *predicted*
         depth/std from pass 1 (std floored at the pass-1 sample spacing)
      3. both sample sets merged, sorted, composited together

    TPU-native: the reference's boolean-indexed per-ray branches become
    masked selects over the full ray batch (both 3-sigma candidate sample
    sets are cheap [N, n/2] tensors; only the network evaluation — shared —
    is expensive). Static shapes throughout; the sort is a single
    jnp.argsort over n samples per ray. The guide samples are
    stop_gradient'ed, matching the reference's .detach()."""
    n = rays_o.shape[0]
    half = n_samples // 2
    rng_a, rng_b = (None, None) if rng is None else jax.random.split(rng)

    t1 = _stratified(near, far, n, half, rng_a)
    viewdir = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * t1[..., None]
    rgb1, sig1 = model_apply(params, pts, viewdir[:, None, :])
    coarse = _composite(t1, rgb1, sig1, rays_d, white_bkgd)

    # predicted-depth band (used where the sensor depth is invalid);
    # lower_bound = coarse sample spacing (reference :758-760)
    w = jax.lax.stop_gradient(coarse["weights"])
    pred_depth, pred_std = depth_and_std(t1, w)
    pred_std = jnp.maximum(pred_std, (far - near) / max(half - 1, 1))
    lo = jnp.where(valid_depth, depth_low, pred_depth - 3.0 * pred_std)
    hi = jnp.where(valid_depth, depth_high, pred_depth + 3.0 * pred_std)
    t2 = jax.lax.stop_gradient(
        sample_3sigma(jax.lax.stop_gradient(lo), jax.lax.stop_gradient(hi),
                      half, near, far, rng_b)
    )

    pts2 = rays_o[:, None, :] + rays_d[:, None, :] * t2[..., None]
    rgb2, sig2 = model_apply(params, pts2, viewdir[:, None, :])

    t_all = jnp.concatenate([t1, t2], axis=1)
    order = jnp.argsort(t_all, axis=1)
    t_all = jnp.take_along_axis(t_all, order, axis=1)
    rgb = jnp.take_along_axis(
        jnp.concatenate([rgb1, rgb2], axis=1), order[..., None], axis=1
    )
    sig = jnp.take_along_axis(
        jnp.concatenate([sig1, sig2], axis=1), order, axis=1
    )
    out = _composite(t_all, rgb, sig, rays_d, white_bkgd)
    out["depth0"] = coarse["depth"]
    out["acc0"] = coarse["acc"]
    return out


def depth_nll_loss(
    depth: jnp.ndarray,  # [N] rendered expected depth
    z_vals: jnp.ndarray,  # [N, S]
    weights: jnp.ndarray,  # [N, S]
    target_depth: jnp.ndarray,  # [N]
    valid_depth: jnp.ndarray,  # [N] bool
    eps: float = 1e-3,
) -> jnp.ndarray:
    """Gaussian negative-log-likelihood depth supervision with the variance
    of the ray's weight distribution — the dense-depth-priors compute_depth_
    loss the reference trains with (reference: data/scannet/run_nerf.py:
    1316-1324; GaussianNLLLoss over valid-depth rays). Masked static-shape
    form: invalid rays contribute 0."""
    var = ((z_vals - depth[:, None]) ** 2 * weights).sum(axis=1)
    var = jnp.maximum(var, eps)
    nll = 0.5 * (jnp.log(var) + (depth - target_depth) ** 2 / var)
    m = valid_depth.astype(jnp.float32)
    return (nll * m).sum() / jnp.maximum(m.sum(), 1.0)
