"""Golden tolerance test: ops/roi_align.py vs the reference's pure-torch
ROIPool on smooth synthetic feature pyramids (fixtures from
scripts/make_golden_roi_fixtures.py; reference: detector.py:264-438).

ops/roi_align.py is a deliberate re-design (fixed S^3 trilinear lattice in
the box frame vs the reference's variable-size voxel grid + 8-corner
smoothing + maxpool/resize — PARITY.md). This test turns that deviation into
measured, pinned numbers, and documents the two reference quirks that
dominate it:

1. rotated_forward's "interpolation" weighting sums the 8 cell corners with
   weights (1 - |dx||dy||dz|)/8, which on smooth fields returns ~0.83-0.87x
   the true field value (a trilinear sampler returns 1.0x) — the weights sum
   to 7/8, not 1 (detector.py:347-366). The *geometry* agrees: center-bin
   correlation with our sampler is 0.999.
2. normal_forward's enlarge_roi halves the AABB extent after the 1.2x
   enlargement (base_cube spans ±0.5 of the *enlarged* half-extent,
   detector.py:195-211 — net 0.6x the box), and its maxpool zero-pads small
   slices up to the output size, so at output_size=5 and typical box sizes
   the majority of reference output bins are padding zeros, not features
   (measured 62% on this fixture).

Measured on the committed fixture (seeds in the generator):
  rotated:  full-tensor corr 0.976; center-bin corr 0.999; least-squares
            scale ref ~= 0.830 x ours; residual nrms after scale 0.219.
  aabb:     reference zero fraction 0.618; non-padding bins tracked by our
            geometry-adjusted sampler at corr 0.992 / nrms 0.128.
"""

import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from nerf_mae_tpu.ops.roi_align import roi_align_3d, roi_align_rotated_3d

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_roi.npz")
STRIDES = [4, 8, 16, 32]


@pytest.fixture(scope="module")
def fx():
    assert os.path.exists(FIXTURE), "run scripts/make_golden_roi_fixtures.py"
    return np.load(FIXTURE)


@pytest.fixture(scope="module")
def feats(fx):
    return [jnp.asarray(np.moveaxis(fx[f"feat_{i}"], 0, -1)) for i in range(4)]


@pytest.mark.quick
class TestRotatedGolden:
    @pytest.fixture(scope="class")
    def pair(self, fx, feats):
        rois = fx["rot_rois"]
        ours = roi_align_rotated_3d(
            feats, jnp.asarray(rois[:, 1:]),
            jnp.asarray(rois[:, 0].astype(np.int32)),
            STRIDES, output_size=5, enlarge_scale=0.2)
        return np.moveaxis(np.asarray(ours), -1, 1), fx["rot_out"]

    def test_full_tensor_correlation(self, pair):
        ours, ref = pair
        corr = np.corrcoef(ours.ravel(), ref.ravel())[0, 1]
        assert corr > 0.97, corr  # measured 0.976

    def test_center_bin_geometry_agrees(self, pair):
        # at the box center the two sampling geometries coincide; only the
        # reference's 7/8-style smoothing scale separates the values
        ours, ref = pair
        oc, rc = ours[:, :, 2, 2, 2].ravel(), ref[:, :, 2, 2, 2].ravel()
        corr = np.corrcoef(oc, rc)[0, 1]
        assert corr > 0.995, corr  # measured 0.999
        scale = (rc @ oc) / (oc @ oc)
        assert 0.78 < scale < 0.93, scale  # measured 0.864; 7/8 = 0.875

    def test_scale_explains_most_deviation(self, pair):
        ours, ref = pair
        a = (ref.ravel() @ ours.ravel()) / (ours.ravel() @ ours.ravel())
        assert 0.78 < a < 0.93, a  # measured 0.830
        res = ref - a * ours
        nrms = np.sqrt((res ** 2).mean()) / ref.std()
        assert nrms < 0.27, nrms  # measured 0.219


@pytest.mark.quick
class TestAABBGolden:
    def test_reference_output_is_mostly_padding(self, fx):
        # documents quirk (2): the reference's pooled AABB features at
        # output_size=5 are dominated by zero padding for typical box sizes
        zero_frac = (fx["aabb_out"] == 0).mean()
        assert 0.45 < zero_frac < 0.75, zero_frac  # measured 0.618

    def test_geometry_adjusted_tracking(self, fx, feats):
        # feed our sampler the reference's *effective* region (0.6x the box,
        # quirk 1) and compare only the reference's non-padding bins
        ra = fx["aabb_rois"]
        refa = fx["aabb_out"]
        lo, hi = ra[:, 1:4], ra[:, 4:7]
        ctr, sz = (lo + hi) / 2, hi - lo
        adj = np.concatenate([ctr - 0.3 * sz, ctr + 0.3 * sz], -1)
        ours = roi_align_3d(
            feats, jnp.asarray(adj), jnp.asarray(ra[:, 0].astype(np.int32)),
            STRIDES, output_size=5, enlarge_scale=0.0)
        ours = np.moveaxis(np.asarray(ours), -1, 1)
        m = refa != 0
        corr = np.corrcoef(ours[m].ravel(), refa[m].ravel())[0, 1]
        assert corr > CORR_AABB_MIN, corr
        nrms = np.sqrt(((ours[m] - refa[m]) ** 2).mean()) / refa[m].std()
        assert nrms < NRMS_AABB_MAX, nrms


# bounds for the masked AABB comparison — measured corr 0.992 / nrms 0.128
# (printed by this file's __main__), i.e. once the reference's two quirks are
# compensated, our sampler tracks its non-padding bins tightly
CORR_AABB_MIN = 0.98
NRMS_AABB_MAX = 0.16


if __name__ == "__main__":
    f = np.load(FIXTURE)
    fts = [jnp.asarray(np.moveaxis(f[f"feat_{i}"], 0, -1)) for i in range(4)]
    ra = f["aabb_rois"]
    refa = f["aabb_out"]
    lo, hi = ra[:, 1:4], ra[:, 4:7]
    ctr, sz = (lo + hi) / 2, hi - lo
    adj = np.concatenate([ctr - 0.3 * sz, ctr + 0.3 * sz], -1)
    ours = roi_align_3d(fts, jnp.asarray(adj),
                        jnp.asarray(ra[:, 0].astype(np.int32)),
                        STRIDES, output_size=5, enlarge_scale=0.0)
    ours = np.moveaxis(np.asarray(ours), -1, 1)
    m = refa != 0
    print("masked corr:", np.corrcoef(ours[m].ravel(), refa[m].ravel())[0, 1])
    print("masked nrms:",
          np.sqrt(((ours[m] - refa[m]) ** 2).mean()) / refa[m].std())
