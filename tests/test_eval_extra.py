"""proposal_precision + split_hypersim_dataset (reference: nerf_rpn/eval.py:84,
nerf_rpn/datasets.py:453)."""

import numpy as np
import pytest

from nerf_mae_tpu.data.datasets import split_hypersim_dataset
from nerf_mae_tpu.eval.detection import proposal_precision

pytestmark = pytest.mark.quick


def _box(x0, y0, z0, x1, y1, z1):
    return [x0, y0, z0, x1, y1, z1]


def test_precision_perfect_detections():
    gts = [np.array([_box(0, 0, 0, 10, 10, 10), _box(20, 20, 20, 30, 30, 30)],
                    np.float32)]
    props = [gts[0].copy()]
    scores = [np.array([0.9, 0.8], np.float32)]
    out = proposal_precision(props, scores, gts)
    assert out["num_det"] == 2
    np.testing.assert_allclose(out["precisions"], 1.0)
    assert out["ap"] == pytest.approx(1.0)


def test_precision_counts_unmatched_detections():
    gts = [np.array([_box(0, 0, 0, 10, 10, 10)], np.float32)]
    # one perfect, one in empty space
    props = [np.array([_box(0, 0, 0, 10, 10, 10),
                       _box(50, 50, 50, 60, 60, 60)], np.float32)]
    scores = [np.array([0.9, 0.8], np.float32)]
    out = proposal_precision(props, scores, gts)
    assert out["num_det"] == 2
    np.testing.assert_allclose(out["precisions"], 0.5)


def test_precision_score_thresh_and_limit():
    gts = [np.array([_box(0, 0, 0, 10, 10, 10)], np.float32)]
    props = [np.array([_box(0, 0, 0, 10, 10, 10),
                       _box(50, 50, 50, 60, 60, 60)], np.float32)]
    scores = [np.array([0.9, 0.1], np.float32)]
    out = proposal_precision(props, scores, gts, score_thresh=0.5)
    assert out["num_det"] == 1
    np.testing.assert_allclose(out["precisions"], 1.0)
    out = proposal_precision(props, scores, gts, limit=1)
    assert out["num_det"] == 1


def test_precision_greedy_matching_consumes_gt():
    # two detections on the same GT: only the better one matches
    gts = [np.array([_box(0, 0, 0, 10, 10, 10)], np.float32)]
    props = [np.array([_box(0, 0, 0, 10, 10, 10),
                       _box(0, 0, 0, 10, 10, 9)], np.float32)]
    scores = [np.array([0.9, 0.8], np.float32)]
    out = proposal_precision(props, scores, gts,
                             thresholds=np.array([0.85], np.float32))
    # first det IoU 1.0 >= .85; second det's gt is used -> coverage 0
    np.testing.assert_allclose(out["precisions"], [0.5])


def test_split_hypersim(tmp_path):
    scenes = [f"scene_{i}" for i in range(10)]
    out = split_hypersim_dataset(scenes, 0.6, 0.2, str(tmp_path), seed=0)
    z = np.load(out)
    tr, va, te = z["train_scenes"], z["val_scenes"], z["test_scenes"]
    assert len(tr) == 6 and len(va) == 2 and len(te) == 2
    assert sorted([*tr, *va, *te]) == sorted(scenes)
    # deterministic given a seed
    out2 = split_hypersim_dataset(scenes, 0.6, 0.2, str(tmp_path), seed=0)
    z2 = np.load(out2)
    assert list(z2["train_scenes"]) == list(tr)
    with pytest.raises(AssertionError):
        split_hypersim_dataset(scenes, 0.8, 0.3, str(tmp_path))
