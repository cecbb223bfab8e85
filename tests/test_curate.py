"""scripts/curate_transforms.py — the reference's HM3D curation helpers
(move_half_images.py / copy_transforms.py / copy_room_boxes.py) as one CLI."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import curate_transforms


def _make_scene(root, name, n_frames, room_bbox=None):
    train = os.path.join(root, name, "train")
    os.makedirs(os.path.join(train, "images"), exist_ok=True)
    frames = []
    for i in range(n_frames):
        fname = f"rgb_{i:04d}.png"
        open(os.path.join(train, "images", fname), "w").close()
        frames.append({"file_path": f"images/{fname}",
                       "transform_matrix": [[float(i)] * 4] * 4})
    data = {"fl_x": 500.0, "frames": frames}
    if room_bbox is not None:
        data["room_bbox"] = room_bbox
    with open(os.path.join(train, "transforms.json"), "w") as f:
        json.dump(data, f)
    return train


@pytest.mark.quick
def test_split_val_reference_rule(tmp_path):
    root = str(tmp_path)
    _make_scene(root, "scene_a", 40)
    curate_transforms.main(["split-val", "--root", root,
                            "--val_downsample", "10"])
    with open(tmp_path / "scene_a" / "train" / "transforms.json") as f:
        train = json.load(f)
    with open(tmp_path / "scene_a" / "val" / "transforms.json") as f:
        val = json.load(f)
    # reference rule on 40 frames, val_downsample 10: indices {0,10,20,30}
    # shifted +2 -> {2,12,22,32}, last two dropped -> {2,12}
    val_names = [os.path.basename(fr["file_path"]) for fr in val["frames"]]
    assert val_names == ["rgb_0002.png", "rgb_0012.png"]
    train_names = {os.path.basename(fr["file_path"]) for fr in train["frames"]}
    assert not train_names & set(val_names)
    assert len(train_names) == 38
    assert train["fl_x"] == 500.0 and val["fl_x"] == 500.0


@pytest.mark.quick
def test_split_val_downsample(tmp_path):
    root = str(tmp_path)
    _make_scene(root, "s", 20)
    curate_transforms.main(["split-val", "--root", root, "--downsample", "2",
                            "--val_downsample", "5"])
    with open(tmp_path / "s" / "train" / "transforms.json") as f:
        train = json.load(f)
    # every 2nd frame kept, minus whatever went to val
    names = [os.path.basename(fr["file_path"]) for fr in train["frames"]]
    assert all(int(n[4:8]) % 2 == 0 for n in names)


@pytest.mark.quick
def test_copy_transforms_and_merge_room_bbox(tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _make_scene(src, "sc", 3, room_bbox=[[0, 0, 0], [2, 2, 2]])
    _make_scene(dst, "sc", 3)
    _make_scene(dst, "only_dst", 2)

    curate_transforms.main(["merge-room-bbox", "--src", src, "--dst", dst])
    with open(tmp_path / "dst" / "sc" / "train" / "transforms.json") as f:
        assert json.load(f)["room_bbox"] == [[0, 0, 0], [2, 2, 2]]
    with open(tmp_path / "dst" / "only_dst" / "train" / "transforms.json") as f:
        assert "room_bbox" not in json.load(f)  # no donor -> untouched

    curate_transforms.main(["copy-transforms", "--src", src, "--dst", dst])
    with open(tmp_path / "dst" / "sc" / "train" / "transforms.json") as f:
        assert "room_bbox" in json.load(f)  # src copy carries the bbox


@pytest.mark.quick
def test_dry_run_touches_nothing(tmp_path):
    root = str(tmp_path)
    train = _make_scene(root, "s", 12)
    before = open(os.path.join(train, "transforms.json")).read()
    curate_transforms.main(["split-val", "--root", root, "--dry_run"])
    assert open(os.path.join(train, "transforms.json")).read() == before
    assert not os.path.isdir(os.path.join(root, "s", "val"))
