#!/usr/bin/env python
"""Corpus curation helpers for instant-ngp-style scene trees.

One CLI covering the reference's three ad-hoc HM3D curation scripts, with
the same on-disk effect (scene trees of `<scene>/train/transforms.json` +
`<scene>/train/images/`):

  split-val        carve a val split out of each scene's train frames and
                   (optionally) downsample the train frames
                   (reference: data/hm3d/move_half_images.py:1-118 — every
                   `--downsample`-th frame stays in train; val takes the
                   frames at (every `--val_downsample`-th index)+2, capped
                   at 10, removed from train)
  copy-transforms  copy each scene's train/transforms.json into the same
                   scene of another corpus tree
                   (reference: data/hm3d/copy_transforms.py:1-30)
  merge-room-bbox  graft the `room_bbox` key from a donor tree's
                   transforms.json into the target tree's
                   (reference: data/hm3d/copy_room_boxes.py:1-39)

Unlike the reference scripts (hardcoded paths, in-place rewrites), every
subcommand takes explicit directories and supports --dry_run.
"""

import argparse
import json
import os
import shutil
import sys


def _scenes(root):
    return sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )


def _numeric_part(name):
    digits = "".join(filter(str.isdigit, name))
    return int(digits) if digits else -1


def split_val(args):
    n_scenes = 0
    for scene in _scenes(args.root):
        train_dir = os.path.join(args.root, scene, "train")
        tpath = os.path.join(train_dir, "transforms.json")
        if not os.path.isfile(tpath):
            continue
        with open(tpath) as f:
            data = json.load(f)
        image_dir = os.path.join(train_dir, "images")
        images = sorted(
            (
                f for f in os.listdir(image_dir)
                if f.endswith((".jpg", ".png"))
            ),
            key=_numeric_part,
        ) if os.path.isdir(image_dir) else sorted(
            os.path.basename(fr["file_path"]) for fr in data["frames"]
        )
        train_set = set(images[:: args.downsample])
        # the reference's val rule verbatim: every val_downsample-th index,
        # shifted by +2, last two dropped, first 10 kept
        idx = [j + 2 for j in range(len(images)) if j % args.val_downsample == 0]
        idx = [j for j in idx[:-2] if j < len(images)]
        val_set = [images[j] for j in idx][:10]
        train_frames, val_frames = [], []
        for frame in data["frames"]:
            name = os.path.basename(frame["file_path"])
            frame = dict(frame, file_path=os.path.join("images", name))
            if name in val_set:
                val_frames.append(frame)
            elif name in train_set:
                train_frames.append(frame)
        if args.dry_run:
            print(f"{scene}: train {len(train_frames)} val {len(val_frames)}")
            continue
        with open(tpath, "w") as f:
            json.dump(dict(data, frames=train_frames), f, indent=4)
        val_dir = os.path.join(args.root, scene, "val")
        os.makedirs(val_dir, exist_ok=True)
        with open(os.path.join(val_dir, "transforms.json"), "w") as f:
            json.dump(dict(data, frames=val_frames), f, indent=4)
        n_scenes += 1
    print(f"split {n_scenes} scenes")


def copy_transforms(args):
    n = 0
    for scene in _scenes(args.src):
        src = os.path.join(args.src, scene, "train", "transforms.json")
        dst_dir = os.path.join(args.dst, scene, "train")
        if not os.path.isfile(src) or not os.path.isdir(dst_dir):
            continue
        if args.dry_run:
            print(f"{src} -> {dst_dir}")
            continue
        shutil.copy(src, dst_dir)
        n += 1
    print(f"copied {n} transforms.json")


def merge_room_bbox(args):
    n = 0
    for scene in _scenes(args.dst):
        dst = os.path.join(args.dst, scene, "train", "transforms.json")
        src = os.path.join(args.src, scene, "train", "transforms.json")
        if not (os.path.isfile(src) and os.path.isfile(dst)):
            continue
        with open(src) as f:
            bbox = json.load(f).get("room_bbox")
        if args.dry_run:
            print(f"{scene}: room_bbox {'found' if bbox else 'MISSING'}")
            continue
        with open(dst) as f:
            data = json.load(f)
        data["room_bbox"] = bbox
        with open(dst, "w") as f:
            json.dump(data, f, indent=4)
        n += 1
    print(f"merged room_bbox into {n} scenes")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = ap.add_subparsers(dest="cmd", required=True)

    sv = sub.add_parser("split-val")
    sv.add_argument("--root", required=True, help="corpus of scene dirs")
    sv.add_argument("--downsample", type=int, default=1)
    sv.add_argument("--val_downsample", type=int, default=10)
    sv.add_argument("--dry_run", action="store_true")
    sv.set_defaults(fn=split_val)

    cp = sub.add_parser("copy-transforms")
    cp.add_argument("--src", required=True)
    cp.add_argument("--dst", required=True)
    cp.add_argument("--dry_run", action="store_true")
    cp.set_defaults(fn=copy_transforms)

    mb = sub.add_parser("merge-room-bbox")
    mb.add_argument("--src", required=True, help="donor tree with room_bbox")
    mb.add_argument("--dst", required=True, help="tree to update in place")
    mb.add_argument("--dry_run", action="store_true")
    mb.set_defaults(fn=merge_room_bbox)

    args = ap.parse_args(argv)
    args.fn(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
