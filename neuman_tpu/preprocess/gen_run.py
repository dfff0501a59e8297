#!/usr/bin/env python
"""Emit `run.sh` orchestrating the 10-stage preprocessing pipeline.

Parity with the reference preprocess/gen_run.py:26-164. Stages 1-8 invoke
the same external tools (cv2 frame dump, Detectron2 masks, COLMAP SfM+MVS,
DensePose, mmpose keypoints, BoostingMonocularDepth, ROMP) — these are not
rebuilt (SURVEY.md §2.9: their outputs are the input contract). Stages 9-10
(SMPL alignment + pose refinement) route through the TPU-native ports in
neuman_tpu.preprocess.alignment / optimize_smpl instead of the reference's
open3d/pytorch3d implementations.
"""

import argparse
import os


def build_commands(opt):
    video_name = os.path.basename(opt.video).split(".")[0]
    video_dir = os.path.dirname(os.path.abspath(opt.video))
    scene = os.path.join(video_dir, video_name)
    out = os.path.join(scene, "output")
    code = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
    steps = 10
    c = ["#!/bin/bash", "set -e"]

    def banner(i, title):
        c.append("echo ========================================")
        c.append(f"echo {i}/{steps}: {title}")
        c.append("echo ========================================")

    banner(1, "Extract frames")
    c.append(
        f"python {code}/neuman_tpu/preprocess/save_video_frames.py "
        f"--video {opt.video} --save_to {scene}/raw_720p "
        f"--width 1280 --height 720 --every 10"
    )

    banner(2, "Masks (Detectron2, external)")
    c.append(
        f"# detectron2 demo.py --input {scene}/raw_720p/*.png "
        f"--output {scene}/raw_masks (external tool)"
    )

    banner(3, "Sparse + dense reconstruction (COLMAP, external)")
    for cmd in [
        f"cd {scene}",
        "mkdir -p recon/sparse recon/dense",
        "colmap feature_extractor --database_path ./recon/db.db --image_path ./raw_720p --ImageReader.mask_path ./raw_masks --SiftExtraction.estimate_affine_shape=true --SiftExtraction.domain_size_pool=true --ImageReader.camera_model SIMPLE_RADIAL --ImageReader.single_camera 1",
        "colmap exhaustive_matcher --database_path ./recon/db.db --SiftMatching.guided_matching=true",
        "colmap mapper --database_path ./recon/db.db --image_path ./raw_720p --output_path ./recon/sparse",
        'if [ -d "./recon/sparse/1" ]; then echo "Bad reconstruction"; exit 1; fi',
        "colmap image_undistorter --image_path raw_720p --input_path ./recon/sparse/0/ --output_path ./recon/dense",
        "colmap patch_match_stereo --workspace_path ./recon/dense",
        "colmap model_converter --input_path ./recon/dense/sparse/ --output_path ./recon/dense/sparse --output_type=TXT",
        "mkdir -p ./output",
        "cp -r ./recon/dense/images ./output/images",
        "cp -r ./recon/dense/stereo/depth_maps ./output/depth_maps",
        "cp -r ./recon/dense/sparse ./output/sparse",
    ]:
        c.append(cmd)

    banner(4, "Masks for rectified images (Detectron2, external)")
    c.append(f"# detectron2 -> {out}/segmentations (external tool)")
    banner(5, "DensePose (external)")
    c.append(f"# densepose -> {out}/densepose/dp_*.npy (external tool)")
    banner(6, "2D keypoints (mmpose, external)")
    c.append(f"# mmpose -> {out}/keypoints/*.npy (external tool)")
    banner(7, "Monocular depth (BoostingMonocularDepth, external)")
    c.append(f"# mono depth -> {out}/mono_depth (external tool)")
    banner(8, "SMPL estimates (ROMP, external)")
    c.append(f"# ROMP -> {scene}/romp (external tool)")

    banner(9, "SMPL-scene alignment (neuman_tpu native)")
    c.append(
        f"python -c \"import sys; sys.path.insert(0, '{code}');"
        f"from neuman_tpu.preprocess.cli import run_alignment;"
        f"run_alignment('{out}/sparse', '{out}/images', '{scene}/romp')\""
    )
    banner(10, "SMPL pose optimization (neuman_tpu native)")
    c.append(
        f"python -c \"import sys; sys.path.insert(0, '{code}');"
        f"from neuman_tpu.preprocess.cli import run_optimize_smpl;"
        f"run_optimize_smpl('{out}')\""
    )
    return c


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--video", required=True, type=str)
    opt = parser.parse_args()
    cmds = build_commands(opt)
    with open("run.sh", "w") as f:
        f.write("\n".join(cmds) + "\n")
    print("wrote run.sh")


if __name__ == "__main__":
    main()
