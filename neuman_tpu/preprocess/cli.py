"""Preprocess stage drivers (called from the generated run.sh)."""

import os

import numpy as np


def load_romp_estimates(romp_output_dir, dump_path):
    """Collect per-frame ROMP npz results into one pickle
    (ref: export_alignment.py:33-63)."""
    import joblib

    if os.path.isfile(dump_path):
        return joblib.load(dump_path)[1]
    est = {
        "verts": [], "joints3d": [], "joints2d_img_coord": [], "pose": [],
        "betas": [],
    }
    for cur, _, files in os.walk(romp_output_dir):
        for file in sorted(files):
            if file.endswith("npz"):
                res = np.load(os.path.join(cur, file), allow_pickle=True)["results"]
                assert len(res) == 1
                res = res[0]
                est["verts"].append(res["verts"])
                est["joints3d"].append(res["j3d_all54"])
                est["joints2d_img_coord"].append(res["pj2d_org"])
                est["pose"].append(res["poses"])
                est["betas"].append(res["betas"])
        break
    for k, v in est.items():
        est[k] = np.array(v).astype(np.float32)
    joblib.dump({1: est}, dump_path)
    return est


def run_alignment(sparse_dir, images_dir, romp_dir):
    """Stage 9: SMPL <-> scene alignment -> alignments.npy."""
    from neuman_tpu.data_io.colmap import ColmapAsciiReader
    from neuman_tpu.preprocess.alignment import export_alignments

    scene = ColmapAsciiReader.read_scene(sparse_dir, images_dir, order="video")
    dump_path = os.path.abspath(os.path.join(romp_dir, "../smpl_output_romp.pkl"))
    raw_smpl = load_romp_estimates(romp_dir, dump_path)
    assert len(raw_smpl["pose"]) == len(scene.captures)
    save_path = os.path.abspath(os.path.join(sparse_dir, "../alignments.npy"))
    export_alignments(scene, raw_smpl, save_path)
    print(f"alignment matrix saved at: {save_path}")


def run_optimize_smpl(scene_dir, num_iters=100):
    """Stage 10: per-frame SMPL refinement -> smpl_output_optimized.pkl."""
    import joblib

    from neuman_tpu.data_io.neuman import NeuManReader
    from neuman_tpu.preprocess.optimize_smpl import optimize_smpl_frame

    scene = NeuManReader.read_scene(scene_dir, smpl_type="romp", normalize=False)
    body_model = NeuManReader._body_model()
    raw_alignments = np.load(
        os.path.join(scene_dir, "alignments.npy"), allow_pickle=True
    ).item()

    raw = joblib.load(os.path.join(scene_dir, "smpl_output_romp.pkl"))
    key = list(raw.keys())[0]
    optimized = {k: np.array(v) for k, v in raw[key].items()}
    for i, cap in enumerate(scene.captures):
        if cap.keypoints is None or cap.densepose is None:
            continue
        align = np.eye(4)
        align[:, :3] = raw_alignments[os.path.basename(cap.image_path)]
        frame_id = int(os.path.basename(cap.image_path)[:-4])
        frame = {
            "pose": optimized["pose"][frame_id],
            "betas": optimized["betas"][frame_id],
        }
        optimized["pose"][frame_id] = optimize_smpl_frame(
            cap, frame, body_model, align, scene.scale, num_iters=num_iters
        )
    out_path = os.path.join(scene_dir, "smpl_output_optimized.pkl")
    joblib.dump({key: optimized}, out_path)
    print(f"optimized SMPL saved at: {out_path}")
