"""NeuMan scene reader: COLMAP parse -> near/far -> normalization -> SMPL.

Behavioral parity with the reference data_io/neuman_helper.py:149-397:

- per-capture near/far: background from the projected COLMAP point cloud
  (near=0, far=95th percentile), human from projected posed SMPL verts
  (min/max), both extended by `range_scale` around their center;
- global scene normalization `scale = 3.14 / percentile(fars, 95)` applied to
  camera centers, depth scales, and the point cloud;
- `read_smpls`: per-frame Da-pose -> `T_da2scene = scaleEye @ alignment.T @
  T_t2pose @ inv(T_t2da)` and world verts/joints;
- 80/10/10 interleaved train/val/test split files.

The SMPL math runs through the JAX body model (neuman_tpu/models/smpl.py).
"""

import os

import numpy as np

from neuman_tpu.cameras.capture import Capture
from neuman_tpu.data_io.colmap import ColmapAsciiReader
from neuman_tpu.geometry import pcd
from neuman_tpu.models import smpl as smpl_module
from neuman_tpu.scenes.scene import RigCameraScene


def default_data_root():
    env = os.environ.get("NEUMAN_DATA_ROOT")
    if env:
        return env
    return os.path.join(
        os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")), "data"
    )


def default_smpl_path():
    return os.path.join(default_data_root(), "smplx", "smpl")


def to_homogeneous(pts):
    return np.concatenate([pts, np.ones_like(pts[..., 0:1])], axis=-1)


def read_obj(path):
    """Parse a wavefront obj with UVs (ref: utils/utils.py:198-222)."""
    vert, uvs, faces = [], [], []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if line[:2] == "v ":
                vert.append(np.array([float(i) for i in line[2:].split()]))
            elif line[:3] == "vt ":
                uvs.append(np.array([float(i) for i in line[3:].split()]))
            elif line[:2] == "f ":
                fs = line[2:].split()
                fv = [int(i.split("/")[0]) for i in fs]
                ft = [int(i.split("/")[1]) for i in fs]
                faces.append(np.array(fv + ft))
    return np.array(vert), np.array(uvs), np.array(faces) - 1


def read_text(txt_file):
    assert os.path.isfile(txt_file)
    with open(txt_file, "r") as fid:
        return [line.strip() for line in fid if line.strip()]


def create_split_files(scene_dir):
    """80/10/10 interleaved train/val/test split (ref: neuman_helper.py:149-176)."""
    dummy_scene = NeuManReader.read_scene(scene_dir)
    scene_length = len(dummy_scene.captures)
    num_val = scene_length // 5
    length = int(1 / num_val * scene_length)
    offset = length // 2
    val_list = list(range(scene_length))[offset::length]
    train_list = list(set(range(scene_length)) - set(val_list))
    test_list = val_list[: len(val_list) // 2]
    val_list = val_list[len(val_list) // 2:]
    assert len(train_list) > 0 and len(test_list) > 0 and len(val_list) > 0
    splits = []
    for lst, split in zip([train_list, val_list, test_list], ["train", "val", "test"]):
        save_path = os.path.join(scene_dir, f"{split}_split.txt")
        with open(save_path, "w") as f:
            for i, cap in enumerate(dummy_scene.captures):
                if i in lst:
                    f.write(os.path.basename(cap.image_path) + "\n")
        splits.append(save_path)
    return splits


class NeuManReader:
    @classmethod
    def read_scene(
        cls,
        scene_dir,
        tgt_size=None,
        normalize=False,
        bkg_range_scale=1.1,
        human_range_scale=1.1,
        mask_dir="segmentations",
        smpl_type="romp",
        keypoints_dir="keypoints",
        densepose_dir="densepose",
        smpl_model_path=None,
    ):
        def update_near_far(scene, keys, range_scale):
            for view_id in range(scene.num_views):
                for cam_id in range(scene.num_cams):
                    cap = scene.get_capture_by_view_cam_id(view_id, cam_id)
                    for k in keys:
                        if k == "bkg":
                            pcd_2d = pcd.project_point_cloud_at_capture(
                                scene.point_cloud, cap, render_type="pcd"
                            )
                            near = 0
                            far = np.percentile(pcd_2d[:, 2], 95)
                        elif k == "human":
                            pcd_2d = pcd.project_point_cloud_at_capture(
                                scene.verts[view_id], cap, render_type="pcd"
                            )
                            near = pcd_2d[:, 2].min()
                            far = pcd_2d[:, 2].max()
                        else:
                            raise ValueError(k)
                        center = (near + far) / 2
                        length = (far - near) * range_scale
                        cap.near[k] = max(0.0, float(center - length / 2))
                        cap.far[k] = float(center + length / 2)

        captures, point_cloud, num_views, num_cams = cls.read_captures(
            scene_dir,
            tgt_size,
            mask_dir=mask_dir,
            keypoints_dir=keypoints_dir,
            densepose_dir=densepose_dir,
        )
        scene = RigCameraScene(captures, num_views, num_cams)
        scene.point_cloud = point_cloud
        update_near_far(scene, ["bkg"], bkg_range_scale)

        if normalize:
            fars = np.array([cap.far["bkg"] for cap in scene.captures])
            scale = 3.14 / np.percentile(fars, 95)
            for cap in scene.captures:
                cap.cam_pose.camera_center_in_world = (
                    cap.cam_pose.camera_center_in_world * scale
                )
                cap.near["bkg"], cap.far["bkg"] = (
                    cap.near["bkg"] * scale,
                    cap.far["bkg"] * scale,
                )
                cap.captured_depth.scale = scale
                if cap.captured_mono_depth is not None:
                    cap.captured_mono_depth.scale = scale
            scene.point_cloud[:, :3] *= scale
        else:
            scale = 1

        scene.scale = scale
        smpls, world_verts, static_verts, Ts = cls.read_smpls(
            scene_dir,
            scene.captures,
            scale=scale,
            smpl_type=smpl_type,
            smpl_model_path=smpl_model_path,
        )
        scene.smpls, scene.verts, scene.static_vert, scene.Ts = (
            smpls,
            world_verts,
            static_verts,
            Ts,
        )
        uv_obj = os.path.join(default_data_root(), "smplx", "smpl_uv.obj")
        if os.path.isfile(uv_obj):
            _, uvs, faces = read_obj(uv_obj)
            scene.uvs, scene.faces = uvs, faces.astype(np.int64)
        else:
            # UVs are only needed for texture tooling; fall back to the body
            # model's triangulation (faces[:, :3] is all downstream code uses).
            scene.uvs = None
            model = cls._body_model(smpl_model_path)
            scene.faces = np.concatenate([model.faces, model.faces], axis=1).astype(
                np.int64
            )
        update_near_far(scene, ["human"], human_range_scale)
        assert len(scene.captures) > 0
        return scene

    _cached_body_model = {}

    @classmethod
    def _body_model(cls, smpl_model_path=None):
        path = smpl_model_path or default_smpl_path()
        if path not in cls._cached_body_model:
            cls._cached_body_model[path] = smpl_module.load_smpl(path, "neutral")
        return cls._cached_body_model[path]

    @classmethod
    def read_smpls(cls, scene_dir, caps, scale=1, smpl_type="romp", smpl_model_path=None):
        import joblib

        def extract_smpl_at_frame(raw_smpl, frame_id):
            out = {}
            for k, v in raw_smpl.items():
                try:
                    out[k] = v[frame_id]
                except (IndexError, KeyError, TypeError):
                    out[k] = None
            return out

        import jax

        model = cls._body_model(smpl_model_path)
        smpls, static_verts, world_verts, Ts = [], [], [], []
        smpl_path = os.path.join(scene_dir, f"smpl_output_{smpl_type}.pkl")
        assert os.path.isfile(smpl_path), f"{smpl_path} is missing"
        raw_smpl = joblib.load(smpl_path)
        assert len(raw_smpl) == 1
        raw_smpl = raw_smpl[list(raw_smpl.keys())[0]]
        raw_alignments = np.load(
            os.path.join(scene_dir, "alignments.npy"), allow_pickle=True
        ).item()
        da_smpl = smpl_module.da_pose_vector(model.num_joints)

        @jax.jit
        def frame_tensors(pose, betas):
            """One compile, many frames: all per-frame SMPL tensors."""
            _, t_t2pose = smpl_module.verts_transformations(
                model, pose, betas, concat_joints=True
            )
            _, t_t2da = smpl_module.verts_transformations(
                model, da_smpl, betas, concat_joints=True
            )
            dav, daj = smpl_module.smpl_forward(model, da_smpl, betas)
            return t_t2pose[0], t_t2da[0], dav[0], daj[0]

        for cap in caps:
            frame_id = int(os.path.basename(cap.image_path)[:-4])
            temp_smpl = extract_smpl_at_frame(raw_smpl, frame_id)
            temp_alignment = np.eye(4)
            temp_alignment[:, :3] = raw_alignments[os.path.basename(cap.image_path)]

            T_t2pose, T_t2da, da_verts, da_joints = frame_tensors(
                np.asarray(temp_smpl["pose"][None], dtype=np.float32),
                np.asarray(temp_smpl["betas"][None], dtype=np.float32),
            )
            T_t2pose = np.asarray(T_t2pose)
            T_t2da = np.asarray(T_t2da)
            da_verts = np.asarray(da_verts)
            da_joints = np.asarray(da_joints)
            T_da2pose = T_t2pose @ np.linalg.inv(T_t2da)
            T_da2scene = temp_alignment.T @ T_da2pose
            s = np.eye(4)
            s[:3, :3] *= scale
            T_da2scene = s @ T_da2scene

            temp_world = np.einsum(
                "BNi,Bi->BN",
                T_da2scene,
                to_homogeneous(np.concatenate([da_verts, da_joints], axis=0)),
            )[:, :3].astype(np.float32)
            nv = model.num_verts
            temp_world_verts, temp_world_joints = temp_world[:nv], temp_world[nv:]
            temp_smpl["joints_3d"] = temp_world_joints
            temp_smpl["static_joints_3d"] = da_joints
            smpls.append(temp_smpl)
            Ts.append(T_da2scene)
            static_verts.append(da_verts)
            world_verts.append(temp_world_verts)
        return smpls, world_verts, static_verts, Ts

    @classmethod
    def read_captures(
        cls, scene_dir, tgt_size, mask_dir="segmentations", keypoints_dir="keypoints", densepose_dir="densepose"
    ):
        caps = []
        raw_scene = ColmapAsciiReader.read_scene(
            os.path.join(scene_dir, "sparse"),
            os.path.join(scene_dir, "images"),
            tgt_size=None,  # cameras resized below via Capture(tgt_size)
            order="video",
        )
        num_views = len(raw_scene.captures)
        num_cams = 1
        for view_id in range(num_views):
            raw_cap = raw_scene.captures[view_id]
            depth_path = (
                raw_cap.image_path.replace("/images/", "/depth_maps/")
                + ".geometric.bin"
            )
            mono_depth_path = raw_cap.image_path.replace("/images/", "/mono_depth/")
            if not os.path.isfile(depth_path):
                depth_path = raw_cap.image_path + "dummy"
            if not os.path.isfile(mono_depth_path):
                mono_depth_path = raw_cap.image_path + "dummy"
            fname = os.path.basename(raw_cap.image_path)
            mask_path = os.path.join(scene_dir, mask_dir, fname + ".npy")
            if not os.path.isfile(mask_path):
                mask_path = os.path.join(scene_dir, mask_dir, fname)
            keypoints_path = os.path.join(scene_dir, keypoints_dir, fname + ".npy")
            if not os.path.isfile(keypoints_path):
                keypoints_path = None
            densepose_path = os.path.join(scene_dir, densepose_dir, "dp_" + fname + ".npy")
            if not os.path.isfile(densepose_path):
                densepose_path = None
            cap = Capture(
                raw_cap.image_path,
                depth_path,
                mask_path,
                raw_cap.pinhole_cam,
                raw_cap.cam_pose,
                view_id=view_id,
                cam_id=0,
                tgt_size=tgt_size,
                mono_depth_path=mono_depth_path,
                keypoints_path=keypoints_path,
                densepose_path=densepose_path,
            )
            cap.frame_id = raw_cap.frame_id
            caps.append(cap)
        return caps, raw_scene.point_cloud, num_views, num_cams
