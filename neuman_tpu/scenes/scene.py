"""Scene containers: captures + point cloud (+ SMPL state for NeuMan scenes).

Parity with the reference scenes/scene.py:13-123.
"""

import os


class BaseScene:
    def __init__(self, captures, point_cloud=None):
        self.captures = captures
        self.point_cloud = point_cloud

    def __str__(self):
        s = f"this scene contains {len(self.captures)} captures"
        if self.point_cloud is not None:
            s += f", with {self.point_cloud.shape[0]} points"
        return s

    def read_data_to_ram(self, data_list=("image",)):
        total = 0
        for cap in self.captures:
            if "image" in data_list:
                total += cap.read_image_to_ram()
            if "depth" in data_list:
                total += cap.read_depth_to_ram()
        return total


class ImageFileScene(BaseScene):
    def __init__(self, captures, point_cloud=None):
        super().__init__(captures, point_cloud)
        self.image_path_to_index = {}
        self.fname_to_index_dict = {}
        self._build_index_dicts()

    def __getitem__(self, x):
        if isinstance(x, str):
            if x in self.image_path_to_index:
                return self.captures[self.image_path_to_index[x]]
            return self.captures[self.fname_to_index_dict[x]]
        return self.captures[x]

    def _build_index_dicts(self):
        assert self.captures, "there is no captures"
        for i, cap in enumerate(self.captures):
            assert cap.image_path not in self.image_path_to_index, "image already exists"
            self.image_path_to_index[cap.image_path] = i
            fname = os.path.basename(cap.image_path)
            assert fname not in self.fname_to_index_dict, "image already exists"
            self.fname_to_index_dict[fname] = i


class RigCameraScene(ImageFileScene):
    def __init__(self, captures, num_views, num_cams, point_cloud=None):
        super().__init__(captures, point_cloud)
        self.num_views = num_views
        self.num_cams = num_cams
        self.view_id_to_index = {}
        self.cam_id_to_index = {}
        self._build_id_to_index_dict()

    def __str__(self):
        s = (
            f"this scene is captured by a {self.num_cams} cameras rig, has "
            f"{self.num_views} views, and in total {len(self.captures)} captures"
        )
        if self.point_cloud is not None:
            s += f", with {self.point_cloud.shape[0]} points"
        return s

    def get_captures_by_view_id(self, view_id):
        assert view_id < self.num_views
        return [self.captures[i] for i in self.view_id_to_index[view_id]]

    def get_captures_by_cam_id(self, cam_id):
        assert cam_id < self.num_cams
        return [self.captures[i] for i in self.cam_id_to_index[cam_id]]

    def get_capture_by_view_cam_id(self, view_id, cam_id):
        assert view_id < self.num_views and cam_id < self.num_cams
        idx = list(
            set(self.cam_id_to_index[cam_id]) & set(self.view_id_to_index[view_id])
        )
        assert len(idx) == 1
        return self.captures[idx[0]]

    def _build_id_to_index_dict(self):
        assert self.captures, "there is no captures"
        for i, cap in enumerate(self.captures):
            assert cap.view_id < self.num_views
            assert cap.cam_id < self.num_cams
            self.view_id_to_index.setdefault(cap.view_id, []).append(i)
            self.cam_id_to_index.setdefault(cap.cam_id, []).append(i)
