"""Dataset loaders (TUM-RGBD, Bonn, 7-Scenes, RGB-only, Replica/ScanNet).

Port of src/utils/datasets.py:63-483 (numpy/cv2, no torch): images are
resized to (W_out + 2*W_edge, H_out + 2*H_edge), edges cropped, intrinsics
rescaled accordingly. Returns (index, color (H, W, 3) float RGB in [0,1],
depth (H, W) or None, pose 4x4 c2w or None).
"""

from __future__ import annotations

import glob
import math
import os
from typing import Optional

import cv2
import numpy as np


def as_intrinsics_matrix(intrinsics):
    K = np.eye(3)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = intrinsics
    return K


def focal2fov(focal, pixels):
    return 2 * math.atan(pixels / (2 * focal))


class BaseDataset:
    def __init__(self, cfg):
        self.name = cfg["dataset"]
        self.png_depth_scale = cfg["cam"]["png_depth_scale"]
        self.n_img = -1
        self.depth_paths = None
        self.color_paths = None
        self.poses = None

        cam = cfg["cam"]
        self.H, self.W = cam["H"], cam["W"]
        self.fx_orig, self.fy_orig = cam["fx"], cam["fy"]
        self.cx_orig, self.cy_orig = cam["cx"], cam["cy"]
        self.H_out, self.W_out = cam["H_out"], cam["W_out"]
        self.H_edge, self.W_edge = cam["H_edge"], cam["W_edge"]

        self.H_out_with_edge = self.H_out + self.H_edge * 2
        self.W_out_with_edge = self.W_out + self.W_edge * 2

        intr = np.array([self.fx_orig, self.fy_orig, self.cx_orig,
                         self.cy_orig], np.float64)
        intr[0] *= self.W_out_with_edge / self.W
        intr[1] *= self.H_out_with_edge / self.H
        intr[2] *= self.W_out_with_edge / self.W
        intr[3] *= self.H_out_with_edge / self.H
        intr[2] -= self.W_edge
        intr[3] -= self.H_edge
        self.intrinsic = intr
        self.fx, self.fy, self.cx, self.cy = intr
        self.fovx = focal2fov(self.fx, self.W_out)
        self.fovy = focal2fov(self.fy, self.H_out)

        self.distortion = (np.array(cam["distortion"])
                           if "distortion" in cam else None)

        self.input_folder = cfg["data"]["input_folder"]
        if "ROOT_FOLDER_PLACEHOLDER" in self.input_folder:
            self.input_folder = self.input_folder.replace(
                "ROOT_FOLDER_PLACEHOLDER", cfg["data"]["root_folder"])

    def __len__(self):
        return self.n_img

    def get_color(self, index):
        color = cv2.imread(self.color_paths[index])
        if self.distortion is not None:
            K = as_intrinsics_matrix(
                [self.fx_orig, self.fy_orig, self.cx_orig, self.cy_orig])
            color = cv2.undistort(color, K, self.distortion)
        color = cv2.resize(color, (self.W_out_with_edge,
                                   self.H_out_with_edge))
        color = color[..., ::-1].astype(np.float32) / 255.0  # BGR -> RGB
        if self.W_edge > 0:
            color = color[:, self.W_edge:-self.W_edge]
        if self.H_edge > 0:
            color = color[self.H_edge:-self.H_edge]
        return np.ascontiguousarray(color)

    def get_depth(self, index) -> Optional[np.ndarray]:
        if self.depth_paths is None:
            return None
        path = self.depth_paths[index]
        depth = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        depth = depth.astype(np.float32) / self.png_depth_scale
        depth = cv2.resize(depth, (self.W_out_with_edge,
                                   self.H_out_with_edge),
                           interpolation=cv2.INTER_NEAREST)
        if self.W_edge > 0:
            depth = depth[:, self.W_edge:-self.W_edge]
        if self.H_edge > 0:
            depth = depth[self.H_edge:-self.H_edge]
        return depth

    def __getitem__(self, index):
        color = self.get_color(index)
        depth = self.get_depth(index)
        pose = (self.poses[index] if self.poses is not None else None)
        return index, color, depth, pose


class TUM_RGBD(BaseDataset):
    """TUM RGB-D association-file loader (datasets.py:297-413)."""

    def __init__(self, cfg, frame_rate=60):  # kept high to use all frames
        super().__init__(cfg)
        self.color_paths, self.depth_paths, self.poses = self.loadtum(
            self.input_folder, frame_rate=frame_rate)
        self.n_img = len(self.color_paths)

    def parse_list(self, filepath, skiprows=0):
        return np.loadtxt(filepath, delimiter=" ", dtype=str,
                          skiprows=skiprows)

    def associate_frames(self, tstamp_image, tstamp_depth, tstamp_pose,
                         max_dt=0.08):
        associations = []
        for i, t in enumerate(tstamp_image):
            if tstamp_pose is None:
                j = np.argmin(np.abs(tstamp_depth - t))
                if np.abs(tstamp_depth[j] - t) < max_dt:
                    associations.append((i, j))
            else:
                j = np.argmin(np.abs(tstamp_depth - t))
                k = np.argmin(np.abs(tstamp_pose - t))
                if (np.abs(tstamp_depth[j] - t) < max_dt and
                        np.abs(tstamp_pose[k] - t) < max_dt):
                    associations.append((i, j, k))
        return associations

    def loadtum(self, datapath, frame_rate=-1):
        if os.path.isfile(os.path.join(datapath, "groundtruth.txt")):
            pose_list = os.path.join(datapath, "groundtruth.txt")
        elif os.path.isfile(os.path.join(datapath, "pose.txt")):
            pose_list = os.path.join(datapath, "pose.txt")
        else:
            pose_list = None

        image_list = os.path.join(datapath, "rgb.txt")
        depth_list = os.path.join(datapath, "depth.txt")

        image_data = self.parse_list(image_list, skiprows=3)
        depth_data = self.parse_list(depth_list, skiprows=3)
        tstamp_image = image_data[:, 0].astype(np.float64)
        tstamp_depth = depth_data[:, 0].astype(np.float64)

        if pose_list is not None:
            pose_data = self.parse_list(pose_list, skiprows=3)
            pose_vecs = pose_data[:, 1:].astype(np.float64)
            tstamp_pose = pose_data[:, 0].astype(np.float64)
        else:
            pose_vecs, tstamp_pose = None, None

        associations = self.associate_frames(tstamp_image, tstamp_depth,
                                             tstamp_pose)

        indices = [0]
        for i in range(1, len(associations)):
            t0 = tstamp_image[associations[indices[-1]][0]]
            t1 = tstamp_image[associations[i][0]]
            if t1 - t0 > 1.0 / frame_rate:
                indices.append(i)

        images, poses, depths = [], [], []
        inv_pose = None
        for ix in indices:
            a = associations[ix]
            images.append(os.path.join(datapath, image_data[a[0], 1]))
            depths.append(os.path.join(datapath, depth_data[a[1], 1]))
            if pose_vecs is not None:
                c2w = self.pose_matrix_from_quaternion(pose_vecs[a[2]])
                if inv_pose is None:
                    inv_pose = np.linalg.inv(c2w)
                    c2w = np.eye(4)
                else:
                    c2w = inv_pose @ c2w
                poses.append(c2w.astype(np.float32))

        return images, depths, (poses if poses else None)

    @staticmethod
    def pose_matrix_from_quaternion(pvec):
        from scipy.spatial.transform import Rotation

        pose = np.eye(4)
        pose[:3, :3] = Rotation.from_quat(pvec[3:]).as_matrix()
        pose[:3, 3] = pvec[:3]
        return pose


class BONN(TUM_RGBD):
    """Bonn dynamic dataset: TUM format + axis-correction matrix
    (datasets.py:392-404)."""

    def loadtum(self, datapath, frame_rate=-1):
        images, depths, poses = super().loadtum(datapath, frame_rate)
        if poses is not None:
            # Bonn GT is expressed in a different convention
            M = np.array([
                [1.0157, 0.1828, -0.2389, 0.0113],
                [-0.0009, -0.8431, -0.6413, -0.0098],
                [-0.3009, 0.6147, -0.8085, 0.0111],
                [0, 0, 0, 1.0],
            ])
            poses = [np.linalg.inv(M) @ p @ M for p in poses]
        return images, depths, poses


class SevenScenes(BaseDataset):
    """7-Scenes: frame-%06d.color.png + per-frame pose files
    (datasets.py:415-457)."""

    def __init__(self, cfg):
        super().__init__(cfg)
        self.color_paths = sorted(
            glob.glob(os.path.join(self.input_folder, "*.color.png")))
        self.depth_paths = sorted(
            glob.glob(os.path.join(self.input_folder, "*.depth.png")))
        pose_paths = sorted(
            glob.glob(os.path.join(self.input_folder, "*.pose.txt")))
        self.poses = [np.loadtxt(p).astype(np.float32) for p in pose_paths] \
            or None
        self.n_img = len(self.color_paths)


class RGB_NoPose(BaseDataset):
    """Plain image folder, no depth / GT poses (datasets.py:458-473)."""

    def __init__(self, cfg):
        super().__init__(cfg)
        exts = ("*.png", "*.jpg", "*.jpeg", "*.JPG", "*.PNG")
        paths = []
        for e in exts:
            paths += glob.glob(os.path.join(self.input_folder, e))
            paths += glob.glob(os.path.join(self.input_folder, "rgb", e))
        self.color_paths = sorted(set(paths))
        self.depth_paths = None
        self.poses = None
        self.n_img = len(self.color_paths)


class Replica(BaseDataset):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.color_paths = sorted(
            glob.glob(f"{self.input_folder}/results/frame*.jpg"))
        self.depth_paths = sorted(
            glob.glob(f"{self.input_folder}/results/depth*.png"))
        self.n_img = len(self.color_paths)
        self.load_poses(f"{self.input_folder}/traj.txt")

    def load_poses(self, path):
        poses = []
        with open(path) as f:
            lines = f.readlines()
        for i in range(self.n_img):
            c2w = np.array(list(map(float, lines[i].split()))).reshape(4, 4)
            poses.append(c2w.astype(np.float32))
        self.poses = poses


class ScanNet(BaseDataset):
    def __init__(self, cfg):
        super().__init__(cfg)
        base = self.input_folder
        self.color_paths = sorted(
            glob.glob(os.path.join(base, "color", "*.jpg")),
            key=lambda x: int(os.path.basename(x)[:-4]))
        self.depth_paths = sorted(
            glob.glob(os.path.join(base, "depth", "*.png")),
            key=lambda x: int(os.path.basename(x)[:-4]))
        pose_paths = sorted(
            glob.glob(os.path.join(base, "pose", "*.txt")),
            key=lambda x: int(os.path.basename(x)[:-4]))
        self.poses = [np.loadtxt(p).astype(np.float32)
                      for p in pose_paths] or None
        self.n_img = len(self.color_paths)


class PrefetchingStream:
    """Wrap a dataset with the native prefetching loader
    (wildgs_slam_tpu/native): worker threads decode + resize frames ahead of
    the SLAM loop. Falls back transparently when the native library is
    unavailable or the camera needs undistortion (not implemented natively).
    """

    def __init__(self, ds: BaseDataset, n_threads: int = 2,
                 lookahead: int = 4):
        self.ds = ds
        self._color_loader = None
        self._depth_loader = None
        if ds.distortion is None and ds.color_paths:
            try:
                from ..native import FrameLoader

                self._color_loader = FrameLoader(
                    ds.color_paths, ds.W_out_with_edge, ds.H_out_with_edge,
                    n_threads=n_threads, lookahead=lookahead)
                if ds.depth_paths is not None:
                    self._depth_loader = FrameLoader(
                        ds.depth_paths, ds.W_out_with_edge,
                        ds.H_out_with_edge, n_threads=1, is_depth=True,
                        depth_scale=ds.png_depth_scale, lookahead=lookahead)
            except Exception:
                self._color_loader = None

    def __len__(self):
        return len(self.ds)

    def __getattr__(self, name):
        return getattr(self.ds, name)

    def _crop(self, x):
        ds = self.ds
        if ds.W_edge > 0:
            x = x[:, ds.W_edge:-ds.W_edge]
        if ds.H_edge > 0:
            x = x[ds.H_edge:-ds.H_edge]
        return x

    def __getitem__(self, index):
        if self._color_loader is None:
            return self.ds[index]
        color = self._crop(self._color_loader.get(index))
        depth = (self._crop(self._depth_loader.get(index))
                 if self._depth_loader is not None else None)
        pose = (self.ds.poses[index] if self.ds.poses is not None else None)
        return index, np.ascontiguousarray(color), depth, pose


dataset_dict = {
    # registry mirrors the reference's (datasets.py:475-483): wild_slam_mocap
    # is TUM-format with per-scene intrinsics, wild_slam_iphone is a plain
    # RGB folder with no GT poses.
    "replica": Replica,
    "scannet": ScanNet,
    "tumrgbd": TUM_RGBD,
    "bonn": BONN,
    "bonn_dynamic": BONN,
    "wild_slam_mocap": TUM_RGBD,
    "7scenes": SevenScenes,
    "rgb_nopose": RGB_NoPose,
    "wild_slam_iphone": RGB_NoPose,
}


def get_dataset(cfg):
    return dataset_dict[cfg["dataset"]](cfg)


# mono prior caches (datasets.py:46-60) -------------------------------------

def load_metric_depth(frame_idx, save_dir):
    path = os.path.join(save_dir, "mono_priors", "depths",
                        f"{frame_idx:05d}.npy")
    return np.load(path)


def load_img_feature(frame_idx, save_dir, suffix=""):
    path = os.path.join(save_dir, "mono_priors", "features",
                        f"{frame_idx:05d}{suffix}.npy")
    return np.load(path)
