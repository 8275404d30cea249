"""Stage-1 (geometry) scene datasets.

Parity targets:
  * NeRF convention: geo/NeuS-ours2/models/nerfset.py — transforms_
    {train,val}.json with per-frame c2w + camera_angle_x (+ optional
    cx/cy); 16-bit RGBA images at <data_dir>/{train,val}_*/rgba.png; fixed
    near/far from config; max_radius from the camera frustum corners.
  * DTU convention: geo/NeuS-ours2/models/dtuset.py — {train,val}.json
    with world_mat/scale_mat lists; P-matrix decomposition; radius 1;
    per-ray sphere near/far (mid -/+ 1).

Images are preloaded to host numpy (the reference keeps them as CPU torch
tensors, nerfset.py:71-72); random ray batches are assembled host-side and
device_put sharded.
"""

import json
import os
from glob import glob

import numpy as np

from . import io as vio
from . import rays as vrays

__all__ = ["NerfSceneDataset", "DtuSceneDataset", "TrajectoryDataset",
           "DtuTrajectoryDataset"]


class _Base:
    def gen_random_rays(self, img_idx, batch_size, rng):
        """[B, 10]-equivalent random-pixel batch (nerfset.py:113-130),
        as a dict of arrays."""
        xs = rng.randint(0, self.W, size=batch_size)
        ys = rng.randint(0, self.H, size=batch_size)
        color = self.images[img_idx][ys, xs]
        mask = self.masks[img_idx][ys, xs][:, :1]
        rayo, rayd = self._rays_at_pixels(img_idx, xs, ys)
        return {
            "rays_o": rayo.astype(np.float32),
            "rays_d": rayd.astype(np.float32),
            "rgb": color.astype(np.float32),
            "mask": mask.astype(np.float32),
        }

    def gen_rays_at(self, img_idx):
        xs, ys = np.meshgrid(np.arange(self.W), np.arange(self.H))
        rayo, rayd = self._rays_at_pixels(
            img_idx, xs.reshape(-1), ys.reshape(-1))
        return (rayo.reshape(self.H, self.W, 3).astype(np.float32),
                rayd.reshape(self.H, self.W, 3).astype(np.float32))


class NerfSceneDataset(_Base):
    def __init__(self, data_dir, is_train=True, near=2.0, far=6.0,
                 new_h=0, longint=True):
        name = "transforms_train.json" if is_train else "transforms_val.json"
        prefix = "train_*" if is_train else "val_*"
        with open(os.path.join(data_dir, name)) as f:
            cams = json.load(f)
        self.near_v, self.far_v = near, far
        self.cx = cams.get("cx")
        self.cy = cams.get("cy")
        self.images_lis = sorted(glob(os.path.join(data_dir, prefix)))
        self.n_images = len(self.images_lis)

        imgs = [
            vio.read_rgba16(os.path.join(d, "rgba.png"), longint=longint)
            for d in self.images_lis
        ]
        if new_h > 0:
            import cv2
            h, w = imgs[0].shape[:2]
            k = new_h / h
            imgs = [
                cv2.resize(im, (int(w * k), int(new_h))) for im in imgs]
            if self.cx is not None:
                self.cx, self.cy = self.cx * k, self.cy * k
        self.images = np.stack([im[..., :3] for im in imgs]) / 255.0
        self.masks = np.stack(
            [np.repeat(im[..., 3:], 3, axis=-1) for im in imgs]) / 255.0

        self.poses = []
        for idx in range(self.n_images):
            pm = cams["frames"][idx]["transform_matrix"]
            if isinstance(pm, str):
                pm = [float(x) for x in pm.split(",")]
            self.poses.append(np.asarray(pm, np.float64).reshape(4, 4))
        self.H, self.W = self.images.shape[1:3]
        self.focal = 0.5 * self.W / np.tan(0.5 * cams["camera_angle_x"])
        self.max_radius = vrays.max_radius_from_poses(self.poses, near, far)

    def _rays_at_pixels(self, img_idx, xs, ys):
        cx = self.W // 2 if self.cx is None else int(self.cx)
        cy = self.H // 2 if self.cy is None else int(self.cy)
        p = np.stack(
            [(xs - cx) / self.focal, -(ys - cy) / self.focal,
             -np.ones_like(xs, np.float64)], axis=-1)
        c2w = self.poses[img_idx]
        rayd = p @ c2w[:3, :3].T
        rayd = rayd / np.linalg.norm(rayd, axis=-1, keepdims=True)
        rayo = np.broadcast_to(c2w[:3, 3], rayd.shape).copy()
        return rayo, rayd

    def near_far(self, rays_o, rays_d):
        n = rays_o.shape[0]
        return vrays.near_far_fixed(n, self.near_v, self.far_v)


class DtuSceneDataset(_Base):
    def __init__(self, data_dir, is_train=True, new_h=0):
        name = "train.json" if is_train else "val.json"
        prefix = "train_*" if is_train else "val_*"
        with open(os.path.join(data_dir, name)) as f:
            cams = json.load(f)
        self.images_lis = sorted(glob(os.path.join(data_dir, prefix)))
        self.n_images = len(self.images_lis)

        imgs = [
            vio.read_rgba16(os.path.join(d, "rgba.png"))
            for d in self.images_lis
        ]
        k = 1.0
        if new_h > 0:
            import cv2
            h, w = imgs[0].shape[:2]
            k = new_h / h
            imgs = [cv2.resize(im, (int(w * k), int(new_h))) for im in imgs]
        self.images = np.stack([im[..., :3] for im in imgs]) / 255.0
        self.masks = np.stack(
            [np.repeat(im[..., 3:], 3, axis=-1) for im in imgs]) / 255.0

        self.poses, self.intrinsics_inv = [], []
        for idx in range(self.n_images):
            P = (np.asarray(cams["world_mat"][idx])
                 @ np.asarray(cams["scale_mat"][idx]))[0:3, 0:4]
            intr, pose = vrays.decompose_projection(P)
            intr[:2, :3] *= k
            self.poses.append(pose)
            self.intrinsics_inv.append(np.linalg.inv(intr))
        self.H, self.W = self.images.shape[1:3]
        self.k = k  # resize factor, reused by DtuTrajectoryDataset
        self.data_dir = data_dir
        self.max_radius = 1.0

    def _rays_at_pixels(self, img_idx, xs, ys):
        p = np.stack([xs, ys, np.ones_like(xs, np.float64)], axis=-1)
        Kinv = self.intrinsics_inv[img_idx][:3, :3]
        p = p @ Kinv.T
        rayd = p / np.linalg.norm(p, axis=-1, keepdims=True)
        c2w = self.poses[img_idx]
        rayd = rayd @ c2w[:3, :3].T
        rayo = np.broadcast_to(c2w[:3, 3], rayd.shape).copy()
        return rayo, rayd

    def near_far(self, rays_o, rays_d):
        return vrays.near_far_sphere(rays_o, rays_d)


class TrajectoryDataset(_Base):
    """Stage-1 video-trajectory cameras (no images).

    Parity target: geo/NeuS-ours2/models/hwvideo.py / dtuvideo.py — load
    transforms_test.json (NeRF convention) and generate full-frame rays
    for each trajectory pose so GeoExtractor can render per-frame
    geometry buffers (gen_video.py).
    """

    def __init__(self, data_dir, imh, imw, near=2.0, far=6.0,
                 transforms_name="transforms_test.json"):
        with open(os.path.join(data_dir, transforms_name)) as f:
            cams = json.load(f)
        self.H, self.W = imh, imw
        self.near_v, self.far_v = near, far
        self.cx = cams.get("cx")
        self.cy = cams.get("cy")
        self.focal = 0.5 * imw / np.tan(0.5 * cams["camera_angle_x"])
        self.cam_angle_x = cams["camera_angle_x"]
        self.poses = []
        for fr in cams["frames"]:
            pm = fr["transform_matrix"]
            if isinstance(pm, str):
                pm = [float(x) for x in pm.split(",")]
            self.poses.append(np.asarray(pm, np.float64).reshape(4, 4))
        self.n_images = len(self.poses)
        self.max_radius = vrays.max_radius_from_poses(
            self.poses, near, far)
        # GeoExtractor uses dataset.masks for train lvis; trajectories
        # have no GT masks
        self.masks = None

    def _rays_at_pixels(self, img_idx, xs, ys):
        cx = self.W // 2 if self.cx is None else int(self.cx)
        cy = self.H // 2 if self.cy is None else int(self.cy)
        p = np.stack(
            [(xs - cx) / self.focal, -(ys - cy) / self.focal,
             -np.ones_like(xs, np.float64)], axis=-1)
        c2w = self.poses[img_idx]
        rayd = p @ c2w[:3, :3].T
        rayd = rayd / np.linalg.norm(rayd, axis=-1, keepdims=True)
        rayo = np.broadcast_to(c2w[:3, 3], rayd.shape).copy()
        return rayo, rayd

    def near_far(self, rays_o, rays_d):
        return vrays.near_far_fixed(
            rays_o.shape[0], self.near_v, self.far_v)

    def frame_metadata(self, idx):
        # reference video metadata form (geo gen_video.py:164-168:
        # focal/cx/cy + nested-list c2w), plus our train-metadata keys so
        # either consumer can read the frames
        return {
            "focal": float(self.focal),
            "cx": self.cx, "cy": self.cy,
            "imh": self.H, "imw": self.W,
            "cam_angle_x": self.cam_angle_x,
            "cam_transform_mat": self.poses[idx].tolist(),
        }


class DtuTrajectoryDataset(_Base):
    """DTU-convention video trajectory.

    Parity target: geo/NeuS-ours2/models/dtuvideo.py:12-72 —
    <data_dir>/test.json (falling back two levels up, :27-31) carries c2w
    ``poses`` plus one shared ``intrinsic`` at the original capture
    resolution; frame size and the resize factor k come from the scene's
    train dataset (:32-44).
    """

    def __init__(self, data_dir, train_set, cameras_name="test.json"):
        path = os.path.join(data_dir, cameras_name)
        if not os.path.exists(path):
            path = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(data_dir))),
                cameras_name)
        with open(path) as f:
            cams = json.load(f)
        self.H, self.W = train_set.H, train_set.W
        intr = np.asarray(cams["intrinsic"], np.float64).reshape(4, 4)
        intr[:2, :3] *= train_set.k
        self.intrinsic = intr
        self.intrinsic_inv = np.linalg.inv(intr)
        self.poses = [np.asarray(p, np.float64).reshape(4, 4)
                      for p in cams["poses"]]
        self.n_images = len(self.poses)
        self.max_radius = 1.0
        self.masks = None  # no GT masks on a novel trajectory

    def _rays_at_pixels(self, img_idx, xs, ys):
        p = np.stack([xs, ys, np.ones_like(xs, np.float64)], axis=-1)
        p = p @ self.intrinsic_inv[:3, :3].T
        rayd = p / np.linalg.norm(p, axis=-1, keepdims=True)
        c2w = self.poses[img_idx]
        rayd = rayd @ c2w[:3, :3].T
        rayo = np.broadcast_to(c2w[:3, 3], rayd.shape).copy()
        return rayo, rayd

    def near_far(self, rays_o, rays_d):
        return vrays.near_far_sphere(rays_o, rays_d)

    def frame_metadata(self, idx):
        # dtu_video.py:159-162 format (k-scaled intrinsic + c2w lists)
        return {"intrinsic": self.intrinsic.tolist(),
                "cam_transform_mat": self.poses[idx].tolist()}
