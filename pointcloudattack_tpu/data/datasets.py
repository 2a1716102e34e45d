"""Datasets: Bosphorus, EURECOM, ModelNet40, ShapeNet — CSV/split-driven.

Behavioral twins of reference dataset/bosphorus_dataset.py,
dataset/eurecom_dataset.py and pointnet/dataset.py, re-shaped as plain
python iterables yielding numpy (the loader in data/loader.py batches and
ships them to device; there is no torch DataLoader dependency).
"""

from __future__ import annotations

import csv
import json
import os
from typing import Iterator

import numpy as np

from pointcloudattack_tpu.data.io import (
    normalize_cloud,
    read_bnt,
    read_kinect_obj,
    read_off,
    read_ply_vertices,
    read_xyz,
)


def _read_label_csv(csv_path: str):
    """(paths, labels) with labels factorized in sorted order, like
    ``pd.factorize(..., sort=True)`` (dataset/bosphorus_dataset.py:56).

    pandas parses all-numeric class columns as ints, so '105' sorts
    AFTER '99'; mirror that by sorting numerically whenever every class
    name parses as a number (otherwise '105' would factorize below 104
    and BosphorusDataset's adversarial-txt routing, cls > 104, breaks).
    """
    paths, names = [], []
    with open(os.path.expanduser(csv_path)) as f:
        reader = csv.reader(f)
        next(reader, None)  # header
        for row in reader:
            if len(row) >= 2:
                paths.append(row[0])
                names.append(row[1])
    uniq = set(names)
    try:
        ordered = sorted(uniq, key=lambda s: float(s))
    except ValueError:
        ordered = sorted(uniq)
    to_id = {n: i for i, n in enumerate(ordered)}
    labels = np.asarray([to_id[n] for n in names], dtype=np.int64)
    return paths, labels, len(ordered)


class BosphorusDataset:
    """CSV of (path, class) -> normalized 4000-point face clouds.

    Rows with class id > 104 are injected adversarial txt clouds
    (reference dataset/bosphorus_dataset.py:63-67 / utils/add_data.py).
    """

    def __init__(self, csv_path: str, num_points: int = 4000, seed: int = 0):
        self.paths, self.labels, self.num_classes = _read_label_csv(csv_path)
        self.num_points = num_points
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx: int):
        path, cls = self.paths[idx], int(self.labels[idx])
        if cls > 104:
            pts = read_xyz(path, delimiter=",")
            order = self.rng.permutation(len(pts))[: self.num_points]
            pts = pts[order, :3]
        else:
            _, _, pts = read_bnt(path, sample_to=self.num_points, rng=self.rng)
        pts = np.nan_to_num(pts)
        return normalize_cloud(pts).astype(np.float32), cls


class EurecomDataset:
    """CSV of (path, class) -> 10000-point Kinect face clouds.

    ``replicate_x`` reproduces the reference's (x,x,x) vertex defect
    (dataset/eurecom_dataset.py:52); default False reads real (x,y,z).
    """

    def __init__(
        self,
        csv_path: str,
        num_points: int = 10000,
        seed: int = 0,
        replicate_x: bool = False,
    ):
        self.paths, self.labels, self.num_classes = _read_label_csv(csv_path)
        self.num_points = num_points
        self.rng = np.random.RandomState(seed)
        self.replicate_x = replicate_x

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx: int):
        pts = read_kinect_obj(
            self.paths[idx], replicate_x=self.replicate_x
        )
        if len(pts) == 0:
            pts = np.zeros((0, 3))  # empty scan degrades to a zero cloud
        self.rng.shuffle(pts)
        if len(pts) < self.num_points:
            pad = np.zeros((self.num_points - len(pts), 3))
            pts = np.concatenate([pts, pad], axis=0)
        pts = pts[: self.num_points]
        pts = np.nan_to_num(pts)
        return normalize_cloud(pts).astype(np.float32), int(self.labels[idx])


class ModelNetDataset:
    """ModelNet40 via split txt + per-class id map.

    Reads either PLY (reference pointnet/dataset.py:169-173) or OFF files.
    """

    def __init__(
        self,
        root: str,
        split: str = "train",
        num_points: int = 2500,
        data_augmentation: bool = True,
        seed: int = 0,
    ):
        self.root = root
        self.num_points = num_points
        self.augment = data_augmentation
        self.rng = np.random.RandomState(seed)
        with open(os.path.join(root, f"{split}.txt")) as f:
            self.fns = [line.strip() for line in f if line.strip()]
        classes = sorted({fn.split("/")[0] for fn in self.fns})
        self.cat = {c: i for i, c in enumerate(classes)}
        self.num_classes = len(classes)

    def __len__(self):
        return len(self.fns)

    def __getitem__(self, idx: int):
        fn = self.fns[idx]
        cls = self.cat[fn.split("/")[0]]
        path = os.path.join(self.root, fn)
        if path.endswith(".ply"):
            pts = read_ply_vertices(path)
        else:
            pts, _ = read_off(path)
        choice = self.rng.choice(len(pts), self.num_points, replace=True)
        pts = normalize_cloud(pts[choice])
        if self.augment:
            pts = _augment(pts, self.rng)
        return pts.astype(np.float32), cls


# Parts per ShapeNet category (reference misc/num_seg_classes.txt)
SHAPENET_SEG_CLASSES = {
    "Airplane": 4, "Bag": 2, "Cap": 2, "Car": 4, "Chair": 4,
    "Earphone": 3, "Guitar": 3, "Knife": 2, "Lamp": 4, "Laptop": 2,
    "Motorbike": 6, "Mug": 2, "Pistol": 3, "Rocket": 3,
    "Skateboard": 3, "Table": 3,
}


class ShapeNetDataset:
    """ShapeNet part dataset (classification or part-seg labels)."""

    def __init__(
        self,
        root: str,
        split: str = "train",
        num_points: int = 2500,
        classification: bool = False,
        class_choice=None,
        data_augmentation: bool = True,
        seed: int = 0,
    ):
        self.root = root
        self.num_points = num_points
        self.classification = classification
        self.augment = data_augmentation
        self.rng = np.random.RandomState(seed)

        cat = {}
        with open(os.path.join(root, "synsetoffset2category.txt")) as f:
            for line in f:
                name, offset = line.strip().split()
                cat[name] = offset
        if class_choice is not None:
            cat = {k: v for k, v in cat.items() if k in class_choice}
        id2cat = {v: k for k, v in cat.items()}

        splitfile = os.path.join(
            root, "train_test_split", f"shuffled_{split}_file_list.json"
        )
        with open(splitfile) as f:
            filelist = json.load(f)

        self.datapath = []
        for file in filelist:
            _, category, uuid = file.split("/")
            if category in cat.values():
                self.datapath.append(
                    (
                        id2cat[category],
                        os.path.join(root, category, "points", uuid + ".pts"),
                        os.path.join(
                            root, category, "points_label", uuid + ".seg"
                        ),
                    )
                )
        self.classes = {c: i for i, c in enumerate(sorted(cat))}
        self.num_classes = len(self.classes)
        self.seg_classes = {
            c: SHAPENET_SEG_CLASSES.get(c, 0) for c in cat
        }
        self.num_seg_classes = (
            self.seg_classes[next(iter(cat))] if cat else 0
        )

    def __len__(self):
        return len(self.datapath)

    def __getitem__(self, idx: int):
        name, pts_path, seg_path = self.datapath[idx]
        cls = self.classes[name]
        pts = np.loadtxt(pts_path).astype(np.float64)
        seg = np.loadtxt(seg_path).astype(np.int64)
        choice = self.rng.choice(len(seg), self.num_points, replace=True)
        pts = normalize_cloud(pts[choice])
        if self.augment:
            pts = _augment(pts, self.rng)
        if self.classification:
            return pts.astype(np.float32), cls
        return pts.astype(np.float32), seg[choice]


def _augment(pts: np.ndarray, rng) -> np.ndarray:
    """Random y-rotation + gaussian jitter (pointnet/dataset.py:124-127)."""
    theta = rng.uniform(0, 2 * np.pi)
    rot = np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    pts = pts.copy()
    pts[:, [0, 2]] = pts[:, [0, 2]] @ rot
    return pts + rng.normal(0, 0.02, size=pts.shape)


def iterate_dataset(
    dataset, batch_size: int, shuffle: bool = True, seed: int = 0,
    drop_last: bool = False,
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Minimal host-side batcher: yields (clouds [B,N,3], labels [B])."""
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        np.random.RandomState(seed).shuffle(order)
    for i in range(0, n, batch_size):
        idx = order[i : i + batch_size]
        if drop_last and len(idx) < batch_size:
            return
        items = [dataset[int(j)] for j in idx]
        yield (
            np.stack([it[0] for it in items]),
            np.asarray([it[1] for it in items], dtype=np.int64),
        )
