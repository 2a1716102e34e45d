"""Train/eval/test CSV split generation for the face datasets.

Behavioral twin of reference get_dataset_csv.py:20-96 (and the
utils/get_bosphorus_csv.py / get_eurecom_csv.py variants): walk the raw
dataset directory, 70/30/0 split per class, skip classes with too few
scans into dirty.csv, write train/eval/test/dirty.csv.  Also covers
utils/add_data.py's injection of adversarial "class 105" rows.
"""

from __future__ import annotations

import csv
import os

import numpy as np


def collect_class_files(
    data_root: str, cls_dir: str, ext: str = ".bnt", name_slice=(2, 5)
):
    """(path, class_name) rows for one class directory."""
    full = os.path.realpath(os.path.join(data_root, cls_dir))
    class_name = cls_dir[name_slice[0] : name_slice[1]]
    rows = []
    for file in sorted(os.listdir(full)):
        if os.path.splitext(file)[1] != ext:
            continue
        rows.append([os.path.join(full, file), class_name])
    return rows


def generate_split_csvs(
    data_root: str,
    out_dir: str | None = None,
    ext: str = ".bnt",
    split_ratio=(0.7, 0.3, 0.0),
    min_files_per_class: int = 10,
    min_train_per_class: int = 1,
    seed: int = 0,
):
    """Write train/eval/test/dirty.csv. Returns the four row lists."""
    out_dir = out_dir or data_root
    rng = np.random.RandomState(seed)
    train, eval_, test, dirty = [], [], [], []
    for cls_dir in sorted(os.listdir(data_root)):
        full = os.path.join(data_root, cls_dir)
        if not os.path.isdir(full):
            continue
        files = [
            x for x in os.listdir(full)
            if os.path.isfile(os.path.join(full, x))
        ]
        if len(files) < min_files_per_class:
            continue
        rows = collect_class_files(data_root, cls_dir, ext)
        rng.shuffle(rows)
        if len(rows) <= min_files_per_class:
            dirty.extend(rows)
            continue
        n_train = max(min_train_per_class, int(len(rows) * split_ratio[0]))
        n_eval = int(
            (len(rows) - n_train) * split_ratio[1] / (1 - split_ratio[0])
        )
        n_test = len(rows) - n_train - n_eval
        train.extend(rows[:n_train])
        eval_.extend(rows[n_train : n_train + n_eval])
        if n_test > 0:
            test.extend(rows[-n_test:])

    for name, rows in [
        ("train", train), ("eval", eval_), ("test", test), ("dirty", dirty),
    ]:
        with open(os.path.join(out_dir, f"{name}.csv"), "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["cloud_point_path", "cls_name"])
            w.writerows(rows)
    return train, eval_, test, dirty


def inject_adversarial_rows(
    csv_path: str, adv_files, cls_name: str = "105"
):
    """Append adversarial txt clouds as an extra class.

    Reference utils/add_data.py:1-11.
    """
    with open(csv_path, "a", newline="") as f:
        w = csv.writer(f)
        for path in adv_files:
            w.writerow([path, cls_name])
