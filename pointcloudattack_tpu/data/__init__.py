from pointcloudattack_tpu.data.synthetic import make_synthetic_clouds
from pointcloudattack_tpu.data.io import (
    read_bnt,
    read_kinect_obj,
    read_obj,
    write_obj,
    read_off,
    write_off,
    read_ply_vertices,
    read_xyz,
    write_xyz,
    normalize_cloud,
)
from pointcloudattack_tpu.data.datasets import (
    BosphorusDataset,
    EurecomDataset,
    ModelNetDataset,
    ShapeNetDataset,
    iterate_dataset,
)
from pointcloudattack_tpu.data.csvsplit import (
    generate_split_csvs,
    inject_adversarial_rows,
)

__all__ = [
    "make_synthetic_clouds",
    "read_bnt",
    "read_kinect_obj",
    "read_obj",
    "write_obj",
    "read_off",
    "write_off",
    "read_ply_vertices",
    "read_xyz",
    "write_xyz",
    "normalize_cloud",
    "BosphorusDataset",
    "EurecomDataset",
    "ModelNetDataset",
    "ShapeNetDataset",
    "iterate_dataset",
    "generate_split_csvs",
    "inject_adversarial_rows",
]
