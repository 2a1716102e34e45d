from pointcloudattack_tpu.geometry.eig3 import sym_eigh_3x3
from pointcloudattack_tpu.geometry.normals import (
    estimate_normal,
    estimate_normal_via_ori_normal,
    estimate_perpendicular_jitter,
)
from pointcloudattack_tpu.geometry.spectral import (
    graph_laplacian,
    laplacian_matrix,
    lowpass_basis,
    lowpass_split,
    spectral_split,
    spectral_project,
)
from pointcloudattack_tpu.geometry.tangent import (
    spin_axis_matrix,
    to_tangent_frame,
    from_tangent_frame,
)

__all__ = [
    "estimate_normal",
    "estimate_normal_via_ori_normal",
    "estimate_perpendicular_jitter",
    "sym_eigh_3x3",
    "graph_laplacian",
    "laplacian_matrix",
    "lowpass_basis",
    "lowpass_split",
    "spectral_split",
    "spectral_project",
    "spin_axis_matrix",
    "to_tangent_frame",
    "from_tangent_frame",
]
