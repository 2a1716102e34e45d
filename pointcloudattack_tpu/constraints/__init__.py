from pointcloudattack_tpu.constraints.clip import (
    clip_points_l2,
    clip_points_linf,
    project_inner_points,
    project_inner_clip_linf,
)

__all__ = [
    "clip_points_l2",
    "clip_points_linf",
    "project_inner_points",
    "project_inner_clip_linf",
]
