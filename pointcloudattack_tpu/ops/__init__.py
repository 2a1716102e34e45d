"""L0 point-cloud ops: pairwise distance, kNN, FPS, ball query, grouping.

These back every model and every attack loss. Each op has a pure-XLA
implementation (works on CPU/TPU, used by tests) and, where it pays off,
a Pallas TPU kernel selected automatically on TPU backends.

Reference parity targets (behavior, not code):
  * square_distance        -> reference model/pointnet2_utils.py:19-38
  * index_points           -> reference model/pointnet2_utils.py:41-57
  * farthest_point_sample  -> reference model/pointnet2_utils.py:60-81
  * query_ball_point       -> reference model/pointnet2_utils.py:84-104
  * sample_and_group[_all] -> reference model/pointnet2_utils.py:107-155
  * three_nn_interpolate   -> reference model/pointnet2_utils.py:273-312
  * knn (DGCNN flavour)    -> reference model/dgcnn.py:194-200
  * knn_points/knn_gather  -> reference attack/GeoA3/knn_utils.py:22-86
"""

from pointcloudattack_tpu.ops.pairwise import pairwise_sqdist, self_sqdist
from pointcloudattack_tpu.ops.gather import (
    index_points,
    index_points_mm_bwd,
    knn_gather,
)
from pointcloudattack_tpu.ops.knn import knn, knn_points
from pointcloudattack_tpu.ops.fps import farthest_point_sample
from pointcloudattack_tpu.ops.ball_query import query_ball_point
from pointcloudattack_tpu.ops.grouping import (
    sample_and_group,
    sample_and_group_all,
)
from pointcloudattack_tpu.ops.interpolate import three_nn_interpolate

__all__ = [
    "pairwise_sqdist",
    "self_sqdist",
    "index_points",
    "index_points_mm_bwd",
    "knn_gather",
    "knn",
    "knn_points",
    "farthest_point_sample",
    "query_ball_point",
    "sample_and_group",
    "sample_and_group_all",
    "three_nn_interpolate",
]
