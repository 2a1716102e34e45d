"""L2 attack-math layer: adversarial losses, distance penalties, geometry.

Per-example semantics: every loss here returns a per-example ``[B]`` vector
so attack engines can vmap/scan and weight per cloud; batch averaging is the
caller's business (the reference bakes ``.mean()`` into most modules and
then undoes it with ``batch_avg=False`` flags).
"""

from pointcloudattack_tpu.losses.adv import (
    logits_adv_loss,
    untargeted_logits_adv_loss,
    cross_entropy_adv_loss,
    negative_logits_adv_loss,
)
from pointcloudattack_tpu.losses.distance import (
    l2_dist,
    chamfer_both,
    chamfer_dist,
    chamfer_hausdorff_nn,
    hausdorff_both,
    hausdorff_dist,
    knn_outlier_dist,
    chamfer_knn_dist,
    farthest_cluster_dist,
    far_chamfer_dist,
    l2_chamfer_dist,
)
from pointcloudattack_tpu.losses.geometry import (
    curvature_loss,
    displacement_loss,
    knn_smoothing_loss,
    kappa_ori,
    kappa_adv,
    nn1_idx,
    self_knn_idx,
)

__all__ = [
    "logits_adv_loss",
    "untargeted_logits_adv_loss",
    "cross_entropy_adv_loss",
    "negative_logits_adv_loss",
    "l2_dist",
    "chamfer_both",
    "chamfer_dist",
    "chamfer_hausdorff_nn",
    "hausdorff_both",
    "hausdorff_dist",
    "knn_outlier_dist",
    "chamfer_knn_dist",
    "farthest_cluster_dist",
    "far_chamfer_dist",
    "l2_chamfer_dist",
    "curvature_loss",
    "displacement_loss",
    "knn_smoothing_loss",
    "kappa_ori",
    "kappa_adv",
    "nn1_idx",
    "self_knn_idx",
]
