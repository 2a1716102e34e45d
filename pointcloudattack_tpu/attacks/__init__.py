"""L3 attack families.

Every family exposes a ``build_*`` factory returning a compiled function
over (data [B, N, 3], target [B], key) — see each module's docstring for
its reference citation and exact signature.
"""

from pointcloudattack_tpu.attacks.engine import (
    CWConfig,
    CWResult,
    cw_attack,
    make_cw_attack_fn,
    shuffle_check,
    transfer_check,
)
from pointcloudattack_tpu.attacks.cw import CWPerturbConfig, build_cw_attack
from pointcloudattack_tpu.attacks.cw_robust import (
    RobustCWConfig,
    build_robust_cw_attack,
)
from pointcloudattack_tpu.attacks.knn import (
    KNNAttackConfig,
    build_knn_attack,
)
from pointcloudattack_tpu.attacks.geoa3 import (
    GeoA3Config,
    build_geoa3_attack,
)
from pointcloudattack_tpu.attacks.geoa3_partial import (
    GeoA3PartialConfig,
    build_geoa3_partial_attack,
)
from pointcloudattack_tpu.attacks.aof import AOFConfig, build_aof_attack
from pointcloudattack_tpu.attacks.cta import (
    CTAConfig,
    build_cta_attack,
    integrated_gradients,
)
from pointcloudattack_tpu.attacks.iso import (
    ISOConfig,
    BernThompson,
    build_gradient_iso_attack,
    build_tsi_probe,
    thompson_sample_attack,
)
from pointcloudattack_tpu.attacks.siadv import (
    SIAdvConfig,
    build_si_ifgm,
    build_simba,
    build_simbapp,
    build_si_query_attack,
)
from pointcloudattack_tpu.attacks.gen3dadv import (
    AddPointsConfig,
    AddClustersConfig,
    build_add_points_attack,
    build_add_clusters_attack,
    get_critical_points,
)
from pointcloudattack_tpu.attacks.evaluation import (
    with_defense,
    transfer_matrix,
    shuffle_robustness,
)

ATTACK_FAMILIES = (
    "cw", "perturb", "knn", "geoa3", "geoa3-partial", "aof", "taof",
    "cta", "iso", "siadv", "simba", "simbapp", "si-query",
    "add-points", "add-clusters", "cw-robust",
)

__all__ = [
    "ATTACK_FAMILIES",
    "CWConfig", "CWResult", "cw_attack", "make_cw_attack_fn",
    "shuffle_check", "transfer_check",
    "CWPerturbConfig", "build_cw_attack",
    "RobustCWConfig", "build_robust_cw_attack",
    "KNNAttackConfig", "build_knn_attack",
    "GeoA3Config", "build_geoa3_attack",
    "GeoA3PartialConfig", "build_geoa3_partial_attack",
    "AOFConfig", "build_aof_attack",
    "CTAConfig", "build_cta_attack", "integrated_gradients",
    "ISOConfig", "BernThompson", "build_gradient_iso_attack",
    "build_tsi_probe", "thompson_sample_attack",
    "SIAdvConfig", "build_si_ifgm", "build_simba", "build_simbapp",
    "build_si_query_attack",
    "AddPointsConfig", "AddClustersConfig", "build_add_points_attack",
    "build_add_clusters_attack", "get_critical_points",
    "with_defense", "transfer_matrix", "shuffle_robustness",
]
