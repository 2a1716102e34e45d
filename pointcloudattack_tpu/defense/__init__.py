from pointcloudattack_tpu.defense.sor import sor_defense
from pointcloudattack_tpu.defense.srs import srs_defense
from pointcloudattack_tpu.defense.dupnet import DUPNet

__all__ = ["sor_defense", "srs_defense", "DUPNet"]
