"""TPU-native adversarial-attack framework for 3D point-cloud classifiers.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
LI-Yiquan/3DPointCloudAttack reference (PyTorch, single-GPU): five victim
models (PointNet, PointNet++ SSG/MSG, DGCNN, CurveNet), nine attack families
(CW, KNN, GeoA3, AOF/TAOF, CTA, ISO, SIadv, Gen3DAdv perturb/add/cluster),
three defenses (SOR, SRS, DUP-Net), the 3D-face / ModelNet / ShapeNet data
pipeline, and train/test/attack CLIs.

Design stance (TPU-first, not a port):
  * arrays are channels-last ``[B, N, 3]`` so every MLP layer is an MXU matmul
  * models are pure flax.linen functions returning ``(log_probs, aux)``
  * every gradient attack is ``jit(vmap(lax.scan(step)))`` with best-so-far
    tracking carried in scan state (the reference syncs to host numpy every
    iteration, reference attack/CW/CW_attack.py:129-153)
  * the all-pairs squared-distance matrix -- the op behind Chamfer, Hausdorff,
    kNN graphs, ball query and SOR -- has a tiled Pallas TPU kernel with an
    XLA fallback for CPU tests
  * batch-parallel attack generation shards over a ``jax.sharding.Mesh``
"""

__version__ = "0.1.0"
