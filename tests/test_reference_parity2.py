"""More numeric parity against the ACTUAL reference PyTorch code.

Extends tests/test_reference_parity.py (forward + CW/KNN end-to-end) with
module-by-module comparisons against the reference sources imported from
/root/reference:

  * every distance penalty of attack/CW/CW_utils/dist_utils.py;
  * every clip/projection of attack/CW/CW_utils/clip_utils.py;
  * the GeoA3 geometry losses of attack/GeoA3/loss_utils.py
    (chamfer / pseudo-chamfer / hausdorff / kappa / curvature /
    displacement / kNN-smoothing) with shared random normals;
  * the SOR defense (exact output equality) and SRS (structural parity —
    its point selection is host RNG, SRS.py:29-31);
  * CTA integrated-gradients saliency (utils/integrated_gradients.py);
  * TAOF end-to-end: the reference CWTAOF loop (attack/AOF/TAOF_attack.py
    :83-244) vs attacks.aof on the same exported victim — the third
    attack family with measured reference parity.

Import shims (documented; none alters reference math):
  * ``torch.symeig`` was removed in torch 2.x -> shimmed to
    ``torch.linalg.eigh`` (same ascending order; TAOF_attack.py:51);
  * ``torch.autograd.gradcheck.zero_gradients`` was removed -> no-op
    (dead import, loss_utils.py:21);
  * ``torchvision`` is not in this image -> empty module stub (dead
    import, utility.py:15-16);
  * GeoA3 utility.py shells out to ``stty size`` at import time
    (utility.py:465) -> os.popen patched to "24 80" during import only.
"""

import io
import os
import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference checkout not available"
)

if REF.exists() and str(REF) not in sys.path:
    sys.path.insert(0, str(REF))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

B, N = 2, 96
RNG = np.random.RandomState(42)


def _clouds(scale=1.0):
    adv = RNG.randn(B, N, 3).astype(np.float32)
    ori = adv + RNG.randn(B, N, 3).astype(np.float32) * 0.1 * scale
    return adv, ori


def _t(x):  # [B, N, 3] torch
    return torch.from_numpy(np.asarray(x))


def _tc(x):  # [B, 3, N] torch (reference channel-first convention)
    return torch.from_numpy(np.ascontiguousarray(np.asarray(x).transpose(0, 2, 1)))


@pytest.fixture
def cpu_cuda(monkeypatch):
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    monkeypatch.setattr(torch.nn.Module, "cuda", lambda self, *a, **k: self)


@pytest.fixture
def fps_start_zero(monkeypatch):
    """Pin the reference FPS random start to 0 (pointnet2_utils.py:72
    convention, also used by DUP_Net/pu_utils.py)."""

    def zero_randint(*args, **kw):
        size = args[-1]
        return torch.zeros(size, dtype=kw.get("dtype", torch.long))

    monkeypatch.setattr(torch, "randint", zero_randint)


@pytest.fixture
def symeig_shim(monkeypatch):
    """torch.symeig(L, eigenvectors=True) -> torch.linalg.eigh(L)."""

    def symeig(a, eigenvectors=False, upper=True):
        e, v = torch.linalg.eigh(a)
        return (e, v) if eigenvectors else (e, torch.zeros_like(a))

    monkeypatch.setattr(torch, "symeig", symeig, raising=False)


def _ensure_torchvision_stub():
    """Idempotently stub torchvision (+ .models/.transforms submodules):
    several reference files import it at module level but never use it
    in the paths these tests exercise."""
    tv = sys.modules.get("torchvision")
    if tv is None:
        tv = types.ModuleType("torchvision")
        sys.modules["torchvision"] = tv
    for sub in ("models", "transforms"):
        name = f"torchvision.{sub}"
        if name not in sys.modules:
            mod = types.ModuleType(name)
            sys.modules[name] = mod
        setattr(tv, sub, sys.modules[name])


def _import_ref_geoa3_losses():
    """Import the real attack/GeoA3/loss_utils.py with documented shims."""
    gradcheck = sys.modules["torch.autograd.gradcheck"]
    if not hasattr(gradcheck, "zero_gradients"):
        gradcheck.zero_gradients = lambda x: None
    _ensure_torchvision_stub()
    real_popen = os.popen
    os.popen = lambda *a, **k: io.StringIO("24 80")
    try:
        import attack.GeoA3.loss_utils as lu
    finally:
        os.popen = real_popen
    return lu


class TestDistUtilsParity:
    """losses/distance.py vs the reference modules, batch_avg=False."""

    def test_l2(self, cpu_cuda):
        from attack.CW.CW_utils.dist_utils import L2Dist

        from pointcloudattack_tpu.losses import l2_dist

        adv, ori = _clouds()
        want = L2Dist()(_t(adv), _t(ori), batch_avg=False).numpy()
        got = np.asarray(l2_dist(jnp.asarray(adv), jnp.asarray(ori)))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    @pytest.mark.parametrize("method", ["adv2ori", "ori2adv", "both"])
    def test_chamfer(self, cpu_cuda, method):
        from attack.CW.CW_utils.dist_utils import ChamferDist

        from pointcloudattack_tpu.losses import chamfer_dist

        adv, ori = _clouds()
        want = ChamferDist(method=method)(
            _t(adv), _t(ori), batch_avg=False
        ).numpy()
        got = np.asarray(
            chamfer_dist(jnp.asarray(adv), jnp.asarray(ori), method)
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    @pytest.mark.parametrize("method", ["adv2ori", "ori2adv", "both"])
    def test_hausdorff(self, cpu_cuda, method):
        from attack.CW.CW_utils.dist_utils import HausdorffDist

        from pointcloudattack_tpu.losses import hausdorff_dist

        adv, ori = _clouds()
        want = HausdorffDist(method=method)(
            _t(adv), _t(ori), batch_avg=False
        ).numpy()
        got = np.asarray(
            hausdorff_dist(jnp.asarray(adv), jnp.asarray(ori), method)
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    def test_knn_dist(self, cpu_cuda):
        from attack.CW.CW_utils.dist_utils import KNNDist

        from pointcloudattack_tpu.losses import knn_outlier_dist

        adv, _ = _clouds()
        want = KNNDist(k=5, alpha=1.05)(_t(adv), batch_avg=False).numpy()
        got = np.asarray(knn_outlier_dist(jnp.asarray(adv), k=5, alpha=1.05))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    def test_chamfer_knn(self, cpu_cuda):
        from attack.CW.CW_utils.dist_utils import ChamferkNNDist

        from pointcloudattack_tpu.losses import chamfer_knn_dist

        adv, ori = _clouds()
        want = ChamferkNNDist()(_t(adv), _t(ori), batch_avg=False).numpy()
        got = np.asarray(chamfer_knn_dist(jnp.asarray(adv), jnp.asarray(ori)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    def test_farthest(self, cpu_cuda):
        from attack.CW.CW_utils.dist_utils import FarthestDist

        from pointcloudattack_tpu.losses import farthest_cluster_dist

        clusters = RNG.randn(B, 3, 8, 3).astype(np.float32)
        want = FarthestDist()(_t(clusters), batch_avg=False).numpy()
        got = np.asarray(farthest_cluster_dist(jnp.asarray(clusters)))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_far_chamfer(self, cpu_cuda):
        from attack.CW.CW_utils.dist_utils import FarChamferDist

        from pointcloudattack_tpu.losses import far_chamfer_dist

        num_add = 3
        added = RNG.randn(B, num_add * 8, 3).astype(np.float32)
        _, ori = _clouds()
        want = FarChamferDist(num_add=num_add)(
            _t(added), _t(ori), batch_avg=False
        ).numpy()
        got = np.asarray(
            far_chamfer_dist(jnp.asarray(added), jnp.asarray(ori), num_add)
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    def test_l2_chamfer(self, cpu_cuda):
        from attack.CW.CW_utils.dist_utils import L2ChamferDist

        from pointcloudattack_tpu.losses import l2_chamfer_dist

        num_add = 3
        adv_obj = RNG.randn(B, num_add, 8, 3).astype(np.float32)
        ori_obj = adv_obj + RNG.randn(B, num_add, 8, 3).astype(np.float32) * 0.1
        adv_pc = adv_obj.reshape(B, -1, 3)
        _, ori = _clouds()
        want = L2ChamferDist(num_add=num_add)(
            _t(adv_pc), _t(ori), _t(adv_obj), _t(ori_obj), batch_avg=False
        ).numpy()
        got = np.asarray(
            l2_chamfer_dist(
                jnp.asarray(adv_pc),
                jnp.asarray(ori),
                jnp.asarray(adv_obj),
                jnp.asarray(ori_obj),
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


class TestClipUtilsParity:
    """constraints/clip.py vs attack/CW/CW_utils/clip_utils.py."""

    def _normals(self):
        n = RNG.randn(B, N, 3).astype(np.float32)
        return n / np.linalg.norm(n, axis=-1, keepdims=True)

    def test_clip_linf(self, cpu_cuda):
        from attack.CW.CW_utils.clip_utils import ClipPointsLinf

        from pointcloudattack_tpu.constraints.clip import clip_points_linf

        adv, ori = _clouds(scale=5.0)
        want = ClipPointsLinf(budget=0.3)(_tc(adv), _tc(ori)).numpy()
        got = np.asarray(
            clip_points_linf(jnp.asarray(adv), jnp.asarray(ori), 0.3)
        )
        np.testing.assert_allclose(
            got.transpose(0, 2, 1), want, rtol=1e-5, atol=1e-6
        )

    def test_clip_l2(self, cpu_cuda):
        from attack.CW.CW_utils.clip_utils import ClipPointsL2

        from pointcloudattack_tpu.constraints.clip import clip_points_l2

        adv, ori = _clouds(scale=5.0)
        want = ClipPointsL2(budget=1.0)(_tc(adv), _tc(ori)).numpy()
        got = np.asarray(
            clip_points_l2(jnp.asarray(adv), jnp.asarray(ori), 1.0)
        )
        np.testing.assert_allclose(
            got.transpose(0, 2, 1), want, rtol=1e-5, atol=1e-6
        )

    def test_project_inner(self, cpu_cuda):
        from attack.CW.CW_utils.clip_utils import ProjectInnerPoints

        from pointcloudattack_tpu.constraints.clip import project_inner_points

        adv, ori = _clouds()
        normal = self._normals()
        want = ProjectInnerPoints()(
            _tc(adv), _tc(ori), _tc(normal)
        ).numpy()
        got = np.asarray(
            project_inner_points(
                jnp.asarray(adv), jnp.asarray(ori), jnp.asarray(normal)
            )
        )
        np.testing.assert_allclose(
            got.transpose(0, 2, 1), want, rtol=1e-4, atol=1e-6
        )

    def test_project_inner_clip_linf(self, cpu_cuda):
        from attack.CW.CW_utils.clip_utils import ProjectInnerClipLinf

        from pointcloudattack_tpu.constraints.clip import (
            project_inner_clip_linf,
        )

        adv, ori = _clouds(scale=3.0)
        normal = self._normals()
        want = ProjectInnerClipLinf(budget=0.3)(
            _tc(adv), _tc(ori), _tc(normal)
        ).numpy()
        got = np.asarray(
            project_inner_clip_linf(
                jnp.asarray(adv), jnp.asarray(ori), 0.3, jnp.asarray(normal)
            )
        )
        np.testing.assert_allclose(
            got.transpose(0, 2, 1), want, rtol=1e-4, atol=1e-6
        )


class TestGeoA3LossParity:
    """losses/geometry.py + distance combos vs attack/GeoA3/loss_utils.py.

    LATENT DEFECT (documented here, not replicated): the reference's
    pytorch3d shim computes the pairwise matrix with its squared-norm
    terms on SWAPPED axes — knn_utils.py:13-15 broadcasts ``p1_2``
    ([B,1,N1]) along rows and ``p2_2.transpose(2,1)`` ([B,N2,1]) along
    columns, yielding dist[i,j] = |p1_j|^2 - 2 p1_i.p2_j + |p2_i|^2
    instead of |p1_i - p2_j|^2 (it can go negative; see
    test_knn_shim_norm_swap_defect).  Self-kNN is unaffected (the swap
    cancels for p1 == p2), and for unit-norm points the constant terms
    cancel, so cross-cloud parity is asserted on sphere-normalized
    clouds where the reference's intended and actual math coincide.
    """

    @pytest.fixture(scope="class")
    def lu(self):
        return _import_ref_geoa3_losses()

    def _normals(self):
        n = RNG.randn(B, N, 3).astype(np.float32)
        return n / np.linalg.norm(n, axis=-1, keepdims=True)

    @staticmethod
    def _sphere_clouds():
        """Unit-norm clouds: the reference shim's norm swap cancels."""
        adv = RNG.randn(B, N, 3).astype(np.float32)
        adv /= np.linalg.norm(adv, axis=-1, keepdims=True)
        ori = adv + RNG.randn(B, N, 3).astype(np.float32) * 0.1
        ori /= np.linalg.norm(ori, axis=-1, keepdims=True)
        return adv, ori

    def test_knn_shim_norm_swap_defect(self, lu):
        """Pin down the reference defect: its knn dists match the
        swapped-norm emulation exactly and are NOT true sqdists."""
        from attack.GeoA3.knn_utils import knn_points as ref_knn_points

        adv, ori = _clouds()
        got = ref_knn_points(_t(adv), _t(ori), K=1).dists.numpy()[..., 0]

        inner = np.einsum("bic,bjc->bij", adv, ori)
        n1 = np.sum(adv**2, axis=-1)  # [B, N]
        n2 = np.sum(ori**2, axis=-1)
        swapped = n1[:, None, :] - 2 * inner + n2[:, :, None]
        np.testing.assert_allclose(
            got, swapped.min(axis=-1), rtol=1e-4, atol=1e-5
        )
        true_sq = n1[:, :, None] - 2 * inner + n2[:, None, :]
        assert not np.allclose(got, true_sq.min(axis=-1), atol=1e-3)

    def test_norm_l2(self, lu):
        from pointcloudattack_tpu.losses import l2_dist

        adv, ori = _clouds()
        want = lu.norm_l2_loss(_tc(adv), _tc(ori)).numpy()
        got = np.asarray(l2_dist(jnp.asarray(adv), jnp.asarray(ori))) ** 2
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_chamfer_loss(self, lu):
        from pointcloudattack_tpu.losses import chamfer_both

        adv, ori = self._sphere_clouds()
        want = lu.chamfer_loss(_tc(adv), _tc(ori)).numpy()
        a2o, o2a = chamfer_both(jnp.asarray(adv), jnp.asarray(ori))
        np.testing.assert_allclose(
            np.asarray(a2o + o2a), want, rtol=1e-4, atol=1e-6
        )

    def test_pseudo_chamfer_loss(self, lu):
        from pointcloudattack_tpu.losses import chamfer_dist

        adv, ori = self._sphere_clouds()
        want = lu.pseudo_chamfer_loss(_tc(adv), _tc(ori)).numpy()
        got = np.asarray(
            chamfer_dist(jnp.asarray(adv), jnp.asarray(ori), "adv2ori")
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    def test_hausdorff_loss(self, lu):
        from pointcloudattack_tpu.losses import hausdorff_dist

        adv, ori = self._sphere_clouds()
        want = lu.hausdorff_loss(_tc(adv), _tc(ori)).numpy()
        got = np.asarray(
            hausdorff_dist(jnp.asarray(adv), jnp.asarray(ori), "adv2ori")
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    def test_kappa_ori(self, lu):
        from pointcloudattack_tpu.losses import kappa_ori

        adv, _ = _clouds()
        normal = self._normals()
        want = lu._get_kappa_ori(_tc(adv), _tc(normal), k=2).numpy()
        got = np.asarray(
            kappa_ori(jnp.asarray(adv), jnp.asarray(normal), k=2)
        )
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)

    def test_kappa_adv(self, lu):
        from pointcloudattack_tpu.losses import kappa_adv

        adv, ori = self._sphere_clouds()
        normal = self._normals()
        want_k, want_n = lu._get_kappa_adv(
            _tc(adv), _tc(ori), _tc(normal), k=2
        )
        got_k, got_n = kappa_adv(
            jnp.asarray(adv), jnp.asarray(ori), jnp.asarray(normal), k=2
        )
        np.testing.assert_allclose(
            np.asarray(got_k), want_k.numpy(), rtol=1e-3, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(got_n).transpose(0, 2, 1), want_n.numpy(),
            rtol=1e-5, atol=1e-6,
        )

    def test_curvature_loss(self, lu):
        from pointcloudattack_tpu.losses import curvature_loss, kappa_adv, kappa_ori

        adv, ori = self._sphere_clouds()
        normal = self._normals()
        ok = lu._get_kappa_ori(_tc(ori), _tc(normal), k=2)
        ak, _ = lu._get_kappa_adv(_tc(adv), _tc(ori), _tc(normal), k=2)
        want = lu.curvature_loss(_tc(adv), _tc(ori), ak, ok).numpy()

        j_ok = kappa_ori(jnp.asarray(ori), jnp.asarray(normal), k=2)
        j_ak, _ = kappa_adv(
            jnp.asarray(adv), jnp.asarray(ori), jnp.asarray(normal), k=2
        )
        got = np.asarray(
            curvature_loss(jnp.asarray(adv), jnp.asarray(ori), j_ak, j_ok)
        )
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)

    def test_displacement_loss(self, lu):
        from pointcloudattack_tpu.losses import displacement_loss

        adv, ori = _clouds()
        want = lu.displacement_loss(_tc(adv), _tc(ori), k=16).numpy()
        got = np.asarray(
            displacement_loss(jnp.asarray(adv), jnp.asarray(ori), k=16)
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-7)

    def test_knn_smoothing_loss(self, lu):
        from pointcloudattack_tpu.losses import knn_smoothing_loss

        adv, _ = _clouds()
        want = lu.kNN_smoothing_loss(_tc(adv), k=5, threshold_coef=1.05).numpy()
        got = np.asarray(
            knn_smoothing_loss(jnp.asarray(adv), k=5, threshold_coef=1.05)
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-7)


class TestDefenseParity:
    def test_sor_exact(self, cpu_cuda):
        from attack.SIadv.baselines.defense.drop_points.SOR import SORDefense

        from pointcloudattack_tpu.defense.sor import sor_defense

        pc = RNG.randn(3, 128, 3).astype(np.float32)
        ref = SORDefense(k=2, alpha=1.1, npoint=128)
        want = ref(_tc(pc)).numpy().transpose(0, 2, 1)  # [B, npoint, 3]
        got = np.asarray(
            sor_defense(jnp.asarray(pc), k=2, alpha=1.1, npoint=128)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_srs_structural(self, cpu_cuda):
        """SRS point selection is host RNG (SRS.py:29-31) — parity is
        structural: both keep K - drop_num distinct input points."""
        from attack.SIadv.baselines.defense.drop_points.SRS import SRSDefense

        from pointcloudattack_tpu.defense.srs import srs_defense

        pc = RNG.randn(2, 128, 3).astype(np.float32)
        drop = 28
        want = SRSDefense(drop_num=drop)(_tc(pc)).numpy().transpose(0, 2, 1)
        got = np.asarray(
            srs_defense(jnp.asarray(pc), jax.random.PRNGKey(0), drop_num=drop)
        )
        assert got.shape == want.shape == (2, 100, 3)
        for b in range(2):
            rows = {tuple(r) for r in pc[b]}
            got_rows = {tuple(r) for r in got[b]}
            assert got_rows <= rows and len(got_rows) == 100


class TestCTASaliencyParity:
    """attacks/cta.integrated_gradients vs utils/integrated_gradients.py."""

    def test_ig(self, cpu_cuda, trained_pointnet):
        from attack.CTA.utils.integrated_gradients import IntegratedGradients
        from model.pointnet import PointNetCls

        from pointcloudattack_tpu.attacks.cta import integrated_gradients
        from pointcloudattack_tpu.train import torch_port

        model, variables, clouds, labels = trained_pointnet
        clouds = np.asarray(clouds, dtype=np.float32)

        sd = torch_port.export_pointnet(variables)
        ref_model = PointNetCls(k=3)
        ref_model.load_state_dict(
            {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}
        )
        ref_model.eval()

        # reference VanillaGradient.get_mask hard-codes set_size=2 rows
        # (vanilla_gradient.py:11-21), so feed a 2-cloud batch; duplicate
        # one cloud so the reference's GLOBAL-min baseline
        # (integrated_gradients.py:10) equals our per-cloud min.
        x = np.stack([clouds[0], clouds[0]])
        tc = int(labels[0])
        if tc == 0:
            tc = int(labels[np.argmax(labels != 0)])  # truthy class id
            x = np.stack(
                [clouds[labels.tolist().index(tc)]] * 2
            ).astype(np.float32)

        ig = IntegratedGradients(ref_model)
        want = ig.get_mask(
            _tc(x), target_class=tc, steps=25
        )  # [3, N, B]

        def model_fn(a):
            out, _ = model.apply(variables, a, train=False)
            return out

        got = np.asarray(
            integrated_gradients(
                model_fn, jnp.asarray(x), jnp.full((2,), tc), steps=25
            )
        )  # [B, N, 3]
        # exact equality is not expected: the IG path crosses max-pool
        # tie boundaries where torch/XLA argmax picks can differ, so
        # compare up to small relative error + near-perfect correlation
        # (measured: corr 0.99999, max rel diff ~0.7%)
        w, g = want[..., 0].T, got[0]
        scale = np.abs(w).max()
        np.testing.assert_allclose(g, w, rtol=0.05, atol=0.02 * scale)
        corr = np.corrcoef(g.ravel(), w.ravel())[0, 1]
        assert corr > 0.999, f"IG correlation {corr}"


class TestShippedFaceProbes:
    """Parse the ACTUAL AddData face probe files the reference ships
    (comma-separated x,y,z,px,py rows; loaded by
    attack/AOF/Eval_TAOF_face0424.py:43-45 with delimiter=',')."""

    def test_read_real_face_files(self):
        from pointcloudattack_tpu.data.io import normalize_cloud, read_xyz

        for name in ("face0424.txt", "face0424smile.txt",
                     "face0424omg.txt", "face04242.txt", "face4_crop.txt"):
            path = REF / "AddData" / name
            if not path.exists():
                continue
            pts = read_xyz(str(path))
            assert pts.ndim == 2 and pts.shape[1] >= 3, name
            assert np.isfinite(pts).all(), name
            cloud = normalize_cloud(pts[:, :3])
            assert np.abs(np.linalg.norm(cloud, axis=1)).max() <= 1 + 1e-6


class TestShippedAdvData:
    """cli test-advdata re-evaluates the ACTUAL adversarial dumps the
    reference ships (attack/AOF/AdvData/PointNet/*.txt, 4000x3
    whitespace rows — the dumps reference Test_AdvData.py:16,61 was
    written for but cannot load due to its broken import)."""

    ADV = REF / "attack/AOF/AdvData/PointNet"

    @pytest.mark.skipif(not ADV.exists(), reason="dumps not present")
    def test_real_dumps_reclassify(self, tmp_path, capsys):
        import shutil

        from pointcloudattack_tpu.cli.main import main

        for name in ("0.txt", "1.txt"):
            shutil.copy(self.ADV / name, tmp_path / name)
        main([
            "test-advdata", "--model", "PointNet", "--num_points", "4000",
            "--num_classes", "106", "--adv_dir", str(tmp_path),
            "--output_dir", str(tmp_path),
        ])
        out = capsys.readouterr().out
        assert "/2 recovered to true label" in out


class TestDUPNetShippedWeights:
    """The reference checkout SHIPS its trained DUP-Net upsampler
    (attack/SIadv/baselines/defense/DUP_Net/pu-in_1024-up_4.pth,
    hard-loaded by DUP_Net.py:24-28).  Port it with
    train.torch_port.port_punet and assert forward parity of the real
    trained weights — the defense the reference actually deploys."""

    PTH = REF / "attack/SIadv/baselines/defense/DUP_Net/pu-in_1024-up_4.pth"

    @pytest.mark.skipif(not PTH.exists(), reason="checkpoint not present")
    def test_trained_punet_forward_parity(self, cpu_cuda, fps_start_zero):
        import types as _types

        base = "attack/SIadv/baselines/defense/DUP_Net"
        pkg = _types.ModuleType("refdup2")
        pkg.__path__ = [str(REF / base)]
        sys.modules["refdup2"] = pkg
        for name in ("pytorch_modules", "pu_utils", "pu_modules", "pu_net"):
            src = (REF / base / f"{name}.py").read_text()
            mod = _types.ModuleType(f"refdup2.{name}")
            mod.__package__ = "refdup2"
            sys.modules[f"refdup2.{name}"] = mod
            exec(compile(src, f"{name}.py", "exec"), mod.__dict__)

        sd = torch.load(self.PTH, map_location="cpu", weights_only=True)
        ref = sys.modules["refdup2.pu_net"].PUNet(
            npoint=1024, up_ratio=4, use_normal=False, use_bn=False,
            use_res=False,
        )
        ref.load_state_dict(sd)  # strict: every shipped key consumed
        ref.eval()

        rng = np.random.RandomState(30)
        x = rng.randn(1, 1024, 3).astype(np.float32)
        x /= np.abs(x).max()
        with torch.no_grad():
            want = ref(torch.from_numpy(x)).numpy()  # [1, 4096, 3]

        from pointcloudattack_tpu.models.punet import PUNet
        from pointcloudattack_tpu.train import torch_port

        variables = torch_port.port_punet(sd, up_ratio=4)
        model = PUNet(npoint=1024, up_ratio=4)
        got = np.asarray(
            jax.jit(lambda v, a: model.apply(v, a))(
                {"params": variables["params"]}, jnp.asarray(x)
            )
        )
        assert got.shape == want.shape == (1, 4096, 3)
        np.testing.assert_allclose(got, want, atol=2e-3)


class TestTrainingGradientParity:
    """Backward-pass parity: d(NLL + ft-reg)/d(input) of the reference
    torch PointNet vs the flax port on identical weights and batch.

    Exercises the full backward chain (STN matmuls, convs, max-pool
    routing, BN affine, log-softmax) that training and every white-box
    attack rely on.  BN runs in inference normalization and the
    reference's Dropout(p=0.3) (pointnet.py:138) is zeroed on the torch
    side so both graphs are deterministic — train-mode batch-stat
    gradients are exercised separately by the attack e2e tests.
    """

    def test_input_gradient_parity(self, cpu_cuda):
        import torch.nn.functional as F
        from model.pointnet import PointNetCls

        from pointcloudattack_tpu import models
        from pointcloudattack_tpu.models.common import (
            feature_transform_regularizer,
        )
        from pointcloudattack_tpu.train import torch_port

        torch.manual_seed(23)
        ref = PointNetCls(k=4, feature_transform=True)
        x = RNG.randn(3, 128, 3).astype(np.float32)
        y = np.array([0, 1, 3])
        x_t = torch.from_numpy(x.transpose(0, 2, 1))

        # non-trivial BN running stats, then deterministic graphs
        ref.train()
        with torch.no_grad():
            for _ in range(2):
                ref(x_t + torch.randn(x_t.shape) * 0.05)
        ref.eval()

        xin = x_t.clone().requires_grad_(True)
        logp, _, trans_feat = ref(xin)
        d = trans_feat.shape[1]
        eye = torch.eye(d)[None]
        reg = torch.mean(
            torch.norm(
                torch.bmm(trans_feat, trans_feat.transpose(2, 1)) - eye,
                dim=(1, 2),
            )
        )
        loss_t = F.nll_loss(logp, torch.from_numpy(y)) + 0.001 * reg
        loss_t.backward()
        want = xin.grad.numpy().transpose(0, 2, 1)  # [B, N, 3]

        variables = torch_port.port_pointnet(
            ref.state_dict(), feature_transform=True
        )
        model = models.make_model("PointNet", 4, feature_transform=True)

        def loss_fn(a):
            out, aux = model.apply(variables, a, train=False)
            one_hot = jax.nn.one_hot(jnp.asarray(y), 4, dtype=out.dtype)
            nll = -jnp.mean(jnp.sum(one_hot * out, axis=-1))
            return nll + 0.001 * feature_transform_regularizer(
                aux["trans_feat"]
            )

        loss_j, got = jax.value_and_grad(loss_fn)(jnp.asarray(x))
        np.testing.assert_allclose(
            float(loss_j), float(loss_t.detach()), rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(got), want, rtol=1e-3, atol=1e-5
        )


class TestGeoA3EndToEnd:
    """Reference geoA3_attack (attack/GeoA3/GeoA3_attack.py:185-473) vs
    attacks.geoa3 on the same exported victim — fourth attack family
    with measured end-to-end reference parity.

    Import shims: open3d is stubbed (only the debug-only
    resample_reconstruct_from_pc touches it), zero_gradients is a dead
    import, utility.py needs the stty/torchvision patches, and
    torch.symeig (estimate_normal, utility.py:61) maps to linalg.eigh.
    """

    N_SAMPLES = 4
    BINARY = 2
    ITERS = 80

    @staticmethod
    def _import_ref_geoa3():
        gradcheck = sys.modules["torch.autograd.gradcheck"]
        if not hasattr(gradcheck, "zero_gradients"):
            gradcheck.zero_gradients = lambda x: None
        if "open3d" not in sys.modules:
            sys.modules["open3d"] = types.ModuleType("open3d")
        _ensure_torchvision_stub()
        real_popen = os.popen
        os.popen = lambda *a, **k: io.StringIO("24 80")
        try:
            import attack.GeoA3.GeoA3_attack as ga
        finally:
            os.popen = real_popen
        return ga

    def test_geoa3_asr_parity(
        self, cpu_cuda, symeig_shim, monkeypatch, trained_pointnet
    ):
        from model.pointnet import PointNetCls

        from pointcloudattack_tpu.attacks.geoa3 import (
            GeoA3Config,
            build_geoa3_attack,
        )
        from pointcloudattack_tpu.train import torch_port

        ga = self._import_ref_geoa3()

        # Compare against the reference AS INTENDED: its knn shim's
        # swapped-norm defect (knn_utils.py:13-15, pinned by
        # test_knn_shim_norm_swap_defect) yields NEGATIVE chamfer values
        # off the unit sphere, so the as-written loop optimizes a broken
        # objective — measured here, the as-written run "succeeds" on
        # saturated victims only BECAUSE minimizing the negative chamfer
        # blows points outward.  Substitute a correct knn_points with the
        # identical API.  NOTE: GeoA3_attack.py sys.path-hacks a BARE
        # ``loss_utils`` module (a second instance, distinct from
        # attack.GeoA3.loss_utils) — patch that one.
        import attack.GeoA3.knn_utils as ref_knn_utils

        ref_loss_utils = sys.modules["loss_utils"]

        def fixed_knn_points(p1, p2, K=1, **kw):
            d = (
                (p1[:, :, None, :] - p2[:, None, :, :]) ** 2
            ).sum(-1)  # [b, n1, n2] true sqdist
            negv, idx = torch.topk(-d, K, dim=-1)
            return ref_knn_utils._KNN(dists=-negv, idx=idx, knn=None)

        monkeypatch.setattr(ref_loss_utils, "knn_points", fixed_knn_points)
        model, variables, clouds, labels = trained_pointnet
        clouds = np.asarray(clouds, dtype=np.float32)
        labels = np.asarray(labels)

        sd = torch_port.export_pointnet(variables)
        ref_model = PointNetCls(k=3)
        ref_model.load_state_dict(
            {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}
        )
        ref_model.eval()

        cfg = types.SimpleNamespace(
            attack_method="untarget", classes=3,
            binary_max_steps=self.BINARY, iter_max_steps=self.ITERS,
            binary_step=self.BINARY, num_iter=self.ITERS,
            initial_const=10.0, optim="adam", lr=0.01,
            is_use_lr_scheduler=False,
            cls_loss_type="CE", confidence=0.0,
            dis_loss_type="CD", is_cd_single_side=False,
            dis_loss_weight=1.0, hd_loss_weight=0.1,
            curv_loss_weight=1.0, curv_loss_knn=16,
            uniform_loss_weight=0.0,
            is_partial_var=False, is_subsample_opt=False,
            npoint=64, eval_num=1,
            is_pre_jitter_input=False,
            calculate_project_jitter_noise_iter=50,
            jitter_k=16, jitter_sigma=0.01, jitter_clip=0.05,
            is_pro_grad=False, is_real_offset=False,
            cc_linf=0.0, is_debug=False, knn_range=3,
        )

        # LATENT DEFECT: the reference transfer tail feeds the
        # channels-LAST cloud (best_attack.transpose(2,1), [1,n,3]) into
        # channels-first models (GeoA3_attack.py:408-411) and crashes
        # for any n != 3 — wrap the 5 transfer slots with a transpose
        # shim so the function can complete.
        class _ChannelsLastShim(torch.nn.Module):
            def __init__(self, m):
                super().__init__()
                self.m = m

            def forward(self, x):
                return self.m(x.transpose(2, 1).contiguous())

        shim = _ChannelsLastShim(ref_model)

        torch.manual_seed(19)
        ref_succ = 0
        for i in range(self.N_SAMPLES):
            pc = torch.from_numpy(clouds[i : i + 1])  # [1, N, 3]
            lab = torch.from_numpy(labels[i : i + 1])
            _, _, success, _, _ = ga.geoA3_attack(
                ref_model, shim, shim, shim, shim, shim,
                pc, lab, cfg, i, self.N_SAMPLES,
            )
            ref_succ += int(np.asarray(success).sum())
        ref_asr = ref_succ / self.N_SAMPLES

        def model_fn(x):
            out, _ = model.apply(variables, x, train=False)
            return out

        ours = GeoA3Config(
            lr=0.01, binary_max_steps=self.BINARY,
            iter_max_steps=self.ITERS, initial_const=10.0,
            cls_loss_type="CE", dis_loss_type="CD",
            hd_loss_weight=0.1, curv_loss_weight=1.0, curv_loss_knn=16,
        )
        _, _, success = build_geoa3_attack(model_fn, ours)(
            jnp.asarray(clouds[: self.N_SAMPLES]),
            jnp.asarray(labels[: self.N_SAMPLES]),
            jax.random.PRNGKey(0),
        )
        our_asr = float(np.mean(np.asarray(success)))
        assert abs(our_asr - ref_asr) <= 1.0 / self.N_SAMPLES + 1e-9, (
            f"GeoA3 ASR ref={ref_asr} ours={our_asr}"
        )

    def test_geoa3_partial_margin_asr_parity(
        self, cpu_cuda, symeig_shim, monkeypatch, trained_pointnet
    ):
        """Partial-variable mode (is_partial_var, GeoA3_attack.py
        :259-300) with Margin cls loss (:110-120) — the reference-legal
        configuration the rebuild refused through round 4.  Patch seeds
        are host RNG on both sides, so parity is statistical ASR, same
        tolerance as the full-mode test.  The knn-shim norm-swap defect
        is corrected on the reference side exactly as in
        test_geoa3_asr_parity (the partial loop shares _forward_step)."""
        from model.pointnet import PointNetCls

        from pointcloudattack_tpu.attacks.geoa3_partial import (
            GeoA3PartialConfig,
            build_geoa3_partial_attack,
        )
        from pointcloudattack_tpu.train import torch_port

        ga = self._import_ref_geoa3()
        import attack.GeoA3.knn_utils as ref_knn_utils

        ref_loss_utils = sys.modules["loss_utils"]

        def fixed_knn_points(p1, p2, K=1, **kw):
            d = ((p1[:, :, None, :] - p2[:, None, :, :]) ** 2).sum(-1)
            negv, idx = torch.topk(-d, K, dim=-1)
            return ref_knn_utils._KNN(dists=-negv, idx=idx, knn=None)

        monkeypatch.setattr(ref_loss_utils, "knn_points", fixed_knn_points)
        # the partial path's own patch query (GeoA3_attack.py:262) only
        # self-queries the clean cloud, where the swap cancels — but fix
        # it too for hygiene
        monkeypatch.setattr(ga, "knn_points", fixed_knn_points)

        model, variables, clouds, labels = trained_pointnet
        clouds = np.asarray(clouds, dtype=np.float32)
        labels = np.asarray(labels)

        sd = torch_port.export_pointnet(variables)
        ref_model = PointNetCls(k=3)
        ref_model.load_state_dict(
            {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}
        )
        ref_model.eval()

        knn_range = 24
        cfg = types.SimpleNamespace(
            attack_method="untarget", classes=3,
            binary_max_steps=self.BINARY, iter_max_steps=self.ITERS,
            binary_step=self.BINARY, num_iter=self.ITERS,
            initial_const=10.0, optim="adam", lr=0.01,
            is_use_lr_scheduler=False,
            cls_loss_type="Margin", confidence=0.0,
            dis_loss_type="CD", is_cd_single_side=False,
            dis_loss_weight=1.0, hd_loss_weight=0.1,
            curv_loss_weight=1.0, curv_loss_knn=16,
            uniform_loss_weight=0.0,
            is_partial_var=True, is_subsample_opt=False,
            npoint=64, eval_num=1,
            is_pre_jitter_input=False,
            calculate_project_jitter_noise_iter=50,
            jitter_k=16, jitter_sigma=0.01, jitter_clip=0.05,
            is_pro_grad=False, is_real_offset=False,
            cc_linf=0.0, is_debug=False, knn_range=knn_range,
        )

        class _ChannelsLastShim(torch.nn.Module):
            def __init__(self, m):
                super().__init__()
                self.m = m

            def forward(self, x):
                return self.m(x.transpose(2, 1).contiguous())

        shim = _ChannelsLastShim(ref_model)

        torch.manual_seed(19)
        np.random.seed(19)
        ref_succ = 0
        for i in range(self.N_SAMPLES):
            pc = torch.from_numpy(clouds[i : i + 1])
            lab = torch.from_numpy(labels[i : i + 1])
            _, _, success, _, _ = ga.geoA3_attack(
                ref_model, shim, shim, shim, shim, shim,
                pc, lab, cfg, i, self.N_SAMPLES,
            )
            ref_succ += int(np.asarray(success).sum())
        ref_asr = ref_succ / self.N_SAMPLES

        def model_fn(x):
            out, _ = model.apply(variables, x, train=False)
            return out

        ours = GeoA3PartialConfig(
            lr=0.01, binary_max_steps=self.BINARY,
            iter_max_steps=self.ITERS, initial_const=10.0,
            cls_loss_type="Margin", confidence=0.0,
            dis_loss_type="CD",
            hd_loss_weight=0.1, curv_loss_weight=1.0, curv_loss_knn=16,
            knn_range=knn_range, refresh_iters=50,
        )
        _, _, success = build_geoa3_partial_attack(model_fn, ours)(
            jnp.asarray(clouds[: self.N_SAMPLES]),
            jnp.asarray(labels[: self.N_SAMPLES]),
            jax.random.PRNGKey(0),
        )
        our_asr = float(np.mean(np.asarray(success)))
        assert abs(our_asr - ref_asr) <= 1.0 / self.N_SAMPLES + 1e-9, (
            f"GeoA3 partial+Margin ASR ref={ref_asr} ours={our_asr}"
        )


class TestAddPointsEndToEnd:
    """Reference CWAdd (attack/Gen3DAdv/IndpAdd_attack.py:45-290) vs
    attacks.gen3dadv.build_add_points_attack — fifth attack family with
    measured end-to-end reference parity (critical-point seeding + CW
    binary search over ONLY the added points)."""

    N_SAMPLES = 4
    BINARY = 2
    ITERS = 60
    NUM_ADD = 16

    def test_addpoints_asr_parity(self, cpu_cuda, trained_pointnet):
        import attack.Gen3DAdv.IndpAdd_attack as ia
        from attack.CW.CW_utils.adv_utils import UntargetedLogitsAdvLoss
        from attack.CW.CW_utils.dist_utils import ChamferDist
        from model.pointnet import PointNetCls

        from pointcloudattack_tpu.attacks.gen3dadv import (
            AddPointsConfig,
            build_add_points_attack,
        )
        from pointcloudattack_tpu.train import torch_port

        model, variables, clouds, labels = trained_pointnet
        clouds = np.asarray(clouds, dtype=np.float32)
        labels = np.asarray(labels)

        sd = torch_port.export_pointnet(variables)
        ref_model = PointNetCls(k=3)
        ref_model.load_state_dict(
            {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}
        )
        ref_model.eval()

        torch.manual_seed(29)
        attacker = ia.CWAdd(
            model=ref_model, trans_model=ref_model,
            adv_func=UntargetedLogitsAdvLoss(kappa=0.0),
            dist_func=ChamferDist(method="adv2ori"),
            attack_lr=1e-2, binary_step=self.BINARY,
            num_iter=self.ITERS, num_add=self.NUM_ADD,
            attack_method="untarget",
        )
        ref_succ = 0
        for i in range(self.N_SAMPLES):
            _, _, success_num = attacker.attack(
                torch.from_numpy(clouds[i : i + 1]),
                torch.from_numpy(labels[i : i + 1]),
            )
            ref_succ += int(success_num)
        ref_asr = ref_succ / self.N_SAMPLES

        def model_fn(x):
            out, _ = model.apply(variables, x, train=False)
            return out

        cfg = AddPointsConfig(
            attack_lr=1e-2, binary_step=self.BINARY, num_iter=self.ITERS,
            num_add=self.NUM_ADD, kappa=0.0, targeted=False,
        )
        _, _, _, success = build_add_points_attack(model_fn, cfg)(
            jnp.asarray(clouds[: self.N_SAMPLES]),
            jnp.asarray(labels[: self.N_SAMPLES]),
            jax.random.PRNGKey(0),
        )
        our_asr = float(np.mean(np.asarray(success)))
        assert abs(our_asr - ref_asr) <= 1.0 / self.N_SAMPLES + 1e-9, (
            f"AddPoints ASR ref={ref_asr} ours={our_asr}"
        )


class TestAddClustersEndToEnd:
    """Reference CWAddClusters (attack/Gen3DAdv/ClusterAdd_attack.py:
    42-289) vs attacks.gen3dadv.build_add_clusters_attack — seventh
    attack family with measured end-to-end reference parity.

    Uses an N=160 victim: the reference hard-codes num_cri=128 critical
    points (ClusterAdd_attack.py:87) and topk(128) crashes on smaller
    clouds.
    """

    N_SAMPLES = 4
    BINARY = 2
    ITERS = 60
    NUM_ADD = 2
    CL_NUM_P = 8

    @pytest.fixture(scope="class")
    def victim160(self):
        from pointcloudattack_tpu import models as M
        from pointcloudattack_tpu.data.synthetic import make_synthetic_clouds
        from pointcloudattack_tpu.train.trainer import TrainConfig, fit

        clouds, labels = make_synthetic_clouds(3, 12, 160)
        model = M.make_model("PointNet", 3)
        variables = M.init_model(
            model, jax.random.PRNGKey(0), num_points=160, batch=2
        )
        variables = fit(
            model, variables, TrainConfig(epochs=30, batch_size=12),
            clouds, labels,
        )
        out, _ = model.apply(variables, jnp.asarray(clouds), train=False)
        assert (np.argmax(np.asarray(out), -1) == labels).all()
        return model, variables, np.asarray(clouds, np.float32), labels

    def test_addclusters_asr_parity(self, cpu_cuda, victim160):
        import attack.Gen3DAdv.ClusterAdd_attack as ca
        from attack.CW.CW_utils.adv_utils import UntargetedLogitsAdvLoss
        from attack.CW.CW_utils.dist_utils import FarChamferDist
        from model.pointnet import PointNetCls

        from pointcloudattack_tpu.attacks.gen3dadv import (
            AddClustersConfig,
            build_add_clusters_attack,
        )
        from pointcloudattack_tpu.train import torch_port

        model, variables, clouds, labels = victim160

        sd = torch_port.export_pointnet(variables)
        ref_model = PointNetCls(k=3)
        ref_model.load_state_dict(
            {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}
        )
        ref_model.eval()

        torch.manual_seed(37)
        np.random.seed(37)
        attacker = ca.CWAddClusters(
            model=ref_model, trans_model=ref_model,
            adv_func=UntargetedLogitsAdvLoss(kappa=0.0),
            dist_func=FarChamferDist(num_add=self.NUM_ADD),
            attack_lr=1e-2, binary_step=self.BINARY,
            num_iter=self.ITERS, num_add=self.NUM_ADD,
            cl_num_p=self.CL_NUM_P, attack_method="untarget",
        )
        ref_succ = 0
        for i in range(self.N_SAMPLES):
            _, _, success_num = attacker.attack(
                torch.from_numpy(clouds[i : i + 1]),
                torch.from_numpy(labels[i : i + 1]),
            )
            ref_succ += int(success_num)
        ref_asr = ref_succ / self.N_SAMPLES

        def model_fn(x):
            out, _ = model.apply(variables, x, train=False)
            return out

        cfg = AddClustersConfig(
            attack_lr=1e-2, binary_step=self.BINARY, num_iter=self.ITERS,
            num_add=self.NUM_ADD, cl_num_p=self.CL_NUM_P,
            kappa=0.0, targeted=False,
        )
        _, _, _, success = build_add_clusters_attack(model_fn, cfg)(
            jnp.asarray(clouds[: self.N_SAMPLES]),
            jnp.asarray(labels[: self.N_SAMPLES]),
            jax.random.PRNGKey(0),
        )
        our_asr = float(np.mean(np.asarray(success)))
        assert abs(our_asr - ref_asr) <= 1.0 / self.N_SAMPLES + 1e-9, (
            f"AddClusters ASR ref={ref_asr} ours={our_asr}"
        )


class TestUntargetedAOFEndToEnd:
    """Reference untargeted AOF — the inline loop of
    attack/AOF/Eval_AOF.py:118-262 — vs attacks.aof untargeted mode,
    eleventh loop with measured end-to-end parity.

    Eval_AOF.py:17 imports the nonexistent ``attack.CW.utils`` package
    (the directory is CW_utils — a shipped broken import, SURVEY §5);
    an alias module is registered so the file loads.  Its ``attack()``
    reads everything from module globals set by __main__, so the test
    injects them and scrapes the printed success rate (the function
    returns nothing; its npz save is commented out).
    """

    N_SAMPLES = 4
    LOW_PASS = 24
    STEPS = 2
    EPOCHS = 60

    def test_untargeted_aof_asr_parity(
        self, cpu_cuda, symeig_shim, capsys, trained_pointnet
    ):
        import importlib.util
        import re

        # Eval_AOF imports dataset.bosphorus_dataset -> open3d; stub it
        # HERE so the test doesn't depend on an earlier test in the
        # session having done so (order-independence)
        if "open3d" not in sys.modules:
            sys.modules["open3d"] = types.ModuleType("open3d")

        import attack.CW.CW_utils.dist_utils as cw_utils_pkg  # noqa: F401

        alias = types.ModuleType("attack.CW.utils")
        alias.__path__ = [str(REF / "attack/CW/CW_utils")]
        sys.modules.setdefault("attack.CW.utils", alias)
        spec = importlib.util.spec_from_file_location(
            "attack.CW.utils.dist_utils", REF / "attack/CW/CW_utils/dist_utils.py"
        )
        du = importlib.util.module_from_spec(spec)
        sys.modules.setdefault("attack.CW.utils.dist_utils", du)
        if sys.modules["attack.CW.utils.dist_utils"] is du:
            spec.loader.exec_module(du)

        spec = importlib.util.spec_from_file_location(
            "ref_eval_aof", REF / "attack/AOF/Eval_AOF.py"
        )
        ea = importlib.util.module_from_spec(spec)
        sys.modules["ref_eval_aof"] = ea
        spec.loader.exec_module(ea)

        from attack.CW.CW_utils.adv_utils import UntargetedLogitsAdvLoss
        from attack.CW.CW_utils.dist_utils import ClipPointsLinf
        from model.pointnet import PointNetCls

        from pointcloudattack_tpu.attacks.aof import AOFConfig, build_aof_attack
        from pointcloudattack_tpu.train import torch_port

        model, variables, clouds, labels = trained_pointnet
        clouds = np.asarray(clouds, dtype=np.float32)
        labels = np.asarray(labels)

        sd = torch_port.export_pointnet(variables)
        ref_model = PointNetCls(k=3)
        ref_model.load_state_dict(
            {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}
        )
        ref_model.eval()

        # inject the module globals Eval_AOF.attack() expects from main
        ea.model = ref_model
        ea.trans_model = ref_model
        ea.adv_func = UntargetedLogitsAdvLoss(kappa=0.0)
        ea.clip_func = ClipPointsLinf(budget=0.45)
        ea.device = torch.device("cpu")
        ea.args = types.SimpleNamespace(
            step=self.STEPS, epochs=self.EPOCHS, lr=0.01,
            low_pass=self.LOW_PASS, batch_size=self.N_SAMPLES,
        )
        ea.test_loader = [
            (
                torch.from_numpy(clouds[: self.N_SAMPLES]),
                torch.from_numpy(labels[: self.N_SAMPLES]),
            )
        ]

        torch.manual_seed(47)
        ea.attack()
        out = capsys.readouterr().out
        rates = re.findall(r"attack success rate:([0-9.]+)", out)
        assert rates, "reference attack() printed no success rate"
        ref_asr = float(rates[-1])

        def model_fn(x):
            out_, _ = model.apply(variables, x, train=False)
            return out_

        cfg = AOFConfig(
            attack_lr=0.01, binary_step=self.STEPS, num_iter=self.EPOCHS,
            low_pass=self.LOW_PASS, budget=0.45, kappa=0.0, targeted=False,
        )
        _, _, success = build_aof_attack(model_fn, cfg)(
            jnp.asarray(clouds[: self.N_SAMPLES]),
            jnp.asarray(labels[: self.N_SAMPLES]),
            jax.random.PRNGKey(0),
        )
        our_asr = float(np.mean(np.asarray(success)))
        assert abs(our_asr - ref_asr) <= 1.0 / self.N_SAMPLES + 1e-9, (
            f"untargeted AOF ASR ref={ref_asr} ours={our_asr}"
        )


class TestISOGradientEndToEnd:
    """Reference CTRI gradient_attack (attack/ISO/iso_attack.py:121-159)
    vs attacks.iso.build_gradient_iso_attack — tenth attack loop with
    measured end-to-end parity, from the SAME initial 3x3 transform.

    iso_attack.py must be file-loaded: ``import iso_attack`` resolves to
    the empty attack/ISO/iso_attack/ PACKAGE directory instead of the
    module of the same name (another reference layout quirk).
    """

    N_SAMPLES = 4
    STEPS = 100

    @staticmethod
    def _load_iso_attack():
        import importlib.util

        iso_dir = str(REF / "attack" / "ISO")
        if iso_dir not in sys.path:
            sys.path.insert(0, iso_dir)
        if "open3d" not in sys.modules:
            sys.modules["open3d"] = types.ModuleType("open3d")
        spec = importlib.util.spec_from_file_location(
            "ref_iso_attack", REF / "attack/ISO/iso_attack.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules["ref_iso_attack"] = mod
        real_popen = os.popen
        os.popen = lambda *a, **k: io.StringIO("24 80")
        try:
            spec.loader.exec_module(mod)
        finally:
            os.popen = real_popen
        # iso_attack.py only defines ``device`` inside its __main__
        # block (line 285) — the module-level functions NameError
        # without it when imported as a library
        mod.device = torch.device("cpu")
        return mod

    def test_ctri_asr_parity(self, cpu_cuda, trained_pointnet):
        ia = self._load_iso_attack()
        from model.pointnet import PointNetCls

        from pointcloudattack_tpu.attacks.iso import (
            ISOConfig,
            build_gradient_iso_attack,
        )
        from pointcloudattack_tpu.train import torch_port

        model, variables, clouds, labels = trained_pointnet
        clouds = np.asarray(clouds, dtype=np.float32)
        labels = np.asarray(labels)

        sd = torch_port.export_pointnet(variables)
        ref_model = PointNetCls(k=3)
        ref_model.load_state_dict(
            {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}
        )
        ref_model.eval()

        cfg = ISOConfig(
            step_size=5e-4, num_steps=self.STEPS, lam=1000.0, kappa=0.0,
        )
        args = types.SimpleNamespace(
            step_size=cfg.step_size, num_steps=self.STEPS,
            LAMBDA=cfg.lam, kappa=cfg.kappa, target=0,
        )

        def model_fn(x):
            out, _ = model.apply(variables, x, train=False)
            return out

        our_attack = build_gradient_iso_attack(model_fn, cfg)

        torch.manual_seed(43)
        ref_succ, our_succ = 0, 0
        for i in range(self.N_SAMPLES):
            # ISOnet takes channels-first [B, 3, N] (iso_attack.py:98-100)
            obj = torch.from_numpy(
                clouds[i : i + 1].transpose(0, 2, 1)
            ).contiguous()
            lab = torch.from_numpy(labels[i : i + 1]).long()
            net = ia.ISOnet(model=ref_model)
            w0 = net.iso.weight.detach().numpy().copy()
            correct, _, _, _, _, _ = ia.gradient_attack(obj, lab, net, args)
            ref_succ += int(correct == 0)

            _, okv, _, _ = our_attack(
                jnp.asarray(clouds[i : i + 1]),
                jnp.asarray(labels[i : i + 1]),
                jnp.asarray(w0),
                jax.random.PRNGKey(i),
            )
            our_succ += int(np.asarray(okv).all())

        ref_asr = ref_succ / self.N_SAMPLES
        our_asr = our_succ / self.N_SAMPLES
        assert abs(our_asr - ref_asr) <= 1.0 / self.N_SAMPLES + 1e-9, (
            f"ISO-CTRI ASR ref={ref_asr} ours={our_asr}"
        )


class TestSIAdvIFGMEndToEnd:
    """Reference shape_invariant_ifgm (attack/SIadv/SIadv_attack.py:
    279-340) vs attacks.siadv.build_si_ifgm — ninth attack family with
    measured end-to-end parity.

    Import shims: open3d stubbed (module-level import) and
    ``collections.Iterable`` restored (removed in py3.10).  The ONLY
    runtime open3d use is normal estimation; both sides are injected
    with the SAME normals (our geometry.normals.estimate_normal, torch-
    wrapped for the reference via a get_normal_vector patch) so the
    comparison isolates the spin-axis pipeline, gradients, and clipping.
    The attack object is built via __new__ — the reference constructor
    hard-loads ~/yq_pointnet checkpoints (SIadv_attack.py:101-107).
    """

    N_SAMPLES = 4
    STEPS = 30

    def test_ifgm_asr_parity(self, cpu_cuda, monkeypatch, trained_pointnet):
        import collections
        import collections.abc

        collections.Iterable = collections.abc.Iterable
        if "open3d" not in sys.modules:
            sys.modules["open3d"] = types.ModuleType("open3d")
        siadv_dir = str(REF / "attack" / "SIadv")
        if siadv_dir not in sys.path:
            sys.path.insert(0, siadv_dir)
        import attack.SIadv.SIadv_attack as sa
        from model.pointnet import PointNetCls

        from pointcloudattack_tpu.attacks.siadv import (
            SIAdvConfig,
            build_si_ifgm,
        )
        from pointcloudattack_tpu.geometry.normals import estimate_normal
        from pointcloudattack_tpu.train import torch_port

        model, variables, clouds, labels = trained_pointnet
        clouds = np.asarray(clouds, dtype=np.float32)
        labels = np.asarray(labels)

        sd = torch_port.export_pointnet(variables)
        ref_model = PointNetCls(k=3)
        ref_model.load_state_dict(
            {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}
        )
        ref_model.eval()

        cfg = SIAdvConfig(eps=0.45, step_size=0.01, max_steps=self.STEPS)

        # CWLoss casts via the torch.cuda.FloatTensor TYPE directly
        # (SIadv_attack.py:148-149) — alias it to the CPU type
        monkeypatch.setattr(
            torch.cuda, "FloatTensor", torch.FloatTensor, raising=False
        )

        atk = sa.PointCloudAttack.__new__(sa.PointCloudAttack)
        atk.device = "cpu"
        atk.eps = cfg.eps
        atk.normal = False
        atk.step_size = cfg.step_size
        atk.num_class = 3
        atk.max_steps = self.STEPS
        atk.top5_attack = False
        atk.attack_method = "ifgm_ours"
        atk.defense_method = None
        atk.wb_classifier = ref_model
        atk.classifier = ref_model

        def jax_normals(points_t):
            pts = jnp.asarray(points_t.detach().numpy())
            n = estimate_normal(pts, k=cfg.normal_k)
            return torch.from_numpy(np.asarray(n))

        monkeypatch.setattr(
            sa.PointCloudAttack, "get_normal_vector",
            lambda self, pts: jax_normals(pts),
        )

        ref_succ = 0
        for i in range(self.N_SAMPLES):
            pts = torch.from_numpy(clouds[i : i + 1])
            normals0 = jax_normals(pts)
            with_n = torch.cat([pts, normals0], dim=-1)  # [1, N, 6]
            _, _, succ = atk.shape_invariant_ifgm(
                with_n, torch.from_numpy(labels[i : i + 1])
            )
            ref_succ += int(succ)
        ref_asr = ref_succ / self.N_SAMPLES

        def model_fn(x):
            out, _ = model.apply(variables, x, train=False)
            return out

        _, _, success = build_si_ifgm(model_fn, model_fn, cfg)(
            jnp.asarray(clouds[: self.N_SAMPLES]),
            jnp.asarray(labels[: self.N_SAMPLES]),
        )
        our_asr = float(np.mean(np.asarray(success)))
        assert abs(our_asr - ref_asr) <= 1.0 / self.N_SAMPLES + 1e-9, (
            f"SIadv-iFGM ASR ref={ref_asr} ours={our_asr}"
        )


class TestRobustCWEndToEnd:
    """Reference additional_exp CW (attack/additional_exp/CW_attack.py:
    11-314, reference-DEFAULT whether_1d z-only box mode) vs
    attacks.cw_robust — eighth attack family with measured parity.

    The reference class is ORPHANED as shipped: its own Test_CW.py:27
    imports the standard attack.CW.CW_attack.CW instead, the
    ``whether_target=`` kwarg it passes to adv_func matches no shipped
    loss class, and the untargeted branch zips a 0-d array
    (CW_attack.py:172-173, dist_func returns a scalar under its default
    batch_avg).  Faithful shims: adv_func dispatches to the REAL
    Logits/UntargetedLogits losses; dist_func is L2Dist with
    batch_avg=False so B=1 keeps its batch axis.
    """

    N_SAMPLES = 4
    BINARY = 2
    ITERS = 80

    def test_robust_1d_asr_parity(self, cpu_cuda, trained_pointnet):
        import attack.additional_exp.CW_attack as rc
        from attack.CW.CW_utils.adv_utils import (
            LogitsAdvLoss,
            UntargetedLogitsAdvLoss,
        )
        from attack.CW.CW_utils.dist_utils import L2Dist
        from model.pointnet import PointNetCls

        from pointcloudattack_tpu.attacks.cw_robust import (
            RobustCWConfig,
            build_robust_cw_attack,
        )
        from pointcloudattack_tpu.losses import l2_dist
        from pointcloudattack_tpu.train import torch_port

        model, variables, clouds, labels = trained_pointnet
        clouds = np.asarray(clouds, dtype=np.float32)
        labels = np.asarray(labels)

        sd = torch_port.export_pointnet(variables)
        ref_model = PointNetCls(k=3)
        ref_model.load_state_dict(
            {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}
        )
        ref_model.eval()

        t_loss = LogitsAdvLoss(kappa=0.0)
        u_loss = UntargetedLogitsAdvLoss(kappa=0.0)

        def adv_func(logits, target, whether_target):
            return (
                t_loss(logits, target)
                if whether_target
                else u_loss(logits, target)
            )

        def dist_func(adv, ori, weights):
            return L2Dist()(adv, ori, weights=weights, batch_avg=False)

        torch.manual_seed(41)
        attacker = rc.CW(
            ref_model, adv_func, dist_func, attack_lr=1e-2,
            binary_step=self.BINARY, num_iter=self.ITERS,
            whether_target=False, whether_1d=True,
        )
        ref_succ = 0
        for i in range(self.N_SAMPLES):
            _, _, success_num = attacker.attack(
                torch.from_numpy(clouds[i : i + 1]),
                target=torch.Tensor([0]),
                origin_label=torch.from_numpy(labels[i : i + 1]),
            )
            ref_succ += int(success_num)
        ref_asr = ref_succ / self.N_SAMPLES

        def model_fn(x):
            out, _ = model.apply(variables, x, train=False)
            return out

        cfg = RobustCWConfig(
            attack_lr=1e-2, binary_step=self.BINARY, num_iter=self.ITERS,
            targeted=False, kappa=0.0, whether_1d=True,
        )
        _, _, success = build_robust_cw_attack(model_fn, l2_dist, cfg)(
            jnp.asarray(clouds[: self.N_SAMPLES]),
            jnp.asarray(labels[: self.N_SAMPLES]),
            jax.random.PRNGKey(0),
        )
        our_asr = float(np.mean(np.asarray(success)))
        assert abs(our_asr - ref_asr) <= 1.0 / self.N_SAMPLES + 1e-9, (
            f"RobustCW-1d ASR ref={ref_asr} ours={our_asr}"
        )


class TestCTAEndToEnd:
    """Reference CTA act_max (attack/CTA/CTA.py:58-286) vs
    attacks.cta.build_cta_attack — sixth attack family with measured
    end-to-end reference parity.

    Reference quirks handled:
      * when stagnation exhausts every patch size before the
        15000-step cap, act_max falls off the end of its for loop and
        returns None (the 'Fail' return at CTA.py:283-286 is
        unreachable on that path) — treated as a failed attack;
      * the saliency helper hard-codes a 2-row one-hot
        (vanilla_gradient.py:11,20-21 set_size=2) while Eval_CTA feeds
        batch_size=1 — the shipped runner IndexErrors in its own IG
        step.  The cloud is duplicated to B=2 here (act_max reads and
        perturbs only row 0, so row 1 is a passenger).
    """

    N_SAMPLES = 3

    def test_cta_asr_parity(self, cpu_cuda, trained_pointnet):
        _ensure_torchvision_stub()
        import attack.CTA.CTA as ref_cta
        from model.pointnet import PointNetCls

        from pointcloudattack_tpu.attacks.cta import (
            CTAConfig,
            build_cta_attack,
        )
        from pointcloudattack_tpu.train import torch_port

        model, variables, clouds, labels = trained_pointnet
        clouds = np.asarray(clouds, dtype=np.float32)
        labels = np.asarray(labels)

        sd = torch_port.export_pointnet(variables)
        ref_model = PointNetCls(k=3)
        ref_model.load_state_dict(
            {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}
        )
        ref_model.eval()
        layer_activation = {}
        ref_model.fc3.register_forward_hook(
            ref_cta.layer_hook(layer_activation, "fc3")
        )

        torch.manual_seed(31)
        ref_succ = 0
        for i in range(self.N_SAMPLES):
            two = np.concatenate([clouds[i : i + 1]] * 2, axis=0)
            x = torch.from_numpy(
                two.transpose(0, 2, 1)
            ).requires_grad_(True)
            out = ref_cta.act_max(
                network=ref_model, input=x,
                layer_activation=layer_activation, layer_name="fc3",
                ori_cls=int(labels[i]),
                alpha=torch.tensor(1e-6), beta=torch.tensor(1e-4),
                target_att=False, IG_steps=25,
            )
            if out is not None and out[0] == "Suc":
                ref_succ += 1
        ref_asr = ref_succ / self.N_SAMPLES

        def model_fn(a):
            out, _ = model.apply(variables, a, train=False)
            return out

        _, _, success, _ = build_cta_attack(
            model_fn, CTAConfig(target_mode="untarget")
        )(
            jnp.asarray(clouds[: self.N_SAMPLES]),
            jnp.asarray(labels[: self.N_SAMPLES]),
            jax.random.PRNGKey(0),
        )
        our_asr = float(np.mean(np.asarray(success)))
        # Documented deviation (attacks/cta.py): the reference's
        # 25-step plateau test watches the RAW fc3 activation via a
        # forward hook; our models return log-probs, whose logsumexp
        # drift keeps the monitored signal moving, so our loop gives up
        # later and is measurably STRONGER (ref 1/3 vs ours 3/3 on this
        # fixture) — assert non-inferiority, not equality.
        assert our_asr >= ref_asr - 1e-9, (
            f"CTA ASR ref={ref_asr} ours={our_asr}"
        )
        assert our_asr > 0.0


class TestISOComponentParity:
    """attacks/iso.py vs the importable reference ISO modules
    (attack/ISO/isometry_init.py, thompson_sample.py — iso_attack.py
    itself imports open3d and cannot load in this image)."""

    @staticmethod
    def _ref_modules():
        iso_dir = str(REF / "attack" / "ISO")
        if iso_dir not in sys.path:
            sys.path.insert(0, iso_dir)
        import isometry_init as ref_iso

        return ref_iso

    def test_rotation_xyz_matrix(self):
        """Degenerate interval [theta, theta] pins the reference's
        internal np.random.uniform draw to theta exactly."""
        from pointcloudattack_tpu.attacks.iso import rotation_xyz

        ref_iso = self._ref_modules()
        angles = np.array([0.3, -1.2, 2.5])
        want = ref_iso.rotation_xyz(a=angles, b=angles)
        got = rotation_xyz(angles)
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_reflection_matrix(self):
        from pointcloudattack_tpu.attacks.iso import reflection

        ref_iso = self._ref_modules()
        angles = np.array([0.7, 1.9, 0.0])
        want = ref_iso.reflection(a=angles, b=angles)
        got = reflection(angles)
        np.testing.assert_allclose(got, want, atol=1e-12)
        # householder: orthogonal with det -1
        assert abs(np.linalg.det(got) + 1.0) < 1e-9

    def test_bandit_action_sequence(self):
        """Same Beta-posterior draws -> same arm sequence and identical
        alpha/beta state after identical rewards
        (thompson_sample.py:56-81)."""
        self._ref_modules()
        import thompson_sample as ref_ts

        from pointcloudattack_tpu.attacks.iso import BernThompson

        env = ref_ts.environment(d=4, a0=-np.pi, b0=np.pi)
        ref_bandit = ref_ts.BernThompson(env)
        np.random.seed(99)

        ours = BernThompson(d=4, a0=-np.pi, b0=np.pi, seed=99)

        rewards = [0, 1, 0, 0, 1, 1, 0, 1]
        for r in rewards:
            ref_arm = ref_bandit.get_action()
            our_arm = ours.get_action()
            assert tuple(ref_arm) == tuple(our_arm)
            ref_bandit._update_params(ref_arm, r)
            ours.update(our_arm, r)
        np.testing.assert_array_equal(ours.alpha, ref_bandit.alpha)
        np.testing.assert_array_equal(ours.beta, ref_bandit.beta)

    def test_apply_iso_is_torch_linear(self, cpu_cuda):
        """apply_iso == nn.Linear(3,3,bias=False) on channels-last
        clouds (reference ISOnet, iso_attack.py:89-101)."""
        from pointcloudattack_tpu.attacks.iso import apply_iso

        torch.manual_seed(41)
        lin = torch.nn.Linear(3, 3, bias=False)
        x = RNG.randn(2, 50, 3).astype(np.float32)
        with torch.no_grad():
            want = lin(torch.from_numpy(x)).numpy()
        got = np.asarray(
            apply_iso(
                jnp.asarray(x), jnp.asarray(lin.weight.detach().numpy())
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestTAOFEndToEnd:
    """Reference CWTAOF (attack/AOF/TAOF_attack.py:83-244) vs attacks.aof
    targeted mode on the same exported victim."""

    N_SAMPLES = 5
    BINARY_STEP = 2
    NUM_ITER = 60
    LOW_PASS = 32
    BUDGET = 0.45

    def test_taof_asr_parity(self, cpu_cuda, symeig_shim, trained_pointnet):
        from attack.AOF.TAOF_attack import CWTAOF
        from attack.CW.CW_utils.adv_utils import LogitsAdvLoss
        from attack.CW.CW_utils.clip_utils import ClipPointsLinf
        from attack.CW.CW_utils.dist_utils import L2Dist
        from model.pointnet import PointNetCls

        from pointcloudattack_tpu.attacks.aof import AOFConfig, build_aof_attack
        from pointcloudattack_tpu.train import torch_port

        model, variables, clouds, labels = trained_pointnet
        clouds = np.asarray(clouds, dtype=np.float32)
        labels = np.asarray(labels)
        targets = (labels + 1) % 3

        sd = torch_port.export_pointnet(variables)
        ref_model = PointNetCls(k=3)
        ref_model.load_state_dict(
            {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}
        )
        ref_model.eval()

        torch.manual_seed(17)
        attacker = CWTAOF(
            model=ref_model,
            adv_func=LogitsAdvLoss(kappa=0.0),
            dist_func=L2Dist(),
            attack_lr=1e-2,
            binary_step=self.BINARY_STEP,
            num_iter=self.NUM_ITER,
            GAMMA=0.5,
            low_pass=self.LOW_PASS,
            clip_func=ClipPointsLinf(budget=self.BUDGET),
        )
        ref_succ = 0
        for i in range(self.N_SAMPLES):
            _, _, success_num = attacker.attack(
                torch.from_numpy(clouds[i : i + 1]),
                torch.from_numpy(targets[i : i + 1]),
                y_truth=torch.from_numpy(labels[i : i + 1]),
            )
            ref_succ += success_num
        ref_asr = ref_succ / self.N_SAMPLES

        def model_fn(x):
            out, _ = model.apply(variables, x, train=False)
            return out

        cfg = AOFConfig(
            attack_lr=1e-2,
            binary_step=self.BINARY_STEP,
            num_iter=self.NUM_ITER,
            gamma=0.5,
            low_pass=self.LOW_PASS,
            budget=self.BUDGET,
            kappa=0.0,
            targeted=True,
        )
        attack_fn = build_aof_attack(model_fn, cfg)
        _, _, success = attack_fn(
            jnp.asarray(clouds[: self.N_SAMPLES]),
            jnp.asarray(targets[: self.N_SAMPLES]),
            jax.random.PRNGKey(0),
            jnp.asarray(labels[: self.N_SAMPLES]),
        )
        our_asr = float(np.mean(np.asarray(success)))
        assert abs(our_asr - ref_asr) <= 1.0 / self.N_SAMPLES + 1e-9, (
            f"TAOF ASR ref={ref_asr} ours={our_asr}"
        )
