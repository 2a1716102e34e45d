"""End-to-end reference parity for the QUERY attack families.

Closes the last unmeasured families from SURVEY.md §2.2: SimBA, SimBA++
and SI-query (attack/SIadv/SIadv_attack.py:343-624) plus the ISO TSI
bandit loop (attack/ISO/iso_attack.py:104-118), each run against the
ACTUAL reference PyTorch code on a shared exported victim.

Methodology per family:
  * SimBA: the only randomness is the basis shuffle — the reference's
    ``np.random.shuffle`` is patched to produce OUR key's permutation,
    after which both loops are deterministic and compared candidate-for-
    candidate (adv clouds, per-sample query costs, success flags).
  * SI-query: deterministic given normals and the white-box gradient —
    the reference's open3d normal estimation is replaced by our
    estimator (the established iFGM harness pattern), then compared
    like SimBA.
  * SimBA++: NOT path-comparable — the reference decodes its
    categorical sample with the wrong flat layout (:452,:466-469, see
    attacks/siadv.py docstring) and draws independent probe noise; the
    decode scramble is pinned here and ASR/query-cost are compared
    statistically under pinned seeds.
  * TSI: the reference bandit + interval samplers consume the global
    numpy stream in exactly the order our BernThompson consumes its
    RandomState — seeding both identically makes the full attack loop
    (arms, matrices, accept decisions, best-matrix selection)
    reproducible and compared exactly.

Import shims follow test_reference_parity2.py: open3d / iso_utils /
dataset stubs (terminal UI + data loading only, no attack math),
``collections.Iterable`` restored, torch.cuda.FloatTensor aliased,
hard-coded cuda devices patched to CPU.
"""

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

from pointcloudattack_tpu.train import torch_port  # noqa: E402


@pytest.fixture
def cpu_cuda(monkeypatch):
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    monkeypatch.setattr(torch.nn.Module, "cuda", lambda self, *a, **k: self)
    monkeypatch.setattr(
        torch.cuda, "FloatTensor", torch.FloatTensor, raising=False
    )


def _export_victim(model, variables):
    """flax trained_pointnet -> reference PointNetCls on CPU."""
    from model.pointnet import PointNetCls

    sd = torch_port.export_pointnet(variables)
    ref_model = PointNetCls(k=3)
    ref_model.load_state_dict(
        {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}
    )
    ref_model.eval()
    return ref_model


def _import_siadv():
    """Import the reference SIadv attack class (iFGM harness shims)."""
    import collections
    import collections.abc

    collections.Iterable = collections.abc.Iterable
    if "open3d" not in sys.modules:
        sys.modules["open3d"] = types.ModuleType("open3d")
    siadv_dir = str(REF / "attack" / "SIadv")
    if siadv_dir not in sys.path:
        sys.path.insert(0, siadv_dir)
    import attack.SIadv.SIadv_attack as sa

    return sa


def _siadv_attacker(sa, ref_model, step_size, eps=0.45, num_class=3):
    atk = sa.PointCloudAttack.__new__(sa.PointCloudAttack)
    atk.device = "cpu"
    atk.eps = eps
    atk.normal = False
    atk.step_size = step_size
    atk.num_class = num_class
    atk.max_steps = 50
    atk.top5_attack = False
    atk.defense_method = None
    atk.wb_classifier = ref_model
    atk.classifier = ref_model
    return atk


def _model_fn(model, variables):
    def fn(x):
        out, _ = model.apply(variables, x, train=False)
        return out

    return fn


class TestSimBAEndToEnd:
    """Reference simba_attack (SIadv_attack.py:343-414) vs
    attacks.siadv.build_simba — candidate-for-candidate parity once the
    basis orders coincide."""

    N_SAMPLES = 4
    STEP = 0.4

    def test_simba_path_parity(self, cpu_cuda, monkeypatch,
                               trained_pointnet):
        from pointcloudattack_tpu.attacks.siadv import (
            SIAdvConfig,
            build_simba,
        )

        sa = _import_siadv()
        model, variables, clouds, labels = trained_pointnet
        clouds = np.asarray(clouds, dtype=np.float32)
        labels = np.asarray(labels)
        n = clouds.shape[1]

        ref_model = _export_victim(model, variables)
        atk = _siadv_attacker(sa, ref_model, self.STEP)

        # our basis permutation, forced onto the reference's shuffle:
        # basis_list[k] == (k % 3, k // 3) pre-shuffle, so reordering by
        # our flat permutation makes both loops probe identically
        key = jax.random.PRNGKey(5)
        basis_np = np.asarray(jax.random.permutation(key, n * 3))

        def fake_shuffle(a):
            a[:] = a[basis_np]

        monkeypatch.setattr(sa.np.random, "shuffle", fake_shuffle)

        ref_adv, ref_queries, ref_succ = [], [], []
        for i in range(self.N_SAMPLES):
            pts = torch.from_numpy(clouds[i : i + 1])
            lab = torch.from_numpy(labels[i : i + 1])
            adv, adv_target, q = atk.simba_attack(pts, lab)
            ref_adv.append(adv.detach().numpy()[0])
            ref_queries.append(int(q))
            ref_succ.append(int(adv_target.item()) != int(labels[i]))

        cfg = SIAdvConfig(step_size=self.STEP)
        adv, pred, success, queries = build_simba(
            _model_fn(model, variables), cfg
        )(
            jnp.asarray(clouds[: self.N_SAMPLES]),
            jnp.asarray(labels[: self.N_SAMPLES]),
            key,
        )

        assert list(np.asarray(success)) == ref_succ
        assert list(np.asarray(queries)) == ref_queries
        np.testing.assert_allclose(
            np.asarray(adv), np.stack(ref_adv), atol=1e-4
        )


class TestSimBAppEndToEnd:
    """Reference simbapp_attack (SIadv_attack.py:417-500) vs
    attacks.siadv.build_simbapp — statistical parity (the reference's
    decode scramble and independent probe noise preclude path matching;
    the scramble itself is pinned below)."""

    N_SAMPLES = 4
    STEP = 0.4

    def test_simbapp_asr_and_query_cost(self, cpu_cuda, trained_pointnet):
        from pointcloudattack_tpu.attacks.siadv import (
            SIAdvConfig,
            build_simbapp,
        )

        sa = _import_siadv()
        model, variables, clouds, labels = trained_pointnet
        clouds = np.asarray(clouds, dtype=np.float32)
        labels = np.asarray(labels)

        ref_model = _export_victim(model, variables)

        # LATENT DEFECT (pinned): simbapp_attack:429-432 forgets the
        # ``logits,_,_ =`` tuple unpack every sibling uses (:357, :522)
        # and calls ``.max`` on the raw model tuple — upstream simbapp
        # crashes for ANY tuple-returning victim.  Faithful shim: a
        # tuple subclass exposing .max of its logits, altering no math.
        class _TupleWithMax(tuple):
            def max(self, *a, **k):
                return self[0].max(*a, **k)

        class _Wrapped(torch.nn.Module):
            def __init__(self, inner):
                super().__init__()
                self.inner = inner

            def forward(self, x):
                return _TupleWithMax(self.inner(x))

        atk = _siadv_attacker(sa, _Wrapped(ref_model), self.STEP)

        torch.manual_seed(23)
        np.random.seed(23)
        ref_queries, ref_succ = [], []
        for i in range(self.N_SAMPLES):
            pts = torch.from_numpy(clouds[i : i + 1])
            lab = torch.from_numpy(labels[i : i + 1])
            _, adv_target, q = atk.simbapp_attack(pts, lab)
            ref_queries.append(int(q))
            ref_succ.append(int(adv_target.item()) != int(labels[i]))
        ref_asr = float(np.mean(ref_succ))
        ref_mean_q = float(np.mean(ref_queries))

        cfg = SIAdvConfig(step_size=self.STEP)
        fn = _model_fn(model, variables)
        _, _, success, queries = build_simbapp(fn, fn, cfg)(
            jnp.asarray(clouds[: self.N_SAMPLES]),
            jnp.asarray(labels[: self.N_SAMPLES]),
            jax.random.PRNGKey(11),
        )
        our_asr = float(np.mean(np.asarray(success)))
        our_mean_q = float(np.mean(np.asarray(queries)))

        # the reference's decode scramble wastes its own sensitivity
        # map (measured here: ref 2/4 within the basis budget, ours
        # 4/4) — sampling from the REAL map is measurably STRONGER, so
        # assert non-inferiority on ASR and on query cost, not equality
        # (the CTA-family precedent for deviations that strengthen)
        assert our_asr >= ref_asr - 1e-9, (
            f"SimBA++ ASR ref={ref_asr} ours={our_asr}"
        )
        assert our_asr > 0.0
        assert our_mean_q <= ref_mean_q + 1e-9, (
            f"SimBA++ mean queries ref={ref_mean_q} ours={our_mean_q}"
        )

    def test_decode_scramble_defect(self, cpu_cuda):
        """Pin the latent defect: the reference flattens the [1, 3, N]
        gradient (flat = channel*N + idx) but decodes samples as
        channel = f % 3, idx = f // 3 (SIadv_attack.py:466-469), so the
        perturbed coordinate is unrelated to the sampled weight."""
        n = 8
        # gradient mass entirely on channel 2, point 5 -> flat 2*n+5=21
        f = 2 * n + 5
        channel, idx = f % 3, f // 3  # the reference's decode
        assert (channel, idx) != (2, 5)  # NOT the sampled coordinate


class TestSIQueryEndToEnd:
    """Reference shape_invariant_query_attack (SIadv_attack.py:503-624)
    vs attacks.siadv.build_si_query_attack — deterministic comparison
    with shared normals."""

    N_SAMPLES = 4
    STEP = 0.4

    def test_si_query_parity(self, cpu_cuda, monkeypatch,
                             trained_pointnet):
        from pointcloudattack_tpu.attacks.siadv import (
            SIAdvConfig,
            build_si_query_attack,
        )
        from pointcloudattack_tpu.geometry.normals import estimate_normal

        sa = _import_siadv()
        model, variables, clouds, labels = trained_pointnet
        clouds = np.asarray(clouds, dtype=np.float32)
        labels = np.asarray(labels)

        ref_model = _export_victim(model, variables)
        cfg = SIAdvConfig(eps=0.45, step_size=self.STEP, normal_k=20)
        atk = _siadv_attacker(sa, ref_model, self.STEP, eps=cfg.eps)

        def jax_normals(points_t):
            pts = jnp.asarray(points_t.detach().numpy()[..., :3])
            nrm = estimate_normal(pts, k=cfg.normal_k)
            return torch.from_numpy(np.asarray(nrm))

        monkeypatch.setattr(
            sa.PointCloudAttack, "get_normal_vector",
            lambda self, pts: jax_normals(pts),
        )

        ref_queries, ref_succ = [], []
        for i in range(self.N_SAMPLES):
            pts = torch.from_numpy(clouds[i : i + 1])
            lab = torch.from_numpy(labels[i : i + 1])
            _, adv_target, q = atk.shape_invariant_query_attack(pts, lab)
            ref_queries.append(int(q))
            ref_succ.append(int(adv_target.item()) != int(labels[i]))

        fn = _model_fn(model, variables)
        _, _, success, queries = build_si_query_attack(fn, fn, cfg)(
            jnp.asarray(clouds[: self.N_SAMPLES]),
            jnp.asarray(labels[: self.N_SAMPLES]),
        )

        assert list(np.asarray(success)) == ref_succ
        assert list(np.asarray(queries)) == ref_queries


class TestTSIEndToEnd:
    """Reference thompson_sample_attack (iso_attack.py:104-118) vs
    attacks.iso.thompson_sample_attack — exact loop parity under a
    shared RNG stream."""

    N_SAMPLES = 3
    NUM_INIT = 20
    D = 4

    def _import_iso(self):
        """iso_attack.py imports open3d + terminal/data helpers it never
        uses in the attack path — stub them, then load BY FILE PATH
        (``import iso_attack`` resolves to the attack/ISO/iso_attack/
        PACKAGE directory that shadows the module upstream)."""
        import importlib.util

        iso_dir = REF / "attack" / "ISO"
        if str(iso_dir) not in sys.path:
            sys.path.insert(0, str(iso_dir))
        if "open3d" not in sys.modules:
            sys.modules["open3d"] = types.ModuleType("open3d")
        iu = types.ModuleType("iso_utils")
        iu.progress_bar = lambda *a, **k: None
        iu.adjust_lr_steep = lambda *a, **k: None
        iu.log_row = lambda *a, **k: None
        sys.modules["iso_utils"] = iu
        ds = types.ModuleType("dataset.bosphorus_dataset")
        ds.Bosphorus_Dataset = object
        sys.modules["dataset.bosphorus_dataset"] = ds

        import thompson_sample as ref_ts

        spec = importlib.util.spec_from_file_location(
            "ref_iso_attack", iso_dir / "iso_attack.py"
        )
        ia = importlib.util.module_from_spec(spec)
        sys.modules["ref_iso_attack"] = ia
        spec.loader.exec_module(ia)

        ia.device = torch.device("cpu")
        ref_ts.device = torch.device("cpu")
        return ia, ref_ts

    def test_tsi_loop_parity(self, cpu_cuda, trained_pointnet):
        from pointcloudattack_tpu.attacks.iso import (
            BernThompson,
            build_tsi_probe,
            thompson_sample_attack,
        )

        ia, ref_ts = self._import_iso()
        model, variables, clouds, labels = trained_pointnet
        clouds = np.asarray(clouds, dtype=np.float32)
        labels = np.asarray(labels)

        ref_model = _export_victim(model, variables)
        isonet = ia.ISOnet(ref_model)
        isonet.eval()

        # env construction consumes d^3 global draws (generate_thetas);
        # seed AFTER it so both streams start aligned (the established
        # component-test pattern)
        env = ref_ts.environment(d=self.D, a0=-np.pi, b0=np.pi)
        ref_bandit = ref_ts.BernThompson(env)
        np.random.seed(123)
        ours = BernThompson(d=self.D, a0=-np.pi, b0=np.pi, seed=123)

        probe = build_tsi_probe(_model_fn(model, variables))

        for i in range(self.N_SAMPLES):
            obj = torch.from_numpy(
                np.ascontiguousarray(
                    clouds[i : i + 1].transpose(0, 2, 1)
                )
            )
            lab = torch.from_numpy(labels[i : i + 1])
            ref_w, _ = ia.thompson_sample_attack(
                ref_bandit, obj, lab, isonet, num_init=self.NUM_INIT
            )
            with torch.no_grad():
                isonet.iso.weight.data = ref_w
                logits, _, _ = isonet(obj)
            ref_success = int(logits.argmax(-1).item()) != int(labels[i])

            our_w, our_success, _ = thompson_sample_attack(
                None,
                ours,
                jnp.asarray(clouds[i : i + 1]),
                jnp.asarray(labels[i : i + 1]),
                num_init=self.NUM_INIT,
                probe=probe,
            )
            np.testing.assert_allclose(
                np.asarray(our_w), ref_w.detach().numpy(), atol=1e-6,
                err_msg=f"sample {i} best matrix",
            )
            assert bool(our_success) == ref_success, f"sample {i}"

        # identical posteriors after identical rewards
        np.testing.assert_array_equal(ours.alpha, ref_bandit.alpha)
        np.testing.assert_array_equal(ours.beta, ref_bandit.beta)
