"""Geometry subsystem tests: normals, spectral split, tangent frames."""

import numpy as np
import jax
import jax.numpy as jnp

from pointcloudattack_tpu import geometry

RNG = np.random.RandomState(11)


def plane_cloud(n=128, normal=(0.0, 0.0, 1.0)):
    """Points on a plane through the origin with the given normal."""
    normal = np.float32(normal) / np.linalg.norm(normal)
    # basis of the plane
    a = np.float32([1, 0, 0])
    if abs(normal[0]) > 0.9:
        a = np.float32([0, 1, 0])
    u = np.cross(normal, a)
    u /= np.linalg.norm(u)
    v = np.cross(normal, u)
    coeff = RNG.randn(n, 2).astype(np.float32)
    pts = coeff[:, :1] * u + coeff[:, 1:2] * v
    return pts.astype(np.float32)[None], normal


class TestNormals:
    def test_plane_normals(self):
        pts, true_n = plane_cloud()
        out = np.asarray(geometry.estimate_normal(jnp.asarray(pts), k=8))[0]
        cos = np.abs(out @ true_n)
        np.testing.assert_allclose(cos, 1.0, atol=1e-3)

    def test_unit_norm(self):
        pc = jnp.asarray(RNG.randn(2, 64, 3).astype(np.float32))
        out = np.asarray(geometry.estimate_normal(pc, k=6))
        np.testing.assert_allclose(
            np.linalg.norm(out, axis=-1), 1.0, atol=1e-4
        )

    def test_via_ori_normal_unmoved(self):
        pc = jnp.asarray(RNG.randn(1, 32, 3).astype(np.float32))
        normal = geometry.estimate_normal(pc, k=6)
        borrowed = geometry.estimate_normal_via_ori_normal(
            pc, pc, normal, k=4
        )
        np.testing.assert_allclose(
            np.asarray(borrowed), np.asarray(normal), atol=1e-5
        )

    def test_perpendicular_jitter_in_tangent_plane(self):
        pts, true_n = plane_cloud()
        jit = np.asarray(
            geometry.estimate_perpendicular_jitter(
                jnp.asarray(pts), k=8, key=jax.random.PRNGKey(0)
            )
        )[0]
        # jitter must be (near-)orthogonal to the plane normal
        proj = np.abs(jit @ true_n)
        assert proj.max() < 1e-4


class TestSpectral:
    def test_split_reconstructs(self):
        pc = jnp.asarray(RNG.randn(2, 48, 3).astype(np.float32))
        evals, evecs = geometry.graph_laplacian(pc, k=10)
        lfc, hfc = geometry.spectral_split(pc, evecs, low_pass=12)
        np.testing.assert_allclose(
            np.asarray(lfc + hfc), np.asarray(pc), atol=1e-4
        )

    def test_laplacian_psd_and_ordered(self):
        pc = jnp.asarray(RNG.randn(1, 48, 3).astype(np.float32))
        evals, _ = geometry.graph_laplacian(pc, k=10)
        e = np.asarray(evals)[0]
        assert e.min() > -1e-4  # PSD up to float error
        assert np.all(np.diff(e) >= -1e-5)  # ascending

    def test_constant_vector_in_kernel(self):
        pc = jnp.asarray(RNG.randn(1, 48, 3).astype(np.float32))
        evals, evecs = geometry.graph_laplacian(pc, k=10)
        # smallest eigenvalue ~ 0 with constant eigenvector
        assert abs(float(evals[0, 0])) < 1e-3


class TestTangent:
    def test_frame_orthonormal(self):
        n = RNG.randn(1, 64, 3).astype(np.float32)
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        u = np.asarray(geometry.spin_axis_matrix(jnp.asarray(n)))
        prod = np.einsum("bnij,bnkj->bnik", u, u)
        np.testing.assert_allclose(
            prod, np.broadcast_to(np.eye(3), prod.shape), atol=1e-4
        )

    def test_pole_case(self):
        n = np.float32([[[0, 0, 1]], [[0, 0, -1]]])  # [2, 1, 3]
        u = np.asarray(geometry.spin_axis_matrix(jnp.asarray(n)))
        assert np.all(np.isfinite(u))
        prod = np.einsum("bnij,bnkj->bnik", u, u)
        np.testing.assert_allclose(
            prod, np.broadcast_to(np.eye(3), prod.shape), atol=1e-4
        )

    def test_roundtrip(self):
        pts = jnp.asarray(RNG.randn(1, 64, 3).astype(np.float32))
        n = RNG.randn(1, 64, 3).astype(np.float32)
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        new_pts, u, tr = geometry.to_tangent_frame(pts, jnp.asarray(n))
        back = geometry.from_tangent_frame(new_pts, u, tr)
        np.testing.assert_allclose(
            np.asarray(back), np.asarray(pts), atol=1e-4
        )


class TestLowpassBasis:
    """LOBPCG subspace solve vs the dense eigh path."""

    def _cloud(self, b=2, n=256):
        rng = np.random.RandomState(3)
        return jnp.asarray(rng.randn(b, n, 3).astype(np.float32))

    def test_dense_matches_full_eigh_split(self):
        pc = self._cloud()
        _, evecs = geometry.graph_laplacian(pc, k=10)
        lfc_full, hfc_full = geometry.spectral_split(pc, evecs, low_pass=24)
        _, basis = geometry.lowpass_basis(pc, k=10, m=24, method="dense")
        lfc, hfc = geometry.lowpass_split(pc, basis)
        np.testing.assert_allclose(
            np.asarray(lfc), np.asarray(lfc_full), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(hfc), np.asarray(hfc_full), atol=1e-4
        )

    def test_lobpcg_matches_dense_subspace(self):
        pc = self._cloud()
        m = 24
        evals_d, basis_d = geometry.lowpass_basis(
            pc, k=10, m=m, method="dense"
        )
        evals_l, basis_l = geometry.lowpass_basis(
            pc, k=10, m=m, method="lobpcg"
        )
        # eigenvalues agree (sorted; lobpcg returns ascending via shift)
        np.testing.assert_allclose(
            np.sort(np.asarray(evals_l), axis=-1),
            np.asarray(evals_d),
            atol=5e-3,
        )
        # the PROJECTION agrees (individual eigenvectors are only defined
        # up to sign/rotation within degenerate clusters)
        lfc_d, _ = geometry.lowpass_split(pc, basis_d)
        lfc_l, _ = geometry.lowpass_split(pc, basis_l)
        scale = np.abs(np.asarray(lfc_d)).max()
        np.testing.assert_allclose(
            np.asarray(lfc_l), np.asarray(lfc_d), atol=0.02 * scale
        )

    def test_chebyshev_matches_dense_subspace(self):
        """The MXU-native Chebyshev subspace solver (the TPU default in
        the 5m < N regime) spans the dense low-pass subspace."""
        pc = self._cloud()
        m = 24
        evals_d, basis_d = geometry.lowpass_basis(
            pc, k=10, m=m, method="dense"
        )
        evals_c, basis_c = geometry.lowpass_basis(
            pc, k=10, m=m, method="chebyshev"
        )
        np.testing.assert_allclose(
            np.asarray(evals_c), np.asarray(evals_d), atol=5e-3
        )
        lfc_d, _ = geometry.lowpass_split(pc, basis_d)
        lfc_c, _ = geometry.lowpass_split(pc, basis_c)
        scale = np.abs(np.asarray(lfc_d)).max()
        np.testing.assert_allclose(
            np.asarray(lfc_c), np.asarray(lfc_d), atol=0.02 * scale
        )

    def test_chebyshev_outside_auto_regime(self):
        """Explicit method="chebyshev" with 5m >= N (outside the auto
        dispatch window) must still produce a finite low-pass basis —
        the initial cutoff needs the same clip as the per-round
        refinement (at exactly N = 2m the unclipped cutoff divides by
        zero in the Chebyshev map)."""
        pc = self._cloud(n=64)
        m = 32  # N = 2m: the previously NaN-producing corner
        evals_c, basis_c = geometry.lowpass_basis(
            pc, k=10, m=m, method="chebyshev"
        )
        assert np.isfinite(np.asarray(basis_c)).all()
        assert np.isfinite(np.asarray(evals_c)).all()
        evals_d, basis_d = geometry.lowpass_basis(
            pc, k=10, m=m, method="dense"
        )
        lfc_d, _ = geometry.lowpass_split(pc, basis_d)
        lfc_c, _ = geometry.lowpass_split(pc, basis_c)
        scale = np.abs(np.asarray(lfc_d)).max()
        np.testing.assert_allclose(
            np.asarray(lfc_c), np.asarray(lfc_d), atol=0.05 * scale
        )

    def test_auto_dispatch(self):
        pc = self._cloud(n=64)
        # 5m >= n -> dense fallback must kick in and still work
        _, basis = geometry.lowpass_basis(pc, k=10, m=16, method="auto")
        assert basis.shape == (2, 64, 16)
        lfc, hfc = geometry.lowpass_split(pc, basis)
        np.testing.assert_allclose(
            np.asarray(lfc + hfc), np.asarray(pc), atol=1e-5
        )


class TestSymEigh3x3:
    """Closed-form 3x3 eigensolver vs jnp.linalg.eigh."""

    def test_random_covariances(self):
        rng = np.random.RandomState(7)
        x = rng.randn(2000, 8, 3).astype(np.float32) * 0.05
        xc = x - x.mean(1, keepdims=True)
        a = np.einsum("mkc,mkd->mcd", xc, xc) / 7
        evals, evecs = geometry.sym_eigh_3x3(jnp.asarray(a))
        ref_vals, ref_vecs = np.linalg.eigh(a)
        np.testing.assert_allclose(
            np.asarray(evals), ref_vals, atol=1e-7
        )
        cos = np.abs(
            np.sum(np.asarray(evecs) * ref_vecs, axis=-2)
        )  # per-column alignment
        assert cos.min() > 0.999
        g = np.einsum("mij,mik->mjk", np.asarray(evecs), np.asarray(evecs))
        assert np.abs(g - np.eye(3)).max() < 1e-5

    def test_degenerate(self):
        # isotropic and rank-1 matrices still give an orthonormal basis
        iso = np.broadcast_to(
            np.eye(3, dtype=np.float32) * 0.01, (4, 3, 3)
        ).copy()
        v = np.float32([1.0, 2.0, 3.0])
        r1 = (np.outer(v, v) * 0.01)[None].repeat(2, 0).astype(np.float32)
        for a in (iso, r1):
            evals, evecs = geometry.sym_eigh_3x3(jnp.asarray(a))
            evecs = np.asarray(evecs)
            g = np.einsum("mij,mik->mjk", evecs, evecs)
            assert np.abs(g - np.eye(3)).max() < 1e-5
            assert np.all(np.diff(np.asarray(evals), axis=-1) >= -1e-6)

    def test_normals_match_dense_eigh(self):
        """estimate_normal with the analytic solver must match the
        jnp.linalg.eigh version up to sign (same smallest eigenvector)."""
        from pointcloudattack_tpu.geometry.normals import _local_cov

        rng = np.random.RandomState(8)
        pc = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32))
        normals = np.asarray(geometry.estimate_normal(pc, k=8))
        cov, _ = _local_cov(pc, 8)
        _, ref_vecs = jnp.linalg.eigh(cov)
        ref_normal = np.asarray(ref_vecs[..., :, 0])
        cos = np.abs(np.sum(normals * ref_normal, axis=-1))
        assert np.mean(cos > 0.999) > 0.99
