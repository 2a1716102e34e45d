"""In-kernel gather fusion (ops/pallas/gather_chain_kernel.py).

Contract: with the gather fused into the grouped chain kernel, the
FORWARD is bit-exact vs gather-then-mlp_chain_groupmax (the 3-limb
gather reconstructs diffed columns exactly; the 1-limb pass gather
applies exactly the bf16 truncation the chain's first matmul would),
and input gradients agree to f32 accumulation order (the cotangent
scatter runs as 3-limb one-hot transpose matmuls — exact values,
matmul reduction order).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloudattack_tpu.ops.gather import index_points
from pointcloudattack_tpu.ops.pallas.dense_max_kernel import (
    mlp_chain_groupmax,
)
from pointcloudattack_tpu.ops.pallas.gather_chain_kernel import (
    build_gather_matrix,
    gather_chain_groupmax,
)


def _mk_layers(rng, dims):
    layers = []
    for cin, cout in zip(dims[:-1], dims[1:]):
        layers.append((
            jnp.asarray(rng.randn(cin, cout).astype(np.float32)) * 0.2,
            jnp.asarray(rng.randn(cout).astype(np.float32)) * 0.1,
            jnp.asarray(rng.randn(cout).astype(np.float32)) * 0.1,
            jnp.asarray(1.0 + 0.1 * rng.randn(cout).astype(np.float32)),
            jnp.asarray(rng.randn(cout).astype(np.float32)) * 0.1,
        ))
    return tuple(layers)


def _sa_case(seed=0, b=2, n=128, g=32, k=16, cp=32):
    rng = np.random.RandomState(seed)
    src = jnp.asarray(rng.randn(b, n, 3 + cp).astype(np.float32))
    centers = jnp.asarray(rng.randn(b, g, 3).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, n, (b, g, k)).astype(np.int32))
    layout = (("diff", 0, 3, 0), ("pass", 3, 3 + cp))
    layers = _mk_layers(rng, (3 + cp, 64, 64))

    def grouped(s, c):
        nbr = index_points(s, idx)
        return jnp.concatenate(
            [nbr[..., :3] - c[:, :, None, :], nbr[..., 3:]], axis=-1
        )

    return src, centers, idx, layout, layers, grouped


def _edge_case(seed=1, b=2, n=128, k=20, c=64):
    rng = np.random.RandomState(seed)
    src = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, n, (b, n, k)).astype(np.int32))
    layout = (("diff", 0, c, 0), ("center", 0, c))
    layers = _mk_layers(rng, (2 * c, 128))

    def grouped(s):
        nbr = index_points(s, idx)
        ctr = jnp.broadcast_to(s[:, :, None, :], nbr.shape)
        return jnp.concatenate([nbr - ctr, ctr], axis=-1)

    return src, idx, layout, layers, grouped


def test_sa_layout_forward_bitexact_and_grads():
    src, centers, idx, layout, layers, grouped = _sa_case()
    y = gather_chain_groupmax(
        src, centers, idx, layers, layout, interpret=True
    )
    y_ref = mlp_chain_groupmax(grouped(src, centers), layers, interpret=True)
    assert bool(jnp.all(y == y_ref))

    def lf(s, c):
        return jnp.sum(jnp.sin(gather_chain_groupmax(
            s, c, idx, layers, layout, interpret=True
        )))

    def lr(s, c):
        return jnp.sum(jnp.sin(mlp_chain_groupmax(
            grouped(s, c), layers, interpret=True
        )))

    (gs, gc) = jax.grad(lf, (0, 1))(src, centers)
    (gsr, gcr) = jax.grad(lr, (0, 1))(src, centers)
    np.testing.assert_allclose(gs, gsr, atol=2e-6)
    # center grads reduce inside one tile — exactly the same sums
    np.testing.assert_array_equal(gc, gcr)


def test_edgeconv_layout_forward_bitexact_and_grads():
    src, idx, layout, layers, grouped = _edge_case()
    y = gather_chain_groupmax(
        src, src, idx, layers, layout, interpret=True, slope=0.2
    )
    y_ref = mlp_chain_groupmax(
        grouped(src), layers, interpret=True, slope=0.2
    )
    assert bool(jnp.all(y == y_ref))

    gf = jax.grad(lambda s: jnp.sum(jnp.sin(gather_chain_groupmax(
        s, s, idx, layers, layout, interpret=True, slope=0.2
    ))))(src)
    gu = jax.grad(lambda s: jnp.sum(jnp.sin(mlp_chain_groupmax(
        grouped(s), layers, interpret=True, slope=0.2
    ))))(src)
    np.testing.assert_allclose(gf, gu, atol=1e-5)


def test_duplicate_indices_scatter_like_xla():
    """Ball-query pads short neighbourhoods by repeating the first hit;
    duplicate indices must max-pool and scatter-add identically."""
    src, centers, idx, layout, layers, grouped = _sa_case(seed=3, g=16)
    idx = idx.at[:, :, 1:5].set(idx[:, :, :1])  # heavy duplication
    y = gather_chain_groupmax(
        src, centers, idx, layers, layout, interpret=True
    )
    nbr = index_points(src, idx)
    g_ref = jnp.concatenate(
        [nbr[..., :3] - centers[:, :, None, :], nbr[..., 3:]], axis=-1
    )
    y_ref = mlp_chain_groupmax(g_ref, layers, interpret=True)
    assert bool(jnp.all(y == y_ref))

    def lf(s):
        return jnp.sum(gather_chain_groupmax(
            s, centers, idx, layers, layout, interpret=True
        ) ** 2)

    def lr(s):
        nb = index_points(s, idx)
        gg = jnp.concatenate(
            [nb[..., :3] - centers[:, :, None, :], nb[..., 3:]], axis=-1
        )
        return jnp.sum(mlp_chain_groupmax(gg, layers, interpret=True) ** 2)

    np.testing.assert_allclose(
        jax.grad(lf)(src), jax.grad(lr)(src), atol=2e-5
    )


def test_gather_matrix_limbs_reconstruct_exactly():
    rng = np.random.RandomState(7)
    src = jnp.asarray(rng.randn(2, 64, 8).astype(np.float32))
    layout = (("diff", 0, 5, 0), ("pass", 5, 8))
    gm = build_gather_matrix(src, layout)
    assert gm.dtype == jnp.bfloat16
    assert gm.shape == (2, 64, 3 * 5 + 3)
    rec = (
        gm[..., :5].astype(jnp.float32)
        + gm[..., 5:10].astype(jnp.float32)
        + gm[..., 10:15].astype(jnp.float32)
    )
    np.testing.assert_array_equal(rec, src[..., :5])
    # pass limb = round-to-nearest bf16, the chain's own truncation
    np.testing.assert_array_equal(
        gm[..., 15:], src[..., 5:].astype(jnp.bfloat16)
    )


@pytest.mark.parametrize(
    "model_key", ["DGCNN", "PointNet++Ssg", "PointNet++Msg", "CurveNet"]
)
def test_model_forward_bitexact_with_gather_fusion(model_key):
    from pointcloudattack_tpu import models
    from pointcloudattack_tpu.models.common import FUSED_MAXPOOL
    from pointcloudattack_tpu.utils.apply import make_model_fn

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 256, 3).astype(np.float32) * 0.5)
    model = models.make_model(model_key, 10)
    variables = models.init_model(
        model, jax.random.PRNGKey(0), num_points=256, batch=2
    )
    fn = make_model_fn(model, variables, jit=False)

    def loss(a):
        return jnp.sum(fn(a) * jnp.cos(jnp.arange(10.0)))

    prior = dict(FUSED_MAXPOOL)
    try:
        FUSED_MAXPOOL["interpret"] = True
        # pin the chain tier ON in both arms (bit-exactness is a
        # gather-vs-chain contract; the shipped FUSED_POLICY turns the
        # chain off for dgcnn) and the ballq tier OFF (it has its own
        # test below — here the gather tier itself is under test)
        FUSED_MAXPOOL["enabled"] = True
        FUSED_MAXPOOL["gather"] = False
        FUSED_MAXPOOL["ballq"] = False
        y0, g0 = fn(x), jax.grad(loss)(x)
        FUSED_MAXPOOL["gather"] = True
        y1, g1 = fn(x), jax.grad(loss)(x)
    finally:
        FUSED_MAXPOOL.update(prior)
    if model_key == "CurveNet":
        # CurveNet's residual-LPFA gather fusion folds xyz2feature+BN
        # into the gather sources, splitting the reference's one 9-wide
        # matmul into two 3-wide ones (models/curvenet.py) — an f32
        # sum-order deviation, NOT a truncation: forward stays within
        # ~1e-4 relative here in interpret mode.  On v5e hardware the
        # deviation compounds across the 9 fused blocks (grad_cos 0.941
        # measured) — the path ships policy-OFF and its hardware screen
        # row (scripts/tpu_parity_fused.py CurveNet+gather) is advisory.
        np.testing.assert_allclose(y1, y0, rtol=0, atol=5e-4)
    else:
        np.testing.assert_array_equal(y0, y1)
    scale = float(jnp.max(jnp.abs(g0)))
    np.testing.assert_allclose(g1, g0, atol=2e-3 * scale)


def test_punet_forward_bitexact_with_gather_fusion():
    from pointcloudattack_tpu.models.common import FUSED_MAXPOOL
    from pointcloudattack_tpu.models.punet import PUNet

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32) * 0.5)
    model = PUNet(npoint=128, up_ratio=2)
    variables = model.init(jax.random.PRNGKey(0), x)

    prior = dict(FUSED_MAXPOOL)
    try:
        FUSED_MAXPOOL["interpret"] = True
        FUSED_MAXPOOL["gather"] = False
        y0 = model.apply(variables, x)
        FUSED_MAXPOOL["gather"] = True
        y1 = model.apply(variables, x)
    finally:
        FUSED_MAXPOOL.update(prior)
    np.testing.assert_array_equal(y0, y1)


@pytest.mark.parametrize("case", range(4))
def test_fuzz_random_layouts(case):
    """Random layout/shape/slope cases: forward stays bit-exact vs the
    fused grouped kernel on an XLA-built grouped tensor."""
    rng = np.random.RandomState(100 + case)
    n = int(rng.choice([96, 160, 256]))
    g = int(rng.choice([16, 24, 48]))
    k = int(rng.choice([8, 12, 20, 33]))
    cs = int(rng.choice([6, 19, 40]))
    slope = float(rng.choice([0.0, 0.2]))
    nd = int(rng.randint(1, min(cs, 8)))  # diff width
    layout = [("diff", 0, nd, 0)]
    if cs > nd:
        layout.append(("pass", nd, cs))
    if rng.rand() < 0.5:
        layout.append(("center", 0, nd))
    layout = tuple(layout)
    cc = nd  # centers carry the diff columns
    c0 = sum(s[2] - s[1] for s in layout)
    src = jnp.asarray(rng.randn(2, n, cs).astype(np.float32))
    centers = jnp.asarray(rng.randn(2, g, cc).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, n, (2, g, k)).astype(np.int32))
    layers = _mk_layers(rng, (c0, 64))

    def grouped(s, c):
        nbr = index_points(s, idx)
        segs = []
        for sg in layout:
            if sg[0] == "diff":
                segs.append(
                    nbr[..., sg[1] : sg[2]]
                    - c[:, :, None, sg[3] : sg[3] + sg[2] - sg[1]]
                )
            elif sg[0] == "pass":
                segs.append(nbr[..., sg[1] : sg[2]])
            else:
                segs.append(
                    jnp.broadcast_to(
                        c[:, :, None, sg[1] : sg[2]],
                        (2, g, k, sg[2] - sg[1]),
                    )
                )
        return jnp.concatenate(segs, axis=-1)

    y = gather_chain_groupmax(
        src, centers, idx, layers, layout, interpret=True, slope=slope
    )
    y_ref = mlp_chain_groupmax(
        grouped(src, centers), layers, interpret=True, slope=slope
    )
    assert bool(jnp.all(y == y_ref)), (n, g, k, cs, layout, slope)

    gf = jax.grad(lambda s: jnp.sum(jnp.sin(gather_chain_groupmax(
        s, centers, idx, layers, layout, interpret=True, slope=slope
    ))))(src)
    gu = jax.grad(lambda s: jnp.sum(jnp.sin(mlp_chain_groupmax(
        grouped(s, centers), layers, interpret=True, slope=slope
    ))))(src)
    np.testing.assert_allclose(gf, gu, atol=2e-5)


def test_model_bf16_gather_path():
    """compute_dtype=bf16 victim through the gather-fused SA wiring:
    single-limb gather matrix, outputs finite and close to the
    unfused bf16 path."""
    from pointcloudattack_tpu import models
    from pointcloudattack_tpu.models.common import FUSED_MAXPOOL
    from pointcloudattack_tpu.utils.apply import make_model_fn

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 256, 3).astype(np.float32) * 0.5)
    model = models.make_model("PointNet++Ssg", 10)
    variables = models.init_model(
        model, jax.random.PRNGKey(0), num_points=256, batch=2
    )
    fn = make_model_fn(
        model, variables, compute_dtype=jnp.bfloat16, jit=False
    )
    prior = dict(FUSED_MAXPOOL)
    try:
        FUSED_MAXPOOL["interpret"] = True
        FUSED_MAXPOOL["gather"] = False
        y0 = fn(x)
        FUSED_MAXPOOL["gather"] = True
        y1 = fn(x)
    finally:
        FUSED_MAXPOOL.update(prior)
    assert bool(jnp.all(jnp.isfinite(y1)))
    np.testing.assert_allclose(
        np.asarray(y1, np.float32), np.asarray(y0, np.float32), atol=0.1
    )


def test_bf16_src_smoke():
    """compute_dtype=bf16 attack path: bf16 sources are a single exact
    limb; values stay finite and close to the unfused bf16 path."""
    src, centers, idx, layout, layers, grouped = _sa_case(seed=5)
    src16, ctr16 = src.astype(jnp.bfloat16), centers.astype(jnp.bfloat16)
    y = gather_chain_groupmax(
        src16, ctr16, idx, layers, layout, interpret=True
    )
    y_ref = mlp_chain_groupmax(
        grouped(src16.astype(jnp.float32), ctr16.astype(jnp.float32)),
        layers, interpret=True,
    )
    assert bool(jnp.all(jnp.isfinite(y)))
    np.testing.assert_allclose(y, y_ref, atol=3e-2)


# ---------------------------------------------------------------------
# In-kernel BALL QUERY variant (round-5 verdict task 3):
# ball_gather_chain_groupmax must match query_ball_point followed by
# gather_chain_groupmax — forward bitwise, dsrc/dctr bitwise (the SAME
# kernels run, only the selection one-hot's construction differs), and
# a ZERO xyz cotangent (ball membership is non-differentiable, like
# query_ball_point's integer output).  Geometry is chosen away from the
# r² ulp boundary (see _ball_slots docstring: XLA's fusion choices
# already flip the expansion's last bit BETWEEN programs, so exact-
# boundary points are unstable even unfused-vs-unfused).
# ---------------------------------------------------------------------


def _ball_case(seed=0, b=2, n=128, s=24, k=16, cp=8, layout_kind="ssg"):
    rng = np.random.RandomState(seed)
    xyz = jnp.asarray(rng.rand(b, n, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(b, n, cp).astype(np.float32))
    src = jnp.concatenate([xyz, feats], axis=-1)
    centers = xyz[:, :s, :]
    if layout_kind == "ssg":
        layout = (("diff", 0, 3, 0), ("pass", 3, 3 + cp))
    else:  # MSG order: features first, xyz-diff last
        layout = (("pass", 3, 3 + cp), ("diff", 0, 3, 0))
    layers = _mk_layers(rng, (3 + cp, 32, 64))
    return src, centers, xyz, layout, layers


@pytest.mark.parametrize("layout_kind", ["ssg", "msg"])
def test_ball_fused_bitexact_and_grads(layout_kind):
    from pointcloudattack_tpu.ops.ball_query import query_ball_point
    from pointcloudattack_tpu.ops.pallas.gather_chain_kernel import (
        ball_gather_chain_groupmax,
    )

    src, centers, xyz, layout, layers = _ball_case(
        layout_kind=layout_kind
    )
    radius, k = 0.25, 16
    idx = query_ball_point(radius, k, xyz, centers)
    y_ref = gather_chain_groupmax(
        src, centers, idx, layers, layout, interpret=True
    )
    y = ball_gather_chain_groupmax(
        src, centers, xyz, layers, layout, radius, k, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y))

    gr = jax.grad(
        lambda s_, c_: jnp.sum(jnp.sin(gather_chain_groupmax(
            s_, c_, idx, layers, layout, interpret=True
        ))),
        (0, 1),
    )(src, centers)
    gb = jax.grad(
        lambda s_, c_, x_: jnp.sum(jnp.sin(ball_gather_chain_groupmax(
            s_, c_, x_, layers, layout, radius, k, interpret=True
        ))),
        (0, 1, 2),
    )(src, centers, xyz)
    np.testing.assert_array_equal(np.asarray(gr[0]), np.asarray(gb[0]))
    np.testing.assert_array_equal(np.asarray(gr[1]), np.asarray(gb[1]))
    assert not np.any(np.asarray(gb[2]))  # membership carries no grad


def test_ball_fused_empty_and_overfull():
    """Guaranteed-empty balls (centers 5 units away from every point —
    the reference's degenerate fill gathers point 0) and overfull balls
    (radius spanning the whole cloud: first-K-in-index-order pick)."""
    from pointcloudattack_tpu.ops.ball_query import query_ball_point
    from pointcloudattack_tpu.ops.pallas.gather_chain_kernel import (
        ball_gather_chain_groupmax,
    )

    src, centers, xyz, layout, layers = _ball_case(seed=7)
    k = 16
    for radius, ctr in ((0.1, centers + 5.0), (2.0, centers)):
        idx = query_ball_point(radius, k, xyz, ctr)
        y_ref = gather_chain_groupmax(
            src, ctr, idx, layers, layout, interpret=True
        )
        y = ball_gather_chain_groupmax(
            src, ctr, xyz, layers, layout, radius, k, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y))
        gr = jax.grad(lambda s_: jnp.sum(gather_chain_groupmax(
            s_, ctr, idx, layers, layout, interpret=True
        ) ** 2))(src)
        gb = jax.grad(lambda s_: jnp.sum(ball_gather_chain_groupmax(
            s_, ctr, xyz, layers, layout, radius, k, interpret=True
        ) ** 2))(src)
        np.testing.assert_array_equal(np.asarray(gr), np.asarray(gb))


@pytest.mark.parametrize("model_key", ["PointNet++Ssg", "PointNet++Msg"])
def test_model_forward_bitexact_with_ballq_fusion(model_key):
    """SSG/MSG end-to-end: gather tier vs gather+ballq tier — the SA
    outputs must agree bitwise (same kernels; selection recomputed
    in-VMEM), and the ballq dispatch counter must prove engagement."""
    from pointcloudattack_tpu import models
    from pointcloudattack_tpu.models.common import FUSED_MAXPOOL
    from pointcloudattack_tpu.ops.pallas.dense_max_kernel import (
        DISPATCH_COUNT,
    )
    from pointcloudattack_tpu.utils.apply import make_model_fn

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 256, 3).astype(np.float32) * 0.5)
    model = models.make_model(model_key, 10)
    variables = models.init_model(
        model, jax.random.PRNGKey(0), num_points=256, batch=2
    )
    fn = make_model_fn(model, variables, jit=False)

    def loss(a):
        return jnp.sum(fn(a) * jnp.cos(jnp.arange(10.0)))

    prior = dict(FUSED_MAXPOOL)
    try:
        FUSED_MAXPOOL["interpret"] = True
        FUSED_MAXPOOL["enabled"] = True
        FUSED_MAXPOOL["gather"] = True
        FUSED_MAXPOOL["ballq"] = False
        y0, g0 = fn(x), jax.grad(loss)(x)
        FUSED_MAXPOOL["ballq"] = True
        before = DISPATCH_COUNT["ballq"]
        y1, g1 = fn(x), jax.grad(loss)(x)
        assert DISPATCH_COUNT["ballq"] > before
    finally:
        FUSED_MAXPOOL.update(prior)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))
