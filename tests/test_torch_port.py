"""Weight-porting tests: reference-layout state dicts -> flax variables.

The reference repo ships no .pth files, so the test fabricates state
dicts with the reference's exact tensor names/shapes (random values) and
checks (a) the ported tree loads into the flax model, and (b) for
PointNet, the flax forward matches an independent numpy implementation
of the reference architecture evaluated directly on the state dict.

True numeric parity against the actual reference PyTorch modules
(all four portable models + PUNet + the CW loop end-to-end) lives in
tests/test_reference_parity.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcloudattack_tpu import models
from pointcloudattack_tpu.train import torch_port

RNG = np.random.RandomState(5)
NUM_CLASSES = 6


def t(shape):
    return RNG.randn(*shape).astype(np.float32) * 0.1


def bn_entries(sd, name, c):
    sd[f"{name}.weight"] = 1.0 + t((c,))
    sd[f"{name}.bias"] = t((c,))
    sd[f"{name}.running_mean"] = t((c,))
    sd[f"{name}.running_var"] = 1.0 + np.abs(t((c,)))


def make_pointnet_sd(k=NUM_CLASSES):
    sd = {}
    # feat.stn
    dims = [(64, 3), (128, 64), (1024, 128)]
    for i, (o, c) in enumerate(dims):
        sd[f"feat.stn.conv{i+1}.weight"] = t((o, c, 1))
        sd[f"feat.stn.conv{i+1}.bias"] = t((o,))
        bn_entries(sd, f"feat.stn.bn{i+1}", o)
    for i, (o, c) in enumerate([(512, 1024), (256, 512)]):
        sd[f"feat.stn.fc{i+1}.weight"] = t((o, c))
        sd[f"feat.stn.fc{i+1}.bias"] = t((o,))
        bn_entries(sd, f"feat.stn.bn{i+4}", o)
    sd["feat.stn.fc3.weight"] = t((9, 256))
    sd["feat.stn.fc3.bias"] = t((9,))
    # feat convs
    for i, (o, c) in enumerate([(64, 3), (128, 64), (1024, 128)]):
        sd[f"feat.conv{i+1}.weight"] = t((o, c, 1))
        sd[f"feat.conv{i+1}.bias"] = t((o,))
        bn_entries(sd, f"feat.bn{i+1}", o)
    # cls head
    sd["fc1.weight"] = t((512, 1024))
    sd["fc1.bias"] = t((512,))
    bn_entries(sd, "bn1", 512)
    sd["fc2.weight"] = t((256, 512))
    sd["fc2.bias"] = t((256,))
    bn_entries(sd, "bn2", 256)
    sd["fc3.weight"] = t((k, 256))
    sd["fc3.bias"] = t((k,))
    return sd


# ---------- independent numpy forward of the reference PointNet ----------

def np_dense(x, w, b):
    return x @ w.T + b


def np_bn(x, sd, name, eps=1e-5):
    return (x - sd[f"{name}.running_mean"]) / np.sqrt(
        sd[f"{name}.running_var"] + eps
    ) * sd[f"{name}.weight"] + sd[f"{name}.bias"]


def np_conv(x, sd, name):
    # per-point 1x1 conv on channels-last [B, N, C]
    w = sd[f"{name}.weight"][:, :, 0]
    return x @ w.T + sd[f"{name}.bias"]


def np_stn(x, sd, prefix):
    h = x
    for i in range(3):
        h = np.maximum(np_bn(np_conv(h, sd, f"{prefix}.conv{i+1}"),
                             sd, f"{prefix}.bn{i+1}"), 0)
    h = h.max(axis=1)  # [B, 1024]
    for i in range(2):
        h = np.maximum(np_bn(np_dense(h, sd[f"{prefix}.fc{i+1}.weight"],
                                      sd[f"{prefix}.fc{i+1}.bias"]),
                             sd, f"{prefix}.bn{i+4}"), 0)
    mat = np_dense(h, sd["feat.stn.fc3.weight"], sd["feat.stn.fc3.bias"])
    return mat.reshape(-1, 3, 3) + np.eye(3)


def np_pointnet_forward(x, sd):
    trans = np_stn(x, sd, "feat.stn")
    h = np.einsum("bnc,bck->bnk", x, trans)
    h = np.maximum(np_bn(np_conv(h, sd, "feat.conv1"), sd, "feat.bn1"), 0)
    h = np.maximum(np_bn(np_conv(h, sd, "feat.conv2"), sd, "feat.bn2"), 0)
    h = np_bn(np_conv(h, sd, "feat.conv3"), sd, "feat.bn3")
    feat = h.max(axis=1)
    h = np.maximum(np_bn(np_dense(feat, sd["fc1.weight"], sd["fc1.bias"]),
                         sd, "bn1"), 0)
    h = np.maximum(np_bn(np_dense(h, sd["fc2.weight"], sd["fc2.bias"]),
                         sd, "bn2"), 0)
    logits = np_dense(h, sd["fc3.weight"], sd["fc3.bias"])
    return logits - np.log(
        np.exp(logits).sum(axis=-1, keepdims=True)
    )  # log_softmax


class TestPointNetPort:
    def test_forward_parity(self):
        sd = make_pointnet_sd()
        variables = torch_port.port_pointnet(sd)
        model = models.make_model("PointNet", NUM_CLASSES)
        x = RNG.randn(2, 128, 3).astype(np.float32)

        out, _ = model.apply(variables, jnp.asarray(x), train=False)
        expect = np_pointnet_forward(x, sd)
        np.testing.assert_allclose(np.asarray(out), expect, atol=2e-4)

    def test_tree_structure_matches_init(self):
        sd = make_pointnet_sd()
        ported = torch_port.port_pointnet(sd)
        model = models.make_model("PointNet", NUM_CLASSES)
        init = models.init_model(model, jax.random.PRNGKey(0), 64, 1)

        def leaf_shapes(tree):
            flat = jax.tree_util.tree_flatten_with_path(tree)[0]
            return {
                jax.tree_util.keystr(p): tuple(np.shape(v)) for p, v in flat
            }

        a, b = leaf_shapes(init), leaf_shapes(ported)
        assert set(a) == set(b)
        for k in a:
            assert a[k] == b[k], f"{k}: {a[k]} vs {b[k]}"


def make_dgcnn_sd(k=NUM_CLASSES, emb=64):
    sd = {}
    chans = [(64, 6), (64, 128), (128, 128), (256, 256)]
    for i, (o, c) in enumerate(chans):
        sd[f"conv{i+1}.0.weight"] = t((o, c, 1, 1))
        bn_entries(sd, f"bn{i+1}", o)
    sd["conv5.0.weight"] = t((emb, 512, 1))
    bn_entries(sd, "bn5", emb)
    sd["linear1.weight"] = t((512, emb * 2))
    bn_entries(sd, "bn6", 512)
    sd["linear2.weight"] = t((256, 512))
    sd["linear2.bias"] = t((256,))
    bn_entries(sd, "bn7", 256)
    sd["linear3.weight"] = t((k, 256))
    sd["linear3.bias"] = t((k,))
    return sd


class TestDGCNNPort:
    def test_structure(self):
        sd = make_dgcnn_sd()
        ported = torch_port.port_dgcnn(sd)
        model = models.make_model("DGCNN", NUM_CLASSES, emb_dims=64)
        init = models.init_model(model, jax.random.PRNGKey(0), 64, 1)

        def leaf_shapes(tree):
            flat = jax.tree_util.tree_flatten_with_path(tree)[0]
            return {
                jax.tree_util.keystr(p): tuple(np.shape(v)) for p, v in flat
            }

        a, b = leaf_shapes(init), leaf_shapes(ported)
        assert set(a) == set(b)
        for key in a:
            assert a[key] == b[key]
        out, _ = model.apply(
            ported, jnp.asarray(RNG.randn(1, 64, 3).astype(np.float32)),
            train=False,
        )
        assert np.all(np.isfinite(np.asarray(out)))


class TestCurveNetPort:
    def test_export_port_roundtrip_covers_init_tree(self):
        """export_curvenet -> port_curvenet is lossless and the spec
        covers exactly the flax init tree (so no tensor is silently
        dropped in either direction)."""
        model = models.make_model("CurveNet", NUM_CLASSES, k=4)
        init = models.init_model(model, jax.random.PRNGKey(0), 128, 1)
        init = {
            "params": init["params"],
            "batch_stats": init["batch_stats"],
        }

        sd = torch_port.export_curvenet(init)
        back = torch_port.port_curvenet(sd)

        def leaves(tree):
            flat = jax.tree_util.tree_flatten_with_path(tree)[0]
            return {jax.tree_util.keystr(p): np.asarray(v)
                    for p, v in flat}

        a, b = leaves(init), leaves(back)
        assert set(a) == set(b)
        for key in a:
            np.testing.assert_array_equal(a[key], b[key], err_msg=key)

        # exported names follow the reference nn.Sequential layout
        assert "cic21.curvegrouping.walk.momentum_mlp.0.weight" in sd
        assert "cic31.shortcut.0.weight" in sd
        assert "conv0.0.weight" in sd
