"""Data pipeline tests: parsers (round-trip vs synthetic files),
datasets, CSV splits."""

import os
import struct

import numpy as np
import pytest

from pointcloudattack_tpu import data

RNG = np.random.RandomState(33)


def write_fake_bnt(path, points5, zmin=-1e9):
    """Write a .bnt in the Bosphorus binary layout (readbnt.py:29-62)."""
    n = len(points5)
    stem = os.path.splitext(os.path.basename(path))[0]
    name = (stem + ".png").encode()
    with open(path, "wb") as f:
        f.write(struct.pack("<H", 4))  # nrows
        f.write(struct.pack("<H", n // 4))  # ncols
        f.write(struct.pack("<d", zmin))
        f.write(struct.pack("<H", len(name)))
        f.write(name)
        f.write(struct.pack("<I", n * 5))
        f.write(np.asarray(points5, dtype="<f8").flatten(order="F").tobytes())


class TestBnt:
    def test_roundtrip(self, tmp_path):
        pts = RNG.randn(40, 5)
        path = str(tmp_path / "face.bnt")
        write_fake_bnt(path, pts)
        nrows, ncols, out = data.read_bnt(path, sample_to=None)
        assert nrows == 4
        np.testing.assert_allclose(
            np.sort(out, axis=0), np.sort(pts[:, :3], axis=0), atol=1e-12
        )

    def test_background_removed(self, tmp_path):
        zmin = -1e9
        pts = RNG.randn(40, 5)
        pts[5] = zmin  # full background row
        path = str(tmp_path / "bg.bnt")
        write_fake_bnt(path, pts, zmin=zmin)
        _, _, out = data.read_bnt(path, sample_to=None)
        assert len(out) == 39


class TestObjOff:
    def test_obj_roundtrip(self, tmp_path):
        verts = RNG.randn(20, 3)
        faces = np.array([[0, 1, 2], [3, 4, 5]])
        path = str(tmp_path / "mesh.obj")
        data.write_obj(path, verts, faces)
        v, f, _ = data.read_obj(path)
        np.testing.assert_allclose(v, verts, atol=1e-6)
        np.testing.assert_array_equal(f, faces)

    def test_off_roundtrip(self, tmp_path):
        verts = RNG.randn(15, 3)
        faces = np.array([[0, 1, 2]])
        path = str(tmp_path / "mesh.off")
        data.write_off(path, verts, faces)
        v, f = data.read_off(path)
        np.testing.assert_allclose(v, verts, atol=1e-6)
        np.testing.assert_array_equal(f, faces)

    def test_glued_off_header(self, tmp_path):
        path = str(tmp_path / "glued.off")
        with open(path, "w") as f:
            f.write("OFF3 1 0\n")
            f.write("0 0 0\n1 0 0\n0 1 0\n")
            f.write("3 0 1 2\n")
        v, faces = data.read_off(path)
        assert v.shape == (3, 3)

    def test_kinect_obj(self, tmp_path):
        path = str(tmp_path / "face.obj")
        with open(path, "w") as f:
            f.write("v 1.0 2.0 500\n")  # kept
            f.write("v 3.0 4.0 0\n")  # dropped (z == 0)
            f.write("v 5.0 6.0 2000\n")  # dropped (|z| >= 1000)
            f.write("f 1 2 3\n")
        pts = data.read_kinect_obj(path)
        np.testing.assert_allclose(pts, [[1.0, 2.0, 500.0]])
        # defect-compatible mode replicates x three times
        pts = data.read_kinect_obj(path, replicate_x=True)
        np.testing.assert_allclose(pts, [[1.0, 1.0, 1.0]])


class TestPly:
    def test_ascii(self, tmp_path):
        path = str(tmp_path / "c.ply")
        with open(path, "w") as f:
            f.write(
                "ply\nformat ascii 1.0\nelement vertex 2\n"
                "property float x\nproperty float y\nproperty float z\n"
                "end_header\n0 1 2\n3 4 5\n"
            )
        v = data.read_ply_vertices(path)
        np.testing.assert_allclose(v, [[0, 1, 2], [3, 4, 5]])

    def test_binary(self, tmp_path):
        path = str(tmp_path / "b.ply")
        verts = RNG.randn(5, 3).astype("<f4")
        with open(path, "wb") as f:
            f.write(
                b"ply\nformat binary_little_endian 1.0\n"
                b"element vertex 5\n"
                b"property float x\nproperty float y\nproperty float z\n"
                b"end_header\n"
            )
            f.write(verts.tobytes())
        v = data.read_ply_vertices(path)
        np.testing.assert_allclose(v, verts, atol=1e-6)


class TestCsvSplit:
    def test_split_and_dataset(self, tmp_path):
        # build a fake Bosphorus tree: 3 classes x 12 scans
        root = tmp_path / "BosphorusDB"
        for c in range(3):
            d = root / f"bs{c:03d}"
            d.mkdir(parents=True)
            for s in range(12):
                write_fake_bnt(
                    str(d / f"bs{c:03d}_N_N_{s}.bnt"), RNG.randn(30, 5)
                )
        train, ev, test, dirty = data.generate_split_csvs(
            str(root), ext=".bnt"
        )
        assert len(train) + len(ev) + len(test) == 36
        assert os.path.exists(root / "train.csv")

        ds = data.BosphorusDataset(str(root / "train.csv"), num_points=20)
        assert ds.num_classes == 3
        cloud, label = ds[0]
        assert cloud.shape == (20, 3)
        assert 0 <= label < 3
        # normalized to unit sphere
        assert np.abs(np.linalg.norm(cloud, axis=1)).max() <= 1.0 + 1e-5

    def test_inject_adversarial(self, tmp_path):
        csv_path = str(tmp_path / "train.csv")
        with open(csv_path, "w") as f:
            f.write("cloud_point_path,cls_name\n/a/b.bnt,001\n")
        data.inject_adversarial_rows(csv_path, ["/adv/x.txt"], "105")
        with open(csv_path) as f:
            lines = f.read().strip().splitlines()
        assert lines[-1] == "/adv/x.txt,105"


class TestBatcher:
    def test_iterate(self):
        clouds, labels = data.make_synthetic_clouds(2, 5, 16)

        class ListDS:
            def __len__(self):
                return len(labels)

            def __getitem__(self, i):
                return clouds[i], labels[i]

        batches = list(data.iterate_dataset(ListDS(), 4, shuffle=False))
        assert batches[0][0].shape == (4, 16, 3)
        total = sum(len(b[1]) for b in batches)
        assert total == 10


class TestLoader:
    def test_prefetch_loader(self):
        from pointcloudattack_tpu.data.loader import data_loader
        from pointcloudattack_tpu import data as D

        clouds, labels = D.make_synthetic_clouds(2, 6, 16)

        class ListDS:
            def __len__(self):
                return len(labels)

            def __getitem__(self, i):
                return clouds[i], labels[i]

        batches = list(
            data_loader(ListDS(), 4, shuffle=True, prefetch=2)
        )
        total = sum(int(b[1].shape[0]) for b in batches)
        assert total == 12
        # device arrays, correct shapes
        assert batches[0][0].shape == (4, 16, 3)
