"""Point-cloud file parsers: .bnt, .obj, .off, .ply, .xyz/.txt.

Clean numpy rewrites of the reference's readers:
  * read_bnt        -> reference readbnt.py:29-62 (Bosphorus range scans)
  * read_kinect_obj -> reference dataset/eurecom_dataset.py:44-57
    (NOTE: the reference appends ``(v1, v1, v1)`` — the x coordinate three
    times, eurecom_dataset.py:52, a latent defect.  We read real (x,y,z)
    by default; ``replicate_x=True`` reproduces the defect bit-for-bit.)
  * read_obj/write_obj, read_off/write_off, read_xyz/write_xyz
    -> reference attack/GeoA3/utility.py:232-451
  * read_ply        -> minimal vertex reader for ModelNet40's PLY meshes
    (reference pointnet/dataset.py:169-173 uses the plyfile package)
"""

from __future__ import annotations

import io as _io
import os

import numpy as np


def read_bnt(filepath: str, sample_to: int | None = 4000, rng=None):
    """Parse a Bosphorus .bnt range scan.

    Returns (nrows, ncols, points [M, 3]) with background removed and an
    optional random subsample to ``sample_to`` rows.
    """
    with open(filepath, "rb") as fid:
        nrows = np.fromfile(fid, dtype="<u2", count=1)[0]
        ncols = np.fromfile(fid, dtype="<u2", count=1)[0]
        zmin = np.fromfile(fid, dtype="<f8", count=1)[0]
        name_len = np.fromfile(fid, dtype="<u2", count=1)[0]
        imfile = bytes(np.fromfile(fid, dtype="u1", count=name_len)).decode(
            "latin-1"
        )
        n_values = np.fromfile(fid, dtype="<u4", count=1)[0]
        data = np.fromfile(fid, dtype="<f8", count=n_values)
        # Nx5 stored column-major (matlab heritage, readbnt.py:18)
        data = data.reshape((n_values // 5, 5), order="F")
    data = data.copy()
    data[data == zmin] = np.nan
    xyz = data[:, :3]
    keep = ~np.all(np.isnan(xyz), axis=1)
    xyz = xyz[keep]
    if sample_to is not None:
        rng = rng or np.random
        order = rng.permutation(len(xyz))[:sample_to]
        xyz = xyz[order]
    return int(nrows), int(ncols), xyz.astype(np.float64)


def read_kinect_obj(
    path: str,
    depth_limit: float = 1000.0,
    replicate_x: bool = False,
) -> np.ndarray:
    """Vertices of a EURECOM Kinect .obj with the reference depth filter.

    Keeps vertices with ``abs(int(z)) < depth_limit and int(z) != 0``.
    """
    pts = []
    with open(path) as f:
        for line in f:
            parts = line.split(" ")
            if len(parts) >= 4 and parts[0] == "v":
                try:
                    z = int(parts[3])
                except ValueError:
                    z = int(float(parts[3]))
                if abs(z) < depth_limit and z != 0:
                    if replicate_x:
                        v1 = float(parts[1])
                        pts.append((v1, v1, v1))
                    else:
                        pts.append(
                            (
                                float(parts[1]),
                                float(parts[2]),
                                float(parts[3]),
                            )
                        )
    return np.asarray(pts, dtype=np.float64)


def read_obj(path: str):
    """Vertices (+faces, +normals if present) of a wavefront OBJ."""
    verts, faces, normals = [], [], []
    with open(path) as f:
        for line in f:
            parts = line.strip().split()
            if not parts:
                continue
            if parts[0] == "v":
                verts.append([float(x) for x in parts[1:4]])
            elif parts[0] == "vn":
                normals.append([float(x) for x in parts[1:4]])
            elif parts[0] == "f":
                faces.append(
                    [int(p.split("/")[0]) - 1 for p in parts[1:4]]
                )
    return (
        np.asarray(verts, dtype=np.float64),
        np.asarray(faces, dtype=np.int64) if faces else None,
        np.asarray(normals, dtype=np.float64) if normals else None,
    )


def write_obj(path: str, verts: np.ndarray, faces: np.ndarray | None = None):
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:f} {v[1]:f} {v[2]:f}\n")
        if faces is not None:
            for face in faces:
                f.write(f"f {face[0]+1} {face[1]+1} {face[2]+1}\n")


def read_off(path: str):
    """Vertices and faces of an OFF mesh (handles the glued 'OFF123' header
    variant common in ModelNet40)."""
    with open(path) as f:
        header = f.readline().strip()
        if header.startswith("OFF") and len(header) > 3:
            counts = header[3:].split()
        else:
            counts = f.readline().strip().split()
        nv, nf = int(counts[0]), int(counts[1])
        verts = np.array(
            [[float(x) for x in f.readline().split()[:3]] for _ in range(nv)]
        )
        faces = []
        for _ in range(nf):
            parts = f.readline().split()
            faces.append([int(x) for x in parts[1 : 1 + int(parts[0])]])
    return verts, np.asarray(faces, dtype=np.int64)


def write_off(path: str, verts: np.ndarray, faces: np.ndarray | None = None):
    with open(path, "w") as f:
        f.write("OFF\n")
        f.write(f"{len(verts)} {0 if faces is None else len(faces)} 0\n")
        for v in verts:
            f.write(f"{v[0]:f} {v[1]:f} {v[2]:f}\n")
        if faces is not None:
            for face in faces:
                f.write(f"3 {face[0]} {face[1]} {face[2]}\n")


def read_ply_vertices(path: str) -> np.ndarray:
    """x,y,z vertices of an ascii or binary_little_endian PLY file."""
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"{path} is not a PLY file")
        fmt = None
        n_verts = 0
        props = []
        in_vertex = False
        while True:
            line = f.readline().strip()
            if line.startswith(b"format"):
                fmt = line.split()[1].decode()
            elif line.startswith(b"element"):
                parts = line.split()
                in_vertex = parts[1] == b"vertex"
                if in_vertex:
                    n_verts = int(parts[2])
            elif line.startswith(b"property") and in_vertex:
                parts = line.split()
                props.append((parts[-1].decode(), parts[1].decode()))
            elif line == b"end_header":
                break

        type_map = {
            "float": "<f4", "float32": "<f4", "double": "<f8",
            "uchar": "u1", "uint8": "u1", "char": "i1",
            "int": "<i4", "int32": "<i4", "short": "<i2",
            "ushort": "<u2", "uint": "<u4",
        }
        if fmt == "ascii":
            rows = [f.readline().split() for _ in range(n_verts)]
            arr = np.array(rows, dtype=np.float64)
            cols = {name: i for i, (name, _) in enumerate(props)}
            return arr[:, [cols["x"], cols["y"], cols["z"]]]
        dtype = np.dtype([(n, type_map[t]) for n, t in props])
        data = np.frombuffer(f.read(n_verts * dtype.itemsize), dtype=dtype)
        return np.stack(
            [data["x"], data["y"], data["z"]], axis=1
        ).astype(np.float64)


def read_xyz(path: str, delimiter: str | None = None) -> np.ndarray:
    """N x >=3 text cloud (face probe txt files use ',' or whitespace)."""
    try:
        return np.loadtxt(path, delimiter=delimiter)
    except ValueError:
        return np.loadtxt(path, delimiter=",")


def write_xyz(path: str, verts: np.ndarray, fmt: str = "%.6f"):
    np.savetxt(path, verts, fmt=fmt)


def normalize_cloud(pts: np.ndarray) -> np.ndarray:
    """Center and scale to the unit sphere (the normalization every
    reference dataset applies, e.g. dataset/bosphorus_dataset.py:74-76)."""
    pts = pts - pts.mean(axis=0, keepdims=True)
    dist = np.max(np.sqrt(np.sum(pts**2, axis=1)))
    return pts / (dist + 1e-12)
