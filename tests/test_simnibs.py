"""SimNIBS .msh ingestion (pipeline.simnibs) — the native replacement for
the reference's SimNIBS MeshConv subprocess (`BabelDatasetPreps.py:307`)."""

import struct

import numpy as np
import pytest

from babelbrain_tpu.pipeline.simnibs import (
    SIMNIBS_TO_CHARM,
    msh_to_labels,
    rasterize_tetrahedra,
    read_msh,
)

_CUBE = np.array(
    [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
     [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], np.int64,
)
_TETS = np.array(
    [[0, 5, 1, 6], [0, 1, 2, 6], [0, 2, 3, 6],
     [0, 3, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6]], np.int64,
)


def _box_mesh(n=10, inner=(3, 7)):
    """Tetrahedralized n^3 cube; tets in the inner box tagged 2, rest 5."""
    g = np.arange(n + 1, dtype=np.float64)
    nodes = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)

    def nid(i, j, k):
        return (i * (n + 1) + j) * (n + 1) + k

    tets, tags = [], []
    for i in range(n):
        for j in range(n):
            for k in range(n):
                corners = [nid(i + o[0], j + o[1], k + o[2]) for o in _CUBE]
                c = np.array([i, j, k]) + 0.5
                tag = 2 if all(inner[0] <= v < inner[1] for v in c) else 5
                for t in _TETS:
                    tets.append([corners[v] for v in t])
                    tags.append(tag)
    return nodes, np.array(tets, np.int64), np.array(tags, np.int32)


def _write_ascii(path, nodes, tets, tags):
    with open(path, "w") as f:
        f.write("$MeshFormat\n2.2 0 8\n$EndMeshFormat\n")
        f.write(f"$Nodes\n{len(nodes)}\n")
        for i, p in enumerate(nodes):
            f.write(f"{i + 1} {p[0]} {p[1]} {p[2]}\n")
        f.write("$EndNodes\n")
        f.write(f"$Elements\n{len(tets)}\n")
        for i, (t, tg) in enumerate(zip(tets, tags)):
            conn = " ".join(str(v + 1) for v in t)
            f.write(f"{i + 1} 4 2 {tg} {tg} {conn}\n")
        f.write("$EndElements\n")


def _write_binary(path, nodes, tets, tags):
    with open(path, "wb") as f:
        f.write(b"$MeshFormat\n2.2 1 8\n")
        f.write(struct.pack("<i", 1))
        f.write(b"\n$EndMeshFormat\n")
        f.write(f"$Nodes\n{len(nodes)}\n".encode())
        for i, p in enumerate(nodes):
            f.write(struct.pack("<i3d", i + 1, *p))
        f.write(b"$EndNodes\n")
        f.write(f"$Elements\n{len(tets)}\n".encode())
        f.write(struct.pack("<3i", 4, len(tets), 2))
        for i, (t, tg) in enumerate(zip(tets, tags)):
            f.write(struct.pack("<7i", i + 1, tg, tg, *(v + 1 for v in t)))
        f.write(b"$EndElements\n")


@pytest.fixture(scope="module")
def box():
    return _box_mesh()


@pytest.mark.parametrize("writer", [_write_ascii, _write_binary])
def test_read_msh_roundtrip(tmp_path, box, writer):
    nodes, tets, tags = box
    p = str(tmp_path / "head.msh")
    writer(p, nodes, tets, tags)
    rn, elements = read_msh(p)
    np.testing.assert_allclose(rn, nodes)
    conn, rtags = elements[4]
    np.testing.assert_array_equal(conn, tets)
    np.testing.assert_array_equal(rtags, tags)


def test_rasterize_tetrahedra_regions(box):
    nodes, tets, tags = box
    lab = rasterize_tetrahedra(nodes, tets, tags, np.eye(4), (10, 10, 10))
    # voxel center (i,j,k) maps to mesh point (i,j,k); inner box [3,7)
    ii, jj, kk = np.mgrid[:10, :10, :10]
    inner = ((ii >= 3) & (ii < 7) & (jj >= 3) & (jj < 7) & (kk >= 3) & (kk < 7))
    # allow the inner-box *faces* to land either way (voxel centers at
    # integer coords lie exactly on tet faces there)
    core = ((ii >= 4) & (ii < 6) & (jj >= 4) & (jj < 6) & (kk >= 4) & (kk < 6))
    outside = ~inner
    assert (lab[core] == 2).all()
    assert (lab[outside & (lab > 0)] == 5).all()
    assert (lab > 0).mean() > 0.7  # grid interior is covered


def test_rasterize_affine_scaling(box):
    nodes, tets, tags = box
    # half-mm voxels: affine scales voxel index by 0.5
    A = np.diag([0.5, 0.5, 0.5, 1.0])
    lab = rasterize_tetrahedra(nodes, tets, tags, A, (20, 20, 20))
    frac2 = (lab == 2).sum() / (lab > 0).sum()
    assert abs(frac2 - (4.0 / 10.0) ** 3) < 0.05


def test_msh_to_labels_charm_vocabulary(tmp_path, box):
    nodes, tets, tags = box
    p = str(tmp_path / "sub.msh")
    _write_binary(p, nodes, tets, tags)
    lab = msh_to_labels(p, np.eye(4), (10, 10, 10))
    # tag 2 (GM) -> charm 2, tag 5 (scalp) -> charm 5
    assert set(np.unique(lab)) <= {0, SIMNIBS_TO_CHARM[2], SIMNIBS_TO_CHARM[5]}
    assert (lab == 2).any() and (lab == 5).any()
