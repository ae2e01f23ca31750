"""Golden tests for the icosahedral mesh hierarchy and connectivity.

The level-k vertex/face tables are fully deterministic, so these are exact
structural checks (counts, nesting, orientation, Euler characteristic),
plus distributional checks on the graph builders.
"""

import numpy as np
import pytest

from graphcast_lite_tpu.mesh.icosphere import (
    build_hierarchy,
    edges_from_faces,
    icosahedron,
    max_edge_length,
    merge_mesh_levels,
    mesh_lat_lon,
    prune_hierarchy_to_region,
    split_mesh,
)
from graphcast_lite_tpu.mesh.connectivity import (
    closest_faces,
    containing_triangle_edges,
    knn_edges,
    radius_query_edges,
)
from graphcast_lite_tpu.mesh.features import (
    grid_lat_lon_to_cartesian,
    lat_lon_to_cartesian,
    receiver_local_rotation_matrices,
    spherical_node_features,
    edge_spatial_features,
)


def test_icosahedron_structure():
    m = icosahedron()
    assert m.vertices.shape == (12, 3)
    assert m.faces.shape == (20, 3)
    np.testing.assert_allclose(
        np.linalg.norm(m.vertices, axis=1), 1.0, atol=1e-6
    )
    # All faces CCW from outside: (v1-v0)x(v2-v0)·centroid > 0.
    v = m.vertices[m.faces]
    normal = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    centroid = v.mean(axis=1)
    assert (np.einsum("ij,ij->i", normal, centroid) > 0).all()
    # Euler characteristic: V - E + F = 2.
    e = edges_from_faces(m.faces)
    assert 12 - e.shape[1] // 2 + 20 == 2


@pytest.mark.parametrize("splits", [1, 2, 3])
def test_hierarchy_counts_and_nesting(splits):
    meshes = build_hierarchy(splits)
    for k, m in enumerate(meshes):
        assert m.num_vertices == 10 * 4**k + 2
        assert m.num_faces == 20 * 4**k
        np.testing.assert_allclose(
            np.linalg.norm(m.vertices, axis=1), 1.0, atol=1e-6
        )
    # Nested prefix property.
    for k in range(splits):
        np.testing.assert_array_equal(
            meshes[k + 1].vertices[: meshes[k].num_vertices], meshes[k].vertices
        )
    # Orientation preserved after splits.
    m = meshes[-1]
    v = m.vertices[m.faces]
    normal = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    centroid = v.mean(axis=1)
    assert (np.einsum("ij,ij->i", normal, centroid) > 0).all()


def test_multimesh_edge_count_reference_scale():
    """Reference README reports 75,522 E_M edges for mesh [3,5] *including*
    the 10,242 PyG self loops; the raw bidirectional count is 65,280."""
    meshes = build_hierarchy(5)
    mm = merge_mesh_levels(meshes, [3, 5])
    assert mm.vertices.shape[0] == 10242
    e = edges_from_faces(mm.faces)
    assert e.shape == (2, 65280)
    assert e.shape[1] + 10242 == 75522
    # Bidirectional: interleaved swapped pairs.
    np.testing.assert_array_equal(e[0, 0::2], e[1, 1::2])
    np.testing.assert_array_equal(e[1, 0::2], e[0, 1::2])


def test_split_midpoint_ordering_is_first_seen():
    m0 = icosahedron()
    m1 = split_mesh(m0)
    # First new vertex must be the midpoint of the first face's first edge.
    f0 = m0.faces[0]
    expected = m0.vertices[f0[0]] + m0.vertices[f0[1]]
    expected = expected / np.linalg.norm(expected)
    np.testing.assert_allclose(m1.vertices[12], expected, atol=1e-6)


def test_prune_hierarchy():
    meshes = build_hierarchy(3)
    pruned = prune_hierarchy_to_region(meshes, 40.0, 60.0, 80.0, 100.0, 15.0)
    assert len(pruned) == len(meshes)
    finest = pruned[-1]
    assert 0 < finest.num_vertices < meshes[-1].num_vertices
    lats, lons = mesh_lat_lon(finest)
    assert (lats >= 25.0 - 1e-4).all() and (lats <= 75.0 + 1e-4).all()
    # All faces reference valid pruned vertices.
    for m in pruned:
        if m.num_faces:
            assert m.faces.min() >= 0 and m.faces.max() < finest.num_vertices


def test_radius_query_matches_bruteforce():
    meshes = build_hierarchy(2)
    mesh = meshes[-1]
    lat = np.linspace(-80, 80, 9).astype(np.float32)
    lon = np.arange(0, 360, 45).astype(np.float32)
    radius = max_edge_length(mesh) * 0.6
    g, m = radius_query_edges(lat, lon, mesh, radius)
    grid_pos = grid_lat_lon_to_cartesian(lat, lon)
    d = np.linalg.norm(grid_pos[:, None] - mesh.vertices[None], axis=-1)
    expect = np.argwhere(d <= radius)
    got = set(zip(g.tolist(), m.tolist()))
    assert got == set(map(tuple, expect.tolist()))


def test_containment_matches_bruteforce():
    meshes = build_hierarchy(2)
    mesh = meshes[-1]
    rng = np.random.RandomState(1)
    pts_lat = rng.uniform(-85, 85, 40).astype(np.float32)
    pts_lon = rng.uniform(0, 360, 40).astype(np.float32)
    g, m = containing_triangle_edges(pts_lat, pts_lon, mesh, flat=True)
    assert g.shape == (120,)
    # Verify against exhaustive closest-face search.
    pts = lat_lon_to_cartesian(pts_lat, pts_lon)
    face_got = closest_faces(pts, mesh, num_candidates=12)
    face_all = closest_faces(pts, mesh, num_candidates=mesh.num_faces)
    # Distances must agree (faces may differ on exact ties).
    tri = mesh.vertices[mesh.faces]

    def dist_to(face_idx):
        c = tri[face_idx].mean(axis=1)
        return np.linalg.norm(pts - c, axis=1)

    np.testing.assert_allclose(dist_to(face_got), dist_to(face_all), atol=1e-5)


def test_knn_edges():
    rng = np.random.RandomState(2)
    sp = rng.randn(50, 3)
    rp = rng.randn(20, 3)
    s, r, d = knn_edges(sp, rp, 4)
    assert s.shape == (80,) and r.shape == (80,)
    # Each receiver's neighbors sorted by distance, matching brute force.
    full = np.linalg.norm(rp[:, None] - sp[None], axis=-1)
    for i in range(20):
        got = set(s[r == i].tolist())
        expect = set(np.argsort(full[i])[:4].tolist())
        assert got == expect


def test_node_features_definition():
    lat = np.array([0.0, 90.0, -90.0], dtype=np.float32)
    lon = np.array([0.0, 0.0, 0.0], dtype=np.float32)
    f = spherical_node_features(lat, lon)
    assert f.shape == (3, 6)
    # Equator/lon0: x=1, cos(theta)=0.
    np.testing.assert_allclose(f[0], [1, 0, 0, 0, 1, 0], atol=1e-6)
    # North pole: z=1, cos(theta)=1.
    np.testing.assert_allclose(f[1, 2:4], [1, 1], atol=1e-6)
    # South pole: z=-1, cos(theta)=-1.
    np.testing.assert_allclose(f[2, 2:4], [-1, -1], atol=1e-6)


def test_rotation_matrices_against_scipy():
    from scipy.spatial import transform

    rng = np.random.RandomState(3)
    phi = rng.uniform(0, 2 * np.pi, 16)
    theta = rng.uniform(0, np.pi, 16)
    for rot_lat, rot_lon, seq in [
        (True, True, "zy"),
        (False, True, "z"),
        (True, False, "zyz"),
    ]:
        ours = receiver_local_rotation_matrices(phi, theta, rot_lat, rot_lon)
        az = -phi
        polar = -theta + np.pi / 2
        if seq == "zy":
            ref = transform.Rotation.from_euler(
                "zy", np.stack([az, polar], axis=1)
            ).as_matrix()
        elif seq == "z":
            ref = transform.Rotation.from_euler("z", az[:, None]).as_matrix()
        else:
            ref = transform.Rotation.from_euler(
                "zyz", np.stack([az, polar, -az], axis=1)
            ).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_edge_features_receiver_local():
    """Receiver-local frame: receiver maps to (1,0,0); self-edge rel = 0;
    features bounded by 1 after normalization."""
    lat = np.array([10.0, 20.0, -35.0], dtype=np.float32)
    lon = np.array([40.0, 220.0, 100.0], dtype=np.float32)
    senders = np.array([0, 1, 2, 0])
    receivers = np.array([1, 2, 0, 0])
    ef = edge_spatial_features(lat, lon, lat, lon, senders, receivers)
    assert ef.shape == (4, 4)
    assert np.abs(ef).max() <= 1.0 + 1e-6
    # Self edge 0->0 has zero relative position and distance.
    np.testing.assert_allclose(ef[3], 0.0, atol=1e-6)
    # |d| column equals the norm of the rel-position columns.
    np.testing.assert_allclose(
        ef[:, 0], np.linalg.norm(ef[:, 1:], axis=1), atol=1e-6
    )
