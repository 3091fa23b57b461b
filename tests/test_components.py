"""Tests for the auxiliary components: debug dumps, RayBuffer + device
Morton sort, host intersect primitives."""

import numpy as np
import pytest

from tpu_rt.bvh import build_sbvh, flatten_bvh
from tpu_rt.core import intersect
from tpu_rt.core.math import morton_sort_order
from tpu_rt.core.types import Hits, make_rays
from tpu_rt.debug import (
    dump_bvh_nodes,
    dump_hex_words,
    dump_ray_results,
    dump_rays,
    dump_woop_triangles,
    load_hex_words,
)
from tpu_rt.debug.dumps import load_rays
from tpu_rt.rays import RayBuffer, morton_sort_device
from tpu_rt.scene import Scene, procedural
from tpu_rt.trace import trace_flat_scalar


@pytest.fixture(scope="module")
def small():
    scene = Scene(procedural.make_blob(300, seed=90))
    flat = flatten_bvh(build_sbvh(scene), scene.tri_vtx_index, scene.vtx_pos)
    return scene, flat


def test_hex_dump_roundtrip(tmp_path):
    vals = np.array([0.0, -0.0, 1.5, -2.25, np.float32(np.pi)], np.float32)
    p = str(tmp_path / "w.txt")
    dump_hex_words(p, vals)
    lines = open(p).read().splitlines()
    assert lines[0] == "00000000" and lines[1] == "80000000"
    np.testing.assert_array_equal(load_hex_words(p), vals)


def test_bvh_and_triangle_dumps(small, tmp_path):
    scene, flat = small
    node_files = dump_bvh_nodes(flat, str(tmp_path))
    assert len(node_files) == 16
    tri_files = dump_woop_triangles(flat, str(tmp_path))
    assert len(tri_files) == 4
    # triangle_x.txt holds v00.x,v11.x,v22.x per woop row, hex-exact.
    tx = load_hex_words(str(tmp_path / "triangle_x.txt"))
    woop = np.asarray(flat.tri_woop)
    np.testing.assert_array_equal(tx.reshape(-1, 3), woop[:, [0, 4, 8]])


def test_ray_dump_roundtrip(small, tmp_path):
    rng = np.random.default_rng(0)
    rays = make_rays(rng.normal(size=(32, 3)), rng.normal(size=(32, 3)), np.zeros(32), np.ones(32))
    p = str(tmp_path / "rays.dump")
    dump_rays(rays, p)
    assert np.fromfile(p, dtype="<f4").size == 32 * 8
    back = load_rays(p)
    np.testing.assert_array_equal(np.asarray(back.origin), np.asarray(rays.origin))
    np.testing.assert_array_equal(np.asarray(back.tmax), np.asarray(rays.tmax))


def test_ray_result_dump(tmp_path):
    hits = Hits(
        tri=np.array([3, -1], np.int32), t=np.array([1.5, 8.0], np.float32),
        u=np.zeros(2, np.float32), v=np.zeros(2, np.float32),
    )
    p = str(tmp_path / "res.txt")
    dump_ray_results(hits, p)
    assert open(p).read().splitlines() == ["3 1.5", "-1 8"]


def test_device_morton_matches_host(small):
    scene, _ = small
    rng = np.random.default_rng(1)
    n = 512
    o = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    dev = np.asarray(morton_sort_device(o, d))
    host = morton_sort_order(o, d)
    # Both are valid Morton orders over identical keys; stable sorts of the
    # same keys must agree exactly.
    np.testing.assert_array_equal(dev, host)


def test_ray_buffer_sort_preserves_addressing(small):
    scene, flat = small
    rng = np.random.default_rng(2)
    n = 256
    lo, hi = scene.bbox()
    size = float(np.linalg.norm(hi - lo))
    o = ((lo + hi) / 2 + rng.normal(size=(n, 3)) * size).astype(np.float32)
    t = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    d = t - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = make_rays(o, d, np.zeros(n), np.full(n, 4 * size))

    buf = RayBuffer(rays)
    ray0 = buf.get_ray_for_id(17)
    buf.morton_sort()
    ray1 = buf.get_ray_for_id(17)
    for a, b in zip(ray0, ray1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Permutation invariants.
    np.testing.assert_array_equal(buf.slot_to_id[buf.id_to_slot], np.arange(n))

    # Trace after sort and address results by id: identical to unsorted.
    tri_a, t_a, _, _ = trace_flat_scalar(flat, o, d, np.zeros(n, np.float32), np.full(n, 4 * size, np.float32))
    o_s = np.asarray(buf.rays.origin)
    d_s = np.asarray(buf.rays.dirn)
    tri_b, t_b, _, _ = trace_flat_scalar(flat, o_s, d_s, np.zeros(n, np.float32), np.full(n, 4 * size, np.float32))
    for ray_id in range(0, n, 17):
        slot = buf.id_to_slot[ray_id]
        assert tri_b[slot] == tri_a[ray_id]


def test_intersect_primitives(small):
    scene, flat = small
    # ray_box: axis ray through the unit box.
    hit, near, far = intersect.ray_box([-1, -1, -1], [1, 1, 1], [[-2, 0, 0]], [[1, 0, 0]], 0.0, 10.0)
    assert hit[0] and np.isclose(near[0], 1.0) and np.isclose(far[0], 3.0)
    miss, _, _ = intersect.ray_box([-1, -1, -1], [1, 1, 1], [[-2, 5, 0]], [[1, 0, 0]], 0.0, 10.0)
    assert not miss[0]

    # woop vs moller-trumbore on real scene triangles.
    rng = np.random.default_rng(3)
    k = 64
    ids = rng.integers(0, scene.num_triangles, k)
    tris = scene.triangles()[ids]
    centroid = tris.mean(axis=1)
    o = centroid + rng.normal(size=(k, 3)).astype(np.float32)
    d = centroid - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    hit_mt, t_mt, u_mt, v_mt = intersect.ray_triangle(
        tris[:, 0], tris[:, 1], tris[:, 2], o, d, 0.0, 100.0
    )
    # Build woop rows for exactly these triangles.
    from tpu_rt.bvh.flatten import woopify

    w = woopify(scene.tri_vtx_index, scene.vtx_pos, ids)
    hit_w, t_w, u_w, v_w = intersect.ray_triangle_woop(w, o, d, 0.0, 100.0)
    np.testing.assert_array_equal(hit_w, hit_mt)
    np.testing.assert_allclose(t_w[hit_w], t_mt[hit_mt], rtol=1e-4, atol=1e-5)
    # Barycentric convention: woop u ~ weight of v0 relative edge...; both
    # parametrize the same point.
    p_mt = o + t_mt[:, None] * d
    p_w = o + t_w[:, None] * d
    np.testing.assert_allclose(p_w[hit_w], p_mt[hit_mt], rtol=1e-4, atol=1e-5)
