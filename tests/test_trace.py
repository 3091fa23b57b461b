import numpy as np
import pytest

import jax.numpy as jnp

from tpu_rt.bvh import build_sbvh, flatten_bvh
from tpu_rt.core.types import Rays, make_rays
from tpu_rt.scene import Camera, Scene, procedural
from tpu_rt.trace import RayStats, device_bvh, intersect_brute, trace_flat_scalar, trace_wavefront


def _scene_and_flat(mesh):
    scene = Scene(mesh)
    bvh = build_sbvh(scene)
    flat = flatten_bvh(bvh, scene.tri_vtx_index, scene.vtx_pos)
    return scene, flat


def _random_rays(scene, n, seed=0, from_outside=True):
    rng = np.random.default_rng(seed)
    lo, hi = scene.bbox()
    center = (lo + hi) / 2
    size = float(np.linalg.norm(hi - lo))
    if from_outside:
        origin = center + rng.normal(size=(n, 3)) * size
    else:
        origin = rng.uniform(lo, hi, (n, 3))
    target = rng.uniform(lo, hi, (n, 3))
    dirn = target - origin
    dirn /= np.linalg.norm(dirn, axis=1, keepdims=True)
    tmin = np.zeros(n, np.float32)
    tmax = np.full(n, 4 * size, np.float32)
    return origin.astype(np.float32), dirn.astype(np.float32), tmin, tmax


@pytest.fixture(scope="module")
def blob():
    return _scene_and_flat(procedural.make_blob(1500, seed=21))


def test_scalar_tracer_matches_brute(blob):
    scene, flat = blob
    o, d, tmin, tmax = _random_rays(scene, 200, seed=1)
    tris = scene.triangles()

    b_id, b_t, b_u, b_v = intersect_brute(tris, o, d, tmin, tmax)
    s_id, s_t, s_u, s_v = trace_flat_scalar(flat, o, d, tmin, tmax)

    # Same hit/miss classification everywhere.
    np.testing.assert_array_equal(s_id >= 0, b_id >= 0)
    hit = b_id >= 0
    # t agrees tightly; ids may differ only where two triangles are
    # (near-)coincident at the same t.
    np.testing.assert_allclose(s_t[hit], b_t[hit], rtol=1e-4, atol=1e-5)
    same = s_id == b_id
    assert same[hit].mean() > 0.99


def test_wavefront_matches_scalar(blob):
    scene, flat = blob
    o, d, tmin, tmax = _random_rays(scene, 500, seed=2)
    s_id, s_t, s_u, s_v = trace_flat_scalar(flat, o, d, tmin, tmax)

    dbvh = device_bvh(flat)
    rays = make_rays(o, d, tmin, tmax)
    hits = trace_wavefront(dbvh, rays)
    w_id = np.asarray(hits.tri)
    w_t = np.asarray(hits.t)

    np.testing.assert_array_equal(w_id, s_id)
    hit = s_id >= 0
    np.testing.assert_allclose(w_t[hit], s_t[hit], rtol=1e-6, atol=1e-7)
    # u/v see FMA/reassociation differences between XLA and the scalar oracle.
    np.testing.assert_allclose(np.asarray(hits.u)[hit], s_u[hit], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(hits.v)[hit], s_v[hit], rtol=1e-3, atol=1e-4)


def test_any_hit_semantics(blob):
    scene, flat = blob
    o, d, tmin, tmax = _random_rays(scene, 300, seed=3)
    c_id, c_t, _, _ = trace_flat_scalar(flat, o, d, tmin, tmax, any_hit=False)
    a_id, a_t, _, _ = trace_flat_scalar(flat, o, d, tmin, tmax, any_hit=True)

    # anyHit finds a hit iff closest-hit does; its t is >= closest (it stops
    # at the first accepted intersection, not necessarily the nearest).
    np.testing.assert_array_equal(a_id >= 0, c_id >= 0)
    hit = c_id >= 0
    assert np.all(a_t[hit] >= c_t[hit] - 1e-6)

    dbvh = device_bvh(flat)
    rays = make_rays(o, d, tmin, tmax)
    w = trace_wavefront(dbvh, rays, any_hit=True)
    np.testing.assert_array_equal(np.asarray(w.tri) >= 0, c_id >= 0)


def test_degenerate_rays_skip(blob):
    scene, flat = blob
    o, d, tmin, tmax = _random_rays(scene, 64, seed=4)
    tmax[::2] = -1.0  # degenerate (reference RayGenKernels.cu:221)
    s_id, _, _, _ = trace_flat_scalar(flat, o, d, tmin, tmax)
    assert np.all(s_id[::2] == -1)
    hits = trace_wavefront(device_bvh(flat), make_rays(o, d, tmin, tmax))
    np.testing.assert_array_equal(np.asarray(hits.tri)[::2], -1)
    # Stats: degenerate lanes do zero work.
    _, st = trace_wavefront(device_bvh(flat), make_rays(o, d, tmin, tmax), with_stats=True)
    assert np.all(np.asarray(st["node_tests"])[::2] == 0)


def test_tmin_tmax_respected(blob):
    scene, flat = blob
    o, d, tmin, tmax = _random_rays(scene, 200, seed=5)
    base_id, base_t, _, _ = trace_flat_scalar(flat, o, d, tmin, tmax)
    hit = base_id >= 0
    # Clamp tmax below the hit -> must miss.
    tmax2 = np.where(hit, base_t * 0.9, tmax).astype(np.float32)
    id2, _, _, _ = trace_flat_scalar(flat, o, d, tmin, tmax2)
    assert np.all(id2[hit] == -1) or np.mean(id2[hit] == -1) > 0.98  # grazing cases
    # Raise tmin above the hit -> different (or no) hit, never the same t.
    tmin2 = np.where(hit, base_t * 1.001, tmin).astype(np.float32)
    id3, t3, _, _ = trace_flat_scalar(flat, o, d, tmin2, tmax)
    assert np.all(t3[hit] >= base_t[hit])


def test_inside_rays(blob):
    # Rays starting inside the model (AO-style) still agree with brute force.
    scene, flat = blob
    o, d, tmin, tmax = _random_rays(scene, 150, seed=6, from_outside=False)
    b_id, b_t, _, _ = intersect_brute(scene.triangles(), o, d, tmin, tmax)
    s_id, s_t, _, _ = trace_flat_scalar(flat, o, d, tmin, tmax)
    np.testing.assert_array_equal(s_id >= 0, b_id >= 0)
    hit = b_id >= 0
    np.testing.assert_allclose(s_t[hit], b_t[hit], rtol=1e-4, atol=1e-5)


def test_stats_counters(blob):
    scene, flat = blob
    o, d, tmin, tmax = _random_rays(scene, 50, seed=7)
    stats = RayStats()
    trace_flat_scalar(flat, o, d, tmin, tmax, stats=stats)
    assert stats.num_rays == 50
    assert stats.num_node_tests > 0
    assert stats.num_triangle_tests > 0
    _, wst = trace_wavefront(device_bvh(flat), make_rays(o, d, tmin, tmax), with_stats=True)
    np.testing.assert_array_equal(np.asarray(wst["node_tests"]), stats.per_ray_node_tests)
    np.testing.assert_array_equal(np.asarray(wst["tri_tests"]), stats.per_ray_tri_tests)


def test_treelet_counter(blob):
    """numTreelets (reference BVH.hh:48, BVH.cc:89-99): with no treelet
    assignment every node shares id -1 -> exactly 1 transition per
    traced ray (the reference's unassigned-default behavior); with a
    real partition (assign_treelets) the count is >= the node-test
    count / treelet size and bounded by the node-test count."""
    from tpu_rt.trace import assign_treelets

    scene, flat = blob
    o, d, tmin, tmax = _random_rays(scene, 60, seed=9)
    tmax[::4] = -1.0  # degenerate rays never enter the tree
    st0 = RayStats()
    trace_flat_scalar(flat, o, d, tmin, tmax, stats=st0)
    traced = np.sum(tmax >= 0)
    assert st0.num_treelets == traced  # all-(-1) default: 1/ray
    assert np.all(st0.per_ray_treelets[tmax < 0] == 0)

    tl = assign_treelets(flat, max_nodes=32)
    n_inner = np.asarray(flat.nodes).shape[0]
    assert tl.shape == (n_inner,) and np.all(tl >= 0)
    # Partition budget respected and every treelet non-empty.
    counts = np.bincount(tl)
    assert counts.max() <= 32 and counts.min() >= 1
    st1 = RayStats()
    trace_flat_scalar(flat, o, d, tmin, tmax, stats=st1, treelets=tl)
    # Transitions are bounded by node visits and at least 1 per traced
    # ray; a real partition transitions strictly more than the default.
    assert st1.num_treelets >= traced
    assert st1.num_treelets <= st1.num_node_tests
    assert st1.num_treelets >= st0.num_treelets
    assert np.all(st1.per_ray_treelets <= st1.per_ray_node_tests)


def test_interior_scene_wavefront():
    scene, flat = _scene_and_flat(procedural.make_interior(1200, seed=22))
    o, d, tmin, tmax = _random_rays(scene, 100, seed=8, from_outside=False)
    s_id, s_t, _, _ = trace_flat_scalar(flat, o, d, tmin, tmax)
    hits = trace_wavefront(device_bvh(flat), make_rays(o, d, tmin, tmax))
    np.testing.assert_array_equal(np.asarray(hits.tri), s_id)
    # Interior rays nearly always hit something (closed room).
    assert (s_id >= 0).mean() > 0.95
