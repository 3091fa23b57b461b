"""Packet-traversal Pallas kernel, validated in interpreter mode on CPU
against the scalar oracle (the TPU-compiled path is exercised by bench.py)."""

import numpy as np
import pytest

from tpu_rt.bvh import build_sbvh, flatten_bvh
from tpu_rt.core.types import make_rays
from tpu_rt.scene import Scene, procedural
from tpu_rt.trace import trace_flat_scalar


@pytest.fixture(scope="module")
def setup():
    scene = Scene(procedural.make_blob(700, seed=80))
    flat = flatten_bvh(build_sbvh(scene), scene.tri_vtx_index, scene.vtx_pos)
    return scene, flat


def _rays(scene, n, seed=0):
    rng = np.random.default_rng(seed)
    lo, hi = scene.bbox()
    size = float(np.linalg.norm(hi - lo))
    origin = ((lo + hi) / 2 + rng.normal(size=(n, 3)) * size).astype(np.float32)
    target = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    d = target - origin
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return origin, d.astype(np.float32), np.zeros(n, np.float32), np.full(n, 4 * size, np.float32)





def test_packet_interior(setup):
    scene2 = Scene(procedural.make_interior(900, seed=81))
    flat2 = flatten_bvh(build_sbvh(scene2), scene2.tri_vtx_index, scene2.vtx_pos)
    o, d, tmin, tmax = _rays(scene2, 500, seed=3)
    s_id, s_t, _, _ = trace_flat_scalar(flat2, o, d, tmin, tmax)
    hits = trace_packet2(flat2, make_rays(o, d, tmin, tmax), interpret=True)
    np.testing.assert_array_equal(np.asarray(hits.tri), s_id)


# ---- the branch-free interleaved kernel ----

from tpu_rt.trace.packet2 import (  # noqa: E402
    TILE as TILE2,
    K as K2,
    pack_tables2,
    trace_packet2,
)


def test_packet2_matches_oracle(setup):
    scene, flat = setup
    n = K2 * TILE2 + 300  # one full instance + one padded instance
    o, d, tmin, tmax = _rays(scene, n)
    s_id, s_t, s_u, s_v = trace_flat_scalar(flat, o, d, tmin, tmax)
    hits = trace_packet2(flat, make_rays(o, d, tmin, tmax), interpret=True)
    np.testing.assert_array_equal(np.asarray(hits.tri), s_id)
    hit = s_id >= 0
    np.testing.assert_allclose(np.asarray(hits.t)[hit], s_t[hit], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hits.u)[hit], s_u[hit], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(hits.v)[hit], s_v[hit], rtol=1e-3, atol=1e-4)


def test_packet2_any_hit(setup):
    scene, flat = setup
    o, d, tmin, tmax = _rays(scene, 600, seed=1)
    c_id, c_t, _, _ = trace_flat_scalar(flat, o, d, tmin, tmax)
    hits = trace_packet2(flat, make_rays(o, d, tmin, tmax), any_hit=True, interpret=True)
    a_id = np.asarray(hits.tri)
    np.testing.assert_array_equal(a_id >= 0, c_id >= 0)
    hit = c_id >= 0
    assert np.all(np.asarray(hits.t)[hit] >= c_t[hit] - 1e-5)


def test_packet2_hbm_matches_oracle(setup):
    """Force the HBM double-buffered streaming path (packet2 hbm=True) on
    a small scene: parity with the scalar oracle must be identical to the
    VMEM-resident path.  This is the large-scene (dragon/hairball) code
    path — prefetch-descriptor mirroring and queue-head peeking are the
    subtlest logic in the kernel."""
    scene, flat = setup
    n = 2 * 512 + 77  # full + padded instance at tile=512
    o, d, tmin, tmax = _rays(scene, n, seed=5)
    tmax[::5] = -1.0  # degenerate rays in-stream
    s_id, s_t, _, _ = trace_flat_scalar(flat, o, d, tmin, tmax)
    hits = trace_packet2(flat, make_rays(o, d, tmin, tmax), hbm=True,
                         interpret=True, tile=512, k=2)
    np.testing.assert_array_equal(np.asarray(hits.tri), s_id)
    hit = s_id >= 0
    np.testing.assert_allclose(np.asarray(hits.t)[hit], s_t[hit],
                               rtol=1e-5, atol=1e-6)


def test_packet2_hbm_any_hit(setup):
    scene, flat = setup
    o, d, tmin, tmax = _rays(scene, 600, seed=6)
    c_id, c_t, _, _ = trace_flat_scalar(flat, o, d, tmin, tmax)
    hits = trace_packet2(flat, make_rays(o, d, tmin, tmax), any_hit=True,
                         hbm=True, interpret=True, tile=512, k=2)
    np.testing.assert_array_equal(np.asarray(hits.tri) >= 0, c_id >= 0)
    hit = c_id >= 0
    assert np.all(np.asarray(hits.t)[hit] >= c_t[hit] - 1e-5)


@pytest.mark.parametrize("hbm", ["vmem", "mixed", "hbm"])
def test_packet2_bf16_nodes_matches_oracle(setup, hbm):
    """bf16 node records (32 B/node, outward-rounded bounds + bit-half
    links + hint stuffed in link0 bits 28-30): hit results must be
    EXACTLY the oracle's in every residency — slab tests only became
    conservative, triangle tests are unchanged f32."""
    scene, flat = setup
    n = 2 * 512 + 91
    o, d, tmin, tmax = _rays(scene, n, seed=21)
    tmax[::7] = -1.0
    s_id, s_t, _, _ = trace_flat_scalar(flat, o, d, tmin, tmax)
    hits = trace_packet2(flat, make_rays(o, d, tmin, tmax), interpret=True,
                         tile=512, k=2, hbm=hbm, bf16_nodes=True)
    np.testing.assert_array_equal(np.asarray(hits.tri), s_id)
    hit = s_id >= 0
    np.testing.assert_allclose(np.asarray(hits.t)[hit], s_t[hit],
                               rtol=1e-5, atol=1e-6)


def test_packet2_bf16_any_hit(setup):
    scene, flat = setup
    o, d, tmin, tmax = _rays(scene, 600, seed=22)
    c_id, c_t, _, _ = trace_flat_scalar(flat, o, d, tmin, tmax)
    hits = trace_packet2(flat, make_rays(o, d, tmin, tmax), any_hit=True,
                         interpret=True, tile=512, k=2, bf16_nodes=True)
    np.testing.assert_array_equal(np.asarray(hits.tri) >= 0, c_id >= 0)
    hit = c_id >= 0
    assert np.all(np.asarray(hits.t)[hit] >= c_t[hit] - 1e-5)


def test_bf16_round_dir_conservative():
    from tpu_rt.trace.packet2 import _bf16_round_dir
    import ml_dtypes

    rng = np.random.default_rng(0)
    x = np.concatenate([
        rng.normal(size=4096).astype(np.float32) * 10.0 ** rng.integers(
            -20, 20, 4096),
        np.array([0.0, -0.0, 1.0, -1.0, np.inf, -np.inf, 1e-40, -1e-40],
                 np.float32),
    ])
    dn = _bf16_round_dir(x, up=False).view(ml_dtypes.bfloat16).astype(
        np.float32)
    up = _bf16_round_dir(x, up=True).view(ml_dtypes.bfloat16).astype(
        np.float32)
    assert np.all(dn <= x) and np.all(up >= x)
    # Within 1 bf16 ulp: round-trip of exact bf16 values is identity.
    exact = up[np.isfinite(x)] == dn[np.isfinite(x)]
    xf = x[np.isfinite(x)]
    np.testing.assert_array_equal(exact,
                                  xf == xf.astype(ml_dtypes.bfloat16)
                                  .astype(np.float32))


def test_packet2_mixed_residency(setup):
    """hbm="mixed": nodes VMEM-resident, triangle blocks DMA-streamed —
    the residency auto-picked for scenes whose node table fits VMEM but
    whose triangle table does not (conference/fairy class).  Bit-exact
    with the oracle like every other residency."""
    scene, flat = setup
    n = 2 * 512 + 61
    o, d, tmin, tmax = _rays(scene, n, seed=11)
    tmax[::6] = -1.0
    s_id, s_t, _, _ = trace_flat_scalar(flat, o, d, tmin, tmax)
    hits = trace_packet2(flat, make_rays(o, d, tmin, tmax), interpret=True,
                         tile=512, k=2, hbm="mixed")
    np.testing.assert_array_equal(np.asarray(hits.tri), s_id)
    hit = s_id >= 0
    np.testing.assert_allclose(np.asarray(hits.t)[hit], s_t[hit],
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("c,hbm", [(2, False), (3, False), (2, True)])
def test_packet2_multi_cursor(setup, c, hbm):
    """C parallel leaf cursors drain C queue entries per iteration; hit
    results must stay bit-identical to the oracle (each candidate is
    still tested with the exact scalar arithmetic; only drain order
    changes, and the closest-hit merge is order-independent)."""
    scene, flat = setup
    n = 2 * 512 + 131
    o, d, tmin, tmax = _rays(scene, n, seed=9)
    tmax[::7] = -1.0
    s_id, s_t, _, _ = trace_flat_scalar(flat, o, d, tmin, tmax)
    hits = trace_packet2(flat, make_rays(o, d, tmin, tmax), interpret=True,
                         tile=512, k=2, c=c, hbm=hbm)
    np.testing.assert_array_equal(np.asarray(hits.tri), s_id)
    hit = s_id >= 0
    np.testing.assert_allclose(np.asarray(hits.t)[hit], s_t[hit],
                               rtol=1e-5, atol=1e-6)


def test_packet2_multi_cursor_any_hit(setup):
    scene, flat = setup
    o, d, tmin, tmax = _rays(scene, 700, seed=10)
    c_id, _, _, _ = trace_flat_scalar(flat, o, d, tmin, tmax)
    hits = trace_packet2(flat, make_rays(o, d, tmin, tmax), any_hit=True,
                         interpret=True, tile=512, k=2, c=3)
    np.testing.assert_array_equal(np.asarray(hits.tri) >= 0, c_id >= 0)


def test_packet2_mxu_mode(setup):
    """Opt-in MXU triangle unit (trace_packet2 mxu=True): dot-product op
    order differs from the scalar oracle, so hit ids may flip on
    edge-grazing rays — assert near-total id agreement plus t parity on
    agreeing hits instead of exactness."""
    scene, flat = setup
    n = 2 * 512 + 99
    o, d, tmin, tmax = _rays(scene, n, seed=7)
    s_id, s_t, _, _ = trace_flat_scalar(flat, o, d, tmin, tmax)
    hits = trace_packet2(flat, make_rays(o, d, tmin, tmax), interpret=True,
                         tile=512, k=2, mxu=True)
    a_id = np.asarray(hits.tri)
    agree = a_id == s_id
    assert agree.mean() > 0.999, f"id agreement {agree.mean()}"
    hit = (s_id >= 0) & agree
    np.testing.assert_allclose(np.asarray(hits.t)[hit], s_t[hit],
                               rtol=1e-4, atol=1e-5)


def test_packet2_iter_census_vs_oracle_bounds(setup):
    """Locks the roofline model into CI (VERDICT r4 #7): the kernel's
    count_iters census must sit inside oracle-derived bounds.

    Lower bound (provable): a grid step's while-loop iterations >= the
    max per-ray node-test count in its block — the shared cursor visits
    at least the union of per-ray node sets, and a union is >= its
    largest member.  Upper bound (conservative regression tripwire): the
    union is <= the SUM of per-ray sets, each union node costs <= 2
    node-unit transitions (visit + pop bookkeeping) and each queued leaf
    triangle <= 1 drain slot, plus deferred-leaf hit_t-tightening lag —
    so iterations beyond 2*sum(node)+sum(tri)+slack means runaway
    traversal (e.g. a pruning or vote regression), not fp noise."""
    import jax.numpy as jnp

    from tpu_rt.trace import RayStats

    scene, flat = setup
    tile, k = 512, 2
    block = tile * k
    n = 2 * block  # two grid steps, no padding
    o, d, tmin, tmax = _rays(scene, n, seed=30)
    st = RayStats()
    s_id, _, _, _ = trace_flat_scalar(flat, o, d, tmin, tmax, stats=st)
    hits, iters = trace_packet2(flat, make_rays(o, d, tmin, tmax),
                                interpret=True, tile=tile, k=k,
                                count_iters=True)
    np.testing.assert_array_equal(np.asarray(hits.tri), s_id)
    it = np.asarray(iters)
    assert it.shape == (2,)
    for g in range(2):
        sl = slice(g * block, (g + 1) * block)
        node = st.per_ray_node_tests[sl]
        tri = st.per_ray_tri_tests[sl]
        assert it[g] >= node.max(), (it[g], node.max())
        bound = 2 * node.sum() + tri.sum() + 64
        assert it[g] <= bound, (it[g], bound)


def test_packet2_degenerate_and_tiny(setup):
    scene, flat = setup
    # Degenerate rays (tmax < 0, reference convention) never hit; a tiny
    # batch exercises full padding.
    o, d, tmin, tmax = _rays(scene, 64, seed=2)
    tmax[::2] = -1.0
    s_id, _, _, _ = trace_flat_scalar(flat, o, d, tmin, tmax)
    hits = trace_packet2(flat, make_rays(o, d, tmin, tmax), interpret=True)
    np.testing.assert_array_equal(np.asarray(hits.tri), s_id)
    assert np.all(np.asarray(hits.tri)[::2] == -1)


# ---- the 4-wide (MBVH4) kernel variant ----

from tpu_rt.bvh.collapse import (  # noqa: E402
    collapse4,
    trace_quad_scalar,
    validate_quad,
)
from tpu_rt.trace.packet2 import trace_packet4  # noqa: E402


@pytest.fixture(scope="module")
def quad_setup(setup):
    scene, flat = setup
    quad = collapse4(flat)
    validate_quad(quad, scene.num_triangles)
    return scene, flat, quad


def test_collapse4_oracle_parity(quad_setup):
    """Quad traversal is the same geometry query: hit/miss classification
    and t must be EXACTLY the binary oracle's (same per-triangle f32
    arithmetic; only the tested-triangle sets differ, which cannot
    change a closest hit — ids may differ solely on exact-t ties)."""
    scene, flat, quad = quad_setup
    o, d, tmin, tmax = _rays(scene, 900, seed=40)
    tmax[::6] = -1.0
    s_id, s_t, _, _ = trace_flat_scalar(flat, o, d, tmin, tmax)
    q_id, q_t, _, _ = trace_quad_scalar(quad, o, d, tmin, tmax)
    np.testing.assert_array_equal(q_t, s_t)
    dis = q_id != s_id
    assert np.all(q_t[dis] == s_t[dis])  # only exact-t ties may differ


@pytest.mark.parametrize("hbm", ["vmem", "mixed", "hbm"])
def test_packet4_matches_oracle(quad_setup, hbm):
    scene, flat, quad = quad_setup
    n = 2 * 512 + 77
    o, d, tmin, tmax = _rays(scene, n, seed=41)
    tmax[::5] = -1.0
    s_id, s_t, _, _ = trace_flat_scalar(flat, o, d, tmin, tmax)
    hits = trace_packet4(quad, make_rays(o, d, tmin, tmax), interpret=True,
                         tile=512, k=2, hbm=hbm)
    np.testing.assert_array_equal(np.asarray(hits.tri), s_id)
    hit = s_id >= 0
    np.testing.assert_allclose(np.asarray(hits.t)[hit], s_t[hit],
                               rtol=1e-5, atol=1e-6)


def test_packet4_any_hit(quad_setup):
    scene, flat, quad = quad_setup
    o, d, tmin, tmax = _rays(scene, 700, seed=42)
    c_id, c_t, _, _ = trace_flat_scalar(flat, o, d, tmin, tmax)
    hits = trace_packet4(quad, make_rays(o, d, tmin, tmax), any_hit=True,
                         interpret=True, tile=512, k=2)
    np.testing.assert_array_equal(np.asarray(hits.tri) >= 0, c_id >= 0)
    hit = c_id >= 0
    assert np.all(np.asarray(hits.t)[hit] >= c_t[hit] - 1e-5)


def test_packet4_want_uv(quad_setup):
    scene, flat, quad = quad_setup
    o, d, tmin, tmax = _rays(scene, 600, seed=43)
    s_id, s_t, s_u, s_v = trace_flat_scalar(flat, o, d, tmin, tmax)
    hits = trace_packet4(quad, make_rays(o, d, tmin, tmax), interpret=True,
                         tile=512, k=2, want_uv=True)
    hit = s_id >= 0
    np.testing.assert_array_equal(np.asarray(hits.tri), s_id)
    np.testing.assert_allclose(np.asarray(hits.u)[hit], s_u[hit],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(hits.v)[hit], s_v[hit],
                               rtol=1e-3, atol=1e-4)


def test_packet4_interior_and_degenerate():
    scene2 = Scene(procedural.make_interior(900, seed=81))
    flat2 = flatten_bvh(build_sbvh(scene2), scene2.tri_vtx_index,
                        scene2.vtx_pos)
    quad2 = collapse4(flat2)
    validate_quad(quad2, scene2.num_triangles)
    o, d, tmin, tmax = _rays(scene2, 500, seed=44)
    tmax[::2] = -1.0
    s_id, s_t, _, _ = trace_flat_scalar(flat2, o, d, tmin, tmax)
    hits = trace_packet4(quad2, make_rays(o, d, tmin, tmax), interpret=True,
                         tile=512, k=2)
    np.testing.assert_array_equal(np.asarray(hits.tri), s_id)
    assert np.all(np.asarray(hits.tri)[::2] == -1)
