from functools import partial

from tpu_rt.trace.cpu_reference import (
    RayStats,
    assign_treelets,
    intersect_brute,
    trace_flat_scalar,
)
from tpu_rt.trace.xla_tracer import trace_wavefront, device_bvh

__all__ = [
    "RayStats",
    "assign_treelets",
    "intersect_brute",
    "trace_flat_scalar",
    "trace_wavefront",
    "device_bvh",
    "make_routing_tracer",
]


def _xla_routing(tables, rays, any_hit=False):
    return trace_wavefront(tables, rays, any_hit=any_hit)


class _PacketRouting:
    """Hashable routing-tracer callable for the packet kernel.

    Downstream code uses the routing fn as a jax.jit STATIC argument
    (dist/sharding.py), where equality/hash decide cache hits.  A plain
    functools.partial compares by identity, so re-creating the tracer
    (per frame / per scene reload) would silently recompile every
    sharded entry point; this wrapper compares by its config tuple.
    """

    def __init__(self, hbm, interpret, tile, k, u, c, want_uv):
        self._cfg = (hbm, interpret, tile, k, u, c, want_uv)

    def __call__(self, tables, rays, any_hit=False):
        from tpu_rt.trace.packet2 import _trace2_jit

        hbm, interpret, tile, k, u, c, want_uv = self._cfg
        nodes3, woop3 = tables
        return _trace2_jit(nodes3, woop3, rays, any_hit, hbm, interpret,
                           want_uv, k, tile // 128, u, False, c)

    def __eq__(self, other):
        return (type(other) is _PacketRouting and self._cfg == other._cfg)

    def __hash__(self):
        return hash(self._cfg)


# Back-compat alias used by dist/ docs; prefer make_routing_tracer.
def _packet_routing(hbm, interpret, tile, k, u, c, tables, rays,
                    any_hit=False):
    return _PacketRouting(hbm, interpret, tile, k, u, c, False)(
        tables, rays, any_hit=any_hit)


def make_routing_tracer(flat, prefer: str = "auto", interpret: bool = False,
                        tile: int | None = None, k: int | None = None,
                        u: int | None = None, c: int | None = None,
                        want_uv: bool = False):
    """Resolve the fastest routing tracer for the current backend/scene.

    Returns (fn, kind, tables) where fn(tables, rays, any_hit) -> Hits is
    jittable and shard_map-safe (tables is the pytree of device arrays to
    replicate: packed packet tables for the Pallas kernel, or the device
    FlatBVH for the XLA wavefront tracer).  Create once per scene and
    reuse fn — it is used as a static argument downstream (identical
    configs compare equal, so re-creating it does not recompile).

    want_uv: if False (default) the packet tracer returns Hits with
    u=v=0 — the frame path consumes only (tri, t), matching the
    reference kernel's int2 result; pass True when barycentrics are
    needed (the XLA tracer always fills them).

    prefer: "auto" (packet kernel on TPU, XLA otherwise), "packet", "xla".
    """
    import jax

    from tpu_rt.trace.packet2 import (
        C, K, TILE, U, choose_node_format, prepare_tables2,
    )

    on_tpu = jax.default_backend() == "tpu"
    if prefer == "packet" or (prefer == "auto" and on_tpu):
        hbm, bf16 = choose_node_format(flat)
        tables = prepare_tables2(flat, bf16_nodes=bf16)
        if tables is not None:
            # Streamed residencies default to the wider-tile/shorter-
            # interleave schedule (trace_packet2's policy).
            streaming = hbm != "vmem"
            dtile = 4096 if streaming else TILE
            dk = 2 if streaming else K
            fn = _PacketRouting(hbm, interpret, tile or dtile, k or dk,
                                u or U, c or C, want_uv)
            kind = ("packet" if hbm == "vmem" else f"packet-{hbm}") + (
                "-bf16" if bf16 else "")
            return fn, kind, tables
        if prefer == "packet":
            raise ValueError("packet tracer requested but scene exceeds "
                             "packing limits")
        import warnings

        warnings.warn(
            "tpu_rt: scene exceeds packet-kernel packing limits; 'auto' "
            "is falling back to the XLA wavefront tracer (~1000x slower "
            "on TPU). Use prefer='packet' to get the limit error instead.",
            RuntimeWarning, stacklevel=2)
    return _xla_routing, "xla", device_bvh(flat)
