"""Worker process for the two-process multihost smoke test.

Invoked by tests/test_dist.py::test_two_process_multihost as
`python tests/_multihost_worker.py <pid> <nproc> <port>`.  Every process
calls init_multihost (real jax.distributed.initialize), builds the SAME
scene/rays deterministically, constructs a mesh over the GLOBAL device
set, and traces the batch sharded across both processes.  Process 0
also traces the batch single-device and asserts the distributed hit
checksum matches, printing MULTIHOST_OK on success.
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from tpu_rt.bvh import build_sbvh, flatten_bvh  # noqa: E402
from tpu_rt.core.types import Rays, make_rays  # noqa: E402
from tpu_rt.dist.multihost import init_multihost  # noqa: E402
from tpu_rt.dist.sharding import AXIS, make_ray_mesh, trace_sharded  # noqa: E402
from tpu_rt.scene import Scene, procedural  # noqa: E402
from tpu_rt.trace import device_bvh, trace_wavefront  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

n_proc = init_multihost(coordinator_address=f"127.0.0.1:{port}",
                        num_processes=nproc, process_id=pid)
assert n_proc == nproc, n_proc
assert jax.process_count() == nproc
n_dev = len(jax.devices())
assert n_dev == 2 * nproc, n_dev

scene = Scene(procedural.make_blob(400, seed=50))
flat = flatten_bvh(build_sbvh(scene), scene.tri_vtx_index, scene.vtx_pos)
rng = np.random.default_rng(7)
lo, hi = scene.bbox()
size = float(np.linalg.norm(hi - lo))
n = 1024
origin = ((lo + hi) / 2 + rng.normal(size=(n, 3)) * size).astype(np.float32)
target = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
d = (target - origin)
d /= np.linalg.norm(d, axis=1, keepdims=True)
rays = make_rays(origin, d, np.zeros(n), np.full(n, 4 * size))

mesh = make_ray_mesh()


def dist_put(x, spec):
    """Host-global numpy -> global sharded array (device_put cannot
    target non-addressable devices in multi-controller runs)."""
    sh = NamedSharding(mesh, spec)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])


srays = Rays(origin=dist_put(rays.origin, P(AXIS, None)),
             dirn=dist_put(rays.dirn, P(AXIS, None)),
             tmin=dist_put(rays.tmin, P(AXIS)),
             tmax=dist_put(rays.tmax, P(AXIS)))
sflat = jax.tree_util.tree_map(lambda x: dist_put(x, P()), flat)

hits = trace_sharded(sflat, srays, mesh)
# Replicated global checksums (jit inserts the cross-process reduce).
import jax.numpy as jnp  # noqa: E402

csum = int(jax.jit(lambda t: jnp.sum(jnp.where(t >= 0, t, -1)))(hits.tri))
hsum = int(jax.jit(lambda t: jnp.sum((t >= 0).astype(jnp.int32)))(hits.tri))

if pid == 0:
    single = trace_wavefront(device_bvh(flat), rays)
    s_tri = np.asarray(single.tri)
    exp_csum = int(np.sum(np.where(s_tri >= 0, s_tri, -1)))
    exp_hsum = int(np.sum(s_tri >= 0))
    assert (csum, hsum) == (exp_csum, exp_hsum), (
        (csum, hsum), (exp_csum, exp_hsum))
    assert exp_hsum > 0, "degenerate fixture: no hits"
    print(f"MULTIHOST_OK procs={nproc} devices={n_dev} hits={hsum}",
          flush=True)
