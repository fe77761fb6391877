"""Worker for the two-process multi-host CPU test (test_multihost.py).

Each process owns 2 virtual CPU devices; jax.distributed stitches them
into a 4-device global mesh (dp=2 across processes, tp=2 within — the
default serving topology from parallel/multihost.default_mapping). Runs a
TP-sharded quantized linear + a dp-sharded batch reduction and prints a
checksum the parent compares across workers.

Usage: _multihost_worker.py <coordinator> <num_procs> <proc_id>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mixq_tensorrt_llm_tpu.parallel import multihost  # noqa: E402
from mixq_tensorrt_llm_tpu.parallel.mapping import Mapping  # noqa: E402


def main():
    coord, n, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    multihost.initialize_multihost(coordinator_address=coord,
                                   num_processes=n, process_id=pid)
    assert jax.process_count() == n, jax.process_count()
    assert jax.device_count() == 2 * n

    mapping = multihost.default_mapping()          # dp=n, tp=2
    assert mapping.dp == n and mapping.tp == 2
    mesh = mapping.make_mesh()

    # TP-sharded weight-only linear: weight cols split over tp, activations
    # replicated; batch sharded over dp. Same construction on every host.
    rng = np.random.default_rng(0)
    b, k, m = 4, 32, 64
    x = rng.standard_normal((b, k), np.float32)
    qw = rng.integers(-127, 127, (k, m), dtype=np.int8)
    scale = np.abs(rng.standard_normal((m,), np.float32)) + 0.1

    def put(arr, spec):
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            arr.shape, sh, lambda idx: arr[idx])

    xg = put(x, P("dp", None))
    qwg = put(qw, P(None, "tp"))
    sg = put(scale, P("tp"))

    @jax.jit
    def f(x, qw, scale):
        y = jnp.dot(x, qw.astype(jnp.float32)) * scale[None, :]
        return y, jnp.sum(y * y)

    y, ss = f(xg, qwg, sg)
    want = (x @ qw.astype(np.float32)) * scale[None, :]
    np.testing.assert_allclose(float(ss), float((want * want).sum()),
                               rtol=1e-4)
    # cross-host gather of the sharded result must reproduce the reference
    got = np.asarray(jax.device_get(
        jax.jit(lambda a: a, out_shardings=NamedSharding(mesh, P()))(y)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    print(f"CHECKSUM {float(ss):.6f}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
