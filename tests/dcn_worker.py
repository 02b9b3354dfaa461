"""Worker process for the real 2-process DCN test (``test_parallel.py``).

Each process owns 4 virtual CPU devices; ``jax.distributed.initialize``
connects them over localhost gRPC exactly like hosts connect over DCN on a
pod. The worker exercises the production helpers
(``parallel.distributed.initialize`` / ``make_global_mesh``), one
cross-process all-reduce, and one sharded train step, then prints a JSON
verdict line for the parent to assert on.

Usage: python dcn_worker.py <coordinator_addr> <num_procs> <proc_id>
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main() -> int:
    coord, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import jax

    jax.config.update("jax_platforms", "cpu")  # axon pins platform at import

    from lemas_tts_tpu.parallel.distributed import (
        initialize,
        is_primary,
        make_global_mesh,
    )

    assert initialize(coord, num_procs, pid) is True
    assert jax.process_count() == num_procs
    assert jax.process_index() == pid
    assert is_primary() == (pid == 0)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_global = jax.device_count()
    assert n_global == 4 * num_procs, n_global
    mesh = make_global_mesh(model_parallel=2)
    assert mesh.devices.shape == (n_global // 2, 2)

    # --- cross-process all-reduce: sum of per-device (pid*4 + local_idx)
    from jax.experimental import multihost_utils

    local = jnp.asarray([float(pid)])
    summed = float(multihost_utils.process_allgather(local).sum())
    assert summed == sum(range(num_procs)), summed

    # --- one sharded train step: W sharded over 'model', batch over 'data'.
    # Each process contributes only ITS OWN 4 batch rows (the multi-host
    # data-loading contract): host-local shards assemble into one global
    # array whose 'data' axis spans processes.
    wsh = NamedSharding(mesh, P(None, "model"))
    rng = np.random.default_rng(0)  # same seed → same global batch (SPMD)
    x_np = rng.standard_normal((4 * num_procs, 16)).astype(np.float32)
    y_np = rng.standard_normal((4 * num_procs, 32)).astype(np.float32)
    w_np = rng.standard_normal((16, 32)).astype(np.float32) * 0.1

    rows = slice(pid * 4, (pid + 1) * 4)
    x = multihost_utils.host_local_array_to_global_array(
        x_np[rows], mesh, P("data", None))
    y = multihost_utils.host_local_array_to_global_array(
        y_np[rows], mesh, P("data", None))
    w = jax.device_put(w_np, wsh)

    @jax.jit
    def step(w, x, y):
        def loss(w):
            return jnp.mean((x @ w - y) ** 2)

        l, g = jax.value_and_grad(loss)(w)
        return l, w - 0.1 * g

    l0, w1 = step(w, x, y)
    l1, _ = step(w1, x, y)
    l0, l1 = float(l0), float(l1)
    assert np.isfinite([l0, l1]).all() and l1 < l0, (l0, l1)
    # the global loss must agree across processes (it saw all shards)
    gathered = np.asarray(multihost_utils.process_allgather(jnp.asarray([l0])))
    assert np.allclose(gathered, l0), gathered

    print(json.dumps({"pid": pid, "devices": n_global, "loss0": l0,
                      "loss1": l1, "ok": True}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
