"""True multi-process smoke test (VERDICT round-2 item 8).

Spawns TWO OS processes that form a distributed JAX job over CPU
(``jax.distributed.initialize`` with a local coordinator), build a 2-device
mesh spanning the processes, and run one data-parallel loss+grad step —
the only layer between the single-process 8-device mesh tests and a real
pod. Skips (with the reason captured) if the environment forbids
distributed init.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import os, sys
    sys.path.insert(0, sys.argv[3])
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    from hmm_layer_tpu.parallel import sharding
    from hmm_layer_tpu.ops import recursion

    port, pid = sys.argv[1], int(sys.argv[2])
    sharding.init_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()
    devices = jax.devices()
    assert len(devices) == 2, devices

    mesh = sharding.make_mesh({"data": 2}, devices)

    # Deterministic problem, identical on both processes.
    rng = np.random.default_rng(0)
    q, b, L = 5, 4, 32
    init = rng.dirichlet(np.ones(q)).astype(np.float32)[None]
    A = rng.dirichlet(np.ones(q), size=q).astype(np.float32)[None]
    E = rng.uniform(0.1, 1.0, size=(1, b, L, q)).astype(np.float32)

    #

    # Build the global batch from process-local shards (b split 2 ways).
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding_spec = NamedSharding(mesh, P(None, "data", None, None))
    local = E[:, pid * (b // 2) : (pid + 1) * (b // 2)]
    x = jax.make_array_from_process_local_data(sharding_spec, local)

    params = {"init": jnp.asarray(init), "A": jnp.asarray(A)}

    def loss(p, x):
        return -recursion.log_likelihood(p["init"], p["A"], x).mean()

    fn = sharding.data_parallel_fn(jax.value_and_grad(loss), mesh)
    val, grads = fn(params, x)
    val = float(np.asarray(val))

    # Cross-process result must equal the dense single-process value.
    ref = float(-np.asarray(
        recursion.log_likelihood(params["init"], params["A"], E)
    ).mean())
    assert abs(val - ref) < 1e-4 * max(1.0, abs(ref)), (val, ref)
    assert all(
        np.all(np.isfinite(np.asarray(g))) for g in jax.tree_util.tree_leaves(grads)
    )
    print(f"proc {pid} OK loss={val:.6f}", flush=True)
    """
)


def test_two_process_dp_step(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one device per process
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_NUM_CPU_DEVICES"] = "1"

    procs = []
    for pid in (0, 1):
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", WORKER, str(port), str(pid), REPO],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                env=env,
            )
        )
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process workers hung (coordinator deadlock?)")

    codes = [p.returncode for p in procs]
    joined = "\n---\n".join(outs)
    if any(c != 0 for c in codes):
        if "UNAVAILABLE" in joined or "failed to connect" in joined.lower():
            pytest.skip(f"environment forbids distributed init:\n{joined[-2000:]}")
        pytest.fail(f"worker exit codes {codes}:\n{joined[-4000:]}")
    assert "proc 0 OK" in joined and "proc 1 OK" in joined
