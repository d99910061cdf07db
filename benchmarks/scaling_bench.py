"""Weak-scaling harness: throughput vs device count for the sharded paths.

Runs the data-parallel and sequence-sharded workloads on meshes of 1..N
devices with per-device work held constant, and reports two efficiencies:

* ``weak``      = t(1) / t(n)      — classic weak scaling (ideal 1.0 when
  every mesh device is a real chip/core).
* ``overhead``  = n * t(1) / t(n)  — sharding/collective overhead proxy for
  hosts where the virtual devices SHARE cores (the 8-device CPU mesh on a
  single-core host serializes all compute, so ideal time is n*t(1) and any
  shortfall is pure partitioning/collective overhead). This is the
  meaningful number on the CI host; on a TPU pod slice read ``weak``.

On real multi-chip hardware (jax.devices() > 1 on a tpu backend) the same
code measures true weak scaling; run under ``jax.distributed`` for
multi-host (see ``parallel.sharding.init_distributed``).

Usage: python benchmarks/scaling_bench.py [--devices 1 2 4 8] [--out PATH]
Writes a JSON report and prints one summary line per (workload, n).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _setup_devices(max_n: int, real_devices: bool):
    import jax

    if not real_devices:
        # CPU mesh proxy (the only option on a single-chip host). Must be
        # configured before any backend initialization.
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", max_n)
    return jax


def time_fn(fn, *args, reps=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", nargs="*", type=int, default=[1, 2, 4, 8])
    ap.add_argument("--q", type=int, default=15)
    ap.add_argument("--b0", type=int, default=4, help="batch per device (DP)")
    ap.add_argument("--L0", type=int, default=512, help="seq block per device")
    ap.add_argument(
        "--real-devices",
        action="store_true",
        help="use the ambient backend's real devices (TPU pod slice) "
        "instead of forcing a virtual CPU mesh",
    )
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(__file__), "scaling_report.json"),
    )
    args = ap.parse_args()

    jax = _setup_devices(max(args.devices), args.real_devices)
    import jax.numpy as jnp

    from hmm_layer_tpu.ops import recursion
    from hmm_layer_tpu.parallel import sharding

    q = args.q
    rng = np.random.default_rng(0)
    init = jnp.asarray(rng.dirichlet(np.ones(q), size=1).astype(np.float32))
    A = jnp.asarray(rng.dirichlet(np.ones(q), size=(1, q)).astype(np.float32))

    def emissions(b, L):
        return jnp.asarray(
            rng.uniform(0.05, 1.0, size=(1, b, L, q)).astype(np.float32)
        )

    report = {
        "host_cpu_count": os.cpu_count(),
        "backend": jax.default_backend(),
        "n_devices_available": len(jax.devices()),
        "q": q,
        "workloads": {},
    }

    def run_workload(name, times):
        rows = []
        for n, tn in times.items():
            weak = (times[args.devices[0]] / tn) if tn else None
            overhead = n * times[args.devices[0]] / tn if tn else None
            rows.append(
                {"n": n, "t_s": tn, "weak": weak, "overhead": overhead}
            )
            print(
                f"{name:24s} n={n}: {tn*1e3:8.1f} ms  weak={weak:.2f}  "
                f"overhead-eff={overhead:.2f}",
                file=sys.stderr,
            )
        report["workloads"][name] = rows

    # -- data-parallel MAP gradient (the training hot path) -------------------
    times = {}
    for n in args.devices:
        mesh = sharding.make_mesh({"data": n})
        E = emissions(args.b0 * n, args.L0)

        def loss(p, x):
            return recursion.log_likelihood(p["init"], p["A"], x, 4).mean()

        fn = sharding.data_parallel_fn(jax.grad(loss), mesh)
        x = sharding.shard_batch(E, mesh)
        times[n] = time_fn(fn, {"init": init, "A": A}, x)
    run_workload("dp loglik grad", times)

    # -- sequence-sharded posterior (long-context inference) ------------------
    times = {}
    for n in args.devices:
        mesh = sharding.make_mesh({"seq": n})
        E = emissions(args.b0, args.L0 * n)
        fn = jax.jit(
            lambda i, a, e, _mesh=mesh: sharding.seq_sharded_posterior(
                i, a, e, _mesh, local_parallel_factor=2
            )[0].sum()
        )
        times[n] = time_fn(fn, init, A, E)
    run_workload("seq posterior", times)

    # -- sequence-sharded training gradient (long-context training) -----------
    times = {}
    for n in args.devices:
        mesh = sharding.make_mesh({"seq": n})
        E = emissions(args.b0, args.L0 * n)
        fn = jax.jit(
            jax.grad(
                lambda a, e, _mesh=mesh: sharding.seq_sharded_log_likelihood(
                    init, a, e, _mesh, local_parallel_factor=2
                ).mean()
            )
        )
        times[n] = time_fn(fn, A, E)
    run_workload("seq loglik grad", times)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"written": args.out, "backend": report["backend"]}))


if __name__ == "__main__":
    main()
