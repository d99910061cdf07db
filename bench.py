"""Headline benchmark: gene-pred HMM posterior decode throughput on TPU.

Workload (BASELINE.json configs 2/3): posterior (forward+backward) of a
15-state gene-prediction HMM over (batch=32, L=9999) given precomputed
emission probabilities — the same scope as the reference-equivalent CPU
baseline in benchmarks/torch_cpu_baseline.py (eager per-timestep loop).

Measurement: the axon TPU tunnel has a ~33 ms fixed per-dispatch cost that
dwarfs device compute, and ``block_until_ready`` does not synchronize
through it. So the benchmark loops the workload *inside* one compiled call
(``lax.fori_loop`` with a per-iteration input perturbation to defeat CSE)
and takes the slope between two repetition counts — fixed dispatch/readback
overhead cancels exactly, leaving pure device time per batch.

Prints exactly ONE JSON line to stdout:
    {"metric": ..., "value": N, "unit": "seqs/sec", "vs_baseline": N}
Extra diagnostics go to stderr.
"""

import json
import os
import sys
import time

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from hmm_layer_tpu.ops import recursion

    Q, B, L = 15, 32, 9999
    rng = np.random.default_rng(0)
    init = jnp.asarray(rng.dirichlet(np.ones(Q)).astype(np.float32))[None]
    A = jnp.asarray(rng.dirichlet(np.ones(Q), size=Q).astype(np.float32))[None]
    E = jnp.asarray(rng.uniform(0.05, 1.0, size=(1, B, L, Q)).astype(np.float32))
    np.asarray(E[0, 0, 0, :1])  # materialize on device

    log(f"devices: {jax.devices()}")

    def repeated(pf, n):
        @jax.jit
        def run(init, A, E):
            def body(k, acc):
                e_k = E * (1.0 + 1e-6 * k)  # defeat CSE across iterations
                lg, ll = recursion.posterior(init, A, e_k, pf)
                return acc + jnp.sum(lg[..., 0, :]) + jnp.sum(ll)
            return lax.fori_loop(0, n, body, 0.0)
        return run

    K1, K2 = 3, 19
    candidates = [1, 11, 33]
    best = None
    for pf in candidates:
        run1, run2 = repeated(pf, K1), repeated(pf, K2)
        t0 = time.perf_counter()
        np.asarray(run1(init, A, E))  # compile + run
        compile_s = time.perf_counter() - t0
        np.asarray(run2(init, A, E))
        times = {K1: [], K2: []}
        for _ in range(5):
            for k, fn in ((K1, run1), (K2, run2)):
                t0 = time.perf_counter()
                np.asarray(fn(init, A, E))
                times[k].append(time.perf_counter() - t0)
        per_batch = (min(times[K2]) - min(times[K1])) / (K2 - K1)
        sps = B / per_batch
        log(
            f"parallel_factor={pf}: compile {compile_s:.1f}s, "
            f"{per_batch*1e3:.2f} ms/batch (device), {sps:.1f} seqs/sec"
        )
        if best is None or sps > best[1]:
            best = (pf, sps)

    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "benchmarks", "baseline_cpu.json"
    )
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)
        vs_baseline = best[1] / baseline["seqs_per_sec"]
        log(
            f"cpu baseline: {baseline['seqs_per_sec']:.1f} seqs/sec -> "
            f"speedup {vs_baseline:.1f}x"
        )

    print(
        json.dumps(
            {
                "metric": (
                    "gene-pred 15-state posterior decode throughput "
                    f"(fwd+bwd, b={B}, L={L}, parallel_factor={best[0]}, "
                    "device time)"
                ),
                "value": round(best[1], 2),
                "unit": "seqs/sec",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
            }
        )
    )


if __name__ == "__main__":
    main()
