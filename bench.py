"""Headline benchmark: gene-pred HMM posterior decode throughput on TPU.

Workload (BASELINE.json configs 2/3): posterior (forward+backward) of a
15-state gene-prediction HMM over (batch=32, L=9999) given precomputed
emission probabilities — the same scope as the reference-equivalent CPU
baseline in benchmarks/torch_cpu_baseline.py (eager per-timestep loop).

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

    from hmm_layer_tpu.ops import recursion

    Q, B, L = 15, 32, 9999
    rng = np.random.default_rng(0)
    init = jnp.asarray(rng.dirichlet(np.ones(Q)).astype(np.float32))[None]
    A = jnp.asarray(rng.dirichlet(np.ones(Q), size=Q).astype(np.float32))[None]

    log(f"devices: {jax.devices()}")

    # Several distinct input batches: repeated identical dispatches can be
    # served from caches on some transports, and a host readback of the
    # result is the only reliable synchronization point (block_until_ready
    # does not fully synchronize through the axon tunnel).
    inputs = [
        jnp.asarray(rng.uniform(0.05, 1.0, size=(1, B, L, Q)).astype(np.float32))
        for _ in range(4)
    ]
    for e in inputs:
        np.asarray(e[0, 0, 0, :1])

    candidates = [1, 99]
    best = None
    for pf in candidates:
        fn = jax.jit(lambda i, a, e, pf=pf: recursion.posterior(i, a, e, pf))
        t0 = time.perf_counter()
        _, ll = fn(init, A, inputs[0])
        np.asarray(ll)
        compile_s = time.perf_counter() - t0
        iters = 6
        t0 = time.perf_counter()
        for k in range(iters):
            _, ll = fn(init, A, inputs[k % len(inputs)])
            np.asarray(ll)  # true sync
        elapsed = (time.perf_counter() - t0) / iters
        sps = B / elapsed
        log(
            f"parallel_factor={pf}: compile {compile_s:.1f}s, "
            f"{elapsed*1e3:.1f} ms/batch, {sps:.1f} seqs/sec"
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
                    f"(fwd+bwd, b={B}, L={L}, parallel_factor={best[0]})"
                ),
                "value": round(best[1], 2),
                "unit": "seqs/sec",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
            }
        )
    )


if __name__ == "__main__":
    main()
