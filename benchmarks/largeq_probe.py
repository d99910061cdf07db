"""Probe: XLA engine timings at large state counts (q > 16) on real TPU.

The round-1 Pallas kernels cover only q <= 16, m == 1 (the 15-state
flagship); profile HMMs run q = 2L+3 (33..155+) and config 5 demands 500+
states. Before generalizing the kernels, measure where the XLA fallback
actually spends time at those shapes — the q=15 layout pessimization was
measured on the scalar-broadcast formulation, while at larger q the engine
uses MXU einsums whose behavior under scan layout assignment may differ.

Run: python benchmarks/largeq_probe.py [--shapes q,m ...]
Device time via the in-jit repetition slope (axon dispatch ~33 ms fixed).
"""

import argparse
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from hmm_layer_tpu.ops import recursion  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope_time(fn, args, k1=2, k2=8, reps=3):
    """Device ms per single workload execution via repetition slope."""

    def rep(n):
        @jax.jit
        def run(*xs):
            def body(k, acc):
                scaled = tuple(
                    x * (1.0 + 1e-6 * k) if x.dtype == jnp.float32 else x
                    for x in xs
                )
                return acc + fn(*scaled)

            return lax.fori_loop(0, n, body, 0.0)

        return run

    r1, r2 = rep(k1), rep(k2)
    t0 = time.perf_counter()
    np.asarray(r1(*args))
    compile_s = time.perf_counter() - t0
    np.asarray(r2(*args))
    ts = {k1: [], k2: []}
    for _ in range(reps):
        for k, f in ((k1, r1), (k2, r2)):
            t0 = time.perf_counter()
            np.asarray(f(*args))
            ts[k].append(time.perf_counter() - t0)
    per = (min(ts[k2]) - min(ts[k1])) / (k2 - k1)
    return per * 1e3, compile_s


def make_inputs(q, m, b, L, seed=0):
    rng = np.random.default_rng(seed)
    init = jnp.asarray(
        rng.dirichlet(np.ones(q), size=m).astype(np.float32)
    )
    A = jnp.asarray(
        rng.dirichlet(np.ones(q), size=(m, q)).astype(np.float32)
    )
    E = jnp.asarray(
        rng.uniform(0.05, 1.0, size=(m, b, L, q)).astype(np.float32)
    )
    return init, A, E


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=32)
    ap.add_argument("--L", type=int, default=1023 * 3)  # 3069, divisible by 3, 9, 31, 33, 93
    ap.add_argument(
        "--shapes", nargs="*", default=["33,1", "33,5", "127,1", "127,5"]
    )
    ap.add_argument("--pfs", nargs="*", type=int, default=[1, 9, 31, 93])
    args = ap.parse_args()

    log(f"devices: {jax.devices()}  backend: {jax.default_backend()}")
    b, L = args.b, args.L

    for shape in args.shapes:
        q, m = map(int, shape.split(","))
        init, A, E = make_inputs(q, m, b, L)
        log(f"--- q={q} m={m} b={b} L={L} ---")

        for pf in args.pfs:
            if L % pf:
                continue
            # posterior (the full fwd+bwd pipeline)
            fn = lambda i, a, e, _pf=pf: jnp.sum(
                recursion.posterior(i, a, e, _pf)[0][..., 0, :]
            )
            ms, cs = slope_time(fn, (init, A, E))
            log(f"posterior  pf={pf:3d}: {ms:8.2f} ms  (compile {cs:.0f}s)")

        for pf in args.pfs:
            if pf == 1 or L % pf:
                continue
            # summary pass alone (the O(L q^3 / ...) operator scan)
            fn = lambda i, a, e, _pf=pf: jnp.sum(
                recursion._chunk_summaries(a, e, _pf)[0][..., 0, :]
            )
            ms, cs = slope_time(fn, (init, A, E))
            log(f"summaries  pf={pf:3d}: {ms:8.2f} ms  (compile {cs:.0f}s)")

        # loglik via sequential scan (q^2 per position, MXU)
        fn = lambda i, a, e: jnp.sum(recursion.log_likelihood(i, a, e, 1))
        ms, cs = slope_time(fn, (init, A, E))
        log(f"loglik seq       : {ms:8.2f} ms  (compile {cs:.0f}s)")

        # viterbi
        for pf in args.pfs:
            if L % pf:
                continue
            fn = lambda i, a, e, _pf=pf: jnp.sum(
                recursion.viterbi(i, a, e, _pf)
            ).astype(jnp.float32)
            ms, cs = slope_time(fn, (init, A, E))
            log(f"viterbi    pf={pf:3d}: {ms:8.2f} ms  (compile {cs:.0f}s)")


if __name__ == "__main__":
    main()
