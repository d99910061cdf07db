"""Cost breakdown of the flagship training gradients (TPU).

Decomposes grad(posterior-CE) — the most expensive training path — into
its measured parts so optimization targets the right term:

  * grad(loglik): Baum-Welch analytic VJP (one summary reuse, no solves).
  * grad(posterior-CE-like): primal + full analytic posterior VJP.
  * posterior VJP alone: the two batched chunked affine adjoint solves +
    weight construction + gE/gA assembly, driven from saved residuals.
  * one affine solve (m=1): the per-solve floor (Pallas, near VPU roofline).

Timing uses the in-jit repetition slope (the axon transport has ~33 ms
fixed dispatch cost and block_until_ready does not synchronize through
it — see bench.py). Run on the real chip:

    python benchmarks/grad_breakdown.py [--pf 33] [--trace DIR]

``--trace DIR`` additionally captures a perfetto trace of one
grad(posterior) dispatch (view in Perfetto/TensorBoard) for fusion work.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax


def log(*a):
    print(time.strftime("%H:%M:%S"), *a, flush=True)


def slope(fn, args, k1=2, k2=10, reps=3):
    """Device ms/call via the in-jit repetition slope."""

    def rep(n):
        @jax.jit
        def run(*xs):
            def body(k, acc):
                scaled = tuple(x * (1.0 + 1e-6 * k) for x in xs)
                return acc + fn(*scaled)

            return lax.fori_loop(0, n, body, 0.0)

        return run

    r1, r2 = rep(k1), rep(k2)
    np.asarray(r1(*args))
    np.asarray(r2(*args))
    ts = {k1: [], k2: []}
    for _ in range(reps):
        for k, f in ((k1, r1), (k2, r2)):
            t0 = time.perf_counter()
            np.asarray(f(*args))
            ts[k].append(time.perf_counter() - t0)
    return (min(ts[k2]) - min(ts[k1])) / (k2 - k1) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--q", type=int, default=15)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--length", type=int, default=9999)
    ap.add_argument("--pf", type=int, default=33)
    ap.add_argument("--trace", type=str, default=None,
                    help="capture a perfetto trace of grad(posterior) here")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke-testing)")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from hmm_layer_tpu.ops import recursion
    from hmm_layer_tpu.utils.profiling import trace

    m, q, b, L, P = 1, args.q, args.batch, args.length, args.pf
    log(jax.devices())
    rng = np.random.default_rng(0)
    init = jnp.asarray(rng.dirichlet(np.ones(q), size=m).astype(np.float32))
    A = jnp.asarray(rng.dirichlet(np.ones(q), size=(m, q)).astype(np.float32))
    E = jnp.asarray(
        rng.uniform(0.05, 1.0, size=(m, b, L, q)).astype(np.float32)
    )
    w = jnp.asarray(rng.normal(size=(m, b, L, q)).astype(np.float32))

    t = slope(
        lambda a, e: jnp.sum(
            jax.grad(
                lambda aa: jnp.sum(recursion.log_likelihood(init, aa, e, P))
            )(a)
        ),
        (A, E),
    )
    log(f"grad(loglik)            : {t:.3f} ms")

    def post_ce(a, e):
        return jnp.sum(
            jax.grad(
                lambda aa: jnp.sum(recursion.posterior(init, aa, e, P)[0] * w)
            )(a)
        )

    t = slope(post_ce, (A, E))
    log(f"grad(posterior-CE-like) : {t:.3f} ms")

    # VJP-only: drive the analytic adjoint pass from saved primal residuals.
    la, ll = recursion._forward_chunked_primal(init, A, E, P)
    lg, _ = recursion.posterior(init, A, E, P)
    ct = w

    def vjp_only(a, e):
        out = recursion._posterior_analytic_vjp(
            init, a, e, P, False, ct, jnp.zeros((m, b)), saved=(la, lg, ll)
        )
        return sum(jnp.sum(x) for x in out)

    t = slope(vjp_only, (A, E))
    log(f"posterior VJP alone     : {t:.3f} ms")

    def solves_only(a, e):
        log_E = jnp.log(jnp.maximum(e, 1e-16))
        f, gbar = recursion._forward_adjoint_weights(la, log_E)
        x = recursion._chunked_affine_reverse(a, f, gbar, ct, P)
        return jnp.sum(x)

    t = slope(solves_only, (A, E))
    log(f"one affine solve (m=1)  : {t:.3f} ms")

    if args.trace:
        g = jax.jit(jax.grad(
            lambda aa: jnp.sum(recursion.posterior(init, aa, E, P)[0] * w)
        ))
        np.asarray(g(A))  # compile outside the trace
        with trace(args.trace):
            np.asarray(g(A))
        log(f"perfetto trace written to {args.trace}")


if __name__ == "__main__":
    main()
