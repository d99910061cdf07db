"""Cost breakdown of the flagship training gradients (TPU).

Decomposes grad(posterior-CE) — the most expensive training path — into
its measured parts so optimization targets the right term:

  * grad(loglik): Baum-Welch analytic VJP (one summary reuse, no solves).
  * grad(posterior-CE-like): primal + full analytic posterior VJP.
  * posterior VJP alone: the batched (fwd+bwd stacked as 2m models)
    chunked affine adjoint solve + weight construction + gE/gA assembly,
    driven from saved residuals.
  * one affine solve (m=1): the per-solve floor (Pallas, near VPU roofline).

Timing uses the same in-jit repetition-slope harness as ``bench.py``
(K1=3/K2=19, only the EMISSIONS perturbed per iteration). An earlier
version used K1=2/K2=10 and perturbed BOTH operands per iteration — that
harness reported ~27x inflated figures (recorded so nobody resurrects
it); cross-check any change here against the flagship train-step numbers,
which bound grad(loglik) from above.

Measured (TPU v5e, q=15, b=32, L=9999, pf=33 — round 3):
    primal loglik           0.646 ms
    grad(loglik) wrt (A,E)  1.224 ms
    primal posterior        1.198 ms
    grad(post-CE) wrt (A,E) 5.061 ms
    posterior VJP alone     3.212 ms
    one affine solve        1.037 ms

Run on the real chip:
    python benchmarks/grad_breakdown.py [--pf 33] [--trace DIR]
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


def make_slope(A, E, K1=3, K2=19, reps=5):
    """Device ms/call via the in-jit repetition slope (bench.py method)."""

    def slope(fn):
        def rep(n):
            @jax.jit
            def run(A, E):
                def body(k, acc):
                    e_k = E * (1.0 + 1e-6 * k)  # defeat CSE across iterations
                    return acc + fn(A, e_k)

                return lax.fori_loop(0, n, body, 0.0)

            return run

        r1, r2 = rep(K1), rep(K2)
        np.asarray(r1(A, E))
        np.asarray(r2(A, E))
        ts = {K1: [], K2: []}
        for _ in range(reps):
            for k, f in ((K1, r1), (K2, r2)):
                t0 = time.perf_counter()
                np.asarray(f(A, E))
                ts[k].append(time.perf_counter() - t0)
        return (min(ts[K2]) - min(ts[K1])) / (K2 - K1) * 1e3

    return slope


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
    slope = make_slope(A, E)

    t = slope(lambda a, e: jnp.sum(recursion.log_likelihood(init, a, e, P)))
    log(f"primal loglik           : {t:.3f} ms")

    t = slope(lambda a, e: sum(
        jnp.sum(x) for x in jax.grad(
            lambda aa, ee: jnp.sum(recursion.log_likelihood(init, aa, ee, P)),
            argnums=(0, 1),
        )(a, e)
    ))
    log(f"grad(loglik) wrt (A,E)  : {t:.3f} ms")

    t = slope(lambda a, e: jnp.sum(recursion.posterior(init, a, e, P)[0] * w))
    log(f"primal posterior        : {t:.3f} ms")

    t = slope(lambda a, e: sum(
        jnp.sum(x) for x in jax.grad(
            lambda aa, ee: jnp.sum(recursion.posterior(init, aa, ee, P)[0] * w),
            argnums=(0, 1),
        )(a, e)
    ))
    log(f"grad(post-CE) wrt (A,E) : {t:.3f} ms")

    # VJP-only: drive the analytic adjoint pass from saved primal residuals.
    la, ll = recursion._forward_chunked_primal(init, A, E, P)
    lg, _ = recursion.posterior(init, A, E, P)
    ct = w

    def vjp_only(a, e):
        out = recursion._posterior_analytic_vjp(
            init, a, e, P, False, ct, jnp.zeros((m, b)), saved=(la, lg, ll)
        )
        return sum(jnp.sum(x) for x in out)

    t = slope(vjp_only)
    log(f"posterior VJP alone     : {t:.3f} ms")

    def solves_only(a, e):
        log_E = jnp.log(jnp.maximum(e, 1e-16))
        f, gbar = recursion._forward_adjoint_weights(la, log_E)
        x = recursion._chunked_affine_reverse(a, f, gbar, ct, P)
        return jnp.sum(x)

    t = slope(solves_only)
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
