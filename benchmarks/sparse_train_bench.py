"""Config-5 sparse training step: q=505 multi-copy gene-pred at L=10k.

VERDICT round-3 item 4: the sparse engine exists FOR BASELINE config 5
(1+14k-state models past the dense wall — on the axon toolchain the dense
(505, 505) build crashes the TPU worker), but training at that scale was
unproven. This measures full jitted value_and_grad steps THROUGH the
analytic edge-list adjoints:

* MAP objective: -mean(sparse_log_likelihood), grads wrt the transition
  edge logits (chained through sparse_edge_softmax) and the emissions.
* Posterior-CE objective: label cross-entropy on sparse_posterior output,
  same gradient surface (exercises the gamma-centered sparse adjoint).

Device time via the in-jit repetition slope (axon dispatch ~33 ms fixed).

Run: python benchmarks/sparse_train_bench.py [--k 36] [--L 10000] [--b 8]
"""

import argparse
import sys
import time

import numpy as np

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=36)  # q = 1 + 14k = 505
    ap.add_argument("--L", type=int, default=10_000)
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--microbatch", type=int, default=None,
                    help="gradient accumulation chunk (unlocks CE at "
                         "b=64, which OOMs whole-batch)")
    ap.add_argument("--backward-block", type=int, default=None,
                    help="time-blocked recompute backward for the CE "
                         "posterior adjoint (O(L/c) checkpoints instead "
                         "of O(L*q) residuals; whole-batch b=64 route)")
    ap.add_argument("--only", choices=["map", "ce"], default=None,
                    help="run a single objective")
    ap.add_argument("--engine", choices=["sparse", "dense"],
                    default="sparse",
                    help="dense = the scatter-free-build dense engine "
                         "(round 5: 3.5-5.3x faster at q=505; sparse "
                         "remains the route past the O(q^2) A wall)")
    args = ap.parse_args()
    if args.engine == "dense" and args.backward_block:
        ap.error("--backward-block applies to the sparse engine only "
                 "(the dense posterior VJP has no blocked mode)")

    import jax
    import jax.numpy as jnp
    from jax import lax

    from hmm_layer_tpu.models import GenePredMultiTransitions
    from hmm_layer_tpu.models.transition_utils import sparse_edge_softmax
    from hmm_layer_tpu.ops import sparse

    trans = GenePredMultiTransitions(k=args.k)
    q = trans.num_states
    params = trans.init_params(jax.random.PRNGKey(0))
    kernel = params["transition_kernel"]
    init_dist = trans.make_initial_distribution(params)
    indices = trans.indices
    print(
        f"q={q}, edges={indices.shape[0]}, L={args.L}, b={args.b}",
        file=sys.stderr,
        flush=True,
    )

    rng = np.random.default_rng(0)
    E = jnp.asarray(
        rng.uniform(0.05, 1.0, (1, args.b, args.L, q)).astype(np.float32)
    )
    labels = jnp.asarray(rng.integers(0, q, size=(1, args.b, args.L)))

    if args.engine == "dense":
        from hmm_layer_tpu.models.transition_utils import (
            dense_from_edge_probs,
        )
        from hmm_layer_tpu.ops import recursion

        def make_A(kern):
            return dense_from_edge_probs(
                indices, sparse_edge_softmax(indices, kern, q), q
            )[None]

        def map_loss(kern, e, lab=None):
            return -jnp.mean(
                recursion.log_likelihood(init_dist, make_A(kern), e)
            )

        def ce_loss(kern, e, lab=None):
            lg, _ = recursion.posterior(init_dist, make_A(kern), e)
            lab = labels if lab is None else lab
            return -jnp.mean(
                jnp.take_along_axis(lg, lab[..., None], axis=-1)
            )
    else:
        def map_loss(kern, e, lab=None):
            probs = sparse_edge_softmax(indices, kern, q)[None]
            return -jnp.mean(sparse.sparse_log_likelihood(init_dist, indices, probs, e))

        def ce_loss(kern, e, lab=None):
            probs = sparse_edge_softmax(indices, kern, q)[None]
            lg, _ = sparse.sparse_posterior(
                init_dist, indices, probs, e,
                backward_block=args.backward_block,
            )
            lab = labels if lab is None else lab
            return -jnp.mean(
                jnp.take_along_axis(lg, lab[..., None], axis=-1)
            )

    def slope(loss_fn, label):
        if args.microbatch:
            from hmm_layer_tpu.training import microbatched_value_and_grad

            def vag(kern, e):
                # Gradient accumulation wrt the transition kernel (the
                # trainable params in real use; E grads flow through the
                # emitter inside loss_fn there). Labels ride the batch
                # pytree so they micro-split alongside the emissions.
                v, gk = microbatched_value_and_grad(
                    lambda kk, part: loss_fn(kk, part["e"], part["lab"]),
                    kern, {"e": e, "lab": labels}, args.microbatch,
                )
                return v, gk
        else:
            def vag(kern, e):
                v, (gk, ge) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
                    kern, e
                )
                return v, gk + jnp.sum(ge[:, 0, 0])

        def rep(n):
            @jax.jit
            def run(kern, e):
                def body(i, acc):
                    v, gk = vag(kern, e * (1.0 + 1e-6 * i))
                    return acc + v + jnp.sum(gk)

                return lax.fori_loop(0, n, body, 0.0)

            return run

        k1, k2 = 1, 3
        r1, r2 = rep(k1), rep(k2)
        t0 = time.perf_counter()
        v1 = np.asarray(r1(kernel, E))
        print(
            f"{label}: compile {time.perf_counter() - t0:.0f}s, "
            f"value finite: {np.isfinite(v1)}",
            file=sys.stderr,
            flush=True,
        )
        np.asarray(r2(kernel, E))
        slopes = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(r1(kernel, E))
            t1 = time.perf_counter()
            np.asarray(r2(kernel, E))
            t2 = time.perf_counter()
            slopes.append(((t2 - t1) - (t1 - t0)) / (k2 - k1))
        med = float(np.median(slopes))
        print(
            f"{label}: {med * 1e3:.1f} ms/step "
            f"[{min(slopes) * 1e3:.1f}, {max(slopes) * 1e3:.1f}] "
            f"-> {args.b / med:.1f} seqs/sec",
            flush=True,
        )
        return med

    # Gradient sanity before timing: finite, nonzero.
    v, (gk, ge) = jax.jit(
        jax.value_and_grad(map_loss, argnums=(0, 1))
    )(kernel, E)
    gk, ge0 = np.asarray(gk), np.asarray(ge[0, 0, :2])
    assert np.isfinite(float(v)) and np.all(np.isfinite(gk)) and np.any(gk != 0)
    print(
        f"MAP loss {float(v):.2f}; grad(kernel) norm "
        f"{np.linalg.norm(gk):.3e}; grads finite",
        file=sys.stderr,
        flush=True,
    )

    if args.only in (None, "map"):
        slope(map_loss, f"MAP train step ({args.engine} analytic VJP)")
    if args.only in (None, "ce"):
        tag = (
            f" blocked bwd c={args.backward_block}"
            if args.backward_block
            else ""
        )
        slope(ce_loss, f"posterior-CE train step ({args.engine} analytic VJP{tag})")


if __name__ == "__main__":
    main()
