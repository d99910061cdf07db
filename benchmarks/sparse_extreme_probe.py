"""Extreme-scale sparse capability probe: q = 1 + 14k at k=1000.

The sparse engine's design point (ops/sparse.py docstring): a dense
(14001, 14001) transition matrix would be 784 MB/model and the axon
toolchain crashes on dense scatter-set builds far earlier (q~505). This
probes the largest BASELINE-config-5-style grammar on the real chip:
forward log-likelihood, Viterbi decode, and a MAP value_and_grad step
through the analytic edge-list adjoints.

Run: python benchmarks/sparse_extreme_probe.py [--k 1000] [--L 2000]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=1000)
    ap.add_argument("--L", type=int, default=2000)
    ap.add_argument("--b", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hmm_layer_tpu.models import GenePredMultiTransitions
    from hmm_layer_tpu.models.transition_utils import sparse_edge_softmax
    from hmm_layer_tpu.ops import sparse

    t0 = time.time()
    trans = GenePredMultiTransitions(k=args.k)
    q = trans.num_states
    params = trans.init_params(jax.random.PRNGKey(0))
    init_dist = trans.make_initial_distribution(params)
    indices = trans.indices
    print(
        f"q={q}, edges={indices.shape[0]}, L={args.L}, b={args.b} "
        f"(host build {time.time() - t0:.1f}s; dense A would be "
        f"{q * q * 4 / 1e9:.2f} GB)",
        flush=True,
    )

    rng = np.random.default_rng(0)
    E = jnp.asarray(
        rng.uniform(0.05, 1.0, (1, args.b, args.L, q)).astype(np.float32)
    )

    def timed(label, fn, *a):
        t0 = time.time()
        out = jax.tree.map(np.asarray, fn(*a))
        t1 = time.time()
        out2 = jax.tree.map(np.asarray, fn(*a))
        t2 = time.time()
        print(
            f"{label}: compile+run {t1 - t0:.1f}s, steady {t2 - t1:.2f}s",
            flush=True,
        )
        return out2

    def loglik(kern, e):
        probs = sparse_edge_softmax(indices, kern, q)[None]
        return sparse.sparse_log_likelihood(init_dist, indices, probs, e)

    ll = timed("loglik", jax.jit(loglik), params["transition_kernel"], E)
    assert np.all(np.isfinite(ll)), ll
    print(f"  loglik {float(ll[0, 0]):.1f} (finite)")

    def decode(kern, e):
        probs = sparse_edge_softmax(indices, kern, q)[None]
        return sparse.sparse_viterbi(init_dist, indices, probs, e)

    paths = timed("viterbi", jax.jit(decode), params["transition_kernel"], E)
    assert paths.min() >= 0 and paths.max() < q
    print(f"  decoded states span [{paths.min()}, {paths.max()}]")

    def map_loss(kern, e):
        probs = sparse_edge_softmax(indices, kern, q)[None]
        return -jnp.mean(
            sparse.sparse_log_likelihood(init_dist, indices, probs, e)
        )

    v, g = timed(
        "MAP value_and_grad",
        jax.jit(jax.value_and_grad(map_loss)),
        params["transition_kernel"],
        E,
    )
    assert np.isfinite(float(v)) and np.all(np.isfinite(np.asarray(g)))
    print(f"  loss {float(v):.1f}, grad norm {np.linalg.norm(g):.3e} (finite)")


if __name__ == "__main__":
    main()
