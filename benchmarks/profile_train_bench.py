"""Profile-HMM MAP training-step benchmark (BASELINE.json config 4).

Measures a full jitted value_and_grad step of the learnMSA-style workload:
multiple profile-HMM models trained jointly with Dirichlet MAP priors —
Plan7 transitions with silent-state elimination, match/insert emissions —
on one TPU chip. Device time via the in-jit repetition slope (the axon
tunnel has ~33 ms fixed dispatch cost).

Run: python benchmarks/profile_train_bench.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from hmm_layer_tpu.layer import HMMLayer  # noqa: E402
from hmm_layer_tpu.models import ProfileEmissions, ProfileTransitions  # noqa: E402

LENGTHS = [60, 64, 68, 72, 76]  # 5 models, q up to 2*76+3 = 155
B, L = 64, 400


def main():
    layer = HMMLayer(
        ProfileTransitions(LENGTHS),
        ProfileEmissions(LENGTHS),
        use_prior=True,
        num_seqs=1000,
    )
    params = layer.init_params(jax.random.PRNGKey(0), input_dim=26)
    rng = np.random.default_rng(0)
    x = jax.nn.one_hot(
        jnp.asarray(rng.integers(0, 25, size=(1, B, L))), 26, dtype=jnp.float32
    )
    x = jnp.broadcast_to(x, (len(LENGTHS), B, L, 26))

    from hmm_layer_tpu.ops.recursion import set_dp_precision

    def measure():
        def rep(n):
            @jax.jit
            def run(p, xx):
                def body(k, acc):
                    v, g = jax.value_and_grad(
                        lambda pp: layer.loss(pp, xx * (1.0 + 1e-6 * k))
                    )(p)
                    return acc + v + jax.tree.reduce(
                        lambda a, b: a + jnp.sum(b), g, 0.0
                    )

                return lax.fori_loop(0, n, body, 0.0)

            return run

        K1, K2 = 2, 6
        r1, r2 = rep(K1), rep(K2)
        t0 = time.perf_counter()
        np.asarray(r1(params, x))
        print(f"compile: {time.perf_counter() - t0:.0f}s", file=sys.stderr)
        np.asarray(r2(params, x))
        ts = {K1: [], K2: []}
        for _ in range(3):
            for k, f in ((K1, r1), (K2, r2)):
                t0 = time.perf_counter()
                np.asarray(f(params, x))
                ts[k].append(time.perf_counter() - t0)
        return (min(ts[K2]) - min(ts[K1])) / (K2 - K1)

    # 'high' is the recommended (and align-CLI default) profile training
    # mode since the round-4 precision sweep; report both.
    per_mode = {}
    for mode in ("high", "highest"):
        set_dp_precision(mode)
        per_mode[mode] = measure()
        print(
            f"profile-HMM MAP train step (m={len(LENGTHS)}, q<=155, b={B}, "
            f"L={L}, {mode}): {per_mode[mode] * 1e3:.1f} ms/step -> "
            f"{B / per_mode[mode]:.0f} seqs/sec"
        )
    per = per_mode["high"]
    import json
    import os

    baseline = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "baseline_cpu_profile.json"
    )
    if os.path.exists(baseline):
        with open(baseline) as f:
            ref = json.load(f)
        print(
            f"vs torch-eager CPU baseline ({ref['step_s']:.1f} s/step, "
            f"{ref['threads']} thread(s)): {ref['step_s'] / per:.0f}x"
        )
    # Roofline context: fwd + analytic grad ~ 3 * m*b*L*q^2*2 FLOPs.
    flops = 3 * len(LENGTHS) * B * L * 155 * 155 * 2
    print(
        f"roofline: {flops / 1e9:.1f} GFLOP -> ~{flops / 20e12 * 1e3:.1f} ms "
        f"at 20 TFLOP/s f32; measured/roofline = {per / (flops / 20e12):.0f}x "
        "(scan-latency-bound: L sequential steps of small per-model matmuls)"
    )


if __name__ == "__main__":
    main()
