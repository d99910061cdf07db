"""DP-einsum precision sweep: error-vs-L model for HMM_DP_PRECISION.

VERDICT round-3 item 2: the round-3 experiment measured the `high`
(3-pass bf16x3) mode only at L=400; this sweep measures BOTH workloads at
L in {400, 1600, 6400} so the error-vs-L growth is a fitted model, not a
hand-wave, and the default can be decided on evidence.

Per (workload, L, mode) it records:
* profile MAP step (config 4 shape, m=5 q<=155): loss value, per-sequence
  logliks, gradient pytree norm, and the jitted value_and_grad step time
  (in-jit repetition slope);
* gene-pred posterior-CE step (15 states): CE loss value, posterior
  log-probs, and step time.

`HMM_DP_PRECISION` is read at import, so the driver mode re-execs this
script once per mode and diffs the dumps.

Run: python benchmarks/precision_sweep.py            # driver (both modes)
     python benchmarks/precision_sweep.py --mode high --out f.npz  # one mode
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LS = (400, 1600, 6400)
PROFILE_LENGTHS = [60, 64, 68, 72, 76]
PROFILE_B = 64
CE_B = 8


def run_mode(out_path):
    import jax
    import jax.numpy as jnp
    from jax import lax
    import optax  # noqa: F401

    from hmm_layer_tpu.layer import HMMLayer
    from hmm_layer_tpu.models import (
        GenePredEmissions,
        GenePredTransitions,
        ProfileEmissions,
        ProfileTransitions,
    )
    from hmm_layer_tpu.models.initializers import make_15_class_emission_kernel

    def slope_time(fn, args, k1=1, k2=3, rounds=3):
        """In-jit repetition slope of ``fn(k, *args)`` summed over k."""

        def rep(n):
            @jax.jit
            def run(*a):
                def body(k, acc):
                    return acc + fn(k, *a)

                return lax.fori_loop(0, n, body, 0.0)

            return run

        r1, r2 = rep(k1), rep(k2)
        np.asarray(r1(*args))
        np.asarray(r2(*args))
        slopes = []
        for _ in range(rounds):
            t0 = time.perf_counter()
            np.asarray(r1(*args))
            t1 = time.perf_counter()
            np.asarray(r2(*args))
            t2 = time.perf_counter()
            slopes.append(((t2 - t1) - (t1 - t0)) / (k2 - k1))
        return float(np.median(slopes))

    out = {}
    for L in LS:
        # ---- profile MAP step (config-4 shape at this L) -----------------
        layer = HMMLayer(
            ProfileTransitions(PROFILE_LENGTHS),
            ProfileEmissions(PROFILE_LENGTHS),
            use_prior=True,
            num_seqs=1000,
        )
        params = layer.init_params(jax.random.PRNGKey(0), input_dim=26)
        rng = np.random.default_rng(0)
        x = jax.nn.one_hot(
            jnp.asarray(rng.integers(0, 25, size=(1, PROFILE_B, L))),
            26,
            dtype=jnp.float32,
        )
        x = jnp.broadcast_to(x, (len(PROFILE_LENGTHS), PROFILE_B, L, 26))

        ll = np.asarray(jax.jit(layer.log_likelihood)(params, x))
        loss, grads = jax.jit(jax.value_and_grad(layer.loss))(params, x)
        gnorm = float(
            jnp.sqrt(
                sum(jnp.sum(g**2) for g in jax.tree.leaves(grads))
            )
        )
        step_ms = slope_time(
            lambda k, p, xx: jax.value_and_grad(
                lambda pp: layer.loss(pp, xx * (1.0 + 1e-6 * k))
            )(p)[0],
            (params, x),
        ) * 1e3
        out[f"profile_ll_{L}"] = ll
        out[f"profile_loss_{L}"] = np.asarray(loss)
        out[f"profile_gnorm_{L}"] = np.asarray(gnorm)
        out[f"profile_ms_{L}"] = np.asarray(step_ms)
        print(
            f"[{os.environ.get('HMM_DP_PRECISION', 'highest')}] profile "
            f"L={L}: loss {float(loss):.4f}, step {step_ms:.2f} ms",
            file=sys.stderr,
            flush=True,
        )

        # ---- gene-pred posterior-CE step --------------------------------
        glayer = HMMLayer(
            GenePredTransitions(),
            GenePredEmissions(
                start_codons=[("ATG", 1.0)],
                stop_codons=[("TAG", 0.34), ("TAA", 0.33), ("TGA", 0.33)],
                intron_begin_pattern=[
                    ("NGT", 0.99), ("NGC", 0.005), ("NAT", 0.005)
                ],
                intron_end_pattern=[("AGN", 0.99), ("ACN", 0.01)],
                init=make_15_class_emission_kernel(),
            ),
            parallel_factor="auto",
        )
        gparams = glayer.init_params(jax.random.PRNGKey(1), input_dim=15)
        cls = rng.dirichlet(np.ones(15), size=(1, CE_B, L)).astype(np.float32)
        nucs = np.eye(5, dtype=np.float32)[
            rng.integers(0, 4, size=(1, CE_B, L))
        ]
        gx = jnp.asarray(np.concatenate([cls, nucs], axis=-1))
        glabels = jnp.asarray(rng.integers(0, 15, size=(1, CE_B, L)))

        lg = np.asarray(
            jax.jit(glayer.state_posterior_log_probs)(gparams, gx)
        )
        ce = np.asarray(
            jax.jit(
                lambda p: glayer.posterior_cross_entropy(p, gx, glabels)
            )(gparams)
        )
        ce_ms = slope_time(
            lambda k, p: jax.value_and_grad(
                lambda pp: glayer.posterior_cross_entropy(
                    pp, gx * (1.0 + 1e-6 * k), glabels
                )
            )(p)[0],
            (gparams,),
        ) * 1e3
        out[f"ce_lg_{L}"] = lg
        out[f"ce_loss_{L}"] = ce
        out[f"ce_ms_{L}"] = np.asarray(ce_ms)
        print(
            f"[{os.environ.get('HMM_DP_PRECISION', 'highest')}] gene-pred "
            f"CE L={L}: loss {float(ce):.5f}, step {ce_ms:.2f} ms",
            file=sys.stderr,
            flush=True,
        )
    np.savez(out_path, **out)


def drive():
    dumps = {}
    for mode in ("highest", "high"):
        path = f"/tmp/prec_sweep_{mode}.npz"
        env = dict(os.environ, HMM_DP_PRECISION=mode)
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--mode-run",
             "--out", path],
            env=env,
            check=True,
        )
        dumps[mode] = np.load(path)
    hi, lo = dumps["highest"], dumps["high"]
    report = {}
    for L in LS:
        ll_err = np.abs(hi[f"profile_ll_{L}"] - lo[f"profile_ll_{L}"])
        lg_err = np.abs(hi[f"ce_lg_{L}"] - lo[f"ce_lg_{L}"])
        report[L] = {
            "profile_ll_err_max": float(ll_err.max()),
            "profile_ll_err_mean": float(ll_err.mean()),
            "profile_ll_scale": float(np.abs(hi[f"profile_ll_{L}"]).mean()),
            "profile_loss_err": float(
                np.abs(hi[f"profile_loss_{L}"] - lo[f"profile_loss_{L}"])
            ),
            "profile_gnorm_rel_err": float(
                np.abs(hi[f"profile_gnorm_{L}"] - lo[f"profile_gnorm_{L}"])
                / hi[f"profile_gnorm_{L}"]
            ),
            "profile_ms_highest": float(hi[f"profile_ms_{L}"]),
            "profile_ms_high": float(lo[f"profile_ms_{L}"]),
            "ce_loss_err": float(
                np.abs(hi[f"ce_loss_{L}"] - lo[f"ce_loss_{L}"])
            ),
            "ce_lg_err_max": float(lg_err.max()),
            "ce_lg_err_mean": float(lg_err.mean()),
            "ce_ms_highest": float(hi[f"ce_ms_{L}"]),
            "ce_ms_high": float(lo[f"ce_ms_{L}"]),
        }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode-run", action="store_true")
    ap.add_argument("--out", default="/tmp/prec_sweep.npz")
    args = ap.parse_args()
    if args.mode_run:
        run_mode(args.out)
    else:
        drive()
