"""DP-einsum precision sweep: error-vs-L model for HMM_DP_PRECISION.

VERDICT round-3 item 2: the round-3 experiment measured the `high`
(3-pass bf16x3) mode only at L=400; this sweep measures BOTH workloads at
L in {400, 1600, 6400} so the error-vs-L growth is a fitted model, not a
hand-wave, and the default can be decided on evidence.

Per (workload, L, mode) it records:
* profile MAP step (config 4 shape, m=5 q<=155): loss value, per-sequence
  logliks, gradient pytree norm (ONE merged jit per L);
* gene-pred posterior-CE step (15 states): CE loss value, posterior
  log-probs, gradient norm (ONE merged jit per L);
* step time at L=400 only (config-4 re-baseline) via an in-jit
  repetition slope with a RUNTIME rep count (one compile serves both
  rep counts — cold compiles cost 1-5 min on this 1-core host).

Batch shrinks as L grows (b*L constant) so the L=6400 points neither
blow HBM nor change the per-sequence error statistic being measured.

`HMM_DP_PRECISION` is read at import (ops/recursion.py:74), so the
driver mode re-execs this script once per mode and diffs the dumps.

Run: python benchmarks/precision_sweep.py            # driver (both modes)
     python benchmarks/precision_sweep.py --mode-run --out f.npz  # one mode
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

if os.environ.get("HMM_SWEEP_SMOKE"):
    LS = (32, 64)
    PROFILE_LENGTHS = [5, 6]
    PROFILE_B = {32: 2, 64: 2}
    CE_B = {32: 2, 64: 2}
    TIMED_L = 32
else:
    LS = (400, 1600, 6400)
    PROFILE_LENGTHS = [60, 64, 68, 72, 76]
    PROFILE_B = {400: 64, 1600: 16, 6400: 4}
    CE_B = {400: 8, 1600: 8, 6400: 8}
    TIMED_L = 400


def run_mode(out_path):
    import jax

    if os.environ.get("HMM_SWEEP_SMOKE"):
        # JAX_PLATFORMS env alone does not override the axon autoregistration
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax

    from hmm_layer_tpu.layer import HMMLayer
    from hmm_layer_tpu.models import (
        GenePredEmissions,
        GenePredTransitions,
        ProfileEmissions,
        ProfileTransitions,
    )
    from hmm_layer_tpu.models.initializers import make_15_class_emission_kernel

    mode = os.environ.get("HMM_DP_PRECISION", "highest")
    # Timing-only re-run: skip the (expensive) merged error jits and the
    # non-timed Ls; used to re-measure step times after the grad-DCE fix
    # without redoing the error dumps.
    timing_only = bool(os.environ.get("HMM_SWEEP_TIMING_ONLY"))
    ls = (TIMED_L,) if timing_only else LS

    def slope_time(step_scalar, args, k1=1, k2=3, rounds=3):
        """In-jit repetition slope of ``step_scalar(k, *args)``.

        The rep count is a RUNTIME argument of one jitted fori_loop, so
        both rep counts share a single compile.
        """

        @jax.jit
        def run(n, *a):
            def body(k, acc):
                return acc + step_scalar(k, *a)

            return lax.fori_loop(0, n, body, jnp.float32(0.0))

        np.asarray(run(k1, *args))
        np.asarray(run(k2, *args))
        slopes = []
        for _ in range(rounds):
            t0 = time.perf_counter()
            np.asarray(run(k1, *args))
            t1 = time.perf_counter()
            np.asarray(run(k2, *args))
            t2 = time.perf_counter()
            slopes.append(((t2 - t1) - (t1 - t0)) / (k2 - k1))
        return float(np.median(slopes))

    out = {}
    for L in ls:
        # ---- profile MAP step (config-4 shape at this L) -----------------
        b = PROFILE_B[L]
        layer = HMMLayer(
            ProfileTransitions(PROFILE_LENGTHS),
            ProfileEmissions(PROFILE_LENGTHS),
            use_prior=True,
            num_seqs=1000,
        )
        params = layer.init_params(jax.random.PRNGKey(0), input_dim=26)
        rng = np.random.default_rng(0)
        x = jax.nn.one_hot(
            jnp.asarray(rng.integers(0, 25, size=(1, b, L))),
            26,
            dtype=jnp.float32,
        )
        x = jnp.broadcast_to(x, (len(PROFILE_LENGTHS), b, L, 26))

        if not timing_only:
            @jax.jit
            def profile_stats(p, xx):
                def f(pp):
                    return layer.loss(pp, xx), layer.log_likelihood(pp, xx)

                (loss, ll), grads = jax.value_and_grad(f, has_aux=True)(p)
                gnorm = jnp.sqrt(
                    sum(jnp.sum(g**2) for g in jax.tree.leaves(grads))
                )
                return ll, loss, gnorm

            t0 = time.perf_counter()
            ll, loss, gnorm = jax.tree.map(
                np.asarray, profile_stats(params, x)
            )
            print(
                f"[{mode}] profile L={L} b={b}: loss {float(loss):.4f} "
                f"(compile+run {time.perf_counter() - t0:.0f}s)",
                file=sys.stderr,
                flush=True,
            )
            out[f"profile_ll_{L}"] = ll
            out[f"profile_loss_{L}"] = loss
            out[f"profile_gnorm_{L}"] = gnorm

        if L == TIMED_L:
            # Accumulate the grad leaves too — discarding them lets XLA
            # dead-code-eliminate the whole backward pass (measured: the
            # "step" collapses to the 1.4 ms forward).
            def profile_step(k, p, xx):
                v, g = jax.value_and_grad(
                    lambda pp: layer.loss(pp, xx * (1.0 + 1e-6 * k))
                )(p)
                return v + jax.tree.reduce(
                    lambda a, b_: a + jnp.sum(b_), g, jnp.float32(0.0)
                )

            step_ms = slope_time(profile_step, (params, x)) * 1e3
            out[f"profile_ms_{L}"] = np.asarray(step_ms)
            print(
                f"[{mode}] profile L={L}: step {step_ms:.2f} ms",
                file=sys.stderr,
                flush=True,
            )

        # ---- gene-pred posterior-CE step --------------------------------
        cb = CE_B[L]
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
        cls = rng.dirichlet(np.ones(15), size=(1, cb, L)).astype(np.float32)
        nucs = np.eye(5, dtype=np.float32)[
            rng.integers(0, 4, size=(1, cb, L))
        ]
        gx = jnp.asarray(np.concatenate([cls, nucs], axis=-1))
        glabels = jnp.asarray(rng.integers(0, 15, size=(1, cb, L)))

        if not timing_only:
            @jax.jit
            def ce_stats(p):
                def f(pp):
                    ce = glayer.posterior_cross_entropy(pp, gx, glabels)
                    lg = glayer.state_posterior_log_probs(pp, gx)
                    return ce, lg

                (ce, lg), grads = jax.value_and_grad(f, has_aux=True)(p)
                gnorm = jnp.sqrt(
                    sum(jnp.sum(g**2) for g in jax.tree.leaves(grads))
                )
                return lg, ce, gnorm

            t0 = time.perf_counter()
            lg, ce, ggnorm = jax.tree.map(np.asarray, ce_stats(gparams))
            print(
                f"[{mode}] gene-pred CE L={L} b={cb}: loss {float(ce):.5f} "
                f"(compile+run {time.perf_counter() - t0:.0f}s)",
                file=sys.stderr,
                flush=True,
            )
            out[f"ce_lg_{L}"] = lg
            out[f"ce_loss_{L}"] = ce
            out[f"ce_gnorm_{L}"] = ggnorm

        if L == TIMED_L:
            def ce_step(k, p):
                v, g = jax.value_and_grad(
                    lambda pp: glayer.posterior_cross_entropy(
                        pp, gx * (1.0 + 1e-6 * k), glabels
                    )
                )(p)
                return v + jax.tree.reduce(
                    lambda a, b_: a + jnp.sum(b_), g, jnp.float32(0.0)
                )

            ce_ms = slope_time(ce_step, (gparams,)) * 1e3
            out[f"ce_ms_{L}"] = np.asarray(ce_ms)
            print(
                f"[{mode}] gene-pred CE L={L}: step {ce_ms:.2f} ms",
                file=sys.stderr,
                flush=True,
            )
        np.savez(out_path, **out)  # checkpoint after every L
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
        entry = {
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
            "ce_loss_err": float(
                np.abs(hi[f"ce_loss_{L}"] - lo[f"ce_loss_{L}"])
            ),
            "ce_lg_err_max": float(lg_err.max()),
            "ce_lg_err_mean": float(lg_err.mean()),
            "ce_gnorm_rel_err": float(
                np.abs(hi[f"ce_gnorm_{L}"] - lo[f"ce_gnorm_{L}"])
                / hi[f"ce_gnorm_{L}"]
            ),
        }
        for key in ("profile_ms", "ce_ms"):
            if f"{key}_{L}" in hi:
                entry[f"{key}_highest"] = float(hi[f"{key}_{L}"])
                entry[f"{key}_high"] = float(lo[f"{key}_{L}"])
        report[L] = entry
    print(json.dumps(report, indent=2))
    with open("/tmp/prec_sweep_report.json", "w") as f:
        json.dump(report, f, indent=2)


def drive_timing():
    """Timing-only driver: both modes, step times at TIMED_L, no errors."""
    report = {}
    for mode in ("highest", "high"):
        path = f"/tmp/prec_timing_{mode}.npz"
        env = dict(
            os.environ, HMM_DP_PRECISION=mode, HMM_SWEEP_TIMING_ONLY="1"
        )
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--mode-run",
             "--out", path],
            env=env,
            check=True,
        )
        d = np.load(path)
        report[mode] = {
            "profile_ms": float(d[f"profile_ms_{TIMED_L}"]),
            "ce_ms": float(d[f"ce_ms_{TIMED_L}"]),
        }
    print(json.dumps(report, indent=2))
    with open("/tmp/prec_timing_report.json", "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode-run", action="store_true")
    ap.add_argument("--timing", action="store_true")
    ap.add_argument("--out", default="/tmp/prec_sweep.npz")
    args = ap.parse_args()
    if args.mode_run:
        run_mode(args.out)
    elif args.timing:
        drive_timing()
    else:
        drive()
