"""Headline benchmark: gene-pred HMM END-TO-END posterior throughput on TPU.

Workload (BASELINE.json configs 2/3 + north-star fused emission scoring):
the full pipeline from raw inputs — class probabilities plus one-hot
nucleotides — through 15-state gene-pred emission scoring (3-mer encoding +
codon-pattern contraction, ``gene_pred_hmm_emitter.py:231-277`` +
``kmer.py:3-47``) into the posterior decode (forward+backward) over
(batch=32, L=9999) — the same scope as the reference-equivalent CPU
baseline in benchmarks/torch_cpu_baseline.py (eager per-timestep loop).
The decode-only number (precomputed emissions, round-1 headline) is still
measured and reported on stderr with the emission share quantified.

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


def backend_alive(timeout_s: float = 600.0) -> bool:
    """Probe device init in a subprocess so a hung axon tunnel can't hang us.

    The axon backend occasionally goes down in a way where ``jax.devices()``
    blocks forever (observed 2026-08-17). Device enumeration involves no
    compilation, so killing the probe is safe; a generous timeout covers a
    slow-but-alive tunnel.
    """
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            capture_output=True,
        )
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    if not backend_alive():
        log("FATAL: device backend unreachable (device init hung/failed)")
        print(
            json.dumps(
                {
                    "metric": "gene-pred 15-state END-TO-END posterior "
                    "throughput (BACKEND UNREACHABLE - no measurement)",
                    "value": None,
                    "unit": "seqs/sec",
                    "vs_baseline": None,
                }
            )
        )
        return
    import jax
    import jax.numpy as jnp
    from jax import lax

    from hmm_layer_tpu.ops import recursion
    from hmm_layer_tpu.models.gene_pred_emissions import GenePredEmissions

    Q, B, L = 15, 32, 9999
    NUM_CLASSES = 15
    rng = np.random.default_rng(0)
    init = jnp.asarray(rng.dirichlet(np.ones(Q)).astype(np.float32))[None]
    A = jnp.asarray(rng.dirichlet(np.ones(Q), size=Q).astype(np.float32))[None]
    E = jnp.asarray(rng.uniform(0.05, 1.0, size=(1, B, L, Q)).astype(np.float32))

    # End-to-end inputs: class probabilities + one-hot ACGTN nucleotides.
    emitter = GenePredEmissions(
        start_codons=[("ATG", 1.0)],
        stop_codons=[("TAG", 0.34), ("TAA", 0.33), ("TGA", 0.33)],
        intron_begin_pattern=[("NGT", 0.99), ("NGC", 0.005), ("NAT", 0.005)],
        intron_end_pattern=[("AGN", 0.99), ("ACN", 0.01)],
    )
    eparams = emitter.init_params(jax.random.PRNGKey(0), NUM_CLASSES)
    class_inputs = rng.dirichlet(
        np.ones(NUM_CLASSES), size=(1, B, L)
    ).astype(np.float32)
    nucs = np.eye(5, dtype=np.float32)[rng.integers(0, 4, size=(1, B, L))]
    X = jnp.asarray(np.concatenate([class_inputs, nucs], axis=-1))
    np.asarray(E[0, 0, 0, :1])  # materialize on device

    log(f"devices: {jax.devices()}")

    def clamp(e):
        return jnp.maximum(e, 1e-16)

    def repeated(pf, n, e2e):
        @jax.jit
        def run(init, A, E, X):
            def body(k, acc):
                if e2e:
                    x_k = X * (1.0 + 1e-6 * k)  # defeat CSE across iterations
                    e_k = clamp(emitter.emissions(eparams, x_k))
                else:
                    e_k = E * (1.0 + 1e-6 * k)
                lg, ll = recursion.posterior(init, A, e_k, pf)
                return acc + jnp.sum(lg[..., 0, :]) + jnp.sum(ll)
            return lax.fori_loop(0, n, body, 0.0)
        return run

    K1, K2 = 3, 19

    def measure(pf, e2e, rounds=7):
        """Median + spread of ``rounds`` independent slope estimates.

        Each round times one K1-rep and one K2-rep dispatch and takes the
        difference — fixed dispatch/readback overhead cancels per round, so
        the per-round slopes are i.i.d. estimates of device time per batch
        and their spread makes drift vs noise distinguishable
        (VERDICT round 3 item 3: a single min-min slope was unfalsifiable).
        Returns (median, (min, max), compile_s).
        """
        run1, run2 = repeated(pf, K1, e2e), repeated(pf, K2, e2e)
        t0 = time.perf_counter()
        np.asarray(run1(init, A, E, X))  # compile + run
        compile_s = time.perf_counter() - t0
        np.asarray(run2(init, A, E, X))
        slopes = []
        for _ in range(rounds):
            t0 = time.perf_counter()
            np.asarray(run1(init, A, E, X))
            t1 = time.perf_counter()
            np.asarray(run2(init, A, E, X))
            t2 = time.perf_counter()
            slopes.append(((t2 - t1) - (t1 - t0)) / (K2 - K1))
        slopes.sort()
        med = slopes[len(slopes) // 2]
        return med, (slopes[0], slopes[-1]), compile_s

    # The headline END-TO-END row runs at the dispatch table's own choice
    # (parallel_factor="auto"), proving recommended_parallel_factor end to
    # end; the decode sweep stays as a diagnostic cross-check.
    pf_auto = recursion.recommended_parallel_factor(L, Q, m=1, for_viterbi=False)
    best = best_decode = None
    for pf in sorted({1, 11, 33, pf_auto}):
        per_batch, (lo, hi), compile_s = measure(pf, e2e=False)
        sps = B / per_batch
        log(
            f"decode-only  pf={pf}: compile {compile_s:.1f}s, "
            f"{per_batch*1e3:.2f} ms/batch median "
            f"[{lo*1e3:.2f}, {hi*1e3:.2f}] (device), {sps:.1f} seqs/sec"
        )
        if best_decode is None or sps > best_decode[1]:
            best_decode = (pf, sps, per_batch, lo, hi)
    for pf in (pf_auto,):
        per_batch, (lo, hi), compile_s = measure(pf, e2e=True)
        sps = B / per_batch
        emission_ms = (per_batch - best_decode[2]) * 1e3
        log(
            f"END-TO-END   pf=auto({pf}): compile {compile_s:.1f}s, "
            f"{per_batch*1e3:.2f} ms/batch median "
            f"[{lo*1e3:.2f}, {hi*1e3:.2f}] (device), {sps:.1f} seqs/sec "
            f"(emission share ~{emission_ms:.2f} ms)"
        )
        if best is None or sps > best[1]:
            best = (pf, sps, per_batch, lo, hi)

    bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "benchmarks")
    # The headline vs_baseline must pair the e2e VALUE with the e2e
    # baseline only — falling back to the decode-only ratio would silently
    # compare mismatched measurements.
    vs_baseline = None
    for name, sps, is_headline in (
        ("baseline_cpu.json", best_decode[1], False),
        ("baseline_cpu_e2e.json", best[1], True),
    ):
        path = os.path.join(bench_dir, name)
        if os.path.exists(path):
            with open(path) as f:
                baseline = json.load(f)
            ratio = sps / baseline["seqs_per_sec"]
            log(
                f"{name}: {baseline['seqs_per_sec']:.1f} seqs/sec -> "
                f"speedup {ratio:.1f}x"
            )
            if is_headline:
                vs_baseline = ratio

    print(
        json.dumps(
            {
                "metric": (
                    "gene-pred 15-state END-TO-END posterior throughput "
                    "(class probs + nucleotides -> k-mer/codon emissions -> "
                    f"fwd+bwd decode, b={B}, L={L}, "
                    f"parallel_factor=auto({best[0]}), device time; "
                    "value from the median of 7 repetition-slope estimates)"
                ),
                "value": round(best[1], 2),
                "unit": "seqs/sec",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
                "e2e_ms_median": round(best[2] * 1e3, 3),
                "e2e_ms_range": [round(best[3] * 1e3, 3), round(best[4] * 1e3, 3)],
                "decode_ms_median": round(best_decode[2] * 1e3, 3),
                "decode_ms_range": [
                    round(best_decode[3] * 1e3, 3),
                    round(best_decode[4] * 1e3, 3),
                ],
            }
        )
    )


if __name__ == "__main__":
    main()
