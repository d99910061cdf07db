"""MXU-in-Pallas toolchain watch (VERDICT round-3 item 9).

The staged MXU summary-scan kernel (``ops/pallas_mxu.py``, behind
``HMM_PALLAS_MXU=1``) is blocked by an axon toolchain bug: ANY
``jnp.dot``/``lax.dot_general`` inside a ``pallas_call`` hangs the
compiler (measured round 2: a minimal 128x128 matmul never returns,
400 s timeout). Run this each round; the day it compiles, benchmark the
MXU summary scan against the XLA chunked path (expected ~2x on the
affine-adjoint q^2 contraction, CLAUDE.md).

Exits 0 and prints one status line either way; the compile attempt runs
in a SUBPROCESS under a timeout so a hang cannot wedge the caller
(timeout-killing mid-compile orphans the compile on this host — the
subprocess is sacrificed, the parent reports "still hangs").

Run: python benchmarks/mxu_watch.py [--timeout 400]
"""

import argparse
import os
import subprocess
import sys
import time

CHILD = r"""
import numpy as np
import jax, jax.numpy as jnp
from hmm_layer_tpu.ops import pallas_mxu

q, P, b, c = 33, 4, 4, 6  # E_S: (c timesteps, R = b*P elements, q)
rng = np.random.default_rng(0)
A = jnp.asarray(rng.dirichlet(np.ones(q), size=q).astype(np.float32))
E_S = jnp.asarray(rng.uniform(0.05, 1.0, (c, b * P, q)).astype(np.float32))
ref = pallas_mxu.sum_chunk_summaries_mxu(A, E_S, P, interpret=True)
out = pallas_mxu.sum_chunk_summaries_mxu(A, E_S, P)
np.testing.assert_allclose(
    np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
)
print("MXU_OK")
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=float, default=400.0)
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, "-c", CHILD],
            cwd=repo,
            timeout=args.timeout,
            capture_output=True,
            text=True,
        )
        ok = proc.returncode == 0 and "MXU_OK" in proc.stdout
        if ok:
            print(
                f"MXU-in-Pallas COMPILES ({time.time() - t0:.0f}s). "
                "NOTE: the toolchain fix landed 2026-08-20 and the staged "
                "summary kernel was benchmarked the same day — MEASURED "
                "NEGATIVE at every supported q (0.11-0.61x the XLA "
                "chunked path; BASELINE.md round 5). The eb-element grid "
                "serializes ~32k small matmul dispatches where XLA "
                "batches each timestep into one einsum, and the roofline "
                "of an ideal all-rows-per-step formulation only TIES "
                "XLA. Don't re-enable without that redesign."
            )
        else:
            print(
                f"MXU-in-Pallas FAILED (rc={proc.returncode}, "
                f"{time.time() - t0:.0f}s): "
                + (proc.stderr.strip().splitlines() or ["no stderr"])[-1]
            )
    except subprocess.TimeoutExpired:
        print(
            f"MXU-in-Pallas still HANGS the axon compiler "
            f"(no result in {args.timeout:.0f}s; child killed)"
        )


if __name__ == "__main__":
    main()
