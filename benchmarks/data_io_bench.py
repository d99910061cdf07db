"""Host-side data-pipeline benchmark: native C++ FASTA path vs pure Python.

Generates a synthetic multi-record DNA FASTA (default ~64 MB — a small
genome), then times, single-threaded:

* parse           — file -> (name, sequence str) records
                    (``data._read_fasta_py`` vs the native scanner)
* parse+encode    — file -> (L, 5) float32 one-hot channels
                    (Python read + ``encode_dna`` vs the fused
                    ``read_fasta_encoded`` C++ pass)

Prints one JSON line per row plus a final summary. Pure host CPU work —
no JAX, no device.

Usage: python benchmarks/data_io_bench.py [--mb 64] [--reps 3]
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hmm_layer_tpu import data  # noqa: E402
from hmm_layer_tpu import native  # noqa: E402


def make_fasta(path, total_mb: float, seed: int = 0) -> int:
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGTacgtN", np.uint8)
    probs = np.array([0.2375] * 4 + [0.0125] * 4 + [0.05])
    probs = probs / probs.sum()
    total = int(total_mb * 2**20)
    written = 0
    rec = 0
    with open(path, "wb") as fh:
        while written < total:
            L = int(rng.integers(200_000, 1_000_000))
            seq = rng.choice(bases, size=L, p=probs)
            fh.write(b">contig%d synthetic\n" % rec)
            # 80-column wrapping, the common FASTA layout.
            for i in range(0, L, 80):
                fh.write(seq[i : i + 80].tobytes())
                fh.write(b"\n")
            written += L
            rec += 1
    return rec


def timeit(fn, reps):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=64.0)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    if not native.available():
        print(json.dumps({"error": "native toolchain unavailable"}))
        return 1

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "synthetic.fa")
        nrec = make_fasta(path, args.mb)
        size_mb = os.path.getsize(path) / 2**20
        print(
            json.dumps({"file_mb": round(size_mb, 1), "records": nrec}),
            flush=True,
        )

        rows = []

        def run(name, fn):
            dt = timeit(fn, args.reps)
            rows.append((name, dt))
            print(
                json.dumps(
                    {
                        "bench": name,
                        "seconds": round(dt, 3),
                        "MB_per_s": round(size_mb / dt, 1),
                    }
                ),
                flush=True,
            )

        run("parse_python", lambda: sum(
            len(s) for _, s in data._read_fasta_py(path)))
        run("parse_native", lambda: sum(
            len(s) for _, s in data._read_fasta_native(
                native.FastaIndex(path))))
        run("encode_python", lambda: sum(
            data.encode_dna(s).shape[0] for _, s in data._read_fasta_py(path)
        ))
        run("encode_native_fused", lambda: sum(
            e.shape[0] for _, e in data.read_fasta_encoded(path, "dna")
        ))

        t = dict(rows)
        print(
            json.dumps(
                {
                    "speedup_parse": round(t["parse_python"] / t["parse_native"], 2),
                    "speedup_encode": round(
                        t["encode_python"] / t["encode_native_fused"], 2
                    ),
                }
            )
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
