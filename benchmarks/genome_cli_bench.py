"""Deliverable-scale gene-prediction CLI run: >= 1 Mb synthetic contig.

VERDICT round-3 item 8: the round-3 hardware verification of the predict
workflow used a 2 kb planted contig; this drives the REAL end-user
pipeline at deliverable scale on hardware:

1. simulate a >= 1 Mb multi-gene contig (introns, both strands, noisy
   class probabilities) with a planted GFF3 truth
   (:mod:`hmm_layer_tpu.models.simulate`);
2. train the HMM head supervised on a separate small simulated genome via
   ``python -m hmm_layer_tpu train`` (posterior-CE, the Tiberius mode);
3. annotate the big contig via ``python -m hmm_layer_tpu predict``
   (windowed Viterbi, both strands, overlap stitching) — wall-clock
   recorded;
4. score nucleotide/exon/gene F1 against the planted truth.

Run: python benchmarks/genome_cli_bench.py [--mb 1.0] [--workdir DIR]
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

from hmm_layer_tpu.models import evaluate_annotation, read_gff3, write_gff3  # noqa: E402
from hmm_layer_tpu.models.simulate import simulate_genome  # noqa: E402


def write_fasta(path, name, seq, width=80):
    with open(path, "w") as f:
        f.write(f">{name}\n")
        for i in range(0, len(seq), width):
            f.write(seq[i : i + width] + "\n")


def make_genome(path_prefix, name, rng, num_genes, noise=0.3):
    sim = simulate_genome(
        rng,
        num_genes=num_genes,
        mean_exons=2.0,
        exon_codons=60,
        intron_len=60,
        intergenic_len=800,
        noise=noise,
    )
    write_fasta(f"{path_prefix}.fa", name, sim.seq)
    np.savez(
        f"{path_prefix}_cls.npz",
        **{name: sim.class_probs, f"{name}__rc": sim.class_probs_rc},
    )
    write_gff3({name: sim.genes}, f"{path_prefix}_truth.gff3")
    return sim


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=1.0)
    ap.add_argument("--workdir", default="/tmp/genome_cli_bench")
    ap.add_argument("--train-steps", type=int, default=150)
    ap.add_argument("--window", type=int, default=4096)
    ap.add_argument("--overlap", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    # ~1.1 kb per gene at these simulator settings.
    num_genes = max(4, int(args.mb * 1e6 / 1100))
    print(f"simulating eval contig (~{args.mb} Mb, {num_genes} genes) ...",
          flush=True)
    t0 = time.time()
    sim_eval = make_genome(
        f"{args.workdir}/eval", "contig1",
        np.random.default_rng(7), num_genes,
    )
    sim_train = make_genome(
        f"{args.workdir}/train", "train1",
        np.random.default_rng(42), 12,
    )
    print(
        f"eval contig: {sim_eval.length / 1e6:.2f} Mb, "
        f"{len(sim_eval.genes)} genes; train contig: "
        f"{sim_train.length / 1e3:.1f} kb ({time.time() - t0:.0f}s)",
        flush=True,
    )

    env = dict(os.environ)
    mod = [sys.executable, "-m", "hmm_layer_tpu"]

    t0 = time.time()
    subprocess.run(
        mod + [
            "train", "-i", f"{args.workdir}/train.fa",
            "-a", f"{args.workdir}/train_truth.gff3",
            "-o", f"{args.workdir}/params.npz",
            "--class-probs", f"{args.workdir}/train_cls.npz",
            "--objective", "ce", "--both-strands",
            "--steps", str(args.train_steps), "--lr", "0.02",
            "--window", "512", "--batch", "8",
        ],
        check=True, env=env, cwd=REPO,
    )
    train_s = time.time() - t0
    print(f"train wall-clock: {train_s:.0f}s", flush=True)

    t0 = time.time()
    subprocess.run(
        mod + [
            "predict", "-i", f"{args.workdir}/eval.fa",
            "-o", f"{args.workdir}/pred.gff3",
            "--class-probs", f"{args.workdir}/eval_cls.npz",
            "--params", f"{args.workdir}/params.npz",
            "--both-strands",
            "--window", str(args.window),
            "--overlap", str(args.overlap),
            "--batch", str(args.batch),
            "--parallel-factor", "8",
        ],
        check=True, env=env, cwd=REPO,
    )
    predict_s = time.time() - t0
    mb = sim_eval.length / 1e6
    print(
        f"predict wall-clock: {predict_s:.1f}s for {mb:.2f} Mb both strands "
        f"-> {mb / predict_s * 1e3:.1f} kb/s (incl. JAX compile + host IO)",
        flush=True,
    )

    mets = evaluate_annotation(
        read_gff3(f"{args.workdir}/pred.gff3"),
        read_gff3(f"{args.workdir}/eval_truth.gff3"),
    )
    print(json.dumps(
        {lvl: {k: round(v, 4) for k, v in d.items()} for lvl, d in mets.items()},
        indent=1,
    ))


if __name__ == "__main__":
    main()
