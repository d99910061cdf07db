"""End-to-end gene prediction over a FASTA file.

Demonstrates the full pipeline a Tiberius-style user runs in production:

1. read contigs from FASTA (``hmm_layer_tpu.data``),
2. encode nucleotides and produce per-position class probabilities (here a
   stub standing in for the upstream neural network),
3. window long contigs into fixed-shape batches,
4. decode posterior state marginals and the Viterbi path with the chunked
   TPU engine (``HMMLayer``),
5. stitch window decodes into per-contig state tracks and report exon/intron
   intervals.

Run: python examples/gene_prediction.py [fasta] [--window 1024] [--batch 8]
(with no arguments a small random FASTA is synthesized).
"""

from __future__ import annotations

import argparse
import sys
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from hmm_layer_tpu import data  # noqa: E402
from hmm_layer_tpu.layer import HMMLayer  # noqa: E402
from hmm_layer_tpu.models import GenePredEmissions, GenePredTransitions  # noqa: E402

STATE_NAMES = [
    "Ir", "I0", "I1", "I2", "E0", "E1", "E2",
    "START", "EI0", "EI1", "EI2", "IE0", "IE1", "IE2", "STOP",
]


def build_layer(parallel_factor: int) -> HMMLayer:
    emitter = GenePredEmissions(
        start_codons=[("ATG", 1.0)],
        stop_codons=[("TAG", 0.34), ("TAA", 0.33), ("TGA", 0.33)],
        intron_begin_pattern=[("NGT", 0.99), ("NGC", 0.005), ("NAT", 0.005)],
        intron_end_pattern=[("AGN", 0.99), ("ACN", 0.01)],
    )
    return HMMLayer(
        GenePredTransitions(),
        emitter,
        use_prior=False,
        parallel_factor=parallel_factor,
    )


def class_probabilities(nucs: np.ndarray) -> np.ndarray:
    """Stub for the upstream class-prediction network.

    Real deployments feed the 15 per-position class probabilities of a
    sequence model (e.g. Tiberius' CNN-LSTM); here a fixed mostly-intergenic
    prior keeps the example self-contained.
    """
    b, L = nucs.shape[:2]
    probs = np.full((b, L, 15), 0.02, np.float32)
    probs[..., 0] = 0.72  # intergenic prior
    return probs


def decode_contig(layer, params, encoded, window, batch, overlap=0):
    """Viterbi-decode one contig through fixed windows; returns (L,) states."""
    L = encoded.shape[0]
    track = np.zeros(L, np.int32)
    for wins, starts in data.window_batches(encoded, window, batch, overlap):
        cls = class_probabilities(wins)
        x = jnp.asarray(
            np.concatenate([cls, wins], axis=-1)[None]
        )  # (1, b, window, 20)
        paths = np.asarray(layer.viterbi(params, x))[0]
        for i, st in enumerate(starts):
            if st < 0:
                continue
            end = min(st + window, L)
            # Keep the PREVIOUS window's decode in the overlap region — it
            # has left context there; this window's first `overlap`
            # positions restart from the initial distribution.
            lo = st + overlap if st > 0 else st
            track[lo:end] = paths[i, lo - st : end - st]
    return track


def intervals(track: np.ndarray):
    """Collapse a state track into (state_name, start, end) runs."""
    runs = []
    st = 0
    for t in range(1, len(track) + 1):
        if t == len(track) or track[t] != track[st]:
            runs.append((STATE_NAMES[track[st]], st, t))
            st = t
    return runs


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("fasta", nargs="?", default=None)
    ap.add_argument("--window", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--parallel-factor", type=int, default=8)
    args = ap.parse_args(argv)

    if args.fasta is None:
        rng = np.random.default_rng(0)
        seq = "".join(rng.choice(list("ACGT"), size=4 * args.window))
        tmp = tempfile.NamedTemporaryFile("w", suffix=".fa", delete=False)
        tmp.write(f">synthetic\n{seq}\n")
        tmp.close()
        args.fasta = tmp.name
        print(f"(no FASTA given — synthesized {args.fasta})")

    layer = build_layer(args.parallel_factor)
    params = layer.init_params(jax.random.PRNGKey(0), input_dim=15)

    for name, seq in data.read_fasta(args.fasta):
        enc = data.encode_dna(seq)
        track = decode_contig(layer, params, enc, args.window, args.batch)
        runs = intervals(track)
        coding = sum(e - s for st, s, e in runs if st.startswith("E"))
        print(
            f"{name}: L={len(seq)}, {len(runs)} state runs, "
            f"{coding} coding positions"
        )
        for state, s, e in runs[:10]:
            print(f"  {name}\t{state}\t{s}\t{e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
