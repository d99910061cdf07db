"""Command-line entry points: ``python -m hmm_layer_tpu <command>``.

The reference is a bare layer library — its two upstream projects are
end-user tools (learnMSA aligns a FASTA of proteins; Tiberius annotates a
genome), so a complete replacement needs the same one-command workflows:

* ``align``   — train profile HMMs on a protein FASTA, select the best
  model, Viterbi-align every sequence, write an aligned FASTA
  (learnMSA's ``-i/-o`` usage).
* ``predict`` — Viterbi-decode DNA contigs through the 15-state gene-pred
  HMM (optionally with upstream class probabilities and trained
  parameters) and write a GFF3 annotation (the Tiberius output format).
* ``train``   — supervised training of the gene-pred HMM against a
  reference GFF3 annotation (posterior cross-entropy on state labels from
  :func:`~hmm_layer_tpu.models.annotation.genes_to_states` — the Tiberius
  training mode) or unsupervised MAP training; writes a parameter
  checkpoint that ``predict --params`` consumes.
* ``evaluate`` — Burset–Guigó-style accuracy (nucleotide/exon/gene
  precision, recall, F1) of one GFF3 against another.

All commands run on whatever backend JAX selects (the TPU when present);
``--cpu`` forces the CPU backend. Heavy imports happen inside ``main`` so
``import hmm_layer_tpu.cli`` stays backend-free (repo invariant).
"""

from __future__ import annotations

import argparse
import os
import sys

__all__ = ["main", "build_parser"]


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="hmm_layer_tpu",
        description="TPU-native differentiable HMM toolkit",
    )
    ap.add_argument(
        "--cache-dir",
        default=os.environ.get("HMM_COMPILE_CACHE"),
        help="persistent JAX compilation-cache directory (default: "
             "$HMM_COMPILE_CACHE). Cold TPU compiles dominate single-contig "
             "CLI runs; a cache makes repeat runs with the same window/"
             "batch shapes start in seconds",
    )
    sub = ap.add_subparsers(dest="command", required=True)

    al = sub.add_parser(
        "align", help="train profile HMMs on a protein FASTA and align it"
    )
    al.add_argument("-i", "--input", required=True, help="protein FASTA")
    al.add_argument("-o", "--output", required=True, help="aligned FASTA out")
    al.add_argument("--models", type=int, default=3,
                    help="candidate model count trained jointly")
    al.add_argument("--steps", type=int, default=100, help="training steps")
    al.add_argument("--batch", type=int, default=32)
    al.add_argument("--lr", type=float, default=0.05)
    al.add_argument("--model-length", type=int, default=None,
                    help="match-state count (default: from sequence lengths)")
    al.add_argument("--adapt-rounds", type=int, default=0,
                    help="learnMSA-style length-adaptation rounds: after "
                         "each round, low-occupancy match columns are "
                         "discarded and overloaded insertion sites become "
                         "new columns (param-preserving resize), then "
                         "training continues")
    al.add_argument("--expand-threshold", type=float, default=None,
                    help="insert load (residues/seq) above which an "
                         "insertion site grows new match columns during "
                         "adaptation. Default: auto — 1.0 for short "
                         "models, 0.35 for model length >= 64 (at Pfam "
                         "sizes missing columns spread their overflow "
                         "over many sites and the small-model threshold "
                         "stalls; measured on the Lm=100 LG benchmark, "
                         "75->99 vs 75->82 stalled)")
    al.add_argument("--precision", choices=("high", "highest"),
                    default="high",
                    help="DP-einsum precision. Profile training defaults "
                         "to 'high' (bf16x3): measured 1.28x faster with "
                         "log-likelihood error saturating at the f32-ulp "
                         "level (BASELINE.md round-4 precision sweep); "
                         "'highest' restores full 6-pass f32 parity")
    al.add_argument("--seed", type=int, default=0)
    al.add_argument("--cpu", action="store_true", help="force CPU backend")

    pr = sub.add_parser(
        "predict", help="annotate DNA contigs with the gene-prediction HMM"
    )
    pr.add_argument("-i", "--input", required=True, help="DNA FASTA")
    pr.add_argument("-o", "--output", required=True, help="GFF3 out")
    pr.add_argument("--class-probs", default=None,
                    help=".npz of per-contig (L, 15) class probabilities "
                         "from an upstream network (keys = contig names; "
                         "'<name>__rc' keys score the reverse strand)")
    pr.add_argument("--both-strands", action="store_true",
                    help="also decode the reverse complement and report "
                         "minus-strand genes")
    pr.add_argument("--params", default=None,
                    help="trained parameter checkpoint (.npz) to load")
    pr.add_argument("--window", type=int, default=1024,
                    help="decode window length over long contigs")
    pr.add_argument("--overlap", type=int, default=64)
    pr.add_argument("--batch", type=int, default=8)
    pr.add_argument("--parallel-factor", type=int, default=8)
    pr.add_argument("--cpu", action="store_true", help="force CPU backend")

    tr = sub.add_parser(
        "train", help="train the gene-prediction HMM on annotated contigs"
    )
    tr.add_argument("-i", "--input", required=True, help="DNA FASTA")
    tr.add_argument("-a", "--annotation", default=None,
                    help="reference GFF3 (required for --objective ce)")
    tr.add_argument("-o", "--output", required=True,
                    help="parameter checkpoint out (.npz; predict --params "
                         "loads it)")
    tr.add_argument("--objective", choices=("ce", "map"), default="ce",
                    help="ce = posterior cross-entropy vs annotation labels "
                         "(supervised, Tiberius mode); map = maximum "
                         "a-posteriori log-likelihood (unsupervised)")
    tr.add_argument("--class-probs", default=None,
                    help=".npz of per-contig (L, 15) class probabilities "
                         "(keys = contig names)")
    tr.add_argument("--both-strands", action="store_true",
                    help="also train on reverse-complemented contigs "
                         "labeled from minus-strand genes")
    tr.add_argument("--resume", default=None,
                    help="parameter checkpoint to start from")
    tr.add_argument("--steps", type=int, default=200)
    tr.add_argument("--lr", type=float, default=0.01)
    tr.add_argument("--window", type=int, default=512)
    tr.add_argument("--overlap", type=int, default=0)
    tr.add_argument("--batch", type=int, default=8)
    tr.add_argument("--parallel-factor", type=int, default=8)
    tr.add_argument("--seed", type=int, default=0)
    tr.add_argument("--cpu", action="store_true", help="force CPU backend")

    ev = sub.add_parser(
        "evaluate", help="score a predicted GFF3 against a reference GFF3"
    )
    ev.add_argument("--pred", required=True, help="predicted GFF3")
    ev.add_argument("--truth", required=True, help="reference GFF3")
    return ap


def _force_cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")


# ---------------------------------------------------------------- align


def _model_lengths(seq_lengths, n_models: int, override):
    """learnMSA-style candidate lengths around ~0.8 x median residue count."""
    if override is not None:
        base = int(override)
    else:
        base = int(round(0.8 * float(sorted(seq_lengths)[len(seq_lengths) // 2])))
    base = max(base, 2)
    half = (n_models - 1) // 2
    return [max(2, base - half + i) for i in range(n_models)]


def _align(args) -> int:
    if args.cpu:
        _force_cpu()
    import jax
    import numpy as np
    import optax

    from . import data
    from .layer import HMMLayer
    from .models import (
        ProfileEmissions,
        ProfileTransitions,
        paths_to_msa,
        write_msa,
    )
    from .training import Trainer

    records = list(data.read_fasta(args.input))
    if not records:
        print(f"error: no sequences in {args.input}", file=sys.stderr)
        return 2
    # Workload-appropriate DP precision (measured, BASELINE.md round 4):
    # 'high' is 1.28x on the profile MAP step at f32-ulp-level error. Set
    # before the first trace; the gene-pred commands stay 'highest'
    # (measured 0.76x regression there).
    from .ops.recursion import set_dp_precision

    set_dp_precision(args.precision)
    names = [name for name, _ in records]
    encoded = [data.encode_protein(seq) for _, seq in records]  # L+1 rows
    seq_lens = [e.shape[0] - 1 for e in encoded]

    m = max(1, args.models)
    lengths = _model_lengths(seq_lens, m, args.model_length)
    layer = HMMLayer(
        ProfileTransitions(lengths),
        ProfileEmissions(lengths),
        use_prior=True,
        num_seqs=len(records),
    )
    trainer = Trainer(layer, optimizer=optax.adam(args.lr))
    params, opt_state = trainer.init(
        jax.random.PRNGKey(args.seed), input_dim=encoded[0].shape[-1]
    )

    def batches(n_steps, n_models=None):
        """Cycle padded batches; broadcast over the model axis."""
        n_models = m if n_models is None else n_models
        step = 0
        while step < n_steps:
            for batch, _ in data.pad_batches(encoded, args.batch):
                if step >= n_steps:
                    return
                yield np.broadcast_to(batch[None], (n_models,) + batch.shape)
                step += 1

    # One padded batch holding every sequence: used for adaptation
    # posteriors and the final global decode (alignment columns are global).
    L_max = max(e.shape[0] for e in encoded)
    full = np.zeros((len(encoded), L_max, encoded[0].shape[-1]), np.float32)
    full[:, :, -1] = 1.0  # terminal padding
    for i, e in enumerate(encoded):
        full[i, : e.shape[0]] = e

    print(
        f"aligning {len(records)} sequences: training {m} profile "
        f"models (lengths {lengths}) for {args.steps} steps ..."
    )
    final_steps = args.steps
    # Clamp so adaptation never exceeds the user's step budget: at most
    # steps-1 rounds, and the final phase gets the exact remainder.
    adapt_rounds = min(args.adapt_rounds, max(0, args.steps - 1))
    if adapt_rounds > 0:
        from .models.profile_adapt import adapt_profile_layer

        phase = max(1, args.steps // (adapt_rounds + 1))
        final_steps = args.steps - adapt_rounds * phase
        for r in range(adapt_rounds):
            params, opt_state, _ = trainer.fit(
                params, opt_state, batches=batches(phase)
            )
            x_all = np.broadcast_to(full[None], (m,) + full.shape)
            expand = args.expand_threshold
            if expand is None:
                expand = 0.35 if max(layer.transitions.lengths) >= 64 else 1.0
            layer, params, info = adapt_profile_layer(
                layer, params, x_all, jax.random.PRNGKey(args.seed + 1 + r),
                expand_threshold=expand,
            )
            lengths = layer.transitions.lengths
            print(
                f"adaptation round {r + 1}: lengths "
                f"{[d['old_length'] for d in info]} -> {lengths}"
            )
            trainer = Trainer(layer, optimizer=optax.adam(args.lr))
            opt_state = trainer.init_from_params(params)

    result = trainer.fit_select(
        params,
        opt_state,
        batches=batches(final_steps),
        score_batches=batches(max(1, len(records) // args.batch + 1)),
        keep=1,
    )
    best = int(result.ranking[0])
    print(
        "per-model held-out loglik:",
        np.round(np.asarray(result.scores), 3),
        f"-> selected model {best} (length {lengths[best]})",
    )

    x = np.broadcast_to(full[None], (1,) + full.shape)
    paths = np.asarray(result.layer.viterbi(result.selected_params, x))[0]
    residues = np.argmax(full, axis=-1)
    rows = paths_to_msa(
        paths,
        residues,
        model_length=lengths[best],
        seq_lengths=np.asarray(seq_lens),
    )
    write_msa(args.output, names, rows)
    print(f"wrote {len(rows)} aligned rows ({len(rows[0])} columns) to "
          f"{args.output}")
    return 0


# -------------------------------------------------------- gene-pred shared


def _gene_pred_layer(parallel_factor: int):
    """The 15-state Tiberius-style layer both ``predict`` and ``train``
    use: biological codon patterns + an identity-ish class kernel so
    upstream class probabilities pass through to the matching states."""
    from .layer import HMMLayer
    from .models import GenePredEmissions, GenePredTransitions
    from .models.initializers import make_15_class_emission_kernel

    return HMMLayer(
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
        parallel_factor=parallel_factor,
    )


def _class_probs_fn(npz_path):
    """Loader: contig name + length -> (L, 15) class probabilities.

    Falls back to a mostly-intergenic prior when no upstream network
    output is supplied (codon structure and transition geometry then
    carve out the genes).
    """
    import numpy as np

    class_npz = np.load(npz_path) if npz_path else None

    def load(name, L, required=True):
        if class_npz is not None:
            if name not in class_npz.files:
                if required:
                    raise KeyError(
                        f"contig {name!r} missing from {npz_path} "
                        f"(has {class_npz.files})"
                    )
            else:
                arr = np.asarray(class_npz[name], np.float32)
                if arr.shape != (L, 15):
                    raise ValueError(
                        f"class probs for {name!r} have shape {arr.shape}, "
                        f"expected {(L, 15)}"
                    )
                return arr
        probs = np.full((L, 15), 0.02, np.float32)
        probs[:, 0] = 0.72
        return probs

    return load


# -------------------------------------------------------------- predict


def _predict(args) -> int:
    if args.cpu:
        _force_cpu()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from . import data
    from .models import paths_to_genes, write_gff3
    from .models.annotation import flip_genes
    from .utils import checkpoint as ckpt

    # One fixed window length for every contig (short contigs are padded by
    # window_batches), rounded to a multiple of the chunk parallel factor.
    pf = max(1, args.parallel_factor)
    window = max(pf, args.window - args.window % pf)

    layer = _gene_pred_layer(pf)
    params = layer.init_params(jax.random.PRNGKey(0), input_dim=15)
    if args.params:
        params = ckpt.load_checkpoint(args.params, like=params)
    # One traced computation per window shape instead of one device
    # dispatch per primitive (the axon tunnel charges ~33 ms a dispatch).
    viterbi_fn = jax.jit(layer.viterbi)

    class_probs_for = _class_probs_fn(args.class_probs)

    def decode_contig(enc, cls):
        L = enc.shape[0]
        track = np.zeros(L, np.int32)
        overlap = min(args.overlap, window - 1)
        for wins, starts in data.window_batches(
            enc, window, args.batch, overlap
        ):
            cls_win = np.stack(
                [
                    cls[st : st + window]
                    if st >= 0 and st + window <= L
                    else _pad_cls(cls, st, window)
                    for st in starts
                ]
            )
            x = jnp.asarray(
                np.concatenate([cls_win, wins], axis=-1)[None]
            )
            paths = np.asarray(viterbi_fn(params, x))[0]
            for i, st in enumerate(starts):
                if st < 0:
                    continue
                end = min(st + window, L)
                lo = st + overlap if st > 0 else st
                track[lo:end] = paths[i, lo - st : end - st]
        return track

    def _pad_cls(cls, st, window):
        if st < 0:
            return np.full((window, 15), 1.0 / 15.0, np.float32)
        chunk = cls[st : st + window]
        if chunk.shape[0] < window:
            pad = np.full(
                (window - chunk.shape[0], 15), 1.0 / 15.0, np.float32
            )
            chunk = np.concatenate([chunk, pad])
        return chunk

    genes_by_seq = {}
    # Fused file->one-hot read (native C++ when available); the reverse
    # strand is a channel permutation of the forward encoding, so no
    # sequence string is ever materialized.
    for name, enc in data.read_fasta_encoded(args.input, "dna"):
        L = enc.shape[0]
        cls = class_probs_for(name, L)
        track = decode_contig(enc, cls)
        genes = paths_to_genes(track, num_states=15)
        if args.both_strands:
            cls_rc = class_probs_for(f"{name}__rc", L, required=False)
            track_rc = decode_contig(data.revcomp_onehot(enc), cls_rc)
            genes = genes + flip_genes(
                paths_to_genes(track_rc, num_states=15), L
            )
            genes.sort(key=lambda g: g.start)
        genes_by_seq[name] = genes
        print(f"{name}: L={L}, {len(genes)} genes")
    n = write_gff3(genes_by_seq, args.output)
    print(f"wrote {n} genes to {args.output}")
    return 0


# ---------------------------------------------------------------- train


def _train(args) -> int:
    if args.cpu:
        _force_cpu()
    if args.objective == "ce" and not args.annotation:
        print("error: --objective ce requires -a/--annotation",
              file=sys.stderr)
        return 2

    import jax
    import numpy as np
    import optax

    from . import data
    from .models import genes_to_states, read_gff3
    from .models.annotation import flip_genes
    from .training import Trainer
    from .utils import checkpoint as ckpt

    pf = max(1, args.parallel_factor)
    window = max(pf, args.window - args.window % pf)
    layer = _gene_pred_layer(pf)
    class_probs_for = _class_probs_fn(args.class_probs)
    annot = read_gff3(args.annotation) if args.annotation else {}

    def windows_of(name, nuc, genes):
        """Supervised windows for one (possibly reverse-complemented)
        forward-strand labeling of a contig; ``nuc`` is the (L, 5)
        one-hot nucleotide encoding."""
        L = nuc.shape[0]
        enc = np.concatenate(
            [class_probs_for(name, L, required=False), nuc], axis=-1
        )
        track = (
            genes_to_states(genes, L, num_states=15)
            if genes is not None
            else None
        )
        out = []
        for wins, starts in data.window_batches(
            enc, window, args.batch, min(args.overlap, window - 1)
        ):
            labels = np.zeros(wins.shape[:2], np.int32)
            mask = np.zeros(wins.shape[:2], np.float32)
            for i, st in enumerate(starts):
                if st < 0:
                    continue
                n = min(st + window, L) - st
                mask[i, :n] = 1.0
                if track is not None:
                    labels[i, :n] = track[st : st + n]
            out.append(
                {
                    "x": wins[None],
                    "labels": labels[None],
                    "mask": mask[None],
                }
            )
        return out

    batches = []
    skipped_minus = 0
    for name, enc in data.read_fasta_encoded(args.input, "dna"):
        L = enc.shape[0]
        genes = None
        if args.objective == "ce":
            plus = [g for g in annot.get(name, []) if g.strand == "+"]
            minus = [g for g in annot.get(name, []) if g.strand == "-"]
            # Window-truncated intron-only fragments cannot be labeled;
            # complete annotations never contain them.
            genes = plus
            if minus and not args.both_strands:
                skipped_minus += len(minus)
        batches.extend(windows_of(name, enc, genes))
        if args.both_strands:
            rc_genes = None
            if args.objective == "ce":
                rc_genes = flip_genes(
                    [g for g in annot.get(name, []) if g.strand == "-"], L
                )
                for g in rc_genes:
                    g.strand = "+"  # now in revcomp forward coordinates
            batches.extend(
                windows_of(f"{name}__rc", data.revcomp_onehot(enc), rc_genes)
            )
    if not batches:
        print(f"error: no sequences in {args.input}", file=sys.stderr)
        return 2
    if skipped_minus:
        print(
            f"note: {skipped_minus} minus-strand genes ignored "
            "(pass --both-strands to train on them)"
        )

    if args.objective == "ce":
        def loss_fn(p, batch, indices):
            return layer.posterior_cross_entropy(
                p, batch["x"], batch["labels"], label_mask=batch["mask"]
            )
    else:
        def loss_fn(p, batch, indices):
            return layer.loss(p, batch["x"])

    trainer = Trainer(layer, optimizer=optax.adam(args.lr), loss_fn=loss_fn)
    params, opt_state = trainer.init(
        jax.random.PRNGKey(args.seed), input_dim=15
    )
    if args.resume:
        params = ckpt.load_checkpoint(args.resume, like=params)

    def cycle(n_steps):
        step = 0
        while True:
            for b in batches:
                if step >= n_steps:
                    return
                yield b
                step += 1

    print(
        f"training ({args.objective}) on {len(batches)} window batches "
        f"(window={window}, batch={args.batch}) for {args.steps} steps ..."
    )
    params, _, loss = trainer.fit(params, opt_state, batches=cycle(args.steps))
    ckpt.save_checkpoint(args.output, params, step=args.steps)
    print(f"final loss {float(np.asarray(loss)):.4f}; wrote {args.output}")
    return 0


# -------------------------------------------------------------- evaluate


def _evaluate(args) -> int:
    import json

    from .models import evaluate_annotation, read_gff3

    metrics = evaluate_annotation(read_gff3(args.pred), read_gff3(args.truth))
    print(json.dumps(metrics, indent=2))
    return 0


def _enable_compile_cache(cache_dir: str):
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.cache_dir:
        _enable_compile_cache(args.cache_dir)
    if args.command == "align":
        return _align(args)
    if args.command == "predict":
        return _predict(args)
    if args.command == "train":
        return _train(args)
    if args.command == "evaluate":
        return _evaluate(args)
    raise AssertionError(args.command)


if __name__ == "__main__":
    sys.exit(main())
