"""learnMSA-scale MSA quality: LG-noise planted profiles at Pfam sizes.

VERDICT round-4 weak item 1: the motif-toy quality proof (Lm=8-24,
near-deterministic columns) is not learnMSA's regime. This plants a
profile whose match columns emit from LG-conditioned substitution
distributions at evolutionary time ``tau`` (~40% pairwise identity at
0.7), with realistic insert/delete rates, at model lengths 100-200 and
hundreds of sequences; trains 5 candidate models with ``Trainer.fit_select``;
Viterbi-aligns; scores pairs F1 / column score vs the planted truth. With
``--adapt`` it also runs the learnMSA iterative length-adaptation loop
from a deliberately wrong start length (0.75 Lm) under the same step
budget.

Run: python benchmarks/msa_scale_bench.py [--lm 100] [--seqs 512]
     [--tau 0.7] [--steps 500] [--adapt]
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lm", type=int, default=100)
    ap.add_argument("--seqs", type=int, default=512)
    ap.add_argument("--tau", type=float, default=0.7)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--adapt", action="store_true")
    ap.add_argument("--adapt-rounds", type=int, default=3)
    ap.add_argument("--expand-threshold", type=float, default=0.5,
                    help="insert-load (residues/seq) above which a site "
                         "grows columns; at Pfam sizes overflow spreads "
                         "over many sites, so this must sit well below "
                         "the small-model default of 1.0")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from hmm_layer_tpu.layer import HMMLayer
    from hmm_layer_tpu.models import (
        ProfileEmissions,
        ProfileTransitions,
        adapt_profile_layer,
        evaluate_msa,
        paths_to_msa,
    )
    from hmm_layer_tpu.ops.recursion import set_dp_precision
    from hmm_layer_tpu.training import Trainer
    from test_quality import make_planted_profile_lg, sample_planted_msa

    set_dp_precision("high")  # the profile-training default (align CLI)
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    Lm, S = args.lm, 25
    trans, emit = make_planted_profile_lg(rng, Lm=Lm, tau=args.tau)
    x_full, res, lens, true_rows = sample_planted_msa(
        rng, trans, emit, num_seqs=args.seqs, max_len=2 * Lm + 40
    )
    b = x_full.shape[0]
    print(
        f"LG-planted profile Lm={Lm} tau={args.tau}: {b} sequences, "
        f"lengths {lens.min()}-{lens.max()}",
        flush=True,
    )

    def decode_f1(layer, params, lm):
        paths = np.asarray(layer.viterbi(params, jnp.asarray(x_full[None])))[0]
        rows = paths_to_msa(paths, res, model_length=lm, seq_lengths=lens)
        return evaluate_msa(rows, true_rows)

    # ---- fit_select over 5 candidate lengths ---------------------------------
    cand = sorted({int(round(Lm * f)) for f in (0.8, 0.9, 1.0, 1.1, 1.2)})
    m = len(cand)
    layer = HMMLayer(
        ProfileTransitions(cand),
        ProfileEmissions(cand),
        use_prior=True,
        num_seqs=b,
    )
    trainer = Trainer(layer, optimizer=optax.adam(0.05))
    params, opt_state = trainer.init(jax.random.PRNGKey(3), input_dim=S + 1)
    xb = jnp.asarray(np.broadcast_to(x_full[None], (m,) + x_full.shape))
    t0 = time.time()
    result = trainer.fit_select(
        params,
        opt_state,
        batches=(xb for _ in range(args.steps)),
        score_batches=(xb for _ in range(1)),
        keep=1,
    )
    train_s = time.time() - t0
    best = int(result.ranking[0])
    mets = decode_f1(result.layer, result.selected_params, cand[best])
    print(
        f"fit_select m={m} (lengths {cand}, {args.steps} steps, "
        f"{train_s:.0f}s wall incl. compile): selected Lm={cand[best]}; "
        f"pairs F1 {mets['pairs']['f1']:.4f} (precision "
        f"{mets['pairs']['precision']:.4f}, recall "
        f"{mets['pairs']['recall']:.4f}), column score "
        f"{mets['column_score']:.4f}",
        flush=True,
    )

    if not args.adapt:
        return

    # ---- adaptation loop from a wrong start length ---------------------------
    start_lm = int(round(0.75 * Lm))

    def fresh(lm):
        lyr = HMMLayer(
            ProfileTransitions([lm]), ProfileEmissions([lm]),
            use_prior=True, num_seqs=b,
        )
        tr = Trainer(lyr, optimizer=optax.adam(0.05))
        p, o = tr.init(jax.random.PRNGKey(4), input_dim=S + 1)
        return lyr, tr, p, o

    x1 = jnp.asarray(x_full[None])
    t0 = time.time()
    lyr, tr, p, o = fresh(start_lm)
    phase = max(1, args.steps // (args.adapt_rounds + 1))
    lengths_seen = [start_lm]
    for r in range(args.adapt_rounds):
        p, o, _ = tr.fit(p, o, batches=(x1 for _ in range(phase)))
        lyr, p, info = adapt_profile_layer(
            lyr, p, x1, jax.random.PRNGKey(9 + r),
            expand_threshold=args.expand_threshold,
        )
        lengths_seen.append(lyr.transitions.lengths[0])
        tr = Trainer(lyr, optimizer=optax.adam(0.05))
        o = tr.init_from_params(p)
    rest = max(1, args.steps - args.adapt_rounds * phase)
    p, o, _ = tr.fit(p, o, batches=(x1 for _ in range(rest)))
    mets_a = decode_f1(lyr, p, lyr.transitions.lengths[0])
    t_adapt = time.time() - t0

    lyr_c, tr_c, p_c, o_c = fresh(start_lm)
    p_c, o_c, _ = tr_c.fit(p_c, o_c, batches=(x1 for _ in range(args.steps)))
    mets_c = decode_f1(lyr_c, p_c, start_lm)
    print(
        f"adaptation from Lm={start_lm} (true {Lm}; lengths {lengths_seen}; "
        f"{t_adapt:.0f}s wall): pairs F1 {mets_a['pairs']['f1']:.4f} vs "
        f"fixed-length control {mets_c['pairs']['f1']:.4f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
