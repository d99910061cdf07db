"""Adaptation quality proof: recover from a badly wrong model length.

The learnMSA loop's reason to exist: start a profile model far from the
true motif length, alternate training with posterior-occupancy length
adaptation (``models.profile_adapt`` + param-preserving resize), and show
the model length converges toward the planted truth and alignment quality
recovers. A no-adaptation control trains the same total steps at the
wrong fixed length.

Run: python benchmarks/msa_adapt_bench.py [--true-lm 24] [--start-lm 12]
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
    ap.add_argument("--true-lm", type=int, default=24)
    ap.add_argument("--start-lm", type=int, default=12)
    ap.add_argument("--seqs", type=int, default=64)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--adapt-rounds", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
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
    from hmm_layer_tpu.training import Trainer
    from test_quality import make_planted_profile, sample_planted_msa

    rng = np.random.default_rng(0)
    S = 25
    trans, emit = make_planted_profile(rng, Lm=args.true_lm, S=S)
    x_full, res, lens, true_rows = sample_planted_msa(
        rng, trans, emit, num_seqs=args.seqs, max_len=4 * args.true_lm
    )
    xb = jnp.asarray(x_full[None])

    def decode_f1(layer, params):
        paths = np.asarray(layer.viterbi(params, xb))[0]
        rows = paths_to_msa(
            paths, res, model_length=layer.transitions.lengths[0],
            seq_lengths=lens,
        )
        return evaluate_msa(rows, true_rows)

    def fresh(lm):
        layer = HMMLayer(
            ProfileTransitions([lm]), ProfileEmissions([lm]),
            use_prior=True, num_seqs=x_full.shape[0],
        )
        trainer = Trainer(layer, optimizer=optax.adam(0.1))
        params, opt = trainer.init(jax.random.PRNGKey(3), input_dim=S + 1)
        return layer, trainer, params, opt

    # ---- control: fixed wrong length, full step budget ------------------
    layer, trainer, params, opt = fresh(args.start_lm)
    params, opt, _ = trainer.fit(
        params, opt, batches=(xb for _ in range(args.steps))
    )
    mets = decode_f1(layer, params)
    print(
        f"control (fixed Lm={args.start_lm}, {args.steps} steps): pairs F1 "
        f"{mets['pairs']['f1']:.4f}, column score {mets['column_score']:.4f}",
        flush=True,
    )

    # ---- adaptive: same budget split across adaptation rounds -----------
    t0 = time.time()
    layer, trainer, params, opt = fresh(args.start_lm)
    phase = max(1, args.steps // (args.adapt_rounds + 1))
    lengths_seen = [args.start_lm]
    for r in range(args.adapt_rounds):
        params, opt, _ = trainer.fit(
            params, opt, batches=(xb for _ in range(phase))
        )
        layer, params, info = adapt_profile_layer(
            layer, params, xb, jax.random.PRNGKey(10 + r)
        )
        lengths_seen.append(layer.transitions.lengths[0])
        trainer = Trainer(layer, optimizer=optax.adam(0.1))
        opt = trainer.init_from_params(params)
    rest = max(1, args.steps - args.adapt_rounds * phase)
    params, opt, _ = trainer.fit(params, opt, batches=(xb for _ in range(rest)))
    mets = decode_f1(layer, params)
    print(
        f"adaptive ({args.adapt_rounds} rounds, lengths {lengths_seen}): "
        f"pairs F1 {mets['pairs']['f1']:.4f}, column score "
        f"{mets['column_score']:.4f} ({time.time() - t0:.0f}s, true Lm "
        f"{args.true_lm})",
        flush=True,
    )


if __name__ == "__main__":
    main()
