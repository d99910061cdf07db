"""learnMSA-style profile-HMM training workflow, end to end.

Demonstrates the full training surface on synthetic protein-like data:

1. build n candidate profile models of different lengths (one per model on
   the engine's model axis), with Plan7 transitions + Dirichlet MAP priors;
2. train them JOINTLY with the optax Trainer (frozen insertions, metrics,
   periodic checkpoints, hang watchdog);
3. rank the models by held-out log-likelihood and carve out the best one
   (``Trainer.fit_select`` — the reference's ``duplicate`` surgery,
   ``Emitter.py:171-197``, orchestrated);
4. resume-from-checkpoint demonstration (``utils.resilience``);
5. decode alignments of held-out sequences with the selected model
   (Viterbi state paths; match/insert/delete column labels).

Run: python examples/train_profile_msa.py [--steps 30] [--cpu]
"""

import argparse
import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--n-models", type=int, default=3)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--length", type=int, default=24)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from hmm_layer_tpu.layer import HMMLayer
    from hmm_layer_tpu.models import ProfileEmissions, ProfileTransitions
    from hmm_layer_tpu.training import Trainer
    from hmm_layer_tpu.utils import checkpoint as ckpt
    from hmm_layer_tpu.utils.resilience import latest_checkpoint

    rng = np.random.default_rng(0)
    m, b, L = args.n_models, args.batch, args.length

    # Synthetic family: a conserved consensus with substitutions + indels.
    consensus = rng.integers(0, 20, size=12)

    def sample_sequence():
        seq = []
        for aa in consensus:
            r = rng.random()
            if r < 0.08:
                continue  # deletion
            seq.append(aa if rng.random() > 0.15 else rng.integers(0, 20))
            if rng.random() < 0.08:
                seq.append(rng.integers(0, 20))  # insertion
        while len(seq) < L:
            seq.append(rng.integers(0, 20))
        return seq[:L]

    def batch_onehot(n):
        idx = np.stack([sample_sequence() for _ in range(n)])
        x = np.eye(26, dtype=np.float32)[idx]
        return jnp.broadcast_to(jnp.asarray(x)[None], (m, n, L, 26))

    lengths = [10, 12, 14][: args.n_models]
    layer = HMMLayer(
        ProfileTransitions(lengths),
        ProfileEmissions(lengths),
        use_prior=True,
        num_seqs=1000,
    )

    ckpt_dir = tempfile.mkdtemp(prefix="profile_msa_")
    trainer = Trainer(
        layer,
        optimizer=optax.adam(5e-2),
        checkpoint_dir=ckpt_dir,
        checkpoint_every=10,
    )
    params, opt_state = trainer.init(jax.random.PRNGKey(0), input_dim=26)

    print(f"training {m} profile models (lengths {lengths}) jointly ...")
    result = trainer.fit_select(
        params,
        opt_state,
        batches=(batch_onehot(b) for _ in range(args.steps)),
        score_batches=[batch_onehot(b)],
        keep=1,
        log_every=10,
    )
    best = int(result.ranking[0])
    print(f"held-out mean loglik per model: {np.round(result.scores, 2)}")
    print(f"selected model {best} (length {lengths[best]})")

    # Elastic-recovery demonstration: resume from the newest checkpoint.
    found = latest_checkpoint(ckpt_dir)
    if found:
        path, step = found
        restored = ckpt.load_checkpoint(path, like=result.params)
        print(f"checkpoint resume ok: step {step} from {path}")
        del restored

    # Decode held-out sequences with the selected single-model layer and
    # render the gapped alignment (match columns uppercase, deletions '-',
    # insertions lowercase padded with '.').
    from hmm_layer_tpu.models import paths_to_msa

    sel_layer, sel_params = result.layer, result.selected_params
    x_test = batch_onehot(4)[best : best + 1]
    paths = np.asarray(sel_layer.viterbi(sel_params, x_test))[0]
    residues = np.argmax(np.asarray(x_test)[0], axis=-1)
    for i, row in enumerate(
        paths_to_msa(paths, residues, model_length=lengths[best])
    ):
        print(f"seq {i}  {row}")
    print("done.")


if __name__ == "__main__":
    main()
