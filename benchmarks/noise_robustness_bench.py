"""Gene-prediction quality vs class-probability noise (robustness curve).

The deliverable-scale proof (genome_cli_bench.py) measured one noise
level (0.3). This sweeps the simulator's class-probability corruption and
reports held-out nucleotide/exon/gene F1 for (a) the untrained
identity-kernel decoder and (b) the supervised posterior-CE-trained head
— quantifying how much of the upstream network's sloppiness the HMM head
absorbs, and where it breaks.

Run: python benchmarks/noise_robustness_bench.py [--noises 0.3,0.5,0.7,0.85]
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
    ap.add_argument("--noises", default="0.3,0.5,0.7,0.85")
    ap.add_argument("--train-genes", type=int, default=8)
    ap.add_argument("--eval-genes", type=int, default=6)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from hmm_layer_tpu.models import evaluate_annotation
    from hmm_layer_tpu.models.simulate import simulate_genome
    from hmm_layer_tpu.training import Trainer
    from test_quality import (
        decode_genome,
        gene_pred_layer,
        genome_inputs,
        genome_labels,
    )

    for noise in [float(s) for s in args.noises.split(",")]:
        t0 = time.time()
        sim_tr = simulate_genome(
            np.random.default_rng(42), num_genes=args.train_genes, noise=noise
        )
        sim_te = simulate_genome(
            np.random.default_rng(7), num_genes=args.eval_genes, noise=noise
        )
        layer = gene_pred_layer()
        params0 = layer.init_params(jax.random.PRNGKey(0), input_dim=15)
        m0 = evaluate_annotation(
            {"c": decode_genome(layer, params0, sim_te)},
            {"c": sim_te.genes},
        )

        x_f, x_r = genome_inputs(sim_tr)
        t_f, t_r = genome_labels(sim_tr)
        batch = {
            "x": jnp.asarray(np.stack([x_f, x_r])[None]),
            "labels": jnp.asarray(np.stack([t_f, t_r])[None]),
        }
        trainer = Trainer(
            layer,
            optimizer=optax.adam(0.02),
            loss_fn=lambda p, b, i: layer.posterior_cross_entropy(
                p, b["x"], b["labels"]
            ),
        )
        params, opt_state = trainer.init(jax.random.PRNGKey(0), input_dim=15)
        params, _, loss = trainer.fit(
            params, opt_state, batches=(batch for _ in range(args.steps))
        )
        m1 = evaluate_annotation(
            {"c": decode_genome(layer, params, sim_te)},
            {"c": sim_te.genes},
        )

        def f1s(m):
            return (
                f"nt {m['nucleotide']['f1']:.3f} / exon {m['exon']['f1']:.3f}"
                f" / gene {m['gene']['f1']:.3f}"
            )

        print(
            f"noise={noise:.2f}: untrained {f1s(m0)} | trained(CE "
            f"loss {float(loss):.3f}) {f1s(m1)} "
            f"({time.time() - t0:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
