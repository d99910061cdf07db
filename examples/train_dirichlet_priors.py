"""Train the Dirichlet mixture priors shipped with the package.

The reference's design loads *trained* Dirichlet mixtures as MAP priors —
an amino-acid mixture over match emission columns and three transition
mixtures (match/insert/delete triples) — from files its repo does not ship
(``/root/reference/hmm_layer/Priors.py:48-66``,
``DirichletMixture.py:128-133``). This script reproduces that workflow
end to end with :class:`hmm_layer_tpu.models.DirichletMixture`:

1. draw synthetic-but-plausible training data
   (alignment-column amino-acid distributions around the LG background;
   Plan7 transition triples with realistic gap statistics);
2. fit each mixture by gradient descent on ``DirichletMixture.loss``
   (negative log-likelihood + the Dirichlet-process regularizer,
   ``DirichletMixture.py:97-115``);
3. save npz artifacts into ``hmm_layer_tpu/trained_priors/`` — the
   location :class:`hmm_layer_tpu.models.priors.AminoAcidPrior` and
   :class:`ProfileHMMTransitionPrior` load by default.

Run:  python examples/train_dirichlet_priors.py [--steps 2000] [--quick]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def sample_amino_columns(rng, n):
    """Synthetic alignment-column AA distributions (20-dim).

    A mix of conserved columns (one dominant residue, sharp Dirichlet) and
    diffuse columns around the LG stationary frequencies — the two regimes
    real profile match columns fall into.
    """
    from hmm_layer_tpu.utils.substitution import lg_matrix

    _, p_lg = lg_matrix()
    p_lg = np.asarray(p_lg, np.float64)
    p_lg = p_lg / p_lg.sum()
    cols = []
    for _ in range(n):
        if rng.uniform() < 0.6:
            # conserved: dominant residue drawn from background
            aa = rng.choice(20, p=p_lg)
            conc = rng.uniform(5.0, 40.0)
            alpha = 0.3 + 20.0 * p_lg
            alpha[aa] += conc
        else:
            # diffuse: background-shaped column
            conc = rng.uniform(2.0, 25.0)
            alpha = conc * 20.0 * p_lg + 0.2
        cols.append(rng.dirichlet(alpha))
    return np.clip(np.asarray(cols, np.float32), 1e-7, 1.0)


def sample_transition_triples(rng, n, kind):
    """Synthetic Plan7 transition distributions.

    match: (MM, MI, MD) — mostly continue, occasional gap open;
    insert: (IM, II) — insertions extend with moderate probability;
    delete: (DM, DD) — deletions similar.
    """
    out = []
    for _ in range(n):
        if kind == "match":
            gap = rng.beta(1.0, 12.0)  # gap-open mass
            mi = rng.uniform(0.2, 0.8)
            mean = np.asarray([1.0 - gap, gap * mi, gap * (1.0 - mi)])
        elif kind == "insert":
            ext = rng.beta(2.0, 3.0)  # insert-extend probability
            mean = np.asarray([1.0 - ext, ext])
        else:  # delete
            ext = rng.beta(2.0, 4.0)
            mean = np.asarray([1.0 - ext, ext])
        conc = rng.uniform(8.0, 60.0)
        out.append(rng.dirichlet(np.maximum(conc * mean, 0.05)))
    return np.clip(np.asarray(out, np.float32), 1e-7, 1.0)


def train_mixture(key, data, num_components, steps, lr=0.05, log=print):
    import jax
    import jax.numpy as jnp
    import optax

    from hmm_layer_tpu.models import DirichletMixture

    model = DirichletMixture(
        num_components,
        data.shape[-1],
        use_dirichlet_process=True,
        number_of_examples=data.shape[0],
    )
    params = model.init_params(key)
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    data = jnp.asarray(data)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(
            lambda p: model.loss(p, data, training=True)
        )(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(steps):
        params, opt_state, loss = step(params, opt_state)
        if i % max(steps // 10, 1) == 0:
            log(f"  step {i}: loss {float(loss):.4f}")
    log(f"  final: loss {float(loss):.4f}")
    return model, params


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--samples", type=int, default=20000)
    parser.add_argument(
        "--quick", action="store_true", help="tiny run for smoke tests"
    )
    parser.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(__file__), "..", "hmm_layer_tpu", "trained_priors"
        ),
    )
    args = parser.parse_args(argv)
    if args.quick:
        args.steps, args.samples = 100, 500

    import jax

    jax.config.update("jax_platforms", "cpu")
    from hmm_layer_tpu.models.dirichlet import save_mixture_model

    rng = np.random.default_rng(42)
    os.makedirs(args.out, exist_ok=True)

    jobs = [
        ("amino_prior_9", sample_amino_columns(rng, args.samples), 9),
        (
            "match_prior_1",
            sample_transition_triples(rng, args.samples, "match"),
            1,
        ),
        (
            "insert_prior_1",
            sample_transition_triples(rng, args.samples, "insert"),
            1,
        ),
        (
            "delete_prior_1",
            sample_transition_triples(rng, args.samples, "delete"),
            1,
        ),
    ]
    for i, (name, data, k) in enumerate(jobs):
        print(f"training {name} ({k} components, {data.shape[0]} samples)")
        model, params = train_mixture(
            jax.random.PRNGKey(i), data, k, args.steps
        )
        path = os.path.join(args.out, f"{name}.npz")
        save_mixture_model(path, params)
        alpha = np.asarray(model.make_alpha(params))
        print(
            f"  saved {path}: alpha sums {np.sort(alpha.sum(-1))[:3]}..., "
            f"mix {np.round(np.asarray(model.make_mix(params)), 3)}"
        )


if __name__ == "__main__":
    main()
