"""Planted-embedding recovery for the Tiberius MVN emission mode.

``emit_embeddings`` (`/root/reference/hmm_layer/gene_pred_hmm_emitter.py:101-112`)
scores upstream-network embedding vectors with a trainable MVN mixture per
state. Proof strategy (VERDICT round-4 item 5): simulate a genome whose
class probabilities are essentially destroyed (noise=0.95 — past the
round-4 noise-sweep breakdown point; the class-only control trains to
gene F1 0.0 / nt F1 ~0.46 here) but whose embeddings carry the class
signal by construction
(:func:`~hmm_layer_tpu.models.simulate.simulate_embeddings`); train the
MVN emitter supervised and show held-out decode recovers what the
class-only control cannot (measured: gene F1 0.71, nt F1 0.99).

Training-stability notes baked into the settings: temperature=2.0 +
adam(0.01) — at temperature 1.0 / lr 0.02 the MVN sharpens until a
component collapses mid-training (gene F1 0.73 at 40 steps -> 0.0 at 80);
and the emitter max-shifts the log-density per position before
exponentiating (see gene_pred_emissions.py), without which the raw
density overflows f32 after ~20 steps (NaN loss).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from hmm_layer_tpu import data
from hmm_layer_tpu.layer import HMMLayer
from hmm_layer_tpu.models import (
    GenePredEmissions,
    GenePredTransitions,
    evaluate_annotation,
    flip_genes,
    genes_to_states,
    paths_to_genes,
    simulate_embeddings,
    simulate_genome,
)
from hmm_layer_tpu.models.initializers import make_15_class_emission_kernel
from hmm_layer_tpu.training import Trainer

NOISE = 0.95
DIM = 8
CODONS = dict(
    start_codons=[("ATG", 1.0)],
    stop_codons=[("TAG", 0.34), ("TAA", 0.33), ("TGA", 0.33)],
    intron_begin_pattern=[("NGT", 0.99), ("NGC", 0.005), ("NAT", 0.005)],
    intron_end_pattern=[("AGN", 0.99), ("ACN", 0.01)],
)


def make_layer(emit_embeddings: bool):
    return HMMLayer(
        GenePredTransitions(),
        GenePredEmissions(
            **CODONS,
            init=make_15_class_emission_kernel(),
            emit_embeddings=emit_embeddings,
            embedding_dim=DIM if emit_embeddings else None,
            temperature=2.0,
        ),
    )


def genome_tracks(sim):
    """(track_fwd, track_rc) 15-state label tracks of both readings."""
    L = sim.length
    plus = [g for g in sim.genes if g.strand == "+"]
    minus_fwd = []
    for g in sim.genes:
        if g.strand == "-":
            (g_rc,) = flip_genes([g], L)
            g_rc.strand = "+"
            minus_fwd.append(g_rc)
    return (
        genes_to_states(plus, L, num_states=15),
        genes_to_states(minus_fwd, L, num_states=15),
    )


def genome_inputs(sim, rng, means, with_embeddings: bool):
    """Both strand readings as (L, 15 [+ DIM] + 5) decoder inputs."""
    oh = sim.onehot()
    t_f, t_r = genome_tracks(sim)
    rows = []
    for cls, nucs, track in (
        (sim.class_probs, oh, t_f),
        (sim.class_probs_rc, data.revcomp_onehot(oh), t_r),
    ):
        parts = [cls]
        if with_embeddings:
            emb, _ = simulate_embeddings(
                rng, track, dim=DIM, means=means
            )
            parts.append(emb)
        parts.append(nucs)
        rows.append(np.concatenate(parts, -1))
    return rows[0], rows[1], t_f, t_r


def train_and_score(with_embeddings: bool, steps=100):
    rng = np.random.default_rng(0)
    _, means = simulate_embeddings(
        rng, np.zeros(1, np.int64), dim=DIM, separation=3.0
    )
    sim_tr = simulate_genome(
        np.random.default_rng(42), num_genes=8, noise=NOISE
    )
    sim_te = simulate_genome(
        np.random.default_rng(7), num_genes=6, noise=NOISE
    )
    layer = make_layer(with_embeddings)
    x_f, x_r, t_f, t_r = genome_inputs(sim_tr, rng, means, with_embeddings)
    batch = {
        "x": jnp.asarray(np.stack([x_f, x_r])[None]),
        "labels": jnp.asarray(np.stack([t_f, t_r])[None]),
    }
    trainer = Trainer(
        layer,
        optimizer=optax.adam(0.01),
        loss_fn=lambda p, b, i: layer.posterior_cross_entropy(
            p, b["x"], b["labels"]
        ),
    )
    params, opt_state = trainer.init(jax.random.PRNGKey(0), input_dim=15)
    params, _, loss = trainer.fit(
        params, opt_state, batches=(batch for _ in range(steps))
    )

    xe_f, xe_r, _, _ = genome_inputs(
        sim_te, np.random.default_rng(1), means, with_embeddings
    )
    tf = np.asarray(layer.viterbi(params, jnp.asarray(xe_f[None, None])))[0, 0]
    tr = np.asarray(layer.viterbi(params, jnp.asarray(xe_r[None, None])))[0, 0]
    genes = paths_to_genes(tf, num_states=15)
    genes += flip_genes(paths_to_genes(tr, num_states=15), sim_te.length)
    mets = evaluate_annotation({"c": genes}, {"c": sim_te.genes})
    return float(loss), mets


class TestEmbeddingEmissions:
    def test_embeddings_rescue_heldout_decode_at_high_noise(self):
        """At noise=0.95 the class channel alone cannot recover the
        held-out genome; the trained MVN embedding emitter can."""
        loss_e, mets_e = train_and_score(with_embeddings=True)
        loss_c, mets_c = train_and_score(with_embeddings=False)
        assert np.isfinite(loss_e)
        # the MVN channel must deliver clearly better structure recovery
        assert (
            mets_e["gene"]["f1"] >= mets_c["gene"]["f1"] + 0.3
        ), (mets_e["gene"], mets_c["gene"])
        assert mets_e["gene"]["f1"] >= 0.6, mets_e["gene"]
        assert mets_e["nucleotide"]["f1"] >= 0.95, mets_e["nucleotide"]

    def test_mvn_params_train(self):
        """The MVN kernel actually moves (gets gradients) under CE."""
        layer = make_layer(True)
        params = layer.init_params(jax.random.PRNGKey(0), input_dim=15)
        rng = np.random.default_rng(3)
        sim = simulate_genome(rng, num_genes=2, noise=0.5)
        _, means = simulate_embeddings(
            rng, np.zeros(1, np.int64), dim=DIM, separation=3.0
        )
        x_f, _, t_f, _ = genome_inputs(sim, rng, means, True)
        g = jax.grad(
            lambda p: layer.posterior_cross_entropy(
                p, jnp.asarray(x_f[None, None]), jnp.asarray(t_f[None, None])
            )
        )(params)
        gk = np.asarray(g["emissions"][0]["embedding_emission_kernel"])
        assert np.all(np.isfinite(gk)) and np.any(gk != 0)
