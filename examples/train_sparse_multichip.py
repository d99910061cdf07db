"""Config-5 distributed training: a 505-state sparse model over a mesh.

Demonstrates the two mesh compositions of the sparse (edge-list) engine
through the flagship API (no hand-rolled sharding):

* data parallel — the SPEED lever: shard the batch axis, XLA psums the
  gradients; the q=505 step is scan-latency-bound so batch is nearly free
  (BASELINE.md: 20.8 -> 149 seqs/sec from b=8 -> 64 on ONE chip; more
  chips extend that curve).
* edge-sharded state parallel — the CAPACITY lever: every O(L·q) tensor
  is cut 1/n per device (see docs/API.md for the measured regime
  argument; at q=14,001 an 8-way shard moves the HBM batch bound ~8x).

Runs on any device count (use the virtual CPU mesh to try it:
``XLA_FLAGS=--xla_force_host_platform_device_count=8``
``JAX_PLATFORMS=cpu python examples/train_sparse_multichip.py`` — the
script force-selects the CPU platform via jax.config when that env var
is set, which the env var alone does not guarantee on hosts that
auto-register an accelerator plugin).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # An env var alone does not override auto-registered accelerator
    # plugins (e.g. sitecustomize TPU hooks); the config call does.
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from hmm_layer_tpu.layer import HMMLayer
from hmm_layer_tpu.models import GenePredMultiTransitions
from hmm_layer_tpu.parallel import make_mesh
from hmm_layer_tpu.training import Trainer


class RawEmissions:
    """Pass-through emitter: inputs ARE per-state emission probabilities
    (stand-in for an upstream network head)."""

    def init_params(self, key, input_dim):
        return {}

    def emissions(self, params, inputs, end_hints=None, training=False):
        return inputs

    def prior_log_density(self, params):
        return jnp.zeros((1,))

    def aux_loss(self, params):
        return jnp.zeros(())


def main():
    n = len(jax.devices())
    k = 4  # q = 1 + 14k = 57; scale k up to 36 (config 5) or 1000
    trans = GenePredMultiTransitions(k=k, sparse_forward=True)
    q = trans.num_states
    rng = np.random.default_rng(0)
    print(f"{n} devices, q={q}, {trans.indices.shape[0]} edges")

    # ---- data-parallel MAP training -------------------------------------
    mesh = make_mesh({"data": n})
    layer = HMMLayer(
        trans, RawEmissions(), use_prior=False,
        mesh=mesh, partition={"batch": "data"},
    )
    trainer = Trainer(layer)
    params, opt_state = trainer.init(jax.random.PRNGKey(0), input_dim=q)
    x = jnp.asarray(
        rng.uniform(0.05, 1.0, (1, 4 * n, 256, q)).astype(np.float32)
    )
    params, opt_state, loss = trainer.fit(
        params, opt_state, [x] * 5, log_every=1
    )
    print(f"data-parallel MAP loss: {float(np.asarray(loss)):.3f}")

    # ---- edge-sharded state-parallel training + decode ------------------
    if n >= 2:
        smesh = make_mesh({"state": n})
        slayer = HMMLayer(
            trans, RawEmissions(), use_prior=False,
            mesh=smesh, partition={"state": "state"},  # q auto-pads
        )
        strainer = Trainer(slayer)
        sparams, sopt = strainer.init(jax.random.PRNGKey(1), input_dim=q)
        xs = jnp.asarray(
            rng.uniform(0.05, 1.0, (1, 4, 256, q)).astype(np.float32)
        )
        sparams, sopt, sloss = strainer.fit(
            sparams, sopt, [xs] * 3, log_every=1
        )
        paths = slayer.viterbi(sparams, xs)
        print(
            f"edge-sharded MAP loss: {float(np.asarray(sloss)):.3f}; "
            f"decoded states span [{int(np.asarray(paths).min())}, "
            f"{int(np.asarray(paths).max())}]"
        )


if __name__ == "__main__":
    main()
