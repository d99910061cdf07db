"""Distributed training and decoding through the mesh-aware flagship API.

Demonstrates the multi-chip workflow end to end on whatever devices are
available (a TPU slice in production; a virtual CPU mesh for local runs):

1. build a ``jax.sharding.Mesh`` over the devices (``data`` x ``seq``),
2. construct ``HMMLayer(mesh=..., partition=...)`` — every method
   (``loss``, ``log_likelihood``, ``state_posterior_log_probs``,
   ``viterbi``) then routes through the sharded engine, with MAP priors,
   sequence weights and multiple emitters intact,
3. train with ``Trainer`` (it adopts the layer's partition and places each
   batch with the sequence axis sharded over ``seq`` and the batch axis
   over ``data``),
4. decode posterior marginals and Viterbi paths with the same layer.

On a multi-host pod, call ``hmm_layer_tpu.parallel.init_distributed()``
first; nothing else changes.

Run locally on a virtual 8-device mesh:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/distributed_training.py --force-cpu
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--length", type=int, default=128)
    parser.add_argument(
        "--force-cpu", action="store_true",
        help="force the CPU backend (local virtual-mesh runs)",
    )
    args = parser.parse_args(argv)

    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from hmm_layer_tpu.layer import HMMLayer
    from hmm_layer_tpu.models import (
        SimpleGenePredEmissions,
        SimpleGenePredTransitions,
    )
    from hmm_layer_tpu.parallel.sharding import make_mesh
    from hmm_layer_tpu.training import Trainer

    devices = jax.devices()
    n = len(devices)
    seq_n = 2 if n % 2 == 0 and n >= 2 else 1
    data_n = n // seq_n
    mesh = make_mesh({"data": data_n, "seq": seq_n}, devices)
    print(f"mesh: data={data_n} seq={seq_n} over {n} {devices[0].platform} devices")

    q = 7
    layer = HMMLayer(
        SimpleGenePredTransitions(),
        SimpleGenePredEmissions(),
        use_prior=True,
        num_seqs=args.batch * args.steps,
        mesh=mesh,
        partition={"batch": "data", "seq": "seq"},
    )
    trainer = Trainer(layer)
    params, opt_state = trainer.init(jax.random.PRNGKey(0), input_dim=q)

    # Synthetic class-probability inputs; b must be divisible by the data
    # axis and L by the seq axis.
    b = -(-args.batch // data_n) * data_n
    L = -(-args.length // seq_n) * seq_n
    rng = np.random.default_rng(0)
    batches = [
        jnp.asarray(rng.uniform(0.1, 1.0, (1, b, L, q)).astype(np.float32))
        for _ in range(args.steps)
    ]

    loss0 = float(np.asarray(layer.loss(params, batches[0])))
    params, opt_state, _ = trainer.fit(params, opt_state, batches, log_every=5)
    loss1 = float(np.asarray(layer.loss(params, batches[0])))
    print(f"loss on batch 0: {loss0:.4f} -> {loss1:.4f} after {args.steps} sharded steps")

    lg = layer.state_posterior_log_probs(params, batches[0])
    paths = layer.viterbi(params, batches[0])
    print(
        f"posterior {tuple(lg.shape)} finite={bool(np.isfinite(np.asarray(lg)).all())}; "
        f"viterbi states in [0, {int(np.asarray(paths).max())}]"
    )
    return 0 if loss1 < loss0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
