"""Reference-equivalent CPU baseline for config-5 training (q=505, L=10k).

The reference has no sparse compute path: a 505-state multi-copy gene-pred
model would run as a dense ``(q, q)`` matrix built by scattering the edge
logits (``Transitioner.py:337-380`` ``make_transition_matrix_from_indices``)
driven by the eager per-timestep Python loop (``BaseRNN.py:217-227``), with
gradients from autograd. This script reproduces that pattern at the
BASELINE config-5 shape (k=36 grammar -> q=505, L=10,000) for both
training objectives measured in ``sparse_train_bench.py``:

* MAP: scaled forward -> -mean loglik -> backward.
* posterior-CE: scaled forward + backward recursions -> posterior ->
  label cross-entropy -> backward.

``b=1`` (a single eager step at b=8 takes minutes on this 1-core host);
throughput extrapolates linearly in b for a Python-loop engine — the
``seqs_per_sec`` recorded IS the per-sequence rate. It deliberately
excludes emission scoring and priors (favors torch).

Writes benchmarks/baseline_cpu_config5.json.
"""

import json
import os
import sys
import time

import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

K, L, B = 36, 10_000, 1
EPS = 1e-16


def build_grammar():
    from hmm_layer_tpu.models import GenePredMultiTransitions

    trans = GenePredMultiTransitions(k=K)
    return trans.num_states, np.asarray(trans.make_transition_indices())


def make_A(edge_logits, indices, q):
    """Dense A via scatter + masked row softmax (the reference's
    make_transition_matrix_from_indices pattern)."""
    dense = torch.full((q, q), -1e30)
    dense = dense.index_put(
        (torch.tensor(indices[:, 0]), torch.tensor(indices[:, 1])),
        edge_logits,
    )
    return torch.softmax(dense, dim=-1)


def forward_scaled(init, A, E):
    """(log_alpha list or final, ll) — eager per-timestep loop."""
    alpha = torch.clamp(E[:, 0] * init[None, :], min=EPS)
    z = alpha.sum(-1, keepdim=True)
    alpha = alpha / z
    ll = torch.log(z[..., 0])
    las = [torch.log(alpha) + ll[..., None]]
    for t in range(1, L):
        r = alpha @ A
        s = torch.clamp(E[:, t] * r, min=EPS)
        z = s.sum(-1, keepdim=True)
        alpha = s / z
        ll = ll + torch.log(z[..., 0])
        las.append(torch.log(alpha) + ll[..., None])
    return las, ll


def backward_scaled(A, E):
    beta = torch.ones_like(E[:, 0])
    ll = torch.zeros(E.shape[0])
    lbs = [torch.zeros_like(beta)]
    At = A.T
    for t in range(L - 2, -1, -1):
        r = torch.clamp(E[:, t + 1], min=EPS) * beta
        s = torch.clamp(r @ At, min=EPS)
        z = s.max(-1, keepdim=True).values
        beta = s / z
        ll = ll + torch.log(z[..., 0])
        lbs.append(torch.log(beta) + ll[..., None])
    lbs.reverse()
    return lbs


def map_step(edge_logits, indices, q, init, E):
    A = make_A(edge_logits, indices, q)
    _, ll = forward_scaled(init, A, E)
    loss = -ll.mean()
    loss.backward()
    return loss


def ce_step(edge_logits, indices, q, init, E, labels):
    A = make_A(edge_logits, indices, q)
    las, ll = forward_scaled(init, A, E)
    lbs = backward_scaled(A, E)
    la = torch.stack(las, dim=1)  # (b, L, q)
    lb = torch.stack(lbs, dim=1)
    lg = la + lb - ll[..., None, None]
    ce = -lg.gather(-1, labels[..., None])[..., 0].mean()
    ce.backward()
    return ce


def time_step(fn, edge_logits, reps=2):
    fn()  # warmup
    times = []
    for _ in range(reps):
        edge_logits.grad = None
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 8)
    rng = np.random.default_rng(0)
    q, indices = build_grammar()
    print(f"q={q}, edges={len(indices)}, L={L}, b={B}", file=sys.stderr)

    init = torch.tensor(np.full(q, 1.0 / q, np.float32))
    E = torch.tensor(
        rng.uniform(0.05, 1.0, size=(B, L, q)).astype(np.float32)
    )
    labels = torch.tensor(rng.integers(0, q, size=(B, L)))
    edge_logits = torch.tensor(
        rng.normal(size=len(indices)).astype(np.float32), requires_grad=True
    )

    map_s = time_step(
        lambda: map_step(edge_logits, indices, q, init, E), edge_logits
    )
    print(f"MAP step: {map_s:.1f} s", file=sys.stderr, flush=True)
    ce_s = time_step(
        lambda: ce_step(edge_logits, indices, q, init, E, labels),
        edge_logits,
    )
    print(f"CE step: {ce_s:.1f} s", file=sys.stderr, flush=True)

    result = {
        "workload": (
            f"config-5 train step equivalent (q={q} dense, b={B}, L={L}): "
            "scatter+softmax A, scaled forward (+backward for CE), autograd"
        ),
        "implementation": (
            "eager torch per-timestep python loop (reference-equivalent; "
            "reference has no sparse compute path)"
        ),
        "map_step_s": map_s,
        "map_seqs_per_sec": B / map_s,
        "ce_step_s": ce_s,
        "ce_seqs_per_sec": B / ce_s,
        "threads": torch.get_num_threads(),
        "cpu_count": os.cpu_count(),
    }
    path = os.path.join(
        os.path.dirname(__file__), "baseline_cpu_config5.json"
    )
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
