"""Reference-equivalent CPU baseline for the profile-HMM train step.

The reference trains profile HMMs (learnMSA transcription) with an eager
per-timestep Python loop (``BaseRNN.py:217-227``) driving the scaled forward
cell, padded across models to the max state count
(``Transitioner.py:282-318``), with gradients from autograd. This script
reproduces that computational pattern at the config-4 shapes
(m=5 models, q=155 padded, b=64, L=400, MAP-style mean-loglik loss) to
anchor ``benchmarks/profile_train_bench.py``.

It deliberately EXCLUDES the Plan7 kernel construction and Dirichlet prior
terms (both included in our measured TPU step) — i.e. it favors torch.

Writes benchmarks/baseline_cpu_profile.json.
"""

import json
import os
import time

import numpy as np
import torch

M, Q, B, L = 5, 155, 64, 400
EPS = 1e-16


def train_step_eager(init, A_kernel, E_kernel, x):
    """One MAP-style step: build params -> scaled forward loglik -> backward."""
    A = torch.softmax(A_kernel, dim=-1)  # (M, Q, Q)
    Bm = torch.softmax(E_kernel, dim=-1)  # (M, Q, s)
    E = torch.einsum("mbls,mqs->mblq", x, Bm)  # emission scoring

    alpha = torch.clamp(E[:, :, 0] * init[:, None, :], min=EPS)
    z = alpha.sum(-1, keepdim=True)
    alpha = alpha / z
    ll = torch.log(z[..., 0])
    for t in range(1, L):  # the reference's per-timestep Python loop
        r = torch.einsum("mbq,mqp->mbp", alpha, A)
        s = torch.clamp(E[:, :, t] * r, min=EPS)
        z = s.sum(-1, keepdim=True)
        alpha = s / z
        ll = ll + torch.log(z[..., 0])
    loss = -ll.mean()
    loss.backward()
    return loss


def main():
    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 8)
    rng = np.random.default_rng(0)
    init = torch.tensor(rng.dirichlet(np.ones(Q), size=M).astype(np.float32))
    A_kernel = torch.tensor(
        rng.normal(size=(M, Q, Q)).astype(np.float32), requires_grad=True
    )
    E_kernel = torch.tensor(
        rng.normal(size=(M, Q, 26)).astype(np.float32), requires_grad=True
    )
    x = torch.tensor(
        np.eye(26, dtype=np.float32)[rng.integers(0, 25, size=(M, B, L))]
    )

    train_step_eager(init, A_kernel, E_kernel, x)  # warmup
    times = []
    for _ in range(3):
        A_kernel.grad = E_kernel.grad = None
        t0 = time.perf_counter()
        train_step_eager(init, A_kernel, E_kernel, x)
        times.append(time.perf_counter() - t0)

    step_s = min(times)
    result = {
        "workload": (
            "profile-HMM MAP train step equivalent (m=5, q=155 padded, "
            "b=64, L=400): emission einsum + scaled forward + autograd"
        ),
        "implementation": "eager torch per-timestep python loop (reference-equivalent)",
        "step_s": step_s,
        "seqs_per_sec": B / step_s,
        "threads": torch.get_num_threads(),
        "cpu_count": os.cpu_count(),
    }
    path = os.path.join(os.path.dirname(__file__), "baseline_cpu_profile.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
