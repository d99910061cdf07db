"""Reference-equivalent CPU baseline.

The reference (`sukui-genomics-cn/hmm_layer`) publishes no benchmark numbers
(BASELINE.md); its throughput ceiling is an eager PyTorch per-timestep Python
loop (``BaseRNN.py:217-227``) driving the scaled forward/backward cells
(``MsaHmmCell.py:73-106``). This script is our own implementation of that
computational pattern — same math, same O(L·q²) eager loop — used to produce
the CPU baseline that ``bench.py`` compares against.

Workload (BASELINE.json config 2/3): posterior decode (forward+backward) of a
15-state gene-pred HMM over (batch=32, L=9999) given precomputed emission
probabilities.

Writes benchmarks/baseline_cpu.json.
"""

import json
import os
import time

import numpy as np
import torch

Q = 15
B = 32
L = 9999
EPS = 1e-16


def posterior_eager(init, A, E):
    """Scaled forward + backward posterior with a per-step Python loop."""
    At = A.t().contiguous()
    alpha = torch.clamp(E[:, 0] * init[None, :], min=EPS)
    z = alpha.sum(-1, keepdim=True)
    alpha = alpha / z
    ll = torch.log(z[:, 0])
    log_alphas = [torch.log(alpha) + ll[:, None]]
    for t in range(1, E.shape[1]):
        r = alpha @ A
        s = torch.clamp(E[:, t] * r, min=EPS)
        z = s.sum(-1, keepdim=True)
        alpha = s / z
        ll = ll + torch.log(z[:, 0])
        log_alphas.append(torch.log(alpha) + ll[:, None])

    beta = torch.ones(E.shape[0], Q)
    bll = torch.zeros(E.shape[0])
    log_betas = [torch.zeros(E.shape[0], Q)]
    for t in range(E.shape[1] - 2, -1, -1):
        r = E[:, t + 1] * beta
        s = torch.clamp(r @ At, min=EPS)
        z = s.max(-1, keepdim=True).values
        beta = s / z
        bll = bll + torch.log(z[:, 0])
        log_betas.append(torch.log(beta) + bll[:, None])
    log_betas.reverse()

    la = torch.stack(log_alphas, dim=1)
    lb = torch.stack(log_betas, dim=1)
    return la + lb - ll[:, None, None], ll


def main():
    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 8)
    rng = np.random.default_rng(0)
    init = torch.tensor(rng.dirichlet(np.ones(Q)).astype(np.float32))
    A = torch.tensor(rng.dirichlet(np.ones(Q), size=Q).astype(np.float32))
    E = torch.tensor(rng.uniform(0.05, 1.0, size=(B, L, Q)).astype(np.float32))

    with torch.no_grad():
        t0 = time.perf_counter()
        posterior_eager(init, A, E)
        elapsed = time.perf_counter() - t0

    seqs_per_sec = B / elapsed
    result = {
        "workload": "posterior (fwd+bwd), 15-state gene-pred, b=32, L=9999",
        "implementation": "eager torch per-timestep python loop (reference-equivalent)",
        "elapsed_s": elapsed,
        "seqs_per_sec": seqs_per_sec,
        "threads": torch.get_num_threads(),
    }
    path = os.path.join(os.path.dirname(__file__), "baseline_cpu.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
