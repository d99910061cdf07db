"""Reference-equivalent CPU baseline.

The reference (`sukui-genomics-cn/hmm_layer`) publishes no benchmark numbers
(BASELINE.md); its throughput ceiling is an eager PyTorch per-timestep Python
loop (``BaseRNN.py:217-227``) driving the scaled forward/backward cells
(``MsaHmmCell.py:73-106``). This script is our own implementation of that
computational pattern — same math, same O(L·q²) eager loop — used to produce
the CPU baseline that ``bench.py`` compares against.

Workloads (BASELINE.json config 2/3):

* posterior decode (forward+backward) of a 15-state gene-pred HMM over
  (batch=32, L=9999) given precomputed emission probabilities
  (-> benchmarks/baseline_cpu.json), and
* the END-TO-END pipeline from raw inputs — class probabilities plus one-hot
  nucleotides — through emission scoring (3-mer encoding ``kmer.py:3-47`` +
  codon-pattern contraction ``gene_pred_hmm_emitter.py:231-277``) into the
  same posterior decode (-> benchmarks/baseline_cpu_e2e.json).
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
NUM_CLASSES = 15


def make_k_mers_eager(seq, k, pivot_left):
    """Eager-torch 3-mer encoding, same contract as the reference
    (``kmer.py:3-47``): (b, L, 5) one-hot ACGTN -> (b, L, 4**(k-1), 4)."""
    L_ = seq.shape[-2]
    n = seq.shape[-1] - 1
    s = seq[..., :-1] + seq[..., -1:] / n
    pad = torch.full(s.shape[:-2] + (k - 1, n), 1.0 / n, dtype=s.dtype)
    if pivot_left:
        padded = torch.cat([s, pad], dim=-2)
        k_mers = padded[..., :L_, None, :]
        iteration = range(1, k)
    else:
        padded = torch.cat([pad, s], dim=-2)
        k_mers = padded[..., k - 1 : L_ + k - 1, None, :]
        iteration = range(k - 2, -1, -1)
    for i in iteration:
        shift_i = padded[..., i : L_ + i, None, :, None]
        k_mers = k_mers[..., None, :] * shift_i
        width = 4**i if pivot_left else 4 ** (k - i - 1)
        k_mers = k_mers.reshape(k_mers.shape[:-3] + (width, n))
    return k_mers


def emissions_eager(B_mat, codon_probs, class_inputs, nucleotides):
    """Reference-equivalent 15-state emission scoring
    (``gene_pred_hmm_emitter.py:231-277``): class einsum x codon factor."""
    emit = class_inputs @ B_mat.t()  # (b, L, Q)
    left = make_k_mers_eager(nucleotides, 3, True).reshape(B, L, 64)
    right = make_k_mers_eager(nucleotides, 3, False).reshape(B, L, 64)
    left_factor = left @ torch.as_tensor(codon_probs[0]).t()
    right_factor = right @ torch.as_tensor(codon_probs[1]).t()
    codon_factor = left_factor * right_factor  # (b, L, 9)
    unconstrained = torch.full((B, L, 6), 1.0 / 4096.0)
    return emit * torch.cat([unconstrained, codon_factor], dim=-1)


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

    # --- end-to-end: class probs + nucleotides -> emissions -> posterior ------
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from hmm_layer_tpu.models.gene_pred_emissions import GenePredEmissions

    emitter = GenePredEmissions(
        start_codons=[("ATG", 1.0)],
        stop_codons=[("TAG", 0.34), ("TAA", 0.33), ("TGA", 0.33)],
        intron_begin_pattern=[("NGT", 0.99), ("NGC", 0.005), ("NAT", 0.005)],
        intron_end_pattern=[("AGN", 0.99), ("ACN", 0.01)],
    )
    codon_probs = emitter.codon_probs  # (2, 9, 64) fixed tables
    B_mat = torch.tensor(
        rng.dirichlet(np.ones(NUM_CLASSES), size=Q).astype(np.float32)
    )
    class_inputs = torch.tensor(
        rng.dirichlet(np.ones(NUM_CLASSES), size=(B, L)).astype(np.float32)
    )
    nucleotides = torch.tensor(
        np.eye(5, dtype=np.float32)[rng.integers(0, 4, size=(B, L))]
    )

    with torch.no_grad():
        t0 = time.perf_counter()
        E2 = emissions_eager(B_mat, codon_probs, class_inputs, nucleotides)
        emission_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        posterior_eager(init, A, torch.clamp(E2, min=EPS))
        decode_s = time.perf_counter() - t0

    e2e = emission_s + decode_s
    result_e2e = {
        "workload": (
            "END-TO-END class probs + nucleotides -> k-mer + codon emission "
            "scoring -> posterior (fwd+bwd), 15-state gene-pred, b=32, L=9999"
        ),
        "implementation": "eager torch (reference-equivalent)",
        "elapsed_s": e2e,
        "emission_s": emission_s,
        "decode_s": decode_s,
        "seqs_per_sec": B / e2e,
        "threads": torch.get_num_threads(),
    }
    path = os.path.join(os.path.dirname(__file__), "baseline_cpu_e2e.json")
    with open(path, "w") as f:
        json.dump(result_e2e, f, indent=2)
    print(json.dumps(result_e2e))


if __name__ == "__main__":
    main()
