"""Hardware proof of the Tiberius MVN embedding emission mode.

VERDICT round-4 item 5: ``emit_embeddings``
(``/root/reference/hmm_layer/gene_pred_hmm_emitter.py:101-112``) had
shape tests but no training/quality/hardware evidence. This runs the
planted-embedding experiment of ``tests/test_embeddings.py`` on the real
chip: a simulated genome whose class probabilities are 95% noise (the
class-only control trains to gene F1 0.0 there) but whose embeddings are
drawn from a planted per-class Gaussian; supervised posterior-CE training
of the MVN emitter, held-out both-strand Viterbi decode, F1 vs truth.

Run: python benchmarks/embedding_quality_bench.py
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    import numpy as np
    import jax

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    import test_embeddings as T

    t0 = time.perf_counter()
    loss_e, mets_e = T.train_and_score(with_embeddings=True)
    t_emb = time.perf_counter() - t0
    t0 = time.perf_counter()
    loss_c, mets_c = T.train_and_score(with_embeddings=False)
    t_cls = time.perf_counter() - t0

    print(
        f"MVN-embedding emitter (noise={T.NOISE}, dim={T.DIM}, 100 CE "
        f"steps, wall {t_emb:.0f}s incl. compile): final loss "
        f"{loss_e:.4f}; held-out gene F1 {mets_e['gene']['f1']:.3f}, "
        f"exon F1 {mets_e['exon']['f1']:.3f}, "
        f"nt F1 {mets_e['nucleotide']['f1']:.3f}",
        flush=True,
    )
    print(
        f"class-only control (same data/steps, wall {t_cls:.0f}s): "
        f"loss {loss_c:.4f}; gene F1 {mets_c['gene']['f1']:.3f}, "
        f"exon F1 {mets_c['exon']['f1']:.3f}, "
        f"nt F1 {mets_c['nucleotide']['f1']:.3f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
