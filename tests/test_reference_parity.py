"""Direct numerical parity against the reference torch implementation.

Runs the reference's own code (mounted read-only at /root/reference) on the
same inputs/default parameters and compares. Skipped when the reference or
torch is unavailable. Where the reference's output is wrong due to its
documented transcription defects (PARITY.md), the comparison targets the
correct subset.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/hmm_layer"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference not mounted"
)
torch = pytest.importorskip("torch")

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


class TestKmerParity:
    def test_make_k_mers_bitwise(self):
        import kmer as ref_kmer
        from hmm_layer_tpu.ops import kmer as my_kmer

        rng = np.random.default_rng(0)
        nucs = jax.nn.one_hot(
            jnp.asarray(rng.integers(0, 5, size=(2, 9))), 5, dtype=jnp.float32
        )
        for pivot in (True, False):
            mine = np.asarray(my_kmer.make_k_mers(nucs, k=3, pivot_left=pivot))
            ref = ref_kmer.make_k_mers(
                torch.tensor(np.asarray(nucs)), k=3, pivot_left=pivot
            ).numpy()
            np.testing.assert_array_equal(mine, ref)

    def test_encode_kmer_string_bitwise(self):
        import kmer as ref_kmer
        from hmm_layer_tpu.ops import kmer as my_kmer

        for s in ("ATG", "NGT", "AGN", "TAA"):
            for pivot in (True, False):
                mine = np.asarray(my_kmer.encode_kmer_string(s, pivot_left=pivot))
                ref = np.asarray(ref_kmer.encode_kmer_string(s, pivot_left=pivot))
                np.testing.assert_array_equal(mine, ref)


class TestTransitionParity:
    def test_simple_gene_pred_initial_distribution_exact(self):
        from gene_pred_hmm_transitioner import SimpleGenePredHMMTransitioner
        from hmm_layer_tpu.models import SimpleGenePredTransitions

        t = SimpleGenePredHMMTransitioner()
        init_ref = t.make_initial_distribution().detach().numpy()[0, 0]
        mt = SimpleGenePredTransitions()
        init, _ = mt.matrices(mt.init_params(jax.random.PRNGKey(0)))
        np.testing.assert_array_equal(np.asarray(init)[0], init_ref)

    def test_simple_gene_pred_A_matches_on_nonzero_logit_edges(self):
        # The reference's dense-ification silently deletes edges whose
        # kernel logit is exactly 0.0 (PARITY.md defect); on all OTHER
        # entries the matrices must agree to fp.
        from gene_pred_hmm_transitioner import SimpleGenePredHMMTransitioner
        from hmm_layer_tpu.models import SimpleGenePredTransitions

        t = SimpleGenePredHMMTransitioner()
        A_ref = t.make_A().detach().numpy()[0]
        kernel = t.transition_kernel.detach().numpy().reshape(-1)
        idx = np.asarray(t.indices)[:, 1:]

        mt = SimpleGenePredTransitions()
        _, A = mt.matrices(mt.init_params(jax.random.PRNGKey(0)))
        A = np.asarray(A)[0]

        # Entries the reference DROPS (0.0-logit edges) must be nonzero in
        # ours (the intended grammar) and zero in the reference's.
        dropped = [tuple(e) for e, kv in zip(idx.tolist(), kernel) if kv == 0.0]
        assert dropped, "expected some 0.0-logit edges under default init"
        for i, j in dropped:
            assert A[i, j] > 0.0
            assert A_ref[i, j] == 0.0

        # Everywhere else: the reference renormalizes rows after dropping,
        # so compare ratios within each row's surviving edges.
        for i in range(A.shape[0]):
            kept = [j for j in range(A.shape[1]) if A_ref[i, j] > 0]
            if len(kept) < 2:
                continue
            mine_r = A[i, kept] / A[i, kept].sum()
            ref_r = A_ref[i, kept] / A_ref[i, kept].sum()
            np.testing.assert_allclose(mine_r, ref_r, rtol=1e-5)


class TestUtilityParity:
    def test_fill_triangular_roundtrip_matches(self):
        from Utility import fill_triangular as ref_fill
        from hmm_layer_tpu.utils.bijectors import fill_triangular

        x = np.arange(1.0, 11.0, dtype=np.float32)  # d=4 lower triangle
        mine = np.asarray(fill_triangular(jnp.asarray(x)))
        ref = ref_fill(torch.tensor(x)).numpy()
        np.testing.assert_array_equal(mine, ref)

    def test_lg_paml_data_matches(self):
        import Utility as ref_util
        from hmm_layer_tpu.utils import substitution

        if not hasattr(ref_util, "alphabet"):
            pytest.skip("reference Utility exposes no alphabet")
        R_ref, p_ref = ref_util.parse_paml(
            ref_util.LG_paml[:-1], ref_util.alphabet[:20]
        )
        R, p = substitution.lg_matrix(desired_alphabet=ref_util.alphabet[:20])
        np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R_ref), rtol=1e-6)
