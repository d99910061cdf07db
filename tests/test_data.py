"""Input pipeline: FASTA parsing, encoders, windowing, ragged batching."""

import gzip

import numpy as np
import pytest

from hmm_layer_tpu import data


@pytest.fixture
def fasta(tmp_path):
    p = tmp_path / "seqs.fa"
    p.write_text(">chr1 some description\nACGTN\nRYACGT\n>chr2\nTTTT\n")
    return p


class TestFasta:
    def test_read(self, fasta):
        recs = list(data.read_fasta(fasta))
        assert recs == [("chr1", "ACGTNRYACGT"), ("chr2", "TTTT")]

    def test_gzip(self, tmp_path):
        p = tmp_path / "seqs.fa.gz"
        with gzip.open(p, "wt") as fh:
            fh.write(">a\nACGT\n")
        assert list(data.read_fasta(p)) == [("a", "ACGT")]


class TestEncoders:
    def test_dna_onehot(self):
        e = data.encode_dna("ACGTN")
        assert e.shape == (5, 5)
        np.testing.assert_array_equal(e[:4, :4], np.eye(4))
        assert e[4, 4] == 1.0

    def test_dna_iupac_uniform(self):
        e = data.encode_dna("R")  # A or G
        np.testing.assert_allclose(e[0], [0.5, 0, 0.5, 0, 0])

    def test_protein_terminal(self):
        e = data.encode_protein("AR")
        s = len(data.PROTEIN_ALPHABET) + 1
        assert e.shape == (3, s)
        assert e[0, 0] == 1.0 and e[1, 1] == 1.0 and e[2, -1] == 1.0

    def test_protein_unknown_uniform(self):
        e = data.encode_protein("J", add_terminal=False)
        np.testing.assert_allclose(e[0, :20], np.full(20, 0.05))

    def test_revcomp(self):
        assert data.revcomp("ATGCA") == "TGCAT"
        assert data.revcomp("acgtn") == "nacgt"
        # IUPAC: R (A/G) complements to Y (C/T); unknowns become N.
        assert data.revcomp("RYSWKMBDHVN") == "NBDHVKMWSRY"
        assert data.revcomp("AXZ") == "NNT"
        # Involution on unambiguous DNA.
        assert data.revcomp(data.revcomp("GATTACA")) == "GATTACA"

    def test_revcomp_onehot_matches_string_path(self):
        # Channel-permutation reverse complement == encode(revcomp(s)),
        # exactly, for every IUPAC code, case, and unknown bytes.
        seq = "ACGTacgtNRYSWKMBDHVryswkmbdhvXJ? Q"
        np.testing.assert_array_equal(
            data.revcomp_onehot(data.encode_dna(seq)),
            data.encode_dna(data.revcomp(seq)),
        )
        # Involution.
        e = data.encode_dna(seq)
        np.testing.assert_array_equal(
            data.revcomp_onehot(data.revcomp_onehot(e)), e
        )


class TestWindowing:
    def test_covers_and_pads(self):
        enc = data.encode_dna("ACGT" * 25)  # L=100
        batches = list(data.window_batches(enc, window=40, batch_size=2, overlap=10))
        # starts 0, 30, 60 (60+40 covers L=100) -> 2 batches, last one padded
        assert len(batches) == 2
        b0, s0 = batches[0]
        assert b0.shape == (2, 40, 5)
        np.testing.assert_array_equal(s0, [0, 30])
        b1, s1 = batches[1]
        np.testing.assert_array_equal(s1, [60, -1])
        np.testing.assert_array_equal(b1[0], enc[60:100])
        assert b1[1].sum() == 0.0  # batch-fill entry

    def test_short_tail_padded(self):
        enc = data.encode_dna("ACGT" * 26)  # L=104: starts 0,30,60,90
        batches = list(data.window_batches(enc, window=40, batch_size=4, overlap=10))
        (b, s), = batches
        np.testing.assert_array_equal(s, [0, 30, 60, 90])
        np.testing.assert_array_equal(b[3, :14], enc[90:104])
        assert b[3, 14:].sum() == 0.0  # right-padded tail window

    def test_reconstruction(self):
        enc = data.encode_dna("ACGTACGTAC")
        (b, s), = data.window_batches(enc, window=10, batch_size=1)
        np.testing.assert_array_equal(b[0], enc)


class TestRaggedBatching:
    def test_terminal_padding(self):
        seqs = [data.encode_protein(s) for s in ("AR", "ARND")]
        (batch, lengths), = data.pad_batches(seqs, batch_size=2)
        assert batch.shape[0] == 2 and batch.shape[1] == 5
        np.testing.assert_array_equal(lengths, [3, 5])
        # short sequence keeps emitting the terminal symbol
        assert batch[0, 3:, -1].all()

    def test_partial_group_filled_to_batch_size(self):
        seqs = [data.encode_protein("AR")]
        (batch, lengths), = data.pad_batches(seqs, batch_size=3)
        assert batch.shape[0] == 3
        np.testing.assert_array_equal(lengths, [3, 0, 0])
        assert batch[1, :, -1].all() and batch[2, :, -1].all()

    def test_padded_loglik_invariant(self):
        # The absorbing terminal state makes padded loglik equal unpadded:
        # the SHORT sequence of a ragged batch must score the same as alone.
        import jax
        from hmm_layer_tpu.layer import HMMLayer
        from hmm_layer_tpu.models import ProfileEmissions, ProfileTransitions

        layer = HMMLayer(
            ProfileTransitions([4]), ProfileEmissions([4]), use_prior=False
        )
        s = len(data.PROTEIN_ALPHABET) + 1
        params = layer.init_params(jax.random.PRNGKey(0), input_dim=s)
        e_short = data.encode_protein("ARND")
        e_long = data.encode_protein("ARNDCQEG")
        (batch, lengths), = data.pad_batches([e_short, e_long], batch_size=2)
        assert batch.shape[1] == e_long.shape[0] > e_short.shape[0]
        ll_pad = layer.log_likelihood(params, batch[None])
        ll_ref = layer.log_likelihood(params, e_short[None, None])
        np.testing.assert_allclose(
            np.asarray(ll_pad[0, 0]), float(np.asarray(ll_ref[0, 0])), rtol=1e-4
        )
