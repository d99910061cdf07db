"""paths_to_msa: Viterbi state paths -> gapped alignment strings."""

import numpy as np
import pytest

from hmm_layer_tpu.models import AMINO_ALPHABET, paths_to_msa, write_msa


def states(Lm):
    """Implicit profile state indices (models/profile_transitions.py)."""
    return dict(
        LF=0,
        M={j: j for j in range(1, Lm + 1)},
        I={j: Lm + j for j in range(1, Lm)},
        U=2 * Lm,
        RF=2 * Lm + 1,
        T=2 * Lm + 2,
    )


class TestPathsToMsa:
    def test_match_insert_delete(self):
        # Lm=3. Seq0: M1 M2 I2 M3 (one insertion after column 2).
        # Seq1: M1 M3 (column 2 deleted), then right flank residue.
        s = states(3)
        paths = np.array(
            [
                [s["M"][1], s["M"][2], s["I"][2], s["M"][3]],
                [s["M"][1], s["M"][3], s["RF"], s["T"]],
            ]
        )
        residues = np.array([[0, 1, 2, 3], [0, 3, 1, 0]])
        rows = paths_to_msa(paths, residues, model_length=3)
        # Insertion block after column 2 width 1 (seq0's insert); right-flank
        # block after column 3 width 1 (seq1's flank residue). Letters come
        # from AMINO_ALPHABET so the test tracks the encoder's ordering.
        A = AMINO_ALPHABET
        assert rows == [
            f"{A[0]}{A[1]}{A[2].lower()}{A[3]}.",
            f"{A[0]}-.{A[3]}{A[1].lower()}",
        ]

    def test_flanks_and_unannotated(self):
        # Lm=2. Seq0: left flank emits 2 residues, M1, M2.
        # Seq1: M1, unannotated residue (anchored after column 1), then M2.
        s = states(2)
        paths = np.array(
            [
                [s["LF"], s["LF"], s["M"][1], s["M"][2]],
                [s["M"][1], s["U"], s["M"][2], s["T"]],
            ]
        )
        residues = np.array([[0, 1, 2, 3], [4, 5, 3, 0]])
        rows = paths_to_msa(paths, residues, model_length=2)
        assert all(len(r) == len(rows[0]) for r in rows)
        A = AMINO_ALPHABET
        # Seq0: two lowercase flank residues before column 1, then columns.
        assert rows[0] == f"{A[0].lower()}{A[1].lower()}{A[2]}.{A[3]}"
        # Seq1: no left flank, match in column 1, one lowercase unannotated
        # residue anchored after column 1, match in column 2.
        assert rows[1] == f"..{A[4]}{A[5].lower()}{A[3]}"

    def test_seq_lengths_and_padding_ignored(self):
        s = states(2)
        paths = np.array([[s["M"][1], s["M"][2], 0, 0]])
        residues = np.array([[0, 1, 0, 0]])
        rows = paths_to_msa(
            paths, residues, model_length=2, seq_lengths=np.array([2])
        )
        assert rows == [AMINO_ALPHABET[0] + AMINO_ALPHABET[1]]

    def test_alphabet_matches_encoder(self):
        """argmax of data.encode_protein output must decode back to the
        original letter through the default MSA alphabet (regression: an
        alphabetical AMINO_ALPHABET printed wrong residues for encoder-
        produced indices)."""
        from hmm_layer_tpu.data import encode_protein

        seq = "ARNDCQEGHILKMFPSTWYV"
        idx = np.argmax(encode_protein(seq, add_terminal=False), axis=-1)
        assert "".join(AMINO_ALPHABET[i] for i in idx) == seq

    def test_multihit_reentry_keeps_sequence_order(self):
        """Insert residues emitted during a multi-hit re-entry (I_k with
        k < last column reached) anchor after the last column so the row
        reads in emission order."""
        s = states(3)
        paths = np.array([[s["M"][3], s["U"], s["M"][1], s["I"][1]]])
        residues = np.array([[0, 1, 2, 3]])
        rows = paths_to_msa(paths, residues, model_length=3)
        A = AMINO_ALPHABET
        assert rows == [
            "--" + A[0] + A[1].lower() + A[2].lower() + A[3].lower()
        ]

    def test_empty_batch(self):
        rows = paths_to_msa(
            np.zeros((0, 5), np.int32), np.zeros((0, 5), np.int32), 3
        )
        assert rows == []

    def test_shape_mismatch_raises(self):
        with pytest.raises(ValueError):
            paths_to_msa(np.zeros((2, 3)), np.zeros((2, 4)), 2)

    def test_write_msa_roundtrip(self, tmp_path):
        from hmm_layer_tpu.data import read_fasta

        rows = ["ACdE.", "A-.Ec"]
        p = tmp_path / "aln.fasta"
        write_msa(p, ["s0", "s1"], rows, width=3)
        back = list(read_fasta(p))
        assert back == [("s0", "ACdE."), ("s1", "A-.Ec")]
        with pytest.raises(ValueError):
            write_msa(p, ["only-one"], rows)

    def test_roundtrip_residues(self):
        # Random (even non-monotone) paths: every residue emitted before
        # the terminal state appears in the row exactly once. Row order is
        # column order, not emission order, so compare as multisets.
        rng = np.random.default_rng(0)
        Lm, b, L = 4, 6, 12
        term = 2 * Lm + 2
        paths = rng.integers(0, term + 1, size=(b, L))
        residues = rng.integers(0, 20, size=(b, L))
        rows = paths_to_msa(paths, residues, model_length=Lm)
        assert all(len(r) == len(rows[0]) for r in rows)
        for i in range(b):
            emitted = []
            for t in range(L):
                if paths[i, t] == term:
                    break
                emitted.append(AMINO_ALPHABET[residues[i, t]])
            got = sorted(c.upper() for c in rows[i] if c not in ".-")
            assert got == sorted(c.upper() for c in emitted)
