"""Parity tests: native (C++) FASTA path vs the pure-Python pipeline.

The native scanner (hmm_layer_tpu/native/fasta_io.cpp) must yield byte-for-
byte the same records as ``data._read_fasta_py`` and the same encodings as
``encode_dna``/``encode_protein`` — it is a performance path, not a second
implementation of the format.
"""

import gzip

import numpy as np
import pytest

from hmm_layer_tpu import data
from hmm_layer_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)

# Deliberately hostile FASTA: leading junk before the first header, blank
# lines, CRLF line endings, description after the name, a bare '>', spaces
# after '>', lowercase + IUPAC ambiguity codes, a final record with no
# trailing newline.
TRICKY = (
    "garbage before the first header\n"
    "ACGT\n"
    ">seq1 a description here\n"
    "ACGTacgtNRYK\n"
    "\n"
    "MMWWSS\n"
    ">seq2\r\n"
    "AAAA\r\n"
    "CCCC\r\n"
    ">\n"
    "GGGG\n"
    ">  seq4 desc\n"
    "TT TT\n"
    ">seq5_no_trailing_newline\n"
    "ACGTN"
)


@pytest.fixture
def tricky_path(tmp_path):
    p = tmp_path / "tricky.fa"
    p.write_text(TRICKY)
    return p


def test_read_fasta_parity(tricky_path):
    py = list(data._read_fasta_py(tricky_path))
    nat = list(data._read_fasta_native(native.FastaIndex(tricky_path)))
    assert py == nat
    # Sanity: the fixture exercises the edge cases it claims to.
    assert [n for n, _ in py] == ["seq1", "seq2", "", "seq4",
                                  "seq5_no_trailing_newline"]
    assert dict(py)["seq1"] == "ACGTacgtNRYKMMWWSS"
    assert dict(py)["seq4"] == "TTTT"


def test_public_read_fasta_uses_native(tricky_path, monkeypatch):
    assert data._native_index(tricky_path) is not None
    native_records = list(data.read_fasta(tricky_path))
    monkeypatch.setattr(data, "_use_native_io", False)
    assert data._native_index(tricky_path) is None
    assert list(data.read_fasta(tricky_path)) == native_records


def test_gzip_falls_back(tmp_path):
    p = tmp_path / "x.fa.gz"
    with gzip.open(p, "wt") as fh:
        fh.write(">a\nACGT\n>b\nNNNN\n")
    assert data._native_index(p) is None
    assert list(data.read_fasta(p)) == [("a", "ACGT"), ("b", "NNNN")]


def test_empty_and_headerless_files(tmp_path):
    empty = tmp_path / "empty.fa"
    empty.write_text("")
    assert list(data.read_fasta(empty)) == []
    assert len(native.FastaIndex(empty)) == 0
    junk = tmp_path / "junk.fa"
    junk.write_text("no header at all\nACGT\n")
    assert list(data.read_fasta(junk)) == []
    assert len(native.FastaIndex(junk)) == 0


def test_fused_dna_encoding_parity(tricky_path):
    fused = dict(data.read_fasta_encoded(tricky_path, kind="dna"))
    for name, seq in data._read_fasta_py(tricky_path):
        np.testing.assert_array_equal(fused[name], data.encode_dna(seq))
        assert fused[name].dtype == np.float32


def test_fused_protein_encoding_parity(tmp_path):
    p = tmp_path / "prot.fa"
    p.write_text(">p1\nARNDCQEGHILKMFPSTWYV\n>p2\nbzxuoJ*\n")
    for add_terminal in (True, False):
        fused = dict(
            data.read_fasta_encoded(
                p, kind="protein", add_terminal=add_terminal
            )
        )
        for name, seq in data._read_fasta_py(p):
            np.testing.assert_array_equal(
                fused[name],
                data.encode_protein(seq, add_terminal=add_terminal),
            )


def test_fused_matches_fallback(tricky_path, monkeypatch):
    fused = list(data.read_fasta_encoded(tricky_path, kind="dna"))
    monkeypatch.setattr(data, "_use_native_io", False)
    fallback = list(data.read_fasta_encoded(tricky_path, kind="dna"))
    assert [n for n, _ in fused] == [n for n, _ in fallback]
    for (_, a), (_, b) in zip(fused, fallback):
        np.testing.assert_array_equal(a, b)


def test_index_codes_and_lengths(tricky_path):
    with native.FastaIndex(tricky_path) as idx:
        assert idx.lengths.tolist() == [18, 8, 4, 4, 5]
        # Identity LUT -> raw cleaned bytes.
        assert idx.codes(0).tobytes() == b"ACGTacgtNRYKMMWWSS"
        # Custom byte LUT -> dense class codes (A/a->0, C/c->1, ...).
        lut = np.full(256, 4, np.uint8)
        for j, ch in enumerate("ACGT"):
            lut[ord(ch)] = lut[ord(ch.lower())] = j
        np.testing.assert_array_equal(
            idx.codes(4, lut), np.array([0, 1, 2, 3, 4], np.uint8)
        )

def test_bad_kind_raises(tricky_path):
    with pytest.raises(ValueError):
        list(data.read_fasta_encoded(tricky_path, kind="rna"))
