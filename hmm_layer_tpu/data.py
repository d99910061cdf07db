"""Input pipeline: FASTA reading, sequence encoding, windowed batching.

The reference ships no data loading at all (SURVEY.md §5) — users hand it
pre-built tensors. Genomic production use needs a path from sequence files
to device-ready batches; this module provides a small, dependency-free one:

* :func:`read_fasta` — streaming parser (plain or gzip).
* :func:`encode_dna` / :func:`encode_protein` — one-hot encoders matching
  the model families' input conventions (gene-pred: 5-channel ACGTN with
  ambiguity codes spread uniformly; profile: learnMSA-style amino-acid
  alphabet with a terminal symbol appended per sequence).
* :func:`window_batches` — fixed-shape sliding windows over long contigs
  (jit-friendly static shapes; overlap for chunk-border context) batched to
  ``(batch, window, channels)`` with position metadata.
* :func:`pad_batches` — ragged short-sequence batching (profile workloads)
  with terminal-symbol padding, mirroring learnMSA's convention of padding
  with the terminal state's symbol.

Everything returns NumPy; transfer to device happens at jit boundaries
(optionally sharded with :mod:`hmm_layer_tpu.parallel`).
"""

from __future__ import annotations

import gzip
from typing import Iterable, Iterator

import numpy as np

__all__ = [
    "read_fasta",
    "encode_dna",
    "encode_protein",
    "window_batches",
    "pad_batches",
    "PROTEIN_ALPHABET",
]

# learnMSA-style amino-acid alphabet: 20 canonical + B/Z/X/U/O specials;
# the terminal symbol is channel len(PROTEIN_ALPHABET) (appended, not here).
PROTEIN_ALPHABET = "ARNDCQEGHILKMFPSTWYVBZXUO"

_DNA = "ACGT"
# IUPAC ambiguity codes -> the set of bases they may stand for.
_IUPAC = {
    "R": "AG", "Y": "CT", "S": "CG", "W": "AT", "K": "GT", "M": "AC",
    "B": "CGT", "D": "AGT", "H": "ACT", "V": "ACG", "N": "ACGT",
}


def read_fasta(path) -> Iterator[tuple[str, str]]:
    """Yield ``(header, sequence)`` pairs; supports ``.gz`` transparently."""
    opener = gzip.open if str(path).endswith(".gz") else open
    name, parts = None, []
    with opener(path, "rt") as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            if line.startswith(">"):
                if name is not None:
                    yield name, "".join(parts)
                name, parts = line[1:].split()[0] if len(line) > 1 else "", []
            else:
                parts.append(line)
    if name is not None:
        yield name, "".join(parts)


def encode_dna(seq: str, dtype=np.float32) -> np.ndarray:
    """(L, 5) one-hot over ACGTN; IUPAC ambiguity codes spread uniformly.

    Matches the gene-pred emitters' nucleotide channels
    (``ops.kmer`` treats channel 4, 'N', as a uniform 1/4 over ACGT).
    """
    out = np.zeros((len(seq), 5), dtype)
    for i, ch in enumerate(seq.upper()):
        j = _DNA.find(ch)
        if j >= 0:
            out[i, j] = 1.0
        elif ch == "N" or ch not in _IUPAC:
            out[i, 4] = 1.0
        else:
            bases = _IUPAC[ch]
            for bb in bases:
                out[i, _DNA.index(bb)] = 1.0 / len(bases)
    return out


def encode_protein(
    seq: str, alphabet: str = PROTEIN_ALPHABET, add_terminal: bool = True,
    dtype=np.float32,
) -> np.ndarray:
    """(L[+1], len(alphabet)+1) one-hot; unknown letters spread uniformly
    over the 20 canonical channels; the terminal symbol (last channel) is
    appended when ``add_terminal`` (profile-HMM convention)."""
    s = len(alphabet) + 1
    L = len(seq) + (1 if add_terminal else 0)
    out = np.zeros((L, s), dtype)
    for i, ch in enumerate(seq.upper()):
        j = alphabet.find(ch)
        if j >= 0:
            out[i, j] = 1.0
        else:
            out[i, :20] = 1.0 / 20.0
    if add_terminal:
        out[-1, s - 1] = 1.0
    return out


def window_batches(
    encoded: np.ndarray,
    window: int,
    batch_size: int,
    overlap: int = 0,
    pad_value: float = 0.0,
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Slide fixed windows over one long encoded contig and batch them.

    Yields ``(batch (b, window, s), starts (b,))`` with the last window
    right-padded by ``pad_value``. ``overlap`` gives downstream chunk-border
    context (e.g. codon patterns at window edges).
    """
    if overlap >= window:
        raise ValueError(f"overlap={overlap} must be < window={window}")
    L, s = encoded.shape
    stride = window - overlap
    starts = list(range(0, max(L - overlap, 1), stride))
    buf, pos = [], []
    for st in starts:
        chunk = encoded[st : st + window]
        if chunk.shape[0] < window:
            chunk = np.concatenate(
                [
                    chunk,
                    np.full((window - chunk.shape[0], s), pad_value, encoded.dtype),
                ]
            )
        buf.append(chunk)
        pos.append(st)
        if len(buf) == batch_size:
            yield np.stack(buf), np.asarray(pos)
            buf, pos = [], []
    if buf:
        while len(buf) < batch_size:  # static shapes for jit caching
            buf.append(np.full((window, s), pad_value, encoded.dtype))
            pos.append(-1)
        yield np.stack(buf), np.asarray(pos)


def pad_batches(
    encoded: Iterable[np.ndarray], batch_size: int, terminal_channel: int = -1
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Batch ragged sequences, padding with the terminal symbol.

    Yields ``(batch (b, L_max, s), lengths (b,))`` per batch; short
    sequences continue emitting the terminal symbol (the profile HMM's
    absorbing terminal state makes the padded loglik equal the unpadded
    one, learnMSA's convention).
    """
    group = []
    for e in encoded:
        group.append(e)
        if len(group) == batch_size:
            yield _pad_group(group, terminal_channel)
            group = []
    if group:
        yield _pad_group(group, terminal_channel)


def _pad_group(group, terminal_channel):
    s = group[0].shape[-1]
    L_max = max(g.shape[0] for g in group)
    batch = np.zeros((len(group), L_max, s), group[0].dtype)
    lengths = np.zeros((len(group),), np.int32)
    for i, g in enumerate(group):
        batch[i, : g.shape[0]] = g
        batch[i, g.shape[0] :, terminal_channel] = 1.0
        lengths[i] = g.shape[0]
    return batch, lengths
