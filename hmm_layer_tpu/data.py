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
import os
from typing import Iterable, Iterator

import numpy as np

__all__ = [
    "read_fasta",
    "read_fasta_encoded",
    "revcomp",
    "revcomp_onehot",
    "encode_dna",
    "encode_protein",
    "window_batches",
    "pad_batches",
    "PROTEIN_ALPHABET",
]

# The C++ scanner (hmm_layer_tpu.native) accelerates plain-file FASTA
# parsing; HMM_NATIVE_IO=0 forces the pure-Python path (and any native
# build/load failure falls back silently — see _native_index).
_use_native_io = os.environ.get("HMM_NATIVE_IO", "1") != "0"


def _native_index(path):
    """A native FastaIndex for ``path``, or None when unavailable
    (gzip input, HMM_NATIVE_IO=0, no toolchain, ...)."""
    if not _use_native_io or str(path).endswith(".gz"):
        return None
    try:
        from . import native

        if not native.available():
            return None
        return native.FastaIndex(path)
    except Exception:
        return None

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
    """Yield ``(header, sequence)`` pairs; supports ``.gz`` transparently.

    Plain files go through the C++ scanner when it is available (one mmap
    pass for record boundaries, whitespace-stripped extraction at memcpy
    speed); gzip input and toolchain-less hosts use the pure-Python parser.
    Both paths yield identical records (tests/test_native.py parity suite).
    """
    idx = _native_index(path)
    if idx is not None:
        return _read_fasta_native(idx)
    return _read_fasta_py(path)


def _read_fasta_native(idx) -> Iterator[tuple[str, str]]:
    with idx:
        yield from idx


def _read_fasta_py(path) -> Iterator[tuple[str, str]]:
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
                # Drop interior whitespace too (malformed but seen in the
                # wild; a kept space would encode as an 'N' channel) —
                # keeps parity with the native scanner.
                parts.append("".join(line.split()))
    if name is not None:
        yield name, "".join(parts)


# Complement table covering ACGT + IUPAC ambiguity codes, both cases;
# anything else maps to N (matching encode_dna's unknown-byte handling).
_COMPLEMENT = {}
for _a, _b in (
    ("A", "T"), ("C", "G"), ("R", "Y"), ("K", "M"),
    ("B", "V"), ("D", "H"), ("S", "S"), ("W", "W"), ("N", "N"),
):
    _COMPLEMENT[_a], _COMPLEMENT[_b] = _b, _a
    _COMPLEMENT[_a.lower()], _COMPLEMENT[_b.lower()] = _b.lower(), _a.lower()
_REVCOMP_TABLE = str.maketrans(
    {c: _COMPLEMENT.get(chr(c), "N") for c in range(128)}
)


def revcomp(seq: str) -> str:
    """Reverse complement of a DNA string (IUPAC-aware, case-preserving;
    unknown characters become ``N``)."""
    return seq.translate(_REVCOMP_TABLE)[::-1]


# Channel permutation realizing complementation on ACGTN one-hot rows:
# A<->T, C<->G, N fixed. Complementing a base *set* permutes it, so this is
# exact for the uniform IUPAC ambiguity rows too (R={A,G} -> Y={C,T}, ...).
_RC_PERM_DNA = np.array([3, 2, 1, 0, 4])


def revcomp_onehot(encoded: np.ndarray) -> np.ndarray:
    """Reverse complement of an :func:`encode_dna` output without going back
    through strings: reverse the position axis, permute the channels.
    ``revcomp_onehot(encode_dna(s)) == encode_dna(revcomp(s))`` exactly —
    lets the fused native :func:`read_fasta_encoded` path drive both strands
    of the ``predict``/``train`` CLI with no Python-string intermediate."""
    return np.ascontiguousarray(encoded[::-1, _RC_PERM_DNA])


def _dna_lut() -> np.ndarray:
    """(256, 5) byte -> channel-distribution lookup table."""
    lut = np.zeros((256, 5), np.float32)
    lut[:, 4] = 1.0  # default: treat unknown bytes as N
    for j, ch in enumerate(_DNA):
        for c in (ch, ch.lower()):
            lut[ord(c)] = 0.0
            lut[ord(c), j] = 1.0
    for code, bases in _IUPAC.items():
        if code == "N":
            continue
        row = np.zeros(5, np.float32)
        for bb in bases:
            row[_DNA.index(bb)] = 1.0 / len(bases)
        lut[ord(code)] = lut[ord(code.lower())] = row
    return lut


_DNA_LUT = _dna_lut()


def encode_dna(seq: str, dtype=np.float32) -> np.ndarray:
    """(L, 5) one-hot over ACGTN; IUPAC ambiguity codes spread uniformly.

    Vectorized (byte lookup table) — encodes ~100 Mbp contigs in well under
    a second. Non-ASCII bytes degrade to the 'N' channel. Matches the gene-pred emitters' nucleotide channels
    (``ops.kmer`` treats channel 4, 'N', as a uniform 1/4 over ACGT).
    """
    idx = np.frombuffer(seq.encode("ascii", errors="replace"), np.uint8)
    return _DNA_LUT[idx].astype(dtype, copy=False)


def _protein_lut(alphabet: str) -> np.ndarray:
    s = len(alphabet) + 1
    lut = np.zeros((256, s), np.float32)
    # Unknown letters spread uniformly over the canonical channels (the
    # first min(20, len(alphabet)) entries of the given alphabet).
    n_canon = min(20, len(alphabet))
    lut[:, :n_canon] = 1.0 / n_canon
    for j, ch in enumerate(alphabet):
        for c in (ch.upper(), ch.lower()):
            lut[ord(c)] = 0.0
            lut[ord(c), j] = 1.0
    return lut


def encode_protein(
    seq: str, alphabet: str = PROTEIN_ALPHABET, add_terminal: bool = True,
    dtype=np.float32,
) -> np.ndarray:
    """(L[+1], len(alphabet)+1) one-hot; unknown letters spread uniformly
    over the alphabet's canonical channels; the terminal symbol (last
    channel) is appended when ``add_terminal`` (profile-HMM convention)."""
    lut = (
        _PROTEIN_LUT
        if alphabet == PROTEIN_ALPHABET
        else _protein_lut(alphabet)
    )
    idx = np.frombuffer(seq.encode("ascii", errors="replace"), np.uint8)
    out = lut[idx].astype(dtype, copy=False)
    if add_terminal:
        term = np.zeros((1, out.shape[-1]), dtype)
        term[0, -1] = 1.0
        out = np.concatenate([out, term], axis=0)
    return out


_PROTEIN_LUT = _protein_lut(PROTEIN_ALPHABET)


def read_fasta_encoded(
    path,
    kind: str = "dna",
    alphabet: str = PROTEIN_ALPHABET,
    add_terminal: bool = True,
) -> Iterator[tuple[str, np.ndarray]]:
    """Yield ``(name, encoded)`` pairs straight from a FASTA file.

    The fused native path goes file image → one-hot channels in a single
    C++ pass (no intermediate Python strings — the zero-copy route for
    genome-scale ``predict``/``align`` inputs); the fallback composes
    :func:`read_fasta` with :func:`encode_dna`/:func:`encode_protein`.
    ``kind`` is ``"dna"`` (``(L, 5)`` ACGTN channels) or ``"protein"``
    (``(L+1, len(alphabet)+1)`` with the terminal row appended when
    ``add_terminal``).
    """
    if kind not in ("dna", "protein"):
        raise ValueError(f"kind must be 'dna' or 'protein', got {kind!r}")
    idx = _native_index(path)
    if idx is None:
        for name, seq in read_fasta(path):
            if kind == "dna":
                yield name, encode_dna(seq)
            else:
                yield name, encode_protein(seq, alphabet, add_terminal)
        return
    if kind == "dna":
        lut = _DNA_LUT
    else:
        lut = (
            _PROTEIN_LUT
            if alphabet == PROTEIN_ALPHABET
            else _protein_lut(alphabet)
        )
    with idx:
        for i, name in enumerate(idx.names):
            out = idx.onehot(i, lut)
            if kind == "protein" and add_terminal:
                term = np.zeros((1, out.shape[-1]), out.dtype)
                term[0, -1] = 1.0
                out = np.concatenate([out, term], axis=0)
            yield name, out


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
    if L == 0:
        return
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

    Yields ``(batch (batch_size, L_max, s), lengths (batch_size,))``; short
    sequences continue emitting the terminal symbol (the profile HMM's
    absorbing terminal state makes the padded loglik equal the unpadded
    one, learnMSA's convention). The final partial group is filled with
    all-terminal rows (``length == 0``) so the leading dimension is always
    ``batch_size`` — one jit compilation per ``L_max``.
    """
    group = []
    for e in encoded:
        group.append(e)
        if len(group) == batch_size:
            yield _pad_group(group, batch_size, terminal_channel)
            group = []
    if group:
        yield _pad_group(group, batch_size, terminal_channel)


def _pad_group(group, batch_size, terminal_channel):
    s = group[0].shape[-1]
    L_max = max(g.shape[0] for g in group)
    batch = np.zeros((batch_size, L_max, s), group[0].dtype)
    batch[:, :, terminal_channel] = 1.0  # batch-fill rows stay all-terminal
    lengths = np.zeros((batch_size,), np.int32)
    for i, g in enumerate(group):
        batch[i] = 0.0
        batch[i, : g.shape[0]] = g
        batch[i, g.shape[0] :, terminal_channel] = 1.0
        lengths[i] = g.shape[0]
    return batch, lengths
