"""k-mer encodings of one-hot nucleotide sequences.

Functional JAX re-design of the reference k-mer module
(``/root/reference/hmm_layer/kmer.py:3-47`` ``make_k_mers``,
``kmer.py:49-65`` ``encode_kmer_string``). Same contract:

* Input one-hot sequences over the ACGTN alphabet (N = last channel).
* ``N`` positions are spread uniformly over the 4 regular nucleotides.
* k-mers crossing the sequence boundary are padded with the uniform
  distribution.
* Output shape ``(..., L, 4**(k-1), 4)``: last axis is the pivot position
  (leftmost base if ``pivot_left`` else rightmost base), the second-to-last
  axis enumerates the remaining ``k-1`` bases.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

ALPHABET = "ACGT"


def make_k_mers(sequences, k: int, pivot_left: bool = True):
    """Map one-hot (..., L, 5) ACGTN sequences to k-mer tensors.

    Returns an array of shape ``(..., L, 4**(k-1), 4)``. A NumPy input
    stays NumPy (host-side constant tables — e.g. the codon tables built in
    emitter constructors — must not dispatch to the device: each jnp op
    would cost a tunnel round-trip and initialize the backend at
    construction time); anything else runs in jnp (traceable).
    """
    xp = np if isinstance(sequences, np.ndarray) else jnp
    L = sequences.shape[-2]
    n = sequences.shape[-1] - 1  # alphabet size without N

    seq = sequences[..., :-1] + sequences[..., -1:] / n  # spread N uniformly
    pad_shape = seq.shape[:-2] + (k - 1, n)
    pad = xp.full(pad_shape, 1.0 / n, dtype=seq.dtype)

    if pivot_left:
        padded = xp.concatenate([seq, pad], axis=-2)
        k_mers = padded[..., :L, None, :]
        iteration = range(1, k)
    else:
        padded = xp.concatenate([pad, seq], axis=-2)
        k_mers = padded[..., k - 1 : L + k - 1, None, :]
        iteration = range(k - 2, -1, -1)

    for i in iteration:
        shift_i = padded[..., i : L + i, None, :, None]
        k_mers = k_mers[..., None, :] * shift_i
        width = 4**i if pivot_left else 4 ** (k - i - 1)
        k_mers = k_mers.reshape(k_mers.shape[:-3] + (width, n))
    return k_mers


def encode_kmer_string(kmer: str, pivot_left: bool = True, alphabet: str = ALPHABET):
    """Encode a k-mer string (letters from ``alphabet`` + 'N') as a
    ``(4**(k-1), 4)`` probability table. Ns become uniform over the alphabet.

    Matches the class layout of ``encode_kmer_string``
    (``/root/reference/hmm_layer/kmer.py:49-65``): e.g. with ``pivot_left``
    AAA -> (0, 0), AAT -> (3, 0), TAA -> (0, 3).
    """
    full = alphabet + "N"
    idx = np.array([full.index(x) for x in kmer])
    one_hot = np.eye(len(full), dtype=np.float32)[idx]  # (k, 5)
    encoded = make_k_mers(one_hot[None], k=len(kmer), pivot_left=pivot_left)
    return encoded[0, 0] if pivot_left else encoded[0, -1]
