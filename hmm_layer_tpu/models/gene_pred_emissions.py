"""Gene-prediction HMM emission models.

Functional JAX re-design of
``/root/reference/hmm_layer/gene_pred_hmm_emitter.py``:

* :class:`SimpleGenePredEmissions` — ``1 + 6·num_copies`` states scored from
  class predictions, optional MVN embedding emissions with temperature,
  optional shared intron parameters, ``end_hints`` border masking
  (``gene_pred_hmm_emitter.py:8-146``).
* :class:`GenePredEmissions` — ``1 + 14·num_copies`` states with biological
  codon-pattern enforcement: START/STOP/donor/acceptor states multiply their
  class emissions by fixed codon-probability tables contracted against
  runtime 3-mer encodings of the nucleotide track
  (``gene_pred_hmm_emitter.py:161-277``), plus optional trainable exon
  nucleotide distributions and the MVN L2 auxiliary loss.

The codon factor is computed as two ``(64 -> constrained-states)`` matmuls
(one per pivot side) instead of the reference's einsum + product — same
math, MXU-shaped.

Note: the reference reads the nucleotide track for the trainable-exon path
from the already-stripped class inputs (``gene_pred_hmm_emitter.py:266``, a
transcription bug); here the real nucleotide channels are used.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.kmer import encode_kmer_string, make_k_mers
from .emission_utils import apply_end_hints
from ..utils.bijectors import DefaultDiagBijector
from .mvn import MvnMixture

__all__ = [
    "SimpleGenePredEmissions",
    "GenePredEmissions",
    "make_codon_probs",
    "assert_codons",
]


def assert_codons(codons):
    total = sum(p for _, p in codons)
    assert abs(total - 1.0) < 1e-6, f"codon probabilities must sum to 1: {codons}"
    for triplet, prob in codons:
        assert len(triplet) == 3, f"triplets must have length 3: {codons}"
        assert 0.0 <= prob <= 1.0, f"probabilities must be in [0, 1]: {codons}"


def make_codon_probs(codons, pivot_left: bool) -> np.ndarray:
    """Weighted sum of encoded 3-mers, flattened to (1, 64)."""
    assert_codons(codons)
    table = sum(
        prob * np.asarray(encode_kmer_string(triplet, pivot_left))
        for triplet, prob in codons
    )
    return table.reshape(1, 64)


class SimpleGenePredEmissions:
    """Emissions for the 7-state (per copy) gene grammar.

    State order: ``Ir, I0*c, I1*c, I2*c, E0*c, E1*c, E2*c``.
    """

    def __init__(
        self,
        num_models: int = 1,
        num_copies: int = 1,
        init: float | np.ndarray = 0.0,
        trainable_emissions: bool = True,
        emit_embeddings: bool = False,
        embedding_dim: int | None = None,
        full_covariance: bool = False,
        initial_variance: float = 1.0,
        temperature: float = 1.0,
        share_intron_parameters: bool = True,
    ):
        self.num_models = num_models
        self.num_copies = num_copies
        if not hasattr(self, "num_states"):
            self.num_states = 1 + 6 * num_copies
        self.init = init
        self.trainable_emissions = trainable_emissions
        self.emit_embeddings = emit_embeddings
        self.embedding_dim = embedding_dim
        self.full_covariance = full_covariance
        self.initial_variance = initial_variance
        self.temperature = temperature
        self.share_intron_parameters = share_intron_parameters
        if emit_embeddings:
            assert embedding_dim is not None, (
                "embedding_dim is required when emit_embeddings=True"
            )
            assert num_models == 1, (
                "embedding emissions currently support a single model"
            )
            self.mvn = MvnMixture(
                embedding_dim,
                diag_only=not full_covariance,
                diag_bijector=DefaultDiagBijector(initial_variance),
            )
        else:
            assert embedding_dim is None, (
                "embedding_dim must be None when emit_embeddings=False"
            )
            self.mvn = None

    @property
    def num_param_states(self) -> int:
        """States carrying their own emission parameters (introns may share)."""
        shared = 2 * self.num_copies if self.share_intron_parameters else 0
        return self.num_states - shared

    def init_params(self, key, input_dim: int) -> dict:
        k1, k2 = jax.random.split(key)
        if np.isscalar(self.init):
            kernel = jnp.full(
                (self.num_models, self.num_param_states, input_dim),
                float(self.init),
            )
        else:
            kernel = jnp.asarray(self.init, jnp.float32)
            if (
                self.share_intron_parameters
                and kernel.shape[-2] == self.num_states
            ):
                # Full-state init (e.g. make_15_class_emission_kernel) with
                # shared introns: keep Ir + the I0 block, drop the I1/I2
                # rows the expansion re-derives from I0.
                c = self.num_copies
                kernel = jnp.concatenate(
                    [kernel[..., : 1 + c, :], kernel[..., 1 + 3 * c :, :]],
                    axis=-2,
                )
        params = {"emission_kernel": kernel}
        if self.emit_embeddings:
            params["embedding_emission_kernel"] = 0.02 * jax.random.normal(
                k2, (1, self.num_param_states, 1, self.mvn.num_params())
            )
        return params

    def trainable_mask(self, params) -> dict:
        """``trainable_emissions=False`` freezes the class-emission kernel
        (the reference sets ``requires_grad`` on it,
        ``gene_pred_hmm_emitter.py:61-74``); embedding/nucleotide kernels
        stay trainable — they only exist when explicitly enabled."""
        return {
            k: (self.trainable_emissions if k == "emission_kernel" else True)
            for k in params
        }

    def make_B(self, params):
        return jax.nn.softmax(params["emission_kernel"], axis=-1)

    def _expand_shared_introns(self, emit):
        if not self.share_intron_parameters:
            return emit
        c = self.num_copies
        i0 = emit[..., 1 : 1 + c]
        return jnp.concatenate(
            [emit[..., : 1 + c], i0, i0, emit[..., 1 + c :]], axis=-1
        )

    def _apply_end_hints(self, emit, end_hints):
        return apply_end_hints(emit, end_hints)

    def emissions(self, params, inputs, end_hints=None, training: bool = False):
        """Per-state emission probabilities.

        Args:
            inputs: (m, b, L, s) class predictions, plus ``embedding_dim``
                trailing channels when ``emit_embeddings``.
            end_hints: optional border-state masks — (m, b, 2, num_states)
                for the whole-sequence ends, or (m, b, P, 2, num_states)
                to clamp the borders of every chunk of a
                ``parallel_factor=P`` run (see
                :func:`~hmm_layer_tpu.models.emission_utils.apply_end_hints`).
        Returns:
            (m, b, L, num_states) linear-space probabilities.
        """
        B = self.make_B(params)
        if self.emit_embeddings:
            class_inputs = inputs[..., : -self.embedding_dim]
            embedding_inputs = inputs[..., -self.embedding_dim :]
            emit = jnp.einsum(
                "mbls,mqs->mblq", class_inputs, B, precision=lax.Precision.HIGHEST
            )
            flat = embedding_inputs.reshape(1, -1, self.embedding_dim)
            log_pdf = self.mvn.log_pdf(params["embedding_emission_kernel"], flat)
            log_pdf = log_pdf.reshape(emit.shape)
            # Per-position max-shift before exponentiation: posterior
            # marginals, Viterbi paths and the posterior-CE objective are
            # invariant to any per-position positive rescaling of E (the
            # scale cancels against the loglik normalization), and the raw
            # density overflows f32 once a trained component sharpens
            # (log_pdf > 88·temperature at its mean — observed as NaN
            # losses after ~20 CE steps). Raw-loglik consumers see a
            # shifted value; every gene-pred training/decode path is
            # shift-invariant. The reference exponentiates unshifted
            # (gene_pred_hmm_emitter.py:101-112) and inherits the overflow.
            log_pdf = log_pdf - lax.stop_gradient(
                jnp.max(log_pdf, axis=-1, keepdims=True)
            )
            embedding_emit = jnp.exp(log_pdf / self.temperature)
            if training:
                emit = emit + 1e-10
                embedding_emit = embedding_emit + 1e-10
            emit = emit * embedding_emit
        else:
            emit = jnp.einsum(
                "mbls,mqs->mblq", inputs, B, precision=lax.Precision.HIGHEST
            )
        emit = self._expand_shared_introns(emit)
        return self._apply_end_hints(emit, end_hints)

    def prior_log_density(self, params):
        return jnp.zeros((self.num_models,), jnp.float32)

    def aux_loss(self, params):
        return jnp.zeros((), jnp.float32)

    def duplicate(self, params, share_kernels: bool = False):
        """Return a copy of this emitter config plus (shared or copied)
        params — the model-surgery hook (``gene_pred_hmm_emitter.py:279-311``)."""
        copy = type(self).from_config(self.get_config())
        new_params = params if share_kernels else jax.tree.map(jnp.copy, params)
        return copy, new_params

    def get_config(self) -> dict:
        return {
            "num_models": self.num_models,
            "num_copies": self.num_copies,
            "init": self.init if np.isscalar(self.init) else np.asarray(self.init),
            "trainable_emissions": self.trainable_emissions,
            "emit_embeddings": self.emit_embeddings,
            "embedding_dim": self.embedding_dim,
            "full_covariance": self.full_covariance,
            "initial_variance": self.initial_variance,
            "temperature": self.temperature,
            "share_intron_parameters": self.share_intron_parameters,
        }

    @classmethod
    def from_config(cls, config):
        return cls(**config)


class GenePredEmissions(SimpleGenePredEmissions):
    """15-state (per copy) emissions with codon-pattern constraints.

    State order: ``Ir, I0-2*c, E0-2*c, START*c, EI0-2*c, IE0-2*c, STOP*c``.
    Inputs carry 5 trailing one-hot ACGTN channels.
    """

    def __init__(
        self,
        start_codons,
        stop_codons,
        intron_begin_pattern,
        intron_end_pattern,
        l2_lambda: float = 0.01,
        trainable_nucleotides_at_exons: bool = False,
        compute_kmers_in_bf16: bool = True,
        onehot_lookup_kmers: bool = False,
        **kwargs,
    ):
        self.num_states = 1 + 14 * kwargs.get("num_copies", 1)
        super().__init__(**kwargs)
        self.start_codons = start_codons
        self.stop_codons = stop_codons
        self.intron_begin_pattern = intron_begin_pattern
        self.intron_end_pattern = intron_end_pattern
        self.l2_lambda = l2_lambda
        self.trainable_nucleotides_at_exons = trainable_nucleotides_at_exons
        # The (b, L, 64) 3-mer tensors dominate emission-scoring HBM traffic
        # (~160 MB/batch at L=10k); bf16 halves it. For one-hot ACGTN inputs
        # (the contract) every 3-mer entry is a power of two — EXACT in
        # bf16; for soft nucleotide inputs the codon factor picks up
        # <=0.4% relative error (far below model uncertainty). The codon
        # contraction accumulates in f32 (MXU bf16-in/f32-accumulate).
        self.compute_kmers_in_bf16 = compute_kmers_in_bf16

        start = make_codon_probs(start_codons, pivot_left=True)
        stop = make_codon_probs(stop_codons, pivot_left=False)
        intron_begin = make_codon_probs(intron_begin_pattern, pivot_left=True)
        intron_end = make_codon_probs(intron_end_pattern, pivot_left=False)
        any_codon = make_codon_probs([("NNN", 1.0)], pivot_left=False)
        not_stop = any_codon * (stop == 0)
        not_stop = not_stop / not_stop.sum()
        # Constrained states (the first 1 + 5c states — Ir, introns, E0, E1 —
        # are unconstrained): E2, START, EI0-2, IE0-2, STOP.
        left = np.concatenate(
            [any_codon, start] + [intron_begin] * 3 + [any_codon] * 4, axis=0
        )
        right = np.concatenate(
            [not_stop, any_codon, any_codon, not_stop, any_codon]
            + [intron_end] * 3
            + [stop],
            axis=0,
        )
        # (2, 9, 64): pivot side x constrained states x 3-mer classes.
        self.codon_probs = np.stack([left, right], axis=0).astype(np.float32)
        # Exact codon-factor LOOKUP for one-hot ACGTN inputs: the 3-mer
        # outer products + (64 -> 9) contractions reduce to a base-5 codon
        # index + one gather from a (125, 9) table (N and out-of-range
        # positions marginalized into the table with the same uniform-1/4
        # semantics as make_k_mers; parity <= 2e-12 vs the f32 path).
        # MEASURED NEGATIVE ON TPU (v5e, b=32 L=9999: e2e posterior 3.26 ms
        # vs 1.62 contraction — data-dependent vector gathers lose to MXU
        # arithmetic); useful on CPU backends and as an exactness oracle.
        # Also: nucleotide channels stop carrying gradients (they index a
        # gather) — they are raw data in every supported pipeline.
        self.onehot_lookup_kmers = onehot_lookup_kmers
        self.codon_lookup = (
            self._build_codon_lookup() if onehot_lookup_kmers else None
        )

    def _build_codon_lookup(self) -> np.ndarray:
        """(2, 125, 9) float32: per pivot side, codon-pattern probability of
        every 3-letter ACGTN string (base-5 index, first letter most
        significant). Built numerically from ``encode_kmer_string`` so the
        class layout and N-marginalization match ``make_k_mers`` exactly."""
        letters = "ACGTN"
        T = np.zeros((2, 125, 9), np.float32)
        for j in range(125):
            s = letters[j // 25] + letters[(j // 5) % 5] + letters[j % 5]
            for side, pivot_left in ((0, True), (1, False)):
                enc = np.asarray(
                    encode_kmer_string(s, pivot_left=pivot_left)
                ).reshape(64)
                T[side, j] = self.codon_probs[side] @ enc
        return T

    def _codon_factor_lookup(self, nucleotides):
        """(m, b, L, 9) codon factors via table lookup (one-hot inputs)."""
        n_idx = jnp.argmax(nucleotides, axis=-1).astype(jnp.int32)  # (m,b,L)
        fill = jnp.full(n_idx.shape[:-1] + (1,), 4, n_idx.dtype)  # 'N'
        nxt1 = jnp.concatenate([n_idx[..., 1:], fill], axis=-1)
        nxt2 = jnp.concatenate([n_idx[..., 2:], fill, fill], axis=-1)
        prv1 = jnp.concatenate([fill, n_idx[..., :-1]], axis=-1)
        prv2 = jnp.concatenate([fill, fill, n_idx[..., :-2]], axis=-1)
        idx_left = 25 * n_idx + 5 * nxt1 + nxt2  # window (t, t+1, t+2)
        idx_right = 25 * prv2 + 5 * prv1 + n_idx  # window (t-2, t-1, t)
        TL = jnp.asarray(self.codon_lookup[0])
        TR = jnp.asarray(self.codon_lookup[1])
        return TL[idx_left] * TR[idx_right]

    def init_params(self, key, input_dim: int) -> dict:
        params = super().init_params(key, input_dim)
        if self.trainable_nucleotides_at_exons:
            assert self.num_models == 1, (
                "trainable nucleotide emissions support a single model"
            )
            params["nuc_emission_kernel"] = jnp.zeros(
                (self.num_models, 3 * self.num_copies, 4)
            )
        return params

    def emissions(self, params, inputs, end_hints=None, training: bool = False):
        """Inputs: (m, b, L, s + 5); trailing 5 channels are one-hot ACGTN."""
        nucleotides = inputs[..., -5:]
        class_inputs = inputs[..., :-5]
        emit = super().emissions(
            params, class_inputs, end_hints=end_hints, training=training
        )

        m, b, L = nucleotides.shape[:3]
        if self.onehot_lookup_kmers:
            codon_factor = self._codon_factor_lookup(nucleotides)  # (m,b,L,9)
        else:
            nuc_flat = nucleotides.reshape(m * b, L, 5)
            if self.compute_kmers_in_bf16:
                nuc_flat = nuc_flat.astype(jnp.bfloat16)
            left_3mers = make_k_mers(nuc_flat, k=3, pivot_left=True).reshape(
                m, b, L, 64
            )
            right_3mers = make_k_mers(nuc_flat, k=3, pivot_left=False).reshape(
                m, b, L, 64
            )
            # Two (64 -> 9) contractions (f32 accumulation), then the
            # per-state product of both sides.
            left_factor = jnp.einsum(
                "mbls,qs->mblq",
                left_3mers,
                jnp.asarray(self.codon_probs[0]),
                preferred_element_type=jnp.float32,
            )
            right_factor = jnp.einsum(
                "mbls,qs->mblq",
                right_3mers,
                jnp.asarray(self.codon_probs[1]),
                preferred_element_type=jnp.float32,
            )
            codon_factor = left_factor * right_factor  # (m, b, L, 9)

        if self.num_copies > 1:
            codon_factor = jnp.repeat(codon_factor, self.num_copies, axis=-1)
        unconstrained = jnp.full(
            codon_factor.shape[:-1] + (1 + 5 * self.num_copies,),
            1.0 / 4096.0,
            codon_factor.dtype,
        )
        codon_factor = jnp.concatenate([unconstrained, codon_factor], axis=-1)
        if training:
            codon_factor = codon_factor + 1e-7

        full_emission = emit * codon_factor

        if self.trainable_nucleotides_at_exons:
            nuc_no_n = nucleotides[..., :4] + nucleotides[..., 4:] / 4.0
            nuc_probs = jax.nn.softmax(params["nuc_emission_kernel"], axis=-1)
            exon_factor = jnp.einsum(
                "mbls,mqs->mblq", nuc_no_n, nuc_probs, precision=lax.Precision.HIGHEST
            )
            c = self.num_copies
            pre = jnp.full(
                full_emission.shape[:-1] + (1 + 3 * c,), 0.25, full_emission.dtype
            )
            post = jnp.full(
                full_emission.shape[:-1]
                + (self.num_states - (1 + 6 * c),),
                0.25,
                full_emission.dtype,
            )
            full_emission = full_emission * jnp.concatenate(
                [pre, exon_factor, post], axis=-1
            )
        return full_emission

    def aux_loss(self, params):
        if self.emit_embeddings:
            return self.l2_lambda * self.mvn.regularization_l2_loss(
                params["embedding_emission_kernel"]
            )
        return jnp.zeros((), jnp.float32)

    def get_config(self) -> dict:
        config = super().get_config()
        config.update(
            {
                "start_codons": self.start_codons,
                "stop_codons": self.stop_codons,
                "intron_begin_pattern": self.intron_begin_pattern,
                "intron_end_pattern": self.intron_end_pattern,
                "l2_lambda": self.l2_lambda,
                "trainable_nucleotides_at_exons": self.trainable_nucleotides_at_exons,
                "compute_kmers_in_bf16": self.compute_kmers_in_bf16,
                "onehot_lookup_kmers": self.onehot_lookup_kmers,
            }
        )
        return config
