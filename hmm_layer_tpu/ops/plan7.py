"""Structured Plan7 matvec: the implicit profile-HMM transition operator
applied in O(L) per position instead of a dense O(q²) matvec.

The implicit profile-HMM transition matrix (silent-state elimination,
``/root/reference/hmm_layer/Transitioner.py:203-247``) is ~1/8 dense and
*rank-structured*: the upper-triangular ``match_skip`` block is exactly
rank one, ``skip(i→j) = exp(MD_i − csDD_i) · exp(csDD_{j-2} + DM_{j-2})``
(see ``models/profile_transitions.make_implicit_log_probs``), the
match/insert bands are diagonals, and the flank/unannotated rows and
columns are O(L) vectors. The forward matvec ``r = α @ A`` therefore
decomposes into elementwise products, two shifts, a cumulative sum (for
the rank-1 triangle) and four dot products — O(L) work per position and
NO q_max lane padding (the dense path pads q ≤ 155 to 256 lanes and runs
6-pass f32 MXU matmuls; see BASELINE.md round-3 structured-matvec
experiment for the measured ms/step).

State components per model (implicit order LF, M×L, I×(L−1), U, RF, T):
arrays are padded to ``Lmax`` across models; padded entries carry zero
probability and therefore never receive mass.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .semiring import EPS

__all__ = ["structured_operator", "split_components", "structured_log_likelihood"]


def _pad_to(x, n, value=0.0):
    pad = n - x.shape[-1]
    if pad <= 0:
        return x
    return jnp.concatenate(
        [x, jnp.full(x.shape[:-1] + (pad,), value, x.dtype)], axis=-1
    )


def structured_operator(trans, params):
    """Extract the O(L) operator vectors from a ProfileTransitions.

    Returns a dict of arrays stacked over models (padded to Lmax):
    scalars (m,), vectors (m, Lmax). Probabilities in linear space.
    """
    implicit, log_probs, _ = trans.make_implicit_log_probs(params)
    Lm = max(trans.lengths)

    def stack(fn, pad_len=Lm):
        return jnp.stack(
            [_pad_to(fn(i), pad_len) for i in range(trans.num_models)]
        )

    def scal(fn):
        return jnp.stack([fn(i) for i in range(trans.num_models)])

    e = lambda x: jnp.exp(x)
    op = {}
    op["lf_loop"] = scal(lambda i: e(implicit[i]["left_flank_loop"][0]))
    op["lf_to_match"] = stack(lambda i: e(implicit[i]["left_flank_to_match"]))
    op["lf_to_rf"] = scal(lambda i: e(implicit[i]["left_flank_to_right_flank"][0]))
    op["lf_to_u"] = scal(
        lambda i: e(implicit[i]["left_flank_to_unannotated_segment"][0])
    )
    op["lf_to_t"] = scal(lambda i: e(implicit[i]["left_flank_to_terminal"][0]))
    op["MM"] = stack(lambda i: e(implicit[i]["match_to_match"]))
    op["MI"] = stack(lambda i: e(implicit[i]["match_to_insert"]))
    op["IM"] = stack(lambda i: e(implicit[i]["insert_to_match"]))
    op["II"] = stack(lambda i: e(implicit[i]["insert_to_insert"]))
    op["m_to_u"] = stack(lambda i: e(implicit[i]["match_to_unannotated"]))
    op["m_to_rf"] = stack(lambda i: e(implicit[i]["match_to_right_flank"]))
    op["m_to_t"] = stack(lambda i: e(implicit[i]["match_to_terminal"]))
    op["u_to_match"] = stack(
        lambda i: e(implicit[i]["unannotated_segment_to_match"])
    )
    op["u_loop"] = scal(lambda i: e(implicit[i]["unannotated_segment_loop"][0]))
    op["u_to_rf"] = scal(
        lambda i: e(implicit[i]["unannotated_segment_to_right_flank"][0])
    )
    op["u_to_t"] = scal(
        lambda i: e(implicit[i]["unannotated_segment_to_terminal"][0])
    )
    op["rf_loop"] = scal(lambda i: e(implicit[i]["right_flank_loop"][0]))
    op["rf_exit"] = scal(lambda i: e(implicit[i]["right_flank_exit"][0]))

    # Rank-1 match-skip factors: skip(i→j) = u_vec[i-1] * v_vec[j-1]
    # (match indices 1..l → 0-based t=i-1), valid for j ≥ i+2; u_vec zeroed
    # outside 1..l-2, v_vec outside 3..l, so the cumsum formulation below
    # needs no masks. Derivation matches make_implicit_log_probs:
    # M_skip[r, c] = MD[r] + csDD[c] − csDD[r] + DM[c], edge (i=r, j=c+2).
    def skip_uv(i):
        p = log_probs[i]
        l = trans.lengths[i]
        MD = p["match_to_delete"]
        DD = jnp.concatenate([jnp.zeros((1,)), p["delete_to_delete"]], axis=0)
        cs = jnp.cumsum(DD, axis=0)
        DM = p["delete_to_match"]
        u_log = MD - cs  # (l,) rows of M_skip (row 0 = BEGIN)
        v_log = cs + DM  # (l,) cols of M_skip (col c → dst match c+2)
        # u_vec over match t=0..l-1 (match i=t+1): rows 1..l-2 valid
        u = jnp.where(
            (jnp.arange(l) >= 1) & (jnp.arange(l) <= l - 2), jnp.exp(u_log), 0.0
        )
        u_vec = jnp.concatenate([u[1:], jnp.zeros((1,))])  # index t=i-1
        # v_vec over match s=0..l-1 (match j=s+1): v_log[j-2] for j>=3
        v = jnp.concatenate([jnp.zeros((2,)), jnp.exp(v_log[1 : l - 1])])
        return u_vec, v

    op["skip_u"] = stack(lambda i: skip_uv(i)[0])
    op["skip_v"] = stack(lambda i: skip_uv(i)[1])

    # Per-model component masks (padded entries zero). Matches number l,
    # inserts l-1 — both live in (m, Lmax) arrays.
    mask_m = np.zeros((trans.num_models, Lm), np.float32)
    mask_i = np.zeros((trans.num_models, Lm), np.float32)
    for i, l in enumerate(trans.lengths):
        mask_m[i, :l] = 1.0
        mask_i[i, : l - 1] = 1.0
    op["match_mask"] = jnp.asarray(mask_m)
    op["insert_mask"] = jnp.asarray(mask_i)
    return op


def split_components(trans, x):
    """Split a dense state-ordered array (m, ..., q_max) into components.

    Returns dict with 'lf', 'u', 'rf', 't' of shape (m, ...) and
    'm', 'i' of shape (m, ..., Lmax) (zero padded).
    """
    Lm = max(trans.lengths)
    lf, mm, ii, uu, rf, tt = [], [], [], [], [], []
    for k, l in enumerate(trans.lengths):
        xk = x[k]
        lf.append(xk[..., 0])
        mm.append(_pad_to(xk[..., 1 : 1 + l], Lm))
        ii.append(_pad_to(xk[..., 1 + l : 2 * l], Lm))
        uu.append(xk[..., 2 * l])
        rf.append(xk[..., 2 * l + 1])
        tt.append(xk[..., 2 * l + 2])
    return {
        "lf": jnp.stack(lf),
        "m": jnp.stack(mm),
        "i": jnp.stack(ii),
        "u": jnp.stack(uu),
        "rf": jnp.stack(rf),
        "t": jnp.stack(tt),
    }


def _matvec(op, a):
    """r = alpha @ A_implicit in component space; O(L) per call."""
    a_lf, a_m, a_i = a["lf"], a["m"], a["i"]
    a_u, a_rf, a_t = a["u"], a["rf"], a["t"]
    # broadcast helpers: scalars (m,) -> (m, 1...) matching (m, b)
    s = lambda x: x[:, None]
    v = lambda x: x[:, None, :]

    # match destinations
    r_m = a_lf[..., None] * v(op["lf_to_match"])
    r_m = r_m.at[..., 1:].add(a_m[..., :-1] * v(op["MM"])[..., : a_m.shape[-1] - 1])
    r_m = r_m.at[..., 1:].add(a_i[..., :-1] * v(op["IM"])[..., : a_m.shape[-1] - 1])
    S = jnp.cumsum(a_m * v(op["skip_u"]), axis=-1)
    r_m = r_m.at[..., 2:].add(
        v(op["skip_v"])[..., 2:] * S[..., :-2]
    )
    r_m = r_m + a_u[..., None] * v(op["u_to_match"])

    # insert destinations: insert k is fed by match i=k+1 (0-based t=k)
    # and its own loop: r_i[k] = a_m[k]*MI[k] + a_i[k]*II[k].
    r_i = a_i * v(op["II"]) + a_m * v(op["MI"])

    dot = lambda x, w: jnp.sum(x * v(w), axis=-1)
    r_u = dot(a_m, op["m_to_u"]) + a_u * s(op["u_loop"]) + a_lf * s(op["lf_to_u"])
    r_rf = (
        dot(a_m, op["m_to_rf"])
        + a_u * s(op["u_to_rf"])
        + a_lf * s(op["lf_to_rf"])
        + a_rf * s(op["rf_loop"])
    )
    r_t = (
        dot(a_m, op["m_to_t"])
        + a_u * s(op["u_to_t"])
        + a_rf * s(op["rf_exit"])
        + a_lf * s(op["lf_to_t"])
        + a_t
    )
    r_lf = a_lf * s(op["lf_loop"])
    return {"lf": r_lf, "m": r_m, "i": r_i, "u": r_u, "rf": r_rf, "t": r_t}


def _total(a):
    return (
        a["lf"]
        + jnp.sum(a["m"], axis=-1)
        + jnp.sum(a["i"], axis=-1)
        + a["u"]
        + a["rf"]
        + a["t"]
    )


def _scale(a, z):
    zi = 1.0 / z
    return {
        k: v * (zi[..., None] if v.ndim == 3 else zi) for k, v in a.items()
    }


def _emul(E_t, r, masks):
    """s = E_t ⊙ r (clamped), with padded match/insert entries kept at 0."""
    mask_m, mask_i = masks
    out = {}
    for k in ("lf", "u", "rf", "t"):
        out[k] = jnp.maximum(E_t[k], EPS) * jnp.maximum(r[k], EPS)
    for k, mask in (("m", mask_m), ("i", mask_i)):
        out[k] = (
            jnp.maximum(E_t[k], EPS)
            * jnp.maximum(r[k], EPS)
            * mask[:, None, :]
        )
    return out


def structured_log_likelihood(trans, params, E):
    """(m, b) log-likelihoods via the structured Plan7 matvec.

    Matches ``recursion.log_likelihood(init, make_A(params), E, 1)`` to fp
    tolerance, without ever materializing A. Differentiable by autodiff
    through the scan.
    """
    op = structured_operator(trans, params)
    init = trans.make_initial_distribution(params)
    masks = (op["match_mask"], op["insert_mask"])
    m, b, L, q = E.shape

    E_split = split_components(trans, jnp.moveaxis(E, 2, 1))  # (m, L, b, comp)
    Es = {k: jnp.moveaxis(x, 1, 0) for k, x in E_split.items()}  # (L, m, b, ·)
    init_c = split_components(trans, init)  # (m, ·)
    init_b = {
        k: (
            jnp.broadcast_to(x[:, None, :], (m, b, x.shape[-1]))
            if x.ndim == 2
            else jnp.broadcast_to(x[:, None], (m, b))
        )
        for k, x in init_c.items()
    }

    E0 = {k: x[0] for k, x in Es.items()}
    s0 = _emul(E0, init_b, masks)
    z0 = _total(s0)
    carry0 = (_scale(s0, z0), jnp.log(z0))

    def step(carry, e_t):
        alpha, ll = carry
        r = _matvec(op, alpha)
        s = _emul(e_t, r, masks)
        z = _total(s)
        return (_scale(s, z), ll + jnp.log(z)), None

    (_, ll), _ = lax.scan(
        step, carry0, {k: x[1:] for k, x in Es.items()}
    )
    return ll
