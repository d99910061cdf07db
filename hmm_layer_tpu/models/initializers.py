"""Parameter initializers for HMM kernels.

JAX-functional re-design of the reference initializer library
(``/root/reference/hmm_layer/Initializers.py``). Every initializer is a
callable ``f(key, shape, dtype) -> jnp.ndarray`` (the standard JAX signature)
instead of an ``nn.Module``; the named-edge default dictionary
(``Initializers.py:367-421``) and the gene-pred class-emission kernel
(``Initializers.py:158-173``) are preserved as capabilities.
"""

from __future__ import annotations

import functools
import inspect

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "constant_init",
    "tiled_dist_init",
    "random_normal_init",
    "entry_init",
    "exit_init",
    "match_transition_init",
    "make_default_transition_init",
    "make_default_flank_init",
    "make_default_emission_init",
    "make_15_class_emission_kernel",
    "init_to_config",
    "init_from_config",
]

# -- initializer (de)serialization -------------------------------------------
# Each factory below attaches a JSON-able ``spec`` attribute to the closure
# it returns, so components can round-trip their initializers through
# get_config/from_config (the reference serializes its initializer objects
# the same way, ``Emitter.py:199-224``). Reconstructing from a spec and
# calling with the same PRNG key reproduces identical parameters.

_INIT_FACTORIES: dict = {}


def _jsonable(v):
    if isinstance(v, np.ndarray) or hasattr(v, "__jax_array__") or hasattr(v, "devices"):
        return np.asarray(v).tolist()
    return v


def _with_spec(kind):
    def deco(factory):
        _INIT_FACTORIES[kind] = factory

        @functools.wraps(factory)
        def wrapper(*args, **kwargs):
            fn = factory(*args, **kwargs)
            bound = inspect.signature(factory).bind(*args, **kwargs)
            bound.apply_defaults()
            fn.spec = {
                "kind": kind,
                **{k: _jsonable(v) for k, v in bound.arguments.items()},
            }
            return fn

        return wrapper

    return deco


def init_to_config(fn) -> dict:
    """JSON-able spec of an initializer built by this module."""
    spec = getattr(fn, "spec", None)
    if spec is None:
        raise ValueError(
            f"initializer {fn!r} has no serialization spec; build it from "
            "hmm_layer_tpu.models.initializers (or attach a .spec dict "
            "matching a registered factory) to make the component "
            "config-serializable"
        )
    return dict(spec)


def init_from_config(spec: dict):
    """Inverse of :func:`init_to_config`."""
    spec = dict(spec)
    kind = spec.pop("kind")
    factory = _INIT_FACTORIES.get(kind)
    if factory is None:
        raise ValueError(
            f"unknown initializer kind {kind!r}; known: "
            f"{sorted(_INIT_FACTORIES)}"
        )
    return globals()[factory.__name__](**spec)


@_with_spec("constant")
def constant_init(value):
    """Fill with a constant scalar or tile a constant array
    (``Initializers.py:67-127``)."""
    value = np.asarray(value)

    def init(key, shape, dtype=jnp.float32):
        if value.ndim == 0:
            return jnp.full(shape, value, dtype)
        arr = jnp.asarray(value, dtype)
        if arr.shape == tuple(shape):
            return arr
        reps = int(np.prod(shape)) // arr.size
        return jnp.tile(arr.reshape(-1), reps).reshape(shape)

    return init


@_with_spec("tiled_dist")
def tiled_dist_init(dist):
    """Tile a fixed distribution along all leading axes
    (``EmissionInitializer``, ``Initializers.py:5-64``)."""
    dist = np.asarray(dist, np.float32)

    def init(key, shape, dtype=jnp.float32):
        assert shape[-1] == dist.shape[-1], (
            f"last dim {shape[-1]} != dist size {dist.shape[-1]}"
        )
        reps = int(np.prod(shape[:-1]))
        return jnp.asarray(np.tile(dist, (reps, 1)).reshape(shape), dtype)

    return init


@_with_spec("random_normal")
def random_normal_init(mean=0.0, stddev=0.05):
    def init(key, shape, dtype=jnp.float32):
        return mean + stddev * jax.random.normal(key, shape, dtype)

    return init


@_with_spec("entry")
def entry_init():
    """First entry ~0.5, remaining uniform (``Initializers.py:184-214``)."""

    def init(key, shape, dtype=jnp.float32):
        p0 = jnp.zeros((1,) + tuple(shape[1:]), dtype)
        # max(..., 1) guards the degenerate length-1 profile (no remaining
        # entries to spread mass over) — same guard as match_transition_init.
        rest = jnp.full(
            (shape[0] - 1,) + tuple(shape[1:]),
            np.log(1.0 / max(shape[0] - 1, 1)),
            dtype,
        )
        return jnp.concatenate([p0, rest], axis=0)

    return init


@_with_spec("exit")
def exit_init():
    """Uniform exit mass of 0.5 split over non-first matches
    (``Initializers.py:222-249``)."""

    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, np.log(0.5 / max(shape[0] - 1, 1)), dtype)

    return init


@_with_spec("match_transition")
def match_transition_init(val, i, scale=0.1):
    """Softmax-consistent match-transition logits with per-position noise
    (``Initializers.py:258-305``)."""
    val = np.asarray(val, np.float32)

    def init(key, shape, dtype=jnp.float32):
        z = scale * jax.random.normal(key, (shape[0], 1), dtype)
        val_z = jnp.asarray(val)[None, :] + z
        p_exit_desired = 0.5 / max(shape[0] - 1, 1)
        prob = jax.nn.softmax(val_z, axis=-1) * (1.0 - p_exit_desired)
        return jnp.log(prob[:, i])

    return init


def make_default_flank_init():
    return constant_init(0.0)


def make_default_emission_init(
    background=None, alphabet_size: int = 25, epsilon: float = 1e-3
):
    """Match-emission logits from a background amino-acid distribution.

    The capability of the reference's ``make_default_emission_init``
    (``Initializers.py:175-177``), whose transcription takes the log of an
    already-log kernel and uses the nucleotide alphabet (SURVEY §4 defect
    8); upstream learnMSA initializes from a trained amino-acid background.
    Here the default background is the LG substitution model's stationary
    frequencies (``utils.substitution.lg_matrix``) embedded in the first 20
    channels, ``epsilon`` mass on any extra channels, renormalized; the
    logits are ``log(background)`` so the emission softmax starts exactly
    at the background distribution.
    """
    if background is None:
        from ..utils.substitution import lg_matrix

        _, background = lg_matrix()
    background = np.asarray(background, np.float64)
    if background.shape[-1] > alphabet_size:
        raise ValueError(
            f"background has {background.shape[-1]} channels > "
            f"alphabet_size {alphabet_size}"
        )
    full = np.full((alphabet_size,), epsilon, np.float64)
    full[: background.shape[-1]] = background / background.sum()
    full = full / full.sum()
    return tiled_dist_init(np.log(full).astype(np.float32))


def make_default_transition_init(
    MM=1.0,
    MI=-1.0,
    MD=-1.0,
    II=-0.5,
    IM=0.0,
    DM=0.0,
    DD=-0.5,
    FC=0.0,
    FE=-1.0,
    R=-9.0,
    RF=0.0,
    T=0.0,
    scale=0.1,
):
    """Default initializer per Plan7 edge type (``Initializers.py:367-421``)."""
    return {
        "begin_to_match": entry_init(),
        "match_to_end": exit_init(),
        "match_to_match": match_transition_init([MM, MI, MD], 0, scale),
        "match_to_insert": match_transition_init([MM, MI, MD], 1, scale),
        "insert_to_match": random_normal_init(IM, scale),
        "insert_to_insert": random_normal_init(II, scale),
        "match_to_delete": match_transition_init([MM, MI, MD], 2, scale),
        "delete_to_match": random_normal_init(DM, scale),
        "delete_to_delete": random_normal_init(DD, scale),
        "left_flank_loop": random_normal_init(FC, scale),
        "left_flank_exit": random_normal_init(FE, scale),
        "right_flank_loop": random_normal_init(FC, scale),
        "right_flank_exit": random_normal_init(FE, scale),
        "unannotated_segment_loop": random_normal_init(FC, scale),
        "unannotated_segment_exit": random_normal_init(FE, scale),
        "end_to_unannotated_segment": random_normal_init(R, scale),
        "end_to_right_flank": random_normal_init(RF, scale),
        "end_to_terminal": random_normal_init(T, scale),
    }


def make_15_class_emission_kernel(smoothing=0.1, num_copies=1, num_models=1):
    """Smoothed-identity 15-class emission logits for the gene-pred HMM
    (``Initializers.py:158-173``; the reference's double-log at
    ``Initializers.py:175-177`` is a transcription bug we do not replicate).

    Returns log-probs of shape (num_models, 1 + 14*num_copies, 15).
    """
    assert smoothing > 0, "smoothing must be > 0 for numerical stability"
    n = 15
    probs = np.eye(n)
    probs += -probs * smoothing + (1 - probs) * smoothing / (n - 1)
    if num_copies > 1:
        repeats = [1] + [num_copies] * (probs.shape[-2] - 1)
        probs = np.repeat(probs, repeats, axis=-2)
    probs = np.repeat(probs[None, ...], num_models, axis=0)
    return np.log(probs).astype(np.float32)
