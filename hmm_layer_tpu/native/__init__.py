"""Native (C++) host-side data path: FASTA scanning + fused encoding.

The TPU compute path is JAX/XLA/Pallas; the *host* side of the framework —
file parsing and input encoding for the ``align``/``predict``/``train``
CLI workflows — is the one hot loop that lives outside the compiler. The
reference has no data loading at all (SURVEY.md §5), and its pure-Python
layers put even model math in interpreter loops; here the byte-level work
(newline-skipping record scan, whitespace-stripped extraction, fused
parse→one-hot) runs in C++ (:mod:`fasta_io.cpp <hmm_layer_tpu.native>`)
at memcpy speed.

Zero-dependency by construction:

* bound with :mod:`ctypes` (no pybind11 in the image),
* compiled lazily with ``g++ -O3`` on first use, cached next to the
  package keyed by source hash (falls back to a temp dir, then to
  "unavailable"),
* every public consumer (``data.read_fasta`` etc.) silently falls back to
  the pure-Python implementation when :func:`available` is False, so the
  package works on hosts without a toolchain.

Import of this module must stay cheap and side-effect free (no compile at
import — the package-level backend-free-import invariant).
"""

from __future__ import annotations

import ctypes
import hashlib
import mmap
import os
import subprocess
import tempfile

import numpy as np

__all__ = ["available", "build", "FastaIndex"]

_SRC = os.path.join(os.path.dirname(__file__), "fasta_io.cpp")

_lib = None
_lib_error: str | None = None


def _cache_candidates(tag: str):
    yield os.path.join(os.path.dirname(__file__), "_cache", f"fasta_io_{tag}.so")
    yield os.path.join(
        tempfile.gettempdir(), f"hmm_layer_tpu_native_{tag}.so"
    )


def build(verbose: bool = False) -> str:
    """Compile (or locate the cached build of) the native library.

    Returns the .so path; raises on toolchain failure. Idempotent — keyed
    by a hash of the C++ source, so editing the source invalidates the
    cache automatically.
    """
    with open(_SRC, "rb") as fh:
        tag = hashlib.sha256(fh.read()).hexdigest()[:16]
    last_err: Exception | None = None
    for so_path in _cache_candidates(tag):
        if os.path.exists(so_path):
            return so_path
        try:
            os.makedirs(os.path.dirname(so_path), exist_ok=True)
            tmp = so_path + f".tmp.{os.getpid()}"
            cmd = [
                "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                "-o", tmp, _SRC,
            ]
            if verbose:
                print("building native fasta_io:", " ".join(cmd))
            subprocess.run(cmd, check=True, capture_output=not verbose)
            os.replace(tmp, so_path)  # atomic vs concurrent builders
            return so_path
        except Exception as e:  # unwritable dir, missing g++, ...
            last_err = e
    raise RuntimeError(f"native build failed: {last_err}")


def _load():
    global _lib, _lib_error
    if _lib is not None or _lib_error is not None:
        return _lib
    try:
        lib = ctypes.CDLL(build())
        i64, p8, pf = (
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float),
        )
        pi64 = ctypes.POINTER(ctypes.c_int64)
        lib.hmm_fasta_scan.restype = i64
        lib.hmm_fasta_scan.argtypes = [
            p8, i64, pi64, pi64, pi64, pi64, pi64, i64,
        ]
        lib.hmm_fasta_extract.restype = i64
        lib.hmm_fasta_extract.argtypes = [p8, i64, i64, p8, p8]
        lib.hmm_fasta_extract_onehot.restype = i64
        lib.hmm_fasta_extract_onehot.argtypes = [p8, i64, i64, pf, i64, p8]
        _lib = lib
    except Exception as e:
        _lib_error = str(e)
    return _lib


def available() -> bool:
    """True when the native library is built (building it if needed)."""
    return _load() is not None


def _u8ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


_IDENTITY_LUT = np.arange(256, dtype=np.uint8)


class FastaIndex:
    """mmap-backed random-access FASTA reader over the native scanner.

    Indexes all records in one C pass; sequences are materialized on
    demand (as cleaned strings, code arrays, or fused one-hot float
    tensors) so a genome-scale file costs O(#records) Python objects up
    front, not O(bytes).
    """

    def __init__(self, path):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native library unavailable: {_lib_error}")
        self._lib = lib
        self._fh = open(path, "rb")
        try:
            # ACCESS_COPY (private copy-on-write) rather than ACCESS_READ:
            # ctypes.from_buffer needs a writable buffer, and we never
            # write, so no page is ever actually copied.
            self._mm = mmap.mmap(self._fh.fileno(), 0, access=mmap.ACCESS_COPY)
            self._buf = (ctypes.c_uint8 * len(self._mm)).from_buffer(self._mm)
        except ValueError:  # zero-length file cannot be mmapped
            self._mm = None
            self._buf = (ctypes.c_uint8 * 1)()
        n = len(self._mm) if self._mm is not None else 0
        self._n = n
        null = ctypes.cast(None, ctypes.POINTER(ctypes.c_int64))
        count = lib.hmm_fasta_scan(self._buf, n, null, null, null, null, null, 0)
        cols = np.zeros((5, count), np.int64)
        if count:
            ptrs = [
                c.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)) for c in cols
            ]
            lib.hmm_fasta_scan(self._buf, n, *ptrs, count)
        self._name_span = cols[0], cols[1]
        self._seq_span = cols[2], cols[3]
        self.lengths = cols[4].copy()
        mv = memoryview(self._mm) if self._mm is not None else b""
        self.names = [
            bytes(mv[a:b]).decode("ascii", errors="replace")
            for a, b in zip(cols[0], cols[1])
        ]

    def __len__(self):
        return len(self.names)

    def codes(self, i: int, lut256: np.ndarray | None = None) -> np.ndarray:
        """(L,) uint8 sequence bytes of record ``i``, whitespace removed,
        mapped through ``lut256`` (identity by default → raw base bytes)."""
        lut = _IDENTITY_LUT if lut256 is None else np.ascontiguousarray(
            lut256, np.uint8
        )
        out = np.empty(int(self.lengths[i]), np.uint8)
        a, b = self._seq_span[0][i], self._seq_span[1][i]
        w = self._lib.hmm_fasta_extract(
            self._buf, int(a), int(b), _u8ptr(lut), _u8ptr(out)
        )
        assert w == out.shape[0]
        return out

    def sequence(self, i: int) -> str:
        """Cleaned sequence string of record ``i`` (parity with the
        pure-Python ``data.read_fasta``)."""
        return self.codes(i).tobytes().decode("ascii", errors="replace")

    def onehot(self, i: int, row_lut: np.ndarray) -> np.ndarray:
        """Fused parse+encode: (L, c) float32 rows of ``row_lut`` (256, c)
        indexed by the record's sequence bytes — the zero-intermediate
        path from the file image to model input channels."""
        lut = np.ascontiguousarray(row_lut, np.float32)
        c = lut.shape[1]
        out = np.empty((int(self.lengths[i]), c), np.float32)
        a, b = self._seq_span[0][i], self._seq_span[1][i]
        w = self._lib.hmm_fasta_extract_onehot(
            self._buf,
            int(a),
            int(b),
            lut.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            c,
            _u8ptr(out),
        )
        assert w == out.shape[0]
        return out

    def __iter__(self):
        for i, name in enumerate(self.names):
            yield name, self.sequence(i)

    def close(self):
        # Release the ctypes view before the mmap (else mmap.close raises
        # "exported pointers exist").
        self._buf = None
        if self._mm is not None:
            self._mm.close()
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
