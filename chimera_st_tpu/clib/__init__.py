"""Native host-runtime extensions (C++ via ctypes).

Equivalents of the reference's native components
(reference: fairseq/clib/libbleu, fairseq/clib/libnat,
fairseq/data/data_utils_fast.pyx): BLEU n-gram counting, Levenshtein
distance, and token-budget batch packing. Compiled on demand with g++ into a
shared library next to this file; importers fall back to pure Python/NumPy
when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_HERE = Path(__file__).parent
_SO = _HERE / "_chimera_clib.so"
_SRC = _HERE / "libbleu.cpp"


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(_SRC), "-o", str(_SO)],
            check=True,
            capture_output=True,
        )
        return True
    except Exception as e:  # pragma: no cover - toolchain missing
        logger.warning(f"clib build failed ({e}); using Python fallbacks")
        return False


_lib = None
if _SO.exists() or _build():
    try:
        _lib = ctypes.CDLL(str(_SO))
        _lib.bleu_add.restype = None
        _lib.levenshtein.restype = ctypes.c_int64
        _lib.batch_by_size_fast.restype = ctypes.c_int64
    except OSError:  # pragma: no cover
        _lib = None


class _BleuStatC(ctypes.Structure):
    _fields_ = [
        (name, ctypes.c_int64)
        for name in (
            "reflen", "predlen",
            "match1", "count1", "match2", "count2",
            "match3", "count3", "match4", "count4",
        )
    ]


class libbleu:
    available = _lib is not None

    @staticmethod
    def ngram_stats(ref, pred):
        from ..scoring.bleu import BleuStat

        if _lib is None:
            from ..scoring.bleu import ngram_stats as py_stats

            return py_stats(list(ref), list(pred))
        r = np.asarray(ref, np.int32)
        p = np.asarray(pred, np.int32)
        stat = _BleuStatC()
        _lib.bleu_add(
            ctypes.byref(stat),
            r.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int64(len(r)),
            p.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int64(len(p)),
        )
        return BleuStat(**{f: getattr(stat, f) for f, _ in _BleuStatC._fields_})


class libnat:
    available = _lib is not None

    @staticmethod
    def levenshtein(a, b) -> int:
        if _lib is None:
            raise RuntimeError("clib unavailable")
        aa = np.asarray([hash(x) & 0x7FFFFFFF if not isinstance(x, (int, np.integer)) else int(x) for x in a], np.int32)
        bb = np.asarray([hash(x) & 0x7FFFFFFF if not isinstance(x, (int, np.integer)) else int(x) for x in b], np.int32)
        return int(
            _lib.levenshtein(
                aa.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                ctypes.c_int64(len(aa)),
                bb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                ctypes.c_int64(len(bb)),
            )
        )


def batch_by_size_native(sizes: np.ndarray, max_tokens, max_sentences, bsz_mult):
    """Returns batch end-offsets array, or None if the library is missing."""
    if _lib is None:
        return None
    sizes = np.ascontiguousarray(sizes, np.int64)
    out = np.zeros(len(sizes) + 1, np.int64)
    n = _lib.batch_by_size_fast(
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(sizes)),
        ctypes.c_int64(max_tokens if max_tokens is not None else 2**62),
        ctypes.c_int64(max_sentences if max_sentences is not None else 2**62),
        ctypes.c_int64(bsz_mult),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out[:n]
