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
# a shipped .so without the .cpp source is fine — skip the freshness check
# (review fix: _SRC.stat() raised FileNotFoundError, which consumers
# guarding only against ImportError did not catch)
_fresh = (
    _SO.exists() and (not _SRC.exists() or _SO.stat().st_mtime >= _SRC.stat().st_mtime)
) or _build()
if _fresh:
    try:
        _lib = ctypes.CDLL(str(_SO))
        _lib.bleu_add.restype = None
        _lib.levenshtein.restype = ctypes.c_int64
        _lib.batch_by_size_fast.restype = ctypes.c_int64
        _lib.suggested_edit_ops.restype = None
    except (OSError, AttributeError):  # pragma: no cover
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


def _suggested_edit_ops_py(xs: np.ndarray, ys: np.ndarray, pad: int):
    """NumPy fallback for suggested_edit_ops (same reference semantics:
    fairseq/clib/libnat/edit_dist.cpp:23-115 — insert>delete>keep tie order)."""
    B, Lx = xs.shape
    Ly = ys.shape[1]
    ins_counts = np.zeros((B, max(Lx - 1, 1)), np.int32)
    ins_masks = np.zeros((B, Ly), np.uint8)
    del_labels = np.zeros((B, Lx), np.uint8)
    for b in range(B):
        xpos = np.nonzero(xs[b] != pad)[0]
        x = xs[b, xpos]
        y = ys[b][ys[b] != pad]
        lx, ly = len(x), len(y)
        if lx == 0:
            ins_masks[b, :ly] = 1
            continue
        d = np.zeros((lx + 1, ly + 1), np.int32)
        d[:, 0] = np.arange(lx + 1)
        d[0, :] = np.arange(ly + 1)
        for i in range(1, lx + 1):
            # vectorized row update is wrong (d[i][j] depends on d[i][j-1]);
            # keep the scalar inner loop — this is the cold fallback path
            for j in range(1, ly + 1):
                d[i, j] = min(
                    min(d[i - 1, j], d[i, j - 1]) + 1,
                    d[i - 1, j - 1] + (0 if x[i - 1] == y[j - 1] else 2),
                )
        ops = []
        i, j = lx, ly
        while i > 0 or j > 0:
            if j > 0 and d[i, j - 1] < d[i, j]:
                ops.append(1)
                j -= 1
            elif i > 0 and d[i - 1, j] < d[i, j]:
                ops.append(2)
                i -= 1
            else:
                ops.append(3)
                i -= 1
                j -= 1
        xcount = ycount = 0
        for op in reversed(ops):
            if op == 1:
                if 1 <= xcount <= lx - 1:
                    ins_counts[b, xcount - 1] += 1
                    if ycount < ly:
                        ins_masks[b, ycount] = 1
                ycount += 1
            elif op == 2:
                del_labels[b, xpos[xcount]] = 1
                xcount += 1
            else:
                xcount += 1
                ycount += 1
    return ins_counts, ins_masks, del_labels


def suggested_edit_ops(in_tokens, out_tokens, pad: int = 1):
    """Levenshtein NAT training targets (host-side, batched).

    Returns (ins_counts [B, Lx-1] int32, ins_masks [B, Ly] bool,
    del_labels [B, Lx] bool): tokens to insert between adjacent kept inputs,
    output positions that are insertions, inputs to delete.
    reference: fairseq/clib/libnat/edit_dist.cpp suggested_ed2_path consumed
    by fairseq/models/nat/levenshtein_utils.py:37-152."""
    xs = np.ascontiguousarray(in_tokens, np.int32)
    ys = np.ascontiguousarray(out_tokens, np.int32)
    if _lib is None:
        ic, im, dl = _suggested_edit_ops_py(xs, ys, pad)
        return ic, im.astype(bool), dl.astype(bool)
    B, Lx = xs.shape
    Ly = ys.shape[1]
    ins_counts = np.zeros((B, max(Lx - 1, 1)), np.int32)
    ins_masks = np.zeros((B, Ly), np.uint8)
    del_labels = np.zeros((B, Lx), np.uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    _lib.suggested_edit_ops(
        xs.ctypes.data_as(i32p),
        ys.ctypes.data_as(i32p),
        ctypes.c_int64(B),
        ctypes.c_int64(Lx),
        ctypes.c_int64(Ly),
        ctypes.c_int32(pad),
        ins_counts.ctypes.data_as(i32p),
        ins_masks.ctypes.data_as(u8p),
        del_labels.ctypes.data_as(u8p),
    )
    return ins_counts, ins_masks.astype(bool), del_labels.astype(bool)


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
