"""Audio I/O.

Replaces the reference's soundfile/torchaudio readers
(reference: fairseq/data/audio/audio_utils.py:7-56 get_waveform/
get_waveform_chi): stdlib WAV parsing (PCM16/PCM32/float32), with the
``path:frame_offset:frame_length`` addressing used by the MuST-C wave
manifests (reference: fairseq/data/audio/speech_to_text_dataset.py:126-204,
chimera/prepare_data/prep_mustc_data.py:186-191) and .npy feature loading
(optionally zip-packed with byte offsets).
"""

from __future__ import annotations

import io
import os
import struct
import threading
import wave
from collections import OrderedDict
from pathlib import Path
from typing import Optional, Tuple

import numpy as np


def read_wav(
    path: str,
    frame_offset: int = 0,
    frames: int = -1,
    normalize: bool = True,
    int16: bool = False,
) -> Tuple[np.ndarray, int]:
    """Read (a slice of) a WAV file -> (mono float32 waveform, sample_rate).

    ``int16=True``: for mono PCM16 sources, return the raw ``<i2`` samples
    untouched (LOSSLESS — normalization to [-1, 1) is samples/32768, which
    the consumer applies on-device; see train_step.prepare_batch). Halves
    every downstream host byte: decoded-wav cache, pad copy, host->device
    wire. Non-PCM16 or multi-channel sources fall back to float32."""
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n_channels = w.getnchannels()
        sampwidth = w.getsampwidth()
        total = w.getnframes()
        if frame_offset > 0:
            w.setpos(min(frame_offset, total))
        n = total - frame_offset if frames < 0 else min(frames, total - frame_offset)
        raw = w.readframes(max(n, 0))

    if sampwidth == 2:
        if int16 and n_channels == 1:
            return np.frombuffer(raw, dtype="<i2"), sr
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32)
        if normalize:
            data /= 32768.0
    elif sampwidth == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32)
        if normalize:
            data /= 2147483648.0
    elif sampwidth == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0)
        if normalize:
            data /= 128.0
    else:
        raise ValueError(f"unsupported WAV sample width: {sampwidth}")

    if n_channels > 1:
        data = data.reshape(-1, n_channels).mean(axis=1)
    return data, sr


def write_wav(path: str, data: np.ndarray, sample_rate: int = 16000) -> None:
    """Write mono float32 [-1, 1] to 16-bit PCM WAV (for tests/tools)."""
    pcm = np.clip(data, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())


def parse_path_with_slice(path: str) -> Tuple[str, int, int]:
    """'file.wav:offset:length' -> (file, offset, length); bare path -> (-1s)."""
    parts = path.rsplit(":", 2)
    if len(parts) == 3 and parts[1].lstrip("-").isdigit() and parts[2].lstrip("-").isdigit():
        return parts[0], int(parts[1]), int(parts[2])
    return path, 0, -1


class _LRUByteCache:
    """Bytes-capped LRU over decoded waveforms/features.

    The reference re-decodes every wav on every epoch (torchaudio read per
    __getitem__, speech_to_text_dataset.py:126-204); on this framework's
    1-core hosts the decode+IO is a measurable slice of the per-update host
    budget, so repeat epochs hit this cache instead. Entries are immutable by
    convention — every consumer copies via .astype(...) before mutating."""

    def __init__(self, max_bytes: int):
        self.max_bytes = int(max_bytes)
        self._store: "OrderedDict[tuple, np.ndarray]" = OrderedDict()
        self._bytes = 0
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    def get(self, key) -> Optional[np.ndarray]:
        with self._lock:
            arr = self._store.get(key)
            if arr is not None:
                self._store.move_to_end(key)
                self.hits += 1
            else:
                self.misses += 1
            return arr

    def put(self, key, arr: np.ndarray) -> None:
        nb = arr.nbytes
        if nb > self.max_bytes:
            return
        with self._lock:
            if key in self._store:
                return
            self._store[key] = arr
            self._bytes += nb
            while self._bytes > self.max_bytes and self._store:
                _, old = self._store.popitem(last=False)
                self._bytes -= old.nbytes

    def clear(self) -> None:
        with self._lock:
            self._store.clear()
            self._bytes = 0


# default 512 MiB; CHIMERA_WAV_CACHE_MB=0 disables
_WAV_CACHE_MB = float(os.environ.get("CHIMERA_WAV_CACHE_MB", "512"))
_wav_cache = (
    _LRUByteCache(int(_WAV_CACHE_MB * 1024 * 1024)) if _WAV_CACHE_MB > 0 else None
)


def configure_wav_cache(max_mb: float) -> None:
    """Resize (or with 0, disable) the process-wide decoded-waveform cache."""
    global _wav_cache
    _wav_cache = (
        _LRUByteCache(int(max_mb * 1024 * 1024)) if max_mb > 0 else None
    )


def get_features_or_waveform(
    path: str, use_audio_input: bool = True, audio_root: str = "",
    int16: bool = False,
) -> np.ndarray:
    """Dispatch on manifest audio column (reference:
    speech_to_text_dataset.py:126-204): raw-wave slice, .npy features, or
    zip-packed .npy (``archive.zip:offset:length`` byte window).

    ``int16=True`` requests the lossless PCM16 wire format (see read_wav);
    callers must handle either dtype coming back. Results are served from a
    process-wide LRU cache (repeat epochs skip IO+decode); treat the returned
    array as immutable — copy (e.g. .astype) before mutating."""
    fname, offset, length = parse_path_with_slice(path)
    full = str(Path(audio_root) / fname) if audio_root else fname
    key = (full, offset, length, use_audio_input, int16)
    if _wav_cache is not None:
        hit = _wav_cache.get(key)
        if hit is not None:
            return hit
    if fname.endswith(".npy"):
        out = np.load(full)
    elif fname.endswith(".zip"):
        with open(full, "rb") as f:
            f.seek(offset)
            blob = f.read(length)
        out = np.load(io.BytesIO(blob))
    elif use_audio_input:
        out, _ = read_wav(full, frame_offset=offset, frames=length, int16=int16)
    else:
        raise ValueError(f"cannot load features from {path!r}")
    if _wav_cache is not None:
        _wav_cache.put(key, out)
    return out
