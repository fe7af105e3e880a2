"""Audio IO: native FLAC decode (ctypes) + WAV via scipy.

Replaces the torchaudio/soundfile load calls of the reference
(extract_feature.py:33, s3prl_upstream/expert.py, datasets/*). FLAC decoding
runs through a small C++ library (native/audio/flac_decoder.cc) built on
demand; decoded PCM is MD5-verified against the FLAC STREAMINFO checksum.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import subprocess
from typing import Tuple

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native" / "audio"
_LIB_PATH = _NATIVE_DIR / "libsslc_audio.so"
_lib = None


class _FlacInfo(ctypes.Structure):
    _fields_ = [
        ("sample_rate", ctypes.c_int32),
        ("channels", ctypes.c_int32),
        ("bits_per_sample", ctypes.c_int32),
        ("total_samples", ctypes.c_int64),
        ("md5", ctypes.c_uint8 * 16),
    ]


def _ensure_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)], check=True, capture_output=True
        )
    _lib = ctypes.CDLL(str(_LIB_PATH))
    _lib.flac_decode_file.restype = ctypes.c_int
    _lib.flac_decode_file.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(_FlacInfo),
    ]
    _lib.flac_free.argtypes = [ctypes.POINTER(ctypes.c_int32)]
    return _lib


def read_flac(path: str, verify_md5: bool = True) -> Tuple[np.ndarray, int]:
    """Decode a FLAC file -> (float32 (channels, n_samples) in [-1, 1], sr).
    Matches torchaudio.load's scaling (normalize by 2**(bps-1))."""
    lib = _ensure_lib()
    out = ctypes.POINTER(ctypes.c_int32)()
    info = _FlacInfo()
    rc = lib.flac_decode_file(
        os.fsencode(str(path)), ctypes.byref(out), ctypes.byref(info)
    )
    if rc != 0:
        raise IOError(f"FLAC decode failed ({rc}): {path}")
    n = info.total_samples * info.channels
    data = np.ctypeslib.as_array(out, shape=(n,)).copy()
    lib.flac_free(out)

    if verify_md5 and any(info.md5):
        bps = info.bits_per_sample
        if bps == 16:
            raw = data.astype("<i2").tobytes()
        elif bps == 8:
            raw = data.astype("<i1").tobytes()
        elif bps == 24:
            b = data.astype("<i4").tobytes()
            raw = b"".join(
                b[i : i + 3] for i in range(0, len(b), 4)
            )
        else:
            raw = None
        if raw is not None:
            got = hashlib.md5(raw).digest()
            want = bytes(info.md5)
            if got != want:
                raise IOError(f"FLAC MD5 mismatch decoding {path}")

    scale = float(1 << (info.bits_per_sample - 1))
    wav = (data.astype(np.float32) / scale).reshape(-1, info.channels).T
    return wav, int(info.sample_rate)


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        wav = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        wav = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        wav = (data.astype(np.float32) - 128.0) / 128.0
    else:
        wav = data.astype(np.float32)
    if wav.ndim == 1:
        wav = wav[None, :]
    else:
        wav = wav.T
    return wav, int(sr)


def read_audio(path: str) -> Tuple[np.ndarray, int]:
    p = str(path).lower()
    if p.endswith(".flac"):
        return read_flac(path)
    if p.endswith(".wav"):
        return read_wav(path)
    raise ValueError(f"unsupported audio format: {path}")
