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
    # staleness check BEFORE dlopen (glibc returns the cached handle for an
    # already-loaded path, so a post-load rebuild could not be picked up):
    # a prebuilt .so from before the Ogg codec lacks the sslc_ogg_* exports
    stale = (
        _LIB_PATH.exists()
        and b"sslc_ogg_available" not in _LIB_PATH.read_bytes()
    )
    if stale or not _LIB_PATH.exists():
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR), "clean", "all"],
            check=True, capture_output=True,
        )
    _lib = ctypes.CDLL(str(_LIB_PATH))
    _lib.flac_decode_file.restype = ctypes.c_int
    _lib.flac_decode_file.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(_FlacInfo),
    ]
    _lib.flac_free.argtypes = [ctypes.POINTER(ctypes.c_int32)]
    _lib.flac_decode_buffer.restype = ctypes.c_int
    _lib.flac_decode_buffer.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(_FlacInfo),
    ]
    _lib.sslc_ogg_available.restype = ctypes.c_int
    _lib.sslc_ogg_encode_available.restype = ctypes.c_int
    _lib.sslc_ogg_decode.restype = ctypes.c_int
    _lib.sslc_ogg_decode.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
    ]
    _lib.sslc_ogg_encode.restype = ctypes.c_int
    _lib.sslc_ogg_encode.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_float,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_size_t),
    ]
    _lib.sslc_ogg_free.argtypes = [ctypes.c_void_p]
    return _lib


def read_ogg_bytes(data: bytes,
                   origin: str = "<bytes>") -> Tuple[np.ndarray, int]:
    """Decode an in-memory Ogg Vorbis stream -> (float32 (C, T), sr).

    Reference parity: fairseq reads ogg members through soundfile
    (reference fairseq_code/audio_utils.py:40-44 accepts the OggS magic;
    datasets call sf.read). This build decodes through the SYSTEM
    libvorbisfile, dlopen'd by native/audio/ogg_vorbis.cc."""
    lib = _ensure_lib()
    if not lib.sslc_ogg_available():
        raise IOError(
            f"Ogg stream at {origin}: libvorbisfile is not available on "
            "this system — re-encode as FLAC or WAV"
        )
    pcm = ctypes.POINTER(ctypes.c_float)()
    channels = ctypes.c_int32()
    rate = ctypes.c_int32()
    frames = ctypes.c_int64()
    rc = lib.sslc_ogg_decode(
        data, len(data), ctypes.byref(pcm), ctypes.byref(channels),
        ctypes.byref(rate), ctypes.byref(frames),
    )
    if rc != 0:
        raise IOError(f"Ogg Vorbis decode failed ({rc}): {origin}")
    n = int(channels.value) * int(frames.value)
    wav = np.ctypeslib.as_array(pcm, shape=(n,)).copy().reshape(
        int(channels.value), int(frames.value)
    )
    lib.sslc_ogg_free(pcm)
    return wav, int(rate.value)


def read_ogg(path: str) -> Tuple[np.ndarray, int]:
    with open(path, "rb") as f:
        return read_ogg_bytes(f.read(), origin=path)


def write_ogg(path: str, wav: np.ndarray, sample_rate: int,
              quality: float = 0.4) -> None:
    """Encode (C, T) or (T,) float32 in [-1, 1] to an Ogg Vorbis file
    (libvorbisenc VBR). Used by tests and for exporting fixtures."""
    lib = _ensure_lib()
    if not lib.sslc_ogg_encode_available():
        raise IOError("libvorbis/libvorbisenc not available on this system")
    wav = np.asarray(wav, np.float32)
    if wav.ndim == 1:
        wav = wav[None, :]
    wav = np.ascontiguousarray(wav)
    out = ctypes.POINTER(ctypes.c_uint8)()
    out_len = ctypes.c_size_t()
    rc = lib.sslc_ogg_encode(
        wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        wav.shape[1], wav.shape[0], int(sample_rate),
        ctypes.c_float(quality), ctypes.byref(out), ctypes.byref(out_len),
    )
    if rc != 0:
        raise IOError(f"Ogg Vorbis encode failed ({rc}): {path}")
    buf = ctypes.cast(
        out, ctypes.POINTER(ctypes.c_uint8 * out_len.value)
    ).contents
    data = bytes(bytearray(buf))
    lib.sslc_ogg_free(out)
    with open(path, "wb") as f:
        f.write(data)


def _finish_flac(rc, out, info, origin, verify_md5):
    lib = _ensure_lib()
    if rc != 0:
        raise IOError(f"FLAC decode failed ({rc}): {origin}")
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
                raise IOError(f"FLAC MD5 mismatch decoding {origin}")

    scale = float(1 << (info.bits_per_sample - 1))
    wav = (data.astype(np.float32) / scale).reshape(-1, info.channels).T
    return wav, int(info.sample_rate)


def read_flac(path: str, verify_md5: bool = True) -> Tuple[np.ndarray, int]:
    """Decode a FLAC file -> (float32 (channels, n_samples) in [-1, 1], sr).
    Matches torchaudio.load's scaling (normalize by 2**(bps-1))."""
    lib = _ensure_lib()
    out = ctypes.POINTER(ctypes.c_int32)()
    info = _FlacInfo()
    rc = lib.flac_decode_file(
        os.fsencode(str(path)), ctypes.byref(out), ctypes.byref(info)
    )
    return _finish_flac(rc, out, info, path, verify_md5)


def read_flac_bytes(data: bytes, verify_md5: bool = True,
                    origin: str = "<bytes>") -> Tuple[np.ndarray, int]:
    """Decode an in-memory FLAC stream (e.g. a zip-slice) via the native
    flac_decode_buffer entry point."""
    lib = _ensure_lib()
    out = ctypes.POINTER(ctypes.c_int32)()
    info = _FlacInfo()
    rc = lib.flac_decode_buffer(
        data, len(data), ctypes.byref(out), ctypes.byref(info)
    )
    return _finish_flac(rc, out, info, origin, verify_md5)


def _normalize_pcm(pcm: np.ndarray) -> np.ndarray:
    """(T,) or (T, C) integer/float PCM -> (C, T) float32 in [-1, 1]."""
    if pcm.dtype == np.int16:
        wav = pcm.astype(np.float32) / 32768.0
    elif pcm.dtype == np.int32:
        wav = pcm.astype(np.float32) / 2147483648.0
    elif pcm.dtype == np.uint8:
        wav = (pcm.astype(np.float32) - 128.0) / 128.0
    else:
        wav = pcm.astype(np.float32)
    return wav[None, :] if wav.ndim == 1 else wav.T


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    return _normalize_pcm(data), int(sr)


# ---------------------------------------------------------------------------
# Zip-slice addressing (reference fairseq_code/audio_utils.py:7-45): manifest
# entries may point INTO a stored zip archive as "archive.zip:offset:length",
# where offset/length are byte positions of the stored (uncompressed) member.
# ---------------------------------------------------------------------------

_AUDIO_EXTS = (".npy", ".wav", ".flac", ".ogg")


def parse_path(path) -> Tuple[str, list]:
    """Split a manifest path into (file_path, slice_ptr). slice_ptr is []
    for a plain audio/feature file, or [byte_offset, byte_length] for a
    zip-slice path (reference audio_utils.py:7-29)."""
    path = str(path)
    if os.path.splitext(path)[1].lower() in _AUDIO_EXTS:
        return path, []
    file_path, *slice_ptr = str(path).split(":")
    if len(slice_ptr) != 2:
        raise ValueError(f"invalid audio path (want file.zip:offset:length): {path}")
    if not os.path.isfile(file_path):
        raise FileNotFoundError(f"File not found: {file_path}")
    return file_path, [int(i) for i in slice_ptr]


def read_from_stored_zip(zip_path: str, offset: int, length: int) -> bytes:
    """mmap a byte window out of a stored zip (reference audio_utils.py:31-38)."""
    import mmap

    with open(zip_path, "rb") as f:
        with mmap.mmap(f.fileno(), length=0, access=mmap.ACCESS_READ) as m:
            return m[offset:offset + length]


def is_sf_audio_data(data: bytes) -> bool:
    """True when the bytes start with a wav/flac/ogg magic
    (reference audio_utils.py:40-44)."""
    return len(data) >= 3 and (
        data[:3] == b"RIF" or data[:3] == b"fLa" or data[:3] == b"Ogg"
    )


def read_audio_bytes(data: bytes, origin: str = "<bytes>") -> Tuple[np.ndarray, int]:
    if data[:3] == b"fLa":
        return read_flac_bytes(data, origin=origin)
    if data[:3] == b"RIF":
        import io
        from scipy.io import wavfile

        sr, pcm = wavfile.read(io.BytesIO(data))
        return _normalize_pcm(pcm), int(sr)
    if data[:3] == b"Ogg":
        return read_ogg_bytes(data, origin=origin)
    raise ValueError(f"unsupported in-memory audio format: {origin}")


def read_audio(path: str) -> Tuple[np.ndarray, int]:
    file_path, slice_ptr = parse_path(path)
    if slice_ptr:
        data = read_from_stored_zip(file_path, slice_ptr[0], slice_ptr[1])
        if not is_sf_audio_data(data):
            raise ValueError(f"zip slice is not audio data: {path}")
        return read_audio_bytes(data, origin=path)
    p = file_path.lower()
    if p.endswith(".flac"):
        return read_flac(file_path)
    if p.endswith(".wav"):
        return read_wav(file_path)
    if p.endswith(".npy"):
        raise ValueError(
            f"{path} is a feature dump, not audio — load it with np.load "
            "(read_audio returns waveforms; .npy passes parse_path only so "
            "feature manifests route through the datasets' own loaders)"
        )
    if p.endswith(".ogg"):
        return read_ogg(file_path)
    raise ValueError(f"unsupported audio format: {path}")
