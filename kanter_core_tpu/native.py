"""ctypes binding for the C++ host-runtime kernels (`native/kanter_native.cpp`).

The library is built on demand with g++ (plain C ABI — no Python headers
required) and cached next to the source. Every entry point has a pure-Python
fallback, so the framework works without a toolchain; with it, plane spill
hashing and host-side u8 export run at native speed.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_CPP = os.path.join(_SRC, "kanter_native.cpp")
_SO = os.path.join(_SRC, "_kanter_native.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            # staleness is keyed on CONTENT + HOST, not mtime: the library
            # is built -march=native, so an .so that arrived via rsync/
            # tarball from another machine (fresh mtime, foreign microarch)
            # must rebuild, not load — a foreign binary dies with SIGILL,
            # which no Python fallback can catch. The fingerprint file
            # records sha256(cpp) + the CPU's feature flags.
            import hashlib
            import platform

            with open(_CPP, "rb") as f:
                src_hash = hashlib.sha256(f.read()).hexdigest()
            try:
                with open("/proc/cpuinfo") as f:
                    flags = next(
                        (ln for ln in f if ln.startswith("flags")), ""
                    )
            except OSError:
                flags = ""
            host = hashlib.sha256(
                (platform.machine() + flags).encode()
            ).hexdigest()[:16]
            stamp = f"{src_hash} {host}\n"
            stamp_path = _SO + ".stamp"
            current = None
            if os.path.exists(_SO) and os.path.exists(stamp_path):
                with open(stamp_path) as f:
                    current = f.read()
            if current != stamp:
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _SO, _CPP],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
                with open(stamp_path, "w") as f:
                    f.write(stamp)
            lib = ctypes.CDLL(_SO)
            lib.salted_hash64.restype = ctypes.c_uint64
            lib.salted_hash64.argtypes = [ctypes.c_void_p, ctypes.c_size_t, ctypes.c_uint64]
            lib.pack_rgba_u8.restype = None
            lib.pack_rgba_u8.argtypes = [ctypes.c_void_p] * 4 + [ctypes.c_size_t, ctypes.c_void_p]
            lib.pack_gray_u8.restype = None
            lib.pack_gray_u8.argtypes = [ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p]
            lib.planes_from_u8.restype = None
            lib.planes_from_u8.argtypes = [
                ctypes.c_void_p,
                ctypes.c_size_t,
                ctypes.c_int,
            ] + [ctypes.c_void_p] * 4
            _lib = lib
        except Exception:  # noqa: BLE001 — no toolchain / build error → fallback
            _build_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def salted_hash64(data: bytes | np.ndarray, salt: int) -> str:
    """Hex digest of the salted content hash used for spill-file names."""
    if not isinstance(data, np.ndarray):
        data = np.frombuffer(data, dtype=np.uint8)
    data = np.ascontiguousarray(data)
    lib = _load()
    if lib is None:
        import hashlib

        h = hashlib.blake2b(int(salt).to_bytes(16, "little"), digest_size=8)
        h.update(data.tobytes())
        return h.hexdigest()
    value = lib.salted_hash64(
        data.ctypes.data, data.nbytes, ctypes.c_uint64(salt & (2**64 - 1)).value
    )
    return f"{value:016x}"


def pack_rgba_u8(r, g, b, a) -> np.ndarray:
    """Host-side f32→u8 interleave with exact reference semantics."""
    lib = _load()
    planes = [np.ascontiguousarray(p, dtype=np.float32) for p in (r, g, b, a)]
    n = planes[0].size
    if lib is None:
        return _pack_rgba_py(*planes)
    out = np.empty(n * 4, dtype=np.uint8)
    lib.pack_rgba_u8(*(p.ctypes.data for p in planes), n, out.ctypes.data)
    return out


def pack_gray_u8(gray) -> np.ndarray:
    lib = _load()
    plane = np.ascontiguousarray(gray, dtype=np.float32)
    n = plane.size
    if lib is None:
        v = _f32_to_u8_py(plane).reshape(-1)
        out = np.empty((n, 4), dtype=np.uint8)
        out[:, 0] = out[:, 1] = out[:, 2] = v
        out[:, 3] = 255
        return out.reshape(-1)
    out = np.empty(n * 4, dtype=np.uint8)
    lib.pack_gray_u8(plane.ctypes.data, n, out.ctypes.data)
    return out


def planes_from_u8(pixels: np.ndarray) -> list[np.ndarray]:
    """Interleaved `[H, W, C]` u8 → four `[H, W]` f32 planes."""
    lib = _load()
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, channels = pixels.shape
    # the C kernel writes through a 4-pointer plane array for c < channels
    # and assumes u8 input — validate HERE (it cannot): a [H, W, 5] array
    # or a non-u8 dtype must take the pure-Python path, not corrupt memory
    if lib is None or channels > 4 or pixels.dtype != np.uint8:
        from .ops.image_io import deconstruct_image

        return deconstruct_image(pixels)
    pixels = np.ascontiguousarray(pixels)
    planes = [np.empty((h, w), dtype=np.float32) for _ in range(4)]
    lib.planes_from_u8(
        pixels.ctypes.data, h * w, channels, *(p.ctypes.data for p in planes)
    )
    return planes


def _f32_to_u8_py(x: np.ndarray) -> np.ndarray:
    c = np.clip(x, 0.0, 1.0)
    v = c * np.float32(255.0)
    v = np.where(np.isnan(v), np.float32(255.0), np.minimum(v, np.float32(255.0)))
    return v.astype(np.uint8)


def _pack_rgba_py(r, g, b, a) -> np.ndarray:
    return np.stack([_f32_to_u8_py(p) for p in (r, g, b, a)], axis=-1).reshape(-1)
