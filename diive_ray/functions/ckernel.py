"""Tiny compile-once cache for the engine's from-scratch C kernels.

One pattern, shared by every kernel module (cmedian's rolling median,
gorilla's bit packer): hash the C source, compile it ONCE per host
with the system toolchain into /tmp (atomic rename so racing Ray
workers agree on the artifact), dlopen via cffi. Everything is gated —
no compiler, no cffi or a failed build simply returns None and the
caller stays on its vectorized-numpy fallback, so the engine never
REQUIRES a toolchain; it just uses one when present.
"""

from __future__ import annotations

import os

_cache: dict[str, tuple] = {}


def build(src: str, cdef: str):
    """Compile ``src`` (cached by content hash) and return (lib, ffi),
    or None when compilation is unavailable/fails."""
    key = src
    if key in _cache:
        return _cache[key]
    out = None
    try:
        import hashlib
        import subprocess
        import tempfile

        from cffi import FFI

        tag = hashlib.sha256(src.encode()).hexdigest()[:16]
        cache_dir = os.path.join(tempfile.gettempdir(),
                                 "diive_ray_ckernels")
        os.makedirs(cache_dir, exist_ok=True)
        so = os.path.join(cache_dir, f"k_{tag}.so")
        if not os.path.exists(so):
            csrc = os.path.join(cache_dir, f"k_{tag}.c")
            with open(csrc, "w") as f:
                f.write(src)
            tmp_so = so + f".tmp{os.getpid()}"
            subprocess.run(
                ["cc", "-O2", "-shared", "-fPIC", "-o", tmp_so, csrc],
                check=True, capture_output=True,
            )
            os.replace(tmp_so, so)
        ffi = FFI()
        ffi.cdef(cdef)
        out = (ffi.dlopen(so), ffi)
    except Exception:
        out = None
    _cache[key] = out
    return out
