"""Lazy native build: compile src/*.cc to a shared lib, cached by source hash.

No pybind11 in this image, so bindings are plain ``extern "C"`` + ctypes.
The build is a single g++ invocation (no cmake for one TU); artifacts land in
the package dir as _batching_<hash>.so so rebuilds happen exactly when the
source changes. Returns None (→ Python fallback) when no compiler exists.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import subprocess
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "batching.cc")


def _source_hash() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:12]


def ensure_built(verbose: bool = False) -> Optional[str]:
    """Compile (if needed) and return the shared-lib path, or None."""
    if not os.path.exists(_SRC):
        return None
    out = os.path.join(_DIR, f"_batching_{_source_hash()}.so")
    if os.path.exists(out):
        return out
    cxx = os.environ.get("CXX") or shutil.which("g++") or shutil.which("c++")
    if cxx is None:
        return None
    tmp = out + ".tmp"
    cmd = [cxx, "-O3", "-std=c++17", "-shared", "-fPIC", "-o", tmp, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=not verbose,
                       timeout=120)
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired):
        return None
    os.replace(tmp, out)
    # clean stale builds
    for name in os.listdir(_DIR):
        if (name.startswith("_batching_") and name.endswith(".so")
                and os.path.join(_DIR, name) != out):
            try:
                os.unlink(os.path.join(_DIR, name))
            except OSError:
                pass
    return out
