"""Build the native entropy-coding runtime (g++ → shared object, cached by
source hash). One .so holds both coders: rANS (rans.cpp) and the range coder
(rangecoder.cpp)."""

from __future__ import annotations

import hashlib
import os
import subprocess
import sys
from pathlib import Path

_PKG_DIR = Path(__file__).resolve().parent
_SRCS = [_PKG_DIR / "csrc" / "rans.cpp", _PKG_DIR / "csrc" / "rangecoder.cpp"]

_FLAGS = ["-O3", "-std=c++17", "-shared", "-fPIC"]


def _source_tag() -> str:
    h = hashlib.sha256()
    for src in _SRCS:
        h.update(src.read_bytes())
    h.update(" ".join(_FLAGS).encode())
    return h.hexdigest()[:16]


def build_library(verbose: bool = False) -> Path:
    """Compile the csrc/ sources into a cached .so and return its path."""
    tag = _source_tag()
    out = _PKG_DIR / f"_rans_{tag}.so"
    if out.exists():
        return out

    # Clean stale builds of older source versions.
    for stale in _PKG_DIR.glob("_rans_*.so"):
        try:
            stale.unlink()
        except OSError:
            pass

    cmd = [os.environ.get("CXX", "g++"), *_FLAGS, "-o", str(out),
           *[str(s) for s in _SRCS]]
    if verbose:
        print(" ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True, capture_output=not verbose)
    return out


if __name__ == "__main__":
    print(build_library(verbose=True))
