"""Build the native imageops library with g++ (no pybind11 needed)."""

from __future__ import annotations

import os
import subprocess


def build(verbose: bool = False) -> str:
    here = os.path.dirname(__file__)
    src = os.path.join(here, "imageops.cpp")
    out = os.path.join(here, "libtpugan_imageops.so")
    if (os.path.exists(out)
            and os.path.getmtime(out) >= os.path.getmtime(src)):
        return out
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
           "-std=c++17", src, "-o", out]
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0:
        raise RuntimeError(f"native build failed:\n{res.stderr}")
    if verbose:
        print(f"built {out}")
    return out


if __name__ == "__main__":
    build(verbose=True)
