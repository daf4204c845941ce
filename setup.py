"""Wheel build for cudabrot-tpu, including the native runtime core.

The native library (csrc/tpubrot_native.cpp) is a plain shared library
loaded via ctypes — not a CPython extension — so the stock build_ext
naming (ABI-tagged suffix) is wrong for it. This custom command compiles
it with the same flags as csrc/Makefile and drops it inside the package
as `cudabrot_tpu/libtpubrot_native.so`, where cudabrot_tpu.io.native
looks first (the repo-checkout csrc/ lazy build remains the dev path).

Build a wheel:  pip wheel . --no-deps -w dist/
Target arch:    TPUBROT_MARCH=x86-64-v4 pip wheel ...  (default: native)
"""

from __future__ import annotations

import os
import subprocess

from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class BuildNativeLib(build_ext):
    def build_extension(self, ext):
        if ext.name != "cudabrot_tpu.libtpubrot_native":
            return super().build_extension(ext)
        dest = os.path.join(
            os.path.dirname(self.get_ext_fullpath(ext.name)),
            "libtpubrot_native.so",
        )
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        march = os.environ.get("TPUBROT_MARCH", "native")
        cmd = [
            os.environ.get("CXX", "g++"),
            "-O3", f"-march={march}", "-funroll-loops", "-fno-math-errno",
            "-fPIC", "-shared", "-pthread", "-std=c++17",
            "-o", dest, *ext.sources,
        ]
        print(" ".join(cmd))
        subprocess.run(cmd, check=True)


setup(
    ext_modules=[
        Extension(
            "cudabrot_tpu.libtpubrot_native",
            sources=["csrc/tpubrot_native.cpp"],
            optional=True,
        )
    ],
    cmdclass={"build_ext": BuildNativeLib},
)
