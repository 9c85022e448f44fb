"""Build hook: compile the native data-loader core into the package.

The C++ decode/resize core (native/loader.cc) is a plain shared library
consumed through ctypes — not a CPython extension — so we compile it with
a small custom build_py step and ship it as package data at
``sdbc_tpu/_native/libsdbc_loader.so``.  The build is best-effort: if g++
or libjpeg headers are missing the wheel still builds and the loader falls
back to PIL at run time (sdbc_tpu/data/native_loader.py).
"""
import os
import shutil
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py
from setuptools.dist import Distribution

HERE = os.path.dirname(os.path.abspath(__file__))


class BuildWithNative(build_py):
    def run(self):
        super().run()
        src = os.path.join(HERE, "native", "loader.cc")
        if not os.path.exists(src):  # sdist without native sources
            return
        out_dir = os.path.join(self.build_lib, "sdbc_tpu", "_native")
        os.makedirs(out_dir, exist_ok=True)
        out = os.path.join(out_dir, "libsdbc_loader.so")
        cxx = os.environ.get("CXX", "g++")
        cmd = [cxx, "-O3", "-ffast-math", "-funroll-loops", "-fPIC",
               "-shared", "-std=c++17", "-o", out, src, "-ljpeg", "-lpthread"]
        # -march defaults to the local host (fastest for install-from-source,
        # the normal path).  The wheel carries a platform tag
        # (BinaryDistribution below), but that can't encode the micro-arch:
        # a native-march wheel moved to an older same-platform CPU can still
        # SIGILL inside the loader — when building a wheel for distribution
        # set SDBC_NATIVE_MARCH to a portable level (e.g. x86-64-v2) or
        # disable the flag entirely with SDBC_NATIVE_MARCH=off (accepted
        # disablers: '', '0', 'off', 'none', 'false').
        march = os.environ.get("SDBC_NATIVE_MARCH", "native").strip().lower()
        if march not in ("", "0", "off", "none", "false"):
            cmd.insert(1, f"-march={march}")
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=300)
            print(f"built native loader -> {out}")
        except Exception as e:  # noqa: BLE001 — best-effort native build
            print(f"WARNING: native loader build skipped ({e}); "
                  "PIL fallback will be used")
            if os.path.exists(out):
                os.remove(out)
            if not os.listdir(out_dir):
                shutil.rmtree(out_dir)


class BinaryDistribution(Distribution):
    """Force a platform wheel tag: the bundled .so is host-compiled, so a
    py3-none-any tag would let pip install it onto an incompatible CPU
    (ctypes loads fine, first call SIGILLs past the PIL fallback)."""

    def has_ext_modules(self):
        return True


setup(cmdclass={"build_py": BuildWithNative}, distclass=BinaryDistribution)
