"""Build hook: compile the native C++ data loader into package data.

All project metadata lives in pyproject.toml; this file only extends
``build_py`` so wheels ship ``valle_tpu/data/_native/libvalle_data.so``
(plus the source, so installs without a prebuilt .so can rebuild it
lazily — see valle_tpu/data/native_loader.py).  If no C++ compiler is
available the build still succeeds: the loader degrades to the numpy
fallback at run time.

Role parity with the reference's setup.py (ref /root/reference/setup.py),
which likewise treats native extensions as optional at install time.
"""

import shutil
import subprocess
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py

ROOT = Path(__file__).resolve().parent
LOADER_SRC = ROOT / "native" / "loader" / "valle_loader.cc"


class build_py_with_native(build_py):
    def run(self):
        super().run()
        if not LOADER_SRC.exists():
            return
        dest = Path(self.build_lib) / "valle_tpu" / "data" / "_native"
        dest.mkdir(parents=True, exist_ok=True)
        shutil.copy2(LOADER_SRC, dest / "valle_loader.cc")
        so = dest / "libvalle_data.so"
        try:
            # -march=native is deliberately absent: wheels must run on any
            # x86-64 host, unlike the in-repo native/build.sh dev build.
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
                 str(LOADER_SRC), "-o", str(so)],
                check=True, capture_output=True,
            )
        except Exception:
            so.unlink(missing_ok=True)  # numpy fallback at run time


setup(cmdclass={"build_py": build_py_with_native})
