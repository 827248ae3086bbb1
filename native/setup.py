"""Build the native scene-IO accelerator:
    python native/setup.py build_ext --inplace
(installs `fastio` next to the package; `data/native.py` picks it up)."""

from setuptools import Extension, setup

setup(
    name="fastio",
    ext_modules=[Extension(
        "fastio", ["native/fastio.cpp"],
        extra_compile_args=["-O3", "-std=c++17"],
    )],
)
