from setuptools import find_packages, setup

setup(
    name="sparse_view_3dgs_pack_tpu",
    version="0.1.0",
    description=("TPU-native sparse-view 3D Gaussian Splatting framework "
                 "(JAX/XLA/Pallas): LGDWT-GS, vanilla 3DGS, FSGS, DNGaussian "
                 "and multispectral mult-dwtgs plus the fs3dgs benchmark "
                 "harness"),
    packages=find_packages(include=["sparse_view_3dgs_pack_tpu",
                                    "sparse_view_3dgs_pack_tpu.*"]),
    python_requires=">=3.10",
    install_requires=["jax", "numpy", "pyyaml", "pillow", "matplotlib"],
    entry_points={
        "console_scripts": [
            "gs_benchmark = sparse_view_3dgs_pack_tpu.benchmark.cli:main",
        ],
    },
)
