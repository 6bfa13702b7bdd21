"""Build the native extensions: python native/setup.py build_ext --inplace
(from the repo root: make native, or scripts below handle it)."""

from setuptools import Extension, setup

setup(
    name="karanta-tpu-native",
    version="0.1.0",
    ext_modules=[
        Extension(
            "fastlev",
            sources=["fastlev.cpp"],
            extra_compile_args=["-O3", "-std=c++17"],
        ),
        Extension(
            "pdflex",
            sources=["pdflex.cpp"],
            extra_compile_args=["-O3", "-std=c++17"],
        ),
        Extension(
            "fastpng",
            sources=["fastpng.cpp"],
            libraries=["z"],
            extra_compile_args=["-O3", "-std=c++17"],
        ),
        Extension(
            "jbig2core",
            sources=["jbig2core.cpp"],
            extra_compile_args=["-O3", "-std=c++17"],
        ),
    ],
)
