"""Shared CLI plumbing: gflags-style argument handling and backend setup."""

from __future__ import annotations

import argparse


def make_parser(description: str) -> argparse.ArgumentParser:
    # gflags accepts both --flag=value and --flag value; argparse does too.
    return argparse.ArgumentParser(description=description, allow_abbrev=False)


def setup_backend(dtype_flag: str = "auto"):
    """Choose compute dtype by backend and enable x64 when needed.

    float64 on CPU matches the reference numerics exactly; float32 on TPU
    keeps the MXU/VPU fast paths (TPUs emulate f64 slowly). Returns the jnp
    dtype to use.

    PILOTGURU_TPU_PLATFORM=cpu|tpu|... force-selects the JAX platform. This
    exists because site-installed accelerator plugins can ignore the
    standard JAX_PLATFORMS environment variable; the config update here
    always wins (as long as no computation ran yet).
    """
    import os

    import jax
    import jax.numpy as jnp

    platform_override = os.environ.get("PILOTGURU_TPU_PLATFORM")
    if platform_override:
        jax.config.update("jax_platforms", platform_override)

    if dtype_flag == "auto":
        platform = jax.default_backend()
        dtype_flag = "float64" if platform == "cpu" else "float32"
    if dtype_flag == "float64":
        jax.config.update("jax_enable_x64", True)
        return jnp.float64
    return jnp.float32


def add_dtype_flag(parser: argparse.ArgumentParser) -> None:
    parser.add_argument(
        "--dtype",
        choices=["auto", "float32", "float64"],
        default="auto",
        help="Compute precision; auto = float64 on CPU, float32 on TPU.",
    )
