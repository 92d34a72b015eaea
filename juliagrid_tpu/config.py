"""Global configuration for the juliagrid_tpu framework.

TPU-native design note: the reference framework (JuliaGrid) works in float64
throughout. On TPU the MXU is fp32/bf16; f64 is software-emulated for
elementwise ops and matmuls but *not* supported by XLA's LU expander. Our
solver substrate therefore factorizes in f32 on the MXU and recovers f64
accuracy via mixed-precision iterative refinement (see ops/linalg.py). The
framework-wide default dtype is f64 so results match the reference oracles
to their tolerances.

Mirrors the reference's ``@config`` macro and ``ConfigTemplate``
(/root/reference/src/backend/internal.jl:299-312, definition/internal.jl:236).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import jax

# Enable x64 once at import. Opt out with JGTPU_NO_X64=1 (e.g. pure-f32 benches).
if not os.environ.get("JGTPU_NO_X64"):
    jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: first compiles through the TPU tunnel cost
# 30-160 s; cached reloads take milliseconds. Opt out with JGTPU_NO_CACHE=1.
# The directory is scoped by a host-CPU fingerprint: the home dir persists
# across rounds that may land on different machines, and XLA:CPU AOT
# executables compiled for another host's CPU features load with a
# SIGILL-risk warning (observed round 4: avx512-extras mismatch).
if not os.environ.get("JGTPU_NO_CACHE"):
    def _host_fingerprint():
        import hashlib
        import platform
        tag = platform.machine()
        try:
            with open("/proc/cpuinfo") as fh:
                for line in fh:
                    if line.startswith("flags"):
                        tag += line
                        break
        except OSError:
            pass
        return hashlib.sha1(tag.encode()).hexdigest()[:10]

    _cache_dir = os.environ.get(
        "JGTPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "juliagrid_tpu",
                     _host_fingerprint()))
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


@dataclass
class Config:
    """Live global configuration (the reference's ``template.config``)."""

    #: solver progress verbosity 0..3 (reference @config(verbose=...))
    verbose: int = 0
    #: default label key type for new elements: ``int`` or ``str``
    label_type: type = int
    #: dtype for device state arrays (f64 default for oracle parity)
    dtype: str = "float64"
    #: dtype used inside MXU factorizations (iterative refinement recovers f64)
    factor_dtype: str = "float32"


config = Config()


def set_config(**kwargs) -> None:
    """Equivalent of the reference ``@config`` macro."""
    for k, v in kwargs.items():
        if not hasattr(config, k):
            raise KeyError(f"unknown config key: {k}")
        setattr(config, k, v)


def default_config() -> None:
    """Reset global config (part of the reference ``@default`` macro)."""
    global config
    config.verbose = 0
    config.label_type = int
    config.dtype = "float64"
    config.factor_dtype = "float32"
