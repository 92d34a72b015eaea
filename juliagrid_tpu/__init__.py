"""juliagrid_tpu — a TPU-native steady-state power-system analysis framework.

A ground-up JAX/XLA/Pallas implementation with the capability surface of
JuliaGrid (power flow, optimal power flow, state estimation, observability,
bad-data processing) redesigned for TPU: batched dense-block linear algebra
on the MXU with mixed-precision iterative refinement, pure jittable solver
cores, and scenario/network sharding over device meshes.
"""

from . import config as _config  # noqa: F401  (enables x64 on import)
from .config import config, set_config, default_config
from .templates import default, set_template, template
from .units import units
from .system.load import power_system
from .system.model import ac_model, dc_model, physical_island, drop_zeros

__version__ = "0.1.0"
