"""Scenario batching and device-mesh sharding (see batch.py)."""

from .batch import (batched_dc_solve, batched_dc_solve_jit,
                    batched_nr_solve, batched_nr_solve_f32,
                    batched_nr_solve_f32_jit, batched_nr_solve_jit,
                    batched_se_solve, batched_se_solve_jit, scenario_mesh,
                    shard_scenarios, sharded_nr_solve, sharded_se_solve)

__all__ = [
    "batched_dc_solve", "batched_dc_solve_jit", "batched_nr_solve",
    "batched_nr_solve_f32", "batched_nr_solve_f32_jit",
    "batched_nr_solve_jit", "batched_se_solve", "batched_se_solve_jit",
    "scenario_mesh", "shard_scenarios", "sharded_nr_solve",
    "sharded_se_solve",
]
