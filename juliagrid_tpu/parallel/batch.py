"""Scenario batching and device-mesh sharding.

The reference is single-threaded, single-process (SURVEY §5): its users run
scenario studies by re-running scripts. Here the scenario axis is a
first-class array dimension:

  * within one chip: ``jax.vmap`` over the solver cores (mismatch/Jacobian
    assembly become batched segment-sums, the factorizations become batched
    MXU matmul pipelines);
  * across a pod slice: ``NamedSharding`` over a ``Mesh`` with a
    ``scenario`` axis — XLA partitions the batched program with zero
    cross-device communication except the final convergence reductions,
    which ride ICI as ``psum``-style collectives.

Network-block (BBD/Schur) sharding for single giant cases is the ``block``
mesh axis; see ops/bbd.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..powerflow.ac import AcArrays, _mismatch, _nr_step


def batched_nr_solve(arr: AcArrays, vm0, va0, p_sched, q_sched,
                     tol: float = 1e-8, max_iter: int = 20):
    """Batched Newton-Raphson over scenarios.

    ``vm0, va0, p_sched, q_sched`` carry a leading scenario axis; the
    network (Y-bus pattern/values) is shared. All scenarios iterate in
    lockstep inside one ``lax.while_loop`` until every scenario converges
    or hits the cap — the batched equivalent of the reference driver loop.
    Returns (vm, va, iterations, converged) with per-scenario counts.
    """

    def one_mismatch(vm, va, ps, qs):
        a = arr._replace(p_sched=ps, q_sched=qs)
        _, _, dp, dq = _mismatch(a, vm, va)
        return dp, dq

    def one_step(vm, va, ps, qs):
        a = arr._replace(p_sched=ps, q_sched=qs)
        return _nr_step(a, vm, va, "LU")

    v_mismatch = jax.vmap(one_mismatch)
    v_step = jax.vmap(one_step)

    dp, dq = v_mismatch(vm0, va0, p_sched, q_sched)
    active0 = ~((dp < tol) & (dq < tol))

    def cond(carry):
        vm, va, it, active, iters = carry
        return jnp.any(active) & (it < max_iter)

    def body(carry):
        vm, va, it, active, iters = carry
        vm_new, va_new = v_step(vm, va, p_sched, q_sched)
        # only scenarios that are still active advance
        vm = jnp.where(active[:, None], vm_new, vm)
        va = jnp.where(active[:, None], va_new, va)
        iters = iters + active.astype(iters.dtype)
        dp, dq = v_mismatch(vm, va, p_sched, q_sched)
        active = active & ~((dp < tol) & (dq < tol))
        return vm, va, it + 1, active, iters

    nscen = vm0.shape[0]
    iters0 = jnp.zeros(nscen, dtype=jnp.int32)
    vm, va, it, active, iters = jax.lax.while_loop(
        cond, body, (vm0, va0, jnp.int32(0), active0, iters0))
    return vm, va, iters, ~active


batched_nr_solve_jit = jax.jit(batched_nr_solve,
                               static_argnames=("tol", "max_iter"))


def scenario_mesh(n_devices: int | None = None, axis: str = "scenario"):
    """Build a 1-D device mesh over the scenario axis."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def shard_scenarios(mesh: Mesh, *arrays, axis: str = "scenario"):
    """Place scenario-batched arrays with the leading axis sharded."""
    sharding = NamedSharding(mesh, P(axis))
    return tuple(jax.device_put(a, sharding) for a in arrays)


def sharded_nr_solve(mesh: Mesh, arr: AcArrays, vm0, va0, p_sched, q_sched,
                     tol: float = 1e-8, max_iter: int = 20):
    """Scenario-sharded batched NR over the mesh.

    The network snapshot is replicated; scenario states are sharded on the
    leading axis. XLA inserts the (tiny) ICI collectives for the global
    convergence test in the while_loop condition.
    """
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("scenario"))
    arr = jax.device_put(arr, repl)
    vm0, va0, p_sched, q_sched = (
        jax.device_put(x, shard) for x in (vm0, va0, p_sched, q_sched))
    return batched_nr_solve_jit(arr, vm0, va0, p_sched, q_sched,
                                tol=tol, max_iter=max_iter)
