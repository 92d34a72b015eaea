"""Generate golden power-flow values for the scale-class public cases.

The shipped reference goldens (tests/data/results.h5) stop at IEEE 30. For
IEEE 118/300, PEGASE 1354 and RTE 1951 this script produces goldens with
the independent sparse CPU oracle (juliagrid_tpu/oracle/sparse_ref.py),
which is itself validated EXACTLY against the MATPOWER goldens on 14/30
(tests/test_oracle.py: NR + FDPF iteration counts, voltages to 1e-10).

Run from the repo root:  python benchmarks/make_goldens.py
Writes tests/data/results_large.h5.
"""

import jax

jax.config.update("jax_platforms", "cpu")

import h5py  # noqa: E402
import numpy as np  # noqa: E402

import juliagrid_tpu as jg  # noqa: E402
from juliagrid_tpu.oracle import oracle_dc, oracle_fdpf, oracle_nr  # noqa: E402

CASES = ["case118.m", "case300.m", "case1354pegase.h5", "case1951rte.h5"]
DATA = "tests/data/"


def main():
    with h5py.File(DATA + "results_large.h5", "w") as fh:
        for case in CASES:
            name = case.split(".")[0]
            grp = fh.create_group(name)
            grp.attrs["source"] = (
                "independent sparse scipy oracle "
                "(juliagrid_tpu/oracle/sparse_ref.py), validated vs "
                "MATPOWER goldens on IEEE 14/30")

            system = jg.power_system(DATA + case)
            res = oracle_nr(system)
            assert res.converged, f"{case} NR did not converge"
            g = grp.create_group("newtonRaphson")
            g["iteration"] = np.array([res.iterations])
            g["voltageMagnitude"] = res.magnitude
            g["voltageAngle"] = res.angle

            for bx, label in [(True, "fastNewtonRaphsonBX"),
                              (False, "fastNewtonRaphsonXB")]:
                system = jg.power_system(DATA + case)
                res = oracle_fdpf(system, bx=bx, iteration=1500)
                assert res.converged, f"{case} {label} did not converge"
                g = grp.create_group(label)
                g["iteration"] = np.array([res.iterations])
                g["voltageMagnitude"] = res.magnitude
                g["voltageAngle"] = res.angle

            system = jg.power_system(DATA + case)
            res = oracle_dc(system)
            g = grp.create_group("dcPowerFlow")
            g["voltage"] = res.angle
            print(name, "done")


if __name__ == "__main__":
    main()
