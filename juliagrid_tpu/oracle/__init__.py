"""Independent sparse CPU oracle (golden generator + honest bench baseline)."""

from .sparse_ref import (oracle_dc, oracle_fdpf, oracle_nr,  # noqa: F401
                         oracle_wls_se, oracle_ybus)
