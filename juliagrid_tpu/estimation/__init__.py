"""State estimation subpackage."""

from .acse import gauss_newton, state_estimation, increment, solve
from .dcse import dc_state_estimation
from .pmuse import pmu_state_estimation
from .lav import (ac_lav_state_estimation, dc_lav_state_estimation,
                  pmu_lav_state_estimation)
from .baddata import chi_test, residual_test
from .observability import (island_topological, island_topological_flow,
                            pmu_placement, pmu_placement_apply,
                            restoration_gram)
