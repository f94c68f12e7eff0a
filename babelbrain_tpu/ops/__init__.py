from .rayleigh import (  # noqa: F401
    expand_element_weights,
    rayleigh_field,
    rayleigh_field_volume,
    steering_phases,
)
from .fdtd import FDTDGrid, run_fdtd, sls_coefficients, stable_dt  # noqa: F401
from .bhte import BHTEResult, absorption_heating, bhte_run, cem43  # noqa: F401
