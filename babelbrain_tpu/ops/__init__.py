from .rayleigh import (  # noqa: F401
    expand_element_weights,
    rayleigh_field,
    rayleigh_field_volume,
    steering_phases,
)
from .fdtd import (  # noqa: F401
    FDTDGrid,
    run_fdtd,
    run_fdtd_batch,
    run_fdtd_capture,
    sls_coefficients,
    stable_dt,
)
from .mesh import (  # noqa: F401
    boolean_meshes,
    cone_mesh,
    marching_tetrahedra,
    mask_to_mesh,
    mesh_volume,
    taubin_smooth,
)
from .bhte import BHTEResult, absorption_heating, bhte_run, cem43  # noqa: F401
