from .geometry import (  # noqa: F401
    Transducer,
    cap_area,
    make_annular_array,
    make_concave_array,
    make_flat_grid_array,
    make_focused_bowl,
    make_spherical_cap,
)
