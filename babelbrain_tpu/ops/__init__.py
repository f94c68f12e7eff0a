from .rayleigh import (  # noqa: F401
    expand_element_weights,
    rayleigh_field,
    rayleigh_field_volume,
    steering_phases,
)
