from mcpt.scenes.procedural import (  # noqa: F401
    cornell_box,
    furnace_sphere,
    quad_light_plane,
    veach_mis,
)
