from mcpt.scenes.procedural import cornell_box, furnace_sphere, quad_light_plane  # noqa: F401
