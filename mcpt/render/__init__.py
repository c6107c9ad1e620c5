from mcpt.render import camera, traverse, shade, integrator  # noqa: F401
