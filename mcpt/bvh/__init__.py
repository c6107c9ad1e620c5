from mcpt.bvh import lbvh  # noqa: F401
