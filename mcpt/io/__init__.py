from mcpt.io.objloader import load_object  # noqa: F401
from mcpt.io import image  # noqa: F401
