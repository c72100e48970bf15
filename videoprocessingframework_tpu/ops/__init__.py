from . import colorspace, golden  # noqa: F401
from .convert import SurfaceConverter  # noqa: F401
