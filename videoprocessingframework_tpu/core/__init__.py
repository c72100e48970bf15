from .enums import PixelFormat, ColorSpace, ColorRange, SeekMode, CodecId  # noqa: F401
from .packet import (  # noqa: F401
    PacketData,
    SeekContext,
    ColorspaceConversionContext,
    MuxingParams,
)
from .surface import Surface, SurfacePlane, HostBuffer  # noqa: F401
from .exceptions import (  # noqa: F401
    CudaArrayInterfaceUnsupported,
    HwResetException,
    CuvidParserException,
    UnsupportedConversion,
)
from . import geometry  # noqa: F401
