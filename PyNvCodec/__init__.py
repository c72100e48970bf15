"""Drop-in ``PyNvCodec`` namespace backed by videoprocessingframework_tpu.

Lets code written for the reference (``import PyNvCodec as nvc``) run on
this TPU-native framework unchanged. See
videoprocessingframework_tpu/compat.py for the mapping notes.
"""

from videoprocessingframework_tpu.compat import *  # noqa: F401,F403
from videoprocessingframework_tpu.compat import __all__  # noqa: F401
