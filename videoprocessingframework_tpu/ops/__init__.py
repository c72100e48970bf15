from . import colorspace, golden  # noqa: F401
from .convert import SurfaceConverter  # noqa: F401
from .resize import SurfaceResizer, resize_plane  # noqa: F401
from .remap import SurfaceRemaper, remap_image  # noqa: F401
from .normalize import normalize, IMAGENET_MEAN, IMAGENET_STD  # noqa: F401
from .fused import (  # noqa: F401
    FusedPipeline,
    decode_postproc,
    encode_feed,
    planes_to_host_packed,
)
from .flow import (  # noqa: F401
    interpolate_midpoint,
    lucas_kanade_flow,
    mv_to_dense_flow,
    warp_image,
)
from .scenecut import detect_cuts, scene_cut_scores, segment_shots  # noqa: F401
from .stabilize import (  # noqa: F401
    global_translations,
    smooth_path,
    stabilize_clip,
)
