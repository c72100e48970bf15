from .resnet import ResNet, resnet50, resnet18_like, init_params  # noqa: F401
from .segmentation import FCNResNet, fcn_resnet  # noqa: F401
from .video import (  # noqa: F401
    VideoClassifier,
    video_resnet18_like,
    video_resnet50,
)
from .vit import (  # noqa: F401
    ViT,
    VideoViT,
    video_vit_small,
    video_vit_tiny,
    vit_small,
    vit_tiny,
)
from .weights import load_torch_resnet50  # noqa: F401
