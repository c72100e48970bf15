from .resnet import ResNet, resnet50, resnet18_like, init_params  # noqa: F401
