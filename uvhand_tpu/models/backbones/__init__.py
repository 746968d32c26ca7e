from .resnet import ResNet50, RESNET50_CHANNELS, RESNET50_STRIDES  # noqa: F401
