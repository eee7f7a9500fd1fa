from .resnet import ResNetBackbone, resnet_spec  # noqa: F401
