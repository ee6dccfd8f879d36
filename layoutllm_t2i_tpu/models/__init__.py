from . import blocks, position_net, unet  # noqa: F401
