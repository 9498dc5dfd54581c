from .conv import conv2d, conv_transpose2d
from .ssim import ssim
