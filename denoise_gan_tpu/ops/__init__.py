from denoise_gan_tpu.ops.image import (
    depth_to_space, space_to_depth, pixel_shuffle, sobel_edges,
    sobel_variation, high_pass_x_y, total_variation, total_variation_map,
    resize_bicubic, resize_with_crop_or_pad, renorm, autoscale, to_uint8,
)
from denoise_gan_tpu.ops.jpeg import jpeg_roundtrip, random_jpeg_quality, quality_to_tables
from denoise_gan_tpu.ops.metrics import psnr, ssim
