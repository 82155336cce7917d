"""denoise_gan_tpu — a TPU-native (JAX/XLA/Pallas) image-denoising GAN framework.

A ground-up rebuild of the capabilities of pmcbride/denoise-gan (a
TensorFlow 2.x research repo: conv-autoencoder / pix2pix / SRGAN / FastSRGAN
denoisers trained against JPEG-compression artifacts) designed TPU-first:

* all image degradation (bicubic downscale + JPEG DCT-quantization artifacts +
  normalization) runs **on device** inside the jitted train step instead of in
  a host-side tf.data pipeline (reference: /root/reference/dataloader.py),
* the joint G+D GAN update is a single compiled XLA step
  (reference: /root/reference/train_srgan.py:61-118),
* scale-out is `jax.sharding.Mesh` + GSPMD (data parallelism over ICI, spatial
  sharding for large-frame inference) instead of the reference's single pinned
  CUDA GPU (reference: /root/reference/train_srgan.py:15).

Package map
-----------
utils/      config dataclasses + argparse adapter (CLI-flag parity), logging
parallel/   device mesh + sharding rules
ops/        image ops (pixel shuffle, sobel, TV), JPEG codec, PSNR/SSIM, pallas kernels
data/       host image loader + on-device degradation pipeline
models/     autoencoder, pix2pix, srgan, fsrgan, shared discriminators, VGG19
losses/     adversarial / L1 / L2 / TV / identity / VGG-content losses
train/      train state, jitted GAN step, epoch loop, on-device diagnostics
io/         orbax checkpointing + params-only export format
infer/      overlap-tiled still-image and streaming video inference
"""

__version__ = "0.1.0"
