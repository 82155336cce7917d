"""Reference-style Model(args) API surface (SURVEY.md §3.6)."""

import jax.numpy as jnp
import numpy as np
import pytest

from denoise_gan_tpu.models.api import SRGAN, Autoencoder, FastSRGAN, Pix2Pix
from denoise_gan_tpu.utils.config import make_config


@pytest.mark.parametrize("cls,family,scale", [
    (Autoencoder, "autoencoder", 1),
    (SRGAN, "srgan", 4),
    (FastSRGAN, "fsrgan", 4),
])
def test_model_api_surface(cls, family, scale):
    cfg = make_config(family)
    cfg.crop_size = 32
    cfg.scale = scale
    cfg.finalize()
    m = cls(cfg)
    # the de-facto reference attribute surface
    for attr in ("generator", "discriminator", "vgg", "gen_optimizer",
                 "disc_optimizer", "content_loss", "iterations", "epochs",
                 "hr_shape", "lr_shape"):
        assert hasattr(m, attr), attr
    assert m.iterations == 0 and m.epochs == 0
    assert m.hr_shape == [32, 32, 3]
    assert m.lr_shape == [32 // scale, 32 // scale, 3]

    x = jnp.zeros((1, 32 // scale, 32 // scale, 3), jnp.float32)
    out = m.generate(x)
    assert out.shape == (1, 32, 32, 3)
    a = jnp.zeros((2, 32, 32, 3))
    loss = float(m.content_loss(a, a))
    assert loss == 0.0


def test_pix2pix_api_conditional():
    cfg = make_config("pix2pix")
    cfg.crop_size = 256
    cfg.finalize()
    m = Pix2Pix(cfg)
    x = jnp.zeros((1, 256, 256, 3), jnp.float32)
    d = m.discriminate(x, x)
    assert d.shape == (1, 30, 30, 1)
