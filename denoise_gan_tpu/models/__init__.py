"""Model registry: one bundle per family, mirroring the reference's
`Model(args)` constructors (SURVEY.md §3.6) as pure Flax module factories."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax.numpy as jnp

from denoise_gan_tpu.models.autoencoder import AutoencoderGenerator
from denoise_gan_tpu.models.discriminators import (
    ConditionalPatchDiscriminator, PatchDiscriminator, SRGANPaperDiscriminator,
)
from denoise_gan_tpu.models.fsrgan import FSRGANGenerator
from denoise_gan_tpu.models.pix2pix import Pix2PixGenerator
from denoise_gan_tpu.models.srgan import SRGANGenerator
from denoise_gan_tpu.models.vgg import VGG19Features, content_features, init_vgg_params


@dataclass(frozen=True)
class ModelBundle:
    """A family: generator + discriminator modules and their GAN wiring."""

    name: str
    generator: Any
    discriminator: Any
    conditional_disc: bool      # pix2pix: D(input, target)
    disc_sigmoid: bool          # autoencoder: D outputs probabilities
    upscales: bool              # generator changes resolution (srgan/fsrgan)


def build_models(family: str, scale: int = 4, fp16: bool = False,
                 disc_variant: str = "fast") -> ModelBundle:
    """Construct the family's modules.  `fp16` selects bf16 compute on TPU
    (flag name kept for CLI parity with the reference).  `disc_variant`
    selects srgan's discriminator: 'fast' (the reference's built default,
    /root/reference/srgan.py:62) or 'paper' (the SRGAN-paper discriminator the
    reference keeps unbuilt at /root/reference/srgan.py:61, 188-230)."""
    dtype = jnp.bfloat16 if fp16 else None
    if family == "autoencoder":
        return ModelBundle(
            name=family,
            generator=AutoencoderGenerator(dtype=dtype),
            discriminator=PatchDiscriminator(df=32, sigmoid_head=True, dtype=dtype),
            conditional_disc=False, disc_sigmoid=True, upscales=False,
        )
    if family == "pix2pix":
        return ModelBundle(
            name=family,
            generator=Pix2PixGenerator(dtype=dtype),
            discriminator=ConditionalPatchDiscriminator(dtype=dtype),
            conditional_disc=True, disc_sigmoid=False, upscales=False,
        )
    if family == "srgan":
        if disc_variant == "paper":
            disc = SRGANPaperDiscriminator(df=64, dtype=dtype)
        else:
            disc = PatchDiscriminator(df=32, sigmoid_head=False, dtype=dtype)
        return ModelBundle(
            name=family,
            generator=SRGANGenerator(scale=scale, dtype=dtype),
            discriminator=disc,
            conditional_disc=False, disc_sigmoid=False, upscales=True,
        )
    if family == "fsrgan":
        return ModelBundle(
            name=family,
            generator=FSRGANGenerator(gf=32, dtype=dtype),
            discriminator=PatchDiscriminator(df=32, sigmoid_head=False, dtype=dtype),
            conditional_disc=False, disc_sigmoid=False, upscales=True,
        )
    raise ValueError(f"unknown model family: {family!r}")


FAMILIES = ("autoencoder", "pix2pix", "srgan", "fsrgan")
