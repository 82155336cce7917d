"""Loss library: adversarial BCE (logits & probability variants), L1/L2,
total variation, identity, and VGG content losses.

Rebuild of the loss math embedded in the reference's models and trainers
(/root/reference/srgan.py:96-127, /root/reference/pix2pix.py:74-103,
/root/reference/train_autoencoder.py:89-102).  All losses reduce in f32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from denoise_gan_tpu.models.vgg import content_features
from denoise_gan_tpu.ops.image import total_variation

_KERAS_EPS = 1e-7  # Keras BinaryCrossentropy probability clip


def bce_logits(labels: jax.Array, logits: jax.Array) -> jax.Array:
    """Mean BCE from logits = tf.keras.losses.BinaryCrossentropy(from_logits=True).

    Numerically stable form: max(l, 0) - l*z + log(1 + exp(-|l|)).
    """
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    per = (jnp.maximum(logits, 0.0) - logits * labels
           + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    return jnp.mean(per)


def bce_probs(labels: jax.Array, probs: jax.Array) -> jax.Array:
    """Mean BCE on probabilities (sigmoid-output D, autoencoder family;
    /root/reference/train_autoencoder.py:79).  Matches Keras' eps clipping."""
    p = jnp.clip(probs.astype(jnp.float32), _KERAS_EPS, 1.0 - _KERAS_EPS)
    labels = labels.astype(jnp.float32)
    per = -(labels * jnp.log(p) + (1.0 - labels) * jnp.log(1.0 - p))
    return jnp.mean(per)


def adversarial_loss(disc_fake, from_logits: bool = True) -> jax.Array:
    """Generator's adversarial term: BCE(ones, D(fake))."""
    fn = bce_logits if from_logits else bce_probs
    return fn(jnp.ones_like(disc_fake), disc_fake)


def discriminator_loss(disc_real, disc_fake, from_logits: bool = True,
                       half: bool = False) -> jax.Array:
    """BCE(ones, D(real)) + BCE(zeros, D(fake)); `half` scales by 0.5 as the
    fsrgan trainer does (/root/reference/train_fsrgan.py:96)."""
    fn = bce_logits if from_logits else bce_probs
    loss = (fn(jnp.ones_like(disc_real), disc_real)
            + fn(jnp.zeros_like(disc_fake), disc_fake))
    return 0.5 * loss if half else loss


def l1_loss(target, output) -> jax.Array:
    return jnp.mean(jnp.abs(target.astype(jnp.float32)
                            - output.astype(jnp.float32)))


def l2_loss(target, output) -> jax.Array:
    return jnp.mean(jnp.square(target.astype(jnp.float32)
                               - output.astype(jnp.float32)))


def tv_loss(target, output) -> jax.Array:
    """1-weight TV term: mean over batch of tf.image.total_variation(t - o)
    (/root/reference/srgan.py:101)."""
    return jnp.mean(total_variation(target.astype(jnp.float32)
                                    - output.astype(jnp.float32)))


def content_loss(vgg_params, target, output) -> jax.Array:
    """MSE between block5_conv4 features / 12.75 (/root/reference/srgan.py:69-75)."""
    return l2_loss(content_features(vgg_params, target),
                   content_features(vgg_params, output))
