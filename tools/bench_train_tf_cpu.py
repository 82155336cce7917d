#!/usr/bin/env python
"""Measure the TF reference's train-step throughput on CPU — the baseline the
BASELINE.md 10x target is defined against — for ALL FOUR trainer configs.

The reference itself cannot run offline (it hard-requires ImageNet VGG19
weights, /root/reference/srgan.py:86); this harness rebuilds the same compute
graphs in TF/Keras with weights=None (identical architecture/FLOPs/losses)
and times each @tf.function train step on CPU:

* srgan       /root/reference/srgan.py:129-272 + train_srgan.py:61-118
* fsrgan      /root/reference/fsrgan.py:99-258 + train_fsrgan.py:61-120
* autoencoder /root/reference/autoencoder.py:89-228 + train_autoencoder.py:66-112
* pix2pix     /root/reference/pix2pix.py:45-220 + train_pix2pix.py:33-71

Usage: python tools/bench_train_tf_cpu.py [--family all] [--batch_size 1]
       [--steps 3]
Prints one line per family: steps/s and imgs/s at the reference defaults
(batch_size=1, crop 256).
"""

from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import numpy as np
import tensorflow as tf
from tensorflow import keras


def build_vgg():
    vgg = keras.applications.VGG19(weights=None, input_shape=(None, None, 3),
                                   include_top=False)
    vgg.trainable = False
    return keras.Model(vgg.inputs, vgg.get_layer("block5_conv4").output)


def content_loss_fn(vgg):
    mse = keras.losses.MeanSquaredError()

    def content(y, fake):
        fa = vgg(keras.applications.vgg19.preprocess_input((y + 1.) * 127.5))
        fb = vgg(keras.applications.vgg19.preprocess_input((fake + 1.) * 127.5))
        return mse(fa / 12.75, fb / 12.75)

    return content


# --------------------------------------------------------------------------
# generators

def build_srgan_generator(scale=4):
    """SRResNet per /root/reference/srgan.py:129-185."""
    w_init = tf.random_normal_initializer(0., 0.02)
    g_init = tf.random_normal_initializer(1., 0.02)
    inputs = keras.Input((None, None, 3))
    n = keras.layers.Conv2D(64, 3, padding="same", use_bias=False,
                            kernel_initializer=w_init)(inputs)
    n = keras.layers.BatchNormalization(gamma_initializer=g_init)(n)
    n = keras.layers.PReLU(shared_axes=[1, 2])(n)
    temp = n
    for _ in range(16):
        nn_ = keras.layers.Conv2D(64, 3, padding="same", use_bias=False,
                                  kernel_initializer=w_init)(n)
        nn_ = keras.layers.BatchNormalization(gamma_initializer=g_init)(nn_)
        nn_ = keras.layers.Activation("relu")(nn_)
        nn_ = keras.layers.Conv2D(64, 3, padding="same", use_bias=False,
                                  kernel_initializer=w_init)(nn_)
        nn_ = keras.layers.BatchNormalization(gamma_initializer=g_init)(nn_)
        n = keras.layers.Add()([n, nn_])
    n = keras.layers.Conv2D(64, 3, padding="same", use_bias=False,
                            kernel_initializer=w_init)(n)
    n = keras.layers.BatchNormalization(gamma_initializer=g_init)(n)
    n = keras.layers.Add()([n, temp])
    for _ in range(scale // 2):
        n = keras.layers.Conv2D(256, 3, padding="same",
                                kernel_initializer=w_init)(n)
        n = keras.layers.Lambda(lambda t: tf.nn.depth_to_space(t, 2))(n)
        n = keras.layers.PReLU(shared_axes=[1, 2])(n)
    out = keras.layers.Conv2D(3, 1, padding="same",
                              kernel_initializer=w_init)(n)
    out = keras.layers.Activation("tanh", dtype="float32")(out)
    return keras.Model(inputs, out)


def _make_divisible(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def build_fsrgan_generator(gf=32, n_blocks=6):
    """Mobile generator per /root/reference/fsrgan.py:99-220."""
    inputs = keras.Input((None, None, 3))
    x = keras.layers.Conv2D(gf, 3, padding="same")(inputs)
    x = keras.layers.BatchNormalization()(x)
    c1 = x = keras.layers.PReLU(shared_axes=[1, 2])(x)

    for block_id in range(n_blocks):
        inp = x
        in_ch = int(x.shape[-1])
        pw = _make_divisible(gf)
        # the reference names these layers explicitly (block_N_expand /
        # expanded_conv_depthwise / *_BN, /root/reference/fsrgan.py:131-176);
        # reproducing the names makes saved .h5s byte-faithful to reference
        # artifacts (they exercise keras_h5's custom-name classification)
        prefix = f"block_{block_id}_" if block_id else "expanded_conv_"
        if block_id:
            x = keras.layers.Conv2D(6 * in_ch, 1, padding="same",
                                    name=prefix + "expand")(x)
            x = keras.layers.BatchNormalization(momentum=0.999, epsilon=1e-3,
                                                name=prefix + "expand_BN")(x)
            x = keras.layers.ReLU()(x)
        x = keras.layers.DepthwiseConv2D(3, padding="same",
                                         name=prefix + "depthwise")(x)
        x = keras.layers.BatchNormalization(momentum=0.999, epsilon=1e-3,
                                            name=prefix + "depthwise_BN")(x)
        x = keras.layers.ReLU()(x)
        x = keras.layers.Conv2D(pw, 1, padding="same",
                                name=prefix + "project")(x)
        x = keras.layers.BatchNormalization(momentum=0.999, epsilon=1e-3,
                                            name=prefix + "project_BN")(x)
        if in_ch == pw:
            x = keras.layers.Add()([inp, x])

    x = keras.layers.Conv2D(gf, 3, padding="same")(x)
    x = keras.layers.BatchNormalization()(x)
    x = keras.layers.Add()([x, c1])
    for _ in range(2):
        x = keras.layers.Conv2D(gf * 4, 3, padding="same")(x)
        x = keras.layers.Lambda(lambda t: tf.nn.depth_to_space(t, 2))(x)
        x = keras.layers.PReLU(shared_axes=[1, 2])(x)
    out = keras.layers.Conv2D(3, 3, padding="same")(x)
    out = keras.layers.Activation("tanh", dtype="float32")(out)
    return keras.Model(inputs, out)


def build_autoencoder_generator():
    """5-level encoder/decoder per /root/reference/autoencoder.py:89-188."""
    inputs = keras.Input((None, None, 3))

    def conv(h, f):
        return keras.layers.Conv2D(f, 3, padding="same", activation="relu",
                                   kernel_initializer="he_normal")(h)

    def unpool_concat(a, b):
        up = keras.layers.ReLU()(keras.layers.UpSampling2D()(a))
        return keras.layers.Concatenate()([up, b])

    h = conv(conv(inputs, 32), 32)
    p1 = h = keras.layers.MaxPool2D()(h)
    h = conv(h, 44)
    p2 = h = keras.layers.MaxPool2D()(h)
    h = conv(h, 56)
    p3 = h = keras.layers.MaxPool2D()(h)
    h = conv(h, 76)
    p4 = h = keras.layers.MaxPool2D()(h)
    h = conv(h, 100)
    h = keras.layers.MaxPool2D()(h)

    for skip, (f1, f2) in zip([p4, p3, p2, p1, inputs],
                              [(152, 152), (112, 112), (84, 84), (64, 64),
                               (64, 32)]):
        h = unpool_concat(h, skip)
        h = conv(conv(h, f1), f2)
    out = keras.layers.Conv2D(3, 3, padding="same", activation="tanh",
                              kernel_initializer="lecun_normal",
                              dtype="float32")(h)
    return keras.Model(inputs, out)


def build_pix2pix_generator():
    """U-Net per /root/reference/pix2pix.py:106-192."""
    init = tf.random_normal_initializer(0., 0.02)
    inputs = keras.Input((256, 256, 3))

    # the reference wraps each down/upsample stack in a tf.keras.Sequential
    # (/root/reference/pix2pix.py:113-140); reproducing that makes saved
    # .h5s carry the same nested weight groups as reference artifacts
    # (they exercise keras_h5's parent-path weight grouping)
    def down(h, f, bn=True):
        seq = keras.Sequential()
        seq.add(keras.layers.Conv2D(f, 4, strides=2, padding="same",
                                    kernel_initializer=init, use_bias=False))
        if bn:
            seq.add(keras.layers.BatchNormalization())
        seq.add(keras.layers.LeakyReLU())
        return seq(h)

    def up(h, f, dropout=False):
        seq = keras.Sequential()
        seq.add(keras.layers.Conv2DTranspose(f, 4, strides=2, padding="same",
                                             kernel_initializer=init,
                                             use_bias=False))
        seq.add(keras.layers.BatchNormalization())
        if dropout:
            seq.add(keras.layers.Dropout(0.5))
        seq.add(keras.layers.ReLU())
        return seq(h)

    skips = []
    x = inputs
    for f, bn in [(64, False), (128, True), (256, True)] + [(512, True)] * 5:
        x = down(x, f, bn)
        skips.append(x)
    skips = list(reversed(skips[:-1]))
    for (f, do), skip in zip([(512, True)] * 3 + [(512, False), (256, False),
                                                  (128, False), (64, False)],
                             skips):
        x = up(x, f, do)
        x = keras.layers.Concatenate()([x, skip])
    out = keras.layers.Conv2DTranspose(3, 4, strides=2, padding="same",
                                       kernel_initializer=init,
                                       activation="tanh", dtype="float32")(x)
    return keras.Model(inputs, out)


# --------------------------------------------------------------------------
# discriminators

def build_discriminator(df=32, sigmoid=False):
    """Fast-SRGAN PatchGAN per /root/reference/srgan.py:232-272 (logits) /
    /root/reference/autoencoder.py:190-228 (sigmoid head)."""
    inputs = keras.Input((None, None, 3))
    d = inputs
    for filters, strides, bn in [(df, 1, False), (df, 2, True), (df, 1, True),
                                 (df, 2, True), (df * 2, 1, True),
                                 (df * 2, 2, True), (df * 2, 1, True),
                                 (df * 2, 2, True)]:
        d = keras.layers.Conv2D(filters, 3, strides=strides, padding="same")(d)
        if bn:
            d = keras.layers.BatchNormalization(momentum=0.8)(d)
        d = keras.layers.LeakyReLU(0.2)(d)
    out = keras.layers.Conv2D(1, 1, padding="same",
                              activation="sigmoid" if sigmoid else None)(d)
    return keras.Model(inputs, out)


def build_pix2pix_discriminator():
    """Conditional PatchGAN per /root/reference/pix2pix.py:194-220."""
    init = tf.random_normal_initializer(0., 0.02)
    inp = keras.Input((256, 256, 3))
    tar = keras.Input((256, 256, 3))
    x = keras.layers.Concatenate()([inp, tar])
    for f, bn in [(64, False), (128, True), (256, True)]:
        x = keras.layers.Conv2D(f, 4, strides=2, padding="same",
                                kernel_initializer=init, use_bias=False)(x)
        if bn:
            x = keras.layers.BatchNormalization()(x)
        x = keras.layers.LeakyReLU()(x)
    x = keras.layers.ZeroPadding2D()(x)
    x = keras.layers.Conv2D(512, 4, kernel_initializer=init,
                            use_bias=False)(x)
    x = keras.layers.BatchNormalization()(x)
    x = keras.layers.LeakyReLU()(x)
    x = keras.layers.ZeroPadding2D()(x)
    out = keras.layers.Conv2D(1, 4, kernel_initializer=init)(x)
    return keras.Model([inp, tar], out)


# --------------------------------------------------------------------------
# train steps

def make_step(family: str, return_gen: bool = False,
              return_models: bool = False):
    """Build (step_fn, lr_divisor[, generator[, discriminator]]) for a
    reference family.

    return_gen=True additionally returns the generator model (used by
    tools/h2h_tf_reference.py to save/eval the trained weights);
    return_models=True returns generator AND discriminator (matched-init
    head-to-heads load identical weights into both nets)."""

    def _ret(step, lr_div, gen):
        if return_models:
            return step, lr_div, gen, disc
        return (step, lr_div, gen) if return_gen else (step, lr_div)

    vgg = build_vgg()
    content = content_loss_fn(vgg)
    mae = keras.losses.MeanAbsoluteError()
    mse = keras.losses.MeanSquaredError()

    if family in ("srgan", "fsrgan"):
        gen = (build_srgan_generator() if family == "srgan"
               else build_fsrgan_generator())
        disc = build_discriminator()
        bce = keras.losses.BinaryCrossentropy(from_logits=True)
        gen_opt = keras.optimizers.Adam(1e-3 if family == "srgan" else 1e-4)
        disc_opt = keras.optimizers.Adam(5e-3 if family == "srgan" else 5e-4)
        half = 0.5 if family == "fsrgan" else 1.0

        @tf.function
        def step(x, y):
            """/root/reference/train_srgan.py:61-118 (0.5x disc loss for
            fsrgan, /root/reference/train_fsrgan.py:96)."""
            with tf.GradientTape(persistent=True) as tape:
                fake = gen(x, training=True)
                d_real = disc(y, training=True)
                d_fake = disc(fake, training=True)
                gen_loss = (content(y, fake)
                            + 1e-3 * bce(tf.ones_like(d_fake), d_fake)
                            + mae(y, fake))
                disc_loss = half * (bce(tf.ones_like(d_real), d_real)
                                    + bce(tf.zeros_like(d_fake), d_fake))
            gg = tape.gradient(gen_loss, gen.trainable_variables)
            dg = tape.gradient(disc_loss, disc.trainable_variables)
            gen_opt.apply_gradients(zip(gg, gen.trainable_variables))
            disc_opt.apply_gradients(zip(dg, disc.trainable_variables))
            return gen_loss, disc_loss

        lr_div = 4 if family in ("srgan", "fsrgan") else 1
        return _ret(step, lr_div, gen)

    if family == "autoencoder":
        gen = build_autoencoder_generator()
        disc = build_discriminator(sigmoid=True)
        bce = keras.losses.BinaryCrossentropy()
        gen_opt = keras.optimizers.Adam(1e-3)
        disc_opt = keras.optimizers.Adam(5e-3)

        @tf.function
        def step(x, y):
            """/root/reference/train_autoencoder.py:66-112."""
            with tf.GradientTape() as gt, tf.GradientTape() as dt:
                fake = gen(x, training=True)
                d_real = disc(y, training=True)
                d_fake = disc(fake, training=True)
                gen_loss = (content(y, fake)
                            + 1e-3 * bce(tf.ones_like(d_fake), d_fake)
                            + mae(y, fake))
                disc_loss = (bce(tf.ones_like(d_real), d_real)
                             + bce(tf.zeros_like(d_fake), d_fake))
            gg = gt.gradient(gen_loss, gen.trainable_variables)
            dg = dt.gradient(disc_loss, disc.trainable_variables)
            gen_opt.apply_gradients(zip(gg, gen.trainable_variables))
            disc_opt.apply_gradients(zip(dg, disc.trainable_variables))
            return gen_loss, disc_loss

        return _ret(step, 1, gen)

    if family == "pix2pix":
        gen = build_pix2pix_generator()
        disc = build_pix2pix_discriminator()
        bce = keras.losses.BinaryCrossentropy(from_logits=True)
        gen_opt = keras.optimizers.Adam(2e-4, beta_1=0.5)
        disc_opt = keras.optimizers.Adam(2e-4, beta_1=0.5)

        @tf.function
        def step(x, y):
            """/root/reference/train_pix2pix.py:33-71 + pix2pix.py:74-103
            (incl. the identity loss's second G forward)."""
            with tf.GradientTape() as gt, tf.GradientTape() as dt:
                fake = gen(x, training=True)
                d_real = disc([x, y], training=True)
                d_fake = disc([x, fake], training=True)
                ident = gen(y, training=True)
                # TV is of the ERROR image, mean over batch
                # (/root/reference/pix2pix.py:78) — an earlier harness
                # version used reduce_sum(total_variation(fake)), a
                # materially different smoothing prior that skewed every
                # pre-r5 TF-side pix2pix h2h run (PERF.md round-5 h2h)
                gen_loss = (1e-3 * bce(tf.ones_like(d_fake), d_fake)
                            + 1e-5 * tf.reduce_mean(
                                tf.image.total_variation(y - fake))
                            + mae(y, fake) + mse(y, fake)
                            + content(y, fake) + mae(y, ident))
                disc_loss = (bce(tf.ones_like(d_real), d_real)
                             + bce(tf.zeros_like(d_fake), d_fake))
            gg = gt.gradient(gen_loss, gen.trainable_variables)
            dg = dt.gradient(disc_loss, disc.trainable_variables)
            gen_opt.apply_gradients(zip(gg, gen.trainable_variables))
            disc_opt.apply_gradients(zip(dg, disc.trainable_variables))
            return gen_loss, disc_loss

        return _ret(step, 1, gen)

    raise ValueError(family)


def bench_family(family: str, batch_size: int, crop: int, steps: int):
    step, lr_div = make_step(family)
    lr = crop // lr_div
    x = tf.random.uniform((batch_size, lr, lr, 3), -1, 1)
    y = tf.random.uniform((batch_size, crop, crop, 3), -1, 1)
    step(x, y)  # trace/compile
    t0 = time.time()
    for _ in range(steps):
        step(x, y)
    dt = (time.time() - t0) / steps
    print(f"TF-CPU {family} train step: {dt*1000:.1f} ms/step, "
          f"{1/dt:.3f} steps/s, {batch_size/dt:.3f} imgs/s "
          f"(bs={batch_size}, crop={crop})", flush=True)
    return 1 / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--family", default="all",
                   choices=["all", "srgan", "fsrgan", "autoencoder",
                            "pix2pix"])
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--crop_size", type=int, default=256)
    p.add_argument("--steps", type=int, default=3)
    args = p.parse_args()

    fams = (["srgan", "fsrgan", "autoencoder", "pix2pix"]
            if args.family == "all" else [args.family])
    for fam in fams:
        bench_family(fam, args.batch_size, args.crop_size, args.steps)


if __name__ == "__main__":
    main()
