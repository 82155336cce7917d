#!/usr/bin/env python
"""Measure the TF reference's train-step throughput on CPU — the baseline the
BASELINE.md 10x target is defined against.

The reference itself cannot run offline (it hard-requires ImageNet VGG19
weights, /root/reference/srgan.py:86); this harness rebuilds the exact same
compute graph in TF/Keras with weights=None (identical architecture/FLOPs/
losses, /root/reference/srgan.py:129-272 + /root/reference/train_srgan.py:61-118)
and times the @tf.function train step on CPU.

Usage: python tools/bench_train_tf_cpu.py [--batch_size 1] [--steps 5]
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


def build_discriminator(df=32):
    """Fast-SRGAN PatchGAN per /root/reference/srgan.py:232-272."""
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
    out = keras.layers.Conv2D(1, 1, padding="same")(d)
    return keras.Model(inputs, out)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--crop_size", type=int, default=256)
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--steps", type=int, default=5)
    args = p.parse_args()

    gen = build_srgan_generator(args.scale)
    disc = build_discriminator()
    vgg = build_vgg()
    bce = keras.losses.BinaryCrossentropy(from_logits=True)
    mse = keras.losses.MeanSquaredError()
    gen_opt = keras.optimizers.Adam(1e-3)
    disc_opt = keras.optimizers.Adam(5e-3)

    @tf.function
    def train_step(x, y):
        """Inline losses per /root/reference/train_srgan.py:61-118."""
        with tf.GradientTape(persistent=True) as tape:
            fake = gen(x, training=True)
            d_real = disc(y, training=True)
            d_fake = disc(fake, training=True)
            feats_a = vgg(keras.applications.vgg19.preprocess_input(
                (y + 1.0) * 127.5)) / 12.75
            feats_b = vgg(keras.applications.vgg19.preprocess_input(
                (fake + 1.0) * 127.5)) / 12.75
            content = mse(feats_a, feats_b)
            adv = 1e-3 * bce(tf.ones_like(d_fake), d_fake)
            mae = tf.reduce_mean(tf.abs(y - fake))
            gen_loss = content + adv + mae
            disc_loss = (bce(tf.ones_like(d_real), d_real)
                         + bce(tf.zeros_like(d_fake), d_fake))
        gg = tape.gradient(gen_loss, gen.trainable_variables)
        dg = tape.gradient(disc_loss, disc.trainable_variables)
        gen_opt.apply_gradients(zip(gg, gen.trainable_variables))
        disc_opt.apply_gradients(zip(dg, disc.trainable_variables))
        return gen_loss, disc_loss

    lr = args.crop_size // args.scale
    x = tf.random.uniform((args.batch_size, lr, lr, 3), -1, 1)
    y = tf.random.uniform((args.batch_size, args.crop_size, args.crop_size, 3),
                          -1, 1)
    train_step(x, y)  # trace/compile
    t0 = time.time()
    for _ in range(args.steps):
        train_step(x, y)
    dt = (time.time() - t0) / args.steps
    print(f"TF-CPU srgan train step: {dt*1000:.1f} ms/step, "
          f"{1/dt:.3f} steps/s, {args.batch_size/dt:.2f} imgs/s "
          f"(bs={args.batch_size}, crop={args.crop_size})")


if __name__ == "__main__":
    main()
