"""VGG19 weight-converter round-trip and feature parity vs a Keras oracle.

VERDICT r1 item 6: the environment has no ImageNet weights, so prove the
conversion path itself is correct — synthesize a Keras-layout VGG19 notop
.h5 in-test, convert it with tools/convert_vgg19.py, load it through
models/vgg.py, and compare block5_conv4 features against the same weights
loaded into the actual Keras VGG19 graph (truncated like
/root/reference/srgan.py:77-93).  Also pins the loud fallback warning.
"""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from denoise_gan_tpu.models.vgg import (
    VGG19_CFG, content_features, init_vgg_params, preprocess,
)

tf = pytest.importorskip("tensorflow")
h5py = pytest.importorskip("h5py")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_vgg19 import KERAS_NAMES, from_h5  # noqa: E402


def _synth_weights(rng) -> dict[str, np.ndarray]:
    """Random weights with the true VGG19 shapes, He-ish scaled so 16 conv
    layers of ReLU activations neither vanish nor explode."""
    weights = {}
    cin = 3
    for block, conv, filters in VGG19_CFG:
        std = np.sqrt(2.0 / (9 * cin))
        weights[f"conv{block}_{conv}/kernel"] = (
            rng.standard_normal((3, 3, cin, filters)) * std
        ).astype(np.float32)
        weights[f"conv{block}_{conv}/bias"] = (
            rng.standard_normal(filters) * 0.01).astype(np.float32)
        cin = filters
    return weights


def _write_keras_h5(path: str, weights: dict[str, np.ndarray]) -> None:
    """Keras weight-file layout: <layer>/<layer>/{kernel:0,bias:0}."""
    with h5py.File(path, "w") as f:
        for keras_name, ours in KERAS_NAMES:
            grp = f.create_group(keras_name).create_group(keras_name)
            grp.create_dataset("kernel:0", data=weights[f"{ours}/kernel"])
            grp.create_dataset("bias:0", data=weights[f"{ours}/bias"])


def test_convert_roundtrip_and_feature_parity(tmp_path, rng):
    weights = _synth_weights(rng)
    h5_path = str(tmp_path / "vgg19_notop.h5")
    _write_keras_h5(h5_path, weights)

    # converter: h5 -> npz dict
    converted = from_h5(h5_path)
    for key, arr in weights.items():
        np.testing.assert_array_equal(converted[key], arr)
    npz_path = str(tmp_path / "vgg19_notop.npz")
    np.savez(npz_path, **converted)

    # loader: npz -> flax params
    params = init_vgg_params(weights_path=npz_path)
    np.testing.assert_array_equal(
        np.asarray(params["conv5_4"]["kernel"]),
        weights["conv5_4/kernel"])

    # feature parity vs the real Keras VGG19 graph with the same weights
    full = tf.keras.applications.VGG19(weights=None, include_top=False,
                                       input_shape=(32, 32, 3))
    for keras_name, ours in KERAS_NAMES:
        full.get_layer(keras_name).set_weights(
            [weights[f"{ours}/kernel"], weights[f"{ours}/bias"]])
    oracle = tf.keras.Model(full.input,
                            full.get_layer("block5_conv4").output)

    x_m11 = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    ours_feats = np.asarray(content_features(params, jnp.asarray(x_m11)))
    x_255 = (x_m11 + 1.0) * 255.0 / 2.0
    want = oracle(
        tf.keras.applications.vgg19.preprocess_input(x_255)).numpy() / 12.75
    scale = max(np.abs(want).max(), 1e-6)
    np.testing.assert_allclose(ours_feats, want, atol=2e-3 * scale, rtol=1e-3)


def test_preprocess_matches_keras(rng):
    x_m11 = rng.uniform(-1, 1, (1, 8, 8, 3)).astype(np.float32)
    got = np.asarray(preprocess(jnp.asarray(x_m11)))
    want = tf.keras.applications.vgg19.preprocess_input(
        (x_m11 + 1.0) * 255.0 / 2.0)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_missing_weights_warns_loudly(tmp_path):
    with pytest.warns(UserWarning, match="RANDOM VGG features"):
        init_vgg_params(weights_path=str(tmp_path / "nope.npz"))
