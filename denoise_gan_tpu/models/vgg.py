"""VGG19 perceptual feature extractor (frozen, truncated at block5_conv4).

Rebuild of the reference's content-loss backbone
(/root/reference/srgan.py:77-93): ImageNet VGG19 `include_top=False`, output
= block5_conv4 activations, always f32.  Preprocessing matches
`keras.applications.vgg19.preprocess_input` (caffe mode): inputs in [-1, 1]
-> [0, 255] -> RGB->BGR -> subtract ImageNet BGR means
(/root/reference/srgan.py:69-75).

Pretrained weights: this environment has no network egress and no cached
ImageNet weights, so the extractor loads weights from a local file when
available (``VGG19_WEIGHTS`` env var or ``models/vgg19_notop.npz``, produced
by tools/convert_vgg19.py from the Keras h5), and otherwise falls back to a
fixed-seed random init.  Random-feature perceptual losses are a documented
technique and keep the full compute/gradient path identical; drop in real
weights for ImageNet-feature parity.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# (block, conv-in-block, filters) for conv1_1 .. conv5_4
VGG19_CFG = [
    (1, 1, 64), (1, 2, 64),
    (2, 1, 128), (2, 2, 128),
    (3, 1, 256), (3, 2, 256), (3, 3, 256), (3, 4, 256),
    (4, 1, 512), (4, 2, 512), (4, 3, 512), (4, 4, 512),
    (5, 1, 512), (5, 2, 512), (5, 3, 512), (5, 4, 512),
]

_BGR_MEAN = (103.939, 116.779, 123.68)


def preprocess(img_m11: jax.Array) -> jax.Array:
    """[-1,1] RGB -> caffe BGR mean-subtracted, f32."""
    x = ((img_m11.astype(jnp.float32) + 1.0) * 255.0) / 2.0
    x = x[..., ::-1]  # RGB -> BGR
    return x - jnp.asarray(_BGR_MEAN, jnp.float32)


class VGG19Features(nn.Module):
    """Conv stack through block5_conv4 with 2x2 max pools after blocks 1-4.
    Frozen: call via `.apply({'params': vgg_params}, x)`; params are never
    put in an optimizer."""

    @nn.compact
    def __call__(self, x):
        x = x.astype(jnp.float32)
        prev_block = 1
        for block, conv, filters in VGG19_CFG:
            if block != prev_block:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                prev_block = block
            x = nn.Conv(filters, (3, 3), padding="SAME",
                        name=f"conv{block}_{conv}")(x)
            x = nn.relu(x)
        return x  # block5_conv4 activations (pre-pool5)


def default_weights_path() -> str:
    return os.environ.get("VGG19_WEIGHTS",
                          os.path.join("models", "vgg19_notop.npz"))


def init_vgg_params(weights_path: Optional[str] = None) -> Any:
    """Load VGG19 params from an .npz (keys 'conv{b}_{c}/kernel|bias', HWIO)
    or fall back to a fixed-seed init."""
    path = weights_path or default_weights_path()
    model = VGG19Features()
    variables = model.init(jax.random.key(42),
                           jnp.zeros((1, 32, 32, 3), jnp.float32))
    params = variables["params"]
    if os.path.exists(path):
        data = np.load(path)
        loaded = {}
        for block, conv, _ in VGG19_CFG:
            name = f"conv{block}_{conv}"
            loaded[name] = {
                "kernel": jnp.asarray(data[f"{name}/kernel"]),
                "bias": jnp.asarray(data[f"{name}/bias"]),
            }
        params = loaded
    else:
        import warnings
        msg = (
            f"VGG19 weights not found at '{path}' — the perceptual/content "
            "loss will use FIXED-SEED RANDOM VGG features, not ImageNet "
            "features.  The reference hard-requires ImageNet weights "
            "(/root/reference/srgan.py:86); convert a Keras VGG19 notop .h5 "
            "with tools/convert_vgg19.py and set VGG19_WEIGHTS or place it "
            "at models/vgg19_notop.npz for feature parity.")
        warnings.warn(msg, stacklevel=2)
        print(f"WARNING: {msg}")
    return params


def content_features(vgg_params: Any, img_m11: jax.Array) -> jax.Array:
    """block5_conv4 features / 12.75, the content-loss feature map
    (/root/reference/srgan.py:73-74)."""
    feats = VGG19Features().apply({"params": vgg_params}, preprocess(img_m11))
    return feats / 12.75
