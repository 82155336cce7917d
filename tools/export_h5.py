#!/usr/bin/env python
"""Export a repo `.dgt` artifact to a reference-consumable Keras `.h5`
(the reverse of tools/convert_h5.py): a user can train here and run the
result with the reference's own infer.py/infer_video.py
(/root/reference/infer.py:40-43).

The Keras graph is rebuilt with the reference's exact architecture
(tools/bench_train_tf_cpu.py builders), weights are mapped back with the
inverse layout transforms (see denoise_gan_tpu/io/keras_h5.py), and the
full model is saved as legacy `.h5`.

Usage: python tools/export_h5.py --dgt models/fsrgan_4x_50q.dgt \
           [--out models/fsrgan_4x_50q.h5]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# weight-format conversion needs no accelerator; force CPU before any
# backend init (env alone cannot override the axon plugin)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from denoise_gan_tpu.io.keras_h5 import disc_spec, gen_spec  # noqa: E402


def _get(tree, path: str) -> dict:
    node = tree
    for key in path.split("/"):
        node = node[key]
    return node


def records_from_tree(params, stats, family: str, role: str, scale: int):
    """Flax trees -> Keras-ordered [(kind, arrays)] with INVERSE layout
    transforms (exact inverses of keras_h5.map_weights)."""
    spec = (gen_spec(family, scale) if role == "generator"
            else disc_spec(family))
    records = []
    for path, kind in spec:
        p = _get(params, path)
        if kind == "conv":
            w = [np.asarray(p["kernel"])]
            if "bias" in p:
                w.append(np.asarray(p["bias"]))
        elif kind == "dwconv":
            # Flax (kh,kw,1,C) -> Keras (kh,kw,C,1): swap the last two axes
            w = [np.transpose(np.asarray(p["kernel"]), (0, 1, 3, 2))]
            if "bias" in p:
                w.append(np.asarray(p["bias"]))
        elif kind == "convt":
            k = np.asarray(p["kernel"])            # (kh,kw,in,out)
            w = [np.transpose(k, (0, 1, 3, 2))[::-1, ::-1]]
            if "bias" in p:
                w.append(np.asarray(p["bias"]))
        elif kind == "bn":
            s = _get(stats, path)
            w = [np.asarray(p["scale"]), np.asarray(p["bias"]),
                 np.asarray(s["mean"]), np.asarray(s["var"])]
        elif kind == "prelu":
            a = np.asarray(p["alpha"])
            w = [a.reshape(1, 1, -1)]
        records.append((kind, w))
    return records


def set_keras_weights(model, records) -> None:
    """Assign the record stream onto the Keras model's weighted layers (in
    construction order — the same order keras_weight_stream reads).
    _walk_layers flattens nested Sequential blocks (the reference pix2pix
    wraps each down/upsample stack, /root/reference/pix2pix.py:113-140)."""
    from denoise_gan_tpu.io.keras_h5 import _walk_layers

    it = iter(records)
    for layer in _walk_layers(model):
        if not layer.get_weights():
            continue
        kind, w = next(it)
        layer.set_weights(w)
    try:
        next(it)
        raise ValueError("leftover records after assigning all layers")
    except StopIteration:
        pass


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--dgt", required=True)
    p.add_argument("--out", default="", help="default: <dgt stem>.h5")
    args = p.parse_args()

    from denoise_gan_tpu.io.checkpoint import read_export
    from flax import serialization

    config, payload = read_export(args.dgt)
    family, scale = config["family"], config["scale"]
    role = config.get("role", "generator")

    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    import bench_train_tf_cpu as ref
    if role == "generator":
        model = {"srgan": ref.build_srgan_generator,
                 "fsrgan": ref.build_fsrgan_generator,
                 "autoencoder": ref.build_autoencoder_generator,
                 "pix2pix": ref.build_pix2pix_generator}[family]()
    elif family == "pix2pix":
        model = ref.build_pix2pix_discriminator()
    else:
        model = ref.build_discriminator(sigmoid=(family == "autoencoder"))

    # deserialize against the model-shaped template
    from denoise_gan_tpu.io.keras_h5 import _template_variables
    variables = _template_variables(family, role, scale)
    template = {"params": variables["params"],
                "batch_stats": variables.get("batch_stats", {})}
    restored = serialization.from_bytes(template, payload)

    records = records_from_tree(restored["params"], restored["batch_stats"],
                                family, role, scale)
    set_keras_weights(model, records)

    out = args.out or os.path.splitext(args.dgt)[0] + ".h5"
    model.save(out)
    print(f"wrote {out} ({family} {role}, scale {scale})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
