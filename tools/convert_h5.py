#!/usr/bin/env python
"""Convert reference Keras `.h5` artifacts to `.dgt` exports (VERDICT r3 #2).

The conversion core lives in denoise_gan_tpu/io/keras_h5.py (the inference
CLIs also consume `.h5` directly through it — io/checkpoint.load_generator
sniffs the HDF5 magic).  This CLI materializes a `.dgt` for workflows that
want the repo's native artifact (warm starts, faster loads):

    python tools/convert_h5.py --h5 models/fsrgan_4x_50q.h5 \
        --family fsrgan --out models/fsrgan_4x_50q.dgt

Covers all four generator families plus their discriminators (the reference
also saves discriminator .h5s for --retrain warm starts,
/root/reference/train_srgan.py:256-259).  `--family auto` (default)
identifies the graph from the weight stream.

Sources tried in order: (1) h5py read of the legacy weight layout — no TF
import, immune to Keras-3 Lambda deserialization; (2) keras load_model;
(3) the reference-graph builders + load_weights (weights-only files;
needs explicit --family/--role).
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

from denoise_gan_tpu.io.keras_h5 import (  # noqa: E402
    DEFAULT_SCALE, FAMILIES, convert_records, h5_weight_stream,
    infer_family_role, keras_weight_stream, load_keras_model,
)


def load_records(path: str, family: str, role: str):
    try:
        return h5_weight_stream(path)
    except Exception as exc:
        print(f"h5py read failed ({exc}); trying keras load_model",
              file=sys.stderr)
    try:
        return keras_weight_stream(load_keras_model(path))
    except Exception as exc:
        if not family or family == "auto":
            raise ValueError(
                f"load_model failed ({exc}) and no --family given for the "
                "weights-only builder fallback") from exc
        print(f"load_model failed ({exc}); rebuilding the {family} {role} "
              "graph and loading weights", file=sys.stderr)
        import bench_train_tf_cpu as ref
        if role == "generator":
            model = {"srgan": ref.build_srgan_generator,
                     "fsrgan": ref.build_fsrgan_generator,
                     "autoencoder": ref.build_autoencoder_generator,
                     "pix2pix": ref.build_pix2pix_generator}[family]()
        elif family == "pix2pix":
            model = ref.build_pix2pix_discriminator()
        else:
            model = ref.build_discriminator(
                sigmoid=(family == "autoencoder"))
        model.load_weights(path)
        return keras_weight_stream(model)


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--h5", required=True, help="Keras .h5 (full model or "
                                               "weights-only)")
    p.add_argument("--family", default="auto",
                   choices=("auto",) + FAMILIES)
    p.add_argument("--role", default="generator",
                   choices=["generator", "discriminator"])
    p.add_argument("--scale", type=int, default=0,
                   help="0 = family default (srgan/fsrgan 4, else 1)")
    p.add_argument("--out", default="", help="default: <h5 stem>.dgt")
    args = p.parse_args()

    records = load_records(args.h5, args.family, args.role)
    family, role, scale = args.family, args.role, args.scale
    if family == "auto":
        family, role, scale = infer_family_role(records)
        print(f"identified: {family} {role} scale {scale}")
    scale = scale or DEFAULT_SCALE[family]
    out = args.out or os.path.splitext(args.h5)[0] + ".dgt"

    params, stats = convert_records(records, family, role, scale)

    from denoise_gan_tpu.io.checkpoint import export_net
    export_net(out, family, scale, params, stats, role=role)
    n = sum(int(np.prod(np.shape(x)))
            for x in __import__("jax").tree.leaves(params))
    print(f"wrote {out} ({family} {role}, scale {scale}, {n:,} params)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
