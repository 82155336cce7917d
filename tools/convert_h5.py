#!/usr/bin/env python
"""Convert reference Keras `.h5` artifacts to `.dgt` exports (VERDICT r3 #2).

The reference's entire checkpoint->inference contract is Keras `.h5` files
(/root/reference/infer.py:40-43, /root/reference/infer_video.py:93-97,
final saves at /root/reference/train_srgan.py:256-259).  This converter maps
those weights onto the repo's Flax parameter trees so a user of the reference
can bring their trained models along:

    python tools/convert_h5.py --h5 models/fsrgan_4x_50q.h5 \
        --family fsrgan --out models/fsrgan_4x_50q.dgt

Covers all four generator families plus their discriminators (the reference
also saves discriminator .h5s for --retrain warm starts).

Weight-layout transforms (verified by tests/test_layer_parity.py and the
cross-framework forward-parity test in tests/test_convert_h5.py):
* Conv2D             — Keras (kh,kw,in,out) == Flax HWIO, verbatim.
* DepthwiseConv2D    — Keras (kh,kw,C,1) -> Flax feature_group_count kernel
                       (kh,kw,1,C): transpose the last two axes.
* Conv2DTranspose    — Keras (kh,kw,out,in) -> Flax nn.ConvTranspose
                       (kh,kw,in,out) with a spatial flip (Keras computes the
                       conv gradient; Flax the fractionally-strided conv).
* BatchNormalization — gamma/beta -> params scale/bias; moving mean/variance
                       -> batch_stats mean/var.
* PReLU(shared 1,2)  — (1,1,C) alpha -> (C,).

Loading: `keras.models.load_model` first (the reference saves FULL models);
falls back to rebuilding the family graph (tools/bench_train_tf_cpu.py
builders — the reference's exact architectures) + `load_weights` for
weights-only h5s or Lambda-deserialization failures.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FAMILIES = ("autoencoder", "pix2pix", "srgan", "fsrgan")
DEFAULT_SCALE = {"autoencoder": 1, "pix2pix": 1, "srgan": 4, "fsrgan": 4}


# ---------------------------------------------------------------------------
# Keras-side: typed weight stream in layer (construction) order

def keras_weight_stream(model) -> list[tuple[str, list[np.ndarray]]]:
    """[(kind, arrays)] for every weighted layer, in model.layers order.
    kinds: conv / dwconv / convt / bn / prelu."""
    records = []
    for layer in model.layers:
        w = layer.get_weights()
        if not w:
            continue
        name = type(layer).__name__
        if name == "DepthwiseConv2D":
            records.append(("dwconv", w))
        elif name == "Conv2DTranspose":
            records.append(("convt", w))
        elif name == "Conv2D":
            records.append(("conv", w))
        elif name == "BatchNormalization":
            records.append(("bn", w))
        elif name == "PReLU":
            records.append(("prelu", w))
        else:
            raise ValueError(f"unexpected weighted layer {name} "
                             f"({layer.name}) — not a reference graph?")
    return records


# ---------------------------------------------------------------------------
# Flax-side: per-family ordered (path, kind) specs.  Paths are '/'-joined
# keys into the params tree; BN paths also receive batch_stats mean/var.

def _inverted_residual(i: int) -> list[tuple[str, str]]:
    p = f"body/InvertedResidual_{i}"
    spec = []
    if i:
        spec += [(f"{p}/expand", "conv"), (f"{p}/BatchNorm_0", "bn")]
    spec += [(f"{p}/depthwise", "dwconv"),
             (f"{p}/BatchNorm_{1 if i else 0}", "bn"),
             (f"{p}/project", "conv"),
             (f"{p}/BatchNorm_{2 if i else 1}", "bn")]
    return spec


def gen_spec(family: str) -> list[tuple[str, str]]:
    if family == "fsrgan":
        spec = [("body/Conv_0", "conv"), ("body/BatchNorm_0", "bn"),
                ("body/PReLU_0", "prelu")]
        for i in range(6):
            spec += _inverted_residual(i)
        spec += [("body/Conv_1", "conv"), ("body/BatchNorm_1", "bn"),
                 ("tail/up1/Conv_0", "conv"), ("tail/up1/PReLU_0", "prelu"),
                 ("tail/up2/Conv_0", "conv"), ("tail/up2/PReLU_0", "prelu"),
                 ("tail/out_conv", "conv")]
        return spec
    if family == "srgan":
        spec = [("body/Conv_0", "conv"), ("body/BatchNorm_0", "bn"),
                ("body/PReLU_0", "prelu")]
        for i in range(16):
            spec += [(f"body/Conv_{1 + 2 * i}", "conv"),
                     (f"body/BatchNorm_{1 + 2 * i}", "bn"),
                     (f"body/Conv_{2 + 2 * i}", "conv"),
                     (f"body/BatchNorm_{2 + 2 * i}", "bn")]
        spec += [("body/Conv_33", "conv"), ("body/BatchNorm_33", "bn"),
                 ("tail/up1/Conv_0", "conv"), ("tail/up1/PReLU_0", "prelu"),
                 ("tail/up2/Conv_0", "conv"), ("tail/up2/PReLU_0", "prelu"),
                 ("tail/out_conv", "conv")]
        return spec
    if family == "autoencoder":
        return [(f"Conv_{i}", "conv") for i in range(17)]
    if family == "pix2pix":
        spec = [("Downsample_0/Conv_0", "conv")]
        for i in range(1, 8):
            spec += [(f"Downsample_{i}/Conv_0", "conv"),
                     (f"Downsample_{i}/BatchNorm_0", "bn")]
        for i in range(7):
            spec += [(f"Upsample_{i}/ConvTranspose_0", "convt"),
                     (f"Upsample_{i}/BatchNorm_0", "bn")]
        spec += [("ConvTranspose_0", "convt")]
        return spec
    raise ValueError(family)


def disc_spec(family: str) -> list[tuple[str, str]]:
    if family == "pix2pix":
        return [("Conv_0", "conv"),
                ("Conv_1", "conv"), ("BatchNorm_0", "bn"),
                ("Conv_2", "conv"), ("BatchNorm_1", "bn"),
                ("Conv_3", "conv"), ("BatchNorm_2", "bn"),
                ("Conv_4", "conv")]
    # Fast-SRGAN PatchGAN (srgan/fsrgan logits head, autoencoder sigmoid head)
    spec = [("Conv_0", "conv")]
    for i in range(1, 8):
        spec += [(f"Conv_{i}", "conv"), (f"BatchNorm_{i - 1}", "bn")]
    spec += [("Conv_8", "conv")]
    return spec


# ---------------------------------------------------------------------------
# mapping engine

def _set(tree: dict, path: str, leaf: str, value: np.ndarray) -> None:
    node = tree
    for key in path.split("/"):
        node = node.setdefault(key, {})
    node[leaf] = np.asarray(value, np.float32)


def map_weights(records: list[tuple[str, list[np.ndarray]]],
                spec: list[tuple[str, str]]) -> tuple[dict, dict]:
    """Zip the Keras weight stream against the Flax path spec; returns
    (params, batch_stats) nested dicts."""
    kinds = [k for k, _ in records]
    want = [k for _, k in spec]
    if kinds != want:
        raise ValueError(
            "h5 layer stream does not match the family graph:\n"
            f"  h5:   {kinds}\n  want: {want}")
    params: dict = {}
    stats: dict = {}
    for (kind, w), (path, _) in zip(records, spec):
        if kind == "conv":
            _set(params, path, "kernel", w[0])
            if len(w) > 1:
                _set(params, path, "bias", w[1])
        elif kind == "dwconv":
            _set(params, path, "kernel", np.transpose(w[0], (0, 1, 3, 2)))
            if len(w) > 1:
                _set(params, path, "bias", w[1])
        elif kind == "convt":
            _set(params, path, "kernel",
                 np.transpose(w[0][::-1, ::-1], (0, 1, 3, 2)))
            if len(w) > 1:
                _set(params, path, "bias", w[1])
        elif kind == "bn":
            gamma, beta, mean, var = w
            _set(params, path, "scale", gamma)
            _set(params, path, "bias", beta)
            _set(stats, path, "mean", mean)
            _set(stats, path, "var", var)
        elif kind == "prelu":
            _set(params, path, "alpha", np.reshape(w[0], (-1,)))
    return params, stats


# ---------------------------------------------------------------------------
# validation against the Flax template + export

def _tree_check(got: dict, template, where: str) -> None:
    import jax

    gleaves = jax.tree_util.tree_flatten_with_path(got)[0]
    tleaves = jax.tree_util.tree_flatten_with_path(template)[0]
    gmap = {jax.tree_util.keystr(p): np.shape(v) for p, v in gleaves}
    tmap = {jax.tree_util.keystr(p): np.shape(v) for p, v in tleaves}
    if gmap != tmap:
        missing = sorted(set(tmap) - set(gmap))
        extra = sorted(set(gmap) - set(tmap))
        wrong = sorted(k for k in set(gmap) & set(tmap) if gmap[k] != tmap[k])
        raise ValueError(
            f"{where}: converted tree != Flax template; "
            f"missing={missing[:6]} extra={extra[:6]} shape-mismatch="
            f"{[(k, gmap[k], tmap[k]) for k in wrong[:6]]}")


def convert_keras_model(model, family: str, role: str = "generator",
                        scale: int | None = None,
                        validate: bool = True) -> tuple[dict, dict]:
    """In-memory conversion: Keras model -> (params, batch_stats) matching
    models.build_models(family).{generator|discriminator}."""
    spec = gen_spec(family) if role == "generator" else disc_spec(family)
    params, stats = map_weights(keras_weight_stream(model), spec)
    if validate:
        import jax
        import jax.numpy as jnp
        from denoise_gan_tpu.models import build_models

        scale = DEFAULT_SCALE[family] if scale is None else scale
        bundle = build_models(family, scale=scale)
        if role == "generator":
            size = 64 if bundle.upscales else 256
            lr = size // (scale if bundle.upscales else 1)
            variables = bundle.generator.init(
                {"params": jax.random.key(0), "dropout": jax.random.key(1)},
                jnp.zeros((1, lr, lr, 3), jnp.float32), train=False)
        elif family == "pix2pix":
            variables = bundle.discriminator.init(
                jax.random.key(0), jnp.zeros((1, 256, 256, 3), jnp.float32),
                jnp.zeros((1, 256, 256, 3), jnp.float32), train=False)
        else:
            variables = bundle.discriminator.init(
                jax.random.key(0), jnp.zeros((1, 64, 64, 3), jnp.float32),
                train=False)
        _tree_check(params, variables["params"], f"{family}/{role} params")
        _tree_check(stats, variables.get("batch_stats", {}),
                    f"{family}/{role} batch_stats")
    return params, stats


def load_keras(path: str, family: str, role: str):
    """load_model first (reference saves full models); fall back to the
    reference-graph builders + load_weights."""
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    from tensorflow import keras
    try:
        try:
            return keras.models.load_model(path, compile=False,
                                           safe_mode=False)
        except TypeError:                       # older keras: no safe_mode
            return keras.models.load_model(path, compile=False)
    except Exception as exc:
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
        return model


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--h5", required=True, help="Keras .h5 (full model or "
                                               "weights-only)")
    p.add_argument("--family", required=True, choices=FAMILIES)
    p.add_argument("--role", default="generator",
                   choices=["generator", "discriminator"])
    p.add_argument("--scale", type=int, default=0,
                   help="0 = family default (srgan/fsrgan 4, else 1)")
    p.add_argument("--out", default="", help="default: <h5 stem>.dgt")
    args = p.parse_args()

    scale = args.scale or DEFAULT_SCALE[args.family]
    out = args.out or os.path.splitext(args.h5)[0] + ".dgt"

    model = load_keras(args.h5, args.family, args.role)
    params, stats = convert_keras_model(model, args.family, args.role, scale)

    from denoise_gan_tpu.io.checkpoint import export_net
    export_net(out, args.family, scale, params, stats, role=args.role)
    n = sum(int(np.prod(np.shape(x)))
            for x in __import__("jax").tree.leaves(params))
    print(f"wrote {out} ({args.family} {args.role}, scale {scale}, "
          f"{n:,} params)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
