"""Keras `.h5` interop: map reference artifacts onto Flax parameter trees.

The reference's entire checkpoint->inference contract is Keras `.h5`
(/root/reference/infer.py:40-43, /root/reference/infer_video.py:93-97, final
saves at /root/reference/train_srgan.py:256-259).  This module lets every
inference surface consume those artifacts directly: `load_generator`
(io/checkpoint.py) sniffs the HDF5 magic and routes here, so
``infer.py --model fsrgan.h5`` just works.

Weight-layout transforms (verified by tests/test_layer_parity.py and the
cross-framework forward-parity tests in tests/test_convert_h5.py):
* Conv2D             — Keras (kh,kw,in,out) == Flax HWIO, verbatim.
* DepthwiseConv2D    — Keras (kh,kw,C,1) -> Flax feature_group_count kernel
                       (kh,kw,1,C): transpose the last two axes.
* Conv2DTranspose    — Keras (kh,kw,out,in) -> Flax nn.ConvTranspose
                       (kh,kw,in,out) + spatial flip (Keras computes the conv
                       gradient; Flax the fractionally-strided conv).
* BatchNormalization — gamma/beta -> params scale/bias; moving mean/variance
                       -> batch_stats mean/var.
* PReLU(shared 1,2)  — (1,1,C) alpha -> (C,).

TensorFlow is imported lazily and only when an `.h5` is actually loaded.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

FAMILIES = ("autoencoder", "pix2pix", "srgan", "fsrgan")
DEFAULT_SCALE = {"autoencoder": 1, "pix2pix": 1, "srgan": 4, "fsrgan": 4}
HDF5_MAGIC = b"\x89HDF\r\n\x1a\n"


def is_hdf5(path: str) -> bool:
    try:
        with open(path, "rb") as f:
            return f.read(8) == HDF5_MAGIC
    except OSError:
        return False


# ---------------------------------------------------------------------------
# Keras-side: typed weight stream in layer (construction) order

def _walk_layers(container):
    """Depth-first over weighted leaf layers, flattening nested containers
    (the reference pix2pix wraps each down/upsample stack in a
    tf.keras.Sequential, /root/reference/pix2pix.py:113-140)."""
    for layer in container.layers:
        if getattr(layer, "layers", None):
            yield from _walk_layers(layer)
        else:
            yield layer


def keras_weight_stream(model) -> list[tuple[str, list[np.ndarray]]]:
    """[(kind, arrays)] for every weighted layer, in model.layers order.
    kinds: conv / dwconv / convt / bn / prelu."""
    records = []
    for layer in _walk_layers(model):
        w = layer.get_weights()
        if not w:
            continue
        name = type(layer).__name__
        kind = {"DepthwiseConv2D": "dwconv", "Conv2DTranspose": "convt",
                "Conv2D": "conv", "BatchNormalization": "bn",
                "PReLU": "prelu"}.get(name)
        if kind is None:
            raise ValueError(f"unexpected weighted layer {name} "
                             f"({layer.name}) — not a reference graph?")
        records.append((kind, w))
    return records


_BN_LEAVES = ("gamma", "beta", "moving_mean", "moving_variance")


def _classify_weight_group(parent: str, leaves: list[str]) -> str | None:
    """Layer kind from a saved weight group: primarily the per-variable leaf
    names (gamma/alpha/kernel — stable across Keras versions and custom
    layer names), with the innermost layer name only disambiguating
    depthwise vs plain convs (Keras 3 names both variables 'kernel') and
    transposed vs plain convs.  Handles the reference's custom-named fsrgan
    layers (block_N_expand / expanded_conv_depthwise / *_BN,
    /root/reference/fsrgan.py:131-176) that Keras auto-name matching missed
    (ADVICE r4 #1)."""
    base = parent.lower().rsplit("/", 1)[-1]
    if any(leaf in leaves for leaf in _BN_LEAVES):
        return "bn"
    if "alpha" in leaves:
        return "prelu"
    if "depthwise_kernel" in leaves or "depthwise" in base:
        return "dwconv"
    if "kernel" in leaves:
        return "convt" if "transpose" in base else "conv"
    return None


def _ordered_arrays(kind: str, pairs: list[tuple[str, np.ndarray]],
                    where: str) -> list[np.ndarray]:
    """Arrays in the canonical per-kind order keras_weight_stream produces
    (kernel[,bias] / gamma,beta,mean,var / alpha)."""
    d = dict(pairs)
    if len(d) != len(pairs):
        raise ValueError(f"duplicate weight leaves in '{where}': "
                         f"{[leaf for leaf, _ in pairs]}")
    if kind == "bn":
        missing = [leaf for leaf in _BN_LEAVES if leaf not in d]
        if missing:
            raise ValueError(f"BN group '{where}' missing {missing}")
        return [d[leaf] for leaf in _BN_LEAVES]
    if kind == "prelu":
        return [d["alpha"]]
    kernel = d.get("depthwise_kernel", d.get("kernel"))
    return [kernel] + ([d["bias"]] if "bias" in d else [])


def h5_weight_stream(path: str) -> list[tuple[str, list[np.ndarray]]]:
    """The same typed weight stream read STRAIGHT from a legacy Keras `.h5`
    with h5py — no TensorFlow import, and immune to Keras-3's inability to
    deserialize the reference's Lambda(depth_to_space) layers
    (/root/reference/srgan.py:141).

    The legacy format stores ordered `layer_names` / per-layer
    `weight_names` attrs whose entries are full variable paths
    ('block_1_expand/kernel', 'sequential/batch_normalization/gamma').
    Weights are re-grouped by their parent path, so one h5 group holding
    several layers' weights (the reference pix2pix's nested Sequential
    down/upsample stacks) and arbitrary custom layer names (the reference
    fsrgan's block_N_* layers) both classify correctly."""
    import h5py

    def _s(x):
        return x.decode() if isinstance(x, bytes) else x

    records = []
    with h5py.File(path, "r") as f:
        g = f["model_weights"] if "model_weights" in f else f
        if "layer_names" not in g.attrs:
            raise ValueError(
                f"{path}: no legacy layer_names attr — not a Keras "
                "full-model/weights .h5 (for .weights.h5 use "
                "tools/convert_h5.py's builder fallback)")
        for name in [_s(n) for n in g.attrs["layer_names"]]:
            grp = g[name]
            wnames = [_s(w) for w in grp.attrs.get("weight_names", [])]
            if not wnames:
                continue
            order: list[str] = []
            groups: dict[str, list[tuple[str, np.ndarray]]] = {}
            for w in wnames:
                parent, _, leaf = w.rpartition("/")
                parent = parent or name
                leaf = leaf.split(":")[0]       # Keras 2 ':0' suffixes
                if parent not in groups:
                    groups[parent] = []
                    order.append(parent)
                groups[parent].append((leaf, np.asarray(grp[w])))
            for parent in order:
                leaves = [leaf for leaf, _ in groups[parent]]
                kind = _classify_weight_group(parent, leaves)
                if kind is None:
                    raise ValueError(
                        f"unclassifiable weighted layer '{parent}' "
                        f"(weights {leaves}) in {path} — not a reference "
                        "graph?")
                records.append(
                    (kind, _ordered_arrays(kind, groups[parent], parent)))
    return records


# ---------------------------------------------------------------------------
# Flax-side: per-family ordered (path, kind) specs.  Paths are '/'-joined
# keys into the params tree; BN entries also fill batch_stats mean/var.

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


def _up_stages(n: int) -> list[tuple[str, str]]:
    spec = []
    for i in range(n):
        spec += [(f"tail/up{i + 1}/Conv_0", "conv"),
                 (f"tail/up{i + 1}/PReLU_0", "prelu")]
    return spec


def gen_spec(family: str, scale: int | None = None) -> list[tuple[str, str]]:
    scale = DEFAULT_SCALE[family] if scale is None else scale
    if family == "fsrgan":
        # fixed 2 pixel-shuffle stages regardless of --scale
        # (/root/reference/fsrgan.py:213-214)
        spec = [("body/Conv_0", "conv"), ("body/BatchNorm_0", "bn"),
                ("body/PReLU_0", "prelu")]
        for i in range(6):
            spec += _inverted_residual(i)
        spec += [("body/Conv_1", "conv"), ("body/BatchNorm_1", "bn")]
        spec += _up_stages(2)
        spec += [("tail/out_conv", "conv")]
        return spec
    if family == "srgan":
        # scale//2 pixel-shuffle stages (/root/reference/srgan.py:179-180)
        spec = [("body/Conv_0", "conv"), ("body/BatchNorm_0", "bn"),
                ("body/PReLU_0", "prelu")]
        for i in range(16):
            spec += [(f"body/Conv_{1 + 2 * i}", "conv"),
                     (f"body/BatchNorm_{1 + 2 * i}", "bn"),
                     (f"body/Conv_{2 + 2 * i}", "conv"),
                     (f"body/BatchNorm_{2 + 2 * i}", "bn")]
        spec += [("body/Conv_33", "conv"), ("body/BatchNorm_33", "bn")]
        spec += _up_stages(max(scale // 2, 1))
        spec += [("tail/out_conv", "conv")]
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


def infer_family_role(records: list[tuple[str, list[np.ndarray]]],
                      ) -> tuple[str, str, int]:
    """Identify (family, role, scale) from the weight-kind sequence alone —
    full-model .h5s carry no framework-legible family tag.  Generator streams
    are structurally distinct across the four families (dwconv only in
    fsrgan, convt only in pix2pix, bare-conv stack = autoencoder, 16-resblock
    conv/bn run = srgan); discriminator detection uses the first conv's
    input-channel count to split pix2pix's 6-channel conditional D from the
    shared PatchGAN."""
    kinds = [k for k, _ in records]
    for family in FAMILIES:
        # srgan builds scale//2 upsample stages for ANY even --scale
        # (/root/reference/srgan.py:179-180), so enumerate beyond the 4/2
        # defaults (ADVICE r4 #3); common scales first for determinism
        scales = ((4, 2, 6, 8, 10, 12, 14, 16) if family == "srgan"
                  else (DEFAULT_SCALE[family],))
        for scale in scales:
            if kinds == [k for _, k in gen_spec(family, scale)]:
                return family, "generator", scale
    if kinds == [k for _, k in disc_spec("pix2pix")]:
        return "pix2pix", "discriminator", 1
    if kinds == [k for _, k in disc_spec("fsrgan")]:
        # srgan/fsrgan/autoencoder share the PatchGAN graph (the sigmoid vs
        # logits head is a Conv2D activation, invisible in the weights);
        # report the logits default — callers needing the exact family pass
        # it explicitly via tools/convert_h5.py --family
        return "fsrgan", "discriminator", 4
    raise ValueError(
        f"unrecognized .h5 layer stream (kinds={kinds[:12]}...): "
        "not one of the reference's generator/discriminator graphs; pass "
        "--family/--role explicitly via tools/convert_h5.py")


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
# validation against the Flax template + top-level conversion

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


def _template_variables(family: str, role: str, scale: int):
    import jax
    import jax.numpy as jnp
    from denoise_gan_tpu.models import build_models

    bundle = build_models(family, scale=scale)
    if role == "generator":
        size = 64 if bundle.upscales else 256
        lr = size // (scale if bundle.upscales else 1)
        return bundle.generator.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            jnp.zeros((1, lr, lr, 3), jnp.float32), train=False)
    if family == "pix2pix":
        return bundle.discriminator.init(
            jax.random.key(0), jnp.zeros((1, 256, 256, 3), jnp.float32),
            jnp.zeros((1, 256, 256, 3), jnp.float32), train=False)
    return bundle.discriminator.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3), jnp.float32),
        train=False)


def convert_records(records: list[tuple[str, list[np.ndarray]]],
                    family: str, role: str = "generator",
                    scale: int | None = None,
                    validate: bool = True) -> tuple[dict, dict]:
    """Typed weight stream -> (params, batch_stats) matching
    models.build_models(family).{generator|discriminator}."""
    scale = DEFAULT_SCALE[family] if scale is None else scale
    spec = (gen_spec(family, scale) if role == "generator"
            else disc_spec(family))
    params, stats = map_weights(records, spec)
    if validate:
        variables = _template_variables(family, role, scale)
        _tree_check(params, variables["params"], f"{family}/{role} params")
        _tree_check(stats, variables.get("batch_stats", {}),
                    f"{family}/{role} batch_stats")
    return params, stats


def convert_keras_model(model, family: str, role: str = "generator",
                        scale: int | None = None,
                        validate: bool = True) -> tuple[dict, dict]:
    """In-memory conversion from a live Keras model."""
    return convert_records(keras_weight_stream(model), family, role, scale,
                           validate)


def load_keras_model(path: str):
    """keras.models.load_model with the Lambda-layer guard (the reference's
    srgan/fsrgan graphs embed tf.nn.depth_to_space Lambdas)."""
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    from tensorflow import keras
    try:
        return keras.models.load_model(path, compile=False, safe_mode=False)
    except TypeError:                          # older keras: no safe_mode
        return keras.models.load_model(path, compile=False)


def load_h5_generator(path: str) -> tuple[dict, Any, Any]:
    """Reference `.h5` -> (config, params, batch_stats): the same contract as
    io.checkpoint.load_generator, so the inference CLIs consume reference
    artifacts directly (/root/reference/infer.py:40-43).  Pure h5py — no
    TensorFlow import."""
    records = h5_weight_stream(path)
    family, role, scale = infer_family_role(records)
    if role != "generator":
        raise ValueError(f"{path} holds a {family} {role}, not a generator")
    params, stats = convert_records(records, family, "generator", scale)
    print(f"converted Keras h5 -> {family} generator (scale {scale}): {path}")
    return {"family": family, "scale": scale, "format": 1,
            "role": "generator", "source": "keras_h5"}, params, stats
