"""Cross-framework `.h5` interop parity (VERDICT r3 #2).

For every family: build the reference's EXACT Keras graph (the TF harness
builders, tools/bench_train_tf_cpu.py), save `.h5`, convert with
tools/convert_h5.py, and assert the repo's Flax forward matches the TF
forward on random inputs — the same trained weights must produce the same
outputs in both frameworks (max|delta| <= 1e-4 in f32, eval mode).

This closes the reference's artifact-consumption surface
(/root/reference/infer.py:40-43: inference loads `.h5` directly).
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

tf = pytest.importorskip("tensorflow")

import bench_train_tf_cpu as ref                      # noqa: E402
from convert_h5 import load_records                   # noqa: E402

from denoise_gan_tpu.io.keras_h5 import (             # noqa: E402
    convert_keras_model, convert_records, infer_family_role,
    keras_weight_stream,
)
from denoise_gan_tpu.models import build_models       # noqa: E402

GEN_BUILDERS = {
    "fsrgan": ref.build_fsrgan_generator,
    "srgan": ref.build_srgan_generator,
    "autoencoder": ref.build_autoencoder_generator,
    "pix2pix": ref.build_pix2pix_generator,
}
SCALE = {"fsrgan": 4, "srgan": 4, "autoencoder": 1, "pix2pix": 1}
# generator input sizes: pix2pix U-Net is fixed 256; autoencoder needs
# multiples of 32; the SR families are shape-agnostic
IN_SIZE = {"fsrgan": 24, "srgan": 24, "autoencoder": 64, "pix2pix": 256}


def _convert_via_h5(model, tmp_path, family, role):
    """Full surface: Keras save -> .h5 on disk -> load_records -> convert."""
    path = str(tmp_path / f"{family}_{role}.h5")
    model.save(path)
    records = load_records(path, family, role)
    return convert_records(records, family, role, SCALE[family])


@pytest.mark.parametrize("family", ["fsrgan", "srgan", "autoencoder",
                                    "pix2pix"])
def test_generator_h5_roundtrip_forward_parity(tmp_path, rng, family):
    keras_model = GEN_BUILDERS[family]()
    params, stats = _convert_via_h5(keras_model, tmp_path, family,
                                    "generator")

    size = IN_SIZE[family]
    x = rng.uniform(-1, 1, (1, size, size, 3)).astype(np.float32)
    want = keras_model(tf.constant(x), training=False).numpy()

    bundle = build_models(family, scale=SCALE[family])
    got = np.asarray(bundle.generator.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x),
        train=False))

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("family", ["fsrgan", "autoencoder"])
def test_patch_discriminator_h5_forward_parity(tmp_path, rng, family):
    keras_model = ref.build_discriminator(sigmoid=(family == "autoencoder"))
    params, stats = _convert_via_h5(keras_model, tmp_path, family,
                                    "discriminator")

    x = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    want = keras_model(tf.constant(x), training=False).numpy()
    bundle = build_models(family, scale=SCALE[family])
    got = np.asarray(bundle.discriminator.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x),
        train=False))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_pix2pix_discriminator_h5_forward_parity(tmp_path, rng):
    keras_model = ref.build_pix2pix_discriminator()
    params, stats = _convert_via_h5(keras_model, tmp_path, "pix2pix",
                                    "discriminator")

    a = rng.uniform(-1, 1, (1, 256, 256, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (1, 256, 256, 3)).astype(np.float32)
    want = keras_model([tf.constant(a), tf.constant(b)],
                       training=False).numpy()
    bundle = build_models("pix2pix", scale=1)
    got = np.asarray(bundle.discriminator.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(a),
        jnp.asarray(b), train=False))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_infer_family_role_identifies_every_graph():
    """Family auto-detection from the weight-kind stream alone (full-model
    .h5s carry no framework-legible family tag)."""
    for family, builder in GEN_BUILDERS.items():
        got = infer_family_role(keras_weight_stream(builder()))
        assert got == (family, "generator", SCALE[family])
    assert infer_family_role(keras_weight_stream(
        ref.build_pix2pix_discriminator())) == ("pix2pix", "discriminator", 1)
    fam, role, _ = infer_family_role(keras_weight_stream(
        ref.build_discriminator()))
    assert role == "discriminator"


def test_infer_family_role_srgan_any_even_scale():
    """The reference srgan builds scale//2 upsample stages for ANY even
    --scale (/root/reference/srgan.py:179-180); detection must not be
    limited to the 4/2 defaults (ADVICE r4 #3).  Kind streams suffice —
    infer_family_role never looks at the arrays."""
    from denoise_gan_tpu.io.keras_h5 import gen_spec, infer_family_role

    for scale in (2, 6, 8, 16):
        records = [(k, []) for _, k in gen_spec("srgan", scale)]
        assert infer_family_role(records) == ("srgan", "generator", scale)


def test_load_generator_consumes_h5_directly(tmp_path, rng):
    """The reference CLI surface: --model path/to/model.h5 must work without
    a conversion step (/root/reference/infer.py:40-43) — load_generator
    sniffs HDF5 and converts on the fly."""
    from denoise_gan_tpu.io.checkpoint import load_generator

    keras_model = GEN_BUILDERS["fsrgan"]()
    path = str(tmp_path / "gen.h5")
    keras_model.save(path)
    config, params, stats = load_generator(path)
    assert config["family"] == "fsrgan" and config["scale"] == 4

    x = rng.uniform(-1, 1, (1, 24, 24, 3)).astype(np.float32)
    want = keras_model(tf.constant(x), training=False).numpy()
    bundle = build_models("fsrgan", scale=4)
    got = np.asarray(bundle.generator.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x),
        train=False))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("family", ["fsrgan", "srgan", "pix2pix"])
def test_reverse_export_dgt_to_h5_forward_parity(tmp_path, rng, family):
    """tools/export_h5.py (the reverse direction): a repo-trained .dgt must
    run in the reference's framework — Flax forward vs the Keras graph
    loaded from the exported .h5 (covers the dwconv, convt and prelu
    inverse transforms)."""
    import subprocess

    from denoise_gan_tpu.io.checkpoint import export_net
    from denoise_gan_tpu.io.keras_h5 import _template_variables

    variables = _template_variables(family, "generator", SCALE[family])
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    dgt = str(tmp_path / f"{family}.dgt")
    export_net(dgt, family, SCALE[family], params, stats, role="generator")

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "export_h5.py"),
         "--dgt", dgt], capture_output=True, text=True, timeout=1800)
    assert out.returncode == 0, out.stdout + out.stderr
    h5 = str(tmp_path / f"{family}.h5")
    assert os.path.exists(h5)

    keras_model = GEN_BUILDERS[family]()
    keras_model.load_weights(h5)          # Lambda-proof load of the full .h5
    size = IN_SIZE[family]
    x = rng.uniform(-1, 1, (1, size, size, 3)).astype(np.float32)
    want = np.asarray(build_models(family, scale=SCALE[family])
                      .generator.apply({"params": params,
                                        "batch_stats": stats},
                                       jnp.asarray(x), train=False))
    got = keras_model(tf.constant(x), training=False).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_converted_export_loads_into_infer_path(tmp_path, rng):
    """The converted .dgt must round-trip through io.checkpoint.load_generator
    (what the inference CLIs consume)."""
    from denoise_gan_tpu.io.checkpoint import export_net, load_generator

    keras_model = GEN_BUILDERS["fsrgan"]()
    params, stats = convert_keras_model(keras_model, "fsrgan", "generator", 4)
    path = str(tmp_path / "conv.dgt")
    export_net(path, "fsrgan", 4, params, stats, role="generator")
    config, p2, s2 = load_generator(path)
    assert config["family"] == "fsrgan" and config["scale"] == 4
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
