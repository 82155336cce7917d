#!/usr/bin/env python
"""Lockstep framework-dynamics diagnostic (VERDICT r4 #3: srgan's
matched-init h2h came out -0.62 dB; settle whether that is an op-level
divergence or GAN-trajectory noise).

Both frameworks are driven through N REAL training steps from IDENTICAL
initial weights (the make_init artifacts), IDENTICAL pre-degraded batches
(TF-oracle degradation computed once in numpy), and an IDENTICAL random
VGG (the TF harness VGG's weights exported to the repo's npz format), with
f32 everywhere.  srgan has no dropout and the pre-degraded path removes
both data pipelines, so each side is deterministic: any per-step loss gap
or per-layer update gap IS framework math (conv/BN/losses/Adam), not
stochasticity.

Reports
  * per-step gen/disc loss for both sides and their deltas
  * after step 1 and step N: per-layer update agreement
      rel(layer) = max|u_tf - u_repo| / (max|u_tf| + 1e-12),
    u = w_after - w_init — a single mismatched op (BN eps, ConvTranspose
    padding, Adam eps) shows up as an outlier layer family.

Usage (CPU; TF is CPU-only here anyway):
  env -u JAX_PLATFORMS PYTHONPATH=/root/repo:/root/repo/tools \
      python tools/h2h_lockstep.py --family srgan --steps 8

Reference train-step math: /root/reference/train_srgan.py:61-118.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

from h2h_tf_reference import H2H_CFG, _ensure_corpus, _init_paths, \
    _load_split  # noqa: E402


def make_batches(args, cfg) -> list[tuple[np.ndarray, np.ndarray]]:
    """Deterministic (lo, hi) [-1,1] batches via the TF oracle degradation
    (tf.image.resize bicubic + adjust_jpeg_quality, the same ops the TF h2h
    training applies — /root/reference/dataloader.py:121-140)."""
    import tensorflow as tf

    crop, bs, scale, q = cfg["crop"], cfg["batch"], cfg["scale"], cfg["q"]
    _ensure_corpus(args.data_root)
    imgs = _load_split(args.data_root, "train")
    n_img, size = imgs.shape[0], imgs.shape[1]
    rng = np.random.default_rng(args.batch_seed)
    batches = []
    for _ in range(args.steps):
        idx = rng.integers(0, n_img, bs)
        ys = rng.integers(0, size - crop + 1, bs)
        xs = rng.integers(0, size - crop + 1, bs)
        hr01 = np.stack([imgs[i, y:y + crop, x:x + crop]
                         for i, y, x in zip(idx, ys, xs)])
        lo = tf.constant(hr01)
        if scale > 1:
            lo = tf.image.resize(lo, [crop // scale, crop // scale],
                                 method="bicubic")
        lo = tf.map_fn(
            lambda im: tf.image.adjust_jpeg_quality(im, jpeg_quality=q), lo)
        batches.append(((lo.numpy() * 2 - 1).astype(np.float32),
                        (hr01 * 2 - 1).astype(np.float32)))
    return batches


def export_tf_vgg_npz(path: str) -> None:
    """The TF harness's fixed-seed random VGG -> the repo's npz format, so
    BOTH sides compute the content loss with the same features."""
    from bench_train_tf_cpu import build_vgg

    vgg = build_vgg()
    out = {}
    for layer in vgg.layers:
        w = layer.get_weights()
        if not w:
            continue
        # keras name 'block{b}_conv{c}' -> repo key 'conv{b}_{c}'
        b, c = layer.name.split("_")
        ours = f"conv{b[-1]}_{c[-1]}"
        out[f"{ours}/kernel"] = w[0]
        out[f"{ours}/bias"] = w[1]
    np.savez(path, **out)


def tf_side(args, cfg, batches, vgg_model=None):
    """N reference train steps; returns (loss rows, init tree, final tree)
    with trees in the repo's (params, batch_stats) layout for comparison."""
    import bench_train_tf_cpu as ref
    from denoise_gan_tpu.io.keras_h5 import convert_keras_model

    fam = args.family
    step_fn, _, gen, disc = ref.make_step(fam, return_models=True)
    paths = _init_paths(args.out_dir, fam)
    gen.load_weights(paths["gen_h5"])
    disc.load_weights(paths["disc_h5"])

    def snap():
        return {"gen": convert_keras_model(gen, fam, "generator",
                                           cfg["scale"], validate=False),
                "disc": convert_keras_model(disc, fam, "discriminator",
                                            cfg["scale"], validate=False)}

    init = snap()
    rows = []
    for lo, hi in batches:
        gl, dl = step_fn(lo, hi)
        rows.append((float(gl), float(dl)))
    return rows, init, snap()


def repo_side(args, cfg, batches, vgg_npz):
    from denoise_gan_tpu.models import build_models
    from denoise_gan_tpu.models.vgg import init_vgg_params
    from denoise_gan_tpu.train.state import create_train_state
    from denoise_gan_tpu.train.step import build_train_step
    from denoise_gan_tpu.train.loop import warm_start_from_exports
    from denoise_gan_tpu.io.checkpoint import load_export_into
    from denoise_gan_tpu.utils.config import make_config
    import jax.numpy as jnp

    fam = args.family
    c = make_config(fam, image_dir="/nonexistent")
    c.crop_size, c.batch_size = cfg["crop"], cfg["batch"]
    c.scale, c.jpeg_quality = cfg["scale"], cfg["q"]
    c.fp16 = 0
    c.finalize()

    bundle = build_models(fam, scale=c.scale)
    state = create_train_state(bundle, c, jax.random.key(0))
    paths = _init_paths(args.out_dir, fam)
    _, p, s = load_export_into(paths["gen_dgt"], state.gen.params,
                               state.gen.batch_stats)
    state = state.replace(gen=state.gen.replace(params=p, batch_stats=s))
    _, p, s = load_export_into(paths["disc_dgt"], state.disc.params,
                               state.disc.batch_stats)
    state = state.replace(disc=state.disc.replace(params=p, batch_stats=s))

    vgg_params = init_vgg_params(vgg_npz)
    step = jax.jit(build_train_step(bundle, c, degrade=False))

    def snap(st):
        return {"gen": (jax.tree.map(np.asarray, st.gen.params),
                        jax.tree.map(np.asarray, st.gen.batch_stats)),
                "disc": (jax.tree.map(np.asarray, st.disc.params),
                         jax.tree.map(np.asarray, st.disc.batch_stats))}

    init = snap(state)
    rows = []
    rng = jax.random.key(7)           # srgan/ae/fsrgan steps use no rngs
    for lo, hi in batches:
        state, m = step(state, vgg_params,
                        (jnp.asarray(lo), jnp.asarray(hi)), rng)
        rows.append((float(m["gen_loss"]), float(m["disc_loss"])))
    return rows, init, snap(state)


def tf_grads(args, cfg, batch):
    """Raw srgan-family gradients in the TF framework on ONE batch
    (/root/reference/train_srgan.py:73-96 math, no optimizer) — converted
    to the repo tree layout for direct comparison."""
    import tensorflow as tf
    import bench_train_tf_cpu as ref
    from denoise_gan_tpu.io.keras_h5 import (convert_records,
                                             keras_weight_stream)

    fam = args.family
    assert fam in ("srgan", "fsrgan", "autoencoder"), \
        "grads mode implements the srgan-trainer loss family"
    gen = {"srgan": ref.build_srgan_generator,
           "fsrgan": ref.build_fsrgan_generator,
           "autoencoder": ref.build_autoencoder_generator}[fam]()
    disc = ref.build_discriminator(sigmoid=(fam == "autoencoder"))
    paths = _init_paths(args.out_dir, fam)
    gen.load_weights(paths["gen_h5"])
    disc.load_weights(paths["disc_h5"])
    content = ref.content_loss_fn(ref.build_vgg())
    mae = tf.keras.losses.MeanAbsoluteError()
    bce = tf.keras.losses.BinaryCrossentropy(
        from_logits=(fam != "autoencoder"))
    half = 0.5 if fam == "fsrgan" else 1.0
    x, y = tf.constant(batch[0]), tf.constant(batch[1])
    with tf.GradientTape(persistent=True) as tape:
        fake = gen(x, training=True)
        d_real = disc(y, training=True)
        d_fake = disc(fake, training=True)
        gen_loss = (content(y, fake)
                    + 1e-3 * bce(tf.ones_like(d_fake), d_fake)
                    + mae(y, fake))
        disc_loss = half * (bce(tf.ones_like(d_real), d_real)
                            + bce(tf.zeros_like(d_fake), d_fake))
    out = {}
    for role, model, loss in (("gen", gen, gen_loss),
                              ("disc", disc, disc_loss)):
        grads = tape.gradient(loss, model.trainable_variables)
        by_ref = {id(v): g for v, g in zip(model.trainable_variables,
                                           grads)}
        # reuse the weight-stream conversion by substituting each layer's
        # TRAINABLE weights with their gradients (BN moving stats are not
        # trainable; zeros keep the record shapes intact)
        records = []
        for kind, _ in keras_weight_stream(model):
            records.append(kind)
        recs, i = [], 0
        from denoise_gan_tpu.io.keras_h5 import _walk_layers
        for layer in _walk_layers(model):
            w = layer.get_weights()
            if not w:
                continue
            arrays = []
            for v in layer.trainable_variables:
                g = by_ref[id(v)]
                arrays.append(np.zeros_like(v.numpy()) if g is None
                              else g.numpy())
            for v in layer.non_trainable_variables:
                arrays.append(np.zeros_like(v.numpy()))
            recs.append((records[i], arrays))
            i += 1
        params, _ = convert_records(recs, fam,
                                    "generator" if role == "gen"
                                    else "discriminator",
                                    cfg["scale"], validate=False)
        out[role] = params
    return float(gen_loss), float(disc_loss), out


def repo_grads(args, cfg, batch, vgg_npz):
    """The repo train step's own loss closures differentiated on ONE batch
    (train/step.py gen_loss_fn/disc_loss_fn math, no optimizer)."""
    import jax.numpy as jnp
    from denoise_gan_tpu.models import build_models
    from denoise_gan_tpu.models.vgg import init_vgg_params
    from denoise_gan_tpu.losses.gan import (adversarial_loss, content_loss,
                                            discriminator_loss, l1_loss)
    from denoise_gan_tpu.io.checkpoint import load_export_into
    from denoise_gan_tpu.train.state import create_train_state
    from denoise_gan_tpu.utils.config import make_config

    fam = args.family
    c = make_config(fam, image_dir="/nonexistent")
    c.crop_size, c.batch_size = cfg["crop"], cfg["batch"]
    c.scale, c.jpeg_quality = cfg["scale"], cfg["q"]
    c.fp16 = 0
    c.finalize()
    bundle = build_models(fam, scale=c.scale)
    state = create_train_state(bundle, c, jax.random.key(0))
    paths = _init_paths(args.out_dir, fam)
    _, gp, gs = load_export_into(paths["gen_dgt"], state.gen.params,
                                 state.gen.batch_stats)
    _, dp, ds = load_export_into(paths["disc_dgt"], state.disc.params,
                                 state.disc.batch_stats)
    vgg_params = init_vgg_params(vgg_npz)
    from_logits = not bundle.disc_sigmoid
    x, y = jnp.asarray(batch[0]), jnp.asarray(batch[1])

    def gen_loss_fn(gen_params):
        fake, _ = bundle.generator.apply(
            {"params": gen_params, "batch_stats": gs}, x, train=True,
            mutable=["batch_stats"])
        d_fake, _ = bundle.discriminator.apply(
            {"params": dp, "batch_stats": ds}, fake, train=True,
            mutable=["batch_stats"])
        return (content_loss(vgg_params, y, fake)
                + 1e-3 * adversarial_loss(d_fake, from_logits)
                + l1_loss(y, fake))

    def disc_loss_fn(disc_params):
        fake, _ = bundle.generator.apply(
            {"params": gp, "batch_stats": gs}, x, train=True,
            mutable=["batch_stats"])
        fake = jax.lax.stop_gradient(fake)
        d_real, s1 = bundle.discriminator.apply(
            {"params": disc_params, "batch_stats": ds}, y, train=True,
            mutable=["batch_stats"])
        d_fake, _ = bundle.discriminator.apply(
            {"params": disc_params, "batch_stats": s1["batch_stats"]},
            fake, train=True, mutable=["batch_stats"])
        return discriminator_loss(d_real, d_fake, from_logits,
                                  half=(fam == "fsrgan"))

    gl, gg = jax.value_and_grad(gen_loss_fn)(gp)
    dl, dg = jax.value_and_grad(disc_loss_fn)(dp)
    return float(gl), float(dl), {"gen": jax.tree.map(np.asarray, gg),
                                  "disc": jax.tree.map(np.asarray, dg)}


def compare_grads(tf_g, rp_g, role, top) -> None:
    import jax

    tfl = {jax.tree_util.keystr(p): v for p, v in
           jax.tree_util.tree_flatten_with_path(tf_g[role])[0]}
    rows = []
    for p, gr in jax.tree_util.tree_flatten_with_path(rp_g[role])[0]:
        key = jax.tree_util.keystr(p)
        gt = np.asarray(tfl[key], np.float64)
        gr = np.asarray(gr, np.float64)
        denom = float(np.linalg.norm(gt)) * float(np.linalg.norm(gr))
        cos = float(np.sum(gt * gr) / denom) if denom else 1.0
        rel = float(np.max(np.abs(gt - gr))
                    / (np.max(np.abs(gt)) + 1e-30))
        rows.append((cos, rel, float(np.max(np.abs(gt))), f"{role}{key}"))
    rows.sort(key=lambda r: r[0])
    worst = rows[:top]
    cosines = np.array([r[0] for r in rows])
    print(f"\n{role} GRADIENT agreement: median cos "
          f"{np.median(cosines):.6f}, min {cosines.min():.6f} "
          f"({len(rows)} tensors)")
    print("  worst by cosine (cos, relmax, max|g_tf|, tensor):")
    for cos, rel, mx, path in worst:
        print(f"  {cos:9.6f}  {rel:9.3g}  {mx:9.3g}  {path}")


def compare_updates(tf_init, tf_fin, rp_init, rp_fin, role) -> list[tuple]:
    """Per-layer update agreement; returns [(rel, path)] sorted worst-first."""
    import jax

    tfu = jax.tree_util.tree_flatten_with_path(
        jax.tree.map(lambda a, b: np.asarray(b) - np.asarray(a),
                     tf_init[role][0], tf_fin[role][0]))[0]
    rpu = jax.tree_util.tree_flatten_with_path(
        jax.tree.map(lambda a, b: np.asarray(b) - np.asarray(a),
                     rp_init[role][0], rp_fin[role][0]))[0]
    tfm = {jax.tree_util.keystr(p): v for p, v in tfu}
    out = []
    for p, ur in rpu:
        key = jax.tree_util.keystr(p)
        ut = tfm[key]
        rel = float(np.max(np.abs(ut - ur)) / (np.max(np.abs(ut)) + 1e-12))
        out.append((rel, f"{role}{key}"))
    return sorted(out, reverse=True)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--family", default="srgan")
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--batch_seed", type=int, default=123)
    p.add_argument("--data_root", default="/tmp/h2h_corpus")
    p.add_argument("--out_dir", default="/tmp/h2h_r3")
    p.add_argument("--top", type=int, default=12)
    p.add_argument("--grads", action="store_true",
                   help="compare RAW gradients on one batch (no optimizer) "
                        "— Adam's sign normalization turns noise-scale "
                        "gradients (e.g. conv biases feeding BN, whose true "
                        "gradient is analytically zero) into +-lr coin "
                        "flips that swamp the update comparison")
    args = p.parse_args()

    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    cfg = H2H_CFG[args.family]
    paths = _init_paths(args.out_dir, args.family)
    for f in paths.values():
        if not os.path.exists(f):
            print(f"missing matched-init artifact {f} — run "
                  "h2h_tf_reference.py make_init first", file=sys.stderr)
            return 2

    batches = make_batches(args, cfg)
    vgg_npz = os.path.join(args.out_dir, "lockstep_vgg.npz")
    export_tf_vgg_npz(vgg_npz)
    print(f"lockstep {args.family}: {args.steps} identical batches "
          f"(crop={cfg['crop']} bs={cfg['batch']} scale={cfg['scale']} "
          f"q={cfg['q']}), shared random VGG", flush=True)

    if args.grads:
        tgl, tdl, tf_g = tf_grads(args, cfg, batches[0])
        rgl, rdl, rp_g = repo_grads(args, cfg, batches[0], vgg_npz)
        print(f"losses on the grad batch: TF {tgl:.6f}/{tdl:.6f} "
              f"repo {rgl:.6f}/{rdl:.6f} "
              f"(d {rgl-tgl:+.2e}/{rdl-tdl:+.2e})")
        for role in ("gen", "disc"):
            compare_grads(tf_g, rp_g, role, args.top)
        return 0

    tf_rows, tf_init, tf_fin = tf_side(args, cfg, batches)
    rp_rows, rp_init, rp_fin = repo_side(args, cfg, batches, vgg_npz)

    # sanity: the two sides really started from the same weights
    for role in ("gen", "disc"):
        import jax as _jax
        d0 = _jax.tree.map(
            lambda a, b: float(np.max(np.abs(np.asarray(a)
                                             - np.asarray(b)))),
            tf_init[role][0], rp_init[role][0])
        worst = max(_jax.tree.leaves(d0) or [0.0])
        print(f"init agreement [{role}]: max|dw| = {worst:.2e}", flush=True)

    print("\n| step | TF gen/disc loss | repo gen/disc loss | dgen | ddisc |")
    print("|---|---|---|---|---|")
    for i, ((tg, td), (rg, rd)) in enumerate(zip(tf_rows, rp_rows)):
        print(f"| {i+1} | {tg:.6f} / {td:.6f} | {rg:.6f} / {rd:.6f} "
              f"| {rg-tg:+.2e} | {rd-td:+.2e} |")

    for role in ("gen", "disc"):
        ranked = compare_updates(tf_init, tf_fin, rp_init, rp_fin, role)
        rels = np.array([r for r, _ in ranked])
        print(f"\n{role} update agreement after {args.steps} steps: "
              f"median rel {np.median(rels):.3f}, worst {rels[0]:.3f}")
        for rel, path in ranked[:args.top]:
            print(f"  {rel:8.4f}  {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
