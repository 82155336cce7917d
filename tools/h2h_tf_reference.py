#!/usr/bin/env python
"""Head-to-head quality parity vs the TF reference (VERDICT r2 #2).

Trains the reference's EXACT compute graphs (tools/bench_train_tf_cpu.py
builders + their real train steps, /root/reference/train_srgan.py:61-118
etc., weights=None VGG on both sides) on the same synthetic corpus at the
same step budget as the repo's models, then scores BOTH sides' generators on
the SAME fixed TF-degraded validation pairs with the SAME metric code
(denoise_gan_tpu.ops.metrics).

Both sides train with fresh random crops each step (the repo's documented
deviation from the reference's cache-after-crop quirk,
/root/reference/dataloader.py:221, data/pipeline.py:16-19) so the comparison
is framework-vs-framework, not data-regime-vs-data-regime.

The long TF trainings also log steps/s every 100 steps -> median +- spread
per family (VERDICT r2 #6, BASELINE.md error bars).

Subcommands (run in order; `train` is hours of 1-core CPU, background it):
  pairs       build fixed val pairs (TF oracle) for both (scale, q) configs
  make_init   fixed-seed Keras gen+disc -> .h5 + converted .dgt: ONE set of
              initial weights both frameworks start from (--matched_init)
  train       train one TF reference family, save outputs on the val pairs
  train_repo  train the matching repo model (run on the TPU chip)
  score_repo  run a repo .dgt model on the val pairs, save outputs
  report      compute PSNR/SSIM for all saved outputs, print the table

Matched-init head-to-head (VERDICT r3 #3 — identical init on both sides
removes the GAN init-seed spread; settles srgan/pix2pix parity):
  make_init --family srgan; train --family srgan --matched_init 1 &
  train_repo --family srgan --matched_init 1; score_repo ... --matched_init 1
  report
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

# Both sides use the same budget; steps are whole repo-side epochs
# (steps/epoch = 240 // batch).  crop/batch/scale/q follow
# tools/quality_table.py except batch=4 so the TF side fits ~1.5-2h/family
# on this 1-core CPU (pixel load == the reference default bs=1 crop=256).
H2H_CFG = {
    "autoencoder": dict(crop=128, batch=4, scale=1, q=10, steps=1980),
    "pix2pix": dict(crop=256, batch=1, scale=1, q=10, steps=1440),
    "srgan": dict(crop=128, batch=4, scale=4, q=50, steps=1980),
    "fsrgan": dict(crop=128, batch=4, scale=4, q=50, steps=1980),
}
EVAL_CROP = 256  # center crop of the 288^2 val images; pix2pix needs 256


def _load_split(root: str, split: str) -> np.ndarray:
    d = os.path.join(root, split, "imgs")
    files = sorted(os.listdir(d))
    return np.stack([np.load(os.path.join(d, f)) for f in files])


def _ensure_corpus(root: str) -> None:
    if not os.path.exists(root):
        from quality_table import make_corpus
        make_corpus(root)


# ---------------------------------------------------------------- pairs ----

def make_pairs(args) -> None:
    """Fixed val pairs with the TF oracle: center-crop 256 -> bicubic
    downscale (tf.image.resize, /root/reference/dataloader.py:121-123) ->
    tf.image.adjust_jpeg_quality (:127-140) -> [-1,1]."""
    import tensorflow as tf
    _ensure_corpus(args.data_root)
    val = _load_split(args.data_root, "val")  # (32, 288, 288, 3) [0,1]
    off = (val.shape[1] - EVAL_CROP) // 2
    hr01 = val[:, off:off + EVAL_CROP, off:off + EVAL_CROP, :]
    for scale, q in {(c["scale"], c["q"]) for c in H2H_CFG.values()}:
        hr = tf.constant(hr01)
        lo = hr
        if scale > 1:
            s = EVAL_CROP // scale
            lo = tf.image.resize(hr, [s, s], method="bicubic")
        lo = tf.map_fn(
            lambda im: tf.image.adjust_jpeg_quality(im, jpeg_quality=q), lo)
        out = os.path.join(args.out_dir, f"pairs_s{scale}_q{q}.npz")
        os.makedirs(args.out_dir, exist_ok=True)
        np.savez(out, lo=(lo.numpy() * 2 - 1).astype(np.float32),
                 hi=(hr01 * 2 - 1).astype(np.float32))
        print(f"wrote {out}: lo{lo.shape} hi{hr01.shape}", flush=True)


# ------------------------------------------------------------ make_init ----

def _init_paths(out_dir: str, family: str) -> dict[str, str]:
    base = os.path.join(out_dir, f"init_{family}")
    return {"gen_h5": base + "_gen.weights.h5",
            "disc_h5": base + "_disc.weights.h5",
            "gen_dgt": base + ".dgt", "disc_dgt": base + "_disc.dgt"}


def make_init(args) -> None:
    """Build ONE set of initial weights both frameworks start from
    (VERDICT r3 #3: identical-init head-to-heads eliminate the GAN init-seed
    spread): fixed-seed Keras gen+disc -> .h5 -> convert_h5 -> .dgt."""
    import tensorflow as tf
    import bench_train_tf_cpu as ref
    from denoise_gan_tpu.io.keras_h5 import convert_keras_model
    from denoise_gan_tpu.io.checkpoint import export_net

    tf.random.set_seed(args.seed)
    fam = args.family
    gen = {"srgan": ref.build_srgan_generator,
           "fsrgan": ref.build_fsrgan_generator,
           "autoencoder": ref.build_autoencoder_generator,
           "pix2pix": ref.build_pix2pix_generator}[fam]()
    if fam == "pix2pix":
        disc = ref.build_pix2pix_discriminator()
    else:
        disc = ref.build_discriminator(sigmoid=(fam == "autoencoder"))
    paths = _init_paths(args.out_dir, fam)
    os.makedirs(args.out_dir, exist_ok=True)
    gen.save_weights(paths["gen_h5"])
    disc.save_weights(paths["disc_h5"])
    cfg = H2H_CFG[fam]
    for model, role, key in ((gen, "generator", "gen_dgt"),
                             (disc, "discriminator", "disc_dgt")):
        params, stats = convert_keras_model(model, fam, role, cfg["scale"])
        export_net(paths[key], fam, cfg["scale"], params, stats, role=role)
    print(f"wrote matched-init weights: {sorted(paths.values())}", flush=True)


# ---------------------------------------------------------------- train ----

def train_tf(args) -> None:
    """Train one TF reference family (exact reference graph + losses) and
    save its generator outputs on the fixed val pairs."""
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    import tensorflow as tf
    from bench_train_tf_cpu import make_step

    cfg = H2H_CFG[args.family]
    crop, bs, scale, q = cfg["crop"], cfg["batch"], cfg["scale"], cfg["q"]
    steps = args.steps or cfg["steps"]
    _ensure_corpus(args.data_root)
    train_imgs = _load_split(args.data_root, "train")  # (240,288,288,3)
    n_img, size = train_imgs.shape[0], train_imgs.shape[1]
    # --tfseed N: TF-side seed variant for the GAN-variance study (the
    # repo-side analog is --rseed) — reseeds BOTH the Keras inits and the
    # data sampling, and suffixes the outputs _sN
    sfx = f"_s{args.tfseed}" if args.tfseed else ""
    if args.tfseed:
        tf.random.set_seed(args.tfseed)
    rng = np.random.default_rng(args.seed + args.tfseed)

    step_fn, _, gen, disc = make_step(args.family, return_models=True)
    if args.matched_init:
        # identical-init h2h (VERDICT r3 #3): both frameworks start from the
        # make_init weights; only data order/GAN dynamics differ
        paths = _init_paths(args.out_dir, args.family)
        gen.load_weights(paths["gen_h5"])
        disc.load_weights(paths["disc_h5"])
        sfx = "_mi" + (sfx if args.tfseed else "")
        print(f"h2h TF {args.family}: matched init from {paths['gen_h5']}",
              flush=True)

    @tf.function
    def degrade_and_step(hr01):
        lo = hr01
        if scale > 1:
            lo = tf.image.resize(hr01, [crop // scale, crop // scale],
                                 method="bicubic")
        lo = tf.map_fn(
            lambda im: tf.image.adjust_jpeg_quality(im, jpeg_quality=q), lo)
        return step_fn(lo * 2 - 1, hr01 * 2 - 1)

    def batch():
        idx = rng.integers(0, n_img, bs)
        ys = rng.integers(0, size - crop + 1, bs)
        xs = rng.integers(0, size - crop + 1, bs)
        return np.stack([train_imgs[i, y:y + crop, x:x + crop]
                         for i, y, x in zip(idx, ys, xs)])

    print(f"h2h TF train {args.family}: crop={crop} bs={bs} scale={scale} "
          f"q={q} steps={steps}", flush=True)
    rates = []
    t_win = time.time()
    for s in range(steps):
        gl, dl = degrade_and_step(tf.constant(batch()))
        if (s + 1) % 100 == 0:
            dt = time.time() - t_win
            rates.append(100 / dt)
            print(f"  step {s+1}/{steps} gl={float(gl):.4f} "
                  f"dl={float(dl):.4f} {100/dt:.3f} steps/s", flush=True)
            t_win = time.time()

    # save generator outputs on the fixed val pairs
    pairs = np.load(os.path.join(args.out_dir, f"pairs_s{scale}_q{q}.npz"))
    outs = []
    for i in range(0, len(pairs["lo"]), 8):
        outs.append(gen(tf.constant(pairs["lo"][i:i + 8]),
                        training=False).numpy())
    out01 = np.clip((np.concatenate(outs) + 1) / 2, 0, 1)
    out = os.path.join(args.out_dir, f"out_tf_{args.family}{sfx}.npz")
    np.savez(out, out01=out01.astype(np.float32))
    med = float(np.median(rates)) if rates else 0.0
    stats = dict(family=args.family, steps=steps, batch=bs, crop=crop,
                 steps_per_s_median=round(med, 4),
                 steps_per_s_min=round(float(np.min(rates)) if rates else 0., 4),
                 steps_per_s_max=round(float(np.max(rates)) if rates else 0., 4),
                 imgs_per_s_median=round(med * bs, 4))
    with open(os.path.join(args.out_dir,
                           f"tfstats_{args.family}{sfx}.json"), "w") as f:
        json.dump(stats, f)
    print("TFSTATS", json.dumps(stats), flush=True)
    print(f"wrote {out}", flush=True)


# ----------------------------------------------------------- train_repo ----

def train_repo(args) -> None:
    """Train the matching repo model (same corpus/budget/shapes).  Run on
    the TPU chip (PYTHONPATH=/root/repo:/root/.axon_site)."""
    from denoise_gan_tpu.train.loop import train
    from denoise_gan_tpu.utils.config import make_config

    cfg = H2H_CFG[args.family]
    steps = args.steps or cfg["steps"]
    spe = 240 // cfg["batch"]
    assert steps % spe == 0, (steps, spe)
    _ensure_corpus(args.data_root)
    c = make_config(args.family,
                    image_dir=os.path.join(args.data_root, "train"))
    c.crop_size = cfg["crop"]
    c.batch_size = cfg["batch"]
    c.scale = cfg["scale"]
    c.jpeg_quality = cfg["q"]
    # the TF-CPU baseline trains f32 (no mixed-precision policy is set in
    # bench_train_tf_cpu.py; Keras fp16 is a GPU path) — match it.  srgan's
    # reference default is fp16=1, which silently made every repo-side
    # srgan h2h run train in bf16 against an f32 TF baseline (the r3/r4
    # srgan deficit's prime suspect — PERF.md round-5 h2h section).
    c.fp16 = 0
    c.epochs = steps // spe
    c.retrain = 0
    c.ckpt = 0
    c.log_images = 0
    c.save_iter = 10 ** 9
    if args.rseed:
        c.seed = args.rseed
    c.model_name = f"h2h_{args.family}" +         (f"_s{args.rseed}" if args.rseed else "")
    if args.matched_init:
        c.model_name += "_mi"
    c.finalize()
    if args.matched_init:
        # stage the make_init weights where train()'s --retrain warm start
        # looks (models/{name}.dgt + _disc.dgt) — identical init to TF
        import shutil
        paths = _init_paths(args.out_dir, args.family)
        os.makedirs("models", exist_ok=True)
        shutil.copy(paths["gen_dgt"], os.path.join(
            "models", f"{c.model_name}.dgt"))
        shutil.copy(paths["disc_dgt"], os.path.join(
            "models", f"{c.model_name}_disc.dgt"))
        c.retrain = 1
        print(f"repo h2h {args.family}: matched init from "
              f"{paths['gen_dgt']}", flush=True)
    t0 = time.time()
    train(c, args.family)
    print(f"repo train {args.family}: {steps} steps in "
          f"{time.time()-t0:.1f}s", flush=True)


def score_repo(args) -> None:
    """Run a repo export on the fixed val pairs, save outputs."""
    from denoise_gan_tpu.infer.image import build_forward
    import jax.numpy as jnp

    cfg = H2H_CFG[args.family]
    suffix = (f"_s{args.rseed}" if args.rseed else "") + \
        ("_mi" if args.matched_init else "")
    model = args.model or os.path.join(
        "models", f"h2h_{args.family}{suffix}.dgt")
    _, _, forward = build_forward(model, fast=False)
    pairs = np.load(os.path.join(
        args.out_dir, f"pairs_s{cfg['scale']}_q{cfg['q']}.npz"))
    outs = []
    for i in range(0, len(pairs["lo"]), 8):
        outs.append(np.asarray(forward(jnp.asarray(pairs["lo"][i:i + 8]))))
    out01 = np.clip((np.concatenate(outs) + 1) / 2, 0, 1)
    out = os.path.join(args.out_dir,
                       f"out_repo_{args.family}{suffix}.npz")
    np.savez(out, out01=out01.astype(np.float32))
    print(f"wrote {out}", flush=True)


# --------------------------------------------------------------- report ----

def report(args) -> None:
    import jax.numpy as jnp
    from denoise_gan_tpu.ops.image import resize_bicubic
    from denoise_gan_tpu.ops.metrics import psnr, ssim

    def score(out01, hi01):
        return (float(np.mean(psnr(jnp.asarray(out01), jnp.asarray(hi01)))),
                float(np.mean(ssim(jnp.asarray(out01), jnp.asarray(hi01)))))

    print("\n| Family | scale/q | steps | repo PSNR/SSIM | TF-ref PSNR/SSIM |"
          " input PSNR/SSIM | repo-TF dPSNR | repo-TF dSSIM |")
    print("|---|---|---|---|---|---|---|---|")
    for fam, cfg in H2H_CFG.items():
        pf = os.path.join(args.out_dir, f"pairs_s{cfg['scale']}_q{cfg['q']}.npz")
        rf = os.path.join(args.out_dir, f"out_repo_{fam}.npz")
        tf_ = os.path.join(args.out_dir, f"out_tf_{fam}.npz")
        if not (os.path.exists(rf) and os.path.exists(tf_)):
            print(f"| {fam} | - | - | (missing outputs) | | | | |")
            continue
        pairs = np.load(pf)
        hi01 = (pairs["hi"] + 1) / 2
        lo01 = (pairs["lo"] + 1) / 2
        if cfg["scale"] > 1:
            h = hi01.shape[1]
            bar01 = np.clip(np.asarray(
                resize_bicubic(jnp.asarray(lo01), h, h)), 0, 1)
        else:
            bar01 = np.clip(lo01, 0, 1)
        pr, sr = score(np.load(rf)["out01"], hi01)
        pt, st = score(np.load(tf_)["out01"], hi01)
        pi, si = score(bar01, hi01)
        print(f"| {fam} | {cfg['scale']}x/q{cfg['q']} | {cfg['steps']} "
              f"| {pr:.2f} / {sr:.4f} | {pt:.2f} / {st:.4f} "
              f"| {pi:.2f} / {si:.4f} "
              f"| **{pr-pt:+.2f}** | **{sr-st:+.4f}** |")
        # seed variants on either side (train_repo --rseed N / train
        # --tfseed N), if present — quantify GAN seed variance vs the gap
        for s in range(2, 10):
            sf = os.path.join(args.out_dir, f"out_repo_{fam}_s{s}.npz")
            if os.path.exists(sf):
                ps, ss_ = score(np.load(sf)["out01"], hi01)
                print(f"| {fam} (seed {s}) | {cfg['scale']}x/q{cfg['q']} "
                      f"| {cfg['steps']} | {ps:.2f} / {ss_:.4f} |  |  "
                      f"| **{ps-pt:+.2f}** | **{ss_-st:+.4f}** |")
            tfv = os.path.join(args.out_dir, f"out_tf_{fam}_s{s}.npz")
            if os.path.exists(tfv):
                pv, sv = score(np.load(tfv)["out01"], hi01)
                print(f"| {fam} (TF seed {s}) | {cfg['scale']}x/q{cfg['q']} "
                      f"| {cfg['steps']} |  | {pv:.2f} / {sv:.4f} |  "
                      f"| vs TF-s1: {pv-pt:+.2f} | {sv-st:+.4f} |")
        # matched-init pair (VERDICT r3 #3): both sides started from the
        # SAME make_init weights — the gap here is framework dynamics only
        rmi = os.path.join(args.out_dir, f"out_repo_{fam}_mi.npz")
        tmi = os.path.join(args.out_dir, f"out_tf_{fam}_mi.npz")
        if os.path.exists(rmi) and os.path.exists(tmi):
            pr2, sr2 = score(np.load(rmi)["out01"], hi01)
            pt2, st2 = score(np.load(tmi)["out01"], hi01)
            print(f"| {fam} (matched init) | {cfg['scale']}x/q{cfg['q']} "
                  f"| {cfg['steps']} | {pr2:.2f} / {sr2:.4f} "
                  f"| {pt2:.2f} / {st2:.4f} |  "
                  f"| **{pr2-pt2:+.2f}** | **{sr2-st2:+.4f}** |")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("cmd", choices=["pairs", "make_init", "train",
                                   "train_repo", "score_repo", "report"])
    p.add_argument("--matched_init", type=int, default=0,
                   help="1 = start from the make_init weights (identical "
                        "init on both sides, VERDICT r3 #3); suffixes "
                        "outputs _mi")
    p.add_argument("--family", default="")
    p.add_argument("--data_root", default="/tmp/h2h_r3/qdata")
    p.add_argument("--out_dir", default="/tmp/h2h_r3")
    p.add_argument("--model", default="")
    p.add_argument("--steps", type=int, default=0)
    p.add_argument("--seed", type=int, default=11)
    p.add_argument("--rseed", type=int, default=0,
                   help="repo-side training seed variant (0 = cfg default); "
                        "suffixes the model/output names for seed studies")
    p.add_argument("--tfseed", type=int, default=0,
                   help="TF-side seed variant (0 = default seeds); reseeds "
                        "Keras inits + data sampling and suffixes outputs "
                        "_N for the GAN-variance study")
    p.add_argument("--platform", default="",
                   help="force a JAX platform for the repo-side commands "
                        "(e.g. 'cpu' when the axon chip is down; env alone "
                        "cannot override the plugin — CLAUDE.md)")
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    dict(pairs=make_pairs, make_init=make_init, train=train_tf,
         train_repo=train_repo, score_repo=score_repo,
         report=report)[args.cmd](args)


if __name__ == "__main__":
    main()
