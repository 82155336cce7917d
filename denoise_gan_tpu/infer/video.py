"""Streaming video denoising CLI — the inference north-star path.

Rebuild of /root/reference/infer_video.py.  The reference round-trips every
frame host<->device at batch size 1 with a synchronous .numpy() and its
VideoWriter is commented out (SURVEY.md §3.4).  Here:

* frames are decomposed into overlapping 256-tiles and the generator runs
  **batched over tiles** (MXU-friendly static shapes), stitched on device
  with feather blending (infer/tile.py) — or `--tile 0` reproduces the
  reference's whole-padded-frame mode (/root/reference/infer_video.py:79-86);
* a reader thread prefetches/decodes ahead of the device (async dispatch
  keeps the TPU busy while OpenCV decodes);
* on-device PSNR/SSIM scoring per frame (vs a clean reference video when
  given, else vs the bicubic-upscaled input) — BASELINE.md metrics;
* the output video is actually written (mp4), plus frames/sec instrumentation.

Flags `--input_video --output_video --model` match the reference
(/root/reference/infer_video.py:196-199); `--frame_start` generalizes the
reference's hardcoded 1600 (:114).
"""

from __future__ import annotations

import os
import queue
import threading
import time
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np

from denoise_gan_tpu.infer.image import build_forward
from denoise_gan_tpu.infer.tile import tiled_apply
from denoise_gan_tpu.ops.image import resize_bicubic, resize_with_crop_or_pad
from denoise_gan_tpu.ops.metrics import psnr, ssim
from denoise_gan_tpu.utils.config import get_path


def decode_fourcc(fourcc) -> str:
    """(/root/reference/infer_video.py:21-32)"""
    fourcc_int = int(fourcc)
    return "".join(chr(fourcc_int >> 8 * i & 0xFF) for i in range(4))


def get_video_info(video_path: str):
    """(/root/reference/infer_video.py:34-45)"""
    import cv2
    video = cv2.VideoCapture(get_path(video_path))
    num_frames = int(video.get(cv2.CAP_PROP_FRAME_COUNT))
    frame_width = int(video.get(cv2.CAP_PROP_FRAME_WIDTH))
    frame_height = int(video.get(cv2.CAP_PROP_FRAME_HEIGHT))
    fps = video.get(cv2.CAP_PROP_FPS)
    fourcc = int(video.get(cv2.CAP_PROP_FOURCC))
    video.release()
    print(f"frames: {num_frames}, fps: {fps}, width: {frame_width}, "
          f"height: {frame_height}, fourcc: {decode_fourcc(fourcc)}/{fourcc}")
    return num_frames, fps, frame_width, frame_height, fourcc


def _peek_calib_frames(input_path: str, frame_start: int, n: int = 4):
    """Decode up to `n` frames spread across the clip (BGR->RGB [0,1]) for
    w8a8 calibration, without disturbing the streaming reader.  Sampling
    several scenes (not just the first frame) keeps the static int8
    activation scales valid through scene changes (ADVICE r3); the
    calibration also carries a headroom margin (ops/pallas/tail.Q8_MARGIN)."""
    import cv2
    cap = cv2.VideoCapture(input_path)
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    frames = []
    if total > 0:
        span = max(total - frame_start, 1)
        positions = sorted({frame_start + (span * k) // n for k in range(n)})
        for pos in positions:
            if pos:
                cap.set(cv2.CAP_PROP_POS_FRAMES, pos)
            ok, frame = cap.read()
            if ok:
                frames.append(frame[..., ::-1].astype(np.float32) / 255.0)
    else:
        # CAP_PROP_FRAME_COUNT is 0/garbage for some containers/streams
        # (ADVICE r4 #4): read sequentially, keeping every `stride`-th frame
        # up to a bounded scan, so calibration still spans several scenes
        stride, scan_cap = 24, 24 * n * 4
        for i in range(frame_start + scan_cap):
            ok, frame = cap.read()
            if not ok:
                break
            if i >= frame_start and (i - frame_start) % stride == 0:
                frames.append(frame[..., ::-1].astype(np.float32) / 255.0)
                if len(frames) >= n:
                    break
        if frames:
            print(f"note: container reports no frame count; q8 calibration "
                  f"sampled {len(frames)} frame(s) sequentially", flush=True)
    cap.release()
    return frames or None


def _reader(cap, q: queue.Queue, max_frames: int, raw_bgr: bool = False):
    import cv2
    count = 0
    while max_frames <= 0 or count < max_frames:
        ret, frame = cap.read()
        if not ret:
            break
        if raw_bgr:
            # u8/BGR-input engine (VERDICT r3 #4b): ship the decoder's frame
            # VERBATIM — no host flip, no f32 conversion, 4x fewer H2D bytes
            q.put(frame)
        else:
            q.put(frame[..., ::-1].astype(np.float32) / 255.0)  # ->RGB [0,1]
        count += 1
    q.put(None)


# Measured-optimal XLA crop-engine (tile, overlap) per family at 1080p
# (tools/sweep_tile_defaults.py; autoencoder 51.2 fps at 128/8 vs 32.9 at
# the old 256/32).  pix2pix's U-Net needs tile % 256 == 0.  The 4x rows
# apply only to the XLA fallback (the fused kernel engine has fixed
# geometry); 144/4 is the round-1 sweep optimum (PERF.md).
TILE_DEFAULTS = {
    "autoencoder": (128, 8),
    "pix2pix": (256, 8),
    "fsrgan": (144, 4),
    "srgan": (144, 4),
}


def resolve_tile_defaults(args, family: str) -> None:
    """--tile/--tile_overlap default to -1 = auto: pick the measured-optimal
    geometry for the model's family.  Explicit values (incl. --tile 0 =
    whole-frame) are honored as given."""
    t, ov = TILE_DEFAULTS.get(family, (256, 32))
    if args.tile < 0:
        args.tile = t
    if args.tile_overlap < 0:
        args.tile_overlap = ov


def process_video(args) -> dict:
    import cv2
    input_path = get_path(args.input_video)
    num_frames, fps, fw, fh, _ = get_video_info(input_path)
    config, bundle, forward = build_forward(get_path(args.model), fast=bool(args.fast))
    scale = config["scale"] if bundle.upscales else 1
    resolve_tile_defaults(args, config.get("family", ""))

    # fastest path: the whole-frame engine (coarse-tail forward + phase-space
    # overlap-add stitch in ONE compiled program per frame, infer/engine.py)
    engine = None
    engine_flat = False
    engine_kernel = False
    engine_bgr = False
    engine_u8_in = False
    engine_name = "whole-frame" if not args.tile else "plain-tiled"
    # Scoring cadence: the fused-kernel path scores from its u8 output via a
    # device-side relayout (~20-40 ms per scored frame), so by default it
    # scores every 8th frame to stay within ~10% of the unscored fps
    # (VERDICT r2 #4); other engines score every frame.
    score_every = args.score_every
    # --tile 0 --fast 1 selects the whole-frame engine: exact inference (no
    # tile-seam approximation; measured ~1.4% of pixels differ by >1 u8 level
    # vs tiled 144/4) at ~0.75x the tiled throughput (PERF.md r2).
    if args.fast and args.tile > 0 and not bundle.upscales:
        # 1x denoise families (autoencoder/pix2pix): crop-stitched frame
        # engine with the plain generator per tile — one compiled program
        # per frame (37-148 fps/chip at 1080p, PERF.md r2)
        from denoise_gan_tpu.infer.engine import build_frame_engine
        flat = not args.score
        # emit BGR on device when writing unscored video (the writer wants
        # BGR; saves the per-frame strided host flip)
        engine_bgr = flat and bool(args.output_video)
        engine = build_frame_engine(
            lambda tiles: forward(tiles), fh, fw, 1,
            args.tile, args.tile_overlap, out_uint8=flat,
            flat_channels=flat, stitch=args.stitch,
            acc_dtype=jnp.bfloat16 if args.engine_bf16 else jnp.float32,
            bgr=engine_bgr)
        engine_flat = flat
        engine_name = (f"xla-crop ({args.tile}/{args.tile_overlap})"
                       + (", bgr out" if engine_bgr else ""))
        if args.kernel_tail == 1:
            print("note: --kernel_tail 1 ignored — the fused kernel engine "
                  f"exists only for fsrgan/srgan 4x (family="
                  f"{config.get('family')}, scale=1); using the XLA crop "
                  "engine", flush=True)
    if args.fast and bundle.upscales:
        from denoise_gan_tpu.infer.engine import build_frame_engine
        from denoise_gan_tpu.infer.fast import build_fast_coarse
        from denoise_gan_tpu.io.checkpoint import load_generator
        _, params, batch_stats = load_generator(get_path(args.model))
        # uint8 + flat channel layout: byte-identical to HWC, ~23ms/frame
        # cheaper (PERF.md); reshaped to HWC on host for free.  The fused
        # kernel engine always emits flat u8; --score works with it via
        # subsampled device-side scoring from that output (score_every).
        flat = True
        # fastest path: the fused Pallas tail kernel engine (body on a
        # <=128-tile grid + tail/stitch/u8 in one VMEM kernel) — fsrgan and
        # srgan 4x; ~1.2x the XLA crop engine (PERF.md r2)
        use_kernel = (args.kernel_tail != 0 if args.kernel_tail >= 0
                      else jax.default_backend() != "cpu")
        kernel_ok = args.tile > 0 and scale == 4 and \
            config.get("family") in ("fsrgan", "srgan")
        if use_kernel and kernel_ok:
            from denoise_gan_tpu.infer import kernel_engine
            build = (kernel_engine.build_fsrgan_kernel_engine
                     if config.get("family") == "fsrgan"
                     else kernel_engine.build_srgan_kernel_engine)
            bkw = {}
            # when writing an mp4, have the kernel emit BGR bytes directly
            # (free Seo column permutation in the u8 epilogue) — cv2 wants
            # BGR, and the host-side [..., ::-1] flip costs a 95 MB strided
            # copy per 4K frame otherwise
            engine_bgr = bool(args.output_video)
            bkw["bgr"] = engine_bgr
            # u8/BGR INPUT (VERDICT r3 #4b): when not scoring, the engine
            # takes the decoder's BGR uint8 frame verbatim (stem conv input
            # channels flipped in the weights, normalize on device) — zero
            # per-frame host work on input, 4x fewer H2D bytes, and the
            # pad/extract stage moves u8 instead of bf16.  Scoring keeps the
            # f32 RGB path (the reference streams for PSNR/SSIM are RGB).
            engine_u8_in = not args.score
            if engine_u8_in:
                bkw["u8_input"] = True
                bkw["bgr_input"] = True
            if args.q8 != 0:
                # w8a8 tail (int8 up2/final dots) calibrated on frames
                # spread across the clip — the DEFAULT (--q8 -1 = auto-on):
                # measured vs the exact whole-frame output it adds ~zero
                # deviation beyond the bf16 kernel's accepted envelope
                # (fsrgan frac>1 1.440% -> 1.456%, srgan 0% -> 0%;
                # tools/exp_q8_exact.py) and is 1.06-1.16x faster (PERF.md
                # r3).  --q8 0 forces the bf16 tail.
                calib = _peek_calib_frames(input_path, args.frame_start)
                if calib is not None:
                    bkw["q8_calib_frame"] = [jnp.asarray(f) for f in calib]
                    # --q8 2: qh8 — additionally int8-quantize the h3 tile
                    # DMA (the tail's largest input) and run up1 w8a8
                    # (ops/pallas/tail.py; max 2 u8 levels vs exact in
                    # interpret-mode acceptance tests)
                    bkw["qh8"] = args.q8 == 2
                elif args.q8 in (1, 2):
                    print(f"note: --q8 {args.q8} ignored — could not decode "
                          "a calibration frame; using the bf16 tail",
                          flush=True)
            engine = build(params, batch_stats, fh, fw, **bkw)
            engine_flat = True
            engine_kernel = True
            engine_name = (f"fused-kernel ({config.get('family')} 4x"
                           + ((", w8a8+h8 tail" if bkw.get("qh8")
                               else ", w8a8 tail")
                              if "q8_calib_frame" in bkw else "")
                           + (", u8/bgr in" if engine_u8_in else "")
                           + (", bgr out" if engine_bgr else "")
                           + "; fixed 124/120 tile geometry — --tile/"
                             "--tile_overlap/--stitch not used)")
        else:
            if args.kernel_tail == 1 and not kernel_ok:
                print("note: --kernel_tail 1 ignored — the fused kernel "
                      "engine needs --tile > 0, scale 4 and family fsrgan/"
                      f"srgan (got tile={args.tile}, scale={scale}, family="
                      f"{config.get('family')}); using the XLA engine",
                      flush=True)
            flat = not args.score
            try:
                # bf16 tail output + stitch accumulation halves the engine's
                # memory traffic (<=1 u8 level difference on ~1% of pixels,
                # PERF.md); the reference's srgan default is fp16=1 anyway
                eng_dt = jnp.bfloat16 if args.engine_bf16 else jnp.float32
                fwd_coarse, scale = build_fast_coarse(config, params,
                                                      batch_stats,
                                                      out_dtype=eng_dt)
                engine = build_frame_engine(fwd_coarse, fh, fw, scale,
                                            args.tile, args.tile_overlap,
                                            out_uint8=flat,
                                            flat_channels=flat,
                                            stitch=args.stitch,
                                            acc_dtype=eng_dt)
                engine_flat = flat
                engine_name = (f"xla-{args.stitch} coarse "
                               f"({args.tile}/{args.tile_overlap})")
            except ValueError:
                engine = None
                engine_name = "whole-frame" if not args.tile \
                    else "plain-tiled"
    if score_every <= 0:
        score_every = 8 if (engine_kernel and args.score) else 1
    print(f"engine: {engine_name}"
          + (f"; scoring every {score_every}th frame on device"
             if args.score else "; scoring off"), flush=True)

    cap = cv2.VideoCapture(input_path)
    if args.frame_start:
        cap.set(cv2.CAP_PROP_POS_FRAMES, args.frame_start)

    writer = None
    writer_q: "queue.Queue | None" = None
    writer_thread = None
    writer_err: list = []
    if args.output_video:
        out_path = get_path(args.output_video)
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        writer = cv2.VideoWriter(out_path,
                                 cv2.VideoWriter_fourcc(*"mp4v"),
                                 fps or 25.0, (fw * scale, fh * scale))
        # Async writer: the software mp4 encode of a scale*frame is the
        # slowest HOST stage (seconds/frame for 4K on one core) — run it in
        # its own thread behind a bounded queue so encode overlaps device
        # compute and the D2H fetch instead of serializing after them.
        writer_q = queue.Queue(maxsize=4)

        def _writer_worker():
            while True:
                item = writer_q.get()
                if item is None:
                    break
                arr, is_bgr = item
                if not writer_err:
                    try:
                        writer.write(arr if is_bgr else arr[..., ::-1])
                    except Exception as e:  # noqa: BLE001
                        writer_err.append(e)   # keep draining; raise at end

        writer_thread = threading.Thread(target=_writer_worker, daemon=True)
        writer_thread.start()

    clean_cap = None
    if args.clean_video:
        clean_cap = cv2.VideoCapture(get_path(args.clean_video))
        if args.frame_start:
            clean_cap.set(cv2.CAP_PROP_POS_FRAMES, args.frame_start)

    # jitted whole-frame path (reference mode): pad to multiple of 256
    pad_h = (fh + 255) // 256 * 256
    pad_w = (fw + 255) // 256 * 256

    @jax.jit
    def whole_frame(x01):
        xin = resize_with_crop_or_pad(x01, pad_h, pad_w) * 2.0 - 1.0
        out = forward(xin[None])[0]
        out01 = jnp.clip((out + 1.0) / 2.0, 0.0, 1.0)
        return resize_with_crop_or_pad(out01, fh * scale, fw * scale)

    @jax.jit
    def score(out01, ref01):
        a, b = out01[None], ref01[None]
        return psnr(a, b)[0], ssim(a, b)[0]

    @jax.jit
    def upscale_ref(x01):
        if scale == 1:
            return x01
        return jnp.clip(resize_bicubic(x01[None], fh * scale,
                                       fw * scale)[0], 0.0, 1.0)

    # Scoring directly from the kernel engine's 5D u8 output: device-side
    # relayout to HWC f32 + PSNR/SSIM vs the (bicubic-upscaled input or
    # clean-video) reference.  Run every `score_every` frames only — the
    # relayout + 4K SSIM cost ~20-40 ms/scored frame (VERDICT r2 #4).
    @jax.jit
    def score_5d(out5, ref01):
        from denoise_gan_tpu.infer.kernel_engine import flat_to_hwc
        out01 = flat_to_hwc(out5, fh, fw, scale)
        if engine_bgr:
            # kernel emits BGR for the writer; PSNR/SSIM are invariant
            # under a consistent channel permutation, so flip the ref
            ref01 = ref01[..., ::-1]
        a, b = out01[None], ref01[None]
        return psnr(a, b)[0], ssim(a, b)[0]

    q: queue.Queue = queue.Queue(maxsize=8)
    threading.Thread(target=_reader,
                     args=(cap, q, args.max_frames, engine_u8_in),
                     daemon=True).start()

    def forward_m11(tiles_m11):
        return forward(tiles_m11)

    frames = 0
    submitted = 0
    scored = 0
    psnr_sum = ssim_sum = 0.0
    t0 = time.time()

    # Pipelined flat path: keep `args.pipeline` frames in flight so the
    # device never idles while the host materializes/encodes the previous
    # frame (np.asarray is the per-frame sync point).
    import collections
    inflight = collections.deque()

    def _drain_one():
        nonlocal frames
        out = inflight.popleft()
        if out.ndim == 5:
            # kernel engine: 5D u8 whose C-order bytes are the flat
            # HWC stream — zero-copy host flatten + crop
            from denoise_gan_tpu.infer.kernel_engine import flat_view
            arr = flat_view(out, fh, fw, scale)
            arr = arr.reshape(fh * scale, fw * scale, 3)
        else:
            arr = np.asarray(out).reshape(fh * scale, fw * scale, 3)
        if writer_q is not None:
            writer_q.put((arr, engine_bgr))
        frames += 1
        if args.verbose:
            print(f"frame {frames}", flush=True)

    while True:
        frame01 = q.get()
        if frame01 is None:
            break
        x = jnp.asarray(frame01)
        # keep the clean-reference stream in frame sync regardless of the
        # scoring cadence
        clean_ref = None
        if args.score and clean_cap is not None:
            ok, clean = clean_cap.read()
            if ok:
                clean_ref = jnp.asarray(
                    clean[..., ::-1].astype(np.float32) / 255.0)
        if engine is not None:
            out = engine(x)
            if engine_flat:
                if args.score and engine_kernel \
                        and submitted % score_every == 0:
                    ref = clean_ref if clean_ref is not None \
                        else upscale_ref(x)
                    p, s = score_5d(out, ref)
                    psnr_sum += float(p)
                    ssim_sum += float(s)
                    scored += 1
                submitted += 1
                inflight.append(out)
                if len(inflight) > max(args.pipeline, 0):
                    _drain_one()
                continue
            out01 = out
        elif args.tile:
            out01 = tiled_apply(lambda t: forward_m11(t),
                                x * 2.0 - 1.0, args.tile, args.tile_overlap,
                                scale, batch=args.tile_batch)
            out01 = jnp.clip((out01 + 1.0) / 2.0, 0.0, 1.0)
        else:
            out01 = whole_frame(x)

        if args.score and submitted % score_every == 0:
            ref = clean_ref if clean_ref is not None else upscale_ref(x)
            p, s = score(out01, ref)
            psnr_sum += float(p)
            ssim_sum += float(s)
            scored += 1
        submitted += 1

        if writer_q is not None:
            # round (+0.5) like the engine's uint8 path, not truncate —
            # keeps both output modes byte-consistent (ADVICE.md r1)
            arr = np.asarray((out01 * 255.0 + 0.5).astype(jnp.uint8))
            writer_q.put((arr, False))
        frames += 1
        if args.verbose:
            print(f"frame {frames}", flush=True)

    while inflight:
        _drain_one()
    jax.effects_barrier()
    if writer_q is not None:
        writer_q.put(None)
        writer_thread.join()
    elapsed = time.time() - t0
    if writer is not None:
        writer.release()
        if writer_err:
            raise writer_err[0]
    cap.release()

    result = {
        "frames": frames,
        "seconds": elapsed,
        "fps": frames / max(elapsed, 1e-9),
        "scored_frames": scored,
        "psnr": psnr_sum / scored if args.score and scored else None,
        "ssim": ssim_sum / scored if args.score and scored else None,
    }
    print(f"processed {frames} frames in {elapsed:.2f}s "
          f"({result['fps']:.2f} fps/chip)"
          + (f", psnr={result['psnr']:.2f}, ssim={result['ssim']:.4f} "
             f"({scored} frames scored)"
             if args.score and scored else ""))
    return result


def build_parser() -> ArgumentParser:
    parser = ArgumentParser(description="denoise_gan_tpu video inference")
    parser.add_argument("--input_video", default="./video_in/in.mp4", type=str,
                        help="Path to input video")
    parser.add_argument("--output_video", default="./video_out/out.mp4",
                        type=str, help="Path to output high res video.")
    parser.add_argument("--model", default="./models/fsrgan.dgt", type=str,
                        help="Path to a model artifact: .dgt export or a "
                             "reference Keras .h5 (converted on load)")
    parser.add_argument("--frame_start", default=0, type=int)
    parser.add_argument("--max_frames", default=0, type=int)
    parser.add_argument("--tile", default=-1, type=int,
                        help="XLA crop-engine tile size; -1 = auto (measured "
                             "per-family optimum, e.g. 128 for autoencoder); "
                             "0 = whole-frame mode (reference behavior)")
    parser.add_argument("--tile_overlap", default=-1, type=int,
                        help="-1 = auto (per-family measured optimum)")
    parser.add_argument("--stitch", default="crop",
                        choices=["crop", "feather"],
                        help="tile stitching: hard-cut center crop (faster, "
                             "equal quality vs the exact whole-frame output "
                             "— PERF.md r2) or feathered overlap-add")
    parser.add_argument("--tile_batch", default=0, type=int)
    parser.add_argument("--score", default=1, type=int,
                        help="compute on-device PSNR/SSIM (vs the bicubic-"
                             "upscaled input, or --clean_video).  With the "
                             "fused kernel engine, scores from its uint8 "
                             "output every --score_every frames; metrics "
                             "therefore reflect the engine's u8/bf16 "
                             "quantization (<=1 u8 level, PERF.md)")
    parser.add_argument("--score_every", default=0, type=int,
                        help="score every Nth frame; 0 = auto (8 on the "
                             "fused kernel engine to stay within ~10%% of "
                             "unscored fps, else every frame)")
    parser.add_argument("--clean_video", default="", type=str,
                        help="optional ground-truth video for scoring")
    parser.add_argument("--fast", default=1, type=int,
                        help="coarse-space bf16 inference rewrite (infer/fast.py)")
    parser.add_argument("--pipeline", default=2, type=int,
                        help="frames kept in flight on the device in the "
                             "flat engine path (0 = sync every frame)")
    parser.add_argument("--engine_bf16", default=1, type=int,
                        help="bf16 tail/stitch in the frame engine "
                             "(<=1 u8 level difference; 0 = f32)")
    parser.add_argument("--kernel_tail", default=-1, type=int,
                        help="fused Pallas tail kernel engine (fsrgan/srgan "
                             "4x): 1=force, 0=off, -1=auto (on except CPU). "
                             "Uses a fixed 124/120 tile geometry; "
                             "--tile/--tile_overlap/--stitch are not used "
                             "by this engine (a notice is printed if 1 "
                             "cannot be honored)")
    parser.add_argument("--q8", default=-1, type=int,
                        help="w8a8 tail in the fused kernel engine (fsrgan/"
                             "srgan 4x): int8 up2/final matmuls with STATIC "
                             "activation scales calibrated on 4 frames "
                             "spread across the clip (+25%% headroom); <=1 "
                             "u8 level vs the bf16 kernel and ~zero added "
                             "deviation vs the exact whole-frame output "
                             "(PERF.md r3). Caveat: a scene whose "
                             "activations exceed the calibrated range by "
                             ">25%% saturates the int8 clip — use --q8 0 "
                             "(bf16 tail) for clips with extreme dynamic-"
                             "range jumps. -1 = auto (on when the kernel "
                             "engine is used), 0 = force bf16 tail, 1 = "
                             "require w8a8, 2 = qh8 (w8a8 + int8 h3 DMA + "
                             "w8a8 up1)")
    parser.add_argument("--verbose", default=0, type=int)
    return parser


def main(argv=None):
    process_video(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
