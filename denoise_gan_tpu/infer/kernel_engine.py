"""Frame engine built around the fused Pallas tail kernel (ops/pallas/tail).

Geometry is fixed by the kernel: tile T=124 (so T + conv halo = exactly 128
lanes), stride 120, crop-stitch margins 2.  1080p tiles exactly: 9 x 16.
Pipeline per frame (one jitted program):

  pad(edge, +2 pre-roll) -> extract_grid -> FSRGAN body (XLA, bf16)
  -> fused tail kernel (up1+up2+final conv+tanh+crop-stitch, VMEM-resident)
  -> uint8 flat (H*4, W*4*3) output (byte-identical to HWC)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from denoise_gan_tpu.infer.engine import extract_grid
from denoise_gan_tpu.ops.pallas.tail import CORE, T, build_fused_tail


def build_kernel_engine(body_apply, tail_params, height: int, width: int,
                        brc: int = 8, prep: str = "transpose",
                        out_uint8: bool = True, flat_channels: bool = True,
                        interpret: bool = False):
    """body_apply: (N, T, T, 3) [-1,1] -> (N, T, T, 32) bf16 body features.
    Returns fn(frame01 (H, W, 3)) -> (H*4, W*4*3) uint8 (flat layout) or
    (H*4s.., W.., 48->via caller) when flat disabled."""
    stride = CORE
    m0 = (T - stride) // 2          # crop-stitch pre-pad
    ny = -(-height // stride)
    nx = -(-width // stride)
    pad_h = (ny - 1) * stride + T
    pad_w = (nx - 1) * stride + T
    scale = 4

    fused_tail = build_fused_tail(tail_params, ny, nx, brc=brc, prep=prep,
                                  interpret=interpret)

    @jax.jit
    def run(frame01):
        x = frame01 * 2.0 - 1.0
        x = jnp.pad(x, ((m0, pad_h - height - m0),
                        (m0, pad_w - width - m0), (0, 0)), mode="edge")
        tiles = extract_grid(x, ny, nx, T, stride)
        h = body_apply(tiles)
        canvas = fused_tail(h)                    # (ny*120, nx*120, 48)
        out01 = jnp.clip((canvas.astype(jnp.float32) + 1.0) / 2.0, 0.0, 1.0)
        if out_uint8:
            out01 = (out01 * 255.0 + 0.5).astype(jnp.uint8)
            if flat_channels:
                hc, wc = out01.shape[:2]
                cs = 3 * scale
                flat = out01.reshape(hc, wc, scale, cs)
                flat = flat.transpose(0, 2, 1, 3).reshape(hc * scale, wc * cs)
                return flat[:height * scale, :width * scale * 3]
        from denoise_gan_tpu.ops.image import depth_to_space
        fine = depth_to_space(out01[None], scale)[0]
        return fine[:height * scale, :width * scale]

    return run


def build_fsrgan_kernel_engine(params, batch_stats, height: int, width: int,
                               brc: int = 8, prep: str = "transpose",
                               interpret: bool = False, **kw):
    """Convenience: wire the FSRGAN body (XLA, bf16) to the fused tail."""
    from denoise_gan_tpu.models.fsrgan import FSRGANBody

    body = FSRGANBody(dtype=jnp.bfloat16)
    body_p = params["body"]
    body_s = (batch_stats or {}).get("body", {})

    def body_apply(tiles):
        return body.apply({"params": body_p, "batch_stats": body_s},
                          tiles, train=False)

    return build_kernel_engine(body_apply, params["tail"], height, width,
                               brc=brc, prep=prep, interpret=interpret, **kw)
