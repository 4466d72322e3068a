"""Motion ops for the legacy DCVC family, NHWC layout.

flow_warp matches torch grid_sample(mode=bilinear, padding_mode=border,
align_corners=True) driven by a pixel-displacement flow (reference
torch_warp, DCVC-family/DCVC/src/models/video_net.py:93-135).  block_mc
is the same sampling (the DCVC-FM CUDA kernel's semantics,
DCVC-FM/src/models/block_mc.py:29-58).

On TPU the gather-based bilinear sample lowers to vectorized dynamic
gathers; flows are smooth so locality is good.
"""

import jax
import jax.numpy as jnp


def flow_warp(im, flow):
    """Backward-warp im by flow.

    im:   (B, H, W, C)
    flow: (B, H, W, 2) pixel displacements (dx, dy) — same channel order
          as the reference (flow[...,0]=horizontal, flow[...,1]=vertical).
    Border padding, bilinear, align_corners=True semantics.
    """
    b, h, w, c = im.shape
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    src_x = xs + flow[..., 0].astype(jnp.float32)
    src_y = ys + flow[..., 1].astype(jnp.float32)

    # border clamp
    src_x = jnp.clip(src_x, 0.0, w - 1.0)
    src_y = jnp.clip(src_y, 0.0, h - 1.0)

    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    fx = (src_x - x0)[..., None]
    fy = (src_y - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)

    def gather(yy, xx):
        flat = im.reshape(b, h * w, c)
        idx = yy * w + xx                      # (B, H, W)
        return jnp.take_along_axis(flat, idx.reshape(b, -1, 1),
                                   axis=1).reshape(b, h, w, c)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    out = top * (1 - fy) + bot * fy
    return out.astype(im.dtype)


def block_mc(feature, flow):
    """Motion compensation (same sampling semantics as flow_warp; the
    reference ships a CUDA kernel with a grid_sample fallback)."""
    return flow_warp(feature, flow)


def avg_pool_2x(x):
    """2x2 average pool, stride 2 (F.avg_pool2d equivalent), NHWC."""
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def bilinear_upsample_2x(x):
    """2x bilinear upsample with align_corners=False semantics
    (reference bilinearupsacling, video_net.py:151-156).  NHWC."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="linear")
