"""On-device, stateless image augmentation (jax.random).

The reference augments on the CPU with PIL/torchvision per item every epoch
(reference ``dataset.py:201-206``: ColorJitter(0.5, 0.5, 0.5) +
RandomHorizontalFlip + RandomRotation(±180°) + ToTensor). Here the same
distribution of transforms runs *on the TPU*, fused into the train step, over
uint8 patch batches already resident in HBM — this removes the host-side
bottleneck entirely.

Conventions match torchvision:
  * jitter factors ~ U(0.5, 1.5) for brightness/contrast/saturation, applied
    in a uniformly random order (hue jitter is 0 in the reference);
  * grayscale uses ITU-R 601-2 luma (0.299, 0.587, 0.114);
  * rotation angle ~ U(-180, 180), nearest-neighbor resample, zero fill
    (torchvision RandomRotation defaults);
  * outputs are float in [0, 1] (ToTensor), NHWC.

The Visium eval-time quirk (reference ``dataset.py:316-325``: random
h/v-flips + 90° rotations even at inference) is `tenx_augment`.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_LUMA = jnp.array([0.299, 0.587, 0.114], dtype=jnp.float32)


def _blend(img1: jax.Array, img2: jax.Array, ratio: jax.Array) -> jax.Array:
    return jnp.clip(ratio * img1 + (1.0 - ratio) * img2, 0.0, 1.0)


def _brightness(img: jax.Array, f: jax.Array) -> jax.Array:
    return _blend(img, jnp.zeros_like(img), f)


def _contrast(img: jax.Array, f: jax.Array) -> jax.Array:
    gray_mean = jnp.mean(img @ _LUMA)
    return _blend(img, gray_mean, f)


def _saturation(img: jax.Array, f: jax.Array) -> jax.Array:
    gray = (img @ _LUMA)[..., None]
    return _blend(img, gray, f)


def color_jitter(key: jax.Array, img: jax.Array) -> jax.Array:
    """torchvision ColorJitter(0.5, 0.5, 0.5) on one (H, W, 3) float image."""
    k_perm, k_b, k_c, k_s = jax.random.split(key, 4)
    fb = jax.random.uniform(k_b, (), minval=0.5, maxval=1.5)
    fc = jax.random.uniform(k_c, (), minval=0.5, maxval=1.5)
    fs = jax.random.uniform(k_s, (), minval=0.5, maxval=1.5)

    ops = (
        lambda im: _brightness(im, fb),
        lambda im: _contrast(im, fc),
        lambda im: _saturation(im, fs),
    )
    perms = (
        (0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0),
    )
    perm_idx = jax.random.randint(k_perm, (), 0, len(perms))

    def apply_perm(p):
        def fn(im):
            for j in p:
                im = ops[j](im)
            return im
        return fn

    return jax.lax.switch(perm_idx, [apply_perm(p) for p in perms], img)


def rotate_image(
    img: jax.Array, angle_deg: jax.Array, order: int = 0
) -> jax.Array:
    """Rotate (H, W, C) about its center; zero fill outside.

    order=0 nearest (torchvision RandomRotation default), order=1 bilinear.
    """
    h, w = img.shape[0], img.shape[1]
    # Positive angle rotates counter-clockwise (PIL/torchvision convention);
    # the grid below is the corresponding inverse map.
    theta = angle_deg * (jnp.pi / 180.0)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx
    src_x = cos * xx - sin * yy + cx
    src_y = sin * xx + cos * yy + cy

    def sample(sy, sx):
        valid = (sy >= 0) & (sy <= h - 1) & (sx >= 0) & (sx <= w - 1)
        syc = jnp.clip(sy, 0, h - 1).astype(jnp.int32)
        sxc = jnp.clip(sx, 0, w - 1).astype(jnp.int32)
        vals = img[syc, sxc]
        return jnp.where(valid[..., None], vals, 0.0)

    if order == 0:
        return sample(jnp.round(src_y), jnp.round(src_x))
    y0, x0 = jnp.floor(src_y), jnp.floor(src_x)
    dy, dx = (src_y - y0)[..., None], (src_x - x0)[..., None]
    v00 = sample(y0, x0)
    v01 = sample(y0, x0 + 1)
    v10 = sample(y0 + 1, x0)
    v11 = sample(y0 + 1, x0 + 1)
    top = v00 * (1 - dx) + v01 * dx
    bot = v10 * (1 - dx) + v11 * dx
    return top * (1 - dy) + bot * dy


def rotate_image_shear(img: jax.Array, angle_deg: jax.Array) -> jax.Array:
    """Nearest-neighbor rotation as rot90 prepass + three integer shears.

    The direct formulation (`rotate_image`) is a per-pixel 2-D gather —
    ~65 ms for a 128x224x224x3 batch on a v5e chip, dominating the train
    step. Each shear here shifts whole rows by a per-row integer amount,
    i.e. a contiguous `dynamic_slice` per row, which the TPU executes as
    plain vector loads: the same batch rotates in ~0.3 ms (200x).

    Decomposition: angle = 90k + phi with phi in [-45, 45]; rot90^k is
    lane/sublane reversal+transpose; then shear_x(-tan(phi/2)),
    shear_y(sin phi), shear_x(-tan(phi/2)) on a zero-padded canvas.
    Pixel-identical to `rotate_image` at multiples of 90 deg and a valid
    nearest-resampled rotation elsewhere (row-quantization differs on
    ~20-30% of pixels — immaterial for augmentation). Square images only.
    """
    h, w = img.shape[0], img.shape[1]
    c = img.shape[2]
    assert h == w, "rotate_image_shear requires square patches"
    k = jnp.round(angle_deg / 90.0)
    phi = jnp.deg2rad(angle_deg - 90.0 * k)
    k4 = (k.astype(jnp.int32)) % 4
    img = jax.lax.switch(
        k4,
        [
            lambda x: x,
            lambda x: jnp.rot90(x, k=1),
            lambda x: jnp.rot90(x, k=2),
            lambda x: jnp.rot90(x, k=3),
        ],
        img,
    )
    a = -jnp.tan(phi / 2.0)
    b = jnp.sin(phi)
    # Content can drift by <= tan(22.5 deg) * canvas/2 per shear pass.
    m = int(np.ceil(h * 0.23)) + 2
    hc = h + 2 * m
    pad = int(np.ceil(0.45 * hc)) + 2
    canvas = jnp.pad(img, ((m, m), (m, m), (0, 0)))

    def shear(cnv: jax.Array, coef: jax.Array, axis: int) -> jax.Array:
        if axis == 0:
            cnv = jnp.swapaxes(cnv, 0, 1)
        n, width = cnv.shape[0], cnv.shape[1]
        idx = jnp.arange(n) - (n - 1) / 2.0
        shifts = jnp.round(coef * idx).astype(jnp.int32)
        padded = jnp.pad(cnv, ((0, 0), (pad, pad), (0, 0)))

        def row(y):
            return jax.lax.dynamic_slice(padded, (y, pad + shifts[y], 0), (1, width, c))[0]

        out = jax.vmap(row)(jnp.arange(n))
        return jnp.swapaxes(out, 0, 1) if axis == 0 else out

    canvas = shear(canvas, a, 1)
    canvas = shear(canvas, b, 0)
    canvas = shear(canvas, a, 1)
    return canvas[m : m + h, m : m + w]


def _augment_one(key: jax.Array, img: jax.Array, rot_order: int) -> jax.Array:
    k_jit, k_flip, k_rot = jax.random.split(key, 3)
    img = color_jitter(k_jit, img)
    do_flip = jax.random.bernoulli(k_flip, 0.5)
    img = jnp.where(do_flip, img[:, ::-1, :], img)
    angle = jax.random.uniform(k_rot, (), minval=-180.0, maxval=180.0)
    if rot_order == 0:
        return rotate_image_shear(img, angle)
    return rotate_image(img, angle, order=rot_order)


def train_augment_inline(
    key: jax.Array, patches_u8: jax.Array, rot_order: int = 0
) -> jax.Array:
    """Traceable (un-jitted) form for fusing into a larger jitted program."""
    imgs = patches_u8.astype(jnp.float32) / 255.0
    keys = jax.random.split(key, imgs.shape[0])
    return jax.vmap(lambda k, im: _augment_one(k, im, rot_order))(keys, imgs)


@functools.partial(jax.jit, static_argnames=("rot_order",))
def train_augment(key: jax.Array, patches_u8: jax.Array, rot_order: int = 0) -> jax.Array:
    """Full train-time augmentation for a (B, H, W, 3) uint8 batch -> float32 [0,1]."""
    return train_augment_inline(key, patches_u8, rot_order)


def tenx_augment_inline(key: jax.Array, patches_u8: jax.Array) -> jax.Array:
    """TenxDataset transform (reference ``dataset.py:316-325``): random hflip,
    random vflip, then rotation by a uniform choice of {180, 90, 0, -90}.
    Applied at train AND eval time in the reference. Float [0,1] NHWC output.

    Note the reference feeds these patches *unscaled* (0..255 floats,
    ``dataset.py:336``); we keep [0,1] scaling consistent across datasets and
    document the divergence (quirk policy, SURVEY §2 C8).
    """
    imgs = patches_u8.astype(jnp.float32) / 255.0
    b = imgs.shape[0]
    k_h, k_v, k_r = jax.random.split(key, 3)
    hflip = jax.random.bernoulli(k_h, 0.5, (b,))
    vflip = jax.random.bernoulli(k_v, 0.5, (b,))
    rot = jax.random.randint(k_r, (b,), 0, 4)  # index into {180, 90, 0, -90}

    def one(im, hf, vf, r):
        im = jnp.where(hf, im[:, ::-1, :], im)
        im = jnp.where(vf, im[::-1, :, :], im)
        # k=2 (180°), k=1 (90° ccw), k=0, k=3 (-90°) — matching TF.rotate angles.
        return jax.lax.switch(
            r,
            [
                lambda x: jnp.rot90(x, k=2),
                lambda x: jnp.rot90(x, k=1),
                lambda x: x,
                lambda x: jnp.rot90(x, k=3),
            ],
            im,
        )

    return jax.vmap(one)(imgs, hflip, vflip, rot)


@jax.jit
def tenx_augment(key: jax.Array, patches_u8: jax.Array) -> jax.Array:
    return tenx_augment_inline(key, patches_u8)


@jax.jit
def to_float(patches_u8: jax.Array) -> jax.Array:
    """Eval-time ToTensor equivalent: uint8 NHWC -> float32 [0,1]."""
    return patches_u8.astype(jnp.float32) / 255.0
