"""On-device, stateless image augmentation (jax.random).

The reference augments on the CPU with PIL/torchvision per item every epoch
(reference ``dataset.py:201-206``: ColorJitter(0.5, 0.5, 0.5) +
RandomHorizontalFlip + RandomRotation(±180°) + ToTensor). Here the same
distribution of transforms runs *on the TPU*, batched, over uint8 patch
batches already resident in HBM — removing the host-side input bottleneck
that dominates the reference's step time (single-process DataLoader,
``train.py:49``).

Conventions match torchvision:
  * jitter factors ~ U(0.5, 1.5) for brightness/contrast/saturation,
    independent per image, applied in a random order (hue jitter is 0 in
    the reference); the order is sampled **per batch** by default so the
    6-way permutation compiles to a true conditional instead of 6x the
    work under vmap — per-image order is available via
    ``per_example_order=True`` for strict torchvision parity;
  * grayscale uses ITU-R 601-2 luma (0.299, 0.587, 0.114);
  * rotation angle ~ U(-180, 180) per image, nearest-neighbor resample,
    zero fill (torchvision RandomRotation defaults), positive = CCW;
  * outputs are float in [0, 1] (ToTensor), NHWC.

Performance note (v5e, measured on chained v5e programs, B=128 224x224):
the rotation dominates augmentation cost and its formulation matters
enormously. A per-image 2-D gather under `vmap` costs 62 ms; the same
nearest-neighbor sampling as ONE batch-level 1-D `jnp.take` over globally
flattened (B*H*W) indices costs 30 ms (`rotate_batch`); XLA-level
shear decompositions (`take_along_axis`, per-row dynamic slices: 3-6x
slower; (H,W,W) one-hot einsum: 24 ms) lose to gathers or drown in one-hot
HBM traffic — but the Pallas `ops.pallas_shift.row_shift` kernel does a
shear as one dynamic lane-roll per row, making the full 3-shear Paeth
rotation 6 ms (`rotate_batch_paeth`, the train-step default). Folding the
horizontal flip into the rotation removes a further full-tensor select
pass. Jitter is cheap (~4 ms) in every form.

The Visium eval-time quirk (reference ``dataset.py:316-325``: random
h/v-flips + 90° rotations even at inference) is `tenx_augment`.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_LUMA = jnp.array([0.299, 0.587, 0.114], dtype=jnp.float32)


def _luma(img: jax.Array) -> jax.Array:
    """ITU-R 601-2 grayscale as elementwise math, last axis = RGB.

    Written as explicit per-channel multiply-adds rather than
    ``img @ _LUMA`` so the K=3/N=1 dot never reaches the MXU's 128x128
    tiling (same values either way; see PROFILE_r02.md for the round-2
    augmentation cost analysis)."""
    w = _LUMA.astype(img.dtype)
    return img[..., 0] * w[0] + img[..., 1] * w[1] + img[..., 2] * w[2]


def _blend(img1: jax.Array, img2: jax.Array, ratio: jax.Array) -> jax.Array:
    ratio = jnp.asarray(ratio, img1.dtype)
    one = jnp.asarray(1.0, img1.dtype)
    return jnp.clip(ratio * img1 + (one - ratio) * img2, 0, 1)


def _brightness(img: jax.Array, f: jax.Array) -> jax.Array:
    return _blend(img, jnp.zeros_like(img), f)


def _contrast(img: jax.Array, f: jax.Array) -> jax.Array:
    # per-image mean of the grayscale image (torchvision semantics)
    gray = _luma(img)
    axes = tuple(range(gray.ndim - 2, gray.ndim))
    gm = jnp.mean(gray, axis=axes, keepdims=True)[..., None]
    return _blend(img, gm.astype(img.dtype), f)


def _saturation(img: jax.Array, f: jax.Array) -> jax.Array:
    gray = _luma(img)[..., None]
    return _blend(img, gray, f)


_PERMS: Tuple[Tuple[int, int, int], ...] = (
    (0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0),
)


def _jitter_ops(fb, fc, fs):
    return (
        lambda im: _brightness(im, fb),
        lambda im: _contrast(im, fc),
        lambda im: _saturation(im, fs),
    )


# ---- channel-major jitter core --------------------------------------------
# The jitter pipeline runs on (..., 3, H, W) so the cross-channel gray math
# (luma, blends toward gray) reads contiguous per-channel planes and W sits
# on the VPU lanes; the two moveaxis shuffles are cheap. Numerically
# identical to the channels-last composition (pinned by
# tests/test_augment.py::test_channel_major_jitter_matches_channels_last).
# Full augmentation is ~6 ms of the ~78 ms B=128 train step (PROFILE_r02.md).


def _luma_cm(x: jax.Array) -> jax.Array:
    """ITU-R 601-2 grayscale, channel-major: (..., 3, H, W) -> (..., H, W)."""
    w = _LUMA.astype(x.dtype)
    return x[..., 0, :, :] * w[0] + x[..., 1, :, :] * w[1] + x[..., 2, :, :] * w[2]


def _contrast_cm(x: jax.Array, f: jax.Array) -> jax.Array:
    gm = jnp.mean(_luma_cm(x), axis=(-2, -1))[..., None, None, None]
    return _blend(x, gm.astype(x.dtype), f)


def _saturation_cm(x: jax.Array, f: jax.Array) -> jax.Array:
    return _blend(x, _luma_cm(x)[..., None, :, :], f)


def _jitter_ops_cm(fb, fc, fs):
    return (
        lambda x: _blend(x, jnp.zeros_like(x), fb),  # brightness
        lambda x: _contrast_cm(x, fc),
        lambda x: _saturation_cm(x, fs),
    )


def color_jitter_batch(key: jax.Array, imgs: jax.Array) -> jax.Array:
    """ColorJitter(0.5, 0.5, 0.5) over a (B, H, W, 3) batch: independent
    per-image factors, batch-shared op order (true 6-way conditional)."""
    b = imgs.shape[0]
    k_perm, k_b, k_c, k_s = jax.random.split(key, 4)
    fb = jax.random.uniform(k_b, (b, 1, 1, 1), minval=0.5, maxval=1.5)
    fc = jax.random.uniform(k_c, (b, 1, 1, 1), minval=0.5, maxval=1.5)
    fs = jax.random.uniform(k_s, (b, 1, 1, 1), minval=0.5, maxval=1.5)
    ops = _jitter_ops_cm(fb.astype(imgs.dtype), fc.astype(imgs.dtype),
                         fs.astype(imgs.dtype))
    perm_idx = jax.random.randint(k_perm, (), 0, len(_PERMS))

    def apply_perm(p):
        def fn(x):
            for j in p:
                x = ops[j](x)
            return x
        return fn

    x = jnp.moveaxis(imgs, -1, 1)  # (B, 3, H, W): W on the vector lanes
    x = jax.lax.switch(perm_idx, [apply_perm(p) for p in _PERMS], x)
    return jnp.moveaxis(x, 1, -1)


def color_jitter(key: jax.Array, img: jax.Array) -> jax.Array:
    """Single-image form (per-image random order — torchvision-exact)."""
    k_perm, k_b, k_c, k_s = jax.random.split(key, 4)
    fb = jax.random.uniform(k_b, (), minval=0.5, maxval=1.5).astype(img.dtype)
    fc = jax.random.uniform(k_c, (), minval=0.5, maxval=1.5).astype(img.dtype)
    fs = jax.random.uniform(k_s, (), minval=0.5, maxval=1.5).astype(img.dtype)
    ops = _jitter_ops_cm(fb, fc, fs)
    perm_idx = jax.random.randint(k_perm, (), 0, len(_PERMS))

    def apply_perm(p):
        def fn(x):
            for j in p:
                x = ops[j](x)
            return x
        return fn

    x = jnp.moveaxis(img, -1, 0)  # (3, H, W)
    x = jax.lax.switch(perm_idx, [apply_perm(p) for p in _PERMS], x)
    return jnp.moveaxis(x, 0, -1)


def rotate_image(
    img: jax.Array, angle_deg: jax.Array, order: int = 0
) -> jax.Array:
    """Rotate (H, W, C) about its center; zero fill outside.

    Positive angle rotates counter-clockwise (PIL/torchvision convention).
    order=0 nearest (torchvision RandomRotation default), order=1 bilinear.
    """
    h, w = img.shape[0], img.shape[1]
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


def rotate_batch(
    imgs: jax.Array,
    angles_deg: jax.Array,
    hflip: jax.Array | None = None,
    order: int = 0,
) -> jax.Array:
    """Rotate a (B, H, W, C) batch about image centers; zero fill outside.

    Same nearest-neighbor inverse-map sampling as `rotate_image` (positive =
    CCW, torchvision RandomRotation semantics), but formulated as ONE
    batch-level gather over globally flattened indices — 2x faster on TPU
    than the vmapped per-image 2-D gather (see module docstring).

    hflip: optional (B,) bool — applies a horizontal flip *before* the
    rotation by mirroring the source-x indices (exactly `rotate(flip(im))`),
    for free. order=1 (bilinear) falls back to the vmapped per-image path.
    """
    b, h, w = imgs.shape[0], imgs.shape[1], imgs.shape[2]
    if order != 0:
        flipped = imgs if hflip is None else jnp.where(
            hflip[:, None, None, None], imgs[:, :, ::-1, :], imgs
        )
        return jax.vmap(lambda im, a: rotate_image(im, a, order))(flipped, angles_deg)
    theta = angles_deg * (jnp.pi / 180.0)
    cos, sin = jnp.cos(theta), jnp.sin(theta)  # (B,)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx
    src_x = cos[:, None, None] * xx - sin[:, None, None] * yy + cx  # (B, H, W)
    src_y = sin[:, None, None] * xx + cos[:, None, None] * yy + cy
    sxr, syr = jnp.round(src_x), jnp.round(src_y)
    valid = (sxr >= 0) & (sxr <= w - 1) & (syr >= 0) & (syr <= h - 1)
    sxc = jnp.clip(sxr, 0, w - 1).astype(jnp.int32)
    syc = jnp.clip(syr, 0, h - 1).astype(jnp.int32)
    if hflip is not None:
        # flip-then-rotate == sample the unflipped image at mirrored src x
        sxc = jnp.where(hflip[:, None, None], w - 1 - sxc, sxc)
    boff = (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None, None]
    flat_idx = (boff + syc * w + sxc).reshape(-1)
    out = jnp.take(imgs.reshape(b * h * w, -1), flat_idx, axis=0)
    out = out.reshape(imgs.shape)
    return jnp.where(valid[..., None], out, jnp.asarray(0, imgs.dtype))


def rotate_batch_paeth(
    imgs: jax.Array,
    angles_deg: jax.Array,
    hflip: jax.Array | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Rotate a (B, H, W, C) batch by Paeth's three-shear decomposition.

    R(t) = ShearX(a) . ShearY(b) . ShearX(a) with a = tan(t/2), b = -sin(t)
    (inverse-map convention matching `rotate_image`; positive = CCW), after
    reducing the angle to [-45, 45] with an exact rot90. Each shear shifts
    every row/column by one integer offset, executed by the
    `ops.pallas_shift.row_shift` kernel — pure data movement instead of a
    per-pixel gather (~6 ms vs 30 ms for B=128 224^2 bf16 on v5e).

    Divergence (documented, quirk policy): the three-pass integer shifts
    resample slightly differently from direct nearest-neighbor rotation
    (torchvision RandomRotation semantics, `rotate_batch`); the transform
    distribution — uniform angle, zero fill, value-preserving inside the
    valid region — is equivalent, and multiples of 90 are exact. Requires
    square images with H a multiple of 8 (the flagship 224 and test 16
    shapes); use `rotate_batch` otherwise.
    """
    from mclstexp_tpu.ops.pallas_shift import row_shift

    b, h, w = imgs.shape[0], imgs.shape[1], imgs.shape[2]
    assert h == w and h % 8 == 0, f"paeth rotation needs square H=W%8==0, got {imgs.shape}"
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    if hflip is not None:
        imgs = jnp.where(hflip[:, None, None, None], imgs[:, :, ::-1, :], imgs)

    k90 = jnp.round(angles_deg / 90.0)
    theta = (angles_deg - k90 * 90.0) * (jnp.pi / 180.0)  # [-45, 45] residual
    k = jnp.mod(k90, 4).astype(jnp.int32)[:, None, None, None]
    r1 = jnp.rot90(imgs, 1, axes=(1, 2))
    r2 = imgs[:, ::-1, ::-1, :]
    r3 = jnp.rot90(imgs, 3, axes=(1, 2))
    base = jnp.where(k == 1, r1, jnp.where(k == 2, r2, jnp.where(k == 3, r3, imgs)))

    a = jnp.tan(theta / 2.0)  # (B,)
    bshear = -jnp.sin(theta)
    centered = jnp.arange(h, dtype=jnp.float32) - (h - 1) / 2.0  # (H,) == (W,)
    shear_x = jnp.round(a[:, None] * centered[None, :]).astype(jnp.int32)  # (B, H)
    shear_y = jnp.round(bshear[:, None] * centered[None, :]).astype(jnp.int32)  # (B, W)

    out = row_shift(base, shear_x, interpret=interpret)
    out = jnp.swapaxes(out, 1, 2)  # column shift = row shift on the transpose
    out = row_shift(out, shear_y, interpret=interpret)
    out = jnp.swapaxes(out, 1, 2)
    return row_shift(out, shear_x, interpret=interpret)


def train_augment_inline(
    key: jax.Array,
    patches_u8: jax.Array,
    rot_order: int = 0,
    per_example_order: bool = True,
    dtype=jnp.float32,
    rot_impl: str = "gather",  # "gather" (torchvision-exact NN) | "paeth"
) -> jax.Array:
    """Traceable (un-jitted) form for fusing into a larger jitted program.

    Jitter runs per-image under one vmap (torchvision-exact per-image op
    order: under vmap the 6 orders become selects fused into one
    elementwise pipeline, measured faster than a batch-level switch);
    flip + rotation run at batch level through `rotate_batch`'s single
    flat gather with the flip folded into the source indices.

    dtype: compute dtype for the augmentation math; bf16 halves the
    bandwidth of the jitter blends and the rotation gather and is plenty of
    precision for augmentation (pass the model's activation dtype).
    """
    imgs = (patches_u8.astype(dtype) / jnp.asarray(255.0, dtype)).astype(dtype)
    b = imgs.shape[0]
    k_jit, k_flip, k_rot = jax.random.split(key, 3)
    if per_example_order:
        imgs = jax.vmap(color_jitter)(jax.random.split(k_jit, b), imgs)
    else:
        imgs = color_jitter_batch(k_jit, imgs)
    hflip = jax.random.bernoulli(k_flip, 0.5, (b,))
    angles = jax.random.uniform(k_rot, (b,), minval=-180.0, maxval=180.0)
    h, w = imgs.shape[1], imgs.shape[2]
    if rot_impl == "paeth" and rot_order == 0 and h == w and h % 8 == 0:
        return rotate_batch_paeth(imgs, angles, hflip=hflip)
    return rotate_batch(imgs, angles, hflip=hflip, order=rot_order)


@functools.partial(jax.jit, static_argnames=("rot_order", "per_example_order"))
def train_augment(
    key: jax.Array,
    patches_u8: jax.Array,
    rot_order: int = 0,
    per_example_order: bool = False,
) -> jax.Array:
    """Full train-time augmentation for a (B, H, W, 3) uint8 batch -> f32 [0,1]."""
    return train_augment_inline(key, patches_u8, rot_order, per_example_order)


def tenx_augment_inline(
    key: jax.Array, patches_u8: jax.Array, raw_scale: bool = False
) -> jax.Array:
    """TenxDataset transform (reference ``dataset.py:316-325``): random hflip,
    random vflip, then rotation by a uniform choice of {180, 90, 0, -90}.
    Applied at train AND eval time in the reference. Float NHWC output.

    raw_scale=True reproduces the reference's input scale bit-exactly: Visium
    patches are fed as RAW 0-255 floats — ``torch.tensor(image).permute(2,0,1)
    .float()`` with no /255 (``dataset.py:336``). The visium preset defaults
    it on (``DataConfig.visium_raw_scale``); False gives the [0,1] convention
    shared by the other datasets.
    """
    scale = jnp.float32(1.0) if raw_scale else jnp.float32(1.0 / 255.0)
    imgs = patches_u8.astype(jnp.float32) * scale
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


@functools.partial(jax.jit, static_argnames=("raw_scale",))
def tenx_augment(
    key: jax.Array, patches_u8: jax.Array, raw_scale: bool = False
) -> jax.Array:
    return tenx_augment_inline(key, patches_u8, raw_scale)


@jax.jit
def to_float(patches_u8: jax.Array) -> jax.Array:
    """Eval-time ToTensor equivalent: uint8 NHWC -> float32 [0,1]."""
    return patches_u8.astype(jnp.float32) / 255.0
