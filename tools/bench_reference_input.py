"""Measure the reference input pipeline's per-item cost (the bench denominator).

The reference trains with a SINGLE-PROCESS torch DataLoader (num_workers
unset, reference ``train.py:49``) whose ``__getitem__`` does, per spot
(reference ``dataset.py:201-233``):

  PIL ``Image.crop`` of a 224x224 patch from the full-resolution slide
  -> ColorJitter(0.5, 0.5, 0.5) -> RandomHorizontalFlip -> RandomRotation(180)
  -> ToTensor

With the loader in-process, the accelerator idles during all of it, so
single-thread items/sec is an UPPER bound on the reference's end-to-end
training throughput (its GPU forward/backward only adds time). That makes it
the honest, *measured* denominator for bench.py's ``vs_baseline`` (replacing
round 1-2's engineering estimate; VERDICT r2 weak #3).

torchvision is not installed in this image, so the transforms are reproduced
with the same PIL backend calls torchvision makes: ColorJitter's
brightness/contrast/saturation are ``ImageEnhance`` blends with factors ~
U(0.5, 1.5) in random order (torchvision/transforms/functional_pil.py),
RandomRotation uses ``Image.rotate`` (NEAREST default), ToTensor is the
HWC-uint8 -> CHW-float32/255 conversion. Same ops, same library, same cost
model — only the RNG stream differs, which does not affect timing.

Run standalone: python tools/bench_reference_input.py
"""

from __future__ import annotations

import json
import random
import sys
import time

import numpy as np

PATCH = 224
R = PATCH // 2
SLIDE = 3000  # synthetic full-res slide edge (reference slides are ~10-30k;
# crop cost is size-independent, decode cost is excluded on both sides)


def _to_tensor(img) -> "object":
    """torchvision ToTensor: PIL HWC uint8 -> torch CHW float32 in [0,1]."""
    import torch

    arr = np.asarray(img, dtype=np.uint8)
    t = torch.from_numpy(np.ascontiguousarray(arr.transpose(2, 0, 1)))
    return t.float().div(255.0)


def _color_jitter(img, rng: random.Random):
    """ColorJitter(0.5, 0.5, 0.5): brightness/contrast/saturation factors
    U(0.5, 1.5) applied in random order via PIL ImageEnhance (torchvision's
    PIL backend)."""
    from PIL import ImageEnhance

    ops = [
        lambda im, f: ImageEnhance.Brightness(im).enhance(f),
        lambda im, f: ImageEnhance.Contrast(im).enhance(f),
        lambda im, f: ImageEnhance.Color(im).enhance(f),
    ]
    order = [0, 1, 2]
    rng.shuffle(order)
    for i in order:
        img = ops[i](img, rng.uniform(0.5, 1.5))
    return img


def reference_item(slide, center, rng: random.Random):
    """One training item exactly as reference dataset.py:224-233 builds it."""
    x, y = center
    patch = slide.crop((x - R, y - R, x + R, y + R))
    patch = _color_jitter(patch, rng)
    if rng.random() < 0.5:
        from PIL import Image

        patch = patch.transpose(Image.FLIP_LEFT_RIGHT)
    patch = patch.rotate(rng.uniform(-180.0, 180.0))
    return _to_tensor(patch)


def measure_reference_items_per_sec(n_items: int = 400, seed: int = 0) -> float:
    from PIL import Image

    nprng = np.random.default_rng(seed)
    rng = random.Random(seed)
    slide = Image.fromarray(
        nprng.integers(0, 256, size=(SLIDE, SLIDE, 3), dtype=np.uint8), "RGB"
    )
    centers = nprng.integers(R, SLIDE - R, size=(n_items, 2))

    # warmup (PIL lazy init, torch first-call)
    for c in centers[:10]:
        reference_item(slide, c, rng)
    t0 = time.perf_counter()
    for c in centers:
        reference_item(slide, c, rng)
    dt = time.perf_counter() - t0
    return n_items / dt


def main():
    ips = measure_reference_items_per_sec()
    print(
        json.dumps(
            {
                "metric": "reference_input_items_per_sec",
                "value": round(ips, 2),
                "unit": "items/sec single-process (upper bound on reference "
                        "train throughput; input pipeline only)",
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
