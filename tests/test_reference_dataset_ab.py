"""Data-layer A/B: execute the reference's OWN ``dataset.py`` classes.

``/root/reference/dataset.py`` was the one reference module never imported
by any test: its pandas ``"{x}x{y}"`` join (dataset.py:253-272), the
``cumlen`` concat-index walk (dataset.py:190-215), floor-pixel centers and
test-mode ``center`` fields (dataset.py:224-240) were reimplemented and
self-golden-tested, but silent off-by-one/orientation bugs live exactly in
the gap between a reimplementation and the original. These tests synthesize
tiny on-disk trees (HER2ST layout, cSCC GSE144240 layout, Visium 10x
layout), instantiate the reference's ``HERDataset`` / ``SKIN`` /
``TenxDataset`` on them, and assert item-for-item equality of expression,
position, center, and the cut patch against ``load_her2st`` /
``load_cscc`` / ``load_visium_section``.

Execution shims (none touch the logic under test):
  * the hard-coded ``D:``-drive directory literals (dataset.py:23,33,148-154)
    are pointed at the synthetic trees by textual patch;
  * ``scprep`` (absent here) is stubbed from its published formulas —
    ``library_size_normalize`` = row / row-sum x 10,000 (the scprep default
    rescale), ``transform.log`` = log10(x + 1) — implemented independently,
    NOT by aliasing ``mclstexp_tpu.data.normalize``;
  * ``cv2`` (absent) is stubbed with a PIL reader that returns BGR, exactly
    cv2.imread's contract — which also pins the reference's Visium quirk of
    feeding BGR patches (dataset.py:310), reproduced by our loader;
  * ``torchvision.transforms`` provides a REAL ToTensor (CHW float / 255)
    for the deterministic test-mode path; the train-mode ColorJitter/flip/
    rotation stubs are identity (train-mode images are random in the
    reference and are not compared — train-mode expression/position are,
    which is what pins the cumlen walk).

Known divergences re-asserted here rather than hidden:
  * train-mode section ORDER is ``list(set(samples) - set(te_names))`` in
    the reference (dataset.py:36-38,157) — Python set order, hash-seed
    dependent. The A/B therefore aligns our sections to the reference
    instance's ``id2name`` before comparing concat indices.
  * near-edge patches: the reference's Visium slicing TRUNCATES at slide
    borders (dataset.py:334 — a (h<224, w<224, 3) tensor that would break
    torch collation downstream); our cutter zero-pads (HER2ST/SKIN PIL
    ``crop`` zero-pads in the reference too, and both sides match there).
    Visium comparisons use interior centers.
"""

from __future__ import annotations

import gzip
import importlib
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pd = pytest.importorskip("pandas")
from PIL import Image  # noqa: E402

REFERENCE_DATASET = "/root/reference/dataset.py"

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.exists(REFERENCE_DATASET), reason="reference checkout not mounted"
)]


# ------------------------------------------------------------------- stubs --
def _scprep_stub():
    """scprep from its published formulas (independent of our normalize.py):
    library_size_normalize: X / row-sum * 10,000 (default rescale);
    transform.log: log10(X + pseudocount), defaults pseudocount=1, base=10."""
    scp = types.ModuleType("scprep")
    norm = types.ModuleType("scprep.normalize")
    trans = types.ModuleType("scprep.transform")

    def library_size_normalize(data):
        data = np.asarray(data, dtype=np.float64)
        return data / data.sum(axis=1, keepdims=True) * 10000.0

    def log(data, pseudocount=1, base=10):
        assert base == 10
        return np.log10(np.asarray(data, dtype=np.float64) + pseudocount)

    norm.library_size_normalize = library_size_normalize
    trans.log = log
    scp.normalize = norm
    scp.transform = trans
    return {"scprep": scp, "scprep.normalize": norm, "scprep.transform": trans}


def _cv2_stub():
    """cv2.imread contract: BGR uint8 (the reference's Visium slide path,
    dataset.py:310). PIL-backed so no OpenCV is needed."""
    cv2 = types.ModuleType("cv2")

    def imread(path):
        if not os.path.exists(path):
            return None
        with Image.open(path) as im:
            return np.asarray(im.convert("RGB"))[:, :, ::-1].copy()

    cv2.imread = imread
    return {"cv2": cv2}


def _torchvision_stub():
    """Real ToTensor (the deterministic test-mode transform,
    dataset.py:225); identity train-mode augments; identity TF ops for the
    neutralized-random Visium transform."""
    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")
    tvf = types.ModuleType("torchvision.transforms.functional")

    class ToTensor:
        def __call__(self, pic):
            arr = np.asarray(pic.convert("RGB"), dtype=np.uint8)
            return torch.from_numpy(arr.copy()).permute(2, 0, 1).float() / 255.0

    class _Identity:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    class Compose:
        def __init__(self, fns):
            self.fns = fns

        def __call__(self, x):
            for f in self.fns:
                x = f(x)
            return x

    tvt.ToTensor = ToTensor
    tvt.Compose = Compose
    tvt.ColorJitter = _Identity
    tvt.RandomHorizontalFlip = _Identity
    tvt.RandomRotation = _Identity
    tvf.hflip = lambda im: im
    tvf.vflip = lambda im: im
    tvf.rotate = lambda im, angle: im if angle == 0 else (_ for _ in ()).throw(
        AssertionError("rotation not neutralized"))
    tvt.functional = tvf
    tv.transforms = tvt
    return {
        "torchvision": tv,
        "torchvision.transforms": tvt,
        "torchvision.transforms.functional": tvf,
    }


@pytest.fixture()
def ref_dataset_module(tmp_path, monkeypatch):
    """Load /root/reference/dataset.py with its D: literals patched to the
    tmp tree and the absent third-party modules stubbed. Returns
    (module_loader, tree_paths)."""
    her_root = tmp_path / "her2st_data"
    cscc_root = tmp_path / "GSE144240_RAW"
    (her_root / "ST-cnts").mkdir(parents=True)
    cscc_root.mkdir()

    for name, mod in {**_scprep_stub(), **_cv2_stub(), **_torchvision_stub()}.items():
        monkeypatch.setitem(sys.modules, name, mod)

    with open(REFERENCE_DATASET) as f:
        src = f.read()
    patches = [
        ("self.dir = 'D:\\dataset\\CSCC_data\\GSE144240_RAW/'",
         f"self.dir = {str(cscc_root) + os.sep!r}"),
        ("np.load('D:\\dataset\\Her2st\\data/skin_hvg_cut_1000.npy', allow_pickle=True)",
         f"np.load({str(tmp_path / 'skin_genes.npy')!r}, allow_pickle=True)"),
        ("self.cnt_dir = 'D:\\dataset\\Her2st\\data\\ST-cnts'",
         f"self.cnt_dir = {str(her_root / 'ST-cnts')!r}"),
        ("self.img_dir = 'D:\\dataset\\Her2st\\data\\ST-imgs'",
         f"self.img_dir = {str(her_root / 'ST-imgs')!r}"),
        ("self.pos_dir = 'D:\\dataset\\Her2st\\data\\ST-spotfiles'",
         f"self.pos_dir = {str(her_root / 'ST-spotfiles')!r}"),
        ("self.lbl_dir = 'D:\\dataset\\Her2st\\data\\ST-pat'",
         f"self.lbl_dir = {str(her_root / 'ST-pat')!r}"),
        ("np.load('D:\\dataset\\Her2st\\data/her_hvg_cut_1000.npy', allow_pickle=True)",
         f"np.load({str(tmp_path / 'her_genes.npy')!r}, allow_pickle=True)"),
    ]
    for old, new in patches:
        assert old in src, f"patch target not found: {old!r}"
        src = src.replace(old, new)

    mod = types.ModuleType("reference_dataset")
    mod.__file__ = REFERENCE_DATASET
    monkeypatch.setitem(sys.modules, "reference_dataset", mod)
    exec(compile(src, REFERENCE_DATASET, "exec"), mod.__dict__)
    return mod, {"her": her_root, "cscc": cscc_root, "tmp": tmp_path}


# ------------------------------------------------------------ tree builders --
GENES = [f"G{i:03d}" for i in range(30)]
EXTRA_GENES = ["X1", "X2", "X3"]  # present in counts, absent from the panel


def _spot_table(rng, n, x_range=(5, 30), px_range=(130, 280)):
    """Selection-table rows: array coords near-integer floats (the reference
    builds ids from np.around but keeps the RAW floats as 'position',
    dataset.py:258-266,195), pixel coords arbitrary floats."""
    xy = set()
    while len(xy) < n:
        xy.add((int(rng.integers(*x_range)), int(rng.integers(*x_range))))
    xy = sorted(xy)
    x = np.array([a + rng.uniform(-0.3, 0.3) for a, _ in xy])
    y = np.array([b + rng.uniform(-0.3, 0.3) for _, b in xy])
    px = rng.uniform(*px_range, size=n)
    py = rng.uniform(*px_range, size=n)
    ids = [f"{a}x{b}" for a, b in xy]
    return ids, x, y, px, py


def _write_counts(path, rng, ids, genes_order):
    df = pd.DataFrame(
        rng.integers(1, 40, size=(len(ids), len(genes_order))),
        index=ids, columns=genes_order,
    )
    df.to_csv(path, sep="\t")
    return df


def _write_selection(path, x, y, px, py, extra_rows=0, rng=None):
    """Selection TSV; optionally append rows whose ids no counts row has
    (left join must ignore them; inner join must too)."""
    if extra_rows:
        x = np.concatenate([x, 1000 + rng.uniform(0, 1, extra_rows)])
        y = np.concatenate([y, 1000 + rng.uniform(0, 1, extra_rows)])
        px = np.concatenate([px, rng.uniform(130, 280, extra_rows)])
        py = np.concatenate([py, rng.uniform(130, 280, extra_rows)])
    pd.DataFrame({"x": x, "y": y, "pixel_x": px, "pixel_y": py}).to_csv(
        path, sep="\t", index=False
    )


def _write_slide(path, rng, w=420, h=380):
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    Image.fromarray(arr).save(path)


def _build_her2st_tree(root, tmp, rng, n_sections=34, spots=10):
    """34 cnt files -> sorted[1:33] keeps 32 sections, the reference's name
    derivation (dataset.py:155-161)."""
    all_names = [f"{c}{d}" for c in "ABCDEFGHIJKL" for d in "123"][:n_sections]
    (root / "ST-spotfiles").mkdir()
    (root / "ST-pat" / "lbl").mkdir(parents=True)
    genes_order = list(rng.permutation(GENES + EXTRA_GENES))
    np.save(tmp / "her_genes.npy", np.asarray(GENES, dtype=object),
            allow_pickle=True)
    for name in all_names:
        ids, x, y, px, py = _spot_table(rng, spots)
        _write_counts(root / "ST-cnts" / f"{name}.tsv", rng, ids, genes_order)
        _write_selection(root / "ST-spotfiles" / f"{name}_selection.tsv",
                         x, y, px, py, extra_rows=2, rng=rng)
        img_dir = root / "ST-imgs" / name[0] / name
        img_dir.mkdir(parents=True)
        _write_slide(img_dir / f"{name}_HE.jpg", rng)
        if name == "B1":  # one labeled section (dataset.py:171-180)
            labels = rng.choice(
                ["invasive cancer", "connective tissue", "undetermined"],
                size=len(ids))
            pd.DataFrame({"x": x, "y": y, "pixel_x": px, "pixel_y": py,
                          "label": labels}).to_csv(
                root / "ST-pat" / "lbl" / f"{name}_labeled_coordinates.tsv",
                sep="\t", index=False)
    return sorted(all_names)[1:33]


def _build_cscc_tree(root, tmp, rng, spots=12):
    names = [f"{p}_ST_{r}" for p in ("P2", "P5", "P9", "P10")
             for r in ("rep1", "rep2", "rep3")]
    genes_order = list(rng.permutation(GENES + EXTRA_GENES))
    np.save(tmp / "skin_genes.npy", np.asarray(GENES, dtype=object),
            allow_pickle=True)
    for k, name in enumerate(names):
        ids, x, y, px, py = _spot_table(rng, spots)
        # inner join (dataset.py:134): give the counts an id the selection
        # table lacks — both sides must DROP that spot.
        ids_cnt = ids + [f"900x{900 + k}"]
        _write_counts(root / f"GSM00{k}_{name}_stdata.tsv", rng, ids_cnt,
                      genes_order)
        _write_selection(root / f"spot_data-selection-{name}.tsv",
                         x, y, px, py, extra_rows=1, rng=rng)
        _write_slide(root / f"GSM00{k}_{name}.jpg", rng)
    return names


# --------------------------------------------------------------- assertions --
def _assert_item_matches(item, sec, i, test_mode=True):
    """One reference __getitem__ dict vs row i of our Section."""
    np.testing.assert_allclose(
        item["expression"].numpy(), sec.expression[i], rtol=1e-6, atol=1e-7)
    # the reference keeps positions as raw floats and .long()s them in
    # train.py:33-34; our loader stores the truncation directly
    np.testing.assert_array_equal(
        item["position"].long().numpy(), sec.positions[i])
    if test_mode:
        np.testing.assert_array_equal(item["center"].numpy(), sec.centers[i])
        ours = np.transpose(sec.patches[i], (2, 0, 1)).astype(np.float32) / 255.0
        np.testing.assert_array_equal(item["image"].numpy(), ours)


def test_her2st_dataset_ab(ref_dataset_module, tmp_path):
    """Reference HERDataset vs load_her2st: test-mode items for two folds
    (one labeled), train-mode cumlen concat walk across all 31 sections."""
    mod, roots = ref_dataset_module
    rng = np.random.default_rng(42)
    names = _build_her2st_tree(roots["her"], roots["tmp"], rng)

    from mclstexp_tpu.data.st_dataset import her2st_section_names, load_her2st

    assert her2st_section_names(str(roots["her"])) == names

    secs = load_her2st(str(roots["her"]), GENES, patch_size=224,
                       with_labels=True,
                       cache_dir=str(tmp_path / "cache_her"))
    by_name = {s.name: s for s in secs}

    for fold in (0, names.index("B1")):
        ds = mod.HERDataset(train=False, fold=fold)
        sec = by_name[names[fold]]
        assert len(ds) == sec.num_spots
        for i in range(len(ds)):
            _assert_item_matches(ds[i], sec, i)
        if names[fold] == "B1":
            np.testing.assert_array_equal(
                np.asarray(ds.label["B1"], dtype=object),
                np.asarray(sec.labels, dtype=object))

    # cumlen concat-index walk (dataset.py:190-215): align to the reference
    # instance's (set-ordered) section order, then probe the boundaries.
    ds_tr = mod.HERDataset(train=True, fold=0)
    order = [ds_tr.id2name[i] for i in range(len(ds_tr.id2name))]
    assert sorted(order) == sorted(n for n in names if n != names[0])
    expr_cat = np.concatenate([by_name[n].expression for n in order])
    pos_cat = np.concatenate([by_name[n].positions for n in order])
    assert len(ds_tr) == len(expr_cat)
    probe = {0, len(ds_tr) - 1}
    for b in ds_tr.cumlen[:-1]:
        probe.update((int(b) - 1, int(b)))
    for g in sorted(probe):
        item = ds_tr[g]
        np.testing.assert_allclose(item["expression"].numpy(), expr_cat[g],
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_array_equal(item["position"].long().numpy(),
                                      pos_cat[g])


def test_cscc_dataset_ab(ref_dataset_module, tmp_path):
    """Reference SKIN vs load_cscc: inner-join row dropping, glob-pattern
    file discovery, test-mode items for two folds."""
    mod, roots = ref_dataset_module
    rng = np.random.default_rng(43)
    names = _build_cscc_tree(roots["cscc"], roots["tmp"], rng)

    from mclstexp_tpu.data.st_dataset import load_cscc

    secs = load_cscc(str(roots["cscc"]), GENES, patch_size=224,
                     cache_dir=str(tmp_path / "cache_cscc"))
    by_name = {s.name: s for s in secs}

    for fold in (0, 7):
        ds = mod.SKIN(train=False, fold=fold)
        sec = by_name[names[fold]]
        assert len(ds) == sec.num_spots  # the no-selection spot was dropped
        for i in range(len(ds)):
            _assert_item_matches(ds[i], sec, i)

    ds_tr = mod.SKIN(train=True, fold=0)
    order = [ds_tr.id2name[i] for i in range(len(ds_tr.id2name))]
    expr_cat = np.concatenate([by_name[n].expression for n in order])
    assert len(ds_tr) == len(expr_cat)
    for g in (0, len(ds_tr) // 2, len(ds_tr) - 1):
        np.testing.assert_allclose(ds_tr[g]["expression"].numpy(),
                                   expr_cat[g], rtol=1e-6, atol=1e-7)


def test_visium_dataset_ab(ref_dataset_module, tmp_path, monkeypatch):
    """Reference TenxDataset vs load_visium_section: barcode-driven row
    order, (v1, v2) position/patch-center transposition, BGR slide, raw
    0-255 patches. Random eval-time flips/rotations are neutralized
    (random() -> 0.4 skips both flips, choice -> 0-degree rotation) so the
    patch comparison is deterministic; the eval-augment quirk itself is
    pinned by test_visium.py."""
    mod, roots = ref_dataset_module
    rng = np.random.default_rng(44)
    tmp = roots["tmp"]

    n, g = 9, 20
    w, h = 600, 500
    slide = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    Image.fromarray(slide).save(tmp / "image.tif")

    barcodes = [f"BC{i:02d}-1" for i in range(n)]
    # positions file: shuffled order + extra barcodes the filter must skip
    rows = []
    for i, bc in enumerate(barcodes):
        rows.append([bc, 1, i, i + 1,
                     int(rng.integers(130, h - 130)),
                     int(rng.integers(130, w - 130))])
    rows.append(["BC_UNUSED-1", 0, 99, 99, 200, 200])
    order = rng.permutation(len(rows))
    pd.DataFrame([rows[i] for i in order]).to_csv(
        tmp / "tissue_positions_list.csv", header=False, index=False)
    with gzip.open(tmp / "barcodes.tsv.gz", "wt") as f:
        f.write("".join(bc + "\n" for bc in barcodes))
    reduced = rng.normal(size=(g, n)).astype(np.float32)
    np.save(tmp / "preprocessed_matrix.npy", reduced)

    ds = mod.TenxDataset(image_path=str(tmp / "image.tif"),
                         spatial_pos_path=str(tmp / "tissue_positions_list.csv"),
                         barcode_path=str(tmp / "barcodes.tsv.gz"),
                         reduced_mtx_path=str(tmp / "preprocessed_matrix.npy"))

    import random as _random

    monkeypatch.setattr(_random, "random", lambda: 0.4)
    monkeypatch.setattr(_random, "choice", lambda seq: 0)

    from mclstexp_tpu.data.visium import load_visium_section

    sec = load_visium_section(
        name="synthetic",
        image_path=str(tmp / "image.tif"),
        spatial_pos_path=str(tmp / "tissue_positions_list.csv"),
        barcode_path=str(tmp / "barcodes.tsv.gz"),
        reduced_mtx_path=str(tmp / "preprocessed_matrix.npy"),
        patch_size=224,
    )

    assert len(ds) == sec.num_spots == n
    for i in range(n):
        item = ds[i]
        np.testing.assert_allclose(item["expression"].numpy(),
                                   sec.expression[i], rtol=1e-6)
        np.testing.assert_array_equal(item["position"].long().numpy(),
                                      sec.positions[i])
        # raw 0-255 BGR patch (dataset.py:310,336); ours is the uint8 cache
        ours = np.transpose(sec.patches[i], (2, 0, 1)).astype(np.float32)
        np.testing.assert_array_equal(item["image"].numpy(), ours)
