"""Protocol-level A/B: execute the reference's OWN phase-B eval scripts.

The model-level A/B (test_reference_ab.py) pins forward/grad/Adam parity,
and the retrieval math is golden-tested against a NumPy transcription
(test_retrieval.py) — but the *protocol composition* (key-concat ordering
across the kept sections, the auto-transpose heuristics, per-fold metric
computation, the 4-average aggregation) had only been verified against
reimplementations. These tests run the reference's own fold loops —
``/root/reference/evel_cscc.py:136-261`` and ``evel_her2st.py:120-226``
(pure NumPy/torch-CPU once phase A is skipped via SAVE_EMBEDDINGS=False) —
on synthetic reference-layout dumps, and assert their four printed averages
match ``cli eval --from-embeddings`` on the same dumps, all folds.

Execution patches (each the minimal edit that lets the shipped flow run in
this environment, none touching protocol logic):
  * the three phase-A-only imports (``from model/dataset/train import …``)
    are removed — SAVE_EMBEDDINGS is False (evel_cscc.py:120), so they are
    only needed for the dump-writing branch we don't run;
  * the two hard-coded Windows paths (``D:\\dataset\\Her2st\\…`` gene list,
    evel_cscc.py:235 / evel_her2st.py:196; ST-cnts listing,
    evel_her2st.py:122) point at the synthetic tree;
  * ``anndata`` (absent here) is stubbed with a faithful minimal AnnData
    (X + var_names + column-selection by name — the only surface the
    scripts touch);
  * evel_cscc.py only: ``mean_squared_error``/``mean_absolute_error`` are
    injected into the script globals. The script first USES them at
    evel_cscc.py:230-233 but only imports them at :256, at the END of the
    first fold iteration — a latent NameError when run top-to-bottom (the
    authors evidently ran it in a session where sklearn was already
    imported). evel_her2st.py imports before use and needs no injection.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import sys

import numpy as np
import pytest


pytestmark = pytest.mark.slow

REFERENCE_DIR = "/root/reference"


# ---------------------------------------------------------------- anndata stub
class _AnnData:
    """Minimal anndata.AnnData: the scripts use X, shape, var_names
    (set + fancy-index), and [:, list-of-names] column selection."""

    def __init__(self, X):
        self.X = np.asarray(X)
        self._var_names = None

    @property
    def shape(self):
        return self.X.shape

    @property
    def var_names(self):
        return self._var_names

    @var_names.setter
    def var_names(self, names):
        self._var_names = np.asarray(list(names), dtype=object)

    def __getitem__(self, key):
        rows, cols = key
        pos = {n: i for i, n in enumerate(self._var_names)}
        idx = np.asarray([pos[n] for n in np.asarray(cols, dtype=object)])
        out = _AnnData(self.X[rows][:, idx])
        out.var_names = self._var_names[idx]
        return out


class _AnnDataModule:
    AnnData = _AnnData


# ------------------------------------------------------------ synthetic dumps
def _make_dataset(rng, sizes, n_genes, proj=256):
    """Per-section (expression (N,G), spot-emb (N,P), img-emb (N,P)) with
    image embeddings that weakly encode expression (finite, non-degenerate
    metrics). Gene index -1 is all-zero: its PCC is NaN, exercising the
    reference's NaN-drop (evel_her2st.py:212) on both sides."""
    w = rng.normal(size=(n_genes, proj)).astype(np.float32)
    exprs, spots, imgs = [], [], []
    for n in sizes:
        e = np.abs(rng.normal(size=(n, n_genes))).astype(np.float32)
        e[:, -1] = 0.0
        s = (e @ w + 0.1 * rng.normal(size=(n, proj))).astype(np.float32)
        i = (s + 0.05 * rng.normal(size=(n, proj))).astype(np.float32)
        exprs.append(e)
        spots.append(s)
        imgs.append(i)
    return exprs, spots, imgs


def _write_reference_tree(root, dataset_dirname, result_dirname, names,
                          exprs, spots, imgs):
    """The on-disk layout the reference phase B reads, rooted at cwd:
    expressions at ``./data/preprocessed_expression_matrices/<ds>/<name>/
    preprocessed_matrix.npy`` (genes x spots, evel_cscc.py:136) and
    per-fold transposed dumps at ``./embedding_result/<res>/embeddings_<f>/``
    (evel_cscc.py:169-171)."""
    for name, e in zip(names, exprs):
        d = os.path.join(root, "data", "preprocessed_expression_matrices",
                         dataset_dirname, name)
        os.makedirs(d, exist_ok=True)
        np.save(os.path.join(d, "preprocessed_matrix.npy"), e.T)
    dumps = os.path.join(root, "embedding_result", result_dirname)
    for fold in range(len(names)):
        d = os.path.join(dumps, f"embeddings_{fold}")
        os.makedirs(d, exist_ok=True)
        for i, (sp, im) in enumerate(zip(spots, imgs)):
            np.save(os.path.join(d, f"spot_embeddings_{i + 1}.npy"), sp.T)
            np.save(os.path.join(d, f"img_embeddings_{i + 1}.npy"), im.T)
    return dumps


def _write_our_preprocessed(root, dataset, names, exprs):
    pre = os.path.join(root, "pre")
    for name, e in zip(names, exprs):
        d = os.path.join(pre, dataset, name)
        os.makedirs(d, exist_ok=True)
        np.save(os.path.join(d, "preprocessed_matrix.npy"), e.T)
    return pre


# ------------------------------------------------------- reference execution
def _run_reference_script(script_path, patches, inject=None):
    """Exec the patched reference script top-to-bottom in its own globals,
    with /root/reference importable (evel_her2st.py does
    ``from utils import get_R``) and stdout captured."""
    with open(script_path) as f:
        src = f.read()
    for old, new in patches:
        assert old in src, f"patch target not found in {script_path}: {old!r}"
        src = src.replace(old, new)
    g = {"__name__": "reference_eval_ab", "__file__": script_path}
    if inject:
        g.update(inject)
    saved_anndata = sys.modules.get("anndata")
    sys.modules["anndata"] = _AnnDataModule()
    sys.path.insert(0, REFERENCE_DIR)
    buf = io.StringIO()
    try:
        with contextlib.redirect_stdout(buf):
            exec(compile(src, script_path, "exec"), g)
    finally:
        sys.path.remove(REFERENCE_DIR)
        sys.modules.pop("utils", None)
        if saved_anndata is not None:
            sys.modules["anndata"] = saved_anndata
        else:
            sys.modules.pop("anndata", None)
    return buf.getvalue()


def _parse_averages(stdout: str):
    """The four final prints (evel_cscc.py:258-261)."""
    pats = {
        "heg_pcc": r"avg heg pcc: (-?[0-9.]+)",
        "hvg_pcc": r"avg hvg pcc: (-?[0-9.]+)",
        "mse": r"Mean Squared Error \(MSE\): (-?[0-9.]+)\s*$",
        "mae": r"Mean Absolute Error \(MAE\): (-?[0-9.]+)\s*$",
    }
    out = {}
    for k, p in pats.items():
        m = re.findall(p, stdout, flags=re.MULTILINE)
        assert m, f"reference stdout missing {k}: …{stdout[-500:]}"
        out[k] = float(m[-1])  # the in-loop per-fold prints match too
    return out


def _run_our_cli(dataset, dumps, pre, tmp_path):
    from mclstexp_tpu.cli.main import main

    out_json = tmp_path / f"ours_{dataset}.json"
    rc = main(["eval", "--dataset", dataset,
               "--from-embeddings", dumps,
               "--preprocessed-root", pre,
               "--json", str(out_json)])
    assert rc == 0
    return json.loads(out_json.read_text())


def _assert_match(ref_avg, ours):
    # The reference prints 4 decimals; both sides compute in fp32 retrieval
    # + float64 metrics, so agreement is limited by the print rounding.
    for k in ("heg_pcc", "hvg_pcc", "mse", "mae"):
        assert abs(ref_avg[k] - ours["avg"][k]) <= 1.5e-4, (
            k, ref_avg[k], ours["avg"][k])


@pytest.mark.skipif(not os.path.isdir(REFERENCE_DIR),
                    reason="reference checkout not mounted")
def test_cscc_phase_b_protocol_ab(tmp_path, monkeypatch):
    """evel_cscc.py's 12-fold loop (K=600, L2 1/d^2 on unnormalized keys,
    evel_cscc.py:210-219) vs `cli eval --from-embeddings --dataset cscc`."""
    rng = np.random.default_rng(11)
    patients = ["P2", "P5", "P9", "P10"]
    names = [f"{p}_ST_{r}" for p in patients for r in ("rep1", "rep2", "rep3")]
    # datasize/10-ish: rest-of-keys per fold stays >= K=600, and no section
    # size collides with the auto-transpose sentinels (256 and n_genes)
    sizes = [66, 64, 63, 59, 52, 52, 114, 107, 118, 60, 62, 46]
    exprs, spots, imgs = _make_dataset(rng, sizes, n_genes=65)

    dumps = _write_reference_tree(str(tmp_path), "cscc_data", "cscc_result",
                                  names, exprs, spots, imgs)
    gene_npy = tmp_path / "skin_hvg_cut_1000.npy"
    np.save(gene_npy, np.asarray([f"g{i}" for i in range(65)], dtype=object),
            allow_pickle=True)

    monkeypatch.chdir(tmp_path)
    from sklearn.metrics import mean_absolute_error, mean_squared_error

    stdout = _run_reference_script(
        os.path.join(REFERENCE_DIR, "evel_cscc.py"),
        patches=[
            ("from model import mclSTExp_Attention", ""),
            ("from dataset import SKIN", ""),
            ("from train import generate_args", ""),
            ('gene_list_path = "D:\\dataset\\Her2st\\data/skin_hvg_cut_1000.npy"',
             f"gene_list_path = {str(gene_npy)!r}"),
        ],
        inject={"mean_squared_error": mean_squared_error,
                "mean_absolute_error": mean_absolute_error},
    )
    ref_avg = _parse_averages(stdout)

    pre = _write_our_preprocessed(str(tmp_path), "cscc", names, exprs)
    ours = _run_our_cli("cscc", dumps, pre, tmp_path)
    assert ours["folds"] == list(range(12))
    _assert_match(ref_avg, ours)


@pytest.mark.skipif(not os.path.isdir(REFERENCE_DIR),
                    reason="reference checkout not mounted")
def test_her2st_phase_b_protocol_ab(tmp_path, monkeypatch):
    """evel_her2st.py's 32-fold loop (K=200, L1 1/d^2 weights,
    evel_her2st.py:178-187, incl. the ST-cnts [1:33] name derivation at
    :122-124) vs `cli eval --from-embeddings --dataset her2st`."""
    rng = np.random.default_rng(13)
    # 33 two-char section files; sorted()[1:33] keeps the last 32 — the
    # reference's name derivation runs on this listing verbatim.
    all_names = [f"{c}{d}" for c in "ABCDEFGHIJK" for d in "123"][:33]
    cnts = tmp_path / "ST-cnts"
    cnts.mkdir()
    for nm in all_names:
        (cnts / f"{nm}.tsv.gz").touch()
    names = sorted(all_names)[1:33]

    sizes = [int(rng.integers(36, 61)) for _ in names]
    exprs, spots, imgs = _make_dataset(rng, sizes, n_genes=65)
    dumps = _write_reference_tree(str(tmp_path), "her2st", "her2st_result",
                                  names, exprs, spots, imgs)
    gene_npy = tmp_path / "her_hvg_cut_1000.npy"
    np.save(gene_npy, np.asarray([f"g{i}" for i in range(65)], dtype=object),
            allow_pickle=True)

    monkeypatch.chdir(tmp_path)
    stdout = _run_reference_script(
        os.path.join(REFERENCE_DIR, "evel_her2st.py"),
        patches=[
            ("from model import mclSTExp_Attention", ""),
            ("from dataset import HERDataset", ""),
            ("from train import generate_args", ""),
            ('names = os.listdir(r"D:\\dataset\\Her2st\\data/ST-cnts")',
             f"names = os.listdir({str(cnts)!r})"),
            ('gene_list_path = "D:\\dataset\\Her2st\\data/her_hvg_cut_1000.npy"',
             f"gene_list_path = {str(gene_npy)!r}"),
        ],
    )
    ref_avg = _parse_averages(stdout)

    pre = _write_our_preprocessed(str(tmp_path), "her2st", names, exprs)
    ours = _run_our_cli("her2st", dumps, pre, tmp_path)
    assert ours["folds"] == list(range(32))
    _assert_match(ref_avg, ours)


@pytest.mark.skipif(not os.path.isdir(REFERENCE_DIR),
                    reason="reference checkout not mounted")
def test_visium_phase_b_protocol_ab(tmp_path, monkeypatch):
    """evel_visium.py's 9-fold loop (K=200, L2 1/d^2 weights,
    evel_visium.py:193-205, gene list from the 1000hvg_common.pkl pandas
    Index, :221-222) vs `cli eval --from-embeddings --dataset visium`.
    Completes the protocol-A/B trio: all three reference eval scripts now
    execute against the rebuild. Phase B reads only RELATIVE paths
    (./data/…, ./embedding_result/10x_result/…), so chdir into the
    synthetic tree is the whole path patch."""
    pd = pytest.importorskip("pandas")
    import pickle as _pickle

    rng = np.random.default_rng(17)
    names = ["1142243F", "CID4290", "CID4465", "CID44971", "CID4535",
             "1160920F", "block1", "block2", "FFPE"]  # evel_visium.py:140-142
    # rest-of-keys per fold >= K=200; sizes avoid the auto-transpose
    # sentinels (256 and n_genes)
    sizes = [48, 52, 61, 62, 57, 49, 38, 40, 45]
    exprs, spots, imgs = _make_dataset(rng, sizes, n_genes=65)

    dumps = _write_reference_tree(str(tmp_path), "Alex_10x_hvg", "10x_result",
                                  names, exprs, spots, imgs)
    d = tmp_path / "data"
    with open(d / "1000hvg_common.pkl", "wb") as f:
        _pickle.dump(pd.Index([f"g{i}" for i in range(65)]), f)

    monkeypatch.chdir(tmp_path)
    stdout = _run_reference_script(
        os.path.join(REFERENCE_DIR, "evel_visium.py"),
        patches=[
            ("from model import mclSTExp_Attention", ""),
            ("from dataset import TenxDataset", ""),
            ("from train import generate_args", ""),
        ],
    )
    ref_avg = _parse_averages(stdout)

    pre = _write_our_preprocessed(str(tmp_path), "visium", names, exprs)
    ours = _run_our_cli("visium", dumps, pre, tmp_path)
    assert ours["folds"] == list(range(9))
    _assert_match(ref_avg, ours)


@pytest.mark.skipif(not os.path.isdir(REFERENCE_DIR),
                    reason="reference checkout not mounted")
def test_her2st_phase_b_tie_break_ab(tmp_path, monkeypatch):
    """Duplicate-distance ties straddling the top-K cut (VERDICT r4 #5b).

    torch.topk's choice among exactly tied scores is UNSPECIFIED (probed:
    an arbitrary subset in arbitrary order — see
    test_quirks.test_topk_tie_break_quirk), so the reference's output on
    tied keys with DISTINCT expressions is implementation-arbitrary. This
    A/B therefore pins the regime where the protocol's output IS
    well-defined: a 250-row tie group (two sections x 125 bit-identical
    spot embeddings, one shared expression row) straddles the K=200 cut
    (evel_her2st.py:174-187) for every fold that keeps both sections —
    whichever 200-subset either implementation selects, the equal 1/d^2
    weights over one expression make the prediction invariant, and the four
    printed averages must still match. Divergence here would mean the tie
    handling leaks into well-defined outputs; the distinct-expression case
    is documented as a quirk, not reproduced."""
    rng = np.random.default_rng(29)
    all_names = [f"{c}{d}" for c in "ABCDEFGHIJK" for d in "123"][:33]
    cnts = tmp_path / "ST-cnts"
    cnts.mkdir()
    for nm in all_names:
        (cnts / f"{nm}.tsv.gz").touch()
    names = sorted(all_names)[1:33]

    sizes = [int(rng.integers(36, 61)) for _ in names]
    sizes[1] = sizes[2] = 160  # 125 tied + 35 organic rows each
    exprs, spots, imgs = _make_dataset(rng, sizes, n_genes=65)

    # the tie vector: mean image embedding — ranks above every organic key
    # for essentially every query (cos ~0.8 vs ~0.64 pairwise), so the
    # 250-row group occupies ranks 1..250 and the K=200 cut falls inside it
    v = np.mean(np.concatenate(imgs), axis=0).astype(np.float32)
    x = np.abs(rng.normal(size=65)).astype(np.float32)
    x[-1] = 0.0  # keep the NaN-PCC gene all-zero
    for sec in (1, 2):
        spots[sec][:125] = v
        exprs[sec][:125] = x

    dumps = _write_reference_tree(str(tmp_path), "her2st", "her2st_result",
                                  names, exprs, spots, imgs)
    gene_npy = tmp_path / "her_hvg_cut_1000.npy"
    np.save(gene_npy, np.asarray([f"g{i}" for i in range(65)], dtype=object),
            allow_pickle=True)

    monkeypatch.chdir(tmp_path)
    stdout = _run_reference_script(
        os.path.join(REFERENCE_DIR, "evel_her2st.py"),
        patches=[
            ("from model import mclSTExp_Attention", ""),
            ("from dataset import HERDataset", ""),
            ("from train import generate_args", ""),
            ('names = os.listdir(r"D:\\dataset\\Her2st\\data/ST-cnts")',
             f"names = os.listdir({str(cnts)!r})"),
            ('gene_list_path = "D:\\dataset\\Her2st\\data/her_hvg_cut_1000.npy"',
             f"gene_list_path = {str(gene_npy)!r}"),
        ],
    )
    ref_avg = _parse_averages(stdout)

    pre = _write_our_preprocessed(str(tmp_path), "her2st", names, exprs)
    ours = _run_our_cli("her2st", dumps, pre, tmp_path)
    assert ours["folds"] == list(range(32))
    _assert_match(ref_avg, ours)
