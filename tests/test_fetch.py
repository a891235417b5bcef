"""Dataset onboarding: `cli fetch` + gzipped-archive loader fallbacks."""

import gzip
import os
import shutil

import numpy as np
import pytest

from mclstexp_tpu.cli.main import main
from mclstexp_tpu.data.fetch import CSCC_TAR_URL, HER2ST_GIT, fetch_commands


def test_fetch_commands():
    her = fetch_commands("her2st", "/d")
    assert her == [["git", "clone", HER2ST_GIT, "/d/her2st"]]
    cscc = fetch_commands("cscc", "/d")
    assert cscc[0][0] == "curl" and CSCC_TAR_URL in cscc[0]
    assert cscc[1][0] == "tar"
    assert fetch_commands("visium", "/d") == []
    with pytest.raises(ValueError, match="unknown dataset"):
        fetch_commands("nope", "/d")


def test_fetch_cli_dry_run(tmp_path, capsys):
    """--dry-run prints every command + next steps, touches no network."""
    for ds, needle in (("her2st", "git clone"), ("cscc", "curl"),
                       ("visium", "10xgenomics.com")):
        rc = main(["fetch", ds, "--dest", str(tmp_path), "--dry-run"])
        assert rc == 0
        out = capsys.readouterr().out
        assert needle in out
        assert "--data-root" in out or "data-root" in out


def test_her2st_gz_counts_fallback(tmp_path, rng):
    """cli fetch her2st leaves gzipped counts; the loader reads them."""
    pd = pytest.importorskip("pandas")
    from mclstexp_tpu.data.st_dataset import load_her2st_section

    (tmp_path / "ST-cnts").mkdir()
    (tmp_path / "ST-spotfiles").mkdir()
    ids = ["10x12", "11x13"]
    df = pd.DataFrame(rng.integers(1, 9, size=(2, 3)),
                      index=ids, columns=["g1", "g2", "g3"])
    with gzip.open(tmp_path / "ST-cnts" / "A2.tsv.gz", "wt") as f:
        f.write(df.to_csv(sep="\t"))
    pd.DataFrame({"x": [10.1, 11.0], "y": [12.0, 13.0],
                  "pixel_x": [50.5, 60.5], "pixel_y": [40.2, 45.9]}).to_csv(
        tmp_path / "ST-spotfiles" / "A2_selection.tsv", sep="\t", index=False)
    sec = load_her2st_section(str(tmp_path), "A2", ["g1", "g2", "g3"],
                              with_patches=False)
    assert sec.num_spots == 2
    np.testing.assert_array_equal(sec.centers, [[50, 40], [60, 45]])


def test_cscc_gz_fallback(tmp_path, rng):
    pd = pytest.importorskip("pandas")
    from mclstexp_tpu.data.st_dataset import load_cscc_section

    ids = ["5x6", "7x8"]
    df = pd.DataFrame(rng.integers(1, 9, size=(2, 2)),
                      index=ids, columns=["g1", "g2"])
    with gzip.open(tmp_path / "GSM1_P2_ST_rep1_stdata.tsv.gz", "wt") as f:
        f.write(df.to_csv(sep="\t"))
    with gzip.open(tmp_path / "spot_data-selection-P2_ST_rep1.tsv.gz", "wt") as f:
        f.write(pd.DataFrame({"x": [5.0, 7.1], "y": [6.0, 7.9],
                              "pixel_x": [20.0, 30.0],
                              "pixel_y": [25.0, 35.0]}).to_csv(
            sep="\t", index=False))
    sec = load_cscc_section(str(tmp_path), "P2_ST_rep1", ["g1", "g2"],
                            with_patches=False)
    assert sec.num_spots == 2


@pytest.mark.skipif(shutil.which("git") is None, reason="git unavailable")
def test_fetch_her2st_executes_clone(tmp_path, monkeypatch):
    """The non-dry-run path actually runs the clone (against a local
    file:// source so no network is needed)."""
    import subprocess

    src = tmp_path / "upstream"
    src.mkdir()
    (src / "data").mkdir()
    (src / "data" / "marker.txt").write_text("x")
    env = {**os.environ, "GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t",
           "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@t"}
    subprocess.check_call(["git", "init", "-q"], cwd=src, env=env)
    subprocess.check_call(["git", "add", "."], cwd=src, env=env)
    subprocess.check_call(["git", "commit", "-qm", "init"], cwd=src, env=env)

    import mclstexp_tpu.data.fetch as fetch_mod

    monkeypatch.setattr(fetch_mod, "HER2ST_GIT", str(src))
    # fetch_commands reads the module constant at call time
    monkeypatch.setattr(
        fetch_mod, "fetch_commands",
        lambda ds, dest: [["git", "clone", str(src),
                           os.path.join(dest, "her2st")]])
    dest = tmp_path / "dl"
    rc = fetch_mod.fetch("her2st", str(dest))
    assert rc == 0
    assert (dest / "her2st" / "data" / "marker.txt").exists()
