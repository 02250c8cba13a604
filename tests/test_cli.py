"""eval_glove CLI smoke test (the eval_glove binary analogue)."""

import os

import numpy as np

from conftest import TEST_DATA
from hnsw_rs_tpu.eval_glove import main, recall_at_k


def test_recall_at_k():
    ann = np.asarray([[1, 2, 3], [4, 5, 6]])
    truth = np.asarray([[1, 2, 9], [6, 5, 4]])
    assert recall_at_k(ann, truth, 3) == (2 / 3 + 1) / 2


def test_eval_cli_end_to_end(tmp_path, capsys):
    rc = main([
        "--store", os.path.join(TEST_DATA, "store.txt"),
        "--queries", os.path.join(TEST_DATA, "queries.txt"),
        "--lim", "300", "--m", "8", "--ef", "64",
        "--save", str(tmp_path / "idx"), "--quiet",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "recall@10" in out
    assert os.path.exists(tmp_path / "idx" / "arrays.npz")
    # reload path
    rc = main([
        "--store", os.path.join(TEST_DATA, "store.txt"),
        "--lim", "300", "--ef", "64", "--load", str(tmp_path / "idx"),
        "--quiet",
    ])
    assert rc == 0
