"""End-to-end quality gate: GloVe recall@10 > 0.99 at ef=100, M=12, plus
degree sanity — the reference's ``hnsw_glove_build_eval``
(``hnsw/src/template.rs:519-572``) with repo-relative paths."""

import os

import numpy as np

from conftest import TEST_DATA
from hnsw_rs_tpu import HNSW
from hnsw_rs_tpu.utils import brute_force_nns, load_glove_array

M = 12
EF = 100
K = 10


def test_glove_recall_gate():
    _, stored = load_glove_array(os.path.join(TEST_DATA, "store.txt"))
    _, queries = load_glove_array(os.path.join(TEST_DATA, "queries.txt"))
    assert stored.shape[0] == 1000 and queries.shape[0] == 100

    index = HNSW(M, dim=stored.shape[1])
    index.insert_bulk(stored)

    truth = brute_force_nns(queries, index.points.codes, index.points.scales, K)
    _, ann = index.ann_batch(queries, K, EF)

    hits = sum(
        len(set(ann[i].tolist()) & set(truth[i].tolist())) for i in range(len(queries))
    )
    recall = hits / (len(queries) * K)
    print(f"recall@{K} = {recall}")
    assert recall > 0.99, f"recall@{K} = {recall}"

    # degree sanity (template.rs:556-571): no isolated member nodes
    assert index.assert_param_compliance(verbose=True)
