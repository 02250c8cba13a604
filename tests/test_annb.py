"""ann-benchmarks adapter: drives the BaseANN protocol exactly as the
harness does (fit -> set_query_arguments -> query/batch_query) and checks
recall against the exact baseline adapter."""

import numpy as np
import pytest

from hnsw_rs_tpu.annb import (
    ANNBenchmarksFlat,
    ANNBenchmarksHNSW,
    ANNBenchmarksIVF,
)
from hnsw_rs_tpu.utils import gen_rand_vecs


def _recall(ids, truth, k):
    return np.mean([len(set(a[:k]) & set(t[:k])) / k for a, t in zip(ids, truth)])


@pytest.mark.parametrize("metric", ["euclidean", "angular"])
def test_adapter_protocol_and_recall(metric):
    train = gen_rand_vecs(1200, 24, seed=0)
    test = gen_rand_vecs(32, 24, seed=1)

    exact = ANNBenchmarksFlat(metric)
    exact.fit(train)
    exact.batch_query(test, 10)
    truth = exact.get_batch_results()

    algo = ANNBenchmarksHNSW(metric, {"M": 12, "efConstruction": 64})
    algo.fit(train)
    algo.set_query_arguments(80)
    algo.batch_query(test, 10)
    assert _recall(algo.get_batch_results(), truth, 10) >= 0.95
    # single-query path agrees with the batch path
    one = algo.query(test[0], 10)
    assert list(one) == list(algo.get_batch_results()[0])
    assert algo.get_memory_usage() > 0
    assert "M=12" in str(algo)


def test_adapter_ivf():
    train = gen_rand_vecs(1500, 16, seed=2)
    test = gen_rand_vecs(24, 16, seed=3)
    exact = ANNBenchmarksFlat("euclidean")
    exact.fit(train)
    exact.batch_query(test, 10)
    truth = exact.get_batch_results()
    algo = ANNBenchmarksIVF("euclidean", {"n_list": 30})
    algo.fit(train)
    algo.set_query_arguments(30)  # probe everything -> exact
    algo.batch_query(test, 10)
    assert _recall(algo.get_batch_results(), truth, 10) == 1.0


def test_adapter_rejects_unknown_metric():
    with pytest.raises(ValueError):
        ANNBenchmarksHNSW("hamming")
