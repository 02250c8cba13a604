"""Native C++ host runtime: GloVe parser and pread block IO vs the pure
Python implementations."""

import os

import numpy as np
import pytest

from conftest import TEST_DATA
from hnsw_rs_tpu.native import get_lib, load_glove_native, pread_block


pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native toolchain unavailable"
)


def python_load(path, limit=0):
    words, vecs = [], []
    with open(path) as f:
        for i, line in enumerate(f):
            if limit and i >= limit:
                break
            parts = line.rstrip("\n").split(" ")
            words.append(parts[0])
            vecs.append(np.asarray(parts[1:], np.float32))
    return words, np.stack(vecs)


def test_native_glove_matches_python():
    path = os.path.join(TEST_DATA, "store.txt")
    pw, pv = python_load(path)
    nw, nv = load_glove_native(path)
    assert nw == pw
    assert nv.shape == pv.shape
    np.testing.assert_allclose(nv, pv, rtol=0, atol=2e-6)


def test_native_glove_limit():
    path = os.path.join(TEST_DATA, "store.txt")
    nw, nv = load_glove_native(path, limit=17)
    assert len(nw) == 17 and nv.shape[0] == 17


def test_native_ragged_raises(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("a 1.0 2.0\nb 1.0\n")
    with pytest.raises(ValueError):
        load_glove_native(str(p))


def test_pread_block(tmp_path):
    p = tmp_path / "blob"
    data = np.arange(256, dtype=np.uint8)
    p.write_bytes(data.tobytes())
    got = pread_block(str(p), 100, 32)
    np.testing.assert_array_equal(got, data[100:132])


def test_native_speedup():
    path = os.path.join(TEST_DATA, "store.txt")
    import time

    t0 = time.perf_counter()
    python_load(path)
    py = time.perf_counter() - t0
    t0 = time.perf_counter()
    load_glove_native(path)
    nat = time.perf_counter() - t0
    # not a strict perf gate, just a sanity ratio
    assert nat < py, f"native {nat:.4f}s not faster than python {py:.4f}s"


def test_native_packed_row_assembly_matches_numpy(tmp_path):
    # the C++ cold-tier assembler must emit byte-identical pack_layer rows
    import jax

    from hnsw_rs_tpu import HNSW
    from hnsw_rs_tpu.models.paged import PagedHNSW, save_paged
    from hnsw_rs_tpu.native import assemble_packed_rows, get_lib
    from hnsw_rs_tpu.utils import gen_rand_vecs

    if get_lib() is None:
        import pytest

        pytest.skip("native library unavailable")
    vecs = gen_rand_vecs(300, 12, seed=44)
    index = HNSW(6, ef_cons=24, dim=12)
    index.insert_bulk(vecs)
    path = str(tmp_path / "p")
    save_paged(index, path)
    pg = PagedHNSW(path)
    ids = np.asarray([0, 5, 7, 123, 299, 150])
    native = assemble_packed_rows(
        pg._adj_path, pg.n, pg.adj0.shape[1], pg._blocks_path,
        pg.store.dim, pg.store.max_per_block, ids,
    )
    assert native is not None
    # numpy reference path (skip the native shortcut inside)
    cap, d = pg.adj0.shape[1], pg.store.dim
    adj = np.asarray(pg.adj0[ids])
    safe = np.where(adj >= 0, adj, 0).ravel()
    codes, scales = pg._codes_scales(safe)
    ref = np.concatenate(
        [
            codes.reshape(ids.size, cap * d),
            scales.view(np.uint8).reshape(ids.size, cap * 8),
            adj.astype(np.int32).view(np.uint8).reshape(ids.size, cap * 4),
        ],
        axis=1,
    )
    np.testing.assert_array_equal(native, ref)


def test_native_quantize_matches_numpy_bitwise():
    """native.quantize_rows is bit-identical to the numpy pipeline in
    ops.quant (same IEEE-754 f32 op sequence), including the delta == 0
    constant-row case and negative values."""
    from hnsw_rs_tpu.native import quantize_rows
    from hnsw_rs_tpu.ops.quant import LEVELS

    rng = np.random.default_rng(9)
    x = rng.normal(0, 3, (2048, 51)).astype(np.float32)
    x[7, :] = 1.25  # constant row -> delta == 0
    x[100:110] *= 1e-6  # tiny-range rows

    got = quantize_rows(x)
    assert got is not None

    # inline numpy reference (quantize_np would dispatch to native)
    mn = np.min(x, axis=-1, keepdims=True)
    mx = np.max(x, axis=-1, keepdims=True)
    delta = (mx - mn) / np.float32(LEVELS)
    safe = np.where(delta > 0.0, delta, 1.0).astype(np.float32)
    t = np.where(delta > 0.0, (x - mn) / safe, 0.0).astype(np.float32)
    codes = np.clip(np.floor(t + np.float32(0.5)), 0.0, LEVELS).astype(np.uint8)
    scales = np.concatenate([mn, delta], axis=-1).astype(np.float32)

    np.testing.assert_array_equal(got[0], codes)
    np.testing.assert_array_equal(got[1].view(np.uint32), scales.view(np.uint32))
