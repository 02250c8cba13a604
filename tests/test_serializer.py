"""Reference-format codec tests: byte-level round trips of the Rust
workspace's on-disk formats, and whole-index export -> import equality."""

import struct

import numpy as np
import jax.numpy as jnp

from hnsw_rs_tpu import HNSW
from hnsw_rs_tpu.utils import load_bf_data, save_bf_data, split
from hnsw_rs_tpu.utils.serializer import (
    export_reference_index,
    import_reference_index,
    read_layer,
    read_params,
    read_points,
    write_layer,
    write_params,
    write_points,
)
from hnsw_rs_tpu.ops import quantize
from hnsw_rs_tpu.utils import gen_rand_vecs


def test_points_roundtrip(tmp_path):
    vecs = gen_rand_vecs(20, 8, seed=0)
    codes, scales = (np.asarray(a) for a in quantize(jnp.asarray(vecs)))
    levels = np.random.default_rng(0).integers(0, 4, 20).astype(np.int32)
    p = str(tmp_path / "points")
    write_points(p, codes, scales, levels)
    c2, s2, l2 = read_points(p)
    np.testing.assert_array_equal(codes, c2)
    np.testing.assert_array_equal(scales, s2)
    np.testing.assert_array_equal(levels, l2)


def test_points_binary_layout(tmp_path):
    # byte-level check against the reference spec: u64 count | u64 size |
    # per point u8 level, f32 BE min, f32 BE delta, codes
    codes = np.asarray([[7, 9]], np.uint8)
    scales = np.asarray([[0.5, 0.25]], np.float32)
    p = str(tmp_path / "points")
    write_points(p, codes, scales, np.asarray([3], np.int32))
    raw = open(p, "rb").read()
    assert struct.unpack(">QQ", raw[:16]) == (1, 11)
    assert raw[16] == 3
    assert struct.unpack(">f", raw[17:21])[0] == 0.5
    assert struct.unpack(">f", raw[21:25])[0] == 0.25
    assert raw[25:] == bytes([7, 9])


def test_params_roundtrip(tmp_path):
    p = dict(m=12, mmax=12, mmax0=24, ml=0.40242961, ef_cons=24, dim=50, ep=269)
    path = str(tmp_path / "params")
    write_params(path, p)
    got = read_params(path)
    assert got["m"] == 12 and got["ep"] == 269 and got["dim"] == 50
    assert abs(got["ml"] - p["ml"]) < 1e-7
    assert len(open(path, "rb").read()) == 52  # actual written size


def test_layer_roundtrip(tmp_path):
    n, m = 10, 4
    adj = np.full((n, m), -1, np.int32)
    adj[2] = [3, 5, -1, -1]
    adj[3] = [2, -1, -1, -1]
    adj[5] = [2, 3, 7, 9]
    member = np.zeros(n, bool)
    member[[2, 3, 5, 7, 9]] = True
    path = str(tmp_path / "0")
    write_layer(path, 1, adj, member)
    level, adj2 = read_layer(path, n)
    assert level == 1
    np.testing.assert_array_equal(adj2[member], adj[member])
    assert np.all(adj2[~member] == -1)


def test_whole_index_export_import(tmp_path):
    vecs = gen_rand_vecs(120, 12, seed=1)
    index = HNSW(8, dim=12)
    index.insert_bulk(vecs)
    path = str(tmp_path / "refidx")
    export_reference_index(index, path)
    loaded = import_reference_index(path)
    assert len(loaded) == len(index)
    assert loaded.params.ep == index.params.ep
    np.testing.assert_array_equal(loaded.points.levels, index.points.levels)
    for l in range(len(index.graph)):
        a = np.asarray(index.graph.get_layer(l))
        b = np.asarray(loaded.graph.get_layer(l))
        for i in range(len(index)):
            assert set(a[i][a[i] >= 0]) == set(b[i][b[i] >= 0]), (l, i)
    # identical query answers
    q = gen_rand_vecs(5, 12, seed=2)
    np.testing.assert_array_equal(
        index.ann_batch(q, 5, 30)[1], loaded.ann_batch(q, 5, 30)[1]
    )


def test_split_and_bf_fixtures(tmp_path):
    parts = split(10, 3)
    assert [len(p) for p in parts] == [3, 4, 3] or sum(len(p) for p in parts) == 10
    assert np.concatenate(parts).tolist() == list(range(10))
    nn = np.asarray([[1, 2], [0, 2], [0, 1]], np.int32)
    path = str(tmp_path / "bf.json")
    save_bf_data(path, nn)
    np.testing.assert_array_equal(load_bf_data(path), nn)
