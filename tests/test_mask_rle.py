"""RLE codec tests: native/numpy agreement + roundtrips."""

import numpy as np
import pytest

from gdrnpp_bop2022_tpu.utils import mask_rle as M


@pytest.fixture(params=["native", "numpy"])
def backend(request, monkeypatch):
    if request.param == "numpy":
        monkeypatch.setattr(M, "_load_native", lambda: None)
    else:
        if M._load_native() is None:
            pytest.skip("native lib unavailable")
    return request.param


def _random_mask(rs, h=37, w=53):
    return (rs.uniform(size=(h, w)) > 0.6).astype(np.uint8)


def test_counts_roundtrip(backend):
    rs = np.random.RandomState(0)
    m = _random_mask(rs)
    counts = M.mask_to_counts(m)
    back = M.counts_to_mask(counts, *m.shape)
    np.testing.assert_array_equal(back, m)


def test_string_roundtrip(backend):
    rs = np.random.RandomState(1)
    m = _random_mask(rs, 64, 48)
    rle = M.encode(m)
    assert isinstance(rle["counts"], bytes)
    back = M.decode(rle)
    np.testing.assert_array_equal(back, m)
    assert M.area(rle) == int(m.sum())


def test_edge_masks(backend):
    for m in (np.zeros((8, 8), np.uint8), np.ones((8, 8), np.uint8)):
        np.testing.assert_array_equal(M.decode(M.encode(m)), m)


def test_uncompressed_counts_accepted(backend):
    rs = np.random.RandomState(2)
    m = _random_mask(rs, 16, 16)
    counts = M.mask_to_counts(m)
    rle = {"size": [16, 16], "counts": counts.tolist()}
    np.testing.assert_array_equal(M.decode(rle), m)


def test_native_numpy_agree():
    if M._load_native() is None:
        pytest.skip("native lib unavailable")
    rs = np.random.RandomState(3)
    m = _random_mask(rs, 41, 29)
    native_counts = M.mask_to_counts(m)
    native_str = M.counts_to_string(native_counts)
    # force numpy paths
    import types
    flat = m.flatten(order="F")
    changes = np.nonzero(np.diff(flat))[0] + 1
    bounds = np.concatenate([[0], changes, [flat.size]])
    np_counts = np.diff(bounds).astype(np.uint32)
    if flat[0] == 1:
        np_counts = np.concatenate([[np.uint32(0)], np_counts])
    np.testing.assert_array_equal(native_counts, np_counts)
    assert M.string_to_counts(native_str).tolist() == native_counts.tolist()
