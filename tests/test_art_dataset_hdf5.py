"""ArtDataset hdf5-dump decode path: the reference's decode.py (231-246)
selects ``*.h5`` + ``read_hdf5(x, "feats")`` for a2w/art/ph2a/ph2m/a2m
dumpdir decoding when ``format: hdf5`` — our ArtDataset must honor the
same query/load_fn dispatch."""

import numpy as np

from articulatory_tpu.data.datasets import ArtDataset
from articulatory_tpu.utils.io import read_hdf5, write_hdf5


def _make_h5_dump(root, rng, n=3, dim=13):
    arrays = {}
    for i in range(n):
        utt = f"utt{i:02d}"
        arr = rng.standard_normal((50 + 10 * i, dim)).astype(np.float32)
        write_hdf5(f"{root}/{utt}.h5", "feats", arr)
        arrays[utt] = arr
    return arrays


def test_art_dataset_hdf5_dump(tmp_path, rng):
    arrays = _make_h5_dump(str(tmp_path), rng)
    ds = ArtDataset(str(tmp_path), query="*.h5",
                    load_fn=lambda x: read_hdf5(x, "feats"),
                    return_utt_id=True)
    assert len(ds) == len(arrays)
    for utt_id, art in (ds[i] for i in range(len(ds))):
        np.testing.assert_array_equal(art, arrays[utt_id])


def test_art_dataset_hdf5_length_threshold(tmp_path, rng):
    _make_h5_dump(str(tmp_path), rng)
    # thresholds must be applied with the hdf5 load_fn, not np.load
    ds = ArtDataset(str(tmp_path), query="*.h5",
                    load_fn=lambda x: read_hdf5(x, "feats"),
                    length_threshold=55, return_utt_id=True)
    assert [u for u, _ in (ds[i] for i in range(len(ds)))] == ["utt01", "utt02"]


def test_art_dataset_npy_default_unchanged(tmp_path, rng):
    arr = rng.standard_normal((40, 13)).astype(np.float32)
    np.save(str(tmp_path / "utt00.npy"), arr)
    ds = ArtDataset(str(tmp_path), query="*.npy")
    np.testing.assert_array_equal(ds[0], arr)
