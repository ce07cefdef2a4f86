# tests/test_dataloader.py
"""Dataset/DataLoader/scalers tests (reference tests/test_dataloader.py
coverage: sharding equivalence, splits, k-fold coverage, batch counts,
infinite cycling, scaler round-trips), plus the TPU stacked-batch bridge."""

import numpy as np
import pytest

import gpmp_tpu.num as gnp
from gpmp_tpu.dataloader import (
    DataLoader,
    Dataset,
    MinMaxScaler,
    Normalizer,
    ObservationScaler,
    RobustScaler,
    collate_batches,
)


def _data(n=20, d=3, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d))
    z = rng.normal(size=(n,))
    return x, z


def test_sharded_equals_unsharded():
    x, z = _data(20)
    ds1 = Dataset(gnp.asarray(x), gnp.asarray(z))
    ds2 = Dataset(
        [gnp.asarray(x[:7]), gnp.asarray(x[7:15]), gnp.asarray(x[15:])],
        [gnp.asarray(z[:7]), gnp.asarray(z[7:15]), gnp.asarray(z[15:])],
    )
    assert len(ds1) == len(ds2) == 20
    for i in [0, 6, 7, 14, 15, 19]:
        x1, z1 = ds1[i]
        x2, z2 = ds2[i]
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
        np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))


def test_subset_preserves_data():
    x, z = _data(15)
    ds = Dataset([gnp.asarray(x[:8]), gnp.asarray(x[8:])],
                 [gnp.asarray(z[:8]), gnp.asarray(z[8:])])
    sub = ds.subset(np.array([2, 5, 9, 13]))
    assert len(sub) == 4
    xs = np.concatenate([np.asarray(s) for s in sub.x_list])
    np.testing.assert_allclose(xs, x[[2, 5, 9, 13]])


def test_split_ratios_and_coverage():
    x, z = _data(100)
    ds = Dataset(gnp.asarray(x), gnp.asarray(z))
    tr, va, te = Dataset.split(ds, (0.8, 0.1, 0.1), seed=3)
    assert len(tr) == 80 and len(va) == 10 and len(te) == 10
    # same seed -> same split
    tr2, _, _ = Dataset.split(ds, (0.8, 0.1, 0.1), seed=3)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(s) for s in tr.x_list]),
        np.concatenate([np.asarray(s) for s in tr2.x_list]),
    )


def test_k_fold_exhaustive_coverage():
    folds = Dataset.k_fold_indices(23, 4, seed=1)
    assert len(folds) == 4
    all_val = np.sort(np.concatenate([v for _t, v in folds]))
    np.testing.assert_array_equal(all_val, np.arange(23))
    for train, val in folds:
        assert len(np.intersect1d(train, val)) == 0
        assert len(train) + len(val) == 23


def test_repeated_k_fold():
    folds = Dataset.repeated_k_fold_indices(10, 2, 3, seed=5)
    assert len(folds) == 6


def test_reductions():
    x, z = _data(30)
    ds = Dataset([gnp.asarray(x[:11]), gnp.asarray(x[11:])],
                 [gnp.asarray(z[:11]), gnp.asarray(z[11:])])
    np.testing.assert_allclose(np.asarray(ds.x_min()), x.min(axis=0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ds.x_max()), x.max(axis=0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ds.x_mean()), x.mean(axis=0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ds.x_var()), x.var(axis=0, ddof=1),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ds.z_median()), np.median(z), rtol=1e-12)


def test_batch_counts_and_drop_last():
    x, z = _data(23)
    ds = Dataset(gnp.asarray(x), gnp.asarray(z))
    dl = DataLoader(ds, batch_size=5, shuffle=False)
    assert len(dl) == 5
    batches = list(dl)
    assert len(batches) == 5
    assert batches[-1][0].shape[0] == 3
    dl2 = DataLoader(ds, batch_size=5, shuffle=False, drop_last=True)
    assert len(dl2) == 4
    assert all(b[0].shape[0] == 5 for b in list(dl2))


def test_epoch_deterministic_shuffling():
    x, z = _data(16)
    ds = Dataset(gnp.asarray(x), gnp.asarray(z))
    dl = DataLoader(ds, batch_size=4, shuffle=True, seed=7)
    dl.set_epoch(0)
    b0 = [np.asarray(xb) for xb, _ in dl]
    dl.set_epoch(0)
    b1 = [np.asarray(xb) for xb, _ in dl]
    for a, b in zip(b0, b1):
        np.testing.assert_array_equal(a, b)


def test_infinite_cycling():
    x, z = _data(6)
    ds = Dataset(gnp.asarray(x), gnp.asarray(z))
    dl = DataLoader(ds, batch_size=3, shuffle=False, infinite=True)
    it = iter(dl)
    batches = [next(it) for _ in range(5)]
    assert len(batches) == 5


def test_indexing_requires_no_shuffle():
    x, z = _data(10)
    ds = Dataset(gnp.asarray(x), gnp.asarray(z))
    dl = DataLoader(ds, batch_size=4, shuffle=False)
    xb, zb = dl[1]
    np.testing.assert_allclose(np.asarray(xb), x[4:8])
    with pytest.raises(RuntimeError):
        DataLoader(ds, batch_size=4, shuffle=True)[0]


def test_reduce_mean_weighted():
    x, z = _data(10)
    ds = Dataset(gnp.asarray(x), gnp.asarray(z))
    dl = DataLoader(ds, batch_size=4, shuffle=False)
    m = dl.reduce_mean(lambda xb, zb: gnp.mean(zb))
    # weighted mean of per-batch means == global mean
    np.testing.assert_allclose(float(m), z.mean(), rtol=1e-12)


def test_scalers_roundtrip():
    x, _ = _data(50, 4)
    xj = gnp.asarray(x)
    for scaler in [Normalizer.fit(xj), RobustScaler.fit(xj), MinMaxScaler.fit(xj)]:
        xt = scaler.transform(xj)
        xb = scaler.inverse_transform(xt)
        np.testing.assert_allclose(np.asarray(xb), x, rtol=1e-10, atol=1e-12)
    z = np.random.default_rng(0).normal(size=50)
    zs = ObservationScaler.fit(gnp.asarray(z))
    np.testing.assert_allclose(
        np.asarray(zs.inverse_transform(zs.transform(gnp.asarray(z)))), z,
        rtol=1e-10,
    )


def test_collate_batches():
    x, z = _data(10)
    ds = Dataset(gnp.asarray(x), gnp.asarray(z))
    dl = DataLoader(ds, batch_size=3, shuffle=False)
    xf, zf = collate_batches(list(dl))
    np.testing.assert_allclose(np.asarray(xf), x)
    with pytest.raises(ValueError):
        collate_batches([])


def test_as_stacked_batches_bridge():
    x, z = _data(32, 2)
    ds = Dataset(gnp.asarray(x), gnp.asarray(z))
    dl = DataLoader(ds, batch_size=8, shuffle=False)
    xb, zb = dl.as_stacked_batches()
    assert xb.shape == (4, 8, 2)
    assert zb.shape == (4, 8)
    np.testing.assert_allclose(np.asarray(xb).reshape(32, 2), x)


def test_dataloader_dataset_stat_properties():
    """dataset_{x,z}_{stat} properties forward to the Dataset reductions
    (reference dataloader.py:516-532)."""
    import numpy as np
    from gpmp_tpu.dataloader import Dataset, DataLoader

    rng = np.random.default_rng(0)
    x = rng.normal(size=(50, 2))
    z = rng.normal(size=50)
    loader = DataLoader(Dataset(x, z), batch_size=10)
    np.testing.assert_allclose(np.asarray(loader.dataset_x_mean()),
                               x.mean(axis=0), rtol=1e-12)
    np.testing.assert_allclose(float(loader.dataset_z_std()),
                               z.std(ddof=1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(loader.dataset_x_min()),
                               x.min(axis=0), rtol=1e-12)
