# gpmp_tpu/dataloader.py
"""Data helpers: sharded Dataset, batching DataLoader, scalers.

API parity with /root/reference/gpmp/dataloader.py:55-648.  TPU design
notes:

- Index bookkeeping (shard bounds, permutations, fold indices) is pure
  host-side NumPy -- dynamic shapes never reach a trace; the data shards
  themselves are device (jnp) arrays.
- ``DataLoader.as_stacked_batches()`` bridges to the mesh layer: it
  returns (num_batches, b, d) stacked arrays suitable for
  ``gpmp_tpu.parallel.make_data_parallel_criterion`` (equal-size batches,
  statically shaped -- one compiled program evaluates all batches).
- Epoch-deterministic shuffling uses a dedicated numpy Generator seeded
  with ``seed + epoch`` (the reference reseeds the *global* RNG,
  dataloader.py:391-392; we avoid that side effect).
"""

import bisect
from typing import Iterator, List, Optional, Tuple, Union

import numpy as np

import gpmp_tpu.num as gnp

Array = gnp.ndarray
ArrayOrList = Union[Array, List[Array]]
_EPS = 1e-8


# ======================================================================
# Dataset
# ======================================================================
class Dataset:
    """Container for covariates x and observations z, possibly sharded.

    x and z may each be one array or a list of arrays (shards) with
    matching first-dimension lengths; indexing is lazy (no
    concatenation), with O(log #shards) lookup.
    """

    def __init__(self, x: ArrayOrList, z: ArrayOrList) -> None:
        self.x_list = x if isinstance(x, list) else [x]
        self.z_list = z if isinstance(z, list) else [z]
        self.x_list = [gnp.asarray(xi) for xi in self.x_list]
        self.z_list = [gnp.asarray(zi) for zi in self.z_list]

        assert len(self.x_list) == len(self.z_list), "x and z shard counts differ"
        for xi, zi in zip(self.x_list, self.z_list):
            assert xi.shape[0] == zi.shape[0], "shard length mismatch"

        self.size = sum(xi.shape[0] for xi in self.x_list)
        self._shard_bounds = list(np.cumsum([xi.shape[0] for xi in self.x_list]))

    def __len__(self) -> int:
        return self.size

    def __getitem__(self, idx: int):
        shard_idx = bisect.bisect_right(self._shard_bounds, idx)
        start = 0 if shard_idx == 0 else self._shard_bounds[shard_idx - 1]
        local = idx - start
        return self.x_list[shard_idx][local], self.z_list[shard_idx][local]

    def __repr__(self) -> str:
        return (
            f"{self.__class__.__name__}(size={self.size}, "
            f"shards={len(self.x_list)}, "
            f"x_shape={[tuple(x.shape) for x in self.x_list]}, "
            f"z_shape={[tuple(z.shape) for z in self.z_list]})"
        )

    # ------------------------------------------------------------- slicing
    def subset(self, indices) -> "Dataset":
        """Dataset restricted to indices; shard structure preserved."""
        indices = np.asarray(gnp.to_np(gnp.asarray(indices)))
        if indices.ndim != 1:
            raise ValueError("Subset indices must be 1D")
        indices = np.sort(indices)
        xs, zs = [], []
        shard_starts = [0] + self._shard_bounds[:-1]
        for shard_idx, (start, end) in enumerate(
            zip(shard_starts, self._shard_bounds)
        ):
            mask = (indices >= start) & (indices < end)
            if mask.any():
                local = indices[mask] - start
                xs.append(self.x_list[shard_idx][local])
                zs.append(self.z_list[shard_idx][local])
        return Dataset(xs, zs)

    # ------------------------------------------------------------- split
    @staticmethod
    def split(dataset, ratios=(0.8, 0.1, 0.1), seed: Optional[int] = None):
        """(train, val, test) random split according to ratios."""
        assert abs(sum(ratios) - 1.0) < 1e-9, "Ratios must sum to 1"
        rng = np.random.default_rng(seed)
        n = len(dataset)
        idx = rng.permutation(n)
        n_tr = int(ratios[0] * n)
        n_va = int(ratios[1] * n)
        return (
            dataset.subset(idx[:n_tr]),
            dataset.subset(idx[n_tr : n_tr + n_va]),
            dataset.subset(idx[n_tr + n_va :]),
        )

    @staticmethod
    def k_fold_indices(n_samples, n_splits, seed: Optional[int] = None):
        """k (train, val) index tuples covering all samples."""
        rng = np.random.default_rng(seed)
        idx = rng.permutation(n_samples)
        base, r = divmod(n_samples, n_splits)
        sizes = np.concatenate(
            [np.full(r, base + 1, dtype=int), np.full(n_splits - r, base, dtype=int)]
        )
        bounds = np.cumsum(sizes)[:-1]
        folds = np.split(idx, bounds)
        out = []
        for k in range(n_splits):
            val = folds[k]
            train = np.concatenate([folds[j] for j in range(n_splits) if j != k])
            out.append((train, val))
        return out

    @staticmethod
    def repeated_k_fold_indices(n_samples, n_splits, n_repeats,
                                seed: Optional[int] = None):
        """n_repeats independently shuffled k-fold splits."""
        out = []
        for r in range(n_repeats):
            out += Dataset.k_fold_indices(
                n_samples, n_splits, None if seed is None else seed + r
            )
        return out

    # ----------------------------------------------- streaming reductions
    def _reduce_min(self, x_or_z):
        lst = getattr(self, f"{x_or_z}_list")
        out = None
        for data in lst:
            m = gnp.min(data, axis=0)
            out = m if out is None else gnp.minimum(out, m)
        return out

    def _reduce_max(self, x_or_z):
        lst = getattr(self, f"{x_or_z}_list")
        out = None
        for data in lst:
            m = gnp.max(data, axis=0)
            out = m if out is None else gnp.maximum(out, m)
        return out

    def _reduce_mean(self, x_or_z):
        lst = getattr(self, f"{x_or_z}_list")
        total, n = None, 0
        for data in lst:
            s = gnp.sum(data, axis=0)
            total = s if total is None else total + s
            n += data.shape[0]
        return total / n

    def _reduce_var(self, x_or_z):
        mean = self._reduce_mean(x_or_z)
        lst = getattr(self, f"{x_or_z}_list")
        total, n = None, 0
        for data in lst:
            s = gnp.sum((data - mean) ** 2, axis=0)
            total = s if total is None else total + s
            n += data.shape[0]
        return total / (n - 1)

    def _reduce_std(self, x_or_z):
        return gnp.sqrt(self._reduce_var(x_or_z))

    def _reduce_quantile(self, x_or_z, q):
        if not (0.0 <= q <= 1.0):
            raise ValueError("quantile level q must be between 0 and 1")
        lst = getattr(self, f"{x_or_z}_list")
        data_full = gnp.concatenate(lst, axis=0)
        return gnp.percentile(data_full, q * 100.0, axis=0)

    def _reduce_quantile_approx(self, x_or_z, q, sample_size=1000):
        if not (0.0 <= q <= 1.0):
            raise ValueError("quantile level q must be between 0 and 1")
        lst = getattr(self, f"{x_or_z}_list")
        rng = np.random.default_rng(0)
        subsamples = []
        for data in lst:
            n = data.shape[0]
            k = min(n, max(1, sample_size // len(lst)))
            idx = rng.choice(n, k, replace=False)
            subsamples.append(data[idx])
        sample = gnp.concatenate(subsamples, axis=0)
        return gnp.percentile(sample, q * 100.0, axis=0)

    def _reduce_median(self, x_or_z):
        return self._reduce_quantile(x_or_z, 0.5)


# auto-generate x_*/z_* reduction methods (x_min ... z_median)
for _field in ("x", "z"):
    for _stat in ("min", "max", "mean", "var", "std", "quantile", "median"):

        def _make_method(field=_field, stat=_stat):
            def method(self, *args, **kwargs):
                return getattr(self, f"_reduce_{stat}")(field, *args, **kwargs)

            method.__name__ = f"{field}_{stat}"
            return method

        setattr(Dataset, f"{_field}_{_stat}", _make_method())


# ======================================================================
# DataLoader
# ======================================================================
class DataLoader:
    """Mini-batch iterator with deterministic epoch seeding.

    batch_size=None uses the full dataset as one batch; drop_last and
    infinite cycling as in the reference (dataloader.py:322-513).
    """

    def __init__(self, dataset, batch_size=None, shuffle=True, drop_last=False,
                 seed=None, infinite=False):
        self.dataset = dataset
        if batch_size is None:
            batch_size = len(dataset)
        if batch_size <= 0:
            raise ValueError("batch_size must be a positive integer.")
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._base_seed = seed
        self._epoch = 0
        self._infinite = infinite

    def set_epoch(self, epoch: int) -> None:
        """Set the epoch used for deterministic shuffling."""
        self._epoch = epoch

    def __iter__(self) -> Iterator[Tuple[Array, Array]]:
        while True:
            if self._base_seed is not None:
                rng = np.random.default_rng(self._base_seed + self._epoch)
            else:
                rng = np.random.default_rng()

            n = len(self.dataset)
            idx = rng.permutation(n) if self.shuffle else np.arange(n)

            for start in range(0, n, self.batch_size):
                end = start + self.batch_size
                if end > n and self.drop_last:
                    break
                yield self._fetch_batch(idx[start:end])

            self._epoch += 1
            if not self._infinite:
                break

    def _fetch_batch(self, batch_idx):
        xs, zs = [], []
        shard_starts = [0] + self.dataset._shard_bounds[:-1]
        for shard_idx, (start, end) in enumerate(
            zip(shard_starts, self.dataset._shard_bounds)
        ):
            mask = (batch_idx >= start) & (batch_idx < end)
            if mask.any():
                local = batch_idx[mask] - start
                xs.append(self.dataset.x_list[shard_idx][local])
                zs.append(self.dataset.z_list[shard_idx][local])
        return gnp.concatenate(xs, 0), gnp.concatenate(zs, 0)

    def __len__(self) -> int:
        n = len(self.dataset)
        full = n // self.batch_size
        return full if (self.drop_last or n % self.batch_size == 0) else full + 1

    def __getitem__(self, index):
        if self.shuffle or self._infinite:
            raise RuntimeError(
                "Batch indexing requires shuffle=False and infinite=False."
            )
        n_batches = len(self)
        if isinstance(index, int):
            if index < 0:
                index += n_batches
            if not (0 <= index < n_batches):
                raise IndexError("Batch index out of range")
            start = index * self.batch_size
            end = min(start + self.batch_size, len(self.dataset))
            return self._fetch_batch(np.arange(start, end))
        if isinstance(index, slice):
            return [self[i] for i in range(*index.indices(n_batches))]
        raise TypeError("Index must be int or slice")

    def __repr__(self) -> str:
        return (
            f"{self.__class__.__name__}(batch_size={self.batch_size}, "
            f"shuffle={self.shuffle}, drop_last={self.drop_last}, "
            f"infinite={self._infinite}, dataset_size={len(self.dataset)})"
        )

    def reduce_mean(self, func):
        """Batch-size-weighted mean of func(x_batch, z_batch) over batches."""
        total, total_weight = None, 0
        for x_batch, z_batch in self:
            bs = x_batch.shape[0]
            value = func(x_batch, z_batch) * bs
            total = value if total is None else total + value
            total_weight += bs
        return total / total_weight

    # ------------------------------------------------- TPU bridge
    def as_stacked_batches(self, mesh=None, axis_name="batch"):
        """(num_batches, b, d)/(num_batches, b) stacked equal-size batches
        (remainder dropped), optionally sharded over a mesh -- the input
        format of gpmp_tpu.parallel.make_data_parallel_criterion."""
        from gpmp_tpu.parallel.batched import shard_batches

        x = gnp.concatenate(self.dataset.x_list, axis=0)
        z = gnp.concatenate(self.dataset.z_list, axis=0).reshape(-1)
        n_batches = len(self.dataset) // self.batch_size
        return shard_batches(x, z, n_batches, mesh=mesh, axis_name=axis_name)


# ======================================================================
# Scalers
# ======================================================================
# auto-generate DataLoader.dataset_{x,z}_{stat} properties forwarding to
# the underlying Dataset's reduction methods (reference dataloader.py:
# 516-532): the property value is the dataset's bound method.
for _stat in ("min", "max", "mean", "var", "std", "quantile", "median"):
    for _field in ("x", "z"):
        _method_name = f"{_field}_{_stat}"

        def _make_property(method_name=_method_name):
            @property
            def prop(self):
                return getattr(self.dataset, method_name)

            return prop

        setattr(DataLoader, f"dataset_{_field}_{_stat}",
                _make_property())


class Normalizer:
    """Standardize covariates to zero mean / unit variance."""

    def __init__(self, mean, std):
        self.mean = mean
        self.std = gnp.where(std < _EPS, 1.0, std)

    def transform(self, x, copy=True):
        return (x - self.mean) / self.std

    def inverse_transform(self, x_std, copy=True):
        return x_std * self.std + self.mean

    @staticmethod
    def fit(x):
        return Normalizer(x.mean(axis=0, keepdims=True), x.std(axis=0, keepdims=True))


class RobustScaler:
    """Scale covariates by median and interquartile range."""

    def __init__(self, median, iqr):
        self.median = median
        self.iqr = gnp.where(iqr < _EPS, 1.0, iqr)

    def transform(self, x, copy=True):
        return (x - self.median) / self.iqr

    def inverse_transform(self, x_rb, copy=True):
        return x_rb * self.iqr + self.median

    @staticmethod
    def fit(x, q_low=25.0, q_high=75.0):
        ql = gnp.percentile(x, q_low, axis=0, keepdims=True)
        qh = gnp.percentile(x, q_high, axis=0, keepdims=True)
        median = gnp.percentile(x, 50.0, axis=0, keepdims=True)
        return RobustScaler(median, qh - ql)


class MinMaxScaler:
    """Rescale covariates to [0, 1]."""

    def __init__(self, x_min, x_max):
        self.x_min = x_min
        self.range = gnp.where((x_max - x_min) < _EPS, 1.0, x_max - x_min)

    def transform(self, x, copy=True):
        return (x - self.x_min) / self.range

    def inverse_transform(self, x_mm, copy=True):
        return x_mm * self.range + self.x_min

    @staticmethod
    def fit(x):
        return MinMaxScaler(
            gnp.min(x, axis=0, keepdims=True), gnp.max(x, axis=0, keepdims=True)
        )


class ObservationScaler:
    """Standardize scalar observations to zero mean / unit variance."""

    def __init__(self, mean, std):
        self.mean = mean
        self.std = 1.0 if float(std) < _EPS else std

    def transform(self, z, copy=True):
        return (z - self.mean) / self.std

    def inverse_transform(self, z_std, copy=True):
        return z_std * self.std + self.mean

    @staticmethod
    def fit(z):
        return ObservationScaler(z.mean(), z.std())


def collate_batches(batches):
    """Concatenate a list of (x_batch, z_batch) into full arrays."""
    if not batches:
        raise ValueError("Cannot collate an empty list of batches.")
    xs, zs = zip(*batches)
    return gnp.concatenate(xs, 0), gnp.concatenate(zs, 0)
