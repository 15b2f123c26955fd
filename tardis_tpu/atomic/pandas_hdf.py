"""h5py decoder for pandas-written HDF5 stores.

Carsus atomic-data files (kurucz_cd23_chianti...) are written with
``pandas.HDFStore`` and normally require PyTables to read.  PyTables is
not available in this environment, so this module reconstructs pandas
DataFrames/Series directly from the on-disk layout with h5py:

- *fixed* format ("pandas_type" = frame/series): ``axis0``/``axis1`` axes
  (regular or MultiIndex as ``axisN_levelK``/``axisN_labelK``) plus
  ``block{i}_items``/``block{i}_values`` data blocks;
- *table* format: a single ``table`` dataset with a compound dtype whose
  fields are ``index``/column names (plus ``values_block_N`` groups
  described by the ``*_kind`` attributes).

Reference behavior mirrored: ``AtomData.from_hdf``
(/root/reference/tardis/io/atom_data/base.py:178-330) reads these stores
with pandas; we produce the same DataFrames.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import h5py


def _attr(obj, name, default=None):
    val = obj.attrs.get(name, default)
    if isinstance(val, bytes):
        val = val.decode()
    return val


def _decode_1d(values):
    values = np.asarray(values)
    if values.dtype.kind in ("S", "O"):
        return np.array(
            [v.decode() if isinstance(v, bytes) else v for v in values],
            dtype=object,
        )
    return values


def _read_index(group, axis: str):
    """Read a (possibly Multi-) index stored under `axis` in a fixed-format
    pandas group."""
    variety = _attr(group, f"{axis}_variety", "regular")
    if variety == "multi":
        nlevels = int(group.attrs[f"{axis}_nlevels"])
        levels, codes, names = [], [], []
        for k in range(nlevels):
            lvl_ds = group[f"{axis}_level{k}"]
            levels.append(_decode_1d(lvl_ds[()]))
            names.append(_attr(lvl_ds, "name"))
            codes.append(np.asarray(group[f"{axis}_label{k}"][()]))
        return pd.MultiIndex(
            levels=[pd.Index(l) for l in levels], codes=codes, names=names
        )
    ds = group[axis]
    idx = pd.Index(_decode_1d(ds[()]))
    name = _attr(ds, "name")
    if name is not None:
        idx.name = name
    # pandas stores datetime indexes as i8 with a 'kind' attribute
    if _attr(ds, "kind") in ("datetime64", "datetime"):
        idx = pd.to_datetime(idx)
    return idx


def _read_fixed_frame(group) -> pd.DataFrame:
    columns = _read_index(group, "axis0")
    index = _read_index(group, "axis1")
    nblocks = int(group.attrs.get("nblocks", 1))
    data = {}
    for b in range(nblocks):
        items = _read_index(group, f"block{b}_items")
        values = np.asarray(group[f"block{b}_values"][()])
        if values.ndim == 1:
            values = values.reshape(1, -1)
        # pandas blocks are (n_items, n_rows); tolerate the transpose
        if values.shape[0] != len(items) and values.shape[1] == len(items):
            values = values.T
        for j, item in enumerate(items):
            col = _decode_1d(values[j])
            data[item] = col
    df = pd.DataFrame(data, index=index)
    # restore original column order
    df = df[[c for c in columns if c in df.columns]]
    return df


def _read_fixed_series(group) -> pd.Series:
    index = _read_index(group, "index")
    values = _decode_1d(group["values"][()])
    name = _attr(group, "name")
    return pd.Series(values, index=index, name=name)


def _read_table_frame(group) -> pd.DataFrame:
    """Decode pandas 'table' format: one structured-dtype dataset."""
    table = group["table"][()]
    names = table.dtype.names
    index_cols = []
    ncols = int(group["table"].attrs.get("index_variety_nlevels", 0) or 0)
    del ncols  # layout probing below is sufficient
    data = {}
    for name in names:
        col = table[name]
        if col.ndim == 2 and col.shape[1] == 1:
            col = col[:, 0]
        if col.ndim == 2:
            # values_block with several columns: expand using items attr
            items_attr = _attr(group["table"], f"{name}_meta", None)
            for j in range(col.shape[1]):
                label = f"{name}_{j}" if items_attr is None else items_attr[j]
                data[label] = _decode_1d(col[:, j])
            continue
        data[name] = _decode_1d(col)
        if name == "index" or name.startswith("index_"):
            index_cols.append(name)
    df = pd.DataFrame(data)
    if index_cols:
        df = df.set_index(index_cols)
        if index_cols == ["index"]:
            df.index.name = None
    return df


def read_pandas_hdf(path: str, key: str):
    """Read one pandas object (frame or series) from a pandas-HDF file."""
    with h5py.File(path, "r") as f:
        if not key.startswith("/"):
            key = "/" + key
        if key not in f:
            raise KeyError(f"{key} not in {path}")
        group = f[key]
        pandas_type = _attr(group, "pandas_type", "")
        if "table" in group:
            return _read_table_frame(group)
        if pandas_type.startswith("series"):
            return _read_fixed_series(group)
        return _read_fixed_frame(group)


def list_keys(path: str) -> list[str]:
    """Top-level pandas object keys in the file."""
    keys = []
    with h5py.File(path, "r") as f:
        def visit(name, obj):
            if isinstance(obj, h5py.Group) and "pandas_type" in obj.attrs:
                keys.append("/" + name)
        f.visititems(visit)
    return keys


class H5PandasStore:
    """Minimal pandas.HDFStore-compatible reader backed by h5py."""

    def __init__(self, path: str):
        self.path = path
        self._keys = set(list_keys(path))

    def __contains__(self, key):
        if not key.startswith("/"):
            key = "/" + key
        return key in self._keys

    def __getitem__(self, key):
        return read_pandas_hdf(self.path, key)

    def keys(self):
        return sorted(self._keys)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def open_store(path: str):
    """Open `path` with pandas.HDFStore when PyTables is available,
    otherwise with the h5py fallback decoder."""
    try:
        import tables  # noqa: F401

        return pd.HDFStore(path, "r")
    except ImportError:
        return H5PandasStore(path)
