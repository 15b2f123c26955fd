"""pandas-HDFStore-compatible (fixed-format) HDF5 writer via h5py.

Counterpart of the reference's ``HDFWriterMixin.to_hdf``
(/root/reference/tardis/io/hdf_writer_mixin.py:40-180): scalars go into a
``{path}/scalars`` Series, 1-D arrays into Series, 2-D arrays into
DataFrames — in the on-disk *fixed* format that ``pandas.HDFStore`` (and
therefore the whole TARDIS ecosystem: ``TARDISHistory``, regression
tooling, SDEC notebooks) reads.  PyTables is not available in this image,
so the layout is emitted directly with h5py: ``axis0``/``axis1`` index
arrays, ``block0_items``/``block0_values`` data blocks, and the PyTables
bookkeeping attributes (CLASS/VERSION/FLAVOR/pandas_type/...).

The inverse of :mod:`tardis_tpu.atomic.pandas_hdf` — round-trip tested
against that decoder; structural attrs match pandas ``GenericFixed``
(pandas_version 0.15.2 layout).
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd

import h5py


def _grp_attrs(grp, pandas_type: str):
    grp.attrs["CLASS"] = np.bytes_(b"GROUP")
    grp.attrs["TITLE"] = np.bytes_(b"")
    grp.attrs["VERSION"] = np.bytes_(b"1.0")
    grp.attrs["pandas_type"] = np.bytes_(pandas_type.encode())
    grp.attrs["pandas_version"] = np.bytes_(b"0.15.2")
    grp.attrs["encoding"] = np.bytes_(b"UTF-8")
    grp.attrs["errors"] = np.bytes_(b"strict")


def _ds_attrs(ds, kind: str | None = None, name=None, transposed=None):
    ds.attrs["CLASS"] = np.bytes_(b"ARRAY")
    ds.attrs["VERSION"] = np.bytes_(b"2.4")
    ds.attrs["TITLE"] = np.bytes_(b"")
    ds.attrs["FLAVOR"] = np.bytes_(b"numpy")
    if kind is not None:
        ds.attrs["kind"] = np.bytes_(kind.encode())
    if name is not None or kind is not None:
        ds.attrs["name"] = (
            np.bytes_(str(name).encode())
            if name is not None
            else np.void(pickle.dumps(None))
        )
    if transposed is not None:
        ds.attrs["transposed"] = np.bool_(transposed)


def _index_kind(index) -> str:
    k = getattr(index, "inferred_type", None)
    if k in ("integer",):
        return "integer"
    if k in ("floating", "mixed-integer-float"):
        return "float"
    if k in ("string", "unicode", "mixed"):
        return "string"
    return "object"


def _index_values(index):
    vals = np.asarray(index.values)
    if vals.dtype.kind in ("O", "U"):
        vals = np.array([str(v).encode() for v in vals], dtype="S")
    return vals


def _write_index(grp, key: str, index):
    if isinstance(index, pd.MultiIndex):
        grp.attrs[f"{key}_variety"] = np.bytes_(b"multi")
        grp.attrs[f"{key}_nlevels"] = np.int64(index.nlevels)
        for k in range(index.nlevels):
            lvl = index.levels[k]
            ds = grp.create_dataset(f"{key}_level{k}", data=_index_values(lvl))
            _ds_attrs(ds, kind=_index_kind(lvl), name=index.names[k])
            lab = grp.create_dataset(
                f"{key}_label{k}", data=np.asarray(index.codes[k], np.int64)
            )
            _ds_attrs(lab, kind="integer", name=index.names[k])
        return
    grp.attrs[f"{key}_variety"] = np.bytes_(b"regular")
    ds = grp.create_dataset(key, data=_index_values(index))
    _ds_attrs(ds, kind=_index_kind(index), name=index.name)


def write_series(f: h5py.File, key: str, series: pd.Series):
    if key in f:
        del f[key]
    grp = f.create_group(key)
    _grp_attrs(grp, "series")
    _write_index(grp, "index", series.index)
    vals = series.to_numpy()
    if vals.dtype.kind in ("O", "U"):
        vals = np.array([str(v).encode() for v in vals], dtype="S")
    ds = grp.create_dataset("values", data=vals)
    _ds_attrs(ds, transposed=False)
    grp.attrs["name"] = (
        np.bytes_(str(series.name).encode())
        if series.name is not None
        else np.void(pickle.dumps(None))
    )


def write_frame(f: h5py.File, key: str, df: pd.DataFrame):
    if key in f:
        del f[key]
    grp = f.create_group(key)
    _grp_attrs(grp, "frame")
    grp.attrs["ndim"] = np.int64(2)
    _write_index(grp, "axis0", df.columns)
    _write_index(grp, "axis1", df.index)
    # one block per dtype, matching pandas' BlockManager layout
    blocks: dict[str, list] = {}
    for col in df.columns:
        arr = df[col].to_numpy()
        if arr.dtype.kind in ("O", "U"):
            kindkey = "S"
        elif arr.dtype.kind == "b":
            kindkey = "b"
        elif arr.dtype.kind in ("i", "u"):
            kindkey = "i8"
        else:
            kindkey = "f8"
        blocks.setdefault(kindkey, []).append(col)
    grp.attrs["nblocks"] = np.int64(len(blocks))
    for b, (kindkey, cols) in enumerate(blocks.items()):
        items = grp.create_dataset(
            f"block{b}_items", data=_index_values(pd.Index(cols))
        )
        _ds_attrs(items, kind=_index_kind(pd.Index(cols)), name=None)
        sub = df[cols]
        if kindkey == "S":
            vals = np.array(
                [[str(v).encode() for v in sub[c]] for c in cols], dtype="S"
            )
        else:
            dtype = {"b": np.bool_, "i8": np.int64, "f8": np.float64}[kindkey]
            vals = np.ascontiguousarray(sub.to_numpy(dtype=dtype).T)
        ds = grp.create_dataset(f"block{b}_values", data=vals)
        _ds_attrs(ds, transposed=False)


def write_elements(f: h5py.File, path: str, elements: dict):
    """Store a dict of values under ``path`` with the reference's
    conventions: scalars pooled into ``{path}/scalars``, 1-D arrays as
    Series, 2-D arrays / DataFrames as frames."""
    scalars = {}
    for name, value in elements.items():
        if value is None:
            continue
        if isinstance(value, pd.DataFrame):
            write_frame(f, f"{path}/{name}", value)
        elif isinstance(value, pd.Series):
            write_series(f, f"{path}/{name}", value)
        elif np.isscalar(value):
            scalars[name] = value
        else:
            arr = np.asarray(value)
            if arr.ndim == 0:
                scalars[name] = arr.item()
            elif arr.ndim == 1:
                write_series(f, f"{path}/{name}", pd.Series(arr))
            else:
                write_frame(f, f"{path}/{name}", pd.DataFrame(arr))
    if scalars:
        write_series(
            f, f"{path}/scalars", pd.Series(scalars, name="value")
        )


def simulation_to_tardis_hdf(sim, path: str, name: str = "simulation"):
    """Write a finished Simulation in the reference's HDF layout
    (group names per the reference classes' ``hdf_properties``:
    simulation/base.py:125, model/base.py:85,
    montecarlo_transport_state.py:16, spectrum/base.py:15)."""
    st = sim.state
    with h5py.File(path, "w") as f:
        f.attrs["PYTABLES_FORMAT_VERSION"] = np.bytes_(b"2.1")
        f.attrs["CLASS"] = np.bytes_(b"GROUP")
        f.attrs["TITLE"] = np.bytes_(b"")
        f.attrs["VERSION"] = np.bytes_(b"1.0")
        base = f"/{name}"
        write_elements(
            f,
            f"{base}/simulation_state",
            {
                "t_inner": float(st.t_inner),
                "time_explosion": float(st.time_explosion),
                "dilution_factor": np.asarray(st.dilution_factor),
                "t_radiative": np.asarray(st.t_radiative),
                "v_inner": np.asarray(st.geometry.v_inner),
                "v_outer": np.asarray(st.geometry.v_outer),
                "r_inner": np.asarray(st.geometry.r_inner),
                "density": np.asarray(st.composition.density),
                "abundance": pd.DataFrame(st.composition.mass_fractions),
            },
        )
        ps = getattr(sim, "plasma_state", None)
        if ps is not None:
            atom = sim.atom_data
            lvl_idx = pd.MultiIndex.from_arrays(
                [atom.level_z, atom.level_ion, atom.level_number],
                names=["atomic_number", "ion_number", "level_number"],
            )
            write_elements(
                f,
                f"{base}/plasma",
                {
                    "electron_densities": pd.Series(ps.electron_densities),
                    "t_electrons": pd.Series(ps.t_electrons),
                    "t_rad": pd.Series(np.asarray(st.t_radiative)),
                    "w": pd.Series(np.asarray(st.dilution_factor)),
                    "tau_sobolevs": pd.DataFrame(np.asarray(ps.tau_sobolev)),
                    "j_blues": pd.DataFrame(np.asarray(ps.j_blues)),
                    "level_number_density": pd.DataFrame(
                        np.asarray(ps.level_number_density), index=lvl_idx
                    ),
                    "ion_number_density": pd.DataFrame(
                        np.asarray(ps.ion_number_density)
                    ),
                },
            )
        res = getattr(sim, "last_transport_result", None)
        if res is not None:
            tpath = f"{base}/transport/transport_state"
            L = sim.atom_data.n_lines
            S = st.no_of_shells
            elements = {
                "time_of_simulation": float(res.time_of_simulation),
                "output_nu": np.asarray(res.output_nu),
                "output_energy": np.asarray(res.output_energy),
                "j_estimator": np.asarray(res.j_estimator),
                "nu_bar_estimator": np.asarray(res.nu_bar_estimator),
                "packet_luminosity": np.asarray(res.output_energy)
                / float(res.time_of_simulation),
                "emitted_packet_mask": np.asarray(res.output_status) == 1,
            }
            # None during convergence iterations when the line-estimator
            # readback was skipped (run_final always materializes it)
            if res.j_blue_estimator is not None:
                elements["j_blue_estimator"] = pd.DataFrame(
                    np.asarray(res.j_blue_estimator).reshape(L, S)
                )
            vp = getattr(res, "vpackets", None)
            if vp is not None:
                # reference vpacket_hdf_properties
                # (montecarlo_transport_state.py:33-44)
                elements.update(vp)
            li = getattr(res, "last_interaction", None)
            if li is not None:
                elements.update(
                    {
                        "last_interaction_type": li["type"],
                        "last_interaction_in_nu": li["in_nu"],
                        "last_interaction_in_r": li["r"],
                        "last_line_interaction_in_id": li["in_line"],
                        "last_line_interaction_out_id": li["out_line"],
                        "last_line_interaction_shell_id": li["shell"],
                    }
                )
            write_elements(f, tpath, elements)
        spec_names = {
            "spectrum_real_packets": getattr(sim, "spectrum_real", None),
            "spectrum_virtual_packets": getattr(sim, "spectrum_virtual", None),
            "spectrum_integrated": getattr(sim, "spectrum_integrated", None),
        }
        for label, spec in spec_names.items():
            if spec is None:
                continue
            write_elements(
                f,
                f"{base}/spectrum_solver/{label}",
                {
                    "_frequency": np.asarray(spec.nu_edges),
                    "luminosity": np.asarray(spec.luminosity_nu)
                    * np.abs(np.diff(np.asarray(spec.nu_edges))),
                    "delta_frequency": float(
                        np.abs(np.diff(np.asarray(spec.nu_edges))).mean()
                    ),
                    "wavelength": np.asarray(spec.wavelength),
                    "luminosity_density_lambda": np.asarray(
                        spec.luminosity_lambda
                    ),
                },
            )
        if getattr(sim, "history", None):
            hist = sim.history
            write_frame(
                f,
                f"{base}/iterations_w",
                pd.DataFrame(np.stack([h.dilution_factor for h in hist])),
            )
            write_frame(
                f,
                f"{base}/iterations_t_rad",
                pd.DataFrame(np.stack([h.t_radiative for h in hist])),
            )
            write_frame(
                f,
                f"{base}/iterations_electron_densities",
                pd.DataFrame(
                    np.stack([h.electron_densities for h in hist])
                ),
            )
            write_series(
                f,
                f"{base}/iterations_t_inner",
                pd.Series([h.t_inner for h in hist]),
            )
        write_series(
            f,
            f"{base}/metadata",
            pd.Series({"tardis_version": "tardis-tpu"}),
        )
    return path
