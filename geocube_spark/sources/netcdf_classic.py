"""netCDF classic (CDF-1/CDF-2) writer + reader, pure Python + numpy.

The reference's primary sink is ``Dataset.to_netcdf`` (xarray). This
module gives the engine a netCDF sink without any netCDF/HDF5 library:
the classic format (public spec: "NetCDF Classic Format Specification",
Unidata) is a simple big-endian TLV layout that every netCDF consumer
(xarray, netCDF4-python, GDAL, ncdump) reads.

Writer scope = what a GeoCube needs: fixed (non-record) dimensions,
scalar + n-D variables of BYTE/SHORT/INT/FLOAT/DOUBLE/CHAR, variable
and global attributes. The reader exists for roundtrip tests and
mirrors the same scope.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6
_NC_DIMENSION, _NC_VARIABLE, _NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C

_DTYPE_TO_NC = {
    np.dtype("int8"): NC_BYTE,
    np.dtype("int16"): NC_SHORT,
    np.dtype("int32"): NC_INT,
    np.dtype("float32"): NC_FLOAT,
    np.dtype("float64"): NC_DOUBLE,
}
_NC_TO_DTYPE = {
    NC_BYTE: np.dtype(">i1"),
    NC_CHAR: np.dtype("S1"),
    NC_SHORT: np.dtype(">i2"),
    NC_INT: np.dtype(">i4"),
    NC_FLOAT: np.dtype(">f4"),
    NC_DOUBLE: np.dtype(">f8"),
}
_NC_SIZE = {NC_BYTE: 1, NC_CHAR: 1, NC_SHORT: 2, NC_INT: 4,
            NC_FLOAT: 4, NC_DOUBLE: 8}


def _coerce(arr: np.ndarray) -> np.ndarray:
    """Map any numpy array onto a classic-expressible dtype (classic
    has no unsigned/64-bit ints: promote like GDAL's netCDF driver)."""
    dt = arr.dtype
    if dt in _DTYPE_TO_NC:
        return arr
    if dt.kind == "b":
        return arr.astype("int8")
    if dt == np.dtype("uint8"):
        return arr.astype("int16")
    if dt == np.dtype("uint16"):
        return arr.astype("int32")
    if dt.kind in ("i", "u"):
        return arr.astype("float64")
    if dt.kind == "f":
        return arr.astype("float64")
    raise TypeError(f"cannot express dtype {dt} in netCDF classic")


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 4)


def _name(s: str) -> bytes:
    raw = s.encode("utf-8")
    return struct.pack(">i", len(raw)) + _pad4(raw)


def _attr_bytes(name: str, value) -> bytes:
    if isinstance(value, str):
        raw = value.encode("utf-8")
        return (_name(name) + struct.pack(">ii", NC_CHAR, len(raw))
                + _pad4(raw))
    arr = _coerce(np.atleast_1d(np.asarray(value)))
    nc = _DTYPE_TO_NC[arr.dtype]
    payload = arr.astype(_NC_TO_DTYPE[nc].newbyteorder(">")).tobytes()
    return (_name(name) + struct.pack(">ii", nc, arr.size)
            + _pad4(payload))


def _attr_list(attrs: dict) -> bytes:
    if not attrs:
        return struct.pack(">ii", 0, 0)
    return struct.pack(">ii", _NC_ATTRIBUTE, len(attrs)) + b"".join(
        _attr_bytes(k, v) for k, v in attrs.items()
    )


def write_netcdf(path: str, *, dims: dict, variables: dict,
                 global_attrs: dict = None) -> None:
    """Write a classic netCDF file.

    dims: {name: size} (fixed sizes; insertion order = dim ids).
    variables: {name: (dim_names_tuple, ndarray, attrs_dict)} — scalar
    variables use an empty dims tuple.
    """
    dim_ids = {n: i for i, n in enumerate(dims)}
    norm = {}
    for vname, (vdims, data, attrs) in variables.items():
        arr = _coerce(np.asarray(data))
        shape = tuple(dims[d] for d in vdims)
        if arr.shape != shape:
            raise ValueError(
                f"{vname}: data shape {arr.shape} != dims {shape}"
            )
        norm[vname] = (tuple(vdims), np.ascontiguousarray(arr),
                       dict(attrs or {}))

    # header skeleton with zero offsets to size it, then patch offsets
    def _header(begins: dict) -> bytes:
        out = [b"CDF\x02", struct.pack(">i", 0)]  # CDF-2: 64-bit offsets
        if dims:
            out.append(struct.pack(">ii", _NC_DIMENSION, len(dims)))
            for n, size in dims.items():
                out.append(_name(n) + struct.pack(">i", size))
        else:
            out.append(struct.pack(">ii", 0, 0))
        out.append(_attr_list(global_attrs or {}))
        if norm:
            out.append(struct.pack(">ii", _NC_VARIABLE, len(norm)))
            for vname, (vdims, arr, attrs) in norm.items():
                nc = _DTYPE_TO_NC[arr.dtype]
                vsize = arr.size * _NC_SIZE[nc]
                vsize += -vsize % 4
                out.append(_name(vname))
                out.append(struct.pack(">i", len(vdims)))
                for d in vdims:
                    out.append(struct.pack(">i", dim_ids[d]))
                out.append(_attr_list(attrs))
                out.append(struct.pack(">ii", nc, vsize))
                out.append(struct.pack(">q", begins.get(vname, 0)))
        else:
            out.append(struct.pack(">ii", 0, 0))
        return b"".join(out)

    hdr_len = len(_header({}))
    begins, off = {}, hdr_len
    for vname, (_, arr, _) in norm.items():
        begins[vname] = off
        nbytes = arr.size * _NC_SIZE[_DTYPE_TO_NC[arr.dtype]]
        off += nbytes + (-nbytes % 4)

    with open(path, "wb") as f:
        f.write(_header(begins))
        for vname, (_, arr, _) in norm.items():
            nc = _DTYPE_TO_NC[arr.dtype]
            raw = arr.astype(_NC_TO_DTYPE[nc].newbyteorder(">")).tobytes()
            f.write(_pad4(raw))


# ---------------------------------------------------------------------------
# reader (tests / like= support for classic files)
# ---------------------------------------------------------------------------

@dataclass
class ClassicVar:
    dims: tuple
    attrs: dict
    values: np.ndarray

    @property
    def shape(self):
        return self.values.shape

    @property
    def dtype(self):
        return self.values.dtype


@dataclass
class ClassicFile:
    dims: dict = field(default_factory=dict)
    attrs: dict = field(default_factory=dict)
    variables: dict = field(default_factory=dict)


def read_netcdf(path: str) -> ClassicFile:
    buf = open(path, "rb").read()
    if buf[:3] != b"CDF" or buf[3] not in (1, 2):
        raise ValueError(f"not a classic netCDF file: {path}")
    big = buf[3] == 2
    pos = 8  # magic + numrecs

    def i4():
        nonlocal pos
        (v,) = struct.unpack_from(">i", buf, pos)
        pos += 4
        return v

    def name():
        nonlocal pos
        n = i4()
        s = buf[pos : pos + n].decode("utf-8")
        pos += n + (-n % 4)
        return s

    def attr_list():
        nonlocal pos
        tag, count = i4(), i4()
        out = {}
        for _ in range(count):
            k = name()
            nc, nelem = i4(), i4()
            nbytes = nelem * _NC_SIZE[nc]
            raw = buf[pos : pos + nbytes]
            pos += nbytes + (-nbytes % 4)
            if nc == NC_CHAR:
                out[k] = raw.decode("utf-8")
            else:
                vals = np.frombuffer(raw, dtype=_NC_TO_DTYPE[nc])
                out[k] = vals[0] if nelem == 1 else vals
        return out

    f = ClassicFile()
    tag, nd = i4(), i4()
    dim_names = []
    for _ in range(nd):
        n = name()
        f.dims[n] = i4()
        dim_names.append(n)
    f.attrs = attr_list()
    tag, nv = i4(), i4()
    for _ in range(nv):
        vname = name()
        ndv = i4()
        vdims = tuple(dim_names[i4()] for i in range(ndv))
        attrs = attr_list()
        nc, vsize = i4(), i4()
        if big:
            (begin,) = struct.unpack_from(">q", buf, pos)
            pos += 8
        else:
            begin = i4()
        shape = tuple(f.dims[d] for d in vdims)
        n = int(np.prod(shape)) if shape else 1
        vals = np.frombuffer(
            buf, dtype=_NC_TO_DTYPE[nc], count=n, offset=begin
        ).reshape(shape)
        f.variables[vname] = ClassicVar(vdims, attrs, vals)
    return f
