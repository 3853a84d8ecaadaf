"""Minimal read-only HDF5 / netCDF4 reader (pure Python + numpy).

The reference repo's golden outputs (``test/test_data/compare/*.nc``)
are netCDF4 files, i.e. HDF5. No HDF5 library ships in this
environment, so this module implements just enough of the public HDF5
File Format Specification (v1.x, superblock version 0) to read those
goldens for cell-for-cell parity tests:

- superblock v0, symbol-table ("old-style") groups
  (v1 B-tree + local heap + SNOD nodes)
- version 1 object headers (+ continuation blocks)
- messages: dataspace, datatype, fill value, data layout,
  filter pipeline, attribute, object-header-continuation,
  symbol table
- datatypes: fixed-point, IEEE float, fixed strings,
  variable-length strings (global heap)
- layouts: compact, contiguous, chunked (v1 B-tree), with
  deflate (zlib), shuffle, and fletcher32 filters

This is a reader for TESTS ONLY — it loads whole datasets into numpy
arrays; it is not a Spark source. Format reference: the public
"HDF5 File Format Specification Version 2.0" (hdfgroup.org).
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field

import numpy as np

_SIG = b"\x89HDF\r\n\x1a\n"
_UNDEF = 0xFFFFFFFFFFFFFFFF


@dataclass
class Dataset:
    name: str
    shape: tuple
    dtype: object  # numpy dtype or ('vlen_str',)
    attrs: dict
    _file: "HDF5File"
    _layout: dict = field(default_factory=dict)
    _filters: list = field(default_factory=list)
    fillvalue: object = None

    def __getitem__(self, key):
        return self.values[key]

    @property
    def values(self) -> np.ndarray:
        return self._file._read_dataset(self)


class HDF5File:
    """Open an HDF5 file read-only; expose groups as nested dicts of
    Dataset objects plus group attrs."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            self.buf = f.read()
        if self.buf[:8] != _SIG:
            raise ValueError(f"not an HDF5 file: {path}")
        ver = self.buf[8]
        if ver == 0:
            self.offs_size = self.buf[13]
            self.len_size = self.buf[14]
            # root group symbol table entry starts at 56; object header
            # address is its second field
            (self.root_addr,) = struct.unpack_from("<Q", self.buf, 64)
        elif ver in (2, 3):
            self.offs_size = self.buf[9]
            self.len_size = self.buf[10]
            (self.root_addr,) = struct.unpack_from("<Q", self.buf, 36)
        else:
            raise NotImplementedError(f"superblock version {ver}")
        if self.offs_size != 8 or self.len_size != 8:
            raise NotImplementedError("non-8-byte offsets/lengths")
        self.root = self._read_group(self.root_addr, "/")
        self.datasets: dict[str, Dataset] = {}
        self.attrs: dict[str, dict] = {}

        def walk(node, prefix):
            for name, child in node["children"].items():
                full = f"{prefix}{name}"
                if isinstance(child, Dataset):
                    self.datasets[full] = child
                else:
                    self.attrs[full] = child["attrs"]
                    walk(child, full + "/")

        self.root_attrs = self.root["attrs"]
        walk(self.root, "")

    # -- object headers ---------------------------------------------------

    def _read_messages(self, addr):
        """Return [(msg_type, body_bytes)] for a v1 or v2 object header."""
        if self.buf[addr : addr + 4] == b"OHDR":
            return self._read_messages_v2(addr)
        return self._read_messages_v1(addr)

    def _read_messages_v1(self, addr):
        buf = self.buf
        version = buf[addr]
        if version != 1:
            raise NotImplementedError(f"object header v{version}")
        nmsgs = struct.unpack_from("<H", buf, addr + 2)[0]
        hdr_size = struct.unpack_from("<I", buf, addr + 8)[0]
        # v1 prefix is 12 bytes + 4 padding to 8-align the messages
        blocks = [(addr + 16, hdr_size)]
        msgs = []
        while blocks and len(msgs) < nmsgs:
            pos, remaining = blocks.pop(0)
            while remaining >= 8 and len(msgs) < nmsgs:
                mtype, msize, _flags = struct.unpack_from("<HHB", buf, pos)
                body = buf[pos + 8 : pos + 8 + msize]
                pos += 8 + msize
                remaining -= 8 + msize
                if mtype == 0x0010:  # continuation
                    coff, clen = struct.unpack_from("<QQ", body, 0)
                    blocks.append((coff, clen))
                else:
                    msgs.append((mtype, body))
        return msgs

    def _read_messages_v2(self, addr):
        buf = self.buf
        assert buf[addr : addr + 4] == b"OHDR"
        flags = buf[addr + 5]
        pos = addr + 6
        if flags & 0x20:  # times stored
            pos += 16
        if flags & 0x10:  # max compact / min dense attributes
            pos += 4
        c0size_bytes = 1 << (flags & 0x03)
        chunk0 = int.from_bytes(
            buf[pos : pos + c0size_bytes], "little"
        )
        pos += c0size_bytes
        has_corder = bool(flags & 0x04)
        # chunk0 length counts the message block only (not the trailing
        # 4-byte checksum)
        blocks = [(pos, chunk0)]
        msgs = []
        hdr = 4 + (2 if has_corder else 0)
        while blocks:
            p, length = blocks.pop(0)
            end = p + length
            while p + hdr <= end:
                mtype = buf[p]
                msize = struct.unpack_from("<H", buf, p + 1)[0]
                p += hdr
                body = buf[p : p + msize]
                p += msize
                if mtype == 0x10:  # continuation -> OCHK block
                    coff, clen = struct.unpack_from("<QQ", body, 0)
                    # OCHK: 4-byte sig + messages + 4-byte checksum
                    assert buf[coff : coff + 4] == b"OCHK"
                    blocks.append((coff + 4, clen - 8))
                elif mtype != 0x00:
                    msgs.append((mtype, body))
        return msgs

    # -- groups -----------------------------------------------------------

    def _read_group(self, addr, name):
        children = {}
        attrs = {}
        links = []
        btree_addr = heap_addr = None
        for mtype, body in self._read_messages(addr):
            if mtype == 0x0011:  # symbol table (old-style group)
                btree_addr, heap_addr = struct.unpack_from("<QQ", body, 0)
            elif mtype == 0x0006:  # compact link message
                links.append(self._parse_link(body))
            elif mtype == 0x0002:  # link info (dense links)
                links.extend(self._dense_links(body))
            elif mtype == 0x000C:
                k, v = self._read_attribute(body)
                attrs[k] = v
        if btree_addr is not None and btree_addr != _UNDEF:
            links.extend(self._iter_symbol_btree(btree_addr, heap_addr))
        for cname, caddr in links:
            if caddr is not None:
                children[cname] = self._read_object(caddr, cname)
        return {"name": name, "children": children, "attrs": attrs}

    def _parse_link(self, body):
        """Parse a link message -> (name, object_header_addr | None)."""
        version = body[0]
        assert version == 1, f"link message v{version}"
        flags = body[1]
        pos = 2
        ltype = 0
        if flags & 0x08:
            ltype = body[pos]
            pos += 1
        if flags & 0x04:  # creation order
            pos += 8
        if flags & 0x10:  # charset
            pos += 1
        nlen_size = 1 << (flags & 0x03)
        nlen = int.from_bytes(body[pos : pos + nlen_size], "little")
        pos += nlen_size
        lname = body[pos : pos + nlen].decode("utf-8")
        pos += nlen
        if ltype == 0:  # hard link: object header address
            (oaddr,) = struct.unpack_from("<Q", body, pos)
            return lname, oaddr
        return lname, None  # soft/external links not needed

    # -- fractal heap + v2 B-tree (dense link storage) --------------------

    def _dense_links(self, link_info_body):
        version = link_info_body[0]
        assert version == 0
        flags = link_info_body[1]
        pos = 2 + (8 if flags & 0x01 else 0)
        heap_addr, name_btree = struct.unpack_from(
            "<QQ", link_info_body, pos
        )
        if heap_addr == _UNDEF or name_btree == _UNDEF:
            return []
        heap = self._parse_fractal_heap(heap_addr)
        out = []
        for record in self._iter_btree_v2(name_btree):
            # record type 5 (link name): hash(4) + heap id
            heap_id = record[4:]
            raw = self._fractal_heap_object(heap, heap_id)
            out.append(self._parse_link(raw))
        return out

    def _parse_fractal_heap(self, addr):
        buf = self.buf
        assert buf[addr : addr + 4] == b"FRHP"
        heap_id_len = struct.unpack_from("<H", buf, addr + 5)[0]
        io_filter_len = struct.unpack_from("<H", buf, addr + 7)[0]
        flags = buf[addr + 9]
        pos = addr + 10 + 4 + 8 * 12
        table_width = struct.unpack_from("<H", buf, pos)[0]
        start_block_size, max_direct_size = struct.unpack_from(
            "<QQ", buf, pos + 2
        )
        max_heap_size_bits = struct.unpack_from("<H", buf, pos + 18)[0]
        root_addr = struct.unpack_from("<Q", buf, pos + 22)[0]
        cur_rows = struct.unpack_from("<H", buf, pos + 30)[0]
        return {
            "heap_id_len": heap_id_len,
            "flags": flags,
            "offset_size": (max_heap_size_bits + 7) // 8,
            "table_width": table_width,
            "start_block_size": start_block_size,
            "max_direct_size": max_direct_size,
            "root_addr": root_addr,
            "cur_rows": cur_rows,  # 0 => root block is a direct block
            "io_filter_len": io_filter_len,
        }

    def _fractal_heap_blocks(self, heap):
        """Yield (heap_offset, block_size, file_addr) per direct block."""
        if heap["cur_rows"] == 0:
            yield (0, heap["start_block_size"], heap["root_addr"])
            return
        # indirect root block: rows of direct blocks (doubling table)
        buf = self.buf
        addr = heap["root_addr"]
        assert buf[addr : addr + 4] == b"FHIB"
        pos = addr + 4 + 1 + 8 + heap["offset_size"]
        width = heap["table_width"]
        size = heap["start_block_size"]
        heap_off = 0
        max_direct_rows = (
            heap["max_direct_size"].bit_length()
            - heap["start_block_size"].bit_length()
            + 2
        )
        for row in range(heap["cur_rows"]):
            if row >= max_direct_rows:
                raise NotImplementedError("nested indirect heap blocks")
            for _ in range(width):
                (baddr,) = struct.unpack_from("<Q", buf, pos)
                pos += 8
                if baddr != _UNDEF:
                    yield (heap_off, size, baddr)
                heap_off += size
            if row >= 1:
                size *= 2

    def _fractal_heap_object(self, heap, heap_id):
        idflags = heap_id[0]
        assert (idflags >> 4) & 0x03 == 0, "non-managed heap object"
        off_size = heap["offset_size"]
        len_size = heap["heap_id_len"] - 1 - off_size
        off = int.from_bytes(heap_id[1 : 1 + off_size], "little")
        length = int.from_bytes(
            heap_id[1 + off_size : 1 + off_size + len_size], "little"
        )
        for hoff, bsize, faddr in self._fractal_heap_blocks(heap):
            if hoff <= off < hoff + bsize:
                assert self.buf[faddr : faddr + 4] == b"FHDB"
                return self.buf[faddr + (off - hoff) :
                                faddr + (off - hoff) + length]
        raise KeyError("fractal heap object not found")

    def _iter_btree_v2(self, addr):
        buf = self.buf
        assert buf[addr : addr + 4] == b"BTHD"
        node_size = struct.unpack_from("<I", buf, addr + 6)[0]
        rec_size = struct.unpack_from("<H", buf, addr + 10)[0]
        depth = struct.unpack_from("<H", buf, addr + 12)[0]
        root_addr = struct.unpack_from("<Q", buf, addr + 16)[0]
        root_nrec = struct.unpack_from("<H", buf, addr + 24)[0]
        if depth > 0:
            raise NotImplementedError("deep v2 B-tree")
        assert buf[root_addr : root_addr + 4] == b"BTLF"
        pos = root_addr + 6
        return [
            buf[pos + i * rec_size : pos + (i + 1) * rec_size]
            for i in range(root_nrec)
        ]

    def _heap_string(self, heap_addr, offset):
        buf = self.buf
        assert buf[heap_addr : heap_addr + 4] == b"HEAP"
        (data_addr,) = struct.unpack_from("<Q", buf, heap_addr + 24)
        end = buf.index(b"\x00", data_addr + offset)
        return buf[data_addr + offset : end].decode("utf-8")

    def _iter_symbol_btree(self, btree_addr, heap_addr):
        buf = self.buf
        assert buf[btree_addr : btree_addr + 4] == b"TREE", "bad TREE sig"
        node_type = buf[btree_addr + 4]
        level = buf[btree_addr + 5]
        nentries = struct.unpack_from("<H", buf, btree_addr + 6)[0]
        assert node_type == 0
        pos = btree_addr + 24  # past sig/type/level/entries/siblings
        out = []
        # layout: key0, child0, key1, child1, ..., key_n
        for i in range(nentries):
            child = struct.unpack_from("<Q", buf, pos + 8)[0]
            pos += 16
            if level > 0:
                out.extend(self._iter_symbol_btree(child, heap_addr))
            else:
                out.extend(self._read_snod(child, heap_addr))
        return out

    def _read_snod(self, addr, heap_addr):
        buf = self.buf
        assert buf[addr : addr + 4] == b"SNOD"
        nsyms = struct.unpack_from("<H", buf, addr + 6)[0]
        out = []
        pos = addr + 8
        for _ in range(nsyms):
            name_off, ohdr = struct.unpack_from("<QQ", buf, pos)
            out.append((self._heap_string(heap_addr, name_off), ohdr))
            pos += 40
        return out

    def _read_object(self, addr, name):
        msgs = self._read_messages(addr)
        types = {t for t, _ in msgs}
        if types & {0x0011, 0x0002, 0x0006} and 0x0008 not in types:
            return self._read_group(addr, name)
        return self._read_dataset_header(msgs, name)

    # -- datasets ---------------------------------------------------------

    def _read_dataset_header(self, msgs, name):
        shape = ()
        dtype = None
        attrs = {}
        layout = {}
        filters = []
        fillvalue = None
        for mtype, body in msgs:
            if mtype == 0x0001:
                shape = self._parse_dataspace(body)
            elif mtype == 0x0003:
                dtype = self._parse_datatype(body)[0]
            elif mtype == 0x0005:
                fillvalue = self._parse_fillvalue(body)
            elif mtype == 0x0008:
                layout = self._parse_layout(body)
            elif mtype == 0x000B:
                filters = self._parse_filters(body)
            elif mtype == 0x000C:
                k, v = self._read_attribute(body)
                attrs[k] = v
        ds = Dataset(name, shape, dtype, attrs, self, layout, filters)
        if fillvalue is not None and dtype is not None and \
                not isinstance(dtype, tuple) and len(fillvalue):
            ds.fillvalue = np.frombuffer(fillvalue, dtype=dtype)[0]
        return ds

    def _parse_dataspace(self, body):
        version = body[0]
        ndims = body[1]
        if version == 1:
            pos = 8
        elif version == 2:
            pos = 4
        else:
            raise NotImplementedError(f"dataspace v{version}")
        return tuple(
            struct.unpack_from("<Q", body, pos + 8 * i)[0]
            for i in range(ndims)
        )

    def _parse_datatype(self, body):
        """Return (dtype, nbytes_consumed). dtype is a numpy dtype or
        the tuple ('vlen_str',)."""
        cls = body[0] & 0x0F
        bits0 = body[1]
        size = struct.unpack_from("<I", body, 4)[0]
        if cls == 0:  # fixed-point
            signed = bool(bits0 & 0x08)
            bo = ">" if (bits0 & 0x01) else "<"
            ch = {1: "b", 2: "h", 4: "i", 8: "q"}[size]
            return np.dtype(bo + (ch if signed else ch.upper())), 8 + 4
        if cls == 1:  # float
            bo = ">" if (bits0 & 0x01) else "<"
            return np.dtype(f"{bo}f{size}"), 8 + 12
        if cls == 3:  # fixed string
            return np.dtype(f"S{size}"), 8
        if cls == 9:  # variable-length
            vtype = bits0 & 0x0F
            if vtype == 1:
                return ("vlen_str",), 8 + 12
            base, used = self._parse_datatype(body[8:])
            return ("vlen", base), 8 + used
        if cls == 6:  # compound — not needed for goldens
            raise NotImplementedError("compound datatype")
        if cls == 7:  # reference (DIMENSION_LIST etc.)
            return ("ref",), 8
        raise NotImplementedError(f"datatype class {cls}")

    def _parse_fillvalue(self, body):
        version = body[0]
        if version in (1, 2):
            defined = body[3]
            if version == 2 and not defined:
                return b""
            size = struct.unpack_from("<I", body, 4)[0]
            return body[8 : 8 + size]
        if version == 3:
            flags = body[1]
            if flags & 0x20:
                size = struct.unpack_from("<I", body, 2)[0]
                return body[6 : 6 + size]
            return b""
        raise NotImplementedError(f"fill value v{version}")

    def _parse_layout(self, body):
        version = body[0]
        if version == 3:
            lclass = body[1]
            if lclass == 0:  # compact
                size = struct.unpack_from("<H", body, 2)[0]
                return {"class": "compact", "data": body[4 : 4 + size]}
            if lclass == 1:  # contiguous
                addr, size = struct.unpack_from("<QQ", body, 2)
                return {"class": "contiguous", "addr": addr, "size": size}
            if lclass == 2:  # chunked (v1 B-tree index)
                ndims = body[2]  # = dataset rank + 1 (element size dim)
                (btree,) = struct.unpack_from("<Q", body, 3)
                dims = struct.unpack_from(f"<{ndims}I", body, 11)
                return {"class": "chunked", "btree": btree, "chunk": dims}
            raise NotImplementedError(f"layout class {lclass}")
        if version == 4:
            lclass = body[1]
            if lclass == 0:
                size = struct.unpack_from("<H", body, 2)[0]
                return {"class": "compact", "data": body[4 : 4 + size]}
            if lclass == 1:
                addr, size = struct.unpack_from("<QQ", body, 2)
                return {"class": "contiguous", "addr": addr, "size": size}
            if lclass != 2:
                raise NotImplementedError(f"layout v4 class {lclass}")
            flags = body[2]
            ndims = body[3]
            enc = body[4]
            pos = 5
            dims = tuple(
                int.from_bytes(body[pos + i * enc : pos + (i + 1) * enc],
                               "little")
                for i in range(ndims)
            )
            pos += ndims * enc
            index_type = body[pos]
            pos += 1
            if index_type == 1:  # single chunk
                info = {"class": "chunked_single", "chunk": dims}
                if flags & 0x02:  # filtered single chunk
                    (fsize,) = struct.unpack_from("<Q", body, pos)
                    (fmask,) = struct.unpack_from("<I", body, pos + 8)
                    pos += 12
                    info["filtered_size"] = fsize
                    info["filter_mask"] = fmask
                (info["addr"],) = struct.unpack_from("<Q", body, pos)
                return info
            if index_type == 2:  # implicit (unfiltered, contiguous chunks)
                (addr,) = struct.unpack_from("<Q", body, pos)
                return {"class": "chunked_implicit", "chunk": dims,
                        "addr": addr}
            if index_type == 3:  # fixed array
                page_bits = body[pos]
                (addr,) = struct.unpack_from("<Q", body, pos + 1)
                return {"class": "chunked_farray", "chunk": dims,
                        "addr": addr, "page_bits": page_bits}
            raise NotImplementedError(
                f"chunk index type {index_type} (extensible array/B-tree v2)"
            )
        raise NotImplementedError(f"layout v{version}")

    def _parse_filters(self, body):
        version = body[0]
        nf = body[1]
        out = []
        if version == 1:
            pos = 8
            for _ in range(nf):
                fid, namelen, _flags, nvals = struct.unpack_from(
                    "<HHHH", body, pos
                )
                pos += 8 + ((namelen + 7) & ~7)
                vals = struct.unpack_from(f"<{nvals}I", body, pos)
                pos += 4 * nvals
                if nvals % 2:
                    pos += 4
                out.append((fid, vals))
        elif version == 2:
            pos = 2
            for _ in range(nf):
                fid = struct.unpack_from("<H", body, pos)[0]
                pos += 2
                namelen = 0
                if fid >= 256:
                    namelen = struct.unpack_from("<H", body, pos)[0]
                    pos += 2
                _flags, nvals = struct.unpack_from("<HH", body, pos)
                pos += 4 + namelen
                vals = struct.unpack_from(f"<{nvals}I", body, pos)
                pos += 4 * nvals
                out.append((fid, vals))
        else:
            raise NotImplementedError(f"filter pipeline v{version}")
        return out

    # -- attributes -------------------------------------------------------

    def _read_attribute(self, body):
        version = body[0]
        if version == 1:
            name_size, dt_size, ds_size = struct.unpack_from("<HHH", body, 2)
            pos = 8
            name = body[pos : pos + name_size].split(b"\x00")[0].decode()
            pos += (name_size + 7) & ~7
            dt_body = body[pos : pos + dt_size]
            pos += (dt_size + 7) & ~7
            ds_body = body[pos : pos + ds_size]
            pos += (ds_size + 7) & ~7
        elif version in (2, 3):
            name_size, dt_size, ds_size = struct.unpack_from("<HHH", body, 2)
            pos = 8 if version == 2 else 9
            name = body[pos : pos + name_size].split(b"\x00")[0].decode()
            pos += name_size
            dt_body = body[pos : pos + dt_size]
            pos += dt_size
            ds_body = body[pos : pos + ds_size]
            pos += ds_size
        else:
            raise NotImplementedError(f"attribute v{version}")
        try:
            dtype, _ = self._parse_datatype(dt_body)
            shape = self._parse_dataspace(ds_body)
        except NotImplementedError:
            return name, None
        n = int(np.prod(shape)) if shape else 1
        data = body[pos:]
        return name, self._decode_values(data, dtype, n, shape)

    def _decode_values(self, data, dtype, n, shape):
        if isinstance(dtype, tuple):
            if dtype[0] == "vlen_str":
                out = []
                for i in range(n):
                    sz, gaddr, gidx = struct.unpack_from(
                        "<IQI", data, 16 * i
                    )
                    out.append(
                        self._global_heap_object(gaddr, gidx)[:sz].decode(
                            "utf-8", "replace"
                        )
                    )
                return out[0] if not shape or n == 1 else out
            return None  # refs etc.
        arr = np.frombuffer(data[: n * dtype.itemsize], dtype=dtype)
        if dtype.kind == "S":
            arr = np.char.rstrip(arr, b"\x00")
            vals = [v.decode("utf-8", "replace") for v in arr.tolist()]
            return vals[0] if not shape or n == 1 else vals
        if not shape or n == 1:
            return arr[0] if arr.size else None
        return arr.reshape(shape)

    def _global_heap_object(self, collection_addr, index):
        buf = self.buf
        assert buf[collection_addr : collection_addr + 4] == b"GCOL"
        (csize,) = struct.unpack_from("<Q", buf, collection_addr + 8)
        pos = collection_addr + 16
        end = collection_addr + csize
        while pos < end:
            oidx = struct.unpack_from("<H", buf, pos)[0]
            osize = struct.unpack_from("<Q", buf, pos + 8)[0]
            if oidx == index:
                return buf[pos + 16 : pos + 16 + osize]
            if oidx == 0:
                break
            pos += 16 + ((osize + 7) & ~7)
        raise KeyError(f"global heap object {index}")

    # -- dataset data -----------------------------------------------------

    def _read_dataset(self, ds: Dataset) -> np.ndarray:
        layout = ds._layout
        dtype = ds.dtype
        shape = ds.shape
        n = int(np.prod(shape)) if shape else 1
        if isinstance(dtype, tuple):
            if dtype[0] == "vlen_str":
                if layout["class"] != "contiguous":
                    raise NotImplementedError("chunked vlen strings")
                data = self.buf[
                    layout["addr"] : layout["addr"] + layout["size"]
                ]
                vals = self._decode_values(data, dtype, n, shape or (1,))
                return np.array(vals if isinstance(vals, list) else [vals],
                                dtype=object).reshape(shape or ())
            raise NotImplementedError(f"dataset dtype {dtype}")
        if layout["class"] == "compact":
            raw = layout["data"]
        elif layout["class"] == "contiguous":
            if layout["addr"] == _UNDEF:  # never allocated -> fill
                fill = ds.fillvalue if ds.fillvalue is not None else 0
                return np.full(shape, fill, dtype=dtype)
            raw = self.buf[layout["addr"] : layout["addr"] + layout["size"]]
        else:  # chunked (any index flavor)
            return self._read_chunked(ds)
        arr = np.frombuffer(raw[: n * dtype.itemsize], dtype=dtype)
        return arr.reshape(shape)

    def _chunk_dims(self, layout, rank):
        """Chunk dims without the trailing element-size dimension."""
        chunk = layout["chunk"]
        if len(chunk) == rank + 1:
            return chunk[:-1]
        return chunk

    def _read_chunked(self, ds: Dataset) -> np.ndarray:
        dtype = ds.dtype
        shape = ds.shape
        layout = ds._layout
        chunk = self._chunk_dims(layout, len(shape))
        fill = ds.fillvalue if ds.fillvalue is not None else 0
        out = np.full(shape, fill, dtype=dtype)
        csize = int(np.prod(chunk)) * dtype.itemsize

        def paste(offsets, raw, fmask):
            raw = self._apply_filters(raw, ds._filters, fmask, dtype)
            carr = np.frombuffer(raw[:csize], dtype=dtype).reshape(chunk)
            sel_out, sel_in = [], []
            for d, off in enumerate(offsets):
                hi = min(off + chunk[d], shape[d])
                sel_out.append(slice(off, hi))
                sel_in.append(slice(0, hi - off))
            out[tuple(sel_out)] = carr[tuple(sel_in)]

        cls = layout["class"]
        if cls == "chunked":  # v1 B-tree index
            btree = layout["btree"]
            if btree == _UNDEF:
                return out
            for offsets, addr, nbytes, fmask in self._iter_chunk_btree(
                btree, len(chunk)
            ):
                paste(offsets[: len(chunk)], self.buf[addr : addr + nbytes],
                      fmask)
            return out
        if cls == "chunked_single":
            if layout["addr"] == _UNDEF:
                return out
            nbytes = layout.get("filtered_size", csize)
            paste((0,) * len(chunk),
                  self.buf[layout["addr"] : layout["addr"] + nbytes],
                  layout.get("filter_mask", 0))
            return out
        if cls == "chunked_implicit":
            if layout["addr"] == _UNDEF:
                return out
            addr = layout["addr"]
            grid = [
                -(-shape[d] // chunk[d]) for d in range(len(chunk))
            ]
            for flat in range(int(np.prod(grid))):
                idx, rem = [], flat
                for g in reversed(grid):
                    idx.append(rem % g)
                    rem //= g
                idx = tuple(reversed(idx))
                offsets = tuple(idx[d] * chunk[d] for d in range(len(chunk)))
                paste(offsets, self.buf[addr : addr + csize], 0)
                addr += csize
            return out
        if cls == "chunked_farray":
            return self._read_fixed_array_chunks(ds, out, chunk, csize,
                                                 paste)
        raise NotImplementedError(cls)

    def _read_fixed_array_chunks(self, ds, out, chunk, csize, paste):
        buf = self.buf
        addr = ds._layout["addr"]
        if addr == _UNDEF:
            return out
        assert buf[addr : addr + 4] == b"FAHD"
        entry_size = buf[addr + 6]
        nelems = struct.unpack_from("<Q", buf, addr + 8)[0]
        (dblock,) = struct.unpack_from("<Q", buf, addr + 16)
        assert buf[dblock : dblock + 4] == b"FADB"
        # FADB: sig4 ver1 client_id1 hdr_addr8 page_bitmap? (only when
        # paged); elements follow directly for small arrays
        pos = dblock + 4 + 1 + 1 + 8
        filtered = bool(ds._filters)
        shape = ds.shape
        grid = [-(-shape[d] // chunk[d]) for d in range(len(chunk))]
        for flat in range(nelems):
            if filtered:
                caddr = struct.unpack_from("<Q", buf, pos)[0]
                rest = buf[pos + 8 : pos + entry_size]
                nbytes = int.from_bytes(rest[:-4], "little")
                fmask = struct.unpack_from("<I", rest, len(rest) - 4)[0]
            else:
                caddr = struct.unpack_from("<Q", buf, pos)[0]
                nbytes, fmask = csize, 0
            pos += entry_size
            if caddr == _UNDEF:
                continue
            idx, rem = [], flat
            for g in reversed(grid):
                idx.append(rem % g)
                rem //= g
            idx = tuple(reversed(idx))
            offsets = tuple(idx[d] * chunk[d] for d in range(len(chunk)))
            paste(offsets, buf[caddr : caddr + nbytes], fmask)
        return out

    def _iter_chunk_btree(self, addr, ndims):
        buf = self.buf
        assert buf[addr : addr + 4] == b"TREE"
        node_type = buf[addr + 4]
        level = buf[addr + 5]
        nentries = struct.unpack_from("<H", buf, addr + 6)[0]
        assert node_type == 1
        key_size = 8 + 8 * (ndims + 1)
        pos = addr + 24
        out = []
        for _ in range(nentries):
            nbytes, fmask = struct.unpack_from("<II", buf, pos)
            offsets = struct.unpack_from(f"<{ndims}Q", buf, pos + 8)
            child = struct.unpack_from("<Q", buf, pos + key_size)[0]
            pos += key_size + 8
            if level > 0:
                out.extend(self._iter_chunk_btree(child, ndims))
            else:
                out.append((offsets, child, nbytes, fmask))
        return out

    @staticmethod
    def _apply_filters(raw, filters, fmask, dtype):
        # filters apply in reverse on read; honor the skip mask
        for i in range(len(filters) - 1, -1, -1):
            if fmask & (1 << i):
                continue
            fid, vals = filters[i]
            if fid == 1:  # deflate
                raw = zlib.decompress(raw)
            elif fid == 2:  # shuffle
                esize = vals[0]
                n = len(raw) // esize
                raw = (
                    np.frombuffer(raw[: n * esize], dtype=np.uint8)
                    .reshape(esize, n)
                    .T.tobytes()
                )
            elif fid == 3:  # fletcher32: strip trailing checksum
                raw = raw[:-4]
            else:
                raise NotImplementedError(f"filter id {fid}")
        return raw


def open_netcdf(path: str) -> HDF5File:
    """netCDF4-flavored convenience: returns HDF5File; datasets are
    netCDF variables (dimension-scale coordinate vars included)."""
    return HDF5File(path)
