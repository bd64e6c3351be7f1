#!/usr/bin/env python3
"""Generate a spec-faithful netCDF-4-style HDF5 fixture for SourcesSpec.

Writes an HDF5 file BY HAND from the public HDF5 File Format Specification
(superblock v0, v1 object headers, old-style symbol-table groups, contiguous
+ chunked layouts, shuffle+deflate filters) — the same "earliest" layout the
netCDF-4 C library emits for Sentinel-1 OWI scene files. This is an
INDEPENDENT implementation of the format from graft.sources.Hdf5 (the Scala
reader): the reader and this writer only agree if both follow the spec.

Dataset values are deterministic integer-valued formulas (exact in every
float width) so the Scala side can verify content without float drift:
  owiWindSpeed[l,s]      = l*1000 + s          (f64, chunked 17x23, shuffle+deflate)
  owiWindDirection[l,s]  = (3*l + 7*s) % 360   (f32, contiguous)
  owiMask[l,s]           = (l + s) % 5         (i16, contiguous)
  owiWindQuality[l,s]    = (l*7 + s*3) % 100   (i32, chunked 16x40, deflate)
  owiCalConstObsi[k]     = k                   (f64, 1-D — ingest must drop it)
Root also carries a contiguous f64 dataset `rootvar` to prove group
scoping, and the group lives at /owiInversionTables_UV like the real files.

Usage: python3 tools/make_h5_fixture.py [out.h5]   (default src/test/resources/owi_fixture.h5)
"""
import struct, sys, zlib, os

import numpy as np

UNDEF = 0xFFFFFFFFFFFFFFFF


class W:
    def __init__(self):
        self.buf = bytearray()

    def align(self, n=8):
        while len(self.buf) % n:
            self.buf += b"\x00"

    def put(self, data):
        addr = len(self.buf)
        self.buf += data
        return addr


def msg(typ, body):
    """v1 object header message: type(2) size(2) flags(1) reserved(3), body 8-padded."""
    pad = (-len(body)) % 8
    body = body + b"\x00" * pad
    return struct.pack("<HHB3x", typ, len(body), 0) + body


def object_header(msgs):
    """v1 object header: 12-byte prefix + 4 pad + messages."""
    block = b"".join(msgs)
    return struct.pack("<BxHII4x", 1, len(msgs), 1, len(block)) + block


def dataspace(dims):
    body = struct.pack("<BBB1x4x", 1, len(dims), 1)
    body += b"".join(struct.pack("<Q", d) for d in dims)          # dims
    body += b"".join(struct.pack("<Q", d) for d in dims)          # maxdims
    return msg(0x0001, body)


def dtype_float(size):
    if size == 8:
        props = struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
        bits = (0x20, 63, 0)
    else:
        props = struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)
        bits = (0x20, 31, 0)
    return msg(0x0003, struct.pack("<BBBBI", 0x11, *bits, size) + props)


def dtype_int(size, signed=True):
    b0 = 0x08 if signed else 0x00
    props = struct.pack("<HH", 0, size * 8)
    return msg(0x0003, struct.pack("<BBBBI", 0x10, b0, 0, 0, size) + props)


def layout_contiguous(addr, size):
    return msg(0x0008, struct.pack("<BBQQ", 3, 1, addr, size))


def layout_chunked(btree_addr, chunk_dims, elem_size):
    body = struct.pack("<BBB", 3, 2, len(chunk_dims) + 1)
    body += struct.pack("<Q", btree_addr)
    body += b"".join(struct.pack("<I", d) for d in chunk_dims)
    body += struct.pack("<I", elem_size)
    return msg(0x0008, body)


def filter_pipeline(filters):
    """filters: list of (id, [client_values]). v1 message."""
    body = struct.pack("<BB2x4x", 1, len(filters))
    for fid, vals in filters:
        body += struct.pack("<HHHH", fid, 0, 1, len(vals))  # flags=1: optional
        body += b"".join(struct.pack("<I", v) for v in vals)
        if len(vals) % 2:
            body += b"\x00" * 4
    return msg(0x000B, body)


def stab_msg(btree, heap):
    return msg(0x0011, struct.pack("<QQ", btree, heap))


def dataspace_raw(dims):
    """Raw v1 dataspace (for attribute messages); rank 0 = scalar."""
    body = struct.pack("<BBB1x4x", 1, len(dims), 0)
    body += b"".join(struct.pack("<Q", d) for d in dims)
    return body


def dtype_raw_fixed_str(n):
    return struct.pack("<BBBBI", 0x13, 0, 0, 0, n)  # class 3, null-padded


def dtype_raw_vlen_str():
    # class 9, bits0 low nibble 1 = vlen string; base = 1-byte string
    return struct.pack("<BBBBI", 0x19, 1, 0, 0, 16) + dtype_raw_fixed_str(1)


def dtype_raw_f64():
    return struct.pack("<BBBBI", 0x11, 0x20, 63, 0, 8) + struct.pack(
        "<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)


def attr_msg(name, dt_raw, ds_raw, data):
    """v1 attribute message: name/datatype/dataspace sizes, each 8-padded."""
    nameb = name.encode() + b"\x00"

    def pad8(b):
        return b + b"\x00" * ((-len(b)) % 8)

    body = struct.pack("<BxHHH", 1, len(nameb), len(dt_raw), len(ds_raw))
    body += pad8(nameb) + pad8(dt_raw) + pad8(ds_raw) + data
    return msg(0x000C, body)


def gheap_string(w, s):
    """One-object global heap collection; returns the vlen {len,addr,idx} data."""
    return gheap_strings(w, [s])


def gheap_strings(w, strings):
    """Global heap collection with one object per string; returns the
    concatenated vlen {len,addr,idx} records (an array-valued vlen attr)."""
    w.align()
    coll = bytearray(b"GCOL" + struct.pack("<B3xQ", 1, 4096))
    records = []
    for idx, s in enumerate(strings, start=1):
        data = s.encode()
        coll += struct.pack("<HH4xQ", idx, 1, len(data)) + data
        coll += b"\x00" * ((-len(data)) % 8)
        records.append((len(data), idx))
    free = 4096 - len(coll)
    coll += struct.pack("<HH4xQ", 0, 0, free)  # free-space object
    coll += b"\x00" * (4096 - len(coll))
    addr = w.put(bytes(coll))
    return b"".join(struct.pack("<IQI", n, addr, idx) for n, idx in records)


def write_chunked(w, arr, chunk_dims, shuffle):
    """Write all chunks (+deflate, optional shuffle) then the chunk B-tree.
    Returns (btree_addr, filters)."""
    dims = arr.shape
    es = arr.dtype.itemsize
    chunks = []
    for r0 in range(0, dims[0], chunk_dims[0]):
        for c0 in range(0, dims[1], chunk_dims[1]):
            # edge chunks are stored FULL-SIZE (zero-padded)
            block = np.zeros(chunk_dims, dtype=arr.dtype)
            rs = min(chunk_dims[0], dims[0] - r0)
            cs = min(chunk_dims[1], dims[1] - c0)
            block[:rs, :cs] = arr[r0:r0 + rs, c0:c0 + cs]
            raw = block.tobytes()
            if shuffle:
                b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, es)
                raw = b.T.tobytes()
            comp = zlib.compress(raw, 6)
            w.align()
            addr = w.put(comp)
            chunks.append(((r0, c0), addr, len(comp)))
    # v1 B-tree, node type 1, single leaf
    w.align()
    node = bytearray()
    node += b"TREE" + struct.pack("<BBHQQ", 1, 0, len(chunks), UNDEF, UNDEF)
    for (r0, c0), addr, nb in chunks:
        node += struct.pack("<IIQQQ", nb, 0, r0, c0, 0)  # key
        node += struct.pack("<Q", addr)                  # child
    node += struct.pack("<IIQQQ", 0, 0, dims[0], dims[1], 0)  # final key
    btree_addr = w.put(bytes(node))
    filters = [(2, [es]), (1, [6])] if shuffle else [(1, [6])]
    return btree_addr, filters


def write_dataset(w, arr, kind, chunk_dims=None, shuffle=False):
    """Write data (+btree) then the dataset object header; returns OH addr."""
    if kind == "f8":
        dt = dtype_float(8)
    elif kind == "f4":
        dt = dtype_float(4)
    elif kind == "i2":
        dt = dtype_int(2)
    else:
        dt = dtype_int(4)
    msgs = [dataspace(arr.shape), dt]
    if chunk_dims is None:
        w.align()
        raw = arr.tobytes()
        addr = w.put(raw)
        msgs.append(layout_contiguous(addr, len(raw)))
    else:
        btree, filters = write_chunked(w, arr, chunk_dims, shuffle)
        msgs.append(layout_chunked(btree, chunk_dims, arr.dtype.itemsize))
        msgs.append(filter_pipeline(filters))
    w.align()
    return w.put(object_header(msgs))


def write_group(w, links, attrs=()):
    """Old-style group: local heap + SNOD + B-tree + group OH. Returns OH addr."""
    links = sorted(links.items())
    # local heap: offset 0 holds the empty string; names 8-aligned
    heap_data = bytearray(b"\x00" * 8)
    offsets = {}
    for name, _ in links:
        offsets[name] = len(heap_data)
        heap_data += name.encode() + b"\x00"
        while len(heap_data) % 8:
            heap_data += b"\x00"
    w.align()
    heap_data_addr = w.put(bytes(heap_data))
    w.align()
    heap_addr = w.put(b"HEAP" + struct.pack("<B3xQQQ", 0, len(heap_data), UNDEF, heap_data_addr))
    # one SNOD with every entry (name-sorted)
    w.align()
    snod = bytearray(b"SNOD" + struct.pack("<BBH", 1, 0, len(links)))
    for name, oh in links:
        snod += struct.pack("<QQII16x", offsets[name], oh, 0, 0)
    snod_addr = w.put(bytes(snod))
    # B-tree node type 0, level 0, one child
    w.align()
    node = b"TREE" + struct.pack("<BBHQQ", 0, 0, 1, UNDEF, UNDEF)
    node += struct.pack("<QQQ", 0, snod_addr, offsets[links[-1][0]])
    btree_addr = w.put(node)
    w.align()
    oh_addr = w.put(object_header([stab_msg(btree_addr, heap_addr)] + list(attrs)))
    return oh_addr, btree_addr, heap_addr


def make_lut_fixture(out):
    """nc4-style LUT file: sigma0_model(incidence, wspd, phi) + coordinate
    datasets at the ROOT group, with global attributes in both string
    shapes (fixed-length 'units'/'pol'/'resolution', VLEN 'model' via a
    global heap — xarray's netCDF4 backend emits vlen) and one numeric."""
    nI, nW, nP = 5, 7, 3
    i = np.arange(nI)[:, None, None]
    ww = np.arange(nW)[None, :, None]
    p = np.arange(nP)[None, None, :]
    sigma = (-25.0 + (i * nW + ww) * nP + p * 1.0).astype("<f8")

    w = W()
    w.put(b"\x00" * 96)
    links = {
        "sigma0_model": write_dataset(w, sigma, "f8"),  # rank-3, contiguous
        "incidence": write_dataset(w, (15.0 + 5.0 * np.arange(nI)).astype("<f8"), "f8"),
        "wspd": write_dataset(w, (2.0 * np.arange(nW) + 1).astype("<f8"), "f8"),
        "phi": write_dataset(w, (45.0 * np.arange(nP)).astype("<f8"), "f8"),
    }
    vlen_model = gheap_string(w, "nc_lut_h5fix")
    attrs = [
        attr_msg("units", dtype_raw_fixed_str(2), dataspace_raw([]), b"dB"),
        attr_msg("pol", dtype_raw_fixed_str(2), dataspace_raw([]), b"VV"),
        attr_msg("resolution", dtype_raw_fixed_str(4), dataspace_raw([]), b"high"),
        attr_msg("model", dtype_raw_vlen_str(), dataspace_raw([]), vlen_model),
        attr_msg("history", dtype_raw_vlen_str(), dataspace_raw([2]),
                 gheap_strings(w, ["created", "amended"])),  # ARRAY-valued vlen
        attr_msg("version", dtype_raw_f64(), dataspace_raw([2]),
                 struct.pack("<dd", 2.0, 7.5)),
    ]
    root_oh, root_btree, root_heap = write_group(w, links, attrs)

    sb = b"\x89HDF\r\n\x1a\n"
    sb += struct.pack("<BBBBBBBB", 0, 0, 0, 0, 0, 8, 8, 0)
    sb += struct.pack("<HHI", 4, 16, 0)
    sb += struct.pack("<QQQQ", 0, UNDEF, len(w.buf), UNDEF)
    sb += struct.pack("<QQI4x", 0, root_oh, 1)
    sb += struct.pack("<QQ", root_btree, root_heap)
    w.buf[0:96] = sb
    with open(out, "wb") as f:
        f.write(w.buf)
    print(f"wrote {out}: {len(w.buf)} bytes, lut {nI}x{nW}x{nP}")


def main(out):
    nL, nS = 57, 83
    l = np.arange(nL)[:, None]
    s = np.arange(nS)[None, :]
    wspd = (l * 1000 + s).astype("<f8")
    wdir = ((3 * l + 7 * s) % 360).astype("<f4")
    mask = ((l + s) % 5).astype("<i2")
    qual = ((l * 7 + s * 3) % 100).astype("<i4")
    cal = np.arange(11).astype("<f8")
    rootvar = (np.arange(12).reshape(3, 4) * 2).astype("<f8")

    w = W()
    w.put(b"\x00" * 96)  # superblock placeholder (patched below)

    grp_links = {
        "owiWindSpeed": write_dataset(w, wspd, "f8", chunk_dims=(17, 23), shuffle=True),
        "owiWindDirection": write_dataset(w, wdir, "f4"),
        "owiMask": write_dataset(w, mask, "i2"),
        "owiWindQuality": write_dataset(w, qual, "i4", chunk_dims=(16, 40)),
        "owiCalConstObsi": write_dataset(w, cal, "f8"),
    }
    grp_oh, _, _ = write_group(w, grp_links)

    root_links = {
        "owiInversionTables_UV": grp_oh,
        "rootvar": write_dataset(w, rootvar, "f8"),
    }
    root_oh, root_btree, root_heap = write_group(w, root_links)

    sb = b"\x89HDF\r\n\x1a\n"
    sb += struct.pack("<BBBBBBBB", 0, 0, 0, 0, 0, 8, 8, 0)
    sb += struct.pack("<HHI", 4, 16, 0)           # group k's, consistency flags
    sb += struct.pack("<QQQQ", 0, UNDEF, len(w.buf), UNDEF)
    sb += struct.pack("<QQI4x", 0, root_oh, 1)    # root symbol table entry
    sb += struct.pack("<QQ", root_btree, root_heap)  # cached stab scratch
    assert len(sb) == 96, len(sb)
    w.buf[0:96] = sb

    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "wb") as f:
        f.write(w.buf)
    print(f"wrote {out}: {len(w.buf)} bytes, grid {nL}x{nS}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/owi_fixture.h5")
    make_lut_fixture(sys.argv[2] if len(sys.argv) > 2 else "src/test/resources/lut_fixture.nc4")
