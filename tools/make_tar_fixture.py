#!/usr/bin/env python3
"""Independent WebDataset-style tar fixture for TarSpec, written by Python's
stdlib tarfile (a SECOND ustar implementation — any agreement bug between
graft's writer and reader would be caught against this foreign file).

Layout: 2 samples x (jpg-ish binary + txt + json) + 1 keyless member, ustar
format, deterministic metadata.
"""
import io
import json
import tarfile

OUT = "src/test/resources/wds_fixture.tar"

members = [
    ("000001.bin", bytes(range(256)) * 3),          # 768 B "image" payload
    ("000001.txt", "a tiny caption".encode()),
    ("000001.json", json.dumps({"lang": "en", "id": 1}, sort_keys=True).encode()),
    ("000002.bin", b"\x00" * 513),                   # crosses a block boundary
    ("000002.txt", "".encode()),                     # empty member
    ("000002.json", json.dumps({"lang": "fr", "id": 2}, sort_keys=True).encode()),
    ("README", b"not part of any sample"),
]

with tarfile.open(OUT, "w", format=tarfile.USTAR_FORMAT) as tf:
    for name, body in members:
        ti = tarfile.TarInfo(name)
        ti.size = len(body)
        ti.mtime = 0
        ti.mode = 0o644
        tf.addfile(ti, io.BytesIO(body))

print(f"wrote {OUT}: {len(members)} members")
