#!/usr/bin/env python3
"""Independent MJPEG-AVI fixture for AviSpec, written with raw struct
packing from the public RIFF/AVI layout (a SECOND implementation — any
agreement bug between graft's Avi writer and reader is caught against this
foreign file).

3 frames of opaque bytes (the container doesn't care that they aren't real
JPEGs), one ODD-sized to exercise RIFF word alignment, idx1 present with
movi-RELATIVE offsets.
"""
import struct

OUT = "src/test/resources/clip_fixture.avi"

frames = [
    bytes(range(64)),            # 64 B
    b"\xff" * 101,               # odd size → pad byte after chunk
    bytes(reversed(range(32))),  # 32 B
]
W, H, FPS = 16, 16, 25


def chunk(cc, body):
    return cc + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) % 2 else b"")


def lst(cc, body):
    return b"LIST" + struct.pack("<I", len(cc + body)) + cc + body


avih = chunk(b"avih", struct.pack("<14I", 1000000 // FPS, 0, 0, 0x10,
                                  len(frames), 0, 1, 0, W, H, 0, 0, 0, 0))
strh = chunk(b"strh", b"vids" + b"MJPG" +
             struct.pack("<10I4H", 0, 0, 0, 1, FPS, 0, len(frames), 0,
                         0xFFFFFFFF, 0, 0, 0, W, H))
strf = chunk(b"strf", struct.pack("<IiiHH4sIiiII", 40, W, H, 1, 24, b"MJPG",
                                  0, 0, 0, 0, 0))
hdrl = lst(b"hdrl", avih + lst(b"strl", strh + strf))

movi_body = b""
index = []
for f in frames:
    index.append((len(movi_body) + 4, len(f)))  # offset of ckid, movi-relative
    movi_body += chunk(b"00dc", f)
movi = lst(b"movi", movi_body)

idx1 = chunk(b"idx1", b"".join(
    b"00dc" + struct.pack("<III", 0x10, off, ln) for off, ln in index))

body = b"AVI " + hdrl + movi + idx1
with open(OUT, "wb") as fh:
    fh.write(b"RIFF" + struct.pack("<I", len(body)) + body)

print(f"wrote {OUT}: {len(frames)} frames, {len(body) + 8} bytes")
