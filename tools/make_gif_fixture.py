#!/usr/bin/env python3
"""Independent GIF fixture for GifSpec, packed with raw struct bytes from the
public GIF89a spec (a SECOND implementation — no LZW dictionary logic shared
with graft's codec: every pixel is preceded by a CLEAR code, a valid
degenerate stream any conformant decoder must accept).

Exercises: 4-entry COLOR palette (2-bit min code size → 3-bit codes),
BT.601 gray collapse, a graphic-control extension to skip, and tiny 2-byte
data sub-blocks to exercise block stitching.
"""
import struct

OUT = "src/test/resources/tile_fixture.gif"

W, H = 6, 4
# palette: red, green, blue, white → luma 76, 150, 29, 255
palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)]
pixels = [(x + y) % 4 for y in range(H) for x in range(W)]

CLEAR, EOI = 4, 5
codes = []
for p in pixels:
    codes.extend([CLEAR, p])
codes.append(EOI)

acc = nbits = 0
data = bytearray()
for c in codes:
    acc |= c << nbits
    nbits += 3
    while nbits >= 8:
        data.append(acc & 0xFF)
        acc >>= 8
        nbits -= 8
if nbits:
    data.append(acc & 0xFF)

out = bytearray()
out += b"GIF89a"
out += struct.pack("<HH", W, H)
out += bytes([0x81, 0, 0])            # global table, 4 entries (2^(1+1))
for r, g, b in palette:
    out += bytes([r, g, b])
out += bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])   # graphic control extension
out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, W, H) + bytes([0])
out += bytes([2])                      # LZW min code size
for i in range(0, len(data), 2):       # 2-byte sub-blocks
    chunk = data[i:i + 2]
    out += bytes([len(chunk)]) + chunk
out += bytes([0, 0x3B])

with open(OUT, "wb") as fh:
    fh.write(out)
print(f"wrote {OUT}: {len(out)} bytes, {len(pixels)} px")
