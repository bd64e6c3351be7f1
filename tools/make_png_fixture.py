#!/usr/bin/env python3
"""Generate spec-faithful PNG fixtures for SourcesSpec's Png reader tests.

Written INDEPENDENTLY of the Scala decoder (same discipline as
make_h5_fixture.py): pure-stdlib zlib + struct, filtering implemented from
the W3C PNG spec / RFC 2083. Each fixture <name>.png ships with
<name>.gray — the expected luma matrix (8 bytes BE width,height then raw
gray bytes) computed here in Python, so the Scala decode+toGray path is
cross-checked against an implementation that shares no code with it.

Fixtures:
  gray        16x12 grayscale, filters cycling 0..4
  rgb          9x7 truecolor, filters cycling 4..0 (odd width exercises
               Paeth/Average at the left edge with bpp=3)
  rgba         8x6 RGBA, filters [1,4]
  graya        5x5 gray+alpha, filters [2,3]
  palette      6x4 indexed with a 5-color PLTE, filters [0,1]
  gray_multi   gray's pixels with IDAT split in 3 + a tEXt chunk between
  interlaced   Adam7-flagged header — decoder must REJECT, no .gray

Usage: python3 tools/make_png_fixture.py [outdir]  (default src/test/resources/png)
"""
import os
import struct
import sys
import zlib

CH = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def chunk(typ, data):
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def filt_rows(rows, bpp, filters):
    prev = bytes(len(rows[0]))
    out = b""
    for r, row in enumerate(rows):
        f = filters[r % len(filters)]
        fr = bytearray([f])
        for i, x in enumerate(row):
            left = row[i - bpp] if i >= bpp else 0
            above = prev[i]
            ul = prev[i - bpp] if i >= bpp else 0
            if f == 0:
                v = x
            elif f == 1:
                v = x - left
            elif f == 2:
                v = x - above
            elif f == 3:
                v = x - ((left + above) >> 1)
            else:
                p = left + above - ul
                pa, pb, pc = abs(p - left), abs(p - above), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (above if pb <= pc else ul)
                v = x - pred
            fr.append(v & 0xFF)
        out += bytes(fr)
        prev = row
    return out


def png(width, height, color_type, rows, filters, plte=None,
        idat_split=1, extra_chunk=False, interlace=0):
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if plte is not None:
        out += chunk(b"PLTE", plte)
    comp = zlib.compress(filt_rows(rows, CH[color_type], filters))
    step = max(1, (len(comp) + idat_split - 1) // idat_split)
    parts = [comp[i:i + step] for i in range(0, len(comp), step)]
    for j, part in enumerate(parts):
        out += chunk(b"IDAT", part)
        if extra_chunk and j == 0:
            out += chunk(b"tEXt", b"Comment\x00fixture")
    return out + chunk(b"IEND", b"")


def luma(r, g, b):
    return (299 * r + 587 * g + 114 * b + 500) // 1000


def expected_gray(width, height, color_type, rows, plte=None):
    ch = CH[color_type]
    g = bytearray()
    for row in rows:
        for x in range(width):
            px = row[x * ch:(x + 1) * ch]
            if color_type == 0:
                g.append(px[0])
            elif color_type == 4:
                g.append(px[0])
            elif color_type == 3:
                r_, g_, b_ = plte[px[0] * 3:px[0] * 3 + 3]
                g.append(luma(r_, g_, b_))
            else:
                g.append(luma(px[0], px[1], px[2]))
    return struct.pack(">II", width, height) + bytes(g)


def main(outdir):
    os.makedirs(outdir, exist_ok=True)

    def write(name, data, gray=None):
        with open(os.path.join(outdir, name + ".png"), "wb") as f:
            f.write(data)
        if gray is not None:
            with open(os.path.join(outdir, name + ".gray"), "wb") as f:
                f.write(gray)

    # gray 16x12: v = (3*r + 7*c + r*c) % 256
    w, h = 16, 12
    rows = [bytes((3 * r + 7 * c + r * c) % 256 for c in range(w)) for r in range(h)]
    write("gray", png(w, h, 0, rows, [0, 1, 2, 3, 4]),
          expected_gray(w, h, 0, rows))
    write("gray_multi",
          png(w, h, 0, rows, [0, 1, 2, 3, 4], idat_split=3, extra_chunk=True),
          expected_gray(w, h, 0, rows))

    # rgb 9x7: channels diverge so luma is a real mix
    w, h = 9, 7
    rows = [bytes(v for c in range(w)
                  for v in ((11 * r + 2 * c) % 256, (5 * c * c + r) % 256, (r * r + 13 * c) % 256))
            for r in range(h)]
    write("rgb", png(w, h, 2, rows, [4, 3, 2, 1, 0]),
          expected_gray(w, h, 2, rows))

    # rgba 8x6: alpha varies and must be ignored by luma
    w, h = 8, 6
    rows = [bytes(v for c in range(w)
                  for v in ((r * 40 + c) % 256, (c * 30) % 256, (r * 17 + 5 * c) % 256, (r * c * 7) % 256))
            for r in range(h)]
    write("rgba", png(w, h, 6, rows, [1, 4]),
          expected_gray(w, h, 6, rows))

    # gray+alpha 5x5
    w, h = 5, 5
    rows = [bytes(v for c in range(w) for v in ((r * 50 + c * 9) % 256, (255 - 10 * c) % 256))
            for r in range(h)]
    write("graya", png(w, h, 4, rows, [2, 3]),
          expected_gray(w, h, 4, rows))

    # palette 6x4 with 5 colors
    w, h = 6, 4
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 128, 128, 128, 10, 200, 30])
    rows = [bytes((r + c) % 5 for c in range(w)) for r in range(h)]
    write("palette", png(w, h, 3, rows, [0, 1], plte=plte),
          expected_gray(w, h, 3, rows, plte=plte))

    # Adam7-flagged: must be rejected (data is a valid non-interlaced body,
    # which an interlace-ignoring decoder would happily mis-read)
    w, h = 8, 8
    rows = [bytes((r * 8 + c) % 256 for c in range(w)) for r in range(h)]
    write("interlaced", png(w, h, 0, rows, [0], interlace=1))

    print(f"wrote fixtures to {outdir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/png")
