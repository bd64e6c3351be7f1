#!/usr/bin/env python3
"""Generate a spec-faithful .warc.gz fixture for WarcSpec.

Written INDEPENDENTLY of graft.sources.Warc (Python stdlib gzip, one member
per record — the standard splittable Common-Crawl layout): the Scala reader
and this writer only agree if both follow WARC 1.0 + RFC 1952.

Records: a warcinfo header record (readers must skip it), three response
records with known bodies (one empty, one with CRLFs inside the body, one
1000-byte deterministic text), and a request record (skipped too).

Usage: python3 tools/make_warc_fixture.py [out.warc.gz]
       (default src/test/resources/crawl_fixture.warc.gz)
"""
import gzip, io, sys, os

def record(warc_type, rec_id, uri, body: bytes) -> bytes:
    head = (
        "WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: {rec_id}\r\n"
        "WARC-Date: 2024-01-01T00:00:00Z\r\n"
        + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
        + "Content-Type: text/plain\r\n"
        f"Content-Length: {len(body)}\r\n"
        "\r\n"
    ).encode()
    return head + body + b"\r\n\r\n"

def member(data: bytes) -> bytes:
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
        g.write(data)
    return buf.getvalue()

def main():
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "src", "test", "resources",
        "crawl_fixture.warc.gz")
    body3 = ("the quick brown fox %d " % 7).encode() * 40  # 880 bytes
    recs = [
        record("warcinfo", "<urn:uuid:info>", "", b"robots: classic\r\n"),
        record("response", "<urn:uuid:r1>", "http://example.com/1",
               b"hello warc world"),
        record("response", "<urn:uuid:r2>", "http://example.com/2", b""),
        record("request", "<urn:uuid:q1>", "http://example.com/3",
               b"GET / HTTP/1.1"),
        record("response", "<urn:uuid:r3>", "http://example.com/3",
               b"line one\r\nline two\r\n" + body3),
    ]
    with open(out, "wb") as f:
        for r in recs:
            f.write(member(r))
    print(f"wrote {out} ({os.path.getsize(out)} bytes, {len(recs)} members)")

if __name__ == "__main__":
    main()
