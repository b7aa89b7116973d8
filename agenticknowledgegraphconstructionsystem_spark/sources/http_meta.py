"""HTTP response metadata + charset-aware decode — the part of the
Common-Crawl first mile between WARC framing (sources/warc.py) and text
extraction (operators/extract.py).

Common Crawl ``response`` records store the raw HTTP/1.x response:
status line, header block, then a body that may be chunked
(Transfer-Encoding) and/or compressed (Content-Encoding) and is encoded
in whatever charset the origin served.  A real 100 TB crawl pipeline
must (a) gate on status and media type BEFORE paying extraction, and
(b) normalize every page to one text encoding so downstream byte
invariants hold.  All pure stdlib functions of bytes — testable without
Spark, executor-side via mapInPandas (sources/warc.py wires them).

Charset detection ladder (first hit wins), a deterministic subset of
the WHATWG encoding sniff:

1. byte-order mark (UTF-8 / UTF-16 LE / UTF-16 BE),
2. ``charset=`` parameter of the Content-Type response header,
3. ``<meta charset=…>`` / ``<meta http-equiv=content-type …>`` inside
   the first 1024 bytes (the spec's prescan window),
4. strict UTF-8 trial decode,
5. windows-1252 (the web's de-facto latin-1 superset; per WHATWG the
   iso-8859-1 / us-ascii labels also resolve here).

Reference parity note: the reference fetches its documents over HTTPS
with axios and never sees raw HTTP captures (src/tools/
fetch_papers.py:59-189 downloads PDFs); this tier is rebuild-only
surface mandated by the brief's Common-Crawl-style input table.
"""

from __future__ import annotations

import codecs
import re
import zlib

# WHATWG label → python codec for the labels that do NOT resolve to
# themselves; everything else goes through codecs.lookup.
_CHARSET_ALIASES = {
    "iso-8859-1": "windows-1252",
    "iso8859-1": "windows-1252",
    "latin-1": "windows-1252",
    "latin1": "windows-1252",
    "ascii": "windows-1252",
    "us-ascii": "windows-1252",
    "unicode-1-1-utf-8": "utf-8",
    "utf8": "utf-8",
}

_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]*?charset\s*=\s*["']?\s*([a-zA-Z0-9_:.()-]+)""",
    re.IGNORECASE,
)

_PRESCAN_BYTES = 1024

_STATUS_RE = re.compile(rb"^HTTP/\d(?:\.\d)? (\d{3})")


def normalize_charset(label: str | None) -> str | None:
    """WHATWG-ish label → canonical python codec name, or None for
    unknown labels (the ladder then falls through to trial decode)."""
    if not label:
        return None
    label = label.strip().strip("\"'").lower()
    label = _CHARSET_ALIASES.get(label, label)
    try:
        return codecs.lookup(label).name
    except LookupError:
        return None


def parse_http_response(body: bytes) -> tuple[int | None, dict[str, str], bytes]:
    """Raw HTTP response bytes → (status, lowercased headers, payload).
    Non-HTTP bodies (no status line) return (None, {}, body) so bare
    captures keep flowing — a catalog pass must not raise on the long
    tail."""
    m = _STATUS_RE.match(body)
    if not m:
        return None, {}, body
    he = body.find(b"\r\n\r\n")
    if he < 0:
        return int(m.group(1)), {}, b""
    headers: dict[str, str] = {}
    for line in body[:he].split(b"\r\n")[1:]:
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.decode("ascii", "replace").strip().lower()] = v.decode(
                "latin-1"
            ).strip()
    return int(m.group(1)), headers, body[he + 4 :]


def dechunk(payload: bytes) -> bytes:
    """Transfer-Encoding: chunked → the joined chunk data (trailers
    dropped).  Malformed chunk framing returns the payload UNCHANGED —
    on crawl data a mis-flagged body must degrade, not raise."""
    out = []
    pos = 0
    while True:
        nl = payload.find(b"\r\n", pos)
        if nl < 0:
            return payload
        size_tok = payload[pos:nl].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            return payload
        if size == 0:
            return b"".join(out)
        start = nl + 2
        end = start + size
        if end + 2 > len(payload) or payload[end : end + 2] != b"\r\n":
            return payload
        out.append(payload[start:end])
        pos = end + 2


def decode_content_encoding(payload: bytes, encoding: str | None) -> bytes:
    """Content-Encoding: gzip/deflate/x-gzip → inflated bytes (stdlib
    zlib); identity/None pass through; corrupt streams degrade to the
    raw payload (same crawl-robustness contract as :func:`dechunk`);
    br/zstd would need external libs and pass through unchanged."""
    if not encoding:
        return payload
    enc = encoding.strip().lower()
    try:
        if enc in ("gzip", "x-gzip"):
            return zlib.decompress(payload, 16 + zlib.MAX_WBITS)
        if enc == "deflate":
            try:
                return zlib.decompress(payload)
            except zlib.error:
                return zlib.decompress(payload, -zlib.MAX_WBITS)  # raw deflate
    except zlib.error:
        return payload
    return payload


def detect_charset(
    content_type: str | None, payload: bytes
) -> tuple[str | None, str]:
    """→ (python codec name or None, source) where source ∈
    {'bom', 'header', 'meta', 'none'}.  Steps 1-3 of the ladder; trial
    decode (steps 4-5) lives in :func:`decode_html_payload`."""
    if payload[:3] == b"\xef\xbb\xbf":
        return "utf-8", "bom"
    if payload[:2] == b"\xff\xfe":
        return "utf-16-le", "bom"
    if payload[:2] == b"\xfe\xff":
        return "utf-16-be", "bom"
    if content_type and "charset=" in content_type.lower():
        label = content_type.lower().split("charset=", 1)[1].split(";")[0]
        cs = normalize_charset(label)
        if cs:
            return cs, "header"
    m = _META_CHARSET_RE.search(payload[:_PRESCAN_BYTES])
    if m:
        cs = normalize_charset(m.group(1).decode("ascii", "replace"))
        if cs:
            return cs, "meta"
    return None, "none"


def decode_html_payload(
    payload: bytes, content_type: str | None = None
) -> tuple[str, str]:
    """Full ladder → (text, charset_used).  Declared charsets decode
    with errors='replace' (a page that lies about its encoding must
    still land); the undeclared path tries strict UTF-8 and falls back
    to windows-1252 with latin-1 filling cp1252's five undefined
    bytes — total, deterministic, never raises."""
    cs, src = detect_charset(content_type, payload)
    if src == "bom":
        skip = 3 if cs == "utf-8" else 2
        return payload[skip:].decode(cs, errors="replace"), cs
    if cs is not None:
        return payload.decode(cs, errors="replace"), cs
    try:
        return payload.decode("utf-8"), "utf-8"
    except UnicodeDecodeError:
        try:
            return payload.decode("windows-1252"), "windows-1252"
        except UnicodeDecodeError:
            # cp1252 leaves 0x81 0x8d 0x8f 0x90 0x9d undefined
            return payload.decode("latin-1"), "windows-1252"


def http_payload_bytes(body: bytes) -> tuple[int | None, str | None, bytes]:
    """One-call transport normalization: parse the response, undo
    chunking then content-coding → (status, content_type, raw payload
    bytes ready for charset detection)."""
    status, headers, payload = parse_http_response(body)
    if "chunked" in headers.get("transfer-encoding", "").lower():
        payload = dechunk(payload)
    payload = decode_content_encoding(payload, headers.get("content-encoding"))
    return status, headers.get("content-type"), payload
