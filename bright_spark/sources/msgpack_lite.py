"""Minimal self-contained MessagePack codec (the subset the reference
ingests: arrays of maps holding nil/bool/int/float/str/bin/array/map —
formats/msgpack.go:12-24 unpacks into ``[]map[string]any``).

Implemented from the public MessagePack specification
(https://github.com/msgpack/msgpack/blob/master/spec.md) so S2 runs
end-to-end even though the ``msgpack`` package is not installed in
this image; when the C-accelerated library IS present, formats.py
prefers it. Ext types are rejected (the reference's document model has
no ext values).
"""

from __future__ import annotations

import struct


class MsgpackError(ValueError):
    pass


# ------------------------------------------------------------- decode

def _read_length(buf: bytes, pos: int, width: int) -> tuple[int, int]:
    end = pos + width
    if end > len(buf):
        raise MsgpackError("truncated msgpack length")
    return int.from_bytes(buf[pos:end], "big"), end


def _decode(buf: bytes, pos: int):
    if pos >= len(buf):
        raise MsgpackError("truncated msgpack data")
    b = buf[pos]
    pos += 1
    if b <= 0x7F:                       # positive fixint
        return b, pos
    if 0x80 <= b <= 0x8F:               # fixmap
        return _decode_map(buf, pos, b & 0x0F)
    if 0x90 <= b <= 0x9F:               # fixarray
        return _decode_array(buf, pos, b & 0x0F)
    if 0xA0 <= b <= 0xBF:               # fixstr
        return _decode_str(buf, pos, b & 0x1F)
    if b >= 0xE0:                       # negative fixint
        return b - 0x100, pos
    if b == 0xC0:
        return None, pos
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    if b in (0xC4, 0xC5, 0xC6):         # bin8/16/32
        n, pos = _read_length(buf, pos, 1 << (b - 0xC4))
        if pos + n > len(buf):
            raise MsgpackError("truncated bin")
        return bytes(buf[pos:pos + n]), pos + n
    if b == 0xCA:                       # float32
        if pos + 4 > len(buf):
            raise MsgpackError("truncated float32")
        return struct.unpack(">f", buf[pos:pos + 4])[0], pos + 4
    if b == 0xCB:                       # float64
        if pos + 8 > len(buf):
            raise MsgpackError("truncated float64")
        return struct.unpack(">d", buf[pos:pos + 8])[0], pos + 8
    if 0xCC <= b <= 0xCF:               # uint8/16/32/64
        n, pos = _read_length(buf, pos, 1 << (b - 0xCC))
        return n, pos
    if 0xD0 <= b <= 0xD3:               # int8/16/32/64
        width = 1 << (b - 0xD0)
        n, pos = _read_length(buf, pos, width)
        bits = width * 8
        if n >= 1 << (bits - 1):
            n -= 1 << bits
        return n, pos
    if b in (0xD9, 0xDA, 0xDB):         # str8/16/32
        n, pos = _read_length(buf, pos, 1 << (b - 0xD9))
        return _decode_str(buf, pos, n)
    if b in (0xDC, 0xDD):               # array16/32
        n, pos = _read_length(buf, pos, 2 << (b - 0xDC))
        return _decode_array(buf, pos, n)
    if b in (0xDE, 0xDF):               # map16/32
        n, pos = _read_length(buf, pos, 2 << (b - 0xDE))
        return _decode_map(buf, pos, n)
    raise MsgpackError(f"unsupported msgpack type byte 0x{b:02x} "
                       "(ext types are outside the document model)")


def _decode_str(buf: bytes, pos: int, n: int):
    if pos + n > len(buf):
        raise MsgpackError("truncated str")
    return buf[pos:pos + n].decode("utf-8"), pos + n


def _decode_array(buf: bytes, pos: int, n: int):
    out = []
    for _ in range(n):
        v, pos = _decode(buf, pos)
        out.append(v)
    return out, pos


def _decode_map(buf: bytes, pos: int, n: int):
    out = {}
    for _ in range(n):
        k, pos = _decode(buf, pos)
        v, pos = _decode(buf, pos)
        out[k] = v
    return out, pos


def unpackb(buf: bytes):
    """Decode one msgpack value; trailing bytes are an error (one blob
    = one value, formats/msgpack.go semantics)."""
    v, pos = _decode(bytes(buf), 0)
    if pos != len(buf):
        raise MsgpackError(f"{len(buf) - pos} trailing bytes after value")
    return v


# ------------------------------------------------------------- encode

def _encode(v, out: bytearray) -> None:
    if v is None:
        out.append(0xC0)
    elif v is True:
        out.append(0xC3)
    elif v is False:
        out.append(0xC2)
    elif isinstance(v, int):
        if 0 <= v <= 0x7F:
            out.append(v)
        elif -32 <= v < 0:
            out.append(v & 0xFF)
        elif v >= 0:
            for code, width in ((0xCC, 1), (0xCD, 2), (0xCE, 4), (0xCF, 8)):
                if v < 1 << (8 * width):
                    out.append(code)
                    out.extend(v.to_bytes(width, "big"))
                    return
            raise MsgpackError("int too large")
        else:
            for code, width in ((0xD0, 1), (0xD1, 2), (0xD2, 4), (0xD3, 8)):
                if -(1 << (8 * width - 1)) <= v:
                    out.append(code)
                    out.extend((v & ((1 << (8 * width)) - 1)).to_bytes(width, "big"))
                    return
            raise MsgpackError("int too small")
    elif isinstance(v, float):
        out.append(0xCB)
        out.extend(struct.pack(">d", v))
    elif isinstance(v, str):
        raw = v.encode("utf-8")
        n = len(raw)
        if n <= 0x1F:
            out.append(0xA0 | n)
        elif n <= 0xFF:
            out.extend((0xD9, n))
        elif n <= 0xFFFF:
            out.append(0xDA)
            out.extend(n.to_bytes(2, "big"))
        else:
            out.append(0xDB)
            out.extend(n.to_bytes(4, "big"))
        out.extend(raw)
    elif isinstance(v, (bytes, bytearray)):
        n = len(v)
        if n <= 0xFF:
            out.extend((0xC4, n))
        elif n <= 0xFFFF:
            out.append(0xC5)
            out.extend(n.to_bytes(2, "big"))
        else:
            out.append(0xC6)
            out.extend(n.to_bytes(4, "big"))
        out.extend(v)
    elif isinstance(v, (list, tuple)):
        n = len(v)
        if n <= 0x0F:
            out.append(0x90 | n)
        elif n <= 0xFFFF:
            out.append(0xDC)
            out.extend(n.to_bytes(2, "big"))
        else:
            out.append(0xDD)
            out.extend(n.to_bytes(4, "big"))
        for item in v:
            _encode(item, out)
    elif isinstance(v, dict):
        n = len(v)
        if n <= 0x0F:
            out.append(0x80 | n)
        elif n <= 0xFFFF:
            out.append(0xDE)
            out.extend(n.to_bytes(2, "big"))
        else:
            out.append(0xDF)
            out.extend(n.to_bytes(4, "big"))
        for k, val in v.items():
            _encode(k, out)
            _encode(val, out)
    else:
        raise MsgpackError(f"unsupported type {type(v).__name__}")


def packb(v) -> bytes:
    out = bytearray()
    _encode(v, out)
    return bytes(out)
