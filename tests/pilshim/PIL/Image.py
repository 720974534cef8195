"""``PIL.Image`` shim: real (stdlib-only) PNG pixel decoding behind
Pillow's ``open`` surface. See package docstring for scope."""

from __future__ import annotations

import struct
import zlib

# bands by PNG color type: gray, rgb, gray+alpha, rgba (palette excluded:
# decoding PLTE indirection is out of scope for the shim)
_BANDS = {0: ("L",), 2: ("R", "G", "B"), 4: ("L", "A"), 6: ("R", "G", "B", "A")}


class UnidentifiedImageError(ValueError):
    """Mirror of Pillow's open-failure type (callers catch Exception)."""


class _PngImage:
    def __init__(self, data: bytes):
        if data[:8] != b"\x89PNG\r\n\x1a\n":
            raise UnidentifiedImageError("not a PNG (shim decodes PNG only)")
        pos, idat = 8, b""
        w = h = ct = None
        while pos + 8 <= len(data):
            ln, typ = struct.unpack(">I4s", data[pos : pos + 8])
            chunk = data[pos + 8 : pos + 8 + ln]
            if typ == b"IHDR":
                w, h, depth, ct, _comp, _filt, interlace = struct.unpack(
                    ">IIBBBBB", chunk
                )
                if depth != 8 or ct not in _BANDS or interlace:
                    raise UnidentifiedImageError(
                        f"unsupported PNG (depth={depth} color_type={ct} "
                        f"interlace={interlace})"
                    )
            elif typ == b"IDAT":
                idat += chunk
            elif typ == b"IEND":
                break
            pos += 12 + ln
        if w is None or not idat:
            raise UnidentifiedImageError("truncated PNG (no IHDR/IDAT)")
        nch = len(_BANDS[ct])
        stride = w * nch
        raw = zlib.decompress(idat)
        if len(raw) != h * (1 + stride):
            raise UnidentifiedImageError("PNG pixel data length mismatch")
        # scanline defiltering — the part a header parser never does
        out = bytearray()
        prev = bytearray(stride)
        i = 0
        for _ in range(h):
            f = raw[i]
            line = bytearray(raw[i + 1 : i + 1 + stride])
            i += 1 + stride
            if f == 1:  # Sub
                for x in range(nch, stride):
                    line[x] = (line[x] + line[x - nch]) & 0xFF
            elif f == 2:  # Up
                for x in range(stride):
                    line[x] = (line[x] + prev[x]) & 0xFF
            elif f == 3:  # Average
                for x in range(stride):
                    a = line[x - nch] if x >= nch else 0
                    line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
            elif f == 4:  # Paeth
                for x in range(stride):
                    a = line[x - nch] if x >= nch else 0
                    b = prev[x]
                    c = prev[x - nch] if x >= nch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    line[x] = (line[x] + pr) & 0xFF
            elif f != 0:
                raise UnidentifiedImageError(f"bad PNG filter type {f}")
            out += line
            prev = line
        self.size = (int(w), int(h))
        self._bands = _BANDS[ct]
        self._pixels = bytes(out)

    def getbands(self):
        return self._bands

    def tobytes(self) -> bytes:
        return self._pixels

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def open(fp):  # noqa: A001 - Pillow's public name
    data = fp.read() if hasattr(fp, "read") else bytes(fp)
    return _PngImage(data)
