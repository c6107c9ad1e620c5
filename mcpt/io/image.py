"""Image IO: Radiance .hdr write, PNG write, minimal OpenEXR read/write.

Replaces the reference's vendored stb_image_write (``thirdpartywrapper.cpp:14-23``
writes ``<objname>.hdr`` via ``stbi_write_hdr`` with a vertical flip) and adds an EXR
path so the course-provided 2048-spp ground truths (``Scene/*/*.exr``, Mitsuba 0.5,
ZIP-compressed half-float scanlines) can be loaded as the physics oracle for RMSE
tests — no OpenEXR bindings are available in this environment, so the ZIP scanline
codec is implemented here directly (zlib + the EXR delta/interleave predictor).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# Radiance .hdr (RGBE), flat (uncompressed) scanlines — matches stb's output
# format family; readable by the same tools that read the reference's dumps.
# ---------------------------------------------------------------------------


def _float_to_rgbe(rgb: np.ndarray) -> np.ndarray:
    rgb = np.maximum(rgb, 0.0).astype(np.float32)
    maxc = rgb.max(axis=-1)
    rgbe = np.zeros(rgb.shape[:-1] + (4,), np.uint8)
    valid = maxc >= 1e-32
    # frexp: maxc = m * 2^e with m in [0.5, 1)
    m, e = np.frexp(np.where(valid, maxc, 1.0))
    scale = np.where(valid, m * 256.0 / np.maximum(maxc, 1e-32), 0.0)
    rgbe[..., :3] = np.clip(rgb * scale[..., None], 0, 255).astype(np.uint8)
    rgbe[..., 3] = np.where(valid, e + 128, 0).astype(np.uint8)
    return rgbe


def write_hdr(path: str, image: np.ndarray, flip_vertical: bool = True) -> None:
    """Write (H, W, 3) float32 radiance to a Radiance .hdr file.

    ``flip_vertical=True`` matches the reference's
    ``stbi_flip_vertically_on_write(true)`` (``thirdpartywrapper.cpp:21``), whose
    framebuffer has row 0 at the bottom.
    """
    img = np.asarray(image, np.float32)
    if img.ndim != 3 or img.shape[2] < 3:
        raise ValueError(f"expected (H, W, 3+) image, got {img.shape}")
    img = img[..., :3]
    if flip_vertical:
        img = img[::-1]
    h, w = img.shape[:2]
    rgbe = _float_to_rgbe(img)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())


def read_hdr(path: str) -> np.ndarray:
    """Read a Radiance .hdr file (flat or RLE scanlines) to (H, W, 3) float32."""
    with open(path, "rb") as f:
        data = f.read()
    if not data.startswith(b"#?"):
        raise ValueError("not a Radiance file")
    # header ends at blank line; next line is resolution
    hdr_end = data.index(b"\n\n")
    rest = data[hdr_end + 2 :]
    nl = rest.index(b"\n")
    res = rest[:nl].decode().split()
    if res[0] != "-Y" or res[2] != "+X":
        raise ValueError(f"unsupported orientation {res}")
    h, w = int(res[1]), int(res[3])
    payload = rest[nl + 1 :]
    rgbe = np.zeros((h, w, 4), np.uint8)
    pos = 0
    for y in range(h):
        if (
            len(payload) - pos >= 4
            and payload[pos] == 2
            and payload[pos + 1] == 2
            and (payload[pos + 2] << 8 | payload[pos + 3]) == w
        ):
            pos += 4  # adaptive RLE scanline
            for c in range(4):
                x = 0
                while x < w:
                    count = payload[pos]
                    pos += 1
                    if count > 128:  # run
                        rgbe[y, x : x + count - 128, c] = payload[pos]
                        pos += 1
                        x += count - 128
                    else:  # literal
                        seg = np.frombuffer(payload, np.uint8, count, pos)
                        rgbe[y, x : x + count, c] = seg
                        pos += count
                        x += count
        else:  # flat scanline
            row = np.frombuffer(payload, np.uint8, w * 4, pos).reshape(w, 4)
            rgbe[y] = row
            pos += w * 4
    e = rgbe[..., 3].astype(np.int32)
    scale = np.where(e > 0, np.ldexp(1.0, e - 136), 0.0).astype(np.float32)
    return rgbe[..., :3].astype(np.float32) * scale[..., None]


# ---------------------------------------------------------------------------
# PNG (8-bit RGB, zlib) — for quick-look tonemapped output.
# ---------------------------------------------------------------------------


def write_png(path: str, image_u8: np.ndarray) -> None:
    img = np.asarray(image_u8)
    if img.dtype != np.uint8:
        raise ValueError("write_png expects uint8")
    if img.ndim == 2:
        img = img[..., None].repeat(3, axis=-1)
    h, w, c = img.shape
    ctype = {1: 0, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)))
        f.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        f.write(chunk(b"IEND", b""))


def tonemap_srgb(hdr: np.ndarray, gamma: float = 2.2) -> np.ndarray:
    """Simple gamma tonemap to uint8 — the reference's blit applies pow(c, 1/2.2)
    (``testkernel.cl:9-14``)."""
    x = np.clip(np.asarray(hdr, np.float32), 0.0, 1.0) ** (1.0 / gamma)
    return (x * 255.0 + 0.5).astype(np.uint8)


# ---------------------------------------------------------------------------
# OpenEXR — scanline images, NONE/RLE/ZIPS/ZIP compression, HALF/FLOAT channels.
# ---------------------------------------------------------------------------

_PIXEL_DTYPE = {0: np.uint32, 1: np.float16, 2: np.float32}  # UINT, HALF, FLOAT


def _exr_predictor_decode(buf: bytes) -> bytes:
    t = np.frombuffer(buf, np.uint8).astype(np.int64)
    t = (np.cumsum(t - 128) + 128 * 1) % 256  # delta decode: t[i] += t[i-1] - 128
    t = t.astype(np.uint8)
    # de-interleave: first half -> even positions, second half -> odd
    out = np.zeros_like(t)
    half = (len(t) + 1) // 2
    out[0::2] = t[:half]
    out[1::2] = t[half:]
    return out.tobytes()


def _exr_predictor_encode(buf: bytes) -> bytes:
    t = np.frombuffer(buf, np.uint8)
    inter = np.concatenate([t[0::2], t[1::2]])
    d = np.diff(inter.astype(np.int64), prepend=np.int64(0))
    first = inter[:1].astype(np.uint8)
    enc = ((d + 128) % 256).astype(np.uint8)
    enc[0] = first[0]
    return enc.tobytes()


def read_exr(path: str) -> dict[str, np.ndarray]:
    """Read a scanline EXR into {channel_name: (H, W) float32}."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != b"\x76\x2f\x31\x01":
        raise ValueError("not an EXR file")
    version = struct.unpack("<I", data[4:8])[0]
    if version & 0x200:
        raise ValueError("tiled EXR unsupported")
    off = 8
    attrs = {}
    while True:
        end = data.index(b"\x00", off)
        name = data[off:end].decode()
        off = end + 1
        if name == "":
            break
        end = data.index(b"\x00", off)
        typ = data[off:end].decode()
        off = end + 1
        size = struct.unpack("<i", data[off : off + 4])[0]
        off += 4
        attrs[name] = (typ, data[off : off + size])
        off += size

    # channels
    chl = attrs["channels"][1]
    channels = []
    p = 0
    while chl[p] != 0:
        e = chl.index(b"\x00", p)
        cname = chl[p:e].decode()
        ptype, _plin, xs, ys = struct.unpack("<iBxxxii", chl[e + 1 : e + 17])
        channels.append((cname, ptype, xs, ys))
        p = e + 17
    channels.sort(key=lambda c: c[0])  # EXR stores channels alphabetically per line

    xmin, ymin, xmax, ymax = struct.unpack("<4i", attrs["dataWindow"][1])
    w, h = xmax - xmin + 1, ymax - ymin + 1
    comp = attrs["compression"][1][0]
    lines_per_block = {0: 1, 1: 1, 2: 1, 3: 16}.get(comp)
    if lines_per_block is None:
        raise ValueError(f"unsupported EXR compression {comp}")

    n_blocks = (h + lines_per_block - 1) // lines_per_block
    offsets = struct.unpack(f"<{n_blocks}Q", data[off : off + 8 * n_blocks])

    out = {
        cname: np.zeros((h, w), np.float32) for cname, *_ in channels
    }
    bytes_per_px = {0: 4, 1: 2, 2: 4}
    for bi, boff in enumerate(offsets):
        y, dsize = struct.unpack("<ii", data[boff : boff + 8])
        raw = data[boff + 8 : boff + 8 + dsize]
        ny = min(lines_per_block, ymax - y + 1)
        expect = ny * sum(w * bytes_per_px[pt] for _, pt, _, _ in channels)
        if comp == 0 or dsize >= expect:
            dec = raw[:expect]
        elif comp in (2, 3):  # ZIPS / ZIP
            dec = _exr_predictor_decode(zlib.decompress(raw))
        elif comp == 1:  # RLE
            dec = _exr_predictor_decode(_rle_decompress(raw, expect))
        p = 0
        for line in range(ny):
            for cname, ptype, _, _ in channels:
                nb = w * bytes_per_px[ptype]
                arr = np.frombuffer(dec, _PIXEL_DTYPE[ptype], w, p)
                out[cname][y - ymin + line] = arr.astype(np.float32)
                p += nb
    return out


def _rle_decompress(raw: bytes, expect: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(raw) and len(out) < expect:
        n = struct.unpack("<b", raw[i : i + 1])[0]
        i += 1
        if n < 0:
            out += raw[i : i - n]
            i += -n
        else:
            out += raw[i : i + 1] * (n + 1)
            i += 1
    return bytes(out)


def read_exr_rgb(path: str) -> np.ndarray:
    ch = read_exr(path)
    return np.stack([ch["R"], ch["G"], ch["B"]], axis=-1)


def write_exr(path: str, image: np.ndarray, half: bool = True) -> None:
    """Write (H, W, 3) float to a ZIP-compressed scanline EXR (channels B, G, R)."""
    img = np.asarray(image, np.float32)
    h, w = img.shape[:2]
    dt = np.float16 if half else np.float32
    ptype = 1 if half else 2
    planes = {"B": img[..., 2].astype(dt), "G": img[..., 1].astype(dt), "R": img[..., 0].astype(dt)}
    names = sorted(planes)

    def attr(name: str, typ: str, payload: bytes) -> bytes:
        return (
            name.encode() + b"\x00" + typ.encode() + b"\x00"
            + struct.pack("<i", len(payload)) + payload
        )

    chl = b""
    for n in names:
        chl += n.encode() + b"\x00" + struct.pack("<iBxxxii", ptype, 0, 1, 1)
    chl += b"\x00"
    box = struct.pack("<4i", 0, 0, w - 1, h - 1)
    header = (
        attr("channels", "chlist", chl)
        + attr("compression", "compression", b"\x03")
        + attr("dataWindow", "box2i", box)
        + attr("displayWindow", "box2i", box)
        + attr("lineOrder", "lineOrder", b"\x00")
        + attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
        + attr("screenWindowCenter", "v2f", struct.pack("<2f", 0, 0))
        + attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
        + b"\x00"
    )
    blocks = []
    for y0 in range(0, h, 16):
        ny = min(16, h - y0)
        raw = b"".join(
            planes[n][y0 + line].tobytes() for line in range(ny) for n in names
        )
        comp = zlib.compress(_exr_predictor_encode(raw), 6)
        if len(comp) >= len(raw):
            comp = raw
        blocks.append((y0, comp))
    with open(path, "wb") as f:
        base = 8 + len(header) + 8 * len(blocks)
        f.write(b"\x76\x2f\x31\x01" + struct.pack("<I", 2))
        f.write(header)
        off = base
        for y0, comp in blocks:
            f.write(struct.pack("<Q", off))
            off += 8 + len(comp)
        for y0, comp in blocks:
            f.write(struct.pack("<ii", y0, len(comp)) + comp)
