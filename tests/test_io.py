"""Native codec shim: round trips, PIL cross-check, magic-byte sniffing,
damaged input handling (the reference's test_image.py strategy)."""

import io as _io

import numpy as np
import pytest
from PIL import Image as PILImage

from cpu_vision_tpu.io import (
    ImageReadMode,
    decode_image,
    decode_jpeg,
    decode_png,
    encode_jpeg,
    encode_png,
)
from cpu_vision_tpu.io.image import _load_lib


def _rgb(rng, h=24, w=32):
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


native = pytest.mark.skipif(_load_lib() is None, reason="native codec shim unavailable")


@native
class TestNative:
    def test_png_roundtrip_exact(self, rng):
        img = _rgb(rng)
        data = encode_png(img)
        out = decode_png(data)
        np.testing.assert_array_equal(out, img)

    def test_png_gray_and_alpha(self, rng):
        gray = rng.integers(0, 256, (10, 10, 1), dtype=np.uint8)
        np.testing.assert_array_equal(decode_png(encode_png(gray)), gray)
        rgba = rng.integers(0, 256, (10, 10, 4), dtype=np.uint8)
        np.testing.assert_array_equal(decode_png(encode_png(rgba)), rgba)

    def test_jpeg_roundtrip_close(self, rng):
        img = np.full((32, 32, 3), 128, np.uint8)
        img[8:24, 8:24] = 200
        out = decode_jpeg(encode_jpeg(img, quality=95))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).mean() < 4

    def test_jpeg_matches_pil_decode(self, rng):
        img = _rgb(rng, 40, 40)
        buf = _io.BytesIO()
        PILImage.fromarray(img).save(buf, "JPEG", quality=90)
        data = buf.getvalue()
        ours = decode_jpeg(data)
        ref = np.asarray(PILImage.open(_io.BytesIO(data)))
        # both use libjpeg; allow tiny differences from decoder settings
        assert ours.shape == ref.shape
        assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 2

    def test_png_matches_pil_decode(self, rng):
        img = _rgb(rng)
        buf = _io.BytesIO()
        PILImage.fromarray(img).save(buf, "PNG")
        ours = decode_png(buf.getvalue())
        np.testing.assert_array_equal(ours, img)

    def test_sniffing(self, rng):
        img = _rgb(rng)
        assert decode_image(encode_png(img)).shape == img.shape
        assert decode_image(encode_jpeg(img)).shape == img.shape

    def test_damaged_input_raises_or_falls_back(self):
        with pytest.raises(Exception):
            decode_jpeg(b"\xff\xd8\xffgarbagegarbage")

    def test_not_an_image(self):
        with pytest.raises(Exception):
            decode_image(b"hello world this is not an image")


class TestModes:
    def test_gray_mode(self, rng):
        img = _rgb(rng)
        out = decode_image(encode_png(img), ImageReadMode.GRAY)
        assert out.shape == (24, 32, 1)

    def test_rgb_mode_from_gray(self, rng):
        gray = rng.integers(0, 256, (10, 10, 1), dtype=np.uint8)
        out = decode_image(encode_png(gray), ImageReadMode.RGB)
        assert out.shape == (10, 10, 3)
        np.testing.assert_array_equal(out[:, :, 0], out[:, :, 2])

    def test_rgba_mode(self, rng):
        img = _rgb(rng)
        out = decode_image(encode_png(img), ImageReadMode.RGB_ALPHA)
        assert out.shape == (24, 32, 4)
        assert (out[:, :, 3] == 255).all()

    def test_16bit_png_scaled(self, rng):
        arr16 = (rng.integers(0, 65536, (8, 8), dtype=np.uint16))
        buf = _io.BytesIO()
        PILImage.fromarray(arr16, mode="I;16").save(buf, "PNG")
        out = decode_png(buf.getvalue())
        assert out.dtype == np.uint8 and out.shape == (8, 8, 1)


@native
class TestWebP:
    def test_lossless_roundtrip_exact(self, rng):
        from cpu_vision_tpu.io import decode_webp

        img = _rgb(rng)
        buf = _io.BytesIO()
        PILImage.fromarray(img).save(buf, "WEBP", lossless=True)
        out = decode_webp(buf.getvalue())
        np.testing.assert_array_equal(out, img)

    def test_sniffed_by_decode_image(self, rng):
        img = _rgb(rng)
        buf = _io.BytesIO()
        PILImage.fromarray(img).save(buf, "WEBP", lossless=True)
        out = decode_image(buf.getvalue())
        np.testing.assert_array_equal(out, img)

    def test_alpha(self, rng):
        from cpu_vision_tpu.io import decode_webp

        # near-opaque alpha: fully-opaque gets the channel dropped by the
        # encoder, fully-transparent lets libwebp alter RGB — one 254 pixel
        # keeps the channel while staying exact
        rgba = rng.integers(0, 256, (12, 12, 4), dtype=np.uint8)
        rgba[:, :, 3] = 255
        rgba[0, 0, 3] = 254
        buf = _io.BytesIO()
        PILImage.fromarray(rgba, "RGBA").save(buf, "WEBP", lossless=True)
        out = decode_webp(buf.getvalue())
        assert out.shape == (12, 12, 4)
        np.testing.assert_array_equal(out, rgba)


class TestGIF:
    """Native GIF decode (self-contained LZW in _codecs.cpp; reference
    decodes via vendored giflib, csrc/io/image/cpu/decode_gif.cpp)."""

    def test_palette_roundtrip_exact(self, rng):
        from cpu_vision_tpu.io import decode_gif

        img = rng.integers(0, 256, (37, 23, 3), dtype=np.uint8)
        pil = PILImage.fromarray(img).quantize(colors=64)
        buf = _io.BytesIO()
        pil.save(buf, "GIF")
        out = decode_gif(buf.getvalue())
        np.testing.assert_array_equal(out, np.asarray(pil.convert("RGB")))

    def test_sniffed_through_decode_image(self, rng):
        img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        pil = PILImage.fromarray(img).quantize(colors=16)
        buf = _io.BytesIO()
        pil.save(buf, "GIF")
        out = decode_image(buf.getvalue())
        np.testing.assert_array_equal(out, np.asarray(pil.convert("RGB")))

    def test_animated_returns_all_frames(self, rng):
        """Animated GIF -> (N, H, W, 3), frame 0 equal to the still decode
        (reference decode_gif returns every frame,
        csrc/io/image/cpu/decode_gif.cpp:100-160)."""
        from cpu_vision_tpu.io import decode_gif

        img = rng.integers(0, 256, (20, 14, 3), dtype=np.uint8)
        f0 = PILImage.fromarray(img).quantize(colors=32)
        f1 = PILImage.fromarray(255 - img).quantize(colors=32)
        buf = _io.BytesIO()
        f0.save(buf, "GIF", save_all=True, append_images=[f1], disposal=1)
        out = decode_gif(buf.getvalue())
        assert out.shape[0] == 2 and out.shape[3] == 3
        np.testing.assert_array_equal(out[0], np.asarray(f0.convert("RGB")))

    def test_animated_matches_pil_compositing(self, rng):
        """3 delta-optimised frames, disposal=DO_NOT: our compositing must
        match PIL's frame-by-frame render exactly."""
        from PIL import ImageSequence

        from cpu_vision_tpu.io import decode_gif

        base = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
        frames = [PILImage.fromarray(base).quantize(colors=64)]
        for k in (1, 2):
            nxt = base.copy()
            nxt[4 * k : 4 * k + 6, 3 * k : 3 * k + 9] = [255 - 80 * k, 10 * k, 200]
            frames.append(PILImage.fromarray(nxt).quantize(colors=64))
        buf = _io.BytesIO()
        frames[0].save(buf, "GIF", save_all=True, append_images=frames[1:], disposal=1)
        out = decode_gif(buf.getvalue())
        pil = PILImage.open(_io.BytesIO(buf.getvalue()))
        golden = np.stack(
            [np.asarray(f.convert("RGB")) for f in ImageSequence.Iterator(pil)], axis=0
        )
        assert out.shape == golden.shape
        np.testing.assert_array_equal(out, golden)

    # ---- hand-built GIFs: pin the exact disposal/transparency semantics ----

    @staticmethod
    def _lzw_uncompressed(indices):
        """LZW stream for palette indices < 128 using the 'uncompressed'
        trick: min_code_size=7, a clear code every 100 symbols so the code
        width never grows past 8 bits."""
        CLEAR, EOI = 128, 129
        codes = []
        for i, idx in enumerate(indices):
            if i % 100 == 0:
                codes.append(CLEAR)
            codes.append(int(idx))
        codes.append(EOI)
        bits = bytearray()
        acc = nbits = 0
        for code in codes:
            acc |= code << nbits
            nbits += 8
            while nbits >= 8:
                bits.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            bits.append(acc & 0xFF)
        out = bytearray([7])  # min code size
        for off in range(0, len(bits), 255):
            chunk = bits[off : off + 255]
            out.append(len(chunk))
            out.extend(chunk)
        out.append(0)
        return bytes(out)

    @classmethod
    def _build_gif(cls, w, h, palette, frames, bg_index=0):
        """frames: list of (left, top, fw, fh, indices, disposal,
        transparent_or_None)."""
        import struct

        out = bytearray(b"GIF89a")
        out += struct.pack("<HH", w, h)
        out += bytes([0x86, bg_index, 0])  # GCT present, 128 entries
        pal = bytearray()
        for r, g, b in palette:
            pal += bytes([r, g, b])
        pal += bytes(3 * (128 - len(palette)))
        out += pal
        for left, top, fw, fh, indices, disposal, transparent in frames:
            flags = (disposal & 0x7) << 2
            tidx = 0
            if transparent is not None:
                flags |= 1
                tidx = transparent
            out += bytes([0x21, 0xF9, 4, flags, 0, 0, tidx, 0])
            out += bytes([0x2C]) + struct.pack("<HHHH", left, top, fw, fh) + bytes([0])
            out += cls._lzw_uncompressed(indices)
        out.append(0x3B)
        return bytes(out)

    def test_partial_frame_do_not_dispose_and_transparency(self):
        """Frame 1 is a partial region with a transparent hole and
        disposal=DO_NOT: pixels outside the region and under the hole keep
        frame 0 (reference decode_gif.cpp:131-137,146-149)."""
        from cpu_vision_tpu.io import decode_gif

        palette = [(0, 0, 255), (255, 0, 0), (0, 255, 0), (9, 9, 9)]
        f0 = np.full((8, 10), 1, np.uint8)  # all red
        region = np.full((3, 4), 2, np.uint8)  # green block ...
        region[1, 1] = 3  # ... with a transparent hole (index 3)
        data = self._build_gif(
            10, 8, palette,
            [(0, 0, 10, 8, f0.ravel(), 1, None),
             (2, 3, 4, 3, region.ravel(), 1, 3)],
        )
        out = decode_gif(data)
        assert out.shape == (2, 8, 10, 3)
        np.testing.assert_array_equal(out[0], np.broadcast_to([255, 0, 0], (8, 10, 3)))
        expect = out[0].copy()
        expect[3:6, 2:6] = [0, 255, 0]
        expect[4, 3] = [255, 0, 0]  # transparent hole shows frame 0
        np.testing.assert_array_equal(out[1], expect)

    def test_partial_frame_background_disposal(self):
        """A frame whose own disposal is not DO_NOT starts from the
        background color over the whole canvas (reference
        decode_gif.cpp:138-145 + background default)."""
        from cpu_vision_tpu.io import decode_gif

        palette = [(7, 8, 9), (255, 0, 0), (0, 255, 0)]
        f0 = np.full((6, 6), 1, np.uint8)
        f1 = np.full((2, 2), 2, np.uint8)
        data = self._build_gif(
            6, 6, palette,
            [(0, 0, 6, 6, f0.ravel(), 1, None),
             (1, 1, 2, 2, f1.ravel(), 2, None)],  # disposal=background
            bg_index=0,
        )
        out = decode_gif(data)
        assert out.shape == (2, 6, 6, 3)
        expect = np.broadcast_to([7, 8, 9], (6, 6, 3)).copy()
        expect[1:3, 1:3] = [0, 255, 0]
        np.testing.assert_array_equal(out[1], expect)

    def test_interlaced_animated(self, rng):
        from cpu_vision_tpu.io import decode_gif

        img = rng.integers(0, 256, (19, 13, 3), dtype=np.uint8)
        pil = PILImage.fromarray(img).quantize(colors=32)
        buf = _io.BytesIO()
        pil.save(buf, "GIF", interlace=True)
        out = decode_gif(buf.getvalue())
        np.testing.assert_array_equal(out, np.asarray(pil.convert("RGB")))

    def test_damaged_raises(self):
        from cpu_vision_tpu.io import decode_gif

        with pytest.raises(ValueError):
            decode_gif(b"GIF89a" + b"\x00" * 8)


class TestGrayAlphaModes:
    def test_la_png_all_modes(self, tmp_path):
        import io as _io

        from PIL import Image as PILImage

        from cpu_vision_tpu.io import ImageReadMode, decode_image

        la = np.zeros((6, 8, 2), np.uint8)
        la[..., 0] = 120
        la[..., 1] = 200
        buf = _io.BytesIO()
        PILImage.fromarray(la, mode="LA").save(buf, "PNG")
        data = buf.getvalue()
        g = decode_image(data, ImageReadMode.GRAY)
        assert g.shape == (6, 8, 1) and g[0, 0, 0] == 120
        rgb = decode_image(data, ImageReadMode.RGB)
        assert rgb.shape == (6, 8, 3) and (rgb == 120).all()
        rgba = decode_image(data, ImageReadMode.RGB_ALPHA)
        assert rgba.shape == (6, 8, 4) and rgba[0, 0, 3] == 200
        ga = decode_image(data, ImageReadMode.GRAY_ALPHA)
        assert ga.shape == (6, 8, 2) and ga[0, 0, 1] == 200
