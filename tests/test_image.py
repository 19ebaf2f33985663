"""Image compression tests (reference: image_compression tests + main
workflow: load -> downscale -> normalize -> compress -> reconstruct ->
save_compressed roundtrip; ratio mn/(l(m+n+1)))."""

import os

import numpy as np
import pytest

from rsvd_kamaneh_raganato_terrana_tpu.apps.image import Image
from rsvd_kamaneh_raganato_terrana_tpu.core.mesh import make_mesh

from conftest import DATA_DIR

IMG = os.path.join(DATA_DIR, "img", "256_01.jpg")


@pytest.fixture(scope="module")
def img256():
    return Image.load(IMG)


def _lowrank(rng, m, n, r, scale=255.0):
    a = rng.standard_normal((m, r)) @ rng.standard_normal((r, n))
    a = (a - a.min()) / (a.max() - a.min()) * scale
    return a


def test_load_shape(img256):
    assert img256.shape == (256, 256)
    assert 0 <= img256.data.min() and img256.data.max() <= 255


def test_scaling_ops(img256):
    im = Image(img256.data.copy())
    im.downscale(2)
    assert im.shape == (128, 128)
    im.upscale(2)
    assert im.shape == (256, 256)
    im.normalize()
    assert im.data.max() <= 1.0
    im.denormalize()
    assert im.data.max() > 1.0


def test_compress_reconstruct_lowrank(rng):
    a = _lowrank(rng, 96, 80, 5)
    im = Image(a).compress(k=8, q=2)
    rec = im.reconstruct()
    rel = np.linalg.norm(rec - a) / np.linalg.norm(a)
    assert rel < 1e-4  # f32 pipeline on a rank-5 image
    assert im.compression_ratio() == pytest.approx(
        96 * 80 / (8 * (96 + 80 + 1))
    )


def test_compress_default_rank(img256):
    im = Image(img256.data.copy()).normalize().compress()
    assert im.S.shape[0] == 64  # min(256,256)//4 (image_com.cpp:294-298)
    assert im.psnr() > 25.0


def test_compress_tiled(rng):
    a = _lowrank(rng, 128, 128, 6)
    im = Image(a).compress_tiled(k=8, grid=(2, 2))
    rec = im.reconstruct()
    rel = np.linalg.norm(rec - a) / np.linalg.norm(a)
    assert rel < 1e-3
    assert im.tile_factors.u.shape[0] == 4


def test_compress_tiled_on_mesh(rng):
    """Tile batch axis sharded over the 8-device mesh (the reference's
    per-rank blocks; unlike the reference, 8 devices with a 2x4 grid works
    — no square-P abort)."""
    mesh = make_mesh()
    a = _lowrank(rng, 128, 256, 6)
    im = Image(a).compress_tiled(k=8, grid=(2, 4), mesh=mesh)
    rel = np.linalg.norm(im.reconstruct() - a) / np.linalg.norm(a)
    assert rel < 1e-3


def test_codec_roundtrip_affine(rng, tmp_path):
    a = _lowrank(rng, 64, 64, 4)
    im = Image(a).compress(k=6)
    path = str(tmp_path / "c.rsv")
    im.save_compressed(path)
    im2 = Image(a).load_compressed(path)
    # affine uint8 quantization: reconstruction close to unquantized
    rec, rec2 = im.reconstruct(), im2.reconstruct()
    assert np.abs(rec - rec2).max() < 0.05 * np.abs(rec).max() + 1.0
    # ~1 byte/entry + small header
    l = im.S.shape[0]
    assert os.path.getsize(path) < (64 * l + l + 64 * l) + 200


def test_ragged_tile_grid(rng, tmp_path):
    """Non-dividing grids pad with edge replication and crop back
    (the reference aborted on non-square process counts)."""
    a = _lowrank(rng, 61, 45, 4)  # 3x2 grid doesn't divide either dim
    im = Image(a).compress_tiled(k=6, grid=(3, 2))
    rec = im.reconstruct()
    assert rec.shape == (61, 45)
    assert np.linalg.norm(rec - a) < 5e-2 * np.linalg.norm(a)
    # codec roundtrip preserves the original shape exactly
    path = str(tmp_path / "r.rsv")
    im.save_compressed(path)
    im2 = Image(a).load_compressed(path)
    assert im2.tile_factors.shape == (61, 45)
    assert im2.reconstruct().shape == (61, 45)


def test_codec_truncate_mode(rng, tmp_path):
    """Reference-exact byte semantics (int(x) & 0xFF,
    image_com.cpp:94-118): lossy for fractional/negative values by
    design; file must roundtrip to the truncated bytes."""
    a = _lowrank(rng, 32, 32, 3)
    im = Image(a).compress(k=4)
    path = str(tmp_path / "t.rsv")
    im.save_compressed(path, mode="truncate")
    im2 = Image(a).load_compressed(path)
    expect_u = (im.U.astype(np.int64) & 0xFF).astype(np.float64)
    np.testing.assert_array_equal(im2.U, expect_u)


def test_codec_tiled_roundtrip(rng, tmp_path):
    a = _lowrank(rng, 64, 64, 4)
    im = Image(a).compress_tiled(k=6, grid=(2, 2))
    path = str(tmp_path / "t.rsv")
    im.save_compressed(path)
    im2 = Image(a).load_compressed(path)
    assert im2.tile_factors is not None
    assert im2.tile_factors.grid == (2, 2)
    np.testing.assert_allclose(
        im2.reconstruct(), im.reconstruct(),
        atol=0.05 * np.abs(a).max() + 1.0,
    )


def test_color_compress_roundtrip(tmp_path, rng):
    """RGB extension: per-channel rSVD, codec roundtrip, PNG save."""
    base = _lowrank(rng, 64, 48, 4)
    color = np.stack([base, base * 0.5, 255 - base], axis=2)
    im = Image(color)
    assert im.is_color
    im.compress(k=6, q=2)
    rec = im.reconstruct()
    assert rec.shape == color.shape
    assert np.linalg.norm(rec - color) < 1e-2 * np.linalg.norm(color)
    assert im.compression_ratio() > 0
    path = str(tmp_path / "c.rsv")
    im.save_compressed(path)
    im2 = Image(color).load_compressed(path)
    assert im2.U.ndim == 3
    np.testing.assert_allclose(im2.reconstruct(), rec,
                               atol=0.05 * np.abs(rec).max() + 1.0)
    png = str(tmp_path / "c.png")
    im.restore()
    im.save(png)
    back = Image.load(png, color=True)
    assert back.data.shape == color.shape
    with pytest.raises(ValueError):
        Image(color).compress_tiled(k=4, grid=(2, 2))


def test_color_scaling_ops(rng):
    color = rng.random((32, 32, 3)) * 255
    im = Image(color.copy()).downscale(2)
    assert im.shape == (16, 16, 3)
    im.upscale(2)
    assert im.shape == (32, 32, 3)


def test_save_png_roundtrip(img256, tmp_path):
    p = str(tmp_path / "out.png")
    Image(img256.data.copy()).save(p)
    back = Image.load(p)
    np.testing.assert_allclose(back.data, img256.data, atol=1.0)


def test_end_to_end_reference_workflow(tmp_path):
    """The reference main workflow (image_compression/main/main.cpp:40-83):
    load -> downscale(2) -> normalize -> compress(tiled) -> denormalize ->
    upscale(2) -> save PNG + compressed factors."""
    im = Image.load(IMG)
    im.downscale(2).normalize()
    im.compress_tiled(k=20, grid=(2, 2))
    im.restore()
    im.denormalize().upscale(2)
    png = str(tmp_path / "rec.png")
    im.save(png)
    assert os.path.exists(png)
    assert im.shape == (256, 256)


def test_reference_dat_byte_parity(tmp_path):
    """Byte-exact parity with the reference binary layout: an independent
    scalar transcription of the C++ writer loop (image_com.cpp:66-123)
    must produce the same file our writer does, and our reader must apply
    the unsigned-char -> double read semantics (:131-181)."""
    import struct

    rng = np.random.default_rng(7)
    u = rng.uniform(-300, 300, (5, 3))
    s = np.array([250.7, 13.2, 0.4])
    v = rng.uniform(-300, 300, (4, 3))

    im = Image(np.zeros((5, 4)))
    im.U, im.S, im.V = u, s, v
    p = str(tmp_path / "ref.dat")
    im.save_compressed_reference(p)

    # independent writer: the C++ loop, scalar for scalar
    expected = bytearray()
    expected += struct.pack("<5i", 5, 3, 3, 4, 3)
    for arr in (u, s, v):
        for val in np.atleast_2d(arr).reshape(-1):
            expected += struct.pack("B", int(val) & 0xFF)
    with open(p, "rb") as f:
        assert f.read() == bytes(expected)

    # reader: every byte comes back as double(unsigned char)
    back = Image(np.zeros((5, 4))).load_compressed_reference(p)
    np.testing.assert_array_equal(
        back.U, (u.astype(np.int64) & 0xFF).astype(np.float64))
    np.testing.assert_array_equal(
        back.S, (s.astype(np.int64) & 0xFF).astype(np.float64))
    np.testing.assert_array_equal(
        back.V, (v.astype(np.int64) & 0xFF).astype(np.float64))


def test_reference_dat_pixel_range_roundtrip(img256, tmp_path):
    """For factors whose entries are already integers in [0, 255] (the
    regime the reference format survives), the round trip is exact."""
    im = Image(img256.data.copy())
    im.U = np.floor(np.clip(im.data[:, :16], 0, 255))
    im.S = np.arange(16, dtype=np.float64)
    im.V = np.floor(np.clip(im.data[:16, :].T, 0, 255))
    p = str(tmp_path / "px.dat")
    im.save_compressed_reference(p)
    back = Image(np.zeros_like(img256.data)).load_compressed_reference(p)
    np.testing.assert_array_equal(back.U, im.U)
    np.testing.assert_array_equal(back.S, im.S)
    np.testing.assert_array_equal(back.V, im.V)


def test_video_batch_compression(rng, mesh8):
    from rsvd_kamaneh_raganato_terrana_tpu.apps.image import (
        compress_video,
        reconstruct_video,
    )

    t, h, w, r = 8, 48, 64, 6
    frames = np.stack([
        rng.standard_normal((h, r)) @ rng.standard_normal((r, w))
        for _ in range(t)
    ])
    u, s, v = compress_video(frames, k=r, p=4, mesh=mesh8)
    assert u.shape == (t, h, r) and s.shape == (t, r) and v.shape == (t, w, r)
    rec = reconstruct_video(u, s, v)
    rel = np.linalg.norm(rec - frames) / np.linalg.norm(frames)
    assert rel < 1e-4
